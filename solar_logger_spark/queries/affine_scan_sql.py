"""DuckDB oracle generator for the segmented affine prefix scans
(:mod:`solar_logger_spark.operators.affine_scan`) — emits a CTE chain
replaying the PINNED fold order verbatim (rank blocks of 4096 in a
64×64 grid, mid groups of 16384 blocks in a 128×128 grid, per-series
top level in 1024-chunks, entries applied top-down two hops per
level), so every float the Spark scan produces is reproduced
bit-for-bit by ``list_reduce`` folds evaluating the identical IEEE
expressions in the identical order.

The generated SQL works per item at O(chunk) — each item's
within-chunk prefix folds only its own chunk slice — which makes the
blocked oracle CHEAPER per row than the retired whole-prefix
``list_reduce(vals[1:rn])`` form (O(n) per row).
"""

from __future__ import annotations

from solar_logger_spark.operators.affine_scan import (
    BLOCK, CHUNK, MIDCAP, MIDCHUNK, TOPCHUNK,
)


def fields(d: int) -> list[str]:
    rng = range(1, d + 1)
    return [f"a{i}{j}" for i in rng for j in rng] + [
        f"c{i}" for i in rng
    ]


def _aidx(d: int, i: int, j: int) -> int:
    """1-based list index of matrix entry a{i}{j}."""
    return (i - 1) * d + j


def _cidx(d: int, i: int) -> int:
    """1-based list index of vector entry c{i}."""
    return d * d + i


def _ident(d: int) -> str:
    vals = []
    for i in range(1, d + 1):
        for j in range(1, d + 1):
            vals.append("1.0::DOUBLE" if i == j else "0.0::DOUBLE")
    vals += ["0.0::DOUBLE"] * d
    return "[" + ", ".join(vals) + "]"


def _compose(d: int) -> str:
    """``(acc9, e9) -> [..]`` mirroring ``AffineNSpec.compose`` —
    sums accumulate left-to-right, exactly the fl order Spark's
    expression tree evaluates.

    Maps are POSITIONAL ``DOUBLE[]`` lists (a11..a{d}{d}, c1..c{d}):
    DuckDB v1.0.0's ``list_reduce`` evaluates STRUCT result fields
    sequentially with ``acc`` aliased in place — a struct accumulator
    lets c2 read the already-updated c1 (the aliasing bug the retired
    recursive-CTE oracles documented; a nested single-field struct
    does not escape it either). List construction is atomic."""
    parts = []
    rng = range(1, d + 1)
    for i in rng:
        for j in rng:
            parts.append(" + ".join(
                f"e9[{_aidx(d, i, k)}] * acc9[{_aidx(d, k, j)}]"
                for k in rng
            ))
    for i in rng:
        terms = " + ".join(
            f"e9[{_aidx(d, i, k)}] * acc9[{_cidx(d, k)}]" for k in rng
        )
        parts.append(f"{terms} + e9[{_cidx(d, i)}]")
    return "(acc9, e9) -> [" + ", ".join(parts) + "]"


def _apply(d: int, m: str, e_of) -> str:
    """``struct_pack(v1 := ..., ...)`` mirroring
    ``AffineNSpec.apply``: v_i = m[a{i}1]·e1 + ... + m[c{i}],
    left-to-right; ``m`` is a positional map list, duplicated per
    term (pure expression, identical fl). Applies run OUTSIDE
    list_reduce lambdas, so a struct result is safe here."""
    parts = []
    rng = range(1, d + 1)
    for i in rng:
        terms = " + ".join(
            f"{m}[{_aidx(d, i, j)}] * {e_of(j)}" for j in rng
        )
        parts.append(f"v{i} := {terms} + {m}[{_cidx(d, i)}]")
    return "struct_pack(" + ", ".join(parts) + ")"


def _fold(items: str, d: int) -> str:
    """Identity-seeded left fold of a positional-map list."""
    return f"list_reduce([{_ident(d)}] || ({items}), {_compose(d)})"


def _wincl(ms: str, i: str, chunk: int, d: int) -> str:
    """Item i's INCLUSIVE within-chunk prefix."""
    cstart = f"((({i}) - 1) // {chunk}) * {chunk} + 1"
    return _fold(f"({ms})[{cstart} : ({i})]", d)


def _wexcl(ms: str, i: str, chunk: int, d: int) -> str:
    """Item i's EXCLUSIVE within-chunk prefix (empty slice folds to
    the identity on the chunk's first item)."""
    cstart = f"((({i}) - 1) // {chunk}) * {chunk} + 1"
    return _fold(f"({ms})[{cstart} : ({i}) - 1]", d)


def _ctot(ms: str, cc: str, chunk: int, d: int) -> str:
    """Chunk cc's (1-based) flat-folded total."""
    return _fold(
        f"({ms})[({cc} - 1) * {chunk} + 1 : ({cc}) * {chunk}]", d
    )


def _cexcl(ms: str, i: str, chunk: int, d: int) -> str:
    """Item i's chunk-EXCLUSIVE prefix: fold of the totals of every
    chunk before item i's chunk."""
    cidx = f"(({i}) - 1) // {chunk}"
    return _fold(
        f"list_transform(generate_series(1, {cidx}), "
        f"cc9 -> {_ctot(ms, 'cc9', chunk, d)})",
        d,
    )


def grid_tot(ms: str, chunk: int, d: int) -> str:
    """The group total under the chunked association (fold of
    flat-folded chunk totals) — mirrors ``_grid_tot``."""
    return _fold(
        f"list_transform(generate_series(1, "
        f"CAST(ceil(len({ms}) / {chunk}.0) AS INT)), "
        f"cc9 -> {_ctot(ms, 'cc9', chunk, d)})",
        d,
    )


def _hop(ms: str, i: str, chunk: int, d: int, e_of, incl: bool) -> str:
    """One level hop: apply(within prefix of item i,
    apply(chunk_excl of item i, entry)) — a struct_pack(v1..vd)."""
    w = (_wincl if incl else _wexcl)(ms, i, chunk, d)
    c = _cexcl(ms, i, chunk, d)
    inner = _apply(d, f"({c})", e_of)
    return _apply(d, f"({w})", lambda j: f"({inner}).v{j}")


def affine_scan_ctes(
    *,
    tag: str,
    base: str,
    series: list[str],
    order: str,
    maps: dict[str, str],
    d: int = 1,
) -> str:
    """The CTE chain (no leading WITH) replaying one scan. ``base``
    selects the series columns, the order columns, and whatever the
    map expressions read; ``maps`` gives one SQL expression per map
    field (``a11.. c1..``, DOUBLE; identity rows for warm-ups) and
    may reference ``rn`` — the chain computes the rank first, exactly
    like the Spark operator evaluates coefficients after
    ``RANK_COL``. Exposes ``{tag}_y``: (series..., rn, v1..v{d}) —
    one row per base row, the state AFTER that row under the pinned
    hierarchy. Callers join it back to their row frame on
    (series, rn) and mask warm-up outputs themselves."""
    mexprs = ",\n           ".join(
        f"CAST({maps[f]} AS DOUBLE) AS {f}" for f in fields(d)
    )
    s = ", ".join(series)
    jn = lambda a, b: " AND ".join(  # noqa: E731
        f"{a}.{c} IS NOT DISTINCT FROM {b}.{c}" for c in series
    )
    gs = ", ".join(f"g.{c}" for c in series)
    pack = "[" + ", ".join(fields(d)) + "]"
    zero = lambda j: "0.0::DOUBLE"       # noqa: E731
    pe = lambda j: f"p.ev.v{j}"          # noqa: E731
    mids_ms = "list_transform(g.items, t9 -> t9.m)"
    tops_ms = "list_transform(items, t9 -> t9.m)"
    vout = ", ".join(f"v.v{i} AS v{i}" for i in range(1, d + 1))
    return f"""{tag}base AS ({base}),
{tag}x AS (
    SELECT *, row_number() OVER (PARTITION BY {s} ORDER BY {order})
              AS rn
    FROM {tag}base
),
{tag}xm AS (
    SELECT {s}, rn,
           {mexprs}
    FROM {tag}x
),
{tag}l0 AS (
    SELECT {s}, CAST((rn - 1) // {BLOCK} AS BIGINT) AS blk,
           list({pack} ORDER BY rn) AS ms,
           list(rn ORDER BY rn) AS rns
    FROM {tag}xm GROUP BY {s}, CAST((rn - 1) // {BLOCK} AS BIGINT)
),
{tag}s0 AS (
    SELECT {s}, blk, {grid_tot("ms", CHUNK, d)} AS m
    FROM {tag}l0
),
{tag}mids AS (
    SELECT {s}, CAST(blk // {MIDCAP} AS BIGINT) AS mid,
           list(struct_pack(k := blk, m := m) ORDER BY blk) AS items
    FROM {tag}s0 GROUP BY {s}, CAST(blk // {MIDCAP} AS BIGINT)
),
{tag}midt AS (
    SELECT {s}, mid,
           {grid_tot("list_transform(items, t9 -> t9.m)", MIDCHUNK, d)}
               AS m
    FROM {tag}mids
),
{tag}tops AS (
    SELECT {s}, list(struct_pack(k := mid, m := m) ORDER BY mid)
               AS items
    FROM {tag}midt GROUP BY {s}
),
{tag}etop AS (
    SELECT {s}, items[i].k AS mid,
           {_hop(tops_ms, "i", TOPCHUNK, d, zero, incl=False)} AS ev
    FROM {tag}tops, unnest(generate_series(1, len(items))) AS u(i)
),
{tag}eblk AS (
    SELECT {gs}, g.items[i].k AS blk,
           {_hop(mids_ms, "i", MIDCHUNK, d, pe, incl=False)} AS ev
    FROM {tag}mids g JOIN {tag}etop p
      ON g.mid = p.mid AND {jn('g', 'p')},
    unnest(generate_series(1, len(g.items))) AS u(i)
),
{tag}_y AS (
    SELECT {s}, rn, {vout} FROM (
        SELECT {gs}, g.rns[i] AS rn,
               {_hop("g.ms", "i", CHUNK, d, pe, incl=True)} AS v
        FROM {tag}l0 g JOIN {tag}eblk p
          ON g.blk = p.blk AND {jn('g', 'p')},
        unnest(generate_series(1, len(g.rns))) AS u(i)
    )
)"""


def scan_join(tag: str, series: list[str]) -> str:
    """FROM clause joining the ranked base rows back to the scan
    output on (series, rn)."""
    cond = " AND ".join(
        f"x.{c} IS NOT DISTINCT FROM y.{c}" for c in series
    )
    return (
        f"FROM {tag}x x JOIN {tag}_y y ON x.rn = y.rn AND {cond}"
    )


def scan_query_sql(
    *,
    tag: str,
    base: str,
    series: list[str],
    order: str,
    maps: dict[str, str],
    d: int = 1,
    select: str,
) -> str:
    """A complete oracle query: the scan CTE chain plus a final
    SELECT over the ranked rows (alias ``x``) joined to the scan
    output (alias ``y`` with ``v1..v{d}``)."""
    ctes = affine_scan_ctes(
        tag=tag, base=base, series=series, order=order, maps=maps, d=d
    )
    return f"WITH {ctes}\nSELECT {select}\n{scan_join(tag, series)}"
