"""Property pin for ``pq._pinned_hier_mean`` — the bounded
hierarchical id-ordered fold every deterministic trainer's member mean
rides on (r9's replacement for the full per-cell member lists).

The contract the DuckDB twins rely on: for ANY input partitioning the
result is bit-identical to a pure-Python replay of the three-level
fold (members summed in vid order within each 256-id block, block
partials summed in block order within each 256-block superblock,
superblock partials summed in superblock order, one division per
dimension at the end — r11: the third level bounds what was an
O(N/block) struct pile-up on a hot key). Hypothesis drives random key
assignments, vid gaps (blocks with holes, ids straddling block AND
superblock boundaries), vector values across magnitudes, and a random
repartitioning."""

from hypothesis import given, settings, strategies as hst
from pyspark.sql import Row, functions as F

from solar_logger_spark.operators.pq import _pinned_hier_mean

DIM = 4
BLOCK = 256


def _python_replay(rows, block=BLOCK):
    """The reference semantics, in pure Python floats (IEEE doubles)."""
    by_key: dict = {}
    for vid, key, vec in rows:
        by_key.setdefault(key, []).append((vid, vec))
    out = {}
    for key, members in by_key.items():
        blocks: dict = {}
        for vid, vec in members:
            blocks.setdefault(vid // block, []).append((vid, vec))
        partials = []
        n = 0
        for b in sorted(blocks):
            acc = [0.0] * DIM
            for _vid, vec in sorted(blocks[b]):
                for d in range(DIM):
                    acc[d] = acc[d] + vec[d]
            partials.append((b, acc))
            n += len(blocks[b])
        supers: dict = {}
        for b, p in partials:
            supers.setdefault(b // block, []).append((b, p))
        stotals = []
        for sb in sorted(supers):
            acc = [0.0] * DIM
            for _b, p in sorted(supers[sb]):
                for d in range(DIM):
                    acc[d] = acc[d] + p[d]
            stotals.append((sb, acc))
        total = [0.0] * DIM
        for _sb, p in stotals:
            for d in range(DIM):
                total[d] = total[d] + p[d]
        out[key] = [t / n for t in total]
    return out


@settings(max_examples=12, deadline=None)
@given(
    data=hst.lists(
        hst.tuples(
            # up to ~12 superblocks (256² ids each) so the level-2/3
            # boundaries are actually crossed, not just level 1's
            hst.integers(min_value=0, max_value=800_000),    # vid
            hst.integers(min_value=0, max_value=3),          # key
            hst.tuples(*([hst.floats(
                min_value=-1e6, max_value=1e6,
                allow_nan=False, allow_infinity=False,
            )] * DIM)),
        ),
        min_size=1, max_size=60, unique_by=lambda t: t[0],
    ),
    n_parts=hst.integers(min_value=1, max_value=7),
)
def test_hier_mean_matches_python_replay_any_partitioning(
    spark, data, n_parts
):
    rows = [(vid, key, list(vec)) for vid, key, vec in data]
    df = spark.createDataFrame(
        [Row(vid=v, cell=k, v=[float(x) for x in vec])
         for v, k, vec in rows]
    ).repartition(n_parts, "vid")
    got = {
        r["cell"]: list(r["c"])
        for r in _pinned_hier_mean(df, ["cell"], "v", DIM).collect()
    }
    want = _python_replay(rows)
    assert set(got) == set(want)
    for key in want:
        assert [x.hex() for x in got[key]] == [
            x.hex() for x in want[key]
        ], f"key {key}: {got[key]} != {want[key]}"


def test_hier_mean_matches_duckdb_across_superblocks(spark):
    """Cross-engine differential for the r11 THIRD fold level: the
    registry corpora never cross a 65536-id superblock boundary, so
    the oracle sweeps alone cannot prove the superblock fold agrees
    between engines. Synthetic vids up to 900k (14 superblocks) must
    produce bit-identical means from ``_pinned_hier_mean`` and the
    verbatim DuckDB replay the ANN twins use."""
    import random

    import duckdb

    random.seed(11)
    rows = []
    for _ in range(1200):
        vid = random.randint(0, 900_000)
        rows.append(
            (vid, vid % 3, [random.uniform(-1e3, 1e3) for _ in range(DIM)])
        )
    rows = list({r[0]: r for r in rows}.values())
    df = spark.createDataFrame(
        [Row(vid=v, cell=k, v=vec) for v, k, vec in rows]
    ).repartition(7, "vid")
    got = {
        r["cell"]: [x.hex() for x in r["c"]]
        for r in _pinned_hier_mean(df, ["cell"], "v", DIM).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE t (vid BIGINT, cell INT, v DOUBLE[])")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    zero = "[" + ", ".join(["0.0"] * DIM) + "]"
    rng = f"range(1, {DIM + 1})"
    want = {
        r[0]: [x.hex() for x in r[1]]
        for r in con.execute(f"""
    WITH blk AS (
      SELECT cell, vid // 256 AS b, list(v ORDER BY vid) AS ms,
             count(*) AS cnt
      FROM t GROUP BY 1, 2
    ), bsum AS (
      SELECT cell, b, cnt,
             list_reduce(list_prepend({zero}, ms),
                         (acc, x) -> [acc[d] + x[d] FOR d IN {rng}]) AS s
      FROM blk
    ), sb AS (
      SELECT cell, b // 256 AS sb,
             list_reduce(list_prepend({zero}, list(s ORDER BY b)),
                         (acc, x) -> [acc[d] + x[d] FOR d IN {rng}]) AS s2,
             sum(cnt) AS scnt
      FROM bsum GROUP BY cell, b // 256
    )
    SELECT cell, [tt[d] / n FOR d IN {rng}] AS c FROM (
      SELECT cell,
             list_reduce(list_prepend({zero}, list(s2 ORDER BY sb)),
                         (acc, x) -> [acc[d] + x[d] FOR d IN {rng}]) AS tt,
             CAST(sum(scnt) AS BIGINT) AS n
      FROM sb GROUP BY cell) g
    """).fetchall()
    }
    assert got == want
