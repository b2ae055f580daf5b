"""Record linkage: fuzzy entity-resolution JOIN of a dirty feed to a
master catalog.

The dedup family (`operators/dedup.py`) answers "which rows of ONE
table are near-copies of each other"; linkage answers the other
production question — "which master record does each record of an
EXTERNAL, noisy feed refer to" (vendor feeds vs a product catalog,
crawled citations vs a paper index). The shapes differ: linkage is
asymmetric (every left row wants its best right match, unmatched left
rows must surface), and the candidate generator must tolerate noise in
whatever field it blocks on.

Candidate strategies (verification and best-match are shared):

* ``blocks=None`` (default) — **deletion neighborhoods** (FastSS /
  SymSpell; Bocek et al., 2007): each side emits every string
  obtainable by deleting up to ``max_dist`` characters; a pair within
  edit distance d is guaranteed to share a variant (take the aligned
  common subsequence of any ≤d-op edit script: it lies in both
  deletion neighborhoods), so the equi-join on variant hashes is a
  SOUND candidate generator and may only overgenerate — verification
  prunes. Per-string work is O(L^d) variants (L+1 at d=1, ~L²/2 at
  d=2; d>2 raises — use explicit blocks there), so candidate volume
  tracks corpus size LINEARLY and never the block-key histogram.
  This matters on exactly this repo's corpus shape: names drawn from
  a tiny vocabulary make every token block a double-digit percent of
  the table — token blocking OOMed at sf0.1 where deletes run in
  seconds (measured; cf. the edjoin-vs-band note in dedup.py).
  Variants join on ``xxhash64`` (8-byte shuffle keys); a hash
  collision can only ADD a candidate the verifier rejects.
* ``blocks=[key_fn, ...]`` — classic **multi-key blocking**:
  candidates = union of equi-joins on several cheap derived keys
  (first token, second token, ...), deduplicated before verification.
  A single key silently drops every pair whose noise hits that key —
  multiple passes are the standard ER hedge. NULL keys generate no
  candidates (SQL join semantics). Right for high-cardinality
  blocking attributes; the skew risk when they're not is the
  documented trade against the deletes strategy.

Verification is Spark's thresholded ``levenshtein(a, b, d)``
(early-exit past ``d``, returns -1) behind a length-band prefilter —
the same JVM-side discipline as ``edit_distance_pairs``
(`dedup.py:1067`). Exact integer distances: engine-independent.
Best-match selection is a per-left-row min over (dist, right_id)
structs — a partial-combining hash aggregate, not a global window —
and ``keep_unmatched=True`` left-joins winners back so records no
candidate pass reached surface with NULL match columns instead of
vanishing.

At 100 TB the catalog side is usually the small one (broadcastable);
the feed streams through variant generation map-side and shuffles
once. Reference parity: none — the reference engine has no
string-matching surface; this is the beyond-reference training-data
layer (SURVEY.md "LLM-data-pipeline operators").
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, functions as F

# Block-key extractors for the explicit-blocking strategy: whitespace
# tokens 1 and 2. try_element_at (not element_at: ANSI mode THROWS
# past the end) returns NULL past the end, so one-token strings simply
# skip pass 2.
DEFAULT_BLOCKS: tuple[Callable[[Column], Column], ...] = (
    lambda c: F.try_element_at(F.split(c, " "), F.lit(1)),
    lambda c: F.try_element_at(F.split(c, " "), F.lit(2)),
)


def deletion_variants(c: Column, depth: int) -> Column:
    """All strings reachable from ``c`` by deleting up to ``depth``
    characters (depth 0..2), duplicates removed. Pure JVM array HOFs.
    sequence(1, 0) DESCENDS in Spark, so empty/short strings are
    guarded explicitly."""
    if not 0 <= depth <= 2:
        raise ValueError("deletion_variants supports depth 0..2")
    L = F.length(c)
    empty = F.array().cast("array<string>")

    def drop_one(s: Column, slen: Column) -> Column:
        # all single-character deletions of s (slen = length(s))
        return F.transform(
            F.sequence(F.lit(1), slen),
            lambda i: F.concat(
                F.substr(s, F.lit(1), i - 1), F.substr(s, i + 1, slen)
            ),
        )

    out = F.array(c)
    if depth >= 1:
        d1 = F.when(L >= 1, drop_one(c, L)).otherwise(empty)
        out = F.concat(out, d1)
    if depth >= 2:
        d2 = F.when(
            L >= 2,
            F.flatten(F.transform(d1, lambda v: drop_one(v, L - 1))),
        ).otherwise(empty)
        out = F.concat(out, d2)
    return F.array_distinct(out)


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_col: str,
    right_id: str,
    right_col: str,
    max_dist: int = 2,
    blocks: Sequence[Callable[[Column], Column]] | None = None,
    keep_unmatched: bool = True,
    broadcast_right: bool = False,
) -> DataFrame:
    """Best-match fuzzy join: for each ``left`` row, the ``right`` row
    with minimum ``levenshtein(left_col, right_col) <= max_dist``
    (ties: smallest ``right_id``; ``right_id`` must be unique — it's
    the catalog key). Output columns: ``left_id``, ``left_col``,
    ``match_<right_id>``, ``match_<right_col>``, ``dist`` — match
    columns NULL for unmatched left rows when ``keep_unmatched``.
    Candidates come from deletion neighborhoods (``blocks=None``) or
    explicit multi-key blocking — see the module docstring for when
    each scales."""
    if max_dist < 0:
        raise ValueError("max_dist must be >= 0")
    if blocks is not None and not blocks:
        raise ValueError("explicit blocking needs at least one block key")
    if blocks is None and max_dist > 2:
        raise ValueError(
            "deletion-neighborhood candidates support max_dist <= 2 "
            "(variant count is O(L^d)); pass explicit blocks= beyond"
        )
    l_sel = left.select(
        F.col(left_id).alias("_lid"), F.col(left_col).alias("_ltext")
    )
    r_sel = right.select(
        F.col(right_id).alias("_rid"), F.col(right_col).alias("_rtext")
    )
    if broadcast_right:
        r_sel = F.broadcast(r_sel)

    if blocks is None:
        # FastSS over DISTINCT strings. Duplicate-heavy text columns
        # (this repo's tiny-vocabulary corpus: thousands of rows per
        # distinct name) would make a row-level variant join emit
        # |left dups| x |right dups| x |shared variants| rows per
        # name pair — measured as a GC wall at sf0.1. Distinct-side
        # work is O(distinct texts x L^2) instead, and the best match
        # per left ROW equals the best match per left TEXT: all rows
        # of one right text share one distance, so the (dist,
        # right_id) minimum is (dist, min right_id of that text).
        # The variant stream is never broadcast even when
        # broadcast_right is set — it is ~L^2 x the catalog; the
        # variant equi-join shuffles 8-byte keys instead.
        lt = l_sel.select("_ltext").distinct()
        rt = r_sel.groupBy("_rtext").agg(F.min("_rid").alias("_rmin"))
        lv = lt.select(
            "_ltext",
            F.explode(
                deletion_variants(F.col("_ltext"), max_dist)
            ).alias("_v"),
        ).select("_ltext", F.xxhash64("_v").alias("_vh"))
        rv = rt.select(
            "_rtext",
            F.explode(
                deletion_variants(F.col("_rtext"), max_dist)
            ).alias("_v"),
        ).select("_rtext", F.xxhash64("_v").alias("_vh"))
        text_pairs = (
            lv.join(rv, "_vh")
            .select("_ltext", "_rtext")
            .dropDuplicates(["_ltext", "_rtext"])
        )
        tdist = F.levenshtein(F.col("_ltext"), F.col("_rtext"), max_dist)
        scored_t = (
            text_pairs.filter(
                F.abs(F.length("_ltext") - F.length("_rtext")) <= max_dist
            )
            .join(rt, "_rtext")
            .select(
                "_ltext", "_rtext", "_rmin",
                tdist.cast("long").alias("dist"),
            )
            .filter(F.col("dist") >= 0)
        )
        best_t = scored_t.groupBy("_ltext").agg(
            F.min(F.struct("dist", "_rmin", "_rtext")).alias("_w")
        ).select(
            "_ltext",
            F.col("_w._rmin").alias(f"match_{right_id}"),
            F.col("_w._rtext").alias(f"match_{right_col}"),
            F.col("_w.dist").alias("dist"),
        )
        how = "left" if keep_unmatched else "inner"
        return l_sel.join(best_t, "_ltext", how).select(
            F.col("_lid").alias(left_id),
            F.col("_ltext").alias(left_col),
            f"match_{right_id}",
            f"match_{right_col}",
            "dist",
        )
    else:
        passes = []
        for key in blocks:
            lk = l_sel.withColumn("_bk", key(F.col("_ltext")))
            rk = r_sel.withColumn("_bk", key(F.col("_rtext")))
            passes.append(
                lk.join(rk, "_bk").select(
                    "_lid", "_ltext", "_rid", "_rtext"
                )
            )
        cands = passes[0]
        for p in passes[1:]:
            cands = cands.unionByName(p)
        cands = cands.dropDuplicates(["_lid", "_rid"])

    dist = F.levenshtein(F.col("_ltext"), F.col("_rtext"), max_dist)
    scored = (
        cands.filter(
            F.abs(F.length("_ltext") - F.length("_rtext")) <= max_dist
        )
        .select("_lid", "_rid", dist.cast("long").alias("dist"))
        .filter(F.col("dist") >= 0)
    )
    # Deterministic winner per left row: lexicographic min over
    # (dist, right_id) as a struct aggregate — a partial-combining
    # hash aggregate, not a global window.
    best = scored.groupBy("_lid").agg(
        F.min(F.struct("dist", "_rid")).alias("_w")
    ).select(
        "_lid",
        F.col("_w._rid").alias(f"match_{right_id}"),
        F.col("_w.dist").alias("dist"),
    )
    how = "left" if keep_unmatched else "inner"
    out = l_sel.join(best, "_lid", how)
    r_names = right.select(
        F.col(right_id).alias(f"match_{right_id}"),
        F.col(right_col).alias(f"match_{right_col}"),
    )
    if broadcast_right:
        r_names = F.broadcast(r_names)
    return (
        out.join(r_names, f"match_{right_id}", "left")
        .select(
            F.col("_lid").alias(left_id),
            F.col("_ltext").alias(left_col),
            f"match_{right_id}",
            f"match_{right_col}",
            "dist",
        )
    )
