"""Similarity search over embedding columns (``array<float>``).

* ``cosine`` — JVM higher-order-function dot product (zip_with +
  aggregate in double precision, left-to-right — bit-reproducible).
* ``topk_bruteforce`` — broadcast the (small) query set against the
  corpus; one pass, no shuffle of the corpus, then a per-query top-k
  window. The exact baseline: at 100 TB this is a full scan per query
  batch, which is exactly what you want for bulk labeling jobs.
* ``hyperplane_buckets`` / ``topk_lsh`` — random-hyperplane LSH: a
  16-bit signature from sign(v·p) over fixed seeded planes; queries
  probe only their own bucket (optionally multi-probe). The scale path:
  turns per-query cost from O(N) into O(N / 2^bits) with approximate
  recall.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window, functions as F


def _to_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i in double, accumulated left-to-right (deterministic)."""
    return F.aggregate(
        F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query vector (cosine), deterministic
    tiebreak on neighbor id. Queries are broadcast; the corpus never
    shuffles — the only wide stage is the per-query top-k."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_vec"), F.col("c_vec")).alias("cos_sim"),
        )
    )
    win = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def neardup_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    prefilter_buckets: bool = False,
    dim: int = 64,
) -> DataFrame:
    """All pairs with cosine >= threshold. Exact by default (self cross
    pair join); with ``prefilter_buckets`` the pairing is restricted to
    LSH-bucket collisions first (the 100 TB path — near-dups at high
    cosine collide with high probability)."""
    a = embeddings.select(F.col(id_col).alias("a_id"), F.col(vec_col).alias("a_vec"))
    b = embeddings.select(F.col(id_col).alias("b_id"), F.col(vec_col).alias("b_vec"))
    if prefilter_buckets:
        buckets = hyperplane_buckets(embeddings, id_col=id_col, vec_col=vec_col,
                                     n_planes=8, dim=dim)
        ab = buckets.select(F.col(id_col).alias("a_id"), "bucket")
        bb = buckets.select(F.col(id_col).alias("b_id"), "bucket")
        pairs = ab.join(bb, "bucket").filter(F.col("a_id") < F.col("b_id"))
        pairs = pairs.join(a, "a_id").join(b, "b_id")
    else:
        pairs = a.crossJoin(b).filter(F.col("a_id") < F.col("b_id"))
    return (
        pairs.select(
            "a_id", "b_id", cosine(F.col("a_vec"), F.col("b_vec")).alias("cos_sim")
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def _plane_literals(n_planes: int, dim: int, seed: int = 7) -> list[list[float]]:
    """Fixed pseudo-random hyperplanes — seeded, so every run/session
    derives identical buckets."""
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).round(6).tolist()


def hyperplane_buckets(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """Sign-bit LSH bucket id per vector: bit p = (v · plane_p) >= 0."""
    planes = _plane_literals(n_planes, dim, seed)
    bucket = F.lit(0).cast("bigint")
    for p, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(x) for x in plane])
        bit = F.when(dot(F.col(vec_col), plane_col) >= 0, 1).otherwise(0)
        bucket = bucket + bit.cast("bigint") * F.lit(2 ** p).cast("bigint")
    return df.select(F.col(id_col), bucket.alias("bucket"))


def topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's LSH
    bucket. Same output shape as ``topk_bruteforce``."""
    cb = hyperplane_buckets(corpus, id_col, vec_col, n_planes, dim).join(
        corpus, id_col
    ).select(F.col(id_col).alias("neighbor_id"), "bucket",
             F.col(vec_col).alias("c_vec"))
    qb = hyperplane_buckets(queries, id_col, vec_col, n_planes, dim).join(
        queries, id_col
    ).select(F.col(id_col).alias("query_id"), "bucket",
             F.col(vec_col).alias("q_vec"))
    scored = (
        cb.join(F.broadcast(qb), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id",
                cosine(F.col("q_vec"), F.col("c_vec")).alias("cos_sim"))
    )
    win = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
