"""Product quantization (PQ) for embedding columns — the compressed ANN
path for corpora where raw vectors no longer fit the cluster.

A d-dim float vector (4d bytes) becomes m uint8 codes (m bytes,
d/m-dim subspace each): 32× compression at m = d/2. Queries score
compressed codes with ADC (asymmetric distance computation): per query,
one m×ks lookup table of exact subspace distances, then each corpus
vector costs m table lookups instead of d multiplies. Combined with the
IVF coarse quantizer (`similarity.topk_ivf`) this is the standard
billion-scale layout (Jégou et al., "Product Quantization for Nearest
Neighbor Search", TPAMI 2011 — public).

Spark shape: codebooks are tiny (m × ks × d/m floats) and train on a
deterministic hash-sampled subset driver-side (standard practice — the
codebook is a model artifact, not data). Encoding and ADC scoring are
Arrow-batched ``mapInPandas`` kernels over broadcast codebooks — pure
numpy inner loops, embarrassingly parallel, no shuffle except the final
top-k.

Vectors are L2-normalized before quantization so L2 ranking ≡ cosine
ranking (1 − cos = ‖a−b‖²/2 on the unit sphere).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F


def _normalize(mat: "np.ndarray") -> "np.ndarray":
    norms = np.sqrt((mat * mat).sum(axis=1))
    norms[norms == 0] = 1.0
    return mat / norms[:, None]


def _collect_sample(
    df: DataFrame, n: int, id_col: str, vec_col: str
) -> "np.ndarray":
    """Deterministic training sample: the n rows with smallest id hash
    (partition-independent, same sample at any scale)."""
    rows = (
        df.select(id_col, vec_col)
        .withColumn("_h", F.xxhash64(F.col(id_col)))
        .orderBy("_h", id_col)
        .limit(n)
        .collect()
    )
    return _normalize(
        np.array([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    )


def _lloyd(data: "np.ndarray", k: int, iters: int) -> "np.ndarray":
    """Plain Euclidean k-means on a small in-memory matrix (codebook
    training); deterministic seeding by first-k rows of the hash-ordered
    sample."""
    k = min(k, len(data))
    cents = data[:k].copy()
    for _ in range(iters):
        d2 = ((data[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(k):
            members = data[assign == j]
            if len(members):
                cents[j] = members.mean(axis=0)
    return cents


def train_codebooks(
    df: DataFrame,
    m: int = 8,
    ks: int = 16,
    sample_size: int = 2048,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "np.ndarray":
    """Train the m per-subspace codebooks → array (m, ks, d/m)."""
    sample = _collect_sample(df, sample_size, id_col, vec_col)
    d = sample.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    books = np.zeros((m, ks, dsub))
    for j in range(m):
        sub = sample[:, j * dsub : (j + 1) * dsub]
        got = _lloyd(sub, ks, iters)
        books[j, : len(got)] = got
        if len(got) < ks:  # degenerate tiny corpus: repeat last centroid
            books[j, len(got):] = got[-1]
    return books


def encode(
    df: DataFrame,
    codebooks: "np.ndarray",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Quantize vectors to PQ codes: ``(id, codes array<int>)`` with one
    uint8-range code per subspace. One map-only pass."""
    import pandas as pd

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(np.asarray(codebooks))

    def _enc(batches):
        books = bc.value
        m, ks, dsub = books.shape
        for pdf in batches:
            if len(pdf) == 0:
                continue
            a = _normalize(
                np.array(
                    [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
                )
            )
            codes = np.empty((len(a), m), dtype=np.int32)
            for j in range(m):
                sub = a[:, j * dsub : (j + 1) * dsub]
                d2 = (
                    (sub[:, None, :] - books[j][None, :, :]) ** 2
                ).sum(axis=2)
                codes[:, j] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "codes": list(codes)}
            )

    return df.select(id_col, vec_col).mapInPandas(
        _enc, f"{id_col} long, codes array<int>"
    )


def topk_adc(
    encoded: DataFrame,
    queries: DataFrame,
    codebooks: "np.ndarray",
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank: int = 0,
    raw: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k neighbors by ADC over PQ codes: exact query ↔
    reconstructed-corpus L2 on the unit sphere (≡ cosine ranking).

    ``rerank > 0`` enables the standard production two-stage retrieval:
    ADC produces a ``rerank``-deep candidate shortlist from the
    compressed codes, then the shortlist alone is re-scored exactly
    against ``raw`` (the uncompressed vectors) — full-precision math on
    k·O(10) candidates per query instead of the whole corpus, which is
    what makes PQ usable when quantization distortion is comparable to
    the neighbor gaps (e.g. near-uniform embeddings).

    Output matches the other ANN operators: (query_id, neighbor_id,
    approx_dist, rank) — smaller distance is nearer (with re-ranking,
    ``approx_dist`` is the exact unit-sphere squared L2). The per-batch
    ADC cost is a numpy table gather, m adds per corpus code."""
    import pandas as pd

    spark = encoded.sparkSession
    books = np.asarray(codebooks)
    qrows = queries.select(id_col, vec_col).collect()
    qids = np.array([r[id_col] for r in qrows])
    qmat = _normalize(
        np.array([np.asarray(r[vec_col], dtype=np.float64) for r in qrows])
    )
    m, ks, dsub = books.shape
    # per-query distance tables: (n_q, m, ks) exact subspace distances
    tables = np.empty((len(qids), m, ks))
    for j in range(m):
        qsub = qmat[:, j * dsub : (j + 1) * dsub]
        tables[:, j, :] = (
            (qsub[:, None, :] - books[j][None, :, :]) ** 2
        ).sum(axis=2)
    bc = spark.sparkContext.broadcast((qids, tables))

    def _score(batches):
        ids, tabs = bc.value
        n_q = len(ids)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes = np.array(list(pdf["codes"]), dtype=np.int64)  # (n, m)
            n = len(codes)
            # gather: dist[q, i] = Σ_j tabs[q, j, codes[i, j]]
            dist = np.zeros((n_q, n))
            for j in range(m):
                dist += tabs[:, j, :][:, codes[:, j]]
            out = pd.DataFrame(
                {
                    "query_id": np.repeat(ids, n),
                    "neighbor_id": np.tile(pdf[id_col].to_numpy(), n_q),
                    "approx_dist": dist.ravel(),
                }
            )
            yield out

    scored = encoded.mapInPandas(
        _score, "query_id long, neighbor_id long, approx_dist double"
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_dist").asc(), F.col("neighbor_id").asc()
    )
    cut = rerank if rerank > 0 else k
    shortlist = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= cut)
        .select("query_id", "neighbor_id", "approx_dist", "rank")
    )
    if rerank <= 0:
        return shortlist
    if raw is None:
        raise ValueError("rerank > 0 requires the raw vector DataFrame")

    # exact re-scoring of the shortlist: per-query numpy against the
    # candidates' raw vectors (|shortlist| = n_q × rerank rows)
    cand = shortlist.join(
        raw.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_v")
        ),
        "neighbor_id",
    )
    bcq = encoded.sparkSession.sparkContext.broadcast((qids, qmat))

    def _exact(batches):
        import pandas as pd

        ids_, qm = bcq.value
        pos = {int(i): p for p, i in enumerate(ids_)}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            a = _normalize(
                np.array([np.asarray(v, dtype=np.float64) for v in pdf["_v"]])
            )
            qv = qm[[pos[int(q)] for q in pdf["query_id"]]]
            d = ((a - qv) ** 2).sum(axis=1)
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(),
                    "neighbor_id": pdf["neighbor_id"].to_numpy(),
                    "approx_dist": d,
                }
            )

    exact = cand.select("query_id", "neighbor_id", "_v").mapInPandas(
        _exact, "query_id long, neighbor_id long, approx_dist double"
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("approx_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "approx_dist", "rank")
    )
