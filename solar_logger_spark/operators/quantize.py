"""Int8 embedding quantization: per-dimension min-max affine codes.

The standard storage/serving compression step for embedding tables at
100 TB scale (4x smaller than float32): fit one global ``(min, max)``
per dimension, encode each value to an integer code in ``[0, 254]``
(255 levels — int8's non-sign range), decode as
``mn + code * ((mx - mn) / 254)``.

Scale shape: the fit is one ``posexplode`` + dim-group hash agg
(map-side combined, so the exchange carries ``n_partitions x dim``
rows, not ``n_rows x dim``), collected as a bounded dim-length literal;
the encode is a pure map over higher-order array expressions — no
shuffle at any corpus size, whole-stage codegen throughout, no Python.

Numerics are bit-reproducible against a SQL oracle: the affine
transform is evaluated in double with one fixed parenthesization
(``((x - mn) / (mx - mn)) * 254.0``), ``round`` on non-negative values
is half-up in both engines, and the per-vector summaries are either
integer-exact (``code_sum``) or order-independent (``max``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# 255 quantization levels: codes 0..254
LEVELS_MINUS_1 = 254


def fit_minmax(
    df: DataFrame, vec_col: str = "embedding"
) -> tuple[list[float], list[float]]:
    """Per-dimension global (min, max) over the corpus.

    One posexplode + hash agg; the collect is bounded at one row per
    dimension (64 here), the same bounded-literal pattern as
    ``similarity.seeded_centroids``.
    """
    rows = (
        df.select(
            F.posexplode(
                F.transform(F.col(vec_col), lambda x: x.cast("double"))
            ).alias("dim", "v")
        )
        .groupBy("dim")
        .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
        .collect()
    )
    rows.sort(key=lambda r: r["dim"])
    return [r["mn"] for r in rows], [r["mx"] for r in rows]


def quantize_int8(
    df: DataFrame,
    mins: list[float],
    maxs: list[float],
    vec_col: str = "embedding",
) -> DataFrame:
    """Attach ``codes`` (array<int> in 0..254) plus integrity summaries:
    ``code_sum`` (integer-exact checksum), ``min_code``/``max_code``,
    and ``max_abs_err`` (max reconstruction error — order-independent,
    so exactly comparable across engines).

    Degenerate dimensions (mx == mn) encode to 0 and decode to mn
    (zero error). Values are within [mn, mx] by construction of the
    global fit, so no clamping is needed.
    """
    from solar_logger_spark.operators.litfast import dlit

    mn = dlit([float(v) for v in mins])
    mx = dlit([float(v) for v in maxs])
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))

    def _code(x, i):
        lo = F.element_at(mn, i + 1)
        hi = F.element_at(mx, i + 1)
        return (
            F.when(
                hi > lo,
                F.round(((x - lo) / (hi - lo)) * F.lit(float(LEVELS_MINUS_1)))
                .cast("int"),
            )
            .otherwise(F.lit(0))
        )

    # materialize codes once, then derive errors from the materialized
    # column — Catalyst does not CSE across transform() lambda bodies,
    # so recomputing _code inside the error lambda would double the
    # per-element encode work in the hot map
    with_codes = df.withColumn("codes", F.transform(vec, _code))

    def _err(x, i):
        lo = F.element_at(mn, i + 1)
        hi = F.element_at(mx, i + 1)
        code = F.element_at(F.col("codes"), i + 1).cast("double")
        deq = lo + code * ((hi - lo) / F.lit(float(LEVELS_MINUS_1)))
        return F.abs(x - deq)

    codes = F.col("codes")
    return with_codes.withColumns(
        {
            "code_sum": F.aggregate(
                codes, F.lit(0).cast("long"), lambda acc, c: acc + c
            ),
            "min_code": F.array_min(codes),
            "max_code": F.array_max(codes),
            "max_abs_err": F.array_max(F.transform(vec, _err)),
        }
    )
