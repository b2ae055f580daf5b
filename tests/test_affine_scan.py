"""Segmented affine prefix scan (operators/affine_scan.py) — r12.

Pins the pinned-fold contract end to end: cross-engine bitwise
equality against the generated DuckDB oracle on a LONG single series
(crossing 64-row chunks and 4096-row blocks, so every hierarchy hop
is exercised), partition invariance, window-rank == segmented-rank
bit equality (the rank route is execution strategy, not semantics),
null series keys, and emit masking."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from solar_logger_spark.operators.affine_scan import (
    RANK_COL, affine_n_scan, scalar_affine_scan,
)
from solar_logger_spark.queries.affine_scan_sql import affine_scan_ctes


def _long_df(spark, n=12000, nseries=2, with_null_key=False):
    rng = np.random.default_rng(42)
    vals = rng.normal(50, 10, n).round(3)
    rows = []
    for i in range(n):
        key = None if (with_null_key and i % 7 == 3) else (
            f"s{i % nseries}"
        )
        rows.append((key, i, float(vals[i])))
    return spark.createDataFrame(
        rows, "s string, eid long, value double"
    ).withColumn("ts", F.col("eid").cast("timestamp"))


def _ema_cols():
    rn = F.col(RANK_COL)
    a = F.when(rn == 1, F.lit(0.0)).otherwise(F.lit(0.8))
    b = F.when(rn == 1, F.col("value")).otherwise(
        F.lit(0.2) * F.col("value")
    )
    return a, b


def _duck_ema(df):
    """The generated oracle on the same rows."""
    pdf = df.select("s", "eid", "value").toPandas()
    con = duckdb.connect()
    con.register("rows_in", pdf)
    ctes = affine_scan_ctes(
        tag="t_",
        base="SELECT s, eid, value FROM rows_in",
        series=["s"],
        order="eid",
        maps={
            "a11": "CASE WHEN rn = 1 THEN 0.0 ELSE 0.8 END",
            "c1": "CASE WHEN rn = 1 THEN value ELSE 0.2 * value END",
        },
        d=1,
    )
    out = con.execute(
        f"""WITH {ctes}
        SELECT x.eid AS eid, y.v1 AS ema
        FROM t_x x JOIN t__y y
          ON x.rn = y.rn AND x.s IS NOT DISTINCT FROM y.s"""
    ).fetchdf()
    return dict(zip(out["eid"].astype(int), out["ema"]))


def _bits(x):
    return np.float64(x).view(np.int64) if x is not None else None


def test_long_series_cross_engine_bitwise(spark):
    """12k rows on 2 series (≈6k rows/series → two 4096-blocks, ~94
    chunks): Spark scan == generated DuckDB oracle bit-for-bit across
    every chunk/block/mid hop."""
    df = _long_df(spark)
    a, b = _ema_cols()
    got = {
        r.eid: r.ema
        for r in scalar_affine_scan(
            df, a, b, ["s"], ts_col="ts", tiebreak=["eid"], alias="ema"
        ).collect()
    }
    want = _duck_ema(df)
    assert len(got) == len(want) == 12000
    assert all(_bits(got[i]) == _bits(want[i]) for i in got)


def test_partition_invariance_and_rank_modes(spark):
    """The result is independent of the input partitioning AND of the
    rank route — window rank (keyed window) and segmented rank
    (range-partitioned local ranks + offsets) produce identical bits,
    because the global rank of a unique order key is well-defined
    regardless of execution strategy."""
    df = _long_df(spark, n=9000, with_null_key=True)
    a, b = _ema_cols()

    def run(d, rank):
        return {
            r.eid: r.ema
            for r in scalar_affine_scan(
                d, a, b, ["s"], ts_col="ts", tiebreak=["eid"],
                alias="ema", rank=rank,
            ).collect()
        }

    base = run(df, "window")
    assert all(
        _bits(base[i]) == _bits(v)
        for i, v in run(df.repartition(13), "window").items()
    )
    seg = run(df.repartition(5), "segmented")
    assert all(_bits(base[i]) == _bits(v) for i, v in seg.items())
    # null series key rows are a real series, not dropped
    nulls = df.filter(F.col("s").isNull()).count()
    assert nulls > 0 and len(base) == 9000


def test_emit_masks_warmups_but_folds_identity(spark):
    """Rows with emit=False output null but their (identity) maps
    still hold the fold together — the value after a masked row
    continues the recursion exactly."""
    rows = [("a", i, float(v)) for i, v in enumerate(
        [10.0, 20.0, 30.0, 40.0])]
    df = spark.createDataFrame(
        rows, "s string, eid long, value double"
    ).withColumn("ts", F.col("eid").cast("timestamp"))
    rn = F.col(RANK_COL)
    # warm-up: first two rows identity+masked; seed at rn==3
    a = (
        F.when(rn <= 2, F.lit(1.0))
        .when(rn == 3, F.lit(0.0))
        .otherwise(F.lit(0.8))
    )
    b = (
        F.when(rn <= 2, F.lit(0.0))
        .when(rn == 3, F.col("value"))
        .otherwise(F.lit(0.2) * F.col("value"))
    )
    out = {
        r.eid: r.y
        for r in scalar_affine_scan(
            df, a, b, ["s"], ts_col="ts", tiebreak=["eid"],
            alias="y", emit=rn > 2,
        ).collect()
    }
    assert out[0] is None and out[1] is None
    assert out[2] == 30.0
    assert out[3] == 0.2 * 40.0 + 0.8 * 30.0


def test_affine_n_scan_d3_tower_matches_chained_scalar_algebra(spark):
    """The d=3 EMA tower tracks three chained scalar recursions to
    float noise (the pinned associations differ, the algebra must
    not)."""
    df = _long_df(spark, n=500, nseries=1)
    al = 0.2
    rn = F.col(RANK_COL)
    x = F.col("value")
    seed = rn == 1
    z = F.lit(0.0)
    nz = lambda v: F.when(seed, 0.0).otherwise(F.lit(v))  # noqa: E731
    coeffs = {
        "a11": nz(1 - al), "a12": z, "a13": z,
        "a21": nz(al * (1 - al)), "a22": nz(1 - al), "a23": z,
        "a31": nz(al * al * (1 - al)), "a32": nz(al * (1 - al)),
        "a33": nz(1 - al),
        "c1": F.when(seed, x).otherwise(F.lit(al) * x),
        "c2": F.when(seed, x).otherwise(F.lit(al * al) * x),
        "c3": F.when(seed, x).otherwise(F.lit(al ** 3) * x),
    }
    got = {
        r.eid: (r.e1, r.e2, r.e3)
        for r in affine_n_scan(
            df, 3, coeffs, ["s"], ts_col="ts", tiebreak=["eid"],
            out={"v1": "e1", "v2": "e2", "v3": "e3"},
        ).collect()
    }
    vals = [r.value for r in df.orderBy("eid").collect()]
    e1 = e2 = e3 = None
    for i, v in enumerate(vals):
        e1 = v if e1 is None else al * v + (1 - al) * e1
        e2 = v if i == 0 else al * e1 + (1 - al) * e2
        e3 = v if i == 0 else al * e2 + (1 - al) * e3
        for got_v, ref in zip(got[i], (e1, e2, e3)):
            assert got_v == pytest.approx(ref, rel=1e-9)


def test_reserved_column_collision_raises(spark):
    df = spark.createDataFrame(
        [("a", 1, 1.0, 2.0)], "s string, eid long, value double, _m double"
    ).withColumn("ts", F.col("eid").cast("timestamp"))
    a, b = _ema_cols()
    with pytest.raises(ValueError, match="collides"):
        scalar_affine_scan(df, a, b, ["s"], ts_col="ts",
                           tiebreak=["eid"])
