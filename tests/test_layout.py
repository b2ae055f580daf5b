"""Z-order layout key semantics."""

from pyspark.sql import Row, functions as F

from solar_logger_spark.operators.layout import morton_key, zorder_repartition


def _demorton(z, ndim=2, bits=16):
    out = [0] * ndim
    for i in range(bits):
        for j in range(ndim):
            out[j] |= ((z >> (i * ndim + j)) & 1) << i
    return tuple(out)


def test_morton_round_trip(spark):
    rows = [Row(a=a, b=b) for a in (0, 1, 5, 255, 65535)
            for b in (0, 3, 1024, 65535)]
    df = spark.createDataFrame(rows)
    got = df.select("a", "b", morton_key(["a", "b"]).alias("z")).collect()
    for r in got:
        assert _demorton(r.z) == (r.a, r.b)


def test_morton_width_guard(spark):
    import pytest
    df = spark.createDataFrame([Row(a=1, b=2, c=3, d=4)])
    with pytest.raises(ValueError, match="exceeds a long"):
        df.select(morton_key(["a", "b", "c", "d"], bits=16))


def test_zorder_partitions_bound_both_dims(spark):
    # a z-range partition must cover a bounded rectangle: with 64 x 64
    # points over a 6-bit grid in 16 partitions, each partition's
    # bounding box is far smaller than the full grid in BOTH dims
    rows = [Row(a=a, b=b) for a in range(64) for b in range(64)]
    df = spark.createDataFrame(rows)
    parts = zorder_repartition(df, ["a", "b"], bits=6, num_partitions=16)
    boxes = (
        parts.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("a") - F.min("a")).alias("da"),
            (F.max("b") - F.min("b")).alias("db"),
        )
        .collect()
    )
    assert len(boxes) == 16
    for r in boxes:
        # a 1/16 z-slice of a 64x64 grid is at most a 16x32 rectangle
        # (plus one straddle row/column at slice edges)
        assert r.da <= 32 and r.db <= 32, (r.pid, r.da, r.db)
