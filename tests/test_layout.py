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


def test_clustered_write_produces_disjoint_file_ranges(spark, tmp_path):
    """Files written by clustered_write carry disjoint min/max stats on
    the cluster column (checked straight from parquet footers), while a
    naive shuffled write overlaps — the property file/row-group pruning
    depends on."""
    import pyarrow.parquet as pq
    import glob
    from pyspark.sql import Row
    from solar_logger_spark.operators.layout import clustered_write

    rows = [Row(k=(i * 7919) % 10000, payload=i) for i in range(10000)]
    df = spark.createDataFrame(rows)

    def file_ranges(d):
        out = []
        for f in glob.glob(f"{d}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                col = md.row_group(rg).column(0)
                assert col.path_in_schema == "k"
                mins.append(col.statistics.min)
                maxs.append(col.statistics.max)
            out.append((min(mins), max(maxs)))
        return sorted(out)

    clustered = str(tmp_path / "clustered")
    clustered_write(df, clustered, ["k"], num_files=8)
    ranges = file_ranges(clustered)
    assert len(ranges) >= 4
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint, in order

    naive = str(tmp_path / "naive")
    df.repartition(8).write.parquet(naive)
    nranges = file_ranges(naive)
    overlaps = sum(
        1 for (l1, h1), (l2, h2) in zip(nranges, nranges[1:]) if h1 > l2
    )
    assert overlaps > 0  # hash layout overlaps; clustering is the fix
