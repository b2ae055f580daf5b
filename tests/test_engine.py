"""SolarEngine facade: query + ingest + result modes end-to-end."""

from __future__ import annotations

from datetime import datetime

from solar_logger_spark.engine import SolarEngine
from solar_logger_spark.streaming.decode import MX_FIELDS, encode_packet


def test_engine_query_pipeline(spark, sf_dir):
    engine = SolarEngine(spark)
    df = (
        engine.query("events", sf_dir, series_cols=("event_type",))
        .range(datetime(2024, 1, 5), datetime(2024, 1, 25))
        .filter("event_type", "click")
        .aggregate_window("1d", "mean")
        .to_df()
    )
    rows = engine.execute(df, "flux")
    assert rows and set(rows[0]) == {"ts", "event_type", "value"}


def test_engine_sql_surface(spark, sf_dir):
    engine = SolarEngine(spark)
    assert "events" in engine.register(sf_dir)
    n = engine.sql("SELECT count(*) AS n FROM events").collect()[0].n
    assert n > 0


def test_engine_ingest_to_points(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    store = str(tmp_path / "store")

    values = {f: 1.5 for f in MX_FIELDS}
    pkt = encode_packet("mx-1", 1704067200, values)
    spark.createDataFrame(
        [
            ("mate/mx-1/status", b"online", datetime(2024, 1, 1)),
            ("mate/mx-1/mx-status", pkt, datetime(2024, 1, 1)),
        ],
        "topic string, payload binary, arrival_ts timestamp",
    ).write.parquet(input_dir)

    engine = SolarEngine(spark, store_dir=store)
    q = engine.ingest(input_dir)
    q.awaitTermination(120)

    pts = engine.points()
    assert pts.count() == len(MX_FIELDS)
    assert set(pts.columns) >= {"measurement", "ts", "field", "value"}


def test_point_store_partition_pruning(spark, tmp_path):
    """Time-range + measurement predicates must prune the point store's
    (measurement, date) partitions, not scan them."""
    from solar_logger_spark.streaming.decode import MX_FIELDS, DC_FIELDS, encode_packet

    input_dir = str(tmp_path / "in")
    store = str(tmp_path / "store")
    rows = [("mate/mx-1/status", b"online", datetime(2024, 1, 1)),
            ("mate/dc-1/status", b"online", datetime(2024, 1, 1))]
    for day, epoch in [(1, 1704067200), (2, 1704153600), (3, 1704240000)]:
        rows.append(
            ("mate/mx-1/mx-status",
             encode_packet("mx-1", epoch, {f: float(day) for f in MX_FIELDS}),
             datetime(2024, 1, day))
        )
        rows.append(
            ("mate/dc-1/dc-status",
             encode_packet("dc-1", epoch, {f: float(day) for f in DC_FIELDS}),
             datetime(2024, 1, day))
        )
    spark.createDataFrame(
        rows, "topic string, payload binary, arrival_ts timestamp"
    ).write.parquet(input_dir)

    engine = SolarEngine(spark, store_dir=store)
    engine.ingest(input_dir).awaitTermination(120)

    from pyspark.sql import functions as F

    pruned = engine.points().filter(
        (F.col("measurement") == "mx-1") & (F.col("date") == "2024-01-02")
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # 1 of 6 (measurement × date) partitions read
    assert pruned.count() == len(MX_FIELDS)
    files = {r[0] for r in pruned.select(F.input_file_name()).distinct().collect()}
    assert all("measurement=mx-1" in f and "date=2024-01-02" in f for f in files)


def test_wide_view_per_measurement(spark):
    from pyspark.sql import Row

    from solar_logger_spark.engine import wide_view
    from solar_logger_spark.streaming.decode import MX_FIELDS

    ts = datetime(2024, 1, 1)
    points = spark.createDataFrame(
        [Row(measurement="mx-1", ts=ts, field=f, value=float(i))
         for i, f in enumerate(MX_FIELDS)]
        + [Row(measurement="dc-1", ts=ts, field="bat_current", value=9.9)]
    )
    wide = wide_view(points, "mx-1")
    assert set(wide.columns) == {"ts", *MX_FIELDS}
    row = wide.collect()[0]
    assert row.bat_voltage == float(MX_FIELDS.index("bat_voltage"))


def test_ingest_then_query_full_loop(spark, tmp_path):
    """The reference's two programs end-to-end: ingest packets, then run
    the Flux-pipeline query surface over the stored points."""
    from solar_logger_spark.streaming.decode import MX_FIELDS, encode_packet

    input_dir = str(tmp_path / "in")
    store = str(tmp_path / "store")
    rows = [("mate/mx-1/status", b"online", datetime(2024, 1, 1))]
    for i, bv in enumerate([10.0, 20.0, 30.0]):
        values = {f: bv for f in MX_FIELDS}
        rows.append(
            ("mate/mx-1/mx-status",
             encode_packet("mx-1", 1704067200 + i * 1800, values),
             datetime(2024, 1, 1))
        )
    spark.createDataFrame(
        rows, "topic string, payload binary, arrival_ts timestamp"
    ).write.parquet(input_dir)

    engine = SolarEngine(spark, store_dir=store)
    engine.ingest(input_dir).awaitTermination(120)

    out = (
        engine.query_points()
        .range(datetime(2024, 1, 1), datetime(2024, 1, 2))
        .filter("measurement", "mx-1")
        .filter("field", "bat_voltage", new_band=True)
        .aggregate_window("1h", "mean")
        .sort("ts")
        .records()
    )
    # events at 00:00, 00:30 (window →01:00, mean 15) and 01:00 (→02:00)
    assert [(r["ts"].hour, r["value"]) for r in out] == [(1, 15.0), (2, 30.0)]


def test_engine_query_flux_text(spark, sf_dir):
    from solar_logger_spark.engine import SolarEngine

    eng = SolarEngine(spark)
    df = eng.query_flux(
        'from(bucket: "B")\n\t|> range(start: 2024-01-01, stop: 2024-02-01)'
        '\n\t|> filter(fn: (r) => r["_measurement"] == "error")'
        "\n\t|> aggregateWindow(every: 1d, fn: count",
        table="events",
        sf_dir=sf_dir,
        field_map={"_measurement": "event_type"},
        series_cols=("event_type",),
    ).to_df()
    rows = df.collect()
    assert len(rows) > 0
    assert all(r.event_type == "error" for r in rows)
