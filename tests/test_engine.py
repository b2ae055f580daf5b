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
