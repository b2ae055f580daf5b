"""QueryBuilder semantics — the reference's golden-string tests
(tests/classes/test_query_classes.py) re-expressed as golden *results*
over a small in-memory point table."""

from datetime import datetime

import pytest
from pyspark.sql import Row

from solar_logger_spark import QueryBuilder


@pytest.fixture(scope="module")
def points(spark):
    rows = []
    base = datetime(2024, 1, 1)
    for i in range(48):  # 48 hourly points, 2 measurements x 2 fields
        ts = base.replace(hour=i % 24, day=1 + i // 24)
        rows.append(Row(measurement="fx-1", ts=ts, field="battery_voltage",
                        value=24.0 + i * 0.1))
        rows.append(Row(measurement="mx-1", ts=ts, field="pv_current",
                        value=float(i % 7)))
    return spark.createDataFrame(rows)


def test_range_inclusive_start_exclusive_stop(points):
    out = (
        QueryBuilder(points)
        .range(datetime(2024, 1, 1, 6), datetime(2024, 1, 1, 8))
        .to_df()
        .collect()
    )
    hours = {r.ts.hour for r in out}
    assert hours == {6, 7}


def test_or_joined_filters_one_band(points):
    qb = (
        QueryBuilder(points)
        .filter("measurement", "fx-1", joiner="or")
        .filter("measurement", "mx-1", joiner="or")
    )
    assert qb.to_df().count() == points.count()


def test_conjunctive_bands(points):
    out = (
        QueryBuilder(points)
        .filter("measurement", "fx-1")
        .filter("value", 26.0, op=">=", new_band=True)
        .to_df()
    )
    rows = out.collect()
    assert rows and all(r.measurement == "fx-1" and r.value >= 26.0 for r in rows)


def test_filter_in(points):
    assert (
        QueryBuilder(points).filter_in("field", ["pv_current"]).to_df().count()
        == 48
    )


def test_aggregate_window_mean_stop_labeled(points):
    out = (
        QueryBuilder(points)
        .filter("measurement", "fx-1")
        .aggregate_window("1d", "mean")
        .to_df()
        .collect()
    )
    # windows labeled by END: day-1 window ends at 2024-01-02
    by_ts = {r.ts: r.value for r in out}
    assert datetime(2024, 1, 2) in by_ts
    expected_day1 = sum(24.0 + i * 0.1 for i in range(24)) / 24
    assert abs(by_ts[datetime(2024, 1, 2)] - expected_day1) < 1e-9


def test_sort_desc(points):
    out = (
        QueryBuilder(points)
        .filter("measurement", "mx-1")
        .sort("value", desc=True)
        .to_df()
        .collect()
    )
    vals = [r.value for r in out]
    assert vals == sorted(vals, reverse=True)


def test_fixed_pipeline_order_filter_before_agg(points):
    """Filters always apply pre-aggregation (reference _build_string
    order from→range→filter→aggregate→sort)."""
    qb = QueryBuilder(points).aggregate_window("1d", "count")
    qb.filter("measurement", "fx-1")  # added after agg, still applies first
    out = {(r.measurement, r.ts): r.value for r in qb.to_df().collect()}
    assert all(m == "fx-1" for m, _ in out)
    assert out[("fx-1", datetime(2024, 1, 2))] == 24


def test_records_and_stream_modes(points):
    qb = QueryBuilder(points).filter("field", "pv_current").sort("ts")
    recs = qb.records()
    assert len(recs) == 48 and isinstance(recs[0], dict)
    assert next(qb.stream()) == recs[0]


def test_csv_mode(points, tmp_path):
    QueryBuilder(points).filter("measurement", "fx-1").to_csv(str(tmp_path / "out"))
    files = list((tmp_path / "out").glob("*.csv"))
    assert len(files) == 1
    header = files[0].read_text().splitlines()[0]
    assert set(header.split(",")) == {"measurement", "ts", "field", "value"}


def test_limit_caps_rows_after_sort(spark, sf_dir):
    from solar_logger_spark.io.tables import load_table
    from solar_logger_spark.query.builder import QueryBuilder

    qb = QueryBuilder(
        load_table(spark, sf_dir, "events"),
        ts_col="ts", value_col="value", series_cols=("event_type",),
    )
    rows = qb.sort("value", desc=True).limit(7).records()
    assert len(rows) == 7
    vals = [r["value"] for r in rows]
    assert vals == sorted(vals, reverse=True)


def test_to_flux_renders_corrected_syntax(spark, sf_dir):
    """The reference golden-asserts BROKEN Flux (unclosed parens,
    dangling joiners — its tests at test_query_classes.py:110-141).
    Ours must render the same pipeline with every paren closed and
    joiners only between predicates."""
    from solar_logger_spark.io.tables import load_table
    from solar_logger_spark.query.builder import QueryBuilder

    qb = (
        QueryBuilder(load_table(spark, sf_dir, "events"), ts_col="ts")
        .range("-5m")
        .filter("_measurement", "fx-1")
        .filter("_measurement", "mx-1", joiner="or")
        .filter("_measurement", "dc-1", new_band=True)
        .aggregate_window("1h", "mean")
        .sort("ts", desc=True)
        .limit(5)
    )
    flux = str(qb)
    assert flux == (
        'from(bucket: "df") |> range(start: -5m) |> '
        "filter(fn: (r) => r[\"_measurement\"] == 'fx-1' "
        "or r[\"_measurement\"] == 'mx-1') |> "
        "filter(fn: (r) => r[\"_measurement\"] == 'dc-1') |> "
        "aggregateWindow(every: 1h, fn: mean) |> "
        'sort(columns: ["ts"], desc: true) |> limit(n: 5)'
    )
    assert flux.count("(") == flux.count(")")  # §2.11.1 corrected
    assert not flux.rstrip().endswith("or")
