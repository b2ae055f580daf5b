"""Result-mode and CSV-sink tests (reference S5/S6 + the implemented
``parse_stream``)."""

from __future__ import annotations

import glob

import pytest

from solar_logger_spark.io import results as R


@pytest.fixture()
def small_df(spark):
    return spark.createDataFrame(
        [("fx-1", 27.4), ("mx-1", None), ("dc-1", 8.4)], ["measurement", "value"]
    )


def test_records_mode(small_df):
    recs = R.execute(small_df, "flux")
    assert {r["measurement"] for r in recs} == {"fx-1", "mx-1", "dc-1"}
    assert all(set(r) == {"measurement", "value"} for r in recs)


def test_csv_mode(small_df):
    lines = R.execute(small_df, "csv")
    assert lines[0] == "measurement,value"
    assert "mx-1," in lines  # nulls serialize empty, like csv output


def test_stream_mode_is_lazy_iterator(small_df):
    it = R.execute(small_df, "stream")
    first = next(it)
    assert set(first) == {"measurement", "value"}
    assert len(list(it)) == 2


def test_unknown_mode_raises(small_df):
    with pytest.raises(ValueError, match="query_mode"):
        R.execute(small_df, "parquet")


def test_write_results_to_csv_single_file(small_df, tmp_path):
    path = str(tmp_path / "out")
    R.write_results_to_csv(small_df, path)
    parts = glob.glob(path + "/part-*.csv")
    assert len(parts) == 1  # reference writes exactly one file
    text = open(parts[0]).read()
    assert text.startswith("measurement,value")
    assert "fx-1,27.4" in text


def test_write_results_append_mode(small_df, tmp_path):
    path = str(tmp_path / "out")
    R.write_results_to_csv(small_df, path, mode="append")
    R.write_results_to_csv(small_df, path, mode="append")
    parts = glob.glob(path + "/part-*.csv")
    assert len(parts) == 2  # append keeps prior runs, like the reference's "a" mode


def test_health_check(spark):
    assert R.health_check(spark) is True


def test_register_views_sql_surface(spark, sf_dir):
    from solar_logger_spark.io.tables import register_views

    names = register_views(spark, sf_dir)
    assert {"events", "lineitem", "documents"} <= set(names)
    out = spark.sql(
        "SELECT event_type, count(*) AS n FROM events GROUP BY event_type"
    ).collect()
    assert len(out) == 5
