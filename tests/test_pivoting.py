"""Unpivot fan-out (reference _load_queue, mqtt_classes.py:200-219) and
wide per-measurement views (SURVEY.md §1.3)."""

from datetime import datetime

from pyspark.sql import Row

from solar_logger_spark.operators.pivoting import pivot, unpivot


def test_unpivot_one_row_per_field(spark):
    wide = spark.createDataFrame(
        [Row(measurement="fx-1", ts=datetime(2024, 1, 1),
             battery_voltage=27.4, output_voltage=232.0, ac_mode=2.0)]
    )
    long = unpivot(wide, ids=["measurement", "ts"],
                   values=["battery_voltage", "output_voltage", "ac_mode"])
    rows = {r.field: r.value for r in long.collect()}
    assert rows == {"battery_voltage": 27.4, "output_voltage": 232.0,
                    "ac_mode": 2.0}
    assert long.columns == ["measurement", "ts", "field", "value"]


def test_pivot_round_trip(spark):
    long = spark.createDataFrame(
        [
            Row(measurement="fx-1", ts=datetime(2024, 1, 1), field=f, value=v)
            for f, v in [("a", 1.0), ("b", 2.0)]
        ]
    )
    wide = pivot(long, ["measurement", "ts"], field_values=["a", "b"])
    row = wide.collect()[0]
    assert (row.a, row.b) == (1.0, 2.0)
    back = unpivot(wide, ids=["measurement", "ts"], values=["a", "b"])
    assert {(r.field, r.value) for r in back.collect()} == {("a", 1.0), ("b", 2.0)}


def test_pivot_coerces_int_fields_to_double(spark):
    wide = spark.createDataFrame([Row(k=1, ints=3, dbls=2.5)])
    long = unpivot(wide, ids=["k"], values=["ints", "dbls"])
    assert dict(long.dtypes)["value"] == "double"
