"""Status-gate / as-of semantics (reference J1: data processed only
while the device's latest status is online, mqtt_classes.py:229-233)."""

from datetime import datetime

import pytest
from pyspark.sql import Row

from solar_logger_spark.operators.asof import asof_join, latest_per_key, status_gate


def ts(h, m=0):
    return datetime(2024, 1, 1, h, m)


@pytest.fixture(scope="module")
def status(spark):
    return spark.createDataFrame(
        [
            Row(device="dc-1", ts=ts(0), status="online"),
            Row(device="dc-1", ts=ts(5), status="offline"),
            Row(device="fx-1", ts=ts(1), status="online"),
            Row(device="mx-1", ts=ts(2), status="offline"),
            Row(device="mx-1", ts=ts(3), status="online"),
        ]
    )


@pytest.fixture(scope="module")
def data(spark):
    return spark.createDataFrame(
        [
            Row(device=d, ts=ts(6, i), value=float(i))
            for i, d in enumerate(["dc-1", "fx-1", "mx-1", "fx-1"])
        ]
    )


def test_latest_per_key(status):
    latest = {r.device: (r.ts, r.status)
              for r in latest_per_key(status, ["device"]).collect()}
    assert latest == {
        "dc-1": (ts(5), "offline"),
        "fx-1": (ts(1), "online"),
        "mx-1": (ts(3), "online"),
    }


def test_status_gate_keeps_online_only(data, status):
    kept = status_gate(data, status, ["device"]).collect()
    assert {r.device for r in kept} == {"fx-1", "mx-1"}
    assert len(kept) == 3  # both fx-1 rows pass


def test_asof_join_picks_most_recent_at_or_before(spark, status):
    left = spark.createDataFrame(
        [
            Row(device="dc-1", ts=ts(4)),   # before offline@5 → online
            Row(device="dc-1", ts=ts(5)),   # exactly at offline@5 → offline
            Row(device="dc-1", ts=ts(9)),   # after → offline
            Row(device="mx-1", ts=ts(2, 30)),  # between offline@2, online@3
            Row(device="fx-1", ts=ts(0)),   # before any status → null
        ]
    )
    out = {(r.device, r.ts): r.status
           for r in asof_join(left, status, ["device"]).collect()}
    assert out[("dc-1", ts(4))] == "online"
    assert out[("dc-1", ts(5))] == "offline"
    assert out[("dc-1", ts(9))] == "offline"
    assert out[("mx-1", ts(2, 30))] == "offline"
    assert out[("fx-1", ts(0))] is None


def test_asof_join_inner_drops_unmatched(spark, status):
    left = spark.createDataFrame([Row(device="fx-1", ts=ts(0))])
    assert asof_join(left, status, ["device"], how="inner").count() == 0


def test_status_gate_plans_broadcast_semi_join(spark, sf_dir):
    """The scale property the gate exists for: the big data side joins
    the tiny latest-status table as a BROADCAST left-semi join — no
    shuffle of the data stream."""
    from pyspark.sql import functions as F

    from solar_logger_spark.io.tables import load_table
    from solar_logger_spark.operators.asof import status_gate

    events = load_table(spark, sf_dir, "events")
    status = events.select(
        "user_id", "ts", F.lit("online").alias("status")
    )
    gated = status_gate(events, status, ["user_id"])
    plan = gated._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    # and the fact side must not exchange for the join
    before_join = plan.split("BroadcastHashJoin")[0]
    assert "Exchange hashpartitioning" not in before_join
