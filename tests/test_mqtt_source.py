"""MQTT source semantics without a live broker.

The reader's transport is injectable, so these tests execute the real
``read`` / ``readBetweenOffsets`` / ``commit`` replay logic (reference
S2 transport semantics, re-expressed as a Spark 4 Python Data Source)
with an in-process fake client, then drive the registered source
end-to-end through ``readStream`` into a memory sink and the decode
path."""

from __future__ import annotations

import time as _time
from datetime import datetime

from solar_logger_spark.streaming import decode as D
from solar_logger_spark.streaming import mqtt_source as M


class FakeClient:
    def __init__(self):
        self.stopped = False
        self.disconnected = False

    def loop_stop(self):
        self.stopped = True

    def disconnect(self):
        self.disconnected = True


def _reader():
    captured = {}

    def factory(options, push):
        captured["push"] = push
        return FakeClient()

    r = M.MqttStreamReader({}, client_factory=factory)
    return r, captured["push"]


def test_read_drains_buffer_and_advances_offset():
    r, push = _reader()
    rows0, off1 = r.read(r.initialOffset())
    assert list(rows0) == []
    for i in range(3):
        push(f"mate/dc-{i}", b"p%d" % i, us=1_700_000_000_000_000 + i)
    rows1, off2 = r.read(off1)
    got = list(rows1)
    assert [t for t, _, _ in got] == ["mate/dc-0", "mate/dc-1", "mate/dc-2"]
    assert off2["n"] == off1["n"] + 1


def test_retry_replays_identical_batch():
    r, push = _reader()
    _, off1 = r.read(r.initialOffset())
    for i in range(4):
        push("mate/fx-1/fx-status", b"x%d" % i, us=1_700_000_000_000_000 + i)
    rows, off2 = r.read(off1)
    got = list(rows)
    # a micro-batch retry re-reads the same offset range: identical rows
    assert list(r.readBetweenOffsets(off1, off2)) == got
    # messages arriving after the original read don't leak into the replay
    push("mate/late", b"late", us=1_700_000_000_999_999)
    assert list(r.readBetweenOffsets(off1, off2)) == got
    # ...they surface in the NEXT batch instead
    nxt, _ = r.read(off2)
    assert [t for t, _, _ in list(nxt)] == ["mate/late"]


def test_replay_cache_pruned_behind_frontier():
    r, push = _reader()
    off = r.initialOffset()
    for i in range(16):
        push("mate/t", b"m", us=1_700_000_000_000_000 + i)
        _, off = r.read(off)
    assert len(r._batches) <= 10  # bounded, old batches evicted


def test_stop_tears_down_transport():
    r, _ = _reader()
    r.stop()
    assert r._client.stopped and r._client.disconnected


# ---------------------------------------------------------------------------
# end-to-end: registered data source → readStream → memory sink → decode
# ---------------------------------------------------------------------------

N_PACKETS = 3
_EPOCH = 1704067200


def test_mqtt_source_end_to_end(spark, tmp_path):
    from solar_logger_spark.streaming import ingest as I

    # defined inside the test so cloudpickle ships them BY VALUE to the
    # data-source worker process (a module-level class would pickle by
    # reference to this un-importable test module)
    n_packets, epoch = N_PACKETS, _EPOCH

    def seeded_factory(options, push):
        """Transport delivering one online status + N data packets."""
        from solar_logger_spark.streaming import decode as DD

        base_us = epoch * 1_000_000
        push("mate/dc-1/status", b"online", us=base_us)
        fields = DD.MEASUREMENT_FIELDS["dc-1"]
        for i in range(n_packets):
            pkt = DD.encode_packet(
                "dc-1", epoch + i, {f: float(i + j) for j, f in enumerate(fields)}
            )
            push("mate/dc-1/dc-status", pkt, us=base_us + (i + 1) * 1_000_000)
        return None

    class SeededMqttSource(M.MqttDataSource):
        @classmethod
        def name(cls) -> str:
            return "mqttseeded"

        def simpleStreamReader(self, schema) -> M.MqttStreamReader:
            return M.MqttStreamReader(
                self.options, client_factory=seeded_factory
            )

    spark.dataSource.register(SeededMqttSource)
    raw = spark.readStream.format("mqttseeded").load()
    q = (
        raw.writeStream.format("memory")
        .queryName("mqtt_e2e")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = _time.time() + 120
        want = N_PACKETS + 1
        while _time.time() < deadline:
            if spark.sql("SELECT count(*) AS c FROM mqtt_e2e").first().c >= want:
                break
            _time.sleep(0.5)
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM mqtt_e2e")
    rows = got.collect()
    # exactly N+1 messages — no duplication, no loss across micro-batches
    assert len(rows) == want
    assert all(isinstance(r.arrival_ts, datetime) for r in rows)
    # the raw stream decodes to exactly N packets' worth of points
    points = I.gated_batch(got).collect()
    assert len(points) == N_PACKETS * len(D.MEASUREMENT_FIELDS["dc-1"])
