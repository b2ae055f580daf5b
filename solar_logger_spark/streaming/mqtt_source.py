"""MQTT streaming source — Spark 4 Python Data Source wrapping paho-mqtt.

The reference's transport (S2, ``src/classes/mqtt_classes.py:298-324``):
connect with TLS + user/token auth, subscribe to one topic filter,
receive binary messages via callback. Spark has no built-in MQTT source,
so this implements one with the ``pyspark.sql.datasource`` API
(public Spark 4 feature). Registered as format ``"mqtt"``::

    spark.dataSource.register(MqttDataSource)
    raw = (spark.readStream.format("mqtt")
           .option("host", ...).option("port", 8883)
           .option("user", ...).option("token", ...)
           .option("topic", "mate/#")
           .load())

emitting the engine's RAW_SCHEMA ``(topic, payload binary, arrival_ts)``.

paho-mqtt is optional (not installed in the test environment); when it
is absent the default transport falls back to the stdlib MQTT 3.1.1
wire client (``mqtt_wire.socket_client``), so the live-socket path
works with zero third-party packages — ``tests/test_mqtt_live.py``
smoke-tests it against an in-process broker. The correctness path never
depends on a broker (SURVEY §7 hard-part 3) — tests also replay
parquet/file streams through the identical downstream plan.

Delivery: the simple-stream-reader contract replays a prefetched record
batch on micro-batch retry, giving at-least-once into the checkpointed
pipeline (T6 — stronger than the reference's QoS-0 + lossy queue).
"""

from __future__ import annotations

import time

try:  # pragma: no cover - availability depends on Spark version
    from pyspark.sql.datasource import (
        DataSource,
        SimpleDataSourceStreamReader,
    )

    _DATASOURCE_API = True
except ImportError:  # pragma: no cover
    DataSource = object  # type: ignore[assignment,misc]
    SimpleDataSourceStreamReader = object  # type: ignore[assignment,misc]
    _DATASOURCE_API = False

RAW_DDL = "topic string, payload binary, arrival_ts timestamp"


class MqttStreamReader(SimpleDataSourceStreamReader):
    """Buffers paho callback messages; each ``read`` drains the buffer.

    Offsets are a monotonically increasing drain counter; ``readBetweenOffsets``
    replays the cached batch for retry semantics.
    """

    def __init__(self, options: dict, client_factory=None) -> None:
        self._buffer: list[tuple] = []
        self._batches: dict[int, list[tuple]] = {}
        self._n = 0
        factory = client_factory or _default_client
        # the transport delivers messages by calling push(topic, payload[, us])
        self._client = factory(options, self.push)

    def push(self, topic: str, payload: bytes, us: int | None = None) -> None:
        """Transport callback: enqueue one received message."""
        self._buffer.append(
            (topic, bytes(payload), time.time_ns() // 1000 if us is None else us)
        )

    def initialOffset(self) -> dict:
        return {"n": 0}

    def read(self, start: dict):
        batch, self._buffer = self._buffer, []
        n = start["n"]
        self._batches[n] = batch
        # drop replay cache far behind the committed frontier
        for k in [k for k in self._batches if k < n - 8]:
            del self._batches[k]
        rows = [(t, p, _us_to_ts(us)) for (t, p, us) in batch]
        return iter(rows), {"n": n + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        rows = [
            (t, p, _us_to_ts(us)) for (t, p, us) in self._batches.get(start["n"], [])
        ]
        return iter(rows)

    def commit(self, end: dict) -> None:
        pass

    def stop(self) -> None:
        for meth in ("loop_stop", "disconnect"):  # transport-optional
            fn = getattr(self._client, meth, None)
            if fn is not None:
                fn()


def _default_client(options: dict, push):
    """Default transport: paho-mqtt when installed, else the stdlib
    MQTT 3.1.1 wire client (``mqtt_wire.socket_client``) — the live
    broker path no longer requires any third-party package."""
    try:
        import paho.mqtt.client  # noqa: F401
    except ImportError:
        from .mqtt_wire import socket_client

        return socket_client(options, push)
    return _paho_client(options, push)


def _paho_client(options: dict, push):
    """paho-mqtt transport wired to ``push``
    (reference S2 — TLS + user/token auth, one topic filter)."""
    import paho.mqtt.client as mqtt

    client = mqtt.Client()
    user, token = options.get("user"), options.get("token")
    if user and token:
        client.username_pw_set(user, token)
    # tls default follows the port (8883 = IANA MQTT-over-TLS), same
    # contract as mqtt_wire.socket_client
    tls_default = "true" if options.get("port", "1883") == "8883" else "false"
    if options.get("tls", tls_default).lower() == "true":
        client.tls_set()

    topic = options.get("topic", "#")

    def _on_connect(c, _u, _f, _rc, *a):  # subscribe on (re)connect
        c.subscribe(topic, qos=int(options.get("qos", "1")))

    def _on_message(_c, _u, msg):
        push(msg.topic, msg.payload)

    client.on_connect = _on_connect
    client.on_message = _on_message
    client.connect(
        options.get("host", "localhost"), int(options.get("port", "1883"))
    )
    client.loop_start()
    return client


def _us_to_ts(us: int):
    from datetime import datetime, timezone

    return datetime.fromtimestamp(us / 1e6, tz=timezone.utc).replace(tzinfo=None)


class MqttDataSource(DataSource):
    """``spark.readStream.format("mqtt")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "mqtt"

    def schema(self) -> str:
        return RAW_DDL

    def simpleStreamReader(self, schema) -> MqttStreamReader:
        return MqttStreamReader(self.options)


def register(spark) -> bool:
    """Register the MQTT source if the Python Data Source API exists."""
    if not _DATASOURCE_API:
        return False
    spark.dataSource.register(MqttDataSource)
    return True
