"""Env-config validation parity with the reference's SecretStore
(``/root/reference/src/classes/common_classes.py:16-107``): every
variable required + non-empty, port integral and in range, fail-fast
with a credentials error."""

import pytest

from solar_logger_spark.config import (
    MissingCredentialsError,
    engine_settings,
    influx_settings,
    mqtt_settings,
)

GOOD_MQTT = {
    "MQTT_HOST": "broker.local",
    "MQTT_PORT": "1883",
    "MQTT_USER": "solar",
    "MQTT_TOKEN": "secret",
    "MQTT_TOPIC": "mate/#",
}

GOOD_INFLUX = {
    "INFLUX_URL": "http://store.local:8086",
    "INFLUX_ORG": "home",
    "INFLUX_BUCKET": "Bucket",
    "INFLUX_TOKEN": "secret",
}


def test_mqtt_settings_roundtrip():
    s = mqtt_settings(GOOD_MQTT)
    assert s.host == "broker.local"
    assert s.port == 1883
    assert s.source_options()["topic"] == "mate/#"


@pytest.mark.parametrize("missing", sorted(GOOD_MQTT))
def test_mqtt_missing_any_var_fails(missing):
    env = {k: v for k, v in GOOD_MQTT.items() if k != missing}
    with pytest.raises(MissingCredentialsError):
        mqtt_settings(env)


def test_mqtt_empty_value_fails():
    env = dict(GOOD_MQTT, MQTT_HOST="")
    with pytest.raises(MissingCredentialsError):
        mqtt_settings(env)


@pytest.mark.parametrize("port", ["-1", "65536", "abc"])
def test_mqtt_bad_port_fails(port):
    env = dict(GOOD_MQTT, MQTT_PORT=port)
    with pytest.raises(MissingCredentialsError):
        mqtt_settings(env)


def test_influx_settings_roundtrip():
    s = influx_settings(GOOD_INFLUX)
    assert s.bucket == "Bucket"


@pytest.mark.parametrize("missing", sorted(GOOD_INFLUX))
def test_influx_missing_any_var_fails(missing):
    env = {k: v for k, v in GOOD_INFLUX.items() if k != missing}
    with pytest.raises(MissingCredentialsError):
        influx_settings(env)


def test_engine_settings_defaults():
    s = engine_settings({})
    assert s.store_dir == "./solar-store"
    assert s.checkpoint_dir is None
    s2 = engine_settings({"SOLAR_STORE_DIR": "/data/p", "SOLAR_CHECKPOINT_DIR": "/ck"})
    assert (s2.store_dir, s2.checkpoint_dir) == ("/data/p", "/ck")
