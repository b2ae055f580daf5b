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


# ---- config.ini shim (reference py_functions.py:13-45) ----------------

REFERENCE_INI = "/root/reference/src/config/config.ini"


def _reference_ini_or_skip():
    import os

    if not os.path.exists(REFERENCE_INI):
        pytest.skip("reference config.ini not present in this environment")
    return REFERENCE_INI


def test_read_query_settings_reference_template():
    """The shim parses the reference's own config.ini verbatim —
    including the logging sections' %%-escaped format strings."""
    from solar_logger_spark.config import read_query_settings

    qs = read_query_settings(_reference_ini_or_skip())
    assert qs.query_mode == "flux"
    assert qs.csv_location == "output/"
    assert qs.csv_name == "query_result.csv"
    assert qs.csv_mode == "w"
    assert qs.csv_path() == "output/query_result.csv"


def test_read_query_settings_missing_file():
    from solar_logger_spark.config import read_query_settings

    with pytest.raises(MissingCredentialsError, match="missing or unreadable"):
        read_query_settings("/nonexistent/config.ini")


def test_read_query_settings_missing_section(tmp_path):
    from solar_logger_spark.config import read_query_settings

    p = tmp_path / "config.ini"
    p.write_text("[other]\nx = 1\n")
    with pytest.raises(MissingCredentialsError, match="query_settings"):
        read_query_settings(str(p))


def test_read_query_settings_missing_mode(tmp_path):
    from solar_logger_spark.config import read_query_settings

    p = tmp_path / "config.ini"
    p.write_text("[query_settings]\ncsv_location = out/\n")
    with pytest.raises(MissingCredentialsError, match="query_mode"):
        read_query_settings(str(p))


def test_read_query_settings_bad_csv_mode(tmp_path):
    from solar_logger_spark.config import read_query_settings

    p = tmp_path / "config.ini"
    p.write_text("[query_settings]\nquery_mode = csv\ncsv_mode = x\n")
    with pytest.raises(MissingCredentialsError, match="csv_mode"):
        read_query_settings(str(p))


def test_read_query_settings_csv_path_requires_location(tmp_path):
    from solar_logger_spark.config import read_query_settings

    p = tmp_path / "config.ini"
    p.write_text("[query_settings]\nquery_mode = csv\n")
    qs = read_query_settings(str(p))
    with pytest.raises(MissingCredentialsError, match="csv_location"):
        qs.csv_path()
