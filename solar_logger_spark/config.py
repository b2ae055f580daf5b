"""Environment-backed configuration with validation.

The reference reads connection secrets from environment variables and
fails fast on anything missing, empty, or out of range
(``/root/reference/src/classes/common_classes.py:16-107`` —
``SecretStore`` with ``MissingCredentialsError``). This module re-derives
that contract for the Spark engine: same variable names, same
fail-fast semantics, returned as typed frozen dataclasses instead of
dicts so downstream code can't typo a key.

The engine additionally reads its own (optional, defaulted) knobs —
store directory, checkpoint directory — through :func:`engine_settings`.
"""

from __future__ import annotations

import os
from configparser import ConfigParser, Error as ConfigParserError
from dataclasses import dataclass

MAX_PORT_RANGE = 65535

#: Section name the reference reads query settings from
#: (``/root/reference/src/helpers/consts.py:9``).
INFLUX_QUERY_CONFIG_TITLE = "query_settings"


class MissingCredentialsError(Exception):
    """A required connection setting is absent, empty, or invalid."""


def _require(env: dict[str, str], name: str) -> str:
    val = env.get(name)
    if val is None or val == "":
        raise MissingCredentialsError(
            f"required environment variable {name} is missing or empty"
        )
    return val


@dataclass(frozen=True)
class MqttSettings:
    """MQTT broker connection settings (reference ``mqtt_secrets``)."""

    host: str
    port: int
    user: str
    token: str
    topic: str

    def source_options(self) -> dict[str, str]:
        """Options dict for ``spark.readStream.format("mqtt")``."""
        return {
            "host": self.host,
            "port": str(self.port),
            "username": self.user,
            "password": self.token,
            "topic": self.topic,
        }


@dataclass(frozen=True)
class InfluxSettings:
    """Point-store settings (reference ``influx_secrets``). In the Spark
    engine the "bucket" maps to a parquet store path; url/org/token are
    carried for compatibility with tooling that expects them."""

    url: str
    org: str
    bucket: str
    token: str


def mqtt_settings(env: dict[str, str] | None = None) -> MqttSettings:
    """Read + validate MQTT settings from the environment.

    Mirrors the reference's checks: every variable present and
    non-empty, port integral and within [0, 65535].
    """
    env = dict(os.environ) if env is None else env
    port_raw = _require(env, "MQTT_PORT")
    try:
        port = int(port_raw)
    except ValueError as err:
        raise MissingCredentialsError(
            f"MQTT_PORT must be an integer, got {port_raw!r}"
        ) from err
    if not 0 <= port <= MAX_PORT_RANGE:
        raise MissingCredentialsError(
            f"MQTT port outside maximum port range, 0-{MAX_PORT_RANGE}"
        )
    return MqttSettings(
        host=_require(env, "MQTT_HOST"),
        port=port,
        user=_require(env, "MQTT_USER"),
        token=_require(env, "MQTT_TOKEN"),
        topic=_require(env, "MQTT_TOPIC"),
    )


def influx_settings(env: dict[str, str] | None = None) -> InfluxSettings:
    """Read + validate point-store settings from the environment."""
    env = dict(os.environ) if env is None else env
    return InfluxSettings(
        url=_require(env, "INFLUX_URL"),
        org=_require(env, "INFLUX_ORG"),
        bucket=_require(env, "INFLUX_BUCKET"),
        token=_require(env, "INFLUX_TOKEN"),
    )


@dataclass(frozen=True)
class EngineSettings:
    """Engine-local knobs, all optional with defaults."""

    store_dir: str
    checkpoint_dir: str | None


def engine_settings(env: dict[str, str] | None = None) -> EngineSettings:
    env = dict(os.environ) if env is None else env
    store = env.get("SOLAR_STORE_DIR", "./solar-store")
    return EngineSettings(
        store_dir=store,
        checkpoint_dir=env.get("SOLAR_CHECKPOINT_DIR"),
    )


@dataclass(frozen=True)
class QueryFileSettings:
    """The ``[query_settings]`` section of a reference ``config.ini``.

    The reference reads the query mode and CSV sink destination from an
    INI file rather than the environment
    (``/root/reference/src/helpers/py_functions.py:38-45`` for
    ``query_mode``; ``:13-35`` for ``csv_location``/``csv_name``/
    ``csv_mode``).  This is the compatibility shim for a migrating user
    with an existing ``config.ini``: same section name, same option
    names, same semantics (``csv_location + csv_name`` concatenated
    verbatim, ``csv_mode`` is a Python open() mode — ``w`` or ``a``).
    """

    query_mode: str
    csv_location: str | None
    csv_name: str | None
    csv_mode: str

    def csv_path(self) -> str:
        """The concatenated destination, exactly as the reference builds
        it (``file_location + filename`` — no separator inserted)."""
        if self.csv_location is None or self.csv_name is None:
            raise MissingCredentialsError(
                "csv_location/csv_name missing from [query_settings] — "
                "required for query_mode=csv"
            )
        return self.csv_location + self.csv_name


def read_query_settings(
    config_path: str, section: str = INFLUX_QUERY_CONFIG_TITLE
) -> QueryFileSettings:
    """Read a reference-format ``config.ini`` (shim for
    ``py_functions.read_query_settings`` + the CSV options its sink
    reads).  Fail-fast like the rest of this module: a missing file,
    missing section, or missing ``query_mode`` raises
    :class:`MissingCredentialsError` with a named cause rather than
    the reference's bare ``NoSectionError`` traceback.

    Only ``[query_settings]`` is consumed.  The logging sections of the
    reference template (``influx_debugger``/``solar_debugger``) are a
    documented non-goal (SURVEY §7) and are ignored if present — the
    parser still accepts them, including their ``%%``-escaped format
    strings.
    """
    parser = ConfigParser()
    try:
        read_ok = parser.read(config_path)
    except ConfigParserError as err:
        raise MissingCredentialsError(
            f"could not parse config file {config_path!r}: {err}"
        ) from err
    if not read_ok:
        raise MissingCredentialsError(
            f"config file {config_path!r} is missing or unreadable"
        )
    if not parser.has_section(section):
        raise MissingCredentialsError(
            f"config file {config_path!r} has no [{section}] section"
        )
    mode = parser.get(section, "query_mode", fallback=None)
    if mode is None or mode.strip() == "":
        raise MissingCredentialsError(
            f"[{section}] query_mode is missing or empty in {config_path!r}"
        )
    mode = mode.strip().strip("'\"")
    csv_mode = parser.get(section, "csv_mode", fallback="w").strip().strip("'\"")
    if csv_mode not in ("w", "a"):
        raise MissingCredentialsError(
            f"[{section}] csv_mode must be 'w' or 'a', got {csv_mode!r}"
        )
    return QueryFileSettings(
        query_mode=mode,
        csv_location=parser.get(section, "csv_location", fallback=None),
        csv_name=parser.get(section, "csv_name", fallback=None),
        csv_mode=csv_mode,
    )
