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
from dataclasses import dataclass

MAX_PORT_RANGE = 65535


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
