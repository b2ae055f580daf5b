"""Byte-parity decoders for the reference's real device packets.

The reference decodes MQTT payloads with the external ``pymate`` packet
classes (``src/classes/mqtt_classes.py:40-68``): ``DCStatusPacket`` /
``FXStatusPacket`` / ``MXStatusPacket`` ``.from_buffer(body)``, then every
value is coerced to its float magnitude (``:217``). pymate itself is an
optional external dependency, so this module re-derives the wire layouts
**from the reference's own golden fixtures**
(``tests/config/consts.py:60-138``): each byte offset below is pinned by
the fixture byte arrays and their expected decoded dicts.

Layout notes (all multi-byte integers big-endian):

* **MX** (13-byte body): packed nibbles — byte 0 carries the amp-hour
  MSB (bits 4-6) and the battery-current tenths digit (bits 0-3); bytes
  1-2 are signed offsets biased by +128 (pv / bat current); byte 3's low
  nibble is the kWh MSB over byte 8; byte 5 packs aux state (0x40) and
  mode (0x3F); u16 deci-volt pairs at 9 and 11.
* **FX** (13-byte body): one byte per current/voltage with a ``misc``
  flags byte (11): bit 0 = 230 V unit → voltages double (pinned by the
  fixture: ``input_voltage 4→8``, ``output_voltage 116→232``), bit 7 =
  aux on. Deci-volt battery voltage u16 at 9.
* **DC** (78-byte body): i16 grid, grouped — shunt a/b/c currents at
  0/2/4, battery volts at 6, SoC byte at 8, shunt a/b/c powers at
  9/11/13, flags at 15, then (in, out, bat) triplets for current / power
  / Ah-today / kWh-today from 17 to 40, days-since-full at 41, shunt
  a/b/c kWh-today at 55/57/59 and Ah-today at 61/63/65, min-SoC byte at
  67, battery net Ah/kWh at 68/70. Offsets 43-54 and 72-77 carry values
  the fixture's expected dict never surfaces (reference drops ``raw``
  and exposes exactly 31 channels, P6) — ignored on decode, zeroed on
  encode. Where the fixture value appears at two plausible offsets
  (``in_*`` vs ``shuntb_*`` both 10.8 A / 0.29 kW), the assignment
  follows the triplet grouping, which is self-consistent across all four
  (current, power, Ah, kWh) banks.

Scaling, per the fixtures' stringified units: currents and voltages are
deci-units (÷10), powers and kWh are centi-units (÷100),
``days_since_full`` is deci-days, Ah / SoC / mode / status / flags are
unscaled. Scaled values divide the raw integer once (``117/10``) so the
result is bit-identical to ``float("11.7")``.

Decoders return float magnitudes directly — exactly what survives the
reference's ``float(value)`` coercion into storage. Booleans follow
Python's ``float(bool)`` (``aux_on False → 0.0``, ``is_230v True → 1.0``).

``register()`` swaps these in for the synthetic default codec
(`decode.register_decoder`); ``encode_mx/fx/dc`` are exact inverses for
representable values, used by the round-trip property tests.
"""

from __future__ import annotations

import struct

from . import decode as _decode

MX_BODY_SIZE = 13
FX_BODY_SIZE = 13
DC_BODY_SIZE = 78


def _i16(b: bytes, off: int) -> int:
    return struct.unpack_from(">h", b, off)[0]


def _s8(v: int) -> int:
    return v - 256 if v >= 128 else v


# ---------------------------------------------------------------------------
# MX charge controller (reference fixture TestMX)
# ---------------------------------------------------------------------------

def mx_decoder(body: bytes) -> dict[str, float]:
    """13-byte MX status body → the reference's 10 channels."""
    b = bytes(body)
    if len(b) != MX_BODY_SIZE:
        raise ValueError(f"MX body must be {MX_BODY_SIZE} bytes, got {len(b)}")
    return {
        "amp_hours": float(((b[0] & 0x70) >> 4) << 8 | b[4]),
        "aux_mode": float(b[5] & 0x3F),
        "aux_state": float(bool(b[5] & 0x40)),
        "bat_current": (((128 + _s8(b[2])) % 256) * 10 + (b[0] & 0x0F)) / 10,
        "bat_voltage": struct.unpack_from(">H", b, 9)[0] / 10,
        "errors": float(b[7]),
        "kilowatt_hours": ((b[3] & 0x0F) << 8 | b[8]) / 10,
        "pv_current": float((128 + _s8(b[1])) % 256),
        "pv_voltage": struct.unpack_from(">H", b, 11)[0] / 10,
        "status": float(b[6]),
    }


def encode_mx(values: dict[str, float]) -> bytes:
    """Inverse of ``mx_decoder`` for representable channel values."""
    ah = int(values["amp_hours"])
    bat_tenths = round(values["bat_current"] * 10)
    kwh_tenths = round(values["kilowatt_hours"] * 10)
    b = bytearray(MX_BODY_SIZE)
    b[0] = ((ah >> 8) & 0x07) << 4 | (bat_tenths % 10)
    b[1] = (int(values["pv_current"]) - 128) % 256
    b[2] = (bat_tenths // 10 - 128) % 256
    b[3] = (kwh_tenths >> 8) & 0x0F
    b[4] = ah & 0xFF
    b[5] = (0x40 if values["aux_state"] else 0) | (int(values["aux_mode"]) & 0x3F)
    b[6] = int(values["status"]) & 0xFF
    b[7] = int(values["errors"]) & 0xFF
    b[8] = kwh_tenths & 0xFF
    struct.pack_into(">H", b, 9, round(values["bat_voltage"] * 10))
    struct.pack_into(">H", b, 11, round(values["pv_voltage"] * 10))
    return bytes(b)


# ---------------------------------------------------------------------------
# FX inverter (reference fixture TestFX)
# ---------------------------------------------------------------------------

def fx_decoder(body: bytes) -> dict[str, float]:
    """13-byte FX status body → the reference's 14 channels.

    The fixture pins the 230 V voltage doubling; current scaling on 230 V
    units is not observable from it (all fixture currents are 0) and is
    left unscaled.
    """
    b = bytes(body)
    if len(b) != FX_BODY_SIZE:
        raise ValueError(f"FX body must be {FX_BODY_SIZE} bytes, got {len(b)}")
    misc = b[11]
    is_230v = bool(misc & 0x01)
    vmult = 2.0 if is_230v else 1.0
    return {
        "ac_mode": float(b[8]),
        "aux_on": float(bool(misc & 0x80)),
        "battery_voltage": struct.unpack_from(">H", b, 9)[0] / 10,
        "buy_current": float(b[2]),
        "chg_current": float(b[1]),
        "error_mode": float(b[7]),
        "input_voltage": b[3] * vmult,
        "inverter_current": float(b[0]),
        "is_230v": float(is_230v),
        "misc": float(misc),
        "operational_mode": float(b[6]),
        "output_voltage": b[4] * vmult,
        "sell_current": float(b[5]),
        "warnings": float(b[12]),
    }


def encode_fx(values: dict[str, float]) -> bytes:
    """Inverse of ``fx_decoder`` for representable channel values."""
    misc = int(values["misc"])
    vmult = 2 if misc & 0x01 else 1
    b = bytearray(FX_BODY_SIZE)
    b[0] = int(values["inverter_current"]) & 0xFF
    b[1] = int(values["chg_current"]) & 0xFF
    b[2] = int(values["buy_current"]) & 0xFF
    b[3] = int(values["input_voltage"]) // vmult & 0xFF
    b[4] = int(values["output_voltage"]) // vmult & 0xFF
    b[5] = int(values["sell_current"]) & 0xFF
    b[6] = int(values["operational_mode"]) & 0xFF
    b[7] = int(values["error_mode"]) & 0xFF
    b[8] = int(values["ac_mode"]) & 0xFF
    struct.pack_into(">H", b, 9, round(values["battery_voltage"] * 10))
    b[11] = misc & 0xFF
    b[12] = int(values["warnings"]) & 0xFF
    return bytes(b)


# ---------------------------------------------------------------------------
# DC charge monitor (reference fixture TestDC)
# ---------------------------------------------------------------------------

# (channel, byte offset, divisor); i16 big-endian unless noted.
_DC_I16 = (
    ("shunta_current", 0, 10),
    ("shuntb_current", 2, 10),
    ("shuntc_current", 4, 10),
    ("bat_voltage", 6, 10),
    ("shunta_power", 9, 100),
    ("shuntb_power", 11, 100),
    ("shuntc_power", 13, 100),
    ("flags", 15, 1),
    ("in_current", 17, 10),
    ("out_current", 19, 10),
    ("bat_current", 21, 10),
    ("in_power", 23, 100),
    ("out_power", 25, 100),
    ("bat_power", 27, 100),
    ("in_ah_today", 29, 1),
    ("out_ah_today", 31, 1),
    ("bat_ah_today", 33, 1),
    ("in_kwh_today", 35, 100),
    ("out_kwh_today", 37, 100),
    ("bat_kwh_today", 39, 100),
    ("days_since_full", 41, 10),
    ("shunta_kwh_today", 55, 100),
    ("shuntb_kwh_today", 57, 100),
    ("shuntc_kwh_today", 59, 100),
    ("shunta_ah_today", 61, 1),
    ("shuntb_ah_today", 63, 1),
    ("shuntc_ah_today", 65, 1),
    ("bat_net_ah", 68, 1),
    ("bat_net_kwh", 70, 100),
)
_DC_U8 = (("state_of_charge", 8), ("min_soc_today", 67))


def dc_decoder(body: bytes) -> dict[str, float]:
    """78-byte DC status body → the reference's 31 channels."""
    b = bytes(body)
    if len(b) != DC_BODY_SIZE:
        raise ValueError(f"DC body must be {DC_BODY_SIZE} bytes, got {len(b)}")
    out = {name: _i16(b, off) / div for name, off, div in _DC_I16}
    for name, off in _DC_U8:
        out[name] = float(b[off])
    return out


def encode_dc(values: dict[str, float]) -> bytes:
    """Inverse of ``dc_decoder``; unobserved filler offsets stay zero."""
    b = bytearray(DC_BODY_SIZE)
    for name, off, div in _DC_I16:
        struct.pack_into(">h", b, off, round(values[name] * div))
    for name, off in _DC_U8:
        b[off] = int(values[name]) & 0xFF
    return bytes(b)


PYMATE_DECODERS = {"dc-1": dc_decoder, "fx-1": fx_decoder, "mx-1": mx_decoder}


def register() -> None:
    """Make the byte-parity decoders the active ones (replacing the
    synthetic default codec) for all three measurements."""
    for measurement, decoder in PYMATE_DECODERS.items():
        _decode.register_decoder(measurement, decoder)


def unregister() -> None:
    """Restore the synthetic default codec for all three measurements."""
    for measurement, fields in _decode.MEASUREMENT_FIELDS.items():
        _decode.register_decoder(measurement, _decode._codec_decoder(fields))
