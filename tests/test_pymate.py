"""Byte-parity tests for the fixture-derived pymate decoders.

Golden inputs and expected dicts are verbatim from the reference
(``tests/config/consts.py:60-138``); the decoders must reproduce, for
every channel, exactly ``float(value)`` of the reference's expected
stringified value (the magnitude the reference stores —
``mqtt_classes.py:217``). Round-trip properties pin the encoders as true
inverses, and one end-to-end test runs a real MX packet through the
Spark decode pipeline with the parity decoders registered.
"""

from __future__ import annotations

import struct

from hypothesis import given, settings, strategies as st
from pyspark.sql import Row

from solar_logger_spark.streaming import decode as D
from solar_logger_spark.streaming import pymate as P

# Reference golden fixtures, verbatim (tests/config/consts.py:60-138).
FX_BYTES = b"\x00\x00\x00\x04t\x00\x04\x00\x02\x01\x12\t\x00"
FX_EXPECT = {
    "ac_mode": 2, "aux_on": False, "battery_voltage": "27.4V",
    "buy_current": "0.0A", "chg_current": "0.0A", "error_mode": 0,
    "input_voltage": "8V", "inverter_current": "0.0A", "is_230v": True,
    "misc": 9, "operational_mode": 4, "output_voltage": "232V",
    "sell_current": "0.0A", "warnings": 0,
}
MX_BYTES = b"\x87\x85\x8b\x00t\x08\x02\x00 \x01\x0f\x02\xa4"
MX_EXPECT = {
    "amp_hours": "116Ah", "aux_mode": 8, "aux_state": False,
    "bat_current": "11.7A", "bat_voltage": "27.1V", "errors": 0,
    "kilowatt_hours": "3.2kWh", "pv_current": "5A", "pv_voltage": "67.6V",
    "status": 2,
}
DC_BYTES = (
    b"\xff\xe8\x00l\x00\x00\x01\x11d\xff\xf9\x00\x1d\x00\x00\x00!\x00l"
    b"\x00\x18\x00T\x00\x1d\x00\x07\x00\x16\x00\x1b\x00\x0e\x00\r\x00J\x00\x1f\x00+"
    b"\x00\x0b\x00\x03\x00\t\x00\x0c\x00\x00\x00\x04\x00\x04\xff\xf7\x00\x0c\x00\x00"
    b"\xff\xfc\x00\x04\x00\x00c\x00\x00\x00\x02\x15\x00\x00\x00\x00\x00"
)
DC_EXPECT = {
    "bat_ah_today": "13Ah", "bat_current": "8.4A", "bat_kwh_today": "0.43kWh",
    "bat_net_ah": "0Ah", "bat_net_kwh": "0.02kWh", "bat_power": "0.22kW",
    "bat_voltage": "27.3V", "days_since_full": "1.1days", "flags": 33,
    "in_ah_today": "27Ah", "in_current": "10.8A", "in_kwh_today": "0.74kWh",
    "in_power": "0.29kW", "min_soc_today": "99%", "out_ah_today": "14Ah",
    "out_current": "2.4A", "out_kwh_today": "0.31kWh", "out_power": "0.07kW",
    "shunta_ah_today": "-4Ah", "shunta_current": "-2.4A",
    "shunta_kwh_today": "-0.09kWh", "shunta_power": "-0.07kW",
    "shuntb_ah_today": "4Ah", "shuntb_current": "10.8A",
    "shuntb_kwh_today": "0.12kWh", "shuntb_power": "0.29kW",
    "shuntc_ah_today": "0Ah", "shuntc_current": "0.0A",
    "shuntc_kwh_today": "0.00kWh", "shuntc_power": "0.00kW",
    "state_of_charge": "100%",
}


def _magnitudes(expected: dict) -> dict[str, float]:
    """What the reference stores: float(value) with units stripped."""
    out = {}
    for key, value in expected.items():
        if isinstance(value, str):
            num = value.rstrip("VAWh%dayskKm")
            out[key] = float(num)
        else:
            out[key] = float(value)
    return out


def test_fx_decoder_golden():
    assert P.fx_decoder(FX_BYTES) == _magnitudes(FX_EXPECT)


def test_mx_decoder_golden():
    assert P.mx_decoder(MX_BYTES) == _magnitudes(MX_EXPECT)


def test_dc_decoder_golden():
    assert P.dc_decoder(DC_BYTES) == _magnitudes(DC_EXPECT)


def test_field_sets_match_registry_schemas():
    assert tuple(sorted(P.fx_decoder(FX_BYTES))) == D.FX_FIELDS
    assert tuple(sorted(P.mx_decoder(MX_BYTES))) == D.MX_FIELDS
    assert tuple(sorted(P.dc_decoder(DC_BYTES))) == D.DC_FIELDS


def test_bad_body_size_raises():
    for dec in (P.fx_decoder, P.mx_decoder, P.dc_decoder):
        try:
            dec(b"\x00\x01")
            raise AssertionError("expected ValueError")
        except ValueError:
            pass


# ---------------------------------------------------------------------------
# Encoders are exact inverses over representable values
# ---------------------------------------------------------------------------

@settings(max_examples=50, deadline=None)
@given(
    amp_hours=st.integers(0, 0x7FF),
    aux_mode=st.integers(0, 0x3F),
    aux_state=st.booleans(),
    bat_tenths=st.integers(0, 2559),
    bat_dv=st.integers(0, 0xFFFF),
    errors=st.integers(0, 255),
    kwh_tenths=st.integers(0, 0xFFF),
    pv_current=st.integers(0, 255),
    pv_dv=st.integers(0, 0xFFFF),
    status=st.integers(0, 255),
)
def test_mx_roundtrip(amp_hours, aux_mode, aux_state, bat_tenths, bat_dv,
                      errors, kwh_tenths, pv_current, pv_dv, status):
    values = {
        "amp_hours": float(amp_hours), "aux_mode": float(aux_mode),
        "aux_state": float(aux_state), "bat_current": bat_tenths / 10,
        "bat_voltage": bat_dv / 10, "errors": float(errors),
        "kilowatt_hours": kwh_tenths / 10, "pv_current": float(pv_current),
        "pv_voltage": pv_dv / 10, "status": float(status),
    }
    assert P.mx_decoder(P.encode_mx(values)) == values


@settings(max_examples=50, deadline=None)
@given(
    currents=st.tuples(*[st.integers(0, 255)] * 4),
    input_v=st.integers(0, 255),
    output_v=st.integers(0, 255),
    bat_dv=st.integers(0, 0xFFFF),
    modes=st.tuples(*[st.integers(0, 255)] * 3),
    misc=st.integers(0, 255),
    warnings=st.integers(0, 255),
)
def test_fx_roundtrip(currents, input_v, output_v, bat_dv, modes, misc, warnings):
    vmult = 2 if misc & 0x01 else 1
    values = {
        "inverter_current": float(currents[0]), "chg_current": float(currents[1]),
        "buy_current": float(currents[2]), "sell_current": float(currents[3]),
        "input_voltage": float(input_v * vmult),
        "output_voltage": float(output_v * vmult),
        "battery_voltage": bat_dv / 10, "operational_mode": float(modes[0]),
        "error_mode": float(modes[1]), "ac_mode": float(modes[2]),
        "is_230v": float(bool(misc & 0x01)), "aux_on": float(bool(misc & 0x80)),
        "misc": float(misc), "warnings": float(warnings),
    }
    assert P.fx_decoder(P.encode_fx(values)) == values


@settings(max_examples=50, deadline=None)
@given(raw=st.lists(st.integers(-0x8000, 0x7FFF), min_size=29, max_size=29),
       socs=st.tuples(st.integers(0, 255), st.integers(0, 255)))
def test_dc_roundtrip(raw, socs):
    values = {
        name: r / div for (name, _off, div), r in zip(P._DC_I16, raw)
    }
    values["state_of_charge"] = float(socs[0])
    values["min_soc_today"] = float(socs[1])
    assert P.dc_decoder(P.encode_dc(values)) == values


# ---------------------------------------------------------------------------
# End-to-end: parity decoders through the Spark decode pipeline
# ---------------------------------------------------------------------------

def test_registered_parity_decoder_in_spark_pipeline(spark):
    epoch = 1704067200
    # live-path packet: 4-byte LE epoch + body + per-type trailing padding
    pkt = struct.pack("<i", epoch) + MX_BYTES + b"\x00" * D.PADDING_AT_END["mx-1"]
    P.register()
    try:
        df = spark.createDataFrame([Row(measurement="mx-1", payload=pkt)])
        rows = D.decode_packets(df).collect()
    finally:
        P.unregister()
    got = {r["field"]: r["value"] for r in rows}
    assert got == _magnitudes(MX_EXPECT)
    assert {int(r["ts"].timestamp()) for r in rows} == {epoch}
