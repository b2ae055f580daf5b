"""Streaming ingest: the reference's MQTT→decode→unpivot→sink pipeline
(``src/app/solar_main.py``) re-expressed as Structured Streaming."""
