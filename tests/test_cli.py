"""CLI entry-point twins of the reference's start_query.py /
start_logger.py (``/root/reference/start_query.py``,
``src/app/influx_query.py:115-126``)."""

import pytest

from solar_logger_spark.cli import main


def test_health(spark, capsys):
    assert main(["health"]) == 0
    assert "healthy" in capsys.readouterr().out


def test_query_example_flux_mode(spark, sf_dir, capsys):
    assert main(["query", "--sf-dir", sf_dir, "--limit", "5"]) == 0
    out = capsys.readouterr().out
    # flux mode prints record dicts with the event columns
    assert "event_type" in out


def test_query_csv_mode_with_explicit_flux(spark, sf_dir, capsys):
    flux = (
        'from(bucket: "events") |> range(start: 2024-01-10T00:00:00Z) '
        '|> filter(fn: (r) => r["event_type"] == "purchase")'
    )
    assert (
        main(
            ["query", "--sf-dir", sf_dir, "--flux", flux, "--mode", "csv",
             "--limit", "3"]
        )
        == 0
    )
    lines = capsys.readouterr().out.strip().splitlines()
    assert lines[0].startswith("event_id") or "," in lines[0]  # header
    assert len(lines) <= 4


def test_query_out_writes_csv(spark, sf_dir, tmp_path, capsys):
    out_path = str(tmp_path / "result_csv")
    assert main(["query", "--sf-dir", sf_dir, "--out", out_path]) == 0
    written = list(tmp_path.glob("result_csv/*.csv"))
    assert len(written) == 1  # single_file layout like the reference


def test_sql_subcommand(spark, sf_dir, capsys):
    assert (
        main(["sql", "--sf-dir", sf_dir, "SELECT count(*) AS n FROM events"])
        == 0
    )
    assert "n" in capsys.readouterr().out


def test_logger_ingest_roundtrip(spark, tmp_path):
    # feed raw packets through the logger CLI and read the store back
    from datetime import datetime

    from pyspark.sql import Row

    from solar_logger_spark.streaming import decode as D
    from solar_logger_spark.streaming.ingest import RAW_SCHEMA

    input_dir = str(tmp_path / "raw")
    store = str(tmp_path / "store")
    ts = datetime(2024, 1, 1)
    fields = D.MEASUREMENT_FIELDS["dc-1"]
    values = {f: float(i) for i, f in enumerate(fields)}
    pkt = D.encode_packet("dc-1", 1704067200, values)
    spark.createDataFrame(
        [
            Row(topic="mate/dc-1/status", payload=b"online", arrival_ts=ts),
            Row(topic="mate/dc-1/dc-status", payload=pkt, arrival_ts=ts),
        ],
        RAW_SCHEMA,
    ).write.parquet(input_dir)
    rc = main(
        ["logger", "--input", input_dir, "--store", store, "--timeout", "90"]
    )
    assert rc == 0
    points = spark.read.parquet(store + "/points")
    assert points.count() == len(fields)


def test_unknown_mode_rejected(spark, sf_dir):
    with pytest.raises(SystemExit):
        main(["query", "--sf-dir", sf_dir, "--mode", "bogus"])


def test_cli_forget_and_verify_shards(spark, tmp_path, capsys):
    """The compliance surface end-to-end at the CLI: ingest, export,
    `forget` (index + shards in one invocation, JSON report), then
    `verify-shards` green with exit code 0."""
    import json
    import random

    from pyspark.sql import Row, functions as F

    from solar_logger_spark.cli import main
    from solar_logger_spark.io import export as E
    from solar_logger_spark.streaming import dedup_ingest as DI

    rng = random.Random(31)
    vocab = [f"w{i}" for i in range(12)]
    rows = [
        Row(doc_id=i, text=" ".join(
            rng.choice(vocab) for _ in range(rng.randint(10, 28))
        ))
        for i in range(12)
    ]
    idx = str(tmp_path / "idx")
    pairs = str(tmp_path / "pairs")
    sink = DI.incremental_dedup_sink(idx, pairs, index_partitions=8)
    sink(spark.createDataFrame(rows), 0)
    shards = str(tmp_path / "shards")
    corpus = spark.createDataFrame(rows).withColumn(
        "n_tokens", F.size(F.split(F.col("text"), " "))
    )
    E.export_training_shards(corpus, shards, n_shards=3, id_col="doc_id")

    rc = main([
        "forget", "--index-dir", idx, "--ids", "2,5",
        "--pairs-dir", pairs, "--shards-dir", shards,
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    assert report[f"shards:{shards}"] == "2"
    assert DI.SHINGLES in report

    rc = main(["verify-shards", shards])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0 and out["ok"]
    shipped = spark.read.parquet(shards)
    assert shipped.filter(F.col("doc_id").isin([2, 5])).count() == 0
