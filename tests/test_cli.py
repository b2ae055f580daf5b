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


# ---- config.ini compatibility shim (reference py_functions.py) --------


def test_query_config_ini_reference_template(spark, sf_dir, capsys):
    """The reference's own config.ini drives the query: query_mode=flux
    is read from the file (no --mode flag) and record dicts print."""
    import os

    ini = "/root/reference/src/config/config.ini"
    if not os.path.exists(ini):
        pytest.skip("reference config.ini not present")
    assert main(["query", "--sf-dir", sf_dir, "--config", ini,
                 "--limit", "3"]) == 0
    assert "event_type" in capsys.readouterr().out


def test_query_config_ini_csv_sink_write_and_append(spark, sf_dir, tmp_path,
                                                    capsys):
    """query_mode=csv + config ⇒ one local file at csv_location+csv_name
    (reference write_results_to_csv), honoring csv_mode w then a."""
    loc = str(tmp_path / "out") + "/"
    ini = tmp_path / "config.ini"
    ini.write_text(
        "[query_settings]\n"
        "query_mode = csv\n"
        f"csv_location = {loc}\n"
        "csv_name = query_result.csv\n"
        "csv_mode = w\n"
    )
    assert main(["query", "--sf-dir", sf_dir, "--config", str(ini),
                 "--limit", "3"]) == 0
    out_file = tmp_path / "out" / "query_result.csv"
    assert out_file.exists()
    first = out_file.read_text().strip().splitlines()
    assert len(first) <= 4 and "," in first[0]  # header + ≤3 rows

    ini.write_text(ini.read_text().replace("csv_mode = w", "csv_mode = a"))
    assert main(["query", "--sf-dir", sf_dir, "--config", str(ini),
                 "--limit", "3"]) == 0
    appended = out_file.read_text().strip().splitlines()
    assert len(appended) == 2 * len(first)


def test_query_mode_flag_beats_config(spark, sf_dir, tmp_path, capsys):
    ini = tmp_path / "config.ini"
    ini.write_text("[query_settings]\nquery_mode = flux\n")
    assert main(["query", "--sf-dir", sf_dir, "--config", str(ini),
                 "--mode", "csv", "--limit", "2"]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert "," in lines[0]  # csv header, not record dicts
