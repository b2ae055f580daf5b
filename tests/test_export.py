"""Training-shard export: deterministic shuffle, shipped-bytes dataset
card, consumer-side verification."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import Row

from solar_logger_spark.io import export as E


@pytest.fixture()
def seqs(spark):
    rows = [
        Row(seq_id=i, text=f"seq text {i}", n_tokens=10 + (i % 5))
        for i in range(60)
    ]
    return spark.createDataFrame(rows)


def test_export_is_reproducible_and_totals_add_up(spark, seqs, tmp_path):
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    c1 = E.export_training_shards(seqs, d1, n_shards=4)
    c2 = E.export_training_shards(seqs, d2, n_shards=4)
    assert c1["shards"] == c2["shards"]          # same bytes, same card
    assert c1["rows"] == 60
    assert c1["tokens"] == sum(10 + (i % 5) for i in range(60))
    # per-shard fingerprints sum to the dataset fingerprint
    assert int(c1["fingerprint"]) == sum(
        int(s["fingerprint"]) for s in c1["shards"].values()
    )
    # every shard nonempty at this size; positions dense per shard
    df = spark.read.parquet(d1)
    for k, entry in c1["shards"].items():
        pos = sorted(
            r.pos for r in df.filter(f"shard = {k}").collect()
        )
        assert pos == list(range(1, entry["rows"] + 1))
    # committed card round-trips
    assert E.read_dataset_card(d1) == c1
    with pytest.raises(FileExistsError):
        E.export_training_shards(seqs, d1, n_shards=4)


def test_verify_shards_ok_and_detects_tamper(spark, seqs, tmp_path):
    d = str(tmp_path / "x")
    E.export_training_shards(seqs, d, n_shards=4)
    assert E.verify_shards(spark, d) == {"ok": True, "mismatched": []}
    # tamper: drop one shard's files
    import shutil

    victim = next(
        p for p in os.listdir(d) if p.startswith("shard=")
    )
    shutil.rmtree(os.path.join(d, victim))
    res = E.verify_shards(spark, d)
    assert not res["ok"]
    assert res["mismatched"] == [victim.split("=")[1]]


def test_shard_fingerprint_rederivable_in_duckdb(spark, seqs, tmp_path):
    """A consumer without Spark re-derives a shard's card entry from
    the shipped files alone — the manifest recipe in plain SQL."""
    d = str(tmp_path / "y")
    card = E.export_training_shards(seqs, d, n_shards=4)
    shipped = spark.read.parquet(d)
    cols = shipped.columns  # JSON field order of the recipe
    frag = " || ',' || ".join(
        {
            "seq_id": '\'"seq_id":\' || CAST(seq_id AS VARCHAR)',
            "text": '\'"text":"\' || text || \'"\'',
            "n_tokens": '\'"n_tokens":\' || CAST(n_tokens AS VARCHAR)',
            "pos": '\'"pos":\' || CAST(pos AS VARCHAR)',
            "shard": '\'"shard":\' || CAST(shard AS VARCHAR)',
        }[c]
        for c in cols
    )
    con = duckdb.connect()
    got = con.execute(
        f"""
        SELECT CAST(shard AS VARCHAR) AS shard, count(*) AS rows,
               CAST(sum(CAST(CAST(('0x' || substring(md5(
                   '{{' || {frag} || '}}'), 1, 15)) AS BIGINT)
                   AS HUGEINT)) AS VARCHAR) AS fp
        FROM read_parquet('{d}/*/*.parquet', hive_partitioning=true)
        GROUP BY shard
        """
    ).df()
    for _, r in got.iterrows():
        entry = card["shards"][r["shard"]]
        assert int(r["rows"]) == entry["rows"]
        assert r["fp"] == entry["fingerprint"]


def test_crashed_export_has_no_card(spark, seqs, tmp_path):
    d = str(tmp_path / "z")
    os.makedirs(d)
    assert E.read_dataset_card(d) is None
    with pytest.raises(FileNotFoundError):
        E.verify_shards(spark, d)


def test_nonunique_id_rejected_and_order_cols_fix_it(spark, tmp_path):
    """Tied (id, order) sort keys would make pos — and the fingerprint
    that hashes it — nondeterministic; the export must refuse, and
    order_cols that break the tie must restore determinism with the
    unit's rows adjacent and in order."""
    rows = [
        Row(seq_id=i // 3, seq_offset=i % 3, text=f"c{i}", n_tokens=5)
        for i in range(30)
    ]
    df = spark.createDataFrame(rows)
    with pytest.raises(ValueError, match="nondeterministic"):
        E.export_training_shards(df, str(tmp_path / "bad"), n_shards=2)
    c1 = E.export_training_shards(
        df, str(tmp_path / "a"), n_shards=2, order_cols=["seq_offset"]
    )
    c2 = E.export_training_shards(
        df, str(tmp_path / "b"), n_shards=2, order_cols=["seq_offset"]
    )
    assert c1["shards"] == c2["shards"]
    # a multi-row unit ships adjacent and offset-ordered
    shipped = spark.read.parquet(str(tmp_path / "a"))
    one = sorted(
        (r.pos, r.seq_offset)
        for r in shipped.filter("seq_id = 4").collect()
    )
    ps = [p for p, _ in one]
    assert ps == list(range(ps[0], ps[0] + 3))
    assert [o for _, o in one] == [0, 1, 2]


def test_export_guards(spark, tmp_path):
    df = spark.createDataFrame([Row(seq_id=1, pos=9)])
    with pytest.raises(ValueError, match="reserved"):
        E.export_training_shards(df, str(tmp_path / "r"))
    empty = spark.createDataFrame([], "seq_id long, n_tokens long")
    with pytest.raises(ValueError, match="empty"):
        E.export_training_shards(empty, str(tmp_path / "e"))


def test_verify_survives_total_loss(spark, seqs, tmp_path):
    import shutil

    d = str(tmp_path / "gone")
    card = E.export_training_shards(seqs, d, n_shards=3)
    for p in os.listdir(d):
        if p.startswith("shard="):
            shutil.rmtree(os.path.join(d, p))
    res = E.verify_shards(spark, d)
    assert not res["ok"]
    assert res["mismatched"] == sorted(card["shards"])
