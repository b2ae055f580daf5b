"""The whole production surface in ONE integration contract: crawl
deliveries stream into the incremental dedup index (+ maintained CC
labels), the corpus build materializes its staged tables with manifest
cards, the packed sequences ship as carded training shards, and a
right-to-be-forgotten sweep then reaches BOTH the index and the
shipped shards AND the maintained ANN index over the corpus
embeddings — with every stage manifest and the export card re-derived
post-hoc in DuckDB from the on-disk bytes (the audit a dataset
consumer without Spark can run)."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from solar_logger_spark.io import export as EX
from solar_logger_spark.io import manifest as MF
from solar_logger_spark.io import merge as M
from solar_logger_spark.io.tables import load_table
from solar_logger_spark.streaming import ann_ingest as AI
from solar_logger_spark.streaming import dedup_ingest as DI
from tools.run_corpus_pipeline import STAGES, run_staged


def _duck_stage_audit(stage_dir: str) -> tuple[int, str]:
    """Re-derive (rows, fingerprint) from a stage snapshot's parquet
    with DuckDB alone — the manifest recipe (md5 of canonical JSON,
    60-bit prefix, decimal sum) in plain SQL."""
    snap = M.current_snapshot(stage_dir)
    con = duckdb.connect()
    cols = con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{stage_dir}/{snap}/*.parquet')"
    ).fetchall()
    frags = []
    for name, typ, *_ in cols:
        if typ == "VARCHAR":
            frags.append(f"'\"{name}\":\"' || {name} || '\"'")
        elif typ in ("BIGINT", "INTEGER"):
            frags.append(f"'\"{name}\":' || CAST({name} AS VARCHAR)")
        else:  # a type whose JSON text isn't pinned here — fail loudly
            raise AssertionError(f"unhandled stage column type {typ}")
    expr = " || ',' || ".join(frags)
    n, fp = con.execute(
        f"""
        SELECT count(*),
               CAST(coalesce(sum(CAST(CAST(('0x' || substring(md5(
                   '{{' || {expr} || '}}'), 1, 15)) AS BIGINT)
                   AS HUGEINT)), 0) AS VARCHAR)
        FROM read_parquet('{stage_dir}/{snap}/*.parquet')
        """
    ).fetchone()
    return int(n), fp


def test_full_chain_ingest_build_export_forget(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    base = str(tmp_path)
    idx = os.path.join(base, "idx")
    pairs = os.path.join(base, "pairs")
    comp = os.path.join(base, "comp")
    work = os.path.join(base, "work")

    # -- 1. crawl ingest: two deliveries through the streaming sink --
    sink = DI.incremental_dedup_sink(
        idx, pairs, threshold=0.5, index_partitions=8,
        components_dir=comp,
    )
    d1 = docs.filter(F.col("doc_id") % 2 == 0)
    d2 = docs.filter(F.col("doc_id") % 2 == 1)
    sink(d1, 0)
    sink(d2, 1)
    sh, bk = DI.read_index(spark, idx)
    assert sh.select("doc_id").distinct().count() == docs.count()

    # -- 1b. the same corpus's embeddings feed a maintained ANN index
    # (doc-keyed: vec_id ≡ doc_id), same bootstrap/delivery split ----
    emb = load_table(spark, sf_dir, "embeddings")
    ann = os.path.join(base, "ann")
    AI.bootstrap_ann_index(
        emb.filter(F.col("vec_id") % 2 == 0), ann, n_cells=8, m=8, ks=16
    )
    AI.ann_ingest_sink(ann)(emb.filter(F.col("vec_id") % 2 == 1), 1)
    assert AI.resolved_codes(spark, ann).count() == emb.count()

    # -- 2. corpus build: staged tables with manifest cards ----------
    funnel = run_staged(spark, sf_dir, work)
    assert funnel.count() > 0
    for stage in STAGES:
        sdir = os.path.join(work, stage)
        card = MF.read_stage_manifest(sdir)
        assert card is not None
        n, fp = _duck_stage_audit(sdir)
        assert (n, fp) == (card["rows"], card["fingerprint"]), stage

    # -- 3. export: packed sequences -> carded shards ----------------
    packed = M.read_table_snapshot(
        spark, os.path.join(work, "stage_packed")
    ).withColumn(
        "export_id", F.concat_ws(":", F.col("source"), F.col("seq_id"))
    )
    shards = os.path.join(base, "shards")
    card = EX.export_training_shards(
        packed, shards, n_shards=4, id_col="export_id",
        order_cols=["seq_offset"],
    )
    assert EX.verify_shards(spark, shards)["ok"]
    # the export card's totals agree with the packed stage's manifest
    pk = MF.read_stage_manifest(os.path.join(work, "stage_packed"))
    assert card["rows"] == pk["rows"]

    # -- 4. forget: one sweep reaches index, labels, AND shards ------
    # forget two shipped export units and their docs
    victims = [r["doc_id"] for r in packed.select("doc_id").distinct()
               .orderBy("doc_id").limit(2).collect()]
    exp_victims = [
        r["export_id"] for r in packed
        .filter(F.col("doc_id").isin(victims))
        .select("export_id").distinct().collect()
    ]
    out = DI.forget_docs(
        spark, idx, victims, pairs_dir=pairs, components_dir=comp,
    )
    assert DI.SHINGLES in out
    EX.forget_shards(spark, shards, exp_victims)
    n_vec_victims = emb.filter(F.col("vec_id").isin(victims)).count()
    # a victim that SEEDED the ANN model would be refused (its raw
    # vector lives in the model sidecar; recenter is the remedy) —
    # acknowledge explicitly here, the dedicated residue test owns
    # that path
    ann_out = AI.forget_vecs(spark, ann, victims, allow_model_residue=True)
    assert ann_out["deleted_rows"] == n_vec_victims

    sh2, _ = DI.read_index(spark, idx)
    assert sh2.filter(F.col("doc_id").isin(victims)).count() == 0
    shipped = spark.read.parquet(shards)
    assert shipped.filter(F.col("export_id").isin(exp_victims)).count() == 0
    assert EX.verify_shards(spark, shards)["ok"]
    comp_t = M.read_table_snapshot(spark, comp)
    assert comp_t.filter(F.col("node").isin(victims)).count() == 0
    # the forgotten docs' vectors are gone from the ANN index too —
    # resolved reads AND raw bytes
    assert AI.resolved_codes(spark, ann).filter(
        F.col("vec_id").isin(victims)
    ).count() == 0
    res = AI.search_ann_index(
        spark, ann, emb.filter(F.col("vec_id") < 5), corpus=emb,
        k=10, n_probe=8, rerank=200,
    )
    assert not (
        {r.neighbor_id for r in res.collect()} & set(victims)
    )

    # the re-committed card still re-derives from shipped bytes in
    # DuckDB (the same consumer-side audit as the export tests)
    new_card = EX.read_dataset_card(shards)
    con = duckdb.connect()
    got = con.execute(
        f"""
        SELECT CAST(count(*) AS BIGINT),
               CAST(sum(CAST(CAST(('0x' || substring(md5(
                 '{{' || '"doc_id":' || CAST(doc_id AS VARCHAR)
                 || ',' || '"chunk_index":' || CAST(chunk_index AS VARCHAR)
                 || ',' || '"source":"' || source || '"'
                 || ',' || '"n_tokens":' || CAST(n_tokens AS VARCHAR)
                 || ',' || '"seq_id":' || CAST(seq_id AS VARCHAR)
                 || ',' || '"seq_offset":' || CAST(seq_offset AS VARCHAR)
                 || ',' || '"export_id":"' || export_id || '"'
                 || ',' || '"pos":' || CAST(pos AS VARCHAR)
                 || ',' || '"shard":' || CAST(shard AS VARCHAR)
                 || '}}'), 1, 15)) AS BIGINT) AS HUGEINT)) AS VARCHAR)
        FROM read_parquet('{shards}/*/*.parquet', hive_partitioning=true)
        """
    ).fetchone()
    assert int(got[0]) == new_card["rows"]
    assert got[1] == new_card["fingerprint"]
