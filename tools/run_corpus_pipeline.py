"""Staged corpus-build runner: the PRODUCTION topology of
``pipeline_corpus_build``.

The declared query composes the funnel as one lineage (fine for a
query; Catalyst plans each subtree once). A production corpus build
materializes every stage as a TABLE — so each stage is independently
restartable, auditable, and consumable by other jobs — and reads the
previous stage back instead of recomputing it. This runner does
exactly that against the repo's copy-on-write snapshot store
(``solar_logger_spark.io.merge``): one snapshot table per stage

    stage_lang     language-confidence cutoff survivors
    stage_quality  quality-score survivors
    stage_dedup    n-gram-Jaccard near-dup prune survivors
    stage_chunks   128-token chunks
    stage_packed   512-token packed sequences

and then computes the SAME per-source funnel report from the stored
tables. ``tests/test_corpus_pipeline.py`` pins the staged funnel to
the one-shot query's rows — materialize/re-read must change nothing
but the execution topology.

Usage:
    python tools/run_corpus_pipeline.py [sf_dir] [work_dir]
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import DataFrame, SparkSession, functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from solar_logger_spark.io import merge as M               # noqa: E402
from solar_logger_spark.io.tables import load_table        # noqa: E402
from solar_logger_spark.operators import cleaning, dedup, text  # noqa: E402


STAGES = [
    "stage_lang", "stage_quality", "stage_dedup",
    "stage_chunks", "stage_packed",
]


def _store(
    df: DataFrame, work_dir: str, name: str,
    config: dict | None = None,
) -> DataFrame:
    """Materialize ``df`` as a new snapshot of a store table and read
    it back — the stage boundary. Everything downstream sees the
    table, not the lineage; re-running against the same work_dir
    writes the next snapshot (previous runs stay time-travelable).
    Each snapshot carries its MANIFEST card (rows, content
    fingerprint, schema, stage config) as an atomically-committed
    sidecar — the dataset-card trail an auditable corpus build owes
    its consumers (io/manifest.py)."""
    from solar_logger_spark.io import manifest as MF

    spark = df.sparkSession
    tdir = os.path.join(work_dir, name)
    MF.write_stage(df, tdir, config=config)
    return M.read_table_snapshot(spark, tdir)


def run_staged(spark: SparkSession, sf_dir: str, work_dir: str) -> DataFrame:
    """Run the corpus build stage-by-stage through the snapshot store
    and return the per-source funnel (same schema and values as the
    one-shot ``pipeline_corpus_build`` declared query)."""
    docs = load_table(spark, sf_dir, "documents")

    keptl = _store(cleaning.lang_keep_filter(docs), work_dir, "stage_lang",
                   config={"rule": "lang-confidence cutoff"})

    scored = text.quality_score(keptl).select("doc_id", "quality_score")
    keptq = _store(
        keptl.join(
            scored.filter(F.col("quality_score") >= 0.62).select("doc_id"),
            "doc_id",
        ),
        work_dir,
        "stage_quality",
        config={"min_quality_score": 0.62},
    )

    pairs = dedup.ngram_jaccard_pairs(keptq, threshold=0.5)
    surv = _store(
        keptq.join(
            pairs.select(F.col("b_id").alias("doc_id")).distinct(),
            "doc_id",
            "left_anti",
        ),
        work_dir,
        "stage_dedup",
        config={"jaccard_threshold": 0.5, "rule": "drop lower-id partner"},
    )

    chunks = _store(
        text.chunk_documents(surv, chunk_tokens=128, overlap=0)
        .join(surv.select("doc_id", "source"), "doc_id")
        .select("doc_id", "chunk_index", "source", "n_tokens"),
        work_dir,
        "stage_chunks",
        config={"chunk_tokens": 128, "overlap": 0},
    )

    packed = _store(
        text.pack_training_sequences(chunks, max_tokens=512, part_col="source"),
        work_dir,
        "stage_packed",
        config={"max_tokens": 512, "part_col": "source"},
    )

    f_in = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_in")
    )
    f_l = keptl.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_lang")
    )
    f_q = keptq.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_quality")
    )
    f_p = packed.groupBy("source").agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs_kept"),
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.countDistinct("seq_id").cast("long").alias("n_sequences"),
    )
    return (
        f_in.join(f_l, "source", "left")
        .join(f_q, "source", "left")
        .join(f_p, "source", "left")
        .na.fill(
            {
                "n_docs_lang": 0,
                "n_docs_quality": 0,
                "n_docs_kept": 0,
                "n_chunks": 0,
                "total_tokens": 0,
                "n_sequences": 0,
            }
        )
        .orderBy("source")
    )


def main() -> None:
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = pos[0] if len(pos) > 0 else "/root/testdata/sf0.01"
    work_dir = pos[1] if len(pos) > 1 else "/tmp/corpus_pipeline"
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .appName("corpus-pipeline")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for r in run_staged(spark, sf_dir, work_dir).collect():
        print(r.asDict())
    import json

    from solar_logger_spark.io import manifest as MF

    print(json.dumps(MF.dataset_card(spark, work_dir, STAGES), indent=2))

    if "--export-shards" in sys.argv:
        # the last mile: ship the packed sequences as shuffled training
        # shards with a shipped-bytes dataset card (io/export.py).
        # seq_id restarts per source and repeats per chunk, so the
        # export unit is the (source, seq_id) SEQUENCE — chunks stay
        # adjacent, ordered by seq_offset — and the out dir is keyed by
        # the packed snapshot, so re-running against the same work_dir
        # is idempotent instead of dying on the existing card.
        from solar_logger_spark.io import export as EX

        packed_dir = os.path.join(work_dir, "stage_packed")
        snap = M.current_snapshot(packed_dir)
        packed = M.read_table_snapshot(spark, packed_dir).withColumn(
            "export_id",
            F.concat_ws(":", F.col("source"), F.col("seq_id")),
        )
        out = os.path.join(work_dir, f"shards-{snap}")
        card = EX.read_dataset_card(out)
        if card is None:
            card = EX.export_training_shards(
                packed, out, n_shards=16, id_col="export_id",
                order_cols=["seq_offset"],
            )
        print(json.dumps(
            {"shards_dir": out, "rows": card["rows"],
             "tokens": card.get("tokens"),
             "fingerprint": card["fingerprint"]},
            indent=2,
        ))
        print(json.dumps(EX.verify_shards(spark, out)))


if __name__ == "__main__":
    main()
