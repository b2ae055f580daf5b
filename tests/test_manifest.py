"""Dataset manifests: cards commit atomically with snapshots and
fingerprints behave (order-independent, change-sensitive, engine-
reproducible via the md5 recipe)."""

import duckdb
import pytest
from pyspark.sql import Row

from solar_logger_spark.io import manifest as MF
from solar_logger_spark.io import merge as M


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def test_fingerprint_order_independent_and_change_sensitive(spark):
    rows = [Row(k=i, v=f"v{i}") for i in range(50)]
    n1, f1 = MF.content_fingerprint(_df(spark, rows))
    n2, f2 = MF.content_fingerprint(
        _df(spark, list(reversed(rows))).repartition(7)
    )
    assert (n1, f1) == (n2, f2)  # order/layout-independent
    _, f3 = MF.content_fingerprint(
        _df(spark, rows[:-1] + [Row(k=49, v="CHANGED")])
    )
    assert f3 != f1


def test_fingerprint_reproducible_in_duckdb(spark):
    """The card's fingerprint must be re-derivable by another engine —
    the repo's md5 discipline applied to whole-table contents."""
    rows = [Row(k=i, v=f"v{i}") for i in range(20)]
    n, fp = MF.content_fingerprint(_df(spark, rows))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"({r.k}, 'v{r.k}')" for r in rows)
        + ") AS t(k, v)"
    )
    got = con.execute(
        """
        SELECT count(*),
               sum(CAST(CAST(('0x' || substring(md5(
                   '{"k":' || CAST(k AS VARCHAR)
                   || ',"v":"' || v || '"}'), 1, 15)) AS BIGINT)
                   AS HUGEINT))
        FROM t
        """
    ).fetchone()
    assert got[0] == n
    assert str(int(got[1])) == fp


def test_audit_query_recipe_matches_card(spark):
    """The declared corpus_content_fingerprints audit contract: its
    per-slice DECIMAL fingerprints sum, as plain integers, to the
    whole-table manifest card value — same row_hash_expr, same
    rendering, so a consumer can verify a shipped slice against the
    card it rode in on."""
    from pyspark.sql import functions as F

    rows = [Row(k=i, v=f"v{i}", grp=("a" if i % 3 else "b"))
            for i in range(30)]
    df = spark.createDataFrame(rows, "k long, v string, grp string")
    _, card_fp = MF.content_fingerprint(df)
    per_slice = (
        df.groupBy("grp")
        .agg(F.sum(MF.row_hash_expr(df.columns))
             .cast("decimal(38,0)").cast("string").alias("fp"))
        .collect()
    )
    assert sum(int(r["fp"]) for r in per_slice) == int(card_fp)


def test_fingerprint_null_fields_match_duckdb(spark):
    """to_json omits NULL fields; the oracle's concat_ws(CASE...) form
    must reproduce that byte-for-byte, so rows with NULLs neither
    diverge nor silently drop out of the sum (a NULL-poisoned plain
    concat would make md5 NULL and sum() skip the row)."""
    rows = [Row(k=1, v="x"), Row(k=2, v=None), Row(k=None, v="y")]
    df = spark.createDataFrame(rows, "k long, v string")
    n, fp = MF.content_fingerprint(df)
    assert n == 3
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t(k BIGINT, v VARCHAR); "
        "INSERT INTO t VALUES (1,'x'), (2,NULL), (NULL,'y')"
    )
    got = con.execute(
        """
        SELECT count(*),
               sum(CAST(CAST(('0x' || substring(md5(
                   '{' || concat_ws(',',
                       CASE WHEN k IS NOT NULL
                            THEN '"k":' || CAST(k AS VARCHAR) END,
                       CASE WHEN v IS NOT NULL
                            THEN '"v":"' || v || '"' END
                   ) || '}'), 1, 15)) AS BIGINT) AS HUGEINT))
        FROM t
        """
    ).fetchone()
    assert got[0] == n
    assert str(int(got[1])) == fp


def test_write_stage_card_rides_snapshot_and_time_travels(spark, tmp_path):
    d = str(tmp_path / "stage")
    MF.write_stage(
        _df(spark, [Row(k=1, v="a")]), d,
        config={"threshold": 0.5}, keep_snapshots=5,
    )
    MF.write_stage(
        _df(spark, [Row(k=1, v="a"), Row(k=2, v="b")]), d,
        config={"threshold": 0.7}, keep_snapshots=5,
    )
    live = MF.read_stage_manifest(d)
    assert live["rows"] == 2 and live["config"] == {"threshold": 0.7}
    assert live["schema"] == "struct<k:bigint,v:string>"
    old = MF.read_stage_manifest(d, at="snap-000000")
    assert old["rows"] == 1 and old["config"] == {"threshold": 0.5}
    # the card always describes the data it rode in with
    import os

    assert os.path.exists(
        os.path.join(d, M.current_snapshot(d), MF.MANIFEST_SIDECAR)
    )


def test_dataset_card_reports_gaps_honestly(spark, tmp_path):
    import os

    work = str(tmp_path)
    MF.write_stage(_df(spark, [Row(k=1, v="a")]), os.path.join(work, "s1"))
    M.init_table(  # a table WITHOUT a manifest card
        _df(spark, [Row(k=2, v="b")]), os.path.join(work, "s2")
    )
    card = MF.dataset_card(spark, work, ["s1", "s2", "missing"])
    by = {c["stage"]: c for c in card}
    assert by["s1"]["manifest"]["rows"] == 1
    assert by["s2"]["manifest"] is None and by["s2"]["snapshot"]
    assert by["missing"]["snapshot"] is None
