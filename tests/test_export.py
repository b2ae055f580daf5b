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


# ----------------------------------------------------------- forget_shards

def _file_map(d):
    """(relpath -> (inode, mtime_ns, size)) for every file under d."""
    out = {}
    for root, _, files in os.walk(d):
        for f in files:
            p = os.path.join(root, f)
            st = os.stat(p)
            out[os.path.relpath(p, d)] = (st.st_ino, st.st_mtime_ns, st.st_size)
    return out


def test_forget_shards_end_to_end(spark, seqs, tmp_path):
    """The compliance contract: forgotten ids leave the shipped bytes,
    the re-committed card attests to the new bytes (verify_shards
    green), and shards the ids never lived in are untouched at the
    inode level."""
    d = str(tmp_path / "f")
    card0 = E.export_training_shards(seqs, d, n_shards=4)
    gone = [3, 17, 42]
    # which shards hold them (the deterministic assignment)
    shipped0 = spark.read.parquet(d)
    hit = {
        int(r["shard"])
        for r in shipped0.filter(F"seq_id in ({','.join(map(str, gone))})")
        .select("shard").distinct().collect()
    }
    before = _file_map(d)

    res = E.forget_shards(spark, d, gone)
    assert res["deleted_rows"] == 3
    assert set(res["affected_shards"]) == hit

    shipped = spark.read.parquet(d)
    assert shipped.filter(shipped.seq_id.isin(gone)).count() == 0
    assert shipped.count() == 60 - 3
    card = E.read_dataset_card(d)
    assert card == res["card"]
    assert card["rows"] == 57
    assert card["tokens"] == card0["tokens"] - sum(10 + (i % 5) for i in gone)
    assert card["fingerprint"] != card0["fingerprint"]
    assert int(card["fingerprint"]) == sum(
        int(s["fingerprint"]) for s in card["shards"].values()
    )
    # the receiving end agrees with the new card
    assert E.verify_shards(spark, d) == {"ok": True, "mismatched": []}
    # untouched shards: every file byte-identical AND not rewritten
    after = _file_map(d)
    for rel, meta in before.items():
        shard_dir = rel.split(os.sep)[0]
        if shard_dir.startswith("shard=") and int(shard_dir.split("=")[1]) not in hit:
            assert after[rel] == meta
    # unaffected card entries unchanged
    for k, entry in card0["shards"].items():
        if int(k) not in hit:
            assert card["shards"][k] == entry


def test_forget_shards_survivor_order_matches_fresh_export(spark, seqs, tmp_path):
    """Surviving rows keep their original pos (holes allowed), and
    their pos-order equals the order a never-shipped-the-forgotten
    export would produce — both orders come from the same md5 key."""
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    E.export_training_shards(seqs, d1, n_shards=4)
    gone = [0, 7, 25, 33]
    E.forget_shards(spark, d1, gone)
    E.export_training_shards(
        seqs.filter(~seqs.seq_id.isin(gone)), d2, n_shards=4
    )
    a = [
        (r["shard"], r["seq_id"])
        for r in spark.read.parquet(d1).orderBy("shard", "pos").collect()
    ]
    b = [
        (r["shard"], r["seq_id"])
        for r in spark.read.parquet(d2).orderBy("shard", "pos").collect()
    ]
    assert a == b


def test_forget_shards_noop_and_idempotent(spark, seqs, tmp_path):
    d = str(tmp_path / "n")
    card0 = E.export_training_shards(seqs, d, n_shards=3)
    assert E.forget_shards(spark, d, [])["deleted_rows"] == 0
    # ids that never shipped: no shard rewritten, files untouched
    before = _file_map(d)
    res = E.forget_shards(spark, d, [9999, 12345])
    assert res["deleted_rows"] == 0 and res["affected_shards"] == []
    assert {
        k: v for k, v in _file_map(d).items() if k.startswith("shard=")
    } == {k: v for k, v in before.items() if k.startswith("shard=")}
    assert E.read_dataset_card(d)["fingerprint"] == card0["fingerprint"]
    res2 = E.forget_shards(spark, d, [11])
    assert res2["deleted_rows"] == 1
    # re-running the same forget converges: nothing left to delete
    res3 = E.forget_shards(spark, d, [11])
    assert res3["deleted_rows"] == 0
    assert res3["card"] == res2["card"]
    assert E.verify_shards(spark, d)["ok"]


def test_forget_shards_empties_a_whole_shard(spark, tmp_path):
    """Deleting every id of a shard removes the dir and drops its card
    entry — the same representation an originally-empty shard gets —
    and the fingerprint sum property still holds."""
    rows = [Row(seq_id=i, text=f"t{i}", n_tokens=4) for i in range(20)]
    df = spark.createDataFrame(rows)
    d = str(tmp_path / "e")
    card0 = E.export_training_shards(df, d, n_shards=3)
    victim = "0"
    victim_ids = [
        r["seq_id"]
        for r in spark.read.parquet(d).filter(f"shard = {victim}").collect()
    ]
    assert victim_ids
    res = E.forget_shards(spark, d, victim_ids)
    assert res["deleted_rows"] == len(victim_ids)
    card = E.read_dataset_card(d)
    assert victim not in card["shards"]
    assert not os.path.isdir(os.path.join(d, f"shard={victim}"))
    assert card["rows"] == 20 - len(victim_ids)
    assert E.verify_shards(spark, d) == {"ok": True, "mismatched": []}
    assert int(card["fingerprint"]) == sum(
        int(s["fingerprint"]) for s in card["shards"].values()
    )
    assert card0["shards"].keys() - card["shards"].keys() == {victim}


def test_forget_shards_requires_card(spark, tmp_path):
    d = str(tmp_path / "nc")
    os.makedirs(d)
    with pytest.raises(FileNotFoundError, match="nothing shipped"):
        E.forget_shards(spark, d, [1])


def test_forget_crash_recovery_restores_or_completes(spark, seqs, tmp_path):
    """Simulated crash states: a tmp dir is dead; an _OLD dir without
    its live shard is restored; an _OLD dir with a live shard is dead.
    After recovery a re-run converges and verify passes."""
    import shutil

    d = str(tmp_path / "c")
    E.export_training_shards(seqs, d, n_shards=3)
    card0 = E.read_dataset_card(d)
    # crash between the two renames: live shard moved aside, tmp gone
    os.rename(os.path.join(d, "shard=1"), os.path.join(d, "_forget_old_shard_1"))
    os.makedirs(os.path.join(d, "_forget_tmp_shard_2"))
    res = E.forget_shards(spark, d, [])  # empty forget: recovery only
    assert res["deleted_rows"] == 0
    assert os.path.isdir(os.path.join(d, "shard=1"))
    assert not os.path.isdir(os.path.join(d, "_forget_old_shard_1"))
    assert not os.path.isdir(os.path.join(d, "_forget_tmp_shard_2"))
    assert E.read_dataset_card(d) == card0
    assert E.verify_shards(spark, d)["ok"]
    # crash after the swap: old copy left behind with live present
    shutil.copytree(os.path.join(d, "shard=0"), os.path.join(d, "_forget_old_shard_0"))
    E.forget_shards(spark, d, [2])
    assert not os.path.isdir(os.path.join(d, "_forget_old_shard_0"))
    assert E.verify_shards(spark, d)["ok"]


def test_crashed_export_is_reshippable(spark, seqs, tmp_path):
    """The export STAGES in a sibling dir and renames into place: a
    crash leaves out_dir nonexistent plus a dead stage dir the next
    run replaces — so re-shipping just works. An out_dir that exists
    WITHOUT a card was not staged by this export and must be refused,
    never cleared (it could be foreign shard=-partitioned data)."""
    d = str(tmp_path / "rs")
    # simulate a crash: stage dir exists, out_dir never appeared
    os.makedirs(d + "._inprogress_probe")  # unrelated sibling, untouched
    os.makedirs(d + ".inprogress/shard=0")
    card = E.export_training_shards(seqs, d, n_shards=3)
    assert card["rows"] == 60
    assert E.verify_shards(spark, d) == {"ok": True, "mismatched": []}
    assert not os.path.exists(d + ".inprogress")  # renamed into place
    assert os.path.isdir(d + "._inprogress_probe")

    # uncarded existing out_dir: refuse loudly, delete nothing
    foreign = str(tmp_path / "foreign")
    os.makedirs(os.path.join(foreign, "shard=0"))
    with open(os.path.join(foreign, "shard=0", "data.parquet"), "w") as fh:
        fh.write("not ours")
    with pytest.raises(FileExistsError, match="did not stage"):
        E.export_training_shards(seqs, foreign, n_shards=3)
    assert os.path.exists(os.path.join(foreign, "shard=0", "data.parquet"))


def test_forget_converges_after_crash_between_empty_and_card(
    spark, tmp_path
):
    """A sweep that empties and removes a shard but dies before the
    card rewrite leaves a stale card naming a missing dir; the re-run
    must converge (count those rows as deleted, drop the entry), not
    crash on the missing path forever."""
    rows = [Row(seq_id=i, text=f"t{i}", n_tokens=4) for i in range(20)]
    df = spark.createDataFrame(rows)
    d = str(tmp_path / "cc")
    E.export_training_shards(df, d, n_shards=3)
    victim_ids = [
        r["seq_id"]
        for r in spark.read.parquet(d).filter("shard = 1").collect()
    ]
    import shutil

    shutil.rmtree(os.path.join(d, "shard=1"))  # simulate the crash state
    res = E.forget_shards(spark, d, victim_ids)
    # the crashed sweep's rows surface as RECOVERED, not as this
    # request's deletions (nothing was on disk to delete now)
    assert res["deleted_rows"] == 0
    assert res["recovered_rows"] == len(victim_ids)
    card = E.read_dataset_card(d)
    assert "1" not in card["shards"]
    assert E.verify_shards(spark, d) == {"ok": True, "mismatched": []}


def test_verify_green_on_fully_forgotten_export(spark, tmp_path):
    """Forgetting EVERY id legally empties the dataset: the card lists
    zero shards, the directory holds none, and the audit must report
    ok — a compliance-complete state is not a corruption."""
    rows = [Row(seq_id=i, text=f"t{i}", n_tokens=4) for i in range(9)]
    d = str(tmp_path / "all")
    E.export_training_shards(spark.createDataFrame(rows), d, n_shards=2)
    res = E.forget_shards(spark, d, list(range(9)))
    assert res["deleted_rows"] == 9
    card = E.read_dataset_card(d)
    assert card["shards"] == {} and card["rows"] == 0
    assert E.verify_shards(spark, d) == {"ok": True, "mismatched": []}


def test_forget_resweep_of_emptied_export_and_recovered_split(
    spark, tmp_path
):
    """(a) re-sweeping a legally emptied export is a no-op, not a
    schema crash; (b) rows removed by a CRASHED earlier sweep are
    reported as recovered_rows, never credited to the current
    request's deleted_rows."""
    rows = [Row(seq_id=i, text=f"t{i}", n_tokens=4) for i in range(12)]
    d = str(tmp_path / "e2")
    E.export_training_shards(spark.createDataFrame(rows), d, n_shards=3)
    E.forget_shards(spark, d, list(range(12)))  # empty everything
    res = E.forget_shards(spark, d, [3, 4])     # idempotent re-sweep
    assert res == {
        "deleted_rows": 0, "recovered_rows": 0,
        "affected_shards": [], "card": E.read_dataset_card(d),
    }

    d2 = str(tmp_path / "cr")
    E.export_training_shards(spark.createDataFrame(rows), d2, n_shards=3)
    card0 = E.read_dataset_card(d2)
    victim = "1"
    n_victim = card0["shards"][victim]["rows"]
    import shutil

    shutil.rmtree(os.path.join(d2, f"shard={victim}"))  # crashed sweep
    # current request: ids that hash to the missing shard but were
    # "deleted" by the crashed sweep — 0 deleted now, N recovered
    gone_ids = [
        r["seq_id"] for r in spark.createDataFrame(rows)
        .withColumn("s", E.shuffle_assignment("seq_id", 3)[0])
        .filter(f"s = {victim}").collect()
    ]
    res2 = E.forget_shards(spark, d2, gone_ids)
    assert res2["deleted_rows"] == 0
    assert res2["recovered_rows"] == n_victim
    assert E.verify_shards(spark, d2)["ok"]


def test_verify_shards_subset_mode(spark, seqs, tmp_path):
    """Audit only named shards (the post-forget pattern): partition
    pruning bounds the read, a tampered shard outside the subset is
    invisible to it but caught by the full audit, and a subset naming
    a missing shard flags it."""
    import shutil

    d = str(tmp_path / "sub")
    card = E.export_training_shards(seqs, d, n_shards=4)
    all_ids = sorted(int(k) for k in card["shards"])
    ok_two = E.verify_shards(spark, d, shards=all_ids[:2])
    assert ok_two == {"ok": True, "mismatched": []}
    victim = all_ids[-1]
    shutil.rmtree(os.path.join(d, f"shard={victim}"))
    # subset NOT covering the victim stays green...
    assert E.verify_shards(spark, d, shards=all_ids[:2])["ok"]
    # ...the subset covering it, and the full audit, both flag it
    assert E.verify_shards(spark, d, shards=[victim]) == {
        "ok": False, "mismatched": [str(victim)],
    }
    assert not E.verify_shards(spark, d)["ok"]
