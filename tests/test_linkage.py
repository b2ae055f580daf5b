"""Record-linkage fuzzy join: multi-key blocking, thresholded
verification, deterministic best-match, honest unmatched rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solar_logger_spark.operators import linkage


@pytest.fixture()
def catalog(spark):
    rows = [
        (1, "red widget"),
        (2, "red widget"),        # duplicate name: tie material
        (3, "blue bolt"),
        (4, "small ring"),
        (5, "golden gear"),
    ]
    return spark.createDataFrame(rows, "pk long, name string")


def _match(df):
    return {
        r["fid"]: (r["match_pk"], r["dist"]) for r in df.collect()
    }


def test_best_match_exact_near_and_tie_break(spark, catalog):
    feed = spark.createDataFrame(
        [
            (10, "red widget"),    # exact; tie between pk 1 and 2
            (11, "red widgex"),    # dist 1
            (12, "blue bol"),      # dist 1 (dropped char)
        ],
        "fid long, fname string",
    )
    got = _match(linkage.fuzzy_join(
        feed, catalog, "fid", "fname", "pk", "name", max_dist=2
    ))
    # deterministic tie-break: min (dist, right key)
    assert got[10] == (1, 0)
    assert got[11] == (1, 1)
    assert got[12] == (3, 1)


def test_second_block_key_recovers_first_token_corruption(spark, catalog):
    """Noise in the first token defeats first-token blocking; the
    second-token pass must still reach the pair — the reason blocking
    is multi-key."""
    feed = spark.createDataFrame(
        [(20, "xxall ring")], "fid long, fname string"
    )
    got = _match(linkage.fuzzy_join(
        feed, catalog, "fid", "fname", "pk", "name", max_dist=2,
        blocks=linkage.DEFAULT_BLOCKS,
    ))
    assert got[20] == (4, 2)
    # the deletes default finds it too
    got_d = _match(linkage.fuzzy_join(
        feed, catalog, "fid", "fname", "pk", "name", max_dist=2
    ))
    assert got_d[20] == (4, 2)
    # and with ONLY the first-token block it is honestly unmatched
    got1 = _match(linkage.fuzzy_join(
        feed, catalog, "fid", "fname", "pk", "name", max_dist=2,
        blocks=[linkage.DEFAULT_BLOCKS[0]],
    ))
    assert got1[20] == (None, None)


def test_unmatched_kept_or_dropped(spark, catalog):
    feed = spark.createDataFrame(
        [(30, "zzqqqqqq"), (31, "small ring")], "fid long, fname string"
    )
    kept = linkage.fuzzy_join(
        feed, catalog, "fid", "fname", "pk", "name", max_dist=2
    )
    assert _match(kept) == {30: (None, None), 31: (4, 0)}
    inner = linkage.fuzzy_join(
        feed, catalog, "fid", "fname", "pk", "name",
        max_dist=2, keep_unmatched=False,
    )
    assert _match(inner) == {31: (4, 0)}


def test_candidates_deduped_across_passes(spark, catalog):
    """A pair both block keys find must be scored once — one output
    row per left row, even when every pass fires."""
    feed = spark.createDataFrame(
        [(40, "golden gear")], "fid long, fname string"
    )
    for blocks in (None, linkage.DEFAULT_BLOCKS):
        out = linkage.fuzzy_join(
            feed, catalog, "fid", "fname", "pk", "name", max_dist=1,
            blocks=blocks,
        ).collect()
        assert len(out) == 1
        assert out[0]["match_name"] == "golden gear"


def test_validation(spark, catalog):
    feed = spark.createDataFrame([(1, "a")], "fid long, fname string")
    with pytest.raises(ValueError, match="max_dist"):
        linkage.fuzzy_join(
            feed, catalog, "fid", "fname", "pk", "name", max_dist=-1
        )
    with pytest.raises(ValueError, match="block"):
        linkage.fuzzy_join(
            feed, catalog, "fid", "fname", "pk", "name", blocks=[]
        )


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_deletes_candidates_complete_randomized(spark):
    """FastSS completeness, randomized: over small-alphabet strings
    (near pairs common), the deletes-strategy best match must equal a
    pure-Python brute force over ALL catalog rows for every feed row —
    any missed candidate within the threshold shows up as a wrong or
    missing winner."""
    import random

    rng = random.Random(2024)
    alpha = "abc"

    def word():
        return "".join(rng.choice(alpha) for _ in range(rng.randint(3, 8)))

    catalog_rows = [(i, word()) for i in range(120)]
    feed_rows = [(1000 + i, word()) for i in range(80)]
    catalog = spark.createDataFrame(catalog_rows, "pk long, name string")
    feed = spark.createDataFrame(feed_rows, "fid long, fname string")
    got = {
        r["fid"]: (r["match_pk"], r["dist"])
        for r in linkage.fuzzy_join(
            feed, catalog, "fid", "fname", "pk", "name", max_dist=2
        ).collect()
    }
    for fid, fname in feed_rows:
        best = min(
            ((d, pk) for pk, name in catalog_rows
             if (d := _lev(fname, name)) <= 2),
            default=None,
        )
        exp = (best[1], best[0]) if best else (None, None)
        assert got[fid] == exp, (fid, fname, got[fid], exp)
