"""C4/RefinedWeb-style cleaning operator semantics."""

import pytest
from pyspark.sql import Row

from solar_logger_spark.operators import cleaning as C


def test_boilerplate_line_rules(spark):
    doc = "\n".join(
        [
            "this line is long enough and ends well.",   # kept
            "short one.",                                 # < 3 words
            "no terminal punctuation on this line",       # punct rule
            "please enable javascript to continue.",      # blacklist
            "another perfectly fine sentence here!",      # kept
            "lorem ipsum dolor sit amet.",                # blacklist
            'a quoted line stays in bounds."',            # kept (quote)
        ]
    )
    df = spark.createDataFrame([Row(doc_id=1, text=doc)])
    out = C.clean_boilerplate_lines(df, min_lines_per_doc=3).collect()[0]
    assert out.n_lines == 7
    assert out.n_lines_kept == 3
    assert out.doc_kept is True
    assert out.clean_text.split("\n") == [
        "this line is long enough and ends well.",
        "another perfectly fine sentence here!",
        'a quoted line stays in bounds."',
    ]


def test_boilerplate_doc_rule_and_relaxed_punct(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="only one good line survives here.")]
    )
    out = C.clean_boilerplate_lines(df).collect()[0]
    assert out.n_lines_kept == 1 and out.doc_kept is False
    relaxed = C.clean_boilerplate_lines(
        spark.createDataFrame([Row(doc_id=1, text="no punct but words")]),
        require_terminal_punct=False,
        min_lines_per_doc=1,
    ).collect()[0]
    assert relaxed.n_lines_kept == 1 and relaxed.doc_kept is True


def test_url_normalize_variants_collapse(spark):
    variants = [
        "https://www.Example.com/Docs/12/",
        "http://example.com/docs/12?utm_source=feed",
        "HTTPS://EXAMPLE.COM/docs/12#frag",
        "example.com/docs/12?id=1&utm_campaign=x",
    ]
    df = spark.createDataFrame([Row(u=v) for v in variants])
    got = {r[0] for r in df.select(C.url_normalize("u")).collect()}
    assert got == {"example.com/docs/12"}
    hosts = {r[0] for r in df.select(C.url_host("u")).collect()}
    assert hosts == {"example.com"}


def test_url_dedup_and_blocklist(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=3, url="https://www.a.com/x/"),
            Row(doc_id=1, url="http://a.com/x"),
            Row(doc_id=2, url="https://b.com/y"),
            Row(doc_id=4, url="https://blocked.com/z"),
        ]
    )
    dd = {r.canonical_url: r for r in C.url_dedup(df, "url").collect()}
    assert dd["a.com/x"].rep_id == 1 and dd["a.com/x"].n_dups == 2
    assert dd["b.com/y"].n_dups == 1
    left = C.url_blocklist_filter(df, "url", ["blocked.com"]).collect()
    assert {r.doc_id for r in left} == {1, 2, 3}


def test_lang_confidence_and_keep_rule(spark):
    df = spark.createDataFrame(
        [
            # confidently english, declared de -> dropped
            Row(doc_id=1, lang="de", text="the a of and to in is the a"),
            # confidently english, declared en -> kept
            Row(doc_id=2, lang="en", text="the a of and to in is"),
            # no evidence at all -> kept (cannot confidently reject)
            Row(doc_id=3, lang="zh", text="spark rows shuffle"),
            # mixed evidence below cutoff -> kept
            Row(doc_id=4, lang="fr", text="the le la de a et of"),
        ]
    )
    conf = {
        r.doc_id: r
        for r in C.lang_confidence(df).select(
            "doc_id", "pred_lang", "lang_hits_total", "lang_confidence"
        ).collect()
    }
    assert conf[1].pred_lang == "en" and conf[1].lang_confidence == 1.0
    assert conf[3].lang_hits_total == 0
    assert conf[3].lang_confidence is None
    assert conf[4].lang_confidence < 0.8
    kept = {r.doc_id for r in C.lang_keep_filter(df).collect()}
    assert kept == {2, 3, 4}
    # output schema is the input schema, untouched
    assert C.lang_keep_filter(df).columns == df.columns


def test_lang_keep_null_declared_lang(spark):
    df = spark.createDataFrame(
        [(1, None, "the a of and to in is the")],
        "doc_id long, lang string, text string",
    )
    # confident 'en' vs declared NULL: eqNullSafe is false -> dropped
    assert C.lang_keep_filter(df).count() == 0


def test_lang_confidence_rejects_reserved_columns(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, lang="en", text="the a", pred_lang="xx")]
    )
    with pytest.raises(ValueError, match="pred_lang"):
        C.lang_confidence(df)
    with pytest.raises(ValueError, match="hits_en"):
        C.lang_keep_filter(
            spark.createDataFrame(
                [Row(doc_id=1, lang="en", text="t", hits_en=9)]
            )
        )


def test_url_normalize_random_differential(spark):
    """url_normalize == a pure-python reference over randomized URL
    shapes (scheme/www/case/query/fragment/trailing-slash variants),
    and normalization is idempotent."""
    import random
    import re

    rng = random.Random(99)
    hosts = ["Example.com", "sub.domain.ORG", "a-b.net", "x.io"]
    paths = ["", "/p", "/p/q", "/Deep/Path/12"]

    def build():
        u = rng.choice(hosts) + rng.choice(paths)
        if rng.random() < 0.5:
            u = "www." + u
        if rng.random() < 0.7:
            u = rng.choice(["http://", "https://", "HTTPS://"]) + u
        if rng.random() < 0.4:
            u += "?" + rng.choice(["a=1", "utm_source=x&b=2", ""])
        if rng.random() < 0.3:
            u += "#" + rng.choice(["frag", "x/y", ""])
        if rng.random() < 0.3:
            u += "/"
        return u

    def ref(u):
        u = u.lower()
        u = re.sub(r"^https?://", "", u)
        u = re.sub(r"^www\.", "", u)
        u = re.sub(r"[?#].*$", "", u)
        u = re.sub(r"/$", "", u)
        return u

    urls = [build() for _ in range(300)]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               "i long, u string")
    got = {r.i: r.n for r in
           df.select("i", C.url_normalize("u").alias("n")).collect()}
    for i, u in enumerate(urls):
        assert got[i] == ref(u), (u, got[i], ref(u))
    # idempotent: normalizing the canonical form changes nothing
    df2 = spark.createDataFrame(
        [(i, v) for i, v in got.items()], "i long, u string"
    )
    again = {r.i: r.n for r in
             df2.select("i", C.url_normalize("u").alias("n")).collect()}
    assert again == got
