"""C4/RefinedWeb-style corpus cleaning operators: boilerplate-line
removal, URL canonicalization + URL-keyed dedup/blocklisting, and a
document-level language-confidence cutoff.

These are the pre-dedup hygiene passes of a web-scale training-data
pipeline (C4: Raffel et al., JMLR 2020 §2.2; RefinedWeb: Penedo et
al., NeurIPS 2023 §3). Every rule here is a JVM-side expression —
``split`` / higher-order array functions / ``regexp_replace`` — so the
whole pass stays inside whole-stage codegen and is embarrassingly
row-parallel: no shuffle, no Python, which is exactly what a pass that
must touch every byte of 100 TB needs. The arithmetic (integer counts,
one int→double division for confidence) is mirrored verbatim by the
SQL oracles, so results are bit-reproducible cross-engine.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from solar_logger_spark.operators.text import (
    LANG_MARKERS,
    lang_hit_columns,
    lang_pred_expr,
)

# C4's line-level heuristics: a terminal-punctuation requirement and a
# line blacklist (the published rules target javascript warnings,
# lorem-ipsum filler, and code braces).
TERMINAL_PUNCT = (".", "!", "?", '"', "'")
DEFAULT_LINE_BLACKLIST = ("javascript", "lorem ipsum", "{")


def clean_boilerplate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words_per_line: int = 3,
    require_terminal_punct: bool = True,
    blacklist: Sequence[str] = DEFAULT_LINE_BLACKLIST,
    min_lines_per_doc: int = 3,
) -> DataFrame:
    """C4-style boilerplate-line scrub: split ``text_col`` on newlines,
    keep only lines that (a) have at least ``min_words_per_line``
    non-empty whitespace words, (b) end in terminal punctuation
    (``.!?"'`` — when ``require_terminal_punct``), and (c) contain no
    blacklisted phrase (case-insensitive substring).

    Output (one row per input row — filtering docs is the caller's
    choice via ``doc_kept``):

    ``(id, n_lines, n_lines_kept, clean_text, doc_kept)`` where
    ``clean_text`` is the kept lines rejoined with newlines and
    ``doc_kept`` mirrors C4's document rule: at least
    ``min_lines_per_doc`` surviving lines.

    One ``filter()`` over a split array per row — map-only, no Python.
    """
    lines = F.split(F.col(text_col), "\n")

    def _keep(line: Column) -> Column:
        words = F.size(
            F.filter(F.split(line, " "), lambda w: w != F.lit(""))
        )
        ok = words >= F.lit(min_words_per_line)
        if require_terminal_punct:
            ok = ok & F.substring(line, -1, 1).isin(*TERMINAL_PUNCT)
        for phrase in blacklist:
            ok = ok & ~F.contains(F.lower(line), F.lit(phrase.lower()))
        return ok

    kept = F.filter(lines, _keep)
    return df.select(
        F.col(id_col),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_lines_kept"),
        F.array_join(kept, "\n").alias("clean_text"),
        (F.size(kept) >= F.lit(min_lines_per_doc)).alias("doc_kept"),
    )


# -- URL canonicalization ----------------------------------------------------

def url_normalize(url: Column | str) -> Column:
    """Canonical URL for dedup keying: lowercase, scheme and ``www.``
    stripped, query string and fragment dropped, trailing slash
    removed — the aggressive normalization web-corpus dedup uses
    (two crawls of the same page should collapse to one key even when
    tracking parameters or scheme differ).

    Pure ``regexp_replace`` chain; the same patterns run in DuckDB
    (RE2-safe syntax: no lookaround, no backreferences).
    """
    u = F.lower(url if isinstance(url, Column) else F.col(url))
    u = F.regexp_replace(u, r"^https?://", "")
    u = F.regexp_replace(u, r"^www\.", "")
    u = F.regexp_replace(u, r"[?#].*$", "")
    u = F.regexp_replace(u, r"/$", "")
    return u


def url_host(url: Column | str) -> Column:
    """Host part of an (already normalized or raw) URL — everything up
    to the first ``/`` of the normalized form."""
    return F.regexp_extract(url_normalize(url), r"^[^/]+", 0)


def url_dedup(
    df: DataFrame,
    url_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """URL-keyed exact dedup: one row per canonical URL, keeping the
    lowest-id document as the representative (deterministic keep
    rule; quality-ranked representatives are ``keep_best_quality``'s
    job on content clusters).

    Output: ``(canonical_url, rep_id, n_dups)``. One hash aggregate on
    the canonical key — the cheapest dedup family there is, and the
    first pass a crawl corpus runs before any content-based method.
    """
    canon = url_normalize(url_col).alias("canonical_url")
    return (
        df.select(canon, F.col(id_col))
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).cast("long").alias("rep_id"),
            F.count(F.lit(1)).cast("long").alias("n_dups"),
        )
    )


def url_blocklist_filter(
    df: DataFrame, url_col: str, blocked_hosts: Sequence[str]
) -> DataFrame:
    """Drop rows whose URL host is on the blocklist (exact host match
    after normalization — the domain-level filter every crawl corpus
    applies before spending compute on content)."""
    host = url_host(url_col)
    return df.filter(~host.isin(*[h.lower() for h in blocked_hosts]))


# -- language-confidence cutoff ----------------------------------------------

def lang_confidence(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Append language-evidence columns to ``df``: per-language marker
    hits, the argmax ``pred_lang`` (ties resolved to the first-listed
    language — same rule as :func:`~.text.lang_id`), total evidence
    ``lang_hits_total``, and ``lang_confidence`` = top hits / total
    hits (NULL when there is no evidence at all).

    Confidence is ONE int→double division — IEEE-exact and therefore
    oracle-reproducible (no transcendentals, per the repo's
    cross-engine float rules). Map-only: no join, no shuffle. The
    hits/argmax construction is shared with ``text.lang_id``
    (``lang_hit_columns`` / ``lang_pred_expr``) so the two operators
    cannot drift.
    """
    langs = list(LANG_MARKERS)
    reserved = (
        {f"hits_{lang}" for lang in langs}
        | {"pred_lang", "lang_hits_total", "lang_confidence"}
    )
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(
            f"input already carries reserved column(s) {sorted(clash)} — "
            "rename them before lang_confidence/lang_keep_filter"
        )
    out = df
    for lang, hits in lang_hit_columns(text_col).items():
        out = out.withColumn(f"hits_{lang}", hits)
    total = None
    for lang in langs:
        c = F.col(f"hits_{lang}")
        total = c if total is None else total + c
    top = F.greatest(*[F.col(f"hits_{lang}") for lang in langs])
    return (
        out.withColumn("lang_hits_total", total.cast("long"))
        .withColumn("pred_lang", lang_pred_expr())
        .withColumn(
            "lang_confidence",
            F.when(
                F.col("lang_hits_total") > 0,
                top.cast("double")
                / F.col("lang_hits_total").cast("double"),
            ),
        )
    )


def lang_keep_filter(
    df: DataFrame,
    declared_col: str = "lang",
    text_col: str = "text",
    cutoff: float = 0.8,
    min_evidence: int = 3,
) -> DataFrame:
    """Document-level language cutoff: DROP a document only when the
    classifier confidently (``lang_confidence >= cutoff`` on at least
    ``min_evidence`` marker hits) identifies a language DIFFERENT from
    the declared one. Low-evidence and low-confidence documents are
    kept — the production-safe direction (a weak classifier must not
    empty the corpus).

    Returns ``df``'s columns unchanged, filtered. Map-only.
    """
    scored = lang_confidence(df, text_col=text_col)
    keep = (
        (F.col("lang_hits_total") < F.lit(min_evidence))
        | (F.col("lang_confidence") < F.lit(cutoff))
        | F.col("pred_lang").eqNullSafe(F.col(declared_col))
    )
    return scored.filter(keep).select(*df.columns)
