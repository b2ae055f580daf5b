#!/usr/bin/env python
"""Generate a larger-scale probe copy of the documents/embeddings tables.

The driver ships sf0.001/0.01/0.1 only (TESTDATA.md) — one decade of
growth evidence, which is overhead-dominated for the dedup/ANN family.
This tool synthesizes an sf1-scale `documents.parquet` +
`embeddings.parquet` (10x sf0.1 rows) that preserves the sf0.1
distributions, so `tools/scale_probe.py` can extend SCALING.md's
growth-shape table one decade:

- vocabulary, word frequencies, and document word-count distribution are
  measured from sf0.1 and resampled (not replicated — replication would
  make every row a 10-way exact duplicate and corrupt dedup growth
  shapes);
- exact-duplicate and near-duplicate (small word-substitution) pair
  rates match sf0.1's measured rates;
- lang/source proportions match sf0.1;
- embeddings are unit-norm with the sf0.1 per-label centroids + matched
  residual noise, labels at sf0.1 proportions.

Probe data only. Never used by correctness oracles or the bench gate.
Output goes under the repo (gitignored), not /root/testdata (read-only).

Usage: python tools/make_probe_sf.py [--mult 10] [--out .probe/sf1]
"""

from __future__ import annotations

import argparse
import collections
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--out", default=".probe/sf1")
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()
    rng = np.random.default_rng(args.seed)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(repo, args.out)
    os.makedirs(out_dir, exist_ok=True)

    # ---- measure sf0.1 documents ----
    docs = pq.read_table(f"{SRC}/documents.parquet").to_pandas()
    n_docs = len(docs) * args.mult
    word_counts = docs.text.str.split(" ").map(len).to_numpy()
    freq = collections.Counter(w for t in docs.text for w in t.split(" "))
    vocab = np.array(sorted(freq))
    p_word = np.array([freq[w] for w in vocab], dtype=float)
    p_word /= p_word.sum()
    langs, p_lang = np.unique(docs.lang, return_counts=True)
    sources, p_src = np.unique(docs.source, return_counts=True)

    lens = rng.choice(word_counts, size=n_docs)  # empirical length dist
    flat = rng.choice(vocab, size=int(lens.sum()), p=p_word)
    offs = np.concatenate([[0], np.cumsum(lens)])
    texts = [" ".join(flat[offs[i] : offs[i + 1]]) for i in range(n_docs)]

    # exact dups: sf0.1 has 8 pair-groups per 5000 rows
    n_exact = max(1, int(8 / 5000 * n_docs))
    for i in rng.choice(n_docs, size=2 * n_exact, replace=False).reshape(-1, 2):
        texts[i[1]] = texts[i[0]]
    # near dups: ~248 prefix-sharing pairs per 5000 rows → substitute a few words
    n_near = int(248 / 5000 * n_docs)
    pairs = rng.choice(n_docs, size=2 * n_near, replace=False).reshape(-1, 2)
    for a, b in pairs:
        w = texts[a].split(" ")
        for j in rng.choice(len(w), size=max(1, len(w) // 20), replace=False):
            w[j] = str(rng.choice(vocab))
        texts[b] = " ".join(w)

    tbl = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(rng.choice(langs, size=n_docs, p=p_lang / p_lang.sum())),
            "source": pa.array(
                rng.choice(sources, size=n_docs, p=p_src / p_src.sum())
            ),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, f"{out_dir}/documents.parquet")

    # ---- embeddings: per-label centroid + matched residual noise ----
    emb = pq.read_table(f"{SRC}/embeddings.parquet").to_pandas()
    V = np.vstack(emb.embedding.to_numpy()).astype(np.float32)
    lab = emb.label.to_numpy()
    labels_u, p_lab = np.unique(lab, return_counts=True)
    cents = np.vstack([V[lab == l].mean(0) for l in labels_u])
    resid_std = float((V - cents[np.searchsorted(labels_u, lab)]).std())

    n_vec = len(emb) * args.mult
    new_lab = rng.choice(labels_u, size=n_vec, p=p_lab / p_lab.sum())
    X = cents[np.searchsorted(labels_u, new_lab)] + rng.normal(
        0.0, resid_std, size=(n_vec, V.shape[1])
    ).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    etbl = pa.table(
        {
            "vec_id": pa.array(range(n_vec), pa.int64()),
            "embedding": pa.array(list(X.astype(np.float32)), pa.list_(pa.float32())),
            "label": pa.array(new_lab.astype(np.int32), pa.int32()),
        }
    )
    pq.write_table(etbl, f"{out_dir}/embeddings.parquet")

    # ---- events: 10x rows AND 10x users (events-per-user constant, so
    # per-series window/session shapes scale like a real bigger tenant
    # base), value/type distributions resampled from sf0.1 ----
    ev = pq.read_table(f"{SRC}/events.parquet").to_pandas()
    n_ev = len(ev) * args.mult
    n_users = ev.user_id.nunique() * args.mult
    t0, t1 = ev.ts.min().value, ev.ts.max().value  # ns since epoch
    etypes, p_et = np.unique(ev.event_type, return_counts=True)
    ts = np.sort(rng.integers(t0, t1, size=n_ev))
    vtbl = pa.table(
        {
            "event_id": pa.array(range(n_ev), pa.int64()),
            "ts": pa.array(
                (ts // 1000).astype("int64"), pa.timestamp("us")
            ),
            "user_id": pa.array(
                rng.integers(0, n_users, size=n_ev), pa.int64()
            ),
            "event_type": pa.array(
                rng.choice(etypes, size=n_ev, p=p_et / p_et.sum())
            ),
            "value": pa.array(
                rng.choice(ev.value.to_numpy(), size=n_ev), pa.float64()
            ),
            "props": pa.array(
                [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, n_ev)]
            ),
        }
    )
    pq.write_table(vtbl, f"{out_dir}/events.parquet")

    # ---- TPC-H family: orders + the dimensions, join-consistent.
    # Fact/bridge FOREIGN KEYS draw from the widened PRIMARY key spaces
    # (every l_orderkey exists in orders, every o_custkey in customer,
    # ...), so the join/TPC-H probe queries exercise real 10x join
    # cardinalities instead of half-dangling keys; value-like columns
    # bootstrap the sf0.1 marginals, which preserves every filter's
    # selectivity. nation/region are FIXED dimensions (25/5 rows) and
    # copy through unscaled, like real reference data.
    def _scaled_table(name: str, pk: str, fks: dict[str, int]) -> int:
        base_tbl = pq.read_table(f"{SRC}/{name}.parquet").to_pandas()
        n = len(base_tbl) * args.mult
        cols = {}
        for c in base_tbl.columns:
            base = base_tbl[c].to_numpy()
            if c == pk:
                cols[c] = pa.array(np.arange(1, n + 1), pa.int64())
            elif c in fks:
                cols[c] = pa.array(
                    rng.integers(1, fks[c] + 1, size=n), pa.int64()
                )
            elif str(base_tbl[c].dtype) == "int32":
                cols[c] = pa.array(
                    rng.choice(base, size=n).astype("int32"), pa.int32()
                )
            else:
                cols[c] = pa.array(rng.choice(base, size=n))
        pq.write_table(pa.table(cols), f"{out_dir}/{name}.parquet")
        return n

    n_cust = _scaled_table("customer", "c_custkey", {})
    n_supp = _scaled_table("supplier", "s_suppkey", {})
    n_part = _scaled_table("part", "p_partkey", {})
    n_ord = _scaled_table("orders", "o_orderkey", {"o_custkey": n_cust})
    for fixed in ("nation", "region"):
        pq.write_table(
            pq.read_table(f"{SRC}/{fixed}.parquet"),
            f"{out_dir}/{fixed}.parquet",
        )

    # ---- lineitem: resample 10x for the profiling + join growth
    # probes. Keys draw from the scaled PK spaces above; value-like
    # columns bootstrap the sf0.1 marginals (what a profile measures).
    li = pq.read_table(f"{SRC}/lineitem.parquet").to_pandas()
    n_li = len(li) * args.mult
    fk_hi = {
        "l_orderkey": n_ord,
        "l_partkey": n_part,
        "l_suppkey": n_supp,
    }
    cols = {}
    for c in li.columns:
        base = li[c].to_numpy()
        if c in fk_hi:
            cols[c] = pa.array(
                rng.integers(1, fk_hi[c] + 1, size=n_li), pa.int64()
            )
        elif c == "l_linenumber":
            cols[c] = pa.array(
                rng.choice(base, size=n_li).astype("int32"), pa.int32()
            )
        else:
            cols[c] = pa.array(rng.choice(base, size=n_li))
    pq.write_table(pa.table(cols), f"{out_dir}/lineitem.parquet")

    print(
        f"wrote {n_docs} docs, {n_vec} embeddings, {n_ev} events, "
        f"{n_li} lineitem, {n_ord} orders, {n_cust} customer, "
        f"{n_part} part, {n_supp} supplier -> {out_dir}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
