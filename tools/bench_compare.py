#!/usr/bin/env python
"""Compare two bench records with ambient-drift deflation.

Round-9 lesson (VERDICT r9 "what's wrong" #1): raw cross-round bench
totals moved 1.2-1.3x on untouched code between recording times, so a
bare "faster/slower than last round" claim is unfalsifiable. This tool
makes the comparison defensible:

* parses either a raw ``bench.py`` JSON line or the driver's
  ``BENCH_r{N}.json`` wrapper (which keeps only a 2000-char tail of the
  line — per-query pairs are recovered from the tail);
* computes the **canary ratio** when both records carry ``canary_sec``
  (the pinned pure-CPU job bench.py times before the registry), else
  falls back to the **median per-query ratio over shared queries** —
  both estimate ambient machine drift independent of code changes;
* reports raw totals, the deflated total, and the per-query outliers
  whose ratio exceeds the ambient band (the actual regression
  candidates).

Usage: python tools/bench_compare.py OLD.json NEW.json [--band 1.5]
"""

from __future__ import annotations

import argparse
import json
import re
import statistics
import sys


def load_bench(path: str) -> dict:
    """Return {queries: {name: sec}, total, canary_sec or None}."""
    with open(path) as fh:
        d = json.load(fh)
    if "queries" in d and isinstance(d["queries"], dict):
        src = d  # raw bench.py line
    elif isinstance(d.get("parsed"), dict) and "queries" in d["parsed"]:
        src = d["parsed"]  # driver wrapper, line short enough to parse
    else:
        # driver wrapper with a truncated tail: recover what survives
        tail = d.get("tail", "")
        pairs = dict(re.findall(r'"([a-z0-9_]+)": (-?\d+\.?\d*)', tail))
        meta_keys = {
            "total", "n_queries", "n_failed", "canary_sec",
            "loadavg_1m", "loadavg_5m", "sf", "passes",
        }
        flag = re.search(r'"ambient_flag": "(\w+)"', tail)
        src = {
            "queries": {
                k: float(v) for k, v in pairs.items() if k not in meta_keys
            },
            "total": float(pairs["total"]) if "total" in pairs else None,
            "canary_sec": (
                float(pairs["canary_sec"]) if "canary_sec" in pairs else None
            ),
            "ambient_flag": flag.group(1) if flag else None,
        }
    return {
        "queries": {
            k: float(v) for k, v in src["queries"].items() if float(v) >= 0
        },
        "total": src.get("total") or sum(
            float(v) for v in src["queries"].values() if float(v) >= 0
        ),
        "canary_sec": src.get("canary_sec"),
        # r12 bench.py guard verdict ("clean" / "busy_retried_clean" /
        # "busy"); None on pre-r12 records
        "ambient_flag": src.get("ambient_flag"),
    }


def compare(
    old: dict,
    new: dict,
    band: float = 1.5,
    changed: set[str] | None = None,
) -> dict:
    """``changed``: queries whose CODE changed between the two records
    (e.g. from ``__spark_entry__.CHANGED_IN_ROUND``). They are excluded
    from the ambient-drift estimate — otherwise a round's genuine
    improvements deflate themselves away (the round-10 lesson: 20
    rewritten queries inside the shared-median pool dragged 'ambient'
    down and reported real wins as flat) — and get their own
    subtotal."""
    changed = changed or set()
    shared = sorted(set(old["queries"]) & set(new["queries"]))
    ratios = {
        q: new["queries"][q] / old["queries"][q]
        for q in shared
        if old["queries"][q] >= 0.3  # below that, stage overhead is noise
    }
    ambient_pool = {q: r for q, r in ratios.items() if q not in changed}
    med = statistics.median(ambient_pool.values()) if ambient_pool else None
    canary = (
        new["canary_sec"] / old["canary_sec"]
        if old.get("canary_sec") and new.get("canary_sec")
        else None
    )
    # The canary measures pure-CPU contention only — it misses memory-
    # bandwidth/GC pressure and can contradict the per-query evidence
    # (observed: canary 0.84 while the untouched-query median read
    # 1.07). Prefer the untouched-query median whenever it rests on a
    # reasonable sample; the canary stays reported for context.
    # When EVERY shared query changed, there is no untouched pool at
    # all — the canary (or, failing that, a clearly-labelled median
    # over the changed queries themselves) is the only estimate left;
    # the distinct label keeps the self-deflation bias visible.
    if med is not None and len(ambient_pool) >= 10:
        ambient, ambient_src = med, "median"
    elif canary is not None:
        ambient, ambient_src = canary, "canary"
    elif med is not None:
        ambient, ambient_src = med, "median"
    elif ratios:
        ambient, ambient_src = (
            statistics.median(ratios.values()), "median-all-changed"
        )
    else:
        ambient, ambient_src = None, "none"
    out = {
        "old_total": round(old["total"], 1),
        "new_total": round(new["total"], 1),
        "old_ambient_flag": old.get("ambient_flag"),
        "new_ambient_flag": new.get("ambient_flag"),
        "raw_ratio": round(new["total"] / old["total"], 3),
        "n_shared": len(shared),
        "n_ratioed": len(ratios),
        "n_ambient_pool": len(ambient_pool),
        "median_query_ratio": round(med, 3) if med is not None else None,
        "canary_ratio": round(canary, 3) if canary is not None else None,
        "ambient_used": ambient_src,
        "deflated_new_total": (
            round(new["total"] / ambient, 1) if ambient else None
        ),
        "deflated_ratio": (
            round(new["total"] / ambient / old["total"], 3) if ambient else None
        ),
        # regression candidates: per-query ratio beyond ambient * band
        "outliers": {
            q: {
                "old": old["queries"][q],
                "new": new["queries"][q],
                "ratio": round(r, 2),
            }
            for q, r in sorted(ratios.items(), key=lambda kv: -kv[1])
            if ambient and r > ambient * band
        },
        "changed_subtotal": (
            {
                "n": len([q for q in shared if q in changed]),
                "old": round(
                    sum(old["queries"][q] for q in shared if q in changed), 1
                ),
                "new": round(
                    sum(new["queries"][q] for q in shared if q in changed), 1
                ),
                "deflated_ratio": (
                    round(
                        sum(new["queries"][q] for q in shared if q in changed)
                        / sum(
                            old["queries"][q] for q in shared if q in changed
                        )
                        / ambient,
                        3,
                    )
                    if ambient
                    and sum(old["queries"][q] for q in shared if q in changed)
                    else None
                ),
            }
            if changed & set(shared)
            else None
        ),
        "only_in_new": sorted(set(new["queries"]) - set(old["queries"])),
        "only_in_old": sorted(set(old["queries"]) - set(new["queries"])),
    }
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--band", type=float, default=1.5,
                    help="flag queries whose ratio exceeds ambient*band")
    ap.add_argument(
        "--changed-since", type=int, default=None, metavar="ROUND",
        help="exclude queries with __spark_entry__.CHANGED_IN_ROUND >= "
             "ROUND from the ambient estimate and report their subtotal "
             "separately (use the round the OLD record was taken in + 1)",
    )
    ap.add_argument(
        "--changed", default="", metavar="Q1,Q2",
        help="extra comma-separated query names to treat as changed",
    )
    args = ap.parse_args()
    changed = {q for q in args.changed.split(",") if q}
    if args.changed_since is not None:
        import os as _os
        sys.path.insert(
            0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
        )
        import __spark_entry__ as _entry

        changed |= {
            q for q, rnd in _entry.CHANGED_IN_ROUND.items()
            if rnd >= args.changed_since
        }
    out = compare(
        load_bench(args.old), load_bench(args.new), args.band, changed
    )
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
