"""Property pin for ``pq._pinned_hier_mean`` — the bounded
hierarchical id-ordered fold every deterministic trainer's member mean
rides on (r9's replacement for the full per-cell member lists).

The contract the DuckDB twins rely on: for ANY input partitioning the
result is bit-identical to a pure-Python replay of the two-level fold
(members summed in vid order within each 256-id block, block partials
summed in block order, one division per dimension at the end).
Hypothesis drives random key assignments, vid gaps (blocks with holes,
ids straddling block boundaries), vector values across magnitudes, and
a random repartitioning."""

from hypothesis import given, settings, strategies as hst
from pyspark.sql import Row, functions as F

from solar_logger_spark.operators.pq import _pinned_hier_mean

DIM = 4
BLOCK = 256


def _python_replay(rows, block=BLOCK):
    """The reference semantics, in pure Python floats (IEEE doubles)."""
    by_key: dict = {}
    for vid, key, vec in rows:
        by_key.setdefault(key, []).append((vid, vec))
    out = {}
    for key, members in by_key.items():
        blocks: dict = {}
        for vid, vec in members:
            blocks.setdefault(vid // block, []).append((vid, vec))
        partials = []
        n = 0
        for b in sorted(blocks):
            acc = [0.0] * DIM
            for _vid, vec in sorted(blocks[b]):
                for d in range(DIM):
                    acc[d] = acc[d] + vec[d]
            partials.append((b, acc))
            n += len(blocks[b])
        total = [0.0] * DIM
        for _b, p in partials:
            for d in range(DIM):
                total[d] = total[d] + p[d]
        out[key] = [t / n for t in total]
    return out


@settings(max_examples=12, deadline=None)
@given(
    data=hst.lists(
        hst.tuples(
            hst.integers(min_value=0, max_value=2000),       # vid
            hst.integers(min_value=0, max_value=3),          # key
            hst.tuples(*([hst.floats(
                min_value=-1e6, max_value=1e6,
                allow_nan=False, allow_infinity=False,
            )] * DIM)),
        ),
        min_size=1, max_size=60, unique_by=lambda t: t[0],
    ),
    n_parts=hst.integers(min_value=1, max_value=7),
)
def test_hier_mean_matches_python_replay_any_partitioning(
    spark, data, n_parts
):
    rows = [(vid, key, list(vec)) for vid, key, vec in data]
    df = spark.createDataFrame(
        [Row(vid=v, cell=k, v=[float(x) for x in vec])
         for v, k, vec in rows]
    ).repartition(n_parts, "vid")
    got = {
        r["cell"]: list(r["c"])
        for r in _pinned_hier_mean(df, ["cell"], "v", DIM).collect()
    }
    want = _python_replay(rows)
    assert set(got) == set(want)
    for key in want:
        assert [x.hex() for x in got[key]] == [
            x.hex() for x in want[key]
        ], f"key {key}: {got[key]} != {want[key]}"
