"""The declared ANN queries self-report ``recall_at_k`` vs exact brute
force (scale_ops._attach_recall). The driver's rows-only record carries
the column; this test pins its value so "it ran" implies "it retrieves".
All index builds are seeded/deterministic, so these bounds are stable.
"""

import pytest

from solar_logger_spark.queries import scale_ops as sca


@pytest.mark.parametrize(
    "name",
    [
        "similarity_ann_lsh",
        "similarity_ann_ivf",
        "similarity_ann_pq",
        "similarity_ann_ivfpq",
        "ann_maintained_search",
    ],
)
def test_ann_query_mean_recall_pinned(spark, sf_dir, name):
    out = getattr(sca, name)(spark, sf_dir)
    assert "recall_at_k" in out.columns
    rows = out.collect()
    per_query = {r.query_id: r.recall_at_k for r in rows}
    assert per_query, f"{name} returned no rows"
    mean = sum(per_query.values()) / len(per_query)
    assert mean >= 0.8, f"{name} mean recall@5 = {mean:.3f} < 0.8"
