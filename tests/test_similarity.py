"""LSH recall vs exact brute force (the approximate lane has no SQL oracle)."""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def test_lsh_recall_vs_exact(spark):
    from kinesiscat_spark.queries.similarity_queries import (
        similarity_topk_exact,
        similarity_topk_lsh,
    )

    exact = {
        (r.qid, r.cid) for r in similarity_topk_exact(spark, SF_ORACLE).collect()
    }
    approx = {
        (r.qid, r.cid) for r in similarity_topk_lsh(spark, SF_ORACLE).collect()
    }
    assert exact, "exact result empty"
    recall = len(exact & approx) / len(exact)
    # 16 planes / 4 bands on 64-dim gaussian vectors: banded OR-of-ANDs is
    # permissive (4 matching bits ~ cos similarity), so recall stays high.
    assert recall >= 0.5, f"LSH recall {recall:.2f} too low"
