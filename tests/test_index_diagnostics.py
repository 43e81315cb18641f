"""Semantic pins tying the index-health diagnostics to the indexes they
measure: the reports must be consistent with the candidate sets the
deployed index actually produces, on ANY corpus."""

from __future__ import annotations

from data_ingestion_ex8_producer_spark.operators._util import persisted_scope
from data_ingestion_ex8_producer_spark.operators.dedup import (
    _LSH_BANDS,
    dedup_minhash_lsh,
    q_lsh_band_stats,
)

SF = "/root/testdata/sf0.001"


def test_band_stats_bound_the_lsh_candidate_set(spark):
    """Sum of per-band C(bucket,2) >= the DISTINCT candidate-pair count of
    the deployed LSH join (a pair agreeing in k bands is counted k times
    here, once there), every band covers the full corpus, and a bucket can
    never hold more docs than the corpus."""
    with persisted_scope():  # the LSH builder persists its band relation
        stats = q_lsh_band_stats(spark, SF).collect()
        pairs = dedup_minhash_lsh(spark, SF).count()
    spark.catalog.clearCache()

    assert len(stats) == _LSH_BANDS
    n_docs = {r.n_docs for r in stats}
    assert len(n_docs) == 1  # every band sees every doc exactly once
    total_candidates = sum(r.candidate_pairs for r in stats)
    assert total_candidates >= pairs
    for r in stats:
        assert 1 <= r.max_bucket <= r.n_docs
        assert r.n_buckets <= r.n_docs
        assert r.n_multi_buckets <= r.n_buckets
        # C(max_bucket, 2) <= candidate_pairs <= C(n_docs, 2)
        assert r.candidate_pairs >= r.max_bucket * (r.max_bucket - 1) // 2
        assert r.candidate_pairs <= r.n_docs * (r.n_docs - 1) // 2
