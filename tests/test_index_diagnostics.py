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


def test_ivf_k_policy_ladder_and_measured_row(spark) -> None:
    """Structural contract of the capacity readout: the ladder column is
    non-decreasing in projected_n, K(n) stays within [floor, cap] and
    matches the shared Python ladder exactly, and the measured columns
    exist only on the scale_mult = 1 row, where they must agree with the
    live quantizer (n_cells <= K(n), pair space consistent with the cell
    populations by the C(c,2) identity)."""
    from data_ingestion_ex8_producer_spark.operators.similarity import (
        _IVF_K,
        _IVF_K_CAP_EXP,
        _ivf_k_for,
        q_ivf_k_policy,
    )

    with persisted_scope():  # the builder persists the valid corpus
        rows = sorted(
            q_ivf_k_policy(spark, SF).collect(), key=lambda r: r["scale_mult"]
        )
    assert [r["scale_mult"] for r in rows] == [1, 10, 100]
    n = rows[0]["projected_n"]
    for r in rows:
        assert r["projected_n"] == n * r["scale_mult"]
        assert r["k_ladder"] == _ivf_k_for(r["projected_n"])
        assert _IVF_K <= r["k_ladder"] <= 2**_IVF_K_CAP_EXP
    assert rows[0]["k_ladder"] <= rows[1]["k_ladder"] <= rows[2]["k_ladder"]
    meas, proj10, proj100 = rows
    assert proj10["n_cells"] is None and proj100["within_cell_pairs"] is None
    assert 0 < meas["n_cells"] <= meas["k_ladder"]
    assert meas["max_cell"] >= 1
    # Sum C(c,2) over cells is maximized when one cell holds max_cell and
    # minimized under perfect balance — the measured pair space must sit
    # between the two bounds implied by (n, n_cells, max_cell).
    c = meas["max_cell"]
    assert meas["within_cell_pairs"] >= c * (c - 1) // 2
    assert meas["within_cell_pairs"] <= n * (c - 1)
