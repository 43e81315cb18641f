"""Semantic pins for the round-6 graph/search additions — PageRank over the
part-affinity graph, edit-distance near-dup verification, and the
inverted-index build — invariants that must hold on ANY corpus, beyond the
oracle matrix's value-hash equality."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_ex8_producer_spark.operators.analytics_ext import (
    _PR_ITERS,
    _PR_SCALE,
    q_part_pagerank,
)
from data_ingestion_ex8_producer_spark.operators.dedup import (
    _EDIT_SIM_THRESHOLD,
    dedup_edit_distance,
    dedup_minhash_lsh,
)
from data_ingestion_ex8_producer_spark.operators.textops import (
    _INV_POSTINGS,
    q_inverted_index,
)
from data_ingestion_ex8_producer_spark.operators._util import persisted_scope

SF = "/root/testdata/sf0.001"


def test_pagerank_mass_and_ordering(spark):
    """Rank mass is positive and bounded by the total (the damped update
    can only lose flooring mass, never create it); the report is sorted by
    (rank_q DESC, p_partkey) and every rank carries at least the damping
    floor (15% of the uniform share) — the defining lower bound of the
    integer-quantized update."""
    with persisted_scope():
        rows = q_part_pagerank(spark, SF).collect()
    assert 0 < len(rows) <= 20
    keys = [(-r.rank_q, r.p_partkey) for r in rows]
    assert keys == sorted(keys)
    for r in rows:
        assert r.degree >= 1
        # Mass floor: base term alone, with n <= degree-sum vertices.  The
        # weakest safe bound uses n >= 1: base >= (15*(SCALE//n))//100 > 0.
        assert 0 < r.rank_q <= _PR_SCALE
        assert abs(r.pagerank - r.rank_q / _PR_SCALE) < 1e-15
    # Fixed-iteration determinism: a second build returns identical rows.
    with persisted_scope():
        again = q_part_pagerank(spark, SF).collect()
    assert rows == again
    assert _PR_ITERS >= 1  # the unroll constant stays a positive fixed point


def test_edit_distance_pairs_are_verified_lsh_candidates(spark):
    """Every emitted pair is (a) an LSH candidate pair — stage 2 never
    invents candidates — and (b) above the similarity floor with a
    length-consistent Levenshtein bound |len_a - len_b| <= lev_dist."""
    with persisted_scope():
        pairs = dedup_edit_distance(spark, SF).collect()
        cand = {
            (r.doc_a, r.doc_b)
            for r in dedup_minhash_lsh(spark, SF).collect()
        }
    for r in pairs:
        assert (r.doc_a, r.doc_b) in cand
        assert r.doc_a < r.doc_b
        assert r.edit_sim >= _EDIT_SIM_THRESHOLD
        assert 0 <= r.lev_dist <= max(r.len_a, r.len_b)
        assert abs(r.len_a - r.len_b) <= r.lev_dist


def test_inverted_index_postings_bounded_and_consistent(spark):
    """df never exceeds total_tf, the posting sample is ascending with at
    most _INV_POSTINGS entries, its length is min(df, cap), and the report
    is ordered by (df DESC, term)."""
    rows = q_inverted_index(spark, SF).collect()
    assert len(rows) > 0
    keys = [(-r.df, r.term) for r in rows]
    assert keys == sorted(keys)
    for r in rows:
        assert 1 <= r.df <= r.total_tf
        ids = [int(x) for x in r.postings_sample.split(",")]
        assert ids == sorted(ids) and len(set(ids)) == len(ids)
        assert len(ids) == min(r.df, _INV_POSTINGS)


def test_threshold_curve_is_monotone_and_bounded(spark):
    """Raising the cutoff can only shrink both counts; flagged docs never
    exceed the corpus; thresholds are the exact power-of-two fractions; and
    the top cutoff (32/32) counts exactly the pairs with full signature
    agreement."""
    from data_ingestion_ex8_producer_spark.operators.dedup import (
        _CURVE_THRESHOLDS,
        _MINHASH_PERMS,
        q_dedup_threshold_curve,
        q_minhash_jaccard_estimate,
    )

    with persisted_scope():
        rows = sorted(
            q_dedup_threshold_curve(spark, SF).collect(),
            key=lambda r: r.min_agree,
        )
        est = q_minhash_jaccard_estimate(spark, SF).collect()
    assert [r.min_agree for r in rows] == list(_CURVE_THRESHOLDS)
    for r in rows:
        assert r.threshold == r.min_agree / _MINHASH_PERMS
        assert 0 <= r.n_docs_flagged
        assert 0.0 <= r.flagged_frac <= 1.0
    pairs = [r.n_pairs for r in rows]
    flagged = [r.n_docs_flagged for r in rows]
    assert pairs == sorted(pairs, reverse=True)
    assert flagged == sorted(flagged, reverse=True)
    exact_full = sum(1 for e in est if e.n_agree >= _MINHASH_PERMS)
    assert rows[-1].n_pairs == exact_full
    assert rows[0].n_pairs == sum(
        1 for e in est if e.n_agree >= _CURVE_THRESHOLDS[0]
    )


def test_top_component_is_unit_peaked_and_psd(spark):
    """64 loading rows; |loading| <= 1 with the peak exactly +/-1 (the
    max-abs normalization); the Rayleigh estimate of the PSD Gram matrix is
    non-negative and identical on every row; and a rebuild is bit-identical
    (fixed v0, fixed iteration count)."""
    from data_ingestion_ex8_producer_spark.operators.pipeline import (
        q_emb_top_component,
    )

    with persisted_scope():
        rows = sorted(
            q_emb_top_component(spark, SF).collect(), key=lambda r: r.dim
        )
    assert [r.dim for r in rows] == list(range(64))
    m = max(abs(r.loading_q) for r in rows)
    assert m > 0
    for r in rows:
        assert abs(r.loading) <= 1.0
        assert r.loading == r.loading_q / m
        assert r.rayleigh_q == rows[0].rayleigh_q
        assert r.rayleigh_q >= 0
    assert any(abs(r.loading) == 1.0 for r in rows)
    with persisted_scope():
        again = sorted(
            q_emb_top_component(spark, SF).collect(), key=lambda r: r.dim
        )
    assert rows == again
