"""Semantic pins for the retrieval stack — BM25 more-like-this ranking and
the hybrid reciprocal-rank fusion — invariants that must hold on ANY corpus,
beyond the oracle matrix's value-hash equality."""

from __future__ import annotations

from collections import defaultdict

from data_ingestion_ex8_producer_spark.operators.similarity import (
    _RRF_K,
    _RRF_TOPK,
    q_hybrid_rrf,
    sim_bruteforce_topk,
)
from data_ingestion_ex8_producer_spark.operators.textops import (
    _BM25_N_QUERIES,
    _BM25_SCALE,
    _BM25_TOPK,
    q_bm25_mlt_topk,
)

SF = "/root/testdata/sf0.001"


def _by_query(rows):
    grouped = defaultdict(list)
    for r in rows:
        grouped[r.query_id].append(r)
    return grouped


def test_bm25_ranking_invariants(spark):
    """Per query: no self-match, dense ranks 1..k ordered by
    (score_q DESC, doc_id), every hit shares >= 1 term, and the double score
    is exactly the quantized BIGINT divided by the scale."""
    rows = q_bm25_mlt_topk(spark, SF).collect()
    grouped = _by_query(rows)
    assert set(grouped) <= set(range(_BM25_N_QUERIES))
    for qid, hits in grouped.items():
        hits.sort(key=lambda r: r.rk)
        assert [r.rk for r in hits] == list(range(1, len(hits) + 1))
        assert len(hits) <= _BM25_TOPK
        keys = [(-r.score_q, r.doc_id) for r in hits]
        assert keys == sorted(keys)
        for r in hits:
            assert r.doc_id != qid
            assert r.n_shared_terms >= 1
            assert r.score_q > 0
            assert r.score == r.score_q / float(_BM25_SCALE)


def test_rrf_fusion_is_consistent_with_its_legs(spark):
    """Every fused row's leg ranks point back at the ACTUAL rows of the two
    registered searches, and the rrf value is exactly the two-term reciprocal
    sum those ranks imply (absent leg contributes 0)."""
    fused = q_hybrid_rrf(spark, SF).collect()
    lex = {
        (r.query_id, r.doc_id): r.rk
        for r in q_bm25_mlt_topk(spark, SF).collect()
    }
    vec = {
        (r.query_id, r.neighbor_id): r.rk
        for r in sim_bruteforce_topk(spark, SF).collect()
    }
    assert fused
    for r in fused:
        key = (r.query_id, r.doc_id)
        assert r.rk_lex == lex.get(key)
        assert r.rk_vec == vec.get(key)
        expect = 0.0
        if r.rk_lex is not None:
            expect += 1.0 / (_RRF_K + r.rk_lex)
        if r.rk_vec is not None:
            expect += 1.0 / (_RRF_K + r.rk_vec)
        assert r.rrf == expect
        assert r.rk_lex is not None or r.rk_vec is not None
    for qid, hits in _by_query(fused).items():
        hits.sort(key=lambda r: r.rk)
        assert [r.rk for r in hits] == list(range(1, len(hits) + 1))
        assert len(hits) <= _RRF_TOPK
        keys = [(-r.rrf, r.doc_id) for r in hits]
        assert keys == sorted(keys)


def test_rrf_rewards_presence_in_both_lists(spark):
    """A candidate found by BOTH legs at rank r outscores one found by a
    single leg at the same rank — the defining property of RRF fusion
    (checked analytically on the formula the operator pins above)."""
    both = 2.0 / (_RRF_K + 1)
    single_best = 1.0 / (_RRF_K + 1)
    assert both > single_best


def test_remove_top_component_is_exactly_orthogonal(spark):
    """The projected corpus is orthogonal to the removed direction IN EXACT
    INTEGER ARITHMETIC: sum_j v_j * residual_q_ij == 0 for EVERY vector —
    the defining identity of the cleared-denominator projection (no epsilon
    anywhere).  Residual magnitudes never exceed the original component's
    (|residual_q| <= |q|*den + |c|*|v|), and the double column is exactly
    residual_q / (den * 2^20)."""
    from data_ingestion_ex8_producer_spark.operators._util import (
        persisted_scope,
    )
    from data_ingestion_ex8_producer_spark.operators.pipeline import (
        _PC_Q,
        _gram_and_v2,
        q_emb_remove_top_component,
    )

    with persisted_scope():
        res = q_emb_remove_top_component(spark, SF).collect()
        _, v2df = _gram_and_v2(spark, SF)
        v = {r.j: r.v for r in v2df.collect()}
    den = sum(x * x for x in v.values())
    assert den > 0 and len(res) > 0
    by_vec = {}
    for r in res:
        by_vec.setdefault(r.vec_id, {})[r.dim] = r.residual_q
        assert r.residual == r.residual_q / (den * _PC_Q)
    for vec_id, dims in by_vec.items():
        assert len(dims) == 64
        dot = sum(v[j] * rq for j, rq in dims.items())
        assert dot == 0, f"vec {vec_id}: v . residual = {dot} != 0"


def test_hybrid_rrf_ivfpq_legs_are_the_registered_searches(spark):
    """The production fusion's leg ranks point back at the ACTUAL rows of
    q_bm25_mlt_topk and sim_ivfpq_topk, with the same rrf identity as the
    exact-leg fusion."""
    from data_ingestion_ex8_producer_spark.operators._util import (
        persisted_scope,
    )
    from data_ingestion_ex8_producer_spark.operators.similarity import (
        q_hybrid_rrf_ivfpq,
        sim_ivfpq_topk,
    )

    with persisted_scope():
        fused = q_hybrid_rrf_ivfpq(spark, SF).collect()
        lex = {
            (r.query_id, r.doc_id): r.rk
            for r in q_bm25_mlt_topk(spark, SF).collect()
        }
        vec = {
            (r.query_id, r.neighbor_id): r.rk
            for r in sim_ivfpq_topk(spark, SF).collect()
        }
    assert fused
    for r in fused:
        key = (r.query_id, r.doc_id)
        assert r.rk_lex == lex.get(key)
        assert r.rk_vec == vec.get(key)
        expect = 0.0
        if r.rk_lex is not None:
            expect += 1.0 / (_RRF_K + r.rk_lex)
        if r.rk_vec is not None:
            expect += 1.0 / (_RRF_K + r.rk_vec)
        assert r.rrf == expect


def test_hybrid_agreement_matches_recomputed_overlap(spark):
    """The agreement metric equals the overlap recomputed in Python from
    the two registered fusions, n_ceiling is the exact fusion's list size,
    and overlap_frac is the exact integer ratio."""
    from data_ingestion_ex8_producer_spark.operators._util import (
        persisted_scope,
    )
    from data_ingestion_ex8_producer_spark.operators.similarity import (
        q_hybrid_agreement,
        q_hybrid_rrf,
        q_hybrid_rrf_ivfpq,
    )

    with persisted_scope():
        rows = {r.query_id: r for r in q_hybrid_agreement(spark, SF).collect()}
        exact_f = q_hybrid_rrf(spark, SF).collect()
        deployed = q_hybrid_rrf_ivfpq(spark, SF).collect()
    ceil_lists, dep_lists = {}, {}
    for r in exact_f:
        ceil_lists.setdefault(r.query_id, set()).add(r.doc_id)
    for r in deployed:
        dep_lists.setdefault(r.query_id, set()).add(r.doc_id)
    assert set(rows) == set(ceil_lists)
    for qid, r in rows.items():
        assert r.n_ceiling == len(ceil_lists[qid])
        assert r.n_overlap == len(ceil_lists[qid] & dep_lists.get(qid, set()))
        assert r.overlap_frac == r.n_overlap / r.n_ceiling
