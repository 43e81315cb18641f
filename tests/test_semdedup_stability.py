"""Regression suite for the r6 driver-red float-boundary defect in
q_semantic_dedup_curve (CORRECTNESS_r06: hash_match false, rows+schema
green): the curve binned floor(best_cosine * 100) on a RAW double, so a
cosine within an ulp of a centi-boundary could flip a count under any
cross-engine or cross-run perturbation.  The hardening replaces every
semdedup qualification with exact BIGINT arithmetic over _QSCALE-quantized
embeddings (integer addition is associative — immune to fold/partition
order), so results must now be invariant to parallelism, and the curve's
thr_c=35 row must count exactly q_semantic_dedup's removal set (the
docstring's restored claim; ADVICE r6 flagged the old one-ulp
disagreement).
"""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _collect_sorted(df):
    return sorted(tuple(r) for r in df.collect())


def test_curve_thr35_counts_exactly_the_semantic_dedup_removals(spark):
    """At thr_c = _SEMDEDUP_COSINE_C the curve's n_removed equals the number
    of rows q_semantic_dedup emits — same pairs, same integer
    qualification, per the shared _sem_qual predicate."""
    from data_ingestion_ex8_producer_spark.operators.similarity import (
        _SEMDEDUP_COSINE_C,
        q_semantic_dedup,
        q_semantic_dedup_curve,
    )

    removed = q_semantic_dedup(spark, SF).count()
    curve = {r.thr_c: r.n_removed for r in q_semantic_dedup_curve(spark, SF).collect()}
    assert curve[_SEMDEDUP_COSINE_C] == removed


def test_curve_is_monotone_and_shares_are_exact(spark):
    """n_removed is non-increasing in thr_c, survivors complement removals
    against a constant population, and removed_share is the exact integer
    ratio."""
    from data_ingestion_ex8_producer_spark.operators.similarity import (
        q_semantic_dedup_curve,
    )

    rows = sorted(q_semantic_dedup_curve(spark, SF).collect(), key=lambda r: r.thr_c)
    assert len(rows) == 5
    pops = {r.n_removed + r.n_survivors for r in rows}
    assert len(pops) == 1
    for prev, cur in zip(rows, rows[1:]):
        assert cur.n_removed <= prev.n_removed
    for r in rows:
        assert r.removed_share == r.n_removed / (r.n_removed + r.n_survivors)
        assert r.threshold == r.thr_c / 100.0


def test_curve_invariant_to_shuffle_partitioning(spark):
    """The driver's perturbation surface: different parallelism => different
    fold/merge orders.  With integer qualification the collected result must
    be IDENTICAL (not merely close) across shuffle-partition settings."""
    from data_ingestion_ex8_producer_spark.operators.similarity import (
        q_semantic_dedup_curve,
    )

    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        one = _collect_sorted(q_semantic_dedup_curve(spark, SF))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        many = _collect_sorted(q_semantic_dedup_curve(spark, SF))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert one == many


def test_no_scored_semdedup_qualification_on_raw_doubles(spark):
    """Schema-level guard: the pair relation's qualification inputs (pdot,
    da, db) are BIGINT — the integer-doctrine audit for this family, pinned
    so a refactor cannot quietly reintroduce a double comparison."""
    from data_ingestion_ex8_producer_spark.operators.similarity import (
        _semdedup_pairs,
    )

    _mem, pairs = _semdedup_pairs(spark, SF)
    dtypes = dict(pairs.dtypes)
    assert dtypes["pdot"] == "bigint"
    assert dtypes["da"] == "bigint"
    assert dtypes["db"] == "bigint"
