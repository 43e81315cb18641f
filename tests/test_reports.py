"""Semantic pins for the report-style operators (RFM segmentation, OHLC
bars) beyond the oracle matrix: invariants that must hold on ANY corpus."""

from __future__ import annotations

from collections import Counter

from data_ingestion_ex8_producer_spark.operators.analytics_ext import (
    q_customer_rfm,
)
from data_ingestion_ex8_producer_spark.operators.events import q_ohlc_bars

SF = "/root/testdata/sf0.001"


def test_rfm_scores_partition_customers_evenly(spark):
    """Rank-quintile scores: every score in 1..5, each score bucket's size
    within 1 of n/5 (the defining property of the 1 + (5*(rank-1)) div n
    formula), and the segment label is exactly the three scores."""
    rows = q_customer_rfm(spark, SF).collect()
    n = len(rows)
    assert n > 0
    for col in ("r_score", "f_score", "m_score"):
        counts = Counter(getattr(r, col) for r in rows)
        assert set(counts) <= {1, 2, 3, 4, 5}
        assert max(counts.values()) - min(counts.values()) <= 1
    for r in rows:
        assert r.rfm_segment == f"{r.r_score}{r.f_score}{r.m_score}"
        assert r.recency_days >= 0 and r.frequency >= 1
        assert r.monetary > 0


def test_rfm_score_ordering_is_monotone(spark):
    """Walking customers in rank order (recency_days, custkey — the exact
    ordering the two-phase ranking implements) the r_score must be
    non-decreasing: the distributed bucket/offset composition respects
    the metric ordering across buckets."""
    rows = sorted(
        q_customer_rfm(spark, SF).collect(),
        key=lambda r: (r.recency_days, r.custkey),
    )
    prev = 0
    for r in rows:
        assert r.r_score >= prev
        prev = r.r_score


def test_ohlc_bars_bound_their_window(spark):
    """high is the bar maximum, low the minimum, open/close fall inside
    [low, high], and volume/n_events are positive — per every bar."""
    rows = q_ohlc_bars(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.low <= r.open <= r.high
        assert r.low <= r.close <= r.high
        assert r.n_events >= 1 and r.volume > 0
        if r.n_events == 1:
            assert r.open == r.close == r.high == r.low


# --------------------------------------------------------------------------
# PROPERTY: the two-phase distributed ranking (bucket counts -> broadcast
# offsets -> within-bucket row_number) equals the global single-window
# ROW_NUMBER it replaces — the identity the RFM/curriculum operators (and
# their docstrings across the repo) stand on.
# --------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _rank_frames(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    # Bucket values drawn from a SMALL domain so duplicates (the case the
    # within-bucket tie-break exists for) are common; keys are unique.
    buckets = draw(
        st.lists(
            st.integers(min_value=-3, max_value=3), min_size=n, max_size=n
        )
    )
    desc = draw(st.booleans())
    return list(zip(range(n), buckets)), desc


@settings(max_examples=8, deadline=None)
@given(_rank_frames())
def test_two_phase_rank_equals_global_row_number(case):
    """For ANY frame and either bucket direction, _rfm_rank_two_phase
    assigns exactly ROW_NUMBER() OVER (ORDER BY bucket [DESC], key)."""
    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    from data_ingestion_ex8_producer_spark.operators.analytics_ext import (
        _rfm_rank_two_phase,
    )

    spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
    rows, desc = case
    df = spark.createDataFrame(rows, "key long, bucket long")
    got = {
        r.key: r.rk
        for r in _rfm_rank_two_phase(
            df, "bucket", desc, [F.col("key")], "rk"
        ).collect()
    }
    order = [F.col("bucket").desc() if desc else F.col("bucket").asc(),
             F.col("key")]
    expected = {
        r.key: r.rk
        for r in df.withColumn(
            "rk", F.row_number().over(Window.orderBy(*order)).cast("long")
        ).collect()
    }
    assert got == expected


# --------------------------------------------------------------------------
# Final-r6 curation reports: span dedup, semantic dedup, seasonal baseline
# --------------------------------------------------------------------------


def test_span_dedup_profile_is_internally_consistent(spark):
    """Per-doc span profile: shared <= total, shared_frac is exactly the
    integer ratio, and the flag fires exactly on the 30% integer
    boundary (shared*10 >= total*3)."""
    from data_ingestion_ex8_producer_spark.operators.textops import q_span_dedup

    rows = q_span_dedup(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r.n_shared_spans <= r.n_spans
        assert r.shared_frac == r.n_shared_spans / r.n_spans
        assert r.flag_dup == (1 if r.n_shared_spans * 10 >= r.n_spans * 3 else 0)


def test_semantic_dedup_prunes_distinct_vectors_above_threshold(spark):
    """Every removed vector appears exactly once, never removes itself,
    and its cosine to the keeper clears the registered threshold.  The
    qualification contract is the exact-integer comparison (10^4*pdot^2 >=
    35^2*da*db); the reported cosine double may round up to ~3 ulp below
    the rational threshold, hence the 1e-12 slack here."""
    from data_ingestion_ex8_producer_spark.operators.similarity import (
        _SEMDEDUP_COSINE,
        q_semantic_dedup,
    )

    rows = q_semantic_dedup(spark, SF).collect()
    assert len(rows) > 0
    removed = [r.vec_id for r in rows]
    assert len(removed) == len(set(removed))
    for r in rows:
        assert r.kept_by != r.vec_id
        assert r.cosine >= _SEMDEDUP_COSINE - 1e-12


def test_seasonal_anomaly_shares_are_bounded(spark):
    """Every (type, hour-of-day) slot: hod in 0..23, anomalies bounded by
    the observed cell count, share the exact integer ratio, std
    non-negative, and a zero-variance slot reports zero anomalies."""
    from data_ingestion_ex8_producer_spark.operators.events import (
        q_seasonal_hourly_anomaly,
    )

    rows = q_seasonal_hourly_anomaly(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r.hod <= 23
        assert 0 <= r.n_anomalies <= r.n_cells
        assert r.anomaly_share == r.n_anomalies / r.n_cells
        assert r.std_cnt >= 0.0 and r.mean_cnt >= 1.0
        if r.std_cnt == 0.0:
            assert r.n_anomalies == 0


# --------------------------------------------------------------------------
# PROPERTY: prefix filtering is LOSSLESS — on ANY corpus the prefix+length
# filtered join returns exactly the pairs the naive all-shingles exact
# Jaccard returns (the PPJoin guarantee the oracle checks on fixed corpora).
# --------------------------------------------------------------------------

_PF_WORDS = ("alpha", "beta", "gamma", "delta", "eps", "zeta")


@st.composite
def _pf_corpora(draw):
    n = draw(st.integers(min_value=2, max_value=8))
    docs = []
    for i in range(n):
        k = draw(st.integers(min_value=4, max_value=10))
        words = [
            _PF_WORDS[draw(st.integers(0, len(_PF_WORDS) - 1))] for _ in range(k)
        ]
        docs.append((i, " ".join(words)))
    return docs


@settings(max_examples=5, deadline=None)
@given(_pf_corpora())
def test_prefix_filter_is_lossless(case):
    """For ANY corpus, dedup_prefix_filter == dedup_ngram_jaccard_exact
    row-for-row (same pairs, same jaccard values)."""
    import tempfile

    from pyspark.sql import SparkSession

    from data_ingestion_ex8_producer_spark.operators.dedup import (
        dedup_ngram_jaccard_exact,
        dedup_prefix_filter,
    )

    spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
    tmp = tempfile.mkdtemp(prefix="pf_prop_")
    spark.createDataFrame(
        [(i, txt, "en", "synth", len(txt)) for i, txt in case],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup_prefix_filter(spark, tmp).collect()
    }
    want = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup_ngram_jaccard_exact(spark, tmp).collect()
    }
    assert got == want


def test_concat_chunk_packing_is_an_exact_prefix_sum(spark):
    """Offsets are the exact prefix sums of token counts in doc_id order,
    chunk ids are consistent with the 256-token context, and the crossing
    flag fires exactly when first_chunk != last_chunk."""
    from data_ingestion_ex8_producer_spark.operators.pipeline import (
        _PACK_CTX,
        q_concat_chunk_packing,
    )

    rows = sorted(q_concat_chunk_packing(spark, SF).collect(), key=lambda r: r.doc_id)
    assert len(rows) > 0
    run = 0
    for r in rows:
        assert r.tok_start == run
        run += r.n_tokens
        assert r.first_chunk == r.tok_start // _PACK_CTX
        assert r.last_chunk == (r.tok_start + r.n_tokens - 1) // _PACK_CTX
        assert r.crosses_boundary == (1 if r.last_chunk > r.first_chunk else 0)


def test_scd2_intervals_tile_each_user_history(spark):
    """Per user: versions are 1..n in valid_from order, consecutive
    intervals abut exactly (valid_to == next valid_from), consecutive
    states differ, and exactly the LAST row is current (valid_to NULL)."""
    from collections import defaultdict

    from data_ingestion_ex8_producer_spark.operators.events import q_scd2_history

    by_user = defaultdict(list)
    for r in q_scd2_history(spark, SF).collect():
        by_user[r.user_id].append(r)
    assert by_user
    for user, rows in by_user.items():
        rows.sort(key=lambda r: r.version)
        assert [r.version for r in rows] == list(range(1, len(rows) + 1))
        for a, b in zip(rows, rows[1:]):
            assert a.valid_to == b.valid_from
            assert a.state != b.state
            assert a.is_current == 0
        assert rows[-1].valid_to is None and rows[-1].is_current == 1


def test_doc_surprisal_bounds_and_flag(spark):
    """Per-token integer surprisal is within [0, floor(log2(total))], the
    mean is the exact integer ratio, and the low-info flag is the integer
    comparison the docstring promises."""
    from data_ingestion_ex8_producer_spark.operators.textops import (
        _SURPRISAL_LOW_BITS,
        q_doc_surprisal,
    )

    rows = q_doc_surprisal(spark, SF).collect()
    assert len(rows) > 0
    total = sum(r.n_tokens for r in rows)
    cap = total.bit_length() - 1
    for r in rows:
        assert 0 <= r.max_bits <= cap
        assert 0 <= r.sum_bits <= r.n_tokens * cap
        assert r.mean_bits == r.sum_bits / r.n_tokens
        assert r.flag_low_info == (
            1 if r.sum_bits < _SURPRISAL_LOW_BITS * r.n_tokens else 0
        )
