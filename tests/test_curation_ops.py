"""Semantic invariants for the r7 curation/analysis additions, beyond the
differential oracle (tests/test_queries_oracle.py proves engine agreement;
these prove the CONTRACTS the docstrings promise).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_ex8_producer_spark.operators._util import persisted_scope
from data_ingestion_ex8_producer_spark.operators.dedup import (
    dedup_clusters,
    q_leakage_safe_split,
    q_source_similarity,
)
from data_ingestion_ex8_producer_spark.operators.similarity import q_hard_negatives
from data_ingestion_ex8_producer_spark.operators.textops import (
    _PII_PATTERN,
    q_doc_bigram_lm,
    q_pii_redact,
    text_token_stats,
)

SF = "/root/testdata/sf0.001"


def test_leakage_safe_split_never_splits_a_cluster(spark) -> None:
    """The operator's whole point: every near-dup cluster lands in exactly
    one split, and every document is assigned exactly once."""
    with persisted_scope():
        split = q_leakage_safe_split(spark, SF)
        clusters = dedup_clusters(spark, SF).select("doc_id", "cluster_id")
        straddling = (
            split.join(clusters, "doc_id")
            .groupBy("cluster_id")
            .agg(F.countDistinct("split").alias("n_splits"))
            .filter(F.col("n_splits") > 1)
            .count()
        )
        rows = split.count()
        by_split = dict(
            split.groupBy("split").count().rdd.map(tuple).collect()
        )
    assert straddling == 0
    docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert rows == docs
    # All three splits are populated and train dominates (hash uniformity).
    assert set(by_split) == {"train", "val", "test"}
    assert by_split["train"] > by_split["val"]
    assert by_split["train"] > by_split["test"]


def test_pii_redact_leaves_no_deny_term(spark) -> None:
    """After redaction the deny pattern must never match, and per-doc hit
    counts must sum to the corpus-wide term frequency."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    redacted = docs.select(
        F.regexp_replace(F.col("text"), _PII_PATTERN, "[PII]").alias("r")
    )
    residual = redacted.agg(
        F.sum(F.regexp_count(F.col("r"), F.lit(_PII_PATTERN)))
    ).collect()[0][0]
    assert residual == 0
    reported = q_pii_redact(spark, SF).agg(F.sum("n_hits")).collect()[0][0]
    direct = docs.agg(
        F.sum(F.regexp_count(F.col("text"), F.lit(_PII_PATTERN)))
    ).collect()[0][0]
    assert reported == direct > 0


def test_bigram_lm_counts_and_bounds(spark) -> None:
    """n_bigrams == n_tokens - 1 for every doc (the chain rule's shape) and
    conditional bits are non-negative with mean <= max."""
    bg = q_doc_bigram_lm(spark, SF)
    toks = text_token_stats(spark, SF).select("doc_id", "n_tokens")
    bad = (
        bg.join(toks, "doc_id")
        .filter(
            (F.col("n_bigrams") != F.col("n_tokens") - 1)
            | (F.col("sum_bits") < 0)
            | (F.col("max_bits") * F.col("n_bigrams") < F.col("sum_bits"))
        )
        .count()
    )
    assert bad == 0
    assert bg.count() > 0


def test_source_similarity_is_a_valid_jaccard_matrix(spark) -> None:
    """Pairs are ordered and unique, intersections are bounded by both set
    sizes, and jaccard sits in (0, 1]."""
    with persisted_scope():
        rows = q_source_similarity(spark, SF).collect()
    assert 0 < len(rows) <= 20 * 19 // 2
    seen = set()
    for r in rows:
        assert r.source_a < r.source_b
        assert (r.source_a, r.source_b) not in seen
        seen.add((r.source_a, r.source_b))
        assert 0 < r.inter <= min(r.sz_a, r.sz_b)
        assert 0.0 < r.jaccard <= 1.0


def test_hard_negatives_one_triplet_per_query(spark) -> None:
    """Exactly one row per query; the positive is same-label, the negative
    is different-label, and the flag is the sign of the margin."""
    out = q_hard_negatives(spark, SF).collect()
    emb = {
        r.vec_id: r.label
        for r in spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", "label")
        .collect()
    }
    assert len(out) == 8 == len({r.query_id for r in out})
    for r in out:
        assert r.pos_id != r.neg_id
        assert emb[r.pos_id] == r.query_label
        assert emb[r.neg_id] == r.neg_label != r.query_label
        assert r.flag_violation == (1 if r.margin < 0 else 0)
