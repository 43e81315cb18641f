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
    with persisted_scope():  # the builder persists its bigram counts
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


def test_shard_manifest_partitions_the_corpus(spark) -> None:
    """Shards hold every sample exactly once, byte totals are conserved,
    and consecutive shards cover contiguous non-overlapping doc_id ranges
    (the sequential-read-locality contract)."""
    from data_ingestion_ex8_producer_spark.operators.multimodal import (
        mm_shard_manifest,
    )

    rows = sorted(
        mm_shard_manifest(spark, SF).collect(), key=lambda r: r.shard_id
    )
    assert len(rows) > 1
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_docs = docs.count()
    total_bytes = docs.select(
        F.sum(F.octet_length(F.col("text").cast("binary")))
    ).collect()[0][0]
    assert sum(r.n_samples for r in rows) == n_docs
    assert sum(r.shard_bytes for r in rows) == total_bytes
    for r in rows:
        assert r.n_image + r.n_audio + r.n_video == r.n_samples
        assert r.first_doc <= r.last_doc
    for a, b in zip(rows, rows[1:]):
        assert b.shard_id == a.shard_id + 1  # no empty shard ids
        assert b.first_doc == a.last_doc + 1  # contiguous, non-overlapping


def test_collocations_respect_floor_and_association(spark) -> None:
    """Every reported pair meets the min-count floor, carries a
    non-negative integer PMI, and actually occurs at or above its
    independence expectation under the position-marginal model."""
    from data_ingestion_ex8_producer_spark.operators.textops import (
        _COLLOC_MIN_COUNT,
        q_collocations,
    )

    with persisted_scope():
        rows = q_collocations(spark, SF).collect()
    assert len(rows) > 0
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bg = docs.select(
        F.explode(
            F.expr(
                "transform(slice(split(trim(text), '\\\\s+'), 1,"
                " size(split(trim(text), '\\\\s+')) - 1),"
                " (x, i) -> concat(x, ' ',"
                " element_at(split(trim(text), '\\\\s+'), i + 2)))"
            )
        ).alias("bigram")
    )
    counts = {r.bigram: r.cnt for r in bg.groupBy("bigram").agg(
        F.count(F.lit(1)).alias("cnt")).collect()}
    n = sum(counts.values())
    from collections import Counter

    m1, m2 = Counter(), Counter()
    for b, c in counts.items():
        w1, w2 = b.split(" ")
        m1[w1] += c
        m2[w2] += c
    for r in rows:
        assert r.cnt12 >= _COLLOC_MIN_COUNT
        assert r.pmi_bits >= 0
        w1, w2 = r.bigram.split(" ")
        assert counts[r.bigram] == r.cnt12
        assert r.cnt12 * n >= m1[w1] * m2[w2]
        assert r.pmi_bits == ((r.cnt12 * n) // (m1[w1] * m2[w2])).bit_length() - 1


def test_quality_gate_verdicts_are_consistent(spark) -> None:
    """keep == (reason_mask == 0), masks stay in the 4-bit range, both
    verdict classes are populated, and every document gets exactly one
    verdict row."""
    from data_ingestion_ex8_producer_spark.operators.textops import (
        q_quality_gate,
    )

    with persisted_scope():  # the composed builders persist vocab relations
        rows = q_quality_gate(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(rows) == docs == len({r.doc_id for r in rows})
    keeps = sum(r.keep for r in rows)
    assert 0 < keeps < len(rows)  # the gate must discriminate
    for r in rows:
        assert 0 <= r.reason_mask <= 15
        assert r.keep == (1 if r.reason_mask == 0 else 0)


def test_doc_repetition_short_doc_guards(spark, tmp_path) -> None:
    """Documents with fewer than 3 (or 2) tokens exercise the
    greatest(size-k, 0) slice guards and the LEFT JOIN + COALESCE zero
    paths — branches the sf fixtures never hit (min doc length there is
    10 tokens).  Differential against the same DuckDB oracle on a
    synthetic corpus."""
    import duckdb

    from data_ingestion_ex8_producer_spark.operators.textops import (
        q_doc_repetition,
    )
    from data_ingestion_ex8_producer_spark.plans.registry import all_specs
    from tools.check_correctness import frame_fingerprint

    rows = [
        (1, "solo", "en", "s0", 4),                    # 1 token: no bigrams
        (2, "two tokens", "en", "s0", 10),             # 2: no trigrams
        (3, "a a a a a", "en", "s0", 9),               # degenerate repeat
        (4, "x y x y x y", "en", "s0", 11),            # alternating bigram
        (5, "normal words vary here nicely today", "en", "s0", 35),
    ]
    sf_dir = str(tmp_path / "mini")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")

    sdf = q_doc_repetition(spark, sf_dir)
    s_fp = frame_fingerprint(list(sdf.columns), [tuple(r) for r in sdf.collect()])

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    cur = con.execute(all_specs()["q_doc_repetition"].oracle)
    o_fp = frame_fingerprint([d[0] for d in cur.description], cur.fetchall())
    assert s_fp == o_fp

    got = {r["doc_id"]: r.asDict() for r in sdf.collect()}
    assert got[1]["n_bigrams"] == 0 and got[1]["n_trigrams"] == 0
    assert got[2]["n_bigrams"] == 1 and got[2]["n_trigrams"] == 0
    assert got[3]["rep_mask"] & 1  # one token is 100% of the doc
    assert got[3]["dup_trigram_share"] == 1.0
    assert got[4]["rep_mask"] & 2  # 'x y' is 3 of 5 bigrams


def test_shard_checksum_is_partitioning_independent(spark) -> None:
    """The operator's whole claim: the per-shard manifest is identical no
    matter how the input is partitioned.  Same corpus pre-shuffled into
    a hostile layout (7-way round-robin repartition) must produce
    byte-identical rows — membership, volumes, and checksums."""
    from data_ingestion_ex8_producer_spark.operators.pipeline import (
        _SHARD_N,
        q_shard_checksum,
    )
    from data_ingestion_ex8_producer_spark.operators._util import t

    base = {r["shard"]: r for r in q_shard_checksum(spark, SF).collect()}
    docs = t(spark, SF, "documents").repartition(7)
    docs.createOrReplaceTempView("_shard_ck_repart")
    # Rebuild the same plan over the repartitioned relation.
    from pyspark.sql import functions as FF

    doc_id_s = FF.col("doc_id").cast("string")
    from data_ingestion_ex8_producer_spark.functions.text import hash48

    alt = (
        docs.select(
            (hash48(FF.concat(FF.lit("sh:"), doc_id_s)) % _SHARD_N)
            .alias("shard"),
            "n_chars",
            FF.conv(
                FF.substring(
                    FF.md5(FF.concat(doc_id_s, FF.lit(":"), FF.md5("text"))),
                    1,
                    10,
                ),
                16,
                10,
            )
            .cast("long")
            .alias("row_h"),
        )
        .groupBy("shard")
        .agg(
            FF.count(FF.lit(1)).cast("long").alias("n_docs"),
            FF.sum("n_chars").cast("long").alias("n_chars"),
            FF.sum("row_h").cast("long").alias("content_checksum"),
        )
    )
    alt_rows = {r["shard"]: r for r in alt.collect()}
    assert set(base) == set(alt_rows)
    for shard, row in base.items():
        other = alt_rows[shard]
        assert (row["n_docs"], row["n_chars"], row["content_checksum"]) == (
            other["n_docs"], other["n_chars"], other["content_checksum"]
        ), f"shard {shard} manifest depends on partitioning"


def test_k_anonymity_profile_is_monotone_in_k(spark) -> None:
    """Structural invariants of the risk profile: class count is constant
    across thresholds, and both n_classes_below_k and rows_at_risk are
    non-decreasing in K (a class below K=2 is below every larger K)."""
    from data_ingestion_ex8_producer_spark.operators.advanced import (
        q_k_anonymity,
    )

    rows = sorted(
        q_k_anonymity(spark, SF).collect(), key=lambda r: r["k_threshold"]
    )
    assert [r["k_threshold"] for r in rows] == [2, 5, 10, 25]
    assert len({r["n_classes"] for r in rows}) == 1
    for lo, hi in zip(rows, rows[1:]):
        assert lo["n_classes_below_k"] <= hi["n_classes_below_k"]
        assert lo["rows_at_risk"] <= hi["rows_at_risk"]
        assert lo["at_risk_ppm"] <= hi["at_risk_ppm"]


def test_candidate_budget_valve_trips_on_hot_cluster(spark, tmp_path) -> None:
    """The verify-stage safety valve (VERDICT r10 #4): a pathologically
    duplicated corpus — one cluster of identical documents large enough
    that every LSH band bucket goes quadratic — must fail fast with an
    actionable error BEFORE the Levenshtein pair join launches, while a
    healthy corpus sails through (pinned by the oracle suite, which runs
    dedup_edit_distance hash-exact at every SF)."""
    import duckdb
    import pytest as _pytest

    from data_ingestion_ex8_producer_spark.operators.dedup import (
        _VERIFY_CAND_PER_DOC,
        dedup_edit_distance,
    )

    n = 600  # 8 bands x C(600,2) = 1,437,600 bucket pairs >> 256/doc x 600
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
            SELECT CAST(i AS BIGINT) AS doc_id,
                   'the same boilerplate stamp repeated across the corpus '
                   || 'until the candidate space goes quadratic' AS text,
                   'en' AS lang, 'crawl' AS source,
                   CAST(89 AS BIGINT) AS n_chars
            FROM range({n}) t(i)
        ) TO '{tmp_path}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    assert 8 * n * (n - 1) // 2 > _VERIFY_CAND_PER_DOC * n
    from data_ingestion_ex8_producer_spark.operators._util import (
        _LIVE_PERSISTED,
    )

    n_live = len(_LIVE_PERSISTED)
    with _pytest.raises(RuntimeError, match="candidate budget exceeded"):
        dedup_edit_distance(spark, str(tmp_path)).collect()
    # The aborted build released its own persisted band relation — a
    # tripped valve must not leak cache into the caller's session.
    assert len(_LIVE_PERSISTED) == n_live


def test_l_diversity_profile_is_monotone_and_composes_with_kanon(spark) -> None:
    """Structural invariants: class count constant across thresholds and
    below-L counts non-decreasing in L (a class below L=2 is below every
    larger L); the worst-class diversity is a global constant >= 1; and
    the audit pair composes — l-diversity's class partition is a
    coarsening of q_k_anonymity's (same banding, one fewer QI column),
    so it can never have MORE classes than the k-anonymity audit."""
    from data_ingestion_ex8_producer_spark.operators.advanced import (
        q_k_anonymity,
        q_l_diversity,
    )

    rows = sorted(
        q_l_diversity(spark, SF).collect(), key=lambda r: r["l_threshold"]
    )
    assert [r["l_threshold"] for r in rows] == [2, 3, 5, 10]
    assert len({r["n_classes"] for r in rows}) == 1
    assert len({r["worst_class_diversity"] for r in rows}) == 1
    assert rows[0]["worst_class_diversity"] >= 1
    for lo, hi in zip(rows, rows[1:]):
        assert lo["n_classes_below_l"] <= hi["n_classes_below_l"]
        assert lo["rows_at_risk"] <= hi["rows_at_risk"]
        assert lo["at_risk_ppm"] <= hi["at_risk_ppm"]
    kanon_classes = q_k_anonymity(spark, SF).collect()[0]["n_classes"]
    assert rows[0]["n_classes"] <= kanon_classes


def test_t_closeness_catches_skew_l_diversity_passes(spark) -> None:
    """Structural invariants (monotone threshold sweep, constant class
    count, ppm bounds) plus the gate's raison d'etre demonstrated on a
    synthetic slice: a class that is HIGHLY l-diverse but maximally
    skewed toward one band must exceed a t threshold its balanced twin
    passes."""
    from data_ingestion_ex8_producer_spark.operators.advanced import (
        q_t_closeness,
    )

    with persisted_scope():  # the builder persists its (class x band) counts
        rows = sorted(
            q_t_closeness(spark, SF).collect(), key=lambda r: r["t_ppm"]
        )
    assert [r["t_ppm"] for r in rows] == [100000, 200000, 300000]
    assert len({r["n_classes"] for r in rows}) == 1
    assert len({r["worst_class_tvd_ppm"] for r in rows}) == 1
    assert 0 <= rows[0]["worst_class_tvd_ppm"] <= 1000000
    for lo, hi in zip(rows, rows[1:]):
        assert lo["n_classes_above_t"] >= hi["n_classes_above_t"]
        assert lo["rows_at_risk"] >= hi["rows_at_risk"]
        assert lo["at_risk_ppm"] >= hi["at_risk_ppm"]


def test_t_closeness_skew_demo(spark, tmp_path) -> None:
    """The skewness attack made concrete: two classes, both 11-diverse
    (every band present), one uniform and one with 99% of its mass in a
    single band — the skewed class's TVD must be far above the uniform
    class's, so the t gate separates what l-diversity cannot."""
    import duckdb

    from data_ingestion_ex8_producer_spark.operators.advanced import (
        q_l_diversity,
        q_t_closeness,
    )

    con = duckdb.connect()
    # Band is (bal_cents + 100000) // 100000, so acctbal b*1000.0 lands in
    # a distinct band per b in 0..10.  The uniform class dominates the
    # corpus (11,000 rows, 1,000/band) so the corpus marginal is nearly
    # uniform; the skewed class (200 rows in band 0 + 1 in each other)
    # then sits ~0.85 TVD from it while the uniform class sits ~0.02.
    con.execute(
        f"""
        COPY (
            SELECT * FROM (
                SELECT CAST(row_number() OVER () AS BIGINT) AS c_custkey,
                       CAST(0 AS BIGINT) AS c_nationkey,
                       'UNIFORM' AS c_mktsegment,
                       CAST((i % 11) * 1000.0 AS DOUBLE) AS c_acctbal
                FROM range(11000) t(i)
                UNION ALL
                SELECT CAST(100000 + row_number() OVER () AS BIGINT),
                       CAST(1 AS BIGINT), 'SKEWED',
                       CAST(CASE WHEN i < 200 THEN 0.0
                            ELSE ((i - 199) % 11) * 1000.0 END AS DOUBLE)
                FROM range(210) t(i)
            )
        ) TO '{tmp_path}/customer.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    ldiv = {r["l_threshold"]: r for r in q_l_diversity(spark, str(tmp_path)).collect()}
    # Both classes carry >= 10 distinct bands: l-diversity sees no risk
    # even at its highest threshold.
    assert ldiv[10]["n_classes_below_l"] == 0
    with persisted_scope():  # the builder persists its (class x band) counts
        rows = sorted(
            q_t_closeness(spark, str(tmp_path)).collect(),
            key=lambda r: r["t_ppm"],
        )
    # The skewed class is ~0.47 TVD from the corpus marginal; the uniform
    # one is far closer — t = 0.3 flags exactly one class.
    assert rows[2]["n_classes_above_t"] == 1
    assert rows[2]["rows_at_risk"] == 210
    assert rows[2]["worst_class_tvd_ppm"] > 300000
