"""Plan-quality gates: pushdown, pruning, broadcast, no cartesian — the
local-scale proxies for 100 TB efficiency (SURVEY.md §4)."""

from __future__ import annotations

import re

from iceberg_poc_spark.plans import (
    assert_no_cartesian,
    explain_str,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
    single_partition_windows,
)
from iceberg_poc_spark.registry import load_all
from tests.conftest import SF_DIR

Q = load_all()


def test_filter_pushdown_reaches_scan(spark):
    df = Q["q_scan_pruned"].fn(spark, SF_DIR)
    pf = pushed_filters(df)
    assert "l_shipdate" in pf, f"shipdate filter not pushed: {pf!r}"


def test_column_pruning(spark):
    df = Q["q_scan_parquet"].fn(spark, SF_DIR)
    cols = read_schema_columns(df)
    assert set(cols) == {
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_returnflag",
    }, f"scan reads more than the projection: {cols}"


def test_q1_scan_prunes_columns(spark):
    cols = set(read_schema_columns(Q["q_agg_q1"].fn(spark, SF_DIR)))
    # 7 needed columns only, not all 11
    assert "l_partkey" not in cols and "l_suppkey" not in cols


def test_broadcast_join_is_broadcast(spark):
    assert has_broadcast_join(Q["q_join_broadcast"].fn(spark, SF_DIR))


def test_multiway_join_no_cartesian(spark):
    assert_no_cartesian(Q["q_join_multiway"].fn(spark, SF_DIR))


def test_range_join_is_broadcast_not_cartesian(spark):
    df = Q["q_join_range"].fn(spark, SF_DIR)
    assert has_broadcast_join(df)
    assert_no_cartesian(df)


def test_semi_join_pushes_filter(spark):
    pf = pushed_filters(Q["q_join_semi"].fn(spark, SF_DIR))
    assert "o_totalprice" in pf


def test_exists_subquery_decorrelates_to_join(spark):
    """Correlated EXISTS must become a semi join, never per-row subquery
    re-execution (which would be O(rows) plans at scale)."""
    df = Q["q_subquery_exists"].fn(spark, SF_DIR)
    plan = explain_str(df)
    assert "LeftSemi" in plan or "SemiJoin" in plan.replace(" ", "")
    assert_no_cartesian(df)


def test_grouping_sets_single_expand_single_scan(spark):
    """GROUPING SETS computes all groupings from ONE scan + Expand, not one
    scan per grouping."""
    df = Q["q_agg_grouping_sets"].fn(spark, SF_DIR)
    plan = explain_str(df)
    # "(N) Node" detail entries appear once per physical node (the tree
    # repeats labels, so a raw substring count double-counts)
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "Expand" in plan


def test_window_no_extra_shuffle_for_same_partitioning(spark):
    """Both window frames in q_win_first_last share partitioning/ordering:
    one Exchange + one Sort, not two."""
    df = Q["q_win_first_last"].fn(spark, SF_DIR)
    plan = explain_str(df)
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert len(re.findall(r"\(\d+\) Window", plan)) == 1


def test_tpch_q6_pushes_all_predicates(spark):
    df = Q["q_tpch_q6"].fn(spark, SF_DIR)
    pf = pushed_filters(df)
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pf, f"{col} not pushed: {pf!r}"
    cols = set(read_schema_columns(df))
    assert cols == {"l_quantity", "l_extendedprice", "l_discount", "l_shipdate"}


def test_sim_topk_broadcasts_query_vector(spark):
    df = Q["q_sim_topk"].fn(spark, SF_DIR)
    assert has_broadcast_join(df)
    plan = explain_str(df)
    assert "TakeOrderedAndProject" in plan  # top-k, not global sort


def test_dedup_near_no_cartesian(spark):
    assert_no_cartesian(Q["q_dedup_near"].fn(spark, SF_DIR))


def test_corpus_prep_no_cartesian_and_pruned_scan(spark):
    df = Q["q_pipeline_corpus_prep"].fn(spark, SF_DIR)
    assert_no_cartesian(df)
    # the dedup hash-agg branch must not drag every column through the
    # shuffle: only doc_id + text are needed before the semi join
    cols = set(read_schema_columns(df))
    assert "embedding" not in cols


def test_tpch_composites_broadcast_and_no_cartesian(spark):
    """The new TPC-H shapes keep their dims broadcast and never fall back
    to a cartesian product (Q22's single-row scalar cross join is the one
    sanctioned BroadcastNestedLoopJoin — size-1 build side)."""
    for qid in ["q_tpch_q4", "q_tpch_q14", "q_tpch_q18", "q_tpch_q19"]:
        df = Q[qid].fn(spark, SF_DIR)
        assert has_broadcast_join(df), f"{qid}: no broadcast join"
        assert_no_cartesian(df)


def test_tpch_batch2_broadcast_and_no_cartesian(spark):
    """Batch-2 TPC-H shapes: dims broadcast, no cartesian fallback.
    (q_tpch_q11/q_tpch_q15 are excluded here: their single-row scalar
    threshold is a sanctioned size-1 BroadcastNestedLoopJoin, same as
    q_tpch_q22.)"""
    for qid in [
        "q_tpch_q2", "q_tpch_q5", "q_tpch_q7", "q_tpch_q8", "q_tpch_q9",
        "q_tpch_q12", "q_tpch_q13", "q_tpch_q16", "q_tpch_q17", "q_tpch_q20",
        "q_tpch_q21",
    ]:
        df = Q[qid].fn(spark, SF_DIR)
        assert has_broadcast_join(df), f"{qid}: no broadcast join"
        assert_no_cartesian(df)


def test_tpch_star_joins_at_most_one_shuffle_join(spark):
    """Q5/Q8/Q9: every dimension ships broadcast, so the only join allowed
    to shuffle is the orders<->lineitem fact join (at sf0.01 even that one
    broadcasts; the gate bounds what survives a 100x scale-up)."""
    for qid in ["q_tpch_q5", "q_tpch_q8", "q_tpch_q9"]:
        plan = explain_str(Q[qid].fn(spark, SF_DIR))
        n = len(re.findall(r"\(\d+\) SortMergeJoin", plan)) + len(
            re.findall(r"\(\d+\) ShuffledHashJoin", plan)
        )
        assert n <= 1, f"{qid}: {n} shuffle joins\n{plan}"


def test_tpch_q21_single_lineitem_scan(spark):
    """The one-pass reformulation reads lineitem ONCE; the spec's
    EXISTS/NOT-EXISTS form (kept as the oracle) would scan it three
    times — at 100 TB that is the whole game."""
    plan = explain_str(Q["q_tpch_q21"].fn(spark, SF_DIR))
    n = len(re.findall(r"Location:.*lineitem", plan))
    assert n == 1, f"{n} lineitem scans\n{plan}"


def test_tpch_q7_pushes_shipdate_and_nation_prefilter(spark):
    df = Q["q_tpch_q7"].fn(spark, SF_DIR)
    pf = pushed_filters(df)
    assert "l_shipdate" in pf, pf
    # the nation-pair narrowing reaches the nation scans as In-filters
    assert "n_name" in pf, pf


def test_tpch_q14_pushes_shipdate(spark):
    pf = pushed_filters(Q["q_tpch_q14"].fn(spark, SF_DIR))
    assert "l_shipdate" in pf


def test_funnel_one_scan_one_window_shuffle(spark):
    """The chained running-min windows share one partitioning (user_id):
    ONE events scan, both Window nodes fed by the same exchange, plus the
    final single-row aggregation exchange — 2 exchanges total. The
    three-join oracle formulation would scan events three times."""
    plan = explain_str(Q["q_funnel_conversion"].fn(spark, SF_DIR))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 2, plan


def test_sampling_no_shuffle_before_report(spark):
    """Split/stratify membership is a map-side expression: exactly one
    shuffle (the report aggregation) in the whole plan."""
    for qid in ["q_sample_split", "q_sample_stratified"]:
        plan = explain_str(Q[qid].fn(spark, SF_DIR))
        n_ex = len(re.findall(r"\(\d+\) Exchange", plan))
        # one partial->final agg exchange + one ordering exchange at most
        assert n_ex <= 2, f"{qid}: {n_ex} exchanges\n{plan}"


def test_pack_sequences_reads_two_columns(spark):
    cols = set(read_schema_columns(Q["q_pack_sequences"].fn(spark, SF_DIR)))
    assert cols == {"doc_id", "text"}, cols


def test_pack_sequences_no_global_window(spark):
    """The cumsum window partitions by shard: the plan must contain no
    single-partition (empty partitionBy) window — the scale-killer the
    r1 formulation carried."""
    plan = explain_str(Q["q_pack_sequences"].fn(spark, SF_DIR))
    assert len(re.findall(r"\(\d+\) Window", plan)) == 1
    # an unpartitioned window plans as Exchange SinglePartition feeding it
    assert "SinglePartition" not in plan, plan


def test_global_plan_hygiene(spark):
    """Inventory-wide invariants (the PLANS.md audit as a gate): no
    CartesianProduct anywhere (even the intentional cross join plans as a
    broadcast nested loop), and no row-at-a-time Python (BatchEvalPython)
    in any plan — Python hops must be Arrow-vectorized."""
    for name, q in sorted(Q.items()):
        df = q.fn(spark, SF_DIR)
        plan = explain_str(df)
        assert "CartesianProduct" not in plan, f"{name} has a CartesianProduct"
        assert "BatchEvalPython" not in plan, f"{name} has row-at-a-time Python"
        # no query may sort/window all rows through ONE task; scalar
        # aggregates (tiny partial-agg states) keep their SinglePartition
        # exchange, but a Window fed by one is a scale-killer
        spw = single_partition_windows(df)
        assert not spw, f"{name} has SinglePartition window(s): {spw}"


def test_vocab_topk_heap_not_global_sort(spark):
    """Top-k vocabulary must plan as TakeOrderedAndProject (per-partition
    heaps + driver merge of k), never a full sort of the vocab."""
    plan = explain_str(Q["q_vocab_topk"].fn(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan


def test_tfidf_no_cartesian_beyond_scalar(spark):
    """The only nested-loop join allowed is the size-1 corpus-count
    broadcast; tf x df joins on word."""
    df = Q["q_text_tfidf"].fn(spark, SF_DIR)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan, plan


def test_embed_quantize_single_scan_no_shuffle(spark):
    """Quantization is a pure scan projection: one scan, zero exchanges."""
    plan = explain_str(Q["q_embed_quantize"].fn(spark, SF_DIR))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0, plan


def test_knn_join_no_pair_shuffle(spark):
    """k-NN join: the n*m scored pairs must never cross an exchange. The
    kernel emits only local top-k per probe per batch; the plan is ONE
    corpus scan, no Window over pairs, and only the tiny merge + result
    exchanges."""
    plan = explain_str(Q["q_sim_knn_join"].fn(spark, SF_DIR))
    assert len(re.findall(r"\(\d+\) Window", plan)) == 0, plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 2, plan


def test_join_bucketed_zero_shuffle_join(spark):
    """q_join_bucketed: both facts are bucketed+sorted on the key, so the
    SortMergeJoin gets NO Exchange on either side — the only exchange in
    the whole plan is the final aggregation's."""
    plan = explain_str(Q["q_join_bucketed"].fn(spark, SF_DIR))
    assert len(re.findall(r"\(\d+\) SortMergeJoin", plan)) == 1, plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan


def test_ann_pruned_probe_skips_files(spark):
    """Storage-pruned ANN: the Hamming<=1 cell probe must plan strictly
    fewer files than the table holds (manifest pruning, no file opened
    for unprobed cells), with results identical to the scan-and-filter
    IVF formulation."""
    from iceberg_poc_spark.operators.similarity import _ann_pruned_scan

    _df, planned, total, _q = _ann_pruned_scan(spark, SF_DIR)
    assert planned < total, f"no files pruned: {planned}/{total}"
    a = [tuple(r) for r in Q["q_sim_ann_pruned"].fn(spark, SF_DIR).collect()]
    b = [tuple(r) for r in Q["q_sim_ann_ivf"].fn(spark, SF_DIR).collect()]
    assert a == b


def test_join_interval_equi_key_never_nested_loop(spark):
    """The attribution join must plan on the user_id equi-key (BHJ or
    SMJ) with the time band as a residual — a BroadcastNestedLoopJoin
    would mean Catalyst saw no equi-conjunct and planned the cross
    product."""
    plan = explain_str(Q["q_join_interval"].fn(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan), plan


def test_retention_cohort_single_user_shuffle(spark):
    """Cohort derivation is one window over user_id partitions plus the
    final aggregate — no self-join of events."""
    plan = explain_str(Q["q_retention_cohort"].fn(spark, SF_DIR))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan
    assert "Join" not in plan, plan


def test_events_anomaly_stats_broadcast_not_fact_shuffle(spark):
    """The moment stats (5 rows) broadcast back onto the event stream;
    the fact side must not cross a hash-partition exchange."""
    plan = explain_str(Q["q_events_anomaly"].fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan
    # the only Exchange allowed feeds the tiny stats aggregate
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 1, plan


def test_sample_reservoir_partial_topk(spark):
    """The per-group rank filter must push a WindowGroupLimit below the
    shuffle (per-task partial top-k), so no group ever sorts all its rows
    in one task's memory."""
    plan = explain_str(Q["q_sample_reservoir"].fn(spark, SF_DIR))
    assert "WindowGroupLimit" in plan, plan


def test_dpp_runtime_partition_filter(spark):
    """q_join_dpp's fact scan must carry a runtime (dynamic) partition
    filter fed by the dim's broadcast — the file-level skip that makes a
    dim-filtered star join read only matching partitions of a 100 TB
    fact."""
    df = Q["q_join_dpp"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan


def test_dedup_incremental_shuffles_only_the_batch(spark):
    """q_dedup_incremental: the corpus digest index is bucketed+sorted on
    the digest, so the sort-merge left join gets NO Exchange on the index
    side — the plan's only exchanges are the batch-side join alignment
    and the final per-source aggregation, and the in-batch keep-first
    window must REUSE the join's hash distribution (a Sort, not a third
    Exchange)."""
    plan = explain_str(Q["q_dedup_incremental"].fn(spark, SF_DIR))
    assert len(re.findall(r"\(\d+\) SortMergeJoin", plan)) == 1, plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 2, plan
    assert len(re.findall(r"\(\d+\) Window", plan)) == 1, plan


def test_dedup_near_incremental_index_side_zero_exchange(spark):
    """q_dedup_near_incremental: BOTH persisted index tables (band
    postings bucketed on bk, corpus signatures bucketed on corpus_id)
    join bucket-aligned — their sort-merge joins carry no Exchange on
    the index side. Concretely: every Exchange in the plan hashes on
    batch-derived keys; the two index scans feed Sorts directly."""
    plan = explain_str(Q["q_dedup_near_incremental"].fn(spark, SF_DIR))
    assert len(re.findall(r"SortMergeJoin", plan)) >= 2, plan
    assert "CartesianProduct" not in plan
    # BOTH index scans read bucket-aligned — Spark marks the scan itself
    # (`Bucketed: true`) when the join consumed the bucketing instead of
    # inserting an Exchange; two such scans = band_idx + sig_idx
    assert len(re.findall(r"Bucketed: true", plan)) == 2, plan


def test_dedup_clusters_incremental_index_zero_exchange(spark):
    """q_dedup_clusters_incremental's daily delta graph: ALL THREE
    persisted index tables — band postings (bk), corpus signatures
    (corpus_id), and the persisted cluster ASSIGNMENT (corpus_id) —
    sort-merge-join bucket-aligned with zero index-side Exchange; every
    Exchange in the plan hashes batch-derived keys. (The registered
    query's final plan is the propagation loop's checkpoint scan, so the
    gate targets the delta-graph subplan the daily pass actually
    shuffles.)"""
    from iceberg_poc_spark.operators.dedup import _ci_quotient_edges

    plan = explain_str(_ci_quotient_edges(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert len(re.findall(r"SortMergeJoin", plan)) >= 3, plan
    assert len(re.findall(r"Bucketed: true", plan)) == 3, plan


def test_vocab_incremental_index_side_zero_exchange(spark):
    """q_vocab_incremental: the persisted vocab-counts index is
    bucketed+sorted on word, so the full-outer sort-merge merge gets NO
    Exchange on the index side — the batch tokenize/count is the only
    shuffled input, and the top-k is a TakeOrdered, never a global
    sort."""
    plan = explain_str(Q["q_vocab_incremental"].fn(spark, SF_DIR))
    assert len(re.findall(r"\(\d+\) SortMergeJoin", plan)) == 1, plan
    assert len(re.findall(r"Bucketed: true", plan)) == 1, plan
    assert "TakeOrderedAndProject" in plan, plan
