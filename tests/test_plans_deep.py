"""Physical-plan pins for the deep relational suite (relational_deep.py).

Each assertion encodes the 100 TB-safe plan property the query was
written for; a refactor that regresses the plan fails here even if the
answer stays right.
"""

from __future__ import annotations

from tests.test_plans import plan_of


def test_q7_single_fact_shuffle(spark):
    plan = plan_of(spark, "q7_volume_shipping", mode="simple")
    assert "BroadcastHashJoin" in plan
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_q8_eightway_join_broadcasts_all_dims(spark):
    plan = plan_of(spark, "q8_market_share", mode="simple")
    # 7 of the 8 relations are dims — all must broadcast
    assert plan.count("BroadcastHashJoin") >= 6
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1


def test_q9_like_filter_lands_on_part_scan(spark):
    plan = plan_of(spark, "q9_product_type_profit")
    assert "StringContains(p_name,widget)" in plan or "widget" in plan
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1


def test_q13_outer_join_keeps_on_clause_filter(spark):
    plan = plan_of(spark, "q13_customer_order_distribution", mode="simple")
    # LEFT OUTER must survive (a pushed filter would make it inner)
    assert "LeftOuter" in plan
    # the histogram re-agg must have map-side partials
    assert plan.count("HashAggregate") >= 4


def test_q15_max_is_broadcast_not_window(spark):
    plan = plan_of(spark, "q15_top_supplier", mode="simple")
    # the MAX comparison joins a 1-row broadcast; no window over all rows
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_q21_exists_compiles_to_semi_and_anti(spark):
    plan = plan_of(spark, "q21_waiting_suppliers", mode="simple")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_q22_scalar_avg_broadcasts_and_anti_join(spark):
    plan = plan_of(spark, "q22_sales_opportunity", mode="simple")
    assert "LeftAnti" in plan
    # the 1-row threshold must broadcast, never shuffle customers for it
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


# --- relational_full.py (q2/q11/q12/q16/q20) -------------------------------


def test_q2_window_min_single_subtree_no_join_for_min(spark):
    plan = plan_of(spark, "q2_min_cost_supplier", mode="simple")
    # the per-part MIN is a partitioned window in the same shuffle, not
    # a second scan of the eligible subtree joined back
    assert "Window" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    # top-100 is per-partition heaps merged, not a global sort
    assert "TakeOrderedAndProject" in plan


def test_q11_threshold_is_one_row_broadcast(spark):
    plan = plan_of(spark, "q11_important_stock", mode="simple")
    # the scalar-subquery total joins as a 1-row broadcast; the fact
    # side is never shuffled for it
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") == 0


def test_q12_shipdate_filter_reaches_scan(spark):
    plan = plan_of(spark, "q12_ship_delay_priority")
    assert "PushedFilters" in plan and "l_shipdate" in plan
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1


def test_q16_not_in_is_plain_anti_join_not_nested_loop(spark):
    plan = plan_of(spark, "q16_supplier_part_counts", mode="simple")
    # s_suppkey is a non-null key: the NOT IN must compile to a plain
    # broadcast anti join, never the null-aware BroadcastNestedLoopJoin
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q20_single_pass_aggregation_no_self_join(spark):
    plan = plan_of(spark, "q20_excess_stock_suppliers", mode="simple")
    # all-time and 1997 totals fuse into one conditional aggregation:
    # no ps⋈y self-join shuffle survives
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") == 0
    assert "LeftSemi" in plan
    # exactly one wide aggregation over lineitem (partial+final pair)
    assert plan.count("HashAggregate") == 2


def test_lsh_pair_query_computes_quantization_once(spark):
    """Regression pin for the round-6 bench fix: with_quantized
    localCheckpoints the (vid, qvec, qnorm) projection, so every
    similarity operator's fan-out (band derivation + one vector fetch
    per pair side) reads the materialized frame. If the checkpoint is
    dropped, each consumer re-plans from the raw parquet scan —
    quantize+norm re-run per reference and join-key nullability
    inference pushes the dot product into the scan as a DataFilter
    (measured 2.2x on this query at sf0.1). The executed plan must
    therefore contain ZERO parquet scans and only checkpoint reads."""
    plan = plan_of(spark, "embedding_lsh_near_dup_pairs", mode="simple")
    assert plan.count("FileScan") == 0, plan
    assert plan.count("ExistingRDD") >= 2, plan
