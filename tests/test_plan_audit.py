"""Physical-plan audits (SURVEY §7-4, task requirement: "explain the
plan and iterate until it's the plan you'd want"):

- filters and projection reach the parquet scan (PushedFilters /
  ReadSchema);
- small dims broadcast instead of shuffling the fact side;
- relational operators stay inside WholeStageCodegen;
- no row-at-a-time Python anywhere in any registered query.
"""

from __future__ import annotations

import pytest

from distributed_system___ocr_spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_and_projection_pushed_to_scan(spark):
    df = REGISTRY["filter_project_docs"]["builder"](spark, SF)
    plan = _plan(df)
    assert "PushedFilters:" in plan
    assert "GreaterThanOrEqual(n_chars,200)" in plan
    # column pruning: text is needed for the trim filter, but the
    # ReadSchema must not include unused columns like `source`
    assert "source" not in plan.split("ReadSchema")[1][:200]


def test_broadcast_join_for_small_dims(spark):
    plan = _plan(REGISTRY["q3_top_revenue"]["builder"](spark, SF))
    assert "BroadcastHashJoin" in plan
    plan2 = _plan(REGISTRY["region_rollup"]["builder"](spark, SF))
    assert "BroadcastHashJoin" in plan2
    assert "SortMergeJoin" not in plan2  # dims never shuffle the facts


def test_wholestage_codegen_on_relational_path(spark):
    df = REGISTRY["q1_pricing_summary"]["builder"](spark, SF)
    df.collect()  # AQE finalizes the physical plan on execution
    plan = _plan(df)
    assert "isFinalPlan=true" in plan
    assert "*(1)" in plan  # WholeStageCodegen span markers
    assert "partial_sum" in plan  # map-side combine before the shuffle
    assert "BatchEvalPython" not in plan


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_no_rowwise_python_anywhere(spark, name):
    if name == "streaming_windowed_counts":
        pytest.skip("streaming query materializes on build")
    plan = _plan(REGISTRY[name]["builder"](spark, SF))
    assert "BatchEvalPython" not in plan, f"{name} uses row-at-a-time Python"


def test_anti_join_is_broadcast(spark):
    plan = _plan(REGISTRY["resume_anti_join"]["builder"](spark, SF))
    assert "LeftAnti" in plan


# Column prefixes that mark a table as fact-sized: scales with sf
# (lineitem/orders/customer) or is one-row-per-document/vector.
# A STATIC broadcast hint on such a side is a scale-killer that stays
# invisible behind green small-sf tests (round-1 verdict items 2-3);
# AQE may still broadcast them at runtime from MEASURED sizes, which
# is correct and not what this audit rejects.
_FACT_MARKERS = ("l_orderkey", "o_orderkey", "c_custkey", "doc_id", "url")


def _hinted_leaf_columns(df) -> list[set[str]]:
    """For each BROADCAST ResolvedHint in the analyzed plan, the column
    names of every leaf relation reachable WITHOUT passing through a
    genuinely cardinality-reducing node — regardless of intervening
    Filter/Project/SubqueryAlias nodes (a plain regex on the plan
    string only matches hint-directly-on-relation and misses the
    realistic regressions). Walks the py4j tree because toJSON drops
    the HintInfo, which is needed to ignore merge/shuffle_hash hints.

    Reducing = GlobalLimit, or an Aggregate/Deduplicate whose
    grouping keys avoid the fact markers (a distinct/groupBy ON a fact
    key keeps fact cardinality and would OOM a broadcast just the
    same)."""

    def simple(node) -> str:
        return node.getClass().getSimpleName()

    def is_reducing(node) -> bool:
        cls = simple(node)
        if cls == "GlobalLimit":
            return True
        if cls in ("Aggregate", "Deduplicate", "Distinct"):
            keys = (
                node.groupingExpressions().toString()
                if cls == "Aggregate"
                else node.keys().toString()
                if cls == "Deduplicate"
                else ""
            )
            return not any(m in keys for m in _FACT_MARKERS)
        return False

    def leaf_cols(node, cols: set[str]) -> None:
        if is_reducing(node):
            return
        if simple(node) in ("LogicalRelation", "LocalRelation"):
            out = node.output()
            for i in range(out.size()):
                cols.add(out.apply(i).name())
        ch = node.children()
        for i in range(ch.size()):
            leaf_cols(ch.apply(i), cols)

    hinted: list[set[str]] = []

    def visit(node) -> None:
        if (
            simple(node) == "ResolvedHint"
            and "broadcast" in node.hints().toString().lower()
        ):
            cols: set[str] = set()
            ch = node.children()
            for i in range(ch.size()):
                leaf_cols(ch.apply(i), cols)
            hinted.append(cols)
        ch = node.children()
        for i in range(ch.size()):
            visit(ch.apply(i))

    visit(df._jdf.queryExecution().analyzed())
    return hinted


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_no_static_broadcast_hint_on_fact_tables(spark, name):
    if name == "streaming_windowed_counts":
        pytest.skip("streaming query materializes on build")
    df = REGISTRY[name]["builder"](spark, SF)
    for cols in _hinted_leaf_columns(df):
        bad = [m for m in _FACT_MARKERS if m in cols]
        assert not bad, (
            f"{name}: static broadcast hint over a fact-sized relation "
            f"(markers {bad} in {sorted(cols)[:8]}...)"
        )


def test_hint_audit_actually_detects_filtered_fact_broadcast(spark):
    """Self-check: the audit must flag a hint sitting ABOVE a Filter on
    a fact table (the exact q3 regression shape), not only a hint
    directly on a bare scan."""
    from pyspark.sql import functions as F

    cust = spark.read.parquet(f"{SF}/customer.parquet").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    df = orders.join(
        F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
    )
    hinted = _hinted_leaf_columns(df)
    assert any("c_custkey" in cols for cols in hinted)

    # a broadcast over distinct/groupBy ON the fact key keeps fact
    # cardinality — must also be flagged
    keys = orders.select("o_orderkey").distinct()
    df2 = orders.join(F.broadcast(keys), "o_orderkey")
    assert any("o_orderkey" in cols for cols in _hinted_leaf_columns(df2))

    # ...but a 1-row (or bounded-group) aggregate over facts is fine
    mx = orders.agg(F.max("o_totalprice").alias("m"))
    assert _hinted_leaf_columns(orders.join(F.broadcast(mx))) == [set()]

    # non-broadcast strategy hints on facts are legitimate and ignored
    df3 = orders.join(
        orders.select("o_custkey", "o_orderkey").hint("merge"), "o_orderkey"
    )
    assert _hinted_leaf_columns(df3) == []
