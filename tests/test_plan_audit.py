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


# nodes that reduce cardinality to model size: a broadcast hint over
# one of these is fine no matter how big the relations underneath are
# (e.g. scalar_subquery_max_order broadcasts a 1-row max() over orders)
_REDUCING = (".Aggregate", ".GlobalLimit", ".Distinct", ".Deduplicate")


def _hinted_leaf_columns(df) -> list[set[str]]:
    """For each broadcast ResolvedHint in the analyzed plan, the column
    names of every leaf relation reachable WITHOUT passing through a
    cardinality-reducing node — regardless of intervening Filter/
    Project/SubqueryAlias nodes (a plain regex on the plan string only
    matches hint-directly-on-relation and misses the realistic
    regressions)."""
    import json

    nodes = json.loads(df._jdf.queryExecution().analyzed().toJSON())

    def leaf_cols(i: int, cols: set[str]) -> int:
        """Walk subtree at i collecting leaf columns; returns the
        exclusive end index. Prunes reducing subtrees (still consuming
        their indices)."""
        n = nodes[i]
        cls = n.get("class", "")
        j = i + 1
        for _ in range(n.get("num-children", 0)):
            j = (
                _skip(j)
                if any(cls.endswith(s) for s in _REDUCING)
                else leaf_cols(j, cols)
            )
        if cls.endswith((".LogicalRelation", ".LocalRelation")):
            for attr_list in n.get("output") or []:
                for attr in (
                    attr_list if isinstance(attr_list, list) else [attr_list]
                ):
                    if isinstance(attr, dict) and "name" in attr:
                        cols.add(attr["name"])
        return j

    def _skip(i: int) -> int:
        need, j = 1, i
        while need:
            need += nodes[j].get("num-children", 0) - 1
            j += 1
        return j

    out = []
    for i, n in enumerate(nodes):
        if n.get("class", "").endswith(".ResolvedHint"):
            cols: set[str] = set()
            leaf_cols(i, cols)
            out.append(cols)
    return out


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
