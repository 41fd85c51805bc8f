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


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_no_static_broadcast_hint_on_fact_tables(spark, name):
    import re

    if name == "streaming_windowed_counts":
        pytest.skip("streaming query materializes on build")
    analyzed = (
        REGISTRY[name]["builder"](spark, SF)
        ._jdf.queryExecution().analyzed().toString()
    )
    hinted = re.findall(
        r"ResolvedHint \(strategy=broadcast\)\s*\n"
        r"[\s:+|-]*Relation \[([^\]]*)\]",
        analyzed,
    )
    for cols in hinted:
        assert not any(m in cols for m in _FACT_MARKERS), (
            f"{name}: static broadcast hint on a fact-sized relation "
            f"({cols[:80]}...)"
        )
