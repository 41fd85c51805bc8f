"""Every registry query vs its DuckDB oracle at sf0.001 (the driver
repeats this at sf0.01)."""

from __future__ import annotations

import pytest

from distributed_system___ocr_spark.plans import REGISTRY

from oracle_harness import compare, duck_con

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, con, name):
    spec = REGISTRY[name]
    df = spec["builder"](spark, SF_DIR)
    assert df.count() >= 0
    if spec["sql"] is None:
        pytest.skip("no SQL oracle (rows-only check)")
    ok, msg = compare(df, con, spec["sql"])
    assert ok, f"{name}: {msg}"
