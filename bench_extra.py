#!/usr/bin/env python
"""Extra benchmarks for optimization work (guide §1: measure first).

NOT the frozen driver bench — bench.py stays the measured artifact.
This harness isolates per-query costs so optimizations can be
attributed:

  python bench_extra.py queries [name ...]   # per-query: build vs exec
      wall, N trials, optional explain dump to plans/r07/
  python bench_extra.py curation             # per-stage wall breakdown
  python bench_extra.py extract              # extract throughput probe

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same as bench.py),
BX_TRIALS (default 3), BX_EXPLAIN=1 to dump plans to plans/r07/.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd  # noqa: F401  (pandas_udf hints resolve at import)

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
TRIALS = int(os.environ.get("BX_TRIALS", 3))
EXPLAIN = os.environ.get("BX_EXPLAIN", "") == "1"
EXPLAIN_DIR = os.path.join(REPO, "plans", "r07")
EXPLAIN_SUFFIX = os.environ.get("BX_EXPLAIN_SUFFIX", "before")


def _session():
    from distributed_system___ocr_spark.session import get_spark

    return get_spark(
        "bench-extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 8),
        max_partition_bytes="4m",
    )


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def cmd_queries(names: list[str]) -> None:
    from bench import _warm_session

    from distributed_system___ocr_spark import plans

    spark = _session()
    _warm_session(spark)
    sel = names or sorted(plans.REGISTRY)
    out = {}
    for name in sel:
        spec = plans.REGISTRY[name]
        spark.sparkContext.setJobDescription(f"bx:{name}")
        build_s, exec_s = [], []
        for _ in range(TRIALS):
            t0 = time.monotonic()
            df = spec["builder"](spark, SF_DIR)
            t1 = time.monotonic()
            _noop(df)
            t2 = time.monotonic()
            build_s.append(round(t1 - t0, 3))
            exec_s.append(round(t2 - t1, 3))
        if EXPLAIN:
            os.makedirs(EXPLAIN_DIR, exist_ok=True)
            df = spec["builder"](spark, SF_DIR)
            p = os.path.join(
                EXPLAIN_DIR, f"{name}_{EXPLAIN_SUFFIX}.txt"
            )
            with open(p, "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                ))
        out[name] = {
            "build": build_s,
            "exec": exec_s,
            "best_total": round(min(b + e for b, e in
                                    zip(build_s, exec_s)), 3),
        }
        print(json.dumps({name: out[name]}), flush=True)
    tot = sum(v["best_total"] for v in out.values())
    print(json.dumps({"n": len(out), "sum_best_total": round(tot, 3)}))
    spark.stop()


def cmd_curation() -> None:
    import tempfile

    from pyspark.sql import functions as F

    from distributed_system___ocr_spark.corpus import pages_df
    from distributed_system___ocr_spark import curation as cur
    from distributed_system___ocr_spark.operators.extract import (
        extract_stage,
    )

    n_docs = int(os.environ.get("BX_CUR_DOCS", 200_000))
    spark = _session()
    tmp = tempfile.mkdtemp(prefix="bx_cur_")
    texts_path = os.path.join(tmp, "cur_docs.parquet")
    extract_stage(
        pages_df(spark, n_docs, seed=42, partitions=192)
    ).select("url", "text", "lang").write.mode("overwrite").parquet(
        texts_path
    )
    docs = spark.read.parquet(texts_path)
    docs.count()
    eval_docs = spark.createDataFrame(
        pd.DataFrame(
            [{"text": f"benchmark holdout prompt {i} zq{i}a zq{i}b "
                      f"zq{i}c zq{i}d"} for i in range(200)]
        )
    )
    t0 = time.monotonic()
    info = cur.run_curation(
        spark,
        docs,
        os.path.join(tmp, "cur_out"),
        run_id="bx",
        blocked_domains=["host19.example.com"],
        quality_min_chars=30,
        domain_cap=50_000,
        remove_spans_min_docs=5000,
        segment_dedup_n=32,
        semdedup_tau=0.92,
        decon_eval=eval_docs,
        lm_quality_drop_z=2.0,
        cluster_alpha=0.5,
        sample_alpha=0.7,
        split_fracs=(0.9, 0.05),
    )
    sec = time.monotonic() - t0
    print(json.dumps({
        "sec": round(sec, 3),
        "n_survivors": info["n_survivors"],
        "n_chunks": info["n_chunks"],
        "stage_sec": info.get("stage_sec"),
    }, indent=1))
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


def cmd_extract() -> None:
    import tempfile

    from bench import _time_extract

    from distributed_system___ocr_spark.corpus import pages_df

    n_docs = int(os.environ.get("BX_EXT_DOCS", 200_000))
    spark = _session()
    tmp = tempfile.mkdtemp(prefix="bx_ext_")
    corpus_path = os.path.join(tmp, "pages.parquet")
    t0 = time.monotonic()
    pages_df(spark, n_docs, seed=42, partitions=192).write.parquet(
        corpus_path
    )
    t_gen = time.monotonic() - t0
    best = _time_extract(spark, corpus_path, trials=TRIALS)
    print(json.dumps({
        "n_docs": n_docs,
        "gen_sec": round(t_gen, 3),
        "extract_best_sec": round(best, 3),
        "docs_per_sec": round(n_docs / best, 1),
    }))
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "queries"
    if cmd == "queries":
        cmd_queries(sys.argv[2:])
    elif cmd == "curation":
        cmd_curation()
    elif cmd == "extract":
        cmd_extract()
    else:
        raise SystemExit(f"unknown command {cmd}")
