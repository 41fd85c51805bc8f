"""Chain dedup-invariant audit: verify a committed base + increments
chain from its THIN hash/band manifests alone (no corpus text).

A healthy chain has zero violations by construction: within a run,
two surviving representatives of different components never share a
band; across runs, increments drop new docs colliding with committed
hashes/bands; compaction carries the manifests over physically. The
audit exists for what the snapshot barrier CANNOT see — out-of-band
artifact edits and minhash-algorithm drift across old commits."""

from __future__ import annotations

import pandas as pd

from distributed_system___ocr_spark.curation import (
    audit_curation_chain,
    compact_curation,
    dedup_invariant_violations,
    run_curation,
    run_curation_increment,
)


def _docs(spark, prefix, n, host="a.com"):
    rows = [
        {"url": f"https://{host}/{prefix}{i:03d}",
         "text": f"{prefix} doc %03d " % i
         + " ".join(f"{prefix}{i:03d}w{j:02d}" for j in range(60)),
         "lang": "en"}
        for i in range(n)
    ]
    return spark.createDataFrame(pd.DataFrame(rows))


def test_violations_fire_on_crafted_manifests(spark):
    """The core detector, on hand-made frames: one exact collision
    (pair emitted against the min url), one band collision, and a
    clean doc contributing nothing."""
    hashes = spark.createDataFrame(pd.DataFrame([
        {"url": "u1", "content_hash": "h1"},
        {"url": "u2", "content_hash": "h1"},   # exact dup of u1
        {"url": "u3", "content_hash": "h3"},
        {"url": "u4", "content_hash": "h4"},
    ]))
    bands = spark.createDataFrame(pd.DataFrame([
        {"id": "u1", "band_idx": 0, "band_val": 111},
        {"id": "u3", "band_idx": 0, "band_val": 999},  # collides u4
        {"id": "u4", "band_idx": 0, "band_val": 999},
        # same PAIR via a second band: must stay ONE distinct row
        {"id": "u3", "band_idx": 1, "band_val": 555},
        {"id": "u4", "band_idx": 1, "band_val": 555},
    ]))
    got = {
        (r["kind"], r["a_id"], r["b_id"])
        for r in dedup_invariant_violations(hashes, bands).collect()
    }
    assert got == {
        ("exact_dup", "u1", "u2"),
        ("neardup_candidate", "u3", "u4"),
    }


def test_healthy_chain_audits_clean_through_compaction(spark, tmp_path):
    """base + increment (with dup bait that the chain must have
    pruned) audits to zero violations — and still does after
    compaction (the carried manifests stay self-consistent)."""
    out = str(tmp_path / "cur")
    run_curation(spark, _docs(spark, "base", 10), out, run_id="b0")
    base_text = _docs(spark, "base", 10).collect()[3]["text"]
    inc = _docs(spark, "inc", 5, host="z.com").unionByName(
        spark.createDataFrame(pd.DataFrame([
            # exact + near dup of committed survivors: must be pruned,
            # leaving the audit clean
            {"url": "https://z.com/exact", "text": base_text,
             "lang": "en"},
            {"url": "https://z.com/near",
             "text": base_text.replace("base003w30", "tweak"),
             "lang": "en"},
        ]))
    )
    run_curation_increment(spark, inc, out, run_id="i1")
    assert audit_curation_chain(spark, out).count() == 0

    compact_curation(spark, out, run_id="cpt")
    assert audit_curation_chain(spark, out).count() == 0


def test_cli_audit_curation_exit_codes(spark, tmp_path):
    """--audit-curation is cron/orchestrator-facing: exit 0 + zero
    violations on a healthy chain; the count and a bounded sample in
    the JSON line (own subprocess session, same protocol as the other
    CLI maintenance-mode tests)."""
    import json
    import os
    import subprocess
    import sys

    out = str(tmp_path / "cur")
    run_curation(spark, _docs(spark, "base", 8), out, run_id="b0")
    run_curation_increment(
        spark, _docs(spark, "inc", 4, host="z.com"), out, run_id="i1"
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo, SPARK_GRAFT_CPUS="4")
    res = subprocess.run(
        [sys.executable, "-m", "distributed_system___ocr_spark.cli",
         "--audit-curation", "--output", out, "--run-id", "a1"],
        capture_output=True, text=True, timeout=300, env=env, cwd="/tmp",
    )
    assert res.returncode == 0, res.stderr[-1500:]
    info = json.loads(res.stdout.strip().splitlines()[-1])
    assert info["audit_violations"] == 0 and info["sample"] == []


def test_audit_catches_out_of_band_corruption(spark, tmp_path):
    """Simulated operational damage: a survivors+manifest restore
    that re-introduces a committed duplicate (e.g. a partial
    backup-restore of an already-deduped run). The snapshot barrier
    cannot see it; the audit must."""
    out = str(tmp_path / "cur")
    run_curation(spark, _docs(spark, "base", 8), out, run_id="b0")
    # "restore" an increment whose hashes manifest duplicates a base
    # survivor: write a second run whose ONLY doc clones base002,
    # bypassing dedup by committing it as a fresh FULL run in a
    # separate dir and copying its artifacts in as run i1
    import shutil

    side = str(tmp_path / "side")
    clone = spark.createDataFrame(pd.DataFrame([
        {"url": "https://z.com/clone",
         "text": _docs(spark, "base", 8).collect()[2]["text"],
         "lang": "en"},
    ]))
    run_curation(spark, clone, side, run_id="s0")
    shutil.copytree(
        f"{side}/curated/run_id=s0", f"{out}/curated/run_id=i1"
    )
    # graft it into the snapshot log as an increment of b0
    import json as _json
    import os

    ck = os.path.join(out, "_checkpoint")
    with open(os.path.join(ck, "snapshot-0.json")) as f:
        snap = _json.load(f)
    snap.update(
        n=1, runs=sorted(set(snap["runs"]) | {"i1"}), latest_run="i1",
        run_parents={**snap.get("run_parents", {}), "i1": "b0"},
    )
    with open(os.path.join(ck, "snapshot-1.json"), "w") as f:
        _json.dump(snap, f)
    with open(os.path.join(ck, "LATEST"), "w") as f:
        f.write("snapshot-1.json")

    v = audit_curation_chain(spark, out)
    kinds = {r["kind"] for r in v.collect()}
    # the clone exact-collides AND band-collides with base002
    assert kinds == {"exact_dup", "neardup_candidate"}
    pairs = {
        (r["a_id"], r["b_id"]) for r in v.collect()
    }
    assert ("https://a.com/base002", "https://z.com/clone") in pairs
