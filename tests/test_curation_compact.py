"""Chain compaction: rewrite a base + increments chain as ONE
committed run (curation's rewrite-data-files maintenance op).

The invariants that make compaction safe to run unattended:
- the cumulative corpus is preserved byte-identically (survivors AND
  packed chunk rows; bin MEMBERSHIP preserved, bin ids renumbered
  into one contiguous space per partition key);
- a later increment against the compacted run produces the same
  survivor set as against the uncompacted chain (the band/hash/
  processed manifests carry over);
- the head batch still no-op-resumes after compaction (fingerprint
  carry), and vacuum(keep_last=1) then reclaims the whole old chain;
- guards: chain-of-one no-ops, replayed run_ids rejected, a live
  concurrent run fails the compaction loudly, mixed split-stamped
  chains are rejected instead of silently degrading split reads.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from distributed_system___ocr_spark.curation import (
    compact_curation,
    load_curation_snapshot,
    read_curated,
    read_packed,
    run_curation,
    run_curation_increment,
    vacuum_curation,
)


def _docs(spark, prefix, n, host="a.com"):
    rows = [
        {"url": f"https://{host}/{prefix}{i:03d}",
         "text": f"{prefix} document %03d " % i
         + " ".join(f"{prefix}{i:03d}w{j:02d}" for j in range(60)),
         "lang": "en" if i % 3 else "de"}
        for i in range(n)
    ]
    return spark.createDataFrame(pd.DataFrame(rows))


def _chain(spark, out, split_fracs=None):
    """base + two increments; increment 2 carries an exact clone of a
    base survivor (must stay dropped after compaction too)."""
    run_curation(
        spark, _docs(spark, "base", 10), out, run_id="b0",
        split_fracs=split_fracs,
    )
    run_curation_increment(
        spark, _docs(spark, "incone", 6, host="m.com"), out,
        run_id="i1", split_fracs=split_fracs,
    )
    base_text = _docs(spark, "base", 10).collect()[2]["text"]
    i2 = _docs(spark, "inctwo", 5, host="z.com").unionByName(
        spark.createDataFrame(pd.DataFrame([
            {"url": "https://z.com/clone", "text": base_text,
             "lang": "en"},
        ]))
    )
    run_curation_increment(
        spark, i2, out, run_id="i2", split_fracs=split_fracs,
    )
    return i2


def _surv_set(df):
    cols = sorted(df.columns)
    return {tuple(r[c] for c in cols) for r in df.collect()}


def _bin_membership(df, key):
    """set of (key..., frozenset of (url, chunk_idx)) per bin —
    run/bin ids excluded, so it is invariant under renumbering."""
    rows = df.collect()
    bins: dict[tuple, set] = {}
    for r in rows:
        bid = tuple(
            [r[c] for c in key]
            + [r["run_id"] if "run_id" in df.columns else None]
            + [r["bin_id"]]
        )
        bins.setdefault(bid, set()).add((r["url"], r["chunk_idx"]))
    return {
        (tuple(bid[: len(key)]), frozenset(members))
        for bid, members in bins.items()
    }


def test_compact_preserves_corpus_bins_and_split(spark, tmp_path):
    out = str(tmp_path / "cur")
    _chain(spark, out, split_fracs=(0.6, 0.2))
    key = ["lang", "split"]

    before_surv = _surv_set(read_curated(spark, out, cumulative=True))
    before_packed = read_packed(spark, out, cumulative=True)
    before_bins = _bin_membership(before_packed, key)
    before_chunks = {
        tuple(r[c] for c in sorted(
            set(before_packed.columns) - {"run_id", "bin_id"}
        ))
        for r in before_packed.collect()
    }

    info = compact_curation(spark, out, run_id="cpt")
    assert info["compacted_runs"] == ["b0", "i1", "i2"]
    snap = load_curation_snapshot(out)
    assert snap["latest_run"] == "cpt"
    assert snap["run_parents"]["cpt"] is None

    # non-cumulative reads of the compacted run ARE the corpus now
    after = read_curated(spark, out)
    assert _surv_set(after) == before_surv
    after_packed = read_packed(spark, out)
    assert {
        tuple(r[c] for c in sorted(
            set(after_packed.columns) - {"bin_id"}
        ))
        for r in after_packed.collect()
    } == before_chunks
    assert _bin_membership(after_packed, key) == before_bins

    # bin ids contiguous from 0 per (lang, split)
    ids: dict[tuple, list] = {}
    for r in after_packed.select("lang", "split", "bin_id").collect():
        ids.setdefault((r["lang"], r["split"]), []).append(r["bin_id"])
    for k, v in ids.items():
        assert sorted(set(v)) == list(range(max(v) + 1)), k

    # split-partitioned layout survives: train read prunes files
    tr = read_packed(spark, out, split="train")
    assert 0 < tr.count() < after_packed.count()


def test_increment_after_compact_matches_uncompacted(spark, tmp_path):
    out_a = str(tmp_path / "plain")
    out_b = str(tmp_path / "compacted")
    _chain(spark, out_a)
    _chain(spark, out_b)
    compact_curation(spark, out_b, run_id="cpt")

    # identical next batch: novel docs + a near-dup of an i1 survivor
    # (must drop via the carried band manifests on BOTH sides)
    i1_text = _docs(spark, "incone", 6, host="m.com").collect()[1]["text"]
    batch = _docs(spark, "incthree", 5, host="q.com").unionByName(
        spark.createDataFrame(pd.DataFrame([
            {"url": "https://q.com/neardup",
             "text": i1_text.replace("incone001w30", "tweak"),
             "lang": "en"},
        ]))
    )
    a = run_curation_increment(spark, batch, out_a, run_id="i3")
    b = run_curation_increment(spark, batch, out_b, run_id="i3")
    assert a["n_survivors"] == b["n_survivors"]
    sa = _surv_set(read_curated(spark, out_a, run_id="i3"))
    sb = _surv_set(read_curated(spark, out_b, run_id="i3"))
    assert sa == sb
    # the near-dup died on both sides (proves bands carried over)
    assert not any("neardup" in t[0] for t in sa)
    # cumulative corpus identical across the two histories
    assert _surv_set(
        read_curated(spark, out_a, cumulative=True)
    ) == _surv_set(read_curated(spark, out_b, cumulative=True))


def test_compact_noop_on_chain_of_one(spark, tmp_path):
    out = str(tmp_path / "cur")
    run_curation(spark, _docs(spark, "base", 6), out, run_id="b0")
    info = compact_curation(spark, out)
    assert info.get("skipped_noop") and info["run_id"] == "b0"
    assert load_curation_snapshot(out)["latest_run"] == "b0"


def test_compact_guards(spark, tmp_path):
    out = str(tmp_path / "cur")
    _chain(spark, out)
    with pytest.raises(ValueError, match="already committed"):
        compact_curation(spark, out, run_id="i1")
    # a live in-flight sentinel (our own pid) fails the compaction
    sent = os.path.join(out, "_checkpoint", "INFLIGHT-other")
    with open(sent, "w") as f:
        f.write(str(os.getpid()))
    try:
        with pytest.raises(RuntimeError, match="in flight"):
            compact_curation(spark, out, run_id="cpt")
    finally:
        os.remove(sent)


def test_compact_then_vacuum_reclaims_chain_and_noop_resume(
    spark, tmp_path
):
    out = str(tmp_path / "cur")
    i2 = _chain(spark, out)
    before = _surv_set(read_curated(spark, out, cumulative=True))
    compact_curation(spark, out, run_id="cpt")

    # the head batch still no-op-resumes (fingerprint carry)
    again = run_curation_increment(spark, i2, out, run_id="i2-again")
    assert again.get("skipped_noop") is True

    snap = vacuum_curation(out, keep_last=1)
    assert snap["runs"] == ["cpt"]
    assert set(snap["vacuumed_runs"]) == {"b0", "i1", "i2"}
    for rid in ("b0", "i1", "i2"):
        assert not os.path.isdir(
            os.path.join(out, "curated", f"run_id={rid}")
        )
    assert _surv_set(read_curated(spark, out)) == before
    assert read_packed(spark, out, cumulative=True).count() > 0
    # replaying a vacuumed chain run id is still rejected
    with pytest.raises(ValueError, match="already committed"):
        compact_curation(spark, out, run_id="b0")


def test_cli_compact_curation_mode(spark, tmp_path):
    """--compact-curation drives the same function from the CLI (own
    subprocess session, same protocol as test_cli_vacuum_curation_mode)
    and prints the compaction info."""
    import json
    import subprocess
    import sys

    out = str(tmp_path / "cur")
    _chain(spark, out)
    before = _surv_set(read_curated(spark, out, cumulative=True))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo, SPARK_GRAFT_CPUS="4")
    res = subprocess.run(
        [sys.executable, "-m", "distributed_system___ocr_spark.cli",
         "--compact-curation", "--output", out, "--run-id", "cpt"],
        capture_output=True, text=True, timeout=300, env=env, cwd="/tmp",
    )
    assert res.returncode == 0, res.stderr[-1500:]
    info = json.loads(res.stdout.strip().splitlines()[-1])
    assert info["compacted_curation"]["run_id"] == "cpt"
    assert info["compacted_curation"]["compacted_runs"] == [
        "b0", "i1", "i2"
    ]
    assert _surv_set(read_curated(spark, out)) == before


def test_compact_mixed_split_chain_raises(spark, tmp_path):
    out = str(tmp_path / "cur")
    run_curation(spark, _docs(spark, "base", 8), out, run_id="b0")
    run_curation_increment(
        spark, _docs(spark, "incone", 4, host="m.com"), out,
        run_id="i1", split_fracs=(0.6, 0.2),
    )
    with pytest.raises(ValueError, match="not split-stamped"):
        compact_curation(spark, out, run_id="cpt")
