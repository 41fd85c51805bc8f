"""CLI behind the spark-submit entry point (BASELINE.json north_rule:
"launched via spark-submit --py-files").

Usage (local or cluster — master comes from spark-submit / env;
spark-submit takes a SCRIPT, so pass the repo-root ``submit.py`` shim,
which imports this module absolutely):

    zip -r engine.zip distributed_system___ocr_spark
    spark-submit --py-files engine.zip submit.py \\
        --input  /path/to/pages_parquet \\
        --output /path/to/out_dir \\
        --run-id run-2026-08-16-a \\
        [--partitions 4096] [--report report.html] [--synthetic N]

Replaces the reference's ``java -jar localApplication.jar input output
n [terminate]`` CLI (LocalApplication.java:54-65): `n` (tasks per
worker) disappears — partitioning replaces fleet sizing — and
`terminate` disappears — there is no long-lived manager to kill.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="dsocr-extract",
        description="PySpark main-content extraction pipeline",
    )
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="pages parquet path/table dir")
    src.add_argument(
        "--input-warc", metavar="GLOB",
        help="read Common-Crawl-native .warc/.warc.gz files",
    )
    src.add_argument(
        "--input-jsonl", metavar="GLOB",
        help="read newline-delimited JSON pages (explicit schema, no "
        "inference pass; normalized at the boundary)",
    )
    src.add_argument(
        "--synthetic", type=int, metavar="N",
        help="generate an N-doc deterministic corpus instead of reading",
    )
    src.add_argument(
        "--input-urls", metavar="FILE",
        help="reference-style newline-delimited url list; requires "
        "--pages-table for the payloads",
    )
    src.add_argument(
        "--compact", action="store_true",
        help="maintenance mode: rewrite all committed runs in --output "
        "into one compacted snapshot (no input read)",
    )
    src.add_argument(
        "--compact-curation", action="store_true",
        help="maintenance mode: rewrite the committed curation chain "
        "(base + increments) in --output as ONE run under --run-id, "
        "preserving the cumulative corpus byte-identically; vacuum "
        "afterwards to reclaim the old chain (no input read)",
    )
    src.add_argument(
        "--audit-curation", action="store_true",
        help="maintenance mode: verify the committed curation chain's "
        "dedup invariants from the thin hash/band manifests (no text "
        "re-read); prints the violation count and a bounded sample — "
        "non-empty means artifact corruption or minhash-algorithm "
        "drift (full re-curate needed)",
    )
    src.add_argument(
        "--vacuum-curation", type=int, metavar="KEEP",
        help="maintenance mode: drop all but the newest KEEP committed "
        "curation runs in --output (plus crashed-run debris); vacuumed "
        "run_ids stay replay-guarded",
    )
    p.add_argument(
        "--curate", action="store_true",
        help="curation mode: --input is an EXTRACTION output dir; "
        "chains exact dedup -> near-dup prune (MinHash/LSH + connected "
        "components) -> chunk -> greedy packing into --output, with "
        "lineage and a no-op resume over an unchanged corpus",
    )
    p.add_argument(
        "--increment", action="store_true",
        help="with --curate: treat --input as a NEW batch appended to "
        "the committed curation in --output — already-processed urls "
        "resume-drop, dedup runs keep-first against the committed "
        "survivors, corpus-global stage flags are rejected",
    )
    p.add_argument("--chunk-size", type=int, default=2048)
    p.add_argument("--chunk-stride", type=int, default=1792)
    p.add_argument("--pack-target", type=int, default=8192)
    p.add_argument(
        "--canonicalize-urls", action="store_true",
        help="switch on URL canonicalization as the chain's first "
        "stage: lowercase scheme/host, drop default ports and "
        "fragments, resolve ./ and ../, sort query params, and "
        "collapse spelling twins keep-first — BEFORE any url-keyed "
        "decision (resume, dedup, domain cap); an increment must "
        "match its committed chain's setting",
    )
    p.add_argument(
        "--blocked-domains", default=None,
        help="switch on the URL blocklist (first cut): a "
        "comma-separated domain list, or a parquet path (first "
        "column = domain) for a curated blocklist at scale; drops "
        "docs from those domains or any subdomain",
    )
    p.add_argument(
        "--quality-min-chars", type=int, default=None,
        help="switch on the curation quality gate: drop docs shorter "
        "than this (and failing the repetition cut) before dedup",
    )
    p.add_argument("--quality-max-chars", type=int, default=None)
    p.add_argument("--quality-dup-bigram-max", type=float, default=None)
    p.add_argument(
        "--domain-cap", type=int, default=None,
        help="switch on the per-url-host quota: keep at most this "
        "many docs per host (longest-texts-win), after the gate",
    )
    p.add_argument(
        "--remove-spans-min-docs", type=int, default=None,
        help="switch on cross-doc boilerplate span removal: strip "
        "token n-grams appearing in >= this many docs (before dedup)",
    )
    p.add_argument("--span-ngram", type=int, default=5)
    p.add_argument(
        "--segment-dedup-n", type=int, default=None,
        help="switch on keep-first global segment dedup: drop every "
        "later occurrence of any n-token tile corpus-wide (C4/CCNet "
        "rule), before exact dedup",
    )
    p.add_argument(
        "--semdedup-tau", type=float, default=None,
        help="switch on SemDeDup semantic near-dup pruning at this "
        "cosine threshold (k~sqrt(N) trained cells, min-url "
        "representative)",
    )
    p.add_argument(
        "--semdedup-embeddings", metavar="PARQUET", default=None,
        help="model embeddings (url, v array<double>) for --semdedup-"
        "tau instead of the built-in feature-hash featurization",
    )
    p.add_argument(
        "--lm-quality-drop-z", type=float, default=None,
        help="switch on the CCNet-style LM-quality tail drop: drop "
        "docs scoring below mu_lang - z*sigma_lang (unigram logprob)",
    )
    p.add_argument(
        "--cluster-alpha", type=float, default=None,
        help="switch on cluster-balanced sampling (D4-style "
        "diversification): temperature-flatten survivors across "
        "k~sqrt(N) trained embedding cells with this alpha",
    )
    p.add_argument(
        "--split", metavar="TRAIN,VAL", default=None,
        help="stamp the deterministic train/val/test split with these "
        "fractions (e.g. 0.8,0.1; test takes the rest); packed bins "
        "become split-pure",
    )
    p.add_argument(
        "--decon-eval", metavar="PARQUET", default=None,
        help="switch on decontamination: drop survivors sharing any "
        "n-gram with this eval corpus (parquet with a text column)",
    )
    p.add_argument("--decon-ngram", type=int, default=5)
    p.add_argument(
        "--sample-alpha", type=float, default=None,
        help="switch on temperature-based language rebalancing with "
        "this alpha (q_l ~ p_l^alpha; smallest language keeps 100%%)",
    )
    p.add_argument(
        "--export-jsonl", metavar="DEST", default=None,
        help="after --curate (or its no-op resume), export the latest "
        "packed chunks as JSONL to DEST",
    )
    p.add_argument(
        "--export-cumulative", action="store_true",
        help="with --export-jsonl: export the whole base + increments "
        "chain's packed chunks (run_id column added), not just the "
        "latest run's",
    )
    p.add_argument("--output", required=True, help="output/checkpoint dir")
    p.add_argument("--run-id", required=True, help="unique id for this run")
    p.add_argument(
        "--partitions", type=int, default=None,
        help="force a salted repartition to this many partitions "
        "(default: reuse scan/dedup partitioning)",
    )
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--report", help="also render the HTML report here")
    p.add_argument("--no-manifest", action="store_true")
    p.add_argument(
        "--pages-table", metavar="PARQUET",
        help="pages table supplying payloads for --input-urls",
    )
    return p


def _blocked_domains_arg(value: str | None, spark):
    """--blocked-domains: a parquet path loads as a DataFrame
    blocklist; anything else parses as a comma list, whitespace-
    stripped with empties dropped — "a.com, b.com" must block b.com
    (a leading space survives run_curation's lower()/lstrip(".")
    normalization and matches no real host, silently half-disabling
    a safety filter)."""
    if not value:
        return None
    if os.path.isdir(value) or value.endswith(".parquet"):
        return spark.read.parquet(value)
    return [d.strip() for d in value.split(",") if d.strip()]


def main(argv: list[str] | None = None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.increment and not args.curate:
        parser.error("--increment requires --curate (it selects how "
                     "the curation job treats --input)")
    if args.export_cumulative and not args.export_jsonl:
        # the flag only parameterizes the JSONL export; silently
        # running the whole curation and exporting nothing would be
        # discovered only after the job completed
        parser.error("--export-cumulative has no effect without "
                     "--export-jsonl DEST")
    if args.report and args.no_manifest:
        # the report is rendered FROM the manifest; catching this after
        # the pipeline already ran would waste the whole job
        parser.error("--report requires the manifest; drop --no-manifest")
    if args.quality_min_chars is None and (
        args.quality_max_chars is not None
        or args.quality_dup_bigram_max is not None
    ):
        # the gate is keyed on --quality-min-chars; silently ignoring
        # the other quality flags would run an uncurated corpus the
        # user believed was gated (round-4 advice)
        parser.error(
            "--quality-max-chars / --quality-dup-bigram-max have no "
            "effect without --quality-min-chars (the gate switch)"
        )
    if args.semdedup_embeddings is not None and args.semdedup_tau is None:
        # same rule as the quality flags: a provider without the stage
        # switch would silently run an un-semdeduped corpus
        parser.error(
            "--semdedup-embeddings has no effect without "
            "--semdedup-tau (the stage switch)"
        )
    if args.vacuum_curation is not None:
        # pure snapshot-layer maintenance: no Spark session needed
        from .curation import vacuum_curation

        t0 = time.monotonic()
        snap = vacuum_curation(args.output, keep_last=args.vacuum_curation)
        print(json.dumps({"vacuumed_snapshot": snap,
                          "wall_sec": round(time.monotonic() - t0, 3)}))
        return 0
    from .corpus import pages_df
    from .pipeline import run_pipeline
    from .session import get_spark

    spark = get_spark(f"dsocr-{args.run_id}")
    t0 = time.monotonic()
    if args.compact:
        from .operators.resume import compact

        snap = compact(spark, args.output)
        print(json.dumps({"compacted_snapshot": snap,
                          "wall_sec": round(time.monotonic() - t0, 3)}))
        spark.stop()
        return 0
    if args.compact_curation:
        from .curation import compact_curation

        info = compact_curation(spark, args.output, run_id=args.run_id)
        print(json.dumps({"compacted_curation": info,
                          "wall_sec": round(time.monotonic() - t0, 3)}))
        spark.stop()
        return 0
    if args.audit_curation:
        from .curation import audit_curation_chain

        v = audit_curation_chain(spark, args.output)
        n = v.count()
        sample = [r.asDict() for r in v.limit(20).collect()]
        print(json.dumps({"audit_violations": n, "sample": sample,
                          "wall_sec": round(time.monotonic() - t0, 3)}))
        spark.stop()
        # non-zero exit on violations: cron/orchestrator-friendly
        return 1 if n else 0
    if args.curate:
        if not args.input:
            raise SystemExit("--curate requires --input (an extraction "
                             "output dir)")
        from .curation import run_curation
        from .pipeline import read_extracted

        split_fracs = None
        if args.split is not None:
            try:
                tr, va = (float(x) for x in args.split.split(","))
            except ValueError:
                raise SystemExit(
                    "--split expects TRAIN,VAL fractions, e.g. 0.8,0.1"
                )
            split_fracs = (tr, va)
        info = run_curation(
            spark,
            read_extracted(spark, args.input),
            args.output,
            run_id=args.run_id,
            incremental=args.increment,
            chunk_size=args.chunk_size,
            chunk_stride=args.chunk_stride,
            pack_target=args.pack_target,
            canonicalize_urls=args.canonicalize_urls,
            blocked_domains=_blocked_domains_arg(
                args.blocked_domains, spark
            ),
            quality_min_chars=args.quality_min_chars,
            quality_max_chars=args.quality_max_chars,
            quality_dup_bigram_max=(
                0.05 if args.quality_dup_bigram_max is None
                else args.quality_dup_bigram_max
            ),
            domain_cap=args.domain_cap,
            remove_spans_min_docs=args.remove_spans_min_docs,
            span_ngram=args.span_ngram,
            segment_dedup_n=args.segment_dedup_n,
            semdedup_tau=args.semdedup_tau,
            semdedup_embeddings=(
                spark.read.parquet(args.semdedup_embeddings)
                if args.semdedup_embeddings else None
            ),
            decon_eval=(
                spark.read.parquet(args.decon_eval)
                if args.decon_eval else None
            ),
            decon_ngram=args.decon_ngram,
            lm_quality_drop_z=args.lm_quality_drop_z,
            cluster_alpha=args.cluster_alpha,
            sample_alpha=args.sample_alpha,
            split_fracs=split_fracs,
        )
        if args.export_jsonl:
            from .curation import export_packed_jsonl

            info["exported_chunks"] = export_packed_jsonl(
                spark, args.output, args.export_jsonl,
                cumulative=args.export_cumulative,
            )
            info["export_path"] = args.export_jsonl
        info["wall_sec"] = round(time.monotonic() - t0, 3)
        print(json.dumps(info))
        spark.stop()
        return 0
    if args.synthetic:
        pages = pages_df(spark, args.synthetic, seed=args.seed)
    elif args.input_warc:
        from .sources.warc import read_warc

        pages = read_warc(spark, args.input_warc)
    elif args.input_jsonl:
        from .sources.jsonl import read_jsonl_pages

        pages = read_jsonl_pages(spark, args.input_jsonl)
    elif args.input_urls:
        if not args.pages_table:
            raise SystemExit("--input-urls requires --pages-table")
        from .sources.urllist import pages_for_url_list

        pages = pages_for_url_list(
            spark, args.input_urls, spark.read.parquet(args.pages_table)
        )
    else:
        from .sources.normalize import normalize_pages

        # arbitrary pages tables drift from the canonical schema
        # (missing optionals, string html, epoch timestamps) —
        # normalize once at the boundary
        pages = normalize_pages(spark.read.parquet(args.input))
    info = run_pipeline(
        spark,
        pages,
        args.output,
        run_id=args.run_id,
        num_partitions=args.partitions,
        write_manifest=not args.no_manifest,
    )
    info["wall_sec"] = round(time.monotonic() - t0, 3)

    if args.report:
        from .pipeline import read_extracted
        from .report import write_report

        manifest_path = info.get("manifest_path")
        if manifest_path is None:
            # skip-empty resubmission: run_pipeline committed nothing and
            # returned manifest_path=None; the manifest from the prior
            # committed run persists at out_dir/manifest — render from it
            # rather than crashing on spark.read.parquet(None).
            prior = os.path.join(args.output, "manifest")
            if os.path.isdir(prior):
                manifest_path = prior
        if manifest_path is not None:
            manifest = spark.read.parquet(manifest_path)
            write_report(
                manifest, read_extracted(spark, args.output), args.report
            )
            info["report_path"] = args.report
        else:
            info["report_path"] = None
            info["report_skipped"] = "no manifest exists yet for this out dir"

    print(json.dumps(info))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
