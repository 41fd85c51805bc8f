"""Round-3 text operators: pins for the rows-only compression-ratio
signal (no DuckDB twin) and the NFC/url-canonicalization gates
actually firing."""

from __future__ import annotations

import zlib

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_compression_ratio_matches_pure_python(spark):
    from distributed_system___ocr_spark.plans.textops3 import (
        quality_compression_ratio,
    )

    rows = {r["doc_id"]: r for r in
            quality_compression_ratio(spark, SF).collect()}
    docs = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text").collect() if r["text"]}
    assert set(rows) == set(docs)
    for doc_id in list(docs)[:50]:
        want = len(zlib.compress(docs[doc_id].encode("utf-8"), 6))
        got = rows[doc_id]
        assert got["n_compressed"] == want
        assert abs(
            got["compression_ratio"] - want / len(docs[doc_id])
        ) < 1e-6


def test_compression_ratio_both_branches_fire(spark):
    """A repetition gate that never rejects (or never accepts) is not
    evidence — both is_repetitive branches must occur at test sf."""
    from distributed_system___ocr_spark.plans.textops3 import (
        quality_compression_ratio,
    )

    kinds = {
        r["is_repetitive"]
        for r in quality_compression_ratio(spark, SF)
        .select("is_repetitive").distinct().collect()
    }
    assert kinds == {True, False}


def test_compression_ratio_orders_repetition():
    """The signal itself: repeated text compresses far below prose."""
    prose = ("the committee reviewed seventeen distinct proposals "
             "before narrowing the field to a shortlist of three") * 3
    repetitive = "spam ham " * 40
    r_prose = len(zlib.compress(prose.encode(), 6)) / len(prose)
    r_rep = len(zlib.compress(repetitive.encode(), 6)) / len(repetitive)
    assert r_rep < r_prose / 2


def test_nfc_and_url_gates_fire(spark):
    from distributed_system___ocr_spark.plans.textops3 import (
        canonicalize_urls,
        normalize_text_nfc,
    )

    nfc = normalize_text_nfc(spark, SF)
    assert nfc.filter(F.col("changed")).count() == nfc.count() > 0
    assert nfc.filter(F.col("n_nfc_chars") >= F.col("n_raw_chars")).count() == 0

    urls = canonicalize_urls(spark, SF)
    assert urls.filter(F.col("url_canonical") == F.col("url_raw")).count() == 0
    one = urls.filter(F.col("doc_id") == 3).collect()[0]
    assert one["url_canonical"] == (
        "https://www.src3.example.com/a/c/page3?a=1&m=0&z=2"
    )
    assert one["host"] == "www.src3.example.com"


def test_chunks_tile_documents(spark):
    """Chunks reconstruct the document: stride-aligned concatenation of
    non-overlap prefixes + the final chunk equals the original text."""
    from distributed_system___ocr_spark.plans.textops3 import (
        _CHUNK_STRIDE,
        chunk_documents,
    )

    docs = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(f"{SF}/documents.parquet")
            .filter(F.length("text") > 0)
            .select("doc_id", "text").limit(40).collect()}
    chunks = {}
    for r in chunk_documents(spark, SF).collect():
        chunks.setdefault(r["doc_id"], {})[r["chunk_idx"]] = r["chunk"]
    for doc_id, text in docs.items():
        parts = chunks[doc_id]
        assert sorted(parts) == list(range(len(parts)))
        rebuilt = "".join(
            parts[i][:_CHUNK_STRIDE] for i in range(len(parts) - 1)
        ) + parts[len(parts) - 1]
        assert rebuilt == text, doc_id
        # consecutive chunks overlap by sz - stride chars
        if len(parts) > 1:
            assert parts[0][_CHUNK_STRIDE:] == parts[1][
                : len(parts[0]) - _CHUNK_STRIDE
            ]


def test_packing_bins_are_budgeted_and_stable(spark):
    from distributed_system___ocr_spark.plans.textops3 import (
        _PACK_TARGET,
        pack_docs_greedy,
    )

    rows = pack_docs_greedy(spark, SF).collect()
    again = pack_docs_greedy(spark, SF).collect()
    key = lambda r: (r["lang"], r["doc_id"], r["bin_id"])
    assert sorted(map(key, rows)) == sorted(map(key, again))
    # greedy invariant: a doc's bin is exactly floor(preceding/target),
    # so each bin's first doc starts at cumulative chars within
    # [bin*target, (bin+1)*target)
    from collections import defaultdict

    per_lang = defaultdict(list)
    for r in rows:
        per_lang[r["lang"]].append((r["doc_id"], r["n_chars"], r["bin_id"]))
    for lang, docs in per_lang.items():
        docs.sort()
        cum = 0
        for _, n, b in docs:
            assert b == cum // _PACK_TARGET
            cum += n
    # bin ids are dense from 0 per lang
    by_lang = defaultdict(set)
    for r in rows:
        by_lang[r["lang"]].add(r["bin_id"])
    for lang, ids in by_lang.items():
        assert ids == set(range(len(ids)))


def test_dedup_survivors_exclude_all_clones(spark):
    from distributed_system___ocr_spark.plans.textops3 import (
        _DEDUP_CLONE_OFFSET,
        dedup_keep_representative,
    )

    survivors = {r["doc_id"]
                 for r in dedup_keep_representative(spark, SF).collect()}
    originals = {r["doc_id"] for r in
                 spark.read.parquet(f"{SF}/documents.parquet")
                 .select("doc_id").collect()}
    clones = {i + _DEDUP_CLONE_OFFSET for i in originals if i % 20 == 0}
    assert clones, "no clones injected — gate never fires"
    assert survivors == originals  # every clone dropped, no original lost


def test_decontamination_gate_fires_and_is_sound(spark):
    """Contaminated docs exist at test sf (the corpus's dup-of-earlier
    docs collide with the eval slice) AND every flagged doc really
    shares a 5-gram with an eval doc (no false positives)."""
    from distributed_system___ocr_spark.plans.textops3 import (
        decontaminate_ngram_overlap,
    )

    rows = decontaminate_ngram_overlap(spark, SF).collect()
    flagged = [r for r in rows if r["is_contaminated"]]
    assert flagged, "no contamination at test sf — gate never fires"
    docs = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(f"{SF}/documents.parquet").collect()}

    def grams(text):
        t = [x for x in text.split(" ") if x]
        return {" ".join(t[i:i + 5]) for i in range(len(t) - 4)}

    eval_grams = set()
    for i, text in docs.items():
        if i % 50 == 0:
            eval_grams |= grams(text)
    for r in flagged:
        got = grams(docs[r["doc_id"]]) & eval_grams
        assert len(got) == r["n_overlapping_grams"] > 0
