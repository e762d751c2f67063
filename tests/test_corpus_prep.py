"""End-to-end fused corpus-prep plan (plans/corpus_prep.py): redact →
paragraph dedup → MinHash dedup → decontaminate → stratified sample →
pack, with the scan-count bound asserted on the executed plans and every
stage's survivor count pinned (md5-deterministic pipeline → exact values
at sf0.001)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from metadatadocumentparser_spark.plans import corpus_prep, file_scan_count

SF_DOCS = "/root/testdata/sf0.001/documents.parquet"


def _run(spark):
    docs = spark.read.parquet(SF_DOCS)
    bench = docs.where(F.col("doc_id") % 97 == 0)
    # rates AND default_rate passed EXPLICITLY: rates=None/{} means
    # "default_rate for every stratum" and default_rate defaults to 1.0
    # (keep-all — downsampling is opt-in; no magic demo defaults)
    return corpus_prep(
        docs, bench, rates={"en": 0.8, "de": 0.5}, default_rate=0.3,
        capacity=1200, n_shards=8,
    )


def test_corpus_prep_pinned_counts(spark):
    out = _run(spark)
    stats = out["stats"].collect()[0].asDict()
    # deterministic end-to-end survivor counts (md5 decisions everywhere)
    assert stats == {
        "n_input": 500,
        "n_paras_deduped": 0,  # synth docs are single-paragraph
        "n_after_para": 500,
        "n_quality_dropped": 0,
        "n_classifier_dropped": 0,
        "n_after_dedup": 474,
        "n_contaminated": 225,
        "n_final": 121,
        "n_substr_removed": 0,
    }
    packed = out["packed"].localCheckpoint(eager=True)
    assert packed.count() == 8
    assert packed.agg(F.sum("n_docs")).collect()[0][0] == 121
    assert packed.agg(F.sum("total_tokens")).collect()[0][0] == 5404
    assert packed.where("oversize").count() == 0

    # exactly-once: packed membership == the survivor id set
    packed_ids = sorted(
        i for r in packed.select("ids").collect() for i in r.ids
    )
    survivor_ids = sorted(r.id for r in out["docs"].select("id").collect())
    assert packed_ids == survivor_ids

    # sanity on the raw corpus (sf0.001 plants no PII — see the dedicated
    # redaction-order test below)
    email = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
    texts = [r.text for r in out["docs"].select("text").collect()]
    assert not any(email.search(t) for t in texts)


def test_corpus_prep_empty_rates_keeps_all(spark):
    """rates={} (or None) with default_rate=1.0 is KEEP-ALL: every doc
    surviving dedup+decontamination reaches the output. Regression for
    the `rates or {...demo...}` bug that silently downsampled en to 0.8
    when a caller explicitly asked for no overrides (ADVICE r4, high)."""
    docs = spark.read.parquet(SF_DOCS)
    bench = docs.where(F.col("doc_id") % 97 == 0)
    for rates in ({}, None):
        stats = corpus_prep(
            docs, bench, rates=rates, default_rate=1.0, capacity=1200, n_shards=8
        )["stats"].collect()[0]
        assert stats.n_final == stats.n_after_dedup - stats.n_contaminated


def test_corpus_prep_substr_stage(spark):
    """substr_k: the ExactSubstr pass inside the fused pipeline — a
    planted cross-doc 12-token run (below the paragraph grain, invisible
    to paradedup; docs otherwise distinct, invisible to MinHash) is cut
    from EVERY surviving doc; tokens counted in n_substr_removed; the
    zero-file-scan bound still holds on all three outputs."""
    docs = spark.read.parquet(SF_DOCS)
    run = " ".join(f"pl{i}" for i in range(12))
    planted = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0, F.concat(F.col("text"), F.lit(" " + run))
        ).otherwise(F.col("text")).alias("text"),
        "lang",
    )
    bench = docs.limit(0)
    out = corpus_prep(
        planted, bench, rates={}, default_rate=1.0, capacity=1200, n_shards=8,
        substr_k=12,
    )
    stats = out["stats"].collect()[0]
    texts = {r.id: r.text for r in out["docs"].collect()}
    assert stats.n_substr_removed >= 12 * 50  # many planted copies cut
    assert not any(run in t for t in texts.values())
    # control: disabled stage reports 0 and leaves the run in place
    off = corpus_prep(
        planted, bench, rates={}, default_rate=1.0, capacity=1200, n_shards=8
    )
    assert off["stats"].collect()[0].n_substr_removed == 0
    assert any(run in r.text for r in off["docs"].collect())
    for key in ("docs", "packed", "stats"):
        assert file_scan_count(out[key]) == 0


def test_classifier_seam(spark):
    """operators/classifier.py: the heuristic default evaluates as NATIVE
    expressions (no Python stage in the plan) and matches docs_textstats'
    columns; a fake TextClassifier's batch scores flow through the
    mapInPandas path verbatim."""
    from metadatadocumentparser_spark.functions import textstats
    from metadatadocumentparser_spark.operators.classifier import (
        TextClassifier,
        classify_documents,
    )

    docs = spark.read.parquet(SF_DOCS).where(F.col("doc_id") < 50)

    # native path: no Python evaluation nodes in the executed plan
    nat = classify_documents(docs, "doc_id", "text")
    plan = nat._jdf.queryExecution().executedPlan().toString()
    assert "InPandas" not in plan and "ArrowEval" not in plan and "BatchEval" not in plan
    exp = docs.select(
        F.col("doc_id").alias("id"),
        textstats.lang_id(F.col("text")).alias("lang_pred"),
        textstats.quality_score(F.col("text")).alias("quality"),
    )
    assert sorted(map(tuple, nat.collect())) == sorted(map(tuple, exp.collect()))

    class FakeModel(TextClassifier):
        def classify(self, texts):
            return [
                ("xx" if len(t) % 2 else "en", (len(t) % 10) / 10.0) for t in texts
            ]

    got = {r.id: (r.lang_pred, r.quality) for r in
           classify_documents(docs, "doc_id", "text", FakeModel()).collect()}
    exp2 = {r.doc_id: ("xx" if len(r.text) % 2 else "en", (len(r.text) % 10) / 10.0)
            for r in docs.collect()}
    assert got == exp2

    # batch-size contract violation fails loudly
    class BadModel(TextClassifier):
        def classify(self, texts):
            return [("en", 1.0)]

    with pytest.raises(Exception, match="results"):
        classify_documents(docs, "doc_id", "text", BadModel()).collect()

    # non-bigint id columns survive the model path (r5 review: the
    # mapInPandas schema used to hardcode 'id bigint')
    sdocs = docs.select(
        F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("doc_id"),
        "text",
    )
    srows = classify_documents(sdocs, "doc_id", "text", FakeModel()).collect()
    assert len(srows) == docs.count()
    assert all(r.id.startswith("doc-") for r in srows)


def test_corpus_prep_classifier_gate(spark):
    """quality_min + quality_model in the fused pipeline: the pipeline
    consumes EXTERNAL model scores — docs the fake model scores low are
    dropped (counted in n_classifier_dropped) and never reach packing;
    the heuristic default gate also runs driver-green."""
    from metadatadocumentparser_spark.operators.classifier import TextClassifier

    docs = spark.read.parquet(SF_DOCS)
    bench = docs.limit(0)

    class IdGate(TextClassifier):
        """Deterministic external scores: quality derived from the text's
        first token count parity — low for docs whose text length % 3 == 0."""

        def classify(self, texts):
            return [("en", 0.1 if len(t) % 3 == 0 else 0.9) for t in texts]

    out = corpus_prep(
        docs, bench, rates={}, default_rate=1.0, capacity=1200, n_shards=8,
        quality_min=0.5, quality_model=IdGate(),
    )
    stats = out["stats"].collect()[0]
    lens = [len(r.text) for r in docs.select("text").collect()]
    n_low = sum(1 for x in lens if x % 3 == 0)
    assert stats.n_classifier_dropped == n_low > 0
    # dropped docs are absent from survivors and packs
    surv_ids = {r.id for r in out["docs"].select("id").collect()}
    low_ids = {r.doc_id for r in docs.collect() if len(r.text) % 3 == 0}
    assert not (surv_ids & low_ids)
    # heuristic default (quality_model=None): gate still runs, scores from
    # the native expressions; a min of 0 keeps everyone
    st0 = corpus_prep(
        docs, bench, rates={}, default_rate=1.0, capacity=1200, n_shards=8,
        quality_min=0.0,
    )["stats"].collect()[0]
    assert st0.n_classifier_dropped == 0


def test_corpus_prep_redacts_before_hashing(spark):
    """Redaction runs FIRST: with PII planted into every doc, every
    survivor's released text carries the mask token and no raw email
    survives anywhere downstream of the staging checkpoint."""
    docs = spark.read.parquet(SF_DOCS).select(
        "doc_id",
        F.concat(F.lit("contact bob@example.com now "), F.col("text")).alias("text"),
        "lang",
    )
    bench = docs.where(F.col("doc_id") % 97 == 0)
    out = corpus_prep(docs, bench, capacity=1200, n_shards=8)
    email = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
    texts = [r.text for r in out["docs"].select("text").collect()]
    assert texts and all("<EMAIL>" in t for t in texts)
    assert not any(email.search(t) for t in texts)


def test_corpus_prep_normalize_stage(spark):
    """normalize_form='NFC': planted decomposed accents are composed
    BEFORE any hashing, so byte-different spellings of the same text
    dedup together; the zero-file-scan output bound still holds."""
    base = spark.read.parquet(SF_DOCS).where(F.col("doc_id") < 40)
    composed, decomposed = "caf\u00e9 ", "cafe\u0301 "  # byte-different, NFC-equal
    # doc 2k and 2k+1 carry the SAME underlying text, spelled composed vs
    # decomposed — without NFC they are byte-distinct documents
    paired = base.select(
        "doc_id",
        F.concat(
            F.when(F.col("doc_id") % 2 == 0, F.lit(composed)).otherwise(
                F.lit(decomposed)
            ),
            F.lit("pair text body shared words here number "),
            (F.col("doc_id") / 2).cast("int").cast("string"),
        ).alias("text"),
        "lang",
    )
    bench = paired.limit(0)
    out = corpus_prep(
        paired, bench, rates={}, default_rate=1.0, capacity=1200,
        n_shards=8, normalize_form="NFC",
    )
    stats = out["stats"].collect()[0]
    # with NFC each odd doc's single paragraph becomes byte-equal to its
    # even partner's, so the C4 span-dedup stage (which runs before
    # MinHash) already removes all 20 decomposed copies; MinHash then
    # collapses the 20 survivors (identical but for a trailing number)
    # into one cluster keeper — all md5-deterministic
    assert stats.n_input == 40 and stats.n_paras_deduped == 20
    assert stats.n_after_para == 20 and stats.n_after_dedup == 1
    assert file_scan_count(out["docs"]) == 0
    texts = [r.text for r in out["docs"].select("text").collect()]
    # NFC composes: the combining acute never survives, composed e-acute does
    assert texts and all("caf\u00e9" in t and "\u0301" not in t for t in texts)

    # control: WITHOUT normalization the spellings stay byte-distinct and
    # no paragraph dedups away — the drop above is attributable to NFC
    ctrl = corpus_prep(
        paired, bench, rates={}, default_rate=1.0, capacity=1200, n_shards=8
    )["stats"].collect()[0]
    assert ctrl.n_paras_deduped == 0 and ctrl.n_after_para == 40


def test_corpus_prep_scan_bound(spark):
    """The whole chain reads the corpus parquet exactly once (the staging
    checkpoint); the final outputs' executed plans contain ZERO file
    scans — the bound that makes this one pipeline, not six jobs."""
    out = _run(spark)
    assert file_scan_count(out["docs"]) == 0
    assert file_scan_count(out["packed"]) == 0
    assert file_scan_count(out["stats"]) == 0


def test_corpus_prep_quality_gate(spark):
    """repetition_max gates Gopher-repetitive docs on the RELEASED text:
    planted all-duplicate-word docs drop before dedup; with the gate off
    they survive to the dedup stage."""
    base = spark.read.parquet(SF_DOCS).where(F.col("doc_id") < 30)
    spam = spark.createDataFrame(
        [(1000 + i, "spam " * 40 + f"tail{i}", "en") for i in range(5)],
        "doc_id bigint, text string, lang string",
    )
    docs = base.select("doc_id", "text", "lang").unionByName(spam)
    bench = docs.limit(0)
    gated = corpus_prep(
        docs, bench, rates={}, default_rate=1.0, capacity=1200, n_shards=8,
        repetition_max={"dup_word_e4": 9000},
    )
    st = gated["stats"].collect()[0]
    # the 5 planted spam docs (dup_word ≈ 0.95) must all gate out;
    # synthetic base docs may trip it too — assert the floor, not equality
    assert st.n_input == 35 and st.n_quality_dropped >= 5
    ids = {r.id for r in gated["docs"].select("id").collect()}
    assert not any(i >= 1000 for i in ids)
    # gate off: the spam docs reach (and near-dup among) the dedup stage
    off = corpus_prep(
        docs, bench, rates={}, default_rate=1.0, capacity=1200, n_shards=8
    )["stats"].collect()[0]
    assert off.n_quality_dropped == 0


def test_corpus_prep_with_vocab(spark):
    """vocab= plugs real WordPiece counts into packing: survivors carry
    token ids, pack totals equal the summed real counts, and every
    packed id is a survivor exactly once."""
    from metadatadocumentparser_spark.operators.tokenize import build_char_vocab

    docs = spark.read.parquet(SF_DOCS)
    bench = docs.where(F.col("doc_id") % 97 == 0)
    cv = build_char_vocab(docs, "text")
    out = corpus_prep(docs, bench, capacity=1200, n_shards=8, vocab=cv)
    surv = out["docs"]
    assert {"ids", "n_tokens"} <= set(surv.columns)
    # real counts: n_tokens == len(ids) everywhere, no UNKs possible
    bad = surv.where(F.size("ids") != F.col("n_tokens")).count()
    assert bad == 0
    packed = out["packed"].localCheckpoint(eager=True)
    total_packed = packed.agg(F.sum("total_tokens")).collect()[0][0]
    total_surv = surv.agg(F.sum("n_tokens")).collect()[0][0]
    assert total_packed == total_surv
    packed_ids = sorted(i for r in packed.select("ids").collect() for i in r.ids)
    assert packed_ids == sorted(r.id for r in surv.select("id").collect())
