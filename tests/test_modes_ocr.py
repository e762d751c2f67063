"""Golden equality for the non-default parse modes (pdfplumber word-line
sessionization, simple layout-aware, non-layout-aware, strict formulas) and
the OCR strategy seam (§2.11) + spark-submit job."""

from __future__ import annotations

import json
import os
import subprocess
import sys

from metadatadocumentparser_spark import oracle, synth
from metadatadocumentparser_spark.ocr import DebugOCR, MathpixOCR
from metadatadocumentparser_spark.plans import extract_all

N, HOT = 14, 5


def _rows():
    return synth.synth_local(N, hot_factor=HOT)


def _df(spark):
    return spark.createDataFrame(_rows(), schema=synth.TRANSCRIPT_DDL)


def _turns(df):
    return [
        (r.conv_id, r.turn_idx, r.extracted_text,
         tuple((s.start, s.end) for s in r.spans), r.column_layout)
        for r in df.orderBy("conv_id", "turn_idx").collect()
    ]


def _golden_turns(rows, **kw):
    g = oracle.oracle_corpus(rows, **kw)
    return [
        (t["conv_id"], t["turn_idx"], t["extracted_text"],
         tuple((s["start"], s["end"]) for s in t["spans"]), t["column_layout"])
        for t in g["turns"]
    ]


def _mode_check(spark, **kw):
    got = _turns(extract_all(_df(spark), **kw)["turns"])
    want = _golden_turns(_rows(), **kw)
    assert got == want


def test_pdfplumber_mode(spark):
    _mode_check(spark, text_method="pdfplumber")


def test_simple_layout_mode(spark):
    _mode_check(spark, column_aware=False)


def test_plain_mode(spark):
    _mode_check(spark, layout_aware=False, column_aware=False)


def test_unknown_method_empty(spark):
    outs = extract_all(_df(spark), text_method="nope")
    assert outs["blocks"].count() == 0


def test_strict_formulas(spark):
    rows = _rows()
    outs = extract_all(_df(spark), strict_mode=True)
    got = [
        (r.conv_id, r.turn_idx, r.formula_index, r.formula_text, r.latex, r.confidence)
        for r in outs["formulas"].orderBy("conv_id", "turn_idx", "formula_index").collect()
    ]
    g = oracle.oracle_corpus(rows, strict_mode=True)
    want = [
        (f["conv_id"], f["turn_idx"], f["formula_index"], f["formula_text"],
         f["latex"], f["confidence"])
        for f in g["formulas"]
    ]
    assert got == want
    # strict can only prune (strict-mode-specific rejection is covered by
    # test_units.test_formula_strict_mode on crafted inputs)
    normal = oracle.oracle_corpus(rows, strict_mode=False)
    assert len(want) <= len(normal["formulas"])


def test_ocr_seam(spark):
    outs = extract_all(_df(spark), ocr_strategy=DebugOCR())
    rows = outs["formulas"].limit(5).collect()
    assert rows and all(r.latex.startswith("\\ocr{") for r in rows)
    assert all(r.image_bytes is not None for r in rows)
    # Mathpix path: no network → heuristic fallback (latex unchanged)
    outs2 = extract_all(_df(spark), ocr_strategy=MathpixOCR("id", "key"))
    r2 = outs2["formulas"].limit(3).collect()
    assert all(r.latex.startswith("$") for r in r2)
    req = MathpixOCR("id", "key").build_request(b"png")
    assert req["url"].endswith("/v3/text") and req["timeout"] == 10


def test_spark_submit_job(spark, tmp_path):
    """The north rule's launch path: spark-submit --py-files engine.zip."""
    corpus = str(tmp_path / "corpus")
    out = str(tmp_path / "out")
    df = _df(spark)
    df.repartition(2).write.mode("overwrite").parquet(corpus)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zip_path = str(tmp_path / "engine.zip")
    subprocess.run(
        [sys.executable, "-m", "zipfile", "-c", zip_path,
         os.path.join(repo, "metadatadocumentparser_spark")],
        check=True,
    )
    spark_submit = os.path.join(os.path.dirname(sys.executable), "spark-submit")
    env = dict(os.environ, PYSPARK_PYTHON=sys.executable)
    r = subprocess.run(
        [spark_submit, "--master", "local[2]", "--py-files", zip_path,
         os.path.join(repo, "jobs", "extract.py"),
         "--input", corpus, "--output", out, "--buckets", "3"],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    report = json.loads([l for l in r.stdout.splitlines() if l.startswith("{")][-1])
    assert report["complete"] and len(report["processed"]) == 3
    got = spark.read.parquet(os.path.join(out, "turns"))
    assert got.count() == df.count()


def test_stage_skip_flags(spark):
    """parse() stage flags (parser.py:84-114): a skipped text stage starves
    formulas and leaves column_layout unset; images/tables skip cleanly."""
    outs = extract_all(_df(spark), extract_text=False)
    assert outs["blocks"].count() == 0
    assert outs["formulas"].count() == 0
    t = outs["turns"].limit(5).collect()
    assert all(r.column_layout is None for r in t)
    assert extract_all(_df(spark), extract_images_flag=False)["images"].count() == 0
    assert extract_all(_df(spark), extract_tables_flag=False)["tables"].count() == 0
    # golden-mode: oracle with the same flags agrees
    g = oracle.oracle_corpus(_rows(), extract_images_flag=False)
    assert len(g["images"]) == 0 and len(g["blocks"]) > 0


def test_spark_submit_corpus_prep_job(spark, tmp_path):
    """jobs/corpus_prep.py through real spark-submit --py-files: the
    fused pipeline's three output tables land and the printed stats row
    matches the in-process run's pinned counts (sf0.001: 500→121)."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "cpout")
    bench_path = str(tmp_path / "cpbench")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").where(
        F.col("doc_id") % 97 == 0
    ).write.mode("overwrite").parquet(bench_path)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zip_path = str(tmp_path / "engine2.zip")
    subprocess.run(
        [sys.executable, "-m", "zipfile", "-c", zip_path,
         os.path.join(repo, "metadatadocumentparser_spark")],
        check=True,
    )
    spark_submit = os.path.join(os.path.dirname(sys.executable), "spark-submit")
    env = dict(os.environ, PYSPARK_PYTHON=sys.executable)
    r = subprocess.run(
        [spark_submit, "--master", "local[2]", "--py-files", zip_path,
         os.path.join(repo, "jobs", "corpus_prep.py"),
         "--input", "/root/testdata/sf0.001/documents.parquet",
         "--benchmark", bench_path,
         "--output", out,
         "--rates", "en=0.8,de=0.5", "--default-rate", "0.3",
         "--capacity", "1200", "--shards", "8"],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    stats = json.loads([l for l in r.stdout.splitlines() if l.startswith("{")][-1])
    assert stats["n_input"] == 500
    surv = spark.read.parquet(os.path.join(out, "survivors"))
    packed = spark.read.parquet(os.path.join(out, "packed"))
    assert surv.count() == stats["n_final"]
    assert packed.agg(F.sum("n_docs")).collect()[0][0] == stats["n_final"]
