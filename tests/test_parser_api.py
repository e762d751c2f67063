"""TranscriptExtractor facade: the reference's call shapes work unchanged."""

from __future__ import annotations

import json

from metadatadocumentparser_spark import synth
from metadatadocumentparser_spark.parser_api import TranscriptExtractor


def test_facade_parse_and_export(spark, tmp_path):
    df = spark.createDataFrame(synth.synth_local(8, 4), schema=synth.TRANSCRIPT_DDL)
    p = TranscriptExtractor(df, footer_margin=50, header_margin=50,
                            fast_column_detection=True)

    # default parse: formulas gated off like the reference default
    outs = p.parse()
    assert outs["formulas"].count() == 0
    assert outs["blocks"].count() > 0

    outs = p.parse(extract_formulas=True, strict_mode=False)
    assert outs["formulas"].count() > 0

    toon = p.export(outs, format="toon").first().toon
    assert "metadata:" in toon
    j = json.loads(p.export(outs, format="json").first().json)
    assert "metadata" in j

    cmp = p.compare_extraction_methods()
    assert set(cmp["text_extraction"]) == {"pymupdf", "pdfplumber"}

    n = p.save_images(outs, str(tmp_path / "imgs"))
    assert n == outs["images"].count()

    viz = p.visualize_columns(n_turns=2)
    assert len(viz) == 2

    d = {"metadata": {"title": "t"}, "text_blocks": []}
    r = p.compare_export_formats(d)
    assert "best_format" in r


def test_sql_views_surface(spark):
    """register_extraction_views makes every output table spark.sql()-able
    and the SQL results equal the DataFrame results."""
    from metadatadocumentparser_spark.plans import extract_all, register_extraction_views
    from metadatadocumentparser_spark.synth import synth_df

    outs = extract_all(synth_df(spark, n_convs=6))
    names = register_extraction_views(outs, prefix="x_")
    assert set(names) == {f"x_{k}" for k in outs}
    sql_counts = {
        r.layout: r.cnt
        for r in spark.sql(
            "SELECT coalesce(column_layout, 'none') AS layout, count(*) AS cnt "
            "FROM x_turns GROUP BY 1"
        ).collect()
    }
    from pyspark.sql import functions as F

    df_counts = {
        r.layout: r.cnt
        for r in outs["turns"]
        .groupBy(F.coalesce("column_layout", F.lit("none")).alias("layout"))
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert sql_counts == df_counts and sql_counts
