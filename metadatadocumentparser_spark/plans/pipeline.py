"""The flagship extraction plan (the reference parse(), distributed).

    read transcripts
      → repartition(conv_id, turn_idx)        # turn-level keys ⇒ no conv skew
      → structural parse kernel (mapInPandas) # the ONE Python stage
      → native classify / score / LaTeX / boilerplate tree
      → exploded output tables (blocks, formulas, images, tables, meta,
        segments) + per-turn main-content text with char spans

Everything after the kernel is whole-stage-codegen'd Catalyst. The only
shuffles are (a) the explicit turn-level repartition before the kernel and
(b) per-(conv,turn) windows for order-sensitive indexes (W6) and the HTML
segment tree — both keyed by (conv_id, turn_idx), never by conv_id alone,
so one 10^6-turn conversation spreads over the whole cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.boilerplate import is_content
from ..functions.classify import classify_block_type
from ..functions.formula import formula_score_cols, is_formula_candidate, stripped_text
from ..functions.htmlmeta import html_author, html_date, html_title
from ..functions.latex import latex_heuristic
from ..kernels import PARSED_DDL, make_parse_kernel

_TURN_KEY = ("conv_id", "turn_idx")


def parse_transcripts(
    df: DataFrame,
    text_method: str = "pymupdf",
    layout_aware: bool = True,
    column_aware: bool = True,
    header_margin: float = 50,
    footer_margin: float = 50,
    table_method: str = "camelot",
    num_partitions: int | None = None,
    repartition: bool = True,
) -> DataFrame:
    """Raw transcripts → parsed nested rows (kernel output)."""
    if repartition:
        n = num_partitions or df.sparkSession.sparkContext.defaultParallelism * 2
        df = df.repartition(n, *_TURN_KEY)
    kernel = make_parse_kernel(
        text_method=text_method,
        layout_aware=layout_aware,
        column_aware=column_aware,
        header_margin=header_margin,
        footer_margin=footer_margin,
        table_method=table_method,
    )
    return df.mapInPandas(kernel, schema=PARSED_DDL)


def blocks_of(parsed: DataFrame) -> DataFrame:
    """Exploded text blocks with native block-type classification (F1)."""
    b = parsed.select(*_TURN_KEY, F.explode("blocks").alias("b"))
    return b.select(
        *_TURN_KEY,
        F.col("b.block_idx").alias("block_idx"),
        F.col("b.page_num").alias("page_num"),
        F.col("b.bbox").alias("bbox"),
        F.col("b.text").alias("text"),
        F.col("b.font_size").alias("font_size"),
        F.col("b.font_name").alias("font_name"),
        classify_block_type(
            F.col("b.bbox"), F.col("b.font_size"), F.col("b.page_height"), F.col("b.needs_classify")
        ).alias("block_type"),
        F.col("b.span_start").alias("span_start"),
        F.col("b.span_end").alias("span_end"),
    )


def formulas_of(parsed: DataFrame, strict_mode: bool = False) -> DataFrame:
    """Formula stage (formula.py:17-169), fully native: P7/P8 filters,
    F2 score, F5 LaTeX, W6 running formula_index via row_number over the
    block order within each turn."""
    b = parsed.select(*_TURN_KEY, F.explode("blocks").alias("b"))
    t = stripped_text(F.col("b.text"))
    b = b.select(
        *_TURN_KEY,
        F.col("b.block_idx").alias("block_idx"),
        F.col("b.page_num").alias("page_num"),
        F.col("b.bbox").alias("bbox"),
        F.col("b.font_size").alias("font_size"),
        t.alias("ftext"),
    ).where(is_formula_candidate(F.col("ftext")))
    score, confidence, passes = formula_score_cols(
        F.col("ftext"), F.col("font_size"), strict_mode
    )
    w = Window.partitionBy(*_TURN_KEY).orderBy("block_idx")
    return (
        b.where(passes)
        .withColumn("formula_index", F.row_number().over(w) - 1)
        .select(
            *_TURN_KEY,
            "formula_index",
            "page_num",
            "bbox",
            F.col("ftext").alias("formula_text"),
            latex_heuristic(F.col("ftext")).alias("latex"),
            confidence.alias("confidence"),
        )
    )


def images_of(parsed: DataFrame) -> DataFrame:
    i = parsed.select(*_TURN_KEY, F.explode("images").alias("i"))
    return i.select(*_TURN_KEY, "i.*")


def tables_of(parsed: DataFrame) -> DataFrame:
    t = parsed.select(*_TURN_KEY, F.explode("tables").alias("t"))
    return t.select(*_TURN_KEY, "t.*")


def meta_of(parsed: DataFrame) -> DataFrame:
    """Document metadata; HTML turns get DOM-heuristic title/author/date
    (native regexp_extract) in place of the trailer fields."""
    return parsed.select(
        *_TURN_KEY,
        F.when(F.col("is_html"), html_title(F.col("text")))
        .otherwise(F.col("meta.title"))
        .alias("title"),
        F.when(F.col("is_html"), html_author(F.col("text")))
        .otherwise(F.col("meta.author"))
        .alias("author"),
        F.col("meta.subject").alias("subject"),
        F.col("meta.creator").alias("creator"),
        F.col("meta.producer").alias("producer"),
        F.when(F.col("is_html"), html_date(F.col("text")))
        .otherwise(F.col("meta.creation_date"))
        .alias("creation_date"),
        F.col("meta.modification_date").alias("modification_date"),
        F.col("meta.num_pages").alias("num_pages"),
        F.col("meta.file_size").alias("file_size"),
        F.col("meta.page_sizes").alias("page_sizes"),
    )


def segments_of(parsed: DataFrame) -> DataFrame:
    """HTML segments with the native boilerplate decision tree: prev/next
    features via lag/lead over seg_idx within each turn."""
    s = parsed.where(F.col("is_html")).select(*_TURN_KEY, F.explode("segments").alias("s"))
    s = s.select(*_TURN_KEY, "s.*")
    w = Window.partitionBy(*_TURN_KEY).orderBy("seg_idx")
    return s.withColumn(
        "is_content",
        is_content(
            F.col("words"),
            F.col("link_density"),
            F.lag("words", 1, 0).over(w),
            F.lag("link_density", 1, 0.0).over(w),
            F.lead("words", 1, 0).over(w),
            F.col("boiler_container"),
        ),
    )


def turns_of(parsed: DataFrame, segments: DataFrame | None = None) -> DataFrame:
    """Per-turn main-content text + char spans (the north-rule equality
    surface). PDF turns come straight from the kernel; HTML turns are
    assembled natively from content segments (sorted by seg_idx inside an
    array_sort — never relying on shuffle order)."""
    pdf_turns = parsed.where(~F.col("is_html")).select(
        *_TURN_KEY, "extracted_text", "spans", "column_layout"
    )
    segs = segments if segments is not None else segments_of(parsed)
    html_agg = (
        segs.where(F.col("is_content"))
        .groupBy(*_TURN_KEY)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("seg_idx", "text", "start", F.col("end")))
            ).alias("cs")
        )
        .select(
            *_TURN_KEY,
            F.array_join(F.transform("cs", lambda x: x["text"]), "\n\n").alias("extracted_text"),
            F.transform(
                "cs", lambda x: F.struct(x["start"].alias("start"), x["end"].alias("end"))
            ).alias("spans"),
        )
    )
    html_turns = (
        parsed.where(F.col("is_html"))
        .select(*_TURN_KEY)
        .join(html_agg, list(_TURN_KEY), "left")
        .select(
            *_TURN_KEY,
            F.coalesce(F.col("extracted_text"), F.lit("")).alias("extracted_text"),
            F.coalesce(
                F.col("spans"),
                F.expr("CAST(array() AS array<struct<start:int,`end`:int>>)"),
            ).alias("spans"),
            F.lit(None).cast("string").alias("column_layout"),
        )
    )
    return pdf_turns.unionByName(html_turns)


def extract_all(df: DataFrame, strict_mode: bool = False, **parse_kwargs) -> dict:
    """Full parse() analogue: returns dict of output DataFrames sharing one
    parsed intermediate (cache it for multi-output materialization)."""
    parsed = parse_transcripts(df, **parse_kwargs)
    segments = segments_of(parsed)
    return {
        "parsed": parsed,
        "turns": turns_of(parsed, segments),
        "blocks": blocks_of(parsed),
        "formulas": formulas_of(parsed, strict_mode=strict_mode),
        "images": images_of(parsed),
        "tables": tables_of(parsed),
        "meta": meta_of(parsed),
        "segments": segments,
    }
