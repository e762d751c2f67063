"""Corpus-quality and corpus-management operators for LLM training-data
pipelines, beyond the per-doc scalar scores in functions/textstats.py:

- repetition_signals: Gopher-style repetition quality rules (Rae et al.
  2021, "Scaling Language Models: ... Gopher", §A1.1): duplicate-word
  fraction and top-bigram coverage fraction. Repetitive documents are the
  single biggest low-quality class web crawls contribute.
- split_assign: deterministic train/val/test assignment by md5 hash —
  stable under repartitioning, cluster size and re-runs, reproducible in
  any engine (the split must never depend on row order or partitioning).
- decontaminate: benchmark n-gram decontamination — flag corpus docs that
  share any k-shingle with an evaluation set (the overlap check every
  training pipeline runs before shipping data).

Scale notes: repetition explodes tokens/bigrams but aggregates with
map-side partial combine on (id, gram) keys — linear, skew-free (gram
cardinality within a doc is bounded by doc length). split_assign is a
pure projection. decontaminate broadcasts only the BENCHMARK shingle set
(eval sets are small by definition — that broadcast is bounded, unlike
corpus-side tables which are never broadcast here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import half_up_scaled
from .dedup import SHINGLE_K, with_shingles


def repetition_signals(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_tokens, dup_word_e4, top_bigram_e4):
    dup_word = (n_tokens - n_distinct) / n_tokens,
    top_bigram = 2 * count(most frequent bigram) / n_tokens (fraction of
    tokens covered by it); both 0 when undefined (0 tokens / <2 tokens).
    Word stats are array-native (zero shuffle); the bigram mode needs a
    per-(doc, bigram) count — one aggregation keyed by (id, bigram).
    NULL text counts as empty (n_tokens 0, fractions 0 — never NULL)."""
    # no ensure_min_parallelism: like simhash, the bigram partial agg is a
    # cheap count per row — the repartition shuffle costs more than the
    # serial map side saves (see dedup.simhash for the measurement)
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), " "), lambda x: x != ""
    )
    base = df.select(
        F.col(id_col).alias("id"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct"),
        toks.alias("toks"),
    )
    bigrams = base.select(
        "id",
        # Guarded: sequence(1, 0) would DESCEND ([1, 0]) and index toks[-1]/
        # toks[0] on a short array (ANSI INVALID_ARRAY_INDEX); docs with <2
        # tokens simply have no bigrams (explode drops them; left join below
        # restores the row with top_bg NULL → 0).
        F.explode(
            F.expr(
                "CASE WHEN size(toks) >= 2 THEN"
                " transform(sequence(1, size(toks) - 1),"
                " i -> concat(toks[i - 1], ' ', toks[i]))"
                " ELSE array() END"
            )
        ).alias("bg"),
    )
    top = (
        bigrams.groupBy("id", "bg")
        .agg(F.count("*").alias("c"))
        .groupBy("id")
        .agg(F.max("c").alias("top_bg"))
    )
    out = base.drop("toks").join(top, "id", "left")
    dup = F.when(
        F.col("n_tokens") > 0,
        (F.col("n_tokens") - F.col("n_distinct")) / F.col("n_tokens"),
    ).otherwise(F.lit(0.0))
    topf = F.when(
        F.col("n_tokens") > 0,
        F.coalesce(F.col("top_bg"), F.lit(0)) * 2.0 / F.col("n_tokens"),
    ).otherwise(F.lit(0.0))
    return out.select(
        "id",
        "n_tokens",
        half_up_scaled(dup, 4).alias("dup_word_e4"),
        half_up_scaled(topf, 4).alias("top_bigram_e4"),
    )


def repetition_line_signals(
    df: DataFrame, id_col: str, text_col: str, sep: str = "\n"
) -> DataFrame:
    """Gopher §A1.1 within-doc duplicate LINE (or paragraph — pass
    sep='\\n\\n') signals: (id, n_units, dup_unit_e4, dup_unit_char_e4).

    - dup_unit = (n_units - n_distinct) / n_units — the fraction of
      lines/paragraphs that are repeats of an earlier one.
    - dup_unit_char = chars in occurrences AFTER THE FIRST of each
      duplicated unit / total unit chars (separators excluded) — the
      character-mass the repeats add, mirroring dup_word's
      beyond-the-first convention.

    ``sep`` is a literal (regex-quoted, like paragraph_dedup). One
    (id, unit) keyed aggregation — the same linear skew-free shape as the
    bigram pass; unit counts are array-native (no shuffle). NULL text
    counts as one empty unit (zeros — never NULL, never a dropped row)."""
    from .paradedup import _java_regex_quote

    units = F.split(F.coalesce(F.col(text_col), F.lit("")), _java_regex_quote(sep))
    base = df.select(
        F.col(id_col).alias("id"),
        F.size(units).cast("bigint").alias("n_units"),
        F.size(F.array_distinct(units)).cast("bigint").alias("n_distinct"),
        units.alias("units"),
    )
    per_unit = (
        base.select("id", F.explode("units").alias("u"))
        .groupBy("id", "u")
        .agg(F.count("*").alias("c"))
    )
    chars = per_unit.groupBy("id").agg(
        F.sum((F.col("c") - 1) * F.length("u")).cast("bigint").alias("dupc"),
        F.sum(F.col("c") * F.length("u")).cast("bigint").alias("totc"),
    )
    out = base.drop("units").join(chars, "id")
    dup = F.when(
        F.col("n_units") > 0,
        (F.col("n_units") - F.col("n_distinct")) / F.col("n_units"),
    ).otherwise(F.lit(0.0))
    dupc = F.when(
        F.col("totc") > 0, F.col("dupc") / F.col("totc")
    ).otherwise(F.lit(0.0))
    return out.select(
        "id",
        "n_units",
        half_up_scaled(dup, 4).alias("dup_unit_e4"),
        half_up_scaled(dupc, 4).alias("dup_unit_char_e4"),
    )


GOPHER_TOP_NS = (3, 4)
GOPHER_DUP_NS = (5, 6, 10)


def repetition_ngram_signals(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_ns: tuple[int, ...] = GOPHER_TOP_NS,
    dup_ns: tuple[int, ...] = GOPHER_DUP_NS,
) -> DataFrame:
    """The rest of the Gopher §A1.1 repetition suite (repetition_signals
    covers dup-word + top-bigram): per doc,

    - ``top_{n}gram_e4`` (n in top_ns): fraction of token characters
      covered by occurrences of the HEAVIEST n-gram — heaviest = max by
      (count × gram-char-length, gram) so ties break deterministically;
      coverage is positional (overlapping occurrences count a token once).
    - ``dup_{n}gram_e4`` (n in dup_ns): fraction of token characters
      covered by ANY n-gram occurring ≥ 2 times (positional, the published
      "duplicated n-gram character fraction").

    Char accounting uses token characters only (separators excluded from
    numerator and denominator) — unambiguous under repeated whitespace and
    engine-portable. Docs with < n tokens (or 0 chars) score 0 for that n.

    Plan shape (r5 — was 4 shuffles + a corpus-wide token re-explode):
    ONE gram explode for all n (array-side concat of per-n occurrence
    structs) → one (id, n, gram) partial-aggregated count → selected
    occurrences' positions re-aggregated to ONE row per (id, n, signal)
    → coverage and char mass computed ARRAY-SIDE against the doc's token
    array (sequence-expand + distinct + length fold — overlaps counted
    once, exactly the shape the exploded/joined version produced) → one
    conditional agg back to doc grain. Every shuffle keyed by (doc,
    gram) or doc: linear, skew-free (gram cardinality bounded by doc
    length; per-doc position lists bounded by token count)."""
    all_ns = sorted(set(top_ns) | set(dup_ns))
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    base = df.select(F.col(id_col).alias("id"), toks.alias("toks")).withColumn(
        "d",
        F.aggregate(
            "toks", F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
        ),
    )

    # one occurrence array for every n: struct(n, pos, gram)
    per_n = [
        F.expr(
            f"CASE WHEN size(toks) >= {n} THEN"
            f" transform(sequence(0, size(toks) - {n}),"
            f" i -> struct({n} AS n, i AS pos,"
            f" array_join(slice(toks, i + 1, {n}), ' ') AS g))"
            f" ELSE array() END"
        )
        for n in all_ns
    ]
    occ = base.select(
        "id", F.explode(F.flatten(F.array(*per_n))).alias("o")
    ).select("id", F.col("o.n").alias("n"), F.col("o.pos").alias("pos"), F.col("o.g").alias("g"))
    counts = occ.groupBy("id", "n", "g").agg(
        F.count("*").alias("c"), F.collect_list("pos").alias("ps")
    )

    # token chars of the gram = len(g) - (n-1) single separators
    w = (F.col("c") * (F.length("g") - (F.col("n") - 1))).cast("bigint")
    top_sel = (
        counts.where(F.col("n").isin(list(top_ns)))
        .groupBy("id", "n")
        .agg(F.max(F.struct(w.alias("w"), F.col("g"), F.col("ps"))).alias("t"))
        .select("id", "n", F.lit("top").alias("tag"), F.col("t.ps").alias("ps"))
    )
    dup_sel = (
        counts.where(F.col("n").isin(list(dup_ns)) & (F.col("c") >= 2))
        .groupBy("id", "n")
        .agg(F.flatten(F.collect_list("ps")).alias("ps"))
        .select("id", "n", F.lit("dup").alias("tag"), "ps")
    )

    # coverage ARRAY-SIDE: expand each start to its n positions, distinct
    # (overlaps count a token once), then fold the covered tokens'
    # lengths from the doc's own token array — no corpus-wide position
    # explode, no (id, pos) join
    sel = (
        top_sel.unionByName(dup_sel)
        .join(base.select("id", "toks"), "id")
        .select(
            "id", "n", "tag",
            F.aggregate(
                F.array_distinct(
                    F.flatten(
                        F.transform(
                            "ps",
                            lambda p0: F.sequence(p0, p0 + F.col("n") - 1),
                        )
                    )
                ),
                F.lit(0).cast("bigint"),
                lambda acc, p: acc
                + F.length(F.element_at(F.col("toks"), p + 1)),
            ).alias("chars"),
        )
    )
    covered = sel.groupBy("id").agg(
        *[
            F.sum(
                F.when((F.col("n") == n) & (F.col("tag") == "top"), F.col("chars"))
            ).alias(f"_top{n}")
            for n in top_ns
        ],
        *[
            F.sum(
                F.when((F.col("n") == n) & (F.col("tag") == "dup"), F.col("chars"))
            ).alias(f"_dup{n}")
            for n in dup_ns
        ],
    )
    out = base.select("id", "d").join(covered, "id", "left")
    frac = lambda c: F.when(  # noqa: E731
        F.col("d") > 0, F.coalesce(F.col(c), F.lit(0)) / F.col("d")
    ).otherwise(F.lit(0.0))
    return out.select(
        "id",
        *[half_up_scaled(frac(f"_top{n}"), 4).alias(f"top_{n}gram_e4") for n in top_ns],
        *[half_up_scaled(frac(f"_dup{n}"), 4).alias(f"dup_{n}gram_e4") for n in dup_ns],
    )


def split_column(id_col, weights: dict[str, float] | None = None, salt: str = "split"):
    """Deterministic split as a plain Column (composable into any
    projection): u = int(md5(salt:id)[:8], 16) / 2^32 ∈ [0,1), assigned by
    cumulative weight thresholds. md5 (not engine-internal hash) so any
    engine reproduces the identical assignment. The uniform lives in ONE
    place (sampling.sample_uniform) — it is the formula every DuckDB
    oracle mirrors byte-for-byte; two hand-maintained copies would drift."""
    from .sampling import sample_uniform

    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        # the last split takes whatever probability mass remains, so
        # weights that don't sum to 1 silently skew it (r5 review:
        # {.7,.1,.1} gave 'test' 20%, double the request) — fail loudly
        raise ValueError(
            f"split_column: weights must sum to 1, got "
            f"{sum(weights.values())!r} from {weights!r}"
        )
    u = sample_uniform(id_col, salt=salt)
    acc, expr = 0.0, None
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w
        expr = (
            F.when(u < acc, name) if expr is None else expr.when(u < acc, name)
        )
    return expr.otherwise(items[-1][0]) if expr is not None else F.lit(items[-1][0])


def split_assign(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """(id, split) projection of split_column — kept as the table-level API."""
    return df.select(
        F.col(id_col).alias("id"),
        split_column(F.col(id_col), weights, salt).alias("split"),
    )


def decontaminate(
    corpus: DataFrame, benchmark: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, n_hits): corpus docs sharing ≥1 k-shingle (k = SHINGLE_K) with
    the benchmark set, with the count of distinct shared shingles. Docs
    absent from the output are clean. The benchmark shingle set is
    broadcast — eval sets are small by definition; the corpus side streams
    map-side through the broadcast-hash join (no corpus shuffle at all)."""
    bs = with_shingles(benchmark, id_col, text_col).select("shingle").distinct()
    cs = with_shingles(corpus, id_col, text_col)
    return (
        cs.join(F.broadcast(bs), "shingle")
        .groupBy("id")
        .agg(F.count("*").alias("n_hits"))
    )
