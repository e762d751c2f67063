"""N-gram language-model perplexity filtering — the CCNet quality
filter (Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data": score every document with an n-gram LM
and keep the low-perplexity tail), with the model itself built the way
Google built its distributed n-gram LMs (Brants et al. 2007, "Large
Language Models in Machine Translation"): **stupid backoff** — raw
count ratios with a constant backoff multiplier, no discounting, no
normalization — precisely because that estimator needs nothing but
distributed counts, which is what a Spark corpus gives us.

Scoring rule (alpha = 0.4, the published constant; orders 3→1):

    S(w | u v) = c(uvw)/c(uv)            if c(uvw) > 0
               = alpha * S(w | v)        otherwise
    S(w | v)   = c(vw)/c(v)              if c(vw) > 0
               = alpha * S(w)            otherwise
    S(w)       = c(w)/N                  if c(w) > 0
               = 1/N                     otherwise (OOV floor — S must
                                         never be 0 or log blows up)

A token's score starts at the highest order its position allows (the
first token scores S(w), the second S(w|v) — no backoff penalty for
missing context that cannot exist). Doc score = mean of -ln S over its
tokens ("log-perplexity"); lower = more like the training corpus.

Scale shape:
- train: ONE fused gram explode for orders 1..n (the gopher pattern) →
  one (gram) partial-aggregated count per order, min_count-pruned —
  linear shuffles, corpus never collected.
- score: per-token gram projection (array-side, no shuffle) → left
  joins against the count tables (Catalyst broadcasts them when the
  pruned tables are small, sort-merge otherwise — both linear) → one
  per-doc aggregation.
- LMClassifier: the operators/classifier.TextClassifier adapter —
  collects the count tables for closure broadcast behind a fail-loud
  MAX_LM_ENTRIES cap (the MAX_N_LIST pattern); past the cap, use the
  join-based perplexity_score, which never materializes the model on
  the driver.

Cross-engine note: count tables are exact integers (driver-row
oracle-able); ln() is a libm transcendental and may differ in the last
ulp across engines, so perplexity VALUES are pinned by a pure-python
mirror in pytest (tolerance 1e-9), not by the DuckDB hash gate — the
same boundary weighted_sample draws for pow().
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .classifier import TextClassifier

ALPHA = 0.4  # Brants et al. 2007 §3's published backoff constant
MAX_LM_ENTRIES = 2_000_000  # LMClassifier driver-collect cap
_FLUSH_ENTRIES = 2_000_000  # train kernel: emit + reset past this many
#   distinct grams per task (bounds Python memory; duplicates merge in
#   the downstream sum)


def _toks(text_col):
    return F.filter(F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
                    lambda t: t != "")


def train_ngram_lm(
    df: DataFrame,
    text_col: str,
    n: int = 3,
    min_count: int = 1,
) -> dict:
    """Count-based stupid-backoff LM: {"n": n, "total": N tokens,
    "counts": {order: DataFrame (g, c)}} with orders 1..n, each pruned
    to c >= min_count (min_count > 1 shrinks the big orders sharply at
    web scale; order-1 is never pruned — the OOV floor needs exact N
    and the unigram table is vocabulary-bounded anyway)."""
    if n < 1:
        raise ValueError(f"train_ngram_lm: n must be >= 1, got {n}")

    # r6: gram counting is a mapInArrow kernel that PRE-AGGREGATES per
    # task (a Python dict over tuple keys) and emits (k, g, c) partials
    # — the r5 form exploded every gram OCCURRENCE as a joined string
    # (~n·L rows per doc) before the hash aggregate's map side could
    # shrink it; the kernel builds each distinct gram's string once, at
    # emission. Shuffle rows = distinct grams per task (exactly what the
    # partial aggregate shuffled before) and the final groupBy.sum is
    # unchanged, so counts are identical integers. _FLUSH_ENTRIES bounds
    # kernel memory: past the cap the dict is emitted and reset
    # (duplicate partials merge in the sum — pure perf/memory knob).
    # Tokenization: re.split(r'\s+', ..., flags=re.ASCII) == Java \s+
    # (the LMClassifier-documented boundary).
    import pyarrow as pa

    src = df.select(F.coalesce(F.col(text_col), F.lit("")).alias("t"))

    def kernel(batches):
        import re

        acc: dict = {}

        def emit():
            ks = [k for (k, _g) in acc]
            gs = [" ".join(g) for (_k, g) in acc]
            cs = list(acc.values())
            return pa.RecordBatch.from_arrays(
                [
                    pa.array(ks, type=pa.int32()),
                    pa.array(gs, type=pa.string()),
                    pa.array(cs, type=pa.int64()),
                ],
                names=["k", "g", "c"],
            )

        for batch in batches:
            for t in batch.column("t").to_pylist():
                toks = [w for w in re.split(r"\s+", t, flags=re.ASCII) if w]
                L = len(toks)
                for k in range(1, n + 1):
                    for i in range(L - k + 1):
                        key = (k, tuple(toks[i : i + k]))
                        acc[key] = acc.get(key, 0) + 1
            if len(acc) > _FLUSH_ENTRIES:
                yield emit()
                acc = {}
        if acc:
            yield emit()

    from ._util import ensure_min_parallelism

    # factor=1 (one task per core): each extra task re-emits most of the
    # vocabulary as its own partials, so shuffle rows ≈ tasks × vocab —
    # measured 2× faster than the default factor=2 at both 5k and 50k
    # docs with no parallelism lost (one full wave)
    partials = ensure_min_parallelism(src, factor=1).mapInArrow(
        kernel, schema="k int, g string, c bigint"
    )
    counts = partials.groupBy("k", "g").agg(F.sum("c").cast("bigint").alias("c"))
    # prune the higher orders BEFORE the one materialization (order-1 is
    # never pruned — the OOV floor needs exact N), then slice per-order
    # views off the single checkpointed table: one action, not n
    pruned = counts.where(
        (F.col("k") == 1) | (F.col("c") >= int(min_count))
    ).localCheckpoint(eager=True)
    tables = {
        k: pruned.where(F.col("k") == k).select("g", "c") for k in range(1, n + 1)
    }
    total = tables[1].agg(F.sum("c")).collect()[0][0] or 0
    return {"n": n, "total": int(total), "counts": tables}


def _score_expr(total: int):
    """The stupid-backoff CASE over joined counts (columns c3, c2 for
    the bigram, c2x for the bigram CONTEXT, c1, c1x for the unigram
    context; pos for the order a position can start at)."""
    n = F.lit(float(total))
    tri = F.col("c3").isNotNull() & F.col("c2x").isNotNull()
    bi = F.col("c2").isNotNull() & F.col("c1x").isNotNull()
    uni = F.when(
        F.col("c1").isNotNull(), F.col("c1").cast("double") / n
    ).otherwise(F.lit(1.0) / n)
    s_bi = F.when(bi, F.col("c2").cast("double") / F.col("c1x")).otherwise(
        F.lit(ALPHA) * uni
    )
    s_tri = F.when(tri, F.col("c3").cast("double") / F.col("c2x")).otherwise(
        F.lit(ALPHA) * s_bi
    )
    # a position starts at the highest order it HAS: no penalty for
    # context that cannot exist
    return (
        F.when(F.col("pos") >= 2, s_tri)
        .when(F.col("pos") == 1, s_bi)
        .otherwise(uni)
    )


def perplexity_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lm: dict,
) -> DataFrame:
    """(id, n_tokens, log_ppl): mean -ln S per token under the trained
    stupid-backoff LM (lower = closer to the training corpus). Docs
    with zero tokens score log_ppl = 0.0 — NOTE (advisor finding): that
    is the BEST possible score, so an LM-only quality gate would pass
    empty/all-whitespace docs; always pair an LM gate with a
    minimum-length (n_tokens > 0) filter, exactly as the heuristic
    quality_score path does. Fully join-based — the model never leaves
    the cluster."""
    if lm["n"] != 3:
        raise ValueError("perplexity_score: expects an order-3 LM (n=3)")
    total = lm["total"]
    from ._util import ensure_min_parallelism

    # the token posexplode + 4 gram projections + (broadcast) count-table
    # probes all run in the SCAN stage — a single-file corpus would do
    # that serially on one core without the guard. min_bytes=2 MiB is the
    # measured break-even (0.6 MB: 0.84s→2.1s; 6 MB 1-file: 3.8s→2.5s)
    df = ensure_min_parallelism(df, min_bytes=2 << 20)
    toks = _toks(text_col)
    base = df.select(F.col(id_col).alias("id"), toks.alias("toks"))
    rows = base.select(
        "id", F.posexplode("toks").alias("pos", "w"), F.col("toks")
    ).select(
        "id",
        "pos",
        F.col("w").alias("uni"),
        F.when(
            F.col("pos") >= 1,
            F.concat_ws(" ", F.element_at("toks", F.col("pos")), F.col("w")),
        ).alias("bi"),
        F.when(F.col("pos") >= 1, F.element_at("toks", F.col("pos"))).alias("unictx"),
        F.when(
            F.col("pos") >= 2,
            F.concat_ws(
                " ",
                F.element_at("toks", F.col("pos") - 1),
                F.element_at("toks", F.col("pos")),
                F.col("w"),
            ),
        ).alias("tri"),
        F.when(
            F.col("pos") >= 2,
            F.concat_ws(
                " ",
                F.element_at("toks", F.col("pos") - 1),
                F.element_at("toks", F.col("pos")),
            ),
        ).alias("bictx"),
    )
    c1, c2, c3 = lm["counts"][1], lm["counts"][2], lm["counts"][3]
    j = (
        rows.join(c3.select(F.col("g").alias("tri"), F.col("c").alias("c3")), "tri", "left")
        .join(c2.select(F.col("g").alias("bictx"), F.col("c").alias("c2x")), "bictx", "left")
        .join(c2.select(F.col("g").alias("bi"), F.col("c").alias("c2")), "bi", "left")
        .join(c1.select(F.col("g").alias("unictx"), F.col("c").alias("c1x")), "unictx", "left")
        .join(c1.select(F.col("g").alias("uni"), F.col("c").alias("c1")), "uni", "left")
    )
    scored = j.select("id", (-F.log(_score_expr(total))).alias("nll"))
    agg = scored.groupBy("id").agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.avg("nll").alias("log_ppl"),
    )
    return base.select("id").join(agg, "id", "left").select(
        "id",
        F.coalesce("n_tokens", F.lit(0).cast("bigint")).alias("n_tokens"),
        F.coalesce("log_ppl", F.lit(0.0)).alias("log_ppl"),
    )


def top_ngrams(lm: dict, order: int, k: int = 20) -> DataFrame:
    """(g, c): the k heaviest grams of one order, ties broken by gram —
    the exact-integer projection of the model the driver oracle pins."""
    return (
        lm["counts"][order]
        .orderBy(F.col("c").desc(), F.col("g"))
        .limit(k)
    )


class LMClassifier(TextClassifier):
    """operators/classifier.TextClassifier adapter: quality =
    1 / (1 + log_ppl) in (0, 1], monotone in corpus-likeness; lang is
    not the LM's business and is returned as '' (gate on quality only,
    or compose with the heuristic lang_id). Collects the pruned count
    tables behind MAX_LM_ENTRIES — past the cap use the join-based
    perplexity_score instead."""

    def __init__(self, lm: dict):
        if lm["n"] != 3:
            raise ValueError(
                f"LMClassifier: expects an order-3 LM (n=3), got n={lm['n']} "
                "— same contract as perplexity_score"
            )
        self.n = lm["n"]
        self.total = lm["total"]
        sizes = {k: t.count() for k, t in lm["counts"].items()}
        if sum(sizes.values()) > MAX_LM_ENTRIES:
            raise ValueError(
                f"LMClassifier: {sum(sizes.values())} count entries exceed "
                f"MAX_LM_ENTRIES={MAX_LM_ENTRIES} — raise min_count, or use "
                "the join-based perplexity_score (never collects the model)"
            )
        self.counts = {
            k: {r.g: r.c for r in t.collect()} for k, t in lm["counts"].items()
        }

    def _score(self, toks: list[str], i: int) -> float:
        c1, c2, c3 = self.counts[1], self.counts[2], self.counts[3]
        w = toks[i]
        uni = c1[w] / self.total if w in c1 else 1.0 / self.total
        if i == 0:
            return uni
        bg, ux = " ".join(toks[i - 1 : i + 1]), toks[i - 1]
        s_bi = (
            c2[bg] / c1[ux] if bg in c2 and ux in c1 else ALPHA * uni
        )
        if i == 1:
            return s_bi
        tg, bx = " ".join(toks[i - 2 : i + 1]), " ".join(toks[i - 2 : i])
        return c3[tg] / c2[bx] if tg in c3 and bx in c2 else ALPHA * s_bi

    def log_ppl(self, text: str) -> float:
        import math
        import re

        # ASCII \s+ — the SAME token boundary as the Spark path's Java
        # regex (python str.split() also splits on unicode whitespace
        # like NBSP, which Java \s does not — the two paths would score
        # web-crawl text differently)
        toks = [t for t in re.split(r"\s+", text, flags=re.ASCII) if t]
        if not toks:
            return 0.0
        return sum(-math.log(self._score(toks, i)) for i in range(len(toks))) / len(toks)

    def classify(self, texts):
        return [("", 1.0 / (1.0 + self.log_ppl(t))) for t in texts]
