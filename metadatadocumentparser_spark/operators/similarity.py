"""Similarity search over an embedding column (array<float>).

- cosine_topk: brute-force baseline. The query side is tiny and broadcast;
  the corpus side streams map-side — no shuffle except the final per-query
  top-k (a Window over ≤ |queries|·|corpus| scored rows; at scale replace
  the window with per-partition top-k + merge, which AQE approximates here).
- lsh_cosine_topk: the scale path — random-hyperplane signs (deterministic
  md5-derived hyperplanes) bucket the corpus; only same-bucket candidates
  are scored. Sub-linear candidate sets at 100 TB; recall traded via
  n_planes/probes.

Dot products are computed on double-cast arrays left-to-right (zip_with +
aggregate) so the DuckDB oracle (list_transform/list_sum over the same
order) reproduces values; scores rounded to 4 decimals before ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Fail-loud ceiling on the broadcast/collected query side of the top-k
# operators (the MAX_N_LIST pattern, ivf.py): every scored row below the
# top-k window is |queries| x |corpus|, so an unbounded query side turns
# the "bounded broadcast" posture into a quadratic blow-up silently. Past
# the cap, run per-partition top-k + merge: repartition the QUERIES,
# self-contain each partition's scoring against the corpus, and merge the
# per-partition top-k heaps — or route through the LSH/IVF paths, which
# bound candidates structurally.
MAX_QUERIES = 10_000


def _check_query_count(queries: DataFrame, op: str) -> None:
    """One cheap action: limit(cap+1).count() never scans past the cap."""
    n = queries.limit(MAX_QUERIES + 1).count()
    if n > MAX_QUERIES:
        raise ValueError(
            f"{op}: query side has > MAX_QUERIES={MAX_QUERIES} rows; "
            "the broadcast top-k posture assumes a bounded query set — "
            "split the queries (per-partition top-k + merge); the "
            "LSH/IVF paths broadcast the query side too and carry the "
            "same cap"
        )


def collect_queries_capped(
    queries: DataFrame, id_col: str, vec_col: str, op: str
) -> list:
    """The ONE capped query-side collect the ADC operators share
    (pq_topk / ivfpq_topk): limit(cap+1) bounds the driver transfer, the
    raise names the per-partition top-k + merge path past the cap."""
    rows = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qv")
    ).limit(MAX_QUERIES + 1).collect()
    if len(rows) > MAX_QUERIES:
        raise ValueError(
            f"{op}: query side has > MAX_QUERIES={MAX_QUERIES} rows; "
            "split the queries or use per-partition top-k + merge"
        )
    return rows


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_expr(a, b):
    """Guarded cosine: NULL when either norm is zero. Unguarded, 0/0 is
    NaN — and Spark orders NaN as the LARGEST double, so one all-zero
    embedding (a padding row, a failed encoder) would outrank every real
    neighbor in the desc top-k windows AND pass `>= threshold` filters
    (r5 review). NULL instead sorts last under desc (Spark's default
    NULLS LAST) and fails every threshold comparison. Rounded to 4
    decimals like every caller did individually."""
    denom = _norm(a) * _norm(b)
    return F.when(denom > 0, F.round(_dot(a, b) / denom, 4))


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """For each query row: top-k corpus neighbors by cosine (excluding
    self), deterministic tiebreak on neighbor id. Raises when the query
    side exceeds MAX_QUERIES (see the module constant)."""
    _check_query_count(queries, "cosine_topk")
    from ._util import ensure_min_parallelism

    q = F.broadcast(
        queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
    )
    # |queries| interpreted dot products per corpus row happen map-side in
    # the scan stage — parallelize a single-file corpus first (r6)
    c = ensure_min_parallelism(emb).select(
        F.col(id_col).alias("nid"), F.col(vec_col).alias("nv")
    )
    scored = (
        q.crossJoin(c)
        .where(F.col("qid") != F.col("nid"))
        .select(
            "qid",
            "nid",
            cosine_expr(F.col("qv"), F.col("nv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "rank", "nid", "cosine")
    )


def hyperplane_bucket(vec_col, n_planes: int = 8, dim: int = 64):
    """Deterministic LSH bucket id: sign pattern against pseudo-random
    hyperplanes h_p[i] = (md5-derived int of (p,i)) centered at 0. The
    hyperplane constants fold into the plan as literals — nothing random
    at runtime, identical across runs/cluster sizes.

    Plan size is dim-INDEPENDENT: each plane is ONE array<double> literal
    and the dot product is aggregate(zip_with(...)) — n_planes expression
    nodes total. (The naive unrolled form is n_planes·dim nodes: fine at
    dim=64, but at production embedding dims (768-4096) it blows up
    Catalyst analysis/codegen.) The left-to-right fold keeps the exact
    FP addition order of the unrolled form — ((0 + v0·c0) + v1·c1) + … —
    so bucket values are bit-identical to it and to the DuckDB oracle's
    left-associative sum."""
    import hashlib

    def coef(p, i):
        hx = hashlib.md5(f"plane:{p}:{i}".encode()).hexdigest()[:8]
        return (int(hx, 16) / float(0xFFFFFFFF)) * 2.0 - 1.0

    # slice to dim: longer vectors use their first dim elements (the
    # unrolled form's behavior). WITHOUT the slice, zip_with NULL-pads any
    # length mismatch → NULL dot → every mismatched vector lands in bucket
    # 0 and the bucket equi-join degenerates to one O(N²) block, silently.
    # Shorter-than-dim vectors are a caller error — raise, don't mis-bucket.
    head = F.slice(vec_col, 1, dim)
    bucket = F.lit(0)
    for p in range(n_planes):
        plane = F.lit([coef(p, i) for i in range(dim)])
        acc = F.aggregate(
            F.zip_with(head, plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        bucket = bucket + F.when(acc > 0, F.lit(1 << p)).otherwise(0)
    return F.when(
        F.size(vec_col) >= dim, bucket
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"hyperplane_bucket: vector shorter than dim={dim} (size "),
                F.size(vec_col).cast("string"),
                F.lit(") — pass the actual embedding dim"),
            )
        )
    )


def lsh_cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 6,
    dim: int = 64,
) -> DataFrame:
    """Bucketed ANN: score only corpus rows in the query's hyperplane
    bucket. Returns the same shape as cosine_topk (recall < 1 by design).
    The query side is broadcast, so the MAX_QUERIES cap applies here too
    (r5 review — this function was advertised as the path past the cap
    while broadcasting the same side)."""
    _check_query_count(queries, "lsh_cosine_topk")
    b = hyperplane_bucket(F.col(vec_col), n_planes, dim)
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"), b.alias("bucket")
        )
    )
    c = emb.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nv"), b.alias("bucket"))
    scored = (
        q.join(c, "bucket")
        .where(F.col("qid") != F.col("nid"))
        .select(
            "qid",
            "nid",
            cosine_expr(F.col("qv"), F.col("nv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "rank", "nid", "cosine")
    )


# embedding_near_dup_pairs: expected rows per LSH bucket when n_planes is
# derived. Bucket-cardinality math: 2^p buckets over N rows ≈ N/2^p rows
# per bucket, so the bucket self-join emits ≈ (N/2^p)²·2^p = N²/2^p
# candidate rows — with p = ceil(log2(N / TARGET)) that is ≈ N·TARGET,
# LINEAR in the corpus. A constant p (the r5 default of 4) makes it
# N²/16 — quadratic with a constant divisor (the r5 verdict's finding).
NEAR_DUP_TARGET_BUCKET_ROWS = 256
MAX_NEAR_DUP_PLANES = 24


def near_dup_planes_for(n_rows: int) -> int:
    """ceil(log2(N / TARGET)) clamped to [1, MAX_NEAR_DUP_PLANES] — the
    plane count that keeps expected bucket occupancy ≈ TARGET rows."""
    import math

    if n_rows <= NEAR_DUP_TARGET_BUCKET_ROWS:
        return 1
    return max(
        1,
        min(
            MAX_NEAR_DUP_PLANES,
            math.ceil(math.log2(n_rows / NEAR_DUP_TARGET_BUCKET_ROWS)),
        ),
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    max_ids: int | None = None,
    method: str = "lsh",
    n_planes: int | None = None,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cosine ≥ threshold).

    method="lsh" (default, the scale path): candidates are restricted to
    pairs sharing a hyperplane-LSH bucket. ``n_planes=None`` (default)
    derives the plane count from the corpus size (one cheap count job;
    see near_dup_planes_for) so bucket occupancy — and with it the join
    volume, ≈ N·TARGET rows — stays LINEAR in the corpus; a fixed
    n_planes gives N²/2^p, quadratic with a constant divisor (fine for a
    pinned small corpus, a scale-killer at 10⁹ vectors). More planes cut
    recall (a near-dup pair must agree on every plane sign); the
    recall-vs-bucket-count trade is pinned in
    test_fingerprint_ivf.py::test_near_dup_planes_recall.

    method="exact": all-pairs theta join — a cartesian product with a
    predicate. NEVER call this unbounded on a large corpus; require an
    explicit max_ids cap.

    ``max_ids`` bounds the ROW COUNT: the max_ids smallest ids are kept
    (deterministic — orderBy(id).limit, a TakeOrderedAndProject). An
    earlier version filtered on id VALUE (`id < max_ids`), which bounds
    nothing when ids are sparse hash-derived bigints and silently
    returns empty when they all exceed it (r5 review); for dense
    0..n-1 ids the two are identical, so existing results are unchanged.
    """
    e = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    if max_ids is not None:
        e = e.orderBy("id").limit(max_ids)
    if method == "lsh":
        if n_planes is None:
            n_planes = near_dup_planes_for(e.count())
        e = e.withColumn("bucket", hyperplane_bucket(F.col("v"), n_planes, dim))
        joined = e.alias("a").join(e.alias("b"), "bucket").where(
            F.col("a.id") < F.col("b.id")
        )
    elif method == "exact":
        if max_ids is None:
            raise ValueError(
                "embedding_near_dup_pairs(method='exact') is an all-pairs "
                "cartesian join; pass max_ids to bound it explicitly"
            )
        joined = e.alias("a").join(e.alias("b"), F.col("a.id") < F.col("b.id"))
    else:
        raise ValueError(f"unknown method {method!r}")
    return (
        joined.select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cosine_expr(F.col("a.v"), F.col("b.v")).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )  # no distinct needed: each id has exactly one bucket, pairs are unique
