"""Similarity search over embedding columns (array<float>).

- ``cosine``: native dot/norm via F.zip_with + F.aggregate (JVM, no
  Python) — the baseline brute-force scorer.
- ``brute_force_topk``: exact top-k neighbors for a (small) query set:
  broadcast the queries, score every corpus row, row_number per query.
  Scales linearly in corpus size — right answer for recall evaluation
  and small query sets even at 10⁹ rows (one scan, no shuffle of the
  corpus; only (query, candidate-topk) rows shuffle).
- ``lsh_bucket_topk``: the scale path — random-hyperplane LSH: sign
  bits of projections onto d pseudo-random planes (md5-derived
  deterministic coefficients) bucket the corpus; queries probe only
  their own bucket (plus multi-probe neighbors by flipping one bit).
  Approximate; recall controlled by n_planes/n_probes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from .rounding import round6


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cos_sim, rank).
    Self-matches (same id) are excluded. Ties break by neighbor id."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
        )
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = (
        c.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            round6(cosine(F.col("_qv"), F.col("_cv"))).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _plane_coeff(plane: int, dim: int, plane_set: int = 0) -> list[float]:
    """Deterministic pseudo-random hyperplane coefficients in [-1, 1]
    derived from md5 — reproducible across engines/runs. ``plane_set``
    salts an independent family of planes (set 0 keeps the original
    derivation for oracle compatibility)."""
    import hashlib

    tag = f"plane:{plane}" if plane_set == 0 else f"set{plane_set}:plane:{plane}"
    out = []
    for j in range(dim):
        h = hashlib.md5(f"{tag}:{j}".encode()).hexdigest()
        out.append(int(h[:15], 16) / float(16**15) * 2 - 1)
    return out


def lsh_signature(
    vec: Column, dim: int, n_planes: int = 8, plane_set: int = 0
) -> Column:
    """Random-hyperplane signature as an int (bit i = sign of v·plane_i)."""
    sig = F.lit(0)
    for p in range(n_planes):
        coeff = _plane_coeff(p, dim, plane_set)
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(c) for c in coeff]),
                lambda x, c: x.cast("double") * c,
            ),
            F.lit(0.0),
            lambda a, v: a + v,
        )
        sig = sig + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return sig


def auto_n_planes(
    df: DataFrame, id_col: str = "vec_id", target_bucket: int = 64
) -> int:
    """Derive the LSH plane count from the corpus size: one cheap
    approx-count scan, n ≈ log2(rows / target_bucket), clamped to
    [4, 24] (2^24 buckets ≈ 16M — beyond that raise target_bucket, not
    planes). The sizing rule the 10⁹-row docstrings quote, applied
    automatically."""
    import math

    n_rows = df.select(F.approx_count_distinct(id_col).alias("n")).first()["n"]
    return max(4, min(24, math.ceil(math.log2(max(n_rows, 1) / target_bucket))))


def embedding_neardup_pairs(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_planes: int | None = 8,
    n_plane_sets: int = 1,
    max_bucket: int = 0,
    target_bucket: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-blocked: only pairs
    whose random-hyperplane signatures are EQUAL are scored (one
    equi-join shuffle on the bucket id — never all-pairs), then exact
    cosine filters at ``threshold``. Returns (id_a, id_b, cos_sim).

    Scale levers (the 10⁹-row tuning):
    - ``n_planes``: bucket count is 2^n_planes — raise it so the mean
      bucket is small (n_planes ≈ log2(n_rows / target_bucket)); at
      10⁹ rows use ≥ 20 planes, not the default 8 (which caps at 256
      buckets and makes the in-bucket join quadratic).
    - ``n_plane_sets``: OR-construction for recall — each extra
      independent plane family re-buckets the corpus and unions the
      candidate pairs (more planes cut recall per set; more sets win
      it back, like MinHash bands).
    - ``max_bucket``: drop buckets larger than this before the
      self-join (0 = uncapped) — a degenerate bucket (e.g. zero
      vectors) otherwise puts O(n²) pairs in one task.

    ``n_planes=None`` AUTO-SIZES from the corpus: one cheap
    approx-count scan derives n ≈ log2(rows / target_bucket), clamped
    to [4, 24] — the sizing rule above applied automatically, so a
    caller who never tunes still gets ~``target_bucket``-row mean
    buckets at any corpus size instead of the demo-scale fixed 8.
    """
    if n_planes is None:
        n_planes = auto_n_planes(df, id_col, target_bucket)
    parts = []
    for s in range(n_plane_sets):
        parts.append(
            df.select(
                F.col(id_col).alias("_id"),
                F.col(vec_col).alias("_v"),
                lsh_signature(F.col(vec_col), dim, n_planes, plane_set=s).alias(
                    "bucket"
                ),
                F.lit(s).alias("_pset"),
            )
        )
    sig = parts[0]
    for p in parts[1:]:
        sig = sig.unionByName(p)
    if max_bucket > 0:
        # bucket sizes ride the same shuffle the join needs anyway
        sig = (
            sig.withColumn(
                "_bn", F.count(F.lit(1)).over(W.partitionBy("_pset", "bucket"))
            )
            .filter(F.col("_bn") <= max_bucket)
            .drop("_bn")
        )
    a, b = sig.alias("a"), sig.alias("b")
    pairs = (
        a.join(b, ["_pset", "bucket"])
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            round6(cosine(F.col("a._v"), F.col("b._v"))).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
    if n_plane_sets > 1:
        # a pair found by several sets has identical cos_sim — dedup
        pairs = pairs.groupBy("id_a", "id_b").agg(F.max("cos_sim").alias("cos_sim"))
    return pairs


def kmeans_fit(
    df: DataFrame,
    dim: int,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quant: int = 1 << 20,
    sample_n: int | None = None,
) -> list[list[float]]:
    """Deterministic distributed Lloyd k-means for IVF centroids.

    Engine-portable determinism (the whole point — the DuckDB oracle
    replays the identical iterations):
    - init: the first ``k`` corpus vectors by id (fixed training
      sample);
    - assignment: argmax cosine with ties to the LOWEST centroid id —
      raw double cosine, same left-to-right fold both engines;
    - update: per-dimension mean via EXACT integer partial sums
      (components quantized ``floor(v * quant)`` to BIGINT — double
      summation order can never change the result), divided and
      ``round(_, 6)`` INSIDE Spark SQL so half-up rounding matches
      ANSI SQL; empty clusters keep their previous centroid.

    ``sample_n``: train on a DETERMINISTIC bounded sample — the first
    ``sample_n`` rows by id (one orderBy+limit = TakeOrderedAndProject,
    never a full sort) — and let the caller assign the full corpus ONCE
    with the returned centroids. This is the 100 TB shape: Lloyd
    quality needs a representative sample, not the corpus, so training
    cost is O(sample), and a BOUNDED sample collects to the driver by
    definition — the iterations run driver-LOCAL in pure Python over
    the collected rows (k·dim·sample flops: microseconds). One Spark
    job total instead of one per iteration; the per-iteration Spark
    jobs were pure overhead (each iteration's changed centroid
    literals forced a fresh codegen compile costing seconds on 256
    rows of work). Every float op replays the engine expr sequence
    exactly (same left-to-right folds, same quantized-integer sums,
    same floor-based round6 — IEEE binary64 both sides), so the
    trained centroids are bit-identical to the distributed path's —
    pinned by test + the ann_ivf_kmeans oracle row, which replays the
    iterations in DuckDB SQL.

    ``sample_n=None`` = train on the full frame, distributed (the
    path for corpus-scale training sets that must not be sampled):
    the per-iteration driver collect is k rows of k centroids — small
    by definition; all heavy work (assignment scan + per-dim sums) is
    distributed and map-side combined.

    Returns centroids as a list indexed by centroid id.
    """
    import math

    v = F.col(vec_col)
    if sample_n is not None:
        if sample_n < k:
            raise ValueError(f"sample_n={sample_n} < k={k}")
        sample = (
            df.select(F.col(id_col).alias("_id"), v.alias("_v"))
            .orderBy("_id")
            .limit(sample_n)
            .collect()
        )
        if len(sample) < k:
            raise ValueError(f"kmeans_fit: need >= {k} rows, got {len(sample)}")
        vecs = [list(map(float, r["_v"])) for r in sample]
        return _lloyd_local(vecs, dim=dim, k=k, iters=iters, quant=quant)
    train = df
    init = (
        train.select(F.col(id_col).alias("_cid"), v.alias("_c"))
        .orderBy("_cid")
        .limit(k)
        .collect()
    )
    if len(init) < k:
        raise ValueError(f"kmeans_fit: need >= {k} rows, got {len(init)}")
    cents: list[list[float]] = [list(map(float, r["_c"])) for r in init]
    for _ in range(iters):
        # stage the row norm ONCE (own select so it is evaluated once,
        # not re-inlined per centroid) and fold each centroid's norm to
        # a Python constant — same sqrt(Σx²) sequential sum as the SQL
        # oracle, so cosine bits are unchanged, but the assignment expr
        # shrinks ~2x (codegen) and the norm fold runs 1x per row, not k
        staged = train.select(v.alias("_v"), norm(v).alias("_vn"))
        sv, svn = F.col("_v"), F.col("_vn")

        def _cos_lit(c: list[float]) -> Column:
            cn = math.sqrt(sum(x * x for x in c))
            d = svn * F.lit(cn)
            num = dot(sv, F.array(*[F.lit(float(x)) for x in c]))
            return F.when(d > 0, num / d).otherwise(F.lit(0.0))

        structs = [
            F.struct(_cos_lit(c).alias("d"), F.lit(-ci).alias("nc"))
            for ci, c in enumerate(cents)
        ]
        assigned = staged.select(
            "_v", (-F.array_max(F.array(*structs))["nc"]).alias("cid")
        )
        # per-dim sums via posexplode → ONE narrow (cid, pos) aggregate
        # instead of `dim` wide aggregate columns: identical integer
        # math, but the generated plan is tiny (a dim-wide aggregate
        # pays seconds of codegen PER ITERATION since the centroid
        # literals change each round)
        rows = (
            assigned.select("cid", F.posexplode("_v").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.floor(F.col("x").cast("double") * quant)).alias("s"),
            )
            .select(
                "cid",
                "pos",
                round6(F.col("s") / F.lit(float(quant)) / F.col("n")).alias(
                    "c"
                ),
            )
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in rows:
            by_cid.setdefault(r["cid"], {})[r["pos"]] = r["c"]
        for cid, comps in by_cid.items():
            cents[cid] = [comps[j] for j in range(dim)]
    return cents


def _lloyd_local(
    vecs: list[list[float]], dim: int, k: int, iters: int, quant: int
) -> list[list[float]]:
    """Driver-local Lloyd over a collected bounded sample — the exact
    float-op sequence of the distributed path (see ``kmeans_fit``),
    op for op:

    - row norm: ``sqrt(fold acc + x*x)`` left-to-right (``norm``);
    - cosine: ``num / (vn * cn)`` with the ``> 0`` guard, ``cn``
      folded in Python exactly as the expr builder did;
    - argmax with ties to the LOWEST centroid id (the engine's
      ``array_max`` over ``(d, -cid)`` structs; its NaN-is-greatest
      ordering is replayed via an inf key);
    - update: ``floor(x * quant)`` integer sums (order-free), then
      ``round6((s / quant) / n)`` with the same two divisions.

    IEEE binary64 both sides, identical op order → identical bits.
    """
    import math

    cents = [list(vs) for vs in vecs[:k]]
    for _ in range(iters):
        cnorms = [math.sqrt(sum(x * x for x in c)) for c in cents]
        sums: list[list[int]] = [[0] * dim for _ in range(k)]
        counts = [0] * k
        for row in vecs:
            acc = 0.0
            for x in row:
                acc += x * x
            vn = math.sqrt(acc)
            best_key, best_ci = None, 0
            for ci in range(k):
                d = vn * cnorms[ci]
                if d > 0:
                    num = 0.0
                    for x, y in zip(row, cents[ci]):
                        num += x * y
                    cos = num / d
                else:
                    cos = 0.0
                # Spark struct ordering: NaN sorts GREATER than any
                # double and equal to itself, so ties fall to -cid
                key = (math.inf if math.isnan(cos) else cos, -ci)
                if best_key is None or key > best_key:
                    best_key, best_ci = key, ci
            counts[best_ci] += 1
            s = sums[best_ci]
            for j, x in enumerate(row):
                s[j] += math.floor(x * quant)
        for ci in range(k):
            if counts[ci] == 0:
                continue  # empty cluster keeps its previous centroid
            n = counts[ci]
            cents[ci] = [
                math.floor((s / float(quant)) / n * 1000000.0 + 0.5)
                / 1000000.0
                for s in sums[ci]
            ]
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 2,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-Flat approximate top-k: partition the corpus into inverted
    lists by nearest centroid; queries scan only their ``n_probe``
    nearest lists.

    Default centroid selection is the deterministic skeleton — the
    first ``n_centroids`` corpus vectors by id (a fixed "training
    sample"); pass ``centroids`` (e.g. from ``kmeans_fit``) to use
    trained ones — the plan shape is identical. Assignment and probing
    are exact argmin over the broadcast centroid set: one narrow corpus
    scan + one equi-join on the list id — the standard shape at 10⁹+
    rows (centroids always broadcastable; lists shard the shuffle).
    """
    if centroids is not None:
        cents_src = corpus.sparkSession.createDataFrame(
            [(i, c) for i, c in enumerate(centroids)],
            "_cid int, _cent array<double>",
        )
    else:
        # first n by id (orderBy+limit → per-partition top-N merge),
        # not `id < n`: ids may be non-dense or non-numeric — a filter
        # would silently yield zero centroids and zero neighbors
        cents_src = (
            corpus.select(F.col(id_col).alias("_cid"), F.col(vec_col).alias("_cent"))
            .orderBy("_cid")
            .limit(n_centroids)
        )
    cents = F.broadcast(cents_src)

    def nearest_lists(df, idc, vecc, n):
        scored = df.crossJoin(cents).select(
            F.col(idc),
            F.col(vecc),
            "_cid",
            cosine(F.col(vecc), F.col("_cent")).alias("_sim"),
        )
        w = W.partitionBy(idc).orderBy(F.col("_sim").desc(), F.col("_cid").asc())
        return (
            scored.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= n)
            .drop("_sim", "_r")
        )

    lists = nearest_lists(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")),
        "neighbor_id", "_cv", 1,
    )
    probes = nearest_lists(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")),
        "query_id", "_qv", n_probe,
    )
    scored = (
        lists.join(F.broadcast(probes), "_cid")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            round6(cosine(F.col("_qv"), F.col("_cv"))).alias("cos_sim"),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("cos_sim").alias("cos_sim"))
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    n_probes: int = 3,
) -> DataFrame:
    """Approximate top-k: score only corpus rows in the query's LSH
    bucket or a 1-bit-flip neighbor bucket (multi-probe). The corpus
    is bucketed ONCE (one narrow scan); the join is an equi-join on the
    bucket id — broadcastable for small query sets."""
    csig = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        lsh_signature(F.col(vec_col), dim, n_planes).alias("bucket"),
    )
    qsig = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        lsh_signature(F.col(vec_col), dim, n_planes).alias("_qsig"),
    )
    probes = [F.col("_qsig")] + [
        F.col("_qsig").bitwiseXOR(F.lit(1 << p)) for p in range(min(n_probes, n_planes))
    ]
    q_probed = qsig.select(
        "query_id", "_qv", F.explode(F.array(*probes)).alias("bucket")
    )
    scored = (
        csig.join(F.broadcast(q_probed), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            round6(cosine(F.col("_qv"), F.col("_cv"))).alias("cos_sim"),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("cos_sim").alias("cos_sim"))
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def semantic_dedup_corpus(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_planes: int | None = 8,
    n_plane_sets: int = 1,
    max_bucket: int = 0,
) -> DataFrame:
    """END-TO-END semantic dedup (the SemDeDup pass): embedding-cosine
    near-dup pairs (LSH-blocked, never all-pairs) → connected
    components → keep ONE representative (min id) per semantic
    cluster plus every unclustered vector. Catches paraphrases and
    re-encodings that string-level MinHash misses; composes
    ``embedding_neardup_pairs`` with
    ``dedup.keep_cluster_representatives`` (each stage independently
    oracle-gated; see those for the 100 TB plan shape and the
    n_planes / plane-set / bucket-cap scale levers — ``n_planes=None``
    auto-sizes from corpus cardinality).

    Returns one row per SURVIVING vector: ``(id_col, cluster_size)``.
    """
    from .dedup import keep_cluster_representatives

    pairs = embedding_neardup_pairs(
        df,
        dim,
        id_col=id_col,
        vec_col=vec_col,
        threshold=threshold,
        n_planes=n_planes,
        n_plane_sets=n_plane_sets,
        max_bucket=max_bucket,
    )
    return keep_cluster_representatives(df, pairs, id_col)
