"""Similarity-search operators: signature stability (oracle compat),
multi-plane-set recall, bucket cap, ANN vs brute-force recall."""

import pytest
from pyspark.sql import functions as F

from raptor_spark.functions.similarity import (
    _plane_coeff,
    brute_force_topk,
    embedding_neardup_pairs,
    lsh_bucket_topk,
)

SF_DIR = "/root/testdata/sf0.001"
DIM = 64


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_plane_set_zero_unchanged():
    """Set 0 must keep the original md5 derivation — the DuckDB oracle
    for embedding_neardup/ann_lsh reproduces exactly these planes."""
    import hashlib

    h = hashlib.md5(b"plane:3:7").hexdigest()
    want = int(h[:15], 16) / float(16**15) * 2 - 1
    assert _plane_coeff(3, DIM)[7] == want
    # other sets derive differently
    assert _plane_coeff(3, DIM, plane_set=1)[7] != want


def test_multi_plane_sets_superset_recall(spark, emb):
    """OR-construction: pairs found with 2 plane sets ⊇ pairs found
    with 1 (same planes for set 0), values identical on the overlap."""
    one = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in embedding_neardup_pairs(emb, DIM, threshold=0.8).collect()
    }
    two = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in embedding_neardup_pairs(
            emb, DIM, threshold=0.8, n_plane_sets=2
        ).collect()
    }
    assert set(one) <= set(two)
    for k, v in one.items():
        assert two[k] == v


def test_max_bucket_drops_degenerate_bucket(spark):
    """All-identical vectors land in one bucket; the cap keeps the
    O(n²) self-join away while distinct vectors still pair."""
    rows = [(i, [1.0] * DIM) for i in range(200)]
    rows += [(1000, [0.5] * 32 + [-0.5] * 32), (1001, [0.5] * 32 + [-0.5] * 32)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    capped = embedding_neardup_pairs(
        df, DIM, threshold=0.9, max_bucket=50
    ).collect()
    assert all(r["id_a"] >= 1000 for r in capped)
    assert any((r["id_a"], r["id_b"]) == (1000, 1001) for r in capped)
    uncapped_n = embedding_neardup_pairs(df, DIM, threshold=0.9).count()
    assert uncapped_n >= 200 * 199 // 2


def test_kmeans_centroids_deterministic_and_useful(spark):
    """kmeans_fit: identical centroids across physical layouts
    (quantized integer sums), and trained-IVF recall beats the
    first-k-ids skeleton on clustered data."""
    import numpy as np

    from raptor_spark.functions.similarity import ivf_topk, kmeans_fit

    rng = np.random.default_rng(3)
    centers = rng.normal(size=(8, DIM))
    rows = []
    for c in range(8):
        for i in range(25):
            v = centers[c] + 0.05 * rng.normal(size=DIM)
            rows.append((c * 25 + i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()

    c1 = kmeans_fit(df, DIM, k=8, iters=2)
    c2 = kmeans_fit(df.repartition(7), DIM, k=8, iters=2)
    assert c1 == c2  # bit-exact under repartitioning

    queries = df.filter(F.col("vec_id") % 25 == 0)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(df, queries, k=3).collect()
    }

    def recall(cents):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_topk(
                df, queries, k=3, n_probe=1, n_centroids=8, centroids=cents
            ).collect()
        }
        return len(exact & got) / len(exact)

    r_trained = recall(c1)
    r_skeleton = recall(None)
    # first-8-ids skeleton = 8 centroids from ONE cluster → poor lists;
    # trained centroids separate the clusters
    assert r_trained >= 0.9
    assert r_trained > r_skeleton


def test_lsh_topk_recall_vs_brute_force(spark):
    """Multi-probe LSH top-k recovers the exact top-k when the corpus
    HAS locality (tight clusters). Uniform-random vectors have no
    LSH-recoverable structure — there the driver oracle checks only
    implementation equivalence, so the recall claim is pinned here on
    clustered data."""
    import numpy as np

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(10, DIM))
    rows = []
    for c in range(10):
        for i in range(20):
            v = centers[c] + 0.05 * rng.normal(size=DIM)
            rows.append((c * 20 + i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()
    queries = df.filter(F.col("vec_id") % 20 == 0)  # one per cluster
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(df, queries, k=3).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_bucket_topk(df, queries, DIM, k=3, n_probes=3).collect()
    }
    assert len(exact & approx) / len(exact) >= 0.8


def test_auto_n_planes_sizing(spark):
    """n_planes=None auto-sizes from corpus cardinality: a 20k-row
    pseudo-random corpus at target_bucket=64 derives ~log2(20000/64)≈9
    planes, and the resulting bucket-size distribution is bounded (no
    degenerate mega-bucket)."""
    from raptor_spark.functions.similarity import auto_n_planes, lsh_signature

    n_rows, dim = 20_000, 8
    corpus = spark.range(n_rows).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                (
                    F.pmod(F.xxhash64(F.col("id"), F.lit(j)), F.lit(1000))
                    / 499.5
                    - 1.0
                ).cast("float")
                for j in range(dim)
            ]
        ).alias("embedding"),
    ).cache()
    n = auto_n_planes(corpus, "vec_id", target_bucket=64)
    assert 8 <= n <= 10  # approx_count_distinct tolerance around 9
    sizes = (
        corpus.select(
            lsh_signature(F.col("embedding"), dim, n).alias("bucket")
        )
        .groupBy("bucket")
        .count()
        .agg(F.max("count").alias("mx"), F.count(F.lit(1)).alias("nb"))
        .first()
    )
    # pseudo-random vectors → roughly balanced buckets: the largest
    # must stay a small multiple of the 64-row target
    assert sizes["mx"] <= 20 * 64
    assert sizes["nb"] >= 2 ** (n - 2)  # most buckets actually occupied
    corpus.unpersist()


def test_kmeans_sample_training(spark, emb):
    """sample_n: bounded deterministic training sample. A sample
    covering the whole corpus reproduces full-corpus training exactly
    — since the sampled path runs Lloyd driver-LOCAL in Python, this
    equality also pins the Python float-op replay bit-for-bit against
    the distributed Spark expressions. A smaller sample still yields
    k well-formed centroids, deterministically."""
    from raptor_spark.functions.similarity import kmeans_fit

    full = kmeans_fit(emb, dim=DIM, k=4, iters=1)
    capped = kmeans_fit(emb, dim=DIM, k=4, iters=1, sample_n=10_000_000)
    assert capped == full
    samp = kmeans_fit(emb, dim=DIM, k=4, iters=1, sample_n=100)
    assert len(samp) == 4 and all(len(c) == DIM for c in samp)
    assert samp == kmeans_fit(emb, dim=DIM, k=4, iters=1, sample_n=100)
    with pytest.raises(ValueError, match="sample_n"):
        kmeans_fit(emb, dim=DIM, k=8, iters=1, sample_n=4)


def test_kmeans_local_vs_distributed_edge_cases(spark):
    """Zero vectors (cosine guard -> 0.0, lowest-cid tie) and exact
    duplicate rows must produce identical centroids on the driver-local
    sampled path and the distributed path."""
    from raptor_spark.functions.similarity import kmeans_fit

    rows = [
        (0, [0.0, 0.0, 0.0, 0.0]),          # zero vector: all-cos 0 tie
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0, 0.0]),          # exact duplicate
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [-0.5, 0.25, 0.125, -1.0]),
        (5, [0.3, 0.3, 0.3, 0.3]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    dist = kmeans_fit(df, dim=4, k=2, iters=2)
    local = kmeans_fit(df, dim=4, k=2, iters=2, sample_n=6)
    assert local == dist
