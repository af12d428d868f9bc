"""Dedup operator guard-rails: LSH bucket cap (no OOM-shaped plan on a
giant exact-duplicate cluster), connected-components convergence, and
salted-agg determinism under repartitioning.

Reference behavior: dedup has no direct analogue in the reference (it is
an LLM-data-pipeline extension required by the brief); semantics are
pinned by the DuckDB oracles in raptor_spark/queries.py.
"""

import pytest
from pyspark.sql import Observation
from pyspark.sql import functions as F

from raptor_spark.functions.dedup import (
    connected_components,
    exact_dedup,
    minhash_lsh_pairs,
)


@pytest.fixture(scope="module")
def giant_cluster(spark):
    """10k identical docs + 3 distinct near-dup docs."""
    n = 10_000
    dup = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("the quick brown fox jumps over the lazy dog again and again").alias(
            "text"
        ),
    )
    extras = spark.createDataFrame(
        [
            (n + 1, "completely different text about spark catalyst optimizer rules"),
            (n + 2, "completely different text about spark catalyst optimizer rule"),
            (n + 3, "unrelated third document mentioning minhash signatures only"),
        ],
        "doc_id long, text string",
    )
    return dup.unionByName(extras).cache()


class TestLshBucketCap:
    def test_giant_bucket_dropped_and_counted(self, spark, giant_cluster):
        obs = Observation("lsh")
        pairs = minhash_lsh_pairs(
            giant_cluster, "doc_id", max_bucket=100, observation=obs
        )
        got = pairs.collect()
        # the 10k-identical cluster never reaches the quadratic pair
        # fan-out (10k docs would emit ~5*10^7 pairs per band)
        assert all(r["id_a"] >= 10_000 for r in got)
        # the near-dup pair among the extras is still found
        assert any(
            (r["id_a"], r["id_b"]) == (10_001, 10_002) for r in got
        )
        m = obs.get
        assert m["dropped_buckets"] > 0
        assert m["dropped_docs"] >= 10_000

    def test_exact_dedup_still_catches_dropped_cluster(self, spark, giant_cluster):
        reps = exact_dedup(giant_cluster, "doc_id").collect()
        giant = [r for r in reps if r["n_dups"] == 10_000]
        assert len(giant) == 1 and giant[0]["rep_id"] == 0

    def test_two_pass_matches_single_pass(self, spark, giant_cluster):
        """two_pass anti-join pruning yields the same pairs and the
        same dropped metrics as the single-pass cap, with no
        collect_list of the hot bucket anywhere in the plan path."""
        obs = Observation("lsh2p")
        pairs = minhash_lsh_pairs(
            giant_cluster, "doc_id", max_bucket=100, observation=obs,
            two_pass=True,
        )
        got = {(r["id_a"], r["id_b"], r["n_shared_bands"]) for r in pairs.collect()}
        want = {
            (r["id_a"], r["id_b"], r["n_shared_bands"])
            for r in minhash_lsh_pairs(
                giant_cluster, "doc_id", max_bucket=100
            ).collect()
        }
        assert got == want
        m = obs.get
        assert m["dropped_buckets"] > 0 and m["dropped_docs"] >= 10_000

    def test_uncapped_keeps_everything(self, spark):
        df = spark.createDataFrame(
            [(i, "same same same text for everyone") for i in range(20)],
            "doc_id long, text string",
        )
        n = minhash_lsh_pairs(df, "doc_id", max_bucket=0).count()
        assert n == 20 * 19 // 2


class TestConnectedComponents:
    def test_chain_converges(self, spark):
        # path graph 0-1-2-...-9: one component, rep 0
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(9)], "id_a long, id_b long"
        )
        got = {
            (r["id"], r["cluster_rep"])
            for r in connected_components(pairs, max_iter=15).collect()
        }
        assert got == {(i, 0) for i in range(10)}

    def test_nonconvergence_raises_without_fallback(self, spark):
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(30)], "id_a long, id_b long"
        )
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(pairs, max_iter=2, fallback_star=False)

    def test_high_diameter_falls_back_to_star(self, spark):
        """Path graph of diameter 60: min-label propagation cannot
        converge in max_iter=4 rounds — the alternating-star fallback
        must still produce correct component minima."""
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(60)] + [(100, 101), (101, 102)],
            "id_a long, id_b long",
        )
        got = {
            (r["id"], r["cluster_rep"])
            for r in connected_components(pairs, max_iter=4).collect()
        }
        want = {(i, 0) for i in range(61)} | {(i, 100) for i in (100, 101, 102)}
        assert got == want

    def test_star_matches_label_propagation(self, spark):
        """connected_components_star ≡ min-label propagation on a mixed
        graph (cliques + chains + isolated edge)."""
        from raptor_spark.functions.dedup import connected_components_star

        edges = (
            [(a, b) for a in range(5) for b in range(a + 1, 5)]  # clique
            + [(10 + i, 11 + i) for i in range(8)]               # chain
            + [(50, 51)]                                         # edge
            + [(60, 61), (61, 62), (60, 62)]                     # triangle
        )
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        star = {
            (r["id"], r["cluster_rep"])
            for r in connected_components_star(pairs).collect()
        }
        prop = {
            (r["id"], r["cluster_rep"])
            for r in connected_components(
                pairs, max_iter=30, fallback_star=False
            ).collect()
        }
        assert star == prop
