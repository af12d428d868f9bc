"""Incremental dedup (batch vs corpus signature stores) and the
salted per-group cap.

Reference scope: both are training-pipeline extensions beyond the
reference engine (brief: dedup at 100 TB is incremental — the daily
batch probes the accumulated corpus's stores, never rescans it; and
per-domain caps are the standard mixture-curation step).
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from raptor_spark.functions.dedup import (
    corpus_signature_store,
    dedup_against_corpus,
)
from raptor_spark.functions.sampling import cap_per_group


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog today"),
    (2, "pack my box with five dozen liquor jugs right now"),
    (3, "sphinx of black quartz judge my vow said the king"),
]


class TestDedupAgainstCorpus:
    @pytest.fixture(scope="class")
    def stores(self, spark):
        fp, band = corpus_signature_store(_docs(spark, CORPUS), "doc_id")
        return fp.cache(), band.cache()

    def _flags(self, spark, stores, new_rows):
        fp, band = stores
        out = dedup_against_corpus(_docs(spark, new_rows), fp, band, "doc_id")
        return {
            r["doc_id"]: (r["exact_dup"], r["n_bands_hit"], r["max_band_freq"])
            for r in out.collect()
        }

    def test_exact_dup_is_normalization_insensitive(self, spark, stores):
        # same text modulo case/whitespace → exact fingerprint hit
        flags = self._flags(
            spark,
            stores,
            [(10, "  The QUICK  brown fox jumps over the lazy dog today ")],
        )
        exact, hits, freq = flags[10]
        assert exact is True
        assert hits == 4  # identical text shares every band
        assert freq == 1

    def test_near_dup_hits_some_bands(self, spark, stores):
        # one word changed: not exact, but shares shingles → ≥1 band
        flags = self._flags(
            spark,
            stores,
            [(11, "the quick brown fox jumps over the lazy cat today")],
        )
        exact, hits, _ = flags[11]
        assert exact is False
        assert 1 <= hits <= 4

    def test_novel_doc_is_clean(self, spark, stores):
        flags = self._flags(
            spark,
            stores,
            [(12, "completely unrelated content about spark physical plans")],
        )
        assert flags[12] == (False, 0, 0)

    def test_corpus_multiplicity_reaches_freq(self, spark):
        corpus = _docs(
            spark,
            [(i, "the quick brown fox jumps over the lazy dog today") for i in range(5)],
        )
        fp, band = corpus_signature_store(corpus, "doc_id")
        out = dedup_against_corpus(
            _docs(spark, [(10, "the quick brown fox jumps over the lazy dog today")]),
            fp,
            band,
            "doc_id",
        ).collect()[0]
        assert out["exact_dup"] is True
        assert out["max_band_freq"] == 5

    def test_store_probe_is_broadcast(self, spark, stores):
        # the 100 TB property: the NEW side broadcasts, the stores
        # (corpus-derived) never shuffle for the probe
        fp, band = stores
        plan = (
            dedup_against_corpus(
                _docs(spark, [(10, "x y z")]), fp, band, "doc_id"
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert re.search(r"BroadcastHashJoin", plan)
        # the property is that the store probes never degrade to a
        # shuffle join (a stray broadcast elsewhere would not save us)
        assert "SortMergeJoin" not in plan
        assert "ShuffledHashJoin" not in plan


class TestCapPerGroup:
    def _rows(self):
        # 3 groups: sizes 7, 3, 1; quality = value to rank by
        rows = []
        for i in range(7):
            rows.append((100 + i, "a", float(i % 4)))  # ties on quality
        for i in range(3):
            rows.append((200 + i, "b", float(i)))
        rows.append((300, "c", 9.0))
        return rows

    def _df(self, spark):
        return spark.createDataFrame(self._rows(), ["id", "grp", "q"])

    def _naive(self, n):
        import pandas as pd

        pdf = pd.DataFrame(self._rows(), columns=["id", "grp", "q"])
        pdf = pdf.sort_values(["grp", "q", "id"], ascending=[True, False, True])
        pdf["rank_in_group"] = pdf.groupby("grp").cumcount() + 1
        return {
            (r.id, r.grp, r.rank_in_group)
            for r in pdf[pdf.rank_in_group <= n].itertuples()
        }

    @pytest.mark.parametrize("n_salts", [1, 4, 32])
    def test_matches_naive_reference_any_salt(self, spark, n_salts):
        out = cap_per_group(
            self._df(spark),
            "grp",
            [F.col("q").desc(), F.col("id").asc()],
            n=3,
            salt_key=F.col("id"),
            n_salts=n_salts,
        ).collect()
        got = {(r["id"], r["grp"], r["rank_in_group"]) for r in out}
        assert got == self._naive(3)

    def test_cap_not_exceeded_and_small_groups_whole(self, spark):
        out = cap_per_group(
            self._df(spark),
            "grp",
            [F.col("q").desc(), F.col("id").asc()],
            n=2,
            salt_key=F.col("id"),
        ).collect()
        by_grp = {}
        for r in out:
            by_grp.setdefault(r["grp"], []).append(r["rank_in_group"])
        assert sorted(by_grp["a"]) == [1, 2]
        assert sorted(by_grp["b"]) == [1, 2]
        assert sorted(by_grp["c"]) == [1]

    def test_rejects_nonpositive_n(self, spark):
        with pytest.raises(ValueError):
            cap_per_group(self._df(spark), "grp", [F.col("q")], n=0)
        with pytest.raises(ValueError):
            cap_per_group(self._df(spark), "grp", [F.col("q")], n=1, n_salts=0)

    def test_rejects_reserved_column_names(self, spark):
        # withColumn would silently REPLACE these and corrupt the
        # survivor set (ADVICE r3) — must be an error instead
        for bad in ("_salt", "_rn1", "rank_in_group"):
            df = self._df(spark).withColumn(bad, F.lit(1))
            with pytest.raises(ValueError, match=bad):
                cap_per_group(df, "grp", [F.col("q")], n=1)


class TestCrossOpConsistency:
    """dedup_against_corpus must agree with minhash_lsh_pairs: a new
    doc hits >= 1 corpus band iff the pairwise LSH over (corpus + new)
    emits a (new, corpus) candidate pair — same banding, two shapes."""

    def test_band_hits_match_pairwise_lsh(self, spark):
        import random

        from raptor_spark.functions.dedup import minhash_lsh_pairs

        rng = random.Random(42)
        vocab = [f"w{i}" for i in range(30)]
        corpus_rows = [
            (i, " ".join(rng.choice(vocab) for _ in range(12)))
            for i in range(20)
        ]
        new_rows = [
            (100 + i, " ".join(rng.choice(vocab) for _ in range(12)))
            for i in range(10)
        ]
        # plant one exact clone and one mutation of a corpus doc
        new_rows[0] = (100, corpus_rows[3][1])
        new_rows[1] = (101, corpus_rows[5][1].replace("w", "x", 1))

        corpus = _docs(spark, corpus_rows)
        new = _docs(spark, new_rows)
        fp, band = corpus_signature_store(corpus, "doc_id")
        inc = {
            r["doc_id"]: r["n_bands_hit"]
            for r in dedup_against_corpus(new, fp, band, "doc_id").collect()
        }

        both = corpus.unionByName(new)
        pairs = minhash_lsh_pairs(both, "doc_id", max_bucket=0).collect()
        cross = {}
        for p in pairs:
            lo, hi = p["id_a"], p["id_b"]
            if lo < 100 <= hi:  # (corpus, new) pair
                cross[hi] = max(cross.get(hi, 0), p["n_shared_bands"])
        for doc_id, hits in inc.items():
            assert (hits > 0) == (doc_id in cross), (doc_id, hits, cross)
            if hits > 0:
                # the store probe counts this doc's bands present in
                # the corpus — at least the best pairwise band overlap
                assert hits >= cross[doc_id]


class TestTokenBudgetSample:
    def _docs(self, spark):
        rows = []
        for i in range(30):
            rows.append((i, "a", 5))          # source a: 30 docs x 5 tokens
        for i in range(100, 104):
            rows.append((i, "b", 10))         # source b: 4 docs x 10
        rows.append((200, "c", 99))           # source c: unbudgeted
        return spark.createDataFrame(rows, ["doc_id", "source", "n_tokens"])

    @staticmethod
    def _key(doc_id, salt="budget"):
        import hashlib

        return int(hashlib.md5(f"{salt}|{doc_id}".encode()).hexdigest()[:15], 16)

    def _naive(self, rows, budgets):
        out = {}
        by_src = {}
        for doc_id, src, tok in rows:
            by_src.setdefault(src, []).append((self._key(doc_id), doc_id, tok))
        for src, lst in by_src.items():
            if src not in budgets:
                continue
            cum = 0
            for _k, doc_id, tok in sorted(lst):
                cum += tok
                if cum - tok < budgets[src]:
                    out[doc_id] = cum
        return out

    @pytest.mark.parametrize("n_blocks", [1, 7, 256])
    def test_matches_naive_greedy_fill_any_blocking(self, spark, n_blocks):
        from raptor_spark.functions.sampling import sample_to_token_budget

        budgets = {"a": 62, "b": 25}
        got = {
            r["doc_id"]: r["cum_tokens"]
            for r in sample_to_token_budget(
                self._docs(spark), budgets, n_blocks=n_blocks
            ).collect()
        }
        rows = [(r["doc_id"], r["source"], r["n_tokens"])
                for r in self._docs(spark).collect()]
        assert got == self._naive(rows, budgets)

    def test_unbudgeted_source_dropped_and_crossing_doc_kept(self, spark):
        from raptor_spark.functions.sampling import sample_to_token_budget

        out = sample_to_token_budget(
            self._docs(spark), {"a": 12, "b": 1000}
        ).collect()
        srcs = {r["source"] for r in out}
        assert "c" not in srcs
        a = sorted(r["cum_tokens"] for r in out if r["source"] == "a")
        assert a == [5, 10, 15]  # 15 crosses the 12 budget and is kept
        b = [r for r in out if r["source"] == "b"]
        assert len(b) == 4  # budget larger than the source: all kept

    def test_zero_budget_and_giant_first_doc(self, spark):
        """Edge shapes from the adversarial-gate extension: a budget of
        0 admits nothing (cum-n < 0 never holds); a doc bigger than the
        ENTIRE budget is kept iff it is the hash-order head (greedy
        crossing rule at the extreme), and everything after it drops."""
        from raptor_spark.functions.sampling import sample_to_token_budget

        out = sample_to_token_budget(
            self._docs(spark), {"a": 0, "b": 1000}
        ).collect()
        assert not [r for r in out if r["source"] == "a"]

        rows = [(r["doc_id"], r["source"], r["n_tokens"])
                for r in self._docs(spark).collect()]
        a_rows = [(self._key(d), d, t) for d, s, t in rows if s == "a"]
        head = min(a_rows)[1]
        giant = {
            r["doc_id"]: r["cum_tokens"]
            for r in sample_to_token_budget(
                self._docs(spark).withColumn(
                    "n_tokens",
                    F.when(F.col("doc_id") == head, F.lit(10_000)).otherwise(
                        F.col("n_tokens")
                    ),
                ),
                {"a": 12},
            ).collect()
        }
        assert list(giant) == [head]

    def test_single_doc_source(self, spark):
        from raptor_spark.functions.sampling import sample_to_token_budget

        docs = spark.createDataFrame(
            [(1, "solo", 7)], "doc_id long, source string, n_tokens long"
        )
        out = sample_to_token_budget(docs, {"solo": 3}).collect()
        assert [(r["doc_id"], r["cum_tokens"]) for r in out] == [(1, 7)]

    def test_rejects_nonpositive_blocks(self, spark):
        from raptor_spark.functions.sampling import sample_to_token_budget

        with pytest.raises(ValueError):
            sample_to_token_budget(self._docs(spark), {"a": 1}, n_blocks=0)
