"""BM25 retrieval (functions/retrieval.py) unit tests. No reference
analog — training-pipeline extension; the bm25_search oracle row pins
cross-engine parity."""

from __future__ import annotations

import math

import pytest

from raptor_spark.functions.retrieval import bm25_topk


def _docs(spark):
    rows = [
        (1, "spark spark spark window"),     # heavy on 'spark'
        (2, "window window table"),
        (3, "table row filter batch merge"),  # no query terms
        (4, "spark window"),
        (5, "spark table table table table table table table"),  # long doc
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bm25_ref(corpus, terms, k1=1.2, b=0.75, quant=1_000_000):
    """Plain-Python reference (same quantization)."""
    toks = {d: t.split() for d, t in corpus}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    scores = {}
    for d, tok in toks.items():
        qs = 0
        for t in set(terms):
            tf = tok.count(t)
            if tf == 0:
                continue
            df = sum(1 for v in toks.values() if t in v)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            s = idf * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * len(tok) / avgdl)
            )
            qs += math.floor(s * quant + 0.5)
        if qs:
            scores[d] = math.floor((qs / quant) * 1e6 + 0.5) / 1e6
    return scores


def test_bm25_matches_python_reference(spark):
    corpus = [
        (1, "spark spark spark window"),
        (2, "window window table"),
        (3, "table row filter batch merge"),
        (4, "spark window"),
        (5, "spark table table table table table table table"),
    ]
    got = {r["doc_id"]: r["score6"] for r in
           bm25_topk(_docs(spark), ["spark", "window"], k=10).collect()}
    want = _bm25_ref(corpus, ["spark", "window"])
    assert got == pytest.approx(want, abs=1e-6)


def test_bm25_ranking_properties(spark):
    out = bm25_topk(_docs(spark), ["spark", "window"], k=3).collect()
    assert [r["rank"] for r in out] == [1, 2, 3]
    ids = [r["doc_id"] for r in out]
    assert 3 not in ids  # doc without query terms never scores
    # doc 1 (tf=3 'spark' + 'window', short) must beat doc 5 (tf=1, long)
    assert ids[0] == 1
    scores = [r["score6"] for r in out]
    assert scores == sorted(scores, reverse=True)


def test_bm25_dedups_terms_and_validates(spark):
    a = bm25_topk(_docs(spark), ["spark", "spark"], k=5).collect()
    c = bm25_topk(_docs(spark), ["spark"], k=5).collect()
    assert a == c  # bag-of-words query: repeated term counted once
    with pytest.raises(ValueError):
        bm25_topk(_docs(spark), [], k=5)


def test_bm25_plan_topk_no_global_sort(spark):
    plan = (
        bm25_topk(_docs(spark), ["spark"], k=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestHybrid:
    def _tables(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "spark spark spark window"),
                (2, "window window table"),
                (3, "table row filter batch merge"),
                (4, "spark window"),
                (5, "spark table table table table table table table"),
            ],
            "doc_id long, text string",
        )
        embs = spark.createDataFrame(
            [
                (1, [1.0, 0.0]),
                (2, [0.0, 1.0]),
                (3, [1.0, 1.0]),
                (4, [0.0, 0.0]),  # zero vector — guard path
                # doc 5 has NO embedding row — must still rank (cos 0)
                (7, [1.0, 0.0]),  # the query vector
            ],
            "vec_id long, embedding array<double>",
        )
        return docs, embs

    def test_blend_and_zero_norm_guard(self, spark):
        from raptor_spark.functions.retrieval import hybrid_topk

        docs, embs = self._tables(spark)
        out = hybrid_topk(
            docs, embs, ["spark", "window"], query_vec_id=7, k=5, k_lex=5
        ).collect()
        by_id = {r["doc_id"]: r for r in out}
        # zero-norm embedding scores cosine 0.0, not NULL/NaN
        assert by_id[4]["cos6"] == 0.0
        # a candidate WITHOUT an embedding row is kept, cosine 0.0 —
        # the top lexical hit must never silently vanish
        assert by_id[5]["cos6"] == 0.0
        assert by_id[5]["score6"] > 0
        # doc 1 is aligned with the query vector → cosine 1.0
        assert by_id[1]["cos6"] == 1.0
        # blend: hybrid6 = round6(0.5*score6/max + 0.5*cos6), and rank
        # follows (hybrid6 desc, doc_id)
        mx = max(r["score6"] for r in out)
        import math

        for r in out:
            want = (
                math.floor(
                    (0.5 * (r["score6"] / mx) + 0.5 * r["cos6"]) * 1e6 + 0.5
                )
                / 1e6
            )
            assert r["hybrid6"] == want
        ranked = sorted(out, key=lambda r: (-r["hybrid6"], r["doc_id"]))
        assert [r["rank"] for r in ranked] == list(range(1, len(out) + 1))

    def test_missing_query_vec_id_fails_fast(self, spark):
        # a typo'd vec id must raise, not silently return zero rows
        # (the broadcast cross join against an empty qv empties
        # everything) — ADVICE r3
        import pytest

        from raptor_spark.functions.retrieval import hybrid_topk

        docs, embs = self._tables(spark)
        with pytest.raises(ValueError, match="query_vec_id"):
            hybrid_topk(docs, embs, ["spark"], query_vec_id=999, k=3)

    def test_embeddings_side_never_shuffles(self, spark):
        from raptor_spark.functions.retrieval import hybrid_topk

        docs, embs = self._tables(spark)
        df = hybrid_topk(
            docs, embs, ["spark"], query_vec_id=7, k=3, k_lex=5
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        # candidates and query vector broadcast into the embeddings
        # probe — a corpus-side Exchange in stage 2 would break at
        # scale. "Some broadcast exists" is not enough (bm25's stage-1
        # broadcasts would satisfy it); the real property is that NO
        # join degraded to a shuffle join.
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
        assert "ShuffledHashJoin" not in plan
