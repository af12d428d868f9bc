"""Embedding quantization/projection (functions/embeddings.py),
column profiling (functions/profile.py), and LSH-candidate
edit-distance verification (dedup.verify_pairs_edit_distance) unit
tests. No reference analog — training-pipeline extensions; oracle
rows embedding_quantize / embedding_project / profile_docs /
lsh_verify pin cross-engine parity.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from raptor_spark.functions.dedup import verify_pairs_edit_distance
from raptor_spark.functions.embeddings import (
    project_signed,
    quantize_int8,
    signed_planes,
)
from raptor_spark.functions.profile import profile_columns

DIM = 8


def _vecs(spark):
    rows = [
        (0, [float(i) for i in range(DIM)]),           # ramp
        (1, [0.0] * DIM),                               # zero vector
        (2, [-1.5, 2.5, -127.0, 0.25, 0.0, 1.0, -0.5, 3.0]),
        (3, [1e-4] * DIM),                              # tiny magnitudes
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_quantize_int8_roundtrip_bound(spark):
    out = quantize_int8(_vecs(spark), "vec_id", dim=DIM).collect()
    src = {r["vec_id"]: r["embedding"] for r in _vecs(spark).collect()}
    for r in out:
        v = [float(x) for x in src[r["vec_id"]]]
        scale = max(abs(x) for x in v) / 127.0
        assert all(abs(q) <= 127 for q in r["q"])
        assert r["q_sum"] == sum(r["q"])
        # symmetric quantization reconstructs within half a step
        for x, q in zip(v, r["q"]):
            assert abs(x - q * scale) <= scale / 2 + 1e-12
        assert r["mse6"] <= (scale / 2) ** 2 + 1e-9


def test_quantize_int8_zero_vector(spark):
    out = {r["vec_id"]: r for r in
           quantize_int8(_vecs(spark), "vec_id", dim=DIM).collect()}
    z = out[1]
    assert z["q"] == [0] * DIM and z["scale6"] == 0.0
    assert z["q_sum"] == 0 and z["mse6"] == 0.0
    # max-magnitude element always maps to ±127 exactly
    assert out[2]["q"][2] == -127


def test_project_signed_deterministic_and_linear(spark):
    df = _vecs(spark)
    a = {r["vec_id"]: r for r in
         project_signed(df, "vec_id", dim=DIM, out_dim=4).collect()}
    b = {r["vec_id"]: r for r in
         project_signed(df, "vec_id", dim=DIM, out_dim=4).collect()}
    assert a == b  # bit-identical rerun (no RNG state)
    doubled = df.select(
        "vec_id", F.transform("embedding", lambda x: x * 2).alias("embedding")
    )
    d = {r["vec_id"]: r for r in
         project_signed(doubled, "vec_id", dim=DIM, out_dim=4).collect()}
    for vid, row in a.items():
        for j in range(4):
            assert d[vid][f"p{j}"] == pytest.approx(2 * row[f"p{j}"], abs=1e-6)
    # different salt -> different planes
    s2 = {r["vec_id"]: r for r in
          project_signed(df, "vec_id", dim=DIM, out_dim=4, salt="x").collect()}
    assert s2[0] != a[0]


def test_signed_planes_shape_and_values():
    planes = signed_planes(16, 4, "rp")
    assert len(planes) == 4 and all(len(p) == 16 for p in planes)
    assert all(c in (-1.0, 1.0) for p in planes for c in p)
    assert planes == signed_planes(16, 4, "rp")  # deterministic


def test_profile_columns_known_stats(spark):
    df = spark.createDataFrame(
        [(1, "aa", None), (2, "bbb", 5), (3, None, 5), (3, "aa", None)],
        "id long, s string, x int",
    )
    prof = {r["col_name"]: r for r in profile_columns(df).collect()}
    assert prof["id"]["n_rows"] == 4 and prof["id"]["n_null"] == 0
    assert prof["id"]["n_distinct"] == 3
    assert prof["id"]["min_s"] == "1" and prof["id"]["max_s"] == "3"
    assert prof["s"]["n_null"] == 1 and prof["s"]["n_distinct"] == 2
    assert prof["s"]["avg_len6"] == pytest.approx((2 + 3 + 2) / 3, abs=1e-6)
    assert prof["x"]["n_null"] == 2 and prof["x"]["n_distinct"] == 1
    assert prof["x"]["min_s"] == "5" and prof["x"]["max_s"] == "5"


def test_profile_columns_all_null_and_approx(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "id long, s string")
    prof = {r["col_name"]: r for r in
            profile_columns(df, exact_distinct=False).collect()}
    assert prof["s"]["n_null"] == 2 and prof["s"]["n_distinct"] == 0
    assert prof["s"]["min_s"] is None and prof["s"]["avg_len6"] is None
    assert prof["id"]["n_distinct"] == 2  # approx exact on tiny input


def test_verify_pairs_edit_distance(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat sat"),
            (2, "THE  cat   sat"),   # normalizes identical to 1
            (3, "the cat sit"),      # 1 substitution vs 1
            (4, ""),
            (5, "   "),              # both normalize to empty
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (4, 5)], "id_a long, id_b long"
    )
    out = {(r["id_a"], r["id_b"]): r for r in
           verify_pairs_edit_distance(pairs, docs).collect()}
    assert out[(1, 2)]["lev"] == 0 and out[(1, 2)]["sim6"] == 1.0
    assert out[(1, 3)]["lev"] == 1
    assert out[(1, 3)]["sim6"] == pytest.approx(1 - 1 / 11, abs=1e-6)
    assert out[(4, 5)]["lev"] == 0 and out[(4, 5)]["sim6"] == 1.0


def test_unigram_logprob_known_corpus(spark):
    from raptor_spark.functions.text import unigram_logprob

    docs = spark.createDataFrame(
        [(1, "a a a"), (2, "b"), (3, "   ")],  # doc 3: zero tokens
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in unigram_logprob(docs).collect()}
    # vocab: a=3, b=1, total=4 -> bits(a)=-log2(3/4), bits(b)=2.0
    assert out[1]["n_tokens"] == 3
    assert out[1]["logprob6"] == pytest.approx(0.415037, abs=1e-6)
    assert out[2]["n_tokens"] == 1 and out[2]["logprob6"] == 2.0
    assert 3 not in out  # zero-token doc dropped (documented)


def test_unigram_logprob_plan_shape(spark):
    """No Python eval; the only single-partition exchange is the
    1-row corpus-total aggregate (which receives one pre-reduced
    partial per partition, never row data)."""
    from raptor_spark.functions.text import unigram_logprob

    docs = spark.createDataFrame(
        [(i, f"tok{i % 7} common") for i in range(50)],
        "doc_id long, text string",
    )
    plan = unigram_logprob(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange SinglePartition") == 1
    assert "partial_sum" in plan  # total is map-side combined


def test_profile_columns_negative_zero_double(spark):
    """Native COUNT(DISTINCT) normalizes -0.0 == 0.0; the stacked
    stringified-distinct pass must agree (IEEE x + 0.0 normalization),
    not report 2 for {'0.0', '-0.0'}."""
    df = spark.createDataFrame([(0.0,), (-0.0,), (1.5,)], "v double")
    prof = {r["col_name"]: r for r in profile_columns(df).collect()}
    assert prof["v"]["n_distinct"] == 2  # {0.0, 1.5}
