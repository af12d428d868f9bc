"""chunk_docs: coverage/overlap invariants of the context-window
document segmentation operator."""

from pyspark.sql import functions as F

from raptor_spark.functions.text import chunk_docs


def test_chunk_docs_invariants(spark):
    rows = [
        (1, ""),                       # empty → one empty chunk
        (2, "a" * 99),                 # shorter than overlap
        (3, "b" * 500),                # exactly one chunk
        (4, "c" * 501),                # just over → two chunks
        (5, "xyz" * 1000),             # 3000 chars → ceil(2900/400)=8
        (6, None),                     # null ≡ empty
        (7, "héllo wörld — 日本語 " * 50),  # multibyte: char slicing
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_docs(df, chunk_chars=500, overlap=100)
    got = {r["doc_id"]: [] for r in out.collect()}
    for r in out.orderBy("doc_id", "chunk_idx").collect():
        got[r["doc_id"]].append(r)

    texts = {i: (t or "") for i, t in rows}
    for doc_id, chunks in got.items():
        text = texts[doc_id]
        n = max(1, -(-(max(len(text) - 100, -1)) // 400)) if len(text) > 100 else 1
        assert len(chunks) == chunks[0]["n_chunks"]
        assert [c["chunk_idx"] for c in chunks] == list(range(len(chunks)))
        # reconstruction: chunk i starts at i*400, 500 wide
        for c in chunks:
            start = c["chunk_idx"] * 400
            assert c["chunk"] == text[start : start + 500]
        # coverage: concatenating non-overlap prefixes + last chunk
        # reproduces the document exactly
        rebuilt = "".join(c["chunk"][:400] for c in chunks[:-1]) + chunks[-1]["chunk"]
        assert rebuilt == text
        # consecutive chunks share the 100-char overlap
        for a, b in zip(chunks, chunks[1:]):
            assert a["chunk"][400:] == b["chunk"][: len(a["chunk"]) - 400]


def test_chunk_docs_no_shuffle(spark):
    df = spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit("t" * 1200).alias("text")
    )
    plan = chunk_docs(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # explode-only fan-out
