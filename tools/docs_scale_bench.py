#!/usr/bin/env python
"""Documents-pipeline scale-up evidence: run the corpus operators on a
40× replicated sf0.1 documents table (200k docs, distinct ids, 64
partitions) and report wall + throughput vs the 5k-doc bench numbers.
These operators have no reference baseline (they extend the reference);
rising throughput at 40× the data is the scale evidence — fixed
overhead (codegen, task launch) dominates the tiny bench inputs.

    python tools/docs_scale_bench.py [--mult 40] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1/documents.parquet"
OUT = "/tmp/docs_scale_corpus"


def build(spark, mult: int):
    from pyspark.sql import functions as F

    if not os.path.isdir(f"{OUT}_{mult}"):
        docs = spark.read.parquet(SRC)
        big = (
            docs.crossJoin(spark.range(mult).select(F.col("id").alias("_rep")))
            .select(
                (F.col("doc_id") * mult + F.col("_rep")).alias("doc_id"),
                "text",
                *[c for c in docs.columns if c not in ("doc_id", "text")],
            )
            .repartition(64)
        )
        big.write.mode("overwrite").parquet(f"{OUT}_{mult}")
    return spark.read.parquet(f"{OUT}_{mult}")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--mult", type=int, default=40)
    # CLAUDE.md measurement rule on this ±30%-variance VM: reps >= 3
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    from pyspark.sql import functions as F

    from raptor_spark.session import get_spark
    from raptor_spark.functions.dedup import (
        exact_dedup,
        minhash_lsh_pairs,
        ngram_collision_pairs,
    )
    from raptor_spark.functions.text import (
        chunk_docs,
        fingerprint,
        lang_id,
        quality_score,
        repetition_stats,
        token_count,
    )
    from pyspark.sql import Window as W

    spark = get_spark(app="docs_scale")
    try:
        df = build(spark, args.mult).cache()
        n = df.count()

        def clean_corpus(d):
            scored = d.select(
                "doc_id",
                token_count("text").alias("n_tokens"),
                quality_score("text").alias("quality"),
                lang_id("text").alias("_lang"),
                fingerprint("text").alias("fp"),
            ).filter(
                (F.col("quality") >= 0.5)
                & (F.col("n_tokens") >= 5)
                & (F.col("_lang") == "en")
            )
            w = W.partitionBy("fp")
            return (
                scored.withColumn("_rn", F.row_number().over(w.orderBy("doc_id")))
                .withColumn("n_dups", F.count(F.lit(1)).over(w))
                .filter(F.col("_rn") == 1)
            )

        def repetition(d):
            from raptor_spark.functions.text import repetition_stats_from_tokens

            staged = d.repartition(64).select(
                "doc_id",
                F.split(
                    F.trim(
                        F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
                    ),
                    " ",
                ).alias("_toks"),
            )
            rep, top = repetition_stats_from_tokens(F.col("_toks"))
            return staged.select("doc_id", rep.alias("r"), top.alias("t"))

        def pack(d):
            from raptor_spark.functions.packing import pack_sequences

            toks = d.select(
                "doc_id", token_count("text").alias("n_tokens")
            )
            return pack_sequences(
                toks, "doc_id", "n_tokens", seq_len=2048, n_blocks=256
            )

        def _unigram(d):
            from raptor_spark.functions.text import unigram_logprob

            return unigram_logprob(d, "doc_id", "text")

        def _bm25(d):
            from raptor_spark.functions.retrieval import bm25_topk

            return bm25_topk(d, ["spark", "window", "vector"], k=10)

        def _lsh_verify(d):
            # the 40x replication makes every doc a 40-clique (7.7M
            # candidate pairs — a density no real corpus has); verify
            # a deterministic 1% slice so the measured stage is the
            # realistic candidates:corpus ratio
            from raptor_spark.functions.dedup import (
                verify_pairs_edit_distance,
            )

            pairs = minhash_lsh_pairs(d, "doc_id").filter(
                (F.col("id_a") % 100 == 0)
            )
            return verify_pairs_edit_distance(pairs, d, "doc_id", "text")

        def _boiler(d):
            from raptor_spark.functions.text import (
                remove_boilerplate_segments,
            )

            return remove_boilerplate_segments(d, seg_tokens=3, max_docs=2)

        def _tokenize(d):
            from raptor_spark.functions.text import tokenize_corpus

            return tokenize_corpus(d, "doc_id", "text", vocab_size=1000)

        def _dedup_incremental(d):
            # corpus = 90% of docs builds the stores; the 10% "daily
            # batch" probes them (broadcast map-side, corpus unshuffled)
            from raptor_spark.functions.dedup import (
                corpus_signature_store,
                dedup_against_corpus,
            )

            corpus = d.filter(F.col("doc_id") % 10 != 0)
            new = d.filter(F.col("doc_id") % 10 == 0)
            fp, band = corpus_signature_store(corpus, "doc_id")
            return dedup_against_corpus(new, fp, band, "doc_id")

        def _quality_classifier(d):
            from raptor_spark.functions.classifier import (
                quality_classifier_fit,
                quality_classifier_score,
            )

            w = quality_classifier_fit(
                d,
                F.when(F.length("text") >= 300, F.lit(1.0)).otherwise(0.0),
                sample_n=10_000,
            )
            return d.select(
                "doc_id", quality_classifier_score(w, "text").alias("s")
            )

        def _domain_cap(d):
            # synthetic per-source grouping (the corpus has no URLs):
            # cap 100 docs per source stratum by quality
            from raptor_spark.functions.sampling import cap_per_group

            scored = d.select(
                "doc_id", "source", quality_score("text").alias("q")
            )
            return cap_per_group(
                scored,
                "source",
                [F.col("q").desc(), F.col("doc_id").asc()],
                n=100,
                salt_key=F.col("doc_id"),
            )

        def _hybrid(d):
            # embeddings stand-in: deterministic 16-dim vectors derived
            # from doc_id (the real table is 500 rows — too small at
            # this mult); measures the bm25 + broadcast re-rank shape
            from raptor_spark.functions.retrieval import hybrid_topk

            embs = d.select(
                F.col("doc_id").alias("vec_id"),
                F.array(
                    *[
                        (
                            F.pmod(F.xxhash64(F.col("doc_id") + F.lit(j)), 1000)
                            / 500.0
                            - 1.0
                        )
                        for j in range(16)
                    ]
                ).alias("embedding"),
            )
            return hybrid_topk(
                d, embs, ["spark", "window", "vector"], query_vec_id=7, k=10
            )

        def _span_scrub(d):
            # organic repeats only (no injected spans — throughput, not
            # parity): one shingle-hash shuffle + per-doc regroup
            from raptor_spark.functions.dedup import scrub_repeated_spans

            return scrub_repeated_spans(
                d.select("doc_id", "text"), k=6, min_count=2
            )

        def _url_dedup(d):
            # same synthetic URL surface-variant scheme as the driver
            # query (corpus has no organic URLs); map-only canon + ONE
            # count aggregate
            from raptor_spark.functions.text import canonical_url

            did = F.col("doc_id")
            g = (did % 23).cast("string")
            pg = (did % 5).cast("string")
            url = (
                F.when(did % 4 == 0, F.concat(
                    F.lit("https://WWW.Site"), g, F.lit(".example/Page"),
                    pg, F.lit("/")))
                .when(did % 4 == 1, F.concat(
                    F.lit("https://site"), g, F.lit(".example/Page"), pg,
                    F.lit("?utm_source=x&utm_medium=m")))
                .when(did % 4 == 2, F.concat(
                    F.lit("https://site"), g, F.lit(".example/Page"), pg,
                    F.lit("#frag")))
                .otherwise(F.concat(
                    F.lit("http://site"), g, F.lit(".example/Page"), pg,
                    F.lit("?gclid=z&utm_term=t")))
            )
            return (
                d.select("doc_id", canonical_url(url).alias("canon_url"))
                .where(F.col("canon_url").isNotNull())
                .groupBy("canon_url")
                .agg(F.min("doc_id").alias("keeper_doc_id"),
                     F.count(F.lit(1)).alias("n_dups"))
            )

        def _bloom(d):
            # m sized for the 40x corpus (driver query's 8192 bits
            # would saturate at 180k keys): 2^22 bits / 180k keys
            # ~= 23 bits/key, k=5 -> ~1e-4 fp; build stays ONE bit_or
            # aggregate of <= m/63 = 66k words
            from raptor_spark.functions.sketches import (
                bloom_build, bloom_probe,
            )

            docs = d.where(F.col("text").isNotNull()).select(
                "doc_id", fingerprint("text").alias("fp")
            )
            corpus = docs.where(F.col("doc_id") % 10 != 0)
            batch = docs.where(F.col("doc_id") % 10 == 0)
            bloom = bloom_build(corpus, "fp", m_bits=1 << 22, k=5)
            return bloom_probe(bloom, batch, "fp", m_bits=1 << 22, k=5)

        def _media_feats(d):
            from raptor_spark.functions.multimodal import (
                extract_features, synthesize_media,
            )

            return extract_features(synthesize_media(d, "doc_id"), dim=8)

        def _bmp_resize(d):
            # REAL pixels end-to-end at scale: encode 200k valid 24-bit
            # BMPs, decode + nearest-neighbor resample + re-encode, then
            # decode again for per-channel means (no stand-in anywhere)
            from raptor_spark.functions.multimodal import (
                bmp_pixel_features, resize_images, synthesize_bmp_media,
            )

            media = synthesize_bmp_media(d, "doc_id")
            return bmp_pixel_features(resize_images(media, 8, 8))

        def _semantic(d):
            # deterministic 16-dim vectors from doc_id (the real
            # embeddings table is 40x-cloned at this mult -> degenerate
            # cliques); measures LSH blocking + bucket pairing + CC at
            # 200k genuinely-distributed vectors, auto-sized planes
            from raptor_spark.functions.similarity import (
                semantic_dedup_corpus,
            )

            embs = d.select(
                F.col("doc_id").alias("vec_id"),
                F.array(*[
                    (F.pmod(F.xxhash64(F.col("doc_id") + F.lit(j)), 1000)
                     / 500.0 - 1.0).cast("float")
                    for j in range(16)
                ]).alias("embedding"),
            )
            return semantic_dedup_corpus(
                embs, dim=16, threshold=0.9, n_planes=None, max_bucket=200
            )

        OPS = {
            "exact_dedup": lambda d: exact_dedup(d, "doc_id"),
            "pack_sequences": pack,
            "minhash_lsh": lambda d: minhash_lsh_pairs(d, "doc_id"),
            "repetition": repetition,
            "doc_chunks": lambda d: chunk_docs(d),
            "clean_corpus": clean_corpus,
            "decontaminate": lambda d: ngram_collision_pairs(
                d.filter(F.col("doc_id") % 1000 != 0),
                d.filter(F.col("doc_id") % 1000 == 0),
                n=8,
                threshold=0.5,
            ),
            "unigram_logprob": _unigram,
            "bm25_search": _bm25,
            "lsh_verify": _lsh_verify,
            "boilerplate_scrub": _boiler,
            "tokenize_corpus": _tokenize,
            "dedup_incremental": _dedup_incremental,
            "quality_classifier": _quality_classifier,
            "domain_cap": _domain_cap,
            "hybrid_search": _hybrid,
            "repeated_span_scrub": _span_scrub,
            "url_dedup": _url_dedup,
            "bloom_dedup": _bloom,
            "media_features": _media_feats,
            "bmp_decode_resize": _bmp_resize,
            "semantic_dedup": _semantic,
        }

        def force(out):
            return out.agg(
                F.bit_xor(F.xxhash64(*[F.col(c).cast("string") for c in out.columns])).alias("h"),
                F.count(F.lit(1)).alias("n"),
            ).collect()[0]["n"]

        results = {}
        for name, fn in OPS.items():
            best, rows = None, 0
            for _ in range(args.reps):
                t0 = time.perf_counter()
                rows = force(fn(df))
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            results[name] = {
                "wall_s": round(best, 2),
                "out_rows": rows,
                "docs_per_s": round(n / best, 0),
            }
        print(json.dumps({"corpus_docs": n, "ops": results}))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
