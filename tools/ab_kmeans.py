#!/usr/bin/env python
"""Same-JVM alternating A/B for ann_ivf_kmeans (VERDICT r3 ask #4):
the sampled Lloyd (sample_n=256, the 100 TB design) doubled in an
ISOLATED fresh-JVM run vs the r2 full-corpus variant (3.7 -> 7.4 s),
which exceeds this VM's documented ±40% drift band. Fresh-process
walls are inconclusive here (CLAUDE.md), so this interleaves variants
in ONE session over the same cached-by-the-OS input, pairwise.

Variants:
  full    — kmeans_fit(sample_n=None)   (r2 design: O(corpus)/iter)
  sampled — kmeans_fit(sample_n=256)    (r3 design: O(sample)/iter)
  query   — the whole q_ann_ivf_kmeans  (train + corpus assign + probe)

Usage: python tools/ab_kmeans.py [--sf-dir /root/testdata/sf0.1]
         [--reps 6] [--master local[32]]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    p.add_argument("--reps", type=int, default=6)
    p.add_argument("--master", default=None)
    args = p.parse_args()

    from pyspark.sql import functions as F

    from raptor_spark.session import get_spark
    from raptor_spark.functions.similarity import kmeans_fit
    from raptor_spark.queries import QUERIES

    spark = get_spark(app="ab_kmeans", master=args.master)
    try:
        emb = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")
        emb.count()  # pre-touch file cache

        def t_fit(sample_n):
            t0 = time.perf_counter()
            kmeans_fit(emb, dim=64, k=8, iters=2, sample_n=sample_n)
            return round(time.perf_counter() - t0, 3)

        def t_query():
            t0 = time.perf_counter()
            df = QUERIES["ann_ivf_kmeans"](spark, args.sf_dir)
            df.agg(F.bit_xor(F.xxhash64(*df.columns))).collect()
            return round(time.perf_counter() - t0, 3)

        variants = {
            "full": lambda: t_fit(None),
            "sampled": lambda: t_fit(256),
            "query": t_query,
        }
        # warmup every variant once (codegen caches)
        for fn in variants.values():
            fn()
        walls = {k: [] for k in variants}
        keys = list(variants)
        for i in range(args.reps):
            order = keys if i % 2 == 0 else keys[::-1]
            for k in order:
                walls[k].append(variants[k]())
        out = {k: {"walls": v, "min": min(v),
                   "median": sorted(v)[len(v) // 2]}
               for k, v in walls.items()}
        out["sampled_over_full_min"] = round(
            out["sampled"]["min"] / out["full"]["min"], 3
        )
        print(json.dumps(out))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
