#!/usr/bin/env python
"""Same-JVM alternating A/B of two fused-plan variants (tools/, not
shipped API): loads a second historical.py as raptor_spark.plans.hist_b
and interleaves forced executions of both plans over the same cached
input in ONE session — removes JVM-start / machine-drift variance that
makes fresh-process comparisons on this VM (±30%) inconclusive.

Usage: python tools/ab_fused.py --input DIR --b-file /tmp/hist_r2.py \
         [--reps 4] [--master local[8]]
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--b-file", required=True)
    p.add_argument("--reps", type=int, default=4)
    p.add_argument("--master", default="local[8]")
    args = p.parse_args()

    from pyspark.sql import functions as F

    from raptor_spark.session import get_spark
    from raptor_spark.backfill import transcript_feature_set
    from raptor_spark.plans import historical as mod_a

    spec = importlib.util.spec_from_file_location(
        "raptor_spark.plans.hist_b", args.b_file
    )
    mod_b = importlib.util.module_from_spec(spec)
    sys.modules["raptor_spark.plans.hist_b"] = mod_b
    spec.loader.exec_module(mod_b)

    import re

    m = re.search(r"\[(\d+)\]", args.master)
    cores = int(m.group(1)) if m else (os.cpu_count() or 8)
    spark = get_spark(app="ab_fused", master=args.master,
                      shuffle_partitions=4 * cores)
    try:
        src = spark.read.parquet(args.input)
        fs = transcript_feature_set()

        def force(df):
            df.agg(F.bit_xor(F.xxhash64(*df.columns)).alias("h")).collect()

        def run(mod):
            t0 = time.perf_counter()
            force(mod.get_historical(src, fs))
            return time.perf_counter() - t0

        # warmup both
        for m in (mod_a, mod_b):
            force(m.get_historical(src.limit(100_000), fs))
        walls = {"a": [], "b": []}
        for i in range(args.reps):
            order = [("a", mod_a), ("b", mod_b)]
            if i % 2:
                order.reverse()
            for tag, m in order:
                walls[tag].append(round(run(m), 2))
        n = src.count()
        print(json.dumps({
            "input_rows": n,
            "a_walls": walls["a"], "b_walls": walls["b"],
            "a_min": min(walls["a"]), "b_min": min(walls["b"]),
            "a_median": sorted(walls["a"])[len(walls["a"]) // 2],
            "b_median": sorted(walls["b"])[len(walls["b"]) // 2],
        }))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
