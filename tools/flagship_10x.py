#!/usr/bin/env python
"""Flagship backfill at a 10x corpus (VERDICT r3 ask #5).

The north rule targets 10^12-turn scale; all prior evidence topped out
at 48M turns. This runs the SAME flagship job (get_historical over
transcript_feature_set) on a 480M-turn input (n_convs=20M, same
deterministic generator), local[8], min-of-N fresh-JVM reps, and
reports per-rep turns/s plus shuffle read/write and spill bytes pulled
from the AppStatusStore (UI is disabled, so the REST API is not
available) for the TIMED run only (warmup metrics subtracted).

Usage:
  python tools/flagship_10x.py [--n-convs 20000000] [--reps 3]
      [--cores 8] [--shuffle-partitions 128]
      [--input-dir /tmp/scaling_input_10x]
Child (internal):
  python tools/flagship_10x.py --run local[8] --input DIR
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stage_totals(spark) -> dict:
    """Sum shuffle/spill bytes across all completed stages so far."""
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    # Spark 4.1 signature: stageList(statuses, details, withSummaries,
    # unsortedQuantiles, taskStatus) — empty statuses = all stages
    empty = sc._jvm.java.util.ArrayList()
    no_q = sc._gateway.new_array(sc._jvm.double, 0)
    tot = {"shuffle_read": 0, "shuffle_write": 0,
           "mem_spill": 0, "disk_spill": 0}
    it = store.stageList(empty, False, False, no_q, empty).iterator()
    while it.hasNext():
        s = it.next()
        tot["shuffle_read"] += s.shuffleReadBytes()
        tot["shuffle_write"] += s.shuffleWriteBytes()
        tot["mem_spill"] += s.memoryBytesSpilled()
        tot["disk_spill"] += s.diskBytesSpilled()
    return tot


def child(master: str, input_dir: str, shuffle_partitions: int) -> None:
    from pyspark.sql import functions as F

    from raptor_spark.session import get_spark
    from raptor_spark.plans.historical import get_historical
    from raptor_spark.backfill import transcript_feature_set

    spark = get_spark(
        app="flagship_10x", master=master,
        shuffle_partitions=shuffle_partitions,
    )
    try:
        def force(df):
            df.agg(F.bit_xor(F.xxhash64(*df.columns)).alias("h")).collect()

        src = spark.read.parquet(input_dir)
        # warmup (codegen + JIT) on a slice, excluded from timing
        force(get_historical(src.limit(10_000), transcript_feature_set()))
        n_in = src.count()
        base = _stage_totals(spark)
        t0 = time.perf_counter()
        force(get_historical(src, transcript_feature_set()))
        wall = time.perf_counter() - t0
        after = _stage_totals(spark)
        mb = lambda b: round(b / 1e6, 1)
        print(json.dumps({
            "master": master, "input_rows": n_in, "wall_s": round(wall, 3),
            "turns_per_sec": round(n_in / wall, 1),
            "shuffle_read_mb": mb(after["shuffle_read"] - base["shuffle_read"]),
            "shuffle_write_mb": mb(after["shuffle_write"] - base["shuffle_write"]),
            "mem_spill_mb": mb(after["mem_spill"] - base["mem_spill"]),
            "disk_spill_mb": mb(after["disk_spill"] - base["disk_spill"]),
        }))
    finally:
        spark.stop()


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--run", default=None)
    p.add_argument("--input", default=None)
    p.add_argument("--input-dir", default="/tmp/scaling_input_10x")
    p.add_argument("--n-convs", type=int, default=20_000_000)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--cores", type=int, default=8)
    # defaults = the measured-best 480M config (256 parts / 8g heap);
    # 16g triggers the ParallelGC pathology documented below and 128
    # partitions was the worst measured row — see BENCH/BASELINE.md
    p.add_argument("--shuffle-partitions", type=int, default=256)
    p.add_argument("--heap", default="8g")
    args = p.parse_args()

    if args.run:
        child(args.run, args.input, args.shuffle_partitions)
        return

    input_dir = os.path.join(args.input_dir, "transcripts")
    if not os.path.exists(input_dir):
        from raptor_spark.session import get_spark
        from raptor_spark.sources.transcripts import transcripts

        spark = get_spark(app="gen_10x")
        t0 = time.perf_counter()
        transcripts(
            spark, n_convs=args.n_convs, partitions=256
        ).write.parquet(input_dir)
        print(f"generated {input_dir} in {time.perf_counter() - t0:.0f}s",
              file=sys.stderr)
        spark.stop()

    env = dict(os.environ)
    # 8g beats 16g on this box: ParallelGC old-gen pauses in the
    # window stage roughly DOUBLE the wall at 16g once the reduce side
    # has >32 tasks (measured 53.5 s vs 101.5 s at 64 partitions on
    # the 48M input; stage GC time 110 s of 238 s executor time)
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", args.heap)
    runs = []
    for i in range(args.reps):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--run", f"local[{args.cores}]", "--input", input_dir,
             "--shuffle-partitions", str(args.shuffle_partitions)],
            capture_output=True, text=True, env=env, check=True,
        )
        line = [l for l in out.stdout.strip().splitlines()
                if l.startswith("{")][-1]
        runs.append(json.loads(line))
        print(runs[-1], file=sys.stderr)
    best = min(runs, key=lambda r: r["wall_s"]) if runs else None
    print(json.dumps({"reps": runs, "best": best}))


if __name__ == "__main__":
    main()
