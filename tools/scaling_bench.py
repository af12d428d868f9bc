#!/usr/bin/env python
"""Two-cluster-size scaling benchmark (north rule evidence).

The rule requires >=0.8 throughput scaling efficiency from N to 4N
executors. No real cluster exists in this sandbox, so we run the SAME
backfill job in two fresh JVMs at two parallelism levels (default
local[8] vs local[32]) over the SAME parquet input and report:

    eff = (thr_4N / thr_N) / (4N / N)

Writes BENCH/BASELINE.md and prints one JSON line.

Usage:  python tools/scaling_bench.py [--n-convs 60000] [--low 8 --high 32]
Child:  python tools/scaling_bench.py --run local[8] --input DIR  (internal)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def child(master: str, input_dir: str, mode: str) -> None:
    from pyspark.sql import functions as F

    from raptor_spark.session import get_spark
    from raptor_spark.plans.historical import get_historical
    from raptor_spark.backfill import transcript_feature_set

    cores = int(master[master.find("[") + 1 : master.find("]")])
    # 4x cores: small per-task window buffers (no spill, short GC);
    # a real cluster sizes shuffle.partitions the same way
    spark = get_spark(
        app=f"scaling_{cores}", master=master, shuffle_partitions=4 * cores
    )
    try:
        def force(df):
            # agg over the hash: unpruneable (select(hash).count() lets
            # Catalyst drop the projection AND the window compute above)
            df.agg(F.bit_xor(F.xxhash64(*df.columns)).alias("h")).collect()

        src = spark.read.parquet(input_dir)
        # warmup: JVM + codegen on a slice, excluded from timing
        force(get_historical(src.limit(10_000), transcript_feature_set(), mode=mode))
        n_in = src.count()
        t0 = time.perf_counter()
        force(get_historical(src, transcript_feature_set(), mode=mode))
        wall = time.perf_counter() - t0
        print(json.dumps({
            "master": master, "cores": cores, "input_rows": n_in,
            "wall_s": round(wall, 3),
            "turns_per_sec": round(n_in / wall, 1),
        }))
    finally:
        spark.stop()


def measure(cores: int, input_dir: str, mode: str) -> dict:
    env = dict(os.environ)
    # 16g: headroom above the narrow-row window buffers without the
    # multi-second ParallelGC old-gen pauses a 48g heap produces
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--run", f"local[{cores}]",
         "--input", input_dir, "--mode", mode],
        capture_output=True, text=True, env=env, check=True,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--run", default=None, help="internal: single measurement")
    p.add_argument("--input", default=None)
    p.add_argument("--n-convs", type=int, default=60_000)
    p.add_argument("--low", type=int, default=8)
    p.add_argument("--high", type=int, default=32)
    p.add_argument("--reps", type=int, default=2,
                   help="repeat each level, keep best (VM noise)")
    p.add_argument("--input-dir", default=None,
                   help="reuse an existing transcripts parquet dir")
    p.add_argument("--mode", choices=["exact", "bucketed"], default="exact")
    # latest-run report; BENCH/BASELINE.md is the curated writeup
    p.add_argument("--out-md", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH", "scaling_latest.md"))
    args = p.parse_args()

    if args.run:
        child(args.run, args.input, args.mode)
        return

    if args.input_dir:
        input_dir = args.input_dir
    else:
        # generate the shared input once (fixed 64-way generation so
        # the input bytes are identical for both runs)
        from raptor_spark.session import get_spark
        from raptor_spark.sources.transcripts import transcripts

        tmp = tempfile.mkdtemp(prefix="scaling_input_")
        input_dir = os.path.join(tmp, "transcripts")
        spark = get_spark(app="scaling_gen", master="local[32]")
        transcripts(spark, n_convs=args.n_convs, partitions=64).write.parquet(input_dir)
        spark.stop()

    # Interleave low/high reps (L,H,L,H,...) so a machine-drift burst
    # inflates adjacent reps on BOTH sides instead of systematically
    # biasing whichever side happened to run during it (same lesson as
    # tools/ab_fused.py's alternating same-JVM reps).
    lo_runs: list = []
    hi_runs: list = []
    for _ in range(args.reps):
        lo_runs.append(measure(args.low, input_dir, args.mode))
        hi_runs.append(measure(args.high, input_dir, args.mode))

    def best(runs: list) -> dict:
        b = min(runs, key=lambda r: r["wall_s"])
        b["all_walls"] = [r["wall_s"] for r in runs]
        return b

    lo = best(lo_runs)
    hi = best(hi_runs)
    eff = (hi["turns_per_sec"] / lo["turns_per_sec"]) / (args.high / args.low)
    result = {
        "metric": "backfill scaling efficiency (localN as executor stand-in)",
        "input": args.input_dir or f"generated n_convs={args.n_convs}",
        "input_rows": lo["input_rows"],
        "mode": args.mode,
        "low": lo, "high": hi,
        "efficiency": round(eff, 3),
        "passes_0.8": eff >= 0.8,
    }
    os.makedirs(os.path.dirname(args.out_md), exist_ok=True)
    with open(args.out_md, "w") as f:
        f.write(f"""# BENCH/BASELINE — scaling evidence

North rule: throughput scaling efficiency >= 0.8 from N to 4N
executors. Sandbox stand-in: same historical-backfill job
(`transcript_feature_set`, mode={args.mode}) on the same
{lo['input_rows']:,}-turn parquet input, two fresh JVMs.

| parallelism | wall (s) | throughput (turns/s) |
|---|---|---|
| local[{args.low}] | {lo['wall_s']} | {lo['turns_per_sec']:,} |
| local[{args.high}] | {hi['wall_s']} | {hi['turns_per_sec']:,} |

**Scaling efficiency = ({hi['turns_per_sec']:,} / {lo['turns_per_sec']:,}) / ({args.high}/{args.low}) = {eff:.3f}** — {'PASS' if eff >= 0.8 else 'FAIL'} (target >= 0.8).

Raw JSON:

```json
{json.dumps(result, indent=2)}
```
""")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
