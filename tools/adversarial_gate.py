#!/usr/bin/env python
"""Adversarial exact-parity gate: build a stress dataset (tied
timestamps, null events, empty/unicode/whitespace documents, zero and
duplicate vectors) and run EVERY oracle query in bit-exact mode on it.

This caught a real fused-plan bug (same-ts update visibility under
rows-frame tie ordering) that three clean scale factors missed — run
it whenever plan code changes:

    python tools/adversarial_gate.py          # builds /tmp/sf_adv, runs gate
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

SRC = "/root/testdata/sf0.001"
DST = "/tmp/sf_adv"


def build() -> None:
    import duckdb

    shutil.rmtree(DST, ignore_errors=True)
    os.makedirs(DST)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem"]:
        shutil.copy(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
    # ties: a CLICK at the exact instant of a PURCHASE (same-ts
    # visibility; at most one update per (user, ts, feature) so the
    # tie-winner is well-defined in every engine) + null rows
    con.sql(f"""
COPY (
  SELECT * FROM '{SRC}/events.parquet'
  UNION ALL
  SELECT event_id + 1000000, ts, user_id, 'click', value + 7.77, props
  FROM '{SRC}/events.parquet' WHERE event_type = 'purchase' AND event_id % 5 = 0
  UNION ALL
  SELECT event_id + 2000000, ts + INTERVAL 1 SECOND, user_id, NULL, NULL, NULL
  FROM '{SRC}/events.parquet' WHERE event_id % 131 = 0
) TO '{DST}/events.parquet' (FORMAT PARQUET)
""")
    con.sql(f"""
COPY (
  SELECT * FROM '{SRC}/documents.parquet'
  UNION ALL
  SELECT doc_id, text, 'en', 'adv', length(text) FROM (VALUES
    (900001, ''), (900002, '   '), (900003, 'a'),
    (900004, 'héllo wörld — 日本語 текст مرحبا'),
    (900005, repeat('spam ham ', 500)),
    (900006, chr(10) || chr(9) || '  mixed   whitespace ' || chr(10)),
    -- NULL text: classifier training filter, norm/fingerprint
    -- coalesce paths, null feature propagation
    (900007, NULL),
    -- URL whose host the domain regex cannot capture: the
    -- extracted-domain-is-'' path (Spark regexp_extract returns '',
    -- DuckDB likewise — both sides must FILTER it, not group on it)
    (900008, 'edge case see https:///nohost and http://:99/x end')
  ) t(doc_id, text)
  UNION ALL
  -- packing/budget-fill stress (round-4): a 2500-token doc in a
  -- BUDGETED source (src2, budget 1500+400*(2%4)=2300 per queries.py
  -- _BUDGETS; budget_sample recounts tokens from text, ignoring the
  -- n_chars column) — longer than pack_sequences' seq_len=512 (spans
  -- 4+ sequences and multiple hash blocks) AND bigger than its
  -- source's ENTIRE token budget, so the greedy crossing-doc rule
  -- fires at the extreme (taken iff it is the hash-order head;
  -- everything hash-after it must drop)
  SELECT 900009, trim(repeat('tok ', 2500)), 'en', 'src2', 9999
  UNION ALL
  -- unbudgeted source drops BEFORE the prefix sum (the budget filter
  -- path; the single-doc-source prefix-sum shape itself is pinned by
  -- tests/test_incremental_cap.py::test_single_doc_source, since every
  -- budgeted source here has many docs)
  SELECT 900010, 'solo source lone doc', 'en', 'solo_src', 20
) TO '{DST}/documents.parquet' (FORMAT PARQUET)
""")
    con.sql(f"""
COPY (
  SELECT * FROM '{SRC}/embeddings.parquet'
  UNION ALL
  SELECT 900001, (SELECT list_transform(embedding, x -> CAST(0.0 AS FLOAT))
                  FROM '{SRC}/embeddings.parquet' WHERE vec_id = 0), 0
  UNION ALL
  SELECT 900002, (SELECT embedding FROM '{SRC}/embeddings.parquet'
                  WHERE vec_id = 7), 1
) TO '{DST}/embeddings.parquet' (FORMAT PARQUET)
""")


def main() -> None:
    build()
    env = dict(os.environ, SPARK_GRAFT_EXACT="1")
    rc = subprocess.call(
        [sys.executable, "tools/check_oracles.py", DST], env=env
    )
    sys.exit(rc)


if __name__ == "__main__":
    main()
