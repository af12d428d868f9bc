"""Driver-contract window policy: the per-round correctness gate only
checks the FIRST 50 entries of queries() (verified round 3: the keys of
CORRECTNESS_r03.json are exactly registration-order positions 0-49).
These tests pin the registration-order invariants so a refactor cannot
silently push a never-driver-checked query out of the window, and keep
bench.py's printed line inside the driver's tail-capture budget."""

from __future__ import annotations

import json

from raptor_spark.queries import QUERIES, ORACLE_SQL

DRIVER_WINDOW = 50

# Queries the driver had never hash-checked before round 4 (outside the
# r3 window; VERDICT r3 "Next round" item 2). They must sit inside the
# window until a CORRECTNESS_r{N}.json shows them green.
NEVER_CHECKED_BEFORE_R4 = {
    "knn_cosine", "embedding_neardup", "semantic_dedup", "ann_lsh",
    "ann_ivf", "ann_ivf_kmeans", "split_assign", "profile_docs",
    "lsh_verify", "embedding_quantize", "embedding_project",
    "conv_rollup", "unigram_logprob", "bm25_search", "pricing_summary",
    "revenue_by_nation", "topk_orders_per_cust", "shipping_priority",
    "cust_without_orders",
    # round-4 additions — never driver-checked until CORRECTNESS_r04
    "repeated_span_scrub", "url_dedup", "bloom_dedup",
}

# rows-only by design (accuracy gated by the companion hll_accuracy row)
NO_ORACLE_OK = {"window_approx_distinct_6h"}


def test_never_checked_queries_inside_driver_window():
    window = set(list(QUERIES)[:DRIVER_WINDOW])
    missing = NEVER_CHECKED_BEFORE_R4 - window
    assert not missing, (
        f"never-driver-checked queries outside the first {DRIVER_WINDOW} "
        f"registration slots: {sorted(missing)}"
    )


def test_every_query_has_oracle_or_is_pinned_rows_only():
    missing = set(QUERIES) - set(ORACLE_SQL) - NO_ORACLE_OK
    assert not missing, f"queries without an oracle twin: {sorted(missing)}"
    stale = set(ORACLE_SQL) - set(QUERIES)
    assert not stale, f"oracles without a query: {sorted(stale)}"


def test_entry_module_exports_registration_order():
    import __spark_entry__ as entry

    assert list(entry.queries()) == list(QUERIES)
    assert set(entry.oracle_sql()) == set(ORACLE_SQL)


def test_bench_printed_line_budget():
    """Reconstruct the worst-case printed bench line (every HEADLINE
    query at a pessimistic 3-digit-seconds time) and assert it fits the
    driver's tail-capture window. Round 3's 3.6 KB line was truncated
    mid-object -> BENCH_r03 parsed:null; this pins the fix."""
    import bench

    times = {name: 999.999 for name in bench.HEADLINE}
    line = bench.build_line(times, 99999.999, "0.1", 9999999.9, 32)
    assert len(line) <= bench.LINE_BUDGET
    parsed = json.loads(line)
    assert parsed["value"] == 99999.999
    assert parsed["backfill_turns_per_sec"] == 9999999.9
    assert parsed["queries"]  # at least the slowest entries survive
