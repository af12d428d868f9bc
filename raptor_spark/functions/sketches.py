"""Mergeable frequency sketches: count-min (CMS) cells + point
estimates, fully JVM-side and DETERMINISTIC — the d hash rows are
md5-derived (engine-portable, DuckDB can replay them bit-for-bit), so
unlike most sketch implementations the estimates themselves are
oracle-checkable, not just accuracy-gated.

Scale shape (the reason a 100 TB pipeline carries a CMS instead of a
token groupBy): the sketch build explodes each item into its d
(row, col) cells and aggregates counts per cell — map-side combine
collapses every partition to ≤ d·width partial rows, so the ONLY
shuffle moves ≤ partitions·d·width pre-aggregated rows regardless of
corpus size, and the finished sketch (d·width longs) broadcasts for
estimate joins. Exact per-token counts, by contrast, shuffle the
whole vocabulary. The classic CMS point-estimate guarantee applies
(est ≥ true; est ≤ true + εN w.p. 1−δ for width=⌈e/ε⌉, depth=⌈ln 1/δ⌉
— Cormode & Muthukrishnan 2005).

Reference has no sketch operators beyond approx-distinct; this is a
training-pipeline extension (corpus token statistics at scale), built
on the same md5-portability idiom as functions/dedup.md5_long.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import md5_long


def cms_hash(item: Column, row: int, width: int) -> Column:
    """Column: CMS column index of ``item`` for hash row ``row`` —
    md5_long("cms{row}|" + item) % width (md5_long is 60-bit
    non-negative, so % is already a pmod)."""
    return md5_long(
        F.concat(F.lit(f"cms{row}|"), item.cast("string"))
    ) % width


def cms_build(
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min sketch cells of an item stream: one row per occupied
    (row, col) cell with the summed count/weight. ≤ depth·width rows
    out; map-side combine keeps the shuffle bounded by d·width per
    input partition. Merging sketches of two corpora = union +
    re-groupBy (cells are additive)."""
    if depth <= 0 or width <= 0:
        raise ValueError(f"depth/width must be > 0, got {depth}/{width}")
    it = F.col(item_col)
    w = F.col(weight_col) if weight_col else F.lit(1).cast("long")
    rows = F.explode(
        F.array(*[
            F.struct(
                F.lit(r).alias("row"),
                cms_hash(it, r, width).alias("col"),
            )
            for r in range(depth)
        ])
    ).alias("_rc")
    return (
        items.select(rows, w.alias("_w"))
        .select("_rc.row", "_rc.col", "_w")
        .groupBy("row", "col")
        .agg(F.sum("_w").alias("cell"))
    )


def cms_estimate(
    queries: DataFrame,
    cells: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-estimate each query item's frequency: min over the d
    cells it hashes to. ``cells`` (≤ d·width rows) is broadcast, so
    the estimate pass is a map-side join — no shuffle of the corpus,
    one tiny shuffle for the per-item min."""
    it = F.col(item_col)
    probes = queries.select(
        "*",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("row"),
                    cms_hash(it, r, width).alias("col"),
                )
                for r in range(depth)
            ])
        ).alias("_rc"),
    ).select("*", "_rc.row", "_rc.col").drop("_rc")
    other = [c for c in queries.columns]
    return (
        probes.join(F.broadcast(cells), ["row", "col"], "left")
        # an empty cell means the item never occurred
        .withColumn("cell", F.coalesce(F.col("cell"), F.lit(0)))
        .groupBy(*other)
        .agg(F.min("cell").alias("est_n"))
    )


def bloom_hashes(item: Column) -> tuple[Column, Column]:
    """The two base hashes for double-hashing Bloom positions
    (Kirsch-Mitzenmacher: pos_i = h1 + i*h2 gives k independent-enough
    probes from two hashes). md5-derived like every sketch hash here,
    so DuckDB replays them bit-for-bit. STAGE these in their own
    select before building the position array — inlined in the
    transform lambda they re-evaluate (2 md5s x k per item)."""
    return (
        md5_long(F.concat(F.lit("bloomA|"), item.cast("string"))),
        md5_long(F.concat(F.lit("bloomB|"), item.cast("string"))),
    )


def _bloom_pos_arr(h1: Column, h2: Column, k: int, m_bits: int) -> Column:
    # reduce mod m BEFORE the i* multiply: h1/h2 are 60-bit and ANSI
    # mode THROWS on bigint overflow; post-reduction i*step tops out
    # at k*m — tiny. The step is FORCED ODD via 2*(h2 % (m/2)) + 1:
    # with power-of-two m an even step (worst case h2 % m == 0) makes
    # the k probes collapse onto few distinct bits, silently inflating
    # the false-positive rate; an odd step is coprime to m so all k
    # positions are distinct. Pure arithmetic (no bitwise-or) so the
    # DuckDB oracle replays it verbatim.
    step = (h2 % (m_bits // 2)) * 2 + 1
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: ((h1 % m_bits + i * step) % m_bits).cast("int"),
    )


def bloom_build(
    items: DataFrame,
    item_col: str,
    m_bits: int = 65536,
    k: int = 7,
) -> DataFrame:
    """Distributed mergeable Bloom filter: one row per OCCUPIED 63-bit
    word — ``(word, bits)`` with ``word = pos div 63``. 63 bits per
    long (not 64) so the set-bit shift never reaches the sign bit:
    ``1 << 63`` is engine-defined territory, ``1 << 62`` is portable.

    Scale shape (why a pipeline carries a Bloom instead of a
    fingerprint join for membership): each item explodes to k
    positions, and the bit_or aggregate map-side-combines every
    partition down to <= m_bits/63 partial rows — the ONLY shuffle
    moves <= partitions * m/63 rows regardless of corpus size, and
    the finished filter (<= m/63 longs) broadcasts for probe joins.
    Merging two corpora's filters = union + re-groupBy bit_or (the
    ``m_bits``/``k`` columns are constants, so ``max`` carries them).
    Guarantee: no false negatives by construction; false-positive
    rate ~ (1 - e^{-kn/m})^k. NULL items are EXCLUDED (a null has no
    positions; they would otherwise form a junk NULL-word row).

    The filter carries its parameters as constant ``m_bits``/``k``
    columns so :func:`bloom_probe` can ASSERT it was built with the
    geometry the probe is hashing for — probing with mismatched
    parameters would otherwise produce silent false negatives.
    """
    if m_bits <= 1 or k <= 0:
        raise ValueError(f"m_bits must be > 1 and k > 0, got {m_bits}/{k}")
    if m_bits & (m_bits - 1):
        # The forced-odd double-hash step (2*(h2 % (m/2)) + 1) is
        # coprime to m only when m is a power of two; any other m
        # silently degrades the k-distinct-probe guarantee and the
        # documented false-positive rate.
        raise ValueError(f"m_bits must be a power of two, got {m_bits}")
    staged = items.where(F.col(item_col).isNotNull()).select(
        *(c.alias(n) for c, n in zip(bloom_hashes(F.col(item_col)),
                                     ("_h1", "_h2")))
    )
    pos = staged.select(
        F.explode(
            _bloom_pos_arr(F.col("_h1"), F.col("_h2"), k, m_bits)
        ).alias("pos")
    )
    return (
        pos.select(
            F.expr("pos div 63").cast("int").alias("word"),
            # SQL form: F.shiftleft only takes a literal bit count
            F.expr("shiftleft(cast(1 as bigint), pos % 63)").alias("_b"),
        )
        .groupBy("word")
        .agg(F.bit_or("_b").alias("bits"))
        .select(
            "word", "bits",
            F.lit(m_bits).alias("m_bits"), F.lit(k).alias("k"),
        )
    )


def bloom_probe(
    bloom: DataFrame,
    batch: DataFrame,
    item_col: str,
    m_bits: int = 65536,
    k: int = 7,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """Membership probe of ``batch[item_col]`` against a built filter:
    every one of the item's k bits must be set. The filter side is
    <= m/63 rows — Spark broadcasts it (AQE picks BHJ without a
    hint; the explicit broadcast pins it), so the probe is map-only
    over the batch: explode k positions, broadcast-LEFT join the
    words, bool_and the bit tests (an ABSENT word row = bit unset =
    miss, via coalesce false). Returns batch columns + ``out_col``.

    Contract: ``m_bits``/``k`` must match the build — the filter
    carries them and every matched word row ASSERTS equality at
    runtime (a mismatch would otherwise be silent false negatives).
    Batch columns must uniquely key the rows (the regroup after the
    explode collapses exact-duplicate rows to one) and must not use
    the reserved working names. NULL items are excluded, mirroring
    the build."""
    reserved = {"_h1", "_h2", "pos", "word", "_bit", "_hit",
                "bits", "m_bits", "k", out_col}
    clash = reserved & set(batch.columns)
    if clash:
        raise ValueError(f"batch columns collide with reserved: {clash}")
    staged = batch.where(F.col(item_col).isNotNull()).select(
        "*",
        *(c.alias(n) for c, n in zip(bloom_hashes(F.col(item_col)),
                                     ("_h1", "_h2"))),
    )
    probes = staged.select(
        *batch.columns,
        F.explode(
            _bloom_pos_arr(F.col("_h1"), F.col("_h2"), k, m_bits)
        ).alias("pos"),
    ).select(
        *batch.columns,
        F.expr("pos div 63").cast("int").alias("word"),
        (F.col("pos") % 63).alias("_bit"),
    )
    geom_ok = F.assert_true(
        ((F.col("m_bits") == m_bits) & (F.col("k") == k))
        | F.col("bits").isNull(),
        F.lit(f"bloom_probe geometry mismatch: probe uses "
              f"m_bits={m_bits}, k={k}"),
    )
    hit = F.coalesce(
        F.expr("bits & shiftleft(cast(1 as bigint), _bit)") != 0,
        F.lit(False),
    )
    return (
        probes.join(F.broadcast(bloom), "word", "left")
        .select(*batch.columns, F.when(geom_ok.isNull(), hit).alias("_hit"))
        .groupBy(*batch.columns)
        .agg(F.bool_and("_hit").alias(out_col))
    )
