"""Distributed Bloom-filter join prefiltering — the shuffle-elimination
pattern Spark itself applies as runtime filter injection
(spark.sql.optimizer.runtime.bloomFilter.*), spelled explicitly so the
filter is portable, inspectable, and oracle-checkable.

Why it matters at 100 TB: a semi join of a huge fact against a modest key
set shuffles the whole fact unless the build side broadcasts. A Bloom
bitmap of the build keys is thousands of times smaller than the key set's
join hash table; probing it is a broadcast + projection (zero shuffle),
and only the surviving sliver pays the exact join. False positives cost
one wasted exact-join row each — never a wrong answer.

Construction is the standard Kirsch–Mitzenmacher double hashing
("Less hashing, same performance", 2006): two independent base hashes
h1, h2 from disjoint md5 hex slices, position_i = (h1 + i·h2) mod m.
The bitmap is a relation of (bucket, word) rows — 32 bits per word kept
in BIGINT so every shift stays positive and portable — built with one
``bit_or`` hash aggregate and broadcast to the probe side.

Everything is md5/modular/bit arithmetic (functions/hashing.py), so a SQL
oracle reproduces the EXACT bitmap, candidate set, and false-positive
count — the bloom behavior itself is under test, not just the final join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cyrela_etl_spark.functions.hashing import hex_prefix_long


def _positions(key: Column, m_bits: int, k: int) -> Column:
    """Array of ``k`` bloom bit positions for a string key (K-M double
    hashing over two disjoint 60-bit md5 slices)."""
    h1 = hex_prefix_long(key, 1, 15)
    h2 = hex_prefix_long(key, 16, 15)
    return F.array(*[((h1 + F.lit(i) * h2) % F.lit(m_bits)) for i in range(1, k + 1)])


def bloom_build(keys: DataFrame, key_col: str, m_bits: int = 65536, k: int = 3) -> DataFrame:
    """(bucket, word) bitmap relation of the build side's keys: explode
    each key's k positions, one hash agg of ``bit_or(1 << pos%32)`` per
    32-bit bucket. Output is ≤ m_bits/32 rows — broadcastable at any
    build-side cardinality that makes bloom pruning worthwhile."""
    return (
        keys.select(F.explode(_positions(F.col(key_col), m_bits, k)).alias("pos"))
        .select(
            (F.col("pos") / 32).cast("long").alias("bucket"),
            # shiftleft's bit count is column-valued here, so spell it in
            # SQL (the Python API only takes an int literal)
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias("w"),
        )
        .groupBy("bucket")
        .agg(F.expr("bit_or(w)").alias("word"))
    )


def bloom_probe(
    probe_keys: DataFrame, bitmap: DataFrame, key_col: str, m_bits: int = 65536, k: int = 3
) -> DataFrame:
    """Keys of ``probe_keys`` whose k positions are ALL set in the bitmap
    (the bloom candidates). Plan: explode k positions per key, equi-join
    the broadcast bitmap, test the bit in a projection, keep keys with k
    hits. No shuffle touches the probe side until the tiny candidate
    aggregation."""
    probed = (
        probe_keys.select(
            F.col(key_col),
            F.posexplode(_positions(F.col(key_col), m_bits, k)).alias("i", "pos"),
        )
        .select(
            key_col,
            (F.col("pos") / 32).cast("long").alias("bucket"),
            (F.col("pos") % 32).cast("int").alias("bit"),
        )
        .join(F.broadcast(bitmap), "bucket", "left")
        .select(
            key_col,
            F.expr(
                "CASE WHEN shiftrightunsigned(COALESCE(word, CAST(0 AS BIGINT)), bit) & 1 = 1"
                " THEN 1 ELSE 0 END"
            ).alias("hit"),
        )
    )
    return (
        probed.groupBy(key_col)
        .agg(F.sum("hit").alias("__hits"))
        .filter(F.col("__hits") == k)
        .select(key_col)
    )


def bloom_prefilter_report(
    build_keys: DataFrame,
    probe_keys: DataFrame,
    key_col: str,
    m_bits: int = 65536,
    k: int = 3,
) -> DataFrame:
    """One-row audit of the full prefilter pipeline: build-key count,
    probe-key count, bloom candidates, exact-verified matches, and the
    false-positive count the bloom traded for its size. ``distinct``
    keys on both sides (bloom pruning is a key-set question)."""
    # Each distinct'd key set and the candidate sliver feed two consumers
    # (their count and the next stage) — persist so the report plan
    # computes each once (MEMORY_AND_DISK, spillable; b and candidates
    # are small by contract, p is key-sized).
    b = build_keys.select(F.col(key_col)).distinct().persist()  # release: caller (cache contract, queries/__init__)
    p = probe_keys.select(F.col(key_col)).distinct().persist()  # release: caller (cache contract, queries/__init__)
    bitmap = bloom_build(b, key_col, m_bits, k)
    candidates = bloom_probe(p, bitmap, key_col, m_bits, k).persist()  # release: caller (cache contract, queries/__init__)
    verified = candidates.join(b, key_col, "left_semi")
    return (
        b.agg(F.count(F.lit(1)).cast("long").alias("n_build_keys"))
        .crossJoin(p.agg(F.count(F.lit(1)).cast("long").alias("n_probe_keys")))
        .crossJoin(candidates.agg(F.count(F.lit(1)).cast("long").alias("n_candidates")))
        .crossJoin(verified.agg(F.count(F.lit(1)).cast("long").alias("n_verified")))
        .select(
            "n_build_keys",
            "n_probe_keys",
            "n_candidates",
            "n_verified",
            (F.col("n_candidates") - F.col("n_verified")).alias("n_false_positives"),
        )
    )
