"""Z-order (Morton) clustering: multi-dimensional layout for file pruning.

The lakehouse answer to "my queries filter on BOTH user and time": a
space-filling curve interleaves the bits of the two keys, so sorting /
partitioning by the z-value co-locates rows that are close in EITHER
dimension — one layout serves both predicates, where sorting by
(user, ts) serves only the leading key. Delta/Iceberg expose this as
OPTIMIZE ZORDER; Spark has no native operator, so this module supplies
it as pure integer column math (shift/and/or — whole-stage codegen,
exact in any engine, hence a full DuckDB hash oracle).

At 100 TB the flow is: ``z_value`` as the write's ``partitionBy`` (or
``repartitionByRange`` sort key) bucket → a 2-D query rectangle maps to
a SMALL set of z-buckets (``buckets_for_rect``, driver-side metadata
math) → the scan prunes every other partition directory. The pruning
win is asserted on real parquet in tests/test_zorder.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..io import load_table

Z_BITS = 8  # low 8 bits per dimension -> z in [0, 65536)
BUCKET_SHIFT = 8  # z >> 8 -> 256 partition buckets


def z_value(a: Column, b: Column, bits: int = Z_BITS) -> Column:
    """Interleave the low ``bits`` of two non-negative ints (Morton code).

    Built as a sum of disjoint-bit terms (equivalent to OR), each a
    shift/mask — stays inside whole-stage codegen.
    """
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("long")


def _interleave_py(a: int, b: int, bits: int = Z_BITS) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def buckets_for_rect(
    u_lo: int, u_hi: int, h_lo: int, h_hi: int, bits: int = Z_BITS
) -> list[int]:
    """Driver-side metadata math: the z-buckets intersecting a query
    rectangle [u_lo, u_hi] x [h_lo, h_hi] (inclusive, already masked to
    ``bits``). Enumerates the coarse bucket grid (each bucket covers a
    2^(BUCKET_SHIFT/2)-square of cells), so cost is #buckets, not #cells —
    the same class of driver work as partition listing.
    """
    half = BUCKET_SHIFT // 2  # bits of each dimension folded into a bucket
    out = set()
    for ub in range(u_lo >> half, (u_hi >> half) + 1):
        for hb in range(h_lo >> half, (h_hi >> half) + 1):
            out.add(_interleave_py(ub, hb, bits - half))
    return sorted(out)


def q_zorder_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order key assignment over events: (user_id low bits, hour-of-
    epoch low bits) -> z value + partition bucket. The exact bit math a
    layout job runs before ``write.partitionBy("z_bucket")``.
    """
    ev = load_table(spark, sf_dir, "events")
    epoch_s = F.col("ts").cast("timestamp").cast("long")
    u = F.col("user_id").bitwiseAND(F.lit((1 << Z_BITS) - 1))
    # exact integer hour: subtract the remainder before dividing so the
    # double quotient is an integer (< 2^53, exactly representable)
    hours = (epoch_s - epoch_s % F.lit(3600)) / F.lit(3600)
    h = hours.cast("long").bitwiseAND(F.lit((1 << Z_BITS) - 1))
    z = z_value(u, h)
    return (
        ev.select(
            "event_id",
            u.alias("u_key"),
            h.alias("h_key"),
            z.alias("z"),
            F.shiftright(z, BUCKET_SHIFT).alias("z_bucket"),
        )
        .orderBy("event_id")
    )


QUERIES = {
    "q_zorder_index": q_zorder_index,
}

_Z_SQL_TERMS = " + ".join(
    f"(((u >> {i}) & 1) << {2 * i}) + (((h >> {i}) & 1) << {2 * i + 1})"
    for i in range(Z_BITS)
)

ORACLES = {
    "q_zorder_index": f"""
        WITH k AS (
            SELECT event_id,
                   user_id & {(1 << Z_BITS) - 1} AS u,
                   (CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) // 3600)
                       & {(1 << Z_BITS) - 1} AS h
            FROM events)
        SELECT event_id,
               u AS u_key,
               h AS h_key,
               CAST({_Z_SQL_TERMS} AS BIGINT) AS z,
               CAST(({_Z_SQL_TERMS}) >> {BUCKET_SHIFT} AS BIGINT) AS z_bucket
        FROM k
        ORDER BY event_id
    """,
}
