"""Skew-aware join utilities.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
default in our sessions) handles most skew at runtime by splitting
oversized partitions. Salting is the *plan-level* fallback for the cases
AQE can't fix — e.g. a single hot key on BOTH sides of a sort-merge join,
or aggregations where one group dominates:

- ``salted_join``: replicate the small side SALT_N times, spray the big
  side's hot key across SALT_N sub-keys, join on (key, salt). The hot
  key's rows now land on SALT_N different reducers.
- ``two_phase_agg``: pre-aggregate on (key, salt) then re-aggregate on key
  — the classic partial-combine rescue for one-dominant-group sums.

Result-equivalence to the naive plans is pinned by tests/test_skew.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_SALT_N = 16


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_n: int = DEFAULT_SALT_N,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to hot keys on the big side.

    The big side gets a random-but-deterministic salt derived from a
    high-entropy row fingerprint (xxhash64 over all columns), so a hot
    key's rows split across ``salt_n`` reducers; the small side is
    replicated ``salt_n`` times (explode of a literal range — tiny, and
    usually broadcast anyway). Output equals ``big.join(small, key, how)``
    exactly for the supported join types.

    Only joins that preserve each small-side row's *matched* multiplicity
    are supported: right/full outer would surface ``salt_n`` null-padded
    copies of every unmatched small-side row (it was replicated per salt).
    """
    if how.replace("_", "").lower() not in {"inner", "left", "leftouter", "leftsemi", "leftanti", "semi", "anti", "cross"}:
        raise ValueError(
            f"salted_join does not support how='{how}': unmatched replicated "
            "small-side rows would appear salt_n times in right/full outer joins"
        )
    salt = (F.abs(F.xxhash64(*[F.col(c) for c in big.columns])) % salt_n).alias("__salt")
    big_salted = big.withColumn("__salt", salt)
    small_replicated = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_n)]))
    )
    out = big_salted.join(small_replicated, [key, "__salt"], how)
    return out.drop("__salt")


def two_phase_agg(
    df: DataFrame,
    key: str,
    agg_col: str,
    salt_n: int = DEFAULT_SALT_N,
) -> DataFrame:
    """Skew-safe exact sum+count per key: partial agg on (key, salt), final
    agg on key. DECIMAL accumulation keeps both phases order-independent."""
    salt = (F.abs(F.xxhash64(*[F.col(c) for c in df.columns])) % salt_n).alias("__salt")
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(key, "__salt")
        .agg(
            F.sum(F.col(agg_col).cast("decimal(25,6)")).alias("__psum"),
            F.count(F.lit(1)).alias("__pcnt"),
        )
    )
    return (
        partial.groupBy(key)
        .agg(
            F.sum("__psum").cast("double").alias("total"),
            F.sum("__pcnt").alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# Driver-contract queries: the skew paths must produce results identical to
# the naive plans, so both get plain-SQL oracles.
# ---------------------------------------------------------------------------


def q_skew_twophase_agg(spark, sf_dir: str) -> DataFrame:
    """Two-phase (salted) aggregation over the events stream keyed on
    event_type — a handful of giant groups, the exact shape where a naive
    groupBy leaves one reducer holding most of the table."""
    from ..io import load_table

    ev = load_table(spark, sf_dir, "events")
    return two_phase_agg(ev, "event_type", "value").orderBy("event_type")


def q_skew_salted_join(spark, sf_dir: str) -> DataFrame:
    """Salted lineitem x part join + per-brand revenue: result-identical
    to the plain join (the salt only re-routes rows across reducers)."""
    from ..io import load_table

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    joined = salted_join(
        li.withColumnRenamed("l_partkey", "p_partkey"), part, "p_partkey"
    )
    return (
        joined.groupBy("p_brand")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(25,6)")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("p_brand")
    )


QUERIES = {
    "q_skew_twophase_agg": q_skew_twophase_agg,
    "q_skew_salted_join": q_skew_salted_join,
}

ORACLES = {
    "q_skew_twophase_agg": """
        SELECT event_type,
               CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total,
               COUNT(*) AS n
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "q_skew_salted_join": """
        SELECT p_brand,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
        ORDER BY p_brand
    """,
}
