"""Spend-tier stateful streaming operator — two API variants.

The reference has no streaming surface (1:1 table copier,
/root/reference/src/migrate/table_migrator.rs:43-114). This module
implements ONE set of semantics on BOTH arbitrary-state APIs:

- ``streaming_spend_tiers_classic`` — ``applyInPandasWithState``
  (the classic API, runs everywhere). This is the ATTESTED variant:
  it registers unconditionally and carries the closed-form hash
  oracle (VERDICT r11 next-round #2).
- ``streaming_spend_tiers`` — ``transformWithStateInPandas`` with a
  ``StatefulProcessor`` and named ``ValueState`` handles (the Spark-4
  successor that adds typed state variables, TTL, and timers). It
  ships state to Python workers over protobuf, so registration is
  gated on ``google.protobuf``; where available it runs under the
  SAME oracle.

Semantics: per user, emit a "spend tier unlocked" row each time
cumulative purchase value crosses a multiple of ``SPEND_TIER_CENTS``.
The RESULT SET is order-invariant (a user whose purchases total T
cents unlocks exactly T div STEP tiers with pinned tier values,
whatever the micro-batch arrival order), so the custom stateful
operator gets a FULL closed-form hash oracle instead of rows-only —
the user_milestones discipline (streaming/windows.py) applied here.

PRECONDITION (ADVICE r12): order-invariance holds only for
NON-NEGATIVE purchase amounts. A negative ``value`` (refund) lowers
the closed-form total, but the stateful fold cannot retract tiers it
already emitted — the two would diverge. The events fixture contains
no refunds (``value`` is generated positive, TESTDATA.md); a
production deployment with refunds must either pre-filter
``cents >= 0`` on the purchase stream or model refunds as a separate
compensating stream, because append-mode tier emissions are
irreversible by construction in BOTH API variants.

Scale notes (100 TB): state is two longs per user (running total +
last emitted tier folded into one value), partitioned by the grouping
key across the state store; transformWithState requires the RocksDB
state-store provider (state off-heap, changelog checkpointing) —
``run_bounded(state_store="rocksdb")`` wires exactly that, matching
the production guidance for large state.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from .windows import run_bounded, stream_events

SPEND_TIER_CENTS = 10_000  # one tier per $100 of cumulative purchases

_TIER_OUT = "user_id bigint, tier bigint, tier_cents bigint"


class SpendTierProcessor(StatefulProcessor):
    """Emit one row per newly crossed spend tier; state = running
    cumulative cents per user (a named ValueState)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._total = handle.getValueState("total", "total BIGINT")

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        prev = self._total.get()[0] if self._total.exists() else 0
        batch = 0
        for pdf in rows:
            batch += int(pdf["cents"].sum())
        new = prev + batch
        out = [
            {
                "user_id": int(user_id),
                "tier": t,
                "tier_cents": t * SPEND_TIER_CENTS,
            }
            for t in range(
                prev // SPEND_TIER_CENTS + 1,
                new // SPEND_TIER_CENTS + 1,
            )
        ]
        self._total.update((new,))
        if out:
            yield pd.DataFrame(out)

    def close(self) -> None:
        pass


def spend_tiers(events: DataFrame) -> DataFrame:
    """The transformWithStateInPandas plan over a purchase stream."""
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    return purchases.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=SpendTierProcessor(),
        outputStructType=_TIER_OUT,
        outputMode="append",
        timeMode="None",
    )


def streaming_spend_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract entry (module doc): order-invariant spend-tier
    rows from the new-API stateful processor, hash-checked against the
    closed form."""
    ev = stream_events(spark, f"{sf_dir}/events.parquet")
    out = run_bounded(spend_tiers(ev), "append", state_store="rocksdb")
    return out.orderBy("user_id", "tier")


# ---------------------------------------------------------------------------
# Classic-API twin: applyInPandasWithState (runs everywhere, hash-attested)
# ---------------------------------------------------------------------------

_TIER_STATE = "total bigint"


def _spend_tiers_fn(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Same semantics as SpendTierProcessor on the classic API: state is
    one long per user (running cumulative cents); each batch emits the
    tiers newly crossed by that batch's sum."""
    (user_id,) = key
    prev = state.get[0] if state.exists else 0
    batch = 0
    for pdf in batches:
        batch += int(pdf["cents"].sum())
    new = prev + batch
    state.update((new,))
    rows = [
        {"user_id": int(user_id), "tier": t, "tier_cents": t * SPEND_TIER_CENTS}
        for t in range(prev // SPEND_TIER_CENTS + 1, new // SPEND_TIER_CENTS + 1)
    ]
    yield pd.DataFrame(rows, columns=["user_id", "tier", "tier_cents"])


def spend_tiers_classic(events: DataFrame) -> DataFrame:
    """The applyInPandasWithState plan over the same purchase stream.

    Scale notes (100 TB): identical state shape to the TWS variant —
    one long per user, partitioned by the grouping key across the
    state store; watermark-free because the output is a pure running
    fold (no late-data eviction needed)."""
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    return purchases.groupBy("user_id").applyInPandasWithState(
        _spend_tiers_fn,
        outputStructType=_TIER_OUT,
        stateStructType=_TIER_STATE,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def streaming_spend_tiers_classic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract entry: the spend-tier semantics on the classic
    arbitrary-state API, hash-checked against the closed form. This is
    the variant every environment in the loop can attest; the
    transformWithStateInPandas twin above is the documented Spark-4
    alternative (protobuf-gated)."""
    ev = stream_events(spark, f"{sf_dir}/events.parquet")
    out = run_bounded(spend_tiers_classic(ev), "append")
    return out.orderBy("user_id", "tier")


def _tws_available() -> bool:
    """transformWithStateInPandas ships state to Python workers over
    protobuf; without the google.protobuf package the streaming runner
    aborts at init. Gate registration so the driver contract never
    carries a query this environment cannot run (README known
    limitations) — on an environment with protobuf installed the query
    self-registers and the closed-form oracle takes over."""
    import importlib.util

    try:
        # find_spec on a dotted name imports the parent package, so a
        # missing 'google' raises instead of returning None.
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        return False


_SPEND_TIER_SQL = f"""
    WITH tot AS (
        SELECT user_id,
               CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT))
                    AS BIGINT) AS total
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1),
    tiers AS (
        SELECT user_id,
               unnest(generate_series(
                   1, total // {SPEND_TIER_CENTS})) AS tier
        FROM tot
        WHERE total >= {SPEND_TIER_CENTS})
    SELECT user_id, CAST(tier AS BIGINT) AS tier,
           CAST(tier * {SPEND_TIER_CENTS} AS BIGINT) AS tier_cents
    FROM tiers
    ORDER BY user_id, tier
"""

QUERIES = {"streaming_spend_tiers_classic": streaming_spend_tiers_classic}
ORACLES = {"streaming_spend_tiers_classic": _SPEND_TIER_SQL}

if _tws_available():
    QUERIES["streaming_spend_tiers"] = streaming_spend_tiers
    ORACLES["streaming_spend_tiers"] = _SPEND_TIER_SQL
