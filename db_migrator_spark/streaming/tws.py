"""transformWithStateInPandas operator (round 11f, Spark 4 API).

The reference has no streaming surface (1:1 table copier,
/root/reference/src/migrate/table_migrator.rs:43-114). The streaming
suite already covers the CLASSIC arbitrary-state API
(``windows.user_milestones`` on ``applyInPandasWithState``); this
module exercises its Spark-4 SUCCESSOR — ``transformWithStateInPandas``
with a ``StatefulProcessor`` and named ``ValueState`` handles (the API
that adds typed state variables, TTL, and timers) — so a user of
either stateful surface finds a tested pattern here.

``streaming_spend_tiers``: per user, emit a "spend tier unlocked" row
each time cumulative purchase value crosses a multiple of
``SPEND_TIER_CENTS``. The RESULT SET is order-invariant (a user whose
purchases total T cents unlocks exactly T div STEP tiers with pinned
tier values, whatever the micro-batch arrival order), so the custom
stateful operator gets a FULL closed-form hash oracle instead of
rows-only — the user_milestones discipline applied to the new API.

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


QUERIES = (
    {"streaming_spend_tiers": streaming_spend_tiers}
    if _tws_available()
    else {}
)

_ALL_ORACLES = {
    "streaming_spend_tiers": f"""
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
    """,
}

ORACLES = _ALL_ORACLES if _tws_available() else {}
