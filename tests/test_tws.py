"""transformWithStateInPandas spend-tier operator: the processor's
tier arithmetic is pure and unit-testable without a streaming runtime;
the end-to-end streaming run is env-gated on google.protobuf (the
wire format the new API uses to ship state to Python workers — absent
in this container, README known limitations)."""

import pandas as pd
import pytest


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def _run_batches(batches):
    from db_migrator_spark.streaming.tws import SpendTierProcessor

    proc = SpendTierProcessor()
    proc._total = _FakeValueState()
    out = []
    for pdf in batches:
        for res in proc.handleInputRows((7,), iter([pdf]), None):
            out.extend(res.to_dict("records"))
    return out, proc._total.get()[0]


def test_spend_tier_processor_batching_invariance():
    from db_migrator_spark.streaming.tws import SPEND_TIER_CENTS

    cents = [4_000, 7_000, 1_000, 25_000, 3_000]  # total 40_000
    one_batch, total1 = _run_batches(
        [pd.DataFrame({"cents": cents})]
    )
    per_row, total2 = _run_batches(
        [pd.DataFrame({"cents": [c]}) for c in cents]
    )
    assert total1 == total2 == sum(cents)
    assert one_batch == per_row  # order- and batching-invariant
    tiers = [r["tier"] for r in one_batch]
    assert tiers == list(range(1, sum(cents) // SPEND_TIER_CENTS + 1))
    assert all(
        r["tier_cents"] == r["tier"] * SPEND_TIER_CENTS
        for r in one_batch
    )
    assert all(r["user_id"] == 7 for r in one_batch)


def test_spend_tiers_classic_end_to_end(spark):
    """The applyInPandasWithState twin runs everywhere: end-to-end
    bounded replay at sf0.001 against the closed form (per-user
    cumulative purchase cents // SPEND_TIER_CENTS tiers)."""
    import duckdb

    from db_migrator_spark.streaming.tws import (
        _SPEND_TIER_SQL,
        streaming_spend_tiers_classic,
    )

    rows = [
        tuple(r)
        for r in streaming_spend_tiers_classic(
            spark, "/root/testdata/sf0.001"
        ).collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        "'/root/testdata/sf0.001/events.parquet'"
    )
    expected = [tuple(r) for r in con.execute(_SPEND_TIER_SQL).fetchall()]
    assert rows == expected
    assert len(rows) > 0


def test_spend_tiers_streaming_end_to_end(spark):
    from db_migrator_spark.streaming.tws import _tws_available

    if not _tws_available():
        pytest.skip("google.protobuf absent: transformWithState "
                    "runner cannot initialize in this container")
    from db_migrator_spark.streaming.tws import streaming_spend_tiers

    rows = streaming_spend_tiers(spark, "/root/testdata/sf0.001").collect()
    assert all(r.tier_cents == r.tier * 10_000 for r in rows)
