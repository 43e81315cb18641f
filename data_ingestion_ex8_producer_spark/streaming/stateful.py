"""Custom stateful streaming operators (applyInPandasWithState) and
stream-stream joins — the streaming surface that has no SQL equivalent
(driver records rows-only checks for these; the tests pin semantics against
batch twins instead).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

USER_TOTALS_SCHEMA = "user_id bigint, n_events bigint, total_value double"
_STATE_SCHEMA = "n bigint, total double"


def _update_user_totals(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Running per-user event count + value sum across micro-batches.

    State is one (n, total) pair per user — constant size, no watermark
    needed.  Emits the updated running totals once per user per batch.
    """
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


def user_running_totals(events: DataFrame) -> DataFrame:
    """Arbitrary stateful aggregation: exact running totals per user,
    emitted every micro-batch (update mode)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=USER_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def purchases_after_signup(
    events: DataFrame, horizon: str = "2 hours", how: str = "inner"
) -> DataFrame:
    """Stream-stream interval join: purchases within 2 h after the same
    user's signup.  Both sides watermarked; the time-bound condition lets
    Spark expire join state instead of buffering streams forever.

    ``how="left_outer"`` emits signups that never matched a purchase with
    null purchase columns — but only once the watermark passes the signup's
    join horizon (Spark must prove no future purchase can match before it
    can emit the null row and drop the state)."""
    signups = (
        events.filter(F.col("event_type") == "signup")
        .select(
            F.col("user_id").alias("s_user"),
            F.col("ts").alias("signup_ts"),
            F.col("event_id").alias("signup_id"),
        )
        .withWatermark("signup_ts", "4 hours")
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("amount"),
        )
        .withWatermark("purchase_ts", "4 hours")
    )
    return signups.join(
        purchases,
        (F.col("s_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("signup_ts"))
        & (F.col("purchase_ts") <= F.col("signup_ts") + F.expr(f"INTERVAL {horizon}")),
        how,
    ).select(
        F.col("s_user").alias("user_id"),
        "signup_id",
        "purchase_id",
        "signup_ts",
        "purchase_ts",
        "amount",
    )


# --------------------------------------------------------------------------
# transformWithStateInPandas — the Spark 4.x arbitrary-state API
# --------------------------------------------------------------------------

USER_PROFILE_SCHEMA = (
    "user_id bigint, n_events bigint, total_value double, n_types bigint"
)


from pyspark.sql.streaming.stateful_processor import StatefulProcessor


class UserProfileProcessor(StatefulProcessor):
    """StatefulProcessor: per-user running profile built from TWO typed state
    variables — a ValueState (event count + value sum) and a MapState
    (per-event-type counts, whose size yields the distinct-type count).

    transformWithStateInPandas supersedes applyInPandasWithState in Spark
    4.x: state is declared as named, independently-evolvable variables
    (value/list/map, optional TTL) instead of one monolithic tuple, and the
    runtime can store each in its own RocksDB column family — the layout a
    100 TB streaming deployment needs for state that outgrows the heap.
    """

    def init(self, handle) -> None:  # StatefulProcessorHandle
        self._totals = handle.getValueState("totals", "n bigint, total double")
        self._type_counts = handle.getMapState(
            "type_counts", "event_type string", "cnt bigint"
        )

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd  # executor-side import

        n, total = (0, 0.0)
        if self._totals.exists():
            n, total = self._totals.get()
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
            for etype, cnt in pdf.groupby("event_type").size().items():
                prev = (
                    self._type_counts.getValue((etype,))[0]
                    if self._type_counts.containsKey((etype,))
                    else 0
                )
                self._type_counts.updateValue((etype,), (prev + int(cnt),))
        self._totals.update((n, total))
        n_types = sum(1 for _ in self._type_counts.keys())
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 2)],
                "n_types": [n_types],
            }
        )

    def close(self) -> None:
        pass


def user_profiles(events: DataFrame) -> DataFrame:
    """Arbitrary-state streaming profile per user via the Spark 4
    transformWithStateInPandas API (update mode, no timers).

    Runtime dependencies beyond pyspark: the ``protobuf`` package (the
    transformWithState state-server wire protocol is protobuf-framed) and
    the RocksDB state store provider.  The pinning test skips itself where
    protobuf is absent; ``user_running_totals`` above is the
    applyInPandasWithState equivalent with no extra dependency."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserProfileProcessor(),
        outputStructType=USER_PROFILE_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
