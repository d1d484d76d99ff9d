"""transformWithStateInPandas: the Spark 4.x arbitrary-state operator.

The repo's other custom stateful streaming kernel (streaming/jobs.py)
uses the older applyInPandasWithState API; this module exercises the
new StatefulProcessor surface (ValueState + explicit state schema,
RocksDB-only provider) so both generations of the arbitrary-state API
are covered.  Reference parity: the reference has no streaming at all
(SURVEY.md section 2.11 mandates the suite); the per-user profile this
kernel maintains is the streaming twin of the batch per-user rollup.

Environment gate: the transformWithState state-API client speaks
protobuf to the JVM state server, so running this operator requires the
``protobuf`` package in the Python worker environment.  This container
does not ship it (and installs are not permitted), so the operator is
NOT in the oracle registry -- tests/test_streaming.py skips the
end-to-end run unless ``google.protobuf`` imports, and a plan-only test
(analysis, no execution) proves the operator compiles against this
Spark regardless.  Round 7 verified the environment cannot supply the
runtime (no network for a vendored wheel; installs forbidden), so the
behavioral gap is closed from the other side:
``test_tws_processor_logic_against_fake_state`` drives this processor
through the ValueState contract with an in-memory fake handle across
multiple micro-batch slices and pins its final profiles to the batch
groupBy -- the processor SEMANTICS are proven even though the protobuf
transport cannot execute here.

Scale notes: state is ONE fixed-width row per user (four scalars), so
state size is O(distinct users) regardless of event volume; the
processor is keyed on user_id, so state is hash-partitioned across the
shuffle width like any groupBy -- no per-key iteration on the driver.
RocksDB keeps the working set off-heap and spills to disk, which is the
provider you would run at 100 TB anyway (changelog checkpointing keeps
commits incremental).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.streaming.stateful_processor import TimerValues

# One fixed-width state row per user: monotone event count, running
# value total, purchase count, max event-time in epoch micros (stored
# as BIGINT -- integer state compares exactly across replays, unlike a
# float epoch).
_STATE_SCHEMA = (
    "n_events BIGINT, total_value DOUBLE, n_purchases BIGINT, last_ts_us BIGINT"
)

PROFILE_OUTPUT_SCHEMA = (
    "user_id BIGINT, n_events BIGINT, total_value DOUBLE, "
    "n_purchases BIGINT, last_ts TIMESTAMP"
)


class UserProfileProcessor(StatefulProcessor):
    """Running per-user profile: event count, value total, purchase
    count, latest event time.  Emits the updated profile once per
    (user, micro-batch); because ``n_events`` is strictly monotone for
    a user across the batches that touch it, the final answer is the
    per-user row with the largest ``n_events``."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._profile = handle.getValueState("profile", _STATE_SCHEMA)

    def handleInputRows(
        self,
        key: Any,
        rows: Iterator[pd.DataFrame],
        timerValues: "TimerValues",
    ) -> Iterator[pd.DataFrame]:
        n_events, total_value, n_purchases, last_ts_us = (
            tuple(self._profile.get()) if self._profile.exists() else (0, 0.0, 0, 0)
        )
        for pdf in rows:
            n_events += len(pdf)
            total_value += float(pdf["value"].sum())
            n_purchases += int((pdf["event_type"] == "purchase").sum())
            batch_max_us = int(pdf["ts"].max().value // 1_000)
            last_ts_us = max(last_ts_us, batch_max_us)
        self._profile.update((n_events, total_value, n_purchases, last_ts_us))
        (user_id,) = key
        yield pd.DataFrame(
            {
                "user_id": [int(user_id)],
                "n_events": [n_events],
                "total_value": [total_value],
                "n_purchases": [n_purchases],
                "last_ts": [pd.Timestamp(last_ts_us, unit="us")],
            }
        )

    def close(self) -> None:
        pass


def user_profile_updates(events: DataFrame) -> DataFrame:
    """Per-user running profile via transformWithStateInPandas (update
    mode, no timers).  Requires the RocksDB state-store provider --
    callers set ``spark.sql.streaming.stateStore.providerClass`` before
    starting the query (see queries/streaming_q.py)."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserProfileProcessor(),
        outputStructType=PROFILE_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
