"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no custom state (SURVEY.md §2.8) — its only stateful op
is the built-in windowed aggregation. This module adds the engine's seam
for arbitrary per-key streaming state, demonstrated with a running
per-entity anomaly tracker: for each key, maintain the running max and
count and emit only events that set a new record.

Scale notes: state lives in the state store keyed by the group column —
per-key state here is two scalars, so memory is O(|entities|), not
O(events). The handler receives Arrow batches per key per micro-batch;
timeouts would evict idle keys (not needed for the bounded tests).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, ts timestamp, value double, prev_record double"
STATE_SCHEMA = "record double, n bigint"


def _track_records(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    # worker-side: self-contained, no package imports (see multimodal.py)
    if state.exists:
        record, n = state.get
    else:
        record, n = float("-inf"), 0
    out_rows = []
    for pdf in pdfs:
        for row in pdf.sort_values("ts").itertuples(index=False):
            n += 1
            if row.value > record:
                out_rows.append(
                    (key[0], row.ts, row.value, None if record == float("-inf") else record)
                )
                record = row.value
    state.update((record, n))
    if out_rows:
        yield pd.DataFrame(
            out_rows, columns=["user_id", "ts", "value", "prev_record"]
        )


def record_breaker_stream(events: DataFrame) -> DataFrame:
    """Emit only record-breaking events per entity, with the previous
    record attached — running-max state across micro-batches."""
    return events.groupBy("user_id").applyInPandasWithState(
        _track_records,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithState (Spark 4 arbitrary-state API) — the streaming face of
# the batch CDC latest-wins compaction (operators/warehouse.py::cdc_latest).
#
# ENVIRONMENT-GATED at runtime, implemented + semantics-tested here: the
# TWS Python driver worker needs the ``protobuf`` package, absent from this
# image (same treatment as the Kafka connector: the operator and its logic
# are real and tested without the runtime; only the socket/worker hop is
# gated). The processor's merge logic is unit-tested directly against a
# fake ValueState (tests/test_streaming.py), and plan construction — the
# API wiring — is asserted without starting the query.
# ---------------------------------------------------------------------------

try:  # pragma: no cover - import surface varies with pyspark build
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
except ImportError:  # pragma: no cover
    StatefulProcessor = object  # type: ignore[assignment,misc]
    StatefulProcessorHandle = object  # type: ignore[assignment,misc]

CDC_STATE_SCHEMA = "ts timestamp, event_id long, value double, op string"
CDC_OUTPUT_SCHEMA = "user_id long, ts timestamp, value double, is_deleted boolean"


def cdc_merge_latest(best: tuple | None, rows: Iterable[tuple]) -> tuple:
    """Pure latest-wins fold shared by the processor and its tests:
    ``rows`` are (ts, event_id, value, op) candidates; the max by
    (ts, event_id) wins — same total order as the batch ``cdc_latest``."""
    for cand in rows:
        if best is None or (cand[0], cand[1]) > (best[0], best[1]):
            best = cand
    assert best is not None
    return best


class CdcLatestProcessor(StatefulProcessor):
    """Per-key ValueState holding the latest change record; every
    micro-batch folds its rows in and emits the key's new current state
    (Update mode), with deletes surfaced as ``is_deleted`` rather than
    dropped — downstream sinks need the tombstone to retract.

    State is one fixed-width tuple per key — O(|keys|) in the store,
    independent of history length; RocksDB provider recommended so the
    keyspace can exceed executor memory.
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._latest = handle.getValueState("latest", CDC_STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        best = None
        if self._latest.exists():
            g = self._latest.get()
            best = (g[0], g[1], g[2], g[3])
        cands = (
            (r.ts, int(r.event_id), float(r.value), str(r.op))
            for pdf in rows
            for r in pdf.itertuples(index=False)
        )
        best = cdc_merge_latest(best, cands)
        self._latest.update(best)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "ts": [best[0]],
                "value": [best[2]],
                "is_deleted": [best[3] == "D"],
            }
        )

    def close(self) -> None:
        pass


def cdc_state_stream(events: DataFrame) -> DataFrame:
    """Streaming CDC latest-wins state over a change stream with columns
    (event_id, user_id, ts, value, op). Update-mode output: one row per
    touched key per micro-batch carrying its new current state."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=CdcLatestProcessor(),
        outputStructType=CDC_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
