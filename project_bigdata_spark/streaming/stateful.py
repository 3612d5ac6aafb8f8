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
