"""Custom stateful streaming operator: per-meshcode running lineage
counters via ``applyInPandasWithState``.

The batch sink (sources/sink.py) writes per-bucket manifests with
transform-count metrics; this is its streaming twin: a file stream of
transformed rows keeps a per-meshcode running state
(rows seen, rows OK, last status) across micro-batches — the
reference's error taxonomy (trans.rs:946-999) as continuously updated
state instead of a post-hoc aggregation.

State is one tiny tuple per mesh cell (O(#cells), not O(rows)): at
100 TB the key space is the ~10^5 grid cells, so the state store stays
small no matter how many rows stream through.  Output mode "update"
emits only cells touched by each micro-batch.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType([
    StructField("n_rows", LongType(), False),
    StructField("n_ok", LongType(), False),
])

OUTPUT_SCHEMA = StructType([
    StructField("meshcode", LongType(), False),
    StructField("n_rows", LongType(), False),
    StructField("n_ok", LongType(), False),
    StructField("batch_rows", LongType(), False),
    StructField("max_status", IntegerType(), False),
])


def _update_cell(key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState):
    n_rows, n_ok = state.get if state.exists else (0, 0)
    batch_rows = 0
    max_status = -1  # worst status this batch: deterministic, unlike
    # "last" (chunk/row order is not guaranteed by the runtime)
    for pdf in pdfs:
        batch_rows += len(pdf)
        n_rows += len(pdf)
        n_ok += int((pdf["status"] == 0).sum())
        if len(pdf):
            max_status = max(max_status, int(pdf["status"].max()))
    state.update((n_rows, n_ok))
    yield pd.DataFrame({
        "meshcode": [key[0]],
        "n_rows": [n_rows],
        "n_ok": [n_ok],
        "batch_rows": [batch_rows],
        "max_status": [max_status],
    })


def stream_cell_lineage(transformed: DataFrame) -> DataFrame:
    """Running (n_rows, n_ok) per meshcode over a stream of transformed
    rows (columns: meshcode long, status int).  State survives across
    micro-batches; outputMode must be "update"."""
    return (
        transformed.groupBy("meshcode")
        .applyInPandasWithState(
            _update_cell,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
