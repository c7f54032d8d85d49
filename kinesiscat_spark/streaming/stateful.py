"""Custom stateful streaming operators (applyInPandasWithState).

The reference keeps no cross-record state at all — its only cursor is the
shard iterator string (`/root/reference/worker/worker.go:210-243`), so a
crash forgets everything it has seen. Spark's arbitrary stateful
processing is the extension surface for operators the built-in streaming
aggregates can't express; the first one a training-data ingest pipeline
needs is **streaming dedup**: emit a record the first time its key
appears, drop every later duplicate, across micro-batches, surviving
restarts (state lives in the checkpoint).

Scale design (100 TB): state is partitioned by the dedup key — each
executor holds only its shard of the key space (RocksDB state store in
production; set a watermark-based state TTL when keys expire). Per batch
the work is one shuffle on the key plus an Arrow-batched pandas call per
key group; nothing ever collects to the driver.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType

_STATE_SCHEMA = "seen boolean"


def dedup_first_seen(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    output_schema: StructType | str,
) -> DataFrame:
    """Streaming first-seen dedup: one output row per distinct key — the
    row with the smallest ``order_col`` in the key's first micro-batch —
    suppressed forever after via per-key state.

    ``output_schema`` must cover exactly the columns to emit (a subset of
    ``df``'s columns, keys included). Within a micro-batch the winner is
    deterministic (min by ``order_col``); across batches "first" follows
    micro-batch arrival order, which is the stream's notion of time.
    """
    out_schema = output_schema
    out_cols = (
        [f.name for f in out_schema.fields]
        if isinstance(out_schema, StructType)
        else [c.split()[0] for c in out_schema.split(",")]
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return  # key already emitted in an earlier batch
        best: pd.DataFrame | None = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            cand = pdf.loc[[pdf[order_col].idxmin()]]
            if best is None or cand[order_col].iat[0] < best[order_col].iat[0]:
                best = cand
        if best is None:
            return
        state.update((True,))
        yield best[out_cols]

    return df.groupBy(*keys).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
