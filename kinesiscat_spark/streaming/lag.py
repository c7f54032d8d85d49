"""S7: MillisBehindLatest analog via observed metrics.

The reference surfaces per-shard lag through a non-blocking state channel
(`/root/reference/worker/worker.go:143-146`, `worker/worker.go:245-251`,
metric doc `vendor/.../kinesis/api.go:1052-1065`). Here the same signal is
an ``observe`` aggregate evaluated inside each micro-batch (no extra pass
over the data) and surfaced through ``StreamingQueryProgress``; a
``StreamingQueryListener`` collects it without touching the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

LAG_OBSERVATION = "kinesiscat_lag"


def with_lag_metric(df: DataFrame, ts_col: str = "approximateArrivalTimestamp") -> DataFrame:
    """Attach per-batch record count + millis-behind-latest observation."""
    return df.observe(
        LAG_OBSERVATION,
        F.count(F.lit(1)).alias("n_records"),
        F.max(
            F.unix_millis(F.current_timestamp()) - F.unix_millis(F.col(ts_col))
        ).alias("millis_behind_latest"),
    )


class LagListener(StreamingQueryListener):
    """Collects (batch_id, n_records, millis_behind_latest) per progress
    event — the `-debug` lag printout of the reference (worker.go:226-227)."""

    def __init__(self) -> None:
        self.samples: list[dict] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        observed = event.progress.observedMetrics.get(LAG_OBSERVATION)
        if observed is not None:
            self.samples.append(
                {
                    "batch_id": event.progress.batchId,
                    "n_records": observed["n_records"],
                    "millis_behind_latest": observed["millis_behind_latest"],
                }
            )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass
