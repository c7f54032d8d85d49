"""K1/K2 sink semantics: formatted record emission with separator control.

Reference: ``outputRecord`` dispatches on -format (data | partition-key |
sequence) and prints value + separator per record
(`/root/reference/main.go:68-83`, `main.go:103`); ``-0`` switches the
separator to NUL (`main.go:47-49`). We implement the *intended* semantics —
the reference actually prints pointer addresses for partition-key/sequence
and drops filtered output entirely (fidelity bugs, SURVEY §2.1 note).

Emission happens in ``foreachBatch``: each micro-batch is sorted by
(shardId, sequenceNumber) — the per-shard ordering guarantee of the
reference's channel fan-in — formatted JVM-side into one string column,
and handed to a writer callable. Only the final formatted strings cross to
the driver; for file/table sinks swap the collect for a distributed write.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FORMATS = ("data", "partition-key", "sequence")


def format_record(fmt: str) -> Column:
    """K1: one output value per record (main.go:74-83, intended semantics)."""
    if fmt == "data":
        return F.decode(F.col("data"), "UTF-8")
    if fmt == "partition-key":
        return F.col("partitionKey")
    if fmt == "sequence":
        return F.col("sequenceNumber")
    raise ValueError(f"format must be one of {FORMATS}, got {fmt!r}")


def write_formatted(
    records: DataFrame,
    emit: Callable[[str, int], None],
    fmt: str = "data",
    separator: str = "\n",
    null_separator: bool = False,
):
    """K1+K2 streaming sink: returns an UN-started ``DataStreamWriter``
    with the ``foreachBatch`` emission attached — the caller configures
    trigger/checkpoint and calls ``.start()`` (see cli.py / tests).
    Every micro-batch calls ``emit(payload_string, batch_id)``.

    ``null_separator`` is the ``-0`` flag (main.go:47-49): NUL separator
    for xargs-style consumers. Separator is appended after every record,
    as the reference's printf does (main.go:103).
    """
    sep = "\0" if null_separator else separator
    out_col = F.concat(format_record(fmt), F.lit(sep))

    def for_each_batch(batch: DataFrame, batch_id: int) -> None:
        # toLocalIterator streams one partition at a time to the driver —
        # stdout emission is inherently driver-side (the reference is a
        # stdout tool), but a large micro-batch must not materialize whole.
        rows = (
            batch.orderBy("shardId", "sequenceNumber")
            .select(out_col.alias("out"))
            .toLocalIterator()
        )
        emit("".join(r.out for r in rows), batch_id)

    return records.writeStream.foreachBatch(for_each_batch)
