"""kinesiscat CLI on Spark: the reference's exact flag surface
(`/root/reference/main.go:30-40`) over batch or streaming input.

    python -m kinesiscat_spark.cli -position TRIM_HORIZON -format data \
        -filter '{k: k}' --events-sf-dir /root/testdata/sf0.001

Flags (reference parity):
  -debug            log lag per micro-batch (S7; worker.go:226-227)
  -region/-stream-name  accepted for parity (no AWS in this environment)
  -position         LATEST | TRIM_HORIZON | AT_SEQUENCE_NUMBER |
                    AFTER_SEQUENCE_NUMBER (S2; + -start-seq for AT/AFTER)
  -format           data | partition-key | sequence (K1; main.go:68-83)
  -separator, -0    separator between records / NUL separator (K2)
  -batch-size       records per micro-batch (S3)
  -sleep-time       ms between polls → processingTime trigger (S4)
  -filter           JMESPath expression applied per record (K3)

Input binding (this environment has no Kinesis service):
  --source DIR      envelope-schema parquet dir (the stream substrate)
  --events-sf-dir   adapt the driver's events table into the envelope

We implement the reference's *intended* semantics, fixing its three bugs
(SURVEY §2.1 note): filtered output is printed (main.go:99-100 drops it),
partition-key/sequence print values not pointers (main.go:79-81), and the
filter compiles once per plan, not per record (main.go:91).
Per the reference's error-skip policy (S9; main.go:92-98), records whose
payload fails to decode or filter are skipped, not fatal.
"""

from __future__ import annotations

import argparse
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kinesiscat_spark.streaming.sink import FORMATS, format_record
from kinesiscat_spark.streaming.source import (
    ITERATOR_TYPES,
    StreamConfig,
    read_events_stream,
    read_record_stream,
    start_position_filter,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="kinesiscat-spark", description="netcat for record streams, on Spark"
    )
    p.add_argument("-debug", action="store_true", help="enable debug logging")
    p.add_argument("-region", default="us-west-1", help="accepted for parity")
    p.add_argument("-stream-name", dest="stream_name", default="events")
    p.add_argument("-position", default="LATEST", choices=ITERATOR_TYPES)
    p.add_argument("-start-seq", dest="start_seq", default=None,
                   help="sequence number for AT/AFTER_SEQUENCE_NUMBER")
    p.add_argument("-format", dest="fmt", default="data", choices=FORMATS)
    p.add_argument("-separator", default="\n")
    p.add_argument("-0", dest="null_separator", action="store_true",
                   help="use NUL as the separator")
    p.add_argument("-batch-size", dest="batch_size", type=int, default=1)
    p.add_argument("-sleep-time", dest="sleep_time", type=int, default=1000,
                   help="ms between polls")
    p.add_argument("-filter", dest="json_filter", default="",
                   help="JMESPath filter applied to each message")
    p.add_argument("--payload-schema", dest="payload_schema", default=None,
                   help="Spark DDL schema of the JSON payload (e.g. 'k long'); "
                        "when given (or for the built-in events source) the "
                        "filter compiles to native Columns, with the Arrow "
                        "UDF as fallback. Payloads not matching the declared "
                        "object shape are skipped as corrupt (S9).")
    p.add_argument("--source", default=None, help="envelope parquet/json dir")
    p.add_argument("--source-format", dest="source_format", default="parquet",
                   choices=("parquet", "json", "text"),
                   help="envelope encoding: parquet; json lines in the "
                        "`aws kinesis get-records` shape (Data base64); or "
                        "text — separator-delimited payload dumps (the K2 "
                        "sink's own output replays), envelope synthesized")
    p.add_argument("--events-sf-dir", dest="events_sf_dir", default=None,
                   help="adapt the driver events table as input")
    p.add_argument("--follow", action="store_true",
                   help="run as a continuous stream instead of one batch pass")
    return p


def _safe_filter_udf(expression: str):
    """K3 with the S9 error-skip policy: bad JSON / failed eval → null."""
    import pandas as pd

    from kinesiscat_spark.functions.jmespath import compile_expr

    compiled = compile_expr(expression)

    def _eval(payload):
        def one(doc):
            try:
                return compiled.search_json(doc)
            except Exception:
                return None  # log-and-continue, main.go:92-98

        return payload.map(one)

    return F.pandas_udf(_eval, T.StringType())


def _payload_schema(args) -> T.StructType | None:
    """The declared payload shape, if any: an explicit --payload-schema DDL,
    or the known props shape of the built-in events source."""
    ddl = getattr(args, "payload_schema", None)
    if ddl:
        return T.StructType.fromDDL(ddl)
    if not args.source:  # events-backed: props is {"k": int} by contract
        return T.StructType([T.StructField("k", T.LongType())])
    return None


_INFER_SAMPLE = 1000


def infer_payload_schema(records, expression: str) -> T.StructType | None:
    """Derive a payload schema from the source itself so arbitrary
    ``--source`` inputs get the native filter path without a declared
    ``--payload-schema``.

    A bounded sample (first 1000 records — one small job at startup,
    independent of source size) goes through Spark's JVM JSON inference
    (``spark.read.json``). Inferred types are kept as-is: integer fields
    stay LongType (byte-faithful JSON output; a double would fail the
    ``json_faithful`` gate and defeat the native path for every
    number-returning filter). The schema is then validated by dry-running
    the native filter against the UDF on the same sample: any
    disagreement — heterogeneous fields widened to string, fractional
    values, shapes outside the static subset — refuses inference and
    keeps the UDF path. The check makes the heuristic safe on sampled
    data; payload shapes that only appear beyond the sample (e.g. a
    long-inferred field later carrying 1.5) are skipped as corrupt by
    the native parse — declare ``--payload-schema`` for strict parity
    on such feeds.
    """
    spark = records.sparkSession
    sample = (
        records.select(F.decode(F.col("data"), "UTF-8").alias("doc"))
        .limit(_INFER_SAMPLE)
        .cache()
    )
    try:
        docs = sample.rdd.map(lambda r: r.doc).filter(lambda d: d is not None)
        inferred = spark.read.json(docs)
        fields = [
            f for f in inferred.schema.fields if f.name != "_corrupt_record"
        ]
        if not fields:
            return None
        schema = T.StructType(fields)
        from kinesiscat_spark.functions.jmespath import NotColumnCompilable
        from kinesiscat_spark.functions.jmespath.api import jmespath_native_json

        try:
            native = jmespath_native_json(expression, F.col("doc"), schema)
        except NotColumnCompilable:
            return None
        udf_out = _safe_filter_udf(expression)(F.col("doc"))
        diverged = (
            sample.select(native.alias("n"), udf_out.alias("u"))
            .where(~F.col("n").eqNullSafe(F.col("u")))
            .take(1)
        )
        return None if diverged else schema
    except Exception:  # inference is best-effort; the UDF path always works
        return None
    finally:
        sample.unpersist()


def output_column(args, sample_records=None) -> F.Column:
    """The one emitted value per record (K1/K3, intended semantics).

    The filter prefers the native Column compiler (JVM-side, whole-stage
    codegen) whenever a payload schema is known — declared, contractual
    (events source), or inferred from a source sample (``sample_records``:
    a zero-arg callable returning a BATCH DataFrame of the same source) —
    and only expressions outside the statically-typeable subset fall back
    to the Arrow-batched UDF. Both paths skip corrupt payloads (S9) and
    emit identical JSON text.
    """
    if args.json_filter and args.fmt == "data":
        doc = F.decode(F.col("data"), "UTF-8")
        schema = _payload_schema(args)
        if schema is None and sample_records is not None:
            schema = infer_payload_schema(sample_records(), args.json_filter)
        if schema is not None:
            from kinesiscat_spark.functions.jmespath import NotColumnCompilable
            from kinesiscat_spark.functions.jmespath.api import jmespath_native_json

            try:
                return jmespath_native_json(args.json_filter, doc, schema)
            except NotColumnCompilable:
                pass
        return _safe_filter_udf(args.json_filter)(doc)
    return format_record(args.fmt)


def load_records(spark: SparkSession, args, streaming: bool) -> DataFrame:
    cfg = StreamConfig(
        iterator_type=args.position,
        starting_sequence_number=args.start_seq,
        batch_size=args.batch_size,
        sleep_time_ms=args.sleep_time,
    )
    if args.source:
        fmt = getattr(args, "source_format", "parquet")
        if fmt == "json":
            from kinesiscat_spark.streaming.source import read_record_json

            return read_record_json(spark, args.source, cfg, streaming=streaming)
        if fmt == "text":
            from kinesiscat_spark.streaming.source import read_record_text

            sep = "\0" if args.null_separator else args.separator
            return read_record_text(
                spark, args.source, cfg, separator=sep, streaming=streaming
            )
        if streaming:
            return read_record_stream(spark, args.source, cfg)
        batch = spark.read.parquet(args.source)
        return start_position_filter(batch, cfg)
    sf_dir = args.events_sf_dir or "/root/testdata/sf0.001"
    if streaming:
        return read_events_stream(spark, sf_dir, cfg, as_records=True)
    from kinesiscat_spark.envelope import events_as_records
    from kinesiscat_spark.io_tables import load_table

    return start_position_filter(events_as_records(load_table(spark, sf_dir, "events")), cfg)


def run(args, spark: SparkSession, emit: Callable[[str], None]) -> int:
    sep = "\0" if args.null_separator else args.separator
    streaming = args.follow
    records = load_records(spark, args, streaming)
    # schema inference samples the BATCH twin of the source (a streaming
    # DataFrame can't be sampled); only invoked when no schema is declared
    sample = lambda: records if not streaming else load_records(spark, args, False)  # noqa: E731
    out = output_column(args, sample_records=sample).alias("out")

    if not streaming:
        # The reference guarantees ordering only WITHIN a shard (SURVEY
        # §1.1): range-partition by shardId + sortWithinPartitions gives
        # exactly that contract without a global total-order exchange
        # (no corpus-wide (shard, seq) sampling; sequence skew inside one
        # shard never rebalances the whole sort). toLocalIterator walks
        # partitions in range order, so shards still emit grouped.
        ordered = (
            records.repartitionByRange("shardId")
            .sortWithinPartitions("shardId", "sequenceNumber")
            .select(out)
        )
        # toLocalIterator: constant driver memory — stdout is the bottleneck
        for row in ordered.filter(F.col("out").isNotNull()).toLocalIterator():
            emit(row.out + sep)
        return 0

    from kinesiscat_spark.streaming.lag import LagListener, with_lag_metric

    listener = None
    if args.debug:
        listener = LagListener()
        spark.streams.addListener(listener)

    def for_each_batch(batch: DataFrame, _bid: int) -> None:
        # toLocalIterator, as in the batch path above: constant driver
        # memory regardless of micro-batch size.
        rows = (
            batch.repartitionByRange("shardId")
            .sortWithinPartitions("shardId", "sequenceNumber")
            .select(out)
            .filter(F.col("out").isNotNull())
            .toLocalIterator()
        )
        emit("".join(r.out + sep for r in rows))
        if args.debug and listener and listener.samples:
            print(f"lag: {listener.samples[-1]}", file=sys.stderr)

    q = (
        with_lag_metric(records)
        .writeStream.foreachBatch(for_each_batch)
        .trigger(processingTime=f"{args.sleep_time} milliseconds")
        .start()
    )
    try:
        q.awaitTermination()
    except KeyboardInterrupt:
        q.stop()  # S8 graceful shutdown
    finally:
        if listener:
            spark.streams.removeListener(listener)
    return 0


def main(argv: list[str] | None = None, emit: Callable[[str], None] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if emit is None:
        emit = lambda s: (sys.stdout.write(s), sys.stdout.flush())  # noqa: E731
    from kinesiscat_spark.session import get_spark

    return run(args, get_spark("kinesiscat-cli"), emit)


if __name__ == "__main__":
    raise SystemExit(main())
