"""Session-independence contract (VERDICT r1 item 1): the engine must work
in ANY SparkSession, not just the one session.py builds — the driver's
harness constructs its own session with default confs.

These tests simulate a foreign session by UNSETTING the confs session.py
sets, then asserting the loaders still work. The events table has had two
generator schemas (legacy TIMESTAMP(NANOS)-as-long, current timestamp[us]);
the loaders must normalize ``ts`` to TIMESTAMP either way, without
depending on session confs being pre-set.
"""

from __future__ import annotations

from tests.conftest import SF_SMOKE

NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def test_load_events_without_nanos_conf(spark):
    from kinesiscat_spark.io_tables import load_table

    spark.conf.unset(NANOS_CONF)
    try:
        df = load_table(spark, SF_SMOKE, "events")
        assert df.count() > 0
        assert dict(df.dtypes)["ts"] == "timestamp"
    finally:
        spark.conf.set(NANOS_CONF, "true")


def test_load_events_legacy_nanos_parquet(spark, tmp_path):
    """A TIMESTAMP(NANOS)-generation events dir (simulated by writing the
    nanos-as-long shape) still loads and normalizes ts to TIMESTAMP."""
    from pyspark.sql import functions as F

    from kinesiscat_spark.io_tables import load_table

    out = str(tmp_path)
    spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 2, "a", 1.0, "{}")],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.unix_micros(F.to_timestamp("ts")) * 1000).write.parquet(
        f"{out}/events.parquet"
    )
    df = load_table(spark, out, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert df.count() == 1


def test_events_stream_without_nanos_conf(spark):
    from kinesiscat_spark.streaming.source import read_events_stream

    spark.conf.unset(NANOS_CONF)
    try:
        df = read_events_stream(spark, SF_SMOKE)
        assert df.isStreaming
        assert dict(df.dtypes)["ts"] == "timestamp"
    finally:
        spark.conf.set(NANOS_CONF, "true")


def test_entry_smoke_without_nanos_conf(spark):
    import __spark_entry__ as entrymod

    spark.conf.unset(NANOS_CONF)
    try:
        assert entrymod.entry(spark).count() > 0
    finally:
        spark.conf.set(NANOS_CONF, "true")
