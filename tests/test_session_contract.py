"""Session-independence contract (VERDICT r1 item 1): the engine must work
in ANY SparkSession, not just the one session.py builds — the driver's
harness constructs its own session with default confs.

These tests simulate a foreign session by UNSETTING the confs session.py
sets, then asserting the loaders re-establish what they need at runtime.
"""

from __future__ import annotations

from tests.conftest import SF_SMOKE

NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def test_load_events_resets_nanos_conf(spark):
    from kinesiscat_spark.io_tables import load_table

    spark.conf.unset(NANOS_CONF)
    try:
        df = load_table(spark, SF_SMOKE, "events")
        assert df.count() > 0
        assert dict(df.dtypes)["ts"] == "timestamp"
        assert spark.conf.get(NANOS_CONF) == "true"
    finally:
        spark.conf.set(NANOS_CONF, "true")


def test_events_stream_resets_nanos_conf(spark):
    from kinesiscat_spark.streaming.source import read_events_stream

    spark.conf.unset(NANOS_CONF)
    try:
        df = read_events_stream(spark, SF_SMOKE)
        assert df.isStreaming
        assert spark.conf.get(NANOS_CONF) == "true"
    finally:
        spark.conf.set(NANOS_CONF, "true")


def test_entry_smoke_without_nanos_conf(spark):
    import __spark_entry__ as entrymod

    spark.conf.unset(NANOS_CONF)
    try:
        assert entrymod.entry(spark).count() > 0
    finally:
        spark.conf.set(NANOS_CONF, "true")
