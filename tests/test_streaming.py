"""Streaming semantics tests (SURVEY §5.3.3): start positions (S2),
micro-batching (S3/S4), lag metrics (S7), graceful stop (S8), checkpoint
resume (S9 upgrade), formatted emission (K1/K2), watermark/append windows.

The physical source is envelope parquet files written incrementally into a
tmp dir — each file plays the role of one GetRecords batch.
"""

from __future__ import annotations

import os
import tempfile
import time

import pytest
from pyspark.sql import functions as F

from kinesiscat_spark.envelope import events_as_records
from kinesiscat_spark.io_tables import load_table
from kinesiscat_spark.streaming import (
    LagListener,
    StreamConfig,
    read_record_stream,
    run_to_memory,
    start_position_filter,
    with_lag_metric,
    write_formatted,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def records_dir(spark):
    """Envelope records split into 4 parquet files (≈4 GetRecords batches)."""
    d = tempfile.mkdtemp(prefix="kc_records_")
    recs = events_as_records(load_table(spark, SF_SMOKE, "events"), n_shards=4)
    for i in range(4):
        recs.filter(
            F.pmod(F.xxhash64("sequenceNumber"), F.lit(4)) == i
        ).coalesce(1).write.mode("append").parquet(d)
    return d


@pytest.fixture(scope="module")
def n_records(spark, records_dir):
    return spark.read.parquet(records_dir).count()


def test_trim_horizon_reads_everything(spark, records_dir, n_records):
    cfg = StreamConfig(iterator_type="TRIM_HORIZON", batch_size=1)
    out = run_to_memory(
        read_record_stream(spark, records_dir, cfg), output_mode="append", cfg=cfg
    )
    assert out.count() == n_records


def test_after_sequence_number_skips(spark, records_dir, n_records):
    batch = spark.read.parquet(records_dir)
    median_seq = batch.selectExpr(
        "percentile_approx(cast(sequenceNumber as long), 0.5) as m"
    ).first().m
    cfg = StreamConfig(
        iterator_type="AFTER_SEQUENCE_NUMBER", starting_sequence_number=str(median_seq)
    )
    out = run_to_memory(
        read_record_stream(spark, records_dir, cfg), output_mode="append", cfg=cfg
    )
    expected = batch.filter(
        F.col("sequenceNumber") > str(median_seq).rjust(20, "0")
    ).count()
    assert 0 < out.count() == expected < n_records


def test_latest_sees_only_new_arrivals(spark, records_dir):
    cutoff = spark.read.parquet(records_dir).agg(
        F.max("approximateArrivalTimestamp")
    ).first()[0]
    cfg = StreamConfig(iterator_type="LATEST")
    out = run_to_memory(
        read_record_stream(spark, records_dir, cfg, stream_start_ts=cutoff),
        output_mode="append",
        cfg=cfg,
    )
    assert out.count() == 0


def test_batch_size_controls_microbatches_and_lag_metric(spark, records_dir):
    """S3: maxFilesPerTrigger=1 over 4 files → ≥4 micro-batches; S7: every
    progress event carries the observed lag metric."""
    listener = LagListener()
    spark.streams.addListener(listener)
    try:
        cfg = StreamConfig(iterator_type="TRIM_HORIZON", batch_size=1)
        recs = with_lag_metric(read_record_stream(spark, records_dir, cfg))
        out = run_to_memory(recs, output_mode="append", cfg=cfg)
        deadline = time.time() + 30
        while time.time() < deadline and len(listener.samples) < 4:
            time.sleep(0.5)
    finally:
        spark.streams.removeListener(listener)
    data_batches = [s for s in listener.samples if s["n_records"] > 0]
    assert len(data_batches) >= 4
    assert all(s["millis_behind_latest"] > 0 for s in data_batches)
    assert sum(s["n_records"] for s in data_batches) == out.count()


def test_formatted_emission_separator_and_order(spark, records_dir):
    """K1/K2: formatted payload with separator; per-shard seq order."""
    chunks: list[str] = []
    cfg = StreamConfig(iterator_type="TRIM_HORIZON", batch_size=10)
    recs = read_record_stream(spark, records_dir, cfg)
    q = (
        write_formatted(
            recs,
            emit=lambda s, _bid: chunks.append(s),
            fmt="sequence",
            null_separator=True,
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="kc_ckpt_"))
        .start()
    )
    assert q.awaitTermination(120)
    seqs = [s for c in chunks for s in c.split("\0") if s]
    assert len(seqs) == spark.read.parquet(records_dir).count()
    assert all(len(s) == 20 and s.isdigit() for s in seqs)  # zero-padded


def test_checkpoint_resume_no_reprocessing(spark, records_dir, n_records):
    """S9 upgrade: a restarted query with the same checkpoint only reads
    files that arrived after the first run."""
    src = tempfile.mkdtemp(prefix="kc_inc_")
    ckpt = tempfile.mkdtemp(prefix="kc_ckpt_")
    base = spark.read.parquet(records_dir)
    base.limit(50).write.mode("overwrite").parquet(src)

    def run_once(name):
        cfg = StreamConfig(iterator_type="TRIM_HORIZON")
        seen: list[int] = []
        q = (
            read_record_stream(spark, src, cfg)
            .writeStream.foreachBatch(lambda b, _bid: seen.append(b.count()))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        return sum(seen)

    assert run_once("kc_resume_1") == 50
    # second file arrives; resumed query must process only the delta
    base.limit(80).write.mode("append").parquet(src)
    new_total = spark.read.parquet(src).count()
    assert run_once("kc_resume_2") == new_total - 50


def test_watermark_append_drops_late_data(spark, tmp_path):
    """X7 watermark semantics: a record later than watermark+gap is dropped
    from an append-mode windowed aggregation."""
    src = str(tmp_path / "wm_src")
    os.makedirs(src, exist_ok=True)
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]

    def write_file(rows):
        spark.createDataFrame(rows, cols).withColumn(
            "ts", F.unix_micros(F.to_timestamp("ts")) * 1000
        ).coalesce(1).write.mode("append").parquet(src)

    from kinesiscat_spark.streaming.source import _EVENTS_RAW_SCHEMA

    raw = spark.readStream.schema(_EVENTS_RAW_SCHEMA).parquet(src)
    ev = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").cast("string").alias("ws"), "n")
    )

    # Drive batch boundaries explicitly (write -> drain -> write): the file
    # source's intra-listing order is not contractual, so relying on mtimes
    # to sequence "watermark advances, THEN the straggler arrives" is flaky.
    import tempfile as _tempfile
    import uuid as _uuid

    name = f"kc_wm_{_uuid.uuid4().hex[:12]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", _tempfile.mkdtemp(prefix="kc_ckpt_"))
        .start()
    )
    try:
        # batch 1: one event at 10:00; batch 2 advances the watermark far
        # past the first window; batch 3 is a late straggler back at 10:05.
        write_file([(1, "2024-01-01 10:00:00", 1, "a", 1.0, "{}")])
        q.processAllAvailable()
        write_file([(2, "2024-01-01 15:00:00", 1, "a", 1.0, "{}")])
        q.processAllAvailable()
        write_file([(3, "2024-01-01 10:05:00", 1, "a", 1.0, "{}")])
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.ws: r.n for r in spark.table(name).collect()}
    # the 10:00 window closed with exactly 1 row; the late event was dropped
    assert got.get("2024-01-01 10:00:00") == 1


def test_stateful_dedup_across_microbatches(spark, tmp_path):
    """applyInPandasWithState first-seen dedup: a key recurring in a later
    micro-batch must be suppressed by state, and within one batch the
    min-order row wins."""
    import glob

    from kinesiscat_spark.streaming.source import _EVENTS_RAW_SCHEMA
    from kinesiscat_spark.streaming.stateful import dedup_first_seen

    src = str(tmp_path / "src")
    stamped: dict[str, bool] = {}
    clock = [1_700_000_000]

    def write_file(rows, name):
        spark.createDataFrame(
            rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
        ).coalesce(1).withColumn(
            "ts", F.unix_micros(F.to_timestamp("ts")) * 1000
        ).write.mode("append").parquet(src)
        clock[0] += 10
        for p in glob.glob(os.path.join(src, "*.parquet")):
            if p not in stamped:
                os.utime(p, (clock[0], clock[0]))
                stamped[p] = True

    # batch 1: key (1,'a') twice (ids 5, 2 -> 2 wins) and key (2,'b')
    write_file(
        [(5, "2024-01-01 10:00:00", 1, "a", 9.0, "{}"),
         (2, "2024-01-01 10:00:01", 1, "a", 7.0, "{}"),
         (3, "2024-01-01 10:00:02", 2, "b", 1.0, "{}")],
        "f1",
    )
    # batch 2: (1,'a') again with a SMALLER id -> must be dropped (state),
    # plus a brand-new key (3,'c')
    write_file(
        [(1, "2024-01-01 11:00:00", 1, "a", 0.0, "{}"),
         (9, "2024-01-01 11:00:01", 3, "c", 4.0, "{}")],
        "f2",
    )

    raw = (
        spark.readStream.schema(_EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    ev = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    first = dedup_first_seen(
        ev.select("user_id", "event_type", "event_id", "value"),
        keys=["user_id", "event_type"],
        order_col="event_id",
        output_schema="user_id bigint, event_type string, event_id bigint, value double",
    )
    out = run_to_memory(first, output_mode="append", cfg=StreamConfig(batch_size=1))
    got = {(r.user_id, r.event_type): r.event_id for r in out.collect()}
    assert got == {(1, "a"): 2, (2, "b"): 3, (3, "c"): 9}


def test_streaming_minhash_candidates_cross_batch(spark, tmp_path):
    """Streaming banded-minhash near-dup: a document arriving in a LATER
    micro-batch must pair with bucket-mates from EARLIER batches (state),
    exact dups estimate 1.0, and estimates equal the batch operator's."""
    import glob

    from kinesiscat_spark.streaming.stateful import streaming_minhash_candidates

    src = str(tmp_path / "docsrc")
    clock = [1_700_000_000]

    def write_file(rows):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(src)
        clock[0] += 10
        for p in glob.glob(os.path.join(src, "*.parquet")):
            os.utime(p, (clock[0], clock[0]))

    d0 = "the quick brown fox jumps over the lazy dog"
    d2 = "the quick brown fox jumps over the lazy cat"
    write_file([(0, d0), (3, "completely different text about spark shuffles")])
    write_file([(1, d0), (2, d2)])  # 1 = exact dup of 0 (EARLIER batch)

    raw = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    cand = streaming_minhash_candidates(raw, threshold=0.3)
    out = run_to_memory(cand, output_mode="append", cfg=StreamConfig(batch_size=1))
    pairs = {(r.id_a, r.id_b): r.est_jaccard for r in out.collect()}
    assert pairs.get((0, 1)) == 1.0  # cross-batch exact dup
    assert (0, 2) in pairs and 0.3 <= pairs[(0, 2)] < 1.0  # near dup
    assert not any(3 in p for p in pairs)  # unrelated never pairs

    # stream estimates must equal the batch operator's (same kernel)
    from kinesiscat_spark.operators.dedup import minhash_lsh_pairs

    batch_docs = spark.createDataFrame(
        [(0, d0), (1, d0), (2, d2)], "doc_id long, text string"
    )
    batch = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in minhash_lsh_pairs(batch_docs, threshold=0.3).collect()
    }
    for k, v in batch.items():
        assert pairs.get(k) == v, k


def test_text_source_streaming(spark, tmp_path):
    """--source-format text works as a file stream too (lineSep-aware;
    content-derived sequence numbers since monotonic ids are unavailable
    in streaming plans)."""
    from kinesiscat_spark.queries.stream_queries import run_to_memory
    from kinesiscat_spark.streaming.source import StreamConfig, read_record_text

    d = tmp_path / "dump"
    d.mkdir()
    (d / "p0.txt").write_text('{"k":1}\n{"k":2}\n')
    df = read_record_text(
        spark, str(d), StreamConfig(iterator_type="TRIM_HORIZON"), streaming=True
    )
    assert df.isStreaming
    rows = run_to_memory(df.select("data", "shardId"), output_mode="append").collect()
    assert sorted(bytes(r.data).decode() for r in rows) == ['{"k":1}', '{"k":2}']
    assert all(r.shardId.startswith("shardId-") for r in rows)


def test_text_stream_sequence_distinct_across_files(spark, tmp_path):
    """ADVICE r3: the streaming text source must give the SAME payload
    different sequenceNumbers when it arrives in different files, and all
    synthesized sequence numbers must be non-negative fixed-width (the
    old abs(xxhash64) construction collapsed replays and could emit a
    negative at Long.MIN_VALUE)."""
    import os as _os

    from kinesiscat_spark.streaming.source import read_record_text

    src = str(tmp_path / "txt_replay")
    _os.makedirs(src)
    for fname in ("a.txt", "b.txt"):
        with open(_os.path.join(src, fname), "w") as f:
            f.write("same-payload\n")

    rec = read_record_text(
        spark, src, StreamConfig(iterator_type="TRIM_HORIZON"), streaming=True
    )
    out = run_to_memory(rec, output_mode="append")
    rows = out.select("partitionKey", "sequenceNumber").collect()
    assert len(rows) == 2
    assert rows[0].partitionKey == rows[1].partitionKey  # content-derived
    seqs = {r.sequenceNumber for r in rows}
    assert len(seqs) == 2  # file identity mixed into the sequence
    for s in seqs:
        assert len(s) == 20 and not s.startswith("-")


def test_streaming_curation_gates(spark, tmp_path):
    """The scan-stage curation signals (repetition, PII, quality) are
    plain Columns, so they compose directly into a streaming pipeline:
    readStream → gates → memory sink, per-record, no state required."""
    from pyspark.sql import functions as F

    from kinesiscat_spark.operators.curation import (
        pii_signals,
        redact_pii,
        repetition_signals,
        top_ngram_char_frac,
    )

    src = str(tmp_path / "stream_docs")
    spark.createDataFrame(
        [
            (1, "good clean text with plenty of distinct words here"),
            (2, "spam spam spam spam spam spam spam spam"),
            (3, "contact me at leak@example.net for additional notes on "
                "the planned rollout schedule and various other details"),
        ],
        "doc_id long, text string",
    ).coalesce(1).write.mode("append").parquet(src)

    raw = spark.readStream.schema("doc_id long, text string").parquet(src)
    gated = (
        raw.withColumn("rep", repetition_signals(F.col("text")))
        .withColumn("top2", top_ngram_char_frac(F.col("text"), 2))
        .withColumn("pii", pii_signals(F.col("text")))
        .filter(F.col("top2") <= 0.3)
        .withColumn("text", redact_pii(F.col("text")))
        .select("doc_id", "text", "top2", F.col("pii.n_emails").alias("n_emails"))
    )
    q = (
        gated.writeStream.format("memory")
        .queryName("curation_gates")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = {r.doc_id: r for r in spark.sql("select * from curation_gates").collect()}
    assert set(rows) == {1, 3}  # repetitive doc 2 gated out
    assert rows[3].n_emails == 1
    assert "leak@example.net" not in rows[3].text and "<PII>" in rows[3].text


def test_kinesis_source_options_mapping():
    """The real-connector option map is a pure function of StreamConfig:
    LATEST/TRIM_HORIZON map to the connectors' startingPosition
    vocabulary, the fetch knobs pass through under the executor-fetch
    keys, and sequence-anchored starts are refused with guidance to
    compose start_position_filter (connectors have no scalar
    sequence-number option — inventing one would fail at query start)."""
    import pytest

    from kinesiscat_spark.streaming.source import (
        StreamConfig,
        kinesis_source_options,
    )

    opts = kinesis_source_options(
        StreamConfig(iterator_type="TRIM_HORIZON", batch_size=500,
                     sleep_time_ms=250),
        "events",
        region="eu-west-1",
    )
    assert opts["streamName"] == "events"
    assert opts["region"] == "eu-west-1"
    assert opts["startingPosition"] == "trim_horizon"
    assert opts["kinesis.executor.maxFetchRecordsPerShard"] == "500"
    assert opts["kinesis.executor.maxFetchTimeInMs"] == "250"

    latest = kinesis_source_options(
        StreamConfig(iterator_type="LATEST"),
        "events",
        endpoint_url="http://localhost:4566",
    )
    assert latest["startingPosition"] == "latest"
    assert latest["endpointUrl"] == "http://localhost:4566"

    with pytest.raises(ValueError, match="start_position_filter"):
        kinesis_source_options(
            StreamConfig(iterator_type="AT_SEQUENCE_NUMBER",
                         starting_sequence_number="42"),
            "events",
        )
    with pytest.raises(ValueError, match="unknown iterator"):
        kinesis_source_options(StreamConfig(iterator_type="BOGUS"), "events")


def test_stream_scratch_dir_handles_rewrites_and_refuses_partitions(
    spark, tmp_path
):
    """The scratch dir bakes in part-file names, so a rewritten directory
    table must REBUILD the links (stale ones would dangle or silently
    drain zero rows), and a partitioned layout must be refused loudly
    (its column values live in directory names)."""
    import os

    import pytest

    from kinesiscat_spark.streaming.source import _as_stream_dir

    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.range(3).toDF("doc_id").write.parquet(f"{sf}/documents.parquet")
    d1 = _as_stream_dir(sf, "documents")
    links1 = sorted(os.listdir(d1))
    assert links1 and all(
        os.path.exists(os.path.join(d1, f)) for f in links1
    )
    # same content, same listing → cached dir reused
    assert _as_stream_dir(sf, "documents") == d1

    # rewrite at the same path: new uuid part names → links rebuilt
    spark.range(5).toDF("doc_id").write.mode("overwrite").parquet(
        f"{sf}/documents.parquet"
    )
    d2 = _as_stream_dir(sf, "documents")
    assert all(os.path.exists(os.path.join(d2, f)) for f in os.listdir(d2))
    total = spark.read.parquet(f"{d2}/*.parquet").count()
    assert total == 5  # reads the REWRITTEN data, not stale links

    # partitioned layout: refuse, never silently drop partition rows
    spark.createDataFrame(
        [(1, "en"), (2, "fr")], "doc_id long, lang string"
    ).write.partitionBy("lang").parquet(f"{sf}/part.parquet")
    with pytest.raises(ValueError, match="partitioned"):
        _as_stream_dir(sf, "part")
