"""Multimodal plumbing tests (X6): envelope schema, Arrow batch shape,
partition preservation, fan-out, and the real-decoder stub gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kinesiscat_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_image,
    decode_media_stats,
    media_from_documents,
    sample_frames,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def media(spark):
    from kinesiscat_spark.io_tables import load_table

    return media_from_documents(load_table(spark, SF_SMOKE, "documents"))


def test_media_envelope_schema(media):
    assert [f.name for f in media.schema.fields] == [
        f.name for f in MEDIA_SCHEMA.fields
    ]
    assert media.schema["payload"].dataType.typeName() == "binary"
    assert media.schema["meta"].dataType.typeName() == "struct"


def test_byte_stats_match_python(media):
    rows = media.select("media_id", "payload").limit(5).collect()
    got = {
        r.media_id: (r.n_bytes, r.byte_sum)
        for r in decode_media_stats(media).collect()
    }
    for r in rows:
        assert got[r.media_id] == (len(r.payload), sum(r.payload))


def test_map_in_pandas_preserves_partitioning(media):
    reparted = media.repartition(7)
    assert decode_media_stats(reparted).rdd.getNumPartitions() == 7


def test_frame_fanout_covers_payload(media):
    video = media.filter(F.col("media_type") == "video")
    frames = sample_frames(video, frame_size=64, every=4)
    one = frames.filter(F.col("media_id") == 2).orderBy("frame_idx").collect()
    assert [r.frame_idx for r in one] == list(range(0, 1 + one[-1].frame_idx, 4))
    payload = video.filter(F.col("media_id") == 2).first().payload
    n_frames = max((len(payload) + 63) // 64, 1)
    assert one[-1].frame_idx == ((n_frames - 1) // 4) * 4
    assert one[0].frame_sum == sum(payload[:64])


def test_arrow_batch_bound_respected(spark, media):
    """maxRecordsPerBatch caps the pandas batch size seen by the kernel."""
    import pandas as pd
    from pyspark.sql import types as T

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10")
    try:

        def kernel(batches):
            for pdf in batches:
                yield pd.DataFrame({"n": [len(pdf)]})

        sizes = [
            r.n
            for r in media.coalesce(1)
            .mapInPandas(kernel, T.StructType([T.StructField("n", T.LongType())]))
            .collect()
        ]
        assert max(sizes) <= 10 and sum(sizes) == media.count()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_real_decoder_is_stubbed(media):
    with pytest.raises(NotImplementedError, match="codec"):
        decode_image(media)
