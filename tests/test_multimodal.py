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


def test_ppm_roundtrip_and_header_grammar():
    """parse_ppm is a REAL P6 decoder: write→parse round trip, the
    netpbm header grammar (arbitrary whitespace runs, # comments), and
    the 2-byte big-endian sample path for maxval > 255."""
    import numpy as np

    from kinesiscat_spark.operators.multimodal import parse_ppm, write_ppm

    px = np.arange(2 * 3 * 3) % 256
    data = write_ppm(2, 3, px)
    w, h, mx, got = parse_ppm(data)
    assert (w, h, mx) == (2, 3, 255)
    assert got.tolist() == px.tolist()

    # hand-built header with comments and mixed whitespace — files other
    # encoders write
    raster = bytes(range(18))
    hairy = b"P6 # magic then comment\n#another\n 2\t3 # dims\n255\n" + raster
    w, h, mx, got = parse_ppm(hairy)
    assert (w, h, mx) == (2, 3, 255)
    assert got.tolist() == list(range(18))

    # 16-bit samples (maxval > 255): big-endian per spec
    px16 = np.array([0, 1, 256, 65535, 300, 7])
    w, h, mx, got = parse_ppm(write_ppm(1, 2, px16, maxval=65535))
    assert (w, h, mx) == (1, 2, 65535)
    assert got.tolist() == px16.tolist()


def test_ppm_malformed_inputs_raise():
    import numpy as np

    from kinesiscat_spark.operators.multimodal import parse_ppm, write_ppm

    good = write_ppm(2, 2, np.zeros(12))
    with pytest.raises(ValueError, match="magic"):
        parse_ppm(b"P5\n2 2\n255\n" + bytes(12))
    with pytest.raises(ValueError, match="truncated PPM raster"):
        parse_ppm(good[:-1])
    with pytest.raises(ValueError, match="truncated PPM header"):
        parse_ppm(b"P6\n2 2")
    with pytest.raises(ValueError, match="geometry"):
        parse_ppm(b"P6\n0 2\n255\n")
    with pytest.raises(ValueError, match="non-numeric"):
        parse_ppm(b"P6\ntwo 2\n255\n" + bytes(12))


def test_wav_roundtrip_and_chunk_walker():
    """parse_wav is a REAL RIFF walker: round trip, unknown chunks
    skipped with word alignment, non-PCM rejected loudly."""
    import struct

    import numpy as np

    from kinesiscat_spark.operators.multimodal import parse_wav, write_wav

    s = np.array([0, 1, -1, 32767, -32768, 12345])
    rate, bits, ch, got = parse_wav(write_wav(s, 8000))
    assert (rate, bits, ch) == (8000, 16, 1)
    assert got.tolist() == s.tolist()

    # inject an odd-sized unknown chunk between fmt and data — the
    # walker must skip it (with the RIFF pad byte) and still find data
    data = write_wav(s, 8000)
    fmt_end = 12 + 8 + 16
    alien = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # padded
    patched = data[:fmt_end] + alien + data[fmt_end:]
    rate, _, _, got = parse_wav(patched)
    assert rate == 8000 and got.tolist() == s.tolist()

    with pytest.raises(ValueError, match="RIFF"):
        parse_wav(b"OggS" + bytes(40))
    # a truncated data chunk must refuse, never silently decode a prefix
    with pytest.raises(ValueError, match="truncated WAVE data"):
        parse_wav(write_wav(s, 8000)[:-2])
    # format tag 3 = IEEE float: unsupported, must refuse not misdecode
    bad = bytearray(write_wav(s, 8000))
    bad[20:22] = struct.pack("<H", 3)
    with pytest.raises(ValueError, match="format tag"):
        parse_wav(bytes(bad))


def test_decode_image_and_audio_dataframes(spark):
    """The Spark-side decoders run the real codecs per Arrow batch and
    honor the S9 error-skip policy for undecodable payloads."""
    import numpy as np

    from kinesiscat_spark.operators.multimodal import (
        decode_audio,
        write_ppm,
        write_wav,
    )

    rows = [
        (1, bytearray(write_ppm(2, 2, np.arange(12)))),
        (2, bytearray(b"not an image at all")),
        (3, bytearray(write_ppm(1, 1, np.array([9, 9, 9])))),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r.media_id: r for r in decode_image(df).collect()}
    assert set(got) == {1, 3}  # the garbage row skipped, not crashed
    assert (got[1].width, got[1].height, got[1].n_px) == (2, 2, 12)
    assert got[1].px_sum == sum(range(12))
    assert got[3].px_sum == 27
    with pytest.raises(Exception, match="magic|PPM"):
        decode_image(df, on_error="raise").collect()

    arows = [
        (7, bytearray(write_wav(np.array([1, -2, 3]), 22050))),
        (8, bytearray(b"garbage")),
    ]
    adf = spark.createDataFrame(arows, "media_id long, payload binary")
    agot = {r.media_id: r for r in decode_audio(adf).collect()}
    assert set(agot) == {7}
    assert (agot[7].sample_rate, agot[7].n_samples) == (22050, 3)
    assert agot[7].sample_sum == 2
    assert agot[7].sample_sq_sum == 1 + 4 + 9


def test_synth_media_payloads_are_real_files(spark):
    """The lane's fixtures are genuine on-spec files: byte-identical to
    the standalone writers and decodable by the codecs."""
    import numpy as np

    from kinesiscat_spark.operators.multimodal import (
        parse_ppm,
        parse_wav,
        synth_ppm_media,
        synth_wav_media,
        write_ppm,
        write_wav,
    )

    ids = spark.createDataFrame([(6,), (13,)], "media_id long")
    for r in synth_ppm_media(ids).collect():
        mid = r.media_id
        h, w = (mid % 9 + 1) * 8, (mid % 16 + 1) * 8
        px = (mid * 7 + 13 * np.arange(3 * h * w, dtype=np.int64)) % 256
        assert bytes(r.payload) == write_ppm(w, h, px)
        pw, ph, _, got = parse_ppm(bytes(r.payload))
        assert (pw, ph) == (w, h) and got.sum() == px.sum()
    for r in synth_wav_media(ids).collect():
        mid = r.media_id
        n = 2048 + (mid % 7) * 512
        s = ((mid * 31 + 17 * np.arange(n, dtype=np.int64)) % 4096) - 2048
        assert bytes(r.payload) == write_wav(s)
        rate, _, _, got = parse_wav(bytes(r.payload))
        assert rate == 16000 and got.sum() == s.sum()
