"""Multimodal columns (extension surface X6): opaque binary payloads with
typed metadata, processed by Arrow-batched Python UDFs.

Model (SURVEY §1.1): like the Kinesis record envelope, media rows are an
opaque ``binary`` payload plus a typed metadata struct. Real decoders
(PIL/ffmpeg/librosa) are NOT in this container, so the decode kernels are
deterministic fakes over the raw bytes — clearly marked — while everything
Spark-side is real and tested: the schema, the ``mapInPandas`` plumbing,
Arrow batch iteration, and the 1→N row fan-out for frame sampling.

Scale notes:
- ``mapInPandas`` keeps the input partitioning — no shuffle; at 100 TB the
  only knobs are input split size (``spark.sql.files.maxPartitionBytes``)
  and ``spark.sql.execution.arrow.maxRecordsPerBatch`` to bound per-batch
  payload memory (payloads can be MBs each — keep batches small).
- Kernels are per-batch numpy, not per-row Python: ``np.frombuffer`` is
  zero-copy; byte sums are exact int64 so results are reproducible in SQL.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:
    import pandas as pd

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), nullable=False),
        T.StructField("media_type", T.StringType(), nullable=False),
        T.StructField("payload", T.BinaryType(), nullable=False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_channels", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
            nullable=False,
        ),
    ]
)

MEDIA_TYPES = ("image", "audio", "video")


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Adapt `documents` into the media envelope (deterministic: payload =
    UTF-8 bytes of the text; metadata derived from doc_id/n_chars)."""
    mt = F.element_at(
        F.array(*[F.lit(t) for t in MEDIA_TYPES]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        mt.alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            ((F.col("doc_id") % 16 + 1) * 8).cast("int").alias("width"),
            ((F.col("doc_id") % 9 + 1) * 8).cast("int").alias("height"),
            F.lit(3).alias("n_channels"),
            F.lit(16000).alias("sample_rate"),
            F.col("lang").alias("codec"),
        ).alias("meta"),
    )


_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_sum", T.LongType()),
        T.StructField("byte_sq_sum", T.LongType()),
    ]
)


def decode_media_stats(media: DataFrame) -> DataFrame:
    """Per-payload byte statistics via ``mapInPandas`` (the feature-extract
    step of a decode pipeline, with the codec swapped for a deterministic
    byte-level fake). Exact int64 sums → downstream mean/variance are
    bit-reproducible."""
    import numpy as np

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            arrs = [np.frombuffer(p, dtype=np.uint8) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "n_bytes": [a.size for a in arrs],
                    "byte_sum": [int(a.sum(dtype=np.int64)) for a in arrs],
                    "byte_sq_sum": [
                        int((a.astype(np.int64) ** 2).sum(dtype=np.int64))
                        for a in arrs
                    ],
                }
            )

    return media.select("media_id", "payload").mapInPandas(kernel, _STATS_SCHEMA)


_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_bytes", T.LongType()),
        T.StructField("frame_sum", T.LongType()),
    ]
)


def sample_frames(media: DataFrame, frame_size: int = 64, every: int = 4) -> DataFrame:
    """Frame sampling for video-like payloads: split the payload into
    fixed-size frames, keep every ``every``-th (deterministic fake of a
    video frame sampler), 1→N row fan-out inside ``mapInPandas``."""
    import numpy as np

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            ids, idxs, sizes, sums = [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                a = np.frombuffer(p, dtype=np.uint8)
                n_frames = max((a.size + frame_size - 1) // frame_size, 1)
                for fi in range(0, n_frames, every):
                    frame = a[fi * frame_size : (fi + 1) * frame_size]
                    ids.append(int(mid))
                    idxs.append(fi)
                    sizes.append(frame.size)
                    sums.append(int(frame.sum(dtype=np.int64)))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_bytes": pd.Series(sizes, dtype="int64"),
                    "frame_sum": pd.Series(sums, dtype="int64"),
                }
            )

    return media.select("media_id", "payload").mapInPandas(kernel, _FRAMES_SCHEMA)


def decode_image(media: DataFrame) -> DataFrame:
    """REAL image decode — requires PIL, which is not in this container.

    Stub per the build contract: the Spark plumbing above
    (``decode_media_stats``/``sample_frames``) is the tested path; this
    entry point raises until a real codec is installed.
    """
    try:
        import PIL  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires pillow; container ships no codecs — "
            "use decode_media_stats/sample_frames for the tested plumbing"
        ) from e
    raise NotImplementedError("real decoder wiring lands with the codec")


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("pixels", T.ArrayType(T.LongType())),
    ]
)


def resize_media(media: DataFrame, out_h: int = 8, out_w: int = 8) -> DataFrame:
    """Nearest-neighbor resize to a fixed (out_h, out_w) grid.

    Fake decode: the payload is read as a row-major grayscale image of the
    metadata's (height, width), zero-padded/truncated to h*w bytes. The
    resize itself is the real thing — integer source-index mapping
    src = (i*h // out_h)*w + (j*w // out_w) — vectorized per Arrow batch
    via ``np.ix_`` fancy indexing. Pure integer output, so the whole
    kernel is reproducible in SQL. A real decoder drops in by replacing
    the frombuffer/pad step only.
    """
    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, pix = [], []
            for mid, p, h, w in zip(
                pdf["media_id"], pdf["payload"], pdf["height"], pdf["width"]
            ):
                h, w = int(h), int(w)
                a = np.frombuffer(p, dtype=np.uint8).astype(np.int64)
                img = np.zeros(h * w, dtype=np.int64)
                img[: min(a.size, h * w)] = a[: h * w]
                img = img.reshape(h, w)
                rows = (np.arange(out_h) * h) // out_h
                cols = (np.arange(out_w) * w) // out_w
                ids.append(int(mid))
                pix.append(img[np.ix_(rows, cols)].ravel().tolist())
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "out_h": pd.Series([out_h] * len(ids), dtype="int32"),
                    "out_w": pd.Series([out_w] * len(ids), dtype="int32"),
                    "pixels": pix,
                }
            )

    flat = media.select(
        "media_id", "payload", F.col("meta.height").alias("height"),
        F.col("meta.width").alias("width"),
    )
    return flat.mapInPandas(kernel, _RESIZE_SCHEMA)


_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("energy", T.LongType()),
    ]
)


def audio_frame_energy(media: DataFrame, frame: int = 256) -> DataFrame:
    """Frame-wise audio feature extraction (deterministic fake decode:
    payload bytes as unsigned 8-bit PCM). Emits per-frame sample count and
    exact int64 energy (sum of squares) — RMS and dB are one column away
    and stay bit-reproducible because the sums are integral. 1→N fan-out
    inside ``mapInPandas``, no shuffle."""
    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, idxs, ns, es = [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                a = np.frombuffer(p, dtype=np.uint8).astype(np.int64)
                n_frames = max((a.size + frame - 1) // frame, 1)
                for fi in range(n_frames):
                    seg = a[fi * frame : (fi + 1) * frame]
                    ids.append(int(mid))
                    idxs.append(fi)
                    ns.append(seg.size)
                    es.append(int((seg * seg).sum()))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "n_samples": pd.Series(ns, dtype="int64"),
                    "energy": pd.Series(es, dtype="int64"),
                }
            )

    return media.select("media_id", "payload").mapInPandas(kernel, _AUDIO_SCHEMA)
