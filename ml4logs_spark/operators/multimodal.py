"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio decode libraries are not in this container, so the decode
kernel is STUBBED (deterministic fake features, or NotImplementedError
for real codecs) — but the Spark-side plumbing is real and tested:
binary columns, typed metadata struct, Arrow-batched ``mapInPandas``
with a stable output schema, and partition-count preservation. Swapping
the stub for a real decoder (PIL/librosa/ffmpeg) changes only
``_decode_batch``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # real decoders, absent in this container
    import PIL.Image  # noqa: F401

    HAVE_CODECS = True
except ImportError:
    HAVE_CODECS = False


def docs_as_media(docs: DataFrame) -> DataFrame:
    """Model documents as media blobs: payload binary + typed metadata.

    (Stand-in for an image/audio table — the testdata has no binary
    column, so text bytes are the payload.)
    """
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.octet_length(F.col("text")).alias("n_bytes"),
            F.col("source").alias("container"),
            F.lit("text/plain").alias("mime"),
        ).alias("meta"),
    )


_FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("checksum", T.LongType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def _decode_batch(pdf: pd.DataFrame, use_real_codecs: bool = False) -> pd.DataFrame:
    """Decode kernel. The deterministic fake is the default (keeps
    schema/batch shape real for tests); the real codec path is opt-in
    and explicitly unimplemented in this container."""
    if use_real_codecs:
        if not HAVE_CODECS:
            raise ImportError("no codec libraries in this environment")
        raise NotImplementedError(
            "real image/audio decode not wired; swap this branch for "
            "PIL/librosa decode of pdf['payload']"
        )
    payload = pdf["payload"]
    n_bytes = payload.map(len).astype("int32")
    checksum = payload.map(lambda b: sum(b[:64]) if len(b) else 0).astype("int64")
    # fake 4-dim feature: byte-prefix stats, fully deterministic
    feature = payload.map(
        lambda b: [
            float(len(b)),
            float(b[0]) if len(b) else 0.0,
            float(b[-1]) if len(b) else 0.0,
            float(sum(b[:16]) % 251),
        ]
    )
    return pd.DataFrame({
        "doc_id": pdf["doc_id"],
        "n_bytes": n_bytes,
        "checksum": checksum,
        "feature": feature,
    })


def extract_features(media: DataFrame, batch_rows: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over payload binaries.

    map-only (no shuffle); batch size bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _decode_batch(pdf)

    return media.select("doc_id", "payload").mapInPandas(run, schema=_FEATURE_SCHEMA)


_FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame", T.BinaryType()),
    T.StructField("n_bytes", T.IntegerType()),
])


def sample_frames(
    media: DataFrame, n_frames: int = 4, use_real_codecs: bool = False
) -> DataFrame:
    """Frame sampling: one payload row -> ``n_frames`` frame rows.

    The decode is STUBBED (equal byte-range chunks stand in for decoded
    I-frames; a real ffmpeg/PyAV sampler replaces only the chunking
    line); the plumbing is real: Arrow-batched ``mapInPandas`` with a
    1->N exploding output schema, map-only (no shuffle) — the shape a
    video pipeline needs at scale (frames stay co-partitioned with
    their source row; downstream per-frame UDFs chain map-only).
    """
    if use_real_codecs:
        raise NotImplementedError("no video codecs in this container")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                step = max(len(payload) // n_frames, 1)
                for i in range(n_frames):
                    chunk = bytes(payload[i * step:(i + 1) * step])
                    rows.append((doc_id, i, chunk, len(chunk)))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame", "n_bytes"])

    return media.select("doc_id", "payload").mapInPandas(run, schema=_FRAME_SCHEMA)


_RESIZE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("thumb", T.BinaryType()),
    T.StructField("n_bytes", T.IntegerType()),
])


def resize_media(
    media: DataFrame, width: int = 8, height: int = 8, use_real_codecs: bool = False
) -> DataFrame:
    """Resize/thumbnail kernel: payload -> fixed-size representation.

    STUB: a deterministic byte downsample (every len/(w*h)-th byte) in
    place of a real PIL resize; schema, batch shape, and the map-only
    plan are the real deliverable.
    """
    if use_real_codecs:
        raise NotImplementedError("no image codecs in this container")
    size = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if len(payload):
                    step = max(len(payload) // size, 1)
                    thumb = bytes(payload[::step][:size])
                else:
                    thumb = b""
                rows.append((doc_id, width, height, thumb, len(thumb)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "thumb", "n_bytes"]
            )

    return media.select("doc_id", "payload").mapInPandas(run, schema=_RESIZE_SCHEMA)


def media_meta(docs: DataFrame) -> DataFrame:
    """Flat metadata projection (oracle-checkable)."""
    m = docs_as_media(docs)
    return m.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.container").alias("container"),
        F.col("meta.mime").alias("mime"),
    )
