"""Multimodal column plumbing (SURVEY.md §2.11): opaque `binary`
payloads + typed metadata, decode/feature-extract as Arrow-batched
Pandas operations over `mapInPandas`.

The container has no image/audio codecs, so the decode kernels are
STUBBED with a clearly-marked deterministic fake (md5-derived pseudo
dimensions/features) — the Spark-side plumbing is real and tested:
schema, batch iteration shape, partition-parallel execution. Swapping
in PIL/torchaudio later only replaces `_fake_decode`.

Scale notes: payloads never pass through Python row-at-a-time — Arrow
batches carry them to the kernel; per-partition batch size is bounded
by `spark.sql.execution.arrow.maxRecordsPerBatch`. Binary columns ride
every relational operator (filter/join/partition) unchanged.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def attach_binary(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Build a media-shaped frame from the fixtures: UTF-8 payload +
    metadata struct (mime, byte length)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(text_col).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_media_features(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Arrow-batched 'decode' + feature extraction over mapInPandas.

    The kernel is fully closure-self-contained (nested helper, local
    imports): cloudpickle ships it BY VALUE, so Python workers don't
    need this package importable — the driver's harness may run from
    any cwd.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        def fake_decode(payload: bytes) -> tuple[int, int, int, list[float]]:
            # STUB decode — deterministic md5-derived pseudo image
            # properties. Real implementation would be
            # `PIL.Image.open(io.BytesIO(payload))`; the container ships
            # no codecs (project brief: stub decode, keep plumbing real).
            h = _hashlib.md5(payload).digest()
            return 64 + h[0], 64 + h[1], 1 + (h[2] % 4), [b / 255.0 for b in h[:8]]

        for pdf in batches:
            # NULL payloads are undecodable — dropped deterministically
            # (the decode-failure quarantine contract; oracle mirrors
            # with `text IS NOT NULL`), never bytes(None)
            pdf = pdf[pdf["payload"].notna()]
            if not len(pdf):
                continue
            decoded = [fake_decode(bytes(p)) for p in pdf["payload"]]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_channels": [d[2] for d in decoded],
                    "features": [d[3] for d in decoded],
                }
            )

    return media.mapInPandas(kernel, schema=FEATURES_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def frame_sample(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Video frame sampling over mapInPandas: one output row per sampled
    frame (doc_id, frame_idx, frame fingerprint).

    The codec is STUBBED deterministically (no video libs in container):
    frame count = 4 + (second md5 nibble of the payload % 8), frame
    payload fingerprint = md5(payload || '#' || idx). Real plumbing —
    Arrow batches, 1→N row fan-out inside the kernel, stable schema —
    is what a real decoder (pyav/ffmpeg) would slot into, replacing only
    `fake_probe`/`fake_frame`.
    """
    step = int(every_n)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        def fake_probe(payload: bytes) -> int:
            # STUB: frame count from the md5 of the payload (would be
            # container metadata in a real decoder)
            return 4 + int(_hashlib.md5(payload).hexdigest()[1], 16) % 8

        def fake_frame(payload: bytes, idx: int) -> str:
            # STUB: fingerprint of the decoded frame (would be the frame
            # tensor); md5(payload || '#' || idx) is oracle-reproducible
            return _hashlib.md5(payload + b"#" + str(idx).encode()).hexdigest()

        for pdf in batches:
            # NULL payloads are undecodable — dropped (see decode kernel)
            pdf = pdf[pdf["payload"].notna()]
            ids, idxs, fps = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                for i in range(0, fake_probe(raw), step):
                    ids.append(doc_id)
                    idxs.append(i)
                    fps.append(fake_frame(raw, i))
            yield _pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame_md5": fps})

    return media.mapInPandas(kernel, schema=FRAMES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized_md5", T.StringType()),
    ]
)


def resize(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Image resize over mapInPandas (STUB kernel, real plumbing).

    Output fingerprint = md5(payload || '#resize#WxH') stands in for the
    resized pixel buffer; a real implementation replaces only the body
    of `fake_resize` with PIL `Image.resize`.
    """
    w, h = int(width), int(height)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        def fake_resize(payload: bytes) -> str:
            return _hashlib.md5(payload + f"#resize#{w}x{h}".encode()).hexdigest()

        for pdf in batches:
            # NULL payloads are undecodable — dropped (see decode kernel)
            pdf = pdf[pdf["payload"].notna()]
            if not len(pdf):
                continue
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "width": w,
                    "height": h,
                    "resized_md5": [fake_resize(bytes(p)) for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(kernel, schema=RESIZED_SCHEMA)
