"""Multimodal column operators: image/audio/video as opaque ``binary``
payloads with typed metadata.

Pipeline extension (driver north-star). The reference engine has no media
ops; a 100 TB training-data pipeline needs them as first-class columns:

* media rows are ``(media_id, kind, payload BINARY, meta STRUCT)`` — the
  payload is never interpreted by Spark itself, so scans stay columnar and
  predicate pushdown on ``kind``/metadata works normally;
* decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages: one Python worker per partition, whole record
  batches in and out, no per-row pickling. That is exactly the shape that
  scales to 1000 executors — the only thing swapped in production is the
  decoder body (PIL/ffmpeg), not the plumbing.

Two decoder paths:

* ``use_real_codecs=True`` — REAL decode for the stdlib-parseable
  containers in :mod:`icebug_spark.llm.codecs`: netpbm PPM/PGM and
  24-bit BMP images, RIFF/WAVE PCM audio (features = numpy-rfft log
  band energies), and the ``ppmseq`` video container (concatenated PPM
  frames, real boundary parsing). ``make_decodable_media_table``
  synthesizes payloads in those formats so decoded geometry is asserted
  exactly in tests. PIL/ffmpeg would only widen the accepted container
  set — the Spark plumbing is unchanged.
* default (False) — a clearly-marked DETERMINISTIC FAKE (sha256 counter
  on the payload bytes) that accepts arbitrary bytes; used for the
  text-derived corpus in ``make_media_table`` where payloads are not
  valid containers.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("fmt", StringType()),  # declared container format
        StructField("n_bytes", LongType()),
    ]
)

_KINDS = ["image", "audio", "video"]
_FMTS = {"image": "png", "audio": "wav", "video": "mp4"}


def make_media_table(documents: DataFrame) -> DataFrame:
    """Derive a deterministic synthetic media table from ``documents`` so
    the multimodal path is testable without binary fixtures: payload =
    UTF-8 bytes of the text (opaque to every operator below), kind cycles
    by doc_id. Schema matches MEDIA_SCHEMA."""
    kind = F.element_at(
        F.array(*[F.lit(k) for k in _KINDS]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    fmt_map = F.create_map(
        *[x for k in _KINDS for x in (F.lit(k), F.lit(_FMTS[k]))]
    )
    payload = F.encode(F.col("text"), "UTF-8")
    return documents.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        fmt_map[kind].alias("fmt"),
        F.length(payload).cast("long").alias("n_bytes"),
    )


def make_decodable_media_table(documents: DataFrame) -> DataFrame:
    """Like :func:`make_media_table` but the payloads are REAL containers
    (binary PPM images, PCM WAV audio, ppmseq video) synthesized
    deterministically from ``doc_id`` inside an Arrow-batched stage, so
    the ``use_real_codecs=True`` path decodes them and tests can assert
    exact width/height/sample-rate round-trips."""
    from . import codecs

    out_schema = MEDIA_SCHEMA

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                kind = _KINDS[did % 3]
                rng = np.random.default_rng(did)  # seeded: deterministic payloads
                if kind == "image":
                    w, h = 16 + did % 48, 16 + (did // 3) % 48
                    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
                    payload = (
                        codecs.encode_bmp(px) if did % 2 else codecs.encode_ppm(px)
                    )
                    fmt = "bmp" if did % 2 else "ppm"
                elif kind == "audio":
                    sr = [8000, 16000, 22050, 44100][did % 4]
                    n = sr // 10 + did % 1000  # ~0.1 s
                    x = (rng.standard_normal(n) * 3000).astype(np.int16)
                    payload, fmt = codecs.encode_wav(x, sr), "wav"
                else:
                    frames = [
                        rng.integers(0, 256, (12, 16, 3), dtype=np.uint8)
                        for _ in range(3 + did % 3)
                    ]
                    payload, fmt = codecs.encode_ppmseq(frames, fps=10), "ppmseq"
                rows.append((did, kind, payload, fmt, len(payload)))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "fmt", "n_bytes"]
            )

    return documents.select("doc_id").mapInPandas(_gen, out_schema)


def _fake_u32(payload: bytes, salt: bytes, n: int) -> list[int]:
    """Deterministic pseudo-values from the payload: sha256 counter mode.
    DETERMINISTIC FAKE — stands in for real decode output."""
    out: list[int] = []
    ctr = 0
    while len(out) < n:
        h = hashlib.sha256(salt + ctr.to_bytes(4, "big") + payload[:64]).digest()
        out.extend(int.from_bytes(h[i : i + 4], "big") for i in range(0, 32, 4))
        ctr += 1
    return out[:n]


DECODED_IMAGE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def decode_images(
    media: DataFrame, feature_dim: int = 8, use_real_codecs: bool = False
) -> DataFrame:
    """Decode image payloads → (media_id, width, height, channels,
    features). Arrow-batched ``mapInPandas``; filters to kind='image'
    BEFORE the Python stage so non-image bytes never cross the Arrow
    boundary (predicate stays JVM-side). With ``use_real_codecs=True``
    payloads are actually parsed (PPM/PGM/BMP — see llm/codecs.py) and
    width/height/features come from real pixels; unparseable payloads
    raise, as a production decode stage should."""
    if use_real_codecs:
        from . import codecs

        def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                    px = codecs.decode_image(bytes(payload or b""))
                    rows.append(
                        (
                            int(mid),
                            int(px.shape[1]),
                            int(px.shape[0]),
                            int(px.shape[2]),
                            codecs.image_features(px, feature_dim),
                        )
                    )
                yield pd.DataFrame(
                    rows,
                    columns=["media_id", "width", "height", "channels", "features"],
                )

    else:

        def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                    b = bytes(payload or b"")
                    u = _fake_u32(b, b"img", 2 + feature_dim)
                    rows.append(
                        (
                            int(mid),
                            int(16 + u[0] % 2032),  # plausible 16..2047 px
                            int(16 + u[1] % 2032),
                            3,
                            [round((v % 10_000) / 10_000.0, 6) for v in u[2:]],
                        )
                    )
                yield pd.DataFrame(
                    rows,
                    columns=["media_id", "width", "height", "channels", "features"],
                )

    return (
        media.where(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(_decode, DECODED_IMAGE_SCHEMA)
    )


def resize_images(
    decoded: DataFrame, max_side: int = 256
) -> DataFrame:
    """Aspect-preserving resize of decoded dims (pure column math — no
    Python needed once dims are materialized): (media_id, width, height,
    scale)."""
    scale = F.when(
        F.greatest("width", "height") <= max_side, F.lit(1.0)
    ).otherwise(F.lit(float(max_side)) / F.greatest("width", "height"))
    return decoded.select(
        "media_id",
        F.greatest(F.round(F.col("width") * scale), F.lit(1)).cast("int").alias("width"),
        F.greatest(F.round(F.col("height") * scale), F.lit(1)).cast("int").alias("height"),
        F.round(scale, 6).alias("scale"),
    )


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_s", DoubleType()),
        StructField("mfcc", ArrayType(DoubleType())),
    ]
)


def audio_features(
    media: DataFrame, n_mfcc: int = 13, use_real_codecs: bool = False
) -> DataFrame:
    """Audio payloads → (media_id, sample_rate, duration_s, mfcc[n]).
    With ``use_real_codecs=True`` WAV headers/samples are actually parsed
    and the mfcc slot carries real numpy-rfft log band energies."""
    if use_real_codecs:
        from . import codecs

        def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                    x, sr = codecs.decode_wav(bytes(payload or b""))
                    rows.append(
                        (
                            int(mid),
                            int(sr),
                            round(len(x) / sr, 6),
                            codecs.audio_band_energies(x, n_mfcc),
                        )
                    )
                yield pd.DataFrame(
                    rows, columns=["media_id", "sample_rate", "duration_s", "mfcc"]
                )

    else:

        def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                    b = bytes(payload or b"")
                    u = _fake_u32(b, b"aud", 2 + n_mfcc)
                    rows.append(
                        (
                            int(mid),
                            [8000, 16000, 22050, 44100][u[0] % 4],
                            round(0.1 + (u[1] % 36_000) / 100.0, 2),
                            [round((v % 20_000) / 1000.0 - 10.0, 6) for v in u[2:]],
                        )
                    )
                yield pd.DataFrame(
                    rows, columns=["media_id", "sample_rate", "duration_s", "mfcc"]
                )

    return (
        media.where(F.col("kind") == "audio")
        .select("media_id", "payload")
        .mapInPandas(_extract, AUDIO_FEATURES_SCHEMA)
    )


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_ms", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(
    media: DataFrame, frames_per_video: int = 4, use_real_codecs: bool = False
) -> DataFrame:
    """Video payloads → exploded frame rows (media_id, frame_idx, ts_ms,
    frame BINARY). One input row fans out to ``frames_per_video`` output
    rows inside the same Arrow batch (mapInPandas may return more rows
    than it receives — that is the real frame-sampling batch shape).
    With ``use_real_codecs=True`` the ppmseq container is actually parsed
    (real frame boundaries from each PPM header) and emitted frames are
    standalone decodable PPM payloads, evenly strided like keyframe
    sampling."""
    if use_real_codecs:
        from . import codecs

        def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                    frames, fps = codecs.decode_ppmseq(bytes(payload or b""))
                    k = min(frames_per_video, len(frames))
                    for j in range(k):
                        idx = (len(frames) - 1) * j // max(k - 1, 1)
                        rows.append(
                            (int(mid), idx, int(idx * 1000 // fps), frames[idx])
                        )
                yield pd.DataFrame(
                    rows, columns=["media_id", "frame_idx", "ts_ms", "frame"]
                )

    else:

        def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                    b = bytes(payload or b"")
                    dur_ms = 1000 + _fake_u32(b, b"vid", 1)[0] % 599_000
                    for i in range(frames_per_video):
                        ts = (dur_ms * i) // max(frames_per_video, 1)
                        # DETERMINISTIC FAKE frame: hash of (payload, index)
                        frame = hashlib.sha256(b[:64] + i.to_bytes(4, "big")).digest()
                        rows.append((int(mid), i, int(ts), frame))
                yield pd.DataFrame(
                    rows, columns=["media_id", "frame_idx", "ts_ms", "frame"]
                )

    return (
        media.where(F.col("kind") == "video")
        .select("media_id", "payload")
        .repartition(F.col("media_id"))  # spread videos before the fan-out stage
        .mapInPandas(_frames, FRAME_SCHEMA)
    )


def media_summary(media: DataFrame) -> DataFrame:
    """(kind, n_items, total_bytes, avg_bytes) — corpus accounting over the
    opaque payloads; pure JVM aggregation."""
    return (
        media.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.avg("n_bytes"), 6).alias("avg_bytes"),
        )
    )
