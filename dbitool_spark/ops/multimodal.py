"""Multimodal (binary) column support: typed opaque media columns with
Arrow-batched decode/feature plumbing.

Design (north-star scope): media rides as an opaque `binary` column
plus a typed metadata struct — the layout `spark.read.format(
"binaryFile")` produces and every lakehouse media pipeline uses. The
decode / feature-extraction step is a Pandas-batch `mapInPandas`
transform: Arrow moves whole record batches into Python once per
partition (never row-at-a-time), and partition sizing — not driver
memory — bounds the working set.

The actual codec work (image decode, audio resample, video frame
sampling) requires libraries this container does not ship, so the
codec body is STUBBED with a deterministic fake keyed on the bytes
(documented NotImplementedError for real formats). Everything
Spark-side — schema, batch iteration, UDF signature, partition
behavior — is real and tested; swapping the stub for PIL/ffmpeg is a
one-function change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, content binary, "
    "meta struct<source:string, declared_mime:string>"
)

FEATURE_SCHEMA = (
    "media_id bigint, kind string, n_bytes int, content_sha string, "
    "width int, height int, duration_ms int, feature array<float>"
)

_REAL_CODECS_AVAILABLE = False  # flip when PIL/soundfile/ffmpeg ship


def _fake_decode(kind: str, content: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic stand-in for the codec: derives fake
    width/height/duration and an 8-dim feature vector from the
    content digest. Same bytes -> same features, so tests are exact."""
    digest = hashlib.sha256(content).digest()
    width = 16 + digest[0] % 240
    height = 16 + digest[1] % 240
    duration = int.from_bytes(digest[2:4], "big") if kind in ("audio", "video") else 0
    feature = [round(b / 255.0, 6) for b in digest[4:12]]
    return width, height, duration, feature


def extract_media_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over MEDIA_SCHEMA rows.

    Batches arrive as pandas DataFrames (Arrow transfer); the loop is
    per-batch, not per-row-network-call. At 100 TB the input should be
    repartitioned so each task holds O(100 MB) of media bytes — set
    spark.sql.files.maxPartitionBytes accordingly when reading
    binaryFile sources."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["content"].map(len).astype("int32"),
                "content_sha": pdf["content"].map(
                    lambda b: hashlib.sha256(b).hexdigest()
                ),
            }
            decoded = [
                _decode_one(kind, content)
                for kind, content in zip(pdf["kind"], pdf["content"])
            ]
            out["width"] = pd.Series([d[0] for d in decoded], dtype="int32")
            out["height"] = pd.Series([d[1] for d in decoded], dtype="int32")
            out["duration_ms"] = pd.Series([d[2] for d in decoded], dtype="int32")
            out["feature"] = pd.Series([d[3] for d in decoded])
            yield pd.DataFrame(out)

    return df.mapInPandas(process, schema=FEATURE_SCHEMA)


def _decode_one(kind: str, content: bytes) -> tuple[int, int, int, list[float]]:
    if _REAL_CODECS_AVAILABLE:
        raise NotImplementedError(
            "real image/audio/video codecs are not shipped in this "
            "environment; see module docstring"
        )
    return _fake_decode(kind, content)


def documents_as_media(df: DataFrame) -> DataFrame:
    """Adapter for tests: wraps the documents table as MEDIA_SCHEMA
    rows (text bytes as the opaque content) so the multimodal plumbing
    has a deterministic corpus in this environment."""
    return df.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            F.col("source").alias("source"),
            F.lit("text/plain").alias("declared_mime"),
        ).alias("meta"),
    )


FRAME_SCHEMA = (
    "media_id bigint, frame_idx int, frame_ts_ms int, frame_sha string"
)

FRAME_INTERVAL_MS = 1000


def sample_frames(df: DataFrame) -> DataFrame:
    """Frame sampling over MEDIA_SCHEMA rows: each media row fans out
    to one row per sampled frame — the 1->N mapInPandas shape a video
    pipeline needs (the output batch is built per input batch, so
    Arrow still moves whole record batches and a 10-minute video
    never materializes as Python rows one call at a time).

    The codec is stubbed like extract_media_features: the fake
    "decoder" derives the frame count from the content size
    (1 + n_bytes % 7) and each frame's identity hash from
    sha256(content || '#' || frame_idx), so same bytes -> same frames
    and the whole operator is exactly SQL-mirrorable for the oracle.
    With real codecs, frame count = duration // FRAME_INTERVAL_MS and
    frame_sha becomes the decoded frame's digest — same schema, same
    fan-out shape."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, shas = [], [], [], []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                content = bytes(content)
                n_frames = 1 + len(content) % 7
                for i in range(n_frames):
                    ids.append(media_id)
                    idxs.append(i)
                    tss.append(i * FRAME_INTERVAL_MS)
                    shas.append(
                        hashlib.sha256(
                            content + b"#" + str(i).encode()
                        ).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_ts_ms": pd.Series(tss, dtype="int32"),
                    "frame_sha": pd.Series(shas, dtype="object"),
                }
            )

    return df.mapInPandas(process, schema=FRAME_SCHEMA)
