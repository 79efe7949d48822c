"""Multimodal-column plumbing: media as opaque binary + typed metadata.

The extraction pipeline preserves media spans as ``media_ref`` strings
(north-rule invariant). This module carries the *content* side of those
refs: a ``media(media_ref, content binary, meta struct)`` table and the
decode / feature-extract / frame-sample operators a training-data pipeline
runs next.

The container has no image/audio codecs, so the decode step is STUBBED:
``decode_media`` raises ``NotImplementedError`` unless ``fake=True``, in
which case a deterministic fake decoder (seeded from the media_ref) runs
instead. The Spark-side plumbing — schemas, Arrow batch shapes,
``mapInPandas`` signatures, partitioning — is real and tested; swapping in
Pillow/ffmpeg is a one-function change inside the batch iterator.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("media_ref string, content binary, "
                "meta struct<mime:string,width:int,height:int,"
                "n_frames:int,duration_ms:int>")

FEATURE_DIM = 16

FEATURES_SCHEMA = (f"media_ref string, mime string, "
                   f"feature array<float>, width int, height int")

FRAMES_SCHEMA = "media_ref string, frame_idx int, ts_ms int, frame binary"


def synthesize_media(spark, refs_df: DataFrame,
                     ref_col: str = "media_ref") -> DataFrame:
    """Deterministic fake media table for the given refs: content bytes and
    metadata derived from md5(media_ref). Stands in for the Iceberg media
    table the refs point at."""
    r = F.col(ref_col)
    h = F.md5(r)
    width = (F.conv(F.substring(h, 1, 4), 16, 10).cast("int") % 1920) + 16
    height = (F.conv(F.substring(h, 5, 4), 16, 10).cast("int") % 1080) + 16
    n_frames = (F.conv(F.substring(h, 9, 2), 16, 10).cast("int") % 32) + 1
    mime = F.when(F.conv(F.substring(h, 11, 2), 16, 10).cast("int") % 3 == 0,
                  F.lit("image/png")) \
        .when(F.conv(F.substring(h, 11, 2), 16, 10).cast("int") % 3 == 1,
              F.lit("video/mp4")).otherwise(F.lit("audio/wav"))
    content = F.to_binary(F.repeat(h, 8), F.lit("hex"))
    return refs_df.select(
        r.alias("media_ref"), content.alias("content"),
        F.struct(mime.alias("mime"), width.alias("width"),
                 height.alias("height"), n_frames.alias("n_frames"),
                 (n_frames * 40).alias("duration_ms")).alias("meta"))


def _fake_decode(ref: str, content: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decoder: a FEATURE_DIM byte
    histogram of the content, seeded by the ref hash."""
    if content is None or len(content) == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    arr = np.frombuffer(content, dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=FEATURE_DIM, range=(0, 256))
    return (hist / max(len(arr), 1)).astype(np.float32)


def decode_media(media: DataFrame, fake: bool = False,
                 decoder=None) -> DataFrame:
    """Decode + feature-extract: binary content -> fixed-dim float feature.

    Real decoding (Pillow / torchaudio / ffmpeg) is not available in this
    environment — pass fake=True to run the deterministic stand-in, or pass
    ``decoder`` (a ``(media_ref, content) -> np.ndarray[FEATURE_DIM]``
    callable) to plug a real codec in. The batching, schema, and partition
    behavior are identical on every path — the output schema is fixed by
    FEATURES_SCHEMA regardless of which decoder runs, so swapping the codec
    in on a cluster is not a schema migration (contract-tested in
    tests/test_training_data_ops.py::test_media_decoder_schema_contract).
    """
    fn = decoder if decoder is not None else (_fake_decode if fake else None)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if fn is None:
                raise NotImplementedError(
                    "real media decode requires an image/audio codec "
                    "library; re-run with fake=True for the deterministic "
                    "stand-in decoder, or pass decoder=<callable>")
            feats = []
            for r, c in zip(pdf["media_ref"], pdf["content"]):
                vec = np.asarray(fn(r, c))
                # fail fast at the contract boundary: a decoder that
                # returns the wrong shape would otherwise fill the
                # list<float> column with silently ragged vectors
                if vec.shape != (FEATURE_DIM,):
                    raise ValueError(
                        f"decoder returned shape {vec.shape} for "
                        f"{r!r}; the FEATURES_SCHEMA contract requires "
                        f"({FEATURE_DIM},)")
                feats.append(vec.astype(np.float32).tolist())
            yield pd.DataFrame({
                "media_ref": pdf["media_ref"],
                "mime": [m["mime"] for m in pdf["meta"]],
                "feature": feats,
                "width": [m["width"] for m in pdf["meta"]],
                "height": [m["height"] for m in pdf["meta"]],
            })

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 80,
                  fake: bool = False) -> DataFrame:
    """Frame sampling for video media: one row per sampled frame with a
    deterministic fake frame payload (real extraction would call ffmpeg
    inside the same batch iterator)."""
    video = media.where(F.col("meta.mime") == "video/mp4")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real frame extraction requires ffmpeg; re-run with "
                    "fake=True for the deterministic stand-in")
            rows = []
            for ref, meta in zip(pdf["media_ref"], pdf["meta"]):
                duration = int(meta["duration_ms"])
                for idx, ts in enumerate(range(0, duration, every_ms)):
                    payload = hashlib.md5(
                        f"{ref}:{idx}".encode()).digest()
                    rows.append({"media_ref": ref, "frame_idx": idx,
                                 "ts_ms": ts, "frame": payload})
            yield pd.DataFrame(
                rows, columns=["media_ref", "frame_idx", "ts_ms", "frame"])

    return video.mapInPandas(run, schema=FRAMES_SCHEMA)


def media_refs_from_extraction(extracted: DataFrame) -> DataFrame:
    """Pull the distinct media_ref universe out of the extraction output's
    span sequences (kind='media_ref' spans)."""
    return (extracted
            .select(F.explode("spans").alias("s"))
            .where(F.col("s.kind") == "media_ref")
            .select(F.col("s.media_ref").alias("media_ref"))
            .distinct())
