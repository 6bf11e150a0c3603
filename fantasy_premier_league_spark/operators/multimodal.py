"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for a 100 TB training-data pipeline: media lives in parquet as
``binary`` columns (or object-store URIs) beside a typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so bytes never leave the executor and Python sees
whole record batches, not rows.

The actual codec libraries (PIL/ffmpeg/torchaudio) are NOT in this
container, so the decoders are STUBS behind ``decoder=`` hooks:
- default → ``NotImplementedError`` with a clear message
- ``fake_image_decoder`` → deterministic md5-derived features, so the
  Spark-side plumbing (schema, batching, partitioning, UDF signatures) is
  real and testable end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: metadata struct carried beside every payload column
MEDIA_META_SCHEMA = "struct<modality:string,mime:string,n_bytes:bigint,digest:string>"

FEATURE_DIM = 8

Decoder = Callable[[bytes], np.ndarray]


def attach_media_meta(df: DataFrame, payload_col: str, *, modality: str, mime: str) -> DataFrame:
    """Typed metadata from an opaque binary column — JVM-side only."""
    p = F.col(payload_col)
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit(mime).alias("mime"),
            F.length(p).cast("bigint").alias("n_bytes"),
            F.md5(p).alias("digest"),
        ),
    )


def _not_implemented_decoder(payload: bytes) -> np.ndarray:
    raise NotImplementedError(
        "media codecs are not available in this environment; pass an explicit "
        "decoder (e.g. PIL-based) or use fake_image_decoder for plumbing tests"
    )


def fake_image_decoder(payload: bytes) -> np.ndarray:
    """Deterministic stand-in: FEATURE_DIM floats derived from the md5 of
    the payload (stable across runs/partitions)."""
    digest = hashlib.md5(payload).digest()
    return np.frombuffer(digest[:FEATURE_DIM], dtype=np.uint8).astype(np.float64) / 255.0


def extract_features(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    *,
    decoder: Decoder = _not_implemented_decoder,
    batch_feature_dim: int = FEATURE_DIM,
) -> DataFrame:
    """Decode payloads → fixed-dim feature vectors via mapInPandas.

    Output: (id, n_bytes, features array<double>[batch_feature_dim]).
    Partitioning is preserved (no shuffle); each Arrow batch decodes in one
    Python call. Failures raise (fail-fast contract);
    :func:`extract_features_quarantined` routes them to a dead-letter
    column instead.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = [decoder(p).tolist() for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "n_bytes": [len(p) for p in pdf[payload_col]],
                    "features": feats,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        decode_batches,
        schema=f"id long, n_bytes long, features array<double>",
    )


def extract_features_quarantined(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    *,
    decoder: Decoder = _not_implemented_decoder,
) -> DataFrame:
    """Dead-letter variant of :func:`extract_features`: a payload whose
    decode raises does NOT kill the stage — it yields a row with null
    ``features`` and the exception text in ``decode_error``, so one
    corrupt file in a 100 TB scan costs one quarantined row, not a
    re-run of the job. Split downstream with
    ``df.filter("decode_error IS NULL")`` / ``IS NOT NULL`` (the
    dead-letter sink).

    Output: (id, n_bytes, features array<double> | null, decode_error
    string | null). Same Arrow-batched map-only dataflow as the raising
    variant.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats: list[list[float] | None] = []
            errs: list[str | None] = []
            for p in pdf[payload_col]:
                try:
                    feats.append(decoder(p).tolist())
                    errs.append(None)
                except Exception as exc:  # noqa: BLE001 — quarantine by contract
                    feats.append(None)
                    errs.append(f"{type(exc).__name__}: {exc}")
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "n_bytes": [len(p) for p in pdf[payload_col]],
                    "features": feats,
                    "decode_error": errs,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        decode_batches,
        schema="id long, n_bytes long, features array<double>, decode_error string",
    )


def sample_frames(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    *,
    every_n_bytes: int = 1024,
    max_frames: int = 8,
) -> DataFrame:
    """Frame-sampling plumbing: emit (id, frame_idx, frame_digest) per
    sampled "frame" (byte-stride stand-in for real video frame extraction —
    one input row explodes to <= max_frames output rows, the shape a real
    ffmpeg-backed sampler would have)."""

    def sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_digest = [], [], []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                n = min(max_frames, max(1, len(payload) // every_n_bytes))
                for i in range(n):
                    chunk = payload[i * every_n_bytes : (i + 1) * every_n_bytes]
                    out_id.append(rid)
                    out_idx.append(i)
                    out_digest.append(hashlib.md5(chunk).hexdigest())
            if out_id:
                yield pd.DataFrame({"id": out_id, "frame_idx": out_idx, "frame_digest": out_digest})

    return df.select(id_col, payload_col).mapInPandas(
        sample_batches, schema="id long, frame_idx int, frame_digest string"
    )


def resize_media(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    *,
    target_w: int = 224,
    target_h: int = 224,
    resizer: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Resize plumbing: (id, payload, width, height) with the payload
    replaced by the resized bytes. ``resizer`` is the codec hook (a real
    pipeline passes a PIL/opencv-backed callable); the default is the
    deterministic stand-in ``md5(payload) * ceil`` truncated to
    ``target_w*target_h//64`` bytes, so batching/schema/row-alignment are
    testable without image libs. Arrow-batched, no shuffle, output
    partitioning preserved — at 100 TB this runs as a pure map stage."""

    def default_resizer(payload: bytes, w: int, h: int) -> bytes:
        n = max(1, (w * h) // 64)
        digest = hashlib.md5(payload).digest()
        return (digest * (n // len(digest) + 1))[:n]

    fn = resizer or default_resizer

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "payload": [fn(p, target_w, target_h) for p in pdf[payload_col]],
                    "width": target_w,
                    "height": target_h,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        resize_batches, schema="id long, payload binary, width int, height int"
    )
