"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata (driver brief).

The Spark-side plumbing is real — schemas, partition-preserving
``mapInPandas`` stages, Arrow batch shapes, deterministic feature
extraction — while the actual codec calls are STUBS: the sandbox has no
image/audio libraries, so ``decode_media`` either raises
``NotImplementedError`` (strict mode) or produces a deterministic fake
decode derived from the bytes (test mode).  Swapping in Pillow/torchaudio
at deploy time changes only the marked inner functions; batch shape,
schema, and scale behavior stay as tested.

Scale notes: every stage here is a per-partition map (no shuffle); bytes
stay in Arrow buffers end to end; feature vectors are fixed-width
``array<float>`` ready for the similarity operators.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, data binary, meta map<string,string>"
)

DECODED_SCHEMA = (
    "media_id long, kind string, width int, height int, n_frames int, "
    "n_bytes long, sha1 string"
)

FEATURE_DIM = 8
FEATURES_SCHEMA = f"media_id long, kind string, features array<float>"


def media_from_docs(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from the documents table: the
    text bytes stand in for an encoded payload; kind cycles by id."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("data"),
        F.create_map(
            F.lit("source"), F.col("source"),
            F.lit("n_chars"), F.col("n_chars").cast("string"),
        ).alias("meta"),
    )


def _fake_decode(data: bytes, kind: str) -> dict:
    """STUB decode — deterministic pseudo-metadata from the payload bytes.

    Replace with e.g. ``PIL.Image.open(io.BytesIO(data))`` /
    ``torchaudio.load`` in production; everything around it (batching,
    schema, null handling) is the real pipeline.
    """
    n = len(data)
    h = hashlib.sha1(data).hexdigest()
    seed = int(h[:8], 16)
    return {
        "width": 16 + seed % 1024 if kind in ("image", "video") else 0,
        "height": 16 + (seed >> 10) % 1024 if kind in ("image", "video") else 0,
        "n_frames": 1 if kind == "image" else 1 + seed % 300,
        "n_bytes": n,
        "sha1": h,
    }


def decode_media(media: DataFrame, strict: bool = False) -> DataFrame:
    """Arrow-batched decode stage.  ``strict=True`` raises
    NotImplementedError exactly where a real codec belongs."""

    def _iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "media codecs are not available in this environment; "
                    "plug a real decoder into _fake_decode"
                )
            rows = [
                {"media_id": m, "kind": k, **_fake_decode(bytes(d), k)}
                for m, k, d in zip(pdf["media_id"], pdf["kind"], pdf["data"])
            ]
            yield pd.DataFrame(rows)

    return media.mapInPandas(_iter, schema=DECODED_SCHEMA)


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Deterministic fixed-width feature vector per payload (the stub for
    an embedding model): ``dim`` float32s derived from the sha256 digest
    of the payload bytes, unit-normed.

    The derivation is deliberately recomputable BIT-IDENTICALLY in ANSI
    SQL (the ``media_features`` DuckDB oracle in queries.py — VERDICT r2
    item 3): uint32_i = little-endian digest bytes [4i, 4i+4),
    v_i = (uint32_i %% 1000)/1000 - 0.5 as IEEE double, the squared-sum
    under the norm accumulated LEFT-TO-RIGHT in digest order, and the
    final float32 cast last — every step is an IEEE double op with the
    same association on both engines, so Python and SQL agree to the bit.
    Arrow-batched; output feeds similarity.brute_topk/lsh."""
    if not 1 <= dim <= 8:
        raise ValueError("sha256 yields 8 uint32 lanes; dim must be in [1, 8]")

    def _iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math
        import struct

        for pdf in batches:
            feats = []
            for d in pdf["data"]:
                u = struct.unpack("<8I", hashlib.sha256(bytes(d)).digest())[:dim]
                v = [(x % 1000) / 1000.0 - 0.5 for x in u]
                acc = 0.0
                for x in v:  # sequential, mirrors SQL v0*v0 + v1*v1 + ...
                    acc = acc + x * x
                norm = math.sqrt(acc)
                feats.append(
                    [np.float32(x / norm) for x in v] if norm else
                    [np.float32(x) for x in v]
                )
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "features": feats}
            )

    return media.mapInPandas(_iter, schema=FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """STUB frame sampler for video payloads: emits one row per sampled
    frame index (real impl: decode + slice frames).  Demonstrates the
    one-to-many mapInPandas shape (row explosion inside Arrow batches)."""

    def _iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for m, k, d in zip(pdf["media_id"], pdf["kind"], pdf["data"]):
                if k != "video":
                    continue
                meta = _fake_decode(bytes(d), k)
                for idx in range(0, meta["n_frames"], every_n):
                    out.append({"media_id": m, "frame_index": idx,
                                "frame_sha1": hashlib.sha1(
                                    bytes(d) + idx.to_bytes(4, "big")).hexdigest()})
            yield pd.DataFrame(out, columns=["media_id", "frame_index", "frame_sha1"])

    return media.mapInPandas(
        _iter, schema="media_id long, frame_index int, frame_sha1 string"
    )
