"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the *decode* step is a
clearly-marked deterministic fake (or ``NotImplementedError`` for the
real-codec path) — but everything Spark-side is real and tested: the
binary column, the metadata schema, the mapInPandas batch iteration, the
partition-preserving shape. Swapping ``_fake_decode`` for PIL/ffmpeg is
a one-function change that touches no plan structure.

Scale design: binary payloads ride in their own column so column pruning
drops them unless a stage needs bytes; decode/feature-extract runs
per-partition in Arrow batches (no per-row Python), and the output is a
narrow typed struct, so downstream stages never reshuffle blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, width int, height int, "
    "duration_ms int, checksum string"
)


def attach_fake_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Mint a deterministic opaque binary payload per row (stand-in for a
    real image/audio blob) plus a media_type tag."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.element_at(
            F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("media_type"),
    )


def _fake_decode(media_type: str, payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for codec decode → (width, height, duration_ms).

    REAL IMPLEMENTATION GOES HERE (PIL.Image.open / soundfile / pyav);
    this container ships no codecs, so dimensions are minted from the
    payload digest — stable across runs and engines.
    """
    digest = hashlib.sha1(payload).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    duration = (digest[2] << 8 | digest[3]) if media_type.startswith(("audio", "video")) else 0
    return width, height, duration


def extract_media_meta(media_df: DataFrame) -> DataFrame:
    """Decode + feature-extract metadata from binary payloads with
    mapInPandas (Arrow batches; one Python roundtrip per partition batch,
    never per row)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [
                _fake_decode(mt, bytes(pl)) for mt, pl in zip(pdf["media_type"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "width": [m[0] for m in metas],
                    "height": [m[1] for m in metas],
                    "duration_ms": [m[2] for m in metas],
                    "checksum": [
                        hashlib.sha1(bytes(p)).hexdigest() for p in pdf["payload"]
                    ],
                }
            )

    return media_df.mapInPandas(batches, schema=MEDIA_META_SCHEMA)


def frame_sample_stub(media_df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling — plumbing only: emits (doc_id, frame_idx)
    rows for video payloads from the fake duration. The decode of actual
    frames raises until a codec is available."""
    meta = extract_media_meta(media_df)
    return (
        meta.filter(F.col("media_type") == "video/mp4")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0), (F.col("duration_ms") / every_ms).cast("int"))
            ).alias("frame_idx"),
        )
    )


RESIZED_SCHEMA = (
    "doc_id long, media_type string, src_width int, src_height int, "
    "out_width int, out_height int, out_payload binary"
)


def resize_images_stub(
    media_df: DataFrame, max_side: int = 224
) -> DataFrame:
    """Image resize — the plumbing half is real (mapInPandas over Arrow
    batches, aspect-preserving target-dimension math, binary-out column),
    the pixel work is a deterministic fake (payload digest) until a codec
    is installed. Only image rows are processed; blobs of other
    modalities are pruned by the filter *before* the Python stage, so no
    video/audio bytes cross the Arrow boundary."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in (
                "doc_id", "media_type", "src_width", "src_height",
                "out_width", "out_height", "out_payload",
            )}
            for doc_id, mt, pl in zip(pdf["doc_id"], pdf["media_type"], pdf["payload"]):
                payload = bytes(pl)
                w, h, _ = _fake_decode(mt, payload)
                scale = min(1.0, max_side / max(w, h))
                ow, oh = max(1, round(w * scale)), max(1, round(h * scale))
                # REAL IMPLEMENTATION: PIL resize + re-encode goes here.
                fake_pixels = hashlib.sha1(payload + bytes([ow % 256, oh % 256])).digest()
                rows["doc_id"].append(doc_id)
                rows["media_type"].append(mt)
                rows["src_width"].append(w)
                rows["src_height"].append(h)
                rows["out_width"].append(ow)
                rows["out_height"].append(oh)
                rows["out_payload"].append(fake_pixels)
            yield pd.DataFrame(rows)

    return media_df.filter(F.col("media_type") == "image/png").mapInPandas(
        batches, schema=RESIZED_SCHEMA
    )


def decode_frame(payload: bytes, frame_idx: int) -> bytes:
    """Real frame decode — requires a codec library absent from this
    container."""
    raise NotImplementedError(
        "frame decode requires pyav/ffmpeg; install a codec and replace "
        "_fake_decode/decode_frame (plumbing in extract_media_meta is real)"
    )
