"""Multimodal column plumbing: opaque binary payloads + typed metadata.

BASELINE training-data extension. The container has no image/audio codecs,
so the *decode kernels are stubs* (deterministic fake or NotImplementedError)
— but the Spark-side plumbing is real and tested:

- schema: (id, modality, payload binary, meta struct)
- partition-friendly batch processing via ``mapInPandas`` (Arrow batches,
  vectorized; never per-row Python)
- metadata extraction (sizes, digests) via built-ins.

Swap ``_fake_decode_image`` for a PIL/libvips kernel in production; the
UDF signature, batch shape and schema contract stay identical.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "id long, modality string, payload binary, "
    "meta struct<source:string, declared_w:int, declared_h:int>"
)


def synthesize_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic fake media table from a text table: payload =
    unhex(md5(text)) bytes; declared dims derived from payload bytes.
    Gives binary-typed columns with known, reproducible content."""
    payload = F.unhex(F.md5(F.col(text_col)))
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        F.when(F.col(id_col) % 3 == 0, F.lit("image"))
        .when(F.col(id_col) % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("modality"),
        payload.alias("payload"),
        F.struct(
            F.lit("synthetic").alias("source"),
            (F.abs(F.crc32(F.md5(F.col(text_col)))) % 1920 + 16)
            .cast("int")
            .alias("declared_w"),
            (F.abs(F.crc32(F.reverse(F.md5(F.col(text_col))))) % 1080 + 16)
            .cast("int")
            .alias("declared_h"),
        ).alias("meta"),
    )


def media_metadata(df: DataFrame) -> DataFrame:
    """Pure built-in metadata pass: byte length, digest, modality counts
    (the reference's byte_length custom op generalized —
    reference third_party/ibis/ibis_addon/operations.py:104-107)."""
    return df.select(
        "id",
        "modality",
        F.octet_length("payload").alias("payload_bytes"),
        F.sha2(F.col("payload"), 256).alias("payload_sha256"),
        F.col("meta.declared_w").alias("declared_w"),
        F.col("meta.declared_h").alias("declared_h"),
    )


def _fake_decode_image(payload: bytes, w: int, h: int) -> tuple:
    """STUB decode: deterministic pseudo-decode from payload bytes.
    Production: PIL.Image.open(io.BytesIO(payload)) -> real dims/stats.
    NULL payload -> all-None features (an undecodable asset is unknown,
    not a black image — and SQL aggregation/oracle semantics agree on
    NULL, where a fake 0.0 silently diverged)."""
    if payload is None:
        return (None, None, None)
    width = w or (payload[0] << 4) + 16
    height = h or (payload[1] << 3) + 16
    mean_px = sum(payload) / len(payload) / 255.0
    return (width, height, round(mean_px, 6))


DECODED_SCHEMA = (
    "id long, modality string, width int, height int, mean_px double"
)


def decode_media(df: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched decode via mapInPandas.

    Each batch is a pandas DataFrame of payload bytes — exactly the shape a
    real codec kernel (PIL/torchaudio/ffmpeg) consumes. The stub keeps the
    contract honest: binary in, typed features out, no row-at-a-time Python
    UDF (BASELINE mandate).
    """

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                _fake_decode_image(p, w, h)
                for p, w, h in zip(
                    pdf["payload"], pdf["declared_w"], pdf["declared_h"]
                )
            ]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "modality": pdf["modality"],
                    # nullable dtypes: None must arrive as SQL NULL, not NaN
                    "width": pd.array(
                        [d[0] for d in decoded], dtype="Int32"
                    ),
                    "height": pd.array(
                        [d[1] for d in decoded], dtype="Int32"
                    ),
                    "mean_px": pd.array(
                        [d[2] for d in decoded], dtype="Float64"
                    ),
                }
            )

    flat = df.select(
        "id",
        "modality",
        "payload",
        F.col("meta.declared_w").alias("declared_w"),
        F.col("meta.declared_h").alias("declared_h"),
    )
    return flat.mapInPandas(_kernel, schema=DECODED_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: which frame indices to decode per clip,
    derived from declared metadata — the planning stays declarative; only
    the decode of chosen frames would hit the (stubbed) codec kernel."""
    n_frames = (F.octet_length("payload") % 240 + 8).alias("n_frames")
    return (
        df.filter(F.col("modality") == "video")
        .select("id", n_frames)
        .select(
            "id",
            "n_frames",
            F.sequence(
                F.lit(0), F.col("n_frames") - 1, F.lit(every_n)
            ).alias("frame_indices"),
        )
    )
