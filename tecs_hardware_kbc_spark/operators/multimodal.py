"""Multimodal column plumbing (SURVEY S8 — the image/figure branch).

The reference's circular-connectors pipeline reads figures with PIL and
classifies them with a ResNet (``circular_connectors.py:83-151``). Decode
is tiered: PIL when importable (the reference's path), else a pure-Python
header parse of PNG/GIF/JPEG dimensions (real size metadata, no codec
library), else a deterministic md5 stub clearly marked as such. The
*Spark-side plumbing* — schema, Arrow batching, partitioning, UDF
signatures — is identical on every tier.

Media travel as opaque ``binary`` columns with typed metadata, the same
shape Common-Crawl WARC payloads take in the pages table.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
import pyspark.sql.functions as F
import pyspark.sql.types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("url", T.StringType(), True),
    T.StructField("kind", T.StringType(), False),      # image | audio | video
    T.StructField("content", T.BinaryType(), False),
    T.StructField("mime", T.StringType(), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("n_frames", T.IntegerType(), True),
    T.StructField("features", T.ArrayType(T.FloatType()), True),
])


def _fake_decode(content: bytes, kind: str) -> dict:
    """STUB — deterministic stand-in for PIL/ffmpeg decode.

    Derives fake dimensions and an 8-dim feature vector from the md5 of the
    payload. Replace with a real decoder on a cluster that ships the codec
    libraries; the schema and batching contract stay identical.
    """
    digest = hashlib.md5(content).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    n_frames = 1 if kind == "image" else 1 + digest[2] % 32
    features = [round(b / 255.0, 6) for b in digest[:8]]
    return {"width": width, "height": height, "n_frames": n_frames,
            "features": features}


def _parse_image_header(content: bytes) -> tuple[int, int] | None:
    """Pure-Python (width, height) from the container header of the common
    web image formats — a REAL decode of the size metadata, no codec
    library needed. Returns None for anything unrecognized."""
    if content[:8] == b"\x89PNG\r\n\x1a\n" and len(content) >= 24:
        return (int.from_bytes(content[16:20], "big"),
                int.from_bytes(content[20:24], "big"))
    if content[:6] in (b"GIF87a", b"GIF89a") and len(content) >= 10:
        return (int.from_bytes(content[6:8], "little"),
                int.from_bytes(content[8:10], "little"))
    if content[:2] == b"\xff\xd8":  # JPEG: scan segments for SOFn
        i = 2
        while i + 9 < len(content) and content[i] == 0xFF:
            marker = content[i + 1]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                return (int.from_bytes(content[i + 7:i + 9], "big"),
                        int.from_bytes(content[i + 5:i + 7], "big"))
            i += 2 + int.from_bytes(content[i + 2:i + 4], "big")
    return None


def _pil_decode(content: bytes, kind: str) -> dict | None:
    """Full decode via PIL when the library is present (the reference's
    actual path, circular_connectors.py:83-151). Feature vector = 4x2
    grayscale thumbnail intensities — deterministic, 8-dim like the stub."""
    if kind != "image":
        return None
    try:
        import io

        from PIL import Image
    except ImportError:
        return None
    try:
        img = Image.open(io.BytesIO(content))
        w, h = img.size
        n_frames = int(getattr(img, "n_frames", 1))
        thumb = img.convert("L").resize((4, 2))
        features = [round(p / 255.0, 6) for p in thumb.getdata()]
        return {"width": w, "height": h, "n_frames": n_frames,
                "features": features}
    except Exception:
        return None


def decode_media(content: bytes, kind: str) -> dict:
    """Tiered decode: PIL if importable -> header-only dimension parse
    (PNG/GIF/JPEG) with stub features -> full md5 stub. Synthetic oracle
    payloads are utf-8 text, which no tier above the stub accepts, so the
    DuckDB replay of the stub stays exact."""
    out = _pil_decode(content, kind)
    if out is not None:
        return out
    d = _fake_decode(content, kind)
    if kind == "image":
        dims = _parse_image_header(content)
        if dims is not None:
            d["width"], d["height"] = dims
    return d


def extract_media_features(media: DataFrame,
                           batch_size_hint: int = 256) -> DataFrame:
    """Arrow-batched decode/feature-extract over the binary column.

    ``mapInPandas`` so a real decoder can stream frames without
    materializing every row in memory; narrow (no shuffle).
    """
    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, kind, content in zip(pdf["media_id"], pdf["kind"],
                                               pdf["content"]):
                d = decode_media(bytes(content), kind)
                rows.append({"media_id": media_id, "kind": kind, **d})
            out = pd.DataFrame(
                rows, columns=[f.name for f in FEATURE_SCHEMA.fields])
            yield out

    return media.select("media_id", "kind", "content") \
        .mapInPandas(_extract, schema=FEATURE_SCHEMA)


def size_filter(features: DataFrame, min_px: int = 50) -> DataFrame:
    """The reference's >50px figure filter (circular_connectors.py:96-100)."""
    return features.filter((F.col("width") > min_px)
                           & (F.col("height") > min_px))


def frame_sample(features: DataFrame, every_n: int = 8) -> DataFrame:
    """Frame-sampling plan for video rows: explodes sampled frame indices
    (the real pipeline would decode those frames; the plumbing — explode
    shape, partition balance — is what this exercises)."""
    idx = F.sequence(F.lit(0),
                     F.greatest(F.col("n_frames") - 1, F.lit(0)),
                     F.lit(every_n))
    return features.filter(F.col("kind") == "video").select(
        "media_id", F.explode(idx).alias("frame_idx"))


def resize_spec(features: DataFrame, target: int = 224) -> DataFrame:
    """Deterministic resize plan (aspect-preserving short side = target)."""
    scale = target / F.least("width", "height")
    return features.select(
        "media_id",
        F.round(F.col("width") * scale).cast("int").alias("resized_w"),
        F.round(F.col("height") * scale).cast("int").alias("resized_h"),
    )
