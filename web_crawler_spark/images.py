"""Image-payload pipeline: decode / encode / phash over binary columns.

The graft cell is pyspark × image (BASELINE.json input_hint): the payload
table is (image_id, bytes, w, h, fmt, caption, phash). This module makes
the Spark-side plumbing real — schema, Arrow batching, mapInPandas UDF
shape, partitioning — with a self-contained deterministic codec:

- PNG: a real, spec-conformant encoder/decoder (zlib + numpy, filter 0 /
  Paeth-free) — lossless round-trip, bit-exact across runs. No external
  image library is present in this environment, so this minimal codec IS
  the production seam; swapping in Pillow/libvips changes one function.
- JPEG: genuine DCT quantization is stubbed (no codec lib available). The
  lossy path is modeled by a clearly-marked deterministic surrogate —
  uniform pixel quantization at "quality" q — which preserves the property
  the per-row invariant tests (PSNR ≥ 40 dB vs the original, not equal).
  ``decode_jpeg_real`` raises NotImplementedError at the exact seam where
  a real codec plugs in.

phash: classic 64-bit DCT perceptual hash (resize 32×32 grayscale → 2D
DCT-II → top-left 8×8 minus DC → median threshold), pure numpy. Near-dup
images (re-encodes, mild quantization) land within Hamming ≤ 4
(north_rule: "phash-based near-dup on images").

Everything runs through ``mapInPandas`` with bounded Arrow batches — the
bytes column never passes through Python row-at-a-time, and never through
the driver.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PNG_SIG = b"\x89PNG\r\n\x1a\n"


# ----------------------------------------------------------- PNG codec -----
def encode_png(pixels: np.ndarray) -> bytes:
    """Minimal RGB8 PNG encoder (color type 2, bit depth 8, filter 0)."""
    h, w, _ = pixels.shape
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Decode the subset of PNG that encode_png emits (+ sub/up filters)."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos, w, h, idat = 8, 0, 0, b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", body[:10])
            if depth != 8 or ctype != 2:
                raise NotImplementedError("only RGB8 supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + ln
    raw = zlib.decompress(idat)
    stride = w * 3
    out = np.zeros((h, w, 3), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)], dtype=np.uint8)
        if f == 0:
            cur = line.copy()
        elif f == 2:  # up
            cur = (line.astype(np.int16) + prev).astype(np.uint8)
        elif f == 1:  # sub
            cur = line.copy()
            for x in range(3, stride):
                cur[x] = (int(cur[x]) + int(cur[x - 3])) & 0xFF
        else:
            raise NotImplementedError(f"PNG filter {f}")
        out[y] = cur.reshape(w, 3)
        prev = cur
    return out


# --------------------------------------------------- lossy path (stubbed) --
def decode_jpeg_real(data: bytes) -> np.ndarray:
    """Seam for a real JPEG codec. Not available in this container."""
    raise NotImplementedError(
        "real JPEG decode requires Pillow/libjpeg — not present; "
        "the deterministic surrogate (encode_lossy/decode_lossy) is used instead"
    )


LOSSY_MAGIC = b"LQNT"


def encode_lossy(pixels: np.ndarray, quality: int = 90) -> bytes:
    """Deterministic lossy surrogate: uniform quantization with step
    derived from quality, zlib-compressed. PSNR at q=90 is ~44 dB —
    inside the invariant's ≥40 dB band, like a real JPEG q=90."""
    step = max(1, (100 - quality) // 2)
    h, w, _ = pixels.shape
    q = (pixels.astype(np.int32) // step * step + step // 2).clip(0, 255).astype(np.uint8)
    return LOSSY_MAGIC + struct.pack(">IIB", w, h, step) + zlib.compress(q.tobytes(), 6)


def decode_lossy(data: bytes) -> np.ndarray:
    if data[:4] != LOSSY_MAGIC:
        raise ValueError("not a lossy-surrogate payload")
    w, h, _step = struct.unpack(">IIB", data[4:13])
    return np.frombuffer(zlib.decompress(data[13:]), dtype=np.uint8).reshape(h, w, 3)


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return decode_png(data)
    if fmt in ("jpeg", "jpg"):
        return decode_lossy(data)  # surrogate; see decode_jpeg_real
    raise ValueError(f"unknown fmt {fmt}")


# ------------------------------------------------------------- phash -------
_DCT32 = None


def _dct_matrix(n: int = 32) -> np.ndarray:
    global _DCT32
    if _DCT32 is None:
        k = np.arange(n)[:, None]
        i = np.arange(n)[None, :]
        m = np.cos(np.pi / n * (i + 0.5) * k)
        m[0] *= 1 / np.sqrt(2)
        _DCT32 = m * np.sqrt(2.0 / n)
    return _DCT32


def phash64(pixels: np.ndarray) -> int:
    """64-bit DCT perceptual hash (32×32 gray → DCT-II → 8×8 low-freq
    minus DC → median threshold). Signed int64 (Spark LongType)."""
    gray = pixels.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = gray.shape
    ys = (np.arange(32) * h // 32).clip(0, h - 1)
    xs = (np.arange(32) * w // 32).clip(0, w - 1)
    small = gray[np.ix_(ys, xs)]
    m = _dct_matrix(32)
    d = m @ small @ m.T
    block = d[:8, :8].flatten()
    block = np.delete(block, 0)
    med = np.median(block)
    bits = block > med
    val = 0
    for i, b in enumerate(bits):
        if b:
            val |= 1 << i
    if val >= 1 << 63:
        val -= 1 << 64
    return val


def synth_pixels(image_id: str, w: int, h: int) -> np.ndarray:
    """Deterministic procedural bitmap: smooth gradients + a seeded pattern
    (hash of image_id), so near-dup re-encodes stay phash-close while
    distinct ids differ. Pure numpy, no RNG state."""
    seed = zlib.crc32(image_id.encode()) & 0xFFFFFFFF
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    fx, fy = 1 + seed % 5, 1 + (seed >> 8) % 5
    phase = (seed >> 16) % 256 / 40.0
    r = 127.5 + 127.5 * np.sin(2 * np.pi * fx * xx / max(w, 1) + phase)
    g = 127.5 + 127.5 * np.sin(2 * np.pi * fy * yy / max(h, 1) + phase * 0.5)
    b = 127.5 + 127.5 * np.sin(2 * np.pi * (xx + yy) / max(w + h, 1) + phase * 0.25)
    base = np.stack([r, g, b], axis=-1)
    # seeded 8×8 block pattern: gives each id a distinctive low-frequency
    # structure (phash Hamming ~30 between distinct ids) while re-encodes
    # of the same id stay within Hamming ≤ 4. SplitMix64-style hash per
    # block, vectorized — no RNG state.
    bs = 8
    by, bx = (np.arange(h) // bs)[:, None], (np.arange(w) // bs)[None, :]
    with np.errstate(over="ignore"):  # modular uint64 arithmetic, by design
        z = (by.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
             + bx.astype(np.uint64) * np.uint64(0xBF58476D1CE4E5B9)
             + np.uint64(seed) * np.uint64(0x94D049BB133111EB))
        z = (z ^ (z >> np.uint64(31))) * np.uint64(0xD6E8FEB86659FD93)
        z = z ^ (z >> np.uint64(27))
    noise = (z % np.uint64(256)).astype(np.float64) - 128.0
    out = base * 0.4 + 127.5 * 0.6 + noise[..., None] * 0.6
    return out.clip(0, 255).astype(np.uint8)


# ------------------------------------------------- Spark-side pipeline -----
IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("phash", T.LongType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def image_features(images: DataFrame) -> DataFrame:
    """Decode + phash + luma per image via mapInPandas (Arrow-batched;
    bytes never hit the driver). Input: the input_hint schema."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                try:
                    px = decode_image(row["bytes"], row["fmt"])
                    rows.append(
                        (
                            row["image_id"], int(px.shape[1]), int(px.shape[0]),
                            row["fmt"], row["caption"], phash64(px),
                            float(px.astype(np.float64).mean()), True,
                        )
                    )
                except Exception:
                    rows.append(
                        (row["image_id"], None, None, row["fmt"], row["caption"],
                         None, None, False)
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields]
            )

    return images.mapInPandas(gen, IMAGE_FEATURES_SCHEMA)


def synthesize_images(
    spark, n: int, caption_fn=None, lossy_every: int = 4, neardup_every: int = 10
) -> DataFrame:
    """Deterministic images table in the input_hint shape, generated
    distributed (spark.range → mapInPandas): every ``lossy_every``-th row
    is the lossy surrogate, every ``neardup_every``-th row gets a sibling
    re-encode at q=85 (`<id>_dup`) that phash dedup must collapse."""
    from web_crawler_spark.schemas import IMAGES

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                image_id = f"img_{i:012d}"
                w = 16 + (zlib.crc32(f"{image_id}|w".encode()) % 6) * 16
                h = 16 + (zlib.crc32(f"{image_id}|h".encode()) % 6) * 16
                px = synth_pixels(image_id, w, h)
                fmt = "jpeg" if i % lossy_every == 0 else "png"
                data = encode_lossy(px, 90) if fmt == "jpeg" else encode_png(px)
                caption = caption_fn(i) if caption_fn else f"synthetic scene {i}"
                # phash of the *payload* (decoded bytes), so the stored value
                # equals what any downstream decode+phash pass recomputes
                ph = phash64(decode_lossy(data)) if fmt == "jpeg" else phash64(px)
                rows.append((image_id, data, w, h, fmt, caption, ph))
                if neardup_every and i % neardup_every == 0:
                    dup = encode_lossy(px, 85)
                    rows.append(
                        (f"{image_id}_dup", dup, w, h, "jpeg", caption,
                         phash64(decode_lossy(dup)))
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGES.fields])

    return spark.range(n).mapInPandas(gen, IMAGES)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 ** 2 / mse)


# --------------------------------------------- image+caption curation -----
# The standard web-scale image-text curation gates (the LAION/DataComp
# recipe family, applied to the reference's image+caption rows —
# input_hint schema; caption text comes from the extractors the reference
# builds in advanced-scraper.service.js). Pure column algebra: the gates
# read only the metadata columns (w, h, fmt, caption), never the bytes,
# so curation runs as a narrow projection ahead of any decode — at 100 TB
# the rejected rows never cost a decode or a shuffle.
CURATION_JUNK_RE = r"(?i)^(img|dsc|dcim|image|photo|untitled|screenshot)[-_ ]?[0-9]+"
CURATION_URL_RE = r"(?i)https?://"


def curate_pairs(
    df: DataFrame,
    min_dim: int = 64,
    max_aspect: float = 3.0,
    min_tokens: int = 2,
    max_tokens: int = 32,
    max_digit_ratio: float = 0.3,
    formats: tuple[str, ...] = ("png", "jpeg"),
) -> DataFrame:
    """Image+caption pair curation: append ``keep`` / ``reject_reason`` /
    ``aspect`` / ``n_caption_tokens`` to an input_hint-shaped table.

    Gate cascade (first failure names the reason, mirroring the public
    LAION-style filtering order):

    1. ``bad_format``     — fmt not in ``formats``
    2. ``too_small``      — min(w, h) < ``min_dim``
    3. ``bad_aspect``     — max(w,h)/min(w,h) > ``max_aspect``
    4. ``no_caption``     — NULL / whitespace-only caption
    5. ``caption_length`` — token count outside [min_tokens, max_tokens]
    6. ``junk_caption``   — filename-like caption (IMG_1234 …)
    7. ``url_in_caption`` — caption embeds a URL
    8. ``digit_heavy``    — digit chars ≥ ``max_digit_ratio`` of caption
    """
    cap = F.col("caption")
    trimmed = F.trim(F.regexp_replace(cap, r"\s+", " "))
    n_tokens = F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, " "))
    )
    digit_ratio = F.when(F.length(cap) > 0,
                         F.length(F.regexp_replace(cap, "[^0-9]", ""))
                         .cast("double") / F.length(cap)).otherwise(F.lit(0.0))
    aspect = (
        F.greatest("w", "h").cast("double") / F.least("w", "h").cast("double")
    )
    reason = (
        F.when(~F.col("fmt").isin(*formats), F.lit("bad_format"))
        .when(F.least("w", "h") < min_dim, F.lit("too_small"))
        .when(aspect > max_aspect, F.lit("bad_aspect"))
        .when(cap.isNull() | (F.length(trimmed) == 0), F.lit("no_caption"))
        .when(
            (n_tokens < min_tokens) | (n_tokens > max_tokens),
            F.lit("caption_length"),
        )
        .when(cap.rlike(CURATION_JUNK_RE), F.lit("junk_caption"))
        .when(cap.rlike(CURATION_URL_RE), F.lit("url_in_caption"))
        .when(digit_ratio >= max_digit_ratio, F.lit("digit_heavy"))
    )
    return df.select(
        "*",
        reason.isNull().alias("keep"),
        reason.alias("reject_reason"),
        F.round(aspect, 4).alias("aspect"),
        n_tokens.cast("long").alias("n_caption_tokens"),
    )
