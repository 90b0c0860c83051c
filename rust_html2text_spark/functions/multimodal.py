"""Multimodal columns: binary payloads + typed metadata, with REAL codecs
for PNG and WAV (pure stdlib: zlib / struct / wave — no PIL/ffmpeg needed)
and an honest stub for video (no container codec).

Decode / feature-extract / resize run as Arrow-batched `mapInPandas`
stages over `binary` columns.  Payload synthesis is deterministic in
doc_id, which makes the *features* analytically computable — the DuckDB
oracle in __spark_entry__ recomputes the expected channel sums / RMS from
the generating formulas without ever decoding a byte, so the whole
encode→decode→(resize→re-encode→decode) round trip is certified
end-to-end.  All features come from exact integer sums followed by one
float division (and sqrt for RMS), so the doubles are bit-identical
across engines.

The original digest-based plumbing stub (`extract_features`) is kept —
it is the schema-shape test for payloads with no available codec.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
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
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("digest", StringType()),
        StructField("feature_dim", IntegerType()),
        StructField("error", StringType()),
    ]
)


def _decode_payload(payload: bytes, kind: str, decode_stub: bool):
    if decode_stub:
        # deterministic fake decode: digest-derived "features"
        return hashlib.sha256(payload).hexdigest()
    raise NotImplementedError(
        "real media decode requires PIL/ffmpeg, not present in this container"
    )


# --- real codecs (pure stdlib) ------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def png_encode(rgb) -> bytes:
    """Encode an (H, W, 3) uint8 array as PNG (8-bit RGB, filter 0)."""
    import struct
    import zlib

    import numpy as np

    rgb = np.asarray(rgb, dtype=np.uint8)
    h, w, _ = rgb.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + rgb[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def png_decode(data: bytes):
    """Decode an 8-bit RGB PNG to an (H, W, 3) uint8 array.  Supports all
    five scanline filters (spec §9: None/Sub/Up/Average/Paeth)."""
    import struct
    import zlib

    import numpy as np

    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = b""
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color != 2 or interlace != 0:
                raise ValueError("only 8-bit RGB non-interlaced supported")
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if w is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(idat)
    stride = w * 3
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev).astype(np.uint8)
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need a left scan
            cur = line
            for i in range(stride):
                a = int(cur[i - 3]) if i >= 3 else 0
                b = int(prev[i])
                if ftype == 1:
                    cur[i] = (int(line[i]) + a) & 0xFF
                elif ftype == 3:
                    cur[i] = (int(line[i]) + (a + b) // 2) & 0xFF
                else:
                    c = int(prev[i - 3]) if i >= 3 else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[i] = (int(line[i]) + pred) & 0xFF
        else:
            raise ValueError(f"bad filter {ftype}")
        out[y] = cur
        prev = cur
    return out.reshape(h, w, 3)


def wav_encode(samples, sample_rate: int = 8000) -> bytes:
    """Encode int16 mono PCM as WAV via the stdlib wave module."""
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(sample_rate)
        wv.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def wav_decode(data: bytes):
    """Decode a mono 16-bit WAV to (sample_rate, int16 numpy array)."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(data), "rb") as wv:
        if wv.getnchannels() != 1 or wv.getsampwidth() != 2:
            raise ValueError("only mono PCM16 supported")
        rate = wv.getframerate()
        frames = wv.readframes(wv.getnframes())
    return rate, np.frombuffer(frames, dtype="<i2")


def _image_array(d: int):
    """Deterministic test image for doc_id d — the SQL oracle recomputes
    the channel sums from these exact formulas."""
    import numpy as np

    w = 8 + d % 8
    h = 8 + d % 5
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    r = (x + y + d) % 256
    g = (2 * x + d) % 256 + 0 * y
    b = (3 * y + d) % 256 + 0 * x
    return np.stack(
        [np.broadcast_to(r, (h, w)), np.broadcast_to(g, (h, w)),
         np.broadcast_to(b, (h, w))], axis=2
    ).astype(np.uint8)


def _audio_samples(d: int):
    import numpy as np

    n = 800 + d % 100
    i = np.arange(n, dtype=np.int64)
    return ((i * (d + 7)) % 2003 - 1001).astype(np.int16)


AUDIO_RATE = 8000

MEDIA_PAYLOAD_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
    ]
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """documents → media table with REAL payload bytes: PNG for doc_id%3==0,
    WAV for %3==1, opaque (no codec available) bytes for video %3==2."""
    from typing import Iterator

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in it:
            payloads = []
            kinds = []
            for d in batch["doc_id"]:
                d = int(d)
                if d % 3 == 0:
                    payloads.append(png_encode(_image_array(d)))
                    kinds.append("image")
                elif d % 3 == 1:
                    payloads.append(wav_encode(_audio_samples(d), AUDIO_RATE))
                    kinds.append("audio")
                else:
                    payloads.append(hashlib.sha256(str(d).encode()).digest() * 4)
                    kinds.append("video")
            yield pd.DataFrame(
                {"media_id": batch["doc_id"], "kind": kinds, "payload": payloads}
            )

    return docs.select("doc_id").mapInPandas(batches, MEDIA_PAYLOAD_SCHEMA)


DECODE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_r", DoubleType()),
        StructField("mean_g", DoubleType()),
        StructField("mean_b", DoubleType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("rms", DoubleType()),
        StructField("error", StringType()),
    ]
)


def decode_media(media: DataFrame) -> DataFrame:
    """Decode payload bytes and extract per-kind features.  Exact integer
    channel/energy sums, then one float division (+ sqrt) — bit-stable.
    Video has no codec in this container: a per-row error, never a task
    failure (frame-sampling is the documented stub)."""
    import math
    from typing import Iterator

    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in it:
            rows = []
            for mid, kind, payload in zip(
                batch["media_id"], batch["kind"], batch["payload"]
            ):
                row = {
                    "media_id": mid, "kind": kind, "width": None, "height": None,
                    "mean_r": None, "mean_g": None, "mean_b": None,
                    "sample_rate": None, "n_samples": None, "rms": None,
                    "error": None,
                }
                try:
                    if kind == "image":
                        arr = png_decode(bytes(payload))
                        h, w, _ = arr.shape
                        sums = arr.astype(np.int64).sum(axis=(0, 1))
                        row.update(
                            width=w, height=h,
                            mean_r=int(sums[0]) / (w * h),
                            mean_g=int(sums[1]) / (w * h),
                            mean_b=int(sums[2]) / (w * h),
                        )
                    elif kind == "audio":
                        rate, samples = wav_decode(bytes(payload))
                        s = samples.astype(np.int64)
                        row.update(
                            sample_rate=rate,
                            n_samples=len(s),
                            rms=math.sqrt(int((s * s).sum()) / len(s)),
                        )
                    else:
                        raise NotImplementedError(
                            "video codec not available; frame-sample stubbed"
                        )
                except NotImplementedError as e:
                    row["error"] = f"NotImplemented:{e}"
                except Exception as e:
                    row["error"] = f"Fail:{type(e).__name__}"
                rows.append(row)
            yield pd.DataFrame(rows)

    return media.select("media_id", "kind", "payload").mapInPandas(
        batches, DECODE_SCHEMA
    )


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbour resize of image payloads (decode → sample →
    re-encode PNG); non-image rows pass through untouched.  Source pixel
    for output (x, y) is (x*W//out_w, y*H//out_h) — mirrored analytically
    by the oracle."""
    from typing import Iterator

    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in it:
            payloads = []
            for kind, payload in zip(batch["kind"], batch["payload"]):
                if kind != "image":
                    payloads.append(payload)
                    continue
                arr = png_decode(bytes(payload))
                h, w, _ = arr.shape
                xs = (np.arange(out_w, dtype=np.int64) * w) // out_w
                ys = (np.arange(out_h, dtype=np.int64) * h) // out_h
                payloads.append(png_encode(arr[ys][:, xs]))
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "kind": batch["kind"],
                    "payload": payloads,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        batches, MEDIA_PAYLOAD_SCHEMA
    )


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize a media table from documents (payload = UTF-8 text bytes);
    deterministic, for exercising the plumbing."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(64).cast("int").alias("width"),
        F.lit(64).cast("int").alias("height"),
    )


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode + feature-extract as an Arrow-batched mapInPandas stage."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in it:
            digests = []
            errors = []
            for payload, kind in zip(batch["payload"], batch["kind"]):
                try:
                    digests.append(_decode_payload(bytes(payload), kind, decode_stub))
                    errors.append(None)
                except NotImplementedError as e:
                    digests.append(None)
                    errors.append(str(e))
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "kind": batch["kind"],
                    "n_bytes": batch["payload"].map(len),
                    "digest": digests,
                    "feature_dim": 256,
                    "error": errors,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        batches, FEATURE_SCHEMA
    )
