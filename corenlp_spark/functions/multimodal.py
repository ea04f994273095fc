"""Multimodal columns: opaque binary payloads + typed metadata.

The Spark-side plumbing (schema, partitioning, Arrow batch shape) is real,
and since r3 the decode kernels are REAL for self-describing containers
without any codec library: header metadata for PNG/GIF/BMP/JPEG/WAV, full
PNG pixel decode (stdlib zlib inflate + scanline unfilter), and WAV PCM
decode. Payloads that decode get real feature vectors (pixel statistics /
RMS energy windows); everything else falls to a clearly-marked
deterministic fake (the stand-in for learned encoders and the codecs this
container doesn't ship).

Pattern: media rides as ``binary`` columns with a typed metadata struct;
decode / feature-extract / resize / frame-sample run as ``mapInPandas``
iterator UDFs so one Arrow batch of payloads is processed per Python call
(never per-row). Each kernel dispatches to a real codec when the library
imports, else to a clearly-marked deterministic fake (tests exercise the
full plumbing either way).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_TYPE = (
    "struct<media_type:string, width:int, height:int, duration_ms:int, codec:string>"
)

try:  # real codecs when available; the container ships neither
    import PIL.Image  # noqa: F401

    _HAVE_PIL = True
except Exception:
    _HAVE_PIL = False


def media_table(docs: DataFrame) -> DataFrame:
    """Explode media spans into a media table with synthetic binary payloads.

    (At ingest on a real cluster the payload column comes from the object
    store; here a deterministic fake payload = sha256 stream keyed by the
    media_ref, so sizes/partitioning behave like real bytes.)
    """
    m = (
        docs.select("doc_id", F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select("doc_id", F.col("s.media_ref").alias("media_ref"),
                F.col("s.offset").alias("offset"))
    )
    payload = F.sha2(F.col("media_ref"), 512).cast("binary")
    media_type = F.regexp_extract("media_ref", r"^(\w+)://", 1)
    return m.withColumn("payload", payload).withColumn("media_type", media_type)


def _fake_decode(ref: str, payload: bytes) -> tuple[int, int, int, str]:
    """Deterministic fake decode (STUB): dims derived from the payload hash.

    Replace with PIL/ffmpeg when the codec libs are present (_HAVE_PIL)."""
    h = hashlib.sha256(payload or ref.encode()).digest()
    return 64 + h[0] % 1024, 64 + h[1] % 1024, (h[2] << 8 | h[3]) * 10, "fake"


def _header_decode(b: bytes):
    """REAL container-header metadata decode in pure Python — no codec
    library needed for dimensions/duration (the fields the 100 TB metadata
    pass actually extracts; pixel/PCM decode still needs the codec libs):

      PNG  — IHDR width/height (big-endian at offset 16);
      GIF  — logical-screen width/height (little-endian at offset 6);
      BMP  — BITMAPINFOHEADER width/height (little-endian at offset 18);
      JPEG — first SOF0-SOF3 frame header scan;
      WAV  — fmt chunk byte rate + data chunk size → duration in ms.

    Returns (width, height, duration_ms, codec) or None if the payload is
    not one of these containers (the deterministic fake then applies)."""
    import struct

    try:
        if b.startswith(b"\x89PNG\r\n\x1a\n") and len(b) >= 24:
            w, h = struct.unpack(">II", b[16:24])
            return w, h, 0, "png"
        if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
            w, h = struct.unpack("<HH", b[6:10])
            return w, h, 0, "gif"
        if b.startswith(b"BM") and len(b) >= 26:
            w, h = struct.unpack("<ii", b[18:26])
            return abs(w), abs(h), 0, "bmp"
        if b.startswith(b"\xff\xd8"):
            i = 2
            while i + 9 < len(b) and b[i] == 0xFF:
                marker, seglen = b[i + 1], struct.unpack(">H", b[i + 2:i + 4])[0]
                if 0xC0 <= marker <= 0xC3:
                    h, w = struct.unpack(">HH", b[i + 5:i + 9])
                    return w, h, 0, "jpeg"
                i += 2 + seglen
            return None
        if b.startswith(b"RIFF") and b[8:12] == b"WAVE":
            i, byte_rate, data_len = 12, None, None
            while i + 8 <= len(b):
                cid, clen = b[i:i + 4], struct.unpack("<I", b[i + 4:i + 8])[0]
                if cid == b"fmt " and i + 16 <= len(b):
                    byte_rate = struct.unpack("<I", b[i + 16:i + 20])[0]
                elif cid == b"data":
                    data_len = clen
                i += 8 + clen + (clen & 1)
            if byte_rate and data_len is not None:
                return 0, 0, int(data_len * 1000 / byte_rate), "wav"
        return None
    except (struct.error, IndexError):
        return None


def _pil_decode(payload: bytes):
    """Real image decode via PIL when available; None if the payload is not a
    decodable image (synthetic hash payloads fall back to _fake_decode)."""
    try:
        from io import BytesIO

        import PIL.Image

        with PIL.Image.open(BytesIO(payload)) as im:
            return im.width, im.height, 0, (im.format or "img").lower()
    except Exception:
        return None


def decode_metadata(media: DataFrame) -> DataFrame:
    """+ meta struct column via Arrow-batched decode.

    Dispatch: real PIL decode when the library imports AND the payload is a
    decodable image; deterministic fake otherwise (ADVICE.md round 1 — never
    raise based on library presence)."""
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in media.schema.fields)
    out_schema += f", meta {MEDIA_META_TYPE}"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for ref, mt, payload in zip(pdf["media_ref"], pdf["media_type"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                # dispatch: real container-header parse (pure Python),
                # then PIL when importable, then the deterministic fake
                decoded = _header_decode(raw)
                if decoded is None and _HAVE_PIL and mt == "img":
                    decoded = _pil_decode(raw)
                if decoded is not None:
                    w, h, dur, codec = decoded
                else:
                    w, h, dur, codec = _fake_decode(ref, raw)
                metas.append({
                    "media_type": mt, "width": w, "height": h,
                    "duration_ms": dur if mt in ("audio", "video") else 0,
                    "codec": codec,
                })
            pdf = pdf.copy()
            pdf["meta"] = metas
            yield pdf

    return media.mapInPandas(run, schema=out_schema)


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """+ feature vector column (array<float>).

    REAL kernels when the payload decodes without codec libs — PNG pixels
    (stdlib zlib inflate + unfilter) → channel means + luminance grid;
    WAV PCM → per-window RMS energies — else the deterministic fake
    embedding (STUB for a learned vision/audio encoder). Batch shape and
    schema are identical on every path."""
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in media.schema.fields)
    out_schema += ", features array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                real = _real_features(b, dim)
                if real is not None:
                    feats.append(real)
                    continue
                h = hashlib.sha512(b).digest()
                v = np.frombuffer(h[: dim * 4], dtype=np.uint32).astype(np.float32)
                v = (v / np.float32(2 ** 32)) * 2.0 - 1.0
                feats.append([float(x) for x in v])
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf

    return media.mapInPandas(run, schema=out_schema)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video media: one row per planned frame.

    The decode itself is the stubbed kernel; the plan (explode over
    timestamps, partition-preserving) is the real Spark work at scale."""
    vids = media.filter(F.col("media_type") == "video")
    with_meta = decode_metadata(vids)
    ts = F.sequence(
        F.lit(0),
        F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
        F.lit(every_ms),
    )
    return with_meta.select(
        "doc_id", "media_ref", F.posexplode(ts).alias("frame_idx", "ts_ms")
    )


def _png_pixels(b: bytes):
    """REAL PNG pixel decode in pure stdlib Python (zlib inflate + scanline
    unfilter per the PNG spec, filters 0-4 incl. Paeth): supports 8-bit
    truecolor (color type 2) and truecolor+alpha (6), non-interlaced.
    Returns (height, width, channels) uint8 numpy array or None."""
    import struct
    import zlib

    if not b.startswith(b"\x89PNG\r\n\x1a\n"):
        return None
    i, w = 8, None
    idat = bytearray()
    try:
        while i + 8 <= len(b):
            clen, ctype = struct.unpack(">I4s", b[i:i + 8])
            data = b[i + 8:i + 8 + clen]
            if ctype == b"IHDR":
                w, h, depth, color, _, _, interlace = struct.unpack(
                    ">IIBBBBB", data[:13])
                if depth != 8 or color not in (2, 6) or interlace:
                    return None
                ch = 3 if color == 2 else 4
            elif ctype == b"IDAT":
                idat.extend(data)
            elif ctype == b"IEND":
                break
            i += 12 + clen
        if w is None or not idat:
            return None
        raw = zlib.decompress(bytes(idat))
        stride = w * ch
        out = np.zeros((h, stride), dtype=np.uint8)
        pos = 0
        prev = np.zeros(stride, dtype=np.uint8)
        for row in range(h):
            ftype = raw[pos]
            line = np.frombuffer(raw, dtype=np.uint8,
                                 count=stride, offset=pos + 1).copy()
            pos += 1 + stride
            if ftype == 1:  # Sub
                for x in range(ch, stride):
                    line[x] = (int(line[x]) + int(line[x - ch])) & 0xFF
            elif ftype == 2:  # Up
                line = (line.astype(np.uint16) + prev) .astype(np.uint8)
            elif ftype == 3:  # Average
                for x in range(stride):
                    a = int(line[x - ch]) if x >= ch else 0
                    line[x] = (int(line[x]) + ((a + int(prev[x])) >> 1)) & 0xFF
            elif ftype == 4:  # Paeth
                for x in range(stride):
                    a = int(line[x - ch]) if x >= ch else 0
                    bb = int(prev[x])
                    c = int(prev[x - ch]) if x >= ch else 0
                    p = a + bb - c
                    pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (bb if pb <= pc else c)
                    line[x] = (int(line[x]) + pred) & 0xFF
            out[row] = line
            prev = out[row]
        return out.reshape(h, w, ch)
    except (struct.error, zlib.error, IndexError, ValueError):
        return None


def _wav_pcm(b: bytes):
    """REAL WAV PCM decode (16-bit little-endian mono/stereo) → float array
    in [-1, 1], or None."""
    import struct

    if not (b.startswith(b"RIFF") and b[8:12] == b"WAVE"):
        return None
    i, bits, data = 12, None, None
    try:
        while i + 8 <= len(b):
            cid, clen = b[i:i + 4], struct.unpack("<I", b[i + 4:i + 8])[0]
            if cid == b"fmt ":
                bits = struct.unpack("<H", b[i + 22:i + 24])[0]
            elif cid == b"data":
                data = b[i + 8:i + 8 + clen]
            i += 8 + clen + (clen & 1)
        if bits != 16 or not data:
            return None
        pcm = np.frombuffer(data[: len(data) // 2 * 2], dtype="<i2")
        return pcm.astype(np.float32) / 32768.0
    except (struct.error, IndexError):
        return None


def _real_features(payload: bytes, dim: int):
    """Feature kernel dispatch: PNG → per-channel means + luminance grid;
    WAV → per-window RMS energies; None when neither decodes (the
    deterministic fake then applies)."""
    px = _png_pixels(payload)
    if px is not None:
        h, w, ch = px.shape
        f = [float(px[..., c].mean()) / 255.0 for c in range(min(ch, 3))]
        lum = px[..., :3].mean(axis=2)
        g = max(1, int((dim - len(f)) ** 0.5))
        ys = np.array_split(np.arange(h), g)
        xs = np.array_split(np.arange(w), g)
        for yb in ys:
            for xb in xs:
                f.append(float(lum[np.ix_(yb, xb)].mean()) / 255.0)
        f = (f + [0.0] * dim)[:dim]
        return [float(x) for x in f]
    pcm = _wav_pcm(payload)
    if pcm is not None and len(pcm):
        wins = np.array_split(pcm, dim)
        return [float(np.sqrt(np.mean(wn * wn))) if len(wn) else 0.0
                for wn in wins]
    return None


def _png_encode(px) -> bytes:
    """Minimal PNG writer (filter 0, 8-bit RGB/RGBA) — the inverse of
    ``_png_pixels`` for the resize kernel's output."""
    import struct
    import zlib

    h, w, ch = px.shape
    color = 2 if ch == 3 else 6

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data)))

    raw = b"".join(b"\x00" + px[row].tobytes() for row in range(h))
    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """+ resized payload column: REAL nearest-neighbor resize for PNG
    payloads (decode → numpy index-map → re-encode, all stdlib);
    non-PNG payloads pass through unchanged with resized=false. One Arrow
    batch per call — the standard thumbnail/normalization pass of a
    multimodal ingest pipeline."""
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                           for f in media.schema.fields)
    out_schema += ", resized_payload binary, resized boolean"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs, flags = [], []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                px = _png_pixels(b)
                if px is None:
                    outs.append(b)
                    flags.append(False)
                    continue
                h, w, _ = px.shape
                ys = (np.arange(height) * h // height).clip(0, h - 1)
                xs = (np.arange(width) * w // width).clip(0, w - 1)
                outs.append(_png_encode(px[np.ix_(ys, xs)]))
                flags.append(True)
            pdf = pdf.copy()
            pdf["resized_payload"] = outs
            pdf["resized"] = flags
            yield pdf

    return media.mapInPandas(run, schema=out_schema)
