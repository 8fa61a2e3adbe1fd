"""Multimodal columns for training-data pipelines.

Images/audio/video ride through the engine as opaque BINARY columns
plus a typed metadata struct.  The Spark-side plumbing — schemas,
Arrow batch shape, partition sizing, UDF signatures — is real and
tested.  Decode is REAL, stdlib/numpy-only, for every modality:
images — PNG (zlib inflate + full filter reconstruction), baseline
sequential JPEG (riot_spark.jpeg: Huffman + dequant + IDCT + chroma
upsample), PPM (P6), BMP (24-bit BI_RGB); audio — WAV/RIFF container
walk with mono 16-bit PCM and G.711 mu-law expansion; video —
YUV4MPEG2 (y4m) stream parse with Cmono plane extraction.  Formats
beyond those (e.g. MP4/H.264, MP3, chroma-subsampled y4m) need codecs
the container doesn't ship and raise NotImplementedError honestly; a
deterministic fake decoder (`fake=True`) synthesizes pixel arrays
from the md5 of the payload for end-to-end plumbing tests of such
payloads.

Scale notes: media rows are fat — `media_repartition` targets a bytes
budget per partition (not a row count) so executor memory survives
100 MB videos; feature extraction is mapInPandas with small Arrow
batches to bound peak memory.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)


def _fake_pixels(payload: bytes, w: int, h: int) -> np.ndarray:
    """Deterministic pixel fake: md5-seeded byte tiling (stands in for
    a real JPEG decode; same payload => same pixels)."""
    seed = hashlib.md5(payload).digest()
    base = np.frombuffer(seed, dtype=np.uint8)
    n = w * h * 3
    return np.resize(base, n).reshape(h, w, 3)


def _fake_pixels_batch(payloads: list[bytes], w: int, h: int) -> np.ndarray:
    """Batch twin of `_fake_pixels`: one md5 per payload (inherently
    per-row), then ONE fancy-index tiles every digest to (N, h, w, 3) —
    no per-row numpy churn."""
    digs = np.frombuffer(
        b"".join(hashlib.md5(p).digest() for p in payloads), dtype=np.uint8
    ).reshape(len(payloads), 16)
    idx = np.arange(w * h * 3) % 16
    return digs[:, idx].reshape(len(payloads), h, w, 3)


def _metas_wh(metas) -> list[tuple[int, int]]:
    out = []
    for m in metas:
        if not isinstance(m, dict):
            m = m.asDict() if m is not None else {}
        out.append(((m.get("width") or 8), (m.get("height") or 8)))
    return out


def _wh_groups(whs: list[tuple[int, int]]) -> dict[tuple[int, int], list[int]]:
    groups: dict[tuple[int, int], list[int]] = {}
    for i, wh in enumerate(whs):
        groups.setdefault(wh, []).append(i)
    return groups


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def png_encode(px: np.ndarray, level: int = 6) -> bytes:
    """Minimal real PNG writer: 8-bit RGB, filter type 0 per scanline,
    one zlib IDAT.  Any standards-compliant reader (including
    :func:`png_decode`) reproduces the pixels byte-exactly."""
    px = np.ascontiguousarray(px, dtype=np.uint8)
    h, w, c = px.shape
    if c != 3:
        raise ValueError("png_encode writes 8-bit RGB only")
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), px.reshape(h, w * c)], axis=1
    ).tobytes()

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, level))
        + chunk(b"IEND", b"")
    )


def _png_unfilter(raw: bytes, w: int, h: int, ch: int) -> np.ndarray:
    """PNG filter reconstruction (spec §9): Sub/Up/Average/Paeth over
    the decompressed scanline stream.  Up/None vectorize per row;
    Sub/Average/Paeth carry a within-row dependency, walked per pixel
    (rows are short relative to the zlib inflate that dominates)."""
    stride = w * ch
    out = np.zeros((h, stride), np.uint8)
    buf = np.frombuffer(raw, np.uint8)
    if buf.size != h * (stride + 1):
        raise ValueError("PNG scanline stream length mismatch")
    buf = buf.reshape(h, stride + 1)
    for y in range(h):
        ftype = int(buf[y, 0])
        line = buf[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ftype == 0:
            rec = line
        elif ftype == 2:  # Up
            rec = line + prev
        else:
            # Average/Paeth predictors are nonlinear (floor-div, abs
            # comparisons), so each reconstructed byte must be reduced
            # mod 256 BEFORE it feeds the next pixel's predictor
            rec = np.empty(stride, np.int32)
            for x in range(stride):
                a = rec[x - ch] if x >= ch else 0
                b = prev[x]
                if ftype == 1:  # Sub
                    rec[x] = (line[x] + a) & 0xFF
                elif ftype == 3:  # Average
                    rec[x] = (line[x] + (a + b) // 2) & 0xFF
                elif ftype == 4:  # Paeth
                    c = prev[x - ch] if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    rec[x] = (line[x] + pr) & 0xFF
                else:
                    raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = rec & 0xFF
    return out


def png_decode(data: bytes) -> np.ndarray:
    """Real PNG decode with stdlib zlib only: 8-bit depth, color types
    0 (gray, expanded), 2 (RGB), 6 (RGBA, alpha dropped),
    non-interlaced.  Returns (h, w, 3) uint8."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise NotImplementedError(
            f"unsupported PNG shape (depth={depth}, interlace={interlace})"
        )
    ch = {0: 1, 2: 3, 6: 4}.get(ctype)
    if ch is None:
        raise NotImplementedError(f"unsupported PNG color type {ctype}")
    raw = zlib.decompress(b"".join(idat))
    px = _png_unfilter(raw, w, h, ch).reshape(h, w, ch)
    if ch == 1:
        return np.repeat(px, 3, axis=2)
    return np.ascontiguousarray(px[:, :, :3])


def ppm_decode(data: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval 255) -> (h, w, 3) uint8."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    fields, pos = [], 2
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment to EOL
            while data[pos : pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError("PPM maxval != 255")
    return np.frombuffer(data, np.uint8, w * h * 3, pos).reshape(h, w, 3)


def bmp_decode(data: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB, bottom-up)
    -> (h, w, 3) uint8 RGB."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (off,) = struct.unpack("<I", data[10:14])
    hsz, w, h, planes, bpp, compression = struct.unpack("<IiihhI", data[14:34])
    if bpp != 24 or compression != 0:
        raise NotImplementedError("only 24-bit BI_RGB BMP")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(data, np.uint8, stride * h, off).reshape(h, stride)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    if flip:
        bgr = bgr[::-1]
    return np.ascontiguousarray(bgr[:, :, ::-1])  # BGR -> RGB


def decode_image(payload: bytes, meta: dict, fake: bool = False) -> np.ndarray:
    """Decode an image payload to (h, w, 3) uint8 RGB.  Real decoders
    (magic-byte sniffed, no external deps): PNG, baseline JPEG,
    PPM/P6, 24-bit BMP.  Other formats need codecs the container
    doesn't ship — NotImplementedError, with `fake=True` as the
    deterministic md5-tiled stand-in for plumbing tests."""
    if fake:
        return _fake_pixels(payload, meta.get("width") or 8, meta.get("height") or 8)
    if payload[:8] == _PNG_SIG:
        return png_decode(payload)
    if payload[:2] == b"\xff\xd8":
        from riot_spark.jpeg import jpeg_decode

        return jpeg_decode(payload)
    if payload[:2] == b"P6":
        return ppm_decode(payload)
    if payload[:2] == b"BM":
        return bmp_decode(payload)
    raise NotImplementedError(
        "real decode covers PNG/JPEG/PPM/BMP (stdlib-only); this "
        "payload needs a codec the container does not ship — use "
        "fake=True for the deterministic stub"
    )


def generate_media(ids: DataFrame, w: int = 8, h: int = 8) -> DataFrame:
    """Deterministic REAL-PNG media fixture over an id column: pixel
    i (flat RGB order) of media_id m is ``(m*7 + i*13) % 256`` — a
    closed form an independent SQL oracle can recompute with
    ``generate_series``, so any downstream feature value that matches
    proves the engine genuinely inflated + unfiltered the PNG payload
    (nothing about the pixels survives outside the compressed IDAT).
    Input: a DataFrame with a ``media_id`` (or ``doc_id``) column."""
    col = "media_id" if "media_id" in ids.columns else "doc_id"
    n = w * h * 3

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        i13 = (np.arange(n, dtype=np.int64) * 13) % 256
        for pdf in batches:
            mids = pdf[col].to_numpy(np.int64)
            px = ((mids[:, None] * 7) % 256 + i13[None, :]) % 256
            payloads = [
                png_encode(row.astype(np.uint8).reshape(h, w, 3))
                for row in px
            ]
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "kind": "image",
                    "payload": payloads,
                    "mime": "image/png",
                    "width": np.int32(w),
                    "height": np.int32(h),
                }
            )

    flat = ids.select(col).mapInPandas(
        emit,
        schema=(
            "media_id LONG, kind STRING, payload BINARY, mime STRING, "
            "width INT, height INT"
        ),
    )
    return flat.select(
        "media_id",
        "kind",
        "payload",
        F.struct(
            "mime", "width", "height",
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def generate_media_jpeg(ids: DataFrame, w: int = 16, h: int = 16) -> DataFrame:
    """Deterministic REAL-JPEG media fixture: grayscale baseline JPEG
    whose 8x8 blocks are each CONSTANT — block j (raster order) of
    media_id m has gray value ``(m*7 + j*13) % 256``.  Flat blocks +
    quality-100 (all-ones) quantization sit in the codec's
    exact-roundtrip subspace (DC-only coefficients quantize without
    loss and IDCT back bit-exactly), so even though JPEG is lossy, an
    independent SQL oracle can recompute downstream features from the
    closed form — matching values prove the engine genuinely
    Huffman-decoded and IDCT'd the payload.  w and h must be
    multiples of 8."""
    from riot_spark.jpeg import jpeg_encode

    if w % 8 or h % 8:
        raise ValueError("JPEG fixture needs w, h multiples of 8")
    col = "media_id" if "media_id" in ids.columns else "doc_id"
    nbx = w // 8

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids = pdf[col].to_numpy(np.int64)
            payloads = []
            for m in mids:
                g = np.zeros((h, w), np.uint8)
                for by in range(h // 8):
                    for bx in range(nbx):
                        j = by * nbx + bx
                        g[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                            int(m) * 7 + j * 13
                        ) % 256
                payloads.append(jpeg_encode(g, quality=100))
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "kind": "image",
                    "payload": payloads,
                    "mime": "image/jpeg",
                    "width": np.int32(w),
                    "height": np.int32(h),
                }
            )

    flat = ids.select(col).mapInPandas(
        emit,
        schema=(
            "media_id LONG, kind STRING, payload BINARY, mime STRING, "
            "width INT, height INT"
        ),
    )
    return flat.select(
        "media_id",
        "kind",
        "payload",
        F.struct(
            "mime", "width", "height",
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


# ------------------------------------------------------------ audio (WAV)

_ULAW_BIAS = 0x84


def ulaw_expand(codes: np.ndarray) -> np.ndarray:
    """G.711 mu-law codeword -> linear int16, vectorized (public
    standard; same piecewise form as the CCITT reference expander).
    Every byte 0..255 is a valid codeword, so any byte stream is in
    the codec's exact domain — no roundtrip subspace trick needed."""
    u = (~codes.astype(np.int64)) & 0xFF
    mag = (((u & 0x0F) << 3) + _ULAW_BIAS) << ((u >> 4) & 0x07)
    mag -= _ULAW_BIAS
    return np.where(u & 0x80, -mag, mag).astype(np.int16)


def wav_encode_ulaw(codes: np.ndarray, sample_rate: int) -> bytes:
    """Real RIFF/WAVE writer, mono 8-bit mu-law (wFormatTag=7).  The
    non-PCM `fact` chunk is included per spec."""
    body = np.ascontiguousarray(codes, dtype=np.uint8).tobytes()
    fmt = struct.pack("<HHIIHH", 7, 1, sample_rate, sample_rate, 1, 8)
    fact = struct.pack("<I", len(body))
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(body)) + body
        + (b"\x00" if len(body) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def wav_encode_pcm16(samples: np.ndarray, sample_rate: int) -> bytes:
    """Real RIFF/WAVE writer, mono 16-bit little-endian PCM."""
    body = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """Real WAV decode, stdlib-only: walks the RIFF chunk list (odd
    chunk sizes padded per spec), reads `fmt `, and decodes mono
    16-bit PCM (tag 1) or 8-bit G.711 mu-law (tag 7) `data` to linear
    int16.  Other format tags / channel counts need codecs the
    container doesn't ship -> NotImplementedError."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, body = 12, None, None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        chunk = data[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # RIFF pads odd chunks
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", chunk[:16])
        elif tag == b"data":
            body = chunk
    if fmt is None or body is None:
        raise ValueError("WAV missing fmt/data chunk")
    wtag, nch, rate, _brate, _balign, bits = fmt
    if nch != 1:
        raise NotImplementedError("only mono WAV is decoded")
    if wtag == 1 and bits == 16:
        return np.frombuffer(body, dtype="<i2").astype(np.int16), rate
    if wtag == 7 and bits == 8:
        return ulaw_expand(np.frombuffer(body, dtype=np.uint8)), rate
    raise NotImplementedError(
        f"WAV format tag {wtag}/{bits}-bit needs a codec the container "
        "does not ship (decoded: PCM16, G.711 mu-law)"
    )


def generate_media_wav(
    ids: DataFrame, n_samples: int = 256, sample_rate: int = 8000
) -> DataFrame:
    """Deterministic REAL-WAV media fixture: mono G.711 mu-law, code i
    of media_id m = ``(m*7 + i*13) % 256``.  The linear samples exist
    only behind the nonlinear mu-law expansion, so a SQL oracle that
    recomputes the expansion from the closed form and matches the
    engine's features proves a genuine RIFF parse + G.711 decode ran
    (same proof shape as the JPEG fixture)."""
    col = "media_id" if "media_id" in ids.columns else "doc_id"
    dur = n_samples * 1000 // sample_rate

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        i13 = (np.arange(n_samples, dtype=np.int64) * 13) % 256
        for pdf in batches:
            mids = pdf[col].to_numpy(np.int64)
            codes = ((mids[:, None] * 7) % 256 + i13[None, :]) % 256
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "kind": "audio",
                    "payload": [
                        wav_encode_ulaw(row.astype(np.uint8), sample_rate)
                        for row in codes
                    ],
                    "mime": "audio/wav",
                    "duration_ms": np.int32(dur),
                    "sample_rate": np.int32(sample_rate),
                }
            )

    flat = ids.select(col).mapInPandas(
        emit,
        schema=(
            "media_id LONG, kind STRING, payload BINARY, mime STRING, "
            "duration_ms INT, sample_rate INT"
        ),
    )
    return flat.select(
        "media_id",
        "kind",
        "payload",
        F.struct(
            "mime",
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            "duration_ms",
            "sample_rate",
        ).alias("meta"),
    )


def audio_features(media: DataFrame, batch_rows: int = 256) -> DataFrame:
    """(media_id, n_samples, sample_rate, mean_amp, rms, peak,
    zero_crossings) from REAL-decoded WAV samples via mapInPandas.

    All aggregates stay in the exact-double regime: sums of int16 /
    int16^2 over <=2^20 samples are < 2^53, and n_samples a power of
    two keeps the divisions exact, so an independent SQL oracle
    reproduces every value bit-for-bit."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                out = []
                for mid, payload in zip(chunk["media_id"], chunk["payload"]):
                    v, rate = wav_decode(bytes(payload))
                    v64 = v.astype(np.int64)
                    n = v.size
                    neg = v < 0
                    out.append(
                        (
                            int(mid),
                            n,
                            rate,
                            float(v64.sum()) / n if n else 0.0,
                            float(np.sqrt(float((v64 * v64).sum()) / n))
                            if n else 0.0,
                            int(np.abs(v64).max()) if n else 0,
                            int(np.count_nonzero(neg[:-1] != neg[1:])),
                        )
                    )
                yield pd.DataFrame(
                    out,
                    columns=[
                        "media_id", "n_samples", "sample_rate",
                        "mean_amp", "rms", "peak", "zero_crossings",
                    ],
                )

    return media.select("media_id", "payload").mapInPandas(
        run,
        schema=(
            "media_id LONG, n_samples INT, sample_rate INT, "
            "mean_amp DOUBLE, rms DOUBLE, peak INT, zero_crossings INT"
        ),
    )


# ------------------------------------------------------------ video (Y4M)


def y4m_encode(
    frames: np.ndarray, fps: tuple[int, int] = (1, 1)
) -> bytes:
    """Real YUV4MPEG2 writer, Cmono (grayscale plane per frame).
    frames: (n, h, w) uint8."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w = frames.shape
    head = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 Cmono\n"
    parts = [head.encode("ascii")]
    for f in range(n):
        parts.append(b"FRAME\n")
        parts.append(frames[f].tobytes())
    return b"".join(parts)


def y4m_decode(data: bytes) -> tuple[np.ndarray, tuple[int, int]]:
    """Real YUV4MPEG2 decode, stdlib-only: parses the stream header
    (W/H/F/C tags), then walks FRAME headers extracting raw planes.
    Cmono only — chroma-subsampled colorspaces need a converter the
    container doesn't ship -> NotImplementedError.  Returns
    ((n, h, w) uint8, (fps_num, fps_den))."""
    eol = data.find(b"\n")
    if eol < 0 or not data.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = num = den = None
    cspace = "420jpeg"  # spec default when C is absent
    for tok in data[:eol].decode("ascii").split()[1:]:
        key, val = tok[0], tok[1:]
        if key == "W":
            w = int(val)
        elif key == "H":
            h = int(val)
        elif key == "F":
            num, den = (int(x) for x in val.split(":"))
        elif key == "C":
            cspace = val
    if not (w and h and num and den):
        raise ValueError("YUV4MPEG2 header missing W/H/F")
    if cspace != "mono":
        raise NotImplementedError(
            f"y4m colorspace C{cspace} needs a chroma converter the "
            "container does not ship (decoded: Cmono)"
        )
    pos, size, frames = eol + 1, w * h, []
    while pos < len(data):
        feol = data.find(b"\n", pos)
        if feol < 0 or data[pos : pos + 5] != b"FRAME":
            raise ValueError("malformed FRAME header")
        pos = feol + 1
        frames.append(np.frombuffer(data, np.uint8, size, pos).reshape(h, w))
        pos += size
    return np.stack(frames) if frames else np.zeros((0, h, w), np.uint8), (
        num,
        den,
    )


def generate_media_y4m(
    ids: DataFrame, w: int = 16, h: int = 16, max_frames: int = 10
) -> DataFrame:
    """Deterministic REAL-Y4M media fixture: media_id m carries
    ``m % max_frames + 1`` mono frames at 1 fps; pixel i (raster) of
    frame f = ``(m*7 + f*31 + i*13) % 256``.  Frame pixels live only
    inside the stream payload at offsets the FRAME walk must get
    right, so per-frame features matching the closed-form SQL oracle
    prove a genuine container parse + plane extraction."""
    col = "media_id" if "media_id" in ids.columns else "doc_id"
    n_px = w * h

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        i13 = (np.arange(n_px, dtype=np.int64) * 13) % 256
        for pdf in batches:
            mids = pdf[col].to_numpy(np.int64)
            payloads, durs = [], []
            for m in mids:
                nf = int(m) % max_frames + 1
                f31 = (np.arange(nf, dtype=np.int64) * 31) % 256
                px = (
                    (int(m) * 7) % 256 + f31[:, None] + i13[None, :]
                ) % 256
                payloads.append(
                    y4m_encode(px.astype(np.uint8).reshape(nf, h, w))
                )
                durs.append(nf * 1000)
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "kind": "video",
                    "payload": payloads,
                    "mime": "video/x-yuv4mpeg",
                    "width": np.int32(w),
                    "height": np.int32(h),
                    "duration_ms": np.array(durs, np.int32),
                }
            )

    flat = ids.select(col).mapInPandas(
        emit,
        schema=(
            "media_id LONG, kind STRING, payload BINARY, mime STRING, "
            "width INT, height INT, duration_ms INT"
        ),
    )
    return flat.select(
        "media_id",
        "kind",
        "payload",
        F.struct(
            "mime", "width", "height", "duration_ms",
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def image_features(
    media: DataFrame, fake: bool = True, batch_rows: int = 64
) -> DataFrame:
    """(media_id, mean_r, mean_g, mean_b, brightness) via mapInPandas.

    Small Arrow batches keep peak memory = batch_rows * payload size.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                if not fake:
                    # real-decode path stays per-row (codec call is
                    # per-payload anyway)
                    out = []
                    for mid, payload, meta in zip(
                        chunk["media_id"], chunk["payload"], chunk["meta"]
                    ):
                        if not isinstance(meta, dict):
                            meta = meta.asDict() if meta is not None else {}
                        px = decode_image(bytes(payload), meta, fake=False)
                        means = px.reshape(-1, 3).mean(axis=0)
                        out.append(
                            (int(mid), float(means[0]), float(means[1]),
                             float(means[2]), float(px.mean()))
                        )
                    yield pd.DataFrame(
                        out,
                        columns=["media_id", "mean_r", "mean_g", "mean_b",
                                 "brightness"],
                    )
                    continue
                # fake path: batch numpy — md5 per row, then one tiled
                # fancy-index + axis means per (w, h) shape group
                payloads = [bytes(p) for p in chunk["payload"]]
                res = np.empty((len(chunk), 4), dtype=np.float64)
                for (w, h), idxs in _wh_groups(
                    _metas_wh(chunk["meta"])
                ).items():
                    px = _fake_pixels_batch(
                        [payloads[i] for i in idxs], w, h
                    ).astype(np.float64)
                    flat = px.reshape(len(idxs), -1, 3)
                    res[idxs, :3] = flat.mean(axis=1)
                    res[idxs, 3] = flat.reshape(len(idxs), -1).mean(axis=1)
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].to_numpy(np.int64),
                        "mean_r": res[:, 0],
                        "mean_g": res[:, 1],
                        "mean_b": res[:, 2],
                        "brightness": res[:, 3],
                    }
                )

    cols = media.select("media_id", "payload", "meta")
    return cols.mapInPandas(
        run,
        schema=(
            "media_id LONG, mean_r DOUBLE, mean_g DOUBLE, "
            "mean_b DOUBLE, brightness DOUBLE"
        ),
    )


def resize_images(media: DataFrame, w: int, h: int, fake: bool = True) -> DataFrame:
    """(media_id, payload BINARY) — nearest-neighbor resize of the
    decoded pixels, re-emitted as raw RGB bytes + updated meta."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                ids, outs = [], []
                for mid, payload, meta in zip(
                    pdf["media_id"], pdf["payload"], pdf["meta"]
                ):
                    if not isinstance(meta, dict):
                        meta = meta.asDict() if meta is not None else {}
                    px = decode_image(bytes(payload), meta, fake=False)
                    ys = (np.arange(h) * px.shape[0] // h).clip(0, px.shape[0] - 1)
                    xs = (np.arange(w) * px.shape[1] // w).clip(0, px.shape[1] - 1)
                    outs.append(px[np.ix_(ys, xs)].tobytes())
                    ids.append(int(mid))
                yield pd.DataFrame({"media_id": ids, "payload": outs})
                continue
            # fake path: batch tile + one vectorized gather per shape
            payloads = [bytes(p) for p in pdf["payload"]]
            outs_arr: list[bytes | None] = [None] * len(pdf)
            for (w0, h0), idxs in _wh_groups(_metas_wh(pdf["meta"])).items():
                px = _fake_pixels_batch([payloads[i] for i in idxs], w0, h0)
                ys = (np.arange(h) * h0 // h).clip(0, h0 - 1)
                xs = (np.arange(w) * w0 // w).clip(0, w0 - 1)
                resized = np.ascontiguousarray(px[:, ys][:, :, xs])
                for row, i in enumerate(idxs):
                    outs_arr[i] = resized[row].tobytes()
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(np.int64),
                    "payload": outs_arr,
                }
            )

    return media.select("media_id", "payload", "meta").mapInPandas(
        run, schema="media_id LONG, payload BINARY"
    )


def sample_frames(
    media: DataFrame, every_ms: int = 1000, fake: bool = True
) -> DataFrame:
    """video frame sampling.

    fake=True (plan mode): emits the payload-free sampling schedule
    (media_id, frame_idx, ts_ms) from meta.duration_ms alone — useful
    when the payload codec isn't decodable in-container.

    fake=False (REAL decode): y4m_decode's the payload, picks the
    frame under each tick ``ts = k*every_ms`` (frame_idx =
    floor(ts*fps/1000), clamped to the stream), and emits per-frame
    features (frame_mean, frame_peak) computed from the genuinely
    extracted plane."""
    v = media.where(F.col("kind") == "video")
    if not fake:

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = []
                for mid, payload, meta in zip(
                    pdf["media_id"], pdf["payload"], pdf["meta"]
                ):
                    if not isinstance(meta, dict):
                        meta = meta.asDict() if meta is not None else {}
                    frames, (num, den) = y4m_decode(bytes(payload))
                    nf = frames.shape[0]
                    if not nf:
                        continue
                    dur = meta.get("duration_ms") or int(
                        nf * 1000 * den // num
                    )
                    n_ticks = max(dur // every_ms, 1)
                    for k in range(n_ticks):
                        ts = k * every_ms
                        fi = min(ts * num // (1000 * den), nf - 1)
                        plane = frames[fi].astype(np.int64)
                        out.append(
                            (
                                int(mid),
                                int(fi),
                                int(ts),
                                float(plane.sum()) / plane.size,
                                int(plane.max()),
                            )
                        )
                yield pd.DataFrame(
                    out,
                    columns=[
                        "media_id", "frame_idx", "ts_ms",
                        "frame_mean", "frame_peak",
                    ],
                )

        return v.select("media_id", "payload", "meta").mapInPandas(
            run,
            schema=(
                "media_id LONG, frame_idx INT, ts_ms INT, "
                "frame_mean DOUBLE, frame_peak INT"
            ),
        )
    return v.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(
                    (F.col("meta.duration_ms") / every_ms).cast("int") - 1, F.lit(0)
                ),
            )
        ).alias("frame_idx"),
    ).select(
        "media_id",
        "frame_idx",
        (F.col("frame_idx") * every_ms).cast("int").alias("ts_ms"),
    )


def media_repartition(media: DataFrame, target_bytes: int = 64 << 20) -> DataFrame:
    """Repartition fat binary rows to a bytes budget per partition."""
    total = media.select(F.sum(F.length("payload"))).first()[0] or 0
    n = max(1, int(total / target_bytes) + 1)
    return media.repartition(n)
