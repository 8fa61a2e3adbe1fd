"""Baseline sequential JPEG (ITU-T T.81 / JFIF) in pure numpy+stdlib.

The container ships no image codecs, so the multimodal pipeline
implements the subset it needs from the public spec: a baseline
encoder (8-bit grayscale or 4:4:4 YCbCr, Annex-K quantization and
Huffman tables) and a baseline decoder (DQT/DHT/SOF0/SOS/DRI,
sampling factors up to the declared max, restart markers, byte
destuffing, dequantize + IDCT + level shift + chroma upsample +
YCbCr->RGB).

Exact-roundtrip subspace (the oracle trick for a LOSSY codec): with
flat (all-ones) quantization tables, an image whose 8x8 blocks are
each CONSTANT encodes to DC-only coefficients that quantize without
loss and IDCT back bit-exactly — so a grayscale JPEG built from a
closed-form block formula decodes to exactly that formula, and an
independent SQL oracle can verify features computed from genuinely
Huffman-decoded + IDCT'd pixels.  Arbitrary images roundtrip with
normal lossy error (see tests).
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan: index in the zigzag sequence -> natural (row-major) index
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K quantization tables (natural order)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K Huffman specs: (bits[1..16], values)
HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix A: A @ block @ A.T is the
    JPEG FDCT S(u,v) = 1/4 C(u)C(v) sum s(x,y)cos(...)cos(...)."""
    a = np.zeros((8, 8))
    for u in range(8):
        cu = (1.0 / np.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return a


_A = _dct_matrix()


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg-style quality scaling; quality=100 -> all-ones tables
    (the lossless-quantization point the oracle fixture relies on)."""
    quality = max(1, min(100, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (QT_LUMA, QT_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


def _canonical_codes(bits: list[int], vals: list[int]):
    """(value -> (code, length)) and (length, code) -> value maps from
    a T.81 (BITS, HUFFVAL) spec."""
    enc: dict[int, tuple[int, int]] = {}
    dec: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            enc[vals[k]] = (code, length)
            dec[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return enc, dec


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """(category, extra-bits value) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


def _encode_blocks(
    plane: np.ndarray, qt: np.ndarray, dc_enc, ac_enc, bw: _BitWriter,
    pred: int,
) -> int:
    """FDCT + quantize + Huffman-encode every 8x8 block of `plane`
    (row-major block order); returns the updated DC predictor."""
    h, w = plane.shape
    qt2 = qt.reshape(8, 8).astype(np.float64)
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            blk = plane[by : by + 8, bx : bx + 8].astype(np.float64) - 128.0
            coef = _A @ blk @ _A.T
            qc = np.round(coef / qt2).astype(np.int64).reshape(64)
            zz = qc[ZIGZAG]
            # DC
            s, bitsv = _magnitude(int(zz[0]) - pred)
            pred = int(zz[0])
            code, ln = dc_enc[s]
            bw.write(code, ln)
            if s:
                bw.write(bitsv, s)
            # AC
            run = 0
            for i in range(1, 64):
                v = int(zz[i])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_enc[0xF0]  # ZRL
                    bw.write(code, ln)
                    run -= 16
                s, bitsv = _magnitude(v)
                code, ln = ac_enc[(run << 4) | s]
                bw.write(code, ln)
                bw.write(bitsv, s)
                run = 0
            if run:
                code, ln = ac_enc[0x00]  # EOB
                bw.write(code, ln)
    return pred


def _pad_to_8(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def jpeg_encode(px: np.ndarray, quality: int = 90) -> bytes:
    """Baseline sequential JFIF encoder.  (h, w) or (h, w, 1) uint8
    encodes grayscale (one component, no color transform); (h, w, 3)
    encodes YCbCr 4:4:4.  Annex-K tables scaled by `quality`."""
    px = np.asarray(px, dtype=np.uint8)
    gray = px.ndim == 2 or px.shape[2] == 1
    h, w = px.shape[:2]
    qt_l, qt_c = _quality_tables(quality)
    dc_l_enc, _ = _canonical_codes(*HUFF_DC_LUMA)
    ac_l_enc, _ = _canonical_codes(*HUFF_AC_LUMA)
    dc_c_enc, _ = _canonical_codes(*HUFF_DC_CHROMA)
    ac_c_enc, _ = _canonical_codes(*HUFF_AC_CHROMA)

    if gray:
        planes = [px.reshape(h, w).astype(np.float64)]
    else:
        r = px[:, :, 0].astype(np.float64)
        g = px[:, :, 1].astype(np.float64)
        b = px[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
        planes = [y, cb, cr]
    planes = [_pad_to_8(np.clip(np.round(p), 0, 255)) for p in planes]

    out = bytearray(b"\xff\xd8")  # SOI
    # APP0 JFIF
    app0 = b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + b"\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
    # DQT
    for tid, qt in ([(0, qt_l)] if gray else [(0, qt_l), (1, qt_c)]):
        body = bytes([tid]) + bytes(int(x) for x in qt[ZIGZAG])
        out += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    # SOF0
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        sof += bytes([cid, 0x11, 0 if cid == 1 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    # DHT
    tables = [(0x00, HUFF_DC_LUMA), (0x10, HUFF_AC_LUMA)]
    if not gray:
        tables += [(0x01, HUFF_DC_CHROMA), (0x11, HUFF_AC_CHROMA)]
    for tc, (bits, vals) in tables:
        body = bytes([tc]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body
    # SOS
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00 if cid == 1 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    # entropy-coded scan: 4:4:4 => MCU = one block per component,
    # interleaved in block raster order
    bw = _BitWriter()
    if gray:
        _encode_blocks(planes[0], qt_l, dc_l_enc, ac_l_enc, bw, 0)
    else:
        preds = [0, 0, 0]
        qts = [qt_l, qt_c, qt_c]
        dcs = [dc_l_enc, dc_c_enc, dc_c_enc]
        acs = [ac_l_enc, ac_c_enc, ac_c_enc]
        ph, pw = planes[0].shape
        qt2s = [q.reshape(8, 8).astype(np.float64) for q in qts]
        for by in range(0, ph, 8):
            for bx in range(0, pw, 8):
                for c in range(3):
                    blk = (
                        planes[c][by : by + 8, bx : bx + 8].astype(np.float64)
                        - 128.0
                    )
                    qc = (
                        np.round((_A @ blk @ _A.T) / qt2s[c])
                        .astype(np.int64)
                        .reshape(64)
                    )
                    zz = qc[ZIGZAG]
                    s, bitsv = _magnitude(int(zz[0]) - preds[c])
                    preds[c] = int(zz[0])
                    code, ln = dcs[c][s]
                    bw.write(code, ln)
                    if s:
                        bw.write(bitsv, s)
                    run = 0
                    for i in range(1, 64):
                        v = int(zz[i])
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            code, ln = acs[c][0xF0]
                            bw.write(code, ln)
                            run -= 16
                        s, bitsv = _magnitude(v)
                        code, ln = acs[c][(run << 4) | s]
                        bw.write(code, ln)
                        bw.write(bitsv, s)
                        run = 0
                    if run:
                        code, ln = acs[c][0x00]
                        bw.write(code, ln)
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """MSB-first reader over destuffed entropy data."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG scan data exhausted")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> None:
        self.nbits = 0


def _huff_decode(br: _BitReader, dec: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        v = dec.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def jpeg_decode(data: bytes) -> np.ndarray:
    """Baseline sequential decoder -> (h, w, 3) uint8 RGB (grayscale
    replicates).  Supports DQT/DHT/SOF0/SOS/DRI, sampling factors up
    to the declared max per component, restart markers."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps: list[dict] = []
    h = w = 0
    restart = 0
    scan_comps: list[dict] = []
    scan_start = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit DQT")
                tbl = np.zeros(64, np.int64)
                tbl[ZIGZAG] = np.frombuffer(body, np.uint8, 64, i + 1)
                qts[tq] = tbl
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                _, dec = _canonical_codes(bits, vals)
                huff[(tc, th)] = dec
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("non-8-bit JPEG")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("only baseline sequential (SOF0)")
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c : 3 + 2 * c]
                comp = next(x for x in comps if x["id"] == cs)
                scan_comps.append(
                    {**comp, "dc": tt >> 4, "ac": tt & 0xF}
                )
            scan_start = pos
            break
    if scan_start is None or not comps:
        raise ValueError("JPEG missing SOS/SOF0")

    # destuff entropy data up to EOI, recording restart-marker cuts
    raw = bytearray()
    i = scan_start
    rst_positions = []
    while i < len(data):
        b = data[i]
        if b == 0xFF:
            nxt = data[i + 1] if i + 1 < len(data) else 0xD9
            if nxt == 0x00:
                raw.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn
                rst_positions.append(len(raw))
                i += 2
                continue
            break  # EOI or next marker
        raw.append(b)
        i += 1

    hmax = max(c["h"] for c in scan_comps)
    vmax = max(c["v"] for c in scan_comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {
        c["id"]: np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]), np.float64)
        for c in scan_comps
    }
    br = _BitReader(bytes(raw))
    preds = {c["id"]: 0 for c in scan_comps}
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart and m and m % restart == 0:
            br.align()
            # reader continues past the recorded cut; predictors reset
            for k in preds:
                preds[k] = 0
        my, mx = divmod(m, mcux)
        for c in scan_comps:
            dc_dec = huff[(0, c["dc"])]
            ac_dec = huff[(1, c["ac"])]
            qt = qts[c["tq"]].reshape(8, 8).astype(np.float64)
            for v in range(c["v"]):
                for hh in range(c["h"]):
                    s = _huff_decode(br, dc_dec)
                    diff = _extend(br.bits(s), s) if s else 0
                    preds[c["id"]] += diff
                    coef = np.zeros(64, np.float64)
                    coef[0] = preds[c["id"]]
                    k = 1
                    while k < 64:
                        rs = _huff_decode(br, ac_dec)
                        r, ssize = rs >> 4, rs & 0xF
                        if ssize == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run past block end")
                        coef[ZIGZAG[k]] = _extend(br.bits(ssize), ssize)
                        k += 1
                    blk = coef.reshape(8, 8) * qt
                    px = _A.T @ blk @ _A + 128.0
                    y0 = (my * c["v"] + v) * 8
                    x0 = (mx * c["h"] + hh) * 8
                    planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = px

    # upsample to full res and color-convert
    full = []
    for c in scan_comps:
        p = planes[c["id"]]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], 0), hmax // c["h"], 1)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
