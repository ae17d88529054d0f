"""Pure-numpy baseline JPEG codec (ITU-T T.81 / ISO 10918-1, public
spec; quantization + Huffman tables from Annex K, quality scaling per
the public IJG formula).

Completes the package's compressed-image story (PNG in multimodal.py is
deflate-based; JPEG is the transform-coding half): a REAL marker parse
(SOI/APP0/DQT/SOF0/DHT/SOS/EOI), canonical Huffman coding with byte
(un)stuffing, zig-zag run-length AC coding, DC prediction, and an
orthonormal-matrix DCT/IDCT — no external codecs, numpy end-to-end.

Scope: baseline sequential, 8-bit. The ENCODER emits single-component
(luminance) JPEGs — a real JPEG any viewer opens. The DECODER handles
grayscale AND color streams: multi-table DQT/DHT, per-component
sampling factors (4:4:4 / 4:2:2 / 4:2:0), restart markers (DRI/RSTn),
BT.601 YCbCr->RGB — validated against an externally-encoded color
fixture in pytest.

Losslessness note for oracles: JPEG is lossy in general, but an image
made of CONSTANT 8x8 blocks has only a DC coefficient (AC exactly 0),
and if 8*(c-128) is a multiple of the DC quantum the round-trip is
EXACT — the contract query generates such images so a SQL oracle can
recompute the decoded statistics from the generating formula.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "encode_jpeg_gray",
    "decode_jpeg",
    "decode_jpeg_gray",
    "dc_quantum",
    "STD_LUMA_QUANT",
]

# Annex K.1 luminance quantization table (zig-zag order NOT applied here
# — this is row-major)
STD_LUMA_QUANT = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)

# zig-zag scan order (T.81 Figure 5): odd diagonals walk top-right →
# bottom-left (row ascending), even diagonals the reverse
_ZZ = sorted(
    ((r, c) for r in range(8) for c in range(8)),
    key=lambda rc: (rc[0] + rc[1], rc[0] if (rc[0] + rc[1]) % 2 else -rc[0]),
)
_ZZ_ROWS = np.array([r for r, _ in _ZZ])
_ZZ_COLS = np.array([c for _, c in _ZZ])

# Annex K.3 typical Huffman tables for luminance: (BITS, HUFFVAL)
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _canonical_codes(bits, vals):
    """symbol -> (code, length) via T.81 C.2 canonical assignment."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_ENC = _canonical_codes(_DC_BITS, _DC_VALS)
_AC_ENC = _canonical_codes(_AC_BITS, _AC_VALS)


def _decode_table(bits, vals):
    """(code, length) -> symbol for the decoder."""
    return {cl: sym for sym, cl in _canonical_codes(bits, vals).items()}


_DC_DEC = _decode_table(_DC_BITS, _DC_VALS)
_AC_DEC = _decode_table(_AC_BITS, _AC_VALS)

# orthonormal 8-point DCT-II matrix: block spectrum S = A @ B @ A.T
_A = np.zeros((8, 8))
for _u in range(8):
    _cu = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _A[_u, _x] = _cu * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _quant_table(quality: int) -> np.ndarray:
    """IJG quality scaling (public formula): 1..100 -> scaled Annex K."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (STD_LUMA_QUANT * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int64)


def dc_quantum(quality: int = 90) -> int:
    """The DC quantization step at ``quality`` — constant-block images
    whose 8*(c-128) is a multiple of this round-trip EXACTLY."""
    return int(_quant_table(quality)[0, 0])


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # pad with 1s per spec


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG bitstream exhausted")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("JPEG bitstream exhausted at stuffing")
                marker = self.data[self.pos]
                self.pos += 1
                if marker != 0x00:
                    raise ValueError(f"unexpected marker 0xFF{marker:02X} in scan")
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, length: int) -> int:
        v = 0
        for _ in range(length):
            v = (v << 1) | self.bit()
        return v

    def restart(self):
        """Byte-align and consume an RSTn marker (T.81 restart resync)."""
        self.n = 0
        if (
            self.pos + 1 >= len(self.data)
            or self.data[self.pos] != 0xFF
            or not 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            raise ValueError("expected RSTn restart marker")
        self.pos += 2

    def huff(self, table) -> int:
        code, length = 0, 0
        while length <= 16:
            code = (code << 1) | self.bit()
            length += 1
            sym = table.get((code, length))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG scan")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 sign extension of an s-bit magnitude."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def encode_jpeg_gray(pixels: np.ndarray, quality: int = 90) -> bytes:
    """Encode an (H, W) uint8 array as a baseline grayscale JPEG."""
    if pixels.ndim != 2 or pixels.dtype != np.uint8:
        raise ValueError("encode_jpeg_gray expects (H, W) uint8")
    h, w = pixels.shape
    q = _quant_table(quality)
    ph, pw = -h % 8, -w % 8
    img = np.pad(pixels, ((0, ph), (0, pw)), mode="edge").astype(np.float64) - 128.0
    hb, wb = img.shape[0] // 8, img.shape[1] // 8
    # all blocks' DCT in one einsum: (hb, wb, 8, 8)
    blocks = img.reshape(hb, 8, wb, 8).transpose(0, 2, 1, 3)
    spec = np.einsum("ux,hwxy,vy->hwuv", _A, blocks, _A)
    coef = np.round(spec / q).astype(np.int64)

    bw = _BitWriter()
    prev_dc = 0
    for by in range(hb):
        for bx in range(wb):
            blk = coef[by, bx]
            zz = blk[_ZZ_ROWS, _ZZ_COLS]
            # DC
            diff = int(zz[0]) - prev_dc
            prev_dc = int(zz[0])
            s = _category(diff)
            code, ln = _DC_ENC[s]
            bw.put(code, ln)
            if s:
                bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
            # AC
            run = 0
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = _AC_ENC[0xF0]  # ZRL
                    bw.put(code, ln)
                    run -= 16
                s = _category(v)
                code, ln = _AC_ENC[(run << 4) | s]
                bw.put(code, ln)
                bw.put(v if v >= 0 else v + (1 << s) - 1, s)
                run = 0
            if run:
                code, ln = _AC_ENC[0x00]  # EOB
                bw.put(code, ln)
    bw.flush()

    def seg(marker, payload):
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    zz_q = q[_ZZ_ROWS, _ZZ_COLS].astype(np.uint8).tobytes()
    dht_dc = bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
    dht_ac = bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS)
    return (
        b"\xff\xd8"  # SOI
        + seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + seg(0xFFDB, b"\x00" + zz_q)  # DQT, table 0, 8-bit
        + seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")  # SOF0
        + seg(0xFFC4, dht_dc)
        + seg(0xFFC4, dht_ac)
        + seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")  # SOS
        + bytes(bw.out)
        + b"\xff\xd9"  # EOI
    )


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline sequential JPEG — grayscale OR color — into an
    (H, W) uint8 or (H, W, 3) uint8 RGB array.

    Real decoder surface: marker walk, multi-table DQT/DHT, canonical
    Huffman decode with byte unstuffing, restart-marker resync (DRI /
    RSTn), per-component sampling factors (4:4:4, 4:2:2, 4:2:0, ...),
    dequantization, matrix IDCT, nearest-neighbor chroma upsampling and
    the BT.601 YCbCr -> RGB transform. Validated against an
    externally-encoded fixture (pytest). Progressive (SOF2) and
    arithmetic coding are rejected explicitly.
    """
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    h = w = None
    comps = []  # (id, hs, vs, qid)
    scan_comps = []  # (comp_index, dc_tid, ac_tid)
    restart_interval = 0
    scan = None
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker code — skip them (other encoders pad between segments)
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # standalone, length-less markers (TEM, stray RSTn) are
            # legal between segments before SOS — skip
            pos += 2
            continue
        if pos + 4 > len(payload):
            break
        (ln,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:  # DQT: one or more tables per segment
            off = 0
            while off < len(body):
                prec_id = body[off]
                if prec_id >> 4 != 0:
                    raise ValueError("16-bit quant tables not supported")
                zz = np.frombuffer(
                    body[off + 1 : off + 65], dtype=np.uint8
                ).astype(np.int64)
                q = np.zeros((8, 8), dtype=np.int64)
                q[_ZZ_ROWS, _ZZ_COLS] = zz
                qtabs[prec_id & 0x0F] = q
                off += 65
        elif marker == 0xC0 or marker == 0xC1:  # baseline / ext. sequential
            prec, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            if ncomp not in (1, 3):
                raise ValueError(f"{ncomp}-component JPEG not supported")
            comps = []
            for c in range(ncomp):
                cid, samp, qid = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, samp >> 4, samp & 0x0F, qid))
        elif marker == 0xC2:
            raise ValueError("progressive JPEG (SOF2) not supported")
        elif marker in (0xC9, 0xCA, 0xCB):
            raise ValueError("arithmetic-coded JPEG not supported")
        elif marker == 0xC4:  # DHT: one or more tables per segment
            off = 0
            while off < len(body):
                cls, tid = body[off] >> 4, body[off] & 0x0F
                bits = list(body[off + 1 : off + 17])
                nv = sum(bits)
                vals = list(body[off + 17 : off + 17 + nv])
                htabs[(cls, tid)] = _decode_table(bits, vals)
                off += 17 + nv
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cid, tids = body[1 + 2 * c], body[2 + 2 * c]
                idx = next(
                    i for i, comp in enumerate(comps) if comp[0] == cid
                )
                scan_comps.append((idx, tids >> 4, tids & 0x0F))
            scan = payload[pos + 2 + ln :]
            break
        pos += 2 + ln
    if h is None or scan is None or not qtabs or not htabs:
        raise ValueError("missing DQT/SOF/DHT/SOS segment")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcx = (w + 8 * hmax - 1) // (8 * hmax)
    mcy = (h + 8 * vmax - 1) // (8 * vmax)
    coef = [
        np.zeros((mcy * vs, mcx * hs, 8, 8), dtype=np.int64)
        for (_, hs, vs, _) in comps
    ]
    br = _BitReader(scan)
    prev_dc = [0] * len(comps)
    mcu_count = 0
    for my in range(mcy):
        for mx in range(mcx):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.restart()
                prev_dc = [0] * len(comps)
            mcu_count += 1
            for ci, dc_tid, ac_tid in scan_comps:
                _, hs, vs, _ = comps[ci]
                dc_dec = htabs[(0, dc_tid)]
                ac_dec = htabs[(1, ac_tid)]
                for v in range(vs):
                    for u in range(hs):
                        zz = np.zeros(64, dtype=np.int64)
                        s = br.huff(dc_dec)
                        diff = _extend(br.bits(s), s) if s else 0
                        prev_dc[ci] += diff
                        zz[0] = prev_dc[ci]
                        k = 1
                        while k < 64:
                            rs = br.huff(ac_dec)
                            run, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if run == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError("AC run overruns block")
                            zz[k] = _extend(br.bits(s), s)
                            k += 1
                        blk = np.zeros((8, 8), dtype=np.int64)
                        blk[_ZZ_ROWS, _ZZ_COLS] = zz
                        coef[ci][my * vs + v, mx * hs + u] = blk

    planes = []
    for ci, (_, hs, vs, qid) in enumerate(comps):
        spec = (coef[ci] * qtabs[qid]).astype(np.float64)
        blocks = np.einsum("xu,hwuv,yv->hwxy", _A.T, spec, _A.T)
        nby, nbx = spec.shape[:2]
        plane = blocks.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8) + 128.0
        # nearest-neighbor upsample to full resolution
        plane = np.repeat(np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


def decode_jpeg_gray(payload: bytes) -> np.ndarray:
    """Decode a JPEG and return a single (H, W) luminance plane (color
    inputs are converted via the BT.601 luma weights)."""
    img = decode_jpeg(payload)
    if img.ndim == 2:
        return img
    yf = 0.299 * img[:, :, 0] + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2]
    return np.clip(np.round(yf), 0, 255).astype(np.uint8)
