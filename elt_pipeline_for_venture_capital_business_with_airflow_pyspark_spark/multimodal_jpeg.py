"""Baseline-sequential JPEG codec, standard library only.

Closes the last stdlib-feasible multimodal stub (VERDICT r7 #9): a
real baseline JFIF encoder/decoder pair so `binary`-column JPEG
payloads decode inside the same `mapInPandas` boundary as PNG/PPM/BMP
(`multimodal.decode_image` dispatches on the 0xFFD8 magic). Scope is
the honest-and-exact subset:

- baseline sequential DCT (SOF0) AND (round 9) progressive DCT (SOF2,
  spectral selection + successive approximation — Annex G scan
  accumulation with EOB runs and correction bits), 8-bit precision,
- grayscale, 4:4:4, and (round 9) the 2×-factor chroma-subsampled
  forms — 4:2:0 / 4:2:2 / 4:4:0 — with deterministic
  sample-replication upsampling; the encoders emit 4:4:4 or 4:2:0
  (2×2 box-average downsample); sampling factors > 2 still raise
  ``NotImplementedError`` (same boundary policy as the PNG codec's
  sub-byte-depth rejection),
- Huffman entropy coding with inline-defined tables (the decoder
  reads whatever DHT segments the file carries; the encoder emits
  the ITU T.81 Annex K typical tables),
- the decoder's IDCT is the Loeffler/AAN fixed-point INTEGER
  algorithm (CONST_BITS=13, PASS1_BITS=2 — the arithmetic every
  libjpeg-compatible decoder standardized on) and the YCbCr→RGB
  step is 16-bit fixed point, so decoded pixels are bit-identical
  across hosts/executors/retries — the determinism contract every
  codec in this repo carries (cf. multimodal.decode_wav).

Decode output is ``(width, height, rgb_bytes)`` — the same shape
`multimodal.decode_image` returns for the other formats. JPEG is
lossy: round-trips reproduce the IDCT of the quantized coefficients,
not the source pixels; tests pin decoded bytes by hash (bit
determinism) and against an independent float-IDCT twin (±1 of the
exact transform), plus the exact gray-128 fixed point.

Everything here derives from the public JPEG standard (ITU T.81) and
the publicly documented fixed-point DCT literature. No reference-repo
parity: the reference pipeline has no image path at all (SURVEY §2.8
gap it never fills); this module serves the training-data side.
"""

from __future__ import annotations

import struct

__all__ = ["encode_jpeg", "encode_jpeg_progressive", "decode_jpeg"]

# ---------------------------------------------------------------------------
# shared tables (ITU T.81)
# ---------------------------------------------------------------------------

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K base quantization tables (quality 50)
_QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]
_QUANT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex K typical Huffman tables: (BITS counts[1..16], HUFFVAL symbols)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _scaled_quant(base: list[int], quality: int) -> list[int]:
    """IJG quality scaling: 50 → base table, 1..100 clamps to [1,255]."""
    quality = max(1, min(100, quality))
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    return [max(1, min(255, (q * scale + 50) // 100)) for q in base]


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 C.2 canonical code assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

_DCT_COS: list[list[float]] | None = None


def _dct_tables() -> list[list[float]]:
    global _DCT_COS
    if _DCT_COS is None:
        import math

        _DCT_COS = [
            [math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)]
            for u in range(8)
        ]
    return _DCT_COS


def _fdct(block: list[int]) -> list[float]:
    """Reference O(n^3) separable forward DCT (encoder only — the
    encoder runs in one deterministic place; the DECODER is the
    fixed-point path)."""
    cos = _dct_tables()
    tmp = [[0.0] * 8 for _ in range(8)]
    for y in range(8):
        for u in range(8):
            tmp[y][u] = sum(block[y * 8 + x] * cos[u][x] for x in range(8))
    out = [0.0] * 64
    for v in range(8):
        cv = 0.3535533905932738 if v == 0 else 0.5  # sqrt(1/8), sqrt(2/8)/sqrt(2)... C(v)/2
        for u in range(8):
            cu = 0.3535533905932738 if u == 0 else 0.5
            s = sum(tmp[y][u] * cos[v][y] for y in range(8))
            out[v * 8 + u] = cu * cv * s
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per T.81
        return bytes(self.buf)

    def emit_restart(self, n: int) -> None:
        """Byte-align (1-bit padding, stuffing still applies) and emit
        RSTn — restart markers are raw marker bytes, never stuffed."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        self.buf.append(0xFF)
        self.buf.append(0xD0 + (n & 7))


def _magnitude(v: int) -> tuple[int, int]:
    """(size, amplitude bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_block(
    bw: _BitWriter,
    coefs: list[int],
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    return _encode_block_zz(
        bw, [coefs[ZIGZAG[i]] for i in range(64)], pred, dc_codes, ac_codes
    )


def _encode_block_zz(
    bw: _BitWriter,
    zz: list[int],
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    size, bits = _magnitude(zz[0] - pred)
    c, l = dc_codes[size]
    bw.write(c, l)
    if size:
        bw.write(bits, size)
    run = 0
    for i in range(1, 64):
        if zz[i] == 0:
            run += 1
            continue
        while run > 15:
            c, l = ac_codes[0xF0]  # ZRL
            bw.write(c, l)
            run -= 16
        size, bits = _magnitude(zz[i])
        c, l = ac_codes[(run << 4) | size]
        bw.write(c, l)
        bw.write(bits, size)
        run = 0
    if run:
        c, l = ac_codes[0x00]  # EOB
        bw.write(c, l)
    return zz[0]


def _cm_matrix() -> list[list[float]]:
    """CM[v][u] = C(u)·C(v) products computed with the exact CPython
    float multiplies the scalar encoder performed per block."""
    c = [0.3535533905932738 if i == 0 else 0.5 for i in range(8)]
    return [[c[u] * c[v] for u in range(8)] for v in range(8)]


def _rgb_to_ycbcr_planes(w: int, h: int, rgb: bytes):
    """Vectorized RGB→YCbCr (JFIF): the SAME left-associated float64
    expressions, truncation and clamps as the scalar per-pixel loop —
    NumPy elementwise double ops are the identical IEEE operations, so
    every sample matches bit-for-bit (round-13, guide §4.2). Returns
    three (h, w) int64 planes."""
    import numpy as np

    a = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3).astype(np.float64)
    r, g, b = a[..., 0], a[..., 1], a[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b + 0.5
    cb = 128.5 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.5 + 0.5 * r - 0.418687589 * g - 0.081312411 * b

    def clamp(v):
        return np.clip(np.trunc(v), 0, 255).astype(np.int64)

    return clamp(y), clamp(cb), clamp(cr)


def _subsample_420_plane(p, w: int, h: int):
    """2×2 box average with round-half-up and edge replication over an
    (h, w) int64 plane — integer-exact twin of the scalar loop."""
    import numpy as np

    cw, ch = (w + 1) // 2, (h + 1) // 2
    pp = np.pad(p, ((0, 2 * ch - h), (0, 2 * cw - w)), mode="edge")
    s = pp[0::2, 0::2] + pp[0::2, 1::2] + pp[1::2, 0::2] + pp[1::2, 1::2]
    return (s + 2) >> 2


def _quant_zz_blocks(plane, qt, pbw: int, pbh: int, zigzag: bool = True):
    """All quantized coefficient blocks of an (h, w) int64 plane in
    raster (by, bx) order, edge-replicated to the (pbw, pbh) block
    grid, as a list of 64-int lists (zigzag order when ``zigzag``).

    Bit-identical to the scalar _extract_block → _fdct → _quantize
    chain: edge padding equals the min(…) clamps; the two DCT
    reduction stages accumulate their 8 terms in the SAME
    left-associated float64 order (a Python loop over the reduction
    axis, vectorized across blocks/elements); C(u)C(v) products come
    from :func:`_cm_matrix`; quantization is the same /qt then
    round-half-away truncation."""
    import numpy as np

    ph, pw = plane.shape
    padded = np.pad(
        plane, ((0, pbh * 8 - ph), (0, pbw * 8 - pw)), mode="edge"
    )
    B = (
        padded.reshape(pbh, 8, pbw, 8)
        .transpose(0, 2, 1, 3)
        .reshape(pbh * pbw, 8, 8)
        .astype(np.float64)
        - 128.0
    )
    cos = np.array(_dct_tables())  # [u][x]
    T = np.zeros_like(B)  # T[n, y, u] = Σ_x B[n,y,x]·cos[u][x]
    for x in range(8):
        T += B[:, :, x, None] * cos[None, None, :, x]
    S = np.zeros_like(B)  # S[n, v, u] = Σ_y T[n,y,u]·cos[v][y]
    for y in range(8):
        S += T[:, y, None, :] * cos[None, :, y, None]
    out = S * np.array(_cm_matrix())  # [v][u]
    q = out.reshape(-1, 64) / np.array(qt, dtype=np.float64)
    quant = np.where(
        q >= 0, np.trunc(q + 0.5), -np.trunc(-q + 0.5)
    ).astype(np.int64)
    if zigzag:
        quant = quant[:, np.array(ZIGZAG, dtype=np.int64)]
    return quant.tolist()


def _extract_block(plane: list[int], pw: int, ph: int, bx: int, by: int) -> list[int]:
    """8x8 level-shifted block at block coords (bx, by), edge-replicated
    past the plane boundary."""
    block = []
    for yy in range(8):
        sy = min(ph - 1, by * 8 + yy)
        row = sy * pw
        for xx in range(8):
            sx = min(pw - 1, bx * 8 + xx)
            block.append(plane[row + sx] - 128)
    return block


def _quantize(coefs: list[float], qt: list[int]) -> list[int]:
    out = []
    for i in range(64):
        v = coefs[i] / qt[i]
        out.append(int(v + 0.5) if v >= 0 else -int(-v + 0.5))
    return out


def encode_jpeg(
    w: int,
    h: int,
    rgb: bytes,
    quality: int = 85,
    subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Baseline-sequential JFIF encoder. Deterministic: float FDCT in
    fixed evaluation order, round-half-away quantization.

    ``subsample``: ``"444"`` (1x1 factors, every component full-res)
    or ``"420"`` (luma 2x2, chroma quarter-res via 2×2 box average
    with round-half-up and edge replication — the dominant real-world
    form, MCU-interleaved per T.81 A.2.3).

    ``restart_interval`` > 0 emits a DRI segment and an RSTn marker
    (DC predictors reset) every that-many MCUs — the T.81 E.2.4
    error-resilience framing most hardware encoders produce."""
    if len(rgb) != w * h * 3:
        raise ValueError("rgb length != w*h*3")
    if subsample not in ("444", "420"):
        raise NotImplementedError(f"subsample mode {subsample!r} unsupported")
    ql = _scaled_quant(_QUANT_LUMA, quality)
    qc = _scaled_quant(_QUANT_CHROMA, quality)

    # RGB -> YCbCr (JFIF), integer rounded — vectorized, bit-identical
    # to the former per-pixel loop (see _rgb_to_ycbcr_planes)
    ny, ncb, ncr = _rgb_to_ycbcr_planes(w, h, rgb)

    bw = _BitWriter()
    dcl = _build_codes(*_DC_LUMA)
    acl = _build_codes(*_AC_LUMA)
    dcc = _build_codes(*_DC_CHROMA)
    acc = _build_codes(*_AC_CHROMA)
    preds = [0, 0, 0]

    mcu_count = 0
    rst_n = 0

    def _maybe_restart() -> None:
        nonlocal mcu_count, rst_n
        if restart_interval and mcu_count and mcu_count % restart_interval == 0:
            bw.emit_restart(rst_n)
            rst_n = (rst_n + 1) & 7
            preds[0] = preds[1] = preds[2] = 0
        mcu_count += 1

    # every block's FDCT + quantization runs in one vectorized batch
    # per plane (round-13, guide §4.2 — bit-identical, see
    # _quant_zz_blocks); the sequential entropy loop just fetches the
    # pre-zigzagged rows in MCU order
    if subsample == "444":
        bw_blocks_y = (h + 7) // 8
        bw_blocks_x = (w + 7) // 8
        zzs = [
            _quant_zz_blocks(plane, qt, bw_blocks_x, bw_blocks_y)
            for plane, qt in ((ny, ql), (ncb, qc), (ncr, qc))
        ]
        tabs = ((dcl, acl), (dcc, acc), (dcc, acc))
        for by in range(bw_blocks_y):
            for bx in range(bw_blocks_x):
                _maybe_restart()
                bi = by * bw_blocks_x + bx
                for ci in range(3):
                    dc_c, ac_c = tabs[ci]
                    preds[ci] = _encode_block_zz(
                        bw, zzs[ci][bi], preds[ci], dc_c, ac_c
                    )
        samplings = ((1, 0x11, 0), (2, 0x11, 1), (3, 0x11, 1))
    else:  # 420
        # quarter-res chroma: 2x2 box average, round-half-up, edge rows/
        # cols replicated when w or h is odd (vectorized, integer-exact)
        scb = _subsample_420_plane(ncb, w, h)
        scr = _subsample_420_plane(ncr, w, h)
        mcux = (w + 15) // 16
        mcuy = (h + 15) // 16
        zz_y = _quant_zz_blocks(ny, ql, 2 * mcux, 2 * mcuy)
        zz_cb = _quant_zz_blocks(scb, qc, mcux, mcuy)
        zz_cr = _quant_zz_blocks(scr, qc, mcux, mcuy)
        for my in range(mcuy):
            for mx in range(mcux):
                _maybe_restart()
                for by in range(2):
                    for bx in range(2):
                        bi = (my * 2 + by) * (2 * mcux) + (mx * 2 + bx)
                        preds[0] = _encode_block_zz(
                            bw, zz_y[bi], preds[0], dcl, acl
                        )
                for ci, zz_c in ((1, zz_cb), (2, zz_cr)):
                    preds[ci] = _encode_block_zz(
                        bw, zz_c[my * mcux + mx], preds[ci], dcc, acc
                    )
        samplings = ((1, 0x22, 0), (2, 0x11, 1), (3, 0x11, 1))

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, qt in ((0, ql), (1, qc)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(qt[ZIGZAG[i]] for i in range(64))
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for cid, hv, tq in samplings:
        out += bytes([cid, hv, tq])
    for cls, tid, (bits, vals) in (
        (0, 0, _DC_LUMA), (1, 0, _AC_LUMA), (0, 1, _DC_CHROMA), (1, 1, _AC_CHROMA)
    ):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    for cid, tabs in ((1, 0x00), (2, 0x11), (3, 0x11)):
        out += bytes([cid, tabs])
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise NotImplementedError("JPEG entropy stream truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise NotImplementedError("JPEG entropy stream truncated")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise NotImplementedError(
                        f"unexpected marker 0xFF{nxt:02X} inside entropy data "
                        "(stream desynced — RSTn only legal at MCU-interval "
                        "boundaries, which are consumed explicitly)"
                    )
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def consume_restart(self) -> None:
        """Discard padding bits, skip stuffed pad bytes, and consume
        the byte-aligned RSTn marker (T.81 E.2.4)."""
        self.nbits = 0
        d = self.data
        while (
            self.pos + 1 < len(d)
            and d[self.pos] == 0xFF
            and d[self.pos + 1] == 0x00
        ):
            self.pos += 2  # stuffed 0xFF produced by 1-bit padding
        if (
            self.pos + 1 >= len(d)
            or d[self.pos] != 0xFF
            or not (0xD0 <= d[self.pos + 1] <= 0xD7)
        ):
            raise NotImplementedError("JPEG restart marker missing/desynced")
        self.pos += 2


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


class _HuffTable:
    def __init__(self, bits: list[int], vals: list[int]) -> None:
        # (length, code) -> symbol lookup, canonical T.81 assignment
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            sym = self.lookup.get((length, code))
            if sym is not None:
                return sym
        raise NotImplementedError("invalid JPEG Huffman code")


# Loeffler fixed-point IDCT constants (CONST_BITS=13 scaling of the
# published rotation coefficients — the standard "islow" arithmetic)
_CONST_BITS = 13
_PASS1_BITS = 2
_F_0_298631336 = 2446
_F_0_390180644 = 3196
_F_0_541196100 = 4433
_F_0_765366865 = 6270
_F_0_899976223 = 7373
_F_1_175875602 = 9633
_F_1_501321110 = 12299
_F_1_847759065 = 15137
_F_1_961570560 = 16069
_F_2_053119869 = 16819
_F_2_562915447 = 20995
_F_3_072711026 = 25172


def _idct_islow(coefs: list[int]) -> list[int]:
    """Fixed-point 2-D 8x8 IDCT (Loeffler et al., integer arithmetic,
    CONST_BITS=13 / PASS1_BITS=2). Output is the level-shifted sample
    block in [-256, 255]ish range before clamping; all operations are
    exact integer ops — bit-identical everywhere."""
    ws = [0] * 64
    # pass 1: columns
    for c in range(8):
        col = [coefs[r * 8 + c] for r in range(8)]
        if not any(col[1:]):
            dc = col[0] << _PASS1_BITS
            for r in range(8):
                ws[r * 8 + c] = dc
            continue
        z2, z3 = col[2], col[6]
        z1 = (z2 + z3) * _F_0_541196100
        tmp2 = z1 + z3 * (-_F_1_847759065)
        tmp3 = z1 + z2 * _F_0_765366865
        z2, z3 = col[0], col[4]
        tmp0 = (z2 + z3) << _CONST_BITS
        tmp1 = (z2 - z3) << _CONST_BITS
        t10, t13 = tmp0 + tmp3, tmp0 - tmp3
        t11, t12 = tmp1 + tmp2, tmp1 - tmp2
        tmp0, tmp1, tmp2, tmp3 = col[7], col[5], col[3], col[1]
        z1 = tmp0 + tmp3
        z2 = tmp1 + tmp2
        z3 = tmp0 + tmp2
        z4 = tmp1 + tmp3
        z5 = (z3 + z4) * _F_1_175875602
        tmp0 *= _F_0_298631336
        tmp1 *= _F_2_053119869
        tmp2 *= _F_3_072711026
        tmp3 *= _F_1_501321110
        z1 *= -_F_0_899976223
        z2 *= -_F_2_562915447
        z3 = z3 * (-_F_1_961570560) + z5
        z4 = z4 * (-_F_0_390180644) + z5
        tmp0 += z1 + z3
        tmp1 += z2 + z4
        tmp2 += z2 + z3
        tmp3 += z1 + z4
        rnd = 1 << (_CONST_BITS - _PASS1_BITS - 1)
        ws[0 * 8 + c] = (t10 + tmp3 + rnd) >> (_CONST_BITS - _PASS1_BITS)
        ws[7 * 8 + c] = (t10 - tmp3 + rnd) >> (_CONST_BITS - _PASS1_BITS)
        ws[1 * 8 + c] = (t11 + tmp2 + rnd) >> (_CONST_BITS - _PASS1_BITS)
        ws[6 * 8 + c] = (t11 - tmp2 + rnd) >> (_CONST_BITS - _PASS1_BITS)
        ws[2 * 8 + c] = (t12 + tmp1 + rnd) >> (_CONST_BITS - _PASS1_BITS)
        ws[5 * 8 + c] = (t12 - tmp1 + rnd) >> (_CONST_BITS - _PASS1_BITS)
        ws[3 * 8 + c] = (t13 + tmp0 + rnd) >> (_CONST_BITS - _PASS1_BITS)
        ws[4 * 8 + c] = (t13 - tmp0 + rnd) >> (_CONST_BITS - _PASS1_BITS)
    # pass 2: rows
    out = [0] * 64
    shift = _CONST_BITS + _PASS1_BITS + 3
    rnd = 1 << (shift - 1)
    for r in range(8):
        row = ws[r * 8 : r * 8 + 8]
        z2, z3 = row[2], row[6]
        z1 = (z2 + z3) * _F_0_541196100
        tmp2 = z1 + z3 * (-_F_1_847759065)
        tmp3 = z1 + z2 * _F_0_765366865
        tmp0 = (row[0] + row[4]) << _CONST_BITS
        tmp1 = (row[0] - row[4]) << _CONST_BITS
        t10, t13 = tmp0 + tmp3, tmp0 - tmp3
        t11, t12 = tmp1 + tmp2, tmp1 - tmp2
        tmp0, tmp1, tmp2, tmp3 = row[7], row[5], row[3], row[1]
        z1 = tmp0 + tmp3
        z2 = tmp1 + tmp2
        z3 = tmp0 + tmp2
        z4 = tmp1 + tmp3
        z5 = (z3 + z4) * _F_1_175875602
        tmp0 *= _F_0_298631336
        tmp1 *= _F_2_053119869
        tmp2 *= _F_3_072711026
        tmp3 *= _F_1_501321110
        z1 *= -_F_0_899976223
        z2 *= -_F_2_562915447
        z3 = z3 * (-_F_1_961570560) + z5
        z4 = z4 * (-_F_0_390180644) + z5
        tmp0 += z1 + z3
        tmp1 += z2 + z4
        tmp2 += z2 + z3
        tmp3 += z1 + z4
        out[r * 8 + 0] = (t10 + tmp3 + rnd) >> shift
        out[r * 8 + 7] = (t10 - tmp3 + rnd) >> shift
        out[r * 8 + 1] = (t11 + tmp2 + rnd) >> shift
        out[r * 8 + 6] = (t11 - tmp2 + rnd) >> shift
        out[r * 8 + 2] = (t12 + tmp1 + rnd) >> shift
        out[r * 8 + 5] = (t12 - tmp1 + rnd) >> shift
        out[r * 8 + 3] = (t13 + tmp0 + rnd) >> shift
        out[r * 8 + 4] = (t13 - tmp0 + rnd) >> shift
    return out


def _idct_islow_batch(coefs):
    """Vectorized :func:`_idct_islow` over a ``(n, 64)`` int64 array —
    the SAME fixed-point integer ops applied elementwise (NumPy int64
    ``+ * << >>`` are exact two's-complement arithmetic and ``>>`` is
    the arithmetic shift Python's is), so every output sample is
    bit-identical to the scalar form; the all-AC-zero column shortcut
    is reproduced with a mask. Batching the corpus' blocks through one
    array pass removes the dominant per-block Python interpreter cost
    of the decode (guide §4.2: hand whole batches to vectorized
    native code inside the Arrow boundary)."""
    import numpy as np

    n = coefs.shape[0]
    X = coefs.reshape(n, 8, 8)  # [block, row r, column c]
    CB, PB = _CONST_BITS, _PASS1_BITS

    def _odd(t0, t1, t2, t3):
        z1 = t0 + t3
        z2 = t1 + t2
        z3 = t0 + t2
        z4 = t1 + t3
        z5 = (z3 + z4) * _F_1_175875602
        t0 = t0 * _F_0_298631336
        t1 = t1 * _F_2_053119869
        t2 = t2 * _F_3_072711026
        t3 = t3 * _F_1_501321110
        z1 = z1 * (-_F_0_899976223)
        z2 = z2 * (-_F_2_562915447)
        z3 = z3 * (-_F_1_961570560) + z5
        z4 = z4 * (-_F_0_390180644) + z5
        return t0 + z1 + z3, t1 + z2 + z4, t2 + z2 + z3, t3 + z1 + z4

    # pass 1: columns (all 8 columns of all blocks at once)
    z2, z3 = X[:, 2, :], X[:, 6, :]
    z1 = (z2 + z3) * _F_0_541196100
    tmp2 = z1 + z3 * (-_F_1_847759065)
    tmp3 = z1 + z2 * _F_0_765366865
    tmp0 = (X[:, 0, :] + X[:, 4, :]) << CB
    tmp1 = (X[:, 0, :] - X[:, 4, :]) << CB
    t10, t13 = tmp0 + tmp3, tmp0 - tmp3
    t11, t12 = tmp1 + tmp2, tmp1 - tmp2
    tmp0, tmp1, tmp2, tmp3 = _odd(X[:, 7, :], X[:, 5, :], X[:, 3, :], X[:, 1, :])
    rnd = 1 << (CB - PB - 1)
    sh = CB - PB
    ws = np.empty((n, 8, 8), dtype=np.int64)
    ws[:, 0, :] = (t10 + tmp3 + rnd) >> sh
    ws[:, 7, :] = (t10 - tmp3 + rnd) >> sh
    ws[:, 1, :] = (t11 + tmp2 + rnd) >> sh
    ws[:, 6, :] = (t11 - tmp2 + rnd) >> sh
    ws[:, 2, :] = (t12 + tmp1 + rnd) >> sh
    ws[:, 5, :] = (t12 - tmp1 + rnd) >> sh
    ws[:, 3, :] = (t13 + tmp0 + rnd) >> sh
    ws[:, 4, :] = (t13 - tmp0 + rnd) >> sh
    dc_mask = ~(X[:, 1:, :].any(axis=1))  # columns with all-zero ACs
    if dc_mask.any():
        dc = X[:, 0, :] << PB
        ws = np.where(dc_mask[:, None, :], dc[:, None, :], ws)

    # pass 2: rows (no shortcut, same as the scalar form)
    z2, z3 = ws[:, :, 2], ws[:, :, 6]
    z1 = (z2 + z3) * _F_0_541196100
    tmp2 = z1 + z3 * (-_F_1_847759065)
    tmp3 = z1 + z2 * _F_0_765366865
    tmp0 = (ws[:, :, 0] + ws[:, :, 4]) << CB
    tmp1 = (ws[:, :, 0] - ws[:, :, 4]) << CB
    t10, t13 = tmp0 + tmp3, tmp0 - tmp3
    t11, t12 = tmp1 + tmp2, tmp1 - tmp2
    tmp0, tmp1, tmp2, tmp3 = _odd(
        ws[:, :, 7], ws[:, :, 5], ws[:, :, 3], ws[:, :, 1]
    )
    shift = CB + PB + 3
    rnd = 1 << (shift - 1)
    out = np.empty((n, 8, 8), dtype=np.int64)
    out[:, :, 0] = (t10 + tmp3 + rnd) >> shift
    out[:, :, 7] = (t10 - tmp3 + rnd) >> shift
    out[:, :, 1] = (t11 + tmp2 + rnd) >> shift
    out[:, :, 6] = (t11 - tmp2 + rnd) >> shift
    out[:, :, 2] = (t12 + tmp1 + rnd) >> shift
    out[:, :, 5] = (t12 - tmp1 + rnd) >> shift
    out[:, :, 3] = (t13 + tmp0 + rnd) >> shift
    out[:, :, 4] = (t13 - tmp0 + rnd) >> shift
    return out.reshape(n, 64)


def _scatter_blocks(plane, samples, positions):
    """Write clamped 8×8 sample blocks into a 2-D plane array."""
    for i, (bx, by) in enumerate(positions):
        plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = samples[i].reshape(
            8, 8
        )


def decode_jpeg(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline-sequential JFIF payload to ``(width, height,
    rgb)``. Supported sampling: grayscale, 4:4:4, and the 2×-factor
    subsampled forms (4:2:0, 4:2:2, 4:4:0) — the shapes real-world
    encoders emit. Chroma is upsampled by SAMPLE REPLICATION (the
    deterministic nearest-neighbor contract; libjpeg's "-nosmooth"
    path) so decoded pixels stay bit-identical across hosts.
    Restart intervals (DRI + RSTn, T.81 E.2.4) are honored: DC
    predictors reset and the stream re-aligns at each marker.
    Progressive (SOF2) payloads route to the Annex G scan-accumulation
    path (:func:`_decode_progressive` — spectral selection +
    successive approximation, EOB runs, correction bits).
    Arithmetic coding, hierarchical modes, sampling factors > 2, and
    12-bit precision raise ``NotImplementedError`` (honest boundary —
    same policy as the PNG codec).

    Marker parsing tolerates optional 0xFF fill bytes before a marker
    code (legal per T.81 B.1.1.2) and the length-less standalone
    markers (TEM 0x01, RST0-7) outside entropy data."""
    if not payload.startswith(b"\xff\xd8"):
        raise NotImplementedError("not a JPEG payload (missing SOI)")
    pos = 2
    quant: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    frame = None  # (w, h, [(cid, h_i, v_i, qtab)])
    scan = None
    restart_interval = 0

    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise NotImplementedError("JPEG marker desync")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede the
        # marker code — skip them all.
        while pos < len(payload) and payload[pos] == 0xFF:
            pos += 1
        if pos >= len(payload):
            break
        marker = payload[pos]
        pos += 1
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # TEM / RSTn are standalone (no length field); legal to
            # appear, nothing to consume.
            continue
        if pos + 2 > len(payload):
            raise NotImplementedError("truncated JPEG marker segment")
        seglen = struct.unpack(">H", payload[pos : pos + 2])[0]
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit JPEG quant tables unsupported")
                zz = list(seg[p + 1 : p + 65])
                if len(zz) < 64:
                    raise NotImplementedError("truncated JPEG DQT segment")
                tbl = [0] * 64
                for i in range(64):
                    tbl[ZIGZAG[i]] = zz[i]
                quant[tq] = tbl
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                if len(bits) < 16 or len(vals) < n:
                    raise NotImplementedError("truncated JPEG DHT segment")
                huff[(cls, tid)] = _HuffTable(bits, vals)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, fh, fw, nc = seg[0], struct.unpack(">H", seg[1:3])[0], struct.unpack(">H", seg[3:5])[0], seg[5]
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec} unsupported")
            if nc not in (1, 3):
                raise NotImplementedError(f"JPEG with {nc} components unsupported")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                hi, vi = hv >> 4, hv & 0xF
                if hi not in (1, 2) or vi not in (1, 2):
                    raise NotImplementedError(
                        f"JPEG sampling factor {hi}x{vi} unsupported (1 or 2 only)"
                    )
                comps.append((cid, hi, vi, tq))
            if nc == 1:
                # single-component scans are non-interleaved: one block
                # per MCU regardless of declared factors (T.81 A.2.2)
                comps = [(comps[0][0], 1, 1, comps[0][3])]
            frame = (fw, fh, comps)
        elif marker == 0xC2:  # SOF2: progressive — dedicated walk
            return _decode_progressive(payload)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF{marker - 0xC0}) unsupported"
            )
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                raise NotImplementedError("truncated JPEG DRI segment")
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            stabs = []
            for i in range(ns):
                cid, tabs = seg[1 + 2 * i], seg[2 + 2 * i]
                stabs.append((cid, tabs >> 4, tabs & 0xF))
            scan = (stabs, pos + seglen)
            break
        pos += seglen

    if frame is None or scan is None:
        raise NotImplementedError("JPEG missing SOF0/SOS")
    w, h, comps = frame
    if w <= 0 or h <= 0:
        raise NotImplementedError("non-positive JPEG dimensions")
    stabs, data_start = scan
    # entropy data runs until EOI
    end = payload.rfind(b"\xff\xd9")
    if end < 0:
        end = len(payload)
    br = _BitReader(payload[data_start:end])

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    import numpy as np

    # per-component subsampled plane (padded to whole MCUs)
    plane_dims = [(mcux * hi * 8, mcuy * vi * 8) for (_cid, hi, vi, _tq) in comps]
    planes = [np.zeros((ph, pw), dtype=np.int64) for (pw, ph) in plane_dims]
    preds = [0] * len(comps)
    comp_tabs = []
    for (cid, _hi, _vi, tq) in comps:
        match = [s for s in stabs if s[0] == cid]
        if not match or tq not in quant:
            raise NotImplementedError("JPEG scan/table wiring incomplete")
        _, td, ta = match[0]
        if (0, td) not in huff or (1, ta) not in huff:
            raise NotImplementedError("JPEG missing Huffman table")
        comp_tabs.append((quant[tq], huff[(0, td)], huff[(1, ta)]))

    # entropy decode is inherently sequential; the IDCT + level shift +
    # clamp are NOT — blocks accumulate per component and run through
    # one vectorized _idct_islow_batch pass after the MCU walk
    # (round-13, guide §4.2), bit-identical to the per-block scalar form
    coef_rows: list[list[list[int]]] = [[] for _ in comps]
    coef_pos: list[list[tuple[int, int]]] = [[] for _ in comps]

    def _decode_block(ci: int, blk_x: int, blk_y: int) -> None:
        qt, dct, act = comp_tabs[ci]
        coefs = [0] * 64
        size = dct.decode(br)
        diff = _extend(br.read_bits(size), size) if size else 0
        preds[ci] += diff
        coefs[0] = preds[ci] * qt[0]
        k = 1
        while k < 64:
            rs = act.decode(br)
            run, size = rs >> 4, rs & 0xF
            if size == 0:
                if run == 15:
                    k += 16  # ZRL
                    continue
                break  # EOB
            k += run
            if k > 63:
                raise NotImplementedError("JPEG AC index overflow")
            coefs[ZIGZAG[k]] = _extend(br.read_bits(size), size) * qt[ZIGZAG[k]]
            k += 1
        coef_rows[ci].append(coefs)
        coef_pos[ci].append((blk_x, blk_y))

    # interleaved MCU order (T.81 A.2.3): within each MCU every
    # component contributes h_i × v_i blocks, left-to-right then
    # top-to-bottom; for 4:4:4 / grayscale this degenerates to the
    # one-block-per-component order. With a DRI interval, every
    # `restart_interval` MCUs the stream byte-aligns on an RSTn marker
    # and DC predictors reset (T.81 E.2.4).
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.consume_restart()
                for ci in range(len(preds)):
                    preds[ci] = 0
            mcu_count += 1
            for ci, (_cid, hi, vi, _tq) in enumerate(comps):
                for by in range(vi):
                    for bx in range(hi):
                        _decode_block(ci, mx * hi + bx, my * vi + by)

    for ci in range(len(comps)):
        if not coef_rows[ci]:
            continue
        px = _idct_islow_batch(np.array(coef_rows[ci], dtype=np.int64))
        _scatter_blocks(planes[ci], np.clip(px + 128, 0, 255), coef_pos[ci])

    return w, h, _planes_to_rgb(w, h, comps, plane_dims, planes, hmax, vmax)


def _planes_to_rgb(
    w: int,
    h: int,
    comps: list,
    plane_dims: list,
    planes: list,
    hmax: int,
    vmax: int,
) -> bytes:
    """Shared decode tail: upsample component planes (sample
    replication) and convert to RGB with 16-bit fixed-point YCbCr —
    used by both the baseline and progressive paths. Planes are 2-D
    int64 NumPy arrays; the whole conversion is vectorized int64
    arithmetic (round-13, guide §4.2) — shifts/adds/clamps identical
    to the former per-pixel scalar loop, so output bytes are
    unchanged."""
    import numpy as np

    if len(comps) == 1:
        Y = planes[0][:h, :w].astype(np.uint8)
        return np.repeat(Y[:, :, None], 3, axis=2).tobytes()
    yp, cbp, crp = planes
    (_c0, yh_, yv_, _q0), (_c1, cbh, cbv, _q1), (_c2, crh, crv, _q2) = comps
    # fixed-point YCbCr->RGB (16-bit fractional, round-half-up); chroma
    # upsampled by sample replication: source index floor-scales by
    # h_i/hmax (exact for the supported 1-or-2 factors)
    ys = np.arange(h, dtype=np.int64)
    xs = np.arange(w, dtype=np.int64)
    Y = yp[(ys * yv_) // vmax][:, (xs * yh_) // hmax]
    cb = cbp[(ys * cbv) // vmax][:, (xs * cbh) // hmax] - 128
    cr = crp[(ys * crv) // vmax][:, (xs * crh) // hmax] - 128
    half = 1 << 15
    r = Y + ((91881 * cr + half) >> 16)
    g = Y - ((22554 * cb + 46802 * cr + half) >> 16)
    b = Y + ((116130 * cb + half) >> 16)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(rgb, 0, 255).astype(np.uint8).tobytes()


# ---------------------------------------------------------------------------
# progressive JPEG (SOF2): spectral selection + successive approximation
# (round 9 — closes the last JPEG class; ITU T.81 Annex G, the same
# coefficient bookkeeping libjpeg's jdphuff/jcphuff standardized)
# ---------------------------------------------------------------------------


def _prog_ac_first(block, act, ss, se, al, br, eobrun):
    """AC first scan (Ah=0) for one block: run-length + EOBn coding of
    the band [ss..se] at point transform Al. Returns the new EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = act.decode(br)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.read_bits(r)
            break
        k += r
        if k > se:
            raise NotImplementedError("progressive AC index past band end")
        block[ZIGZAG[k]] = _extend(br.read_bits(s), s) * (1 << al)
        k += 1
    return eobrun


def _prog_ac_refine(block, act, ss, se, al, br, eobrun):
    """AC refinement scan (Ah=Al+1) for one block: newly-significant
    coefficients arrive as ±2^Al; every already-nonzero coefficient in
    the traversed band carries one correction bit (T.81 G.1.2.3 — the
    jdphuff algorithm, incl. the two's-complement `coef & p1` test,
    which agrees with the magnitude bit on the maintained multiple-of-
    2^Al invariant). Returns the new EOB run."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = act.decode(br)
            r, s = rs >> 4, rs & 0xF
            val = 0
            if s == 0:
                if r < 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read_bits(r)
                    break
                # r == 15: ZRL — skip 16 zero-history positions below
            else:
                if s != 1:
                    raise NotImplementedError(
                        "progressive refinement size != 1"
                    )
                val = p1 if br.read_bit() else m1
            while k <= se:
                z = ZIGZAG[k]
                if block[z] != 0:
                    if br.read_bit() and (block[z] & p1) == 0:
                        block[z] += p1 if block[z] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                block[ZIGZAG[k]] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            z = ZIGZAG[k]
            if block[z] != 0:
                if br.read_bit() and (block[z] & p1) == 0:
                    block[z] += p1 if block[z] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive(payload: bytes) -> tuple[int, int, bytes]:
    """Progressive (SOF2) decode: accumulate raw quantized coefficients
    across scans (DC/AC, first/refinement, interleaved or not), then
    dequantize + fixed-point IDCT once — same pixel pipeline as the
    baseline path from the coefficient level down."""
    pos = 2
    quant: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    frame = None
    restart_interval = 0
    blocks = None  # per comp: list of 64-coef lists in padded raster order
    grid = None    # per comp: (padded_bw, padded_bh, own_bw, own_bh)
    n_scans = 0
    end = payload.rfind(b"\xff\xd9")
    if end < 0:
        end = len(payload)

    while pos + 2 <= len(payload):
        # residual entropy padding: a scan whose 1-bit flush padding
        # produced 0xFF carries a stuffed 0x00 the scan decoder never
        # consumed — tolerate stuffed pairs / lone pad zeros here
        while pos + 1 < len(payload) and payload[pos] == 0xFF and payload[pos + 1] == 0x00:
            pos += 2
        while pos < len(payload) and payload[pos] == 0x00:
            pos += 1
        if pos >= len(payload):
            break
        if payload[pos] != 0xFF:
            raise NotImplementedError("JPEG marker desync")
        while pos < len(payload) and payload[pos] == 0xFF:
            pos += 1
        if pos >= len(payload):
            break
        marker = payload[pos]
        pos += 1
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        if pos + 2 > len(payload):
            raise NotImplementedError("truncated JPEG marker segment")
        seglen = struct.unpack(">H", payload[pos : pos + 2])[0]
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit JPEG quant tables unsupported")
                zz = list(seg[p + 1 : p + 65])
                if len(zz) < 64:
                    raise NotImplementedError("truncated JPEG DQT segment")
                tbl = [0] * 64
                for i in range(64):
                    tbl[ZIGZAG[i]] = zz[i]
                quant[tq] = tbl
                p += 65
        elif marker == 0xC4:
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                if len(bits) < 16 or len(vals) < n:
                    raise NotImplementedError("truncated JPEG DHT segment")
                huff[(cls, tid)] = _HuffTable(bits, vals)
                p += 17 + n
        elif marker == 0xC2:
            prec = seg[0]
            fh = struct.unpack(">H", seg[1:3])[0]
            fw = struct.unpack(">H", seg[3:5])[0]
            nc = seg[5]
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec} unsupported")
            if nc not in (1, 3):
                raise NotImplementedError(f"JPEG with {nc} components unsupported")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                hi, vi = hv >> 4, hv & 0xF
                if hi not in (1, 2) or vi not in (1, 2):
                    raise NotImplementedError(
                        f"JPEG sampling factor {hi}x{vi} unsupported (1 or 2 only)"
                    )
                comps.append((cid, hi, vi, tq))
            frame = (fw, fh, comps)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = (fw + 8 * hmax - 1) // (8 * hmax)
            mcuy = (fh + 8 * vmax - 1) // (8 * vmax)
            grid = []
            blocks = []
            for (_cid, hi, vi, _tq) in comps:
                pbw, pbh = mcux * hi, mcuy * vi
                own_w = (fw * hi + hmax - 1) // hmax
                own_h = (fh * vi + vmax - 1) // vmax
                grid.append((pbw, pbh, (own_w + 7) // 8, (own_h + 7) // 8))
                blocks.append([[0] * 64 for _ in range(pbw * pbh)])
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("mixed/non-progressive SOF in SOF2 walk")
        elif marker == 0xDD:
            if len(seg) < 2:
                raise NotImplementedError("truncated JPEG DRI segment")
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:
            if frame is None:
                raise NotImplementedError("JPEG SOS before SOF2")
            fw, fh, comps = frame
            ns = seg[0]
            scomps = []  # (comp index, dc table, ac table)
            for i in range(ns):
                cid, tabs = seg[1 + 2 * i], seg[2 + 2 * i]
                ci = next(
                    (j for j, c in enumerate(comps) if c[0] == cid), None
                )
                if ci is None:
                    raise NotImplementedError("JPEG scan names unknown component")
                scomps.append((ci, tabs >> 4, tabs & 0xF))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            if ss > se or se > 63:
                raise NotImplementedError("bad progressive spectral band")
            if ss == 0 and se != 0:
                raise NotImplementedError("progressive scan mixes DC and AC")
            if ss > 0 and ns != 1:
                raise NotImplementedError("interleaved progressive AC scan")
            br = _BitReader(payload[pos + seglen : end])
            preds = [0] * len(comps)
            eobrun = 0
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)

            def _dc_block(ci, td, bx, by):
                nonlocal preds
                blk = blocks[ci][by * grid[ci][0] + bx]
                if ah == 0:
                    tab = huff.get((0, td))
                    if tab is None:
                        raise NotImplementedError("JPEG missing Huffman table")
                    size = tab.decode(br)
                    diff = _extend(br.read_bits(size), size) if size else 0
                    preds[ci] += diff
                    blk[0] = preds[ci] * (1 << al)
                else:
                    if br.read_bit():
                        blk[0] |= 1 << al

            if ss == 0:
                # DC scan: interleaved MCU order (ns>1) or the single
                # component's own block raster (ns==1)
                if ns > 1:
                    mcux = (fw + 8 * hmax - 1) // (8 * hmax)
                    mcuy = (fh + 8 * vmax - 1) // (8 * vmax)
                    n_mcu = 0
                    for my in range(mcuy):
                        for mx in range(mcux):
                            if (restart_interval and n_mcu
                                    and n_mcu % restart_interval == 0):
                                br.consume_restart()
                                preds = [0] * len(comps)
                            n_mcu += 1
                            for (ci, td, _ta) in scomps:
                                hi, vi = comps[ci][1], comps[ci][2]
                                for by in range(vi):
                                    for bx in range(hi):
                                        _dc_block(ci, td, mx * hi + bx,
                                                  my * vi + by)
                else:
                    ci, td, _ta = scomps[0]
                    _pbw, _pbh, cbw, cbh = grid[ci]
                    n_mcu = 0
                    for by in range(cbh):
                        for bx in range(cbw):
                            if (restart_interval and n_mcu
                                    and n_mcu % restart_interval == 0):
                                br.consume_restart()
                                preds = [0] * len(comps)
                            n_mcu += 1
                            _dc_block(ci, td, bx, by)
            else:
                ci, _td, ta = scomps[0]
                tab = huff.get((1, ta))
                if tab is None:
                    raise NotImplementedError("JPEG missing Huffman table")
                _pbw, _pbh, cbw, cbh = grid[ci]
                n_mcu = 0
                for by in range(cbh):
                    for bx in range(cbw):
                        if (restart_interval and n_mcu
                                and n_mcu % restart_interval == 0):
                            br.consume_restart()
                            eobrun = 0
                        n_mcu += 1
                        blk = blocks[ci][by * grid[ci][0] + bx]
                        if ah == 0:
                            eobrun = _prog_ac_first(
                                blk, tab, ss, se, al, br, eobrun
                            )
                        else:
                            if ah != al + 1:
                                raise NotImplementedError(
                                    "progressive Ah != Al+1"
                                )
                            eobrun = _prog_ac_refine(
                                blk, tab, ss, se, al, br, eobrun
                            )
            # resume the marker walk right after the consumed entropy
            # bits (partial-byte remainder is padding)
            n_scans += 1
            pos = pos + seglen + br.pos
            continue
        pos += seglen

    if frame is None or blocks is None or n_scans == 0:
        raise NotImplementedError("progressive JPEG missing SOF2/scan data")
    fw, fh, comps = frame
    if fw <= 0 or fh <= 0:
        raise NotImplementedError("non-positive JPEG dimensions")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    import numpy as np

    plane_dims = [(g[0] * 8, g[1] * 8) for g in grid]
    planes = [np.zeros((ph, pw), dtype=np.int64) for (pw, ph) in plane_dims]
    for ci, (_cid, _hi, _vi, tq) in enumerate(comps):
        if tq not in quant:
            raise NotImplementedError("JPEG scan/table wiring incomplete")
        qt = np.array(quant[tq], dtype=np.int64)
        pbw = grid[ci][0]
        # dequantize + IDCT + level shift + clamp for ALL blocks in one
        # vectorized pass (round-13, guide §4.2 — bit-identical, see
        # _idct_islow_batch)
        coef = np.array(blocks[ci], dtype=np.int64) * qt[None, :]
        px = _idct_islow_batch(coef)
        samples = np.clip(px + 128, 0, 255)
        positions = [
            (bi % pbw, bi // pbw) for bi in range(coef.shape[0])
        ]
        _scatter_blocks(planes[ci], samples, positions)
    return fw, fh, _planes_to_rgb(fw, fh, comps, plane_dims, planes, hmax, vmax)


# --- progressive encoder ----------------------------------------------------

# Flat Huffman tables for progressive scans. The Annex K AC tables lack
# the EOBn symbols (0x10..0xE0) progressive EOB-run coding needs, so the
# progressive encoder ships its own fixed tables: every symbol at one
# code length (12 DC symbols at 4 bits; 176 AC symbols — EOB0-14, ZRL,
# (r,s) for s 1..10 — at 8 bits). Canonically valid (all-ones code
# unused at each length), trivially decodable by any T.81 decoder;
# compression is not the point of these fixtures.
_PROG_DC = ([0, 0, 0, 12] + [0] * 12, list(range(12)))
_PROG_AC_SYMS = (
    [r << 4 for r in range(15)]          # EOB0..EOB14
    + [0xF0]                             # ZRL
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_PROG_AC = ([0, 0, 0, 0, 0, 0, 0, len(_PROG_AC_SYMS)] + [0] * 8, _PROG_AC_SYMS)


class _ProgScanWriter:
    """Bit writer + EOB-run/correction-bit bookkeeping for one scan."""

    def __init__(self, dc_codes, ac_codes):
        self.bw = _BitWriter()
        self.dc = dc_codes
        self.ac = ac_codes
        self.eobrun = 0

    def sym_ac(self, s):
        c, l = self.ac[s]
        self.bw.write(c, l)

    def sym_dc(self, s):
        c, l = self.dc[s]
        self.bw.write(c, l)

    def flush_eobrun(self):
        run = self.eobrun
        self.eobrun = 0
        if run > 0:
            # run is kept < 2^15, so one EOBn symbol always covers it:
            # r = floor(log2 run) <= 14, extra bits = run - 2^r < 2^r
            r = run.bit_length() - 1
            self.sym_ac(r << 4)
            if r:
                self.bw.write(run - (1 << r), r)

    def done(self) -> bytes:
        self.flush_eobrun()
        return self.bw.flush()


def _shift_coef(v: int, al: int) -> int:
    """Point transform: v / 2^al rounded toward zero (T.81 G.1.1)."""
    return v >> al if v >= 0 else -((-v) >> al)


def _enc_ac_first(sw: _ProgScanWriter, block, ss, se, al):
    r = 0
    for k in range(ss, se + 1):
        v = _shift_coef(block[ZIGZAG[k]], al)
        if v == 0:
            r += 1
            continue
        sw.flush_eobrun()
        while r > 15:
            sw.sym_ac(0xF0)
            r -= 16
        s = abs(v).bit_length()
        bits = v if v > 0 else v + (1 << s) - 1
        sw.sym_ac((r << 4) | s)
        sw.bw.write(bits, s)
        r = 0
    if r > 0:
        sw.eobrun += 1
        if sw.eobrun == 0x7FFF:
            sw.flush_eobrun()


def _enc_ac_refine(sw: _ProgScanWriter, block, ss, se, al):
    """Refinement scan for one block (jcphuff algorithm), with the EOB
    flushed per block — correction bits for already-nonzero
    coefficients buffer until the next emitted symbol."""
    absv = {}
    eob_k = ss - 1
    for k in range(ss, se + 1):
        t = _shift_coef(block[ZIGZAG[k]], al)
        absv[k] = abs(t)
        if absv[k] == 1:
            eob_k = k
    r = 0
    pending = []
    for k in range(ss, se + 1):
        t = absv[k]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob_k:
            sw.sym_ac(0xF0)
            r -= 16
            for b in pending:
                sw.bw.write(b, 1)
            pending = []
        if t > 1:
            pending.append(t & 1)
            continue
        sw.sym_ac((r << 4) | 1)
        r = 0
        sw.bw.write(1 if block[ZIGZAG[k]] >= 0 else 0, 1)
        for b in pending:
            sw.bw.write(b, 1)
        pending = []
    if r > 0 or pending:
        sw.sym_ac(0x00)  # EOB (run 1): rest of band is corrections only
        for b in pending:
            sw.bw.write(b, 1)


def encode_jpeg_progressive(
    w: int, h: int, rgb: bytes, quality: int = 85, subsample: str = "444"
) -> bytes:
    """Progressive (SOF2) JFIF encoder: spectral selection AND
    successive approximation over the SAME quantized coefficients the
    baseline encoder produces — so a correct decode is bit-identical
    to decoding the baseline encoding of the same image (pinned in
    tests). Scan script: DC (Al=1) interleaved; per-component AC first
    scans at Al=1 (luma split 1-5 / 6-63 to exercise banding); DC
    refinement; per-component AC refinements to Al=0. Deterministic
    throughout."""
    if len(rgb) != w * h * 3:
        raise ValueError("rgb length != w*h*3")
    if subsample not in ("444", "420"):
        raise NotImplementedError(f"subsample mode {subsample!r} unsupported")
    ql = _scaled_quant(_QUANT_LUMA, quality)
    qc = _scaled_quant(_QUANT_CHROMA, quality)

    # vectorized color transform / subsample / FDCT+quantize — same
    # helpers (and bit-identical outputs) as the baseline encoder
    ny, ncb, ncr = _rgb_to_ycbcr_planes(w, h, rgb)

    if subsample == "444":
        samplings = ((1, 0x11, 0), (2, 0x11, 1), (3, 0x11, 1))
        hmax = vmax = 1
        mcux, mcuy = (w + 7) // 8, (h + 7) // 8
        comp_planes = [(ny, w, h, ql), (ncb, w, h, qc), (ncr, w, h, qc)]
        factors = [(1, 1), (1, 1), (1, 1)]
    else:
        samplings = ((1, 0x22, 0), (2, 0x11, 1), (3, 0x11, 1))
        hmax = vmax = 2
        mcux, mcuy = (w + 15) // 16, (h + 15) // 16
        cw, ch = (w + 1) // 2, (h + 1) // 2
        scb = _subsample_420_plane(ncb, w, h)
        scr = _subsample_420_plane(ncr, w, h)
        comp_planes = [(ny, w, h, ql), (scb, cw, ch, qc), (scr, cw, ch, qc)]
        factors = [(2, 2), (1, 1), (1, 1)]

    # quantized coefficient blocks over the MCU-padded grid per comp
    blocks = []
    grids = []  # (padded_bw, padded_bh, own_bw, own_bh)
    for ci, (plane, pw_, ph_, qt) in enumerate(comp_planes):
        hi, vi = factors[ci]
        pbw, pbh = mcux * hi, mcuy * vi
        own_bw, own_bh = (pw_ + 7) // 8, (ph_ + 7) // 8
        grids.append((pbw, pbh, own_bw, own_bh))
        blocks.append(_quant_zz_blocks(plane, qt, pbw, pbh, zigzag=False))

    dc_codes = _build_codes(*_PROG_DC)
    ac_codes = _build_codes(*_PROG_AC)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, qt in ((0, ql), (1, qc)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(qt[ZIGZAG[i]] for i in range(64))
    out += b"\xff\xc2" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for cid, hv, tq in samplings:
        out += bytes([cid, hv, tq])
    for cls, tid, (bits, vals) in ((0, 0, _PROG_DC), (1, 0, _PROG_AC)):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)

    def sos_header(comp_ids, ss, se, ah, al) -> bytes:
        hdr = struct.pack(">HB", 6 + 2 * len(comp_ids), len(comp_ids))
        for cid in comp_ids:
            hdr += bytes([cid, 0x00])  # DC table 0, AC table 0
        hdr += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + hdr

    def dc_scan(ah, al) -> bytes:
        sw = _ProgScanWriter(dc_codes, ac_codes)
        preds = [0, 0, 0]
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(3):
                    hi, vi = factors[ci]
                    pbw = grids[ci][0]
                    for by in range(vi):
                        for bx in range(hi):
                            blk = blocks[ci][(my * vi + by) * pbw + (mx * hi + bx)]
                            if ah == 0:
                                t = blk[0] >> al  # arithmetic shift
                                diff = t - preds[ci]
                                preds[ci] = t
                                s = abs(diff).bit_length()
                                sw.sym_dc(s)
                                if s:
                                    bits = (
                                        diff if diff > 0
                                        else diff + (1 << s) - 1
                                    )
                                    sw.bw.write(bits, s)
                            else:
                                sw.bw.write((blk[0] >> al) & 1, 1)
        return sw.done()

    def ac_scan(ci, ss, se, ah, al) -> bytes:
        sw = _ProgScanWriter(dc_codes, ac_codes)
        pbw, _pbh, own_bw, own_bh = grids[ci]
        for by in range(own_bh):
            for bx in range(own_bw):
                blk = blocks[ci][by * pbw + bx]
                if ah == 0:
                    _enc_ac_first(sw, blk, ss, se, al)
                else:
                    _enc_ac_refine(sw, blk, ss, se, al)
        return sw.done()

    # scan script: coarse DC, coarse AC (luma spectrally split), then
    # refinements down to full precision
    out += sos_header([1, 2, 3], 0, 0, 0, 1) + dc_scan(0, 1)
    out += sos_header([1], 1, 5, 0, 1) + ac_scan(0, 1, 5, 0, 1)
    out += sos_header([1], 6, 63, 0, 1) + ac_scan(0, 6, 63, 0, 1)
    out += sos_header([2], 1, 63, 0, 1) + ac_scan(1, 1, 63, 0, 1)
    out += sos_header([3], 1, 63, 0, 1) + ac_scan(2, 1, 63, 0, 1)
    out += sos_header([1, 2, 3], 0, 0, 1, 0) + dc_scan(1, 0)
    out += sos_header([1], 1, 5, 1, 0) + ac_scan(0, 1, 5, 1, 0)
    out += sos_header([1], 6, 63, 1, 0) + ac_scan(0, 6, 63, 1, 0)
    out += sos_header([2], 1, 63, 1, 0) + ac_scan(1, 1, 63, 1, 0)
    out += sos_header([3], 1, 63, 1, 0) + ac_scan(2, 1, 63, 1, 0)
    out += b"\xff\xd9"
    return bytes(out)
