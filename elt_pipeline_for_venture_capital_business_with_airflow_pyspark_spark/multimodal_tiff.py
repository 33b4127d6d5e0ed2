"""Baseline TIFF codec — pure stdlib, exact-integer end to end
(round 9 continuation).

TIFF is the container format of scanned-document and scientific-image
corpora; unlike the streaming formats (PNG/JPEG/GIF) it is a
random-access TAG directory (IFD) walk, so implementing it exercises
the remaining structural family: typed tag entries, inline-vs-offset
values, strip-segmented pixel data, chained IFDs (multi-page), and
both byte orders. Compression: none (1), LZW (5 — MSB-first with
the spec's early-change width rule, distinct from GIF's LSB-first
variant in multimodal_gif.py), Deflate (8 "Adobe" and the legacy
32946 alias — stdlib zlib streams, round 10: the codec Deflate
TIFFs in the wild pair with predictor 2, which composes here) and
PackBits RLE (32773).

Scope (same honest-boundary policy as ``multimodal.decode_image``):
8-bit grayscale (photometric 0/1) and 8-bit RGB, little- ('II') and
big-endian ('MM'), multi-page chains walked by :func:`tiff_page_count`
and first-page-decoded by :func:`decode_tiff`. Pixel layouts: chunky
strips, planar-config-2 strips (per-channel planes), and tiles (tags
322-325, edge tiles padded per spec §15) — each composing with every
compression. JPEG-in-TIFF, tiled-planar-2, and sub-8-bit depths raise
``NotImplementedError``.

Deflate note: TIFF 6.0 proper never assigned 8 — Adobe's TIFF Tech
Note and the de-facto ecosystem (libtiff) did, with 32946 as the
older experimental code. Both decode identically (one zlib stream
per strip/tile); the encoder always writes 8.

No code is shared with or derived from the reference repo (it has no
image surface at all).
"""

from __future__ import annotations

import struct
import zlib

_COMP_NONE = 1
_COMP_LZW = 5
_COMP_DEFLATE = 8  # Adobe deflate (TIFF Tech Note 2 / libtiff)
_COMP_DEFLATE_OLD = 32946  # legacy experimental code, same stream
_COMP_PACKBITS = 32773


# ------------------------------------------------------------------ TIFF LZW
#
# TIFF's LZW (tag 5, spec §13) is the GIF algorithm with three twists:
# bytes are the alphabet (fixed 8-bit "min code size"), codes pack
# MSB-FIRST, and the code width grows ONE CODE EARLY (when the table
# reaches 2^width - 1 — the spec's infamous "early change"). Both
# directions below; the GIF variant lives in multimodal_gif.py and the
# two are deliberately not shared — the bit order and change point
# differ in exactly the places a merged implementation would hide.

_T_CLEAR = 256
_T_EOI = 257
_MAX_CODE_WIDTH = 12
_TABLE_CAP = 1 << _MAX_CODE_WIDTH  # 4096


def _lzw_decode_tiff(data: bytes, expected: int) -> bytes:
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while len(out) < expected:
        while nbits < width:
            if pos >= n:
                raise ValueError(
                    f"TIFF LZW exhausted at {len(out)}/{expected} bytes"
                )
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        acc &= (1 << nbits) - 1

        if code == _T_CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if code == _T_EOI:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError(f"first TIFF LZW code {code} out of table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise ValueError(f"TIFF LZW code {code} beyond table {len(table)}")
        if prev is not None and len(table) < _TABLE_CAP:
            table.append(prev + entry[:1])
            # EARLY CHANGE: widen one code before the table fills
            if len(table) == (1 << width) - 1 and width < _MAX_CODE_WIDTH:
                width += 1
        out += entry
        prev = entry
    return bytes(out)


def _lzw_encode_tiff(data: bytes) -> bytes:
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
            acc &= (1 << nbits) - 1

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = _T_EOI + 1
    width = 9
    dec_len = _T_EOI + 1  # decoder's table length, simulated
    first = True
    put(_T_CLEAR, width)

    def emit_data(code: int) -> None:
        nonlocal first, dec_len, width
        put(code, width)
        if first:
            first = False
        elif dec_len < _TABLE_CAP:
            dec_len += 1
            if dec_len == (1 << width) - 1 and width < _MAX_CODE_WIDTH:
                width += 1

    buf = b""
    for px in data:
        nxt = buf + bytes([px])
        if nxt in table:
            buf = nxt
            continue
        emit_data(table[buf])
        if next_code < _TABLE_CAP:
            table[nxt] = next_code
            next_code += 1
        else:
            put(_T_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = _T_EOI + 1
            width = 9
            dec_len = _T_EOI + 1
            first = True
        buf = bytes([px])
    if buf:
        emit_data(table[buf])
    put(_T_EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


# ----------------------------------------------------------------- PackBits


def packbits_decode(data: bytes, expected: int) -> bytes:
    """Apple PackBits RLE: header byte n in [0,127] copies n+1
    literals; n in [129,255] (two's-complement -1..-127) repeats the
    next byte 257-n times; 128 is a no-op. Stops at ``expected``
    output bytes (TIFF strips are decoded independently)."""
    out = bytearray()
    pos = 0
    while len(out) < expected:
        if pos >= len(data):
            raise ValueError(
                f"PackBits stream exhausted at {len(out)}/{expected} bytes"
            )
        n = data[pos]
        pos += 1
        if n == 128:
            continue
        if n < 128:
            chunk = data[pos : pos + n + 1]
            if len(chunk) != n + 1:
                raise ValueError("truncated PackBits literal run")
            out += chunk
            pos += n + 1
        else:
            if pos >= len(data):
                raise ValueError("truncated PackBits repeat run")
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
    if len(out) != expected:
        raise ValueError(
            f"PackBits run overshoots strip: {len(out)} > {expected}"
        )
    return bytes(out)


def packbits_encode(data: bytes) -> bytes:
    """Greedy PackBits: repeat runs of ≥3 become repeat packets (max
    128), everything else accumulates into literal packets (max 128).
    Deterministic; round-trip pinned in tests."""
    out = bytearray()
    i = 0
    n = len(data)
    lit_start = i
    while i < n:
        run = 1
        while i + run < n and data[i + run] == data[i] and run < 128:
            run += 1
        if run >= 3:
            j = lit_start
            while j < i:  # flush pending literals
                take = min(128, i - j)
                out.append(take - 1)
                out += data[j : j + take]
                j += take
            out.append(257 - run)
            out.append(data[i])
            i += run
            lit_start = i
        else:
            i += run
    j = lit_start
    while j < n:
        take = min(128, n - j)
        out.append(take - 1)
        out += data[j : j + take]
        j += take
    return bytes(out)


# ------------------------------------------------------------------ IFD walk

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _read_ifd(payload: bytes, off: int, e: str) -> tuple[dict, int]:
    """One IFD at ``off`` -> ({tag: [values]}, next_ifd_offset)."""
    if off + 2 > len(payload):
        raise ValueError("truncated TIFF: IFD header out of range")
    (count,) = struct.unpack_from(f"{e}H", payload, off)
    pos = off + 2
    if pos + 12 * count + 4 > len(payload):
        raise ValueError("truncated TIFF: IFD entries out of range")
    tags: dict[int, list[int]] = {}
    for _ in range(count):
        tag, typ, n = struct.unpack_from(f"{e}HHI", payload, pos)
        size = _TYPE_SIZES.get(typ)
        if size is None:
            pos += 12
            continue  # unknown type: legal to skip (spec §2)
        total = size * n
        if total <= 4:
            voff = pos + 8
        else:
            (voff,) = struct.unpack_from(f"{e}I", payload, pos + 8)
            if voff + total > len(payload):
                raise ValueError(f"truncated TIFF: tag {tag} values out of range")
        if typ == 3:
            vals = list(struct.unpack_from(f"{e}{n}H", payload, voff))
        elif typ == 4:
            vals = list(struct.unpack_from(f"{e}{n}I", payload, voff))
        elif typ == 1:
            vals = list(payload[voff : voff + n])
        elif typ == 5:  # rational: keep numerators (unused here)
            vals = [
                struct.unpack_from(f"{e}II", payload, voff + 8 * i)[0]
                for i in range(n)
            ]
        else:  # ASCII
            vals = list(payload[voff : voff + n])
        tags[tag] = vals
        pos += 12
    (nxt,) = struct.unpack_from(f"{e}I", payload, pos)
    return tags, nxt


def _endianness(payload: bytes) -> str:
    if len(payload) < 8:
        raise NotImplementedError("not a TIFF payload (too short)")
    if payload[:4] == b"II*\x00":
        return "<"
    if payload[:4] == b"MM\x00*":
        return ">"
    raise NotImplementedError(f"not a TIFF payload (magic {payload[:4]!r})")


def tiff_page_count(payload: bytes) -> int:
    """Pages in the IFD chain — a pure directory walk (strip data
    never touched): the metadata scan an ingest pipeline uses to
    route multi-page scans without decoding."""
    e = _endianness(payload)
    (off,) = struct.unpack_from(f"{e}I", payload, 4)
    count = 0
    seen = set()
    while off:
        if off in seen:
            raise ValueError("cyclic TIFF IFD chain")
        seen.add(off)
        _tags, off = _read_ifd(payload, off, e)
        count += 1
    return count


def _decompress_seg(seg: bytes, want: int, comp: int, label: str) -> bytes:
    """One strip/tile through the configured codec to exactly
    ``want`` bytes."""
    if comp == _COMP_PACKBITS:
        return packbits_decode(seg, want)
    if comp == _COMP_LZW:
        dec = _lzw_decode_tiff(seg, want)
        if len(dec) != want:
            raise ValueError(f"TIFF LZW {label} decoded short")
        return dec
    if comp in (_COMP_DEFLATE, _COMP_DEFLATE_OLD):
        try:
            dec = zlib.decompress(seg)
        except zlib.error as exc:
            raise ValueError(f"TIFF deflate {label} corrupt: {exc}") from None
        if len(dec) != want:
            raise ValueError(
                f"TIFF deflate {label} decoded {len(dec)} bytes, want {want}"
            )
        return dec
    if len(seg) < want:
        raise ValueError(f"TIFF {label} shorter than its pixels")
    return seg[:want]


def _undiff_rows(seg: bytes, row_w: int, stride: int) -> bytes:
    """Invert TIFF predictor 2 (horizontal differencing, tag 317):
    within each row, sample i is stored as the byte delta from sample
    i-stride (stride = samples per pixel for chunky rows, 1 for planar
    rows); decoding is a per-row cumulative sum mod 256. LZW TIFFs in
    the wild almost always carry this predictor — deltas of smooth
    rasters compress far better than raw bytes."""
    out = bytearray(seg)
    for r0 in range(0, len(out), row_w):
        for i in range(r0 + stride, min(r0 + row_w, len(out))):
            out[i] = (out[i] + out[i - stride]) & 0xFF
    return bytes(out)


def _diff_rows(seg: bytes, row_w: int, stride: int) -> bytes:
    """Apply TIFF predictor 2 (inverse of :func:`_undiff_rows`)."""
    out = bytearray(seg)
    for r0 in range(0, len(seg), row_w):
        for i in range(min(r0 + row_w, len(seg)) - 1, r0 + stride - 1, -1):
            out[i] = (seg[i] - seg[i - stride]) & 0xFF
    return bytes(out)


def decode_tiff(payload: bytes) -> tuple[int, int, bytes]:
    """Decode the FIRST page to ``(width, height, row-major RGB)``.
    Grayscale replicates to RGB (photometric 0 inverts — WhiteIsZero).
    Pixel layouts (round-9 continuation closes the last two
    structural stubs): chunky strips, PLANAR strips (config 2 — one
    plane of strips per channel, plane-major offset order), and TILED
    images (tags 322-325: fixed tw×tl tiles across-then-down, edge
    tiles padded to full size per spec §15, cropped on blit). Each
    strip/tile decompresses independently."""
    e = _endianness(payload)
    (off,) = struct.unpack_from(f"{e}I", payload, 4)
    if not off:
        raise ValueError("TIFF has no IFD")
    tags, _nxt = _read_ifd(payload, off, e)

    def one(tag: int, default: int | None = None) -> int:
        if tag in tags:
            return tags[tag][0]
        if default is None:
            raise ValueError(f"TIFF missing required tag {tag}")
        return default

    w = one(256)
    h = one(257)
    if w <= 0 or h <= 0:
        raise ValueError("non-positive TIFF dimensions")
    spp = one(277, 1)
    bits = tags.get(258, [8])
    if any(b != 8 for b in bits):
        raise NotImplementedError(f"TIFF bits-per-sample {bits} unsupported (8 only)")
    comp = one(259, 1)
    if comp not in (
        _COMP_NONE, _COMP_LZW, _COMP_DEFLATE, _COMP_DEFLATE_OLD, _COMP_PACKBITS
    ):
        raise NotImplementedError(f"TIFF compression {comp} unsupported")
    photo = one(262)
    if photo not in (0, 1, 2):
        raise NotImplementedError(f"TIFF photometric {photo} unsupported")
    if photo == 2 and spp < 3:
        raise ValueError("RGB TIFF with < 3 samples per pixel")
    planar = one(284, 1)
    if planar not in (1, 2):
        raise NotImplementedError(f"TIFF planar configuration {planar} unsupported")
    predictor = one(317, 1)
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor} unsupported")
    tiled = 322 in tags or 323 in tags
    if tiled and planar == 2:
        raise NotImplementedError("tiled planar-2 TIFF unsupported")

    if tiled:
        tw, tl = one(322), one(323)
        if tw <= 0 or tl <= 0:
            raise ValueError("non-positive TIFF tile dimensions")
        offsets = tags.get(324)
        counts = tags.get(325)
        across = (w + tw - 1) // tw
        down = (h + tl - 1) // tl
        if (
            not offsets
            or not counts
            or len(offsets) != len(counts)
            or len(offsets) != across * down
        ):
            raise ValueError("TIFF tile offsets/counts missing or mismatched")
        raw = bytearray(w * h * spp)
        for i, (so, sc) in enumerate(zip(offsets, counts)):
            seg = payload[so : so + sc]
            if len(seg) != sc:
                raise ValueError(f"truncated TIFF tile {i}")
            tile = _decompress_seg(seg, tw * tl * spp, comp, f"tile {i}")
            if predictor == 2:
                tile = _undiff_rows(tile, tw * spp, spp)
            ty, tx = divmod(i, across)
            rows = min(tl, h - ty * tl)
            cols = min(tw, w - tx * tw)
            for y in range(rows):
                src = y * tw * spp
                dst = ((ty * tl + y) * w + tx * tw) * spp
                raw[dst : dst + cols * spp] = tile[src : src + cols * spp]
    elif planar == 2:
        offsets = tags.get(273)
        counts = tags.get(279)
        rps = one(278, h)
        per_plane = (h + rps - 1) // rps
        if (
            not offsets
            or not counts
            or len(offsets) != len(counts)
            or len(offsets) != spp * per_plane
        ):
            raise ValueError(
                "TIFF planar strip offsets/counts missing or mismatched"
            )
        raw = bytearray(w * h * spp)
        for c in range(spp):
            plane = bytearray()
            rows_left = h
            for s in range(per_plane):
                i = c * per_plane + s
                so, sc = offsets[i], counts[i]
                seg = payload[so : so + sc]
                if len(seg) != sc:
                    raise ValueError(f"truncated TIFF strip {i}")
                rows = min(rps, rows_left)
                dec = _decompress_seg(seg, rows * w, comp, f"strip {i}")
                if predictor == 2:
                    dec = _undiff_rows(dec, w, 1)
                plane += dec
                rows_left -= rows
            raw[c :: spp] = plane
    else:
        offsets = tags.get(273)
        counts = tags.get(279)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError("TIFF strip offsets/counts missing or mismatched")
        rps = one(278, h)
        row_bytes = w * spp
        raw = bytearray()
        rows_left = h
        for i, (so, sc) in enumerate(zip(offsets, counts)):
            strip = payload[so : so + sc]
            if len(strip) != sc:
                raise ValueError(f"truncated TIFF strip {i}")
            rows = min(rps, rows_left)
            dec = _decompress_seg(strip, rows * row_bytes, comp, f"strip {i}")
            if predictor == 2:
                dec = _undiff_rows(dec, row_bytes, spp)
            raw += dec
            rows_left -= rows
        if rows_left > 0:
            raise ValueError("TIFF strips cover fewer rows than ImageLength")

    if photo == 2:
        if spp == 3:
            return w, h, bytes(raw)
        # chunky RGBA/extra samples: drop the extras
        out = bytearray(w * h * 3)
        for p in range(w * h):
            out[3 * p : 3 * p + 3] = raw[spp * p : spp * p + 3]
        return w, h, bytes(out)
    # grayscale: photometric 0 = WhiteIsZero inverts
    lut = bytes(255 - v for v in range(256)) if photo == 0 else bytes(range(256))
    out = bytearray(w * h * 3)
    for p in range(w * h):
        v = lut[raw[p * spp]]
        out[3 * p] = out[3 * p + 1] = out[3 * p + 2] = v
    return w, h, bytes(out)


def encode_tiff(
    w: int,
    h: int,
    rgb: bytes,
    *,
    compression: str = "none",
    rows_per_strip: int | None = None,
    big_endian: bool = False,
    n_pages: int = 1,
    tile: "tuple[int, int] | None" = None,
    planar: int = 1,
    predictor: int = 1,
) -> bytes:
    """Serialize row-major RGB as a baseline RGB TIFF (photometric 2)
    in either byte order, with ``n_pages`` identical pages chained
    through the IFD next-pointers (real multi-page structure for
    :func:`tiff_page_count` to walk). Pixel layout (round-9
    continuation): chunky strips (default), PLANAR strips
    (``planar=2`` — per-channel strip planes, plane-major offsets), or
    TILES (``tile=(tw, tl)`` — tags 322-325, edge tiles zero-padded to
    full size per spec §15). Each layout composes with every
    compression. Deterministic bytes for identical input."""
    if len(rgb) != w * h * 3:
        raise ValueError(f"rgb length {len(rgb)} != {w}*{h}*3")
    if n_pages < 1:
        raise ValueError("n_pages must be >= 1")
    if compression not in ("none", "lzw", "deflate", "packbits"):
        raise ValueError(
            f"compression must be 'none', 'lzw', 'deflate' or 'packbits', "
            f"got {compression!r}"
        )
    if planar not in (1, 2):
        raise ValueError(f"planar must be 1 or 2, got {planar}")
    if tile is not None and planar == 2:
        raise ValueError("tiled planar-2 layout unsupported")
    if predictor not in (1, 2):
        raise ValueError(f"predictor must be 1 or 2, got {predictor}")
    e = ">" if big_endian else "<"
    rps = h if rows_per_strip is None else rows_per_strip
    if rps < 1:
        raise ValueError("rows_per_strip must be >= 1")

    def _pack(seg: bytes) -> bytes:
        if compression == "packbits":
            return packbits_encode(seg)
        if compression == "lzw":
            return _lzw_encode_tiff(seg)
        if compression == "deflate":
            # fixed level: zlib output is deterministic for a given
            # (input, level, strategy), which the fixture hashes rely on
            return zlib.compress(seg, 9)
        return seg

    row_bytes = w * 3
    segments: list[bytes] = []
    if tile is not None:
        tw, tl = tile
        if tw < 1 or tl < 1:
            raise ValueError("tile dimensions must be >= 1")
        across = (w + tw - 1) // tw
        down = (h + tl - 1) // tl
        for ty in range(down):
            for tx in range(across):
                buf = bytearray(tw * tl * 3)  # zero-padded edge tiles
                rows = min(tl, h - ty * tl)
                cols = min(tw, w - tx * tw)
                for y in range(rows):
                    src = ((ty * tl + y) * w + tx * tw) * 3
                    buf[y * tw * 3 : y * tw * 3 + cols * 3] = rgb[
                        src : src + cols * 3
                    ]
                seg = bytes(buf)
                if predictor == 2:
                    seg = _diff_rows(seg, tw * 3, 3)
                segments.append(_pack(seg))
    elif planar == 2:
        for c in range(3):
            plane = rgb[c::3]
            for y0 in range(0, h, rps):
                seg = plane[y0 * w : min(y0 + rps, h) * w]
                if predictor == 2:
                    seg = _diff_rows(seg, w, 1)
                segments.append(_pack(seg))
    else:
        for y0 in range(0, h, rps):
            seg = rgb[y0 * row_bytes : min(y0 + rps, h) * row_bytes]
            if predictor == 2:
                seg = _diff_rows(seg, row_bytes, 3)
            segments.append(_pack(seg))
    comp_code = {
        "none": _COMP_NONE, "lzw": _COMP_LZW, "deflate": _COMP_DEFLATE,
        "packbits": _COMP_PACKBITS,
    }[compression]

    out = bytearray()
    out += b"MM\x00*" if big_endian else b"II*\x00"
    out += struct.pack(f"{e}I", 0)  # first-IFD offset patched below

    def entry(tag: int, typ: int, vals: list[int]) -> bytes:
        size = _TYPE_SIZES[typ]
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        total = size * len(vals)
        head = struct.pack(f"{e}HHI", tag, typ, len(vals))
        if total <= 4:
            packed = struct.pack(f"{e}{len(vals)}{fmt}", *vals)
            return head + packed + b"\x00" * (4 - total)
        nonlocal overflow, overflow_off
        head += struct.pack(f"{e}I", overflow_off)
        overflow += struct.pack(f"{e}{len(vals)}{fmt}", *vals)
        overflow_off += total
        return head

    # entry count is layout-dependent and must be known before the
    # first entry is built (overflow values land after the IFD)
    n_entries = (10 if (tile is not None or planar == 2) else 9) + (
        1 if predictor == 2 else 0
    )

    prev_next_ptr = 4  # header's IFD-offset field
    for _page in range(n_pages):
        # pixel segments first, then the IFD referencing them
        seg_offsets = []
        for s in segments:
            seg_offsets.append(len(out))
            out += s
        if len(out) % 2:
            out += b"\x00"  # IFDs must start on a word boundary
        ifd_off = len(out)
        struct.pack_into(f"{e}I", out, prev_next_ptr, ifd_off)

        entries = []
        overflow = b""
        # entries are 12 bytes each; overflow values land right after
        # the IFD's next-pointer
        overflow_off = ifd_off + 2 + 12 * n_entries + 4
        entries.append(entry(256, 4, [w]))
        entries.append(entry(257, 4, [h]))
        entries.append(entry(258, 3, [8, 8, 8]))
        entries.append(entry(259, 3, [comp_code]))
        entries.append(entry(262, 3, [2]))
        if tile is not None:
            entries.append(entry(277, 3, [3]))
            if predictor == 2:
                entries.append(entry(317, 3, [2]))
            entries.append(entry(322, 4, [tile[0]]))
            entries.append(entry(323, 4, [tile[1]]))
            entries.append(entry(324, 4, seg_offsets))
            entries.append(entry(325, 4, [len(s) for s in segments]))
        else:
            entries.append(entry(273, 4, seg_offsets))
            entries.append(entry(277, 3, [3]))
            entries.append(entry(278, 4, [rps]))
            entries.append(entry(279, 4, [len(s) for s in segments]))
            if planar == 2:
                entries.append(entry(284, 3, [2]))
            if predictor == 2:
                entries.append(entry(317, 3, [2]))
        assert len(entries) == n_entries
        out += struct.pack(f"{e}H", len(entries))
        for en in entries:
            out += en
        prev_next_ptr = len(out)
        out += struct.pack(f"{e}I", 0)  # next-IFD, patched by next page
        out += overflow
        if len(out) % 2:
            out += b"\x00"
    return bytes(out)
