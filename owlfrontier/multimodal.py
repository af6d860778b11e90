"""Multimodal binary columns: Spark-side plumbing for image/audio/video
payloads treated as opaque ``BINARY`` columns with typed metadata.

The crawl store already carries one binary modality (``html BINARY`` per
the input_hint); large-scale training pipelines add media blobs with the
same shape. Everything Spark-side here is real and tested — schemas,
Arrow batch flow through ``mapInPandas``, partition-preserving transforms,
deterministic content fingerprints.

Codecs: uncompressed BMP (24/32-bit BI_RGB), PNG (8-bit gray/RGB/RGBA/
palette, all five scanline filters, non-interlaced), GIF (LZW, animation,
interlace, transparency, disposal), baseline AND progressive JPEG
(generic DHT Huffman, multi-scan coefficient accumulation — spectral
selection, DC/AC successive approximation, EOB runs — dequant+IDCT,
4:2:0 upsampling, restart markers),
lossless WebP (VP8L: prefix codes, color cache, meta groups, LZ77 over
the 2D distance map, all four transforms), baseline TIFF (both byte
orders, strips, none/LZW-early-change/PackBits/Deflate, predictor,
gray/RGB/palette/bilevel), PCM WAV and FLAC (RFC 9639: every subframe
type incl. LPC, Rice partitions with escapes, wasted bits, all stereo
decorrelation modes, CRC-8/16) decode for REAL using only the stdlib
(zlib/struct/wave) + numpy — genuine byte→array paths per modality,
pytest-covered.

The scope boundary is principled, not arbitrary: every format above
carries its entropy parameters IN-STREAM (Huffman code lengths, LZ
dictionaries, Rice parameters, LPC coefficients) or derives them
algorithmically, so a spec-faithful codec is buildable offline. Lossy
WebP (VP8) and MP3 sit on the other side — their arithmetic/Huffman
coders require thousands of EMPIRICAL constants that exist only as
tables in the spec documents (RFC 6386 §13.4-13.5; ISO/IEC 11172-3
Annex B), unobtainable in this offline container and unusable if
guessed (one wrong probability desynchronizes the whole arithmetic
decode). Those raise ``NotImplementedError`` unless ``fake=True``,
which substitutes a deterministic content-derived fake (stable across
runs, good enough to exercise every downstream operator). The full
record is in COVERAGE.md "codec scope".
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib

import numpy as np

MEDIA_SCHEMA_DDL = (
    "media_id bigint, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

IMAGE_FEATURES_DDL = (
    "media_id bigint, sha256 string, n_bytes bigint, "
    "thumb_w int, thumb_h int, features array<float>"
)

FRAME_SAMPLE_DDL = "media_id bigint, frame_idx int, frame_sha256 string"


def decode_bmp(payload: bytes) -> np.ndarray:
    """REAL stdlib-only decode of an uncompressed (BI_RGB) 24/32-bit BMP
    to an HxWx3 uint8 RGB array."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (pix_off,) = struct.unpack_from("<I", payload, 10)
    (hdr_size,) = struct.unpack_from("<I", payload, 14)
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER not supported")
    width, height = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"only uncompressed 24/32-bit BMP (got {bpp}bpp, "
                         f"compression {compression})")
    bottom_up = height > 0
    height = abs(height)
    bytes_pp = bpp // 8
    stride = (width * bytes_pp + 3) // 4 * 4
    need = pix_off + stride * height
    if len(payload) < need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * height, offset=pix_off
    ).reshape(height, stride)
    px = rows[:, : width * bytes_pp].reshape(height, width, bytes_pp)
    rgb = px[:, :, 2::-1]  # BGR(A) -> RGB
    if bottom_up:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


def encode_bmp(img: np.ndarray) -> bytes:
    """Minimal 24-bit bottom-up BMP writer (round-trip partner of
    :func:`decode_bmp`; also handy for building test payloads)."""
    h, w = img.shape[:2]
    stride = (w * 3 + 3) // 4 * 4
    pix = np.zeros((h, stride), dtype=np.uint8)
    pix[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # RGB->BGR, bottom-up
    data = pix.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                       2835, 2835, 0, 0)
    return header + info + data


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_png(payload: bytes) -> np.ndarray:
    """REAL stdlib-only PNG decode (zlib inflate + scanline unfiltering)
    to an HxWx3 uint8 RGB array.

    Supported: bit depth 8, color types 0 (gray), 2 (RGB), 3 (palette),
    4 (gray+alpha), 6 (RGBA), filters 0-4, non-interlaced. Alpha is
    dropped (training-feature pipelines key on color content); gray
    replicates to 3 channels."""
    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    width = height = None
    color_type = bit_depth = interlace = None
    palette = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if len(data) < length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8 or interlace != 0:
        raise ValueError(
            f"only 8-bit non-interlaced PNG (depth {bit_depth}, "
            f"interlace {interlace})"
        )
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {color_type}")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) < height * (stride + 1):
        raise ValueError("truncated PNG image data")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.intp)
    bpp = channels
    for y in range(height):
        row_off = y * (stride + 1)
        ftype = raw[row_off]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=row_off + 1
        ).astype(np.intp)
        if ftype == 0:  # None
            recon = line
        elif ftype == 1:  # Sub: per-lane cumulative sum mod 256
            recon = line.copy()
            for lane in range(bpp):
                recon[lane::bpp] = np.cumsum(recon[lane::bpp]) % 256
        elif ftype == 2:  # Up
            recon = (line + prev) % 256
        elif ftype in (3, 4):  # Average / Paeth: left-dependent, scalar
            recon = np.zeros(stride, dtype=np.intp)
            for i in range(stride):
                a = recon[i - bpp] if i >= bpp else 0
                b = prev[i]
                if ftype == 3:
                    recon[i] = (line[i] + (a + b) // 2) % 256
                else:
                    c = prev[i - bpp] if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c
                    )
                    recon[i] = (line[i] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = recon
        prev = recon.astype(np.intp)
    px = out.reshape(height, width, channels)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        return np.ascontiguousarray(palette[px[:, :, 0]])
    if channels == 1:
        return np.repeat(px, 3, axis=2)
    if channels == 2:  # gray+alpha -> replicate gray
        return np.repeat(px[:, :, :1], 3, axis=2)
    return np.ascontiguousarray(px[:, :, :3])  # RGB / RGBA -> RGB


def encode_png(img: np.ndarray) -> bytes:
    """Minimal 8-bit RGB PNG writer (filter 0 scanlines; round-trip partner
    of :func:`decode_png`, also handy for building test payloads)."""
    h, w = img.shape[:2]
    rgb = img[:, :, :3].astype(np.uint8)
    raw = b"".join(b"\x00" + rgb[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


# --- GIF (LZW) — REAL stdlib decode/encode ---------------------------------
#
# GIF87a/89a per the spec: logical screen + global/local color tables,
# LZW-compressed index streams (variable code size 3..12 bits, LSB-first,
# clear/end codes, deferred-clear full-table behavior), 4-pass interlacing,
# GCE transparency, and frame compositing with disposal methods 0/1
# (paint-over), 2 (restore-background) and 3 (restore-previous). The
# encoder exists for fixtures/round-trips and writes real table-building
# LZW; ``clear_trick=True`` writes the degenerate clear-before-every-symbol
# stream instead — a structurally independent encoding used to
# de-correlate encoder and decoder bugs in tests.


def _lzw_decode(data: bytes, min_code: int) -> list[int]:
    clear = 1 << min_code
    end = clear + 1
    code_size = min_code + 1
    stream = int.from_bytes(data, "little")
    nbits = len(data) * 8
    table: list[list[int] | None] = [[i] for i in range(clear)] + [None, None]
    out: list[int] = []
    prev: list[int] | None = None
    bitpos = 0
    while True:
        if bitpos + code_size > nbits:
            break
        code = (stream >> bitpos) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == end:
            break
        if code == clear:
            table = [[i] for i in range(clear)] + [None, None]
            code_size = min_code + 1
            prev = None
            continue
        if prev is None:
            entry = table[code]
            if entry is None:
                raise ValueError("corrupt LZW: first code not literal")
            out.extend(entry)
            prev = entry
            continue
        if code < len(table) and table[code] is not None:
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + [entry[0]])
        elif code == len(table) and len(table) < 4096:
            entry = prev + [prev[0]]
            table.append(entry)
        else:
            raise ValueError("corrupt LZW: code out of range")
        out.extend(entry)
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
    return out


def _lzw_encode(indices, min_code: int, clear_trick: bool = False) -> bytes:
    clear = 1 << min_code
    end = clear + 1
    code_size = min_code + 1
    acc = 0
    accbits = 0
    out = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, accbits
        acc |= code << accbits
        accbits += code_size
        while accbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            accbits -= 8

    emit(clear)
    if clear_trick:
        # clear before every symbol: table never grows, size never bumps
        for i, s in enumerate(indices):
            if i:
                emit(clear)
            emit(int(s))
    else:
        table = {(i,): i for i in range(clear)}
        next_code = end + 1
        prev: tuple = ()
        for s in indices:
            s = int(s)
            cur = prev + (s,)
            if cur in table:
                prev = cur
                continue
            emit(table[prev])
            table[cur] = next_code
            next_code += 1
            if next_code - 1 == (1 << code_size) and code_size < 12:
                # mirror of the decoder's grow point: the entry just added
                # filled the current code space, so the NEXT code is wider
                code_size += 1
            prev = (s,)
            if next_code == 4095:  # conservative reset before the cap
                emit(table[prev])
                emit(clear)
                table = {(i,): i for i in range(clear)}
                next_code = end + 1
                code_size = min_code + 1
                prev = ()
        if prev:
            emit(table[prev])
    emit(end)
    if accbits:
        out.append(acc & 0xFF)
    return bytes(out)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    order: list[int] = []
    for start, step in _GIF_INTERLACE_PASSES:
        order.extend(range(start, h, step))
    out = np.empty_like(idx)
    out[np.array(order, dtype=np.int64)] = idx
    return out


def _interlace_rows(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    order: list[int] = []
    for start, step in _GIF_INTERLACE_PASSES:
        order.extend(range(start, h, step))
    return idx[np.array(order, dtype=np.int64)]


def gif_frames(payload: bytes) -> list[np.ndarray]:
    """REAL stdlib decode: all composited frames of a GIF as HxWx3 uint8
    arrays (animated GIF = the container's video analog)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, flags, bg, _ = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 ** ((flags & 7) + 1)
        gct = np.frombuffer(payload[pos:pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    canvas = np.zeros((h, w, 3), np.uint8)
    if gct is not None and bg < len(gct):
        canvas[:, :] = gct[bg]
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0

    def skip_subblocks(p: int) -> int:
        while payload[p] != 0:
            p += 1 + payload[p]
        return p + 1

    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = payload[pos]
                block = payload[pos + 1:pos + 1 + size]
                disposal = (block[0] >> 2) & 7
                transparent = block[3] if block[0] & 1 else None
                pos = skip_subblocks(pos + 1 + size)
            else:
                pos = skip_subblocks(pos)
            continue
        if b != 0x2C:
            raise ValueError(f"corrupt GIF: unknown block 0x{b:02x}")
        left, top, fw, fh, fflags = struct.unpack(
            "<HHHHB", payload[pos:pos + 9]
        )
        pos += 9
        table = gct
        if fflags & 0x80:
            n = 2 ** ((fflags & 7) + 1)
            table = np.frombuffer(
                payload[pos:pos + 3 * n], np.uint8
            ).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("corrupt GIF: no color table")
        min_code = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos] != 0:
            ln = payload[pos]
            data += payload[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx_list = _lzw_decode(bytes(data), min_code)
        if len(idx_list) < fw * fh:
            raise ValueError("corrupt GIF: short index stream")
        idx = np.array(idx_list[: fw * fh], np.int32).reshape(fh, fw)
        if fflags & 0x40:
            idx = _deinterlace(idx)
        saved = canvas.copy() if disposal == 3 else None
        region = canvas[top:top + fh, left:left + fw]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = table[idx[mask] % len(table)]
        else:
            region[:, :] = table[idx % len(table)]
        frames.append(canvas.copy())
        if disposal == 2:
            canvas[top:top + fh, left:left + fw] = (
                gct[bg] if gct is not None and bg < len(gct) else 0
            )
        elif disposal == 3 and saved is not None:
            canvas = saved
        disposal = 0
        transparent = None
    return frames


def decode_gif(payload: bytes) -> np.ndarray:
    """First composited frame (still-image view of the GIF)."""
    frames = gif_frames(payload)
    if not frames:
        raise ValueError("GIF has no image data")
    return frames[0]


def encode_gif(frames, interlace: bool = False,
               clear_trick: bool = False,
               disposals: list[int] | None = None,
               transparent: int | None = None) -> bytes:
    """Minimal GIF89a encoder (fixtures / export): one global palette
    built from all frames' colors (≤256 distinct), full-canvas frames.
    Exercised against the decoder both with real LZW and with the
    independent ``clear_trick`` stream."""
    frames = [np.asarray(f, np.uint8) for f in frames]
    h, w, _ = frames[0].shape
    colors: dict[tuple, int] = {}
    for f in frames:
        for c in {tuple(px) for px in f.reshape(-1, 3)}:
            colors.setdefault(c, len(colors))
    if len(colors) > 256:
        raise ValueError("encode_gif: >256 distinct colors")
    depth = max(1, (len(colors) - 1).bit_length())
    n = 1 << depth
    palette = bytearray()
    inv = sorted(colors, key=colors.get)
    for c in inv:
        palette += bytes(c)
    palette += b"\x00\x00\x00" * (n - len(inv))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += palette
    for fi, f in enumerate(frames):
        disp = (disposals[fi] if disposals else 0) & 7
        out += bytes([0x21, 0xF9, 4,
                      (disp << 2) | (1 if transparent is not None else 0),
                      0, 0, transparent or 0, 0])
        fflags = 0x40 if interlace else 0
        out += bytes([0x2C]) + struct.pack("<HHHHB", 0, 0, w, h, fflags)
        idx = np.array(
            [[colors[tuple(px)] for px in row] for row in f], np.int32
        )
        if interlace:
            idx = _interlace_rows(idx)
        min_code = max(2, depth)
        out += bytes([min_code])
        data = _lzw_encode(idx.reshape(-1), min_code, clear_trick=clear_trick)
        for i in range(0, len(data), 255):
            chunk = data[i:i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)


# --- JPEG (baseline sequential DCT) — REAL stdlib decode/encode -------------
#
# ITU-T T.81 baseline: SOI/APPn/DQT/SOF0/DHT/DRI/SOS/RSTn/EOI marker parse,
# generic DHT canonical-Huffman tables, DC prediction + AC run-length
# (ZRL/EOB) entropy decode with 0xFF00 byte unstuffing and restart-marker
# DC resets, dequantize + zigzag + orthonormal 8x8 IDCT, per-component
# sampling-factor planes with replication upsampling (4:2:0 etc.), JFIF
# YCbCr->RGB. The decoder is the real-world path (Common Crawl JPEGs carry
# arbitrary DHT/DQT); the encoder exists for fixtures/round-trips and
# writes fixed self-consistent canonical tables (legal JPEG — optimized
# encoders ship custom tables too), optional 4:2:0 subsampling and
# restart intervals, so every decoder branch is exercisable offline.


def _zigzag_order() -> np.ndarray:
    order = []
    for s in range(15):
        rs = range(max(0, s - 7), min(s, 7) + 1)
        for r in (rs if s % 2 == 1 else reversed(list(rs))):
            order.append(r * 8 + (s - r))
    return np.array(order, dtype=np.int64)


_ZIGZAG = _zigzag_order()

# orthonormal 8-point DCT-II matrix: spatial = _DCT_T.T @ coeff @ _DCT_T
_DCT_T = np.array(
    [
        [
            (np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
            * np.cos((2 * n + 1) * k * np.pi / 16)
            for n in range(8)
        ]
        for k in range(8)
    ]
)


def _huff_canonical(bits: list[int], vals: list[int]) -> dict:
    """DHT (BITS, HUFFVAL) → {(length, code): symbol} per T.81 C.2."""
    table = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[i]
            i += 1
            code += 1
        code <<= 1
    return table


class _JpegBits:
    """MSB-first bit reader over one entropy-coded segment (already
    unstuffed)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.buf = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                return 0  # pad reads past the end (spec: fill bits)
            self.buf = self.data[self.pos]
            self.pos += 1
            self.n = 8
        self.n -= 1
        return (self.buf >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("corrupt JPEG: invalid Huffman code")


def _extend(v: int, s: int) -> int:
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def _jpeg_segments(payload: bytes, pos: int) -> tuple[list[bytes], int]:
    """Split one scan's entropy stream at RSTn markers, unstuffing
    0xFF00; stops at the first real marker (EOI/DHT/SOS/...) and also
    returns its position so multi-scan (progressive) parsing can
    continue."""
    segs: list[bytes] = []
    cur = bytearray()
    n = len(payload)
    while pos < n:
        b = payload[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        m = payload[pos + 1] if pos + 1 < n else 0xD9
        if m == 0x00:
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn: segment boundary
            segs.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:  # real marker (EOI, ...) — scan over
            break
    segs.append(bytes(cur))
    return segs, pos


def _jpeg_ac_first(reader, zz, ta_table, ss, se, al, eob_run):
    """AC coefficients, first pass (Ah=0) — also the baseline AC path
    (where Ss..Se is 1..63, Al=0 and only EOB0/ZRL occur). Returns the
    updated EOB run (T.81 G.1.2.2: EOBn spans (1<<r)+bits(r) blocks
    including the current one)."""
    if eob_run > 0:
        return eob_run - 1
    k = ss
    while k <= se:
        rs = reader.huff(ta_table)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            return (1 << r) + reader.bits(r) - 1  # EOBn
        k += r
        if k > se:
            raise ValueError("corrupt JPEG: AC overrun")
        zz[k] = _extend(reader.bits(s), s) << al
        k += 1
    return 0


def _jpeg_ac_refine(reader, zz, ta_table, ss, se, al, eob_run):
    """AC successive-approximation refinement (T.81 G.1.2.3): newly
    visible coefficients arrive as ±(1<<Al); every already-nonzero
    coefficient in the traversed range receives one correction bit."""
    p1 = 1 << al

    def correct(k):
        if reader.bit() and (zz[k] & p1) == 0:
            zz[k] += p1 if zz[k] >= 0 else -p1

    k = ss
    if eob_run == 0:
        while k <= se:
            rs = reader.huff(ta_table)
            r, s = rs >> 4, rs & 15
            newval = 0
            if s == 0:
                if r < 15:
                    eob_run = (1 << r) + reader.bits(r)
                    break
                # ZRL: pass 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("corrupt JPEG: bad refinement size")
                newval = p1 if reader.bit() else -p1
            while k <= se:
                if zz[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                zz[k] = newval
            k += 1
    if eob_run > 0:
        while k <= se:
            if zz[k] != 0:
                correct(k)
            k += 1
        eob_run -= 1
    return eob_run


def decode_jpeg(payload: bytes) -> np.ndarray:
    """REAL stdlib+numpy JPEG decode to HxWx3 uint8 RGB (grayscale
    replicates to 3 channels). Baseline/extended sequential (SOF0/1) and
    PROGRESSIVE (SOF2) per T.81: multi-scan coefficient accumulation —
    spectral selection, DC and AC successive approximation (G.1.2),
    EOB runs, restart markers per scan."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps = None  # list of dicts: id, h, v, tq, bw/bh (full block dims)
    width = height = None
    restart = 0
    coeffs: dict[int, np.ndarray] = {}  # id -> (bh, bw, 64) zigzag coeffs
    by_id: dict[int, dict] = {}
    mcux = mcuy = 0
    saw_scan = False
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("corrupt JPEG: expected marker")
        # T.81 B.1.1.2: a marker may be preceded by any number of 0xFF
        # fill bytes; real-world progressive files pad between scans.
        while pos + 2 <= len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(payload):
            break
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / stray RST
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        seg = payload[pos + 4:pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 15
                o += 1
                if pq == 0:
                    tbl = np.frombuffer(seg, np.uint8, 64, o).astype(np.int32)
                    o += 64
                else:
                    tbl = np.frombuffer(
                        seg, ">u2", 64, o
                    ).astype(np.int32)
                    o += 128
                qt[tq] = tbl
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            _prec, height, width, nc = struct.unpack_from(">BHHB", seg, 0)
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                )
            max_h = max(c["h"] for c in comps)
            max_v = max(c["v"] for c in comps)
            mcux = (width + 8 * max_h - 1) // (8 * max_h)
            mcuy = (height + 8 * max_v - 1) // (8 * max_v)
            for c in comps:
                # full (interleaved) block dims and the non-interleaved
                # dims a single-component scan covers (T.81 A.2.2)
                c["bw"], c["bh"] = mcux * c["h"], mcuy * c["v"]
                cw = -(-width * c["h"] // max_h)
                ch = -(-height * c["v"] // max_v)
                c["nx"], c["ny"] = -(-cw // 8), -(-ch // 8)
                coeffs[c["id"]] = np.zeros((c["bh"], c["bw"], 64), np.int32)
            by_id = {c["id"]: c for c in comps}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline/extended-sequential and progressive JPEG "
                f"(SOF marker 0xff{marker:02x})"
            )
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 15
                bits = list(seg[o + 1:o + 17])
                nv = sum(bits)
                vals = list(seg[o + 17:o + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = _huff_canonical(
                    bits, vals
                )
                o += 17 + nv
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — decode this scan, keep parsing
            if comps is None:
                raise ValueError("corrupt JPEG: SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append((cs, tables >> 4, tables & 15))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 15
            segs, pos = _jpeg_segments(payload, pos + 2 + seglen)
            saw_scan = True

            if ns == 1:  # non-interleaved: one block per unit
                cs, td, ta = scan[0]
                c = by_id[cs]
                units = [
                    [(cs, td, ta, by, bx)]
                    for by in range(c["ny"]) for bx in range(c["nx"])
                ]
            else:  # interleaved MCUs
                units = []
                for mcu in range(mcux * mcuy):
                    my, mx = divmod(mcu, mcux)
                    unit = []
                    for cs, td, ta in scan:
                        c = by_id[cs]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                unit.append((
                                    cs, td, ta,
                                    my * c["v"] + by, mx * c["h"] + bx,
                                ))
                    units.append(unit)

            reader = _JpegBits(segs[0])
            seg_i = 0
            pred = {c["id"]: 0 for c in comps}
            eob_run = 0
            for u_i, unit in enumerate(units):
                if restart and u_i and u_i % restart == 0:
                    seg_i += 1
                    if seg_i >= len(segs):
                        raise ValueError(
                            "corrupt JPEG: missing restart segment"
                        )
                    reader = _JpegBits(segs[seg_i])
                    pred = {c["id"]: 0 for c in comps}
                    eob_run = 0
                for cs, td, ta, by, bx in unit:
                    zz = coeffs[cs][by, bx]
                    if ss == 0:
                        if ah == 0:  # DC first (or baseline full block)
                            s = reader.huff(huff_dc[td])
                            diff = _extend(reader.bits(s), s) if s else 0
                            pred[cs] += diff
                            zz[0] = pred[cs] << al
                        elif reader.bit():  # DC refinement: one bit
                            zz[0] |= 1 << al
                    if se >= max(ss, 1):
                        k0 = max(ss, 1)
                        if ah == 0:
                            eob_run = _jpeg_ac_first(
                                reader, zz, huff_ac[ta], k0, se, al,
                                eob_run,
                            )
                        else:
                            eob_run = _jpeg_ac_refine(
                                reader, zz, huff_ac[ta], k0, se, al,
                                eob_run,
                            )
            continue  # pos already past this scan's entropy data
        pos += 2 + seglen
    if comps is None or not saw_scan or width is None:
        raise ValueError("corrupt JPEG: missing SOF/SOS")

    planes = {}
    for c in comps:
        q = qt[c["tq"]]
        p = np.zeros((c["bh"] * 8, c["bw"] * 8), np.float64)
        arr = coeffs[c["id"]]
        for by in range(c["bh"]):
            for bx in range(c["bw"]):
                zz = arr[by, bx]
                block = np.zeros(64, np.float64)
                block[_ZIGZAG] = zz * q
                p[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = (
                    _DCT_T.T @ block.reshape(8, 8) @ _DCT_T
                ) + 128.0
        planes[c["id"]] = p

    max_h = max(c["h"] for c in comps)
    max_v = max(c["v"] for c in comps)
    full = []
    for c in comps:
        p = planes[c["id"]]
        p = np.repeat(p, max_v // c["v"], axis=0)
        p = np.repeat(p, max_h // c["h"], axis=1)
        full.append(p[:height, :width])
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _fixed_huff_spec(n_sym: int) -> tuple[list[int], list[int]]:
    """Self-consistent canonical table covering symbols 0..n_sym-1: 12
    DC categories fit in 4 bits; the 256 AC (run,size) bytes split 128 at
    8 bits + 128 at 9 bits. The all-ones code stays unused (T.81 C.2)."""
    if n_sym <= 12:
        return [0, 0, 0, 12] + [0] * 12, list(range(12))
    bits = [0] * 16
    bits[7] = 128
    bits[8] = 128
    return bits, list(range(256))


class _JpegBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


def encode_jpeg(img: np.ndarray, lq: int = 1, cq: int = 1,
                subsample: str = "444",
                restart_interval: int = 0) -> bytes:
    """Minimal baseline JPEG encoder (fixtures / round-trips): flat
    quantization tables (lq luma, cq chroma — 1 ≈ near-lossless), fixed
    canonical Huffman tables, optional 4:2:0 chroma subsampling and DRI
    restart markers so every decoder branch has an offline exercise
    path."""
    img = np.asarray(img, np.uint8)
    h, w = img.shape[:2]
    gray = img.ndim == 2 or img.shape[2] == 1
    if gray:
        y = img.reshape(h, w).astype(np.float64)
        planes = [y]
        samp = [(1, 1)]
        qids = [0]
    else:
        rgb = img[:, :, :3].astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample == "420":
            samp = [(2, 2), (1, 1), (1, 1)]
        elif subsample == "444":
            samp = [(1, 1), (1, 1), (1, 1)]
        else:
            raise ValueError("subsample must be '444' or '420'")
        planes = [y, cb, cr]
        qids = [0, 1, 1]
    max_h = max(s[0] for s in samp)
    max_v = max(s[1] for s in samp)
    mcux = (w + 8 * max_h - 1) // (8 * max_h)
    mcuy = (h + 8 * max_v - 1) // (8 * max_v)
    qtabs = [np.full(64, max(1, lq), np.int32),
             np.full(64, max(1, cq), np.int32)]

    # pad each (sub)sampled plane to its MCU grid with edge replication
    padded = []
    for p, (sh, sv) in zip(planes, samp):
        if (sh, sv) != (max_h, max_v):
            fy, fx = max_v // sv, max_h // sh
            ph = (p.shape[0] + fy - 1) // fy * fy
            pw = (p.shape[1] + fx - 1) // fx * fx
            p = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                       mode="edge")
            p = p.reshape(p.shape[0] // fy, fy, p.shape[1] // fx, fx)
            p = p.mean(axis=(1, 3))  # chroma average-downsample
        th_, tw_ = mcuy * 8 * sv, mcux * 8 * sh
        p = np.pad(p, ((0, th_ - p.shape[0]), (0, tw_ - p.shape[1])),
                   mode="edge")
        padded.append(p)

    dc_bits, dc_vals = _fixed_huff_spec(12)
    ac_bits, ac_vals = _fixed_huff_spec(256)
    enc_dc = {
        sym: (length, code)
        for (length, code), sym in _huff_canonical(dc_bits, dc_vals).items()
    }
    enc_ac = {
        sym: (length, code)
        for (length, code), sym in _huff_canonical(ac_bits, ac_vals).items()
    }

    def size_cat(v: int) -> int:
        return int(abs(v)).bit_length()

    wtr = _JpegBitWriter()
    chunks: list[bytes] = []
    pred = [0] * len(planes)
    n_mcus = mcux * mcuy
    for mcu in range(n_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            chunks.append(wtr.flush())
            chunks.append(
                bytes([0xFF, 0xD0 + ((mcu // restart_interval - 1) % 8)])
            )
            wtr = _JpegBitWriter()
            pred = [0] * len(planes)
        my, mx = divmod(mcu, mcux)
        for ci, (p, (sh, sv)) in enumerate(zip(padded, samp)):
            q = qtabs[qids[ci]]
            for by in range(sv):
                for bx in range(sh):
                    y0 = (my * sv + by) * 8
                    x0 = (mx * sh + bx) * 8
                    block = p[y0:y0 + 8, x0:x0 + 8] - 128.0
                    coeff = _DCT_T @ block @ _DCT_T.T
                    zz = np.round(
                        coeff.reshape(64)[_ZIGZAG] / q
                    ).astype(np.int64)
                    diff = int(zz[0]) - pred[ci]
                    pred[ci] = int(zz[0])
                    s = size_cat(diff)
                    ln, code = enc_dc[s]
                    wtr.write(code, ln)
                    if s:
                        wtr.write(
                            diff if diff > 0 else diff + (1 << s) - 1, s
                        )
                    run = 0
                    for k in range(1, 64):
                        v = int(zz[k])
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            ln, code = enc_ac[0xF0]  # ZRL
                            wtr.write(code, ln)
                            run -= 16
                        s = size_cat(v)
                        ln, code = enc_ac[(run << 4) | s]
                        wtr.write(code, ln)
                        wtr.write(v if v > 0 else v + (1 << s) - 1, s)
                        run = 0
                    if run:
                        ln, code = enc_ac[0x00]  # EOB
                        wtr.write(code, ln)
    chunks.append(wtr.flush())
    entropy = b"".join(chunks)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes(qtabs[0].astype(np.uint8)))
    if not gray:
        out += seg(0xDB, bytes([0x01]) + bytes(qtabs[1].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, len(planes))
    for i, (sh, sv) in enumerate(samp):
        sof += bytes([i + 1, (sh << 4) | sv, qids[i]])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(planes)])
    for i in range(len(planes)):
        sos += bytes([i + 1, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_progressive(img: np.ndarray, lq: int = 1, cq: int = 1,
                            dc_al: int = 1) -> bytes:
    """PROGRESSIVE (SOF2) encoder for round-trip tests: DC successive
    approximation (first scan at Al=``dc_al``, then one refinement bit
    per block per level) + spectral-selection AC scans (bands 1-5 and
    6-63 per component, non-interleaved, with real EOBn runs across
    blocks). 4:4:4 / grayscale only — progressive AC scans are
    non-interleaved, and 4:4:4 keeps the per-component block grid equal
    to the MCU grid the decoder derives. Same DCT/quant/tables as
    :func:`encode_jpeg`."""
    img = np.asarray(img, np.uint8)
    h, w = img.shape[:2]
    gray = img.ndim == 2 or img.shape[2] == 1
    if gray:
        planes = [img.reshape(h, w).astype(np.float64)]
        qids = [0]
    else:
        rgb = img[:, :, :3].astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
        qids = [0, 1, 1]
    bx_n, by_n = (w + 7) // 8, (h + 7) // 8
    qtabs = [np.full(64, max(1, lq), np.int32),
             np.full(64, max(1, cq), np.int32)]

    # quantized zigzag coefficients per component, full block grid
    zz_all = []
    for p, qi in zip(planes, qids):
        p = np.pad(p, ((0, by_n * 8 - h), (0, bx_n * 8 - w)), mode="edge")
        q = qtabs[qi]
        arr = np.zeros((by_n, bx_n, 64), np.int64)
        for by in range(by_n):
            for bx in range(bx_n):
                block = p[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
                coeff = _DCT_T @ block @ _DCT_T.T
                arr[by, bx] = np.round(coeff.reshape(64)[_ZIGZAG] / q)
        zz_all.append(arr)

    dc_bits, dc_vals = _fixed_huff_spec(12)
    ac_bits, ac_vals = _fixed_huff_spec(256)
    enc_dc = {
        sym: (length, code)
        for (length, code), sym in _huff_canonical(dc_bits, dc_vals).items()
    }
    enc_ac = {
        sym: (length, code)
        for (length, code), sym in _huff_canonical(ac_bits, ac_vals).items()
    }

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def sos_header(comp_ids, ss, se, ah, al):
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00])
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, body)

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes(qtabs[0].astype(np.uint8)))
    if not gray:
        out += seg(0xDB, bytes([0x01]) + bytes(qtabs[1].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, len(planes))
    for i in range(len(planes)):
        sof += bytes([i + 1, 0x11, qids[i]])  # 1x1 sampling (4:4:4)
    out += seg(0xC2, sof)  # SOF2: progressive
    out += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))

    # scan 1: interleaved DC first at Al=dc_al (floor-shifted diffs)
    wtr = _JpegBitWriter()
    pred = [0] * len(planes)
    for by in range(by_n):
        for bx in range(bx_n):
            for ci, arr in enumerate(zz_all):
                v = int(arr[by, bx, 0]) >> dc_al
                diff = v - pred[ci]
                pred[ci] = v
                s = int(abs(diff)).bit_length()
                ln, code = enc_dc[s]
                wtr.write(code, ln)
                if s:
                    wtr.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    out += sos_header(list(range(1, len(planes) + 1)), 0, 0, 0, dc_al)
    out += wtr.flush()

    # DC refinement scans: one raw bit per block per level
    for al in range(dc_al - 1, -1, -1):
        wtr = _JpegBitWriter()
        for by in range(by_n):
            for bx in range(bx_n):
                for arr in zz_all:
                    wtr.write((int(arr[by, bx, 0]) >> al) & 1, 1)
        out += sos_header(list(range(1, len(planes) + 1)), 0, 0, al + 1, al)
        out += wtr.flush()

    # AC spectral-selection scans per component, with EOBn runs
    for ci, arr in enumerate(zz_all):
        for ss, se in ((1, 5), (6, 63)):
            wtr = _JpegBitWriter()
            eob_run = 0

            def emit_eob_run(wtr, n):
                while n > 0:
                    r = min(14, n.bit_length() - 1)
                    chunk = min(n, (1 << (r + 1)) - 1)
                    ln, code = enc_ac[r << 4]
                    wtr.write(code, ln)
                    wtr.write(chunk - (1 << r), r)
                    n -= chunk
                return 0

            for by in range(by_n):
                for bx in range(bx_n):
                    zz = arr[by, bx]
                    ks = [k for k in range(ss, se + 1) if zz[k] != 0]
                    if not ks:
                        eob_run += 1
                        if eob_run == 32767:
                            eob_run = emit_eob_run(wtr, eob_run)
                        continue
                    eob_run = emit_eob_run(wtr, eob_run)
                    k = ss
                    run = 0
                    while k <= se:
                        v = int(zz[k])
                        if v == 0:
                            run += 1
                            k += 1
                            continue
                        while run > 15:
                            ln, code = enc_ac[0xF0]  # ZRL
                            wtr.write(code, ln)
                            run -= 16
                        s = int(abs(v)).bit_length()
                        ln, code = enc_ac[(run << 4) | s]
                        wtr.write(code, ln)
                        wtr.write(v if v > 0 else v + (1 << s) - 1, s)
                        run = 0
                        k += 1
                    if run:  # trailing zeros: start an EOB run
                        eob_run = 1
            emit_eob_run(wtr, eob_run)
            out += sos_header([ci + 1], ss, se, 0, 0)
            out += wtr.flush()

    out += b"\xff\xd9"
    return bytes(out)


# --- WebP lossless (VP8L) ----------------------------------------------------
# Built from the public "WebP Lossless Bitstream Specification": LSB-first
# bit reader, canonical prefix codes (simple and code-length-coded, with
# repeats and max_symbol), color cache, meta prefix groups, LZ77 over the
# 2D short-distance map, and all four transforms (predictor ×14, color,
# subtract-green, color-indexing incl. pixel bundling). The encoder emits
# a compact VALID subset (literal-only, 8-bit identity codes, optional
# subtract-green / palette) used for round-trip tests plus hand-assembled
# bitstreams decoded independently of it; no external WebP codec exists
# in this container to cross-check real-world files, so interop beyond
# the spec-tested surface is best-effort-per-spec.


class _Vp8lBits:
    """LSB-first bit reader (VP8L convention)."""

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0

    def bit(self) -> int:
        byte = self.d[self.pos >> 3]
        b = (byte >> (self.pos & 7)) & 1
        self.pos += 1
        return b

    def bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            v |= self.bit() << i
        return v


_VP8L_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12,
                   13, 14, 15)


def _vp8l_canonical(lengths: list[int]):
    """Code lengths → decode table {(len, code): sym} (deflate-style
    canonical assignment, MSB-first code bits). A single-symbol code
    decodes with ZERO bits (spec: 'a prefix code with one symbol');
    returned as the bare symbol int."""
    syms = [s for s, ln in enumerate(lengths) if ln > 0]
    if not syms:
        raise ValueError("empty prefix code")
    if len(syms) == 1:
        return syms[0]
    max_len = max(lengths)
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    next_code = [0] * (max_len + 2)
    code = 0
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    table = {}
    for s in range(len(lengths)):
        ln = lengths[s]
        if ln:
            table[(ln, next_code[ln])] = s
            next_code[ln] += 1
    return table


def _vp8l_read_sym(br: _Vp8lBits, code) -> int:
    if isinstance(code, int):
        return code  # single-symbol code: zero bits
    ln, acc = 0, 0
    while True:
        acc = (acc << 1) | br.bit()
        ln += 1
        sym = code.get((ln, acc))
        if sym is not None:
            return sym
        if ln > 15:
            raise ValueError("invalid VP8L prefix code")


def _vp8l_read_code(br: _Vp8lBits, alphabet_size: int):
    if br.bit():  # simple code: 1-2 symbols stored literally
        n = br.bit() + 1
        s0 = br.bits(8) if br.bit() else br.bit()
        if n == 1:
            return s0
        s1 = br.bits(8)
        return {(1, 0): s0, (1, 1): s1}  # code 0 → first-read symbol
    num_clc = 4 + br.bits(4)
    cl_lengths = [0] * 19
    for i in range(num_clc):
        cl_lengths[_VP8L_CLC_ORDER[i]] = br.bits(3)
    cl_code = _vp8l_canonical(cl_lengths)
    if br.bit():  # bounded number of length symbols to read
        length_nbits = 2 + 2 * br.bits(3)
        max_read = 2 + br.bits(length_nbits)
    else:
        max_read = alphabet_size
    lengths = [0] * alphabet_size
    prev, i = 8, 0
    while i < alphabet_size and max_read > 0:
        max_read -= 1
        cl = _vp8l_read_sym(br, cl_code)
        if cl < 16:
            lengths[i] = cl
            i += 1
            if cl:
                prev = cl
        elif cl == 16:
            for _ in range(3 + br.bits(2)):
                if i < alphabet_size:
                    lengths[i] = prev
                    i += 1
        elif cl == 17:
            i += 3 + br.bits(3)
        else:
            i += 11 + br.bits(7)
    return _vp8l_canonical(lengths)


def _vp8l_dist_map() -> list[tuple[int, int]]:
    """The 120-entry 2D short-distance map: the nearest (x, y) offsets
    ordered by squared distance, larger y first on ties, positive x
    before negative (the spec's published ordering)."""
    cand = []
    for y in range(8):
        for x in range(-8, 9):
            if y == 0 and x <= 0:
                continue
            cand.append((x * x + y * y, -y, 0 if x > 0 else 1, abs(x), x, y))
    cand.sort()
    return [(c[4], c[5]) for c in cand[:120]]


_VP8L_DIST_MAP = _vp8l_dist_map()


def _vp8l_prefix_val(br: _Vp8lBits, sym: int) -> int:
    if sym < 4:
        return sym + 1
    eb = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << eb
    return offset + br.bits(eb) + 1


def _vp8l_read_image(br: _Vp8lBits, w: int, h: int,
                     allow_meta: bool) -> list[int]:
    """Entropy-coded ARGB image → flat list of w*h uint32 pixels
    (row-major). Handles color cache, meta prefix groups (main image
    only), literals, LZ77 backward references, and cache hits."""
    cache_bits = br.bits(4) if br.bit() else 0
    cache = [0] * (1 << cache_bits) if cache_bits else None
    group_idx, hbits, hw = None, 0, 0
    n_groups = 1
    if allow_meta and br.bit():
        hbits = 2 + br.bits(3)
        hw = (w + (1 << hbits) - 1) >> hbits
        hh = (h + (1 << hbits) - 1) >> hbits
        meta = _vp8l_read_image(br, hw, hh, False)
        group_idx = [(p >> 8) & 0xFFFF for p in meta]
        n_groups = max(group_idx) + 1
    green_size = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        groups.append((
            _vp8l_read_code(br, green_size),
            _vp8l_read_code(br, 256),   # red
            _vp8l_read_code(br, 256),   # blue
            _vp8l_read_code(br, 256),   # alpha
            _vp8l_read_code(br, 40),    # distance
        ))
    out = [0] * (w * h)
    pos = 0
    mask = (1 << 32) - 1
    while pos < w * h:
        if group_idx is not None:
            x, y = pos % w, pos // w
            gi = group_idx[(y >> hbits) * hw + (x >> hbits)]
        else:
            gi = 0
        gcode, rcode, bcode, acode, dcode = groups[gi]
        s = _vp8l_read_sym(br, gcode)
        if s < 256:  # literal: G already read, then R, B, A
            red = _vp8l_read_sym(br, rcode)
            blue = _vp8l_read_sym(br, bcode)
            alpha = _vp8l_read_sym(br, acode)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            pos += 1
            if cache is not None:
                cache[((0x1E35A7BD * px) & mask) >> (32 - cache_bits)] = px
        elif s < 280:  # LZ77 backward reference
            length = _vp8l_prefix_val(br, s - 256)
            dist_code = _vp8l_prefix_val(br, _vp8l_read_sym(br, dcode))
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _VP8L_DIST_MAP[dist_code - 1]
                dist = max(1, dx + dy * w)
            if dist > pos:
                raise ValueError(
                    "corrupt VP8L: backward reference before start")
            for _ in range(length):
                px = out[pos - dist]
                out[pos] = px
                pos += 1
                if cache is not None:
                    cache[((0x1E35A7BD * px) & mask) >> (32 - cache_bits)] = px
        else:  # color-cache hit
            out[pos] = cache[s - 280]
            pos += 1
    return out


def _vp8l_avg2(a: int, b: int) -> int:
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _vp8l_clamp_add_sub_full(l: int, t: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        v = ((l >> sh) & 255) + ((t >> sh) & 255) - ((tl >> sh) & 255)
        out |= max(0, min(255, v)) << sh
    return out


def _vp8l_clamp_add_sub_half(ave: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        a = (ave >> sh) & 255
        b = (tl >> sh) & 255
        v = a + int((a - b) / 2)  # C-style truncation toward zero
        out |= max(0, min(255, v)) << sh
    return out


def _vp8l_select(l: int, t: int, tl: int) -> int:
    p_l = p_t = 0
    for sh in (24, 16, 8, 0):
        lc, tc, tlc = (l >> sh) & 255, (t >> sh) & 255, (tl >> sh) & 255
        p = lc + tc - tlc
        p_l += abs(p - lc)
        p_t += abs(p - tc)
    return l if p_l < p_t else t


def _vp8l_predict(mode: int, l: int, t: int, tl: int, tr: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _vp8l_avg2(_vp8l_avg2(l, tr), t)
    if mode == 6:
        return _vp8l_avg2(l, tl)
    if mode == 7:
        return _vp8l_avg2(l, t)
    if mode == 8:
        return _vp8l_avg2(tl, t)
    if mode == 9:
        return _vp8l_avg2(t, tr)
    if mode == 10:
        return _vp8l_avg2(_vp8l_avg2(l, tl), _vp8l_avg2(t, tr))
    if mode == 11:
        return _vp8l_select(l, t, tl)
    if mode == 12:
        return _vp8l_clamp_add_sub_full(l, t, tl)
    return _vp8l_clamp_add_sub_half(_vp8l_avg2(l, t), tl)


def _vp8l_add_pixels(px: int, pred: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        out |= ((((px >> sh) & 255) + ((pred >> sh) & 255)) & 255) << sh
    return out


def _vp8l_delta_int8(t: int, c: int) -> int:
    ts = t - 256 if t > 127 else t
    cs = c - 256 if c > 127 else c
    return (ts * cs) >> 5


def decode_webp(payload: bytes) -> np.ndarray:
    """REAL stdlib-only decode of a LOSSLESS WebP (VP8L) to HxWx3 uint8
    RGB. Lossy (VP8) and extended (VP8X) files raise with a clear
    message — those need the DCT/extended-feature codecs this container
    does not have."""
    if len(payload) < 20 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    pos = 12
    while pos + 8 <= len(payload):
        tag = payload[pos:pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        data = payload[pos + 8:pos + 8 + size]
        if tag == b"VP8L":
            return _decode_vp8l(data)
        if tag in (b"VP8 ", b"VP8X"):
            raise NotImplementedError(
                "only lossless WebP (VP8L) decodes natively; lossy VP8 "
                "needs the ~2100 empirical probability tables of RFC 6386 "
                "§13.4-13.5/§11.4, which exist only in the spec document "
                "and are unobtainable offline (COVERAGE.md codec scope)"
            )
        pos += 8 + size + (size & 1)
    raise ValueError("no VP8L chunk in WebP container")


def _decode_vp8l(data: bytes) -> np.ndarray:
    if not data or data[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    br = _Vp8lBits(data[1:])
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bit()  # alpha-used hint
    if br.bits(3) != 0:
        raise ValueError("unsupported VP8L version")

    # transforms, in stream order; color-indexing narrows the coded width
    transforms = []
    eff_w = w
    while br.bit():
        ttype = br.bits(2)
        if ttype in (0, 1):  # PREDICTOR / COLOR: per-block sub-image
            bits = 2 + br.bits(3)
            bw = (eff_w + (1 << bits) - 1) >> bits
            bh = (h + (1 << bits) - 1) >> bits
            sub = _vp8l_read_image(br, bw, bh, False)
            transforms.append(("pred" if ttype == 0 else "color",
                               bits, sub, bw))
        elif ttype == 2:
            transforms.append(("subg",))
        else:  # COLOR_INDEXING: palette + optional pixel bundling
            n_colors = br.bits(8) + 1
            pal_deltas = _vp8l_read_image(br, n_colors, 1, False)
            palette, acc = [], 0
            for d in pal_deltas:
                acc = _vp8l_add_pixels(d, acc)
                palette.append(acc)
            width_bits = (3 if n_colors <= 2 else 2 if n_colors <= 4
                          else 1 if n_colors <= 16 else 0)
            transforms.append(("palette", palette, width_bits, eff_w))
            eff_w = (eff_w + (1 << width_bits) - 1) >> width_bits

    pix = _vp8l_read_image(br, eff_w, h, True)
    cur_w = eff_w

    for tr in reversed(transforms):
        if tr[0] == "palette":
            _, palette, width_bits, orig_w = tr
            if width_bits:
                per = 1 << width_bits
                ibits = 8 >> width_bits
                imask = (1 << ibits) - 1
                wide = []
                for y in range(h):
                    row = pix[y * cur_w:(y + 1) * cur_w]
                    for x in range(orig_w):
                        g = (row[x >> width_bits] >> 8) & 255
                        idx = (g >> ((x % per) * ibits)) & imask
                        wide.append(palette[idx] if idx < len(palette) else 0)
                pix = wide
            else:
                pix = [
                    palette[(p >> 8) & 255]
                    if ((p >> 8) & 255) < len(palette) else 0
                    for p in pix
                ]
            cur_w = orig_w
        elif tr[0] == "subg":
            out = []
            for p in pix:
                g = (p >> 8) & 255
                r = (((p >> 16) & 255) + g) & 255
                b = ((p & 255) + g) & 255
                out.append((p & 0xFF00FF00) | (r << 16) | b)
            pix = out
        elif tr[0] == "color":
            _, bits, sub, bw = tr
            out = list(pix)
            for pos in range(len(out)):
                x, y = pos % cur_w, pos // cur_w
                cte = sub[(y >> bits) * bw + (x >> bits)]
                g2r, g2b, r2b = cte & 255, (cte >> 8) & 255, (cte >> 16) & 255
                p = out[pos]
                g = (p >> 8) & 255
                r = (((p >> 16) & 255) + _vp8l_delta_int8(g2r, g)) & 255
                b = ((p & 255) + _vp8l_delta_int8(g2b, g)
                     + _vp8l_delta_int8(r2b, r)) & 255
                out[pos] = (p & 0xFF00FF00) | (r << 16) | b
            pix = out
        else:  # predictor
            _, bits, sub, bw = tr
            out = list(pix)
            for pos in range(len(out)):
                x, y = pos % cur_w, pos // cur_w
                if x == 0 and y == 0:
                    pred = 0xFF000000
                elif y == 0:
                    pred = out[pos - 1]          # left
                elif x == 0:
                    pred = out[pos - cur_w]      # top
                else:
                    mode = (sub[(y >> bits) * bw + (x >> bits)] >> 8) & 255
                    pred = _vp8l_predict(
                        mode, out[pos - 1], out[pos - cur_w],
                        out[pos - cur_w - 1], out[pos - cur_w + 1],
                    )
                out[pos] = _vp8l_add_pixels(out[pos], pred)
            pix = out

    arr = np.array(pix, dtype=np.uint32).reshape(h, w)
    rgb = np.empty((h, w, 3), dtype=np.uint8)
    rgb[..., 0] = (arr >> 16) & 255
    rgb[..., 1] = (arr >> 8) & 255
    rgb[..., 2] = arr & 255
    return rgb


class _Vp8lWriter:
    """LSB-first bit writer; prefix-code bits go MSB-first."""

    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.n = 0

    def _push(self, bit: int) -> None:
        self.cur |= bit << self.n
        self.n += 1
        if self.n == 8:
            self.out.append(self.cur)
            self.cur = 0
            self.n = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits):
            self._push((value >> i) & 1)

    def write_code(self, code: int, length: int) -> None:
        for i in reversed(range(length)):
            self._push((code >> i) & 1)

    def flush(self) -> bytes:
        if self.n:
            self.out.append(self.cur)
            self.cur = 0
            self.n = 0
        return bytes(self.out)


def _w_identity_code(bw: _Vp8lWriter) -> None:
    """Normal prefix code: symbols 0..255 all length 8 (a complete 8-bit
    code whose canonical codeword for s IS s). The code-length code has
    the single symbol '8' (zero-bit reads), and max_symbol=256 bounds
    the reads, so the 256 length entries cost zero stream bits."""
    bw.write(0, 1)   # not simple
    bw.write(14 - 4, 4)  # read 14 code-length-code lengths (covers sym 8)
    for s in _VP8L_CLC_ORDER[:14]:
        bw.write(1 if s == 8 else 0, 3)
    bw.write(1, 1)   # use max_symbol
    bw.write(3, 3)   # length_nbits = 2 + 2*3 = 8
    bw.write(254, 8)  # max_symbol = 2 + 254 = 256
    # 256 zero-bit reads of '8' follow — nothing to write


def _w_simple1(bw: _Vp8lWriter, sym: int) -> None:
    """Simple prefix code with ONE symbol — all reads cost zero bits."""
    bw.write(1, 1)  # simple
    bw.write(0, 1)  # one symbol
    if sym >= 2:
        bw.write(1, 1)
        bw.write(sym, 8)
    else:
        bw.write(0, 1)
        bw.write(sym, 1)


def _w_literal_image(bw: _Vp8lWriter, pixels: list[int],
                     channels: str = "grb", main: bool = False) -> None:
    """Entropy-coded image, literal-only: no cache, no meta, identity
    codes for the channels that vary and zero-bit codes elsewhere.
    ``channels``: 'grb' = all three vary (alpha fixed 255);
    'g' = green-only payload (palette indices), r=b=0. The cache bit
    precedes the meta-prefix bit (main image only) per the spec's
    stream order."""
    bw.write(0, 1)  # no color cache
    if main:
        bw.write(0, 1)  # no meta prefix codes
    _w_identity_code(bw)  # green (alphabet 280; lengths end at 256)
    if channels == "grb":
        _w_identity_code(bw)  # red
        _w_identity_code(bw)  # blue
    else:
        _w_simple1(bw, 0)     # red
        _w_simple1(bw, 0)     # blue
    _w_simple1(bw, 255)       # alpha
    _w_simple1(bw, 0)         # distance
    for px in pixels:
        bw.write_code((px >> 8) & 255, 8)   # green
        if channels == "grb":
            bw.write_code((px >> 16) & 255, 8)  # red
            bw.write_code(px & 255, 8)          # blue


def encode_webp_lossless(img: np.ndarray, subtract_green: bool = False,
                         palette: bool = False) -> bytes:
    """Minimal VALID lossless WebP encoder for round-trip tests: literal
    pixels under complete 8-bit identity codes (≈3 bytes/pixel — valid,
    not compact), optionally behind a SUBTRACT_GREEN transform or a
    COLOR_INDEXING palette (with pixel bundling when ≤16 colors)."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[0], img.shape[1]
    bw = _Vp8lWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # no alpha
    bw.write(0, 3)  # version

    if palette:
        flat = img.reshape(-1, 3)
        colors, inverse = np.unique(flat, axis=0, return_inverse=True)
        if len(colors) > 256:
            raise ValueError("palette encode needs <= 256 colors")
        bw.write(1, 1)
        bw.write(3, 2)  # COLOR_INDEXING
        bw.write(len(colors) - 1, 8)
        pal_px = [
            0xFF000000 | (int(c[0]) << 16) | (int(c[1]) << 8) | int(c[2])
            for c in colors
        ]
        deltas, prev = [], 0
        for p in pal_px:
            deltas.append(
                sum(((((p >> sh) & 255) - ((prev >> sh) & 255)) & 255) << sh
                    for sh in (24, 16, 8, 0))
            )
            prev = p
        _w_literal_image(bw, deltas, channels="grb")
        bw.write(0, 1)  # end of transforms
        n = len(colors)
        width_bits = 3 if n <= 2 else 2 if n <= 4 else 1 if n <= 16 else 0
        per = 1 << width_bits
        ibits = 8 >> width_bits
        eff_w = (w + per - 1) // per
        idx = inverse.reshape(h, w)
        packed = []
        for y in range(h):
            for bx in range(eff_w):
                g = 0
                for k in range(per):
                    x = bx * per + k
                    if x < w:
                        g |= int(idx[y, x]) << (k * ibits)
                packed.append(0xFF000000 | (g << 8))
        _w_literal_image(bw, packed, channels="g", main=True)
    else:
        r = img[..., 0].astype(np.int16)
        g = img[..., 1].astype(np.int16)
        b = img[..., 2].astype(np.int16)
        if subtract_green:
            bw.write(1, 1)
            bw.write(2, 2)  # SUBTRACT_GREEN
            r = (r - g) & 255
            b = (b - g) & 255
        bw.write(0, 1)  # end of transforms
        pixels = [
            0xFF000000 | (int(rr) << 16) | (int(gg) << 8) | int(bb)
            for rr, gg, bb in zip(
                r.reshape(-1), g.reshape(-1), b.reshape(-1)
            )
        ]
        _w_literal_image(bw, pixels, channels="grb", main=True)

    stream = b"\x2f" + bw.flush()
    chunk = b"VP8L" + struct.pack("<I", len(stream)) + stream
    if len(stream) & 1:
        chunk += b"\x00"
    riff_size = 4 + len(chunk)
    return b"RIFF" + struct.pack("<I", riff_size) + b"WEBP" + chunk


# ---------------------------------------------------------------------------
# TIFF (baseline, TIFF 6.0). Like every format implemented in this module
# — and unlike lossy WebP/VP8 or MP3 (see COVERAGE.md "codec scope") —
# baseline TIFF carries no spec-tabulated entropy constants: its codings
# (none / PackBits / LZW / Deflate) are fully algorithmic, so a
# spec-faithful decoder is buildable offline from stdlib + numpy.


class _MsbBits:
    """MSB-first bit reader (TIFF-LZW code stream, FLAC frames)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos  # next byte to load
        self.acc = 0
        self.n = 0

    def bits(self, k: int) -> int:
        while self.n < k:
            if self.pos >= len(self.data):
                raise ValueError("truncated bitstream")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.n += 8
        self.n -= k
        v = (self.acc >> self.n) & ((1 << k) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def sbits(self, k: int) -> int:
        if k == 0:
            return 0
        v = self.bits(k)
        return v - (1 << k) if v >> (k - 1) else v

    def unary(self) -> int:
        q = 0
        while self.bits(1) == 0:
            q += 1
        return q

    def byte_pos(self) -> int:
        """Index of the next unread byte; valid only when byte-aligned."""
        if self.n % 8:
            raise ValueError("bit reader not byte-aligned")
        return self.pos - self.n // 8


class _MsbWriter:
    """MSB-first bit writer (TIFF-LZW, FLAC)."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, v: int, k: int) -> None:
        self.acc = (self.acc << k) | (v & ((1 << k) - 1))
        self.n += k
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def align(self) -> None:
        if self.n:
            self.bits(0, 8 - self.n)

    def getvalue(self) -> bytes:
        self.align()
        return bytes(self.buf)


def _tiff_lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF-variant LZW (TIFF 6.0 §13): MSB-first code packing, codes grow
    9→12 bits with the EARLY code-width change (at next_code 511/1023/
    2047 — one code earlier than GIF's LSB-first late-change LZW, which
    lives separately in the GIF section)."""
    CLEAR, EOI = 256, 257
    br = _MsbBits(data)
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    next_code = 258
    prev: int | None = None
    out = bytearray()
    while len(out) < expected:
        try:
            code = br.bits(width)
        except ValueError:
            raise ValueError("truncated TIFF LZW stream")
        if code == CLEAR:
            del table[258:]
            width = 9
            next_code = 258
            prev = None
            continue
        if code == EOI:
            break
        if prev is None:
            if code >= 256:
                raise ValueError("corrupt TIFF LZW: first code not literal")
            entry = table[code]
        elif code < next_code:
            entry = table[code]
            table.append(table[prev] + entry[:1])
            next_code += 1
        elif code == next_code:
            entry = table[prev] + table[prev][:1]
            table.append(entry)
            next_code += 1
        else:
            raise ValueError("corrupt TIFF LZW: code beyond table")
        if next_code >= 4096:
            raise ValueError("corrupt TIFF LZW: table overflow without clear")
        if next_code == (1 << width) - 1 and width < 12:
            width += 1  # early change
        out += entry
        prev = code
    return bytes(out[:expected])


def _tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW encoder (tests/fixtures): early change mirrored,
    CLEAR emitted before the 12-bit table fills (libtiff's behavior)."""
    CLEAR, EOI = 256, 257
    bw = _MsbWriter()
    width = 9
    bw.bits(CLEAR, width)
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    prefix = b""
    for b in data:
        cand = prefix + bytes([b])
        if cand in table:
            prefix = cand
            continue
        bw.bits(table[prefix], width)
        table[cand] = next_code
        next_code += 1
        # the decoder's table lags one insert behind, so it bumps at
        # 2^w - 1 (the TIFF early change); the encoder bumps one later
        if next_code == (1 << width) and width < 12:
            width += 1
        prefix = bytes([b])
        if next_code >= 4094:  # reset before overflow
            bw.bits(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            width = 9
            next_code = 258
    if prefix:
        bw.bits(table[prefix], width)
    bw.bits(EOI, width)
    return bw.getvalue()


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while len(out) < expected:
        if i >= len(data):
            raise ValueError("truncated PackBits stream")
        n = data[i]
        i += 1
        if n < 128:
            out += data[i:i + n + 1]
            i += n + 1
        elif n > 128:
            if i >= len(data):
                raise ValueError("truncated PackBits run")
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    return bytes(out[:expected])


def _packbits_encode(row: bytes) -> bytes:
    """Per-row PackBits (TIFF 6.0 §9 packs each row separately)."""
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        run = 1
        while i + run < n and run < 128 and row[i + run] == row[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, row[i]])
            i += run
            continue
        lit_start = i
        i += 1
        while (
            i < n and i - lit_start < 128
            and not (i + 1 < n and row[i + 1] == row[i])
        ):
            i += 1
        out += bytes([i - lit_start - 1]) + row[lit_start:i]
    return bytes(out)


def decode_tiff(payload: bytes) -> np.ndarray:
    """REAL stdlib-only decode of a baseline TIFF (TIFF 6.0) to HxWx3
    uint8 RGB: both byte orders, strip organization, compressions 1
    (none) / 5 (LZW, early change) / 32773 (PackBits) / 8+32946
    (Deflate), horizontal-differencing predictor, photometric 0/1
    (grayscale, 1- or 8-bit) / 2 (RGB, 8-bit, alpha dropped) / 3
    (palette, 16-bit colormap). Tiled layout, planar config 2 and the
    CCITT fax codings (whose code words ARE spec-tabulated) raise."""
    if len(payload) < 8 or payload[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF payload")
    endian = "<" if payload[:2] == b"II" else ">"
    (magic,) = struct.unpack_from(endian + "H", payload, 2)
    if magic != 42:
        raise ValueError("bad TIFF magic")
    (ifd_off,) = struct.unpack_from(endian + "I", payload, 4)
    if ifd_off + 2 > len(payload):
        raise ValueError("truncated TIFF IFD")
    (n_entries,) = struct.unpack_from(endian + "H", payload, ifd_off)
    type_size = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}
    type_fmt = {1: "B", 3: "H", 4: "I"}
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        off = ifd_off + 2 + 12 * i
        if off + 12 > len(payload):
            raise ValueError("truncated TIFF IFD entry")
        tag, ftype, count = struct.unpack_from(endian + "HHI", payload, off)
        if ftype not in type_size:
            continue  # unknown field type: spec says skip
        nbytes = type_size[ftype] * count
        voff = off + 8 if nbytes <= 4 else struct.unpack_from(
            endian + "I", payload, off + 8
        )[0]
        if ftype in type_fmt:
            tags[tag] = list(struct.unpack_from(
                endian + str(count) + type_fmt[ftype], payload, voff
            ))
        elif ftype == 5:  # rational: store numerators (unused)
            tags[tag] = [
                struct.unpack_from(endian + "II", payload, voff + 8 * j)[0]
                for j in range(count)
            ]

    def one(tag: int, default: int | None = None) -> int:
        if tag in tags:
            return tags[tag][0]
        if default is None:
            raise ValueError(f"TIFF missing required tag {tag}")
        return default

    if 322 in tags or 323 in tags or 324 in tags:
        raise ValueError("tiled TIFF not supported (strips only)")
    width = one(256)
    height = one(257)
    comp = one(259, 1)
    photo = one(262)
    spp = one(277, 1)
    planar = one(284, 1)
    predictor = one(317, 1)
    bits = tags.get(258, [1] * spp)
    if planar != 1:
        raise ValueError("planar TIFF (PlanarConfiguration=2) not supported")
    if comp in (2, 3, 4):
        raise ValueError(
            "CCITT-coded TIFF not supported: the fax code words are "
            "spec-tabulated constants (see COVERAGE.md codec scope)"
        )
    if comp not in (1, 5, 8, 32946, 32773):
        raise ValueError(f"unsupported TIFF compression {comp}")
    if len(set(bits)) != 1:
        raise ValueError("heterogeneous TIFF BitsPerSample not supported")
    depth = bits[0]
    if depth not in (1, 8) or (depth == 1 and spp != 1):
        raise ValueError("only 1-bit bilevel and 8-bit TIFF supported")
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF missing strip offsets/byte counts")
    rows_per_strip = one(278, height)
    row_bytes = (width * spp * depth + 7) // 8
    raw = bytearray()
    for si, (so, sc) in enumerate(zip(offsets, counts)):
        strip = bytes(payload[so:so + sc])
        if len(strip) != sc:
            raise ValueError("truncated TIFF strip")
        nrows = min(rows_per_strip, height - si * rows_per_strip)
        expected = row_bytes * nrows
        if comp == 1:
            if len(strip) < expected:
                raise ValueError("short uncompressed TIFF strip")
            raw += strip[:expected]
        elif comp == 5:
            raw += _tiff_lzw_decode(strip, expected)
        elif comp in (8, 32946):
            raw += zlib.decompress(strip)[:expected]
        else:
            raw += _packbits_decode(strip, expected)
    if len(raw) < row_bytes * height:
        raise ValueError("TIFF strips do not cover the image")
    if depth == 1:
        rows = np.frombuffer(raw, np.uint8).reshape(height, row_bytes)
        px = np.unpackbits(rows, axis=1)[:, :width] * np.uint8(255)
        if photo == 0:
            px = 255 - px
        return np.ascontiguousarray(
            np.repeat(px[:, :, None], 3, axis=2).astype(np.uint8)
        )
    px = np.frombuffer(raw, np.uint8).reshape(height, width, spp)
    if predictor == 2:
        px = (px.astype(np.int64).cumsum(axis=1) % 256).astype(np.uint8)
    elif predictor != 1:
        raise ValueError(f"unsupported TIFF predictor {predictor}")
    if photo == 2:
        if spp < 3:
            raise ValueError("RGB TIFF needs >=3 samples per pixel")
        return np.ascontiguousarray(px[:, :, :3])
    if photo == 3:
        cmap = tags.get(320)
        if not cmap or len(cmap) < 3 * 256:
            raise ValueError("palette TIFF missing ColorMap")
        n = len(cmap) // 3
        lut = (np.array(cmap, np.uint32).reshape(3, n).T >> 8).astype(np.uint8)
        return np.ascontiguousarray(lut[px[:, :, 0]])
    if photo in (0, 1):
        g = px[:, :, 0]
        if photo == 0:
            g = 255 - g
        return np.ascontiguousarray(np.repeat(g[:, :, None], 3, axis=2))
    raise ValueError(f"unsupported TIFF photometric {photo}")


def encode_tiff(
    img: np.ndarray,
    compression: str = "none",
    predictor: int = 1,
    big_endian: bool = False,
    rows_per_strip: int | None = None,
) -> bytes:
    """Minimal baseline-TIFF encoder (tests/fixtures): 8-bit grayscale
    (2-D input) or RGB (HxWx3), compression none/lzw/packbits/deflate,
    optional horizontal-differencing predictor, either byte order,
    multi-strip when ``rows_per_strip`` is set."""
    if img.ndim == 2:
        spp, photo = 1, 1
        px = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] == 3:
        spp, photo = 3, 2
        px = img
    else:
        raise ValueError("encode_tiff wants HxW gray or HxWx3 RGB uint8")
    h, w = px.shape[:2]
    e = ">" if big_endian else "<"
    data = px.astype(np.uint8)
    if predictor == 2:
        d = data.astype(np.int16)
        d[:, 1:] = d[:, 1:] - d[:, :-1]
        data = (d % 256).astype(np.uint8)
    elif predictor != 1:
        raise ValueError("predictor must be 1 or 2")
    rps = rows_per_strip or h
    comp_code = {"none": 1, "lzw": 5, "packbits": 32773, "deflate": 8}[
        compression
    ]
    strips = []
    for y0 in range(0, h, rps):
        chunk = data[y0:y0 + rps]
        rawrows = [chunk[y].tobytes() for y in range(chunk.shape[0])]
        if compression == "none":
            strips.append(b"".join(rawrows))
        elif compression == "lzw":
            strips.append(_tiff_lzw_encode(b"".join(rawrows)))
        elif compression == "deflate":
            strips.append(zlib.compress(b"".join(rawrows)))
        else:
            strips.append(b"".join(_packbits_encode(r) for r in rawrows))

    entries = []  # (tag, type, count, packed-or-values)

    def short(tag, *vals):
        entries.append((tag, 3, len(vals), list(vals)))

    def long_(tag, *vals):
        entries.append((tag, 4, len(vals), list(vals)))

    short(256, w)
    short(257, h)
    short(258, *([8] * spp))
    short(259, comp_code)
    short(262, photo)
    long_(273, *([0] * len(strips)))  # offsets patched below
    short(277, spp)
    short(278, rps)
    long_(279, *[len(s) for s in strips])
    if predictor == 2:
        short(317, predictor)
    entries.sort(key=lambda t: t[0])

    header = struct.pack(e + "2sHI", b"MM" if big_endian else b"II", 42, 8)
    ifd_size = 2 + 12 * len(entries) + 4
    # layout: header | IFD | overflow values | strips
    overflow_off = 8 + ifd_size
    overflow = bytearray()
    packed = []
    tsize = {3: 2, 4: 4}
    tfmt = {3: "H", 4: "I"}
    for tag, ftype, count, vals in entries:
        nbytes = tsize[ftype] * count
        if nbytes <= 4:
            vbytes = struct.pack(e + str(count) + tfmt[ftype], *vals)
            packed.append([tag, ftype, count, vbytes.ljust(4, b"\0"), None])
        else:
            packed.append([tag, ftype, count, overflow_off + len(overflow),
                           vals])
            overflow += struct.pack(e + str(count) + tfmt[ftype], *vals)
    strip_base = overflow_off + len(overflow)
    strip_offsets = []
    acc = strip_base
    for s in strips:
        strip_offsets.append(acc)
        acc += len(s)
    out = bytearray(header)
    out += struct.pack(e + "H", len(entries))
    for tag, ftype, count, val, vals in packed:
        out += struct.pack(e + "HHI", tag, ftype, count)
        if vals is None:
            if tag == 273 and count == 1:
                out += struct.pack(e + "I", strip_offsets[0])
            else:
                out += val
        else:
            out += struct.pack(e + "I", val)
    out += struct.pack(e + "I", 0)  # next-IFD pointer
    out += overflow
    # strip offsets were packed as zeros; patch them now that layout is fixed
    for tag, ftype, count, val, vals in packed:
        if tag == 273 and vals is not None:
            struct.pack_into(e + str(count) + "I", out, val, *strip_offsets)
    for s in strips:
        out += s
    return bytes(out)


# ---------------------------------------------------------------------------
# FLAC (RFC 9639 / xiph.org spec). Fully self-describing lossless audio:
# Rice/Golomb residual coding with in-stream parameters, LPC coefficients
# carried per-subframe, CRC-8/16 with fixed known polynomials — no
# spec-tabulated entropy constants anywhere, so (unlike MP3, see
# COVERAGE.md codec scope) a spec-faithful decoder is buildable offline.


def _crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    tbl = []
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) if r & top else (r << 1)
        tbl.append(r & mask)
    return tbl


_FLAC_CRC8 = _crc_table(0x07, 8)      # x^8 + x^2 + x + 1
_FLAC_CRC16 = _crc_table(0x8005, 16)  # x^16 + x^15 + x^2 + 1


def _crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r = _FLAC_CRC8[r ^ b]
    return r


def _crc16(data: bytes) -> int:
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFF) ^ _FLAC_CRC16[(r >> 8) ^ b]
    return r


_FLAC_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
               6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
               11: 96000}


def _flac_coded_number(br: _MsbBits) -> int:
    """The frame header's UTF-8-style coded frame/sample number (extended
    to 36 bits / 7 bytes)."""
    b0 = br.bits(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n == 0 or n > 6:
        raise ValueError("corrupt FLAC coded number")
    v = b0 & (mask - 1)
    for _ in range(n):
        c = br.bits(8)
        if c >> 6 != 0b10:
            raise ValueError("corrupt FLAC coded-number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _flac_residual(br: _MsbBits, bs: int, order: int) -> np.ndarray:
    method = br.bits(2)
    if method > 1:
        raise ValueError("reserved FLAC residual coding method")
    plen = 4 if method == 0 else 5
    esc = (1 << plen) - 1
    porder = br.bits(4)
    nparts = 1 << porder
    if bs % nparts:
        raise ValueError("FLAC partition order does not divide blocksize")
    out = np.empty(bs - order, np.int64)
    idx = 0
    for p in range(nparts):
        count = bs // nparts - (order if p == 0 else 0)
        if count < 0:
            raise ValueError("FLAC partition order larger than first partition")
        param = br.bits(plen)
        if param == esc:
            nbits = br.bits(5)
            vals = [br.sbits(nbits) for _ in range(count)]
        else:
            vals = []
            for _ in range(count):
                q = br.unary()
                u = (q << param) | (br.bits(param) if param else 0)
                vals.append((u >> 1) ^ -(u & 1))
        out[idx:idx + count] = vals
        idx += count
    return out


def _flac_integrate(res: np.ndarray, warm: list[int]) -> np.ndarray:
    """Undo an order-n fixed predictor: the residual is the nth difference,
    so reconstruct by n cumulative sums seeded from the warm-up samples."""
    order = len(warm)
    w = np.array(warm, np.int64)
    if order == 0:
        return res.copy()
    inits = []
    d = w.copy()
    for _ in range(order):
        inits.append(int(d[-1]))
        d = np.diff(d)
    seq = res
    for k in range(order - 1, -1, -1):
        seq = inits[k] + np.cumsum(seq)
    return np.concatenate([w, seq])


def _flac_subframe(br: _MsbBits, bs: int, bps: int) -> np.ndarray:
    if br.bits(1):
        raise ValueError("FLAC subframe pad bit set")
    t = br.bits(6)
    wasted = 0
    if br.bits(1):
        wasted = br.unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("FLAC wasted bits exceed sample size")
    if t == 0:  # CONSTANT
        out = np.full(bs, br.sbits(eff), np.int64)
    elif t == 1:  # VERBATIM
        out = np.array([br.sbits(eff) for _ in range(bs)], np.int64)
    elif 8 <= t <= 12:  # FIXED, order 0-4
        order = t & 7
        if order > bs:
            raise ValueError("FLAC fixed order exceeds blocksize")
        warm = [br.sbits(eff) for _ in range(order)]
        out = _flac_integrate(_flac_residual(br, bs, order), warm)
    elif t >= 32:  # LPC, order 1-32
        order = (t & 31) + 1
        if order > bs:
            raise ValueError("FLAC LPC order exceeds blocksize")
        warm = [br.sbits(eff) for _ in range(order)]
        prec = br.bits(4)
        if prec == 15:
            raise ValueError("invalid FLAC LPC precision")
        prec += 1
        shift = br.sbits(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [br.sbits(prec) for _ in range(order)]
        res = _flac_residual(br, bs, order)
        out = np.empty(bs, np.int64)
        out[:order] = warm
        o = out.tolist()  # IIR recurrence: sequential by nature
        for i in range(order, bs):
            acc = 0
            for j, c in enumerate(coefs):
                acc += c * o[i - 1 - j]
            o[i] = int(res[i - order]) + (acc >> shift)
        out = np.array(o, np.int64)
    else:
        raise ValueError(f"reserved FLAC subframe type {t}")
    return out << wasted


def _flac_frame(data: bytes, pos: int, sr0: int, ch0: int, bps0: int):
    br = _MsbBits(data, pos)
    if br.bits(14) != 0x3FFE:
        raise ValueError("bad FLAC frame sync")
    if br.bits(1):
        raise ValueError("FLAC frame reserved bit set")
    br.bits(1)  # blocking strategy (fixed/variable) — number unused here
    bs_code = br.bits(4)
    sr_code = br.bits(4)
    ch_code = br.bits(4)
    ss_code = br.bits(3)
    if br.bits(1):
        raise ValueError("FLAC frame reserved bit set")
    _flac_coded_number(br)
    if bs_code == 0:
        raise ValueError("reserved FLAC blocksize code")
    elif bs_code == 1:
        bs = 192
    elif bs_code <= 5:
        bs = 576 << (bs_code - 2)
    elif bs_code == 6:
        bs = br.bits(8) + 1
    elif bs_code == 7:
        bs = br.bits(16) + 1
    else:
        bs = 256 << (bs_code - 8)
    if sr_code == 0:
        sr = sr0
    elif sr_code <= 11:
        sr = _FLAC_RATES[sr_code]
    elif sr_code == 12:
        sr = br.bits(8) * 1000
    elif sr_code == 13:
        sr = br.bits(16)
    elif sr_code == 14:
        sr = br.bits(16) * 10
    else:
        raise ValueError("invalid FLAC sample-rate code")
    ss_map = {0: bps0, 1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
    if ss_code not in ss_map:
        raise ValueError("reserved FLAC sample-size code")
    bps = ss_map[ss_code]
    if ch_code < 8:
        nch, mode = ch_code + 1, "indep"
    elif ch_code == 8:
        nch, mode = 2, "ls"   # left/side
    elif ch_code == 9:
        nch, mode = 2, "rs"   # right/side
    elif ch_code == 10:
        nch, mode = 2, "ms"   # mid/side
    else:
        raise ValueError("reserved FLAC channel assignment")
    hdr_end = br.byte_pos()
    if _crc8(data[pos:hdr_end]) != br.bits(8):
        raise ValueError("FLAC frame header CRC-8 mismatch")
    chans = []
    for c in range(nch):
        extra = 1 if ((mode == "ls" and c == 1) or (mode == "rs" and c == 0)
                      or (mode == "ms" and c == 1)) else 0
        chans.append(_flac_subframe(br, bs, bps + extra))
    if mode == "ls":
        left, side = chans
        chans = [left, left - side]
    elif mode == "rs":
        side, right = chans
        chans = [side + right, right]
    elif mode == "ms":
        mid, side = chans
        m = (mid << 1) | (side & 1)
        chans = [(m + side) >> 1, (m - side) >> 1]
    pad = br.n % 8
    if pad and br.bits(pad) != 0:
        raise ValueError("nonzero FLAC frame padding")
    end = br.byte_pos()
    if _crc16(data[pos:end]) != br.bits(16):
        raise ValueError("FLAC frame CRC-16 mismatch")
    return np.stack(chans, axis=1), bps, sr, end + 2


def decode_flac_pcm(payload: bytes):
    """REAL stdlib+numpy decode of a FLAC stream → ``(samples, rate,
    bits)`` with ``samples`` int32 of shape (n, channels). Every subframe
    type (constant / verbatim / fixed 0-4 / LPC 1-32), Rice partitions
    with escapes, wasted bits, all four stereo decorrelation modes, and
    both frame CRCs are implemented per the public spec (RFC 9639)."""
    if len(payload) < 8 or payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    info = None
    last = False
    while not last:
        if pos + 4 > len(payload):
            raise ValueError("truncated FLAC metadata header")
        hdr = payload[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        blen = int.from_bytes(payload[pos + 1:pos + 4], "big")
        body = payload[pos + 4:pos + 4 + blen]
        if len(body) != blen:
            raise ValueError("truncated FLAC metadata block")
        if btype == 0:
            if blen != 34:
                raise ValueError("bad FLAC STREAMINFO size")
            packed = int.from_bytes(body[10:18], "big")
            sr = packed >> 44
            nch = ((packed >> 41) & 0x7) + 1
            bps = ((packed >> 36) & 0x1F) + 1
            total = packed & ((1 << 36) - 1)
            info = (sr, nch, bps, total)
        elif btype == 127:
            raise ValueError("invalid FLAC metadata type 127")
        pos += 4 + blen
    if info is None:
        raise ValueError("FLAC stream missing STREAMINFO")
    sr0, ch0, bps0, total = info
    chunks = []
    rate, bits = sr0, bps0
    while pos < len(payload):
        frame, bits, rate, pos = _flac_frame(payload, pos, sr0, ch0, bps0)
        chunks.append(frame)
    if chunks:
        samples = np.concatenate(chunks).astype(np.int32)
    else:
        samples = np.zeros((0, ch0), np.int32)
    if total and len(samples) != total:
        raise ValueError("FLAC frame samples disagree with STREAMINFO total")
    return samples, rate, bits


def decode_flac(payload: bytes) -> np.ndarray:
    """FLAC → mono float32 in [-1, 1), the :func:`decode_wav` contract
    (channels averaged; scaled by 2^(bits-1))."""
    samples, _rate, bits = decode_flac_pcm(payload)
    mono = samples.astype(np.float32).mean(axis=1)
    return (mono / np.float32(1 << (bits - 1))).astype(np.float32)


def _flac_write_coded(bw: _MsbWriter, v: int) -> None:
    if v < 0x80:
        bw.bits(v, 8)
        return
    # n continuation bytes carry 6n bits; the lead byte carries 6-n more
    n = 1
    while v >= (1 << (5 * n + 6)) and n < 6:
        n += 1
    lead_payload = 6 - n
    bw.bits((0xFF << (lead_payload + 1)) & 0xFF
            | (v >> (6 * n)) & ((1 << lead_payload) - 1), 8)
    for i in range(n - 1, -1, -1):
        bw.bits(0b10 << 6 | ((v >> (6 * i)) & 0x3F), 8)


def _flac_rice_cost(res: np.ndarray, param: int) -> int:
    u = (np.abs(res) << 1) - (res < 0)
    return int(np.sum(u >> param)) + len(res) * (param + 1)


def encode_flac(
    samples: np.ndarray,
    sample_rate: int = 8000,
    bps: int = 16,
    blocksize: int = 4096,
    stereo_mode: str = "indep",
) -> bytes:
    """Minimal FLAC encoder (tests/fixtures): fixed predictors 0-2 with
    one-partition Rice residuals (verbatim fallback), explicit blocksize
    headers, optional mid/left/right-side stereo, real CRC-8/16.
    ``samples`` is int of shape (n,) or (n, channels)."""
    s = np.asarray(samples, np.int64)
    if s.ndim == 1:
        s = s[:, None]
    n, nch = s.shape
    lim = 1 << (bps - 1)
    if s.min() < -lim or s.max() >= lim:
        raise ValueError("samples exceed bits-per-sample range")
    if stereo_mode != "indep" and nch != 2:
        raise ValueError("side stereo needs exactly 2 channels")

    out = bytearray(b"fLaC")
    streaminfo = bytearray()
    streaminfo += struct.pack(">HH", blocksize, blocksize)
    streaminfo += b"\x00\x00\x00" * 2  # min/max frame size unknown
    packed = (sample_rate << 44) | ((nch - 1) << 41) | ((bps - 1) << 36) | n
    streaminfo += packed.to_bytes(8, "big")
    streaminfo += b"\x00" * 16  # MD5 unset (spec: 0 = unknown)
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo

    ss_codes = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}
    if bps not in ss_codes:
        raise ValueError("unsupported bits-per-sample")
    ch_code = {"indep": nch - 1, "ls": 8, "rs": 9, "ms": 10}[stereo_mode]

    def subframe(bw: _MsbWriter, x: np.ndarray, sbps: int) -> None:
        best = None
        for order in (0, 1, 2):
            if order >= len(x):
                break
            res = x.copy()
            for _ in range(order):
                res = np.diff(res)
            # Rice parameter by direct cost search
            mean = max(1.0, float(np.abs(res).mean()))
            guess = max(0, int(mean).bit_length() - 1)
            cands = {max(0, guess - 1), guess, guess + 1, guess + 2}
            for p in cands:
                if p > 30:
                    continue
                cost = _flac_rice_cost(res, p) + order * sbps
                if best is None or cost < best[0]:
                    best = (cost, order, p, res)
        verbatim_cost = len(x) * sbps
        bw.bits(0, 1)  # pad
        if best is not None and best[0] < verbatim_cost and len(x) > 2:
            _cost, order, p, res = best
            bw.bits(8 + order, 6)  # FIXED
            bw.bits(0, 1)  # no wasted bits
            for v in x[:order]:
                bw.bits(int(v), sbps)
            bw.bits(0, 2)   # 4-bit Rice method
            bw.bits(0, 4)   # partition order 0
            if p >= 15:
                bw.bits(15, 4)  # escape: raw signed residuals
                need = min(31, max(
                    (int(np.abs(res).max()) if len(res) else 0)
                    .bit_length() + 1, 1))
                bw.bits(need, 5)
                for v in res:
                    bw.bits(int(v), need)
            else:
                bw.bits(p, 4)
                for v in res:
                    u = (int(abs(v)) << 1) - (1 if v < 0 else 0)
                    q = u >> p
                    bw.bits(1, q + 1)  # q zeros then a one
                    if p:
                        bw.bits(u & ((1 << p) - 1), p)
        else:
            bw.bits(1, 6)  # VERBATIM
            bw.bits(0, 1)
            for v in x:
                bw.bits(int(v), sbps)

    frame_idx = 0
    for start in range(0, max(n, 1), blocksize):
        block = s[start:start + blocksize]
        bs = len(block)
        if bs == 0:
            break
        bw = _MsbWriter()
        bw.bits(0x3FFE, 14)
        bw.bits(0, 1)
        bw.bits(0, 1)  # fixed blocking strategy
        bw.bits(7, 4)  # explicit 16-bit blocksize-1 follows
        bw.bits(13, 4)  # explicit 16-bit sample rate in Hz follows
        bw.bits(ch_code, 4)
        bw.bits(ss_codes[bps], 3)
        bw.bits(0, 1)
        _flac_write_coded(bw, frame_idx)
        bw.bits(bs - 1, 16)
        bw.bits(sample_rate, 16)
        # header fields are byte-aligned here; CRC-8 covers them all
        bw.bits(_crc8(bytes(bw.buf)), 8)
        if stereo_mode == "indep":
            chans = [(block[:, c], bps) for c in range(nch)]
        elif stereo_mode == "ls":
            chans = [(block[:, 0], bps), (block[:, 0] - block[:, 1], bps + 1)]
        elif stereo_mode == "rs":
            chans = [(block[:, 0] - block[:, 1], bps + 1), (block[:, 1], bps)]
        else:  # ms
            side = block[:, 0] - block[:, 1]
            mid = (block[:, 0] + block[:, 1]) >> 1
            chans = [(mid, bps), (side, bps + 1)]
        for x, sbps in chans:
            subframe(bw, x, sbps)
        bw.align()
        body = bw.getvalue()
        out += body + struct.pack(">H", _crc16(body))
        frame_idx += 1
    return bytes(out)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to an HxWx3 uint8 array.

    BMP, PNG, GIF, baseline+progressive JPEG, lossless WebP (VP8L) and
    baseline TIFF decode for REAL (stdlib struct/zlib + numpy).
    Remaining formats (lossy WebP/AVIF/...) depend on spec-tabulated
    entropy constants unreachable in this container (see COVERAGE.md
    codec scope): for those, ``fake=True`` produces a deterministic
    8x8x3 array derived from the payload digest — stable,
    collision-resistant, and shaped like the real thing for downstream
    plumbing."""
    if payload and payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload and payload.startswith(_PNG_SIG):
        return decode_png(payload)
    if payload and payload[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(payload)
    if payload and payload[:2] == b"\xff\xd8":
        return decode_jpeg(payload)
    if payload and payload[:4] in (b"II*\x00", b"MM\x00*"):
        return decode_tiff(payload)
    if payload and payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        try:
            return decode_webp(payload)
        except NotImplementedError:
            if not fake:
                raise
    if not fake:
        raise NotImplementedError(
            "only BMP, PNG, GIF, baseline+progressive JPEG, lossless WebP "
            "and baseline TIFF decode natively; other image codecs are not "
            "available in this environment — pass fake=True for the "
            "deterministic stand-in"
        )
    digest = hashlib.sha256(payload or b"").digest()
    rng = np.frombuffer((digest * 6)[: 8 * 8 * 3], dtype=np.uint8)
    return rng.reshape(8, 8, 3).copy()


def decode_wav(payload: bytes) -> np.ndarray:
    """REAL stdlib decode of PCM WAV to mono float32 in [-1, 1) (16-bit
    and 8-bit PCM; channels averaged to mono)."""
    samples, _rate, bits = decode_wav_pcm(payload)
    mono = samples.astype(np.float32).mean(axis=1)
    return (mono / np.float32(1 << (bits - 1))).astype(np.float32)


def decode_wav_pcm(payload: bytes):
    """PCM WAV → ``(samples, rate, bits)`` with ``samples`` int32 of shape
    (n, channels) — the integer-exact twin of :func:`decode_wav`, shared
    with :func:`decode_flac_pcm` so the audio content manifest can hash
    bit-exact PCM across container formats."""
    with wave.open(io.BytesIO(payload)) as w:
        n_ch = w.getnchannels()
        width = w.getsampwidth()
        rate = w.getframerate()
        frames = w.readframes(w.getnframes())
    if width == 2:
        samples = np.frombuffer(frames, dtype="<i2").astype(np.int32)
        bits = 16
    elif width == 1:
        samples = np.frombuffer(frames, dtype=np.uint8).astype(np.int32) - 128
        bits = 8
    else:
        raise ValueError(f"unsupported PCM sample width {width}")
    return samples.reshape(-1, n_ch), rate, bits


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """16-bit PCM WAV writer (tests/fixtures); ``samples`` int of shape
    (n,) or (n, channels), interleaved on disk."""
    s = np.asarray(samples, np.int64)
    if s.ndim == 1:
        s = s[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(s.shape[1])
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(s.astype("<i2").tobytes())
    return buf.getvalue()


def decode_audio(payload: bytes, fake: bool = False) -> np.ndarray:
    """PCM WAV and FLAC decode for REAL (stdlib ``wave``; the RFC 9639
    decoder above); other formats as :func:`decode_image` — fake yields
    1024 deterministic float32 samples."""
    if payload and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav(payload)
    if payload and payload[:4] == b"fLaC":
        return decode_flac(payload)
    if not fake:
        raise NotImplementedError(
            "only PCM WAV and FLAC decode natively; other audio codecs "
            "(MP3/AAC/...: spec-tabulated entropy constants, see "
            "COVERAGE.md codec scope) are not available in this "
            "environment — pass fake=True for the deterministic stand-in"
        )
    digest = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer((digest * 128)[: 1024 * 4], dtype=np.uint32)
    return (raw.astype(np.float32) / np.float32(2**32)) - np.float32(0.5)


def resize(img: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbor resize — pure numpy, deterministic."""
    ys = (np.arange(h) * img.shape[0] // h).clip(0, img.shape[0] - 1)
    xs = (np.arange(w) * img.shape[1] // w).clip(0, img.shape[1] - 1)
    return img[ys][:, xs]


def synthetic_media_payload(media_id: int) -> bytes:
    """Deterministic mixed-format image payload for ``media_id``: an 8×8
    RGB image derived from sha256(media_id), containered by
    ``media_id % 6`` — BMP (0), PNG (1), GIF ≤256-color-quantized (2),
    baseline JPEG (3), lossless WebP (4), TIFF-LZW+predictor (5).

    The ONE definition shared by ``q_multimodal_features`` and
    ``q_multimodal_manifest`` (round-5 review): the manifest's DuckDB
    oracle reconstructs these exact pixels arithmetically from the
    doc_id recipe, so the two queries must exercise the identical
    corpus — a constant drifting in one copy but not the other would
    silently decouple the rows-only pipeline from its oracle-paired
    half."""
    import hashlib

    digest = hashlib.sha256(str(int(media_id)).encode()).digest()
    img = np.frombuffer((digest * 6)[: 8 * 8 * 3], dtype=np.uint8).reshape(
        8, 8, 3
    )
    m = int(media_id) % 6
    if m == 0:
        return encode_bmp(img)
    if m == 1:
        return encode_png(img)
    if m == 2:
        # GIF needs ≤256 colors: quantize to the high 3 bits
        return encode_gif([(img >> 5) << 5])
    if m == 3:
        return encode_jpeg(img)
    if m == 4:
        return encode_webp_lossless(img)
    return encode_tiff(img, compression="lzw", predictor=2)


def image_feature_pipeline(df, thumb: tuple[int, int] = (4, 4), fake: bool = True):
    """media DataFrame → per-image features via ``mapInPandas`` (Arrow
    batches; one Python worker pass, no per-row JVM round-trips).

    Real parts: batch iteration, schema, column pruning (only media_id +
    payload cross the boundary), feature layout. Stub part: the decode."""
    import pandas as pd

    tw, th = thumb

    def _batches(it):
        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                img = decode_image(data, fake=fake)
                small = resize(img, tw, th)
                feats = (small.astype(np.float32) / np.float32(255.0)).ravel()
                out.append(
                    {
                        "media_id": mid,
                        "sha256": hashlib.sha256(data).hexdigest(),
                        "n_bytes": len(data),
                        "thumb_w": tw,
                        "thumb_h": th,
                        "features": feats.tolist(),
                    }
                )
            yield pd.DataFrame.from_records(out)

    return df.select("media_id", "payload").mapInPandas(
        _batches, IMAGE_FEATURES_DDL
    )


MANIFEST_DDL = ("media_id bigint, mime string, width int, height int, "
                "rgb_sha256 string")


def sniff_mime(data: bytes) -> str:
    """Container-format routing from magic bytes — the manifest's mime is
    derived from the PAYLOAD, so an oracle that derives it from the id
    routing cross-checks that the right encoder actually ran."""
    if data[:2] == b"BM":
        return "image/bmp"
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "image/png"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "image/gif"
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return "image/webp"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "audio/wav"
    if data[:2] == b"\xff\xd8":
        return "image/jpeg"
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        return "image/tiff"
    if data[:4] == b"fLaC":
        return "audio/flac"
    return "application/octet-stream"


def image_content_manifest(df):
    """Pixel-level content manifest over a mixed-format media column:
    mime sniffed from payload magic, dimensions and a CONTENT hash from
    the real decode (``mapInPandas``, Arrow batches). ``rgb_sha256`` is
    sha256 over the lowercase-hex serialization of the decoded RGB bytes
    (hex because the DuckDB oracle's sha256() is VARCHAR-only); hashing
    decoded pixels rather than payload bytes is what makes exact
    pixel-dedup work ACROSS container formats — a BMP and a PNG of the
    same image share one rgb_sha256."""
    import pandas as pd

    def _batches(it):
        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                img = decode_image(data, fake=False)
                h, w = img.shape[:2]
                out.append({
                    "media_id": mid,
                    "mime": sniff_mime(data),
                    "width": w,
                    "height": h,
                    "rgb_sha256": hashlib.sha256(
                        img.tobytes().hex().encode()
                    ).hexdigest(),
                })
            yield pd.DataFrame.from_records(out)

    return df.select("media_id", "payload").mapInPandas(
        _batches, MANIFEST_DDL
    )


AUDIO_MANIFEST_DDL = ("media_id bigint, mime string, n_samples int, "
                      "channels int, pcm_sha256 string")


def audio_content_manifest(df):
    """PCM-level content manifest over a mixed-format audio column (the
    audio twin of :func:`image_content_manifest`): mime sniffed from
    payload magic, sample/channel counts and a CONTENT hash from the real
    decode (``mapInPandas``, Arrow batches). ``pcm_sha256`` is sha256
    over the lowercase-hex serialization of the interleaved little-endian
    int16 PCM — hashing decoded samples rather than payload bytes makes
    exact audio dedup work ACROSS containers: a WAV and a FLAC of the
    same recording share one pcm_sha256 (FLAC is lossless)."""
    import pandas as pd

    def _batches(it):
        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                if data[:4] == b"fLaC":
                    samples, _rate, bits = decode_flac_pcm(data)
                else:
                    samples, _rate, bits = decode_wav_pcm(data)
                if bits != 16:
                    raise ValueError("audio manifest expects 16-bit PCM")
                pcm = samples.astype("<i2").tobytes()
                out.append({
                    "media_id": mid,
                    "mime": sniff_mime(data),
                    "n_samples": samples.shape[0],
                    "channels": samples.shape[1],
                    "pcm_sha256": hashlib.sha256(
                        pcm.hex().encode()
                    ).hexdigest(),
                })
            yield pd.DataFrame.from_records(out)

    return df.select("media_id", "payload").mapInPandas(
        _batches, AUDIO_MANIFEST_DDL
    )


def frame_sample_pipeline(df, every_n: int = 4, n_frames: int = 3, fake: bool = True):
    """Video frame sampling: one input row fans out to ≤ ``n_frames``
    output rows inside ``mapInPandas``. Animated GIF payloads (the
    container's video analog) sample REAL composited frames — every
    ``every_n``-th frame, hashed from the decoded RGB bytes; other
    payloads use the deterministic digest stand-in when ``fake=True``
    (real video codecs aren't in this container)."""
    import pandas as pd

    def _batches(it):
        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                if data[:6] in (b"GIF87a", b"GIF89a"):
                    frames = gif_frames(data)
                    for j in range(n_frames):
                        idx = j * every_n
                        if idx >= len(frames):
                            break
                        h = hashlib.sha256(frames[idx].tobytes()).hexdigest()
                        out.append({"media_id": mid, "frame_idx": idx,
                                    "frame_sha256": h})
                    continue
                if not fake:
                    raise NotImplementedError(
                        "only GIF frame extraction is native; pass "
                        "fake=True for the digest stand-in"
                    )
                for j in range(n_frames):
                    idx = j * every_n
                    h = hashlib.sha256(data + idx.to_bytes(4, "big")).hexdigest()
                    out.append(
                        {"media_id": mid, "frame_idx": idx, "frame_sha256": h}
                    )
            yield pd.DataFrame.from_records(out)

    return df.select("media_id", "payload").mapInPandas(
        _batches, FRAME_SAMPLE_DDL
    )
