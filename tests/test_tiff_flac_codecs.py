"""Baseline-TIFF (TIFF 6.0) and FLAC (RFC 9639) codec coverage.

The bar matches the JPEG/VP8L codec tests: beyond encoder↔decoder
round-trips, every decoder gets at least one bitstream assembled by hand
(or by a test-local spec model written independently of the module
encoders) so a matched encoder/decoder bug cannot hide. TIFF streams are
built with a test-local IFD writer; FLAC frames bit by bit per RFC 9639
section 9, with CRCs from a test-local bitwise implementation.
"""

import struct
import zlib

import numpy as np
import pytest

from owlfrontier.multimodal import (
    _MsbWriter,
    decode_flac,
    decode_flac_pcm,
    decode_tiff,
    decode_wav_pcm,
    encode_flac,
    encode_tiff,
    encode_wav,
    sniff_mime,
)


# ---------------------------------------------------------------------------
# TIFF round-trips (encoder ↔ decoder)


@pytest.mark.parametrize("compression", ["none", "packbits", "lzw", "deflate"])
@pytest.mark.parametrize("predictor", [1, 2])
@pytest.mark.parametrize("big_endian", [False, True])
def test_tiff_roundtrip_rgb(compression, predictor, big_endian):
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (13, 9, 3), dtype=np.uint8)
    payload = encode_tiff(
        img, compression=compression, predictor=predictor,
        big_endian=big_endian,
    )
    assert sniff_mime(payload) == "image/tiff"
    assert np.array_equal(decode_tiff(payload), img)


def test_tiff_roundtrip_gray_multistrip():
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (17, 6), dtype=np.uint8)
    for comp in ("none", "packbits", "lzw", "deflate"):
        payload = encode_tiff(img, compression=comp, rows_per_strip=4)
        out = decode_tiff(payload)
        assert np.array_equal(out, np.repeat(img[:, :, None], 3, axis=2))


def test_tiff_lzw_predictor_compresses_gradient():
    """Horizontal predictor turns a smooth gradient into tiny residuals;
    LZW on the differenced rows must beat the uncompressed size."""
    x = np.arange(64, dtype=np.uint8)
    img = np.repeat(x[None, :], 32, axis=0)
    img = np.repeat(img[:, :, None], 3, axis=2)
    plain = encode_tiff(img, compression="none")
    packed = encode_tiff(img, compression="lzw", predictor=2)
    assert np.array_equal(decode_tiff(packed), img)
    assert len(packed) < len(plain) // 3


# ---------------------------------------------------------------------------
# TIFF hand-assembled streams (decoder correctness independent of the
# module encoder). `_ifd` is a test-local writer, little-endian only.


def _ifd(entries, strips, extra=b""):
    """Build header | IFD | overflow | extra | strips. `entries` is a list
    of (tag, ftype, values); strip offset/count tags are appended here."""
    e = "<"
    tfmt = {3: "H", 4: "I"}
    tsize = {3: 2, 4: 4}
    all_entries = sorted(
        entries
        + [(273, 4, [0] * len(strips)), (279, 4, [len(s) for s in strips])]
    )
    ifd_off = 8
    ifd_size = 2 + 12 * len(all_entries) + 4
    overflow_off = ifd_off + ifd_size
    overflow = bytearray()
    body = bytearray(struct.pack(e + "2sHI", b"II", 42, ifd_off))
    body += struct.pack(e + "H", len(all_entries))
    patches = []  # (entry value position in overflow, values) for tag 273
    for tag, ftype, vals in all_entries:
        body += struct.pack(e + "HHI", tag, ftype, len(vals))
        nbytes = tsize[ftype] * len(vals)
        if nbytes <= 4:
            if tag == 273:
                patches.append((len(body), None))
            body += struct.pack(
                e + str(len(vals)) + tfmt[ftype], *vals
            ).ljust(4, b"\0")
        else:
            if tag == 273:
                patches.append((overflow_off + len(overflow), vals))
            body += struct.pack(e + "I", overflow_off + len(overflow))
            overflow += struct.pack(e + str(len(vals)) + tfmt[ftype], *vals)
    body += struct.pack(e + "I", 0)
    body += overflow + extra
    offs = []
    acc = len(body)
    for s in strips:
        offs.append(acc)
        acc += len(s)
    for pos, vals in patches:
        if vals is None:
            struct.pack_into(e + "I", body, pos, offs[0])
        else:
            struct.pack_into(e + f"{len(offs)}I", body, pos, *offs)
    for s in strips:
        body += s
    return bytes(body)


def test_tiff_hand_assembled_uncompressed_rgb():
    """2x2 RGB, no compression, IFD written by the test-local writer —
    pins tag parsing, strip addressing and sample layout."""
    pix = bytes([255, 0, 0, 0, 255, 0,
                 0, 0, 255, 9, 8, 7])
    payload = _ifd(
        [(256, 3, [2]), (257, 3, [2]), (258, 3, [8, 8, 8]), (259, 3, [1]),
         (262, 3, [2]), (277, 3, [3]), (278, 3, [2])],
        [pix],
    )
    out = decode_tiff(payload)
    exp = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [9, 8, 7]]], np.uint8
    )
    assert np.array_equal(out, exp)


def test_tiff_hand_assembled_packbits():
    """PackBits strip with a literal group, a replicate run, and the
    0x80 no-op byte (TIFF 6.0 §9) — written byte by byte."""
    strip = bytes([
        0x01, 10, 20,       # two literals
        0x80,               # no-op
        0xFE, 7,            # 257-0xFE = 3 copies of 7
        0x00, 99,           # one literal
    ])
    payload = _ifd(
        [(256, 3, [6]), (257, 3, [1]), (258, 3, [8]), (259, 3, [32773]),
         (262, 3, [1]), (277, 3, [1]), (278, 3, [1])],
        [strip],
    )
    out = decode_tiff(payload)
    exp = np.repeat(
        np.array([[10, 20, 7, 7, 7, 99]], np.uint8)[:, :, None], 3, axis=2
    )
    assert np.array_equal(out, exp)


def test_tiff_hand_assembled_lzw_kwkwk_and_clear():
    """LZW code stream written code by code: the KwKwK case (code ==
    next_code) and a mid-stream CLEAR that must reset table and width."""
    bw = _MsbWriter()
    bw.bits(256, 9)   # CLEAR
    bw.bits(65, 9)    # 'A'
    bw.bits(258, 9)   # KwKwK: 258 == next_code -> 'A'+'A' = 'AA'
    bw.bits(256, 9)   # CLEAR mid-stream
    bw.bits(67, 9)    # 'C'
    bw.bits(67, 9)    # 'C' -> inserts table[258] = 'CC'
    bw.bits(258, 9)   # ordinary back-reference into the rebuilt table
    bw.bits(257, 9)   # EOI
    strip = bw.getvalue()
    data = b"AAACCCC"
    payload = _ifd(
        [(256, 3, [7]), (257, 3, [1]), (258, 3, [8]), (259, 3, [5]),
         (262, 3, [1]), (277, 3, [1]), (278, 3, [1])],
        [strip],
    )
    out = decode_tiff(payload)
    exp = np.repeat(
        np.frombuffer(data, np.uint8).reshape(1, 7)[:, :, None], 3, axis=2
    )
    assert np.array_equal(out, exp)


def test_tiff_lzw_early_change_boundaries():
    """A literals-only code stream (valid LZW: a lazy encoder that never
    uses the table) long enough that the decoder's table crosses 511 and
    1023 — the code width must grow at next_code == 2^w - 1 (the TIFF
    'early change', one code earlier than GIF). The stream is emitted by
    a ten-line spec model in this test, independent of _tiff_lzw_encode;
    a late-change decoder would misalign and corrupt everything after
    byte ~253."""
    data = bytes((7 * i + 3) % 256 for i in range(900))
    bw = _MsbWriter()
    width = 9
    bw.bits(256, width)  # CLEAR
    next_code = 258
    for i, b in enumerate(data):
        bw.bits(b, width)
        if i > 0:  # decoder inserts one entry per code after the first
            next_code += 1
            if next_code == (1 << width) - 1 and width < 12:
                width += 1
        assert next_code < 4094
    bw.bits(257, width)  # EOI
    strip = bw.getvalue()
    payload = _ifd(
        [(256, 3, [30]), (257, 3, [30]), (258, 3, [8]), (259, 3, [5]),
         (262, 3, [1]), (277, 3, [1]), (278, 3, [30])],
        [strip],
    )
    out = decode_tiff(payload)
    exp = np.repeat(
        np.frombuffer(data, np.uint8).reshape(30, 30)[:, :, None], 3, axis=2
    )
    assert np.array_equal(out, exp)


def test_tiff_hand_assembled_palette_and_bilevel():
    """Photometrics the module encoder cannot produce: 8-bit palette
    (ColorMap 16-bit entries, decoder keeps the high byte) and 1-bit
    WhiteIsZero with row bit-padding."""
    cmap = [0] * (3 * 256)
    for i, rgb in {1: (0x12, 0x34, 0x56), 2: (0xAB, 0xCD, 0xEF)}.items():
        cmap[i] = rgb[0] << 8 | 0x7F        # low byte must be dropped
        cmap[256 + i] = rgb[1] << 8
        cmap[512 + i] = rgb[2] << 8 | 0xFF
    payload = _ifd(
        [(256, 3, [2]), (257, 3, [1]), (258, 3, [8]), (259, 3, [1]),
         (262, 3, [3]), (277, 3, [1]), (278, 3, [1]), (320, 3, cmap)],
        [bytes([1, 2])],
    )
    out = decode_tiff(payload)
    exp = np.array([[[0x12, 0x34, 0x56], [0xAB, 0xCD, 0xEF]]], np.uint8)
    assert np.array_equal(out, exp)

    # 1-bit, width 10 -> 2 bytes per row, photometric 0 inverts
    rows = bytes([0b10110000, 0b01000000,   # row 0: bits 1011000001
                  0b00000001, 0b11000000])  # row 1: bits 0000000111
    payload = _ifd(
        [(256, 3, [10]), (257, 3, [2]), (258, 3, [1]), (259, 3, [1]),
         (262, 3, [0]), (277, 3, [1]), (278, 3, [2])],
        [rows],
    )
    out = decode_tiff(payload)
    bits = np.array([[1, 0, 1, 1, 0, 0, 0, 0, 0, 1],
                     [0, 0, 0, 0, 0, 0, 0, 1, 1, 1]], np.uint8)
    exp = np.repeat(((1 - bits) * 255)[:, :, None], 3, axis=2)
    assert np.array_equal(out, exp)


def test_tiff_hand_assembled_old_style_deflate():
    """Compression 32946 (old-style Deflate) must route to zlib like 8."""
    pix = bytes(range(12))
    payload = _ifd(
        [(256, 3, [4]), (257, 3, [1]), (258, 3, [8, 8, 8]), (259, 3, [32946]),
         (262, 3, [2]), (277, 3, [3]), (278, 3, [1])],
        [zlib.compress(pix)],
    )
    out = decode_tiff(payload)
    exp = np.frombuffer(pix, np.uint8).reshape(1, 4, 3)
    assert np.array_equal(out, exp)


def test_tiff_corrupt_and_unsupported_raise():
    img = np.zeros((2, 2, 3), np.uint8)
    good = encode_tiff(img)
    with pytest.raises(ValueError):
        decode_tiff(b"XX" + good[2:])
    with pytest.raises(ValueError):
        decode_tiff(good[:20])
    # tiled layout
    payload = _ifd(
        [(256, 3, [2]), (257, 3, [1]), (258, 3, [8]), (259, 3, [1]),
         (262, 3, [1]), (277, 3, [1]), (322, 3, [16])],
        [bytes(2)],
    )
    with pytest.raises(ValueError, match="tiled"):
        decode_tiff(payload)
    # CCITT (spec-tabulated code words, documented cut)
    payload = _ifd(
        [(256, 3, [2]), (257, 3, [1]), (258, 3, [1]), (259, 3, [3]),
         (262, 3, [0]), (277, 3, [1])],
        [bytes(2)],
    )
    with pytest.raises(ValueError, match="CCITT"):
        decode_tiff(payload)
    # LZW code beyond the table
    bw = _MsbWriter()
    bw.bits(256, 9)
    bw.bits(65, 9)
    bw.bits(300, 9)  # table only has 258 entries at this point
    payload = _ifd(
        [(256, 3, [2]), (257, 3, [1]), (258, 3, [8]), (259, 3, [5]),
         (262, 3, [1]), (277, 3, [1])],
        [bw.getvalue()],
    )
    with pytest.raises(ValueError, match="LZW"):
        decode_tiff(payload)
    # strip shorter than StripByteCounts claims
    payload = _ifd(
        [(256, 3, [4]), (257, 3, [4]), (258, 3, [8]), (259, 3, [1]),
         (262, 3, [1]), (277, 3, [1])],
        [bytes(3)],
    )
    with pytest.raises(ValueError):
        decode_tiff(payload)


# ---------------------------------------------------------------------------
# FLAC round-trips (encoder ↔ decoder)


@pytest.mark.parametrize("mode", ["indep", "ls", "rs", "ms"])
def test_flac_roundtrip_stereo_modes(mode):
    rng = np.random.default_rng(21)
    smooth = (np.sin(np.arange(3000) / 7.0) * 9000).astype(np.int64)
    noise = rng.integers(-300, 300, 3000)
    st = np.stack([smooth + noise, smooth // 2 - noise], axis=1)
    payload = encode_flac(st, sample_rate=44100, blocksize=1024,
                          stereo_mode=mode)
    assert sniff_mime(payload) == "audio/flac"
    samples, rate, bits = decode_flac_pcm(payload)
    assert rate == 44100 and bits == 16
    assert np.array_equal(samples, st)


def test_flac_roundtrip_mono_odd_tail_and_compression():
    """Blocksize that does not divide n (tail frame), plus the smooth
    signal must actually compress vs raw PCM."""
    s = (np.sin(np.arange(5000) / 11.0) * 15000).astype(np.int16)
    payload = encode_flac(s, sample_rate=8000, blocksize=4096)
    samples, rate, bits = decode_flac_pcm(payload)
    assert np.array_equal(samples.ravel(), s)
    assert len(payload) < 2 * len(s)  # beats verbatim int16 PCM


def test_flac_roundtrip_extremes_and_wav_twin():
    """Full-scale int16 extremes survive, and the decoded PCM equals the
    WAV twin of the same samples — the cross-container dedup invariant."""
    rng = np.random.default_rng(22)
    s = rng.integers(-32768, 32768, (700, 2), dtype=np.int64)
    s[0] = (-32768, 32767)
    f_pcm, f_rate, _ = decode_flac_pcm(encode_flac(s, sample_rate=16000))
    w_pcm, w_rate, _ = decode_wav_pcm(encode_wav(s, 16000))
    assert f_rate == w_rate == 16000
    assert np.array_equal(f_pcm, w_pcm)
    assert np.array_equal(f_pcm, s)


def test_flac_decode_float_contract():
    s = np.array([0, 16384, -16384, -32768], np.int64)
    out = decode_flac(encode_flac(s))
    assert out.dtype == np.float32
    assert np.allclose(out, [0.0, 0.5, -0.5, -1.0])


# ---------------------------------------------------------------------------
# FLAC hand-assembled frames (decoder correctness independent of the
# module encoder — constant/LPC subframes, Rice partitions with escape,
# wasted bits: paths encode_flac never emits).


def _crc8_ref(data: bytes) -> int:
    r = 0
    for b in data:
        r ^= b
        for _ in range(8):
            r = ((r << 1) ^ 0x07) & 0xFF if r & 0x80 else (r << 1) & 0xFF
    return r


def _crc16_ref(data: bytes) -> int:
    r = 0
    for b in data:
        r ^= b << 8
        for _ in range(8):
            r = ((r << 1) ^ 0x8005) & 0xFFFF if r & 0x8000 else \
                (r << 1) & 0xFFFF
    return r


def _streaminfo(sr, nch, bps, total, bs):
    body = struct.pack(">HH", bs, bs) + b"\0\0\0" * 2
    packed = (sr << 44) | ((nch - 1) << 41) | ((bps - 1) << 36) | total
    body += packed.to_bytes(8, "big") + b"\0" * 16
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body


def test_flac_hand_assembled_constant_subframe():
    """bs_code 1 (192), sample-rate from the code table (8000), one
    CONSTANT subframe — assembled bit by bit, CRCs from the test-local
    bitwise model."""
    bw = _MsbWriter()
    bw.bits(0x3FFE, 14)
    bw.bits(0, 1)
    bw.bits(0, 1)       # fixed blocking
    bw.bits(1, 4)       # blocksize code 1 -> 192
    bw.bits(4, 4)       # sample-rate code 4 -> 8000
    bw.bits(0, 4)       # mono
    bw.bits(4, 3)       # 16 bps
    bw.bits(0, 1)
    bw.bits(0x00, 8)    # coded frame number 0
    bw.bits(_crc8_ref(bytes(bw.buf)), 8)
    bw.bits(0, 1)       # subframe pad
    bw.bits(0, 6)       # CONSTANT
    bw.bits(0, 1)       # no wasted bits
    bw.bits(-1234 & 0xFFFF, 16)
    bw.align()
    body = bw.getvalue()
    payload = _streaminfo(8000, 1, 16, 192, 192) + body + struct.pack(
        ">H", _crc16_ref(body)
    )
    samples, rate, bits = decode_flac_pcm(payload)
    assert (rate, bits) == (8000, 16)
    assert np.array_equal(samples, np.full((192, 1), -1234, np.int32))


def test_flac_hand_assembled_lpc_partitions_escape_wasted():
    """An 8-sample LPC order-2 frame with one wasted bit, partition
    order 1, a Rice-coded first partition and an ESCAPED (raw 6-bit)
    second partition — every value chosen by hand, the expected output
    derived from the RFC 9639 recurrence by hand:

        s[i] = res[i-2] + ((3*s[i-1] - s[i-2]) >> 2), then << 1
    """
    bw = _MsbWriter()
    bw.bits(0x3FFE, 14)
    bw.bits(0, 1)
    bw.bits(0, 1)
    bw.bits(6, 4)        # 8-bit blocksize-1 follows
    bw.bits(9, 4)        # 44100 from the code table
    bw.bits(0, 4)        # mono
    bw.bits(4, 3)        # 16 bps
    bw.bits(0, 1)
    bw.bits(0x00, 8)     # coded frame number
    bw.bits(7, 8)        # blocksize-1
    bw.bits(_crc8_ref(bytes(bw.buf)), 8)
    # subframe: LPC order 2 (type 32 + 1), wasted=1 -> eff 15 bits
    bw.bits(0, 1)
    bw.bits(33, 6)
    bw.bits(1, 1)        # wasted-bits flag
    bw.bits(1, 1)        # unary 0 -> wasted = 1
    bw.bits(100, 15)     # warm-up (effective domain)
    bw.bits(103, 15)
    bw.bits(3, 4)        # precision-1 -> 4-bit coefficients
    bw.bits(2, 5)        # shift 2
    bw.bits(3, 4)        # coef[0] = 3
    bw.bits(-1 & 0xF, 4)  # coef[1] = -1
    bw.bits(0, 2)        # 4-bit Rice method
    bw.bits(1, 4)        # partition order 1 -> two partitions
    # partition 0: param 2, residuals [3, -2] (zigzag 6, 3)
    bw.bits(2, 4)
    bw.bits(0b01, 2); bw.bits(0b10, 2)   # u=6: q=1, rem=2
    bw.bits(0b1, 1); bw.bits(0b11, 2)    # u=3: q=0, rem=3
    # partition 1: escape, 6-bit raw residuals [5, -17, 0, 9]
    bw.bits(15, 4)
    bw.bits(6, 5)
    for v in (5, -17, 0, 9):
        bw.bits(v & 0x3F, 6)
    bw.align()
    body = bw.getvalue()
    payload = _streaminfo(44100, 1, 16, 8, 8) + body + struct.pack(
        ">H", _crc16_ref(body)
    )
    samples, rate, bits = decode_flac_pcm(payload)
    assert (rate, bits) == (44100, 16)
    exp = np.array([200, 206, 110, 26, 2, -40, -32, 4], np.int32)
    assert np.array_equal(samples.ravel(), exp)


def test_flac_coded_number_utf8_extension():
    """Frame-number coding: hand-written byte sequences per the UTF-8
    extension (RFC 9639 §9.1.5) decode to the right values, and the
    writer round-trips across every byte-length boundary."""
    from owlfrontier.multimodal import (
        _MsbBits,
        _flac_coded_number,
        _flac_write_coded,
    )

    for raw, want in [
        (b"\x00", 0),
        (b"\x7f", 0x7F),
        (b"\xc2\x80", 0x80),            # 110xxxxx 10xxxxxx
        (b"\xdf\xbf", 0x7FF),
        (b"\xe0\xa0\x80", 0x800),       # 1110xxxx
        (b"\xef\xbf\xbf", 0xFFFF),
    ]:
        assert _flac_coded_number(_MsbBits(raw)) == want
    for v in (0, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10000,
              (1 << 31) - 1, (1 << 36) - 1):
        bw = _MsbWriter()
        _flac_write_coded(bw, v)
        assert _flac_coded_number(_MsbBits(bw.getvalue())) == v


def test_flac_crc_mismatch_raises():
    s = (np.arange(500) % 97).astype(np.int64) * 100
    payload = bytearray(encode_flac(s, sample_rate=8000))
    # the last two bytes are the frame CRC-16; flip a bit in it
    bad = payload.copy()
    bad[-1] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        decode_flac_pcm(bytes(bad))
    # and one in the frame header (CRC-8 region, right after metadata)
    bad = payload.copy()
    bad[42 + 2] ^= 0x10
    with pytest.raises(ValueError):
        decode_flac_pcm(bytes(bad))


def test_flac_streaminfo_total_mismatch_raises():
    s = np.zeros(100, np.int64)
    payload = bytearray(encode_flac(s))
    # STREAMINFO total-samples sits in the low 36 bits of the packed
    # field at offset 4+4+10 .. +18; bump the low byte
    pos = 4 + 4 + 17
    payload[pos] ^= 0x01
    with pytest.raises(ValueError, match="STREAMINFO"):
        decode_flac_pcm(bytes(payload))


# ---------------------------------------------------------------------------
# Spark-side: the audio manifest dedups identical PCM across containers,
# and TIFF flows through the image manifest next to a BMP of the same
# pixels (shared rgb_sha256).


def test_audio_manifest_cross_container_dedup(spark):
    from owlfrontier.multimodal import audio_content_manifest

    rng = np.random.default_rng(31)
    pcm = rng.integers(-20000, 20000, (800, 2), dtype=np.int64)
    other = rng.integers(-20000, 20000, 400, dtype=np.int64)
    rows = [
        (1, bytearray(encode_wav(pcm, 22050))),
        (2, bytearray(encode_flac(pcm, sample_rate=22050,
                                  stereo_mode="ms"))),
        (3, bytearray(encode_wav(other, 8000))),
    ]
    df = spark.createDataFrame(rows, "media_id bigint, payload binary")
    out = {r["media_id"]: r for r in audio_content_manifest(df).collect()}
    assert out[1]["mime"] == "audio/wav"
    assert out[2]["mime"] == "audio/flac"
    assert out[1]["pcm_sha256"] == out[2]["pcm_sha256"]
    assert out[3]["pcm_sha256"] != out[1]["pcm_sha256"]
    assert (out[1]["n_samples"], out[1]["channels"]) == (800, 2)
    assert (out[2]["n_samples"], out[2]["channels"]) == (800, 2)


def test_image_manifest_tiff_joins_bmp_dedup(spark):
    from owlfrontier.multimodal import encode_bmp, image_content_manifest

    rng = np.random.default_rng(32)
    img = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    rows = [
        (1, bytearray(encode_bmp(img))),
        (2, bytearray(encode_tiff(img, compression="lzw", predictor=2))),
    ]
    df = spark.createDataFrame(rows, "media_id bigint, payload binary")
    out = {r["media_id"]: r for r in image_content_manifest(df).collect()}
    assert out[1]["mime"] == "image/bmp"
    assert out[2]["mime"] == "image/tiff"
    assert out[1]["rgb_sha256"] == out[2]["rgb_sha256"]
    assert (out[2]["width"], out[2]["height"]) == (5, 6)
