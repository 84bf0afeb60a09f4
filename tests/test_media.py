"""Header codec tests for functions/media.py (no Spark needed).

The synthesizers emit byte-correct minimal files; the parser must recover
exactly the planted parameters, walk JPEG marker sequences for real, and
degrade (never raise) on truncated/corrupt payloads.
"""

from __future__ import annotations

import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_spark.functions.media import (
    classify_media, decode_av_meta, decode_media_header, synth_bmp,
    synth_gif, synth_jpeg, synth_mp4, synth_png, synth_wav, synth_webp,
)


def test_png_roundtrip_and_crc():
    p = synth_png(1021, 769, 16)
    # real IHDR chunk with a correct CRC-32 (a strict PNG reader would check)
    assert p[:8] == b"\x89PNG\r\n\x1a\n"
    assert struct.unpack(">I", p[8:12])[0] == 13 and p[12:16] == b"IHDR"
    assert struct.unpack(">I", p[29:33])[0] == zlib.crc32(p[12:29]) & 0xFFFFFFFF
    r = decode_media_header(p)
    assert r == {"media_kind": "image/png", "width": 1021, "height": 769,
                 "bit_depth": 16}


def test_gif_le_fields():
    r = decode_media_header(synth_gif(65535, 1, 5))
    assert r == {"media_kind": "image/gif", "width": 65535, "height": 1,
                 "bit_depth": 5}


def test_jpeg_marker_walk():
    # SOF0 sits after APP0 and DQT — the parser must skip both by length
    j = synth_jpeg(640, 480)
    assert j[2:4] == b"\xff\xe0" and b"\xff\xc0" in j
    r = decode_media_header(j)
    assert r == {"media_kind": "image/jpeg", "width": 640, "height": 480,
                 "bit_depth": 8}


def test_jpeg_progressive_sof2_and_fill_bytes():
    # hand-built: SOI, fill bytes, RST (standalone), COM segment, SOF2
    sof2 = (b"\xff\xc2" + struct.pack(">H", 11) + b"\x0c"
            + struct.pack(">HH", 77, 99) + b"\x01\x11\x00")
    j = (b"\xff\xd8" + b"\xff\xff"                      # fill byte run
         + b"\xff\x01"                                   # TEM (standalone)
         + b"\xff\xfe" + struct.pack(">H", 5) + b"abc"   # COM segment
         + sof2 + b"\xff\xd9")
    r = decode_media_header(j)
    assert (r["width"], r["height"], r["bit_depth"]) == (99, 77, 12)


def test_jpeg_no_sof_before_sos_or_eoi():
    assert decode_media_header(b"\xff\xd8\xff\xd9")["width"] == -1
    sos = b"\xff\xd8" + b"\xff\xda" + struct.pack(">H", 4) + b"\x00\x00"
    assert decode_media_header(sos)["width"] == -1


def test_webp_vp8x_roundtrip():
    p = synth_webp(16_000_000, 3)  # 24-bit canvas fields go beyond u16
    assert p[:4] == b"RIFF" and p[8:12] == b"WEBP" and p[12:16] == b"VP8X"
    r = decode_media_header(p)
    # VP8X carries no bit-depth field — the decoder must report -1, not 8
    assert r == {"media_kind": "image/webp", "width": 16_000_000,
                 "height": 3, "bit_depth": -1}


def test_webp_lossy_vp8_sync_code():
    # hand-built lossy file: ICCP chunk first (odd size → pad byte), then
    # a VP8 frame header with the 9D 01 2A sync code and 14-bit dims
    vp8 = b"\x00\x00\x00" + b"\x9d\x01\x2a" + struct.pack("<HH", 640, 480)
    iccp = b"ICCP" + struct.pack("<I", 3) + b"abc" + b"\x00"  # padded
    chunk = b"VP8 " + struct.pack("<I", len(vp8)) + vp8
    body = b"WEBP" + iccp + chunk
    p = b"RIFF" + struct.pack("<I", len(body)) + body
    r = decode_media_header(p)
    assert (r["width"], r["height"]) == (640, 480)
    # corrupt sync code must degrade, not misreport
    bad = p.replace(b"\x9d\x01\x2a", b"\x9d\x01\x2b")
    assert decode_media_header(bad)["width"] == -1


def test_bmp_roundtrip_and_topdown():
    r = decode_media_header(synth_bmp(1021, 769, 24))
    assert r == {"media_kind": "image/bmp", "width": 1021, "height": 769,
                 "bit_depth": 24}
    # negative height = top-down row order; dims reported as magnitude
    p = bytearray(synth_bmp(10, 20, 32))
    p[22:26] = struct.pack("<i", -20)
    assert decode_media_header(bytes(p))["height"] == 20
    # legacy BITMAPCOREHEADER (12-byte DIB, u16 dims)
    core = (b"BM" + struct.pack("<IHHI", 26, 0, 0, 26)
            + struct.pack("<IHHHH", 12, 321, 123, 1, 8))
    r = decode_media_header(core)
    assert (r["width"], r["height"], r["bit_depth"]) == (321, 123, 8)


def test_bmp_weak_magic_needs_dib_header():
    # printable text starting "BM" must NOT classify as a bitmap
    assert classify_media(b"BMW dealers near me, open now...") == "unknown"


@pytest.mark.parametrize("payload,kind", [
    (b"", "unknown"),
    (b"hello world", "unknown"),
    (b"GIF89a", "image/gif"),
    (b"\xff\xd8", "image/jpeg"),
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"RIFF\x00\x00\x00\x00WAVE", "audio/wav"),
    (b"RIFF\x00\x00\x00\x00AVI ", "unknown"),  # RIFF but not WEBP/WAVE
    (b"RIFF\x16\x00\x00\x00WEBP", "image/webp"),
    (b"\x00\x00\x00\x14ftypisom", "video/mp4"),
])
def test_classifier(payload, kind):
    assert classify_media(payload) == kind


_SYNTHS = [synth_png, synth_gif, lambda a, b: synth_jpeg(a, b),
           lambda a, b: synth_webp(a, b), lambda a, b: synth_bmp(a, b)]


@settings(max_examples=80, deadline=None)
@given(st.integers(1, 65535), st.integers(1, 65535),
       st.sampled_from([1, 2, 4, 8, 16]), st.integers(0, 4))
def test_roundtrip_property(w, h, depth, kind):
    if kind == 0:
        pay, exp_depth = synth_png(w, h, depth), depth
    elif kind == 1:
        pay, exp_depth = synth_gif(w, h, min(depth, 8)), min(depth, 8)
    elif kind == 2:
        pay, exp_depth = synth_jpeg(w, h), 8
    elif kind == 3:
        pay, exp_depth = synth_webp(w, h), -1
    else:
        pay, exp_depth = synth_bmp(w, h, 24), 24
    r = decode_media_header(pay)
    assert (r["width"], r["height"], r["bit_depth"]) == (w, h, exp_depth)


@settings(max_examples=80, deadline=None)
@given(st.integers(0, 120), st.integers(1, 65535), st.integers(1, 65535),
       st.integers(0, 4))
def test_truncation_never_raises(cut, w, h, kind):
    pay = _SYNTHS[kind](w, h)
    r = decode_media_header(pay[:cut])
    assert set(r) == {"media_kind", "width", "height", "bit_depth"}


@settings(max_examples=40, deadline=None)
@given(st.binary(max_size=200))
def test_garbage_never_raises(blob):
    r = decode_media_header(blob)
    assert isinstance(r["width"], int)


# --------------------------------------------------------------------------
# audio/video containers (WAV RIFF chunks, MP4 ISO-BMFF boxes)
# --------------------------------------------------------------------------

def test_wav_roundtrip_and_duration_floor():
    w = synth_wav(44100, 2, 16, 44100 * 3 + 7)  # 3.000158... s stereo
    # real RIFF structure: form type + fmt chunk fourcc at spec offsets
    assert w[8:12] == b"WAVE" and w[12:16] == b"fmt "
    r = decode_av_meta(w)
    assert r["media_kind"] == "audio/wav"
    assert (r["sample_rate"], r["channels"], r["bit_depth"]) == (44100, 2, 16)
    assert r["duration_ms"] == 3000  # floors, never rounds up
    assert (r["width"], r["height"]) == (-1, -1)  # audio carries no dims


def test_wav_fmt_after_other_chunk():
    # chunk walk must skip unknown chunks (e.g. LIST INFO) before fmt
    w = bytearray(synth_wav(8000, 1, 8, 100))
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    payload = bytes(w[:12]) + extra + bytes(w[12:])
    r = decode_av_meta(payload)
    assert r["sample_rate"] == 8000 and r["duration_ms"] == 12  # 100/8000 s


def test_mp4_roundtrip_versions():
    for version, nbytes in ((0, 236), (1, 260)):
        m = synth_mp4(1920, 1080, 90000, 90000 * 12 + 345, version=version)
        assert len(m) == nbytes
        r = decode_av_meta(m)
        assert r["media_kind"] == "video/mp4"
        assert (r["width"], r["height"]) == (1920, 1080)
        assert r["duration_ms"] == 12003  # floor(units*1000/timescale)
        assert r["sample_rate"] == -1  # mvhd/tkhd carry no audio fields


def test_mp4_largesize_box():
    # size==1 ⇒ 64-bit largesize header (ISO 14496-12 §4.2): rewrap the
    # moov box with a largesize header and the walk must still find mvhd
    m = synth_mp4(640, 360, 600, 1234)
    ftyp, moov = m[:20], m[20:]
    body = moov[8:]
    large = struct.pack(">I", 1) + b"moov" + struct.pack(">Q", 16 + len(body)) + body
    r = decode_av_meta(ftyp + large)
    assert (r["width"], r["height"]) == (640, 360)
    assert r["duration_ms"] == 1234 * 1000 // 600


def test_mp4_zero_timescale_degrades():
    m = synth_mp4(8, 8, 0, 100)
    assert decode_av_meta(m)["duration_ms"] == -1


@settings(max_examples=60, deadline=None)
@given(st.integers(1, 65535), st.integers(1, 65535),
       st.sampled_from([600, 1000, 48000, 90000]),
       st.integers(0, 10**9), st.integers(0, 1))
def test_mp4_roundtrip_property(w, h, tscale, units, version):
    r = decode_av_meta(synth_mp4(w, h, tscale, units, version=version))
    assert (r["width"], r["height"]) == (w, h)
    assert r["duration_ms"] == units * 1000 // tscale


@settings(max_examples=60, deadline=None)
@given(st.sampled_from([8000, 16000, 22050, 44100, 48000]),
       st.integers(1, 2), st.sampled_from([8, 16]), st.integers(0, 5000))
def test_wav_roundtrip_property(rate, channels, bits, frames):
    r = decode_av_meta(synth_wav(rate, channels, bits, frames))
    assert (r["sample_rate"], r["channels"], r["bit_depth"]) == (
        rate, channels, bits)
    assert r["duration_ms"] == frames * 1000 // rate


@settings(max_examples=80, deadline=None)
@given(st.integers(0, 120), st.integers(0, 1))
def test_av_truncation_never_raises(cut, kind):
    pay = (synth_wav(44100, 2, 16, 10) if kind == 0
           else synth_mp4(100, 100, 1000, 999))
    r = decode_av_meta(pay[:cut])
    assert set(r) == {"media_kind", "sample_rate", "channels", "bit_depth",
                      "width", "height", "duration_ms"}


@settings(max_examples=40, deadline=None)
@given(st.binary(max_size=300))
def test_av_garbage_never_raises(blob):
    r = decode_av_meta(blob)
    assert isinstance(r["duration_ms"], int)


def test_av_infinite_loop_guards():
    # zero-size BMFF box and zero-size RIFF chunk must not hang the walk
    bad_mp4 = b"\x00\x00\x00\x14ftypisom\x00\x00\x02\x00mp41" + b"\x00" * 8
    assert decode_av_meta(bad_mp4)["width"] == -1
    bad_wav = b"RIFF" + struct.pack("<I", 100) + b"WAVE" + b"junk" + struct.pack("<I", 0) + b"\x00" * 40
    assert decode_av_meta(bad_wav)["sample_rate"] == -1
