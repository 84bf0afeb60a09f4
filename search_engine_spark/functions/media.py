"""Binary media header codecs — pure-Python, no codec libraries.

The multimodal pipeline treats media as opaque ``binary`` columns
(pipelines/multimodal.py). Full pixel decode needs PIL/ffmpeg (absent in
this container), but the *header* of every mainstream image container is
a deterministic function of raw bytes, so dimension/type extraction is
implemented for real here:

- PNG  — 8-byte signature + IHDR chunk (width/height big-endian u32,
  bit-depth byte), per the PNG spec (ISO/IEC 15948 §11.2.2);
- GIF  — GIF87a/GIF89a signature + logical screen descriptor
  (width/height little-endian u16, colour-resolution bits), per the
  GIF89a specification;
- JPEG — SOI marker then a marker walk to the first SOF frame header
  (precision byte, height/width big-endian u16), per ITU-T T.81 §B.2.2.

``synth_png/synth_gif/synth_jpeg`` build byte-correct minimal files
(real CRCs, real marker segments) so tests and the ``mm_image_dims``
gate entry can round-trip the parser against genuine format bytes
without shipping binary fixtures.
"""

from __future__ import annotations

import struct
import zlib

#: SOF markers that carry frame dimensions (ITU-T T.81 table B.1):
#: C0-C3, C5-C7, C9-CB, CD-CF — i.e. every CX except DHT (C4), JPG (C8)
#: and DAC (CC).
_JPEG_SOF_MARKERS = frozenset(
    m for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC)
)
#: markers with no length field (standalone)
_JPEG_STANDALONE = frozenset({0xD8, 0xD9, 0x01} | set(range(0xD0, 0xD8)))

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


# --------------------------------------------------------------------------
# synthesizers (tests + oracle fixtures)
# --------------------------------------------------------------------------

def synth_png(width: int, height: int, bit_depth: int = 8) -> bytes:
    """Minimal valid PNG: signature + IHDR (real CRC) + IEND. 45 bytes."""
    ihdr = struct.pack(">II5B", width, height, bit_depth, 0, 0, 0, 0)
    out = bytearray(_PNG_SIG)
    for tag, data in ((b"IHDR", ihdr), (b"IEND", b"")):
        out += struct.pack(">I", len(data)) + tag + data
        out += struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    return bytes(out)


def synth_gif(width: int, height: int, bit_depth: int = 8) -> bytes:
    """GIF89a signature + logical screen descriptor + trailer. 14 bytes."""
    packed = ((bit_depth - 1) & 0x7) << 4  # colour-resolution bits, no GCT
    return (
        b"GIF89a"
        + struct.pack("<HH", width, height)
        + bytes([packed, 0, 0])
        + b"\x3b"
    )


def synth_jpeg(width: int, height: int) -> bytes:
    """SOI + APP0(JFIF) + DQT + SOF0 + EOI — a real marker sequence the
    parser must walk (the SOF is deliberately NOT the first segment).
    110 bytes."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + b"\x01" * 64
    sof0 = (
        b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
        + struct.pack(">HH", height, width)
        + b"\x03"
        + b"\x01\x22\x00" + b"\x02\x11\x01" + b"\x03\x11\x01"
    )
    return b"\xff\xd8" + app0 + dqt + sof0 + b"\xff\xd9"


# --------------------------------------------------------------------------
# classifier + parser
# --------------------------------------------------------------------------

def classify_media(payload: bytes) -> str:
    """Magic-byte media classifier (container type from leading bytes)."""
    if payload.startswith(_PNG_SIG):
        return "image/png"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "image/gif"
    if payload[:2] == b"\xff\xd8":
        return "image/jpeg"
    return "unknown"


def decode_media_header(payload: bytes) -> dict:
    """Parse kind + dimensions + bit depth from a binary media payload.

    Returns ``{"media_kind", "width", "height", "bit_depth"}`` with -1 for
    fields that are absent or unparseable (truncated/corrupt payloads never
    raise — at 100 TB a malformed crawl payload must degrade, not kill the
    stage).
    """
    kind = classify_media(payload)
    out = {"media_kind": kind, "width": -1, "height": -1, "bit_depth": -1}
    try:
        if kind == "image/png":
            # signature(8) len(4) "IHDR"(4) width(4) height(4) depth(1)
            if payload[12:16] == b"IHDR" and len(payload) >= 25:
                out["width"], out["height"] = struct.unpack(
                    ">II", payload[16:24]
                )
                out["bit_depth"] = payload[24]
        elif kind == "image/gif":
            if len(payload) >= 11:
                out["width"], out["height"] = struct.unpack(
                    "<HH", payload[6:10]
                )
                out["bit_depth"] = ((payload[10] >> 4) & 0x7) + 1
        elif kind == "image/jpeg":
            dims = _jpeg_sof_dims(payload)
            if dims:
                out["bit_depth"], out["height"], out["width"] = dims
    except (struct.error, IndexError):  # truncated mid-field
        pass
    return out


def _jpeg_sof_dims(payload: bytes) -> tuple[int, int, int] | None:
    """Walk JPEG marker segments to the first SOF; return (precision, h, w)."""
    i = 2  # past SOI
    n = len(payload)
    while i + 1 < n:
        if payload[i] != 0xFF:  # not a marker — corrupt stream
            return None
        marker = payload[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in _JPEG_STANDALONE:
            if marker == 0xD9:  # EOI before any SOF
                return None
            i += 2
            continue
        if i + 4 > n:
            return None
        seg_len = struct.unpack(">H", payload[i + 2:i + 4])[0]
        if marker in _JPEG_SOF_MARKERS:
            if i + 9 > n:
                return None
            precision = payload[i + 4]
            height, width = struct.unpack(">HH", payload[i + 5:i + 9])
            return precision, height, width
        if marker == 0xDA:  # SOS — entropy-coded data follows, stop
            return None
        i += 2 + seg_len
    return None
