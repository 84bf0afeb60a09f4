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
  (precision byte, height/width big-endian u16), per ITU-T T.81 §B.2.2;
- WEBP — RIFF container walk ("RIFF"+size+"WEBP", then fourcc chunks):
  VP8X extended header (24-bit little-endian canvas width/height minus
  one) or a lossy "VP8 " frame tag (0x9D012A sync code, 14-bit
  little-endian dims), per the public WebP container/bitstream specs;
- BMP  — "BM" signature + BITMAPINFOHEADER-family DIB header (s32le
  width/height — negative height = top-down, reported as magnitude —
  u16le bits-per-pixel), per the Windows BMP format documentation.

Audio/video containers carry their stream metadata in headers too, so
the same pure-bytes treatment covers the AV half of a crawl corpus:

- WAV  — RIFF/"WAVE" chunk walk to the "fmt " chunk (format tag,
  channels, sample rate, bits per sample — all little-endian) and the
  "data" chunk size, which with the byte rate yields duration, per the
  RIFF/WAVE (Multimedia Programming Interface) specification;
- MP4  — ISO base-media-file-format box walk (ISO/IEC 14496-12):
  "ftyp" major brand, "moov"/"mvhd" timescale + duration (version 0
  and 1 layouts), "moov"/"trak"/"tkhd" presentation width/height
  (16.16 big-endian fixed point).

``synth_png/synth_gif/synth_jpeg/synth_webp/synth_bmp/synth_wav/
synth_mp4`` build byte-correct minimal files (real CRCs, real marker
segments, real RIFF chunk walks, real nested BMFF boxes) so tests and
the ``mm_image_dims`` / ``mm_av_meta`` gate entries can round-trip the
parsers against genuine format bytes without shipping binary fixtures.
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


def synth_webp(width: int, height: int) -> bytes:
    """RIFF/WEBP container with a VP8X extended header (24-bit canvas
    dims), per the WebP container spec. 30 bytes."""
    vp8x = (
        bytes([0, 0, 0, 0])  # flags + reserved
        + (width - 1).to_bytes(3, "little")
        + (height - 1).to_bytes(3, "little")
    )
    chunk = b"VP8X" + struct.pack("<I", len(vp8x)) + vp8x
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def synth_bmp(width: int, height: int, bpp: int = 24) -> bytes:
    """"BM" file header + BITMAPINFOHEADER (40-byte DIB). 54 bytes —
    header-complete like the other synthesizers (no pixel array)."""
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, bpp, 0, 0, 2835, 2835, 0, 0
    )
    header = b"BM" + struct.pack("<IHHI", 54, 0, 0, 54)
    return header + dib


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


def synth_wav(sample_rate: int, channels: int, bits: int,
              n_frames: int) -> bytes:
    """RIFF/WAVE with a 16-byte PCM "fmt " chunk and a real (zero-filled)
    "data" chunk of ``n_frames`` sample frames."""
    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, bits
    )
    data = bytes(n_frames * block_align)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _bmff_box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + fourcc + body


#: identity transformation matrix (ISO 14496-12 §6.2.2) — 0x00010000 on
#: the diagonal, 0x40000000 in w
_BMFF_UNITY = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                          0x40000000)


def synth_mp4(width: int, height: int, timescale: int,
              duration_units: int, version: int = 0) -> bytes:
    """ftyp + moov{mvhd, trak{tkhd}} with full-size version-0 or
    version-1 mvhd/tkhd bodies per ISO/IEC 14496-12. 236 bytes (v0) /
    260 bytes (v1) — header-complete like the image synthesizers (no
    mdat)."""
    t = struct.pack(">Q" if version else ">I", 0)  # creation/mod times
    dur = struct.pack(">Q" if version else ">I", duration_units)
    mvhd = (
        bytes([version, 0, 0, 0]) + t + t
        + struct.pack(">I", timescale) + dur
        + struct.pack(">i", 0x10000)       # rate 1.0
        + struct.pack(">h", 0x0100)        # volume 1.0
        + bytes(10)                        # reserved
        + _BMFF_UNITY
        + bytes(24)                        # pre_defined
        + struct.pack(">I", 2)             # next_track_ID
    )
    tkhd = (
        bytes([version, 0, 0, 7]) + t + t  # flags: enabled|in_movie|in_preview
        + struct.pack(">I", 1) + bytes(4)  # track_ID + reserved
        + dur + bytes(8)                   # duration + reserved
        + struct.pack(">hhhh", 0, 0, 0, 0)  # layer, alt_group, volume, rsvd
        + _BMFF_UNITY
        + struct.pack(">II", width << 16, height << 16)  # 16.16 fixed
    )
    ftyp = _bmff_box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"mp41")
    moov = _bmff_box(
        b"moov",
        _bmff_box(b"mvhd", mvhd) + _bmff_box(b"trak", _bmff_box(b"tkhd", tkhd)),
    )
    return ftyp + moov


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
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        return "image/webp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "audio/wav"
    # ISO BMFF: first box is conventionally ftyp (size u32be + "ftyp")
    if payload[4:8] == b"ftyp":
        return "video/mp4"
    # "BM" alone is weak (printable ASCII); require a known DIB header size
    # at offset 14 (BITMAPCOREHEADER..BITMAPV5HEADER family) like file(1)
    if (
        payload[:2] == b"BM"
        and len(payload) >= 18
        and struct.unpack("<I", payload[14:18])[0]
        in (12, 40, 52, 56, 64, 108, 124)
    ):
        return "image/bmp"
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
        elif kind == "image/webp":
            dims = _webp_dims(payload)
            if dims:
                out["width"], out["height"] = dims
                # WebP carries no bit-depth field in its headers; leave -1
        elif kind == "image/bmp":
            hdr_size = struct.unpack("<I", payload[14:18])[0]
            if hdr_size >= 40 and len(payload) >= 30:
                w, h = struct.unpack("<ii", payload[18:26])
                out["width"], out["height"] = w, abs(h)  # h<0 = top-down
                out["bit_depth"] = struct.unpack("<H", payload[28:30])[0]
            elif hdr_size == 12 and len(payload) >= 26:  # BITMAPCOREHEADER
                # 12-byte DIB: size(4) width(u16) height(u16) planes(u16)
                # bpp(u16)
                w, h = struct.unpack("<HH", payload[18:22])
                out["width"], out["height"] = w, h
                out["bit_depth"] = struct.unpack("<H", payload[24:26])[0]
    except (struct.error, IndexError):  # truncated mid-field
        pass
    return out


def decode_av_meta(payload: bytes) -> dict:
    """Parse stream metadata from a WAV or MP4 binary payload.

    Returns ``{"media_kind", "sample_rate", "channels", "bit_depth",
    "width", "height", "duration_ms"}`` with -1 for fields the container
    does not carry or that are unparseable — like
    ``decode_media_header``, corrupt payloads degrade instead of raising.
    duration_ms floors (WAV: data bytes over the byte rate; MP4: mvhd
    duration units over the mvhd timescale).
    """
    kind = classify_media(payload)
    out = {
        "media_kind": kind, "sample_rate": -1, "channels": -1,
        "bit_depth": -1, "width": -1, "height": -1, "duration_ms": -1,
    }
    try:
        if kind == "audio/wav":
            fmt = _riff_chunk(payload, b"fmt ")
            if fmt is not None and len(fmt) >= 16:
                (_tag, out["channels"], out["sample_rate"], byte_rate,
                 _align, out["bit_depth"]) = struct.unpack("<HHIIHH",
                                                           fmt[:16])
                data = _riff_chunk(payload, b"data")
                if data is not None and byte_rate > 0:
                    out["duration_ms"] = len(data) * 1000 // byte_rate
        elif kind == "video/mp4":
            moov = _bmff_find(payload, 0, len(payload), b"moov")
            if moov is not None:
                mvhd = _bmff_find(payload, *moov, b"mvhd")
                if mvhd is not None:
                    dur = _mvhd_duration_ms(payload, *mvhd)
                    if dur is not None:
                        out["duration_ms"] = dur
                trak = _bmff_find(payload, *moov, b"trak")
                if trak is not None:
                    tkhd = _bmff_find(payload, *trak, b"tkhd")
                    if tkhd is not None:
                        dims = _tkhd_dims(payload, *tkhd)
                        if dims is not None:
                            out["width"], out["height"] = dims
    except (struct.error, IndexError):  # truncated mid-field
        pass
    return out


def _riff_chunk(payload: bytes, fourcc: bytes) -> bytes | None:
    """Walk RIFF chunks (past the 12-byte RIFF/form header) to the first
    chunk with the given fourcc; return its body, truncation-clamped."""
    i, n = 12, len(payload)
    while i + 8 <= n:
        size = struct.unpack("<I", payload[i + 4:i + 8])[0]
        if payload[i:i + 4] == fourcc:
            return payload[i + 8:i + 8 + size]
        i += 8 + size + (size & 1)  # RIFF chunks are 2-byte aligned
    return None


def _bmff_find(payload: bytes, start: int, end: int,
               fourcc: bytes) -> tuple[int, int] | None:
    """Walk sibling ISO-BMFF boxes in payload[start:end]; return the
    (body_start, body_end) of the first box with the given type.

    Handles 64-bit largesize (size==1) and to-end-of-file (size==0)
    boxes per ISO/IEC 14496-12 §4.2."""
    i = start
    while i + 8 <= end:
        size = struct.unpack(">I", payload[i:i + 4])[0]
        box_type = payload[i + 4:i + 8]
        header = 8
        if size == 1:
            if i + 16 > end:
                return None
            size = struct.unpack(">Q", payload[i + 8:i + 16])[0]
            header = 16
        elif size == 0:
            size = end - i
        if size < header:  # corrupt — would loop forever
            return None
        if box_type == fourcc:
            return i + header, min(i + size, end)
        i += size
    return None


def _mvhd_duration_ms(payload: bytes, start: int, end: int) -> int | None:
    """mvhd box body → floor(duration · 1000 / timescale); version 0
    (u32 times) and 1 (u64 times) layouts."""
    if end - start < 4:
        return None
    version = payload[start]
    if version == 1:
        if end - start < 32:
            return None
        timescale = struct.unpack(">I", payload[start + 20:start + 24])[0]
        duration = struct.unpack(">Q", payload[start + 24:start + 32])[0]
    else:
        if end - start < 20:
            return None
        timescale = struct.unpack(">I", payload[start + 12:start + 16])[0]
        duration = struct.unpack(">I", payload[start + 16:start + 20])[0]
    if timescale == 0:
        return None
    return duration * 1000 // timescale


def _tkhd_dims(payload: bytes, start: int, end: int) -> tuple[int, int] | None:
    """tkhd box body → (width, height) from the trailing 16.16 fixed-point
    fields; the offset of those fields depends only on the version byte."""
    if end - start < 4:
        return None
    # v0 body is 84 bytes (width at offset 76), v1 adds 12 bytes of
    # 64-bit times (width at offset 88)
    off = start + (88 if payload[start] == 1 else 76)
    if off + 8 > end:
        return None
    w, h = struct.unpack(">II", payload[off:off + 8])
    return w >> 16, h >> 16


def _webp_dims(payload: bytes) -> tuple[int, int] | None:
    """Walk RIFF chunks to the first VP8X (canvas dims) or lossy VP8 frame
    header (sync-code-validated 14-bit dims)."""
    i = 12  # past RIFF header + "WEBP" form type
    n = len(payload)
    while i + 8 <= n:
        fourcc = payload[i:i + 4]
        size = struct.unpack("<I", payload[i + 4:i + 8])[0]
        body = payload[i + 8:i + 8 + size]
        if fourcc == b"VP8X" and len(body) >= 10:
            w = 1 + int.from_bytes(body[4:7], "little")
            h = 1 + int.from_bytes(body[7:10], "little")
            return w, h
        if fourcc == b"VP8 " and len(body) >= 10:
            if body[3:6] != b"\x9d\x01\x2a":  # frame sync code
                return None
            w = struct.unpack("<H", body[6:8])[0] & 0x3FFF
            h = struct.unpack("<H", body[8:10])[0] & 0x3FFF
            return w, h
        i += 8 + size + (size & 1)  # RIFF chunks are 2-byte aligned
    return None


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
