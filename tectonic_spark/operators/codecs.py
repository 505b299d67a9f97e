"""Pure-Python codecs for three REAL media formats (VERDICT r3 item 2):

* **BMP** — 24-bit uncompressed Windows bitmap (BITMAPFILEHEADER +
  BITMAPINFOHEADER, BGR rows bottom-up, 4-byte row padding);
* **WAV** — RIFF/WAVE, 8-bit unsigned mono PCM;
* **Y4M** — YUV4MPEG2, uncompressed 4:2:0 frames (plain-text header,
  ``FRAME\\n`` markers, raw Y/Cb/Cr planes).

These are real interchange formats any media tool reads — chosen because
uncompressed headers + samples need no C library, so the ``fake=False``
decode path executes end-to-end in this container. Compressed baseline
JPEG decodes natively too since r5 (:mod:`tectonic_spark.operators.jpeg`);
the remaining compressed formats (MP3/H.264) swap to soundfile/pyav
without touching the Spark-side plumbing. Golden fixtures live in
tests/fixtures/ and are byte-compared against these encoders.

No reference analog (the reference stops at byte parsing; SURVEY §2.A).
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------- BMP

_BMP_HEADER_BYTES = 54  # 14 file header + 40 BITMAPINFOHEADER


def bmp_row_bytes(width: int) -> int:
    return (width * 3 + 3) // 4 * 4


def encode_bmp(width: int, height: int, pixels: bytes) -> bytes:
    """24-bit BMP from raw BGR bytes (len == width*height*3, top-down
    row-major). Rows are written bottom-up with 4-byte padding per spec."""
    if len(pixels) != width * height * 3:
        raise ValueError("pixels must be width*height*3 BGR bytes")
    row = width * 3
    padded = bmp_row_bytes(width)
    size = _BMP_HEADER_BYTES + padded * height
    out = bytearray()
    out += b"BM" + struct.pack("<IHHI", size, 0, 0, _BMP_HEADER_BYTES)
    out += struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, padded * height, 2835, 2835, 0, 0
    )
    pad = b"\x00" * (padded - row)
    for y in range(height - 1, -1, -1):  # bottom-up
        out += pixels[y * row : (y + 1) * row] + pad
    return bytes(out)


def decode_bmp(data: bytes) -> tuple[int, int, bytes]:
    """→ (width, height, BGR bytes top-down). Only the 24-bit uncompressed
    profile is implemented; anything else raises NotImplementedError (a
    production build routes those to Pillow)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP stream")
    (offset,) = struct.unpack_from("<I", data, 10)
    hdr_size, width, height = struct.unpack_from("<Iii", data, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", data, 26)
    if hdr_size < 40 or bpp != 24 or compression != 0 or height <= 0:
        raise NotImplementedError(
            "only 24-bit uncompressed bottom-up BMP is decoded natively; "
            "plug Pillow for other profiles"
        )
    row = width * 3
    padded = bmp_row_bytes(width)
    pixels = bytearray(row * height)
    for y in range(height):
        src = offset + (height - 1 - y) * padded
        pixels[y * row : (y + 1) * row] = data[src : src + row]
    return width, height, bytes(pixels)


def resize_bmp_nearest(data: bytes, new_w: int, new_h: int) -> bytes:
    """Nearest-neighbor resize, decode → sample → re-encode. The real
    resize path m03 runs (not header rewriting)."""
    w, h, px = decode_bmp(data)
    out = bytearray(new_w * new_h * 3)
    for y in range(new_h):
        sy = y * h // new_h
        src_row = sy * w * 3
        dst_row = y * new_w * 3
        for x in range(new_w):
            sx = x * w // new_w
            s = src_row + sx * 3
            d = dst_row + x * 3
            out[d : d + 3] = px[s : s + 3]
    return encode_bmp(new_w, new_h, bytes(out))


# ---------------------------------------------------------------------- WAV

_WAV_HEADER_BYTES = 44


def encode_wav(samples: bytes, sample_rate: int = 8000) -> bytes:
    """8-bit unsigned mono PCM RIFF/WAVE."""
    n = len(samples)
    out = bytearray()
    out += b"RIFF" + struct.pack("<I", 36 + n) + b"WAVE"
    out += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate, 1, 8)
    out += b"data" + struct.pack("<I", n)
    out += samples
    return bytes(out)


def decode_wav(data: bytes) -> tuple[int, bytes]:
    """→ (sample_rate, u8 PCM samples). Walks RIFF chunks; only PCM
    (format 1) 8-bit mono is decoded natively."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV stream")
    pos = 12
    rate, bits, channels, fmt = None, None, None, None
    samples = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            fmt, channels, rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            samples = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt != 1 or bits != 8 or channels != 1 or samples is None:
        raise NotImplementedError(
            "only PCM u8 mono WAV is decoded natively; plug soundfile/ffmpeg "
            "for other encodings"
        )
    return rate, samples


# ---------------------------------------------------------------------- Y4M

_Y4M_MAGIC = b"YUV4MPEG2 "
_Y4M_FRAME = b"FRAME\n"


def y4m_header(width: int, height: int) -> bytes:
    return _Y4M_MAGIC + f"W{width} H{height} F25:1 Ip A1:1".encode() + b"\n"


def frame_bytes_420(width: int, height: int) -> int:
    return width * height * 3 // 2


def encode_y4m(width: int, height: int, frames: list[bytes]) -> bytes:
    """YUV4MPEG2 stream, 4:2:0 (dims must be even); each frame is the raw
    Y plane followed by quarter-size Cb and Cr planes."""
    if width % 2 or height % 2:
        raise ValueError("4:2:0 needs even dimensions")
    fb = frame_bytes_420(width, height)
    out = bytearray(y4m_header(width, height))
    for fr in frames:
        if len(fr) != fb:
            raise ValueError(f"frame must be {fb} bytes (got {len(fr)})")
        out += _Y4M_FRAME + fr
    return bytes(out)


def decode_y4m(data: bytes) -> tuple[int, int, list[bytes]]:
    """→ (width, height, frames). Parses the plain-text stream header
    (W/H tokens; C tag other than 420 variants raises) and splits frames."""
    if not data.startswith(_Y4M_MAGIC):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = data.index(b"\n")
    width = height = None
    for tok in data[len(_Y4M_MAGIC) : nl].split(b" "):
        if tok[:1] == b"W":
            width = int(tok[1:])
        elif tok[:1] == b"H":
            height = int(tok[1:])
        elif tok[:1] == b"C" and not tok[1:].startswith(b"420"):
            raise NotImplementedError("only 4:2:0 Y4M is decoded natively")
    if width is None or height is None:
        raise ValueError("Y4M header missing W/H")
    fb = frame_bytes_420(width, height)
    frames = []
    pos = nl + 1
    while pos < len(data):
        if data[pos : pos + 6] != _Y4M_FRAME:
            raise ValueError(f"bad FRAME marker at byte {pos}")
        frames.append(data[pos + 6 : pos + 6 + fb])
        pos += 6 + fb
    return width, height, frames
