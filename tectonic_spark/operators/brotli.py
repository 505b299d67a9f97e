"""Pure-Python RFC 7932 (brotli) bit-stream codec.

Scope (r13: the two r12 named boundaries are CLOSED — the full
decoder):

* **Decoder** (``decompress``): the FULL RFC 7932 layer — stream
  header, uncompressed / metadata / compressed meta-blocks, simple and
  complex prefix codes (incl. the 16/17 repeat forms and the
  degenerate single-code cases), multiple block types with block
  switching, literal/distance context maps (RLE + inverse-MTF), all
  four literal-context modes (LSB6/MSB6/UTF8/Signed via the vendored
  §7.1 lookup tables), ``NPOSTFIX``/``NDIRECT`` distance buckets, the
  4-slot distance ring buffer with all 16 short codes, window-bounded
  LZ77 copies, and **§8 static-dictionary references** — the vendored
  ~122 KB Appendix-A dictionary (``brotli_dict.bin``) with all 121
  Appendix-B word transforms (omit-first/omit-last, UTF-8-aware
  ferment-first/ferment-all, prefixes/suffixes).
* **Vendored-table provenance**: the dictionary blob was extracted in
  this container from the system libbrotli 1.0.9
  (``libbrotlicommon.so.1`` ``BrotliGetDictionary``; 122,784 bytes,
  sha256 pinned below and re-checked at load). The §7.1 context
  tables and the Appendix-B transform table are printed in RFC 7932
  itself; the copies below were cross-extracted from the same library
  (``_kBrotliContextLookupTable``, ``BrotliTransformDictionaryWord``
  probes) and are pinned byte-for-byte against it in
  tests/test_brotli.py.
* **Encoder** (``compress``): a valid-subset writer used by fixtures
  and round-trip tests — uncompressed meta-blocks, literals-only, and
  greedy hash-chain LZ77 with explicit distances plus the
  last-distance short code. One block type per category, ``NPOSTFIX=0
  NDIRECT=0``; prefix codes serialized in both the simple and complex
  forms. It emits nothing the decoder special-cases: the two sides
  share only the published tables.
* **Native fast path** (``native_decompress`` / ``native_compress``):
  optional ctypes bindings of the container's ``libbrotlidec.so.1`` /
  ``libbrotlienc.so.1``, used (a) by the WARC hot path when available
  — pure Python at ~1.5 MB/s/core on header-bound small pages is
  ~30× off C — and (b) by the cross-implementation test suite. The
  pure-Python codec remains the specified, test-pinned
  implementation; the native path is differential-tested against it
  (the GIF scalar/vectorized pattern).

Verification: cross-implementation. tests/test_brotli.py pins
``decompress`` bit-exact against REAL ``libbrotlienc`` streams at
quality 1..11 over a text/binary/HTML matrix (q>=4 exercises the
dictionary + UTF8 context paths), pins every one of the 121 transforms
against ``BrotliTransformDictionaryWord`` across all word lengths, and
differential-fuzzes both directions (our encoder -> libbrotlidec, and
libbrotlienc -> our decoder). Hand-assembled per-feature RFC streams
cover what neither encoder emits. (An earlier revision of this module
claimed no independent brotli implementation exists in this container;
that was wrong — the system libbrotli 1.0.9 does, and is now the
cross-check.)

Error taxonomy (the codec-family doctrine): ``EOFError`` truncation,
``ValueError`` structural violations (including nonzero padding,
trailing bytes, and invalid dictionary references), and
``BrotliOutputCapExceeded`` (a ``ValueError``) when decoded output
would exceed the caller's ``max_output`` bomb guard.

100 TB shape: this codec runs inside the per-shard extraction kernels
(Arrow-batched ``mapInPandas``) on individual response bodies — no
shuffle, payload bytes never leave the executor task.
"""

from __future__ import annotations

import hashlib
import os

__all__ = [
    "BrotliOutputCapExceeded",
    "compress",
    "decompress",
    "native_compress",
    "native_decompress",
]


class BrotliOutputCapExceeded(ValueError):
    """Decoded output would exceed the caller-supplied ``max_output``
    bomb guard (a few-KB hostile body can legally expand to GiBs).
    Callers that ingest untrusted bytes (warc.py ``_decode_content``)
    census the body instead of decoding."""


# ---------------------------------------------------------------------------
# published tables (RFC 7932)
# ---------------------------------------------------------------------------

# insert-length codes: (base, extra_bits) per code 0..23  (§5)
_INS_BASE = (
    (0, 0), (1, 0), (2, 0), (3, 0), (4, 0), (5, 0), (6, 1), (8, 1),
    (10, 2), (14, 2), (18, 3), (26, 3), (34, 4), (50, 4), (66, 5),
    (98, 5), (130, 6), (194, 7), (322, 8), (578, 9), (1090, 10),
    (2114, 12), (6210, 14), (22594, 24),
)
# copy-length codes: (base, extra_bits) per code 0..23  (§5)
_CPY_BASE = (
    (2, 0), (3, 0), (4, 0), (5, 0), (6, 0), (7, 0), (8, 0), (9, 0),
    (10, 1), (12, 1), (14, 2), (18, 2), (22, 3), (30, 3), (38, 4),
    (54, 4), (70, 5), (102, 5), (134, 6), (198, 7), (326, 8),
    (582, 9), (1094, 10), (2118, 24),
)
# block-count codes: (base, extra_bits) per code 0..25  (§6)
_BLEN_BASE = (
    (1, 2), (5, 2), (9, 2), (13, 2), (17, 3), (25, 3), (33, 3),
    (41, 3), (49, 4), (65, 4), (81, 4), (97, 4), (113, 5), (145, 5),
    (177, 5), (209, 5), (241, 6), (305, 6), (369, 7), (497, 8),
    (753, 9), (1265, 10), (2289, 11), (4337, 12), (8433, 13),
    (16625, 24),
)
# insert-and-copy cell layout (§5): cells 0..8 for explicit-distance
# commands (symbol = (cell+2)<<6 | (ins&7)<<3 | (cpy&7)); cells 0..1
# reused for symbols < 128 = implicit last-distance
_INS_LUT = (0, 0, 8, 8, 0, 16, 8, 16, 16)
_CPY_LUT = (0, 8, 0, 8, 16, 0, 16, 8, 16)
_CELL = {
    (0, 0): 0, (0, 1): 1, (1, 0): 2, (1, 1): 3, (0, 2): 4,
    (2, 0): 5, (1, 2): 6, (2, 1): 7, (2, 2): 8,
}
# code-length-code symbol order (§3.5)
_CL_ORDER = (1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8, 9, 10, 11, 12, 13, 14, 15)
# the fixed prefix code over code-length-code lengths (§3.5), as a
# 16-entry peek-4-bits LUT: index low bits -> (value, code length)
_CL_FIXED = [(0, 2), (4, 2), (3, 2), (2, 3)] * 4
_CL_FIXED[7] = (1, 4)
_CL_FIXED[15] = (5, 4)
# and the write-side codes, stored LSB-first (they are emitted with
# the plain LSB-first ``write``, so bit0 is the first transmitted bit):
# stream order 0→00, 4→10, 3→01, 2→110, 1→1110, 5→1111
_CL_FIXED_CODE = {0: (0b00, 2), 4: (0b01, 2), 3: (0b10, 2),
                  2: (0b011, 3), 1: (0b0111, 4), 5: (0b1111, 4)}
# short distance codes 0..15 (§4): (ring slot back from last, delta);
# slot 1 = last, 2 = second-to-last, ...
_SHORT_DIST = (
    (1, 0), (2, 0), (3, 0), (4, 0),
    (1, -1), (1, 1), (1, -2), (1, 2), (1, -3), (1, 3),
    (2, -1), (2, 1), (2, -2), (2, 2), (2, -3), (2, 3),
)

# ---------------------------------------------------------------------------
# vendored static-dictionary + context tables (RFC 7932 section 7.1,
# section 8, Appendices A-B; provenance in the module docstring --
# cross-pinned byte-for-byte against the container's libbrotli 1.0.9
# in tests/test_brotli.py)
# ---------------------------------------------------------------------------

# Appendix B word transforms: (prefix, omit_first, omit_last, ferment,
# suffix); ferment 0 = identity, 1 = ferment-first, 2 = ferment-all
# (UTF-8-aware uppercasing per section 8).
_TRANSFORMS = (
    (b'', 0, 0, 0, b''),
    (b'', 0, 0, 0, b' '),
    (b' ', 0, 0, 0, b' '),
    (b'', 1, 0, 0, b''),
    (b'', 0, 0, 1, b' '),
    (b'', 0, 0, 0, b' the '),
    (b' ', 0, 0, 0, b''),
    (b's ', 0, 0, 0, b' '),
    (b'', 0, 0, 0, b' of '),
    (b'', 0, 0, 1, b''),
    (b'', 0, 0, 0, b' and '),
    (b'', 2, 0, 0, b''),
    (b'', 0, 1, 0, b''),
    (b', ', 0, 0, 0, b' '),
    (b'', 0, 0, 0, b', '),
    (b' ', 0, 0, 1, b' '),
    (b'', 0, 0, 0, b' in '),
    (b'', 0, 0, 0, b' to '),
    (b'e ', 0, 0, 0, b' '),
    (b'', 0, 0, 0, b'"'),
    (b'', 0, 0, 0, b'.'),
    (b'', 0, 0, 0, b'">'),
    (b'', 0, 0, 0, b'\n'),
    (b'', 0, 3, 0, b''),
    (b'', 0, 0, 0, b']'),
    (b'', 0, 0, 0, b' for '),
    (b'', 3, 0, 0, b''),
    (b'', 0, 2, 0, b''),
    (b'', 0, 0, 0, b' a '),
    (b'', 0, 0, 0, b' that '),
    (b' ', 0, 0, 1, b''),
    (b'', 0, 0, 0, b'. '),
    (b'.', 0, 0, 0, b''),
    (b' ', 0, 0, 0, b', '),
    (b'', 4, 0, 0, b''),
    (b'', 0, 0, 0, b' with '),
    (b'', 0, 0, 0, b"'"),
    (b'', 0, 0, 0, b' from '),
    (b'', 0, 0, 0, b' by '),
    (b'', 5, 0, 0, b''),
    (b'', 6, 0, 0, b''),
    (b' the ', 0, 0, 0, b''),
    (b'', 0, 4, 0, b''),
    (b'', 0, 0, 0, b'. The '),
    (b'', 0, 0, 2, b''),
    (b'', 0, 0, 0, b' on '),
    (b'', 0, 0, 0, b' as '),
    (b'', 0, 0, 0, b' is '),
    (b'', 0, 7, 0, b''),
    (b'', 0, 1, 0, b'ing '),
    (b'', 0, 0, 0, b'\n\t'),
    (b'', 0, 0, 0, b':'),
    (b' ', 0, 0, 0, b'. '),
    (b'', 0, 0, 0, b'ed '),
    (b'', 9, 0, 0, b''),
    (b'', 7, 0, 0, b''),
    (b'', 0, 6, 0, b''),
    (b'', 0, 0, 0, b'('),
    (b'', 0, 0, 1, b', '),
    (b'', 0, 8, 0, b''),
    (b'', 0, 0, 0, b' at '),
    (b'', 0, 0, 0, b'ly '),
    (b' the ', 0, 0, 0, b' of '),
    (b'', 0, 5, 0, b''),
    (b'', 0, 9, 0, b''),
    (b' ', 0, 0, 1, b', '),
    (b'', 0, 0, 1, b'"'),
    (b'.', 0, 0, 0, b'('),
    (b'', 0, 0, 2, b' '),
    (b'', 0, 0, 1, b'">'),
    (b'', 0, 0, 0, b'="'),
    (b' ', 0, 0, 0, b'.'),
    (b'.com/', 0, 0, 0, b''),
    (b' the ', 0, 0, 0, b' of the '),
    (b'', 0, 0, 1, b"'"),
    (b'', 0, 0, 0, b'. This '),
    (b'', 0, 0, 0, b','),
    (b'.', 0, 0, 0, b' '),
    (b'', 0, 0, 1, b'('),
    (b'', 0, 0, 1, b'.'),
    (b'', 0, 0, 0, b' not '),
    (b' ', 0, 0, 0, b'="'),
    (b'', 0, 0, 0, b'er '),
    (b' ', 0, 0, 2, b' '),
    (b'', 0, 0, 0, b'al '),
    (b' ', 0, 0, 2, b''),
    (b'', 0, 0, 0, b"='"),
    (b'', 0, 0, 2, b'"'),
    (b'', 0, 0, 1, b'. '),
    (b' ', 0, 0, 0, b'('),
    (b'', 0, 0, 0, b'ful '),
    (b' ', 0, 0, 1, b'. '),
    (b'', 0, 0, 0, b'ive '),
    (b'', 0, 0, 0, b'less '),
    (b'', 0, 0, 2, b"'"),
    (b'', 0, 0, 0, b'est '),
    (b' ', 0, 0, 1, b'.'),
    (b'', 0, 0, 2, b'">'),
    (b' ', 0, 0, 0, b"='"),
    (b'', 0, 0, 1, b','),
    (b'', 0, 0, 0, b'ize '),
    (b'', 0, 0, 2, b'.'),
    (b'\xc2\xa0', 0, 0, 0, b''),
    (b' ', 0, 0, 0, b','),
    (b'', 0, 0, 1, b'="'),
    (b'', 0, 0, 2, b'="'),
    (b'', 0, 0, 0, b'ous '),
    (b'', 0, 0, 2, b', '),
    (b'', 0, 0, 1, b"='"),
    (b' ', 0, 0, 1, b','),
    (b' ', 0, 0, 2, b'="'),
    (b' ', 0, 0, 2, b', '),
    (b'', 0, 0, 2, b','),
    (b'', 0, 0, 2, b'('),
    (b'', 0, 0, 2, b'. '),
    (b' ', 0, 0, 2, b'.'),
    (b'', 0, 0, 2, b"='"),
    (b' ', 0, 0, 2, b'. '),
    (b' ', 0, 0, 1, b'="'),
    (b' ', 0, 0, 2, b"='"),
    (b' ', 0, 0, 1, b"='"),
)

# section 7.1 UTF8 context mode: ctx = lut0[p1] | lut1[p2]
_CTX_UTF8_0 = bytes.fromhex(
    "0000000000000000000404000004000000000000000000000000000000000000"
    "080c100c0c140c10181c0c0c200c240c2c2c2c2c2c2c2c2c2c2c202018281c0c"
    "0c3034343430343434303434343434303434343434303434343434180c1c0c0c"
    "0c383c3c3c383c3c3c383c3c3c3c3c383c3c3c3c3c383c3c3c3c3c180c1c0c00"
    "0001000100010001000100010001000100010001000100010001000100010001"
    "0001000100010001000100010001000100010001000100010001000100010001"
    "0203020302030203020302030203020302030203020302030203020302030203"
    "0203020302030203020302030203020302030203020302030203020302030203"
)
_CTX_UTF8_1 = bytes.fromhex(
    "0000000000000000000000000000000000000000000000000000000000000000"
    "0001010101010101010101010101010102020202020202020202010101010101"
    "0102020202020202020202020202020202020202020202020202020101010101"
    "0103030303030303030303030303030303030303030303030303030101010100"
    "0000000000000000000000000000000000000000000000000000000000000000"
    "0000000000000000000000000000000000000000000000000000000000000000"
    "0000000000000000000000000000000000000000000000000000000000000000"
    "0202020202020202020202020202020202020202020202020202020202020202"
)
# section 7.1 Signed context mode: ctx = lut0[p1] | lut1[p2]
_CTX_SIGNED_0 = bytes.fromhex(
    "0008080808080808080808080808080810101010101010101010101010101010"
    "1010101010101010101010101010101010101010101010101010101010101010"
    "1818181818181818181818181818181818181818181818181818181818181818"
    "1818181818181818181818181818181818181818181818181818181818181818"
    "2020202020202020202020202020202020202020202020202020202020202020"
    "2020202020202020202020202020202020202020202020202020202020202020"
    "2828282828282828282828282828282828282828282828282828282828282828"
    "2828282828282828282828282828282830303030303030303030303030303038"
)
_CTX_SIGNED_1 = bytes.fromhex(
    "0001010101010101010101010101010102020202020202020202020202020202"
    "0202020202020202020202020202020202020202020202020202020202020202"
    "0303030303030303030303030303030303030303030303030303030303030303"
    "0303030303030303030303030303030303030303030303030303030303030303"
    "0404040404040404040404040404040404040404040404040404040404040404"
    "0404040404040404040404040404040404040404040404040404040404040404"
    "0505050505050505050505050505050505050505050505050505050505050505"
    "0505050505050505050505050505050506060606060606060606060606060607"
)
# Appendix A dictionary blob (brotli_dict.bin, 122,784 bytes): word
# counts per length 4..24 are 2**bits; offsets are cumulative.
_DICT_SHA256 = '20e42eb1b511c21806d4d227d07e5dd06877d8ce7b3a817f378f313653f35c70'
_DICT_SIZE_BITS = (10, 10, 11, 11, 10, 10, 10, 10, 10, 9, 9, 8, 7, 7, 8, 7, 7, 6, 6, 5, 5)
_DICT_OFFSETS = (0, 4096, 9216, 21504, 35840, 44032, 53248, 63488, 74752, 87040, 93696, 100864, 104704, 106752, 108928, 113536, 115968, 118528, 119872, 121280, 122016, 122784)

_DICT_PATH = os.path.join(os.path.dirname(__file__), "brotli_dict.bin")
_dict_blob: bytes | None = None


def _dictionary() -> bytes:
    """The Appendix-A dictionary blob, loaded once per process and
    verified against the pinned sha256 (a corrupted vendored file must
    fail loudly, not decode garbage)."""
    global _dict_blob
    if _dict_blob is None:
        with open(_DICT_PATH, "rb") as f:
            blob = f.read()
        if hashlib.sha256(blob).hexdigest() != _DICT_SHA256:
            raise ValueError("vendored brotli dictionary is corrupt")
        _dict_blob = blob
    return _dict_blob


def _ferment(buf: bytearray, pos: int) -> int:
    """One §8 'ferment' (UTF-8-aware uppercase) step at ``pos``;
    returns the number of bytes consumed."""
    c = buf[pos]
    if c < 192:
        if 97 <= c <= 122:
            buf[pos] ^= 32
        return 1
    if c < 224:
        if pos + 1 < len(buf):
            buf[pos + 1] ^= 32
        return 2
    if pos + 2 < len(buf):
        buf[pos + 2] ^= 5
    return 3


def _transform_word(word: bytes, tid: int) -> bytes:
    """Apply Appendix-B transform ``tid`` to a dictionary word."""
    prefix, omit_first, omit_last, ferment, suffix = _TRANSFORMS[tid]
    if omit_first > len(word):
        omit_first = len(word)
    end = len(word) - omit_last
    if end < omit_first:  # omitting more than the word has: empty body
        end = omit_first
    body = bytearray(word[omit_first:end])
    if ferment == 1:
        if body:
            _ferment(body, 0)
    elif ferment == 2:
        pos = 0
        while pos < len(body):
            pos += _ferment(body, pos)
    return prefix + bytes(body) + suffix


def _dict_word(cpy_len: int, address: int) -> bytes:
    """Resolve a §8 static-dictionary reference: a copy of length
    ``cpy_len`` whose distance reaches ``address + 1`` bytes past the
    window start. Raises ``ValueError`` on out-of-range lengths or
    transform ids (structural violations per the RFC)."""
    if not 4 <= cpy_len <= 24:
        raise ValueError(
            f"dictionary reference with copy length {cpy_len} (must be 4..24)"
        )
    ndbits = _DICT_SIZE_BITS[cpy_len - 4]
    word_idx = address & ((1 << ndbits) - 1)
    tid = address >> ndbits
    if tid >= len(_TRANSFORMS):
        raise ValueError(f"dictionary transform id {tid} out of range")
    off = _DICT_OFFSETS[cpy_len - 4] + word_idx * cpy_len
    return _transform_word(_dictionary()[off : off + cpy_len], tid)


# ---------------------------------------------------------------------------
# bit I/O (LSB-first, per §2)
# ---------------------------------------------------------------------------


class _BitReader:
    __slots__ = ("data", "byte", "buf", "cnt")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.byte = 0  # next byte to pull into buf
        self.buf = 0
        self.cnt = 0

    def _fill(self, n: int) -> None:
        while self.cnt < n:
            chunk = self.data[self.byte : self.byte + 4]
            if not chunk:
                return
            self.buf |= int.from_bytes(chunk, "little") << self.cnt
            self.cnt += 8 * len(chunk)
            self.byte += len(chunk)

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        if self.cnt < n:
            raise EOFError("truncated brotli stream")
        v = self.buf & ((1 << n) - 1)
        self.buf >>= n
        self.cnt -= n
        return v

    def peek(self, n: int) -> int:
        """Up to ``n`` bits without consuming; zero-padded past the end
        (consume() still enforces the true end)."""
        self._fill(n)
        return self.buf & ((1 << n) - 1)

    def consume(self, n: int) -> None:
        if self.cnt < n:
            raise EOFError("truncated brotli stream")
        self.buf >>= n
        self.cnt -= n

    @property
    def bit_pos(self) -> int:
        return self.byte * 8 - self.cnt

    def align_byte(self) -> None:
        pad = -self.bit_pos % 8
        if pad and self.read(pad) != 0:
            raise ValueError("nonzero padding bits at byte boundary")

    def read_bytes(self, n: int) -> bytes:
        """``n`` raw bytes; caller must be byte-aligned."""
        pos = self.bit_pos
        if pos % 8:  # pragma: no cover — callers align first
            raise ValueError("byte read while not aligned")
        start = pos // 8
        if start + n > len(self.data):
            raise EOFError("truncated brotli stream")
        self.byte = start + n
        self.buf = 0
        self.cnt = 0
        return self.data[start : start + n]


class _BitWriter:
    __slots__ = ("buf", "cnt", "out")

    def __init__(self) -> None:
        self.buf = 0
        self.cnt = 0
        self.out = bytearray()

    def write(self, value: int, n: int) -> None:
        self.buf |= (value & ((1 << n) - 1)) << self.cnt
        self.cnt += n
        while self.cnt >= 8:
            self.out.append(self.buf & 0xFF)
            self.buf >>= 8
            self.cnt -= 8

    def write_code(self, code: int, length: int) -> None:
        """A canonical (MSB-first) prefix code, transmitted first bit
        first."""
        for k in range(length - 1, -1, -1):
            self.write((code >> k) & 1, 1)

    def align_byte(self) -> None:
        if self.cnt:
            self.out.append(self.buf & 0xFF)
            self.buf = 0
            self.cnt = 0

    def write_bytes(self, data: bytes) -> None:
        if self.cnt:  # pragma: no cover — callers align first
            raise ValueError("byte write while not aligned")
        self.out += data

    def getvalue(self) -> bytes:
        self.align_byte()
        return bytes(self.out)


# ---------------------------------------------------------------------------
# prefix codes
# ---------------------------------------------------------------------------

_CONST = "const"  # marker for 0-bit single-symbol codes


_TABLE_BITS = 10  # flat-table cap: longer codes fall back bit-serially


def _huff_decoder(lengths: list[int]):
    """Canonical code-lengths → ``(table, nbits, long_codes)``: a flat
    LSB-indexed decode table over ``nbits = min(maxlen, 10)`` bits,
    plus a (length, code) → symbol dict for the rare longer codes
    (building a full 2^15 table per tree dominated small-body decode).
    Codes are canonical MSB-first (assigned in (length, symbol) order)
    read first-bit-first, so the table index is the bit-reversed code.
    Rejects over/under-subscribed length sets (RFC 7932 requires
    complete codes)."""
    maxlen = max(lengths)
    kraft = sum((1 << (maxlen - l)) for l in lengths if l)
    if kraft != (1 << maxlen):
        raise ValueError("prefix code is not complete")
    bl_count = [0] * (maxlen + 1)
    for l in lengths:
        if l:
            bl_count[l] += 1
    next_code = [0] * (maxlen + 2)
    code = 0
    for l in range(1, maxlen + 1):
        code = (code + bl_count[l - 1]) << 1
        next_code[l] = code
    nbits = min(maxlen, _TABLE_BITS)
    table: list = [None] * (1 << nbits)
    long_codes: dict[tuple[int, int], int] = {}
    for sym, l in enumerate(lengths):
        if not l:
            continue
        c = next_code[l]
        next_code[l] += 1
        if l > nbits:
            long_codes[(l, c)] = sym
            continue
        rev = 0
        for k in range(l):
            rev = (rev << 1) | ((c >> k) & 1)
        entry = (sym, l)
        for idx in range(rev, 1 << nbits, 1 << l):
            table[idx] = entry
    return table, nbits, long_codes


def _read_sym(br: _BitReader, dec) -> int:
    if dec[0] is _CONST:
        return dec[1]
    table, nbits, long_codes = dec
    entry = table[br.peek(nbits)]
    if entry is not None:
        br.consume(entry[1])
        return entry[0]
    # long code: accumulate MSB-first past the table width
    code = 0
    bits = br.peek(nbits)
    for k in range(nbits):
        code = (code << 1) | ((bits >> k) & 1)
    br.consume(nbits)
    length = nbits
    while length < 16:
        code = (code << 1) | br.read(1)
        length += 1
        sym = long_codes.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("prefix code walk exceeded 15 bits")


_SIMPLE_SHAPES = {1: (0,), 2: (1, 1), 3: (1, 2, 2)}


def _read_prefix_code(br: _BitReader, alphabet: int):
    """One prefix-code description (§3.4/§3.5) → decoder handle."""
    hskip = br.read(2)
    if hskip == 1:  # simple code
        nsym = br.read(2) + 1
        width = max(1, (alphabet - 1).bit_length())
        syms = []
        for _ in range(nsym):
            s = br.read(width)
            if s >= alphabet:
                raise ValueError(f"simple-code symbol {s} outside alphabet")
            if s in syms:
                raise ValueError("duplicate simple-code symbol")
            syms.append(s)
        if nsym == 1:
            return (_CONST, syms[0])
        if nsym == 4:
            shape = (1, 2, 3, 3) if br.read(1) else (2, 2, 2, 2)
        else:
            shape = _SIMPLE_SHAPES[nsym]
        lengths = [0] * alphabet
        for s, l in zip(syms, shape):
            lengths[s] = l
        return _huff_decoder(lengths)

    # complex code: first the code-length code, in _CL_ORDER with the
    # first `hskip` entries skipped, each via the fixed code
    cl_lens = [0] * 18
    space = 32
    num_codes = 0
    i = hskip
    while i < 18 and space > 0:
        v, nbits = _CL_FIXED[br.peek(4)]
        br.consume(nbits)
        cl_lens[_CL_ORDER[i]] = v
        if v:
            space -= 32 >> v
            num_codes += 1
        i += 1
    if num_codes == 1:
        # degenerate: the single code-length symbol decodes for free
        cl_dec = (_CONST, next(s for s in range(18) if cl_lens[s]))
    elif space != 0:
        raise ValueError("code-length code over/under-subscribed")
    else:
        cl_dec = _huff_decoder(cl_lens)

    # then the symbol code lengths, with 16/17 repeat accumulation
    lengths = [0] * alphabet
    space = 32768
    prev_len = 8  # kDefaultCodeLength
    repeat = 0
    repeat_len = 0
    i = 0
    while i < alphabet and space > 0:
        sym = _read_sym(br, cl_dec)
        if sym < 16:
            lengths[i] = sym
            i += 1
            repeat = 0
            if sym:
                prev_len = sym
                space -= 32768 >> sym
        else:
            extra = 2 if sym == 16 else 3
            new_len = prev_len if sym == 16 else 0
            if repeat_len != new_len:
                repeat = 0
                repeat_len = new_len
            old = repeat
            if repeat > 0:
                repeat = (repeat - 2) << extra
            repeat += br.read(extra) + 3
            n = repeat - old
            if i + n > alphabet:
                raise ValueError("code-length repeat overruns alphabet")
            if repeat_len:
                for k in range(i, i + n):
                    lengths[k] = repeat_len
                space -= n << (15 - repeat_len)
            i += n
    if space < 0:
        raise ValueError("prefix code over-subscribed")
    if space > 0:
        nz = [s for s, l in enumerate(lengths) if l]
        if len(nz) == 1:
            return (_CONST, nz[0])
        raise ValueError("prefix code under-subscribed")
    return _huff_decoder(lengths)


def _read_nbltypes(br: _BitReader) -> int:
    """The 1..256 count code used by NBLTYPES/NTREES (§9.2)."""
    if not br.read(1):
        return 1
    k = br.read(3)
    return (1 << k) + 1 + br.read(k)


def _read_context_map(br: _BitReader, n_trees: int, size: int) -> list[int]:
    """Context map (§7.3): RLE-of-zeros prefix + prefix-coded values +
    optional inverse move-to-front."""
    max_run = br.read(4) + 1 if br.read(1) else 0
    dec = _read_prefix_code(br, n_trees + max_run)
    cmap: list[int] = []
    while len(cmap) < size:
        sym = _read_sym(br, dec)
        if sym == 0:
            cmap.append(0)
        elif sym <= max_run:
            n = (1 << sym) + br.read(sym)
            if len(cmap) + n > size:
                raise ValueError("context-map zero run overruns map")
            cmap.extend([0] * n)
        else:
            v = sym - max_run
            if v >= n_trees:
                raise ValueError("context-map value outside tree count")
            cmap.append(v)
    if br.read(1):  # inverse MTF
        mtf = list(range(256))
        for i, v in enumerate(cmap):
            val = mtf[v]
            if v:
                del mtf[v]
                mtf.insert(0, val)
            cmap[i] = val
    return cmap


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _read_wbits(br: _BitReader) -> int:
    if not br.read(1):
        return 16
    n = br.read(3)
    if n:
        return 17 + n
    n = br.read(3)
    if n == 0:
        return 17
    if n == 1:
        raise ValueError("reserved WBITS pattern")
    return 8 + n


class _BlockState:
    """Per-category (L/I/D) block-type machinery (§6)."""

    __slots__ = ("n", "btype", "prev", "remaining", "btype_dec", "blen_dec")

    def __init__(self, br: _BitReader) -> None:
        self.n = _read_nbltypes(br)
        self.btype = 0
        self.prev = 1
        if self.n >= 2:
            self.btype_dec = _read_prefix_code(br, self.n + 2)
            self.blen_dec = _read_prefix_code(br, 26)
            self.remaining = self._read_blen(br)
        else:
            self.btype_dec = self.blen_dec = None
            self.remaining = 1 << 28  # never exhausted within one block

    def _read_blen(self, br: _BitReader) -> int:
        base, extra = _BLEN_BASE[_read_sym(br, self.blen_dec)]
        return base + br.read(extra)

    def switch(self, br: _BitReader) -> None:
        sym = _read_sym(br, self.btype_dec)
        if sym == 0:
            new = self.prev
        elif sym == 1:
            new = (self.btype + 1) % self.n
        else:
            new = sym - 2
        self.prev = self.btype
        self.btype = new
        self.remaining = self._read_blen(br)

    def tick(self, br: _BitReader) -> int:
        if self.remaining == 0:
            if self.n < 2:
                raise ValueError("block length exhausted without types")
            self.switch(br)
        self.remaining -= 1
        return self.btype


def decompress(data: bytes, *, max_output: int = 1 << 31) -> bytes:
    """Decode one complete brotli stream. Raises ``EOFError`` on
    truncation, ``ValueError`` on structural violations (including
    nonzero padding / trailing bytes and invalid dictionary
    references), ``BrotliOutputCapExceeded`` past the output cap."""
    br = _BitReader(data)
    wbits = _read_wbits(br)
    window = (1 << wbits) - 16
    out = bytearray()
    ring = [16, 15, 11, 4]  # ring[(idx-1)&3] is the LAST distance
    idx = 0
    p1 = p2 = 0
    last = False
    while not last:
        last = bool(br.read(1))
        if last and br.read(1):  # ISLASTEMPTY
            break
        mnib = br.read(2)
        if mnib == 3:  # metadata meta-block (§9.2): skipped bytes
            # a metadata block MAY carry ISLAST — the reference
            # implementation accepts and ends the stream there (pinned
            # in tests against libbrotlidec; an earlier revision
            # rejected this shape)
            if br.read(1):
                raise ValueError("reserved metadata bit set")
            skip_bytes = br.read(2)
            skip = 0
            if skip_bytes:
                skip = br.read(8 * skip_bytes) + 1
                if skip - 1 < (1 << (8 * (skip_bytes - 1))) and skip_bytes > 1:
                    raise ValueError("non-minimal metadata skip length")
            br.align_byte()
            br.read_bytes(skip)
            continue
        mlen = br.read(4 * (4 + mnib)) + 1
        if mnib and (mlen - 1) >> (4 * (3 + mnib)) == 0:
            raise ValueError("non-minimal MNIBBLES for MLEN")
        if len(out) + mlen > max_output:
            raise BrotliOutputCapExceeded("output exceeds max_output")
        if not last and br.read(1):  # ISUNCOMPRESSED
            br.align_byte()
            out += br.read_bytes(mlen)
            if out:
                p1 = out[-1]
                p2 = out[-2] if len(out) > 1 else 0
            continue

        # --- compressed meta-block header (§9.2) ---
        bs_l = _BlockState(br)
        bs_i = _BlockState(br)
        bs_d = _BlockState(br)
        npostfix = br.read(2)
        ndirect = br.read(4) << npostfix
        modes = [br.read(2) for _ in range(bs_l.n)]
        ntrees_l = _read_nbltypes(br)
        cmap_l = (
            _read_context_map(br, ntrees_l, 64 * bs_l.n)
            if ntrees_l >= 2
            else [0] * (64 * bs_l.n)
        )
        ntrees_d = _read_nbltypes(br)
        cmap_d = (
            _read_context_map(br, ntrees_d, 4 * bs_d.n)
            if ntrees_d >= 2
            else [0] * (4 * bs_d.n)
        )
        lit_dec = [_read_prefix_code(br, 256) for _ in range(ntrees_l)]
        # the common shape (one literal block type, one tree, every
        # code inside the flat table) gets an inlined per-byte loop
        lit_fast = (
            lit_dec[0]
            if bs_l.n == 1
            and ntrees_l == 1
            and lit_dec[0][0] is not _CONST
            and not lit_dec[0][2]
            else None
        )
        cmd_dec = [_read_prefix_code(br, 704) for _ in range(bs_i.n)]
        dist_alpha = 16 + ndirect + (48 << npostfix)
        dist_dec = [_read_prefix_code(br, dist_alpha) for _ in range(ntrees_d)]
        postfix_mask = (1 << npostfix) - 1

        # --- command loop (§9.3) ---
        mpos = 0
        while mpos < mlen:
            bt_i = bs_i.tick(br)
            cmd = _read_sym(br, cmd_dec[bt_i])
            cell = cmd >> 6
            implicit = cell < 2
            if not implicit:
                cell -= 2
            ins_code = _INS_LUT[cell] + ((cmd >> 3) & 7)
            cpy_code = _CPY_LUT[cell] + (cmd & 7)
            base, extra = _INS_BASE[ins_code]
            ins_len = base + br.read(extra)
            base, extra = _CPY_BASE[cpy_code]
            cpy_len = base + br.read(extra)

            if lit_fast is not None and ins_len:
                # fast path (one literal block type, one tree): the
                # bit reservoir is pulled into locals so the per-byte
                # cost is one table lookup + integer ops, no calls
                table, maxlen, _lc = lit_fast
                mask = (1 << maxlen) - 1
                buf, cnt, bpos = br.buf, br.cnt, br.byte
                data = br.data
                for _ in range(ins_len):
                    while cnt < maxlen:
                        chunk = data[bpos : bpos + 8]
                        if not chunk:
                            break
                        buf |= int.from_bytes(chunk, "little") << cnt
                        cnt += 8 * len(chunk)
                        bpos += len(chunk)
                    byte, length = table[buf & mask]
                    if length > cnt:
                        raise EOFError("truncated brotli stream")
                    buf >>= length
                    cnt -= length
                    out.append(byte)
                br.buf, br.cnt, br.byte = buf, cnt, bpos
                bs_l.remaining -= ins_len
                mpos += ins_len
                p1 = out[-1]
                p2 = out[-2] if len(out) > 1 else 0
            else:
                for _ in range(ins_len):
                    bt_l = bs_l.tick(br)
                    mode = modes[bt_l]
                    if mode == 0:
                        ctx = p1 & 0x3F
                    elif mode == 1:
                        ctx = p1 >> 2
                    elif mode == 2:
                        ctx = _CTX_UTF8_0[p1] | _CTX_UTF8_1[p2]
                    else:
                        ctx = _CTX_SIGNED_0[p1] | _CTX_SIGNED_1[p2]
                    byte = _read_sym(br, lit_dec[cmap_l[64 * bt_l + ctx]])
                    out.append(byte)
                    p2 = p1
                    p1 = byte
                    mpos += 1
            if mpos >= mlen:
                if mpos > mlen:
                    raise ValueError("insert run overruns meta-block")
                break  # final command: copy part unused, distance unread

            if implicit:
                distance = ring[(idx - 1) & 3]
            else:
                bt_d = bs_d.tick(br)
                dctx = min(cpy_len, 5) - 2
                dsym = _read_sym(br, dist_dec[cmap_d[4 * bt_d + dctx]])
                if dsym == 0:
                    distance = ring[(idx - 1) & 3]
                elif dsym < 16:
                    slot, delta = _SHORT_DIST[dsym]
                    distance = ring[(idx - slot) & 3] + delta
                    if distance <= 0:
                        raise ValueError("short distance code yields <= 0")
                elif dsym < 16 + ndirect:
                    distance = dsym - 16 + 1
                else:
                    h = (dsym - ndirect - 16) >> npostfix
                    lcode = (dsym - ndirect - 16) & postfix_mask
                    nbits = 1 + (h >> 1)
                    offset = ((2 + (h & 1)) << nbits) - 4
                    distance = (
                        ((offset + br.read(nbits)) << npostfix)
                        + lcode + ndirect + 1
                    )
            max_dist = min(len(out), window)
            if distance > max_dist:
                # §8: a back-reference past the window start is a
                # static-dictionary word (the distance ring buffer is
                # NOT updated for dictionary references, per §4)
                word = _dict_word(cpy_len, distance - max_dist - 1)
                if mpos + len(word) > mlen:
                    raise ValueError("dictionary word overruns meta-block")
                if len(out) + len(word) > max_output:
                    raise BrotliOutputCapExceeded(
                        "output exceeds max_output"
                    )
                out += word
                mpos += len(word)
            else:
                if not implicit and dsym != 0:
                    ring[idx & 3] = distance
                    idx += 1
                if mpos + cpy_len > mlen:
                    raise ValueError("copy run overruns meta-block")
                if distance >= cpy_len:  # non-overlapping: one slice copy
                    start = len(out) - distance
                    out += out[start : start + cpy_len]
                else:
                    for _ in range(cpy_len):
                        out.append(out[-distance])
                mpos += cpy_len
            if out:
                p1 = out[-1]
                p2 = out[-2] if len(out) > 1 else 0

    br.align_byte()
    if br.bit_pos // 8 != len(data):
        raise ValueError("trailing bytes after brotli stream end")
    return bytes(out)


# ---------------------------------------------------------------------------
# encoder (valid subset)
# ---------------------------------------------------------------------------


def _huff_lengths(freqs: dict[int, int], maxlen: int) -> dict[int, int]:
    """Frequencies → complete length-limited canonical code lengths."""
    import heapq

    syms = sorted(freqs)
    if len(syms) == 1:
        return {syms[0]: 0}  # caller emits the simple single-symbol form
    heap = [(f, s, (s,)) for s, f in sorted(freqs.items())]
    heapq.heapify(heap)
    depth = dict.fromkeys(syms, 0)
    while len(heap) > 1:
        f1, t1, m1 = heapq.heappop(heap)
        f2, t2, m2 = heapq.heappop(heap)
        for s in m1 + m2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, min(t1, t2), m1 + m2))
    # clamp and re-balance the Kraft sum to exactly 1
    full = 1 << maxlen
    lengths = {s: min(d, maxlen) for s, d in depth.items()}
    kraft = sum(full >> l for l in lengths.values())
    while kraft > full:  # over-subscribed after clamping: lengthen the
        # least-frequent symbol that still has room
        cand = min(
            (s for s, l in lengths.items() if l < maxlen),
            key=lambda s: (freqs[s], -lengths[s]),
        )
        kraft -= full >> (lengths[cand] + 1)
        lengths[cand] += 1
    deficit = full - kraft
    while deficit:  # under-subscribed: shorten greedily (binary fill)
        cand = max(
            (s for s, l in lengths.items() if l > 1 and (full >> l) <= deficit),
            key=lambda s: (full >> lengths[s], -freqs[s], s),
        )
        deficit -= full >> lengths[cand]
        lengths[cand] -= 1
    return lengths


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    out: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len = 0
    for s in sorted(lengths, key=lambda s: (lengths[s], s)):
        l = lengths[s]
        code <<= l - prev_len
        out[s] = (code, l)
        code += 1
        prev_len = l
    return out


def _write_prefix_code(
    w: _BitWriter, lengths: dict[int, int], alphabet: int
) -> dict[int, tuple[int, int]]:
    """Serialize a prefix code (simple form when ≤4 symbols, else the
    complex code-length form) and return the canonical codes."""
    width = max(1, (alphabet - 1).bit_length())
    syms = sorted(lengths)
    if len(syms) == 1:
        w.write(1, 2)  # simple
        w.write(0, 2)  # NSYM=1
        w.write(syms[0], width)
        return {syms[0]: (0, 0)}
    if len(syms) <= 4:
        w.write(1, 2)
        w.write(len(syms) - 1, 2)
        # list symbols by (length, symbol) so positional shape lengths
        # match the canonical assignment
        ordered = sorted(syms, key=lambda s: (lengths[s], s))
        for s in ordered:
            w.write(s, width)
        if len(syms) == 4:
            shapes = sorted(lengths.values())
            if shapes == [2, 2, 2, 2]:
                w.write(0, 1)
            elif shapes == [1, 2, 3, 3]:
                w.write(1, 1)
            else:  # pragma: no cover — Huffman over 4 symbols
                raise AssertionError(f"unexpected 4-symbol shape {shapes}")
        return _canonical_codes(lengths)

    # complex form
    seq = [0] * alphabet
    for s, l in lengths.items():
        seq[s] = l
    while seq and seq[-1] == 0:
        seq.pop()
    stream = _cl_symbol_stream(seq)
    cl_freq: dict[int, int] = {}
    for v, _e, _n in stream:
        cl_freq[v] = cl_freq.get(v, 0) + 1
    if len(cl_freq) == 1:
        (v,) = cl_freq
        # complete-uniform code: decoder's const code-length symbol
        # self-terminates on the Kraft space
        if v == 0 or len(seq) != (1 << v):  # pragma: no cover
            raise AssertionError("uniform lengths must fill the code space")
        w.write(0, 2)  # complex, HSKIP=0
        for i in range(18):
            code, n = _CL_FIXED_CODE[1 if _CL_ORDER[i] == v else 0]
            # single nonzero entry: length 1 for symbol v, zeros elsewhere
            w.write(code, n)
        return _canonical_codes(lengths)
    cl_lens = _huff_lengths(cl_freq, 5)
    cl_codes = _canonical_codes(cl_lens)
    w.write(0, 2)  # complex, HSKIP=0
    space = 32
    for i in range(18):
        v = cl_lens.get(_CL_ORDER[i], 0)
        code, n = _CL_FIXED_CODE[v]
        w.write(code, n)
        if v:
            space -= 32 >> v
            if space <= 0:
                break
    for v, extra, nbits in stream:
        code, l = cl_codes[v]
        w.write_code(code, l)
        if nbits:
            w.write(extra, nbits)
    return _canonical_codes(lengths)


def _run_extras(run: int, factor: int) -> list[int]:
    """Extra-bit values for a 16/17 chain totalling EXACTLY ``run``
    repeats, mirroring the decoder's accumulation rule
    ``r' = (r-2)*factor + 3 + e`` (r12 — without run codes, a sparse
    704-symbol command alphabet costs ~700 header symbols per
    meta-block and header decode dominates small-body work). The
    per-depth reachable ranges are contiguous, so any run >= 3 up to
    alphabet size has an exact chain."""
    lo, hi = 3, 2 + factor
    ranges = [(lo, hi)]
    while ranges[-1][1] < run:
        lo, hi = ranges[-1]
        ranges.append(((lo - 2) * factor + 3, (hi - 2) * factor + 2 + factor))
    targets = [run]
    for k in range(len(ranges) - 2, -1, -1):
        nxt = targets[0]
        # pick r_k with (r_k-2)*factor+3 <= nxt <= (r_k-2)*factor+2+factor
        r_k = 2 + (nxt - 3) // factor
        if (r_k - 2) * factor + 2 + factor < nxt:  # pragma: no cover
            r_k += 1
        r_k = max(ranges[k][0], min(ranges[k][1], r_k))
        targets.insert(0, r_k)
    extras = [targets[0] - 3]
    for prev, cur in zip(targets, targets[1:]):
        extras.append(cur - ((prev - 2) * factor + 3))
    if not all(0 <= e < factor for e in extras):  # pragma: no cover
        raise AssertionError(f"run {run}: bad chain extras {extras}")
    return extras


def _cl_symbol_stream(seq: list[int]) -> list[tuple[int, int, int]]:
    """Code-length sequence → (cl_symbol, extra_value, extra_bits)
    stream using the 16 (repeat previous) / 17 (zero run) codes."""
    out: list[tuple[int, int, int]] = []
    i = 0
    n = len(seq)
    while i < n:
        v = seq[i]
        j = i
        while j < n and seq[j] == v:
            j += 1
        run = j - i
        if v == 0:
            if run < 3:
                out.extend((0, 0, 0) for _ in range(run))
            else:
                out.extend((17, e, 3) for e in _run_extras(run, 8))
        else:
            out.append((v, 0, 0))
            rep = run - 1
            if rep < 3:
                out.extend((v, 0, 0) for _ in range(rep))
            else:
                out.extend((16, e, 2) for e in _run_extras(rep, 4))
        i = j
    return out


def _ins_code(n: int) -> int:
    for c in range(23, -1, -1):
        if _INS_BASE[c][0] <= n:
            return c
    raise ValueError(f"bad insert length {n}")  # pragma: no cover


def _cpy_code(n: int) -> int:
    for c in range(23, -1, -1):
        if _CPY_BASE[c][0] <= n:
            return c
    raise ValueError(f"bad copy length {n}")  # pragma: no cover


def _dist_symbol(d: int) -> tuple[int, int, int]:
    """distance → (dsym, extra_value, extra_bits) for NPOSTFIX=0
    NDIRECT=0."""
    x = d + 3
    nbits = x.bit_length() - 2
    b = (x >> nbits) & 1
    extra = x & ((1 << nbits) - 1)
    return 16 + 2 * (nbits - 1) + b, extra, nbits


def _find_commands(
    data: bytes, lo: int, hi: int, window: int, table: dict
) -> list[tuple[int, int, int]]:
    """Greedy hash-match LZ77 over data[lo:hi] (history below ``lo``
    stays matchable through the shared ``table``). Returns
    (insert_len, copy_len, distance) commands; a trailing literals-only
    run is a command whose copy part the decoder ignores (distance 0)."""
    cmds = []
    pos = anchor = lo
    n = hi
    while pos + 4 <= n:
        key = data[pos : pos + 4]
        cand = table.get(key)
        table[key] = pos
        if cand is not None and 0 < pos - cand <= min(pos, window):
            length = 4
            maxl = min(n - pos, 1 << 20)
            while (
                length < maxl and data[cand + length] == data[pos + length]
            ):
                length += 1
            cmds.append((pos - anchor, length, pos - cand))
            end = pos + length
            stop = min(end, n - 3, pos + 64)
            p = pos + 1
            while p < stop:
                table[data[p : p + 4]] = p
                p += 1
            pos = anchor = end
        else:
            pos += 1
    if anchor < n or not cmds:
        cmds.append((n - anchor, 2, 0))  # tail: copy part never runs
    return cmds


_dict_index: dict[int, dict[bytes, int]] | None = None


def _dictionary_index() -> dict[int, dict[bytes, int]]:
    """length -> {word: word_idx} over the vendored dictionary, built
    once per process (~13.5k words). Used by the ``dict`` encoder mode
    to find substrings encodable as §8 static-dictionary references."""
    global _dict_index
    if _dict_index is None:
        blob = _dictionary()
        index: dict[int, dict[bytes, int]] = {}
        for length in range(4, 25):
            bits = _DICT_SIZE_BITS[length - 4]
            off = _DICT_OFFSETS[length - 4]
            words: dict[bytes, int] = {}
            for i in range(1 << bits):
                words.setdefault(blob[off + i * length : off + (i + 1) * length], i)
            index[length] = words
        _dict_index = index
    return _dict_index


def _find_dict_commands(
    data: bytes, lo: int, hi: int, window: int, table: dict
) -> list[tuple[int, int, int]]:
    """Greedy matcher that prefers §8 static-dictionary references:
    at each position, the longest dictionary word match (transform 0,
    or ferment-first transform 9 for capitalized occurrences) is
    encoded as a copy whose distance reaches ``address + 1`` bytes
    past the window start; otherwise fall back to an in-window LZ
    match, else a literal. Exercises the dictionary-decode path from
    the fixture side without the native encoder."""
    index = _dictionary_index()
    cmds = []
    pos = anchor = lo
    n = hi
    while pos < n:
        # longest dictionary match first (transform 0, then ferment-first)
        hit = None
        for length in range(min(24, n - pos), 3, -1):
            chunk = data[pos : pos + length]
            words = index[length]
            idx = words.get(chunk)
            tid = 0
            if idx is None and 65 <= chunk[0] <= 90:
                idx = words.get(bytes((chunk[0] | 32,)) + chunk[1:])
                tid = 9  # ferment-first: capitalized dictionary word
            if idx is not None:
                hit = (length, idx, tid)
                break
        if hit is not None:
            length, idx, tid = hit
            max_dist = min(pos, window)
            address = (tid << _DICT_SIZE_BITS[length - 4]) | idx
            cmds.append((pos - anchor, length, max_dist + 1 + address))
            pos = anchor = pos + length
            continue
        if pos + 4 <= n:
            key = data[pos : pos + 4]
            cand = table.get(key)
            table[key] = pos
            if cand is not None and 0 < pos - cand <= min(pos, window):
                length = 4
                maxl = min(n - pos, 1 << 20)
                while (
                    length < maxl
                    and data[cand + length] == data[pos + length]
                ):
                    length += 1
                cmds.append((pos - anchor, length, pos - cand))
                pos = anchor = pos + length
                continue
        pos += 1
    if anchor < n or not cmds:
        cmds.append((n - anchor, 2, 0))  # tail: copy part never runs
    return cmds


def compress(data: bytes, *, mode: str = "lz", wbits: int = 22) -> bytes:
    """Encode ``data`` as a valid RFC 7932 stream the decoder (and any
    conforming decoder) accepts. ``mode``: ``"lz"`` greedy matches,
    ``"literals"`` prefix-coded literals only, ``"uncompressed"`` raw
    meta-blocks, ``"dict"`` greedy matches that prefer §8
    static-dictionary references (transforms 0 and 9)."""
    if mode not in ("lz", "literals", "uncompressed", "dict"):
        raise ValueError(f"unknown brotli encode mode {mode!r}")
    w = _BitWriter()
    if wbits == 16:
        w.write(0, 1)
    elif 17 <= wbits <= 24:
        w.write(1, 1)
        w.write(wbits - 17 if wbits != 17 else 0, 3)
        if wbits == 17:
            w.write(0, 3)
    elif 10 <= wbits <= 15:
        w.write(1, 1)
        w.write(0, 3)
        w.write(wbits - 8, 3)
    else:
        raise ValueError(f"WBITS {wbits} outside 10..24")
    window = (1 << wbits) - 16

    if not data:
        w.write(1, 1)  # ISLAST
        w.write(1, 1)  # ISLASTEMPTY
        return w.getvalue()

    if mode == "uncompressed":
        for off in range(0, len(data), 1 << 22):
            chunk = data[off : off + (1 << 22)]
            w.write(0, 1)  # ISLAST=0 (required for ISUNCOMPRESSED)
            _write_mlen(w, len(chunk))
            w.write(1, 1)  # ISUNCOMPRESSED
            w.align_byte()
            w.write_bytes(chunk)
        w.write(1, 1)
        w.write(1, 1)  # final empty ISLAST block
        return w.getvalue()

    table: dict = {}
    ring = [16, 15, 11, 4]
    idx = 0
    step = 1 << 22
    for off in range(0, len(data), step):
        lo, hi = off, min(off + step, len(data))
        if mode == "literals":
            cmds = [(hi - lo, 2, 0)]
        elif mode == "dict":
            cmds = _find_dict_commands(data, lo, hi, window, table)
        else:
            cmds = _find_commands(data, lo, hi, window, table)
        idx = _write_compressed_block(
            w, data, lo, hi, cmds, ring, idx, window, is_last=hi == len(data)
        )
    return w.getvalue()


def _write_mlen(w: _BitWriter, mlen: int) -> None:
    nibbles = max(4, (mlen - 1).bit_length() + 3 >> 2)
    if nibbles > 6:  # pragma: no cover — callers chunk at 4 MiB
        raise ValueError("meta-block longer than 2^24")
    w.write(nibbles - 4, 2)
    w.write(mlen - 1, 4 * nibbles)


def _write_compressed_block(
    w: _BitWriter,
    data: bytes,
    lo: int,
    hi: int,
    cmds: list[tuple[int, int, int]],
    ring: list[int],
    idx: int,
    window: int,
    *,
    is_last: bool,
) -> int:
    """One compressed meta-block over data[lo:hi] from LZ commands.
    Single block type per category, NPOSTFIX=0 NDIRECT=0, LSB6 mode.
    Mirrors the decoder's §4 ring rule: a distance past the window
    start (a dictionary reference) is never pushed to the ring.
    Returns the updated distance-ring write index."""
    mlen = hi - lo
    # ---- pass 1: symbol streams + histograms ----
    lit_freq: dict[int, int] = {}
    cmd_freq: dict[int, int] = {}
    dist_freq: dict[int, int] = {}
    sym_cmds = []  # (cmd_sym, ins, ic, cpy, cc, dsym|None, dx, dn, lit_span)
    pos = lo
    r_idx = idx
    for k, (ins, cpy, dist) in enumerate(cmds):
        final = k == len(cmds) - 1 and pos + ins >= hi
        ic = _ins_code(ins)
        cc = _cpy_code(cpy)
        dsym = dx = dn = None
        if final:
            # copy part is ignored by the decoder: encode through an
            # explicit-distance cell so no distance symbol is expected
            cell = _CELL[(min(ic >> 3, 2), min(cc >> 3, 2))]
            cmd_sym = ((cell + 2) << 6) | ((ic & 7) << 3) | (cc & 7)
        elif dist == ring[(r_idx - 1) & 3] and ic < 8 and cc < 16:
            cmd_sym = (0 if cc < 8 else 1) << 6 | ((ic & 7) << 3) | (cc & 7)
        else:
            cell = _CELL[(min(ic >> 3, 2), min(cc >> 3, 2))]
            cmd_sym = ((cell + 2) << 6) | ((ic & 7) << 3) | (cc & 7)
            if dist == ring[(r_idx - 1) & 3]:
                dsym, dx, dn = 0, 0, 0  # explicit last-distance code
            else:
                dsym, dx, dn = _dist_symbol(dist)
                if dist <= min(pos + ins, window):
                    # in-window copy: pushed to the ring; dictionary
                    # references (past the window) are not (§4)
                    ring[r_idx & 3] = dist
                    r_idx += 1
            dist_freq[dsym] = dist_freq.get(dsym, 0) + 1
        cmd_freq[cmd_sym] = cmd_freq.get(cmd_sym, 0) + 1
        span = data[pos : pos + ins]
        for b in span:
            lit_freq[b] = lit_freq.get(b, 0) + 1
        sym_cmds.append((cmd_sym, ins, ic, cpy, cc, dsym, dx, dn, span))
        pos += ins + (0 if final else cpy)
    if not lit_freq:
        lit_freq[0] = 1  # header still carries a literal code
    if not dist_freq:
        dist_freq[0] = 1

    # ---- pass 2: header ----
    w.write(1 if is_last else 0, 1)
    if is_last:
        w.write(0, 1)  # ISLASTEMPTY=0
    _write_mlen(w, mlen)
    if not is_last:
        w.write(0, 1)  # ISUNCOMPRESSED=0
    for _ in range(3):
        w.write(0, 1)  # NBLTYPES_{L,I,D} = 1
    w.write(0, 2)  # NPOSTFIX
    w.write(0, 4)  # NDIRECT
    w.write(0, 2)  # context mode LSB6 for the single literal block type
    w.write(0, 1)  # NTREES_L = 1
    w.write(0, 1)  # NTREES_D = 1
    lit_codes = _write_prefix_code(w, _huff_lengths(lit_freq, 15), 256)
    cmd_codes = _write_prefix_code(w, _huff_lengths(cmd_freq, 15), 704)
    dist_codes = _write_prefix_code(w, _huff_lengths(dist_freq, 15), 64)

    # ---- pass 3: commands ----
    for cmd_sym, ins, ic, cpy, cc, dsym, dx, dn, span in sym_cmds:
        code, l = cmd_codes[cmd_sym]
        w.write_code(code, l)
        w.write(ins - _INS_BASE[ic][0], _INS_BASE[ic][1])
        w.write(cpy - _CPY_BASE[cc][0], _CPY_BASE[cc][1])
        for b in span:
            code, l = lit_codes[b]
            w.write_code(code, l)
        if dsym is not None:
            code, l = dist_codes[dsym]
            w.write_code(code, l)
            w.write(dx, dn)
    return r_idx


def dictionary_ref_stream() -> bytes:
    """A tiny stream whose single copy reaches past the window start —
    i.e., a static-dictionary word reference (word 998 of length 4,
    transform 0, after one literal ``x``). Fixtures use it to pin the
    dictionary-decode path end-to-end: through r12 this lane censused
    (``ce_decoded=False``); with the Appendix-A dictionary vendored it
    decodes to ``b"x" + word``."""
    w = _BitWriter()
    w.write(0, 1)  # WBITS=16
    w.write(1, 1)  # ISLAST
    w.write(0, 1)  # ISLASTEMPTY=0
    _write_mlen(w, 5)  # 1 literal + a 4-byte dictionary word
    for _ in range(3):
        w.write(0, 1)  # one block type per category
    w.write(0, 2)  # NPOSTFIX
    w.write(0, 4)  # NDIRECT
    w.write(0, 2)  # LSB6
    w.write(0, 1)  # NTREES_L=1
    w.write(0, 1)  # NTREES_D=1
    lit = _write_prefix_code(w, {ord("x"): 0}, 256)
    # one command: insert 1, copy 4 — explicit-distance cell (0,0)
    cmd_sym = (2 << 6) | ((_ins_code(1) & 7) << 3) | (_cpy_code(4) & 7)
    cmd = _write_prefix_code(w, {cmd_sym: 0}, 704)
    dsym, dx, dn = _dist_symbol(1000)  # far past the 1-byte window
    dist = _write_prefix_code(w, {dsym: 0}, 64)
    code, l = cmd[cmd_sym]
    w.write_code(code, l)
    code, l = lit[ord("x")]
    w.write_code(code, l)
    code, l = dist[dsym]
    w.write_code(code, l)
    w.write(dx, dn)
    return w.getvalue()


# ---------------------------------------------------------------------------
# optional native fast path (ctypes over the container's libbrotli)
# ---------------------------------------------------------------------------
#
# The pure-Python codec above is the specified implementation; these
# bindings exist because a C decoder is ~30x faster on the WARC hot
# path and because an independent encoder is the strongest possible
# cross-check for the decoder. Both return None when the shared
# library is absent, so every caller keeps a pure-Python fallback.

_native_dec = None
_native_enc = None
_native_probed = False


def _load_native() -> None:
    global _native_dec, _native_enc, _native_probed
    if _native_probed:
        return
    _native_probed = True
    import ctypes

    try:
        dec = ctypes.CDLL("libbrotlidec.so.1")
        dec.BrotliDecoderCreateInstance.restype = ctypes.c_void_p
        dec.BrotliDecoderCreateInstance.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        dec.BrotliDecoderDestroyInstance.argtypes = [ctypes.c_void_p]
        dec.BrotliDecoderDecompressStream.restype = ctypes.c_int
        dec.BrotliDecoderDecompressStream.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_size_t)]
        _native_dec = dec
    except OSError:
        _native_dec = None
    try:
        enc = ctypes.CDLL("libbrotlienc.so.1")
        enc.BrotliEncoderCompress.restype = ctypes.c_int
        enc.BrotliEncoderCompress.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_size_t,
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_char_p]
        _native_enc = enc
    except OSError:
        _native_enc = None


def native_decompress(
    data: bytes, *, max_output: int = 1 << 31
) -> bytes | None:
    """Decode via libbrotlidec's streaming API, or return ``None`` if
    the library is unavailable. Matches ``decompress`` semantics on
    the paths callers rely on: ``ValueError`` on corrupt streams and
    trailing bytes, ``EOFError`` on truncation,
    ``BrotliOutputCapExceeded`` past ``max_output`` (the streaming
    loop caps growth per 64 KiB chunk, so a hostile few-KB bomb stops
    at the cap instead of materializing gigabytes)."""
    _load_native()
    if _native_dec is None:
        return None
    import ctypes

    dec = _native_dec
    state = dec.BrotliDecoderCreateInstance(None, None, None)
    if not state:
        return None
    try:
        chunks: list[bytes] = []
        total = 0
        avail_in = ctypes.c_size_t(len(data))
        next_in = ctypes.cast(
            ctypes.create_string_buffer(data, len(data) or 1),
            ctypes.POINTER(ctypes.c_uint8),
        )
        out_cap = 1 << 16
        out_buf = ctypes.create_string_buffer(out_cap)
        while True:
            avail_out = ctypes.c_size_t(out_cap)
            next_out = ctypes.cast(out_buf, ctypes.POINTER(ctypes.c_uint8))
            res = dec.BrotliDecoderDecompressStream(
                state, ctypes.byref(avail_in), ctypes.byref(next_in),
                ctypes.byref(avail_out), ctypes.byref(next_out), None)
            produced = out_cap - avail_out.value
            if produced:
                chunks.append(out_buf.raw[:produced])
                total += produced
                if total > max_output:
                    raise BrotliOutputCapExceeded(
                        "output exceeds max_output"
                    )
            if res == 1:  # BROTLI_DECODER_RESULT_SUCCESS
                if avail_in.value:
                    raise ValueError(
                        "trailing bytes after brotli stream end"
                    )
                return b"".join(chunks)
            if res == 2:  # NEEDS_MORE_INPUT: the stream is truncated
                raise EOFError("truncated brotli stream")
            if res == 3:  # NEEDS_MORE_OUTPUT: loop with a fresh buffer
                continue
            raise ValueError("bad brotli stream (native decoder error)")
    finally:
        dec.BrotliDecoderDestroyInstance(state)


def native_compress(
    data: bytes, *, quality: int = 5, lgwin: int = 22
) -> bytes | None:
    """Encode via libbrotlienc (one-shot), or return ``None`` if the
    library is unavailable. Used by the cross-implementation test
    suite to generate real-encoder streams at q=1..11; not part of the
    fixture path (fixtures use the deterministic subset ``compress``)."""
    _load_native()
    if _native_enc is None:
        return None
    import ctypes

    out_len = ctypes.c_size_t(len(data) + (len(data) >> 1) + 1024)
    out = ctypes.create_string_buffer(out_len.value)
    ok = _native_enc.BrotliEncoderCompress(
        quality, lgwin, 0, len(data), data, ctypes.byref(out_len), out)
    if not ok:
        return None
    return out.raw[: out_len.value]
