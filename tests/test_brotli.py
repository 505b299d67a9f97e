"""RFC 7932 codec tests (operators/brotli.py).

Verification is cross-implementation (r13): the container's system
libbrotli 1.0.9 is an independent implementation, so beyond (a) the
reference encoder's empty-stream anchor, (b) encoder∘decoder
round-trips across modes/sizes/window sizes, and (c) hand-assembled
streams derived field-by-field from the RFC for decoder features the
subset encoder never emits, the suite pins (d) ``decompress``
bit-exact against REAL ``libbrotlienc`` streams at quality 1..11
(dictionary references + UTF8/Signed contexts included), (e) the
vendored dictionary blob / context LUTs / all 121 transforms
byte-for-byte against ``libbrotlicommon``, and (f) our encoder's
output against ``libbrotlidec``. When the shared libraries are absent
the cross-implementation tests skip; the pure-Python pins remain."""

from __future__ import annotations

import random

import pytest

from tectonic_spark.operators.brotli import (
    _CELL,
    _CL_FIXED_CODE,
    _CL_ORDER,
    _CTX_SIGNED_0,
    _CTX_SIGNED_1,
    _CTX_UTF8_0,
    _CTX_UTF8_1,
    BrotliOutputCapExceeded,
    _BitReader,
    _BitWriter,
    _cpy_code,
    _dictionary,
    _dist_symbol,
    _ins_code,
    _transform_word,
    _write_mlen,
    _write_prefix_code,
    compress,
    decompress,
    dictionary_ref_stream,
    native_compress,
    native_decompress,
)


def _cmd_sym(ic: int, cc: int) -> int:
    """Insert/copy length codes → the explicit-distance command symbol
    (cells 2..10 of the §5 layout)."""
    cell = _CELL[(min(ic >> 3, 2), min(cc >> 3, 2))]
    return ((cell + 2) << 6) | ((ic & 7) << 3) | (cc & 7)


def _shape_lengths(syms: list[int]) -> dict[int, int]:
    """Code lengths for 1-4 symbols matching the simple-code shapes
    (assigned in ascending-symbol order, the canonical listing)."""
    shapes = {1: (0,), 2: (1, 1), 3: (1, 2, 2), 4: (2, 2, 2, 2)}
    return dict(zip(sorted(syms), shapes[len(syms)]))


# ---------------------------------------------------------------------------
# round trips
# ---------------------------------------------------------------------------


def test_empty_stream_matches_reference_byte():
    # the reference encoder's well-known empty-stream output (lgwin 22)
    assert compress(b"") == b"\x3b"
    assert decompress(b"\x3b") == b""
    # and the window-16 form
    assert decompress(b"\x06") == b""


CASES = [
    b"a",
    b"ab",
    b"hello world",
    b"aaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
    b"abcabcabcabcabcabcabc" * 10,
    bytes(range(256)),
    bytes(range(256)) * 7,
    b"the quick brown fox jumps over the lazy dog " * 200,
    b"\x00" * 4096,
]


@pytest.mark.parametrize("mode", ["uncompressed", "literals", "lz"])
def test_round_trip_modes(mode):
    for payload in CASES:
        assert decompress(compress(payload, mode=mode)) == payload


def test_round_trip_randomized():
    rng = random.Random(0xB407)
    for trial in range(40):
        n = rng.choice((0, 1, 3, 17, 100, 999, 5000, 30000))
        if trial % 2:
            words = [
                bytes(rng.randrange(256) for _ in range(rng.randrange(1, 9)))
                for _ in range(6)
            ]
            payload = b"".join(
                rng.choice(words) for _ in range(n // 3 + 1)
            )[:n]
        else:
            payload = bytes(rng.randrange(256) for _ in range(n))
        mode = ("lz", "literals", "uncompressed")[trial % 3]
        assert decompress(compress(payload, mode=mode)) == payload


def test_round_trip_window_sizes():
    payload = b"tectonic spark brotli window " * 300
    for wbits in (10, 11, 15, 16, 17, 18, 22, 24):
        blob = compress(payload, wbits=wbits)
        assert decompress(blob) == payload


def test_lz_actually_compresses():
    payload = b"the quick brown fox " * 500
    assert len(compress(payload, mode="lz")) < len(payload) // 20


def test_simple_code_four_symbols_tree_select():
    # frequencies that Huffman shapes as (1,2,3,3) — the tree-select=1
    # simple form — and as (2,2,2,2) — the flat form
    skew = b"a" * 64 + b"b" * 16 + b"c" * 2 + b"d" * 2
    flat = b"abcd" * 16
    for payload in (skew, flat):
        assert decompress(compress(payload, mode="literals")) == payload


def test_multi_metablock_uncompressed_chunking():
    payload = bytes((i * 37) & 0xFF for i in range((1 << 22) + 4097))
    assert decompress(compress(payload, mode="uncompressed")) == payload


def test_unknown_mode_rejected():
    with pytest.raises(ValueError, match="mode"):
        compress(b"x", mode="quantum")
    with pytest.raises(ValueError, match="WBITS"):
        compress(b"x", wbits=25)


# ---------------------------------------------------------------------------
# error taxonomy
# ---------------------------------------------------------------------------


def test_truncation_raises_eof():
    blob = compress(b"hello hello hello hello", mode="lz")
    for cut in (1, len(blob) // 2, len(blob) - 1):
        with pytest.raises(EOFError):
            decompress(blob[:cut])


def test_trailing_bytes_rejected():
    blob = compress(b"hello world", mode="literals")
    with pytest.raises(ValueError, match="trailing"):
        decompress(blob + b"\x00")


def test_nonzero_final_padding_rejected():
    blob = bytearray(compress(b"", wbits=16))  # 0x06: 3 used bits
    blob[-1] |= 0x80  # set a padding bit
    with pytest.raises(ValueError, match="padding"):
        decompress(bytes(blob))


def test_dictionary_reference_decodes():
    # r13: the Appendix-A dictionary is vendored — the fixture stream
    # (one literal 'x', then word 998 of length 4, transform 0) now
    # decodes instead of censusing
    out = decompress(dictionary_ref_stream())
    assert out[:1] == b"x" and len(out) == 5
    word = _dictionary()[998 * 4 : 999 * 4]
    assert out == b"x" + word


def test_dictionary_invalid_references_rejected():
    # copy length 2 (< 4) past the window start: no dictionary bucket
    w = _BitWriter()
    w.write(0, 1)  # WBITS=16
    w.write(1, 1)  # ISLAST
    w.write(0, 1)  # ISLASTEMPTY=0
    _write_mlen(w, 3)
    for _ in range(3):
        w.write(0, 1)
    w.write(0, 2)
    w.write(0, 4)
    w.write(0, 2)  # LSB6
    w.write(0, 1)  # NTREES_L=1
    w.write(0, 1)  # NTREES_D=1
    lit = _write_prefix_code(w, {ord("x"): 0}, 256)
    cmd_sym = (2 << 6) | ((_ins_code(1) & 7) << 3) | (_cpy_code(2) & 7)
    cmd = _write_prefix_code(w, {cmd_sym: 0}, 704)
    dsym, dx, dn = _dist_symbol(1000)
    dist = _write_prefix_code(w, {dsym: 0}, 64)
    code, l = cmd[cmd_sym]
    w.write_code(code, l)
    code, l = lit[ord("x")]
    w.write_code(code, l)
    code, l = dist[dsym]
    w.write_code(code, l)
    w.write(dx, dn)
    with pytest.raises(ValueError, match="copy length"):
        decompress(w.getvalue())


def test_dictionary_transform_id_out_of_range_rejected():
    # a length-24 reference whose transform id >= 121 is structural
    from tectonic_spark.operators.brotli import _DICT_SIZE_BITS

    ndbits = _DICT_SIZE_BITS[24 - 4]
    bad_address = 121 << ndbits
    w = _BitWriter()
    w.write(0, 1)
    w.write(1, 1)
    w.write(0, 1)
    _write_mlen(w, 25)
    for _ in range(3):
        w.write(0, 1)
    w.write(0, 2)
    w.write(0, 4)
    w.write(0, 2)
    w.write(0, 1)
    w.write(0, 1)
    lit = _write_prefix_code(w, {ord("x"): 0}, 256)
    ic, cc = _ins_code(1), _cpy_code(24)
    cmd_sym = _cmd_sym(ic, cc)
    cmd = _write_prefix_code(w, {cmd_sym: 0}, 704)
    dsym, dx, dn = _dist_symbol(1 + 1 + bad_address)  # max_dist=1 after 'x'
    dist = _write_prefix_code(w, {dsym: 0}, 64)
    code, l = cmd[cmd_sym]
    w.write_code(code, l)
    from tectonic_spark.operators.brotli import _CPY_BASE, _INS_BASE

    w.write(1 - _INS_BASE[ic][0], _INS_BASE[ic][1])
    w.write(24 - _CPY_BASE[cc][0], _CPY_BASE[cc][1])
    code, l = lit[ord("x")]
    w.write_code(code, l)
    code, l = dist[dsym]
    w.write_code(code, l)
    w.write(dx, dn)
    with pytest.raises(ValueError, match="transform id"):
        decompress(w.getvalue())


# ---------------------------------------------------------------------------
# hand-assembled streams (decoder paths the subset encoder never emits)
# ---------------------------------------------------------------------------


def _count_code(w: _BitWriter, n: int) -> None:
    """The NBLTYPES/NTREES 1..256 count code."""
    if n == 1:
        w.write(0, 1)
        return
    w.write(1, 1)
    k = (n - 1).bit_length() - 1
    w.write(k, 3)
    w.write(n - 1 - (1 << k), k)


def _header(w: _BitWriter, mlen: int) -> None:
    """WBITS=16, single last meta-block of ``mlen`` bytes."""
    w.write(0, 1)  # WBITS=16
    w.write(1, 1)  # ISLAST
    w.write(0, 1)  # ISLASTEMPTY=0
    w.write(0, 2)  # MNIBBLES=4
    w.write(mlen - 1, 16)


def _trivial_categories(w: _BitWriter) -> None:
    for _ in range(3):
        w.write(0, 1)  # NBLTYPES_{L,I,D} = 1


def test_hand_stream_block_switching_selects_trees():
    """Two literal block types, each mapped to its own literal tree:
    'aaaa' (type 0) → switch → 'bbbb' (type 1) → switch → 'aa'."""
    w = _BitWriter()
    _header(w, 10)
    # L category: 2 block types
    _count_code(w, 2)
    _write_prefix_code(w, {1: 0}, 4)  # btype code: const "next type"
    _write_prefix_code(w, {0: 0}, 26)  # blen code: const code 0 (1 + 2 bits)
    w.write(3, 2)  # first L block length = 4
    w.write(0, 1)  # NBLTYPES_I = 1
    w.write(0, 1)  # NBLTYPES_D = 1
    w.write(0, 2)  # NPOSTFIX
    w.write(0, 4)  # NDIRECT
    w.write(0, 2)  # mode LSB6, literal block type 0
    w.write(0, 2)  # mode LSB6, literal block type 1
    _count_code(w, 2)  # NTREES_L = 2
    # literal context map: 64 zeros then 64 ones, via the RLE form
    w.write(1, 1)  # use RLE
    w.write(5, 4)  # max run-length prefix = 6 (runs up to 64+63)
    cmap_codes = _write_prefix_code(w, {6: 1, 7: 1}, 8)
    code, ln = cmap_codes[6]
    w.write_code(code, ln)
    w.write(0, 6)  # run = (1<<6) + 0 = 64 zeros
    for _ in range(64):
        code, ln = cmap_codes[7]
        w.write_code(code, ln)  # 64 × tree 1
    w.write(0, 1)  # no inverse MTF
    w.write(0, 1)  # NTREES_D = 1
    _write_prefix_code(w, {ord("a"): 0}, 256)  # literal tree 0
    _write_prefix_code(w, {ord("b"): 0}, 256)  # literal tree 1
    cmd_sym = (4 << 6) | ((8 & 7) << 3) | 0  # insert code 8, copy code 0
    _write_prefix_code(w, {cmd_sym: 0}, 704)
    _write_prefix_code(w, {0: 0}, 64)  # distance tree (unused)
    # body: one command, insert 10 (code 8 base 10 + 2 extra bits = 0)
    w.write(0, 2)  # insert extra
    # copy code 0 has 0 extra bits; 10 literals with two block switches
    w.write(3, 2)  # blen after switch to type 1 → 4
    w.write(1, 2)  # blen after switch back to type 0 → 2
    assert decompress(w.getvalue()) == b"aaaabbbbaa"


def _literal_copy_stream(dist_plan):
    """'abc' + three copies of length 3 whose distance symbols follow
    ``dist_plan`` = [(dsym, extra_value, extra_bits), ...]."""
    w = _BitWriter()
    _header(w, 3 + 3 * len(dist_plan))
    _trivial_categories(w)
    w.write(0, 2)
    w.write(0, 4)
    w.write(0, 2)  # LSB6
    w.write(0, 1)  # NTREES_L=1
    w.write(0, 1)  # NTREES_D=1
    lit = _write_prefix_code(
        w, {ord("a"): 1, ord("b"): 2, ord("c"): 2}, 256
    )
    first = _cmd_sym(_ins_code(3), _cpy_code(3))
    rest = _cmd_sym(_ins_code(0), _cpy_code(3))
    cmd = _write_prefix_code(w, {first: 1, rest: 1}, 704)
    dsyms = sorted({p[0] for p in dist_plan})
    dist = _write_prefix_code(w, _shape_lengths(dsyms), 64)
    code, ln = cmd[first]
    w.write_code(code, ln)
    for ch in "abc":
        code, ln = lit[ord(ch)]
        w.write_code(code, ln)
    code, ln = dist[dist_plan[0][0]]
    w.write_code(code, ln)
    w.write(dist_plan[0][1], dist_plan[0][2])
    for dsym, dx, dn in dist_plan[1:]:
        code, ln = cmd[rest]
        w.write_code(code, ln)
        code, ln = dist[dsym]
        w.write_code(code, ln)
        w.write(dx, dn)
    return w.getvalue()


def test_hand_stream_short_distance_codes_and_ring():
    """Explicit distance 3, then short code 4 (last-1 = 2, pushed),
    then code 0 (last again, not pushed)."""
    blob = _literal_copy_stream(
        [_dist_symbol(3), (4, 0, 0), (0, 0, 0)]
    )
    # abc | +3 @d3 -> abcabc | +3 @d2 -> b,c,b | +3 @d2 (last) -> c,b,c
    assert decompress(blob) == b"abcabcbcbcbc"


def test_hand_stream_second_to_last_short_codes():
    """Ring slot 2: explicit 3, explicit 1, then code 11 =
    second-to-last + 1 = 4 — pinning the ring order."""
    blob = _literal_copy_stream(
        [_dist_symbol(3), _dist_symbol(1), (11, 0, 0)]
    )
    # abc | @3 → abcabc | @1 → ccc (out=abcabcccc) | ring last=1,
    # second=3; code 11 → 3+1=4 → positions 5,6,7 → ccc
    assert decompress(blob) == b"abcabccccccc"


def test_hand_stream_ndirect_direct_distances():
    """NDIRECT=4: distance symbols 16..19 are the literal distances
    1..4 with no extra bits."""
    w = _BitWriter()
    _header(w, 6)
    _trivial_categories(w)
    w.write(0, 2)  # NPOSTFIX=0
    w.write(4, 4)  # NDIRECT=4
    w.write(0, 2)
    w.write(0, 1)
    w.write(0, 1)
    lit = _write_prefix_code(w, {ord("a"): 1, ord("b"): 2, ord("c"): 2}, 256)
    sym = _cmd_sym(_ins_code(3), _cpy_code(3))
    cmd = _write_prefix_code(w, {sym: 0}, 704)
    dist = _write_prefix_code(w, {16 + 2: 0}, 68)  # direct distance 3
    code, ln = cmd[sym]
    w.write_code(code, ln)
    for ch in "abc":
        code, ln = lit[ord(ch)]
        w.write_code(code, ln)
    code, ln = dist[18]
    w.write_code(code, ln)
    assert decompress(w.getvalue()) == b"abcabc"


def test_hand_stream_npostfix_distance_buckets():
    """NPOSTFIX=2: dsym 16 with extra bit 1 decodes to distance 5."""
    w = _BitWriter()
    _header(w, 8)
    _trivial_categories(w)
    w.write(2, 2)  # NPOSTFIX=2
    w.write(0, 4)  # NDIRECT=0 (<<2)
    w.write(0, 2)
    w.write(0, 1)
    w.write(0, 1)
    lit = _write_prefix_code(
        w, {ord("a"): 2, ord("b"): 2, ord("c"): 2, ord("d"): 3, ord("e"): 3},
        256,
    )
    sym = _cmd_sym(_ins_code(5), _cpy_code(3))
    cmd = _write_prefix_code(w, {sym: 0}, 704)
    dist = _write_prefix_code(w, {16: 0}, 16 + (48 << 2))
    code, ln = cmd[sym]
    w.write_code(code, ln)
    for ch in "abcde":
        code, ln = lit[ord(ch)]
        w.write_code(code, ln)
    code, ln = dist[16]
    w.write_code(code, ln)
    # h=0 → nbits=1, offset=0; distance = ((0+extra)<<2) + 0 + 0 + 1
    w.write(1, 1)  # extra=1 → distance 5
    assert decompress(w.getvalue()) == b"abcdeabc"


def test_hand_stream_metadata_metablock_skipped():
    """An ISLAST=0 metadata block (MNIBBLES=0) is skipped wholesale."""
    w = _BitWriter()
    w.write(0, 1)  # WBITS=16
    w.write(0, 1)  # ISLAST=0
    w.write(3, 2)  # MNIBBLES=0 → metadata
    w.write(0, 1)  # reserved
    w.write(1, 2)  # MSKIPBYTES=1
    w.write(4, 8)  # MSKIPLEN=5
    w.align_byte()
    w.write_bytes(b"METAx")
    w.write(1, 1)  # ISLAST
    w.write(1, 1)  # ISLASTEMPTY
    assert decompress(w.getvalue()) == b""


def test_hand_stream_code_length_repeat_16():
    """Symbol lengths via code 16 (repeat previous): 2, then 16×3 →
    four symbols of length 2."""
    w = _BitWriter()
    _header(w, 4)
    _trivial_categories(w)
    w.write(0, 2)
    w.write(0, 4)
    w.write(0, 2)
    w.write(0, 1)
    w.write(0, 1)
    # literal code, complex form, hand-written: HSKIP=0; cl code has
    # {2:1, 16:1}; symbol stream = [2, 16(+extra 0 → repeat 3)]
    w.write(0, 2)  # complex, HSKIP=0
    cl_lens = {2: 1, 16: 1}
    space = 32
    for s in _CL_ORDER:
        v = cl_lens.get(s, 0)
        code, n = _CL_FIXED_CODE[v]
        w.write(code, n)
        if v:
            space -= 32 >> v
            if space <= 0:
                break
    # canonical over {2:1, 16:1}: 2 → 0, 16 → 1
    w.write_code(0, 1)  # length 2 for symbol 0
    w.write_code(1, 1)  # code 16
    w.write(0, 2)  # repeat = 3 → symbols 1..3 get length 2
    # commands: const insert-4
    sym4 = _cmd_sym(_ins_code(4), 0)
    cmd = _write_prefix_code(w, {sym4: 0}, 704)
    _write_prefix_code(w, {0: 0}, 64)  # distance tree (unused)
    code, ln = cmd[sym4]
    w.write_code(code, ln)
    # literals 0,1,2,3 with the canonical 2-bit codes 00,01,10,11
    for sym in range(4):
        w.write_code(sym, 2)
    assert decompress(w.getvalue()) == bytes([0, 1, 2, 3])


def test_hand_stream_chained_16_accumulates():
    """A chained 16 pair accumulates (3, then (3-2)<<2+3 = 7): symbol
    0 at length 4, 16×2 → symbols 0..7 all length 4, then symbol 8 at
    length 1 completes the Kraft sum."""
    w = _BitWriter()
    _header(w, 9)
    _trivial_categories(w)
    w.write(0, 2)
    w.write(0, 4)
    w.write(0, 2)
    w.write(0, 1)
    w.write(0, 1)
    w.write(0, 2)  # complex literal code, HSKIP=0
    cl_lens = {4: 2, 1: 2, 16: 1}  # Kraft: 8+8+16 = 32 ✓
    space = 32
    for s in _CL_ORDER:
        v = cl_lens.get(s, 0)
        code, n = _CL_FIXED_CODE[v]
        w.write(code, n)
        if v:
            space -= 32 >> v
            if space <= 0:
                break
    # canonical over {1:2, 4:2, 16:1}: 16→'0', 1→'10', 4→'11'
    w.write_code(0b11, 2)  # symbol 0: length 4
    w.write_code(0b0, 1)  # 16
    w.write(0, 2)  # repeat 3 → symbols 1..3 length 4
    w.write_code(0b0, 1)  # chained 16
    w.write(0, 2)  # repeat → (3-2)<<2 + 3 = 7 → symbols 4..7 length 4
    w.write_code(0b10, 2)  # symbol 8: length 1 → complete
    sym9 = _cmd_sym(_ins_code(9), 0)
    cmd = _write_prefix_code(w, {sym9: 0}, 704)
    _write_prefix_code(w, {0: 0}, 64)
    code, ln = cmd[sym9]
    w.write_code(code, ln)
    w.write(1, 1)  # insert code 7: base 8, 1 extra bit → 9
    # literal canonical codes: sym8 len1 → '0'; syms 0..7 → 1000..1111
    w.write_code(0b0, 1)  # byte 8
    for s in range(8):
        w.write_code(0b1000 + s, 4)
    assert decompress(w.getvalue()) == bytes([8, 0, 1, 2, 3, 4, 5, 6, 7])


def test_hand_stream_code_length_17_run_completes():
    """Zeros via 17 between two length-1 symbols."""
    w = _BitWriter()
    _header(w, 4)
    _trivial_categories(w)
    w.write(0, 2)
    w.write(0, 4)
    w.write(0, 2)
    w.write(0, 1)
    w.write(0, 1)
    w.write(0, 2)  # complex literal code, HSKIP=0
    cl_lens = {1: 1, 17: 1}
    space = 32
    for s in _CL_ORDER:
        v = cl_lens.get(s, 0)
        code, n = _CL_FIXED_CODE[v]
        w.write(code, n)
        if v:
            space -= 32 >> v
            if space <= 0:
                break
    # canonical over {1:1, 17:1}: 1→0, 17→1
    w.write_code(0, 1)  # symbol 0 (byte 0): length 1
    w.write_code(1, 1)  # 17
    w.write(2, 3)  # zero run = (1)<<3?  repeat = extra+3 = 5 zeros
    w.write_code(0, 1)  # symbol 6: length 1 — code complete
    sym4 = _cmd_sym(_ins_code(4), 0)
    cmd = _write_prefix_code(w, {sym4: 0}, 704)
    _write_prefix_code(w, {0: 0}, 64)
    code, ln = cmd[sym4]
    w.write_code(code, ln)
    for sym in (0, 6, 6, 0):
        w.write_code(0 if sym == 0 else 1, 1)
    assert decompress(w.getvalue()) == bytes([0, 6, 6, 0])


def test_hand_stream_utf8_context_selects_trees():
    """UTF8 mode with a NON-constant context-map row (r13: decoded via
    the vendored §7.1 tables, no longer censused): two single-symbol
    literal trees are selected purely by context, so a decoder using
    wrong context values would emit the wrong bytes."""
    ctx_a = _CTX_UTF8_0[0] | _CTX_UTF8_1[0]  # context before any output
    ctx_b = _CTX_UTF8_0[ord("a")] | _CTX_UTF8_1[0]  # after emitting 'a'
    assert ctx_a != ctx_b
    w = _BitWriter()
    _header(w, 2)
    _trivial_categories(w)
    w.write(0, 2)
    w.write(0, 4)
    w.write(2, 2)  # context mode UTF8
    _count_code(w, 2)  # NTREES_L = 2
    # context map: tree 1 exactly at ctx_b, tree 0 elsewhere — a
    # NON-constant row, transmitted without RLE
    w.write(0, 1)  # no RLE
    cm = _write_prefix_code(w, {0: 1, 1: 1}, 2)
    vals = [0] * 64
    vals[ctx_b] = 1
    for v in vals:
        code, ln = cm[v]
        w.write_code(code, ln)
    w.write(0, 1)  # no IMTF
    w.write(0, 1)  # NTREES_D = 1
    _write_prefix_code(w, {ord("a"): 0}, 256)  # tree 0: only 'a'
    _write_prefix_code(w, {ord("b"): 0}, 256)  # tree 1: only 'b'
    sym2 = _cmd_sym(_ins_code(2), 0)
    cmd = _write_prefix_code(w, {sym2: 0}, 704)
    _write_prefix_code(w, {0: 0}, 64)
    code, ln = cmd[sym2]
    w.write_code(code, ln)
    # both literals come from single-symbol trees: zero literal bits.
    # byte 1 decodes under ctx_a -> tree 0 -> 'a'; byte 2 under ctx_b
    # (p1='a') -> tree 1 -> 'b'
    assert decompress(w.getvalue()) == b"ab"


def test_hand_stream_signed_context_selects_trees():
    """Signed mode twin: ctx = lut0[p1] | lut1[p2] via the vendored
    Signed tables."""
    ctx_a = _CTX_SIGNED_0[0] | _CTX_SIGNED_1[0]
    ctx_b = _CTX_SIGNED_0[ord("a")] | _CTX_SIGNED_1[0]
    assert ctx_a != ctx_b
    w = _BitWriter()
    _header(w, 2)
    _trivial_categories(w)
    w.write(0, 2)
    w.write(0, 4)
    w.write(3, 2)  # context mode Signed
    _count_code(w, 2)
    w.write(0, 1)  # no RLE
    cm = _write_prefix_code(w, {0: 1, 1: 1}, 2)
    vals = [0] * 64
    vals[ctx_b] = 1
    for v in vals:
        code, ln = cm[v]
        w.write_code(code, ln)
    w.write(0, 1)  # no IMTF
    w.write(0, 1)  # NTREES_D = 1
    _write_prefix_code(w, {ord("a"): 0}, 256)
    _write_prefix_code(w, {ord("b"): 0}, 256)
    sym2 = _cmd_sym(_ins_code(2), 0)
    cmd = _write_prefix_code(w, {sym2: 0}, 704)
    _write_prefix_code(w, {0: 0}, 64)
    code, ln = cmd[sym2]
    w.write_code(code, ln)
    assert decompress(w.getvalue()) == b"ab"


def test_hand_stream_utf8_constant_row_is_fine():
    """UTF8 mode with NTREES_L=1 (constant row) decodes exactly."""
    w = _BitWriter()
    _header(w, 3)
    _trivial_categories(w)
    w.write(0, 2)
    w.write(0, 4)
    w.write(2, 2)  # UTF8 mode — but single tree, so no table needed
    w.write(0, 1)  # NTREES_L=1
    w.write(0, 1)  # NTREES_D=1
    lit = _write_prefix_code(w, {ord("h"): 1, ord("i"): 1}, 256)
    sym3 = _cmd_sym(_ins_code(3), 0)
    cmd = _write_prefix_code(w, {sym3: 0}, 704)
    _write_prefix_code(w, {0: 0}, 64)
    code, ln = cmd[sym3]
    w.write_code(code, ln)
    for ch in "hih":
        code, ln = lit[ord(ch)]
        w.write_code(code, ln)
    assert decompress(w.getvalue()) == b"hih"


def test_hand_stream_context_map_inverse_mtf():
    """The IMTF bit transforms the decoded map values."""
    w = _BitWriter()
    _header(w, 4)
    _trivial_categories(w)
    w.write(0, 2)
    w.write(0, 4)
    w.write(0, 2)  # LSB6 (context = p1 & 63)
    _count_code(w, 2)  # NTREES_L = 2
    # raw map values before IMTF: [1, 0, 0, ...]; after IMTF with
    # initial list [0,1,...]: first value 1 → 1 (moves to front), then
    # 0 → now 1 again... so the decoded map starts [1, 1, ...]? No:
    # [1,0,...] → imtf: v=1 → mtf[1]=1, front-moved → list [1,0,2,...];
    # v=0 → mtf[0]=1 → map [1,1,...]; remaining zeros → all 1 except...
    w.write(0, 1)  # no RLE
    cm = _write_prefix_code(w, {0: 1, 1: 1}, 2)
    vals = [1] + [0] * 63
    for v in vals:
        code, ln = cm[v]
        w.write_code(code, ln)
    w.write(1, 1)  # inverse MTF ON
    w.write(0, 1)  # NTREES_D=1
    # after IMTF every context maps to tree 1 — tree 0 is never used
    _write_prefix_code(w, {ord("z"): 0}, 256)  # tree 0 (unused)
    _write_prefix_code(w, {ord("y"): 0}, 256)  # tree 1
    sym4 = _cmd_sym(_ins_code(4), 0)
    cmd = _write_prefix_code(w, {sym4: 0}, 704)
    _write_prefix_code(w, {0: 0}, 64)
    code, ln = cmd[sym4]
    w.write_code(code, ln)
    assert decompress(w.getvalue()) == b"yyyy"


def test_decoder_rejects_incomplete_prefix_code():
    """An under-subscribed literal code must be rejected, not guessed."""
    w = _BitWriter()
    _header(w, 1)
    _trivial_categories(w)
    w.write(0, 2)
    w.write(0, 4)
    w.write(0, 2)
    w.write(0, 1)
    w.write(0, 1)
    w.write(0, 2)  # complex literal code
    cl_lens = {2: 1, 3: 1}
    space = 32
    for s in _CL_ORDER:
        v = cl_lens.get(s, 0)
        code, n = _CL_FIXED_CODE[v]
        w.write(code, n)
        if v:
            space -= 32 >> v
            if space <= 0:
                break
    # symbols: one length-2, one length-3 → Kraft 1/4+1/8 < 1
    w.write_code(0, 1)  # symbol 0 → length 2
    w.write_code(1, 1)  # symbol 1 → length 3
    # pad so the reader has bits to consume before the check fires
    w.write(0, 16)
    with pytest.raises((ValueError, EOFError)):
        decompress(w.getvalue())


# ---------------------------------------------------------------------------
# bit I/O invariants
# ---------------------------------------------------------------------------


def test_bitreader_alignment_and_bytes():
    br = _BitReader(b"\xa5\x0f\xff")
    assert br.read(4) == 0x5
    br_pad = br.read(4)
    assert br_pad == 0xA
    assert br.read_bytes(1) == b"\x0f"
    assert br.read(8) == 0xFF
    with pytest.raises(EOFError):
        br.read(1)


def test_bitwriter_reader_round_trip():
    rng = random.Random(3)
    fields = [(rng.randrange(1 << n), n) for n in range(1, 25) for _ in (0, 1)]
    w = _BitWriter()
    for v, n in fields:
        w.write(v, n)
    br = _BitReader(w.getvalue())
    for v, n in fields:
        assert br.read(n) == v


# ---------------------------------------------------------------------------
# adversarial robustness: malformed input must fail FAST with the
# family taxonomy (ValueError / EOFError / the named boundaries) —
# never hang, never loop, never return silently on corrupt bits
# ---------------------------------------------------------------------------


def test_fuzz_random_bytes_terminate():
    rng = random.Random(0xFE11)
    ok = 0
    for n in (0, 1, 2, 3, 7, 40, 300, 4096):
        for _ in range(40):
            blob = bytes(rng.randrange(256) for _ in range(n))
            try:
                out = decompress(blob, max_output=1 << 22)
                ok += 1  # a random blob CAN be a valid tiny stream
                assert len(out) <= 1 << 22
            except (ValueError, EOFError, NotImplementedError):
                pass
    # most random blobs must be rejected; a handful may parse (e.g.
    # single-byte last-empty streams)
    assert ok < 40


def test_fuzz_bit_flips_of_valid_streams():
    rng = random.Random(0xF11B)
    payload = (b"the quick brown fox jumps over the lazy dog " * 30)[:900]
    for mode in ("lz", "literals", "uncompressed"):
        blob = bytearray(compress(payload, mode=mode))
        for _ in range(150):
            i = rng.randrange(len(blob))
            bit = 1 << rng.randrange(8)
            blob[i] ^= bit
            try:
                out = decompress(bytes(blob), max_output=1 << 22)
                # a surviving flip may legitimately decode differently;
                # it must still respect the output bound
                assert len(out) <= 1 << 22
            except (ValueError, EOFError, NotImplementedError):
                pass
            finally:
                blob[i] ^= bit  # restore
        assert decompress(bytes(blob)) == payload  # restoration sanity


def test_fuzz_truncations_of_valid_stream():
    payload = bytes(range(256)) * 8
    blob = compress(payload, mode="lz")
    for cut in range(1, len(blob)):
        try:
            out = decompress(blob[:cut])
            assert len(out) <= len(payload)
        except (ValueError, EOFError, NotImplementedError):
            pass


def test_max_output_guard():
    # a 4 MiB output from a tiny stream must trip the bound, not
    # allocate unboundedly (the zip-bomb shape: huge copy runs)
    payload = b"\x00" * (1 << 22)
    blob = compress(payload, mode="lz")
    assert len(blob) < 4096  # it really is a bomb-shaped stream
    with pytest.raises(ValueError, match="max_output"):
        decompress(blob, max_output=1 << 20)
    assert decompress(blob, max_output=1 << 22) == payload


# ---------------------------------------------------------------------------
# cross-implementation pins against the container's libbrotli 1.0.9
# (skip when the shared libraries are absent — every pin above remains)
# ---------------------------------------------------------------------------


def _libbrotlicommon():
    import ctypes

    try:
        return ctypes.CDLL("libbrotlicommon.so.1")
    except OSError:
        return None


needs_common = pytest.mark.skipif(
    _libbrotlicommon() is None, reason="libbrotlicommon not installed"
)
needs_enc = pytest.mark.skipif(
    native_compress(b"") is None, reason="libbrotlienc not installed"
)


@needs_common
def test_vendored_dictionary_matches_libbrotli():
    import ctypes
    import hashlib

    lib = _libbrotlicommon()

    class BD(ctypes.Structure):
        _fields_ = [
            ("size_bits_by_length", ctypes.c_uint8 * 32),
            ("offsets_by_length", ctypes.c_uint32 * 32),
            ("data_size", ctypes.c_size_t),
            ("data", ctypes.POINTER(ctypes.c_uint8)),
        ]

    lib.BrotliGetDictionary.restype = ctypes.POINTER(BD)
    d = lib.BrotliGetDictionary().contents
    blob = bytes(
        ctypes.cast(
            d.data, ctypes.POINTER(ctypes.c_uint8 * d.data_size)
        ).contents
    )
    ours = _dictionary()
    assert blob == ours
    assert hashlib.sha256(ours).hexdigest() == (
        "20e42eb1b511c21806d4d227d07e5dd06877d8ce7b3a817f378f313653f35c70"
    )
    from tectonic_spark.operators.brotli import _DICT_OFFSETS, _DICT_SIZE_BITS

    assert tuple(d.size_bits_by_length)[4:25] == _DICT_SIZE_BITS
    assert tuple(d.offsets_by_length)[4:26] == _DICT_OFFSETS


@needs_common
def test_vendored_context_tables_match_libbrotli():
    import ctypes

    lib = _libbrotlicommon()
    tbl = bytes(
        (ctypes.c_ubyte * 2048).in_dll(lib, "_kBrotliContextLookupTable")
    )
    # layout: 512 bytes per mode (lut0 then lut1): LSB6, MSB6, UTF8, Signed
    assert tbl[1024:1280] == _CTX_UTF8_0
    assert tbl[1280:1536] == _CTX_UTF8_1
    assert tbl[1536:1792] == _CTX_SIGNED_0
    assert tbl[1792:2048] == _CTX_SIGNED_1
    # and the two computed modes agree with their closed forms
    assert all(tbl[i] == (i & 0x3F) for i in range(256))
    assert all(tbl[512 + i] == (i >> 2) for i in range(256))


@needs_common
def test_all_121_transforms_match_libbrotli():
    """Every transform × every word length × ferment edge shapes,
    pinned against BrotliTransformDictionaryWord."""
    import ctypes

    lib = _libbrotlicommon()

    class BT(ctypes.Structure):
        _fields_ = [
            ("prefix_suffix_size", ctypes.c_uint16),
            ("prefix_suffix", ctypes.POINTER(ctypes.c_uint8)),
            ("prefix_suffix_map", ctypes.POINTER(ctypes.c_uint16)),
            ("num_transforms", ctypes.c_uint32),
            ("transforms", ctypes.POINTER(ctypes.c_uint8)),
            ("params", ctypes.POINTER(ctypes.c_uint8)),
            ("cutOffTransforms", ctypes.c_int16 * 10),
        ]

    lib.BrotliGetTransforms.restype = ctypes.POINTER(BT)
    t = lib.BrotliGetTransforms().contents
    assert t.num_transforms == 121
    lib.BrotliTransformDictionaryWord.restype = ctypes.c_int
    dst = ctypes.create_string_buffer(256)
    blob = _dictionary()
    from tectonic_spark.operators.brotli import _DICT_OFFSETS

    probes = [
        b"abcd", b"ABCDEFG", b"a b c d e f", b"hello world!",
        "héllo wörld".encode(), "€uro sign".encode(),
        bytes(range(0x20, 0x38)), b"\xc2", b"\xe2\x82",
        blob[_DICT_OFFSETS[0] : _DICT_OFFSETS[0] + 4],
        blob[_DICT_OFFSETS[20] : _DICT_OFFSETS[20] + 24],
    ]
    for word in probes:
        for tid in range(121):
            n = lib.BrotliTransformDictionaryWord(
                dst, word, len(word), ctypes.byref(t), tid
            )
            assert _transform_word(word, tid) == dst.raw[:n], (word, tid)


_XIMPL_SAMPLES = {
    "text": b"the quick brown fox jumps over the lazy dog. " * 50,
    "html": (
        b"<!DOCTYPE html><html><head><title>Example Domain</title></head>"
        b'<body><div class="content"><p>This domain is for use in '
        b"illustrative examples in documents. You may use this domain "
        b"without prior coordination or asking for permission.</p>"
        b'<a href="https://www.iana.org/domains/example">More</a>'
        b"</div></body></html>"
    ) * 8,
    "json": b'{"name": "value", "items": [1, 2, 3], "ok": true}' * 40,
    "utf8": ("héllo wörld — çafé naïve übermensch " * 60).encode(),
    "words": b" ".join(
        b"information available different development public university"
        for _ in range(30)
    ),
    "binary": bytes((i * 167 + (i >> 3)) & 0xFF for i in range(5000)),
    "empty": b"",
}


@needs_enc
@pytest.mark.parametrize("quality", list(range(1, 12)))
def test_decodes_real_libbrotlienc_streams(quality):
    """The headline r13 pin: REAL encoder output at every quality —
    q>=4 emits static-dictionary references, q=11 emits UTF8-context
    multi-tree streams — decodes bit-exactly."""
    for name, data in _XIMPL_SAMPLES.items():
        enc = native_compress(data, quality=quality)
        assert enc is not None
        assert decompress(enc) == data, (name, quality)


@needs_enc
def test_differential_fuzz_vs_libbrotli():
    """Random corpora at random qualities/windows: libbrotlienc -> our
    decoder == input, and our decoder == libbrotlidec on the same
    stream; our encoder -> libbrotlidec == input."""
    rng = random.Random(0x13B)
    words = (
        b"the of and a to in is you that it he was for on are as with "
        b"information available different development public university "
        b"example domain https://www. <div class= </p> &amp;"
    ).split()
    for trial in range(60):
        n = rng.choice((0, 1, 3, 17, 100, 700, 4096, 20000))
        kind = rng.randrange(4)
        if kind == 0:
            data = bytes(rng.randrange(256) for _ in range(n))
        elif kind == 1:
            data = b" ".join(
                rng.choice(words) for _ in range(n // 5)
            )[:n]
        elif kind == 2:
            data = (rng.choice(words) * (n // 3 + 1))[:n]
        else:
            data = bytes(rng.randrange(32, 127) for _ in range(n))
        q = rng.randrange(0, 12)
        wb = rng.randrange(10, 25)
        enc = native_compress(data, quality=q, lgwin=wb)
        out = decompress(enc)
        assert out == data, (trial, n, q, wb)
        assert native_decompress(enc) == data
        mode = ("lz", "literals", "uncompressed", "dict")[trial % 4]
        ours = compress(data, mode=mode)
        assert native_decompress(ours) == data, (trial, mode)


@needs_enc
def test_native_decompress_semantics():
    data = b"semantics check " * 100
    enc = native_compress(data, quality=9)
    assert native_decompress(enc) == data
    with pytest.raises(ValueError, match="trailing"):
        native_decompress(enc + b"\x00")
    with pytest.raises(EOFError):
        native_decompress(enc[: len(enc) // 2])
    # corrupt bytes: either structural (ValueError) or read as a
    # truncated lazy meta-block (EOFError) — never decoded
    with pytest.raises((ValueError, EOFError)):
        native_decompress(b"\x00\x01\x02brotli-ish")
    with pytest.raises(ValueError):
        native_decompress(b"\x11")  # reserved WBITS pattern
    with pytest.raises(ValueError):
        decompress(b"\x11")  # the pure decoder agrees
    with pytest.raises(BrotliOutputCapExceeded):
        native_decompress(enc, max_output=100)


def test_dict_mode_round_trips_and_emits_references():
    text = (
        b"The quick brown fox jumps over the lazy dog. Information "
        b"about the national development of the public university."
    )
    enc = compress(text, mode="dict")
    assert decompress(enc) == text
    # the matcher genuinely reached past the window (transform 0 and
    # the ferment-first transform for capitalized occurrences)
    from tectonic_spark.operators.brotli import _find_dict_commands

    cmds = _find_dict_commands(text, 0, len(text), (1 << 22) - 16, {})
    pos, hits = 0, 0
    for ins, cpy, dist in cmds:
        pos += ins
        if dist > min(pos, (1 << 22) - 16):
            hits += 1
        pos += cpy
    assert hits >= 5


def test_dict_mode_random_round_trips():
    rng = random.Random(0xD1C7)
    words = (
        b"the of and information available different development "
        b"public university The Information Development ZZQXJ"
    ).split()
    for _ in range(20):
        n = rng.randrange(0, 4000)
        data = b" ".join(rng.choice(words) for _ in range(n // 6 + 1))[:n]
        assert decompress(compress(data, mode="dict")) == data


def test_metadata_metablock_with_islast_accepted():
    """A metadata meta-block carrying ISLAST ends the stream — the
    reference implementation's reading (an earlier revision rejected
    this shape; the pure decoder now matches libbrotlidec)."""
    w = _BitWriter()
    w.write(0, 1)  # WBITS=16
    w.write(1, 1)  # ISLAST
    w.write(0, 1)  # ISLASTEMPTY=0
    w.write(3, 2)  # MNIBBLES code 3 -> metadata
    w.write(0, 1)  # reserved
    w.write(0, 2)  # MSKIPBYTES=0
    blob = w.getvalue()
    assert decompress(blob) == b""
    nd = native_decompress(blob)
    assert nd is None or nd == b""
    # and with skipped payload bytes
    w = _BitWriter()
    w.write(0, 1)
    w.write(1, 1)
    w.write(0, 1)
    w.write(3, 2)
    w.write(0, 1)
    w.write(1, 2)  # MSKIPBYTES=1
    w.write(4, 8)  # skip 5 bytes
    w.align_byte()
    w.write_bytes(b"meta!")
    blob = w.getvalue()
    assert decompress(blob) == b""
    nd = native_decompress(blob)
    assert nd is None or nd == b""


# ---------------------------------------------------------------------------
# property-based round trips (Hypothesis)
# ---------------------------------------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAS_HYP = True
except ImportError:  # pragma: no cover
    _HAS_HYP = False

if _HAS_HYP:

    @settings(max_examples=60, deadline=None)
    @given(st.binary(max_size=3000))
    def test_property_dict_mode_round_trip(data):
        """Any byte string survives the dictionary-matching encoder
        lane (slices that happen to equal dictionary words become §8
        references; everything else stays literal/LZ)."""
        assert decompress(compress(data, mode="dict")) == data

    @settings(max_examples=40, deadline=None)
    @given(
        st.text(
            alphabet="the of and informatio n develpublic universty é€ .<>/",
            max_size=2000,
        ),
        st.sampled_from(["lz", "dict", "literals", "uncompressed"]),
    )
    def test_property_modes_cross_decoder(text, mode):
        """Every encoder lane's output decodes identically through the
        pure decoder AND (when present) libbrotlidec."""
        data = text.encode()
        blob = compress(data, mode=mode)
        assert decompress(blob) == data
        nd = native_decompress(blob)
        assert nd is None or nd == data
