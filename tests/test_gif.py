"""GIF codec: lossless LZW round-trips across width-growth and
dictionary-reset regimes, interlace, animation census, error taxonomy.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tectonic_spark.operators.gif import (
    decode_gif,
    encode_gif,
    parse_gif,
)


def _pal(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (n, 3), dtype=np.uint8)


def _idx(h, w, n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, n, (h, w), dtype=np.uint8)


@pytest.mark.parametrize("ncolors", [2, 4, 16, 64, 256])
def test_roundtrip_palette_sizes(ncolors):
    pal = _pal(ncolors, seed=ncolors)
    img = _idx(23, 17, ncolors, seed=ncolors + 1)
    got = decode_gif(encode_gif(img, pal))
    fr = got["frames"][0]
    assert (fr["indices"] == img).all()
    assert (fr["rgb"] == pal[img]).all()
    assert got["width"] == 17 and got["height"] == 23


def test_dictionary_reset_path():
    """A 256-color noise frame big enough to drive the dictionary to
    4096 entries forces 12-bit codes AND the clear/reset path."""
    pal = _pal(256, seed=3)
    img = _idx(128, 128, 256, seed=4)
    data = encode_gif(img, pal)
    fr = decode_gif(data)["frames"][0]
    assert (fr["indices"] == img).all()


def test_compressible_content_exercises_long_chains():
    pal = _pal(4, seed=5)
    img = np.tile(np.array([[0, 0, 1, 1, 2, 2, 3, 3]], dtype=np.uint8), (40, 12))
    fr = decode_gif(encode_gif(img, pal))["frames"][0]
    assert (fr["indices"] == img).all()


def test_interlaced_roundtrip():
    pal = _pal(16, seed=6)
    img = _idx(37, 11, 16, seed=7)
    data = encode_gif(img, pal, interlace=True)
    meta = parse_gif(data)
    assert meta["n_interlaced"] == 1
    fr = decode_gif(data)["frames"][0]
    assert fr["interlaced"] and (fr["indices"] == img).all()


def test_animation_with_gce_loop_and_local_palettes():
    gpal = _pal(8, seed=8)
    frames = [_idx(9, 13, 8, seed=20 + k) for k in range(4)]
    lps = [None if k % 2 == 0 else _pal(32, seed=40 + k) for k in range(4)]
    # encode_gif takes per-frame local palettes; None -> global
    data = encode_gif(
        frames,
        gpal,
        loop=3,
        delays=[10, 20, 30, 40],
        local_palettes=[lp if lp is not None else None for lp in lps],
    )
    got = decode_gif(data)
    assert got["version"] == "89a" and got["loop"] == 3
    assert len(got["frames"]) == 4
    for k, fr in enumerate(got["frames"]):
        assert (fr["indices"] == frames[k]).all()
        table = gpal if lps[k] is None else lps[k]
        assert (fr["rgb"] == table[frames[k]]).all()
        assert fr["delay"] == [10, 20, 30, 40][k]
    meta = parse_gif(data)
    assert meta["n_frames"] == 4
    assert meta["n_local_tables"] == 2
    assert meta["bytes_walked"] == len(data)


def test_version_87a_when_featureless():
    data = encode_gif(_idx(4, 4, 4, seed=1), _pal(4))
    assert data[:6] == b"GIF87a"
    assert decode_gif(data)["version"] == "87a"


def test_single_pixel_and_single_row():
    for h, w in [(1, 1), (1, 9), (9, 1)]:
        pal = _pal(4, seed=h * 10 + w)
        img = _idx(h, w, 4, seed=h + w)
        assert (decode_gif(encode_gif(img, pal))["frames"][0]["indices"] == img).all()


def test_error_taxonomy():
    pal = _pal(8, seed=2)
    img = _idx(12, 12, 8, seed=3)
    good = encode_gif(img, pal)
    with pytest.raises(ValueError, match="bad signature"):
        decode_gif(b"JUNK" + good[4:])
    with pytest.raises(EOFError):
        decode_gif(good[: len(good) - 5])
    # strip the trailer
    with pytest.raises(EOFError, match="missing GIF trailer"):
        decode_gif(good[:-1])
    # unknown block type
    bad = good[:-1] + b"\x7f" + good[-1:]
    with pytest.raises(ValueError, match="unknown GIF block"):
        decode_gif(bad)
    # invalid LZW: first code beyond the dictionary (hand-built stream
    # whose first 4-bit code is 0xF > end for an 8-color image)
    import struct as _s

    hdr = b"GIF87a" + _s.pack("<HH", 4, 4) + bytes([0x80 | 2, 0, 0])
    hdr += bytes(range(24))  # 8-entry GCT
    hdr += b"\x2c" + _s.pack("<HHHH", 0, 0, 4, 4) + b"\x00"
    hdr += bytes([3]) + b"\x01\xff\x00" + b"\x3b"
    with pytest.raises(ValueError, match="invalid GIF LZW code"):
        decode_gif(hdr)
    # LZW data that ends before the pixels do
    short = bytes([3]) + b"\x01\x08\x00" + b"\x3b"  # one CLEAR, nothing else
    with pytest.raises(EOFError, match="LZW data exhausted"):
        decode_gif(hdr[: -len(bytes([3]) + b"\x01\xff\x00" + b"\x3b")] + short)


def test_parse_matches_decode_census():
    pal = _pal(16, seed=9)
    frames = [_idx(8, 8, 16, seed=k) for k in range(3)]
    data = encode_gif(frames, pal, delays=[1, 2, 3])
    meta = parse_gif(data)
    got = decode_gif(data)
    assert meta["n_frames"] == len(got["frames"]) == 3
    assert meta["n_extensions"] == 3  # one GCE per frame
    assert meta["bytes_walked"] == len(data)


@settings(max_examples=60, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    ncolors=st.sampled_from([2, 3, 4, 7, 16, 100, 256]),
    seed=st.integers(0, 2**16),
    interlace=st.booleans(),
    structured=st.booleans(),
)
def test_property_roundtrip(h, w, ncolors, seed, interlace, structured):
    rng = np.random.default_rng(seed)
    if structured:
        # repetitive content drives long dictionary chains
        base = rng.integers(0, ncolors, (max(1, h // 3), max(1, w // 3)))
        img = np.tile(base, (3, 3))[:h, :w].astype(np.uint8)
    else:
        img = rng.integers(0, ncolors, (h, w), dtype=np.uint8)
    pal = _pal(ncolors, seed=seed % 97)
    fr = decode_gif(encode_gif(img, pal, interlace=interlace))["frames"][0]
    assert (fr["indices"] == img).all()


def test_real_world_gifs_decode():
    """Interop ground truth: GIFs written by REAL third-party encoders
    (the tkinter/IDLE icon set shipped with CPython) must decode with
    full byte-extent walks — pins the LZW width protocol against
    actual encoder output, not just our own round-trips."""
    import glob
    import os

    cands = sorted(
        glob.glob(
            os.path.join(
                os.path.dirname(os.__file__), "idlelib", "Icons", "*.gif"
            )
        )
    )
    if not cands:
        pytest.skip("no idlelib icons on this host")
    import os as _os

    for f in cands:
        data = open(f, "rb").read()
        got = decode_gif(data)
        meta = parse_gif(data)
        assert meta["bytes_walked"] == len(data)
        for fr in got["frames"]:
            assert fr["rgb"].shape[2] == 3
            assert fr["indices"].shape[0] >= 1


def test_per_frame_interlace_mix():
    pal = _pal(16, seed=11)
    frames = [_idx(24, 18, 16, seed=k) for k in range(3)]
    data = encode_gif(frames, pal, interlace=[False, True, False])
    assert parse_gif(data)["n_interlaced"] == 1
    got = decode_gif(data)
    flags = [fr["interlaced"] for fr in got["frames"]]
    assert flags == [False, True, False]
    for fr, ref in zip(got["frames"], frames):
        assert (fr["indices"] == ref).all()


def test_disposal_method_surfaced():
    import struct as _s

    pal = _pal(4, seed=1)
    img = _idx(5, 5, 4, seed=2)
    data = encode_gif(img, pal, delays=[7])
    # rewrite the GCE flags byte to carry disposal method 2
    pos = data.index(b"\x21\xf9\x04") + 3
    patched = bytearray(data)
    patched[pos] = (patched[pos] & ~0x1C) | (2 << 2)
    # fix nothing else: GCE has no checksum
    got = decode_gif(bytes(patched))
    assert got["frames"][0]["disposal"] == 2
    assert got["frames"][0]["delay"] == 7
    # encoder's default flags carry disposal 0
    assert decode_gif(data)["frames"][0]["disposal"] == 0


def test_parse_gif_truncated_descriptor():
    # r10 ADVICE: parse_gif must raise the documented EOFError taxonomy
    # (not IndexError) when truncated inside an image descriptor
    pal = _pal(4, seed=3)
    img = _idx(6, 6, 4, seed=4)
    data = encode_gif(img, pal)
    dpos = data.index(b"\x2c")
    truncated = data[: dpos + 5]  # cut mid-descriptor
    with pytest.raises(EOFError, match="truncated GIF image descriptor"):
        parse_gif(truncated)
    with pytest.raises(EOFError, match="truncated GIF image descriptor"):
        decode_gif(truncated)


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 48),
    w=st.integers(1, 48),
    ncol=st.integers(2, 256),
    seed=st.integers(0, 2**16),
    runs=st.booleans(),
)
def test_lzw_vectorized_equals_scalar(h, w, ncol, seed, runs):
    """r10 differential gate: the vectorized-extraction LZW engine must
    be bit-identical to the scalar reference across palette sizes,
    width-growth regimes, run-heavy content (entry refs + cScSc), and
    dictionary resets."""
    from tectonic_spark.operators.gif import (
        _lzw_decode,
        _lzw_decode_scalar,
        _lzw_encode,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, ncol, (h, w), dtype=np.uint8)
    if runs:
        img = np.repeat(img[:, : max(1, w // 4)], 4, axis=1)[:, :w]
    mcs = max(2, int(ncol - 1).bit_length())
    enc = _lzw_encode(img.reshape(-1), mcs)
    a = _lzw_decode(enc, mcs, img.size)
    b = _lzw_decode_scalar(enc, mcs, img.size)
    assert (a == b).all()


def test_lzw_error_parity():
    """Truncated / corrupt streams raise the same taxonomy from both
    engines."""
    from tectonic_spark.operators.gif import (
        _lzw_decode,
        _lzw_decode_scalar,
        _lzw_encode,
    )

    img = np.arange(400, dtype=np.uint8) % 16
    enc = _lzw_encode(img, 4)
    for bad, n in ((enc[:3], 400), (enc, 1000)):
        errs = []
        for fn in (_lzw_decode, _lzw_decode_scalar):
            try:
                fn(bad, 4, n)
                errs.append(None)
            except Exception as e:
                errs.append(type(e).__name__)
        assert errs[0] == errs[1] is not None
    # an out-of-range code: craft width-5 stream with code 31 (> size)
    errs = []
    for fn in (_lzw_decode, _lzw_decode_scalar):
        try:
            fn(bytes([0b10110_000 | 0x10, 0xFF, 0xFF]), 4, 10)
            errs.append(None)
        except Exception as e:
            errs.append(type(e).__name__)
    assert errs[0] == errs[1] is not None
