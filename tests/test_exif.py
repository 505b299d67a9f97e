"""EXIF extraction: IFD0/Exif/GPS sub-IFD round-trips in both byte
orders, exact milli-arcsecond reduction, and the JPEG/WebP carriers."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tectonic_spark.operators.exif import (
    build_exif,
    exif_from_jpeg,
    insert_exif_jpeg,
    parse_exif,
)


def _full(be=False, prefix=True):
    return build_exif(
        orientation=6,
        datetime="2024:03:15 10:42:00",
        datetime_original="2024:03:15 10:41:58",
        make="CAM3",
        model="MOD5",
        exposure=(1, 250),
        iso=400,
        pixel_x=640,
        pixel_y=480,
        gps_lat=("N", (51, 1), (30, 1), (1234, 100)),
        gps_lon=("W", (0, 1), (7, 1), (4521, 100)),
        gps_alt=(35, 1),
        big_endian=be,
        prefix=prefix,
    )


@pytest.mark.parametrize("be", [False, True])
def test_full_roundtrip(be):
    meta = parse_exif(_full(be=be))
    assert meta["byte_order"] == ("MM" if be else "II")
    assert meta["orientation"] == 6
    assert meta["datetime"] == "2024:03:15 10:42:00"
    assert meta["datetime_original"] == "2024:03:15 10:41:58"
    assert meta["make"] == "CAM3" and meta["model"] == "MOD5"
    assert meta["exposure"] == (1, 250) and meta["iso"] == 400
    assert meta["pixel_x"] == 640 and meta["pixel_y"] == 480
    assert meta["gps_lat_ref"] == "N" and meta["gps_lon_ref"] == "W"
    assert meta["gps_lat_mas"] == 51 * 3600000 + 30 * 60000 + 12340
    assert meta["gps_lon_mas"] == 7 * 60000 + 45210
    assert meta["gps_alt"] == (35, 1)


def test_prefix_optional():
    with_p = parse_exif(_full(prefix=True))
    without = parse_exif(_full(prefix=False))
    assert with_p == without


def test_minimal_exif():
    meta = parse_exif(build_exif(orientation=1))
    assert meta["orientation"] == 1
    assert meta["make"] is None and meta["gps_lat_mas"] is None
    assert meta["datetime_original"] is None


def test_mas_rejects_irreducible():
    from tectonic_spark.operators.exif import _dms_to_mas

    # 1/3 arcsecond does not land on integer milli-arcseconds
    with pytest.raises(ValueError, match="milli-arcseconds"):
        _dms_to_mas([(0, 1), (0, 1), (1, 3)])
    assert _dms_to_mas([(1, 1), (2, 1), (500, 1000)]) == 3720500


def test_jpeg_carrier():
    from tectonic_spark.operators.jpeg import decode_jpeg, encode_jpeg

    ex = build_exif(orientation=3, make="CAMX", prefix=False)
    img = (np.arange(256) % 256).astype(np.uint8).reshape(16, 16)
    plain = encode_jpeg(img)
    tagged = insert_exif_jpeg(plain, ex)
    assert exif_from_jpeg(tagged) == ex
    assert exif_from_jpeg(plain) is None
    # pixel decode unaffected by the spliced APP1
    assert (decode_jpeg(tagged) == decode_jpeg(plain)).all()
    with pytest.raises(ValueError, match="bad SOI"):
        exif_from_jpeg(b"nope")
    with pytest.raises(ValueError, match="bad SOI"):
        insert_exif_jpeg(b"nope", ex)


def test_webp_carrier():
    from tectonic_spark.operators.webp import (
        encode_webp,
        exif_payload,
        parse_webp,
    )

    ex = build_exif(orientation=8, iso=200, prefix=False)
    img = (np.arange(10 * 12 * 4) % 256).astype(np.uint8).reshape(10, 12, 4)
    data = encode_webp(img, exif=ex)
    info = parse_webp(data)
    assert info["format"] == "extended" and info["has_exif"]
    assert info["chunks"] == ["VP8X", "VP8L", "EXIF"]
    assert (info["width"], info["height"]) == (12, 10)
    got = parse_exif(exif_payload(data))
    assert got["orientation"] == 8 and got["iso"] == 200


def test_truncated_exif():
    ex = _full()
    with pytest.raises(EOFError):
        parse_exif(ex[:20])
    with pytest.raises(ValueError, match="byte-order"):
        parse_exif(b"XX" + ex[8:])


@settings(max_examples=30, deadline=None)
@given(
    orientation=st.integers(1, 8),
    d=st.integers(0, 89),
    m=st.integers(0, 59),
    s100=st.integers(0, 5999),
    iso=st.integers(50, 6400),
    be=st.booleans(),
    ref=st.sampled_from(["N", "S"]),
)
def test_property_roundtrip(orientation, d, m, s100, iso, be, ref):
    ex = build_exif(
        orientation=orientation,
        iso=iso,
        gps_lat=(ref, (d, 1), (m, 1), (s100, 100)),
        big_endian=be,
    )
    meta = parse_exif(ex)
    assert meta["orientation"] == orientation
    assert meta["iso"] == iso
    assert meta["gps_lat_ref"] == ref
    assert meta["gps_lat_mas"] == d * 3600000 + m * 60000 + s100 * 10
