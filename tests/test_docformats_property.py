"""Property + adversarial tests for the document-format codecs (the
brotli-suite pattern): Hypothesis round-trips over generated content,
exhaustive truncation sweeps (every prefix must raise EOFError or
ValueError — NEVER return wrong data), and random-bytes fuzz (no
hangs, no wrong-type exceptions)."""

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tectonic_spark.operators.codecs import encode_ico, parse_ico
from tectonic_spark.operators.epub import build_epub, extract_epub
from tectonic_spark.operators.odf import build_odt, extract_odt
from tectonic_spark.operators.ooxml import (
    build_docx,
    build_xlsx,
    extract_docx,
    extract_xlsx,
)
from tectonic_spark.operators.rtf import build_rtf, extract_rtf

# words without XML/RTF metacharacters; the escaping lanes have their
# own deterministic tests — here the property is structural round-trip
_word = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABC0123456789",
    min_size=1,
    max_size=9,
)
_line = st.lists(_word, min_size=1, max_size=8).map(" ".join)


@settings(max_examples=25, deadline=None)
@given(
    lines=st.lists(_line, min_size=1, max_size=6),
    styles=st.lists(
        st.sampled_from(["Normal", "Heading1", "Heading2"]),
        min_size=6,
        max_size=6,
    ),
)
def test_docx_property_roundtrip(lines, styles):
    paras = [(styles[i], ln) for i, ln in enumerate(lines)]
    out = extract_docx(build_docx(paras, title="t", creator="c"))
    assert out["paragraphs"] == paras


@settings(max_examples=25, deadline=None)
@given(
    chapters=st.lists(
        st.tuples(_word, st.lists(_line, min_size=0, max_size=4).map("\n".join)),
        min_size=1,
        max_size=4,
    ),
    rot=st.integers(min_value=0, max_value=7),
)
def test_epub_property_spine(chapters, rot):
    out = extract_epub(
        build_epub(
            chapters, title="t", author="a", lang="en", spine_rotate=rot
        )
    )
    assert out["chapters"] == chapters


@settings(max_examples=25, deadline=None)
@given(
    paras=st.lists(
        st.text(
            alphabet="abc XYZ012é€中\t",  # incl. spaces/unicode/tabs
            min_size=1,
            max_size=40,
        ).filter(lambda s: s.strip()),
        min_size=1,
        max_size=5,
    ),
    bold=st.integers(min_value=0, max_value=4),
)
def test_rtf_property_roundtrip(paras, bold):
    out = extract_rtf(build_rtf(paras, title="t", bold_every=bold))
    assert out["text"] == "\n".join(paras)


@settings(max_examples=25, deadline=None)
@given(
    paras=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.text(
                alphabet="ab c",  # space runs exercise text:s
                min_size=1,
                max_size=30,
            ).filter(lambda s: s.strip()),
        ),
        min_size=1,
        max_size=5,
    )
)
def test_odt_property_whitespace(paras):
    out = extract_odt(build_odt(paras, title="t"))
    assert out["paragraphs"] == paras


@settings(max_examples=20, deadline=None)
@given(
    cells=st.lists(
        st.lists(
            st.one_of(
                st.integers(min_value=-10**9, max_value=10**9),
                _word,
            ),
            min_size=1,
            max_size=4,
        ),
        min_size=1,
        max_size=6,
    ),
    inline=st.booleans(),
)
def test_xlsx_property_roundtrip(cells, inline):
    out = extract_xlsx(build_xlsx([("s", cells)], inline_lane=inline))
    assert out["sheets"] == [("s", cells)]


@settings(max_examples=10, deadline=None)
@given(
    dims=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=40),
            st.integers(min_value=1, max_value=40),
            st.booleans(),
        ),
        min_size=1,
        max_size=3,
    ),
    seed=st.integers(min_value=0, max_value=255),
)
def test_ico_property_roundtrip(dims, seed):
    imgs = [
        {
            "w": w,
            "h": h,
            "fmt": "png" if png else "bmp",
            "pixels": bytes((i * (seed + 3) + w) % 256 for i in range(w * h * 3)),
        }
        for w, h, png in dims
    ]
    back = parse_ico(encode_ico(imgs))
    assert [(b["w"], b["h"], b["fmt"], b["pixels"]) for b in back] == [
        (a["w"], a["h"], a["fmt"], a["pixels"]) for a in imgs
    ]


# ------------------------------------------------------- truncation sweeps


def _sweep(data: bytes, parse, step: int = 1) -> None:
    """Every proper prefix must raise EOFError or ValueError — never
    succeed with wrong data, never raise anything else."""
    for cut in range(0, len(data), step):
        try:
            parse(data[:cut])
        except (EOFError, ValueError):
            continue
        except NotImplementedError:
            continue  # a truncation landing on a named refusal is fine
        raise AssertionError(f"prefix of {cut} bytes parsed successfully")


def test_truncation_sweep_docx():
    data = build_docx(
        [("Normal", "alpha beta gamma")], title="t", creator="c"
    )
    _sweep(data, extract_docx, step=7)


def test_truncation_sweep_epub():
    data = build_epub([("c", "one line")], title="t", author="a", lang="en")
    _sweep(data, extract_epub, step=7)


def test_truncation_sweep_odt():
    data = build_odt([(0, "alpha beta")], title="t")
    _sweep(data, extract_odt, step=7)


def test_truncation_sweep_rtf():
    data = build_rtf(["alpha beta", "gamma"], title="t")
    _sweep(data, extract_rtf, step=1)


def test_truncation_sweep_ico():
    data = encode_ico(
        [{"w": 9, "h": 7, "fmt": "bmp", "pixels": bytes(9 * 7 * 3)}]
    )
    _sweep(data, parse_ico, step=1)


def test_random_bytes_fuzz():
    rng = random.Random(1337)
    parsers = [extract_docx, extract_epub, extract_odt, extract_rtf,
               parse_ico, extract_xlsx]
    for trial in range(60):
        blob = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 400)))
        for parse in parsers:
            try:
                parse(blob)
            except (EOFError, ValueError, NotImplementedError):
                continue
            except Exception as e:  # noqa: BLE001
                raise AssertionError(
                    f"{parse.__name__} raised {type(e).__name__} on"
                    f" random bytes: {e}"
                )
            raise AssertionError(
                f"{parse.__name__} accepted random bytes (trial {trial})"
            )


def test_bitflip_fuzz_docx():
    rng = random.Random(4242)
    data = bytearray(
        build_docx([("Normal", "alpha beta gamma delta")], title="t",
                   creator="c")
    )
    good = extract_docx(bytes(data))
    for _ in range(120):
        i = rng.randrange(len(data))
        old = data[i]
        data[i] ^= 1 << rng.randrange(8)
        try:
            out = extract_docx(bytes(data))
            # a surviving flip must still be a self-consistent parse
            assert isinstance(out["paragraphs"], list)
        except (EOFError, ValueError, NotImplementedError):
            pass
        except Exception as e:  # noqa: BLE001
            raise AssertionError(
                f"bit flip at {i} raised {type(e).__name__}: {e}"
            )
        finally:
            data[i] = old
    assert extract_docx(bytes(data)) == good  # restored
