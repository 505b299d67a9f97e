"""CSV parser golden tests — parity with the reference's CSV specs
(test/src/test/scala/tectonic/csv/ParserSpecs.scala:30-227): Excel-style
quoting/escaping, header inference (A..AZ), unix vs windows newlines, EOF
edge cases, and the seven error classes."""

from __future__ import annotations

import pytest

from tectonic_spark.core import ReifiedPlate
from tectonic_spark.core.csv_parser import CsvConfig, CsvParser, as_header
from tectonic_spark.core.result import Complete, Failure

WIN = CsvConfig()
UNIX = CsvConfig.unix()
WIN_NOHEADER = CsvConfig(header=False)
UNIX_NOHEADER = CsvConfig(header=False, row1=b"\n", row2=b"")


def parse(data, config=WIN, chunks=None):
    plate = ReifiedPlate()
    p = CsvParser(plate, config)
    events = []
    for ch in chunks or [data]:
        r = p.absorb(ch)
        if isinstance(r, Failure):
            return events, r
        events.extend(r.value)
    r = p.finish()
    if isinstance(r, Complete):
        events.extend(r.value)
    return events, r


def ok(data, config=WIN, chunks=None):
    events, r = parse(data, config, chunks)
    assert isinstance(r, Complete), f"parse failed: {r}"
    return events


def cell(h, v):
    return [("nest_map", h), ("str", v), ("unnest",)]


ROW = [("finish_row",)]


def test_single_value_one_column():
    assert ok("abc\r\nfubar\r\n") == cell("abc", "fubar") + ROW


def test_three_by_three():
    input_ = "a,b,c\r\nr1c1,r1c2,r1c3\r\nr2c1,r2c2,r2c3\r\nr3c1,r3c2,r3c3\r\n"
    expected = []
    for r in (1, 2, 3):
        for c, h in ((1, "a"), (2, "b"), (3, "c")):
            expected += cell(h, f"r{r}c{c}")
        expected += ROW
    assert ok(input_) == expected


def test_bare_cr_in_values():
    assert ok("a\r\nfu\rbar\r\n") == cell("a", "fu\rbar") + ROW


def test_comma_in_quoted_values():
    assert ok('a\r\n"fu,bar"\r\n') == cell("a", "fu,bar") + ROW


def test_record_delimiter_after_quoted():
    assert ok('a,b\r\n"fu,bar",baz\r\n') == cell("a", "fu,bar") + cell("b", "baz") + ROW


def test_quote_escaping():
    assert ok('a\r\n"fu""bar"\r\n') == cell("a", 'fu"bar') + ROW


def test_row_delimiter_in_quoted_record():
    assert ok('a\r\n"fu\r\nbar"\r\n') == cell("a", "fu\r\nbar") + ROW


def test_header_inference():
    input_ = "r1c1,r1c2,r1c3\r\nr2c1,r2c2,r2c3\r\n"
    expected = []
    for r in (1, 2):
        for c, h in ((1, "A"), (2, "B"), (3, "C")):
            expected += cell(h, f"r{r}c{c}")
        expected += ROW
    assert ok(input_, WIN_NOHEADER) == expected


def test_excel_names_52_columns():
    names = [as_header(i) for i in range(52)]
    assert names[:4] == ["A", "B", "C", "D"]
    assert names[25] == "Z" and names[26] == "AA" and names[51] == "AZ"
    # beyond AZ we follow the reference's exact formula (csv/Parser.scala:
    # 439-454, tested only to 52 columns there)
    assert as_header(52) == "BA"
    input_ = ",".join(str(i) for i in range(52)) + "\r\n"
    expected_row = []
    for i, h in enumerate(names):
        expected_row += cell(h, str(i))
    assert ok(input_ + input_, WIN_NOHEADER) == (
        expected_row + ROW + expected_row + ROW
    )


# --- EOF edges --------------------------------------------------------------


def test_row_ending_in_eof():
    assert ok("abc\r\nfubar") == cell("abc", "fubar") + ROW


def test_two_values_ending_in_eof():
    assert ok("abc,def\r\nfubar,baz") == cell("abc", "fubar") + cell("def", "baz") + ROW


def test_inferred_header_ending_in_eof():
    assert ok("fubar", WIN_NOHEADER) == cell("A", "fubar") + ROW


def test_quoted_value_ending_in_eof():
    assert ok('abc\r\n"fubar"') == cell("abc", "fubar") + ROW


def test_quoted_inferred_eof():
    assert ok('"fubar"', WIN_NOHEADER) == cell("A", "fubar") + ROW


def test_doubled_row_delimiter_is_empty_row():
    assert ok("foo\r\n\r\n") == cell("foo", "") + ROW


def test_missing_trailing_cell_at_eof_becomes_empty():
    assert ok("a,b\r\nx,") == cell("a", "x") + cell("b", "") + ROW


# --- unix newlines ----------------------------------------------------------


def test_unix_single_value():
    assert ok("abc\nfubar\n", UNIX) == cell("abc", "fubar") + ROW


def test_unix_inference():
    input_ = "r1c1,r1c2\nr2c1,r2c2\n"
    expected = (
        cell("A", "r1c1") + cell("B", "r1c2") + ROW
        + cell("A", "r2c1") + cell("B", "r2c2") + ROW
    )
    assert ok(input_, UNIX_NOHEADER) == expected


# --- chunk resumption -------------------------------------------------------


def test_split_everywhere_matches_unsplit():
    text = 'a,b\r\n"fu""z,",bar\r\nbaz\rq,"x\r\ny"\r\n'
    expected = ok(text)
    for cut in range(1, len(text)):
        assert ok(None, chunks=[text[:cut], text[cut:]]) == expected, cut


# --- errors (the 7 classes) -------------------------------------------------


@pytest.mark.parametrize(
    ("bad", "prefix"),
    [
        ("abc,,def", "empty header cell"),
        ('abc,"",def', "empty header cell"),
        ("abc,def", "unexpected end of file in header row"),
        ("abc,def\nfoo", "unexpected end of file: missing records"),
        ('abc\n"def"derp\n', "unexpected character found at record boundary"),
        ('foo\n"abc', "unexpected end of file: unclosed quoted record"),
        ('abc\n"def""derp\n', "unexpected end of file: unclosed quoted record"),
    ],
)
def test_error_classes(bad, prefix):
    events, r = parse(bad, UNIX)
    assert isinstance(r, Failure), f"expected failure for {bad!r}"
    assert str(r.error.message).startswith(prefix), r.error.message


def test_custom_delimiters():
    cfg = CsvConfig(record=b";", row1=b"|", row2=b"", open_quote=b"'",
                    close_quote=b"'", escape=b"'")
    assert ok("a;b|1;'x;y'|", cfg) == cell("a", "1") + cell("b", "x;y") + ROW


def test_backslash_escape_config():
    cfg = CsvConfig(row1=b"\n", row2=b"", escape=b"\\")
    assert ok('a\n"x\\"y"\n', cfg) == cell("a", 'x"y') + ROW


def test_projection_pushdown():
    plate = ReifiedPlate()
    p = CsvParser(plate, UNIX, projection={"b"})
    r1 = p.absorb("a,b,c\n1,2,3\n4,5,6\n")
    r2 = p.finish()
    events = r1.value + r2.value
    assert events == [
        ("skipped", 1), ("nest_map", "b"), ("str", "2"), ("unnest",),
        ("skipped", 1), ("finish_row",),
        ("skipped", 1), ("nest_map", "b"), ("str", "5"), ("unnest",),
        ("skipped", 1), ("finish_row",),
    ]


def test_max_value_bytes_bounds_pending_row():
    from tectonic_spark.core.plate import RowCountPlate
    from tectonic_spark.core.result import Failure

    p = CsvParser(RowCountPlate(), CsvConfig.unix(), max_value_bytes=1024)
    # unterminated quoted cell growing past the bound in small chunks
    res = p.absorb(b'a,b\n"' + b"x" * 512)
    for _ in range(10):
        if isinstance(res, Failure):
            break
        res = p.absorb(b"y" * 512)
    assert isinstance(res, Failure)
    assert "maxValueBytes" in str(res.error)


def test_max_value_bytes_allows_normal_rows():
    from tectonic_spark.core.result import Failure
    from tectonic_spark.core.value_builder import ValueBuilderPlate

    p = CsvParser(ValueBuilderPlate(), CsvConfig.unix(), max_value_bytes=1 << 20)
    rows = []
    data = b"a,b\n" + b"\n".join(b"v%d,w%d" % (i, i) for i in range(200)) + b"\n"
    for off in range(0, len(data), 97):
        r = p.absorb(data[off : off + 97])
        assert not isinstance(r, Failure)
        rows.extend(r.value)
    rows.extend(p.finish().value)
    assert len(rows) == 200
