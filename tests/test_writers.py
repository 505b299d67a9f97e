"""Writer-surface tests: df.write.format("tectonic-json" | "tectonic-csv")
— part-file commit protocol, overwrite/append semantics, config parity,
null handling, and exact round-trips through the matching readers."""

from __future__ import annotations

import json
import os


class TestJsonWriter:
    def test_roundtrip_types(self, spark, tmp_path):
        out = str(tmp_path / "j")
        df = spark.createDataFrame(
            [(1, "a,b", None, [1, 2], {"k": 1}),
             (2, 'q"x\n', 3.5, [], None)],
            "id long, s string, v double, xs array<long>, st struct<k: long>",
        )
        df.write.format("tectonic-json").mode("overwrite").save(out)
        assert os.path.exists(os.path.join(out, "_SUCCESS"))
        back = spark.read.format("tectonic-json").load(out)
        got = {r.id: (r.s, r.v, r.xs) for r in back.collect()}
        assert got[1] == ("a,b", None, [1, 2])
        assert got[2] == ('q"x\n', 3.5, [])

    def test_overwrite_replaces(self, spark, tmp_path):
        out = str(tmp_path / "j2")
        spark.range(10).write.format("tectonic-json").mode("append").save(out)
        spark.range(3).write.format("tectonic-json").mode("overwrite").save(out)
        assert spark.read.format("tectonic-json").load(out).count() == 3

    def test_append_accumulates(self, spark, tmp_path):
        out = str(tmp_path / "j3")
        spark.range(4).write.format("tectonic-json").mode("append").save(out)
        spark.range(5).write.format("tectonic-json").mode("append").save(out)
        assert spark.read.format("tectonic-json").load(out).count() == 9

    def test_empty_partitions_write_no_parts(self, spark, tmp_path):
        out = str(tmp_path / "j4")
        spark.range(2).repartition(16).write.format("tectonic-json").mode("append").save(out)
        parts = [f for f in os.listdir(out) if f.startswith("part-")]
        assert len(parts) <= 2
        assert spark.read.format("tectonic-json").load(out).count() == 2

    def test_timestamps_serialize_iso(self, spark, tmp_path):
        # ISO-8601 'T' separator, matching Spark's JSON writer default
        out = str(tmp_path / "j5")
        df = spark.sql("SELECT timestamp'2024-03-01 12:30:00' AS ts, 1 AS i")
        df.write.format("tectonic-json").mode("append").save(out)
        part = [f for f in os.listdir(out) if f.startswith("part-")][0]
        row = json.loads(open(os.path.join(out, part)).read().strip())
        assert row["ts"].startswith("2024-03-01T12:30:00")

    def test_decimal_exact_number(self, spark, tmp_path):
        # >15-significant-digit decimal must survive as an exact JSON
        # number (a float round-trip would corrupt the last digits)
        out = str(tmp_path / "j6")
        df = spark.sql(
            "SELECT CAST('1234567890123456.789' AS DECIMAL(25,6)) AS d, "
            "ARRAY(CAST('0.1234567890123456789' AS DECIMAL(30,20))) AS xs"
        )
        df.write.format("tectonic-json").mode("append").save(out)
        part = [f for f in os.listdir(out) if f.startswith("part-")][0]
        text = open(os.path.join(out, part)).read().strip()
        assert '"d": 1234567890123456.789000' in text
        assert "0.12345678901234567890" in text
        # and it parses as JSON with full precision via Decimal
        import decimal

        row = json.loads(text, parse_float=decimal.Decimal)
        assert row["d"] == decimal.Decimal("1234567890123456.789000")


class TestCsvWriter:
    def test_roundtrip_quoting(self, spark, tmp_path):
        out = str(tmp_path / "c")
        df = spark.createDataFrame(
            [(1, 'has "quotes"', "a,b"), (2, None, "plain")],
            "id long, q string, s string",
        )
        df.write.format("tectonic-csv").mode("overwrite").save(out)
        back = spark.read.format("tectonic-csv").load(out)
        got = {r.id: (r.q, r.s) for r in back.collect()}
        assert got["1"] == ('has "quotes"', "a,b")
        assert got["2"] == ("", "plain")  # null -> empty string, documented

    def test_unix_linesep_and_no_header(self, spark, tmp_path):
        out = str(tmp_path / "c2")
        df = spark.createDataFrame([(1, "x"), (2, "y")], "a long, b string")
        (
            df.write.format("tectonic-csv")
            .option("lineSep", "\n")
            .option("header", "false")
            .mode("append")
            .save(out)
        )
        part = [f for f in os.listdir(out) if f.startswith("part-")]
        text = "".join(
            open(os.path.join(out, p)).read() for p in sorted(part)
        )
        assert "\r" not in text and "a,b" not in text
        # headerless read: Excel-style names A,B
        back = (
            spark.read.format("tectonic-csv")
            .option("lineSep", "\n")
            .option("header", "false")
            .load(out)
        )
        assert set(back.columns) == {"A", "B"}
        assert back.count() == 2

    def test_typed_scalar_formatting(self, spark, tmp_path):
        # Spark CSV writer conventions: lowercase booleans, ISO-8601 'T'
        # timestamps, exact decimal text — not Python str()/repr
        out = str(tmp_path / "c4")
        df = spark.sql(
            "SELECT true AS t, false AS f, "
            "timestamp'2024-03-01 12:30:00' AS ts, "
            "CAST('1234567890123456.78' AS DECIMAL(20,2)) AS d"
        )
        (
            df.write.format("tectonic-csv")
            .option("lineSep", "\n")
            .mode("append")
            .save(out)
        )
        part = [f for f in os.listdir(out) if f.startswith("part-")][0]
        lines = open(os.path.join(out, part)).read().strip().split("\n")
        assert lines[1] == "true,false,2024-03-01T12:30:00.000Z,1234567890123456.78"

    def test_custom_sep(self, spark, tmp_path):
        out = str(tmp_path / "c3")
        df = spark.createDataFrame([(1, "x|y")], "a long, b string")
        df.write.format("tectonic-csv").option("sep", "|").mode("append").save(out)
        back = (
            spark.read.format("tectonic-csv").option("sep", "|").load(out)
        )
        assert [(r.a, r.b) for r in back.collect()] == [("1", "x|y")]


class TestCompressedWriter:
    def test_gzip_csv_writer_roundtrip(self, spark, tmp_path):
        out = str(tmp_path / "csvgz")
        df = spark.createDataFrame(
            [(i, f"v{i}") for i in range(50)], "a long, b string"
        )
        (
            df.write.format("tectonic-csv")
            .mode("overwrite")
            .option("path", out)
            .option("compression", "gzip")
            .save()
        )
        import os as _os

        parts = [f for f in _os.listdir(out) if f.startswith("part-")]
        assert parts and all(f.endswith(".csv.gz") for f in parts)
        back = spark.read.format("tectonic-csv").load(out)
        assert back.count() == 50

    def test_unknown_compression_rejected(self, spark, tmp_path):
        import pytest as _pytest

        df = spark.createDataFrame([(1,)], "a long")
        with _pytest.raises(Exception, match="unsupported compression"):
            (
                df.write.format("tectonic-json")
                .mode("overwrite")
                .option("path", str(tmp_path / "bad"))
                .option("compression", "snappy")
                .save()
            )
