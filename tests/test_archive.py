"""ZIP archive tests: round-trips across methods, both-ways stdlib
zipfile interop, comment-tolerant EOCD discovery, verification
(CRC/size/name agreement), taxonomy, Hypothesis sweep."""

import io
import zipfile

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tectonic_spark.operators.archive import build_zip, parse_zip

MEMBERS = [
    ("a.jsonl", b'{"x":1}\n{"x":2}\n', "deflate"),
    ("b/c.txt", b"plain stored bytes", "stored"),
    ("empty", b"", "deflate"),
]


class TestRoundtrip:
    def test_basic(self):
        got = parse_zip(build_zip(MEMBERS))
        assert [(m["name"], m["data"]) for m in got] == [
            (n, d) for n, d, _ in MEMBERS
        ]
        assert [m["method"] for m in got] == [8, 0, 8]
        assert [m["usize"] for m in got] == [16, 18, 0]

    def test_trailing_comment_tolerated(self):
        z = build_zip(MEMBERS)
        commented = z[:-2] + (9).to_bytes(2, "little") + b"a comment"
        assert len(parse_zip(commented)) == 3

    @settings(max_examples=30, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.text(
                    alphabet=st.characters(codec="utf-8", exclude_characters="\x00"),
                    min_size=1,
                    max_size=20,
                ),
                st.binary(max_size=500),
                st.sampled_from(["stored", "deflate"]),
            ),
            min_size=1,
            max_size=6,
            unique_by=lambda t: t[0],
        )
    )
    def test_roundtrip_property(self, members):
        got = parse_zip(build_zip(members))
        assert [(m["name"], m["data"]) for m in got] == [
            (n, d) for n, d, _ in members
        ]


class TestInterop:
    def test_stdlib_reads_ours(self):
        zf = zipfile.ZipFile(io.BytesIO(build_zip(MEMBERS)))
        assert zf.read("a.jsonl") == MEMBERS[0][1]
        assert zf.read("b/c.txt") == MEMBERS[1][1]
        assert zf.testzip() is None

    def test_we_read_stdlib(self):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zo:
            zo.writestr("x.json", '{"k": [1,2,3]}')
            zo.writestr("y", "more text here")
        got = parse_zip(buf.getvalue())
        assert got[0]["data"] == b'{"k": [1,2,3]}'
        assert got[1]["data"] == b"more text here"

    def test_we_read_stdlib_stored(self):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zo:
            zo.writestr("s", b"\x00\x01\x02" * 40)
        assert parse_zip(buf.getvalue())[0]["data"] == b"\x00\x01\x02" * 40


class TestErrors:
    def test_no_eocd(self):
        with pytest.raises(EOFError, match="end-of-central"):
            parse_zip(bytes(64))

    def test_truncated_eocd(self):
        with pytest.raises(EOFError, match="EOCD"):
            parse_zip(b"PK\x05\x06" + bytes(10))

    def test_truncated_payload(self):
        z = build_zip(MEMBERS)
        # keep the EOCD/CD but cut into the first member's payload
        cd_off = int.from_bytes(z[-6:-2], "little")
        broken = z[:30] + z[cd_off:]
        with pytest.raises((EOFError, ValueError)):
            parse_zip(broken)

    def test_crc_mismatch(self):
        z = bytearray(build_zip(MEMBERS))
        i = bytes(z).find(b"plain stored bytes")
        z[i] ^= 0xFF
        with pytest.raises(ValueError, match="CRC"):
            parse_zip(bytes(z))

    def test_name_mismatch(self):
        z = bytearray(build_zip([("name1", b"x" * 10, "stored")]))
        i = bytes(z).find(b"name1")  # local header copy comes first
        z[i : i + 5] = b"nameX"
        with pytest.raises(ValueError, match="name mismatch"):
            parse_zip(bytes(z))

    def test_encrypted_refused(self):
        z = bytearray(build_zip([("e", b"secret", "stored")]))
        cd_off = int.from_bytes(bytes(z)[-6:-2], "little")
        z[cd_off + 8] |= 0x01  # set the encryption bit in the CD entry
        with pytest.raises(NotImplementedError, match="encrypted"):
            parse_zip(bytes(z))

    def test_zip64_multidisk_refused(self):
        # a locator claiming >1 disks is the remaining named boundary
        z = build_zip(MEMBERS, zip64=True)
        hacked = bytearray(z)
        # locator sits 20 bytes before the EOCD; total-disks is its last u32
        hacked[-22 - 4 : -22] = (2).to_bytes(4, "little")
        with pytest.raises(NotImplementedError, match="multi-disk"):
            parse_zip(bytes(hacked))

    def test_bad_deflate(self):
        z = bytearray(build_zip([("d", b"compressible " * 50, "deflate")]))
        i = 30 + 1  # into the deflate payload (name is 1 byte)
        z[i + 2 : i + 6] = b"\xff\xff\xff\xff"
        with pytest.raises((ValueError, EOFError)):
            parse_zip(bytes(z))


class TestTar:
    MEMBERS = [
        ("0001.json", b'{"doc_id": 1}'),
        ("0001.txt", b"hello words"),
        ("sub/0002.bin", b"\x00\x01\x02" * 300),
        ("empty", b""),
    ]

    def test_roundtrip(self):
        from tectonic_spark.operators.archive import build_tar, parse_tar

        got = parse_tar(build_tar(self.MEMBERS))
        assert [(m["name"], m["data"]) for m in got] == self.MEMBERS
        assert [m["size"] for m in got] == [13, 11, 900, 0]

    def test_stdlib_reads_ours(self):
        import io
        import tarfile

        from tectonic_spark.operators.archive import build_tar

        tf = tarfile.open(fileobj=io.BytesIO(build_tar(self.MEMBERS)))
        for name, data in self.MEMBERS:
            assert tf.extractfile(name).read() == data

    def test_we_read_stdlib(self):
        import io
        import tarfile

        from tectonic_spark.operators.archive import parse_tar

        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as to:
            for name, data in self.MEMBERS:
                ti = tarfile.TarInfo(name)
                ti.size = len(data)
                to.addfile(ti, io.BytesIO(data))
        got = parse_tar(buf.getvalue())
        assert [(m["name"], m["data"]) for m in got] == self.MEMBERS

    def test_checksum_verified(self):
        from tectonic_spark.operators.archive import build_tar, parse_tar

        t = bytearray(build_tar(self.MEMBERS))
        t[130] ^= 1  # flip a size digit; checksum now disagrees
        with pytest.raises(ValueError, match="checksum"):
            parse_tar(bytes(t))

    def test_truncation(self):
        from tectonic_spark.operators.archive import build_tar, parse_tar

        t = build_tar(self.MEMBERS)
        with pytest.raises(EOFError):
            parse_tar(t[:-1536])  # cut into the last member + end blocks

    def test_missing_end_blocks(self):
        from tectonic_spark.operators.archive import build_tar, parse_tar

        t = build_tar(self.MEMBERS)
        with pytest.raises(EOFError, match="end-of-archive"):
            parse_tar(t[:-1024])

    def test_stdlib_pax_long_name(self):
        import io
        import tarfile

        from tectonic_spark.operators.archive import parse_tar

        buf = io.BytesIO()
        long = "dir/" + "x" * 150 + "/file.txt"
        with tarfile.open(fileobj=buf, mode="w", format=tarfile.PAX_FORMAT) as to:
            ti = tarfile.TarInfo(long)  # forces a pax 'path' record
            ti.size = 1
            to.addfile(ti, io.BytesIO(b"y"))
        got = parse_tar(buf.getvalue())
        assert [(m["name"], m["data"]) for m in got] == [(long, b"y")]

    def test_stdlib_gnu_long_name(self):
        import io
        import tarfile

        from tectonic_spark.operators.archive import parse_tar

        buf = io.BytesIO()
        long = "g/" + "y" * 140 + ".bin"
        with tarfile.open(fileobj=buf, mode="w", format=tarfile.GNU_FORMAT) as to:
            ti = tarfile.TarInfo(long)  # forces a GNU 'L' member
            ti.size = 3
            to.addfile(ti, io.BytesIO(b"abc"))
        got = parse_tar(buf.getvalue())
        assert [(m["name"], m["data"]) for m in got] == [(long, b"abc")]

    @settings(max_examples=30, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.text(alphabet="abc0123./_", min_size=1, max_size=40).filter(
                    lambda s: not s.endswith("/") and "\x00" not in s
                ),
                st.binary(max_size=1400),
            ),
            min_size=1,
            max_size=5,
            unique_by=lambda t: t[0],
        )
    )
    def test_roundtrip_property(self, members):
        from tectonic_spark.operators.archive import build_tar, parse_tar

        got = parse_tar(build_tar(members))
        assert [(m["name"], m["data"]) for m in got] == members


class TestAdviceR11:
    def test_comment_containing_eocd_signature(self):
        # a trailing comment that embeds 'PK\x05\x06' must not hijack
        # EOCD discovery (r10 advice): candidates are validated by the
        # comment-length self-consistency check
        z = build_zip(MEMBERS)
        # NB: a comment embedding a fully self-consistent 22-byte EOCD
        # is inherently ambiguous (APPNOTE gives no tiebreak); the
        # realistic hazard is the bare signature mid-comment
        comment = b"see PK\x05\x06 which happens to appear here"
        commented = z[:-2] + len(comment).to_bytes(2, "little") + comment
        got = parse_zip(commented)
        assert [(m["name"], m["data"]) for m in got] == [
            (n, d) for n, d, _ in MEMBERS
        ]


class TestZip64:
    def test_forced_zip64_roundtrip(self):
        z = build_zip(MEMBERS, zip64=True)
        # EOCD fields are saturated; parse must route through EOCD64
        assert b"PK\x06\x06" in z and b"PK\x06\x07" in z
        got = parse_zip(z)
        assert [(m["name"], m["data"]) for m in got] == [
            (n, d) for n, d, _ in MEMBERS
        ]

    def test_stdlib_reads_our_zip64(self):
        import io
        import zipfile

        z = build_zip(MEMBERS, zip64=True)
        with zipfile.ZipFile(io.BytesIO(z)) as zf:
            assert zf.namelist() == [n for n, _, _ in MEMBERS]
            for n, d, _m in MEMBERS:
                assert zf.read(n) == d

    def test_we_read_stdlib_zip64(self):
        # stdlib emits real ZIP64 structures when the entry count
        # saturates the 16-bit EOCD field (>65535 members) — the
        # sparse way to trigger the format without >4 GiB payloads
        import io
        import zipfile

        buf = io.BytesIO()
        n = 65540
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
            for i in range(n):
                zf.writestr(f"m{i:05d}", b"")
        got = parse_zip(buf.getvalue())
        assert len(got) == n
        assert got[0]["name"] == "m00000" and got[-1]["name"] == f"m{n-1:05d}"

    def test_saturated_without_locator_rejected(self):
        z = bytearray(build_zip(MEMBERS))
        z[-12:-10] = b"\xff\xff"  # saturate the entry count
        with pytest.raises(ValueError, match="EOCD64"):
            parse_zip(bytes(z))


class TestTarLongNames:
    LONG = "prefix/" + "n" * 130 + "/payload.json"

    def test_pax_roundtrip(self):
        from tectonic_spark.operators.archive import build_tar, parse_tar

        members = [(self.LONG, b"data1"), ("short.txt", b"data2")]
        got = parse_tar(build_tar(members, longname_mode="pax"))
        assert [(m["name"], m["data"]) for m in got] == members

    def test_gnu_roundtrip(self):
        from tectonic_spark.operators.archive import build_tar, parse_tar

        members = [(self.LONG, b"data1"), ("short.txt", b"data2")]
        got = parse_tar(build_tar(members, longname_mode="gnu"))
        assert [(m["name"], m["data"]) for m in got] == members

    def test_stdlib_reads_our_pax(self):
        import io
        import tarfile

        from tectonic_spark.operators.archive import build_tar

        blob = build_tar([(self.LONG, b"zz")], longname_mode="pax")
        with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
            names = tf.getnames()
            assert self.LONG in names
            assert tf.extractfile(self.LONG).read() == b"zz"

    def test_stdlib_reads_our_gnu(self):
        import io
        import tarfile

        from tectonic_spark.operators.archive import build_tar

        blob = build_tar([(self.LONG, b"qq")], longname_mode="gnu")
        with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
            assert tf.extractfile(self.LONG).read() == b"qq"

    def test_pax_size_override_and_base256(self):
        from tectonic_spark.operators.archive import (
            _octal,
            _pax_record,
            _parse_pax,
        )

        # base-256 numeric field (how >8 GiB sizes are stored)
        big = 9 * 1024**3
        field = bytes([0x80]) + big.to_bytes(11, "big")
        assert _octal(field, "size") == big
        # self-referential pax record length
        rec = _pax_record("size", "12345")
        n = int(rec.split(b" ", 1)[0])
        assert len(rec) == n
        assert _parse_pax(rec) == {"size": "12345"}

    def test_pax_global_defaults(self):
        from tectonic_spark.operators.archive import (
            _pad,
            _pax_record,
            _tar_header,
            parse_tar,
        )

        g = _pax_record("comment", "corpus-wide")
        blob = (
            _tar_header(b"g-hdr", len(g), b"g")
            + _pad(g)
            + _tar_header(b"a.txt", 2, b"0")
            + _pad(b"hi")
            + bytes(1024)
        )
        got = parse_tar(blob)
        assert [(m["name"], m["data"]) for m in got] == [("a.txt", b"hi")]
