"""Ogg container census + Opus/Vorbis stream identification (round 10,
m22 — VERDICT r9 item 7: the audio analog of the MP4 walk; Ogg/Opus is
the dominant speech-corpus container).

Everything derives from the public RFCs and is structural:

* **RFC 3533** (Ogg): "OggS" capture pattern, version-0 page header,
  header-type flags (continued / BOS / EOS), 64-bit granule position,
  serial / sequence numbers, the page CRC (CRC-32 with generator
  0x04c11db7, no reflection, zero init/xorout, computed with the CRC
  field zeroed — the table is GENERATED from the polynomial), and the
  lacing-value segment table (255 = packet continues, <255 ends it;
  packets span pages via the continued flag, and a page where no
  packet ends carries granule -1).
* **RFC 7845** (Opus-in-Ogg): the OpusHead ID header (version,
  channels, pre-skip, input rate, mapping family) on its own BOS
  page, OpusTags on the next page, granule positions in 48 kHz
  samples, duration = last granule - pre-skip.
* **RFC 6716 §3.1** (Opus TOC): every data packet's first byte gives
  config (5 bits) → frame duration, stereo flag, and frame-count code
  — so packet durations are derivable WITHOUT decoding audio, and the
  census cross-checks TOC-summed duration against the granule-derived
  one. SILK/CELT sample synthesis is documented out (codec guts, pyav
  territory) — the same census boundary as MP3/H.264.
* **Vorbis I**: the \\x01vorbis ID header (channels + sample rate)
  identifies Vorbis streams in the census.

The fixture encoder writes real pages — correct CRCs, lacing, BOS/EOS,
continuation pages with granule -1 — so the decoder's page walk,
packet reassembly, and CRC validation are exercised by round-trips,
not just happy-path fixtures.

100 TB shape: per-payload parallelism inside Arrow-batched mapInPandas
(the m16/MP4 pattern); a payload's page walk is sequential but pages
are tiny and the census is one pass.

Reference parity note: the reference engine has no codec surface; this
module belongs to the beyond-reference multimodal family (m22).
"""

from __future__ import annotations

import struct

_CAPTURE = b"OggS"

# Ogg CRC-32: generator 0x04c11db7, MSB-first, init 0, xorout 0 —
# table generated from the polynomial (RFC 3533 appendix A)
_CRC_TABLE = []
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if _r & 0x80000000 else (
            (_r << 1) & 0xFFFFFFFF
        )
    _CRC_TABLE.append(_r)


def _ogg_crc(data: bytes) -> int:
    crc = 0
    table = _CRC_TABLE
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ table[((crc >> 24) & 0xFF) ^ b]
    return crc


# RFC 6716 §3.1: config → frame duration in 48 kHz samples.
# Structural mapping: SILK configs 0-11 cycle (10,20,40,60) ms per
# bandwidth triple, hybrid 12-15 cycle (10,20), CELT 16-31 cycle
# (2.5,5,10,20) — generated from that rule, not vendored.
def _toc_frame_samples(config: int) -> int:
    if config < 12:  # SILK: 10/20/40/60 ms
        return (480, 960, 1920, 2880)[config % 4]
    if config < 16:  # hybrid: 10/20 ms
        return (480, 960)[config % 2]
    return (120, 240, 480, 960)[config % 4]  # CELT: 2.5/5/10/20 ms


def opus_packet_samples(packet: bytes) -> int:
    """Duration of one Opus packet in 48 kHz samples, from the TOC
    byte alone (RFC 6716 §3.1): config → frame size, code → frame
    count (code 3 reads the count byte)."""
    if not packet:
        raise ValueError("empty Opus packet")
    toc = packet[0]
    config = toc >> 3
    code = toc & 3
    if code == 0:
        frames = 1
    elif code in (1, 2):
        frames = 2
    else:
        if len(packet) < 2:
            raise EOFError("truncated Opus code-3 packet")
        frames = packet[1] & 0x3F
        if frames == 0:
            raise ValueError("invalid Opus code-3 frame count")
    return frames * _toc_frame_samples(config)


# ---------------------------------------------------------------- encoder


def encode_ogg_opus(
    packets: list[bytes],
    serial: int = 1,
    channels: int = 1,
    pre_skip: int = 312,
    input_rate: int = 48000,
    granules: list[int] | None = None,
    max_segments_per_page: int = 255,
    vendor: bytes = b"tectonic-spark",
) -> bytes:
    """Real Ogg/Opus writer: OpusHead on its own BOS page, OpusTags
    page, then one data packet per page — a packet whose lacing needs
    more than ``max_segments_per_page`` segments spans onto
    continuation pages (continued flag set, granule -1 on pages where
    no packet ends), exactly the RFC 3533 layout third-party muxers
    emit. ``granules``: absolute granule position at the end of each
    data packet (defaults to cumulative TOC durations + pre_skip)."""

    def page(
        payload: bytes,
        lacing: list[int],
        granule: int,
        seq: int,
        flags: int,
    ) -> bytes:
        head = (
            _CAPTURE
            + struct.pack(
                "<BBqIIIB",
                0,
                flags,
                granule,
                serial,
                seq,
                0,  # CRC placeholder
                len(lacing),
            )
            + bytes(lacing)
        )
        raw = head + payload
        crc = _ogg_crc(raw)
        return raw[:22] + struct.pack("<I", crc) + raw[26:] + b""

    out = bytearray()
    head = (
        b"OpusHead"
        + struct.pack("<BBHIhB", 1, channels, pre_skip, input_rate, 0, 0)
    )
    out += page(head, [len(head)], 0, 0, 0x02)  # BOS
    tags = (
        b"OpusTags"
        + struct.pack("<I", len(vendor))
        + vendor
        + struct.pack("<I", 0)
    )
    out += page(tags, [len(tags)], 0, 1, 0)
    if granules is None:
        g = pre_skip
        granules = []
        for p in packets:
            g += opus_packet_samples(p)
            granules.append(g)
    seq = 2
    for k, p in enumerate(packets):
        lacing = [255] * (len(p) // 255) + [len(p) % 255]
        off = 0
        first = True
        while lacing:
            take = lacing[:max_segments_per_page]
            lacing = lacing[max_segments_per_page:]
            nbytes = sum(take)
            flags = 0 if first else 0x01  # continued
            done = not lacing
            if done and k == len(packets) - 1:
                flags |= 0x04  # EOS
            gran = granules[k] if done else -1
            out += page(p[off : off + nbytes], take, gran, seq, flags)
            off += nbytes
            seq += 1
            first = False
    return bytes(out)


# ---------------------------------------------------------------- decoder


def parse_ogg(data: bytes) -> dict:
    """One-pass structural census: page walk with CRC validation,
    packet reassembly (spanning pages included), per-stream codec
    identification (Opus / Vorbis / unknown), granule-derived and
    TOC-derived durations. Raises the module error taxonomy on
    truncation, bad capture patterns, CRC mismatches, and broken
    continuation chains."""
    pos = 0
    n = len(data)
    if n < 27 or data[:4] != _CAPTURE:
        raise ValueError("not an Ogg stream: bad capture pattern")
    n_pages = 0
    streams: dict[int, dict] = {}
    while pos < n:
        if data[pos : pos + 4] != _CAPTURE:
            raise ValueError("bad Ogg capture pattern mid-stream")
        if pos + 27 > n:
            raise EOFError("truncated Ogg page header")
        (
            version,
            flags,
            granule,
            serial,
            seq,
            crc,
            n_segs,
        ) = struct.unpack_from("<BBqIIIB", data, pos + 4)
        if version != 0:
            raise ValueError(f"unsupported Ogg page version {version}")
        if pos + 27 + n_segs > n:
            raise EOFError("truncated Ogg segment table")
        lacing = data[pos + 27 : pos + 27 + n_segs]
        body_len = sum(lacing)
        body_at = pos + 27 + n_segs
        if body_at + body_len > n:
            raise EOFError("truncated Ogg page body")
        raw = bytearray(data[pos : body_at + body_len])
        raw[22:26] = b"\x00\x00\x00\x00"
        if _ogg_crc(bytes(raw)) != crc:
            raise ValueError(f"Ogg page CRC mismatch (page {n_pages})")
        st = streams.get(serial)
        if st is None:
            if not flags & 0x02:
                raise ValueError("Ogg stream without a BOS page")
            st = streams[serial] = {
                "packets": 0,
                "spanned": 0,
                "partial": bytearray(),
                "mid_packet": False,
                "codec": None,
                "channels": None,
                "sample_rate": None,
                "pre_skip": None,
                "last_granule": 0,
                "toc_samples": 0,
                "eos": False,
            }
        if bool(flags & 0x01) != st["mid_packet"]:
            raise ValueError("broken Ogg continuation chain")
        if flags & 0x04:
            st["eos"] = True
        body_pos = body_at
        first_completion = True
        for lace in lacing:
            st["partial"] += data[body_pos : body_pos + lace]
            body_pos += lace
            if lace == 255:
                st["mid_packet"] = True
                continue
            packet = bytes(st["partial"])
            st["partial"] = bytearray()
            st["mid_packet"] = False
            # a packet that entered this page via the continued flag
            # crossed a page boundary
            if first_completion and flags & 0x01:
                st["spanned"] += 1
            first_completion = False
            st["packets"] += 1
            _classify_packet(st, packet)
        # page granule = position of the last packet completed on the
        # page; -1 means none completed (pure continuation page)
        if granule != -1:
            st["last_granule"] = granule
        pos = body_pos
        n_pages += 1
    for serial, st in streams.items():
        if st["mid_packet"]:
            raise EOFError("Ogg stream ends mid-packet")
    out_streams = []
    for serial, st in sorted(streams.items()):
        duration = None
        if st["codec"] == "opus" and st["pre_skip"] is not None:
            duration = max(0, st["last_granule"] - st["pre_skip"])
        out_streams.append(
            {
                "serial": serial,
                "codec": st["codec"] or "unknown",
                "channels": st["channels"],
                "sample_rate": st["sample_rate"],
                "pre_skip": st["pre_skip"],
                "n_packets": st["packets"],
                "spanned_packets": st["spanned"],
                "duration_samples": duration,
                "toc_duration_samples": (
                    st["toc_samples"] if st["codec"] == "opus" else None
                ),
                "eos": st["eos"],
            }
        )
    return {
        "n_pages": n_pages,
        "n_streams": len(out_streams),
        "streams": out_streams,
        "bytes_walked": pos,
    }


def _classify_packet(st: dict, packet: bytes) -> None:
    if st["codec"] is None:
        if packet[:8] == b"OpusHead":
            if len(packet) < 19:
                raise EOFError("truncated OpusHead")
            version, ch, pre_skip, rate = struct.unpack_from(
                "<BBHI", packet, 8
            )
            if version >> 4 != 0:
                raise ValueError(f"unsupported Opus version {version}")
            st["codec"] = "opus"
            st["channels"] = ch
            st["sample_rate"] = rate
            st["pre_skip"] = pre_skip
            st["header_left"] = 1  # OpusTags next
            return
        if packet[:7] == b"\x01vorbis":
            if len(packet) < 30:
                raise EOFError("truncated Vorbis ID header")
            ch = packet[11]
            (rate,) = struct.unpack_from("<I", packet, 12)
            st["codec"] = "vorbis"
            st["channels"] = ch
            st["sample_rate"] = rate
            st["header_left"] = 2  # comment + setup headers
            return
        st["codec"] = "unknown"
        return
    left = st.get("header_left", 0)
    if left:
        st["header_left"] = left - 1
        return
    if st["codec"] == "opus":
        st["toc_samples"] += opus_packet_samples(packet)
