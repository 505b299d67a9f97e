"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully materialized via the noop sink (no driver collect).
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time

# Idle-host reference rate for the contention canary (see main()):
# single-thread json full-parse MB/s measured with no co-tenants (r4).
# FALLBACK only — a per-host calibration file (written by
# `python tools/calibrate_canary.py` on an idle host) takes precedence, and
# the output row carries host_canary_calibrated so a fallback-normalized
# number is never mistaken for a cross-host-comparable one.
CANARY_IDLE_MB_PER_SEC = 85.7


def _canary_idle_ref() -> tuple[float, float | None, bool]:
    """(idle_single, idle_parallel | None, calibrated): per-host
    calibration if available. Legacy entries are bare floats (single
    only); calibrated entries are {"single": x, "parallel": y}."""
    import socket

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_canary_idle.json")
    try:
        with open(path) as f:
            v = json.load(f).get(socket.gethostname())
        if isinstance(v, dict):
            return float(v["single"]), float(v.get("parallel") or 0) or None, True
        if v:
            return float(v), None, True
    except (OSError, ValueError, KeyError):
        pass
    return CANARY_IDLE_MB_PER_SEC, None, False


def _parallel_canary() -> float:
    """All-core aggregate SHA-256 rate (MB/s), best-of-2. hashlib
    releases the GIL for large buffers, so a cpu_count-wide thread pool
    saturates EVERY core — co-tenant load anywhere on the machine
    deflates this number, which the single-thread canary structurally
    cannot see (VERDICT r7 item 3: the +11%% r7 headline move was
    attributed to exactly that blind spot)."""
    import concurrent.futures as cf
    import hashlib
    import time as _t

    nthreads = os.cpu_count() or 8
    buf = b"\xab" * (1 << 20)
    reps = 128  # 128 MB hashed per thread per pass

    def work(_):
        h = hashlib.sha256()
        for _ in range(reps):
            h.update(buf)
        return h.digest()

    best = 0.0
    for _ in range(2):
        t0 = _t.perf_counter()
        with cf.ThreadPoolExecutor(nthreads) as ex:
            list(ex.map(work, range(nthreads)))
        best = max(best, nthreads * reps / (_t.perf_counter() - t0))
    return round(best, 1)


def _quick_par_canary() -> float:
    """One cheap pass of the all-core canary (~0.3 s) for MID-RUN
    segment sampling (VERDICT r10 item 6: the r10 driver row's end
    canary collapsed 40% under idle and silently skewed the normalized
    headline — per-segment samples let a judge attribute any delta to
    the segment where load actually arrived). Mid-run samples run with
    the Spark JVM alive, whose idle threads depress the reading a few
    percent (the r8 lesson) — so segment samples are compared to EACH
    OTHER and to the two JVM-free end readings, and any normalization
    over them uses the MAX of bracketing samples (a depressed canary
    would otherwise FLATTER the normalized number)."""
    import concurrent.futures as cf
    import hashlib
    import time as _t

    nthreads = os.cpu_count() or 8
    buf = b"\xab" * (1 << 20)
    reps = 32  # 32 MB per thread, single pass

    def work(_):
        h = hashlib.sha256()
        for _ in range(reps):
            h.update(buf)
        return h.digest()

    best = 0.0
    for _ in range(2):  # best-of-2: a single pass is too noisy to flag on
        t0 = _t.perf_counter()
        with cf.ThreadPoolExecutor(nthreads) as ex:
            list(ex.map(work, range(nthreads)))
        best = max(best, nthreads * reps / (_t.perf_counter() - t0))
    return round(best, 1)


def _loadavg() -> list[float] | None:
    try:
        with open("/proc/loadavg") as f:
            return [float(x) for x in f.read().split()[:3]]
    except (OSError, ValueError):
        return None


def _cpu_jiffies() -> tuple[int, int, int] | None:
    """(busy, steal, total) jiffies from /proc/stat — the steal delta
    across the run is DIRECT evidence of hypervisor co-tenancy, the
    thing loadavg and single-thread canaries cannot show."""
    try:
        with open("/proc/stat") as f:
            v = [int(x) for x in f.readline().split()[1:]]
        idle = v[3] + v[4]  # idle + iowait
        steal = v[7] if len(v) > 7 else 0
        return sum(v) - idle, steal, sum(v)
    except (OSError, ValueError, IndexError):
        return None


LOADAVG_START: list[float] | None = None
CPUSTAT_START: tuple[int, int, int] | None = None
PAR_CANARY_START: float | None = None


def _steal_pct(start, end) -> float | None:
    """Hypervisor steal as %% of elapsed CPU capacity over the run."""
    if not start or not end or end[2] <= start[2]:
        return None
    return round(100.0 * (end[1] - start[1]) / (end[2] - start[2]), 3)

HEADLINE = [
    "b05_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "b04_range_join",
    "b07_topn_per_group",
    "b08_topk",
    "b11_tumbling_window",
    "b12_dedup_earliest",
    "c01_minhash_lsh",
    "c02_cosine_topk",
    "c03_token_stats",
]


def _skip_speedup(sf_dir: str) -> dict[str, float]:
    """BASELINE.md dimension (a): single-threaded parse of a wide-row JSONL
    fixture projecting ONE column, with SKIP_COLUMN byte-skips on vs off —
    the reference reports 3.47x on ugh10k (README.md:267-272)."""
    from tectonic_spark.core.json_parser import JsonParser, Mode
    from tectonic_spark.operators.parser_ops import documents_wide_jsonl
    from tectonic_spark.sources.pushdown import PushdownPlate

    path = documents_wide_jsonl(sf_dir)
    with open(path, "rb") as f:
        data = f.read()

    def run(required, direct=False) -> float:
        t0 = time.perf_counter()
        parser = JsonParser(
            PushdownPlate(required=required), Mode.VALUE_STREAM, direct_values=direct
        )
        parser.absorb(data)
        parser.finish()
        return time.perf_counter() - t0

    run({"doc_id"})  # warm
    # skip speedup compares within the event machinery (the reference's
    # benchmark design: ProjectionPlate vs full events, SkipBenchmarks)
    t_skip = min(run({"doc_id"}) for _ in range(3))
    t_walk = min(run(None) for _ in range(3))
    # full-fidelity production path: extent + C raw_decode direct values
    t_full = min(run(None, direct=True) for _ in range(3))
    mb = len(data) / 1e6
    return {
        "json_skip_on_sec": round(t_skip, 4),
        "json_skip_off_sec": round(t_walk, 4),
        "json_skip_speedup": round(t_walk / t_skip, 2),
        "json_event_walk_mb_per_sec": round(mb / t_walk, 1),
        "json_full_parse_mb_per_sec": round(mb / t_full, 1),
        **_csv_throughput(sf_dir),
    }


def _probe_speedup(sf_dir: str) -> dict[str, float]:
    """Byte-level pre-parse filtering on the per-line Python path —
    selective EqualTo over documents.jsonl, line probe on vs off, single
    core. The ``columns`` option pins the per-line path: clean full-schema
    blocks take the pyarrow C++ route, where whole-block parsing beats any
    Python-level line handling and the probe is deliberately not applied
    (see _read_lines_fast)."""
    from pyspark.sql.datasource import EqualTo

    from tectonic_spark.operators.parser_ops import documents_jsonl
    from tectonic_spark.sources.json_source import (
        FileSplit,
        TectonicJsonPushdownDataSource,
    )

    path = documents_jsonl(sf_dir)
    size = os.path.getsize(path)
    split = FileSplit(path, 0, size, size)

    def run(lineprobe: str) -> tuple[float, int]:
        ds = TectonicJsonPushdownDataSource(
            options={
                "path": path,
                "lineprobe": lineprobe,
                "columns": "doc_id,source",
            }
        )
        r = ds.reader(ds.schema())
        r.pushFilters([EqualTo(("source",), "src7")])
        t0 = time.perf_counter()
        n = 0
        for b in r.read(split):
            n += b.num_rows
        return time.perf_counter() - t0, n

    run("true")  # warm
    t_on, n_on = min(run("true") for _ in range(3))
    t_off, n_off = min(run("false") for _ in range(3))
    # raw reader rows: probe-on is a subset (Catalyst re-applies the filter
    # above the scan either way — query results are identical; the probe
    # must never drop MORE than the filter's match set would allow)
    assert n_on <= n_off, f"probe added rows?! {n_on} > {n_off}"
    mb = size / 1e6
    return {
        "json_probe_on_mb_per_sec": round(mb / t_on, 1),
        "json_probe_off_mb_per_sec": round(mb / t_off, 1),
        "json_probe_speedup": round(t_off / t_on, 2),
    }


def _csv_reader_mbps(sf_dir: str) -> dict[str, float]:
    """End-to-end tectonic-csv reader rate, single core (parse → string
    cells → Arrow) — the pyarrow.csv block path on a clean fixture."""
    from tectonic_spark.operators.parser_ops import documents_csv
    from tectonic_spark.sources.csv_source import TectonicCsvDataSource
    from tectonic_spark.sources.json_source import FileSplit

    path = documents_csv(sf_dir)
    size = os.path.getsize(path)
    ds = TectonicCsvDataSource(options={"path": path, "linesep": "\n"})
    reader = ds.reader(ds.schema())
    split = FileSplit(path, 0, size, size)

    def run() -> float:
        t0 = time.perf_counter()
        for _ in reader.read(split):
            pass
        return time.perf_counter() - t0

    run()
    t = min(run() for _ in range(3))
    return {"csv_reader_mb_per_sec_per_core": round(size / 1e6 / t, 1)}


def _csv_throughput(sf_dir: str) -> dict[str, float]:
    """BASELINE.md dimension (b): single-threaded CSV parse MB/s through
    the counting plate (reference: ~71 MB/s on worldcitiespop, JVM)."""
    from tectonic_spark.core.csv_parser import CsvConfig, CsvParser
    from tectonic_spark.core.plate import RowCountPlate
    from tectonic_spark.operators.parser_ops import documents_csv

    data = open(documents_csv(sf_dir), "rb").read()
    cfg = CsvConfig.unix()

    def run() -> float:
        t0 = time.perf_counter()
        p = CsvParser(RowCountPlate(), cfg)
        p.absorb(data)
        p.finish()
        return time.perf_counter() - t0

    run()
    t = min(run() for _ in range(3))
    return {"csv_parse_mb_per_sec": round(len(data) / 1e6 / t, 1)}


def _jpeg_decode_rate() -> dict[str, float]:
    """Vendored JPEG codec rates, single core. Two regimes with different
    bottlenecks: the m08 fixture population (~550 B thumbnails — bounded
    by per-image marker/numpy fixed cost) and one dense 256x256 photo-like
    stream (bounded by the per-symbol entropy walk — the regime a real
    crawl's big images hit). Best-of-3 CPU-time so co-tenant bursts don't
    skew either number. Multiply by executor cores for distributed rate."""
    import time as _t

    import numpy as _np

    from tectonic_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from tectonic_spark.operators.multimodal import _jpeg_payload

    payloads = [_jpeg_payload(doc_id) for doc_id in range(0, 150, 3)]
    mb = sum(len(p) for p in payloads) / 1e6
    for p in payloads[:5]:
        decode_jpeg(p)  # warm
    best = 1e9
    for _ in range(3):
        t0 = _t.process_time()
        for p in payloads:
            decode_jpeg(p)
        best = min(best, _t.process_time() - t0)
    dt = best
    rng = _np.random.default_rng(7)
    yy, xx = _np.mgrid[0:256, 0:256]
    img = (
        _np.stack(
            [
                128 + 80 * _np.sin(xx / 37) + 40 * _np.cos(yy / 23),
                128 + 60 * _np.cos(xx / 29 + 1) + 50 * _np.sin(yy / 31),
                128 + 70 * _np.sin((xx + yy) / 41),
            ],
            axis=-1,
        )
        + rng.normal(0, 12, (256, 256, 3))
    ).clip(0, 255).astype(_np.uint8)
    big = encode_jpeg(img, quality=85, subsampling="420", restart_interval=8)
    decode_jpeg(big)
    t_big = 1e9
    for _ in range(3):
        t0 = _t.process_time()
        decode_jpeg(big)
        t_big = min(t_big, _t.process_time() - t0)
    # dense-CORPUS regime (r7): the production decode path is batched —
    # mapInPandas hands the kernel a whole Arrow batch — so the number
    # that scales to a 100 TB image crawl is the lockstep batch rate over
    # many dense restart-segmented images, not the single-image walk
    from tectonic_spark.operators.jpeg_lockstep import decode_jpeg_batch

    batch = []
    for seed in range(48):
        r2 = _np.random.default_rng(seed)
        im = (
            (img.astype(_np.int16) + r2.normal(0, 8, img.shape))
            .clip(0, 255)
            .astype(_np.uint8)
        )
        batch.append(encode_jpeg(im, quality=85, subsampling="420", restart_interval=8))
    batch_mb = sum(len(p) for p in batch) / 1e6
    decode_jpeg_batch(batch)
    t_batch = 1e9
    for _ in range(3):
        t0 = _t.process_time()
        decode_jpeg_batch(batch)
        t_batch = min(t_batch, _t.process_time() - t0)
    # dense PROGRESSIVE regimes (r8): (a) the crawl shape — no restart
    # markers, lanes = scans, so the engine amortizes across IMAGES of
    # the Arrow batch (r7 named this regime at 0.26 MB/s scalar); (b)
    # the restart-laned shape our own re-encode pipeline emits, where
    # every scan carries hundreds of independent segments — the
    # configuration the lane engine parallelizes best
    from tectonic_spark.operators.jpeg import encode_jpeg_progressive

    gray = img[:, :, 0]
    prog_src = [
        encode_jpeg_progressive(
            (gray.astype(_np.int16) + _np.random.default_rng(s).normal(0, 8, gray.shape))
            .clip(0, 255)
            .astype(_np.uint8),
            quality=85,
            bands=((1, 5), (6, 63)),
            successive=1,
        )
        for s in range(4)
    ]
    prog_batch = prog_src * 48  # 192 payloads, lanes = 192 x 6 scans
    prog_mb = sum(len(p) for p in prog_batch) / 1e6
    decode_jpeg_batch(prog_batch[:8])  # warm
    t_prog = 1e9
    for _ in range(3):
        t0 = _t.process_time()
        decode_jpeg_batch(prog_batch)
        t_prog = min(t_prog, _t.process_time() - t0)
    rst_src = [
        encode_jpeg_progressive(
            (gray.astype(_np.int16) + _np.random.default_rng(s).normal(0, 8, gray.shape))
            .clip(0, 255)
            .astype(_np.uint8),
            quality=85,
            bands=((1, 5), (6, 63)),
            successive=1,
            restart_interval=8,
        )
        for s in range(4)
    ]
    rst_batch = rst_src * 16  # 64 payloads, 128 segments per scan each
    rst_mb = sum(len(p) for p in rst_batch) / 1e6
    decode_jpeg_batch(rst_batch[:8])
    t_rst = 1e9
    for _ in range(3):
        t0 = _t.process_time()
        decode_jpeg_batch(rst_batch)
        t_rst = min(t_rst, _t.process_time() - t0)
    return {
        "jpeg_decode_images_per_sec": round(len(payloads) / dt, 1),
        "jpeg_decode_mb_per_sec": round(mb / dt, 2),
        "jpeg_decode_large_mb_per_sec": round(len(big) / 1e6 / t_big, 2),
        "jpeg_decode_dense_batch_mb_per_sec": round(batch_mb / t_batch, 2),
        "jpeg_decode_progressive_dense_mb_per_sec": round(prog_mb / t_prog, 2),
        "jpeg_decode_progressive_rst_mb_per_sec": round(rst_mb / t_rst, 2),
    }


def _png_decode_rate() -> dict[str, float]:
    """Vendored PNG codec rates, single core, best-of-3 CPU-time (r9):
    the wavefront regime (photo-like all-Paeth 256x256 RGB — what
    libpng-encoded crawl images mostly are) and the row-tier regime
    (None/Sub/Up rows only). MB/s over RAW pixel bytes — the decode
    work product — plus the compressed-payload rate for the m17
    fixture shape."""
    import time as _t

    import numpy as _np

    from tectonic_spark.operators.png import decode_png, encode_png

    rng = _np.random.default_rng(11)
    yy, xx = _np.mgrid[0:256, 0:256]
    img = (
        _np.stack(
            [
                128 + 80 * _np.sin(xx / 37) + 40 * _np.cos(yy / 23),
                128 + 60 * _np.cos(xx / 29 + 1) + 50 * _np.sin(yy / 31),
                128 + 70 * _np.sin((xx + yy) / 41),
            ],
            axis=-1,
        )
        + rng.normal(0, 12, (256, 256, 3))
    ).clip(0, 255).astype(_np.uint8)
    raw_mb = img.nbytes / 1e6
    out: dict[str, float] = {}
    for key, filt in (
        ("png_decode_paeth_mb_per_sec", 4),
        ("png_decode_rowtier_mb_per_sec", [r % 3 for r in range(256)]),
    ):
        data = encode_png(img, filters=filt)
        decode_png(data)  # warm
        best = 1e9
        for _ in range(3):
            t0 = _t.process_time()
            decode_png(data)
            best = min(best, _t.process_time() - t0)
        out[key] = round(raw_mb / best, 2)
    # the production path is batched: the segment-lane pool runs many
    # images' wavefronts in diagonal lockstep (r9)
    from tectonic_spark.operators.png import decode_png_batch

    batch = []
    for seed in range(16):
        r2 = _np.random.default_rng(seed)
        im = (
            (img.astype(_np.int16) + r2.integers(-8, 8, img.shape))
            .clip(0, 255)
            .astype(_np.uint8)
        )
        batch.append(encode_png(im, filters=4))
    decode_png_batch(batch)  # warm
    best = 1e9
    for _ in range(3):
        t0 = _t.process_time()
        decode_png_batch(batch)
        best = min(best, _t.process_time() - t0)
    out["png_decode_pool_mb_per_sec"] = round(16 * raw_mb / best, 2)
    return out


def _gif_decode_rate() -> dict[str, float]:
    """Vendored GIF LZW decode rate, single core, best-of-3 CPU-time
    (r9): a 256-color noise frame (12-bit dictionary + reset regime)
    rated over RAW index bytes."""
    import time as _t

    import numpy as _np

    from tectonic_spark.operators.gif import decode_gif, encode_gif

    rng = _np.random.default_rng(13)
    img = rng.integers(0, 256, (256, 256), dtype=_np.uint8)
    pal = rng.integers(0, 256, (256, 3), dtype=_np.uint8)
    data = encode_gif(img, pal)
    decode_gif(data)  # warm
    best = 1e9
    for _ in range(3):
        t0 = _t.process_time()
        decode_gif(data)
        best = min(best, _t.process_time() - t0)
    return {"gif_decode_mb_per_sec": round(img.nbytes / 1e6 / best, 2)}


def _warc_extract_rate() -> dict[str, float]:
    """Crawl-ingestion stack rate, single core, best-of-3 CPU-time
    (r10): member-per-record .warc.gz -> record grammar -> HTTP
    chunked de-framing -> HTML main-content extraction, rated over
    the extracted-page HTML bytes."""
    import time as _t

    from tectonic_spark.operators.warc import (
        build_http_response,
        build_warc_record,
        html_page,
        html_to_text,
        main_content,
        parse_http_response,
        parse_warc,
        write_warc,
    )

    texts = [
        " ".join(f"word{(i * 17 + j) % 97}" for j in range(60))
        for i in range(200)
    ]
    pages = [html_page(t, title=f"doc {i}", lang="en") for i, t in enumerate(texts)]
    html_bytes = sum(len(p) for p in pages)
    shard = write_warc(
        [
            build_warc_record(
                "response",
                build_http_response(p, chunked=(i % 2 == 0)),
                uri=f"https://x.example/doc/{i}",
                content_type="application/http; msgtype=response",
            )
            for i, p in enumerate(pages)
        ]
    )

    def run() -> None:
        for rec in parse_warc(shard):
            http = parse_http_response(rec["payload"])
            if not html_to_text(main_content(http["body"])):
                raise RuntimeError("empty extraction")

    run()  # warm
    best = 1e9
    for _ in range(3):
        t0 = _t.process_time()
        run()
        best = min(best, _t.process_time() - t0)
    return {"warc_extract_mb_per_sec": round(html_bytes / 1e6 / best, 2)}


def _brotli_rate() -> dict[str, float]:
    """RFC 7932 codec floor, single core, best-of-3 CPU-time (r12):
    decode rated over the DECODED page bytes (the number the crawl
    extraction path pays per br-coded response body), encode over the
    input bytes (the fixture-builder cost)."""
    import time as _t

    from tectonic_spark.operators.brotli import compress, decompress
    from tectonic_spark.operators.warc import html_page

    pages = [
        html_page(
            " ".join(f"word{(i * 17 + j) % 97}" for j in range(60)),
            title=f"doc {i}",
            lang="en",
        )
        for i in range(200)
    ]
    blobs = [compress(p, mode="lz") for p in pages]
    out_mb = sum(len(p) for p in pages) / 1e6

    def run() -> None:
        for blob, page in zip(blobs, pages):
            if decompress(blob) != page:
                raise RuntimeError("brotli round-trip mismatch")

    run()  # warm
    best = 1e9
    for _ in range(3):
        t0 = _t.process_time()
        run()
        best = min(best, _t.process_time() - t0)
    t0 = _t.process_time()
    for p in pages:
        compress(p, mode="lz")
    t_enc = _t.process_time() - t0
    out = {
        "brotli_decode_mb_per_sec": round(out_mb / best, 2),
        "brotli_encode_mb_per_sec": round(out_mb / t_enc, 2),
    }
    # r13: the WARC hot path rides libbrotlidec when present — rate the
    # fast path too so the crawl-decode story carries both numbers
    from tectonic_spark.operators.brotli import native_decompress

    if native_decompress(blobs[0]) is not None:

        def run_native() -> None:
            for blob, page in zip(blobs, pages):
                if native_decompress(blob) != page:
                    raise RuntimeError("brotli native mismatch")

        run_native()
        best_n = 1e9
        for _ in range(3):
            t0 = _t.process_time()
            run_native()
            best_n = min(best_n, _t.process_time() - t0)
        out["brotli_native_decode_mb_per_sec"] = round(out_mb / best_n, 2)
    return out


def _font_rate() -> dict[str, float]:
    """Font codec floors, single core, best-of-3 CPU-time (r13): the
    WOFF2 glyf/loca transform decode rated in glyphs/sec (triplet
    decode + reconstruction, the m29/m31 kernel), and the bounded
    Type 2 interpreter rated in charstrings/sec (the m32 kernel)."""
    import time as _t

    from tectonic_spark.operators.cff import (
        build_charstring,
        run_charstring,
    )
    from tectonic_spark.operators.woff2 import (
        build_glyf,
        glyph_simple,
        reconstruct_transformed_glyf,
        transform_glyf,
    )

    glyphs = [
        glyph_simple(
            [[(g * 3, 0, True), (g * 3 + 40 + g % 700, 0, g % 2 == 0),
              (g * 3 + 20, 50 + (g * 37) % 4000, True),
              (g * 3, 50, True)]],
            instructions=b"\x01" * (g % 4),
        )
        for g in range(2000)
    ]
    transformed = transform_glyf(glyphs, 1)
    want_glyf = build_glyf(glyphs, 1)[0]

    def run() -> None:
        if reconstruct_transformed_glyf(transformed)["glyf"] != want_glyf:
            raise RuntimeError("transform round-trip mismatch")

    run()  # warm
    best = 1e9
    for _ in range(3):
        t0 = _t.process_time()
        run()
        best = min(best, _t.process_time() - t0)
    css = [
        build_charstring(
            [("hstem", [10, 20]), ("rmoveto", [g % 300, 5]),
             ("rlineto", [4, 4, 7, 1, 2, 9]),
             ("rrcurveto", [1, 2, 3, 4, 5, 6]), ("endchar", [])],
            width=100 + g % 50,
        )
        for g in range(2000)
    ]

    def run_cs() -> None:
        for cs in css:
            run_charstring(cs, nominal_width=400)

    run_cs()
    best_cs = 1e9
    for _ in range(3):
        t0 = _t.process_time()
        run_cs()
        best_cs = min(best_cs, _t.process_time() - t0)
    return {
        "woff2_transform_glyphs_per_sec": round(len(glyphs) / best, 1),
        "cff_charstrings_per_sec": round(len(css) / best_cs, 1),
    }


def _doc_extract_rate() -> dict[str, float]:
    """Office-document extraction floors, single core, best-of-3
    CPU-time (r13 session 3): DOCX and RTF extraction rated in
    docs/sec over 15-paragraph fixtures (the m33/m35 kernels — OPC
    resolution + namespace walk, and the RTF tokenizer), XLSX rated
    in cells/sec over a 2000x4 sheet (the m37 kernel: shared-string
    resolution + A1 cross-checks per cell)."""
    import time as _t

    from tectonic_spark.operators.ooxml import (
        build_docx,
        build_xlsx,
        extract_docx,
        extract_xlsx,
    )
    from tectonic_spark.operators.rtf import build_rtf, extract_rtf

    paras = [
        ("Heading1" if j == 0 else "Normal",
         " ".join(f"word{(j * 8 + k) % 97}" for k in range(8)))
        for j in range(15)
    ]
    docx_payloads = [
        build_docx(paras, title=f"doc {i}", creator="bench")
        for i in range(60)
    ]
    rtf_payloads = [
        build_rtf([t for _, t in paras], title=f"doc {i}", bold_every=3)
        for i in range(60)
    ]
    rows = [
        [r * 4 + c if c % 2 == 0 else f"w{(r + c) % 31}"
         for c in range(4)]
        for r in range(2000)
    ]
    xlsx_payload = build_xlsx([("data", rows)])

    def best_of_3(fn) -> float:
        fn()  # warm
        best = 1e9
        for _ in range(3):
            t0 = _t.process_time()
            fn()
            best = min(best, _t.process_time() - t0)
        return best

    b_docx = best_of_3(
        lambda: [extract_docx(p) for p in docx_payloads]
    )
    b_rtf = best_of_3(lambda: [extract_rtf(p) for p in rtf_payloads])
    b_xlsx = best_of_3(lambda: extract_xlsx(xlsx_payload))
    return {
        "docx_extract_docs_per_sec": round(len(docx_payloads) / b_docx, 1),
        "rtf_extract_docs_per_sec": round(len(rtf_payloads) / b_rtf, 1),
        "xlsx_extract_cells_per_sec": round(8000 / b_xlsx, 1),
    }


def _pdf_extract_rate() -> dict[str, float]:
    """PDF text-extraction rate, single core, best-of-3 CPU-time (r10):
    FlateDecode'd multi-page documents through the xref-stream/ObjStm
    layout, rated over the PDF container bytes."""
    import time as _t

    from tectonic_spark.operators.pdf import build_pdf, extract_text

    docs = [
        build_pdf(
            [
                [
                    " ".join(f"tok{(d * 13 + ln * 7 + k) % 89}" for k in range(9))
                    for ln in range(14)
                ]
                for _pg in range(3)
            ],
            compress=True,
            xref_stream=(d % 2 == 0),
            objstm=(d % 2 == 0),
            title=f"doc {d}",
        )
        for d in range(40)
    ]
    total = sum(len(p) for p in docs)

    def run() -> None:
        for p in docs:
            if not extract_text(p):
                raise RuntimeError("no pages")

    run()  # warm
    best = 1e9
    for _ in range(3):
        t0 = _t.process_time()
        run()
        best = min(best, _t.process_time() - t0)
    return {"pdf_extract_mb_per_sec": round(total / 1e6 / best, 2)}


def _webp_decode_rate() -> dict[str, float]:
    """Vendored VP8L decode rate, single core, best-of-3 CPU-time
    (r10): a noise RGBA image (literal-heavy, worst case for the
    entropy loop) plus a palette image (the transform-and-LZ77 case),
    rated over RAW pixel bytes."""
    import time as _t

    import numpy as _np

    from tectonic_spark.operators.webp import decode_webp, encode_webp

    rng = _np.random.default_rng(17)
    noise = rng.integers(0, 256, (128, 128, 4), dtype=_np.uint8)
    pal = rng.integers(0, 256, (16, 4), dtype=_np.uint8)
    paletted = pal[rng.integers(0, 16, (192, 192), dtype=_np.uint8)]
    out = {}
    for name, img, kwargs in (
        ("webp_decode_mb_per_sec", noise, {"cache_bits": 6}),
        ("webp_decode_palette_mb_per_sec", paletted, {"palette": True}),
    ):
        data = encode_webp(img, **kwargs)
        decode_webp(data)  # warm
        best = 1e9
        for _ in range(3):
            t0 = _t.process_time()
            decode_webp(data)
            best = min(best, _t.process_time() - t0)
        out[name] = round(img.nbytes / 1e6 / best, 2)
    return out


def _audio_codec_rates() -> dict[str, float]:
    """Vendored FLAC decode and MP3 frame-walk rates, single core,
    best-of-3 CPU-time (VERDICT r6 item 7: codec regressions should be
    as visible as JPEG's)."""
    import time as _t

    import numpy as _np

    from tectonic_spark.operators.codecs import encode_mp3_frames, parse_mp3
    from tectonic_spark.operators.flac import decode_flac, encode_flac

    t = _np.arange(240_000, dtype=_np.float64)
    pcm = _np.stack(
        [
            (12000 * _np.sin(t / 37) + 6000 * _np.sin(t / 11)).astype(_np.int16),
            (9000 * _np.sin(t / 53) + 4000 * _np.sin(t / 7)).astype(_np.int16),
        ],
        axis=1,
    )
    flac = encode_flac(pcm, sample_rate=44100)
    decode_flac(flac)
    best = 1e9
    for _ in range(3):
        t0 = _t.process_time()
        decode_flac(flac)
        best = min(best, _t.process_time() - t0)
    rate_flac = len(flac) / 1e6 / best

    # lockstep batch regime (r7): real-world blocks (4096) across many
    # payload lanes — the corpus decode path (mapInPandas hands the kernel
    # whole Arrow batches)
    from tectonic_spark.operators.flac import decode_flac_batch

    tt = _np.arange(30_000, dtype=_np.float64)
    lanes = [
        encode_flac(
            _np.stack(
                [
                    (11000 * _np.sin(tt / (31 + i))).astype(_np.int16),
                    (8000 * _np.sin(tt / (7 + i)) + 2000 * _np.sin(tt / 3)).astype(
                        _np.int16
                    ),
                ],
                axis=1,
            ),
            sample_rate=44100,
            block_size=4096,
        )
        for i in range(64)
    ]
    lanes_mb = sum(len(p) for p in lanes) / 1e6
    decode_flac_batch(lanes)
    best_b = 1e9
    for _ in range(3):
        t0 = _t.process_time()
        decode_flac_batch(lanes)
        best_b = min(best_b, _t.process_time() - t0)

    # LPC regime (r8): order-8 LPC subframes — the real-world-encoder
    # shape — through the scalar path AND the cross-lane lockstep
    # prediction filter (VERDICT r7 item 2: within 2x of FIXED)
    flac_lpc = encode_flac(pcm, sample_rate=44100, block_size=4096, lpc_order=8)
    decode_flac(flac_lpc)
    best_l = 1e9
    for _ in range(3):
        t0 = _t.process_time()
        decode_flac(flac_lpc)
        best_l = min(best_l, _t.process_time() - t0)
    lpc_lanes = [flac_lpc] * 64
    lpc_mb = len(flac_lpc) * 64 / 1e6
    decode_flac_batch(lpc_lanes)
    best_lb = 1e9
    for _ in range(3):
        t0 = _t.process_time()
        decode_flac_batch(lpc_lanes)
        best_lb = min(best_lb, _t.process_time() - t0)

    mp3 = encode_mp3_frames(2000, bitrate_idx=9, samplerate_idx=0)
    parse_mp3(mp3)
    best = 1e9
    for _ in range(3):
        t0 = _t.process_time()
        parse_mp3(mp3)
        best = min(best, _t.process_time() - t0)
    return {
        "flac_decode_mb_per_sec": round(rate_flac, 2),
        "flac_decode_batch_mb_per_sec": round(lanes_mb / best_b, 2),
        "flac_decode_lpc_mb_per_sec": round(len(flac_lpc) / 1e6 / best_l, 2),
        "flac_decode_lpc_batch_mb_per_sec": round(lpc_mb / best_lb, 2),
        "mp3_walk_mb_per_sec": round(len(mp3) / 1e6 / best, 2),
    }


def _parallel_scan_mbps(spark, sf_dir: str) -> dict[str, float]:
    """End-to-end tectonic-json Spark scan throughput across all cores
    (small splitSizeBytes forces fan-out on the single fixture file) —
    the number that actually scales with executors at 100 TB."""
    from tectonic_spark.operators.parser_ops import documents_wide_jsonl_x
    from tectonic_spark.sources import register_tectonic_sources

    register_tectonic_sources(spark)
    # big enough that aggregate throughput, not the ~0.3-0.5 s fixed local
    # job/worker latency, dominates the wall clock
    path = documents_wide_jsonl_x(sf_dir, repeat=32)
    size_mb = os.path.getsize(path) / 1e6
    n_splits = int(spark.sparkContext.defaultParallelism)
    df = (
        spark.read.format("tectonic-json")
        .option("splitSizeBytes", max(64 * 1024, int(size_mb * 1e6 / n_splits)))
        .load(path)
    )
    df.count()  # warm (python workers + codegen); schema inference done at load
    # best-of-3: this is the one fully-parallel CPU-saturating extra, so a
    # transient co-tenant burst skews it far beyond what the single-thread
    # canary reports (r5 recorded 117 vs the true ~180 MB/s this way —
    # reader code was byte-identical to r4's 183 run). Min wall time over
    # three counts rejects the burst.
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        n = df.count()
        dts.append(time.perf_counter() - t0)
    dt = min(dts)
    # per-core end-to-end reader rate (parse -> prune -> Arrow), the number
    # that multiplies by executor-cores at scale (reference single-thread
    # JSON parse ≈ 30 MB/s)
    import json as _json

    from tectonic_spark.sources.json_source import FileSplit, TectonicJsonReader
    from tectonic_spark.sources.schema_infer import infer_spark_schema

    size = os.path.getsize(path)
    with open(path, "rb") as f:
        head = [
            _json.loads(ln) for ln in f.read(1 << 20).split(b"\n")[:200] if ln.strip()
        ]
    reader_1 = TectonicJsonReader(infer_spark_schema(head), {"path": path}, "lines")
    split = FileSplit(path, 0, size, size)

    def run_core() -> float:
        t1 = time.perf_counter()
        for _ in reader_1.read(split):
            pass
        return time.perf_counter() - t1

    run_core()
    t_core = min(run_core() for _ in range(2))
    return {
        "json_spark_scan_mb_per_sec": round(size_mb / dt, 1),
        "json_spark_scan_rows": n,
        "json_reader_mb_per_sec_per_core": round(size_mb / t_core, 1),
    }


STREAM_QUERIES = ["s04_stream_watermark", "s09_custom_stateful_sessions", "s11_stream_rollup_maintenance"]


def _stream_latency(spark, sf_dir: str) -> dict:
    """Streaming latency evidence (VERDICT r4 item 9): per-micro-batch
    processing time + state-store size for the stateful streaming queries.
    A StreamingQueryListener collects every progress event while the
    registered builder drives its stream to completion (availableNow);
    reported per query: batch count, p50/max triggerExecution ms, and the
    final state-store row count. Exactness for these queries is covered by
    the oracle gate — this row adds the latency dimension."""
    import statistics as _st
    import time as _t

    from pyspark.sql.streaming import StreamingQueryListener

    import tectonic_spark.operators as ops

    class _Collect(StreamingQueryListener):
        def __init__(self):
            self.progress = []

        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            self.progress.append(event.progress)

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    out: dict = {}
    for name in STREAM_QUERIES:
        listener = _Collect()
        spark.streams.addListener(listener)
        try:
            ops.REGISTRY[name].builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            # listener events are delivered asynchronously — drain briefly
            deadline = _t.time() + 5
            while _t.time() < deadline and not listener.progress:
                _t.sleep(0.2)
            _t.sleep(0.5)
        finally:
            spark.streams.removeListener(listener)
        durs = [
            p.durationMs.get("triggerExecution", 0)
            for p in listener.progress
            if p.numInputRows > 0 or p.batchId == 0
        ]
        state_rows = 0
        for p in reversed(listener.progress):
            if p.stateOperators:
                state_rows = sum(s.numRowsTotal for s in p.stateOperators)
                break
        tag = name.split("_")[0]
        out[f"stream_{tag}_batches"] = len(durs)
        if durs:
            out[f"stream_{tag}_batch_ms_p50"] = round(_st.median(durs), 1)
            out[f"stream_{tag}_batch_ms_max"] = round(max(durs), 1)
        out[f"stream_{tag}_state_rows"] = state_rows
    return out


SF1_SUBSET = [
    "b05_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "b07_topn_per_group",
    "c01_minhash_lsh",
    "c03_token_stats",
    # round-3 additions: heaviest TPC-H join shape + the two new pipeline
    # ops with scale-relevant structure (global pack shuffle / per-row fold)
    "q21_suppliers_who_kept_orders_waiting",
    "c04_sequence_packing",
    "c04_repetition",
    # round-4 addition: the iterative clustering loop (3 scans + K x DIM
    # partial shuffles); semantic dedup runs below with its scale knob
    # turned (k=64) like embedding_neardup[bits=10]
    "c02_kmeans",
    # round-4b: the iterative integer-PageRank loop (4 dst-keyed shuffles
    # over the reused edge list)
    "c06_pagerank",
    # r14 ADDITION (additions-only per the driver contract): the wedge
    # closure is the heaviest graph row (137M wedges / 124M triangles at
    # this scale) and was rewritten this round (packed long probe key,
    # 19.0 -> 4.9 s idle); surface it in the driver-visible sf1 dict.
    "c06_triangle_count",
]


def _sf1_headroom(spark, sf_dir: str, base: dict[str, float]) -> dict:
    """Scale-headroom row (VERDICT r1 item 8): run a scan/join/LSH subset
    at 10x the bench SF (fact-scaled synthetic, tools/sf_scale.py) and
    report each query's time against the linear extrapolation
    ``10 x t_sf0.1`` — a ratio well above ~2 flags quadratic/skew behavior
    the small SF hides. The banded embedding near-dup runs with its scale
    knob turned (bits=10 so band buckets stay ~20 rows at 20k vectors)."""
    if os.environ.get("SPARK_GRAFT_SF1", "1") != "1":
        return {}
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tools"))
        from sf_scale import ensure_scaled

        import tectonic_spark.operators as ops
        from tectonic_spark.operators.dedup import embedding_neardup_df

        factor = 10
        scaled = ensure_scaled(sf_dir, factor)
        timings: dict[str, float] = {}

        # best-of-2 per query (r7): single-pass sf1 numbers swing +-20%
        # with JVM/Arrow warm-up position inside the run — isolated
        # re-measurement of the four r5->r6 "regressions" (pq_adc +41%
        # etc.) showed first-pass 15.0 s vs steady-state 5.1 s on
        # kmeans[pandas]; one warm retry kills the phantom while only
        # ~doubling this section's cost.
        def timed(label: str, build) -> None:
            best = 1e9
            for _ in range(2):
                # r14 measurement fix (VERDICT r13 item 8): builders that
                # persist shared subtrees left their cache behind, so pass
                # 2 reused pass 1's materialized blocks (CacheManager keys
                # on the analyzed plan) — "best-of-2" was a warm-cache
                # number. Clearing between passes makes every pass measure
                # what a fresh run costs; the clear itself is outside the
                # timed window. r13 numbers were warm-cache; comparisons
                # are re-baselined in OPTIMIZATION_r14.md.
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                build().write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            timings[label] = round(best, 3)

        for name in SF1_SUBSET:
            timed(name, lambda name=name: ops.REGISTRY[name].builder(spark, scaled))
        timed(
            "c01_embedding_neardup[bits=10]",
            lambda: embedding_neardup_df(spark, scaled, n_bits=10, sketch="pandas"),
        )
        from tectonic_spark.operators.clustering import (
            kmeans_scaled_df,
            semantic_dedup_blocked_df,
        )

        # r5: the blocked (straggler-free) path — what the registered
        # c01_semantic_dedup_scaled now runs
        timed(
            "c01_semantic_dedup[k=64,blocked]",
            lambda: semantic_dedup_blocked_df(spark, scaled, k=64),
        )
        timed("c02_kmeans[pandas]", lambda: kmeans_scaled_df(spark, scaled))
        from tectonic_spark.operators.similarity import pq_adc_scaled_df

        timed("c02_pq_adc[pandas]", lambda: pq_adc_scaled_df(spark, scaled))
        # dedup-cluster formation at sf1 (VERDICT r3 item 6): rounds to
        # converge + wall time for alternating large-star/small-star CC.
        # Pairs come from the minhash-LSH generator (seconds at sf1) so the
        # metric isolates CC itself, not the ~10-min exact-Jaccard pair
        # generation; the graph is the same near-dup topology. The
        # rounds <= log2(n)+c bound is asserted in tests/test_dedup_cc.py.
        from tectonic_spark.operators.dedup import (
            c01_minhash_lsh,
            connected_components,
        )

        spark.catalog.clearCache()  # r14: cc timed from a cold cache too
        t0 = time.perf_counter()
        pairs = c01_minhash_lsh(spark, scaled).select("doc_a", "doc_b")
        labels, cc_rounds = connected_components(pairs)
        cc_nodes = labels.count()
        timings_extra = {
            "cc_sf1_rounds": cc_rounds,
            "cc_sf1_nodes": cc_nodes,
            "cc_sf1_sec": round(time.perf_counter() - t0, 3),
            "cc_sf1_bound_ok": bool(
                cc_rounds <= math.ceil(math.log2(max(cc_nodes, 2))) + 4
            ),
        }
        ratios = {
            n: round(t / (factor * base[n]), 2)
            for n, t in timings.items()
            if n in base and base[n] > 0
        }
        return {
            "sf1_factor": factor,
            "sf1_queries_sec": timings,
            "sf1_total_sec": round(sum(timings.values()), 3),
            "sf1_vs_linear_ratio": ratios,
            **timings_extra,
        }
    except Exception as e:  # noqa: BLE001 — headroom row must not kill bench
        return {"sf1_error": f"{type(e).__name__}: {e}"[:300]}


def main() -> None:
    global LOADAVG_START, CPUSTAT_START, PAR_CANARY_START
    LOADAVG_START = _loadavg()
    CPUSTAT_START = _cpu_jiffies()
    # all-core canary BEFORE Spark exists: nothing of ours is running,
    # so any shortfall vs the calibrated idle rate IS external load
    PAR_CANARY_START = _parallel_canary()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = "/root/testdata/sf0.001"
    import tectonic_spark.operators as ops
    from tectonic_spark import get_spark

    spark = get_spark(app_name="tectonic-bench")
    # Warm-up: run every headline plan once at the smallest sf so codegen,
    # parquet footer reads, and JIT are not charged to the timed pass
    # (steady-state throughput is the dimension BASELINE.md compares).
    spark.range(1).count()
    for name in HEADLINE:
        ops.REGISTRY[name].builder(spark, warm_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    # Per-query median of 5 timed passes: a single contended pass on a
    # co-tenant machine once produced a phantom 29% "regression" (r2), and
    # 3 passes still let a slow not-yet-steady-state first pass drag the
    # median on a cold JVM (observed r4: b07 medians 1.13 at 3 passes vs
    # 0.81 at steady state). The median of 5 kills both at ~3x wall cost.
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "5"))
    seg_canaries: dict[str, float] = {"pre_headline": _quick_par_canary()}
    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = ops.REGISTRY[name]
        passes = []
        for _ in range(repeats):
            # r14 measurement fix (VERDICT r13 item 8): clear leftover
            # per-query caches so each pass measures a fresh run, not a
            # reuse of pass 1's materialized blocks. Outside the timed
            # window; r13 medians for cache-using queries (minhash) were
            # warm-cache — re-baselined in OPTIMIZATION_r14.md.
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            q.builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
            passes.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(passes), 3)
    seg_canaries["post_headline"] = _quick_par_canary()

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    extras = {
        **_skip_speedup(sf_dir),
        **_probe_speedup(sf_dir),
        **_csv_reader_mbps(sf_dir),
        **_parallel_scan_mbps(spark, sf_dir),
        **_jpeg_decode_rate(),
        **_png_decode_rate(),
        **_gif_decode_rate(),
        **_webp_decode_rate(),
        **_warc_extract_rate(),
        **_brotli_rate(),
        **_font_rate(),
        **_pdf_extract_rate(),
        **_doc_extract_rate(),
        **_audio_codec_rates(),
        **_stream_latency(spark, sf_dir),
    }
    seg_canaries["post_extras"] = _quick_par_canary()
    extras.update(_sf1_headroom(spark, sf_dir, timings))
    seg_canaries["post_sf1"] = _quick_par_canary()
    # Host-speed canary (VERDICT r4 item 4): the single-thread pure-Python
    # JSON full-parse rate is Spark-independent and scales 1:1 with CPU
    # contention, so a co-tenant-loaded driver run self-documents.
    # CANARY_IDLE is the rate measured on this host idle (r4 judge session:
    # 85.7 MB/s); headline_normalized = value * canary/idle deflates a
    # contended run's inflated wall time by the observed slowdown factor.
    canary = extras.get("json_full_parse_mb_per_sec", 0.0)
    idle_ref, idle_par, calibrated = _canary_idle_ref()
    # all-core canary again AFTER the queries, with the Spark JVM gone
    # (ADVICE r8: JVM background threads depressed the end reading and
    # falsely suggested external load arrived mid-run); normalization
    # uses the pre-Spark START reading, the one measurement with zero
    # own-load in it
    spark.stop()
    par_canary_end = _parallel_canary()
    value = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total",
        "value": value,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf else None,
        "host_canary_mb_per_sec": canary,
        "host_canary_idle_ref_mb_per_sec": idle_ref,
        "host_canary_calibrated": calibrated,
        "host_parallel_canary_start_mb_per_sec": PAR_CANARY_START,
        "host_parallel_canary_end_mb_per_sec": par_canary_end,
        "host_parallel_canary_idle_ref_mb_per_sec": idle_par,
        "loadavg_start": LOADAVG_START,
        "loadavg_end": _loadavg(),
        "host_steal_pct": _steal_pct(CPUSTAT_START, _cpu_jiffies()),
        "headline_normalized": (
            round(value * canary / idle_ref, 3) if canary else None
        ),
        # the legacy start-canary-only parallel normalization was
        # DROPPED in r12 (VERDICT r11 item 6): on a loaded host it
        # over-normalized into uselessness (2.151 vs the bracketed
        # 4.938 in r11) — the segment-bracketed variant below is the
        # one parallel-normalized number
        # segment-bracketed normalization (VERDICT r10 item 6): the
        # headline segment normalized by the max of the JVM-free
        # pre-Spark reading AND its bracketing mid-run samples. The
        # pre-Spark reading is in the max because JVM-alive samples
        # read systematically low (first bench run: ~70-77% of the
        # JVM-free idle ref even on an idle host) and normalizing by a
        # depressed canary FLATTERS the number; with it included, an
        # idle run normalizes to ~raw, a loaded-whole-run normalizes
        # down by the real slowdown, and mid-run-only load leaves the
        # raw (inflated, conservative) number standing
        "segment_canaries_mb_per_sec": seg_canaries,
        # the sf1 subset rides the post_extras..post_sf1 bracket; the
        # flag compares the bracket's ends against EACH OTHER — both
        # are JVM-alive samples in the same engine state, so a >30%
        # drop across the section means load arrived DURING it (the
        # r10 failure mode). Absolute thresholds don't work here:
        # JVM-alive samples read anywhere from ~50% to ~80% of the
        # JVM-free rate depending on what the extras left running,
        # even on an idle host. r13 (VERDICT r12 item 7): ALSO flag
        # when the bracket's floor sits below half the JVM-free idle
        # parallel reference — the r12 failure mode was a host
        # depressed EARLY in the bracket that recovered by its end
        # (6,011 -> 14,250), which the ends-only comparison read as
        # "rising, fine" while the rows ran up to 90% slow
        "sf1_contended": (
            seg_canaries["post_sf1"] < 0.7 * seg_canaries["post_extras"]
            or (
                idle_par is not None
                and min(seg_canaries["post_extras"], seg_canaries["post_sf1"])
                < 0.5 * idle_par
            )
        ),
        "headline_normalized_parallel_segment": (
            round(
                value
                * max(
                    PAR_CANARY_START,
                    seg_canaries["pre_headline"],
                    seg_canaries["post_headline"],
                )
                / idle_par,
                3,
            )
            if idle_par
            else None
        ),
        "extras": extras,
    }
    print(json.dumps(out))
    # compact summary LAST (VERDICT r8 item 4): the driver records the
    # TAIL of bench output, and r8's enlarged extras pushed the headline
    # fields (emitted first in the JSON) off the captured window — keep
    # the numbers a judge needs in the final line
    print(
        json.dumps(
            {
                "metric": "headline_summary",
                "headline_raw": value,
                # r14 (VERDICT r13 item 1a): the driver keeps only the
                # TAIL of bench output and builds PERF.per_query /
                # scaling from the LAST parsed line — the per-query
                # dicts rode the first (truncated) big row for two
                # rounds, leaving the comparison empty. Ride them on
                # the compact line too, plus the driver-contract
                # value/unit/queries trio. Additions only; the big
                # first row is unchanged.
                "value": value,
                "unit": "sec",
                "queries": timings,
                "sf1_queries_sec": extras.get("sf1_queries_sec"),
                "sf1_total_sec": extras.get("sf1_total_sec"),
                "cc_sf1_sec": extras.get("cc_sf1_sec"),
                "cc_sf1_rounds": extras.get("cc_sf1_rounds"),
                "cc_sf1_bound_ok": extras.get("cc_sf1_bound_ok"),
                "headline_normalized": out["headline_normalized"],
                # r12 (VERDICT r11 item 6): the sf1 contention flag
                # rides the compact line the driver tail keeps, and the
                # segment-bracketed number is the ONE parallel-
                # normalized figure (legacy start-canary-only variant
                # dropped — it over-normalizes on a loaded host)
                "sf1_contended": out["sf1_contended"],
                "canary": canary,
                "canary_idle_ref": idle_ref,
                "par_canary_start": PAR_CANARY_START,
                "par_canary_end": par_canary_end,
                "par_canary_idle_ref": idle_par,
                "segment_canaries": seg_canaries,
                "headline_normalized_parallel_segment": out[
                    "headline_normalized_parallel_segment"
                ],
                "loadavg_start": LOADAVG_START,
                "loadavg_end": out["loadavg_end"],
                "steal_pct": out["host_steal_pct"],
                "sf": out["sf"],
                # BASELINE.md comparison dims (VERDICT r9 item 5): the
                # driver's tail capture truncates the FRONT of the big
                # row, so the judge-facing baseline scalars must ride
                # this final compact line too
                "json_skip_speedup": extras.get("json_skip_speedup"),
                "json_full_parse_mb_per_sec": extras.get(
                    "json_full_parse_mb_per_sec"
                ),
                "csv_parse_mb_per_sec": extras.get("csv_parse_mb_per_sec"),
                "json_reader_mb_per_sec_per_core": extras.get(
                    "json_reader_mb_per_sec_per_core"
                ),
                "csv_reader_mb_per_sec_per_core": extras.get(
                    "csv_reader_mb_per_sec_per_core"
                ),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
