"""sf10 spot sweep (VERDICT r4 item 8): run the headline + c-family
subset at 100x facts (`ensure_scaled(sf0.1, 100)` ≈ 1.3 GiB parquet,
60M-row lineitem, 500k documents) and report each wall time against the
linear extrapolation ``100 x t_sf0.1`` (and ``10 x t_sf1`` where the sf1
number is on file). Results → SF10SPOT.md.

Usage: PYTHONPATH=. python tools/sf10_spot.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "b05_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q21_suppliers_who_kept_orders_waiting",
    "c03_token_stats",
    "c04_sequence_packing",
    "c04_repetition",
    "c04_corpus_shuffle",
    "c01_line_dedup",
    "c06_pagerank",
    "c02_kmeans_scaled",
    "c02_pq_adc_scaled",
]

# r6 (VERDICT r5 item 8): the s- and m-surfaces had no 100x evidence.
# Their scale risks differ from the relational set: streaming state-store
# growth / watermark eviction under 100x event volume, and decode fan-out
# (per-payload Python cost) for the media family. `--families` runs these.
FAMILY_QUERIES = [
    "s06_stream_dedup",
    "s08_stream_stream_join",
    "s09_custom_stateful_sessions",
    "s12_stream_media_decode",
    "m08_jpeg_decode",
    "m11_jpeg_progressive",
    "m12_flac_decode",
]

# r7 (VERDICT r6 item 6): families still without a 100x row — the sink
# matrix (write-path fan-out + partition pruning under real volume), the
# window family (per-key sort spill), c03 text (broadcast model tables +
# per-row kernels), c05 compositions (multi-stage exchange budgets), and
# the graph family (triangle counting and peeling are the likeliest
# super-linear suspects: both join edges against edges). `--families2`.
FAMILY_QUERIES_R7 = [
    "a17_partitioned_sink_pruning",
    "a21_gzip_sink_roundtrip",
    "b07_range_frame",
    "b11_sliding_window",
    "c03_tfidf_keywords",
    "c03_bm25_retrieval",
    "c03_nb_langid",
    "c05_corpus_curation",
    "c05_curation_v2",
    "c06_triangle_count",
    "c06_alpha_beta_core",
    "m13_h264_census",
]

# r8 (VERDICT r7 item 5): 100x engagement evidence for the lockstep
# engines — m14 (baseline lane pool) and m15 (progressive lane pool)
# pin rode_engine per payload in their value-hashed outputs, so a green
# run at 100x IS the engine-engaged proof; m12 now carries LPC
# subframes (orders 2/8/12) through the cross-lane prediction filter;
# m16 walks the MP4 container at volume. `--families3`.
FAMILY_QUERIES_R8 = [
    "m14_jpeg_dense_decode",
    "m15_jpeg_progressive_dense",
    "m12_flac_decode",
    "m16_mp4_census",
]

# The registered c01_semantic_dedup_scaled pins k=8 to stay under the
# static oracle; per-cluster pair volume is ~ (N/k)^2, so at 500k docs
# k=8 would demand a 168k x 168k similarity matrix (212 GiB — observed).
# The published recipe grows k with the corpus; the spot runs the same
# code with the knob turned.
SEM_DEDUP_K = 256


def main() -> None:
    from sf_scale import ensure_scaled

    import tectonic_spark.operators as ops
    from tectonic_spark import get_spark

    args = sys.argv[1:]
    if args == ["--families"]:
        names = FAMILY_QUERIES
        sys.argv = sys.argv[:1] + names  # skip the sem-dedup extra below
    elif args == ["--families2"]:
        names = FAMILY_QUERIES_R7
        sys.argv = sys.argv[:1] + names
    elif args == ["--families3"]:
        names = FAMILY_QUERIES_R8
        sys.argv = sys.argv[:1] + names
    else:
        names = args or QUERIES
    t0 = time.perf_counter()
    scaled = ensure_scaled("/root/testdata/sf0.1", 100)
    print(f"scaled dir ready in {time.perf_counter() - t0:.1f}s: {scaled}")
    # partition sizing doctrine (SCALING.md): 32 partitions @ x100 puts
    # ~2M rows in a sort-merge partition — raise toward the x300 setting
    spark = get_spark(
        app_name="tectonic-sf10-spot",
        extra_conf={"spark.sql.shuffle.partitions": "128"},
    )
    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        try:
            ops.REGISTRY[name].builder(spark, scaled).write.format("noop").mode(
                "overwrite"
            ).save()
            timings[name] = round(time.perf_counter() - t0, 2)
        except Exception as e:  # noqa: BLE001
            timings[name] = -1.0
            print(f"FAIL {name}: {type(e).__name__}: {e}", flush=True)
        print(f"{name}: {timings[name]}s", flush=True)
    if not sys.argv[1:]:
        from tectonic_spark.operators.clustering import semantic_dedup_scaled_df

        t0 = time.perf_counter()
        semantic_dedup_scaled_df(spark, scaled, k=SEM_DEDUP_K).write.format(
            "noop"
        ).mode("overwrite").save()
        timings[f"c01_semantic_dedup_scaled[k={SEM_DEDUP_K}]"] = round(
            time.perf_counter() - t0, 2
        )
        print(f"c01_semantic_dedup_scaled[k={SEM_DEDUP_K}]: "
              f"{timings[f'c01_semantic_dedup_scaled[k={SEM_DEDUP_K}]']}s", flush=True)
    print(json.dumps({"sf10_queries_sec": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
