from .catalog import CATALOG, QuerySpec, bench_queries, oracle_map, query_map  # noqa: F401
from . import catalog_ml  # noqa: F401  (registers the ML/text queries)
from . import catalog_hebrew  # noqa: F401  (registers the corpus/domain queries)

# The driver's correctness gate checks the FIRST 50 entries of queries().
# Rotate coverage: demote queries that are hash-green in the latest
# recorded round AND whose operator family keeps other in-window
# evidence, so entries that have never received driver validation (the
# Hebrew e2e pipelines — the reference's entry points 1 and 3 — plus the
# r01-only-green relational queries) enter the window. Order within each
# group preserves registration order, so the rotation is deterministic.
_DEMOTED = (
    "asof_click_purchase",        # r03-green; superseded in-window by asof_click_purchase_tol (same plan + tolerance gate)
    "top10_orders",               # O1–O3: ordering/TakeOrdered evidence stays in-window via bm25_keyword_topk + dsir_importance_select (top5_recent_events_per_user later joined the demoted tail)
    "except_types_week1_week2",   # E1–E3 r03-green; set-ops stable since r01
    "intersect_types_week1_week2",
    "union_click_purchase_daily",
    "distinct_dimensions",        # A10 r03-green
    "avg_after_skip2",            # A8 r03-green
    "event_type_shares",          # F18 r03-green
    "cube_status_priority",       # A6 keeps rollup_region_nation in-window
    "pivot_user_event_counts",    # r03-green extra beyond §2
    "price_quantiles_by_flag",    # sketches keep sketch_accuracy_certificates
    "overlapping_purchase_windows",  # J7 keeps orders_containing_shipdate + clicks_in_purchase_windows
    "simhash_fingerprints",       # simhash_hamming_pairs exercises the full path
    "embedding_near_dup_pairs",   # exact tier; LSH tier stays in-window
    "lang_id_confusion",          # text family keeps doc_text_stats
    "corpus_verses",              # corpus scan exercised by 5 in-window corpus/chapter queries
    "dedup_exact_keepers",        # corpus_curation_pipeline runs the same keep-first dedup
    # r04 additions to the demoted tail: all r03-green, all still gated by
    # PARITY_SUBSET at every commit; freed slots let winnow_fingerprints
    # and the four new curation queries (clusters/split/pii/contamination)
    # receive first-time driver validation.
    "hebrew_normalize",
    "upsert_last_event_state",
    "tumbling_hour_stats",
    "missing_order_days",
    "json_extract_defaults",
    "sql_segment_revenue",        # r03-green; SQL front-end twin of in-window region_revenue
    "clicks_in_purchase_windows",  # J7 keeps orders_containing_shipdate in-window
    "ann_bruteforce_top10",       # ANN family evidence stays via ivf pair + pq in-window
    "skewed_event_profile",       # r03-green; salting pinned by TestSkewOperators + PARITY_SUBSET
    "simhash_hamming_pairs",      # r03-green; banded simhash evidence stays via dedup_clusters + incremental lookup in-window
    # freed slots for the two new curation queries (semantic_dedup_flags,
    # doc_lm_perplexity), both first-time entries needing validation:
    "sketch_accuracy_certificates",  # r03-green; sketch plan pinned by explain_audit + unit tests
    "doc_chunks_udtf",            # r03-green; documented slow-path demo, covered by test suite
    "image_neardup_pipeline",     # r03-green; frees a slot for duplicate_token_spans (first-time entry)
    "jaccard_token_pairs",        # r03-green; moved to PARITY_SUBSET gating; frees a slot for corpus_mixture_plan
    "minhash_lsh_candidates",     # r03-green; moved to PARITY_SUBSET gating; frees a slot for bm25_keyword_topk
    # fifth wave: dsir_importance_select / corpus_snapshot_diff /
    # embedding_outlier_scores are first-time entries; two of the three
    # slots were free, the third comes from demoting
    "doc_text_stats",             # r03-green; text family evidence stays via doc_lm_perplexity, bm25, gopher in-window
    "chapter_filenames",          # r03-green; S3/F6/F7 gated by PARITY_SUBSET; frees a slot for bm25_prf_rerank (first-time entry)
    "rollup_region_nation",       # r03-green; A6 gated by PARITY_SUBSET; frees a slot for incremental_curation_delta (first-time entry)
    "part_name_similarity",       # r01-green; J6/F12 gated by PARITY_SUBSET; frees a slot for ann_recall_report (first-time entry)
    "suppliers_shipping_1995h1",  # r03-green; J4 gated by PARITY_SUBSET; frees a slot for corpus_mixture_upsample (first-time entry)
    "customers_quiet_1995",       # r03-green; J3 gated by PARITY_SUBSET; frees a slot for bpe_merge_rounds (first-time entry)
    # review finding: the kept set sat at 52 entries, so the LAST two
    # (video_frame_index, winnow_fingerprints) silently missed the
    # 50-entry driver window the comments promised them — two more
    # r03-green demotions close the off-by-two
    "first_event_over_threshold",  # W1 r03-green; gated by PARITY_SUBSET
    "top5_recent_events_per_user",  # W4 r03-green; gated by PARITY_SUBSET
    "region_revenue",             # r03-green; J1 broadcast evidence also pinned by explain_audit + PARITY_SUBSET; frees a slot for dedup_recall_report (first-time entry)
    "orders_containing_shipdate",  # r03-green; J7 gated by PARITY_SUBSET + explain_audit; frees a slot for schema_drift_conform (first-time entry)
)


def _reorder() -> None:
    demoted = {n: s for n, s in CATALOG.items() if n in _DEMOTED}
    kept = {n: s for n, s in CATALOG.items() if n not in _DEMOTED}
    CATALOG.clear()
    CATALOG.update(kept)
    CATALOG.update(demoted)


_reorder()

__all__ = ["CATALOG", "QuerySpec", "bench_queries", "oracle_map", "query_map"]
