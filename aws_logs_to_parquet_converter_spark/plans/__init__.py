"""Query plans: the engine's analysis-query surface.

Each entry pairs a Spark-native implementation with an ANSI-SQL oracle
(DuckDB dialect) over the same tables, so the driver's differential
harness (row-count + schema + order-insensitive value-hash) can grade
it.  Modules register into ``REGISTRY`` at import time; the registry is
then REORDERED so the externally graded window (the driver grades the
first 50 entries) covers the highest-value surface first.
"""

from aws_logs_to_parquet_converter_spark.plans.registry import REGISTRY, Query, query  # noqa: F401
import aws_logs_to_parquet_converter_spark.plans.core  # noqa: E402,F401
import aws_logs_to_parquet_converter_spark.plans.core2  # noqa: E402,F401
import aws_logs_to_parquet_converter_spark.plans.core3  # noqa: E402,F401
import aws_logs_to_parquet_converter_spark.plans.core4  # noqa: E402,F401
import aws_logs_to_parquet_converter_spark.plans.core5  # noqa: E402,F401
import aws_logs_to_parquet_converter_spark.plans.log_domain  # noqa: E402,F401
import aws_logs_to_parquet_converter_spark.plans.extensions  # noqa: E402,F401

# The driver's correctness gate grades the FIRST 50 registry entries.
# Round-5 window policy (see COVERAGE.md "Driver-graded evidence" for
# the per-query currency table):
#   1. every query whose behavior changed this round: the 12
#      events-table queries (the t() NTZ-normalization seam rewrote
#      their load path) plus q_diag_countif_emit (probe retired into a
#      real BIGINT-cast query) — a regression there must be visible to
#      the hard signal, not just the local gate;
#   2. the 9 round-3 additions that have NEVER carried a driver-graded
#      row (q_url_funcs, the 10th, is already in via rule 1);
#   3. the 6 r01-only families deferred since r03 (q_json_extract and
#      q_window_range_frame, the other two, are already in via rule 1);
#   4. the 7 round-5 additions (never graded anywhere but the local
#      gate — r02 proved local-green != driver-green, so new queries
#      outrank stale-but-green ones for slots);
#   5. the remaining slots rotate through the oldest hard evidence:
#      r02-green families (dedup/similarity/text, outer joins,
#      recursive/lateral) unmodified since.
# Rotated out (all r4-green and UNMODIFIED this round, keeping r4
# currency per COVERAGE.md policy): the integer-cents contract slice
# (q01..q_agg_stats), q_diag_bool/maxby probes, the r4-graded r02
# additions (q_pii_scrub..q_contamination) and r01 families
# (q_join_left..q_agg_rollup).  Still waiting (r02 currency, displaced
# by rule 4 — families already carrying multiple graded rows): q04,
# q12, q16, q20, q_token_count, q_quality_filter, q_window_first_last,
# q_string_agg, q_lang_id.
GRADED_WINDOW = 50

_PRIORITY = [
    # flagship (reference's days_apart_analysis.sql run verbatim)
    "q_days_apart",
    # (1) events-table queries — load path rewritten by the NTZ seam
    "q_window_lag",
    "q_window_range_frame",
    "q_sessionize",
    "q_asof_join",
    "q_asof_forward_tolerance",
    "q_session_window",
    "q_sliding_window",
    "q_log_status_breakdown",
    "q_hourly_traffic",
    "q_json_extract",
    "q_url_funcs",
    # (1) probe retired into a real query this round
    "q_diag_countif_emit",
    # (2) round-3 additions never yet driver-graded
    "q_segment_repetition",
    "q_top_bigram",
    "q_mix_sources",
    "q_embed_quantize",
    "q_embed_normalize",
    "q_tfidf_topterms",
    "q_bpe_token_count",
    "q_cms_vocab_counts",
    "q_hll_distinct_rollup",
    # (3) r01-only families deferred since r03
    "q_explode_words",
    "q_grouping_sets",
    "q_union_by_name",
    "q_correlated_scalar",
    "q_bag_set_ops",
    "q_values_dim",
    # (4) round-5 additions: never driver-graded
    "q_quality_score",
    "q_corpus_diff",
    "q_mix_token_budget",
    "q_length_band",
    "q_corpus_clean_pipeline",
    "q_array_funcs",
    "q_k_anonymize",
    "q_map_funcs",
    "q_regexp_funcs",
    # (5) r02-green rotation: oldest hard evidence, unmodified since
    "q_join_right",
    "q_join_full",
    "q_salted_agg",
    "q_join_broadcast",
    "q_dedup_exact",
    "q_dedup_fingerprint",
    "q_ngram_jaccard",
    "q_dedup_keep_list",
    "q_embed_topk",
    "q_embed_neardup",
    "q_text_stats",
    "q_recursive_cte",
    "q_lateral_topn",
]


def _reorder() -> None:
    # A typo here must fail loudly, not silently drop a query out of the
    # graded window (round-2 advisor finding).
    unknown = set(_PRIORITY) - set(REGISTRY)
    assert not unknown, f"_PRIORITY names not in REGISTRY: {sorted(unknown)}"
    assert len(_PRIORITY) == len(set(_PRIORITY)), "duplicate _PRIORITY entries"
    assert len(_PRIORITY) <= GRADED_WINDOW, (
        f"_PRIORITY has {len(_PRIORITY)} entries; the driver grades only "
        f"the first {GRADED_WINDOW}"
    )
    ordered = {n: REGISTRY[n] for n in _PRIORITY}
    ordered.update({n: q for n, q in REGISTRY.items() if n not in ordered})
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder()
