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
# Round-6 window policy (see COVERAGE.md "Driver-graded evidence" for
# the per-query currency table):
#   1. queries whose behavior changed this round: q_corpus_diff and
#      q_corpus_clean_pipeline (oracles rewritten to mirror the
#      engine's NULL-text sentinel digests — the round-5 advisor
#      finding) re-enter the same round per rotation policy;
#   2. the 13 r02-stale queries the round-5 verdict ordered in: q04,
#      q12, q13, q16, q18, q20, q21, q22, q_token_count,
#      q_quality_filter, q_window_first_last, q_string_agg, q_lang_id
#      — after this round every oracle-bearing registry entry has
#      driver-graded evidence no older than 3 rounds;
#   3. q_hll_distinct_rollup is OUT (it can only ever produce
#      `no_oracle`; its sketch estimate is differentially tested in
#      pytest instead) so the window is 50/50 hash-gradeable;
#   4. the remaining slots rotate the oldest hard evidence back in:
#      the r4-green set, in COVERAGE.md currency-table order (the
#      integer-cents contract slice q01..q_agg_stats, the diag probes,
#      the r4-graded r02 additions q_pii_scrub..q_contamination, and
#      r01 join/window families q_join_left..q_window_ntile).
# Rotated out (all r5-green and UNMODIFIED this round, keeping r5
# currency): the events-table queries, the r03/r05 additions graded
# last round, and the r5 rotation slice.  Still waiting at r4
# currency (rotation candidates for r7): q_topk, q_set_ops,
# q_cte_composition, q_string_funcs, q_date_funcs, q_math_funcs,
# q_conditional, q_in_subquery, q_pivot, q_percentiles,
# q_agg_distinct, q_agg_rollup, q_window_rolling, q_window_ntile
# (the last two displaced by the round-6 additions q_split_assign /
# q_bitwise_funcs — never-graded outranks stale-but-green).
GRADED_WINDOW = 50

_PRIORITY = [
    # flagship (reference's days_apart_analysis.sql run verbatim)
    "q_days_apart",
    # (1) oracles changed this round (NULL-text sentinel parity)
    "q_corpus_diff",
    "q_corpus_clean_pipeline",
    # (2) the 13 r02-stale rotate-ins (round-5 verdict item 1)
    "q04_order_priority",
    "q12_priority_shipping",
    "q13_order_count_distribution",
    "q16_supplier_cnt",
    "q18_large_orders",
    "q20_promotable_suppliers",
    "q21_sole_blame_suppliers",
    "q22_idle_balances",
    "q_token_count",
    "q_quality_filter",
    "q_window_first_last",
    "q_string_agg",
    "q_lang_id",
    # (4) oldest-evidence rotation: the r4-green set, currency order
    "q01_pricing_summary",
    "q02_filter_project",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q06_forecast_revenue",
    "q07_nation_volume",
    "q08_market_share",
    "q09_product_profit",
    "q10_returned_items",
    "q11_important_parts",
    "q14_promo_effect",
    "q15_top_supplier",
    "q17_small_qty_revenue",
    "q19_disjunctive",
    "q_agg_modern",
    "q_agg_stats",
    "q_pii_scrub",
    "q_stratified_sample",
    "q_pack_sequences",
    "q_chunk_docs",
    "q_vocab_topk",
    "q_contamination",
    # (5) round-6 additions: never driver-graded outranks stale-but-
    # green (displaced q_join_left / q_join_semi / q_join_anti /
    # q_join_range / q_window_rank / q_window_rolling / q_window_ntile
    # keep r4 currency and rotate with the r7 candidates; outer-join
    # coverage stays in-window via q13, semi via q04/q20's
    # EXISTS/semi-over-HAVING, anti via q16's NOT IN / q21's NOT
    # EXISTS)
    "q_split_assign",
    "q_bitwise_funcs",
    "q_incremental_dedup",
    "q_boilerplate_lines",
    "q_winnow_fingerprints",
    "q_winnow_pairs",
    "q_data_quality",
    # SemDeDup exact mode, CCNet perplexity, and the Bloom-prefiltered
    # incremental dedup (new this round; displaced q_diag_bool_emit /
    # q_diag_maxby_emit / q_agg_cube, all r4-green with in-window or
    # recent family siblings — never-graded outranks stale-but-green)
    "q_semantic_dedup",
    "q_perplexity",
    "q_incremental_dedup_bloom",
    # GK quantile sketch graded in its exact regime (displaced
    # q_group_by_all, r4-green syntax-sugar entry)
    "q_approx_percentiles",
    # HTML->text extraction differential (displaced q_unpivot, r4-green
    # with its inverse q_pivot already an r7 rotation candidate)
    "q_html_extract",
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
