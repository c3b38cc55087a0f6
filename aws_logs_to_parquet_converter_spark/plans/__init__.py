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
# Round-3 window policy (see COVERAGE.md "Driver-graded evidence" for
# the per-query currency table):
#   1. every query whose emission contract CHANGED this round (the 9
#      r02 hash failures plus every other query converted to the
#      integer-cents money contract) — a regression there must be
#      visible to the hard signal, not just the local gate;
#   2. the three q_diag_* probes that bisect the r02 q_agg_modern
#      hash-fail class empirically;
#   3. oracle-backed round-2 additions that have NEVER carried a
#      driver-graded row;
#   4. the remaining slots rotate through round-1-only families (joins
#      left/semi/anti/range, windows, set ops, pivot, scalar matrices)
#      that have gone a full round without hard evidence.
# Rotated out (all r02-green and UNMODIFIED this round): the dedup/
# similarity/text/log-domain families and r02-green decision support.
# Deferred to the r04 rotation (r01-only evidence, unmodified):
# q_json_extract q_explode_words q_grouping_sets q_union_by_name
# q_correlated_scalar q_bag_set_ops q_values_dim q_window_range_frame.
GRADED_WINDOW = 50

_PRIORITY = [
    # flagship (reference's days_apart_analysis.sql run verbatim)
    "q_days_apart",
    # (1) the 9 r02 hash failures, re-emitted via the integer-cents
    # contract (plans/money.py)
    "q01_pricing_summary",
    "q02_filter_project",
    "q03_shipping_priority",
    "q09_product_profit",
    "q10_returned_items",
    "q11_important_parts",
    "q19_disjunctive",
    "q_group_by_all",
    "q_agg_modern",
    # (1) r02-green queries whose emission ALSO moved to the contract
    "q05_local_supplier_volume",
    "q06_forecast_revenue",
    "q07_nation_volume",
    "q08_market_share",
    "q14_promo_effect",
    "q15_top_supplier",
    "q17_small_qty_revenue",
    "q_unpivot",
    # (1) r01-only queries whose emission moved to the contract
    "q_agg_cube",
    "q_agg_stats",
    "q_window_lag",
    # (2) hash-class bisection probes (single-emission variants of
    # q_agg_modern's r02 failure)
    "q_diag_bool_emit",
    "q_diag_countif_emit",
    "q_diag_maxby_emit",
    # (3) round-2 additions never yet driver-graded
    "q_asof_forward_tolerance",
    "q_pii_scrub",
    "q_stratified_sample",
    "q_pack_sequences",
    "q_chunk_docs",
    "q_vocab_topk",
    "q_contamination",
    # (4) rotation slice: r01-only families
    "q_join_left",
    "q_join_semi",
    "q_join_anti",
    "q_join_range",
    "q_window_rank",
    "q_window_rolling",
    "q_window_ntile",
    "q_topk",
    "q_set_ops",
    "q_cte_composition",
    "q_string_funcs",
    "q_date_funcs",
    "q_math_funcs",
    "q_conditional",
    "q_in_subquery",
    "q_pivot",
    "q_percentiles",
    "q_agg_distinct",
    "q_agg_rollup",
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
