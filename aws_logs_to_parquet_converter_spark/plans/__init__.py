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
# Round-7 window policy (see COVERAGE.md "Driver-graded evidence" for
# the per-query currency table):
#   1. never driver-graded oracle-bearing entries outrank everything
#      (the standing policy): the two r6 late additions the round-6
#      verdict ordered in first (q_gopher_rules, q_bigram_lm) plus the
#      four NEW r7 queries (q_c4_rules — the C4 cleanup battery;
#      q_warc_extract — the WARC ingest chain under the oracle;
#      q_stream_daily_events — the first graded streaming row;
#      q_dedup_minhash_md5 — the LSH pipeline in its md5
#      oracle-parity mode);
#   2. queries whose BEHAVIOR changed this round re-enter the same
#      round: the explicit-whitespace-class migration rewrote every
#      tokenization oracle (round-6 advisor: Java \s includes U+000B,
#      RE2's does not — Spark-side semantics unchanged, oracle-side
#      changed), the Gopher symbol rule now tests '#' and '...'
#      ratios separately, q_approx_percentiles' accuracy was raised
#      to cover sf1 group sizes, and q_k_anonymize gained the 'auto'
#      probe strategy — 22 previously-graded entries total;
#   3. the remaining slots take the r4-stale rotation candidates the
#      round-6 verdict listed, leaving only q_window_ntile and the two
#      diagnostic probes (q_diag_bool_emit, q_diag_maxby_emit) waiting
#      at r4 currency for r8 — no oracle-bearing entry is older
#      than r4.
# Rotated out (green at their latest grade and UNMODIFIED this
# round): the r6-graded TPC-H slice (q01..q22), the r6 additions
# (q_split_assign, q_bitwise_funcs, q_incremental_dedup[_bloom],
# q_data_quality, q_semantic_dedup, q_corpus_diff,
# q_corpus_clean_pipeline, q_stratified_sample, q_chunk_docs,
# q_pii_scrub, q_string_agg, q_window_first_last), and the r5-green
# events/function families.
GRADED_WINDOW = 50

_PRIORITY = [
    # flagship (reference's days_apart_analysis.sql run verbatim)
    "q_days_apart",
    # (1) never driver-graded
    "q_c4_rules",
    "q_gopher_rules",
    "q_bigram_lm",
    "q_warc_extract",
    "q_stream_daily_events",
    "q_dedup_minhash_md5",
    # (2) behavior changed this round (whitespace-class oracle
    # migration; Gopher per-symbol ratios; GK accuracy; k-anon auto)
    "q_token_count",
    "q_quality_filter",
    "q_lang_id",
    "q_text_stats",
    "q_bpe_token_count",
    "q_vocab_topk",
    "q_tfidf_topterms",
    "q_cms_vocab_counts",
    "q_perplexity",
    "q_html_extract",
    "q_quality_score",
    "q_top_bigram",
    "q_pack_sequences",
    "q_contamination",
    "q_boilerplate_lines",
    "q_winnow_fingerprints",
    "q_winnow_pairs",
    "q_dedup_fingerprint",
    "q_ngram_jaccard",
    "q_dedup_keep_list",
    "q_k_anonymize",
    "q_approx_percentiles",
    # (3) the r4-stale rotation candidates (round-6 verdict item 1)
    "q_topk",
    "q_set_ops",
    "q_cte_composition",
    "q_string_funcs",
    "q_date_funcs",
    "q_math_funcs",
    "q_conditional",
    "q_in_subquery",
    "q_pivot",
    "q_unpivot",
    "q_percentiles",
    "q_agg_distinct",
    "q_agg_rollup",
    "q_agg_cube",
    "q_group_by_all",
    "q_join_left",
    "q_join_semi",
    "q_join_anti",
    "q_join_range",
    "q_window_rank",
    "q_window_rolling",
    # (q_window_ntile displaced by the late r7 addition q_c4_rules —
    # never-graded outranks stale-but-green; its family keeps rank and
    # rolling in-window, ntile waits at r4 currency with the two diag
    # probes)
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
