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
# no query's newest driver entry is ever >1 round old. Round-4 list: (1) new
# or changed this round, (2) the 11 queries whose latest green is round 1,
# (3) the 48 whose latest green is round 2, cheapest first (the ~10 that
# spill past the 50-slot budget lead round 5's list), (4) the round-3 rest.
_PRIORITY = [
    # new/changed this round
    "b32_stream_catalog_ingest",
    "b48_exists_subquery", "b49_stats_agg", "b50_carry_forward",
    "b51_median_mode", "b52_array_setops", "text_repetition",
    "data_mixture_sample", "data_dedup_keep_best", "sim_knn_graph",
    "b53_external_sources", "b32_stream_watermark_append",
    "b54_approx_quantile_check", "b55_bucketed_join", "b56_interval_join",
    "data_pack_sequences", "graph_pagerank", "b57_window_count_distinct",
    "b58_table_changes", "b59_qualify", "b60_select_exclude",
    "data_class_balance", "b61_recursive_cte", "b62_scd2_build",
    "b63_txn_multi_table", "b63b_txn_rollback",
    "dedup_threshold_sweep", "text_length_histogram", "sim_recall_audit",
    # latest green = round 1
    "b14b_row_number_ntile", "b25_array_fns", "b26_struct_map", "b27_json",
    "text_quality_score", "sim_topk_bruteforce", "sim_batch_topk",
    "sim_ann_lsh", "sim_ivf", "dedup_embedding_cosine",
    "dedup_ngram_jaccard",
    # latest green = round 2 — cheap scans/joins/aggs/scalars first
    "b01_scan_count", "b02_projection", "b03_filter", "b04_join_inner",
    "b05_star_join", "b06_outer_join", "b06b_full_outer_join",
    "b07_semi_join", "b07b_anti_join", "b08_range_join", "b09_cross_join",
    "b10_q1_agg", "b11_count_distinct", "b11b_distinct_rows",
    "b12_approx_count_distinct", "b13_rollup", "b13b_cube",
    "b14_rank_window", "b24_conditional", "b25b_explode_collect",
    "b27b_from_json", "b34_asof_join", "b35_time_rollup",
    "text_token_count", "text_langid", "text_redact", "text_fingerprint",
    "text_rolling_hash", "text_url_extract", "data_profile",
    "data_profile_quantiles", "data_sample_per_key", "data_split_stratified",
    "dedup_exact", "sim_quantize_int8", "mm_metadata_scan",
    "mm_frame_sample", "mm_feature_extract", "udf_pandas_tiered",
    "udf_grouped_custstats", "udf_mapinpandas_tokens",
    # latest green = round 2 — heavier DML / streaming
    "b28_insert_append", "b29_delete_where", "b30_update_set",
    "b32_stream_tumbling_window", "b32_stream_sliding_window",
    "b32_stream_session_window",
]


def _ordered(names) -> list[str]:
    rank = {n: i for i, n in enumerate(_PRIORITY)}
    return sorted(names, key=lambda n: (rank.get(n, len(_PRIORITY)),))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: registry.QUERIES[n] for n in _ordered(registry.QUERIES)}


def oracle_sql() -> dict[str, str]:
    return {n: registry.ORACLE_SQL[n]
            for n in _ordered(registry.QUERIES) if n in registry.ORACLE_SQL}
