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
# no query's newest driver entry ages past the stale horizon (standing
# invariant: ≤6 rounds). Round-14 list (VERDICT r13 "Next round" #4,
# verbatim contract): (1) ALL 42 r8-age queries lead the window — after
# this round no registry query's newest driver-green predates r9
# (computed from CORRECTNESS_r01–r13: exactly these 42 have newest
# green = r8); (2) the NEW r14 entries — the MV broadcast-dim JOIN lane
# (b151e), the MV retraction lane (b151f), and the round's TPC-DS
# shapes. 42 + 12 = 54: if the window cuts at ~50, the trailing bonus
# entries slip to the r15 window — same precedent as the r11 bonus
# shapes, first driver-checked in r12; the in-suite sf0.001 parity
# sweep still covers them this round.
_PRIORITY = [
    # (1) the 42 r8-age queries (VERDICT r13 Next-round #4)
    "b01_scan_count", "b02_projection", "b03_filter", "b04_join_inner",
    "b06_outer_join", "b06b_full_outer_join", "b07_semi_join",
    "b07b_anti_join", "b08_range_join", "b14b_row_number_ntile",
    "b25_array_fns", "b26_struct_map", "b27_json", "b29_delete_where",
    "b30_update_set", "b32_stream_dedup", "b32_stream_join",
    "b32_stream_merge_cdc", "b32_stream_stateful_counter",
    "b48_exists_subquery", "b49_stats_agg", "b68_clone_restore",
    "b69_zorder_cluster", "b88_q12_shape", "b89_q16_shape",
    "b90_q19_shape", "data_ppl_buckets", "data_salt_plan",
    "dedup_edit_distance", "dedup_incremental", "dedup_incremental_catalog",
    "dedup_minhash_lsh", "dedup_simhash", "sim_centroid",
    "text_boilerplate", "text_chunk_tokens", "text_contamination",
    "text_contamination_bloom", "text_ngram_logprob", "text_pii_stats",
    "text_tfidf_topterms", "text_vocab_topk",
    # (2) NEW this round (never driver-checked)
    "b151e_mv_join_refresh", "b151f_mv_retraction_refresh",
    "b161_q77_channel_pnl", "b162_q2_week_share",
    "b163_q25_three_lens", "b164_q24_dedup_mean_gate",
    "b165_q10_prospect_profile", "b166_q69_state_gated_demographics",
    "b167_q41_dim_only_gate", "b168_q18_avg_rollup",
    "b169_q71_hour_band_report", "b151g_mv_left_join_refresh",
    "b151h_mv_cascade_refresh",
]


def _ordered(names) -> list[str]:
    rank = {n: i for i, n in enumerate(_PRIORITY)}
    return sorted(names, key=lambda n: (rank.get(n, len(_PRIORITY)),))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: registry.QUERIES[n] for n in _ordered(registry.QUERIES)}


def oracle_sql() -> dict[str, str]:
    return {n: registry.ORACLE_SQL[n]
            for n in _ordered(registry.QUERIES) if n in registry.ORACLE_SQL}
