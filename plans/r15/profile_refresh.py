"""Fine-grained profile of refresh_materialized_view internals.

Usage: python plans/r15/profile_refresh.py <sf_dir> name [name...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

from olympia_spark.operators import load_all_modules, registry  # noqa: E402
from olympia_spark.session import get_spark  # noqa: E402
from olympia_spark import engine as eng_mod  # noqa: E402
from olympia_spark.catalog import catalog as cat_mod  # noqa: E402

CALLS: list[tuple[int, str, str, float]] = []
DEPTH = [0]


def _wrap(cls, meth):
    orig = cls.__dict__[meth]
    is_static = isinstance(orig, staticmethod)
    fn = orig.__func__ if is_static else orig

    def timed(*a, **kw):
        t0 = time.perf_counter()
        DEPTH[0] += 1
        d = DEPTH[0]
        try:
            return fn(*a, **kw)
        finally:
            DEPTH[0] -= 1
            pos = a if is_static else a[1:]
            arg = str(pos[0])[:70].replace("\n", " ") if pos else ""
            CALLS.append((d, meth, arg, time.perf_counter() - t0))
    setattr(cls, meth, staticmethod(timed) if is_static else timed)


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    load_all_modules()
    for m in ("sql", "write_table", "refresh_materialized_view",
              "_write_files", "table_changes", "_mv_plan",
              "_mv_apply_query", "_mv_merge", "_mv_expand_sources",
              "_mv_groupwise_recompute", "read_table", "_resolve_sql",
              "delete_from"):
        if hasattr(eng_mod.Engine, m):
            _wrap(eng_mod.Engine, m)
    for m in ("begin", "describe_table", "at_version", "commit",
              "update_table_files"):
        if hasattr(cat_mod.Catalog, m):
            _wrap(cat_mod.Catalog, m)
    from pyspark.sql.classic.dataframe import DataFrame as _CDF
    from pyspark.sql.readwriter import DataFrameReader as _RD
    from pyspark.sql.session import SparkSession as _SS
    _wrap(_CDF, "count")
    _wrap(_CDF, "collect")
    _wrap(_CDF, "persist")
    _wrap(_RD, "parquet")
    _wrap(_SS, "createDataFrame")
    spark = get_spark("profile", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    spark.range(1).count()
    for name in names:
        fn = registry.QUERIES[name]
        try:
            fn(spark, "/root/testdata/sf0.01").count()   # warmup
        except Exception as exc:
            print(f"# warmup failed: {exc}")
        spark.catalog.clearCache()
        CALLS.clear()
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        total = time.perf_counter() - t0
        print(f"\n=== {name}: {total:.3f}s total rows={n}")
        for d, meth, arg, dt in CALLS:
            if dt >= 0.02:
                print(f"  {'  '*d}{dt:7.3f}s  {meth:26s} {arg}")


if __name__ == "__main__":
    main()
