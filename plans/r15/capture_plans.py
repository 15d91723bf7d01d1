"""Capture .explain('formatted') for named registry queries.

Usage: python plans/r15/capture_plans.py <out_suffix> name1 name2 ...
Writes plans/r15/<name>_<out_suffix>.txt relative to the repo this script
lives in (works from the r14 worktree too).
"""
import io
import os
import sys
from contextlib import redirect_stdout

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.abspath(os.path.join(_HERE, "..", ".."))
sys.path.insert(0, _REPO)

from olympia_spark.operators import load_all_modules, registry  # noqa: E402
from olympia_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load_all_modules()
    # localCheckpoint truncates the captured plan to an ExistingRDD scan;
    # neutralize it for CAPTURE ONLY (lazy identity — results unchanged)
    if os.environ.get("CAPTURE_NO_CHECKPOINT", "1") != "0":
        from pyspark.sql import DataFrame as _DF
        _DF.localCheckpoint = lambda self, eager=True: self
        try:   # Spark 4: instances are the classic subclass
            from pyspark.sql.classic.dataframe import DataFrame as _CDF
            _CDF.localCheckpoint = lambda self, eager=True: self
        except ImportError:
            pass
    spark = get_spark("capture_plans", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    for name in names:
        df = registry.QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join("/root/repo/plans/r15",
                            f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
