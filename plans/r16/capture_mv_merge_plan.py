"""Capture the physical plan of the MV incremental-refresh MERGE frame.

Wraps Engine._write_files to explain() the merged DataFrame the refresh
is about to write, runs b151_materialized_view at sf0.01, and prints the
captured plan. Run under the old and new _mv_merge to produce the
committed before/after artifacts (mv_merge_{before,after}.txt).
"""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

from olympia_spark.operators import load_all_modules, registry  # noqa: E402
from olympia_spark.session import get_spark  # noqa: E402
from olympia_spark import engine as eng_mod  # noqa: E402

PLANS = []
_orig = eng_mod.Engine._write_files


def spy(self, df, ns, tbl, *a, **kw):
    if tbl.startswith("mv_"):
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        PLANS.append((f"{ns}.{tbl}", buf.getvalue()))
    return _orig(self, df, ns, tbl, *a, **kw)


def main() -> None:
    eng_mod.Engine._write_files = spy
    load_all_modules()
    spark = get_spark("capture_merge", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    spark.range(1).count()
    registry.QUERIES["b151_materialized_view"](spark,
                                               "/root/testdata/sf0.01").count()
    # the LAST mv_ write is the refresh's merged frame (the first is the
    # CREATE's full materialization)
    name, plan = PLANS[-1]
    print(f"== merged frame written to {name} (refresh) ==")
    print(plan)


if __name__ == "__main__":
    main()
