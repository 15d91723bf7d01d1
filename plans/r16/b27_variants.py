"""b27_json scaling probe + JSON-extraction variant A/B (VERDICT r15 #7).

Times the declared b27 shape (get_json_object) against from_json and
the Spark 4 VARIANT path over the same parquet, interleaved, noop-sink
methodology at the given sf; also prints the raw scaling of the lane
across sf0.001/sf0.01/sf0.1.

Usage: python plans/r16/b27_variants.py <reps>
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

from pyspark.sql import functions as F  # noqa: E402

from olympia_spark.operators import load_all_modules, registry  # noqa: E402
from olympia_spark.session import get_spark  # noqa: E402
from olympia_spark.tables import load  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    load_all_modules()
    spark = get_spark("b27_variants", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    spark.range(1).count()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    variants = {
        "get_json_object": lambda e: e.groupBy(
            F.get_json_object("props", "$.k").alias("k_val"))
            .agg(F.count("*").alias("n")),
        "from_json": lambda e: e.groupBy(
            F.from_json("props", "k STRING")["k"].alias("k_val"))
            .agg(F.count("*").alias("n")),
        "variant_get": lambda e: e.groupBy(
            F.expr("variant_get(parse_json(props), '$.k', 'string')")
            .alias("k_val")).agg(F.count("*").alias("n")),
    }
    # scaling of the declared lane
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
               "/root/testdata/sf0.1"):
        e = load(spark, sf, "events")
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            noop(variants["get_json_object"](e))
            ts.append(time.perf_counter() - t0)
        print(f"declared @ {sf}: min={min(ts):.3f} "
              f"med={statistics.median(ts):.3f}", flush=True)
    # variant A/B at sf0.1, interleaved
    e = load(spark, "/root/testdata/sf0.1", "events")
    for name, fn in variants.items():
        try:
            noop(fn(e))                  # warm/validate
        except Exception as exc:
            print(f"{name}: UNSUPPORTED ({str(exc)[:80]})", flush=True)
            continue
    t: dict[str, list] = {k: [] for k in variants}
    for _ in range(reps):
        for name, fn in variants.items():
            try:
                t0 = time.perf_counter()
                noop(fn(e))
                t[name].append(time.perf_counter() - t0)
            except Exception:
                pass
    for name, ts in t.items():
        if ts:
            print(f"{name}: min={min(ts):.3f} "
                  f"med={statistics.median(ts):.3f}", flush=True)


if __name__ == "__main__":
    main()
