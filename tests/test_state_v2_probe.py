"""Arbitrary-stateful-streaming v2 availability probe (r8 VERDICT #10).

``transformWithStateInPandas`` (SPARK-49564) is the state-v2 lane the
reference's host Spark exposes; in THIS container it is blocked solely
by the missing ``protobuf`` wheel (the state server serializes handle
metadata through it — see NOTES.md r7). This probe runs every round: the
moment the image gains protobuf, the skip flips into a real end-to-end
test and the documented gap closes. ``applyInPandasWithState`` remains
the shipped custom-state lane either way (operators/streaming.py).
"""

from __future__ import annotations

import pytest


def _state_v2_blocker() -> str | None:
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        return "protobuf not installed — state-v2 lane env-blocked"
    try:
        from pyspark.sql.streaming import StatefulProcessor  # noqa: F401
    except ImportError:
        return "pyspark build lacks StatefulProcessor"
    return None


_BLOCKER = _state_v2_blocker()


def test_state_v2_probe_result_is_explicit():
    """Always-green record of the probe outcome: the skip reason on the
    companion test (or its execution) IS the round's probe result."""
    assert _BLOCKER is None or "protobuf" in _BLOCKER \
        or "StatefulProcessor" in _BLOCKER


@pytest.mark.skipif(_BLOCKER is not None, reason=_BLOCKER or "")
def test_transform_with_state_in_pandas_counter(spark, tmp_path):
    """Minimal state-v2 pipeline: per-key running count over a rate-less
    bounded replay — promote this to a registry streaming entry the
    round it first executes."""
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql import types as T

    class Counter(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._count = handle.getValueState(
                "n", T.StructType([T.StructField("n", T.LongType())]))

        def handleInputRows(self, key, rows, timerValues):
            n = sum(len(pdf) for pdf in rows)
            prev = self._count.get()[0] if self._count.exists() else 0
            self._count.update((prev + n,))
            yield pd.DataFrame({"k": [key[0]], "n": [prev + n]})

        def close(self) -> None:
            pass

    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(
        [("a",), ("a",), ("b",)], "k STRING"
    ).write.mode("overwrite").parquet(str(src))
    stream = (spark.readStream.schema("k STRING").parquet(str(src))
              .groupBy("k")
              .transformWithStateInPandas(
                  Counter(),
                  outputStructType=T.StructType(
                      [T.StructField("k", T.StringType()),
                       T.StructField("n", T.LongType())]),
                  outputMode="Update", timeMode="None"))
    q = (stream.writeStream.format("memory").queryName("sv2probe")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    q.processAllAvailable()
    q.stop()
    got = {(r.k, r.n) for r in spark.sql(
        "SELECT k, n FROM sv2probe").collect()}
    assert got == {("a", 2), ("b", 1)}
