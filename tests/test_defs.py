

def test_temporal_precision_scales_values(spark):
    """SURVEY §1.3 / round-6: TIME3/9 + TIMESTAMP3/9 are converted by
    VALUE (ms ×1000, ns floor-div 1000), not just documented — the same
    truncation Spark applies to parquet TIMESTAMP(NANOS)."""
    import pyspark.sql.functions as F

    from olympia_spark.catalog.defs import temporal_to_micros_expr

    df = spark.createDataFrame(
        [(1_700_000_000_123, 1_700_000_000_123_456,
          1_700_000_000_123_456_789)],
        "ms LONG, us LONG, ns LONG")
    out = df.select(
        temporal_to_micros_expr("ms", "TIMESTAMP3").alias("a"),
        temporal_to_micros_expr("us", "TIMESTAMP6").alias("b"),
        temporal_to_micros_expr("ns", "TIMESTAMP9").alias("c"),
        temporal_to_micros_expr("ms", "TIME3").alias("d"),
        F.timestamp_micros(
            temporal_to_micros_expr("ms", "TIMESTAMPTZ3")).alias("ts"),
    ).first()
    assert out.a == 1_700_000_000_123_000
    assert out.b == 1_700_000_000_123_456
    assert out.c == 1_700_000_000_123_456          # ns truncated to µs
    assert out.d == 1_700_000_000_123_000
    assert out.ts.year == 2023
    # pre-epoch nanos FLOOR (not toward-zero): -1_000_000_001 ns is
    # 1 ns BEFORE -1_000_000 us, so it must convert to -1_000_001 us
    neg = spark.createDataFrame(
        [(-1_000_000_001, -1_000_000_000, -999)],
        "`a ns` LONG, b LONG, c LONG")
    o2 = neg.select(
        temporal_to_micros_expr("a ns", "TIMESTAMP9").alias("a"),
        temporal_to_micros_expr("b", "TIMESTAMP9").alias("b"),
        temporal_to_micros_expr("c", "TIMESTAMP9").alias("c")).first()
    assert o2.a == -1_000_001                      # floor, not -1_000_000
    assert o2.b == -1_000_000                      # exact multiple
    assert o2.c == -1                              # floor(-0.999)
    import pytest as _pt
    with _pt.raises(ValueError, match="temporal"):
        temporal_to_micros_expr("x", "INT8")
