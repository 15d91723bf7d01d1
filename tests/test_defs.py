

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


def test_timetz_normalizes_to_utc_time_of_day(spark):
    """Round-7 VERDICT item #8: TIMETZ3/6/9 convert by VALUE — local
    wall-clock time minus the signed seconds-east offset, wrapped into
    [0, 24h) UTC micros, with the same precision scaling as TIME."""
    from olympia_spark.catalog.defs import timetz_to_utc_micros_expr

    H = 3_600_000_000                    # one hour in micros
    df = spark.createDataFrame(
        [
            # 23:30:00.123 local at +02:00 → 21:30:00.123 UTC
            ((23 * 3600 + 30 * 60) * 1000 + 123, 7200),
            # 01:00 local at +03:00 → 22:00 UTC (wraps below zero)
            (1 * 3600 * 1000, 10800),
            # 23:00 local at -05:00 → 04:00 UTC (wraps past midnight)
            (23 * 3600 * 1000, -18000),
        ],
        "t LONG, off INT")
    rows = df.select(
        timetz_to_utc_micros_expr("t", "TIMETZ3", "off").alias("u")
    ).collect()
    assert rows[0].u == 21 * H + 30 * 60 * 1_000_000 + 123_000
    assert rows[1].u == 22 * H
    assert rows[2].u == 4 * H
    # µs and ns precisions: same normalization, TIME-style scaling
    df2 = spark.createDataFrame(
        [(12 * 3600 * 1_000_000, 12 * 3600 * 1_000_000_000 + 999, 0)],
        "us LONG, ns LONG, off INT")
    r2 = df2.select(
        timetz_to_utc_micros_expr("us", "TIMETZ6", "off").alias("a"),
        timetz_to_utc_micros_expr("ns", "TIMETZ9", "off").alias("b"),
    ).first()
    assert r2.a == 12 * H
    assert r2.b == 12 * H                # ns floor to µs
    import pytest as _pt
    with _pt.raises(ValueError, match="TIMETZ"):
        timetz_to_utc_micros_expr("t", "TIME3", "off")
