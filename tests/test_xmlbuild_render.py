"""fixed_trim cross-engine float rendering: Spark-side output must be
byte-identical with the DuckDB oracle twin
rtrim(rtrim(printf('%.Nf', x), '0'), '.') INCLUDING decimal-midpoint
ties (ADVICE r3) — dyadic doubles land exactly on a midpoint, where
round-half-even (Python/DuckDB/{fmt}) and Java's HALF_UP-on-shortest-
repr disagree."""

import duckdb
import numpy as np
import pytest

from osm2vdv462_spark.functions import xmlbuild as X


def _duck_render(values, precision):
    con = duckdb.connect()
    s = f"rtrim(rtrim(printf('%.{precision}f', v), '0'), '.')"
    expr = f"CASE WHEN {s} IN ('-0', '') THEN '0' ELSE {s} END"
    out = con.execute(
        f"SELECT {expr} FROM (SELECT unnest(?::DOUBLE[]) AS v)", [list(values)]
    ).fetchall()
    con.close()
    return [r[0] for r in out]


def _spark_render(spark, values, precision):
    df = spark.createDataFrame([(float(v),) for v in values], "v double")
    from pyspark.sql import functions as F

    rows = (
        df.select(X.fixed_trim(F.col("v"), precision).alias("s"))
        .collect()
    )
    return [r["s"] for r in rows]


class TestFixedTrimTies:
    def test_dyadic_midpoints_render_half_even(self, spark):
        # 100.0078125 is exactly representable; at %.6f the 7th digit
        # is an exact 5 -> half-even gives ...812, HALF_UP gives ...813
        ties6 = [100.0078125, 1.0078125, -3.0078125, 2.0234375, 7.0390625]
        got = _spark_render(spark, ties6, 6)
        assert got == [f"{v:.6f}".rstrip("0").rstrip(".") for v in ties6]
        assert got == _duck_render(ties6, 6)
        assert got[0] == "100.007812"  # the advisor's exact case

        ties8 = [12.001953125, -5.001953125, 0.001953125]
        got8 = _spark_render(spark, ties8, 8)
        assert got8 == _duck_render(ties8, 8)
        assert got8[0] == "12.00195312"

    def test_null_and_zero_handling(self, spark):
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(None,), (0.0,), (-0.0,), (-0.0000001,)], "v double"
        )
        rows = df.select(X.fixed_trim(F.col("v"), 6).alias("s")).collect()
        assert [r["s"] for r in rows] == [None, "0", "0", "0"]

    def test_fuzz_vs_duckdb(self, spark):
        rng = np.random.default_rng(42)
        vals = list(rng.uniform(-200, 200, 300))
        # float32-cast values (the Distance path is float4) + dyadics
        vals += [float(np.float32(v)) for v in rng.uniform(0, 1e5, 300)]
        vals += [float(k) / 128.0 for k in range(1, 200, 7)]
        vals += [float(k) / 512.0 for k in range(1, 200, 11)]
        for precision in (6, 8):
            assert _spark_render(spark, vals, precision) == _duck_render(
                vals, precision
            )
