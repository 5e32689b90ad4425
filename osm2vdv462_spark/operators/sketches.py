"""Distributed sketch aggregations: HyperLogLog distinct counting,
count-min frequency estimation, and fixed-point PageRank.

These are the canonical "can't afford exact" operators of a 100 TB
pipeline: an exact COUNT(DISTINCT) shuffles every distinct key and an
exact frequency table shuffles the whole vocabulary, while a sketch
shuffles a FIXED number of cells (2^p registers / d*w counters)
regardless of input size, and merges associatively (max for HLL
registers, sum for CM counters) — so the partial aggregation Spark
already does map-side IS the sketch merge, and the exchange carries
kilobytes at any scale.

Everything here is deterministic and cross-engine reproducible so the
DuckDB oracles can replicate the computation bit-for-bit:

- the hash is md5-derived (`conv(substr(md5(prefix||item),1,k),16,10)`),
  the same idiom as operators/dedup.py — identical in Spark and DuckDB;
- HLL register math stays in exact integers: the harmonic sum
  sum(2^-reg) is scaled by 2^(W+1) so every term `1 << (W+1-reg)` is an
  exact BIGINT (<= 2^61 total at p=10) and the sum is
  order-independent; only the single final division (and the
  linear-counting ln) is floating point, rounded to 4 dp;
- count-min is pure integers end-to-end;
- PageRank runs in e12 fixed point with truncating integer division
  (`div` / `//`), so three engines' results are bit-identical and the
  iteration is order-independent.

No reference counterpart (the reference's PostGIS schema has no
approximate aggregates); this is the SURVEY §2 "beyond the reference"
LLM/warehouse-pipeline mandate. Estimator follows Flajolet et al. 2007
(HyperLogLog) with the linear-counting small-range correction;
count-min follows Cormode & Muthukrishnan 2005.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# HLL geometry: p=10 -> m=1024 registers, 60-bit md5 hash, W=50 bits of
# rho-space after the bucket bits. Standard error 1.04/sqrt(m) ~= 3.2%.
HLL_P = 10
HLL_M = 1 << HLL_P
_W = 60 - HLL_P  # bits available for the leading-zero count
_POW2_W1 = 1 << (_W + 1)  # 2^51: scale that makes every 2^-reg term integral
# alpha_m * m^2 * 2^(W+1) for m=1024 — embedded as the same decimal
# literal in the SQL oracles so both engines parse the identical double.
HLL_NUMERATOR = 0.7213 / (1 + 1.079 / HLL_M) * HLL_M * HLL_M * _POW2_W1
_LC_THRESHOLD = 2.5 * HLL_M


def hll_rho(df: DataFrame, item: str | F.Column) -> DataFrame:
    """Append the (bucket, rho) pair for one item observation.

    bucket = low p bits of the 60-bit md5 hash; rho = position of the
    first set bit of the remaining W bits (1-based; rho = W+1 when they
    are all zero), computed with integer/string ops only (`bin()` is
    minimal-length in both Spark and DuckDB) — no float log2, whose
    boundary rounding could disagree across engines.
    """
    item_col = F.col(item) if isinstance(item, str) else item
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("hll:"), item_col).cast("binary")), 1, 15),
        16,
        10,
    ).cast("long")
    df = df.withColumn("_hll_h", h)
    df = df.withColumn("hll_bucket", F.expr(f"_hll_h % {HLL_M}"))
    w = F.expr(f"_hll_h div {HLL_M}")
    df = df.withColumn("_hll_w", w)
    rho = F.when(F.col("_hll_w") == 0, F.lit(_W + 1)).otherwise(
        F.lit(_W + 1) - F.length(F.expr("bin(_hll_w)"))
    )
    return df.withColumn("hll_rho", rho.cast("int")).drop("_hll_h", "_hll_w")


def hll_registers(df: DataFrame, group_cols: list[str], item: str | F.Column) -> DataFrame:
    """Per-group HLL register table: (group..., hll_bucket, hll_reg).

    This IS the sketch: at most m=1024 rows per group, built with one
    scan and a partial max (map-side combine collapses each input
    partition to <= m rows per group before the exchange — the whole
    reason sketches beat exact distinct at 10^12 rows). Registers from
    disjoint slices merge by MAX(hll_reg); see hll_merge.
    """
    return (
        hll_rho(df, item)
        .groupBy(*group_cols, "hll_bucket")
        .agg(F.max("hll_rho").alias("hll_reg"))
    )


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Merge register tables from disjoint (or overlapping) input
    slices: union + max. Associative and idempotent — the property that
    lets per-partition / per-day sketches roll up without rescanning."""
    out = register_tables[0]
    for t in register_tables[1:]:
        out = out.unionByName(t)
    keys = [c for c in out.columns if c != "hll_reg"]
    return out.groupBy(*keys).agg(F.max("hll_reg").alias("hll_reg"))


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Registers -> (group..., hll_estimate DOUBLE rounded 4dp).

    Exact-integer harmonic sum (see module docstring), one double
    division, linear-counting correction when the raw estimate is
    <= 2.5m and empty registers remain (Flajolet et al. §4).
    """
    agg = registers.groupBy(*group_cols).agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({_W + 1} - hll_reg AS INT))")).alias(
            "_s_present"
        ),
        F.count(F.lit(1)).alias("_nb"),
    )
    v = F.lit(HLL_M) - F.col("_nb")
    s = F.col("_s_present") + v * F.lit(_POW2_W1)
    e_raw = F.lit(HLL_NUMERATOR) / s.cast("double")
    est = F.when(
        (v > 0) & (e_raw <= F.lit(_LC_THRESHOLD)),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v.cast("double")),
    ).otherwise(e_raw)
    return agg.select(*group_cols, F.round(est, 4).alias("hll_estimate"))


def cm_sketch(
    df: DataFrame, item: str | F.Column, d: int = 4, w: int = 512, prefix: str = "cm"
) -> DataFrame:
    """Count-min sketch: (cm_row, cm_bucket, cm_cnt), d*w cells total.

    One scan of the items, a d-way posexplode of the per-row hash
    array, and a partial-sum groupBy whose output is a FIXED d*w rows —
    at 10^12 tokens the exchange still carries d*w cells per map task,
    not the vocabulary. Point estimate for any item is
    min_i(cell[i][h_i(item)]), an upper bound on its true count."""
    item_col = F.col(item) if isinstance(item, str) else item
    hashes = F.array(
        *[
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{prefix}{i}:"), item_col).cast("binary")),
                    1,
                    7,
                ),
                16,
                10,
            ).cast("long")
            % w
            for i in range(d)
        ]
    )
    return (
        df.select(F.posexplode(hashes).alias("cm_row", "cm_bucket"))
        .groupBy("cm_row", "cm_bucket")
        .agg(F.count(F.lit(1)).alias("cm_cnt"))
    )


def cm_lookup(
    sketch: DataFrame,
    probes: DataFrame,
    item: str,
    d: int = 4,
    w: int = 512,
    prefix: str = "cm",
) -> DataFrame:
    """Estimate counts for a probe table: min over the d cells each
    probe hashes to. The sketch (d*w rows) is broadcast — the probe
    side never shuffles."""
    item_col = F.col(item)
    hashes = F.array(
        *[
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{prefix}{i}:"), item_col).cast("binary")),
                    1,
                    7,
                ),
                16,
                10,
            ).cast("long")
            % w
            for i in range(d)
        ]
    )
    keep = [c for c in probes.columns]
    ph = probes.select(*keep, F.posexplode(hashes).alias("cm_row", "cm_bucket"))
    joined = ph.join(F.broadcast(sketch), ["cm_row", "cm_bucket"])
    return joined.groupBy(*keep).agg(F.min("cm_cnt").alias("cm_est"))


# HDR-histogram quantile sketch: buckets are (exponent, top-5 mantissa
# bits) of the integer value — pure integer ops (the same bin()-length
# idiom as hll_rho), relative error <= 2^-5 ~= 3.1%, state <= 32 *
# bit-width buckets per group, merged by SUM. This is the
# HdrHistogram / DDSketch (Masson et al. 2019) pattern: the mergeable
# quantile sketch that replaces an exact per-group sort at 10^12 rows
# (percentile_quartiles' docstring defers exactly this trade-off here).
_HDR_BID = (
    "CASE WHEN {v} < 32 THEN {v} "
    "ELSE CAST(length(bin({v})) AS BIGINT) * 32 + "
    "(shiftright({v}, CAST(length(bin({v})) - 6 AS INT)) & CAST(31 AS BIGINT)) END"
)
_HDR_LB = (
    "CASE WHEN {v} < 32 THEN {v} "
    "ELSE shiftleft(32 + (shiftright({v}, CAST(length(bin({v})) - 6 AS INT)) "
    "& CAST(31 AS BIGINT)), CAST(length(bin({v})) - 6 AS INT)) END"
)


def hdr_histogram(df: DataFrame, group_cols: list[str], value_col: str) -> DataFrame:
    """Per-group HDR histogram: (group..., hdr_bid, hdr_lb, hdr_cnt).

    hdr_bid orders buckets by value; hdr_lb is the bucket's lower bound
    (<= every value in it, > the previous bucket's values). Values < 32
    are exact singleton buckets. Non-negative integers only. Like the
    HLL registers, the partial sum collapses each map task to the
    bucket count before the exchange — the shuffle carries O(hundreds)
    of cells per group at any input size."""
    bid = F.expr(_HDR_BID.format(v=value_col))
    lb = F.expr(_HDR_LB.format(v=value_col))
    return (
        df.select(*group_cols, bid.alias("hdr_bid"), lb.alias("hdr_lb"))
        .groupBy(*group_cols, "hdr_bid", "hdr_lb")
        .agg(F.count(F.lit(1)).alias("hdr_cnt"))
    )


def hdr_quantiles(
    hist: DataFrame, group_cols: list[str], qs: list[float]
) -> DataFrame:
    """Histogram -> per-group quantile estimates: for each q, the lower
    bound of the bucket holding the ceil(q*n)-th value (1-based). The
    true q-quantile lies in [estimate, estimate*(1+2^-5)), so the
    relative error is < 3.2% by construction. Integer output — the
    only float is the q*n rank arithmetic, identical IEEE in both
    engines."""
    from pyspark.sql import Window

    wcum = (
        Window.partitionBy(*group_cols)
        .orderBy("hdr_bid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy(*group_cols)
    h = hist.withColumn("_cum", F.sum("hdr_cnt").over(wcum)).withColumn(
        "_n", F.sum("hdr_cnt").over(wall)
    )
    aggs = [F.max("_n").alias("n")]
    for q in qs:
        tag = f"p{round(q * 100):02d}_est"
        rank = F.expr(f"CAST(ceil({q!r} * _n) AS BIGINT)")
        aggs.append(F.min(F.when(F.col("_cum") >= rank, F.col("hdr_lb"))).alias(tag))
    return h.groupBy(*group_cols).agg(*aggs)


# PageRank fixed point: ranks carried as rank * 1e12 BIGINTs, damping
# 0.85 applied as (85 * x) div 100, contributions as rank div outdeg —
# truncating integer division in both engines, so iteration results are
# bit-identical and independent of aggregation order. Dangling nodes
# leak rank mass (the original Page et al. 1998 formulation, documented
# semantics — not the stochastic-matrix variant).
PR_ONE_E12 = 10**12
PR_BASE_E12 = 150_000_000_000  # 0.15 in e12 fixed point


def pagerank_e12(edges: DataFrame, iters: int = 3) -> DataFrame:
    """Fixed-iteration PageRank over (src, dst) edges -> (node, rank_e12).

    Each iteration is one join (edges x ranks on src) + one aggregate
    (sum by dst) + one left join back to the node set: the standard
    message-passing shape. At cluster scale you'd hash-partition edges
    by src ONCE and reuse that partitioning every iteration (only the
    rank table re-shuffles, carrying 16 bytes/node), and localCheckpoint
    every few iterations to cut lineage — the same discipline as
    operators/cluster.py's label propagation. Integer e12 fixed point
    keeps it deterministic (see constants above)."""
    edges = edges.filter(F.col("src") != F.col("dst")).distinct()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ej = edges.join(deg, "src")
    ranks = nodes.select("node", F.lit(PR_ONE_E12).alias("rank_e12"))
    for _ in range(iters):
        contrib = (
            ej.join(ranks.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_e12 div outdeg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(PR_BASE_E12)
                + F.expr("(85 * coalesce(s, CAST(0 AS BIGINT))) div 100")
            ).alias("rank_e12"),
        )
    return ranks
