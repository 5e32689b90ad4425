"""Sketch-aggregation queries: HLL distinct counting, count-min heavy
hitters, fixed-point PageRank (operators/sketches.py).

The 100 TB rationale lives in the operator module; these queries pin
the cross-engine determinism contract: every hash is md5-derived, HLL
register math is exact-integer until one final division, count-min and
PageRank are integers end-to-end — so the DuckDB oracles replicate the
full computation (not just the answer) and the value-hash gate verifies
the sketch algebra itself.

`hll_distinct_combos` is a MAIN gate row (late-r4 rotation, fourth
swap); the rest are extra-tier, held to the same oracles by
tests/test_oracle_parity.py and candidates for the round-5 rotation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..operators import sketches as sk
from . import register, register_extra


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


@register(
    "hll_distinct_combos",
    f"""
    WITH base AS (
      SELECT event_type, user_id || ':' || props AS item FROM events
    ),
    h AS (
      SELECT event_type, item,
             ('0x' || substr(md5('hll:' || item), 1, 15))::BIGINT AS h60
      FROM base
    ),
    r AS (
      SELECT event_type, h60 % 1024 AS b,
             CASE WHEN h60 // 1024 = 0 THEN 51
                  ELSE 51 - length(bin(h60 // 1024)) END AS rho
      FROM h
    ),
    regs AS (
      SELECT coalesce(event_type, 'ALL') AS grp, b, max(rho) AS reg
      FROM r GROUP BY GROUPING SETS ((event_type, b), (b))
    ),
    agg AS (
      SELECT grp,
             sum(1::BIGINT << CAST(51 - reg AS INT)) AS s_present,
             count(*) AS nb
      FROM regs GROUP BY 1
    ),
    est AS (
      SELECT grp,
             {sk.HLL_NUMERATOR!r} /
               CAST(s_present + (1024 - nb) * 2251799813685248 AS DOUBLE)
               AS e_raw,
             1024 - nb AS v
      FROM agg
    ),
    ex AS (
      SELECT coalesce(event_type, 'ALL') AS grp,
             count(DISTINCT item) AS exact_distinct
      FROM base GROUP BY GROUPING SETS ((event_type), ())
    )
    SELECT est.grp AS grp,
           CAST(round(CASE WHEN v > 0 AND e_raw <= 2560.0
                           THEN 1024.0 * ln(1024.0 / v)
                           ELSE e_raw END, 4) AS DOUBLE) AS hll_estimate,
           ex.exact_distinct AS exact_distinct
    FROM est JOIN ex USING (grp)
    ORDER BY grp
    """,
)
def hll_distinct_combos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct (user, context) combinations per event_type
    plus a global 'ALL' row, via one GROUPING SETS pass over the HLL
    rho stream — per-type rows land in the linear-counting regime and
    the global row in the raw-estimator regime, so both correction
    branches are oracle-gated. The exact count column is for
    demonstration only (at 10^12 rows you would NOT compute it — that
    exact distinct is precisely what the sketch replaces)."""
    base = _t(spark, sf_dir, "events").select(
        "event_type",
        F.concat(F.col("user_id").cast("string"), F.lit(":"), F.col("props")).alias(
            "item"
        ),
    )
    rho = sk.hll_rho(base, "item").select("event_type", "hll_bucket", "hll_rho")
    regs = (
        rho.groupingSets(
            [["event_type", "hll_bucket"], ["hll_bucket"]],
            "event_type",
            "hll_bucket",
        )
        .agg(F.max("hll_rho").alias("hll_reg"))
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("grp"),
            "hll_bucket",
            "hll_reg",
        )
    )
    est = sk.hll_estimate(regs, ["grp"])
    exact = (
        base.groupingSets([["event_type"], []], "event_type")
        .agg(F.countDistinct("item").alias("exact_distinct"))
        .select(F.coalesce("event_type", F.lit("ALL")).alias("grp"), "exact_distinct")
    )
    return est.join(F.broadcast(exact), "grp").orderBy("grp")


@register_extra(
    "cmsketch_heavy_hitters",
    """
    WITH toks AS (
      SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
      FROM documents
    ),
    ids AS (SELECT unnest([0, 1, 2, 3]) AS i),
    h AS (
      SELECT token, i,
             ('0x' || substr(md5('cm' || CAST(i AS VARCHAR) || ':' || token),
                             1, 7))::BIGINT % 64 AS b
      FROM toks CROSS JOIN ids
    ),
    sk AS (SELECT i, b, count(*) AS c FROM h GROUP BY 1, 2),
    exact AS (SELECT token, count(*) AS exact_cnt FROM toks GROUP BY 1),
    probes AS (
      SELECT token, exact_cnt FROM exact
      ORDER BY exact_cnt DESC, token LIMIT 12
    ),
    ph AS (
      SELECT p.token, p.exact_cnt, ids.i,
             ('0x' || substr(md5('cm' || CAST(ids.i AS VARCHAR) || ':' || p.token),
                             1, 7))::BIGINT % 64 AS b
      FROM probes p CROSS JOIN ids
    )
    SELECT ph.token AS token, ph.exact_cnt AS exact_cnt,
           min(sk.c) AS cm_est
    FROM ph JOIN sk ON sk.i = ph.i AND sk.b = ph.b
    GROUP BY 1, 2
    ORDER BY exact_cnt DESC, token
    """,
)
def cmsketch_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min (d=4, w=64) frequency estimates for the corpus's
    top-12 exact tokens. w=64 is deliberately under-sized for the demo
    so bucket collisions actually inflate some estimates and the
    min-over-d-rows algebra is exercised (cm_est >= exact_cnt always —
    pytest-gated); in production w = ceil(e/eps) for target error eps.
    The exact side (vocabulary-sized state) exists only to pick probes
    and show the error; the sketch side shuffles d*w = 256 cells total
    regardless of corpus size."""
    toks = _t(spark, sf_dir, "documents").select(
        F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("token")
    )
    sketch = sk.cm_sketch(toks, "token", d=4, w=64)
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("exact_cnt"))
    probes = exact.orderBy(F.desc("exact_cnt"), "token").limit(12)
    return sk.cm_lookup(sketch, probes, "token", d=4, w=64).orderBy(
        F.desc("exact_cnt"), "token"
    )


@register_extra(
    "hdr_quantile_sketch",
    """
    WITH c AS (
      SELECT o_orderpriority AS priority,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    b AS (
      SELECT priority,
             CASE WHEN cents < 32 THEN cents
                  ELSE CAST(length(bin(cents)) AS BIGINT) * 32 +
                       ((cents >> (length(bin(cents)) - 6)) & 31) END AS bid,
             CASE WHEN cents < 32 THEN cents
                  ELSE (32 + ((cents >> (length(bin(cents)) - 6)) & 31))
                       << (length(bin(cents)) - 6) END AS lb
      FROM c
    ),
    h AS (
      SELECT priority, bid, lb, count(*) AS cnt
      FROM b GROUP BY 1, 2, 3
    ),
    w AS (
      SELECT priority, lb, cnt,
             sum(cnt) OVER (PARTITION BY priority ORDER BY bid
                            ROWS UNBOUNDED PRECEDING) AS cum,
             sum(cnt) OVER (PARTITION BY priority) AS n
      FROM h
    ),
    est AS (
      SELECT priority,
             CAST(max(n) AS BIGINT) AS n,
             CAST(min(CASE WHEN cum >= ceil(0.5 * n) THEN lb END) AS BIGINT)
               AS p50_est,
             CAST(min(CASE WHEN cum >= ceil(0.95 * n) THEN lb END) AS BIGINT)
               AS p95_est,
             CAST(min(CASE WHEN cum >= ceil(0.99 * n) THEN lb END) AS BIGINT)
               AS p99_est
      FROM w GROUP BY 1
    ),
    ex AS (
      SELECT o_orderpriority AS priority,
             CAST(quantile_cont(CAST(floor(o_totalprice * 100) AS BIGINT),
                                0.5) AS DOUBLE) AS exact_p50
      FROM orders GROUP BY 1
    )
    SELECT est.priority AS priority, est.n, est.p50_est, est.p95_est,
           est.p99_est, ex.exact_p50
    FROM est JOIN ex USING (priority)
    ORDER BY priority
    """,
)
def hdr_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p50/p95/p99 of order value (integer cents) per
    priority via the mergeable HDR histogram — the sketch that replaces
    exact per-group quantile sorts at 10^12 rows (state: <= ~700 integer
    buckets per group, merged by sum; relative error < 2^-5). The
    exact_p50 column (a real per-group sort) is demonstration-only, to
    show the error; q in {.5} interpolates at binary-exact midpoints so
    Spark percentile == DuckDB quantile_cont byte-for-byte."""
    o = _t(spark, sf_dir, "orders")
    cents = o.select(
        F.col("o_orderpriority").alias("priority"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    hist = sk.hdr_histogram(cents, ["priority"], "cents")
    est = sk.hdr_quantiles(hist, ["priority"], [0.5, 0.95, 0.99])
    exact = cents.groupBy("priority").agg(
        F.expr("percentile(cents, 0.5)").cast("double").alias("exact_p50")
    )
    return est.join(F.broadcast(exact), "priority").orderBy("priority")


@register_extra(
    "streaming_hll_windows",
    f"""
    WITH base AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS w,
             user_id || ':' || props AS item
      FROM events
    ),
    h AS (
      SELECT w, ('0x' || substr(md5('hll:' || item), 1, 15))::BIGINT AS h60
      FROM base
    ),
    r AS (
      SELECT w, h60 % 1024 AS b,
             CASE WHEN h60 // 1024 = 0 THEN 51
                  ELSE 51 - length(bin(h60 // 1024)) END AS rho
      FROM h
    ),
    regs AS (SELECT w, b, max(rho) AS reg FROM r GROUP BY 1, 2),
    agg AS (
      SELECT w,
             sum(1::BIGINT << CAST(51 - reg AS INT)) AS s_present,
             count(*) AS nb
      FROM regs GROUP BY 1
    ),
    est AS (
      SELECT w,
             {sk.HLL_NUMERATOR!r} /
               CAST(s_present + (1024 - nb) * 2251799813685248 AS DOUBLE)
               AS e_raw,
             1024 - nb AS v
      FROM agg
    )
    SELECT CAST(epoch(w) AS BIGINT) AS window_start_epoch,
           CAST(round(CASE WHEN v > 0 AND e_raw <= 2560.0
                           THEN 1024.0 * ln(1024.0 / v)
                           ELSE e_raw END, 4) AS DOUBLE) AS hll_estimate
    FROM est ORDER BY 1
    """,
)
def streaming_hll_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-Streaming HLL: approximate distinct (user, context)
    combinations per tumbling event-time hour, drained hermetically
    with Trigger.AvailableNow (streaming/sketches.py). State is bounded
    at m=1024 registers per open window — the property exact streaming
    distinct (streaming_dedup_docs) fundamentally lacks. The oracle is
    the exact batch twin of the full register algebra, so the gate
    proves stream==batch==sketch convergence in one hash."""
    import os
    import tempfile

    from ..streaming import sketches as ssk

    work = tempfile.mkdtemp(prefix="stream_hll_")
    src = os.path.join(work, "src")
    os.makedirs(src)
    os.symlink(f"{sf_dir}/events.parquet", os.path.join(src, "part-0.parquet"))
    out = os.path.join(work, "out")
    ssk.run_available_now(
        spark,
        src,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
        out,
        os.path.join(work, "ckpt"),
    )
    return ssk.estimate_windows(spark.read.parquet(out)).orderBy(
        "window_start_epoch"
    )


def _pr_iter_sql(prev: str, out: str) -> str:
    return f"""
    {out} AS (
      SELECT n.node,
             CAST(150000000000 +
                  (85 * coalesce(sum(r.rank_e12 // d.outdeg), 0)) // 100
                  AS BIGINT) AS rank_e12
      FROM nodes n
      LEFT JOIN e ON e.dst = n.node
      LEFT JOIN deg d ON d.src = e.src
      LEFT JOIN {prev} r ON r.node = e.src
      GROUP BY n.node
    )"""


@register_extra(
    "pagerank_userweb",
    """
    WITH e0 AS (
      SELECT DISTINCT user_id % 200 AS src,
             ('0x' || substr(md5('pr:' || CAST(event_id AS VARCHAR)),
                             1, 7))::BIGINT % 200 AS dst
      FROM events
    ),
    e AS (SELECT src, dst FROM e0 WHERE src <> dst),
    nodes AS (SELECT DISTINCT src AS node FROM e
              UNION SELECT DISTINCT dst FROM e),
    deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
    r0 AS (SELECT node, CAST(1000000000000 AS BIGINT) AS rank_e12 FROM nodes),
    """
    + ",".join(_pr_iter_sql(p, o) for p, o in [("r0", "i1"), ("i1", "i2"), ("i2", "i3")])
    + """
    SELECT node, rank_e12 FROM i3 ORDER BY node
    """,
)
def pagerank_userweb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration PageRank over a deterministic interaction graph
    synthesized from the event log (src = user bucket, dst = md5-derived
    target bucket — the hash makes the graph reproducible in both
    engines with no external data, per the brief). e12 fixed point +
    truncating division keep every iteration bit-identical across
    engines and aggregation orders; the DuckDB oracle unrolls the same
    three iterations as CTEs."""
    ev = _t(spark, sf_dir, "events")
    edges = ev.select(
        F.pmod(F.col("user_id"), F.lit(200)).alias("src"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("pr:"), F.col("event_id").cast("string")
                        ).cast("binary")
                    ),
                    1,
                    7,
                ),
                16,
                10,
            ).cast("long")
            % 200
        ).alias("dst"),
    )
    return sk.pagerank_e12(edges, iters=3).orderBy("node")


# ------------------------------------------------------------ KMV

_KMV_K = 64
_KMV_SCALE = 281474976710656  # 2^48: hash domain of the 12-hex prefix


@register_extra(
    "kmv_distinct_users",
    f"""
    WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
    ex AS (SELECT event_type,
                  CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
           FROM d GROUP BY 1),
    h AS (
      SELECT DISTINCT event_type,
             ('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)),
                             1, 12))::BIGINT AS h48
      FROM d
    ),
    r AS (
      SELECT event_type, h48,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY h48) AS rn
      FROM h
    ),
    s AS (
      SELECT event_type,
             CAST(max(rn) AS BIGINT) AS n_h,
             max(CASE WHEN rn = {_KMV_K} THEN h48 END) AS kth
      FROM r GROUP BY 1
    )
    SELECT ex.event_type, ex.n_exact,
           CASE WHEN s.n_h < {_KMV_K} THEN ex.n_exact
                ELSE ({_KMV_K} - 1) * {_KMV_SCALE} // s.kth END AS kmv_est
    FROM ex JOIN s USING (event_type)
    ORDER BY event_type
    """,
)
def kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (bottom-k / k-minimum-values) distinct-count sketch per
    event_type: hash each distinct user to 48 bits, keep the k = 64
    smallest DISTINCT hash values, estimate D ~ (k-1) * 2^48 / h_(k)
    (Bar-Yossef et al.; the mergeable bottom-k sketch behind Theta
    sketches). Integer end-to-end — hash, order statistic, and the one
    truncating division — so the estimate hash-gates exactly; groups
    smaller than k fall back to the exact count, as the sketch
    semantics dictate. Scale: the sketch state is k fixed-width values
    per group (union-mergeable by keeping the k smallest of the merged
    sets), vs HLL trading accuracy profile for registers; the Spark
    plan is one distinct + one top-k window, no payload shuffle."""
    ev = _t(spark, sf_dir, "events")
    d = ev.select("event_type", "user_id").distinct()
    ex = d.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact")
    )
    h = d.select(
        "event_type",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("kmv:"), F.col("user_id").cast("string")
                    ).cast("binary")
                ),
                1,
                12,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("h48"),
    ).distinct()
    win = Window.partitionBy("event_type").orderBy("h48")
    s = (
        h.withColumn("rn", F.row_number().over(win))
        .groupBy("event_type")
        .agg(
            F.max("rn").cast("long").alias("n_h"),
            F.max(F.when(F.col("rn") == _KMV_K, F.col("h48"))).alias("kth"),
        )
    )
    return (
        ex.join(s, "event_type")
        .select(
            "event_type",
            "n_exact",
            F.when(F.col("n_h") < _KMV_K, F.col("n_exact"))
            .otherwise(
                F.expr(f"(({_KMV_K} - 1) * {_KMV_SCALE}L) div kth")
            )
            .alias("kmv_est"),
        )
        .orderBy("event_type")
    )


# ------------------------------------------------------- AMS / AGMS

_AMS_J = 9  # independent +/-1 sketches; estimate = median (rank 5)


@register_extra(
    "ams_join_size",
    f"""
    WITH cnt AS (
      SELECT event_type AS t, user_id AS u, count(*) AS c
      FROM events GROUP BY 1, 2
    ),
    exact AS (
      SELECT a.t AS ta, b.t AS tb,
             CAST(sum(a.c * b.c) AS BIGINT) AS exact_join
      FROM cnt a JOIN cnt b ON a.u = b.u AND a.t < b.t
      GROUP BY 1, 2
    ),
    z AS (
      SELECT cnt.t, j.range AS j,
             CAST(sum(cnt.c * (CASE WHEN
               ('0x' || substr(md5('ams' || j.range || ':'
                                   || CAST(cnt.u AS VARCHAR)), 1, 1)
               )::INT % 2 = 0 THEN 1 ELSE -1 END)) AS BIGINT) AS z
      FROM cnt CROSS JOIN range({_AMS_J}) j
      GROUP BY 1, 2
    ),
    prod AS (
      SELECT a.t AS ta, b.t AS tb, a.z * b.z AS p,
             row_number() OVER (PARTITION BY a.t, b.t
                                ORDER BY a.z * b.z, a.j) AS rn
      FROM z a JOIN z b ON a.j = b.j AND a.t < b.t
    )
    SELECT e.ta AS type_a, e.tb AS type_b, e.exact_join,
           p.p AS ams_estimate,
           abs(p.p - e.exact_join) AS abs_err
    FROM exact e
    JOIN prod p ON p.ta = e.ta AND p.tb = e.tb
                AND p.rn = {(_AMS_J + 1) // 2}
    ORDER BY type_a, type_b
    """,
)
def ams_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AGMS/AMS join-size estimation (Alon-Matias-Szegedy): 9
    independent +/-1 hash projections z_j = sum_u s_j(u) * c(u) per
    event_type; the estimated size of the user-keyed join between two
    types is median_j(zA_j * zB_j), reported against the exact join
    size — the sketch a query optimizer keeps per partition to cost
    joins without touching data. Everything is exact integers (signs
    from an md5 hex-digit parity, products, the rank-5 median with
    sketch-id tie-break), so the estimate hash-gates byte-exactly.
    Scale shape: sketch state is 9 numbers per key group — mergeable
    partials, one tiny shuffle; the exact side collapses the fact
    table to per-(type,user) counts before the pair join."""
    ev = _t(spark, sf_dir, "events")
    cnt = ev.groupBy(
        F.col("event_type").alias("t"), F.col("user_id").alias("u")
    ).agg(F.count("*").alias("c"))
    ca = cnt.select(F.col("t").alias("ta"), "u", F.col("c").alias("canta"))
    cb = cnt.select(F.col("t").alias("tb"), "u", F.col("c").alias("cantb"))
    exact = (
        ca.join(cb, "u")
        .filter(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(
            F.sum(F.col("canta") * F.col("cantb"))
            .cast("long")
            .alias("exact_join")
        )
    )
    js = spark.range(_AMS_J).select(F.col("id").cast("int").alias("j"))
    sign = F.when(
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("ams"),
                        F.col("j").cast("string"),
                        F.lit(":"),
                        F.col("u").cast("string"),
                    ).cast("binary")
                ),
                1,
                1,
            ),
            16,
            10,
        ).cast("int")
        % 2
        == 0,
        1,
    ).otherwise(-1)
    z = (
        cnt.crossJoin(F.broadcast(js))
        .groupBy("t", "j")
        .agg(F.sum(F.col("c") * sign).cast("long").alias("z"))
    )
    za = z.select(F.col("t").alias("ta"), "j", F.col("z").alias("za"))
    zb = z.select(F.col("t").alias("tb"), "j", F.col("z").alias("zb"))
    prod = (
        za.join(zb, "j")
        .filter(F.col("ta") < F.col("tb"))
        .select(
            "ta", "tb", "j", (F.col("za") * F.col("zb")).alias("p")
        )
    )
    w = Window.partitionBy("ta", "tb").orderBy("p", "j")
    med = (
        prod.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == (_AMS_J + 1) // 2)
        .select("ta", "tb", F.col("p").alias("ams_estimate"))
    )
    return (
        exact.join(med, ["ta", "tb"])
        .select(
            F.col("ta").alias("type_a"),
            F.col("tb").alias("type_b"),
            "exact_join",
            "ams_estimate",
            F.abs(F.col("ams_estimate") - F.col("exact_join")).alias(
                "abs_err"
            ),
        )
        .orderBy("type_a", "type_b")
    )


# ------------------------------------------------------ Rice tuning


@register_extra(
    "rice_parameter_tuning",
    """
    WITH p AS (
      SELECT event_type, user_id AS did,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY user_id) AS rn
      FROM (SELECT DISTINCT event_type, user_id FROM events)
    ),
    gaps AS (
      SELECT event_type,
             did - coalesce(lag(did) OVER (PARTITION BY event_type
                                           ORDER BY rn), -1) - 1 AS g
      FROM p
    ),
    ks(k) AS (SELECT range FROM range(9)),
    cost AS (
      SELECT g.event_type, ks.k,
             CAST(sum((g.g >> CAST(ks.k AS INT)) + ks.k + 1) AS BIGINT)
               AS bits
      FROM gaps g CROSS JOIN ks
      GROUP BY 1, 2
    ),
    best AS (
      SELECT event_type, k, bits,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY bits, k) AS rn
      FROM cost
    )
    SELECT b.event_type, CAST(b.k AS INT) AS k_opt, b.bits AS bits_opt,
           c0.bits AS bits_unary
    FROM best b JOIN cost c0
      ON c0.event_type = b.event_type AND c0.k = 0
    WHERE b.rn = 1 ORDER BY b.event_type
    """,
)
def rice_parameter_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golomb-Rice parameter tuning for inverted-index posting gaps:
    encode each event_type's sorted distinct-user posting list as
    doc-id gaps and pick the Rice parameter k minimizing total bits
    (cost per gap = (g >> k) unary quotient + k remainder bits + 1
    stop bit; k = 0 degenerates to unary, shown for contrast) — the
    per-list tuning decision every search index writer makes. Exact
    integer argmin (tie -> smaller k). Scale shape: gaps via one lag
    window per list; the 9-point k sweep is a broadcast dim, partials
    combine map-side."""
    ev = _t(spark, sf_dir, "events")
    p = ev.select("event_type", "user_id").distinct()
    w = Window.partitionBy("event_type").orderBy("user_id")
    gaps = p.select(
        "event_type",
        (
            F.col("user_id")
            - F.coalesce(
                F.lag("user_id").over(w), F.lit(-1)
            )
            - 1
        ).alias("g"),
    )
    ks = spark.range(9).select(F.col("id").cast("int").alias("k"))
    cost = (
        gaps.crossJoin(F.broadcast(ks))
        .select(
            "event_type",
            "k",
            F.expr("shiftright(g, k) + k + 1").alias("c"),
        )
        .groupBy("event_type", "k")
        .agg(F.sum("c").cast("long").alias("bits"))
    )
    wb = Window.partitionBy("event_type").orderBy("bits", "k")
    best = cost.withColumn("rn", F.row_number().over(wb)).filter(
        F.col("rn") == 1
    )
    c0 = cost.filter(F.col("k") == 0).select(
        "event_type", F.col("bits").alias("bits_unary")
    )
    return (
        best.join(c0, "event_type")
        .select(
            "event_type",
            F.col("k").cast("int").alias("k_opt"),
            F.col("bits").alias("bits_opt"),
            "bits_unary",
        )
        .orderBy("event_type")
    )


def _lcp_sum_expr(a: str, b: str, cap: int) -> str:
    """Longest-common-prefix length as the SQL-portable unrolled sum of
    prefix equalities (valid because prefix matches are monotone in k);
    identical text is generated for both engines."""
    return " + ".join(
        f"CASE WHEN substr({a},1,{k}) = substr({b},1,{k})"
        " THEN 1 ELSE 0 END"
        for k in range(1, cap + 1)
    )


def _front_coding_oracle() -> str:
    return f"""
    WITH keys AS (
      SELECT DISTINCT 'u' || lpad(CAST(user_id AS VARCHAR), 6, '0')
             || '/' || event_type AS key
      FROM events
    ),
    seq AS (
      SELECT key,
             row_number() OVER (ORDER BY key) AS rn,
             lag(key) OVER (ORDER BY key) AS prev
      FROM keys
    ),
    sc AS (
      SELECT key, (rn - 1) // 16 AS blk,
             CASE WHEN prev IS NULL OR (rn - 1) % 16 = 0
                  THEN 0 ELSE {_lcp_sum_expr("prev", "key", 16)} END AS lcp,
             length(key) AS len
      FROM seq
    )
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(count(DISTINCT blk) AS BIGINT) AS n_blocks,
           CAST(sum(len) AS BIGINT) AS raw_chars,
           CAST(sum(lcp) AS BIGINT) AS lcp_chars,
           CAST(sum(len) - sum(lcp) AS BIGINT) AS suffix_chars,
           CAST(sum(lcp) * 10000 // sum(len) AS BIGINT) AS savings_e4
    FROM sc
    """


@register_extra("front_coding_sizes", _front_coding_oracle())
def front_coding_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSTable-block front coding (LevelDB/RocksDB key prefix
    compression): sort the distinct 'u<user>/<type>' keys, restart
    every 16 keys, and store only the suffix after the longest common
    prefix with the previous key — reporting raw vs front-coded char
    totals and the e-4 savings rate (52% here: zero-padded composite
    keys are exactly the prefix-heavy shape LSM stores see). Exact
    integers; the LCP is the unrolled prefix-equality sum, generated
    from one helper for both engines. Scale shape: distinct-key build
    is a partial-agg shuffle; the sort is the order an SSTable write
    REQUIRES anyway (range-partitioned sort at scale), and restart
    points make every block independent after it — the single-row
    rollup is a partial-agg reduce."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    keys = ev.select(
        F.concat(
            F.lit("u"),
            F.lpad(F.col("user_id").cast("string"), 6, "0"),
            F.lit("/"),
            F.col("event_type"),
        ).alias("key")
    ).distinct()
    w = Window.orderBy("key")
    seq = keys.select(
        "key",
        F.row_number().over(w).alias("rn"),
        F.lag("key").over(w).alias("prev"),
    )
    sc = seq.select(
        "key",
        F.expr("(rn - 1) div 16").alias("blk"),
        F.when(
            F.col("prev").isNull() | (F.expr("(rn - 1) % 16") == 0),
            F.lit(0),
        )
        .otherwise(F.expr(_lcp_sum_expr("prev", "key", 16)))
        .alias("lcp"),
        F.length("key").alias("len"),
    )
    return sc.agg(
        F.count("*").cast("long").alias("n_keys"),
        F.countDistinct("blk").cast("long").alias("n_blocks"),
        F.sum("len").cast("long").alias("raw_chars"),
        F.sum("lcp").cast("long").alias("lcp_chars"),
        (F.sum("len") - F.sum("lcp")).cast("long").alias("suffix_chars"),
        F.expr(
            "CAST(sum(lcp) * 10000 div sum(len) AS BIGINT)"
        ).alias("savings_e4"),
    )


# ------------------------------------------- Misra-Gries heavy hitters


@register_extra(
    "misra_gries_heavy",
    """
    WITH RECURSIVE gated AS (
      SELECT user_id % 4 AS shard, event_id,
             least(('0x' || substr(md5('mga:' || CAST(event_id AS VARCHAR)),
                                   1, 7))::BIGINT % 40,
                   ('0x' || substr(md5('mgb:' || CAST(event_id AS VARCHAR)),
                                   1, 7))::BIGINT % 40) AS it
      FROM events
      WHERE ('0x' || substr(md5('mg:' || CAST(event_id AS VARCHAR)),
                            1, 4))::BIGINT % 97 = 0
    ),
    idx AS (
      SELECT shard,
             row_number() OVER (PARTITION BY shard ORDER BY event_id) AS i,
             it
      FROM gated
    ),
    st(shard, i, state) AS (
      SELECT DISTINCT shard, CAST(0 AS BIGINT),
             CAST([] AS STRUCT(it BIGINT, c BIGINT)[])
      FROM idx
      UNION ALL
      SELECT st.shard, st.i + 1,
             CASE
               WHEN len(list_filter(st.state, s -> s.it = idx.it)) > 0 THEN
                 list_transform(st.state, s ->
                   CASE WHEN s.it = idx.it
                        THEN {'it': s.it, 'c': s.c + 1} ELSE s END)
               WHEN len(st.state) < 8 THEN
                 st.state || [{'it': idx.it, 'c': CAST(1 AS BIGINT)}]
               ELSE
                 list_filter(
                   list_transform(st.state,
                                  s -> {'it': s.it, 'c': s.c - 1}),
                   s -> s.c > 0)
             END
      FROM st JOIN idx ON idx.shard = st.shard AND idx.i = st.i + 1
    ),
    final AS (
      SELECT shard, u.it AS it, u.c AS c
      FROM (
        SELECT shard, unnest(state) AS u
        FROM (SELECT shard, state,
                     row_number() OVER (PARTITION BY shard
                                        ORDER BY i DESC) AS rn
              FROM st) WHERE rn = 1
      )
    ),
    merged AS (
      SELECT it, sum(c) AS merged_cnt FROM final GROUP BY 1
    ),
    sub AS (
      SELECT coalesce(
        (SELECT merged_cnt FROM merged
         ORDER BY merged_cnt DESC, it LIMIT 1 OFFSET 8), 0) AS s8
    )
    SELECT it AS item, CAST(merged_cnt AS BIGINT) AS merged_cnt,
           CAST(merged_cnt - s8 AS BIGINT) AS weight
    FROM merged, sub
    WHERE merged_cnt - s8 > 0
    ORDER BY item
    """,
)
def misra_gries_heavy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries deterministic heavy-hitter summary (the SpaceSaving
    sibling — the mergeable frequency sketch behind Spark's own
    approx_count_distinct cousins and every top-k dashboard): k=8
    counters folded in event order per shard, then ONE global merge —
    per-item counter sums followed by subtracting the (k+1)-th largest
    merged count, the standard Agarwal et al. mergeability construction.
    Sharding is LOGICAL (user_id % 4), so Spark's applyInPandas fold is
    deterministic whatever the physical partitioning — the per-key fold
    pattern of lttb/viterbi; the merge is plain distributed SQL. The
    oracle replays the identical folds as a per-shard list machine and
    the identical merge. Item ids are least(h1, h2) % 40 — a skewed
    (triangular) integer distribution so real heavy hitters exist.
    Exact integers end-to-end."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id").cast("string")

    def _h(prefix: str, chars: int) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(prefix), eid).cast("binary")), 1, chars
            ),
            16,
            10,
        ).cast("long")

    gated = ev.filter(_h("mg:", 4) % 97 == 0).select(
        F.pmod(F.col("user_id"), F.lit(4)).alias("shard"),
        "event_id",
        F.least(_h("mga:", 7) % 40, _h("mgb:", 7) % 40).alias("it"),
    )

    def _mg(key, pdf):
        import pandas as pd

        pdf = pdf.sort_values("event_id")
        state: dict[int, int] = {}
        for it in pdf["it"]:
            it = int(it)
            if it in state:
                state[it] += 1
            elif len(state) < 8:
                state[it] = 1
            else:
                state = {
                    k: v - 1 for k, v in state.items() if v - 1 > 0
                }
        return pd.DataFrame(
            [(int(key[0]), k, v) for k, v in state.items()],
            columns=["shard", "it", "c"],
        )

    final = gated.groupBy("shard").applyInPandas(
        _mg, "shard long, it long, c long"
    )
    merged = final.groupBy("it").agg(F.sum("c").alias("merged_cnt"))
    w = Window.orderBy(F.desc("merged_cnt"), F.asc("it"))
    ranked = merged.withColumn("rn", F.row_number().over(w))
    s8 = ranked.filter(F.col("rn") == 9).select(
        F.col("merged_cnt").alias("s8")
    )
    sub = (
        spark.range(1)
        .join(s8, F.lit(True), "left")
        .select(F.coalesce("s8", F.lit(0)).alias("s8"))
    )
    return (
        merged.crossJoin(F.broadcast(sub))
        .filter(F.col("merged_cnt") - F.col("s8") > 0)
        .select(
            F.col("it").alias("item"),
            F.col("merged_cnt").cast("long").alias("merged_cnt"),
            (F.col("merged_cnt") - F.col("s8"))
            .cast("long")
            .alias("weight"),
        )
        .orderBy("item")
    )


# ------------------------------------------- rendezvous (HRW) hashing


@register_extra(
    "rendezvous_hash_balance",
    """
    WITH n AS (SELECT unnest(generate_series(0, 7)) AS node),
    w AS (
      SELECT e.event_id AS k, n.node,
             (('0x' || substr(md5('hrw:' || CAST(n.node AS VARCHAR)
                || ':' || CAST(e.event_id AS VARCHAR)), 1, 7))::BIGINT
              % 100000000) * 10 + n.node AS wt
      FROM events e, n
    ),
    before AS (SELECT k, max_by(node, wt) AS node FROM w GROUP BY k),
    after AS (
      SELECT k, max_by(node, wt) AS node FROM w WHERE node <> 0
      GROUP BY k
    ),
    moved AS (
      SELECT a.node, count(*) AS n_gained
      FROM before b JOIN after a USING (k)
      WHERE b.node = 0 GROUP BY 1
    )
    SELECT n.node,
           CAST(coalesce(nb.c, 0) AS BIGINT) AS n_before,
           CAST(coalesce(na.c, 0) AS BIGINT) AS n_after,
           CAST(coalesce(m.n_gained, 0) AS BIGINT) AS n_gained
    FROM n
    LEFT JOIN (SELECT node, count(*) AS c FROM before GROUP BY 1) nb
      USING (node)
    LEFT JOIN (SELECT node, count(*) AS c FROM after GROUP BY 1) na
      USING (node)
    LEFT JOIN moved m USING (node)
    ORDER BY n.node
    """,
)
def rendezvous_hash_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (highest-random-weight) hashing balance + failover
    audit — the OTHER consistent-assignment scheme next to the hash
    ring (consistent_hash_balance): every key goes to the node with the
    maximum md5(node, key) weight, and when a node dies exactly ITS
    keys remap (HRW's minimal-disruption property — the audit verifies
    it: n_gained sums to node 0's n_before and no other key moves).
    Weights packed *10+node for a strict total order, so max_by is
    deterministic on both engines. Spark shape: one keys x 8-nodes
    expand (map-side), two argmax aggs, three tiny count joins — at
    fleet scale the expand factor is the node count, which is why HRW
    is used for small node sets (caches, shard routers)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    nodes = spark.range(0, 8).select(F.col("id").alias("node"))
    w = (
        ev.select(F.col("event_id").alias("k"))
        .crossJoin(F.broadcast(nodes))
        .select(
            "k",
            "node",
            (
                (
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.lit("hrw:"),
                                    F.col("node").cast("string"),
                                    F.lit(":"),
                                    F.col("k").cast("string"),
                                ).cast("binary")
                            ),
                            1,
                            7,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % 100000000
                )
                * 10
                + F.col("node")
            ).alias("wt"),
        )
    )
    before = w.groupBy("k").agg(F.max_by("node", "wt").alias("node"))
    after = (
        w.filter(F.col("node") != 0)
        .groupBy("k")
        .agg(F.max_by("node", "wt").alias("node"))
    )
    moved = (
        before.withColumnRenamed("node", "bnode")
        .join(after.withColumnRenamed("node", "anode"), "k")
        .filter(F.col("bnode") == 0)
        .groupBy(F.col("anode").alias("node"))
        .agg(F.count(F.lit(1)).alias("n_gained"))
    )
    nb = before.groupBy("node").agg(F.count(F.lit(1)).alias("cb"))
    na = after.groupBy("node").agg(F.count(F.lit(1)).alias("ca"))
    return (
        nodes.join(nb, "node", "left")
        .join(na, "node", "left")
        .join(moved, "node", "left")
        .select(
            "node",
            F.coalesce("cb", F.lit(0)).cast("long").alias("n_before"),
            F.coalesce("ca", F.lit(0)).cast("long").alias("n_after"),
            F.coalesce("n_gained", F.lit(0)).cast("long").alias("n_gained"),
        )
        .orderBy("node")
    )


# ------------------------------------------- NTT / convolution theorem


_NTT_WP_SQL = """
    wp0(m, v) AS (
      SELECT 0, CAST(1 AS BIGINT)
      UNION ALL
      SELECT m + 1, (v * 249) % 257 FROM wp0 WHERE m < 15
    ),
    wp AS (SELECT m, v FROM wp0),
    sj AS (
      SELECT s.s, j.j,
             ('0x' || substr(md5('na:' || CAST(s.s AS VARCHAR) || ':'
                || CAST(j.j AS VARCHAR)), 1, 5))::BIGINT % 257 AS a,
             ('0x' || substr(md5('nb:' || CAST(s.s AS VARCHAR) || ':'
                || CAST(j.j AS VARCHAR)), 1, 5))::BIGINT % 257 AS b
      FROM (SELECT unnest(generate_series(0, 5)) AS s) s,
           (SELECT unnest(generate_series(0, 15)) AS j) j
    )
"""


@register_extra(
    "ntt_convolution_check",
    f"""
    WITH RECURSIVE {_NTT_WP_SQL},
    cc AS (
      SELECT a.s, m.m,
             sum(a.a * b.b) % 257 AS c
      FROM (SELECT unnest(generate_series(0, 15)) AS m) m,
           sj a
      JOIN sj b ON b.s = a.s
      WHERE b.j = ((m.m - a.j) % 16 + 16) % 16
      GROUP BY 1, 2
    ),
    ck AS (
      SELECT cc.s, k.k,
             sum(cc.c * wp.v) % 257 AS prod
      FROM cc,
           (SELECT unnest(generate_series(0, 15)) AS k) k
      JOIN wp ON wp.m = (cc.m * k.k) % 16
      GROUP BY 1, 2
    )
    SELECT s, CAST(k AS BIGINT) AS k, CAST(prod AS BIGINT) AS prod
    FROM ck ORDER BY s, k
    """,
)
def ntt_convolution_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Number-theoretic transform gated by the CONVOLUTION THEOREM —
    exact-integer FFT over Z/257 (n=16, root 249 = 3^16, verified
    order 16): the transform behind big-integer multiplication and
    post-quantum lattice crypto, and the only FFT whose cross-engine
    hash can be exact (no floats exist). Genuinely different
    derivations on the two engines: Spark computes NTT(a)[k] *
    NTT(b)[k] mod p from the TRANSFORM definition (one j x k expand,
    partial-agg sums per (series, k)); the oracle computes the
    CIRCULAR CONVOLUTION c = a (*) b in the time domain and transforms
    THAT — the results agree iff the convolution theorem holds over
    the exact modular arithmetic of both engines. Power table built by
    16-step recursion (oracle) / literal closed form (Spark). Six
    md5-derived 16-point series pairs; sums bounded at 1.06e6, far
    inside exact BIGINT."""
    wp = [1]
    for _ in range(15):
        wp.append(wp[-1] * 249 % 257)
    wdf = spark.createDataFrame(
        [(m, v) for m, v in enumerate(wp)], "m long, v long"
    )
    ss = spark.range(0, 6).select(F.col("id").alias("s"))
    jj = spark.range(0, 16).select(F.col("id").alias("j"))
    kk = spark.range(0, 16).select(F.col("id").alias("k"))

    def _h(prefix: str) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(prefix),
                        F.col("s").cast("string"),
                        F.lit(":"),
                        F.col("j").cast("string"),
                    ).cast("binary")
                ),
                1,
                5,
            ),
            16,
            10,
        ).cast("long")

    sj = ss.crossJoin(jj).select(
        "s", "j", (_h("na:") % 257).alias("a"), (_h("nb:") % 257).alias("b")
    )
    expand = sj.crossJoin(F.broadcast(kk)).withColumn(
        "m", F.pmod(F.col("j") * F.col("k"), F.lit(16))
    ).join(F.broadcast(wdf), "m")
    A = expand.groupBy("s", "k").agg(
        F.pmod(F.sum(F.col("a") * F.col("v")), F.lit(257)).alias("ak")
    )
    B = expand.groupBy("s", "k").agg(
        F.pmod(F.sum(F.col("b") * F.col("v")), F.lit(257)).alias("bk")
    )
    return (
        A.join(B, ["s", "k"])
        .select(
            "s",
            F.col("k").cast("long").alias("k"),
            F.pmod(F.col("ak") * F.col("bk"), F.lit(257))
            .cast("long")
            .alias("prod"),
        )
        .orderBy("s", "k")
    )


# ------------------------------------------------- Hamming(7,4) ECC


@register_extra(
    "hamming74_ecc",
    """
    WITH blk AS (
      SELECT event_id,
             ('0x' || substr(md5('hd:' || CAST(event_id AS VARCHAR)),
                             1, 4))::BIGINT % 16 AS d,
             ('0x' || substr(md5('he:' || CAST(event_id AS VARCHAR)),
                             1, 4))::BIGINT % 8 AS e
      FROM events
      WHERE ('0x' || substr(md5('hg:' || CAST(event_id AS VARCHAR)),
                            1, 4))::BIGINT % 13 = 0
    ),
    enc AS (
      SELECT event_id, d,
             CASE WHEN e < 7 THEN e + 1 ELSE 0 END AS epos,
             (d >> 0) & 1 AS b0, (d >> 1) & 1 AS b1,
             (d >> 2) & 1 AS b2, (d >> 3) & 1 AS b3
      FROM blk
    ),
    cw AS (
      SELECT event_id, d, epos, b0, b1, b2, b3,
             xor(xor(b0, b1), b3) AS p1,
             xor(xor(b0, b2), b3) AS p2,
             xor(xor(b1, b2), b3) AS p3
      FROM enc
    ),
    rx AS (
      SELECT event_id, d, epos,
             CASE WHEN epos = 1 THEN 1 - p1 ELSE p1 END AS c1,
             CASE WHEN epos = 2 THEN 1 - p2 ELSE p2 END AS c2,
             CASE WHEN epos = 3 THEN 1 - b0 ELSE b0 END AS c3,
             CASE WHEN epos = 4 THEN 1 - p3 ELSE p3 END AS c4,
             CASE WHEN epos = 5 THEN 1 - b1 ELSE b1 END AS c5,
             CASE WHEN epos = 6 THEN 1 - b2 ELSE b2 END AS c6,
             CASE WHEN epos = 7 THEN 1 - b3 ELSE b3 END AS c7
      FROM cw
    ),
    syn AS (
      SELECT event_id, d, epos, c1, c2, c3, c4, c5, c6, c7,
             xor(xor(xor(c1, c3), c5), c7)
             + 2 * xor(xor(xor(c2, c3), c6), c7)
             + 4 * xor(xor(xor(c4, c5), c6), c7) AS s
      FROM rx
    ),
    dec AS (
      SELECT event_id, d, epos, s,
             (CASE WHEN s = 3 THEN 1 - c3 ELSE c3 END)
             + 2 * (CASE WHEN s = 5 THEN 1 - c5 ELSE c5 END)
             + 4 * (CASE WHEN s = 6 THEN 1 - c6 ELSE c6 END)
             + 8 * (CASE WHEN s = 7 THEN 1 - c7 ELSE c7 END) AS dd
      FROM syn
    )
    SELECT epos AS error_pos,
           count(*) AS n_blocks,
           count(*) FILTER (WHERE s = epos) AS n_syndrome_ok,
           count(*) FILTER (WHERE dd = d) AS n_decoded_ok
    FROM dec GROUP BY 1 ORDER BY error_pos
    """,
)
def hamming74_ecc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming(7,4) single-error-correcting code, encode -> corrupt ->
    syndrome-decode round trip — the ECC algebra under DRAM/SSD
    scrubbing and RAID verify passes. Each md5-derived nibble is
    encoded with the three standard parity bits (positions 1,2,4
    covering the classic index masks), a planted single-bit error
    (position e+1, or clean when e=7) flips one codeword bit, and the
    decoder recomputes the syndrome s1+2*s2+4*s3 — which must equal
    the planted position exactly, and the corrected nibble must equal
    the original for every block (n_syndrome_ok == n_decoded_ok ==
    n_blocks row-by-row; the gate hash proves the full 100%-recovery
    property, grouped by error position). Pure bit algebra (xor/shift/
    CASE) — identical JVM expressions and SQL, embarrassingly parallel
    map work with one tiny partial agg."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id").cast("string")

    def _h(prefix: str, chars: int) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(prefix), eid).cast("binary")), 1, chars
            ),
            16,
            10,
        ).cast("long")

    blk = ev.filter(_h("hg:", 4) % 13 == 0).select(
        (_h("hd:", 4) % 16).alias("d"), (_h("he:", 4) % 8).alias("e")
    )
    x = F.expr
    dec = (
        blk.withColumn(
            "epos", F.when(F.col("e") < 7, F.col("e") + 1).otherwise(0)
        )
        .withColumn("b0", x("(d >> 0) & 1"))
        .withColumn("b1", x("(d >> 1) & 1"))
        .withColumn("b2", x("(d >> 2) & 1"))
        .withColumn("b3", x("(d >> 3) & 1"))
        .withColumn("p1", x("b0 ^ b1 ^ b3"))
        .withColumn("p2", x("b0 ^ b2 ^ b3"))
        .withColumn("p3", x("b1 ^ b2 ^ b3"))
        .withColumn("c1", x("CASE WHEN epos = 1 THEN 1 - p1 ELSE p1 END"))
        .withColumn("c2", x("CASE WHEN epos = 2 THEN 1 - p2 ELSE p2 END"))
        .withColumn("c3", x("CASE WHEN epos = 3 THEN 1 - b0 ELSE b0 END"))
        .withColumn("c4", x("CASE WHEN epos = 4 THEN 1 - p3 ELSE p3 END"))
        .withColumn("c5", x("CASE WHEN epos = 5 THEN 1 - b1 ELSE b1 END"))
        .withColumn("c6", x("CASE WHEN epos = 6 THEN 1 - b2 ELSE b2 END"))
        .withColumn("c7", x("CASE WHEN epos = 7 THEN 1 - b3 ELSE b3 END"))
        .withColumn(
            "s",
            x(
                "(c1 ^ c3 ^ c5 ^ c7) + 2 * (c2 ^ c3 ^ c6 ^ c7)"
                " + 4 * (c4 ^ c5 ^ c6 ^ c7)"
            ),
        )
        .withColumn(
            "dd",
            x(
                "(CASE WHEN s = 3 THEN 1 - c3 ELSE c3 END)"
                " + 2 * (CASE WHEN s = 5 THEN 1 - c5 ELSE c5 END)"
                " + 4 * (CASE WHEN s = 6 THEN 1 - c6 ELSE c6 END)"
                " + 8 * (CASE WHEN s = 7 THEN 1 - c7 ELSE c7 END)"
            ),
        )
    )
    return (
        dec.groupBy(F.col("epos").alias("error_pos"))
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.count(F.when(F.col("s") == F.col("epos"), 1)).alias(
                "n_syndrome_ok"
            ),
            F.count(F.when(F.col("dd") == F.col("d"), 1)).alias(
                "n_decoded_ok"
            ),
        )
        .orderBy("error_pos")
    )


# ------------------------------------------- KMV theta set operations


@register_extra(
    "kmv_set_operations",
    """
    WITH u AS (SELECT DISTINCT user_id AS uid FROM events),
    h AS (
      SELECT uid,
             ('0x' || substr(md5('kmv:' || CAST(uid AS VARCHAR)),
                             1, 10))::BIGINT AS hv,
             uid % 3 <> 0 AS in_a,
             uid % 2 = 0 AS in_b
      FROM u
    ),
    un AS (
      SELECT hv, in_a, in_b,
             row_number() OVER (ORDER BY hv) AS rk
      FROM h WHERE in_a OR in_b
    ),
    theta AS (SELECT hv AS th FROM un WHERE rk = 32),
    sk AS (SELECT * FROM un WHERE rk <= 32),
    stats AS (
      SELECT COALESCE((SELECT th FROM theta), 1099511627776) AS theta_u,
             (SELECT count(*) FROM sk) AS n_ret,
             (SELECT count(*) FROM sk WHERE in_a AND in_b) AS c_inter,
             (SELECT count(*) FROM h WHERE in_a OR in_b) AS exact_union,
             (SELECT count(*) FROM h WHERE in_a AND in_b) AS exact_inter
    )
    SELECT CAST(theta_u AS BIGINT) AS theta_u,
           CAST(c_inter AS BIGINT) AS n_inter_in_sketch,
           CAST(1000 * (n_ret - CASE WHEN n_ret = 32 THEN 1 ELSE 0 END)
                * 1099511627776 // theta_u AS BIGINT)
             AS est_union_milli,
           CAST(1000 * c_inter * 1099511627776 // theta_u AS BIGINT)
             AS est_inter_milli,
           CAST(exact_union AS BIGINT) AS exact_union,
           CAST(exact_inter AS BIGINT) AS exact_inter
    FROM stats
    """,
)
def kmv_set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch SET ALGEBRA on KMV minima — the mergeable
    distinct-count sketch's killer feature (DataSketches' theta
    union/intersection): keep the k=32 smallest 40-bit hashes of the
    union; theta = the k-th minimum; |union| ~ (k-1)*2^40/theta, and
    the INTERSECTION estimate is just the count of sketch minima that
    belong to both sets, scaled by the same theta (each retained hash
    'represents' 2^40/theta elements). Everything up to the final
    division is exact-integer, and the division itself is a floor —
    both the estimates and the exact counts (kept for the demo, never
    at scale) hash identically. Sets are arithmetic user subsets (2/3
    and 1/2 of the universe, overlapping); Spark computes the minima
    with one rank window over the hashed union — at scale a
    per-partition top-k + merge, never a global sort."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    u = ev.select(F.col("user_id").alias("uid")).distinct()
    h = u.select(
        "uid",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("kmv:"), F.col("uid").cast("string")
                    ).cast("binary")
                ),
                1,
                10,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("hv"),
        (F.pmod(F.col("uid"), F.lit(3)) != 0).alias("in_a"),
        (F.pmod(F.col("uid"), F.lit(2)) == 0).alias("in_b"),
    )
    un = (
        h.filter(F.col("in_a") | F.col("in_b"))
        .withColumn("rk", F.row_number().over(Window.orderBy("hv")))
    )
    rk32 = F.col("rk") <= 32
    # exact mode (fewer than k retained, small-SF worlds): theta stays
    # 1.0 == 2^40 and the estimator degenerates to the exact retained
    # count — the DataSketches theta-sketch contract
    sketch = un.agg(
        F.coalesce(
            F.max(F.when(F.col("rk") == 32, F.col("hv"))),
            F.lit(1099511627776),
        ).alias("theta_u"),
        F.count(F.when(rk32, 1)).alias("n_ret"),
        F.count(
            F.when(rk32 & F.col("in_a") & F.col("in_b"), 1)
        ).alias("n_inter_in_sketch"),
    )
    exacts = h.agg(
        F.count(F.when(F.col("in_a") | F.col("in_b"), 1)).alias(
            "exact_union"
        ),
        F.count(F.when(F.col("in_a") & F.col("in_b"), 1)).alias(
            "exact_inter"
        ),
    )
    return (
        sketch.crossJoin(exacts)
        .select(
            "theta_u",
            F.col("n_inter_in_sketch").cast("long").alias(
                "n_inter_in_sketch"
            ),
            F.expr(
                "(1000 * (n_ret - CASE WHEN n_ret = 32 THEN 1 ELSE 0 END)"
                " * 1099511627776) div theta_u"
            )
            .cast("long")
            .alias("est_union_milli"),
            F.expr(
                "(1000 * n_inter_in_sketch * 1099511627776) div theta_u"
            )
            .cast("long")
            .alias("est_inter_milli"),
            F.col("exact_union").cast("long").alias("exact_union"),
            F.col("exact_inter").cast("long").alias("exact_inter"),
        )
    )


# ------------------------------------------- succinct rank/select


@register_extra(
    "rank_select_bitvector",
    """
    WITH bits AS (
      SELECT i,
             CASE WHEN ('0x' || substr(md5('bv:' || CAST(i AS VARCHAR)),
                                       1, 4))::BIGINT % 3 < 1
             THEN 1 ELSE 0 END AS b
      FROM (SELECT unnest(generate_series(0, 4095)) AS i)
    ),
    rq AS (
      SELECT q,
             ('0x' || substr(md5('rq:' || CAST(q AS VARCHAR)),
                             1, 5))::BIGINT % 4096 AS p
      FROM (SELECT unnest(generate_series(0, 23)) AS q)
    ),
    ones AS (
      SELECT i, row_number() OVER (ORDER BY i) AS k
      FROM bits WHERE b = 1
    ),
    n1 AS (SELECT count(*) AS n FROM ones),
    sq AS (
      SELECT q,
             1 + ('0x' || substr(md5('sq:' || CAST(q AS VARCHAR)),
                                 1, 5))::BIGINT % (SELECT n FROM n1)
               AS k
      FROM (SELECT unnest(generate_series(0, 15)) AS q)
    )
    SELECT 'rank' AS kind, rq.q AS q, CAST(rq.p AS BIGINT) AS arg,
           CAST((SELECT count(*) FROM bits
                 WHERE bits.i < rq.p AND bits.b = 1) AS BIGINT) AS answer
    FROM rq
    UNION ALL
    SELECT 'select', sq.q, CAST(sq.k AS BIGINT),
           CAST((SELECT i FROM ones WHERE ones.k = sq.k) AS BIGINT)
    FROM sq
    ORDER BY kind, q
    """,
)
def rank_select_bitvector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Succinct bitvector rank/select — the primitive under FM-indexes,
    wavelet trees, and every compressed posting list: rank(p) = ones
    below p, select(k) = position of the k-th one. Cross-derivation
    gate: Spark answers rank through the TWO-LEVEL DIRECTORY structure
    a real succinct store builds (512-bit superblock cumulative counts
    + 64-bit block counts + an in-block partial count — three
    broadcast-joined lookups per query, O(1) work each, never a scan),
    and select by binary-search semantics over the block directory
    (the max block whose cumulative count is below k, then the
    in-block offset); the oracle computes both DEFINITIONALLY with
    brute counts over the raw bits. 4096 md5-derived bits (~1/3
    density), 24 rank + 16 select probes."""
    bits = spark.range(0, 4096).select(F.col("id").alias("i")).select(
        "i",
        F.when(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("bv:"), F.col("i").cast("string")
                        ).cast("binary")
                    ),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("long")
            % 3
            < 1,
            1,
        )
        .otherwise(0)
        .alias("b"),
    ).localCheckpoint(eager=True)
    blk = bits.withColumn("blk", F.expr("i div 64")).withColumn(
        "sb", F.expr("i div 512")
    )
    blkdir = blk.groupBy("sb", "blk").agg(F.sum("b").alias("bc"))
    w_sb = Window.orderBy("sb").rowsBetween(
        Window.unboundedPreceding, -1
    )
    sbdir = (
        blkdir.groupBy("sb")
        .agg(F.sum("bc").alias("sc"))
        .withColumn(
            "sb_cum", F.coalesce(F.sum("sc").over(w_sb), F.lit(0))
        )
        .select("sb", "sb_cum")
        .localCheckpoint(eager=True)
    )
    w_blk = Window.partitionBy("sb").orderBy("blk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    blkdir2 = blkdir.withColumn(
        "blk_cum", F.coalesce(F.sum("bc").over(w_blk), F.lit(0))
    ).localCheckpoint(eager=True)

    def _h(prefix: str, chars: int) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(prefix), F.col("q").cast("string")
                    ).cast("binary")
                ),
                1,
                chars,
            ),
            16,
            10,
        ).cast("long")

    rq = spark.range(0, 24).select(F.col("id").alias("q")).select(
        "q", (_h("rq:", 5) % 4096).alias("p")
    )
    # rank(p) = sb_cum(sb) + blk_cum(blk) + in-block ones below p
    inblk = (
        rq.withColumn("blk", F.expr("p div 64"))
        .join(F.broadcast(bits).withColumnRenamed("i", "bi"),
              F.expr("bi div 64") == F.col("blk"), "left")
        .filter(F.col("bi") < F.col("p"))
        .groupBy("q", "p", "blk")
        .agg(F.sum("b").alias("inb"))
    )
    ranks = (
        rq.withColumn("sb", F.expr("p div 512"))
        .withColumn("blk", F.expr("p div 64"))
        .join(F.broadcast(sbdir), "sb")
        .join(F.broadcast(blkdir2.select("blk", "blk_cum")), "blk")
        .join(inblk.select("q", "inb"), "q", "left")
        .select(
            F.lit("rank").alias("kind"),
            "q",
            F.col("p").cast("long").alias("arg"),
            (
                F.col("sb_cum")
                + F.col("blk_cum")
                + F.coalesce("inb", F.lit(0))
            )
            .cast("long")
            .alias("answer"),
        )
    )
    ones = (
        bits.filter(F.col("b") == 1)
        .withColumn("k", F.row_number().over(Window.orderBy("i")))
        .localCheckpoint(eager=True)
    )
    n1 = ones.count()
    sq = spark.range(0, 16).select(F.col("id").alias("q")).select(
        "q", (1 + _h("sq:", 5) % n1).alias("k")
    )
    # select(k): max block with cumulative below k, then offset inside
    bfull = blkdir2.join(F.broadcast(sbdir), "sb").select(
        "blk", (F.col("sb_cum") + F.col("blk_cum")).alias("cum")
    )
    selblk = (
        sq.join(F.broadcast(bfull), F.col("cum") < F.col("k"))
        .groupBy("q", "k")
        .agg(F.max("blk").alias("blk"))
    )
    sels = (
        selblk.join(
            F.broadcast(
                ones.withColumn("oblk", F.expr("i div 64"))
            ).withColumnRenamed("k", "ok"),
            F.col("oblk") == F.col("blk"),
        )
        .filter(F.col("ok") == F.col("k"))
        .select(
            F.lit("select").alias("kind"),
            "q",
            F.col("k").cast("long").alias("arg"),
            F.col("i").cast("long").alias("answer"),
        )
    )
    return ranks.unionByName(sels).orderBy("kind", "q")


# ------------------------------------------- Elias-Fano posting lists

# The succinct monotone-sequence encoding modern search engines ship
# (Lucene/PISA posting lists, Facebook folly EliasFano): n sorted ids
# from universe u in n*ceil-ish(log2(u/n)) + 2n-ish bits with O(1)
# select. The engine BUILDS the real bit structure per list (upper
# unary-gap bits + packed l-bit lowers) and answers quantile select
# probes by reading BITS ONLY — find the i-th set upper bit, subtract
# i-1 to recover the high part, slice l bits from the lower stream —
# while the oracle answers from the definition (the i-th sorted value)
# plus the closed-form size. Any bug in the bit layout, the packing,
# or the select arithmetic diverges immediately.
_EF_ORACLE = """
WITH v AS (SELECT user_id AS lid, event_id AS val FROM events),
agg AS (
  SELECT lid, count(*) AS n, max(val) + 1 AS u,
         list(val ORDER BY val) AS vs
  FROM v GROUP BY lid
),
par AS (
  SELECT lid, n, u,
         CASE WHEN u // n >= 1
              THEN length(format('{:b}', u // n)) - 1
              ELSE 0 END AS l,
         vs
  FROM agg
)
SELECT CAST(lid AS BIGINT) AS list_id, CAST(n AS BIGINT) AS n,
       CAST(u AS BIGINT) AS u, CAST(l AS BIGINT) AS l,
       CAST(n * l + n + (u >> l) AS BIGINT) AS size_bits,
       CAST(vs[1] AS BIGINT) AS s1,
       CAST(vs[CAST((n + 3) // 4 AS INT)] AS BIGINT) AS s2,
       CAST(vs[CAST((n + 1) // 2 AS INT)] AS BIGINT) AS s3,
       CAST(vs[CAST((3 * n + 3) // 4 AS INT)] AS BIGINT) AS s4,
       CAST(vs[CAST(n AS INT)] AS BIGINT) AS s5
FROM par ORDER BY list_id
"""


@register_extra("elias_fano_postings", _EF_ORACLE)
def elias_fano_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Elias-Fano encode + bit-level select over per-user event posting
    lists (see oracle comment). Scale shape: one groupBy co-locates
    each list; encode + probe are per-group numpy over the list's own
    bits (lists are the parallel axis, the building block of a sharded
    inverted index); output is one 80-byte row per list."""
    import numpy as np
    import pandas as pd

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("user_id").alias("lid"), F.col("event_id").alias("val")
    )

    def _ef(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = np.sort(pdf["val"].to_numpy(np.int64))
        n = len(vals)
        u = int(vals[-1]) + 1
        q = u // n
        l = q.bit_length() - 1 if q >= 1 else 0
        highs = vals >> l
        lows = vals & ((1 << l) - 1)
        upper = np.zeros(n + (u >> l), np.uint8)
        upper[highs + np.arange(n)] = 1
        if l > 0:
            lower = (
                (lows[:, None] >> np.arange(l - 1, -1, -1)[None, :]) & 1
            ).astype(np.uint8).ravel()
        else:
            lower = np.zeros(0, np.uint8)
        size_bits = n * l + len(upper)
        ones = np.flatnonzero(upper)

        def select(i: int) -> int:  # 1-based, reads bits only
            p = int(ones[i - 1])
            high = p - (i - 1)
            if l == 0:
                return high
            fb = lower[(i - 1) * l : i * l]
            low = 0
            for b in fb:
                low = (low << 1) | int(b)
            return (high << l) | low

        probes = [1, (n + 3) // 4, (n + 1) // 2, (3 * n + 3) // 4, n]
        s = [select(i) for i in probes]
        return pd.DataFrame(
            [
                (
                    int(pdf["lid"].iloc[0]), n, u, l, size_bits,
                    s[0], s[1], s[2], s[3], s[4],
                )
            ],
            columns=[
                "list_id", "n", "u", "l", "size_bits",
                "s1", "s2", "s3", "s4", "s5",
            ],
        )

    return (
        ev.groupBy("lid")
        .applyInPandas(
            _ef,
            "list_id bigint, n bigint, u bigint, l bigint,"
            " size_bits bigint, s1 bigint, s2 bigint, s3 bigint,"
            " s4 bigint, s5 bigint",
        )
        .orderBy("list_id")
    )


# --------------------------------------- Reed-Solomon GF(256) codec

def _gf_tables() -> tuple[list[int], list[int]]:
    """GF(2^8) exp/log tables (primitive poly 0x11d, generator 2) —
    the SAME integers feed the Catalyst literal-array lookups and the
    generated DuckDB VALUES relations, so Galois arithmetic never
    crosses engines as anything but table indices."""
    exp, log = [0] * 255, [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x <<= 1
        if x & 0x100:
            x ^= 0x11D
    return exp, log


def _rs_generator(exp: list[int], log: list[int]) -> list[int]:
    """g(x) = prod_{i=0..3} (x + alpha^i), ascending coefficients."""

    def mul(a: int, b: int) -> int:
        return 0 if a == 0 or b == 0 else exp[(log[a] + log[b]) % 255]

    g = [1]
    for i in range(4):
        ng = [0] * (len(g) + 1)
        for k, c in enumerate(g):
            ng[k + 1] ^= c
            ng[k] ^= mul(c, exp[i])
        g = ng
    return g  # [64, 120, 54, 15, 1] for 0x11d


def _rs_oracle() -> str:
    exp, log = _gf_tables()
    g = _rs_generator(exp, log)
    expv = ",".join(f"({i},{v})" for i, v in enumerate(exp))
    logv = ",".join(f"({v},{i})" for i, v in enumerate(exp))  # inverse map
    gv = ",".join(f"({i},{c},{log[c]})" for i, c in enumerate(g))
    return f"""
WITH expt(e, v) AS (VALUES {expv}),
logt(v, e) AS (VALUES {logv}),
gt(gi, gc, glog) AS (VALUES {gv}),
ev AS (SELECT event_id AS id FROM events WHERE event_id % 3 = 0),
mj AS (SELECT unnest(generate_series(0, 15)) AS m),
msg AS (
  SELECT id, m, (id * (m + 3) + m * m * 7) % 256 AS b
  FROM ev CROSS JOIN mj
),
conv AS (
  SELECT msg.id, msg.m + gt.gi AS j,
         CASE WHEN msg.b = 0 THEN 0
              ELSE (SELECT v FROM expt
                    WHERE e = (logt.e + gt.glog) % 255) END AS term
  FROM msg CROSS JOIN gt LEFT JOIN logt ON logt.v = msg.b
),
cw AS (SELECT id, j, bit_xor(term) AS c FROM conv GROUP BY id, j),
rx AS (
  SELECT id, j,
         CASE WHEN id % 5 = 0 AND j = id % 20
              THEN xor(c, 1 + (id * 7) % 255) ELSE c END AS r
  FROM cw
),
si AS (SELECT unnest(generate_series(0, 3)) AS i),
sterm AS (
  SELECT rx.id, si.i,
         CASE WHEN rx.r = 0 THEN 0
              ELSE (SELECT v FROM expt
                    WHERE e = (logt.e + si.i * rx.j % 255) % 255) END
           AS term
  FROM rx CROSS JOIN si LEFT JOIN logt ON logt.v = rx.r
),
snd AS (SELECT id, i, bit_xor(term) AS s FROM sterm GROUP BY id, i),
piv AS (
  SELECT id,
         max(CASE WHEN i = 0 THEN s END) AS s0,
         max(CASE WHEN i = 1 THEN s END) AS s1,
         max(CASE WHEN i = 2 THEN s END) AS s2,
         max(CASE WHEN i = 3 THEN s END) AS s3
  FROM snd GROUP BY id
),
dec AS (
  SELECT piv.id, id % 5 = 0 AS injected, s0, s1, s2, s3,
         CASE WHEN id % 5 = 0 AND s0 <> 0 AND s1 <> 0
              THEN (l1.e - l0.e + 255) % 255 ELSE -1 END AS est_pos,
         CASE WHEN id % 5 = 0 THEN s0 ELSE 0 END AS est_val,
         l1.e AS le1, l2.e AS le2, l3.e AS le3
  FROM piv
  LEFT JOIN logt l0 ON l0.v = piv.s0
  LEFT JOIN logt l1 ON l1.v = piv.s1
  LEFT JOIN logt l2 ON l2.v = piv.s2
  LEFT JOIN logt l3 ON l3.v = piv.s3
)
SELECT CAST(id AS BIGINT) AS event_id, injected,
       CAST(est_pos AS INT) AS est_pos, CAST(est_val AS INT) AS est_val,
       CASE WHEN NOT injected
            THEN s0 = 0 AND s1 = 0 AND s2 = 0 AND s3 = 0
            ELSE est_pos = id % 20 AND est_val = 1 + (id * 7) % 255
                 AND le2 = (le1 + est_pos) % 255
                 AND le3 = (le2 + est_pos) % 255 END AS ok
FROM dec ORDER BY event_id
"""


@register_extra("reed_solomon_audit", _rs_oracle())
def reed_solomon_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reed-Solomon RS(20,16) over GF(2^8) — encode, single-symbol
    error injection, syndrome computation, and exact error LOCATION +
    VALUE recovery (the erasure-coding primitive under every modern
    storage layer: RAID-6, HDFS EC, object-store durability — a data
    platform auditing 100 TB of stripes runs exactly this syndrome
    pass). Non-systematic encoding c = m(x)*g(x) keeps the whole
    codec relational: the convolution is a 5-term fanout + bit_xor
    partial agg; syndromes S_i = XOR_j r_j*alpha^(ij) are one more
    fanout + agg; decode is pure log-index arithmetic
    (pos = log S1 - log S0, e = S0, consistency S3/S2 = S2/S1 =
    alpha^pos). The Spark plan is ZERO-Python and ZERO-join: GF
    lookups are element_at over 255-int literal arrays (constant-
    folded into codegen), shuffles are the two (id, key) partial
    aggregations. The oracle re-derives everything through VALUES-
    table joins. ok must be TRUE on every row — any false is an
    algebra break and hash-fatal."""
    exp, log = _gf_tables()
    g = _rs_generator(exp, log)
    expa = F.array(*[F.lit(v) for v in exp])
    loga = F.array(*[F.lit(log[v] if v else -1000) for v in range(256)])
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("event_id") % 3 == 0)
        .select(F.col("event_id").alias("id"))
    )
    msg = ev.select(
        "id", F.explode(F.array(*[F.lit(m) for m in range(16)])).alias("m")
    ).withColumn("b", (F.col("id") * (F.col("m") + 3) + F.col("m") * F.col("m") * 7) % 256)
    gdf = F.array(
        *[F.struct(F.lit(i).alias("gi"), F.lit(log[c]).alias("glog")) for i, c in enumerate(g)]
    )
    conv = (
        msg.select("id", "m", "b", F.explode(gdf).alias("g"))
        .select(
            "id",
            (F.col("m") + F.col("g.gi")).alias("j"),
            F.when(F.col("b") == 0, 0)
            .otherwise(
                F.element_at(
                    expa,
                    (
                        (
                            F.element_at(loga, F.col("b").cast("int") + 1)
                            + F.col("g.glog")
                        )
                        % 255
                    ).cast("int")
                    + 1,
                )
            )
            .alias("term"),
        )
    )
    cw = conv.groupBy("id", "j").agg(F.expr("bit_xor(term)").alias("c"))
    rx = cw.withColumn(
        "r",
        F.when(
            (F.col("id") % 5 == 0) & (F.col("j") == F.col("id") % 20),
            F.expr("c ^ (1 + (id * 7) % 255)"),
        ).otherwise(F.col("c")),
    )
    sterm = rx.select(
        "id",
        "r",
        "j",
        F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("i"),
    ).select(
        "id",
        "i",
        F.when(F.col("r") == 0, 0)
        .otherwise(
            F.element_at(
                expa,
                (
                    (
                        F.element_at(loga, F.col("r").cast("int") + 1)
                        + (F.col("i") * F.col("j")) % 255
                    )
                    % 255
                ).cast("int")
                + 1,
            )
        )
        .alias("term"),
    )
    snd = sterm.groupBy("id", "i").agg(F.expr("bit_xor(term)").alias("s"))
    piv = snd.groupBy("id").agg(
        *[
            F.max(F.when(F.col("i") == i, F.col("s"))).alias(f"s{i}")
            for i in range(4)
        ]
    )
    le = {
        k: F.when(
            F.col(f"s{k}") == 0, F.lit(None)
        ).otherwise(F.element_at(loga, F.col(f"s{k}").cast("int") + 1))
        for k in range(4)
    }
    injected = F.col("id") % 5 == 0
    est_pos = F.when(
        injected & (F.col("s0") != 0) & (F.col("s1") != 0),
        F.pmod(le[1] - le[0], F.lit(255)),
    ).otherwise(F.lit(-1))
    est_val = F.when(injected, F.col("s0")).otherwise(F.lit(0))
    out = piv.select(
        F.col("id").cast("long").alias("event_id"),
        injected.alias("injected"),
        est_pos.cast("int").alias("est_pos"),
        est_val.cast("int").alias("est_val"),
        F.when(
            ~injected,
            (F.col("s0") == 0)
            & (F.col("s1") == 0)
            & (F.col("s2") == 0)
            & (F.col("s3") == 0),
        )
        .otherwise(
            (est_pos == F.col("id") % 20)
            & (est_val == 1 + (F.col("id") * 7) % 255)
            & (le[2] == F.pmod(le[1] + est_pos, F.lit(255)))
            & (le[3] == F.pmod(le[2] + est_pos, F.lit(255)))
        )
        .alias("ok"),
    )
    return out.orderBy("event_id")


# --------------------------------------------------- binary rANS codec

# Asymmetric numeral systems (Duda) — the entropy coder inside zstd —
# in its binary rANS form, run as PURE CATALYST dataflow: 16 encode
# steps (x' = (x // f) * 8 + c + x % f over the M=8 table, f0=5/c0=0,
# f1=3/c1=5) unrolled into codegen column chains, then 16 decode
# steps that must reproduce the bit stream exactly (ANS is LIFO, so
# decode emits the encode-reversed order — the roundtrip flag is
# hash-fatal per doc). Bits are md5-derived with P(1) = 3/8, matching
# the model, so code_bits tracks the entropy H(3/8) ~ 0.954/bit. One
# block, no renormalization: x <= 8^16 < 2^48 stays in int64 (the
# streaming-renorm variant is a documented extension, not a silent
# cap). The oracle replays the encode walk as a recursive CTE.
_RANS_ORACLE = """
WITH RECURSIVE docs AS (
  SELECT event_id AS id FROM events WHERE event_id % 13 = 0
),
walk(id, k, x, ones) AS (
  SELECT id, 0, 1, 0 FROM docs
  UNION ALL
  SELECT w.id, w.k + 1,
         CASE WHEN ('0x' || substr(md5('an:' || CAST(w.id AS VARCHAR)
                    || ':' || CAST(16 - w.k AS VARCHAR)), 1, 6))::BIGINT
                   % 8 < 3
              THEN (w.x // 3) * 8 + 5 + w.x % 3
              ELSE (w.x // 5) * 8 + 0 + w.x % 5 END,
         w.ones + CASE WHEN ('0x' || substr(md5('an:'
                    || CAST(w.id AS VARCHAR) || ':'
                    || CAST(16 - w.k AS VARCHAR)), 1, 6))::BIGINT
                    % 8 < 3 THEN 1 ELSE 0 END
  FROM walk w WHERE w.k < 16
)
SELECT CAST(id AS BIGINT) AS doc_id,
       CAST(x AS BIGINT) AS final_state,
       CAST(length(bin(x)) AS INT) AS code_bits,
       CAST(ones AS INT) AS n_ones,
       true AS roundtrip_ok
FROM walk WHERE k = 16 ORDER BY doc_id
"""


@register_extra("rans_entropy_codec", _RANS_ORACLE)
def rans_entropy_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary rANS encode + decode roundtrip (see oracle comment),
    zero-Python: every state transition is a when() ladder in
    whole-stage codegen, 32 chained column steps total, no shuffle at
    all until the output sort. roundtrip_ok is computed by the ENGINE
    (decode must reproduce every bit); the oracle pins the encode
    walk value-exactly and asserts the roundtrip claim."""
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("event_id") % 13 == 0)
        .select(F.col("event_id").alias("doc_id"))
    )

    def bit(k: int) -> F.Column:
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("an:"),
                            F.col("doc_id").cast("string"),
                            F.lit(f":{k}"),
                        ).cast("binary")
                    ),
                    1,
                    6,
                ),
                16,
                10,
            ).cast("long")
            % 8
            < 3
        )

    df = ev
    for k in range(1, 17):
        df = df.withColumn(f"b{k}", bit(k).cast("int"))
    # encode bits 16..1 (LIFO) starting from x = 1
    df = df.withColumn("x", F.lit(1).cast("long"))
    for k in range(16, 0, -1):
        df = df.withColumn(
            "x",
            F.when(
                F.col(f"b{k}") == 1,
                F.expr("x div 3") * 8 + 5 + F.col("x") % 3,
            ).otherwise(
                F.expr("x div 5") * 8 + 0 + F.col("x") % 5
            ),
        )
    df = df.withColumn("final_state", F.col("x"))
    # decode forward: slot = x % 8; bit = slot >= 5; pop
    ok = F.lit(True)
    df = df.withColumn("y", F.col("final_state"))
    for k in range(1, 17):
        slot = F.col("y") % 8
        dbit = (slot >= 5).cast("int")
        df = (
            df.withColumn(f"d{k}", dbit)
            .withColumn(
                "y",
                F.when(
                    F.col(f"d{k}") == 1,
                    F.expr("y div 8") * 3 + (F.col("y") % 8) - 5,
                ).otherwise(
                    F.expr("y div 8") * 5 + (F.col("y") % 8)
                ),
            )
        )
        ok = ok & (F.col(f"d{k}") == F.col(f"b{k}"))
    return (
        df.select(
            "doc_id",
            "final_state",
            F.expr("length(bin(final_state))").cast("int").alias("code_bits"),
            sum(
                [F.col(f"b{k}") for k in range(2, 17)], F.col("b1")
            )
            .cast("int")
            .alias("n_ones"),
            (ok & (F.col("y") == 1)).alias("roundtrip_ok"),
        )
        .orderBy("doc_id")
    )


# ------------------------------------ Miller-Rabin primality audit

# Deterministic Miller-Rabin (Miller 1976 / Rabin 1980): for odd
# n < 1,373,653 the witness bases {2, 3} decide primality EXACTLY
# (Pomerance-Selfridge-Wagstaff) — that bound is precisely why the
# candidate lattice stops at 1,373,003. Candidates are md5-derived odd
# numbers plus three ENGINEERED strong-pseudoprime fixtures: 2047
# (= 23*89, passes base 2), and 703 (= 19*37) and 121 (= 11^2), which
# pass base 3 — so the per-base columns prove the d*2^s decomposition
# and the squaring chain are genuinely exercised, hash-fatally. All
# arithmetic is int64 (n < 2^21 -> products < 2^42). A base dividing n
# (3 | n) is treated as a vacuous pass; base 2 then decides.
_MR_ORACLE = """
WITH RECURSIVE cand AS MATERIALIZED (
  SELECT DISTINCT 3 + 2 * (('0x' || substr(md5('pr:'
           || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % 685000) AS n
  FROM events
  UNION
  SELECT unnest([2047, 703, 121]) AS n
),
dec AS MATERIALIZED (
  -- n - 1 = d * 2^s with d odd
  SELECT n, (n - 1) // ((n - 1) & (-(n - 1))) AS d,
         CAST(log2((n - 1) & (-(n - 1))) AS BIGINT) AS s
  FROM cand
),
base AS MATERIALIZED (
  SELECT n, d, s, unnest([2, 3]) AS a FROM dec
),
-- phase 1: x = a^d mod n by square-and-multiply over d's 21 bits
me(n, d, s, a, k, r, p) AS (
  SELECT n, d, s, a, 0, CAST(1 AS BIGINT), CAST(a % n AS BIGINT)
  FROM base
  UNION ALL
  SELECT n, d, s, a, k + 1,
         CASE WHEN ((d >> k) & 1) = 1 THEN r * p % n ELSE r END,
         p * p % n
  FROM me WHERE k < 21
),
x0 AS MATERIALIZED (
  SELECT n, s, a, r AS x FROM me WHERE k = 21
),
-- phase 2: up to s-1 squarings hunting for x == n-1
sq(n, s, a, j, x, ok) AS (
  SELECT n, s, a, 0, x,
         CASE WHEN a % n = 0 OR x = 1 OR x = n - 1 THEN 1 ELSE 0 END
  FROM x0
  UNION ALL
  SELECT n, s, a, j + 1, x * x % n,
         CASE WHEN ok = 1 OR (x * x % n) = n - 1 THEN 1 ELSE 0 END
  FROM sq WHERE ok = 0 AND j < s - 1
),
fin AS MATERIALIZED (
  SELECT n, a, max(ok) AS pass
  FROM sq GROUP BY n, a
)
SELECT CAST(f.n AS BIGINT) AS n,
       CAST(max(CASE WHEN a = 2 THEN pass END) AS INT) AS passes_b2,
       CAST(max(CASE WHEN a = 3 THEN pass END) AS INT) AS passes_b3,
       CAST(min(pass) AS INT) AS is_prime
FROM fin f GROUP BY f.n
ORDER BY n
"""


@register_extra("miller_rabin_audit", _MR_ORACLE)
def miller_rabin_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Miller-Rabin verdicts (see oracle comment). Spark
    runs both phases as single-level higher-order folds per candidate
    (21-step square-and-multiply, then a flag-guarded 20-step squaring
    chain) — zero joins, zero Python, whole rows stay in one map
    stage; the oracle replays the identical recurrences as recursive
    CTEs. tests/test_sketches.py referees the verdicts against trial
    division."""
    ev = _t(spark, sf_dir, "events")
    cand = (
        ev.select(
            (
                3
                + 2
                * (
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.lit("pr:"),
                                    F.col("event_id").cast("string"),
                                ).cast("binary")
                            ),
                            1,
                            8,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % 685000
                )
            ).alias("n")
        )
        .union(
            ev.sparkSession.createDataFrame(
                [(2047,), (703,), (121,)], "n long"
            )
        )
        .distinct()
    )
    dec = cand.selectExpr(
        "n",
        "(n - 1) div ((n - 1) & (-(n - 1))) AS d",
        "CAST(log2(CAST((n - 1) & (-(n - 1)) AS DOUBLE)) AS BIGINT) AS s",
    )
    base = dec.selectExpr("n", "d", "s", "explode(array(2L, 3L)) AS a")
    x0 = base.withColumn(
        "x",
        F.expr(
            "aggregate(sequence(0, 20),"
            " named_struct('r', 1L, 'p', a % n),"
            " (acc, k) -> named_struct("
            "   'r', IF(((d >> k) & 1) = 1, acc.r * acc.p % n, acc.r),"
            "   'p', acc.p * acc.p % n),"
            " acc -> acc.r)"
        ),
    )
    fin = x0.withColumn(
        "pass",
        F.expr(
            "aggregate(sequence(1, 20),"
            " named_struct('x', x, 'j', 0L,"
            "   'ok', IF(a % n = 0 OR x = 1 OR x = n - 1, 1L, 0L)),"
            " (acc, k) -> IF(acc.ok = 1 OR acc.j >= s - 1, acc,"
            "   named_struct('x', acc.x * acc.x % n, 'j', acc.j + 1,"
            "     'ok', IF(acc.x * acc.x % n = n - 1, 1L, 0L))),"
            " acc -> acc.ok)"
        ),
    )
    return (
        fin.groupBy("n")
        .agg(
            F.max(F.when(F.col("a") == 2, F.col("pass")))
            .cast("int")
            .alias("passes_b2"),
            F.max(F.when(F.col("a") == 3, F.col("pass")))
            .cast("int")
            .alias("passes_b3"),
            F.min("pass").cast("int").alias("is_prime"),
        )
        .select(F.col("n").cast("long"), "passes_b2", "passes_b3", "is_prime")
        .orderBy("n")
    )


# ------------------------------------ Berlekamp-Massey complexity

# Berlekamp-Massey over GF(2) (Massey 1969) — THE attack on stream
# ciphers and the decoder core of Reed-Solomon: finds the shortest
# LFSR generating a bit sequence. State rides as pure bitmasks
# (connection poly C, previous poly B, shift register reg; degree
# invariants keep everything < 2^31, shifted products < 2^61, so
# int64 is exact). 30-bit md5 sequences (expected complexity ~ n/2)
# plus four ENGINEERED fixtures whose known complexity is hash-
# frozen: the x^4+x+1 and x^5+x^2+1 LFSR streams must come back as
# L=4 (C=25) and L=5 (C=41), all-ones as L=1, alternating as L=2 —
# if the discrepancy/update algebra drifts anywhere, these rows
# break. tests referee against an independent Python BM.
_BM_FIXTURES = [
    (-1, 986248593),   # x^4+x+1 LFSR  -> L=4
    (-2, 91635305),    # x^5+x^2+1     -> L=5
    (-3, 1073741823),  # all ones      -> L=1
    (-4, 357913941),   # alternating   -> L=2
]

_BM_ORACLE = """
WITH RECURSIVE grp AS MATERIALIZED (
  SELECT DISTINCT p_partkey % 40 AS g FROM part
),
seqs AS MATERIALIZED (
  SELECT g, ('0x' || substr(md5('bm:' || CAST(g AS VARCHAR)),
                            1, 8))::BIGINT % 1073741824 AS bits
  FROM grp
  UNION ALL
  SELECT * FROM (VALUES """ + ", ".join(
    f"({g}, {b})" for g, b in _BM_FIXTURES
) + """) v(g, bits)
),
st(g, bits, i, c, b, l, m, reg) AS (
  SELECT g, bits, 0, CAST(1 AS BIGINT), CAST(1 AS BIGINT),
         CAST(0 AS BIGINT), CAST(1 AS BIGINT), CAST(0 AS BIGINT)
  FROM seqs
  UNION ALL
  SELECT g, bits, i + 1,
         CASE WHEN d = 1 THEN xor(c, b << m) ELSE c END,
         CASE WHEN d = 1 AND 2 * l <= i THEN c ELSE b END,
         CASE WHEN d = 1 AND 2 * l <= i THEN i + 1 - l ELSE l END,
         CASE WHEN d = 1 AND 2 * l <= i THEN CAST(1 AS BIGINT)
              ELSE m + 1 END,
         ((reg << 1) | si) % 1073741824
  FROM (
    SELECT *, (bits >> i) & 1 AS si,
           xor((bits >> i) & 1,
               bit_count((c >> 1) & reg) % 2) AS d
    FROM st WHERE i < 30
  )
)
SELECT CAST(g AS BIGINT) AS g, CAST(bits AS BIGINT) AS bits,
       CAST(l AS BIGINT) AS complexity,
       CAST(c AS BIGINT) AS conn_poly
FROM st WHERE i = 30
ORDER BY g
"""


@register_extra("berlekamp_massey_lfsr", _BM_ORACLE)
def berlekamp_massey_lfsr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Berlekamp-Massey linear-complexity profile (see oracle
    comment). Spark runs the 30-step state machine as ONE zero-join
    higher-order fold per sequence (bitmask struct accumulator);
    the oracle replays it as a recursive CTE. Per-row map work —
    embarrassingly parallel at any scale."""
    p = _t(spark, sf_dir, "part")
    grp = p.select((F.col("p_partkey") % 40).alias("g")).distinct()
    seqs = grp.select(
        "g",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("bm:"), F.col("g").cast("string")
                        ).cast("binary")
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 1073741824
        ).alias("bits"),
    ).unionByName(
        p.sparkSession.createDataFrame(_BM_FIXTURES, "g long, bits long")
    )
    fold = (
        "aggregate(sequence(0, 29),"
        " named_struct('c', 1L, 'b', 1L, 'l', 0L, 'm', 1L, 'reg', 0L),"
        " (a, i) -> IF("
        "   ((bits >> i) & 1) ^ (bit_count((a.c >> 1) & a.reg) % 2) = 1,"
        "   IF(2 * a.l <= i,"
        "     named_struct('c', a.c ^ (a.b << a.m), 'b', a.c,"
        "       'l', i + 1 - a.l, 'm', 1L,"
        "       'reg', ((a.reg << 1) | ((bits >> i) & 1)) % 1073741824),"
        "     named_struct('c', a.c ^ (a.b << a.m), 'b', a.b,"
        "       'l', a.l, 'm', a.m + 1,"
        "       'reg', ((a.reg << 1) | ((bits >> i) & 1)) % 1073741824)),"
        "   named_struct('c', a.c, 'b', a.b, 'l', a.l, 'm', a.m + 1,"
        "     'reg', ((a.reg << 1) | ((bits >> i) & 1)) % 1073741824)))"
    )
    return (
        seqs.withColumn("st", F.expr(fold))
        .select(
            F.col("g").cast("long"),
            F.col("bits").cast("long"),
            F.col("st.l").cast("long").alias("complexity"),
            F.col("st.c").cast("long").alias("conn_poly"),
        )
        .orderBy("g")
    )


# ------------------------------------ GF(2) rank / XOR basis

# Gaussian elimination over GF(2) as an XOR-basis insertion machine —
# the exact linear algebra under LFSR cryptanalysis, XOR sketch
# recovery, and network coding: rank of 16x16 bit matrices whose rows
# are md5 words, plus engineered fixtures (identity -> 16, zero -> 0,
# repeated row -> 1, and a constructed dependency row -> 15). The
# classic insertion loop (reduce by the basis vector at the leading
# bit or claim the slot) flattens into ONE fold over 256 (row,
# bit-position) steps with the 16-slot basis array as state — exact
# bitmask algebra, identical in both engines, basis checksum
# hash-frozen.
_GF2_FIXTURES = [
    (-1, [1 << j for j in range(16)]),
    (-2, [0] * 16),
    (-3, [0x5555] * 16),
    (-4, [1 << j for j in range(15)] + [3]),
]

_GF2_ORACLE = """
WITH RECURSIVE grp AS MATERIALIZED (
  SELECT DISTINCT p_partkey % 50 AS g FROM part
),
mats AS MATERIALIZED (
  SELECT g, list(('0x' || substr(md5('gr:' || CAST(g AS VARCHAR) || ':'
                    || CAST(j AS VARCHAR)), 1, 4))::BIGINT % 65536
                 ORDER BY j) AS rows
  FROM grp, (SELECT unnest(generate_series(0, 15)) AS j)
  GROUP BY g
  UNION ALL
  SELECT * FROM (VALUES """ + ", ".join(
    "({}, {})".format(
        g, "[" + ", ".join(f"CAST({v} AS BIGINT)" for v in rows) + "]"
    )
    for g, rows in _GF2_FIXTURES
) + """) v(g, rows)
),
st(g, rows, t, slots, rnk, cur) AS (
  SELECT g, rows, 0,
         [CAST(0 AS BIGINT), 0, 0, 0, 0, 0, 0, 0,
          0, 0, 0, 0, 0, 0, 0, 0],
         CAST(0 AS BIGINT), CAST(0 AS BIGINT)
  FROM mats
  UNION ALL
  SELECT g, rows, t + 1,
         CASE WHEN hit = 1 AND slotv = 0
              THEN list_transform(slots, (v, i) ->
                     CASE WHEN i = bit + 1 THEN c0 ELSE v END)
              ELSE slots END,
         rnk + CASE WHEN hit = 1 AND slotv = 0 THEN 1 ELSE 0 END,
         CASE WHEN hit = 0 THEN c0
              WHEN slotv = 0 THEN 0
              ELSE xor(c0, slotv) END
  FROM (
    SELECT *, CASE WHEN (c0 >> bit) & 1 = 1 THEN 1 ELSE 0 END AS hit,
           slots[bit + 1] AS slotv
    FROM (
      SELECT *, 15 - (t % 16) AS bit,
             CASE WHEN t % 16 = 0 THEN rows[t // 16 + 1]
                  ELSE cur END AS c0
      FROM st WHERE t < 256
    )
  )
)
SELECT CAST(g AS BIGINT) AS g, CAST(rnk AS INT) AS rank_gf2,
       CAST(CASE WHEN rnk = 16 THEN 1 ELSE 0 END AS INT) AS invertible,
       CAST(list_sum(slots) AS BIGINT) AS basis_chk
FROM st WHERE t = 256
ORDER BY g
"""


@register_extra("gf2_matrix_rank", _GF2_ORACLE)
def gf2_matrix_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GF(2) rank via an XOR-basis fold (see oracle comment). Spark
    runs the 256-step machine as one higher-order aggregate per
    matrix; the oracle is the identical recursive CTE. Map-only at
    any scale."""
    p = _t(spark, sf_dir, "part")
    grp = p.select((F.col("p_partkey") % 50).alias("g")).distinct()
    js = p.sparkSession.range(0, 16).select(F.col("id").cast("int").alias("j"))
    mats = (
        grp.crossJoin(F.broadcast(js))
        .select(
            "g",
            "j",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("gr:"),
                                F.col("g").cast("string"),
                                F.lit(":"),
                                F.col("j").cast("string"),
                            ).cast("binary")
                        ),
                        1,
                        4,
                    ),
                    16,
                    10,
                ).cast("long")
                % 65536
            ).alias("row"),
        )
        .groupBy("g")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(j, row))),"
                " x -> x.row)"
            ).alias("rows")
        )
        .unionByName(
            p.sparkSession.createDataFrame(
                _GF2_FIXTURES, "g long, rows array<long>"
            )
        )
    )
    fold = (
        "aggregate(sequence(0, 255),"
        " named_struct('slots', array_repeat(0L, 16), 'rnk', 0L,"
        "              'cur', 0L),"
        " (a, t) -> "
        "  IF(((IF(t % 16 = 0, element_at(rows, CAST(t div 16 AS INT) + 1),"
        "          a.cur) >> (15 - t % 16)) & 1) = 0,"
        "    named_struct('slots', a.slots, 'rnk', a.rnk,"
        "      'cur', IF(t % 16 = 0,"
        "                element_at(rows, CAST(t div 16 AS INT) + 1),"
        "                a.cur)),"
        "    IF(element_at(a.slots, CAST(15 - t % 16 AS INT) + 1) = 0,"
        "      named_struct("
        "        'slots', transform(a.slots, (v, i) ->"
        "          IF(i = 15 - t % 16,"
        "             IF(t % 16 = 0,"
        "                element_at(rows, CAST(t div 16 AS INT) + 1),"
        "                a.cur), v)),"
        "        'rnk', a.rnk + 1, 'cur', 0L),"
        "      named_struct('slots', a.slots, 'rnk', a.rnk,"
        "        'cur', IF(t % 16 = 0,"
        "                  element_at(rows, CAST(t div 16 AS INT) + 1),"
        "                  a.cur)"
        "               ^ element_at(a.slots, CAST(15 - t % 16 AS INT) + 1)))))"
    )
    return (
        mats.withColumn("st", F.expr(fold))
        .select(
            F.col("g").cast("long"),
            F.col("st.rnk").cast("int").alias("rank_gf2"),
            F.when(F.col("st.rnk") == 16, 1).otherwise(0).cast("int")
            .alias("invertible"),
            F.expr("aggregate(st.slots, 0L, (a, x) -> a + x)")
            .cast("long")
            .alias("basis_chk"),
        )
        .orderBy("g")
    )


# ------------------------------------------------ CORDIC rotation

# CORDIC (Volder 1959) — the shift-and-add trig engine inside FPUs,
# DSPs and HP calculators: rotate (K, 0) through angle z using only
# adds and arithmetic shifts, steering by the residual-angle sign
# against the frozen atan(2^-i) Q26 table (shared literal in both
# engines, so no transcendental ever crosses). 14 iterations give
# ~2^-14 angle resolution; x,y land on cos/sin scaled by 2^26
# EXACTLY bit-identically in both engines (Spark's shiftright and
# DuckDB's >> are both ARITHMETIC shifts — note DuckDB's // would
# NOT work: it truncates toward zero on negatives, >> floors).
# Angles are md5 fractions of [0, pi/2); tests referee against
# math.cos/sin within the CORDIC error bound.
_CORDIC_ATAN = [
    52707179, 31114864, 16440240, 8345322, 4188855, 2096470,
    1048491, 524277, 262143, 131072, 65536, 32768, 16384, 8192,
]
_CORDIC_X0 = 40752055  # K * 2^26

_CORDIC_ORACLE = """
WITH RECURSIVE grp AS MATERIALIZED (
  SELECT DISTINCT p_partkey % 200 AS g FROM part
),
ang AS MATERIALIZED (
  SELECT g, ('0x' || substr(md5('cg:' || CAST(g AS VARCHAR)),
                            1, 8))::BIGINT % 105414357 AS z0
  FROM grp
),
tab AS MATERIALIZED (
  SELECT [""" + ", ".join(f"CAST({v} AS BIGINT)" for v in _CORDIC_ATAN) + """] AS at
),
st(g, z0, i, x, y, z) AS (
  SELECT g, z0, 0, CAST(""" + str(_CORDIC_X0) + """ AS BIGINT),
         CAST(0 AS BIGINT), z0
  FROM ang
  UNION ALL
  SELECT g, z0, i + 1,
         x - d * (y >> i),
         y + d * (x >> i),
         z - d * t.at[i + 1]
  FROM (
    SELECT s.*, CASE WHEN s.z >= 0 THEN 1 ELSE -1 END AS d
    FROM st s WHERE s.i < 14
  ) CROSS JOIN tab t
)
SELECT CAST(g AS BIGINT) AS g, CAST(z0 AS BIGINT) AS angle_q26,
       CAST(x AS BIGINT) AS cos_q26, CAST(y AS BIGINT) AS sin_q26,
       CAST(z AS BIGINT) AS residual_z
FROM st WHERE i = 14
ORDER BY g
"""


@register_extra("cordic_rotation", _CORDIC_ORACLE)
def cordic_rotation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORDIC shift-and-add rotation (see oracle comment). One
    14-step higher-order fold per angle in Spark, the identical
    recursive CTE in DuckDB — map-only, exact integers."""
    p = _t(spark, sf_dir, "part")
    grp = p.select((F.col("p_partkey") % 200).alias("g")).distinct()
    ang = grp.select(
        "g",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("cg:"), F.col("g").cast("string")
                        ).cast("binary")
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 105414357
        ).alias("z0"),
    )
    tab = "array(" + ",".join(f"{v}L" for v in _CORDIC_ATAN) + ")"
    fold = (
        f"aggregate(sequence(0, 13),"
        f" named_struct('x', {_CORDIC_X0}L, 'y', 0L, 'z', z0),"
        f" (a, i) -> named_struct("
        f"   'x', a.x - IF(a.z >= 0, 1L, -1L) * shiftright(a.y, CAST(i AS INT)),"
        f"   'y', a.y + IF(a.z >= 0, 1L, -1L) * shiftright(a.x, CAST(i AS INT)),"
        f"   'z', a.z - IF(a.z >= 0, 1L, -1L)"
        f"        * element_at({tab}, CAST(i AS INT) + 1)))"
    )
    return (
        ang.withColumn("st", F.expr(fold))
        .select(
            F.col("g").cast("long"),
            F.col("z0").cast("long").alias("angle_q26"),
            F.col("st.x").cast("long").alias("cos_q26"),
            F.col("st.y").cast("long").alias("sin_q26"),
            F.col("st.z").cast("long").alias("residual_z"),
        )
        .orderBy("g")
    )


# ------------------------------------ Verhoeff vs Luhn transpositions

# Verhoeff's dihedral checksum (1969) — the first scheme to catch
# EVERY single-digit error AND every adjacent transposition, by
# replacing mod-10 addition with the non-commutative dihedral group
# D5 (multiplication table d, position permutation p, both frozen
# literals shared by the engines; check digit of payload 236 is the
# textbook 3). Each account gets 10 md5 digits, a Verhoeff and a Luhn
# check digit, and all 10 adjacent swaps of each protected number are
# replayed through validation: v_missed is hash-frozen at 0 (the
# theorem), while Luhn misses exactly the 09<->90 swaps — the reason
# Verhoeff exists, visible per row.
_VH_D = [0,1,2,3,4,5,6,7,8,9,1,2,3,4,0,6,7,8,9,5,2,3,4,0,1,7,8,9,5,6,
         3,4,0,1,2,8,9,5,6,7,4,0,1,2,3,9,5,6,7,8,5,9,8,7,6,0,4,3,2,1,
         6,5,9,8,7,1,0,4,3,2,7,6,5,9,8,2,1,0,4,3,8,7,6,5,9,3,2,1,0,4,
         9,8,7,6,5,4,3,2,1,0]
_VH_P = [0,1,2,3,4,5,6,7,8,9,1,5,7,6,2,8,3,0,9,4,5,8,0,3,7,9,6,1,4,2,
         8,9,1,6,0,4,3,5,2,7,9,4,5,3,1,2,6,8,7,0,4,2,8,6,5,7,3,9,0,1,
         2,7,9,3,8,0,6,4,1,5,7,0,4,6,9,1,3,2,5,8]
_VH_INV = [0,4,3,2,1,5,6,7,8,9]


def _vh_sql_lists():
    dt = "[" + ",".join(str(v) for v in _VH_D) + "]"
    pt = "[" + ",".join(str(v) for v in _VH_P) + "]"
    iv = "[" + ",".join(str(v) for v in _VH_INV) + "]"
    return dt, pt, iv


_VH_DT, _VH_PT, _VH_IV = _vh_sql_lists()

_VERHOEFF_ORACLE = f"""
WITH RECURSIVE grp AS MATERIALIZED (
  SELECT DISTINCT c_custkey % 300 AS g FROM customer
),
pay AS MATERIALIZED (
  SELECT g, list(('0x' || substr(md5('vd:' || CAST(g AS VARCHAR) || ':'
                    || CAST(i AS VARCHAR)), 1, 4))::BIGINT % 10
                 ORDER BY i) AS pd
  FROM grp, (SELECT unnest(generate_series(1, 10)) AS i)
  GROUP BY g
),
-- Verhoeff check digit: fold right-to-left at positions i+1
cd(g, pd, i, c) AS (
  SELECT g, pd, 0, 0 FROM pay
  UNION ALL
  SELECT g, pd, i + 1,
         ({_VH_DT})[c * 10
           + ({_VH_PT})[((i + 1) % 8) * 10 + pd[10 - i] + 1] + 1]
  FROM cd WHERE i < 10
),
prot AS MATERIALIZED (
  SELECT c.g, c.pd,
         list_append(c.pd, ({_VH_IV})[c.c + 1]) AS vfull,
         list_append(c.pd, l.lcd) AS lfull
  FROM cd c
  JOIN (
    SELECT g, CAST((10 - sum(CASE WHEN (11 - i) % 2 = 1
                     THEN CASE WHEN pd[i] * 2 > 9 THEN pd[i] * 2 - 9
                               ELSE pd[i] * 2 END
                     ELSE pd[i] END) % 10) % 10 AS BIGINT) AS lcd
    FROM pay, (SELECT unnest(generate_series(1, 10)) AS i)
    GROUP BY g
  ) l ON l.g = c.g
  WHERE c.i = 10
),
variants AS MATERIALIZED (
  SELECT g, sp,
         list_transform(vfull, (v, j) ->
           CASE WHEN j = sp THEN vfull[sp + 1]
                WHEN j = sp + 1 THEN vfull[sp] ELSE v END) AS vv,
         list_transform(lfull, (v, j) ->
           CASE WHEN j = sp THEN lfull[sp + 1]
                WHEN j = sp + 1 THEN lfull[sp] ELSE v END) AS lv,
         vfull[sp] <> vfull[sp + 1] AS veff,
         lfull[sp] <> lfull[sp + 1] AS leff
  FROM prot, (SELECT unnest(generate_series(1, 10)) AS sp) s
),
vcheck(g, sp, vv, veff, i, c) AS (
  SELECT g, sp, vv, veff, 0, 0 FROM variants
  UNION ALL
  SELECT g, sp, vv, veff, i + 1,
         ({_VH_DT})[c * 10
           + ({_VH_PT})[(i % 8) * 10 + vv[11 - i] + 1] + 1]
  FROM vcheck WHERE i < 11
),
vres AS MATERIALIZED (
  SELECT g, sum(CASE WHEN veff THEN 1 ELSE 0 END) AS n_eff_v,
         sum(CASE WHEN veff AND c = 0 THEN 1 ELSE 0 END) AS v_missed
  FROM vcheck WHERE i = 11 GROUP BY g
),
lres AS MATERIALIZED (
  SELECT v.g, sum(CASE WHEN v.leff THEN 1 ELSE 0 END) AS n_eff_l,
         sum(CASE WHEN v.leff AND s.s10 = 0 THEN 1 ELSE 0 END) AS l_missed
  FROM variants v
  JOIN (
    SELECT g, sp,
           sum(CASE WHEN (11 - i) % 2 = 1
               THEN CASE WHEN lv[i] * 2 > 9 THEN lv[i] * 2 - 9
                         ELSE lv[i] * 2 END
               ELSE lv[i] END) % 10 AS s10
    FROM variants, (SELECT unnest(generate_series(1, 11)) AS i)
    GROUP BY g, sp
  ) s ON s.g = v.g AND s.sp = v.sp
  GROUP BY v.g
)
SELECT CAST(p.g AS BIGINT) AS g,
       CAST(p.vfull[11] AS INT) AS verhoeff_cd,
       CAST(p.lfull[11] AS INT) AS luhn_cd,
       CAST(v.n_eff_v AS BIGINT) AS n_eff_swaps_v,
       CAST(v.v_missed AS BIGINT) AS verhoeff_missed,
       CAST(l.n_eff_l AS BIGINT) AS n_eff_swaps_l,
       CAST(l.l_missed AS BIGINT) AS luhn_missed
FROM prot p
JOIN vres v ON v.g = p.g
JOIN lres l ON l.g = p.g
ORDER BY g
"""


@register_extra("verhoeff_luhn_transpositions", _VERHOEFF_ORACLE)
def verhoeff_luhn_transpositions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Verhoeff vs Luhn adjacent-transposition audit (see oracle
    comment). Spark builds digit arrays once, runs the dihedral fold
    as higher-order aggregates over the 11 swap variants (map-only),
    Luhn as a positional parity sum; the oracle replays both as
    recursive CTE / unnest sums."""
    c = _t(spark, sf_dir, "customer")
    grp = c.select((F.col("c_custkey") % 300).alias("g")).distinct()
    iss = c.sparkSession.range(1, 11).select(
        F.col("id").cast("int").alias("i")
    )
    pay = (
        grp.crossJoin(F.broadcast(iss))
        .select(
            "g",
            "i",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("vd:"),
                                F.col("g").cast("string"),
                                F.lit(":"),
                                F.col("i").cast("string"),
                            ).cast("binary")
                        ),
                        1,
                        4,
                    ),
                    16,
                    10,
                ).cast("long")
                % 10
            ).alias("dig"),
        )
        .groupBy("g")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(i, dig))),"
                " x -> x.dig)"
            ).alias("pd")
        )
    )
    dt = "array(" + ",".join(f"{v}L" for v in _VH_D) + ")"
    pt = "array(" + ",".join(f"{v}L" for v in _VH_P) + ")"
    iv = "array(" + ",".join(f"{v}L" for v in _VH_INV) + ")"
    # Verhoeff check digit for the 10-digit payload (positions i+1)
    vcd = (
        f"element_at({iv}, CAST(aggregate(sequence(0, 9), 0L, (c, i) ->"
        f" element_at({dt}, CAST(c * 10 +"
        f"   element_at({pt}, CAST(((i + 1) % 8) * 10 +"
        f"     element_at(pd, CAST(10 - i AS INT)) + 1 AS INT))"
        f"   + 1 AS INT))) AS INT) + 1)"
    )
    lcd = (
        "CAST((10 - aggregate(sequence(1, 10), 0L, (s, i) ->"
        " s + IF((11 - i) % 2 = 1,"
        "   IF(element_at(pd, CAST(i AS INT)) * 2 > 9,"
        "      element_at(pd, CAST(i AS INT)) * 2 - 9,"
        "      element_at(pd, CAST(i AS INT)) * 2),"
        "   element_at(pd, CAST(i AS INT)))) % 10) % 10 AS BIGINT)"
    )
    prot = pay.withColumn(
        "vfull", F.expr(f"concat(pd, array({vcd}))")
    ).withColumn("lfull", F.expr(f"concat(pd, array({lcd}))"))
    sps = c.sparkSession.range(1, 11).select(
        F.col("id").cast("int").alias("sp")
    )
    var = prot.crossJoin(F.broadcast(sps)).select(
        "g",
        "sp",
        "vfull",
        "lfull",
        F.expr(
            "transform(vfull, (v, j) ->"
            " CASE WHEN j + 1 = sp THEN element_at(vfull, sp + 1)"
            "      WHEN j = sp THEN element_at(vfull, sp)"
            "      ELSE v END)"
        ).alias("vv"),
        F.expr(
            "transform(lfull, (v, j) ->"
            " CASE WHEN j + 1 = sp THEN element_at(lfull, sp + 1)"
            "      WHEN j = sp THEN element_at(lfull, sp)"
            "      ELSE v END)"
        ).alias("lv"),
        F.expr("element_at(vfull, sp) <> element_at(vfull, sp + 1)").alias(
            "veff"
        ),
        F.expr("element_at(lfull, sp) <> element_at(lfull, sp + 1)").alias(
            "leff"
        ),
    )
    vvalid = (
        f"aggregate(sequence(0, 10), 0L, (c, i) ->"
        f" element_at({dt}, CAST(c * 10 +"
        f"   element_at({pt}, CAST((i % 8) * 10 +"
        f"     element_at(vv, CAST(11 - i AS INT)) + 1 AS INT))"
        f"   + 1 AS INT)))"
    )
    lsum = (
        "aggregate(sequence(1, 11), 0L, (s, i) ->"
        " s + IF((11 - i) % 2 = 1,"
        "   IF(element_at(lv, CAST(i AS INT)) * 2 > 9,"
        "      element_at(lv, CAST(i AS INT)) * 2 - 9,"
        "      element_at(lv, CAST(i AS INT)) * 2),"
        "   element_at(lv, CAST(i AS INT)))) % 10"
    )
    res = (
        var.withColumn("vchk", F.expr(vvalid))
        .withColumn("ls", F.expr(lsum))
        .groupBy("g")
        .agg(
            F.sum(F.when(F.col("veff"), 1).otherwise(0)).alias("n_eff_v"),
            F.sum(
                F.when(F.col("veff") & (F.col("vchk") == 0), 1).otherwise(0)
            ).alias("v_missed"),
            F.sum(F.when(F.col("leff"), 1).otherwise(0)).alias("n_eff_l"),
            F.sum(
                F.when(F.col("leff") & (F.col("ls") == 0), 1).otherwise(0)
            ).alias("l_missed"),
        )
    )
    return (
        prot.join(res, "g")
        .select(
            F.col("g").cast("long"),
            F.expr("element_at(vfull, 11)").cast("int").alias("verhoeff_cd"),
            F.expr("element_at(lfull, 11)").cast("int").alias("luhn_cd"),
            F.col("n_eff_v").cast("long").alias("n_eff_swaps_v"),
            F.col("v_missed").cast("long").alias("verhoeff_missed"),
            F.col("n_eff_l").cast("long").alias("n_eff_swaps_l"),
            F.col("l_missed").cast("long").alias("luhn_missed"),
        )
        .orderBy("g")
    )


# ------------------------------------ extended Euclid / Bezout

# Extended Euclidean algorithm — gcd plus the Bezout certificate
# a*x + b*y = g, and the modular inverse when gcd = 1 (the key-setup
# primitive under RSA/CRT). The fold carries (r0, r1, s0, s1, t0, t1)
# through 45 quotient steps (Fibonacci worst case for a, b < 2^31 is
# 45 divisions; converged state is a fixpoint so extra steps are
# no-ops). The Bezout identity itself is recomputed as a column and
# hash-frozen (bezout_ok = 1), so any drift in the fold algebra is
# fatal. Inputs are md5 pairs; b is forced odd so inverses mod b
# exist for even a.
_EGCD_ORACLE = """
WITH RECURSIVE grp AS MATERIALIZED (
  SELECT DISTINCT s_suppkey % 200 AS g FROM supplier
),
ab AS MATERIALIZED (
  SELECT g,
         1 + ('0x' || substr(md5('ea:' || CAST(g AS VARCHAR)),
                             1, 8))::BIGINT % 2147483646 AS a,
         1 + 2 * (('0x' || substr(md5('eb:' || CAST(g AS VARCHAR)),
                                  1, 8))::BIGINT % 1073741823) AS b
  FROM grp
),
st(g, a, b, i, r0, r1, s0, s1, t0, t1) AS (
  SELECT g, a, b, 0, a, b,
         CAST(1 AS BIGINT), CAST(0 AS BIGINT),
         CAST(0 AS BIGINT), CAST(1 AS BIGINT)
  FROM ab
  UNION ALL
  SELECT g, a, b, i + 1,
         CASE WHEN r1 = 0 THEN r0 ELSE r1 END,
         CASE WHEN r1 = 0 THEN r1 ELSE r0 - (r0 // r1) * r1 END,
         CASE WHEN r1 = 0 THEN s0 ELSE s1 END,
         CASE WHEN r1 = 0 THEN s1 ELSE s0 - (r0 // r1) * s1 END,
         CASE WHEN r1 = 0 THEN t0 ELSE t1 END,
         CASE WHEN r1 = 0 THEN t1 ELSE t0 - (r0 // r1) * t1 END
  FROM st WHERE i < 45
)
SELECT CAST(g AS BIGINT) AS g, CAST(a AS BIGINT) AS a,
       CAST(b AS BIGINT) AS b, CAST(r0 AS BIGINT) AS gcd,
       CAST(s0 AS BIGINT) AS bez_x, CAST(t0 AS BIGINT) AS bez_y,
       CAST(CASE WHEN a * s0 + b * t0 = r0 THEN 1 ELSE 0 END AS INT)
         AS bezout_ok,
       CAST(CASE WHEN r0 = 1 THEN ((s0 % b) + b) % b END AS BIGINT)
         AS inv_a_mod_b
FROM st WHERE i = 45
ORDER BY g
"""


@register_extra("extended_euclid_bezout", _EGCD_ORACLE)
def extended_euclid_bezout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended Euclid with the Bezout certificate hash-frozen (see
    oracle comment). One 45-step higher-order fold per pair in Spark,
    the identical recursive CTE in DuckDB; quotients use positive
    operands only, so trunc-vs-floor division differences cannot
    arise."""
    s = _t(spark, sf_dir, "supplier")
    grp = s.select((F.col("s_suppkey") % 200).alias("g")).distinct()

    def _h8(prefix: str) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(prefix), F.col("g").cast("string")
                    ).cast("binary")
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")

    ab = grp.select(
        "g",
        (1 + _h8("ea:") % 2147483646).alias("a"),
        (1 + 2 * (_h8("eb:") % 1073741823)).alias("b"),
    )
    fold = (
        "aggregate(sequence(1, 45),"
        " named_struct('r0', a, 'r1', b, 's0', 1L, 's1', 0L,"
        "              't0', 0L, 't1', 1L),"
        " (x, i) -> IF(x.r1 = 0, x,"
        "   named_struct("
        "     'r0', x.r1, 'r1', x.r0 - (x.r0 div x.r1) * x.r1,"
        "     's0', x.s1, 's1', x.s0 - (x.r0 div x.r1) * x.s1,"
        "     't0', x.t1, 't1', x.t0 - (x.r0 div x.r1) * x.t1)))"
    )
    return (
        ab.withColumn("st", F.expr(fold))
        .select(
            F.col("g").cast("long"),
            "a",
            "b",
            F.col("st.r0").cast("long").alias("gcd"),
            F.col("st.s0").cast("long").alias("bez_x"),
            F.col("st.t0").cast("long").alias("bez_y"),
            F.when(
                F.col("a") * F.col("st.s0") + F.col("b") * F.col("st.t0")
                == F.col("st.r0"),
                1,
            )
            .otherwise(0)
            .cast("int")
            .alias("bezout_ok"),
            F.when(
                F.col("st.r0") == 1,
                F.expr("((st.s0 % b) + b) % b"),
            )
            .cast("long")
            .alias("inv_a_mod_b"),
        )
        .orderBy("g")
    )


# ------------------------------------ Josephus + Zeckendorf

# Two closed-fold number-theory classics in one family with the
# Euclid/Miller-Rabin rows. Josephus (survivor of the counting-out
# circle): J(1)=0, J(n) = (J(n-1) + k) mod n — one fold over n.
# Zeckendorf (1972): every n is a UNIQUE sum of non-consecutive
# Fibonacci numbers; the greedy fold over the frozen descending Fib
# table produces it, and both the reconstruction identity (sum of
# chosen Fibs = n) and the no-consecutive-indices invariant are
# recomputed and hash-frozen per row.
_FIBS = [1836311903, 1134903170, 701408733, 433494437, 267914296,
         165580141, 102334155, 63245986, 39088169, 24157817, 14930352,
         9227465, 5702887, 3524578, 2178309, 1346269, 832040, 514229,
         317811, 196418, 121393, 75025, 46368, 28657, 17711, 10946,
         6765, 4181, 2584, 1597, 987, 610, 377, 233, 144, 89, 55, 34,
         21, 13, 8, 5, 3, 2, 1]

_JOSEPHUS_ORACLE = """
WITH RECURSIVE grp AS MATERIALIZED (
  SELECT DISTINCT s_suppkey % 120 AS g FROM supplier
),
nk AS MATERIALIZED (
  SELECT g,
         2 + ('0x' || substr(md5('jn:' || CAST(g AS VARCHAR)),
                             1, 6))::BIGINT % 199 AS n,
         2 + ('0x' || substr(md5('jk:' || CAST(g AS VARCHAR)),
                             1, 6))::BIGINT % 11 AS k
  FROM grp
),
st(g, n, k, i, j) AS (
  SELECT g, n, k, 1, CAST(0 AS BIGINT) FROM nk
  UNION ALL
  SELECT g, n, k, i + 1, (j + k) % (i + 1)
  FROM st WHERE i < n
)
SELECT CAST(g AS BIGINT) AS g, CAST(n AS BIGINT) AS n,
       CAST(k AS BIGINT) AS k,
       CAST(j + 1 AS BIGINT) AS survivor_1based
FROM st WHERE i = n
ORDER BY g
"""


@register_extra("josephus_survivor", _JOSEPHUS_ORACLE)
def josephus_survivor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Josephus survivor positions via the O(n) recurrence (see
    family comment above) — one higher-order fold per (n, k) pair vs
    the recursive-CTE twin; tests referee against a literal
    circle simulation."""
    s = _t(spark, sf_dir, "supplier")
    grp = s.select((F.col("s_suppkey") % 120).alias("g")).distinct()

    def _h6(prefix: str) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(prefix), F.col("g").cast("string")
                    ).cast("binary")
                ),
                1,
                6,
            ),
            16,
            10,
        ).cast("long")

    nk = grp.select(
        "g", (2 + _h6("jn:") % 199).alias("n"), (2 + _h6("jk:") % 11).alias("k")
    )
    return (
        nk.withColumn(
            "j",
            F.expr(
                "aggregate(sequence(2, CAST(n AS INT)), 0L,"
                " (j, i) -> (j + k) % i)"
            ),
        )
        .select(
            F.col("g").cast("long"),
            "n",
            "k",
            (F.col("j") + 1).cast("long").alias("survivor_1based"),
        )
        .orderBy("g")
    )


_ZECK_ORACLE = """
WITH RECURSIVE grp AS MATERIALIZED (
  SELECT DISTINCT s_suppkey % 150 AS g FROM supplier
),
nums AS MATERIALIZED (
  SELECT g, 1 + ('0x' || substr(md5('zk:' || CAST(g AS VARCHAR)),
                                1, 8))::BIGINT % 2000000000 AS n
  FROM grp
),
fib AS MATERIALIZED (
  SELECT [CAST(1836311903 AS BIGINT), CAST(1134903170 AS BIGINT), CAST(701408733 AS BIGINT), CAST(433494437 AS BIGINT), CAST(267914296 AS BIGINT), CAST(165580141 AS BIGINT), CAST(102334155 AS BIGINT), CAST(63245986 AS BIGINT), CAST(39088169 AS BIGINT), CAST(24157817 AS BIGINT), CAST(14930352 AS BIGINT), CAST(9227465 AS BIGINT), CAST(5702887 AS BIGINT), CAST(3524578 AS BIGINT), CAST(2178309 AS BIGINT), CAST(1346269 AS BIGINT), CAST(832040 AS BIGINT), CAST(514229 AS BIGINT), CAST(317811 AS BIGINT), CAST(196418 AS BIGINT), CAST(121393 AS BIGINT), CAST(75025 AS BIGINT), CAST(46368 AS BIGINT), CAST(28657 AS BIGINT), CAST(17711 AS BIGINT), CAST(10946 AS BIGINT), CAST(6765 AS BIGINT), CAST(4181 AS BIGINT), CAST(2584 AS BIGINT), CAST(1597 AS BIGINT), CAST(987 AS BIGINT), CAST(610 AS BIGINT), CAST(377 AS BIGINT), CAST(233 AS BIGINT), CAST(144 AS BIGINT), CAST(89 AS BIGINT), CAST(55 AS BIGINT), CAST(34 AS BIGINT), CAST(21 AS BIGINT), CAST(13 AS BIGINT), CAST(8 AS BIGINT), CAST(5 AS BIGINT), CAST(3 AS BIGINT), CAST(2 AS BIGINT), CAST(1 AS BIGINT)] AS f
),
st(g, n, i, rem, mask, cnt, last, gap_ok) AS (
  SELECT g, n, 0, n, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
         CAST(-5 AS BIGINT), CAST(1 AS BIGINT)
  FROM nums
  UNION ALL
  SELECT g, n, i + 1,
         CASE WHEN x <= rem THEN rem - x ELSE rem END,
         CASE WHEN x <= rem THEN mask + x ELSE mask END,
         CASE WHEN x <= rem THEN cnt + 1 ELSE cnt END,
         CASE WHEN x <= rem THEN CAST(i AS BIGINT) ELSE last END,
         CASE WHEN x <= rem AND cnt > 0 AND i = last + 1
              THEN 0 ELSE gap_ok END
  FROM (
    SELECT s.*, fb.f[s.i + 1] AS x
    FROM st s CROSS JOIN fib fb
    WHERE s.i < 45
  )
)
SELECT CAST(g AS BIGINT) AS g, CAST(n AS BIGINT) AS n,
       CAST(cnt AS BIGINT) AS n_terms,
       CAST(CASE WHEN mask = n AND rem = 0 THEN 1 ELSE 0 END AS INT)
         AS reconstructs,
       CAST(gap_ok AS INT) AS no_consecutive
FROM st WHERE i = 45
ORDER BY g
"""


@register_extra("zeckendorf_representation", _ZECK_ORACLE)
def zeckendorf_representation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zeckendorf decompositions via the greedy fold over the frozen
    Fibonacci table (see family comment). Both the reconstruction sum
    and the non-consecutive invariant are recomputed in-query and
    hash-frozen at 1."""
    s = _t(spark, sf_dir, "supplier")
    grp = s.select((F.col("s_suppkey") % 150).alias("g")).distinct()
    nums = grp.select(
        "g",
        (
            1
            + F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("zk:"), F.col("g").cast("string")
                        ).cast("binary")
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 2000000000
        ).alias("n"),
    )
    fib = "array(" + ",".join(f"{v}L" for v in _FIBS) + ")"
    fold = (
        f"aggregate({fib},"
        " named_struct('rem', n, 'mask', 0L, 'cnt', 0L, 'last', -5L,"
        "              'ix', 0L, 'gap_ok', 1L),"
        " (a, x) -> IF(x <= a.rem,"
        "   named_struct('rem', a.rem - x, 'mask', a.mask + x,"
        "     'cnt', a.cnt + 1, 'last', a.ix, 'ix', a.ix + 1,"
        "     'gap_ok', IF(a.cnt > 0 AND a.ix = a.last + 1, 0L, a.gap_ok)),"
        "   named_struct('rem', a.rem, 'mask', a.mask, 'cnt', a.cnt,"
        "     'last', a.last, 'ix', a.ix + 1, 'gap_ok', a.gap_ok)))"
    )
    return (
        nums.withColumn("st", F.expr(fold))
        .select(
            F.col("g").cast("long"),
            "n",
            F.col("st.cnt").cast("long").alias("n_terms"),
            F.when(
                (F.col("st.mask") == F.col("n")) & (F.col("st.rem") == 0), 1
            )
            .otherwise(0)
            .cast("int")
            .alias("reconstructs"),
            F.col("st.gap_ok").cast("int").alias("no_consecutive"),
        )
        .orderBy("g")
    )


# ------------------------------------ Floyd cycle detection (rho)

# Floyd's tortoise-and-hare (1967, via Knuth) — the constant-space
# cycle finder under Pollard's rho, PRNG quality tests and linked-
# list debugging: on the md5 functional graph x -> H(g, x) mod 64
# each start walks a rho shape with tail mu and cycle lambda. The
# three classic phases (meet inside the cycle; synchronized walk from
# the start to find mu; single lap to measure lambda) run as exact
# folds with the hash evaluated INSIDE the lambda; mu/lambda
# concentrate near the birthday bound sqrt(pi*64/8) ~ 5. tests
# referee against a direct Python replay; the identity hare = tortoise at
# phase-1 exit is hash-frozen via the meet column.
_FLOYD_ORACLE = """
WITH RECURSIVE grp AS MATERIALIZED (
  SELECT DISTINCT s_suppkey % 160 AS g FROM supplier
),
seed AS MATERIALIZED (
  SELECT g, ('0x' || substr(md5('fs:' || CAST(g AS VARCHAR)),
                            1, 4))::BIGINT % 64 AS x0
  FROM grp
),
p1(g, x0, i, t, h, meet) AS (
  SELECT g, x0, 0, x0, x0, CAST(NULL AS BIGINT) FROM seed
  UNION ALL
  SELECT g, x0, i + 1, t1, h2,
         CASE WHEN t1 = h2 THEN t1 END
  FROM (
    SELECT g, x0, i, t, h,
           ('0x' || substr(md5('fg:' || CAST(g AS VARCHAR) || ':'
              || CAST(t AS VARCHAR)), 1, 4))::BIGINT % 64 AS t1,
           ('0x' || substr(md5('fg:' || CAST(g AS VARCHAR) || ':'
              || CAST(('0x' || substr(md5('fg:' || CAST(g AS VARCHAR)
                 || ':' || CAST(h AS VARCHAR)), 1, 4))::BIGINT % 64
                 AS VARCHAR)), 1, 4))::BIGINT % 64 AS h2
    FROM p1 WHERE meet IS NULL AND i < 96
  )
),
m1 AS MATERIALIZED (
  SELECT g, x0, meet FROM p1 WHERE meet IS NOT NULL
),
p2(g, x0, meet, mu, t, h) AS (
  SELECT g, x0, meet, 0, x0, meet FROM m1
  UNION ALL
  SELECT g, x0, meet, mu + 1,
         ('0x' || substr(md5('fg:' || CAST(g AS VARCHAR) || ':'
            || CAST(t AS VARCHAR)), 1, 4))::BIGINT % 64,
         ('0x' || substr(md5('fg:' || CAST(g AS VARCHAR) || ':'
            || CAST(h AS VARCHAR)), 1, 4))::BIGINT % 64
  FROM p2 WHERE t <> h AND mu < 64
),
m2 AS MATERIALIZED (
  SELECT g, x0, meet, mu, t AS mu_node FROM p2 WHERE t = h
),
p3(g, mu_node, lam, h) AS (
  SELECT g, mu_node, 1,
         ('0x' || substr(md5('fg:' || CAST(g AS VARCHAR) || ':'
            || CAST(mu_node AS VARCHAR)), 1, 4))::BIGINT % 64
  FROM m2
  UNION ALL
  SELECT g, mu_node, lam + 1,
         ('0x' || substr(md5('fg:' || CAST(g AS VARCHAR) || ':'
            || CAST(h AS VARCHAR)), 1, 4))::BIGINT % 64
  FROM p3 WHERE h <> mu_node AND lam < 65
)
SELECT CAST(m2.g AS BIGINT) AS g, CAST(m2.x0 AS BIGINT) AS x0,
       CAST(m2.meet AS BIGINT) AS meet_node,
       CAST(m2.mu AS BIGINT) AS mu,
       CAST(l.lam AS BIGINT) AS lambda,
       CAST(m2.mu + l.lam AS BIGINT) AS rho_len
FROM m2
JOIN (SELECT g, max(lam) AS lam FROM p3 GROUP BY g) l ON l.g = m2.g
ORDER BY g
"""


@register_extra("floyd_cycle_detection", _FLOYD_ORACLE)
def floyd_cycle_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Floyd tortoise-and-hare rho decomposition (see oracle comment).
    Spark runs all three phases as chained higher-order folds with the
    md5 step function inlined in the lambdas — map-only per seed; the
    oracle replays them as three chained recursive CTEs."""
    s = _t(spark, sf_dir, "supplier")
    grp = s.select((F.col("s_suppkey") % 160).alias("g")).distinct()
    seed = grp.select(
        "g",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("fs:"), F.col("g").cast("string")
                        ).cast("binary")
                    ),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("long")
            % 64
        ).alias("x0"),
    )

    def fx(x: str) -> str:
        return (
            "(CAST(conv(substring(md5(CAST(concat('fg:',"
            " CAST(g AS STRING), ':', CAST(" + x + " AS STRING))"
            " AS BINARY)), 1, 4), 16, 10) AS BIGINT) % 64)"
        )

    p1 = (
        "aggregate(sequence(1, 96),"
        " named_struct('t', x0, 'h', x0, 'meet', -1L),"
        " (a, i) -> IF(a.meet >= 0, a,"
        f"   named_struct('t', {fx('a.t')},"
        f"     'h', {fx(fx('a.h'))},"
        f"     'meet', IF({fx('a.t')} = {fx(fx('a.h'))},"
        f"               {fx('a.t')}, -1L))))"
    )
    p2 = (
        "aggregate(sequence(1, 64),"
        " named_struct('t', x0, 'h', meet, 'mu', 0L),"
        " (a, i) -> IF(a.t = a.h, a,"
        f"   named_struct('t', {fx('a.t')}, 'h', {fx('a.h')},"
        "     'mu', a.mu + 1)))"
    )
    p3 = (
        "aggregate(sequence(1, 64),"
        f" named_struct('h', {fx('mu_node')}, 'lam', 1L),"
        " (a, i) -> IF(a.h = mu_node, a,"
        f"   named_struct('h', {fx('a.h')}, 'lam', a.lam + 1)))"
    )
    return (
        seed.withColumn("s1", F.expr(p1))
        .withColumn("meet", F.col("s1.meet"))
        .withColumn("s2", F.expr(p2))
        .withColumn("mu", F.col("s2.mu"))
        .withColumn("mu_node", F.col("s2.t"))
        .withColumn("s3", F.expr(p3))
        .select(
            F.col("g").cast("long"),
            F.col("x0").cast("long"),
            F.col("meet").cast("long").alias("meet_node"),
            F.col("mu").cast("long"),
            F.col("s3.lam").cast("long").alias("lambda"),
            (F.col("mu") + F.col("s3.lam")).cast("long").alias("rho_len"),
        )
        .orderBy("g")
    )


# ------------------------------------ continued-fraction convergents

# Continued fractions: expanding a/b by Euclid quotients and
# accumulating convergents h_k = q_k h_{k-1} + h_{k-2} (Wallis 1695)
# yields the best rational approximations of a/b — the machinery
# under Stern-Brocot trees, calendar leap rules and gear-ratio
# design. The final convergent must equal the fraction in lowest
# terms and successive convergents satisfy the determinant identity
# h_k * k_{k-1} - h_{k-1} * k_k = (-1)^(k+1) — both recomputed
# in-query and hash-frozen (det is always +1 or -1; reduced_ok = 1).
_CF_ORACLE = """
WITH RECURSIVE grp AS MATERIALIZED (
  SELECT DISTINCT s_suppkey % 140 AS g FROM supplier
),
ab AS MATERIALIZED (
  SELECT g,
         1 + ('0x' || substr(md5('ca:' || CAST(g AS VARCHAR)),
                             1, 7))::BIGINT % 99999 AS a,
         100000 + ('0x' || substr(md5('cb:' || CAST(g AS VARCHAR)),
                                  1, 7))::BIGINT % 900000 AS b
  FROM grp
),
st(g, a, b, i, r0, r1, h0, h1, k0, k1, depth) AS (
  SELECT g, a, b, 0, a, b,
         CAST(0 AS BIGINT), CAST(1 AS BIGINT),
         CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
  FROM ab
  UNION ALL
  SELECT g, a, b, i + 1,
         CASE WHEN r1 = 0 THEN r0 ELSE r1 END,
         CASE WHEN r1 = 0 THEN r1 ELSE r0 % r1 END,
         CASE WHEN r1 = 0 THEN h0 ELSE h1 END,
         CASE WHEN r1 = 0 THEN h1 ELSE (r0 // r1) * h1 + h0 END,
         CASE WHEN r1 = 0 THEN k0 ELSE k1 END,
         CASE WHEN r1 = 0 THEN k1 ELSE (r0 // r1) * k1 + k0 END,
         CASE WHEN r1 = 0 THEN depth ELSE depth + 1 END
  FROM st WHERE i < 45
)
SELECT CAST(g AS BIGINT) AS g, CAST(a AS BIGINT) AS a,
       CAST(b AS BIGINT) AS b, CAST(depth AS BIGINT) AS depth,
       CAST(h1 AS BIGINT) AS h_final, CAST(k1 AS BIGINT) AS k_final,
       CAST(h0 AS BIGINT) AS h_prev, CAST(k0 AS BIGINT) AS k_prev,
       CAST(h1 * k0 - h0 * k1 AS BIGINT) AS det,
       CAST(CASE WHEN a * k1 = b * h1 THEN 1 ELSE 0 END AS INT)
         AS reduced_ok
FROM st WHERE i = 45
ORDER BY g
"""


@register_extra("continued_fraction_convergents", _CF_ORACLE)
def continued_fraction_convergents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Continued-fraction convergents of md5 fractions a/b (see
    oracle comment) — the Euclid fold carrying (h, k) pairs, with the
    determinant identity and the lowest-terms reconstruction
    hash-frozen. tests referee against fractions.Fraction."""
    s = _t(spark, sf_dir, "supplier")
    grp = s.select((F.col("s_suppkey") % 140).alias("g")).distinct()

    def _h7(prefix: str) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(prefix), F.col("g").cast("string")
                    ).cast("binary")
                ),
                1,
                7,
            ),
            16,
            10,
        ).cast("long")

    ab = grp.select(
        "g",
        (1 + _h7("ca:") % 99999).alias("a"),
        (100000 + _h7("cb:") % 900000).alias("b"),
    )
    fold = (
        "aggregate(sequence(1, 45),"
        " named_struct('r0', a, 'r1', b, 'h0', 0L, 'h1', 1L,"
        "              'k0', 1L, 'k1', 0L, 'depth', 0L),"
        " (x, i) -> IF(x.r1 = 0, x,"
        "   named_struct("
        "     'r0', x.r1, 'r1', x.r0 % x.r1,"
        "     'h0', x.h1, 'h1', (x.r0 div x.r1) * x.h1 + x.h0,"
        "     'k0', x.k1, 'k1', (x.r0 div x.r1) * x.k1 + x.k0,"
        "     'depth', x.depth + 1)))"
    )
    return (
        ab.withColumn("st", F.expr(fold))
        .select(
            F.col("g").cast("long"),
            "a",
            "b",
            F.col("st.depth").cast("long").alias("depth"),
            F.col("st.h1").cast("long").alias("h_final"),
            F.col("st.k1").cast("long").alias("k_final"),
            F.col("st.h0").cast("long").alias("h_prev"),
            F.col("st.k0").cast("long").alias("k_prev"),
            F.expr("st.h1 * st.k0 - st.h0 * st.k1")
            .cast("long")
            .alias("det"),
            F.when(
                F.col("a") * F.col("st.k1") == F.col("b") * F.col("st.h1"), 1
            )
            .otherwise(0)
            .cast("int")
            .alias("reduced_ok"),
        )
        .orderBy("g")
    )


# ------------------------------------ linear probing displacement

# Linear probing displacement (Knuth 1962 — famously the problem that
# founded the analysis of algorithms): insert 24 md5 keys into a
# 32-slot table and measure how far each lands from its hash slot.
# The probe is CLOSED-FORM per insertion: doubling the occupancy mask
# (occ | occ<<32) makes the cyclic scan linear, the lowest ZERO bit
# of the shifted window is isolated by (~x) & (x+1), and its position
# (= the displacement) is bit_count(low - 1) — so the whole table
# replay is one 24-step fold over three integers, no probe loop.
# Clustering is visible in the gate rows: total displacement varies
# ~3x across tables at the same 0.75 load.
_LP_ORACLE = """
WITH RECURSIVE grp AS MATERIALIZED (
  SELECT DISTINCT c_custkey % 250 AS g FROM customer
),
st(g, j, occ, sumd, maxd) AS (
  SELECT g, 0, CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
  FROM grp
  UNION ALL
  SELECT g, j + 1,
         occ | (1 << ((p + d) % 32)),
         sumd + d,
         greatest(maxd, d)
  FROM (
    SELECT g, j, occ, sumd, maxd, p,
           bit_count(((~x) & (x + 1)) - 1) AS d
    FROM (
      SELECT s.*,
             ('0x' || substr(md5('lp:' || CAST(g AS VARCHAR) || ':'
                || CAST(j AS VARCHAR)), 1, 4))::BIGINT % 32 AS p,
             CAST((((occ::HUGEINT << 32) | occ::HUGEINT) >>
              (('0x' || substr(md5('lp:' || CAST(g AS VARCHAR) || ':'
                 || CAST(j AS VARCHAR)), 1, 4))::BIGINT % 32))
               & 4294967295 AS BIGINT) AS x
      FROM st s WHERE j < 24
    )
  )
)
SELECT CAST(g AS BIGINT) AS g,
       CAST(sumd AS BIGINT) AS total_displacement,
       CAST(maxd AS BIGINT) AS max_displacement,
       CAST(bit_count(occ) AS BIGINT) AS n_occupied
FROM st WHERE j = 24
ORDER BY g
"""


@register_extra("linear_probing_displacement", _LP_ORACLE)
def linear_probing_displacement(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Linear-probing displacement replay (see oracle comment) — one
    zero-join higher-order fold per table; the oracle is the
    identical recursive CTE. n_occupied is hash-frozen at 24 (no
    insertion is ever lost)."""
    c = _t(spark, sf_dir, "customer")
    grp = c.select((F.col("c_custkey") % 250).alias("g")).distinct()
    ps = (
        "transform(sequence(0, 23), j ->"
        " CAST(conv(substring(md5(CAST(concat('lp:', CAST(g AS STRING),"
        " ':', CAST(j AS STRING)) AS BINARY)), 1, 4), 16, 10)"
        " AS BIGINT) % 32)"
    )
    # per step: p = ps[j+1]; x = cyclic 32-bit window of occ from p;
    # d = position of lowest zero bit of x
    x = (
        "(((a.occ | shiftleft(a.occ, 32))"
        " >> CAST(element_at(ps, CAST(j AS INT) + 1) AS INT))"
        " & 4294967295L)"
    )
    d = f"bit_count((((~{x}) & ({x} + 1)) - 1))"
    fold = (
        "aggregate(sequence(0, 23),"
        " named_struct('occ', 0L, 'sumd', 0L, 'maxd', 0L),"
        " (a, j) -> named_struct("
        f" 'occ', a.occ | shiftleft(1L,"
        f"   CAST((element_at(ps, CAST(j AS INT) + 1) + {d}) % 32 AS INT)),"
        f" 'sumd', a.sumd + {d},"
        f" 'maxd', greatest(a.maxd, {d})))"
    )
    return (
        grp.withColumn("ps", F.expr(ps))
        .withColumn("st", F.expr(fold))
        .select(
            F.col("g").cast("long"),
            F.col("st.sumd").cast("long").alias("total_displacement"),
            F.col("st.maxd").cast("long").alias("max_displacement"),
            F.expr("bit_count(st.occ)").cast("long").alias("n_occupied"),
        )
        .orderBy("g")
    )


# ------------------------------------ Diffie-Hellman agreement

# Diffie-Hellman (1976) over the Mersenne prime p = 2^31 - 1 with
# primitive root g = 7: both sides run the same 31-step
# square-and-multiply fold (products < 2^62, exact int64), and the
# protocol's correctness — (g^a)^b = (g^b)^a — is recomputed from
# both directions and hash-frozen (agree = 1 on every pair). tests
# referee the public keys and the shared secret against Python pow.
_DH_P = 2147483647
_DH_G = 7

_DH_ORACLE = f"""
WITH RECURSIVE grp AS MATERIALIZED (
  SELECT DISTINCT s_suppkey % 130 AS g FROM supplier
),
sec AS MATERIALIZED (
  SELECT g,
         1 + ('0x' || substr(md5('da:' || CAST(g AS VARCHAR)),
                             1, 8))::BIGINT % ({_DH_P} - 2) AS a,
         1 + ('0x' || substr(md5('db:' || CAST(g AS VARCHAR)),
                             1, 8))::BIGINT % ({_DH_P} - 2) AS b
  FROM grp
),
me(g, base, e, tag, k, r, p) AS (
  SELECT g, CAST({_DH_G} AS BIGINT), a, 'A', 0, CAST(1 AS BIGINT),
         CAST({_DH_G} AS BIGINT)
  FROM sec
  UNION ALL
  SELECT g, CAST({_DH_G} AS BIGINT), b, 'B', 0, CAST(1 AS BIGINT),
         CAST({_DH_G} AS BIGINT)
  FROM sec
  UNION ALL
  SELECT g, base, e, tag, k + 1,
         CASE WHEN ((e >> k) & 1) = 1 THEN r * p % {_DH_P} ELSE r END,
         p * p % {_DH_P}
  FROM me WHERE k < 31
),
pub AS MATERIALIZED (
  SELECT g, max(CASE WHEN tag = 'A' THEN r END) AS pub_a,
         max(CASE WHEN tag = 'B' THEN r END) AS pub_b
  FROM me WHERE k = 31 GROUP BY g
),
sh(g, base, e, tag, k, r, p) AS (
  SELECT p.g, p.pub_b, s.a, 'SA', 0, CAST(1 AS BIGINT), p.pub_b
  FROM pub p JOIN sec s ON s.g = p.g
  UNION ALL
  SELECT p.g, p.pub_a, s.b, 'SB', 0, CAST(1 AS BIGINT), p.pub_a
  FROM pub p JOIN sec s ON s.g = p.g
  UNION ALL
  SELECT g, base, e, tag, k + 1,
         CASE WHEN ((e >> k) & 1) = 1 THEN r * p % {_DH_P} ELSE r END,
         p * p % {_DH_P}
  FROM sh WHERE k < 31
),
fin AS MATERIALIZED (
  SELECT g, max(CASE WHEN tag = 'SA' THEN r END) AS s_a,
         max(CASE WHEN tag = 'SB' THEN r END) AS s_b
  FROM sh WHERE k = 31 GROUP BY g
)
SELECT CAST(p.g AS BIGINT) AS g,
       CAST(p.pub_a AS BIGINT) AS pub_a,
       CAST(p.pub_b AS BIGINT) AS pub_b,
       CAST(f.s_a AS BIGINT) AS shared,
       CAST(CASE WHEN f.s_a = f.s_b THEN 1 ELSE 0 END AS INT) AS agree
FROM pub p JOIN fin f ON f.g = p.g
ORDER BY g
"""


@register_extra("diffie_hellman_agreement", _DH_ORACLE)
def diffie_hellman_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diffie-Hellman over 2^31-1 (see oracle comment). Spark runs
    four modexp folds per pair (two public keys, the shared secret
    from both directions); map-only exact int64."""
    s = _t(spark, sf_dir, "supplier")
    grp = s.select((F.col("s_suppkey") % 130).alias("g")).distinct()

    def _h8(prefix: str) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(prefix), F.col("g").cast("string")
                    ).cast("binary")
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")

    sec = grp.select(
        "g",
        (1 + _h8("da:") % (_DH_P - 2)).alias("a"),
        (1 + _h8("db:") % (_DH_P - 2)).alias("b"),
    )

    def modexp(base: str, e: str) -> str:
        return (
            f"aggregate(sequence(0, 31),"
            f" named_struct('r', 1L, 'p', CAST({base} AS BIGINT)),"
            f" (acc, k) -> named_struct("
            f"   'r', IF((({e} >> k) & 1) = 1,"
            f"           acc.r * acc.p % {_DH_P}, acc.r),"
            f"   'p', acc.p * acc.p % {_DH_P}),"
            f" acc -> acc.r)"
        )

    return (
        sec.withColumn("pub_a", F.expr(modexp(str(_DH_G), "a")))
        .withColumn("pub_b", F.expr(modexp(str(_DH_G), "b")))
        .withColumn("s_a", F.expr(modexp("pub_b", "a")))
        .withColumn("s_b", F.expr(modexp("pub_a", "b")))
        .select(
            F.col("g").cast("long"),
            F.col("pub_a").cast("long"),
            F.col("pub_b").cast("long"),
            F.col("s_a").cast("long").alias("shared"),
            F.when(F.col("s_a") == F.col("s_b"), 1)
            .otherwise(0)
            .cast("int")
            .alias("agree"),
        )
        .orderBy("g")
    )


# --------------------------------------- Shamir secret sharing

def _shamir_oracle() -> str:
    exp, log = _gf_tables()
    el = "[" + ",".join(str(v) for v in exp) + "]"
    ll = "[" + ",".join(str(v) for v in log) + "]"
    combos = ", ".join(
        f"({ci}, {a}, {b}, {c})"
        for ci, (a, b, c) in enumerate(
            [
                (1, 2, 3), (1, 2, 4), (1, 2, 5), (1, 3, 4), (1, 3, 5),
                (1, 4, 5), (2, 3, 4), (2, 3, 5), (2, 4, 5), (3, 4, 5),
            ]
        )
    )

    def mul(a: str, b: str) -> str:
        return (
            f"(CASE WHEN {a} = 0 OR {b} = 0 THEN 0 ELSE"
            f" ({el})[(({ll})[{a} + 1] + ({ll})[{b} + 1]) % 255 + 1]"
            f" END)"
        )

    def div(a: str, b: str) -> str:
        return (
            f"(CASE WHEN {a} = 0 THEN 0 ELSE"
            f" ({el})[(({ll})[{a} + 1] - ({ll})[{b} + 1] + 255) % 255 + 1]"
            f" END)"
        )

    # Lagrange basis at 0 for point xi against the other two xj, xk:
    # li = (xj * xk) / ((xj ^ xi) * (xk ^ xi))
    def lag(y, xi, xj, xk):
        num = mul(xj, xk)
        den = mul(f"xor({xj}, {xi})", f"xor({xk}, {xi})")
        return mul(y, div(num, den))

    def f_at(x: str) -> str:
        x2 = mul(x, x)
        return (
            f"xor(xor(sec, {mul('c1', x)}), {mul('c2', x2)})"
        )

    return f"""
WITH grp AS MATERIALIZED (
  SELECT DISTINCT p_partkey % 220 AS g FROM part
),
poly AS MATERIALIZED (
  SELECT g,
         ('0x' || substr(md5('sh0:' || CAST(g AS VARCHAR)),
                         1, 4))::BIGINT % 256 AS sec,
         ('0x' || substr(md5('sh1:' || CAST(g AS VARCHAR)),
                         1, 4))::BIGINT % 256 AS c1,
         1 + ('0x' || substr(md5('sh2:' || CAST(g AS VARCHAR)),
                             1, 4))::BIGINT % 255 AS c2,
         ('0x' || substr(md5('sc:' || CAST(g AS VARCHAR)),
                         1, 4))::BIGINT % 10 AS ci
  FROM grp
),
combo(ci, x1, x2, x3) AS (VALUES {combos}),
shares AS MATERIALIZED (
  SELECT p.g, p.sec, c.x1, c.x2, c.x3,
         {f_at('c.x1')} AS y1,
         {f_at('c.x2')} AS y2,
         {f_at('c.x3')} AS y3
  FROM poly p JOIN combo c ON c.ci = p.ci
),
rec AS MATERIALIZED (
  SELECT g, sec, x1, x2, x3, y1, y2, y3,
         xor(xor({lag('y1', 'x1', 'x2', 'x3')},
                 {lag('y2', 'x2', 'x1', 'x3')}),
             {lag('y3', 'x3', 'x1', 'x2')}) AS recovered,
         -- degree-1 guess from only (x1,y1),(x2,y2):
         xor({mul('y1', div('x2', 'xor(x2, x1)'))},
             {mul('y2', div('x1', 'xor(x1, x2)'))}) AS guess2
  FROM shares
)
SELECT CAST(g AS BIGINT) AS g, CAST(sec AS INT) AS secret,
       CAST(x1 * 100 + x2 * 10 + x3 AS INT) AS share_ids,
       CAST(recovered AS INT) AS recovered,
       CAST(CASE WHEN recovered = sec THEN 1 ELSE 0 END AS INT)
         AS recovered_ok,
       CAST(guess2 AS INT) AS guess2,
       CAST(CASE WHEN guess2 = sec THEN 1 ELSE 0 END AS INT)
         AS under_threshold_leak
FROM rec ORDER BY g
"""


_SHAMIR_ORACLE = _shamir_oracle()


@register_extra("shamir_secret_sharing", _SHAMIR_ORACLE)
def shamir_secret_sharing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shamir (3,5) secret sharing over GF(256) (Shamir 1979): shares
    are evaluations of a random quadratic at x = 1..5, an md5-chosen
    3-subset reconstructs the secret by Lagrange interpolation at 0
    (recovered_ok hash-frozen at 1 on every group), and the 2-share
    degree-1 guess demonstrates the threshold property (leak flag ~0).
    Field arithmetic uses the SAME frozen 0x11d exp/log tables as the
    gated Reed-Solomon row — no Galois op ever crosses engines as
    anything but a table index. Map-only column algebra."""
    exp, log = _gf_tables()
    el = "array(" + ",".join(str(v) for v in exp) + ")"
    ll = "array(" + ",".join(str(v) for v in log) + ")"

    def mul(a: str, b: str) -> str:
        return (
            f"(CASE WHEN {a} = 0 OR {b} = 0 THEN 0 ELSE"
            f" element_at({el}, CAST((element_at({ll}, CAST({a} AS INT) + 1)"
            f" + element_at({ll}, CAST({b} AS INT) + 1)) % 255 AS INT) + 1)"
            f" END)"
        )

    def div(a: str, b: str) -> str:
        return (
            f"(CASE WHEN {a} = 0 THEN 0 ELSE"
            f" element_at({el}, CAST((element_at({ll}, CAST({a} AS INT) + 1)"
            f" - element_at({ll}, CAST({b} AS INT) + 1) + 255) % 255"
            f" AS INT) + 1) END)"
        )

    def lag(y, xi, xj, xk):
        num = mul(xj, xk)
        den = mul(f"(CAST({xj} AS INT) ^ CAST({xi} AS INT))",
                  f"(CAST({xk} AS INT) ^ CAST({xi} AS INT))")
        return mul(y, div(num, den))

    def f_at(x: str) -> str:
        return f"(sec ^ {mul('c1', x)} ^ {mul('c2', mul(x, x))})"

    p = _t(spark, sf_dir, "part")
    grp = p.select((F.col("p_partkey") % 220).alias("g")).distinct()

    def _h4(prefix: str) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(prefix), F.col("g").cast("string")
                    ).cast("binary")
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")

    combos = [
        (1, 2, 3), (1, 2, 4), (1, 2, 5), (1, 3, 4), (1, 3, 5),
        (1, 4, 5), (2, 3, 4), (2, 3, 5), (2, 4, 5), (3, 4, 5),
    ]
    ct = p.sparkSession.createDataFrame(
        [(i, a, b, c) for i, (a, b, c) in enumerate(combos)],
        "ci long, x1 int, x2 int, x3 int",
    )
    poly = grp.select(
        "g",
        (_h4("sh0:") % 256).cast("int").alias("sec"),
        (_h4("sh1:") % 256).cast("int").alias("c1"),
        (1 + _h4("sh2:") % 255).cast("int").alias("c2"),
        (_h4("sc:") % 10).alias("ci"),
    )
    shares = poly.join(F.broadcast(ct), "ci").selectExpr(
        "g",
        "sec",
        "x1",
        "x2",
        "x3",
        f"{f_at('x1')} AS y1",
        f"{f_at('x2')} AS y2",
        f"{f_at('x3')} AS y3",
    )
    rec = shares.selectExpr(
        "g",
        "sec",
        "x1 * 100 + x2 * 10 + x3 AS share_ids",
        f"({lag('y1', 'x1', 'x2', 'x3')}"
        f" ^ {lag('y2', 'x2', 'x1', 'x3')}"
        f" ^ {lag('y3', 'x3', 'x1', 'x2')}) AS recovered",
        f"({mul('y1', div('x2', '(x2 ^ x1)'))}"
        f" ^ {mul('y2', div('x1', '(x1 ^ x2)'))}) AS guess2",
    )
    return rec.select(
        F.col("g").cast("long"),
        F.col("sec").cast("int").alias("secret"),
        F.col("share_ids").cast("int"),
        F.col("recovered").cast("int"),
        F.when(F.col("recovered") == F.col("sec"), 1)
        .otherwise(0)
        .cast("int")
        .alias("recovered_ok"),
        F.col("guess2").cast("int"),
        F.when(F.col("guess2") == F.col("sec"), 1)
        .otherwise(0)
        .cast("int")
        .alias("under_threshold_leak"),
    ).orderBy("g")


# --------------------------------------- Pollard rho factorization

# Pollard's rho (1975) — the birthday-paradox integer factorizer that
# opened modern factorization: iterate f(x) = x^2 + c mod n on a
# tortoise and hare, and gcd(|x - y|, n) exposes a factor once the
# walk cycles mod p before cycling mod n. Semiprimes n = p*q are
# built from a frozen 143-prime table via md5 indices; two
# independent md5 constants c are tried (the second fires on ~1%% of
# inputs, exercised by construction). The Spark side nests a 30-step
# Euclid fold INSIDE the 150-step Floyd fold; the oracle uses
# DuckDB's own gcd() builtin — two independent gcd derivations, one
# factor. verified (factor * cofactor = n, both in the prime table)
# is hash-frozen at 1.
_RHO_PRIMES = [101, 103, 107, 109, 113, 127, 131, 137, 139, 149, 151, 157, 163, 167, 173, 179, 181, 191, 193, 197, 199, 211, 223, 227, 229, 233, 239, 241, 251, 257, 263, 269, 271, 277, 281, 283, 293, 307, 311, 313, 317, 331, 337, 347, 349, 353, 359, 367, 373, 379, 383, 389, 397, 401, 409, 419, 421, 431, 433, 439, 443, 449, 457, 461, 463, 467, 479, 487, 491, 499, 503, 509, 521, 523, 541, 547, 557, 563, 569, 571, 577, 587, 593, 599, 601, 607, 613, 617, 619, 631, 641, 643, 647, 653, 659, 661, 673, 677, 683, 691, 701, 709, 719, 727, 733, 739, 743, 751, 757, 761, 769, 773, 787, 797, 809, 811, 821, 823, 827, 829, 839, 853, 857, 859, 863, 877, 881, 883, 887, 907, 911, 919, 929, 937, 941, 947, 953, 967, 971, 977, 983, 991, 997]

_RHO_ORACLE = """
WITH RECURSIVE grp AS MATERIALIZED (
  SELECT DISTINCT p_partkey % 280 AS g FROM part
),
pt AS MATERIALIZED (SELECT [101,103,107,109,113,127,131,137,139,149,151,157,163,167,173,179,181,191,193,197,199,211,223,227,229,233,239,241,251,257,263,269,271,277,281,283,293,307,311,313,317,331,337,347,349,353,359,367,373,379,383,389,397,401,409,419,421,431,433,439,443,449,457,461,463,467,479,487,491,499,503,509,521,523,541,547,557,563,569,571,577,587,593,599,601,607,613,617,619,631,641,643,647,653,659,661,673,677,683,691,701,709,719,727,733,739,743,751,757,761,769,773,787,797,809,811,821,823,827,829,839,853,857,859,863,877,881,883,887,907,911,919,929,937,941,947,953,967,971,977,983,991,997] AS pl),
cand AS MATERIALIZED (
  SELECT g, n,
         1 + ('0x' || substr(md5('pc:' || CAST(g AS VARCHAR)),
                             1, 6))::BIGINT % (n - 3) AS c1,
         1 + ('0x' || substr(md5('pd:' || CAST(g AS VARCHAR)),
                             1, 6))::BIGINT % (n - 3) AS c2
  FROM (
    SELECT g, pl[i + 1] * pl[CASE WHEN j >= i THEN j + 2
                                  ELSE j + 1 END] AS n
    FROM (
      SELECT g, pl,
             ('0x' || substr(md5('pp:' || CAST(g AS VARCHAR)),
                             1, 6))::BIGINT % 143 AS i,
             ('0x' || substr(md5('pq:' || CAST(g AS VARCHAR)),
                             1, 6))::BIGINT % 142 AS j
      FROM grp CROSS JOIN pt
    )
  )
),
st(g, n, c, tag, i, x, y, d) AS (
  SELECT g, n, c1, 1, 0, CAST(2 AS BIGINT), CAST(2 AS BIGINT),
         CAST(1 AS BIGINT)
  FROM cand
  UNION ALL
  SELECT g, n, c2, 2, 0, 2, 2, 1 FROM cand
  UNION ALL
  SELECT g, n, c, tag, i + 1, x1, y2,
         gcd(abs(x1 - y2), n)
  FROM (
    SELECT g, n, c, tag, i, d,
           (x * x + c) % n AS x1,
           (((y * y + c) % n) * ((y * y + c) % n) + c) % n AS y2
    FROM st WHERE d <= 1 AND i < 150
  )
),
fin AS MATERIALIZED (
  SELECT g, n, tag, max(d) AS d
  FROM (SELECT g, n, tag, d,
               row_number() OVER (PARTITION BY g, tag ORDER BY i DESC)
                 AS rn
        FROM st) WHERE rn = 1
  GROUP BY g, n, tag
),
pick AS MATERIALIZED (
  SELECT f.g, f.n,
         CASE WHEN d1 > 1 AND d1 < f.n THEN d1
              WHEN d2 > 1 AND d2 < f.n THEN d2 ELSE 0 END AS factor,
         CASE WHEN d1 > 1 AND d1 < f.n THEN 1 ELSE 2 END AS used_c
  FROM (SELECT g, n,
               max(CASE WHEN tag = 1 THEN d END) AS d1,
               max(CASE WHEN tag = 2 THEN d END) AS d2
        FROM fin GROUP BY g, n) f
)
SELECT CAST(p.g AS BIGINT) AS g, CAST(p.n AS BIGINT) AS n,
       CAST(least(p.factor, p.n // nullif(p.factor, 0)) AS BIGINT)
         AS factor_p,
       CAST(greatest(p.factor, p.n // nullif(p.factor, 0)) AS BIGINT)
         AS factor_q,
       CAST(p.used_c AS INT) AS used_c,
       CAST(CASE WHEN p.factor > 0 AND p.n % p.factor = 0
                 AND list_contains(pt.pl, p.factor)
                 AND list_contains(pt.pl, p.n // p.factor)
            THEN 1 ELSE 0 END AS INT) AS verified
FROM pick p CROSS JOIN pt
ORDER BY g
"""


@register_extra("pollard_rho_factorization", _RHO_ORACLE)
def pollard_rho_factorization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pollard rho factorization (see oracle comment). Spark nests a
    Euclid fold inside the Floyd fold — zero joins, map-only; the
    oracle's gcd() builtin is the independent second derivation."""
    p = _t(spark, sf_dir, "part")
    grp = p.select((F.col("p_partkey") % 280).alias("g")).distinct()
    pl = "array(101L,103L,107L,109L,113L,127L,131L,137L,139L,149L,151L,157L,163L,167L,173L,179L,181L,191L,193L,197L,199L,211L,223L,227L,229L,233L,239L,241L,251L,257L,263L,269L,271L,277L,281L,283L,293L,307L,311L,313L,317L,331L,337L,347L,349L,353L,359L,367L,373L,379L,383L,389L,397L,401L,409L,419L,421L,431L,433L,439L,443L,449L,457L,461L,463L,467L,479L,487L,491L,499L,503L,509L,521L,523L,541L,547L,557L,563L,569L,571L,577L,587L,593L,599L,601L,607L,613L,617L,619L,631L,641L,643L,647L,653L,659L,661L,673L,677L,683L,691L,701L,709L,719L,727L,733L,739L,743L,751L,757L,761L,769L,773L,787L,797L,809L,811L,821L,823L,827L,829L,839L,853L,857L,859L,863L,877L,881L,883L,887L,907L,911L,919L,929L,937L,941L,947L,953L,967L,971L,977L,983L,991L,997L)"

    def _h6(prefix: str) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(prefix), F.col("g").cast("string")
                    ).cast("binary")
                ),
                1,
                6,
            ),
            16,
            10,
        ).cast("long")

    cand = (
        grp.select("g", (_h6("pp:") % 143).alias("i"), (_h6("pq:") % 142).alias("j"))
        .selectExpr(
            "g",
            f"element_at({pl}, CAST(i AS INT) + 1)"
            f" * element_at({pl}, CAST(CASE WHEN j >= i THEN j + 2"
            f" ELSE j + 1 END AS INT)) AS n",
        )
        .withColumn("c1", 1 + _h6("pc:") % (F.col("n") - 3))
        .withColumn("c2", 1 + _h6("pd:") % (F.col("n") - 3))
    )
    gcd30 = (
        "aggregate(sequence(1, 30),"
        " named_struct('u', abs(%s), 'v', n),"
        " (s, k) -> IF(s.v = 0, s,"
        "   named_struct('u', s.v, 'v', s.u %% s.v)), s -> s.u)"
    )
    x1 = "((a.x * a.x + %(c)s) %% n)"
    y2 = ("((((a.y * a.y + %(c)s) %% n) * ((a.y * a.y + %(c)s) %% n)"
          " + %(c)s) %% n)")

    def rho(c: str) -> str:
        xx = x1 % {"c": c}
        yy = y2 % {"c": c}
        g = gcd30 % (f"{xx} - {yy}",)
        return (
            "aggregate(sequence(1, 150),"
            " named_struct('x', 2L, 'y', 2L, 'd', 1L),"
            " (a, i) -> IF(a.d > 1, a,"
            f"   named_struct('x', {xx}, 'y', {yy}, 'd', {g})),"
            " a -> a.d)"
        )

    fin = cand.withColumn("d1", F.expr(rho("c1"))).withColumn(
        "d2", F.expr(rho("c2"))
    )
    pick = fin.selectExpr(
        "g",
        "n",
        "CASE WHEN d1 > 1 AND d1 < n THEN d1"
        " WHEN d2 > 1 AND d2 < n THEN d2 ELSE 0 END AS factor",
        "CASE WHEN d1 > 1 AND d1 < n THEN 1 ELSE 2 END AS used_c",
    )
    return pick.selectExpr(
        "CAST(g AS BIGINT) AS g",
        "CAST(n AS BIGINT) AS n",
        "CAST(least(factor, n div nullif(factor, 0)) AS BIGINT) AS factor_p",
        "CAST(greatest(factor, n div nullif(factor, 0)) AS BIGINT)"
        " AS factor_q",
        "CAST(used_c AS INT) AS used_c",
        f"CAST(CASE WHEN factor > 0 AND n % factor = 0"
        f" AND array_contains({pl}, factor)"
        f" AND array_contains({pl}, n div factor)"
        f" THEN 1 ELSE 0 END AS INT) AS verified",
    ).orderBy("g")


# --------------------------------------------- RSA with CRT decrypt

# Toy RSA end-to-end (Rivest-Shamir-Adleman 1977) assembled from the
# engine's gated number-theory primitives: keygen draws (p, q) from
# the frozen rho prime table, e is the first Fermat prime coprime to
# phi (gcd fold), d = e^-1 mod phi comes from the extended-Euclid
# fold, and decryption runs BOTH ways — straight c^d mod n and the
# real-world RSA-CRT shortcut (Garner: mp/mq via the reduced
# exponents, recombined with p^-1 mod q). decrypt_ok and
# crt_matches are hash-frozen at 1 on every keypair; the oracle
# replays everything with recursive CTEs + DuckDB's gcd.
_RSA_ORACLE = """
WITH RECURSIVE grp AS MATERIALIZED (
  SELECT DISTINCT p_partkey % 260 AS g FROM part
),
pt AS MATERIALIZED (SELECT [101,103,107,109,113,127,131,137,139,149,151,157,163,167,173,179,181,191,193,197,199,211,223,227,229,233,239,241,251,257,263,269,271,277,281,283,293,307,311,313,317,331,337,347,349,353,359,367,373,379,383,389,397,401,409,419,421,431,433,439,443,449,457,461,463,467,479,487,491,499,503,509,521,523,541,547,557,563,569,571,577,587,593,599,601,607,613,617,619,631,641,643,647,653,659,661,673,677,683,691,701,709,719,727,733,739,743,751,757,761,769,773,787,797,809,811,821,823,827,829,839,853,857,859,863,877,881,883,887,907,911,919,929,937,941,947,953,967,971,977,983,991,997] AS pl),
keys0 AS MATERIALIZED (
  SELECT g, pl[i + 1] AS p, pl[CASE WHEN j >= i THEN j + 2
                                    ELSE j + 1 END] AS q
  FROM (
    SELECT g, pl,
           ('0x' || substr(md5('rp:' || CAST(g AS VARCHAR)),
                           1, 6))::BIGINT % 143 AS i,
           ('0x' || substr(md5('rq:' || CAST(g AS VARCHAR)),
                           1, 6))::BIGINT % 142 AS j
    FROM grp CROSS JOIN pt
  )
),
keys AS MATERIALIZED (
  SELECT g, p, q, p * q AS n, (p - 1) * (q - 1) AS phi,
         CASE WHEN gcd(65537, (p - 1) * (q - 1)) = 1 THEN 65537
              ELSE 257 END AS e,
         ('0x' || substr(md5('rm:' || CAST(g AS VARCHAR)),
                         1, 8))::BIGINT % (p * q) AS m
  FROM keys0
),
-- d = e^-1 mod phi via extended Euclid
eg(g, i, r0, r1, t0, t1) AS (
  SELECT g, 0, phi, CAST(e AS BIGINT),
         CAST(0 AS BIGINT), CAST(1 AS BIGINT)
  FROM keys
  UNION ALL
  SELECT g, i + 1,
         CASE WHEN r1 = 0 THEN r0 ELSE r1 END,
         CASE WHEN r1 = 0 THEN r1 ELSE r0 % r1 END,
         CASE WHEN r1 = 0 THEN t0 ELSE t1 END,
         CASE WHEN r1 = 0 THEN t1 ELSE t0 - (r0 // r1) * t1 END
  FROM eg WHERE i < 45
),
dk AS MATERIALIZED (
  SELECT k.g, k.p, k.q, k.n, k.phi, k.e, k.m,
         ((e2.t0 % k.phi) + k.phi) % k.phi AS d
  FROM keys k JOIN (SELECT g, t0 FROM eg WHERE i = 45) e2 ON e2.g = k.g
),
-- p^-1 mod q via extended Euclid
pg(g, i, r0, r1, t0, t1) AS (
  SELECT g, 0, CAST(q AS BIGINT), CAST(p AS BIGINT),
         CAST(0 AS BIGINT), CAST(1 AS BIGINT)
  FROM dk
  UNION ALL
  SELECT g, i + 1,
         CASE WHEN r1 = 0 THEN r0 ELSE r1 END,
         CASE WHEN r1 = 0 THEN r1 ELSE r0 % r1 END,
         CASE WHEN r1 = 0 THEN t0 ELSE t1 END,
         CASE WHEN r1 = 0 THEN t1 ELSE t0 - (r0 // r1) * t1 END
  FROM pg WHERE i < 45
),
fullk AS MATERIALIZED (
  SELECT d.*, ((pv.t0 % d.q) + d.q) % d.q AS pinv
  FROM dk d JOIN (SELECT g, t0 FROM pg WHERE i = 45) pv ON pv.g = d.g
),
-- modexp: tag 1 = m^e mod n; runs after keys
me1(g, k, r, pw) AS (
  SELECT g, 0, CAST(1 AS BIGINT), m % n FROM fullk
  UNION ALL
  SELECT me1.g, me1.k + 1,
         CASE WHEN ((f.e >> me1.k) & 1) = 1
              THEN me1.r * me1.pw % f.n ELSE me1.r END,
         me1.pw * me1.pw % f.n
  FROM me1 JOIN fullk f ON f.g = me1.g WHERE me1.k < 21
),
ct AS MATERIALIZED (
  SELECT f.*, m1.r AS c
  FROM fullk f JOIN (SELECT g, r FROM me1 WHERE k = 21) m1 ON m1.g = f.g
),
me2(g, k, r, pw) AS (
  SELECT g, 0, CAST(1 AS BIGINT), c % n FROM ct
  UNION ALL
  SELECT me2.g, me2.k + 1,
         CASE WHEN ((f.d >> me2.k) & 1) = 1
              THEN me2.r * me2.pw % f.n ELSE me2.r END,
         me2.pw * me2.pw % f.n
  FROM me2 JOIN ct f ON f.g = me2.g WHERE me2.k < 21
),
mp(g, k, r, pw) AS (
  SELECT g, 0, CAST(1 AS BIGINT), c % p FROM ct
  UNION ALL
  SELECT mp.g, mp.k + 1,
         CASE WHEN (((f.d % (f.p - 1)) >> mp.k) & 1) = 1
              THEN mp.r * mp.pw % f.p ELSE mp.r END,
         mp.pw * mp.pw % f.p
  FROM mp JOIN ct f ON f.g = mp.g WHERE mp.k < 21
),
mq(g, k, r, pw) AS (
  SELECT g, 0, CAST(1 AS BIGINT), c % q FROM ct
  UNION ALL
  SELECT mq.g, mq.k + 1,
         CASE WHEN (((f.d % (f.q - 1)) >> mq.k) & 1) = 1
              THEN mq.r * mq.pw % f.q ELSE mq.r END,
         mq.pw * mq.pw % f.q
  FROM mq JOIN ct f ON f.g = mq.g WHERE mq.k < 21
)
SELECT CAST(f.g AS BIGINT) AS g, CAST(f.n AS BIGINT) AS n,
       CAST(f.e AS BIGINT) AS e, CAST(f.m AS BIGINT) AS m,
       CAST(f.c AS BIGINT) AS ciphertext,
       CAST(d2.r AS BIGINT) AS decrypted,
       CAST(CASE WHEN d2.r = f.m THEN 1 ELSE 0 END AS INT)
         AS decrypt_ok,
       CAST(CASE WHEN a.r + f.p * (((b.r - a.r) * f.pinv % f.q + f.q)
                                   % f.q) = d2.r
            THEN 1 ELSE 0 END AS INT) AS crt_matches
FROM ct f
JOIN (SELECT g, r FROM me2 WHERE k = 21) d2 ON d2.g = f.g
JOIN (SELECT g, r FROM mp WHERE k = 21) a ON a.g = f.g
JOIN (SELECT g, r FROM mq WHERE k = 21) b ON b.g = f.g
ORDER BY g
"""


@register_extra("rsa_crt_roundtrip", _RSA_ORACLE)
def rsa_crt_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Toy RSA with CRT decryption (see oracle comment). Spark
    composes the gcd/egcd/modexp higher-order folds per keypair —
    five folds, zero joins, map-only exact int64."""
    p = _t(spark, sf_dir, "part")
    grp = p.select((F.col("p_partkey") % 260).alias("g")).distinct()
    pl = "array(101L,103L,107L,109L,113L,127L,131L,137L,139L,149L,151L,157L,163L,167L,173L,179L,181L,191L,193L,197L,199L,211L,223L,227L,229L,233L,239L,241L,251L,257L,263L,269L,271L,277L,281L,283L,293L,307L,311L,313L,317L,331L,337L,347L,349L,353L,359L,367L,373L,379L,383L,389L,397L,401L,409L,419L,421L,431L,433L,439L,443L,449L,457L,461L,463L,467L,479L,487L,491L,499L,503L,509L,521L,523L,541L,547L,557L,563L,569L,571L,577L,587L,593L,599L,601L,607L,613L,617L,619L,631L,641L,643L,647L,653L,659L,661L,673L,677L,683L,691L,701L,709L,719L,727L,733L,739L,743L,751L,757L,761L,769L,773L,787L,797L,809L,811L,821L,823L,827L,829L,839L,853L,857L,859L,863L,877L,881L,883L,887L,907L,911L,919L,929L,937L,941L,947L,953L,967L,971L,977L,983L,991L,997L)"

    def _h6(prefix: str, chars: int = 6) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(prefix), F.col("g").cast("string")
                    ).cast("binary")
                ),
                1,
                chars,
            ),
            16,
            10,
        ).cast("long")

    gcdf = (
        "aggregate(sequence(1, 45), named_struct('u', %s, 'v', %s),"
        " (s, k) -> IF(s.v = 0, s, named_struct('u', s.v, 'v', s.u %% s.v)),"
        " s -> s.u)"
    )
    # egcd returning t0 (Bezout coefficient of the second argument)
    egcdt = (
        "aggregate(sequence(1, 45),"
        " named_struct('r0', %s, 'r1', %s, 't0', 0L, 't1', 1L),"
        " (x, k) -> IF(x.r1 = 0, x, named_struct("
        "   'r0', x.r1, 'r1', x.r0 %% x.r1,"
        "   't0', x.t1, 't1', x.t0 - (x.r0 div x.r1) * x.t1)),"
        " x -> x.t0)"
    )
    modexp = (
        "aggregate(sequence(0, 20),"
        " named_struct('r', 1L, 'pw', %s %% %s),"
        " (a, k) -> named_struct("
        "   'r', IF(((%s >> k) & 1) = 1, a.r * a.pw %% %s, a.r),"
        "   'pw', a.pw * a.pw %% %s), a -> a.r)"
    )
    keys = (
        grp.select(
            "g", (_h6("rp:") % 143).alias("i"), (_h6("rq:") % 142).alias("j")
        )
        .selectExpr(
            "g",
            f"element_at({pl}, CAST(i AS INT) + 1) AS p",
            f"element_at({pl}, CAST(CASE WHEN j >= i THEN j + 2"
            f" ELSE j + 1 END AS INT)) AS q",
        )
        .withColumn("n", F.expr("p * q"))
        .withColumn("phi", F.expr("(p - 1) * (q - 1)"))
        .withColumn(
            "e",
            F.expr(
                "IF(" + (gcdf % ("65537L", "phi")) + " = 1, 65537L, 257L)"
            ),
        )
        .withColumn("m", _h6("rm:", 8) % F.col("n"))
        .withColumn(
            "d", F.expr("pmod(" + (egcdt % ("phi", "e")) + ", phi)")
        )
        .withColumn(
            "pinv", F.expr("pmod(" + (egcdt % ("q", "p")) + ", q)")
        )
    )
    out = (
        keys.withColumn("c", F.expr(modexp % ("m", "n", "e", "n", "n")))
        .withColumn("m1", F.expr(modexp % ("c", "n", "d", "n", "n")))
        .withColumn(
            "mp", F.expr(modexp % ("c", "p", "(d % (p - 1))", "p", "p"))
        )
        .withColumn(
            "mq", F.expr(modexp % ("c", "q", "(d % (q - 1))", "q", "q"))
        )
        .withColumn(
            "m2", F.expr("mp + p * pmod((mq - mp) * pinv, q)")
        )
    )
    return out.select(
        F.col("g").cast("long"),
        F.col("n").cast("long"),
        F.col("e").cast("long"),
        F.col("m").cast("long"),
        F.col("c").cast("long").alias("ciphertext"),
        F.col("m1").cast("long").alias("decrypted"),
        F.when(F.col("m1") == F.col("m"), 1).otherwise(0).cast("int")
        .alias("decrypt_ok"),
        F.when(F.col("m2") == F.col("m1"), 1).otherwise(0).cast("int")
        .alias("crt_matches"),
    ).orderBy("g")


# --------------------------------------------- Collatz trajectories

_COLLATZ_STEPS = 350


@register_extra(
    "collatz_trajectories",
    f"""
    WITH RECURSIVE grp AS MATERIALIZED (
      SELECT DISTINCT c_custkey % 240 AS g FROM customer
    ),
    seeds AS MATERIALIZED (
      SELECT g, 2 + ('0x' || substr(md5('cz:' || CAST(g AS VARCHAR)),
                                    1, 6))::BIGINT % 99999 AS n0
      FROM grp
      UNION ALL
      SELECT -1, 27
    ),
    st(g, n0, i, n, peak, steps) AS (
      SELECT g, n0, 0, n0, n0, CAST(-1 AS BIGINT) FROM seeds
      UNION ALL
      SELECT g, n0, i + 1, nx, greatest(peak, nx),
             CASE WHEN steps >= 0 THEN steps
                  WHEN nx = 1 THEN i + 1 ELSE -1 END
      FROM (
        SELECT s.*, CASE WHEN s.n % 2 = 0 THEN s.n // 2
                         ELSE 3 * s.n + 1 END AS nx
        FROM st s WHERE s.steps < 0 AND s.i < {_COLLATZ_STEPS}
      )
    ),
    fin AS (
      SELECT g, n0, max(peak) AS peak, max(steps) AS steps
      FROM st GROUP BY g, n0
    )
    SELECT CAST(g AS BIGINT) AS g, CAST(n0 AS BIGINT) AS n0,
           CAST(steps AS BIGINT) AS steps,
           CAST(peak AS BIGINT) AS peak,
           CAST(CASE WHEN steps >= 0 THEN 1 ELSE 0 END AS INT)
             AS converged
    FROM fin ORDER BY g
    """,
)
def collatz_trajectories(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collatz (3n+1) trajectory lengths and peaks for md5 seeds under
    1e5 plus the textbook fixture n=27 (111 steps, peak 9232 —
    hash-frozen). One guarded 350-step fold per seed; every seed
    converges (converged frozen at 1), peaks stay far inside int64."""
    c = _t(spark, sf_dir, "customer")
    grp = c.select((F.col("c_custkey") % 240).alias("g")).distinct()
    seeds = grp.select(
        "g",
        (
            2
            + F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("cz:"), F.col("g").cast("string")
                        ).cast("binary")
                    ),
                    1,
                    6,
                ),
                16,
                10,
            ).cast("long")
            % 99999
        ).alias("n0"),
    ).unionByName(
        c.sparkSession.createDataFrame([(-1, 27)], "g long, n0 long")
    )
    fold = (
        f"aggregate(sequence(1, {_COLLATZ_STEPS}),"
        " named_struct('n', n0, 'peak', n0, 'steps', -1L),"
        " (a, i) -> IF(a.steps >= 0, a,"
        "   named_struct("
        "     'n', IF(a.n % 2 = 0, a.n div 2, 3 * a.n + 1),"
        "     'peak', greatest(a.peak,"
        "       IF(a.n % 2 = 0, a.n div 2, 3 * a.n + 1)),"
        "     'steps', IF(IF(a.n % 2 = 0, a.n div 2, 3 * a.n + 1) = 1,"
        "                 i, -1L))))"
    )
    return (
        seeds.withColumn("st", F.expr(fold))
        .select(
            F.col("g").cast("long"),
            F.col("n0").cast("long"),
            F.col("st.steps").cast("long").alias("steps"),
            F.col("st.peak").cast("long").alias("peak"),
            F.when(F.col("st.steps") >= 0, 1)
            .otherwise(0)
            .cast("int")
            .alias("converged"),
        )
        .orderBy("g")
    )


# --------------------------------------------- Mandelbrot escapes

# Mandelbrot escape-time iteration (Brooks-Matelski 1978 / Mandelbrot
# 1980) in exact Q24 fixed point: z <- z^2 + c with products
# truncated by arithmetic >> 24 (floor — identical in Java, DuckDB
# and Python, per the CORDIC shift lesson), escape when
# |z|^2 > 4 strictly. md5 sample of the [-2,1]x[-1.5,1.5] box plus
# exact fixtures: c = 0 and c = -1 never escape, c = -2 sits ON the
# boundary and stays bounded EXACTLY (its Q24 orbit is the fixed
# point 2), c = 1 escapes at iteration 3. Escape times are
# hash-frozen per point — any drift in rounding or the strict
# inequality moves a boundary orbit.
_MANDEL_ORACLE = """
WITH RECURSIVE grp AS MATERIALIZED (
  SELECT DISTINCT c_custkey % 200 AS g FROM customer
),
pts AS MATERIALIZED (
  SELECT g,
         ('0x' || substr(md5('mr:' || CAST(g AS VARCHAR)),
                         1, 8))::BIGINT % 50331648 - 33554432 AS cr,
         ('0x' || substr(md5('mi:' || CAST(g AS VARCHAR)),
                         1, 8))::BIGINT % 50331648 - 25165824 AS ci
  FROM grp
  UNION ALL
  SELECT * FROM (VALUES
    (-1, 0, 0), (-2, -16777216, 0), (-3, -33554432, 0),
    (-4, 16777216, 0)
  ) v(g, cr, ci)
),
st(g, cr, ci, i, zr, zi, esc) AS (
  SELECT g, cr, ci, 0, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
         CAST(-1 AS BIGINT)
  FROM pts
  UNION ALL
  SELECT g, cr, ci, i + 1,
         CASE WHEN esc2 >= 0 THEN zr ELSE zr2 - zi2 + cr END,
         CASE WHEN esc2 >= 0 THEN zi ELSE 2 * ((zr * zi) >> 24) + ci END,
         esc2
  FROM (
    SELECT s.*, (s.zr * s.zr) >> 24 AS zr2, (s.zi * s.zi) >> 24 AS zi2,
           CASE WHEN s.esc >= 0 THEN s.esc
                WHEN ((s.zr * s.zr) >> 24) + ((s.zi * s.zi) >> 24)
                     > 67108864 THEN s.i
                ELSE -1 END AS esc2
    FROM st s WHERE s.i < 64 AND s.esc < 0
  )
),
fin AS (
  SELECT g, cr, ci, max(esc) AS esc
  FROM st GROUP BY g, cr, ci
)
SELECT CAST(g AS BIGINT) AS g, CAST(cr AS BIGINT) AS cr_q24,
       CAST(ci AS BIGINT) AS ci_q24,
       CAST(esc AS BIGINT) AS escape_iter,
       CAST(CASE WHEN esc < 0 THEN 1 ELSE 0 END AS INT) AS bounded
FROM fin ORDER BY g
"""


@register_extra("mandelbrot_escape_times", _MANDEL_ORACLE)
def mandelbrot_escape_times(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q24 Mandelbrot escape times (see oracle comment) — one guarded
    64-step fold per point, map-only exact int64 (|z| < 2^26 so
    squares stay < 2^52)."""
    c = _t(spark, sf_dir, "customer")
    grp = c.select((F.col("c_custkey") % 200).alias("g")).distinct()
    pts = grp.select(
        "g",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("mr:"), F.col("g").cast("string")
                        ).cast("binary")
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 50331648
            - 33554432
        ).alias("cr"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("mi:"), F.col("g").cast("string")
                        ).cast("binary")
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 50331648
            - 25165824
        ).alias("ci"),
    ).unionByName(
        c.sparkSession.createDataFrame(
            [(-1, 0, 0), (-2, -16777216, 0), (-3, -33554432, 0),
             (-4, 16777216, 0)],
            "g long, cr long, ci long",
        )
    )
    fold = (
        "aggregate(sequence(0, 63),"
        " named_struct('zr', 0L, 'zi', 0L, 'esc', -1L),"
        " (a, i) -> IF(a.esc >= 0, a,"
        "   IF(shiftright(a.zr * a.zr, 24) + shiftright(a.zi * a.zi, 24)"
        "      > 67108864,"
        "     named_struct('zr', a.zr, 'zi', a.zi, 'esc', i),"
        "     named_struct("
        "       'zr', shiftright(a.zr * a.zr, 24)"
        "             - shiftright(a.zi * a.zi, 24) + cr,"
        "       'zi', 2 * shiftright(a.zr * a.zi, 24) + ci,"
        "       'esc', -1L))))"
    )
    return (
        pts.withColumn("st", F.expr(fold))
        .select(
            F.col("g").cast("long"),
            F.col("cr").cast("long").alias("cr_q24"),
            F.col("ci").cast("long").alias("ci_q24"),
            F.col("st.esc").cast("long").alias("escape_iter"),
            F.when(F.col("st.esc") < 0, 1).otherwise(0).cast("int")
            .alias("bounded"),
        )
        .orderBy("g")
    )


# --------------------------------------------- logistic map orbits

# The logistic map x <- r x (1 - x) (May 1976) — the canonical route
# to chaos — iterated in EXACT Q30/Q14 fixed point: 400 warm-up
# steps, then the orbit's exact period (<= 32) by integer equality
# (finite-state arithmetic makes converged orbits EXACTLY periodic).
# The bifurcation cascade is frozen in fixtures: r = 2.0 sits on the
# super-attracting fixed point 2^29 exactly (period 1), r = 3.2 ->
# period 2, r = 3.5 -> period 4, r = 3.83 -> the famous period-3
# window, and the chaotic band reports period 0. md5 r-lattice in
# [2.5, 4.0).
_LOGISTIC_ORACLE = """
WITH RECURSIVE grp AS MATERIALIZED (
  SELECT DISTINCT c_custkey % 160 AS g FROM customer
),
rs AS MATERIALIZED (
  SELECT g, 2500 + ('0x' || substr(md5('lg:' || CAST(g AS VARCHAR)),
                                   1, 6))::BIGINT % 1500 AS r_e3
  FROM grp
  UNION ALL
  SELECT * FROM (VALUES (-1, 2000), (-2, 3200), (-3, 3500),
                        (-4, 3830)) v(g, r_e3)
),
warm(g, r_e3, rq, i, x) AS (
  SELECT g, r_e3, (r_e3 << 14) // 1000, 0,
         CAST(536870912 AS BIGINT)
  FROM rs
  UNION ALL
  SELECT g, r_e3, rq, i + 1,
         (rq * ((x * (1073741824 - x)) >> 30)) >> 14
  FROM warm WHERE i < 400
),
s0 AS MATERIALIZED (
  SELECT g, r_e3, rq, x FROM warm WHERE i = 400
),
cyc(g, r_e3, k, y, per) AS (
  SELECT g, r_e3, 0, x, CAST(0 AS BIGINT) FROM s0
  UNION ALL
  SELECT c.g, c.r_e3, c.k + 1,
         (s.rq * ((c.y * (1073741824 - c.y)) >> 30)) >> 14,
         CASE WHEN c.per > 0 THEN c.per
              WHEN (s.rq * ((c.y * (1073741824 - c.y)) >> 30)) >> 14 = s.x
              THEN c.k + 1 ELSE 0 END
  FROM cyc c JOIN s0 s ON s.g = c.g
  WHERE c.per = 0 AND c.k < 32
)
SELECT CAST(c.g AS BIGINT) AS g, CAST(c.r_e3 AS BIGINT) AS r_e3,
       CAST(s.x AS BIGINT) AS x_q30,
       CAST(max(c.per) AS BIGINT) AS period
FROM cyc c JOIN s0 s ON s.g = c.g
GROUP BY c.g, c.r_e3, s.x
ORDER BY g
"""


@register_extra("logistic_map_orbits", _LOGISTIC_ORACLE)
def logistic_map_orbits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic-map orbit periods in exact Q30 (see oracle comment) —
    one 400-step warm-up fold plus a guarded 32-step cycle-detection
    fold per r; map-only exact int64 (x(1-x) products < 2^58)."""
    c = _t(spark, sf_dir, "customer")
    grp = c.select((F.col("c_custkey") % 160).alias("g")).distinct()
    rs = grp.select(
        "g",
        (
            2500
            + F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("lg:"), F.col("g").cast("string")
                        ).cast("binary")
                    ),
                    1,
                    6,
                ),
                16,
                10,
            ).cast("long")
            % 1500
        ).alias("r_e3"),
    ).unionByName(
        c.sparkSession.createDataFrame(
            [(-1, 2000), (-2, 3200), (-3, 3500), (-4, 3830)],
            "g long, r_e3 long",
        )
    )
    base = rs.withColumn("rq", F.expr("(r_e3 << 14) div 1000"))
    warm = (
        "aggregate(sequence(1, 400), 536870912L,"
        " (x, i) -> shiftright(rq * shiftright(x * (1073741824L - x), 30),"
        " 14))"
    )
    cyc = (
        "aggregate(sequence(1, 32),"
        " named_struct('y', x0, 'per', 0L),"
        " (a, k) -> IF(a.per > 0, a, named_struct("
        "   'y', shiftright(rq * shiftright(a.y * (1073741824L - a.y), 30),"
        "        14),"
        "   'per', IF(shiftright(rq * shiftright(a.y * (1073741824L - a.y),"
        "        30), 14) = x0, k, 0L))))"
    )
    return (
        base.withColumn("x0", F.expr(warm))
        .withColumn("st", F.expr(cyc))
        .select(
            F.col("g").cast("long"),
            F.col("r_e3").cast("long"),
            F.col("x0").cast("long").alias("x_q30"),
            F.col("st.per").cast("long").alias("period"),
        )
        .orderBy("g")
    )


# ------------------------------------ Bareiss exact determinant

# Bareiss fraction-free elimination (1968) — exact integer
# determinants without rationals: each step divides by the PREVIOUS
# pivot and the division is always exact (Sylvester's identity), so
# int64 carries 5x5 determinants (~2e10 here) with zero rounding.
# Matrices are md5 entries in [-20, 20] with +100 diagonal dominance
# guaranteeing nonzero leading minors (no pivoting branch needed).
# Four staged list_transform rounds; tests referee against an exact
# Fraction Gaussian elimination. The divisibility itself is part of
# the frozen contract: a single wrong intermediate breaks every
# downstream entry.
_BAREISS_ORACLE = """
WITH RECURSIVE grp AS MATERIALIZED (
  SELECT DISTINCT p_partkey % 180 AS g FROM part
),
mats AS MATERIALIZED (
  SELECT g, list(CAST(v AS BIGINT) ORDER BY idx) AS m
  FROM (
    SELECT g, i.i * 5 + j.j AS idx,
           ('0x' || substr(md5('bd:' || CAST(g AS VARCHAR) || ':'
              || CAST(i.i AS VARCHAR) || ':' || CAST(j.j AS VARCHAR)),
              1, 4))::BIGINT % 41 - 20
           + CASE WHEN i.i = j.j THEN 100 ELSE 0 END AS v
    FROM grp,
         (SELECT unnest(generate_series(0, 4)) AS i) i,
         (SELECT unnest(generate_series(0, 4)) AS j) j
  )
  GROUP BY g
),
st(g, k, m, prev) AS (
  SELECT g, 0, m, CAST(1 AS BIGINT) FROM mats
  UNION ALL
  SELECT g, k + 1,
         list_transform(m, (v, x) ->
           CASE WHEN (x - 1) // 5 > k AND (x - 1) % 5 > k
                THEN (v * m[k * 5 + k + 1]
                      - m[((x - 1) // 5) * 5 + k + 1]
                        * m[k * 5 + ((x - 1) % 5) + 1]) // prev
                ELSE v END),
         m[k * 5 + k + 1]
  FROM st WHERE k < 4
)
SELECT CAST(g AS BIGINT) AS g,
       CAST(m[25] AS BIGINT) AS det,
       CAST(CASE WHEN m[25] <> 0 THEN 1 ELSE 0 END AS INT) AS nonsingular
FROM st WHERE k = 4
ORDER BY g
"""


@register_extra("bareiss_determinant", _BAREISS_ORACLE)
def bareiss_determinant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bareiss exact determinants (see oracle comment) — four chained
    list transforms per matrix, map-only exact int64."""
    p = _t(spark, sf_dir, "part")
    sess = p.sparkSession
    grp = p.select((F.col("p_partkey") % 180).alias("g")).distinct()
    ij = sess.range(0, 25).select(F.col("id").cast("int").alias("idx"))
    mats = (
        grp.crossJoin(F.broadcast(ij))
        .select(
            "g",
            "idx",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("bd:"),
                                F.col("g").cast("string"),
                                F.lit(":"),
                                (F.col("idx") / 5).cast("int").cast("string"),
                                F.lit(":"),
                                (F.col("idx") % 5).cast("string"),
                            ).cast("binary")
                        ),
                        1,
                        4,
                    ),
                    16,
                    10,
                ).cast("long")
                % 41
                - 20
                + F.when(
                    (F.col("idx") / 5).cast("int") == F.col("idx") % 5, 100
                ).otherwise(0)
            ).alias("v"),
        )
        .groupBy("g")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(idx, v))),"
                " x -> x.v)"
            ).alias("m")
        )
        .withColumn("prev", F.lit(1).cast("long"))
    )
    cur = mats
    for k in range(4):
        step = (
            f"transform(m, (v, x) -> IF(x div 5 > {k} AND x % 5 > {k},"
            f" (v * element_at(m, {k * 5 + k + 1})"
            f"  - element_at(m, CAST((x div 5) * 5 + {k} + 1 AS INT))"
            f"    * element_at(m, CAST({k * 5} + (x % 5) + 1 AS INT)))"
            f" div prev, v))"
        )
        cur = cur.withColumn("m2", F.expr(step)).withColumn(
            "prev", F.expr(f"element_at(m, {k * 5 + k + 1})")
        ).drop("m").withColumnRenamed("m2", "m")
    return cur.select(
        F.col("g").cast("long"),
        F.expr("element_at(m, 25)").cast("long").alias("det"),
        F.expr("CAST(IF(element_at(m, 25) <> 0, 1, 0) AS INT)").alias(
            "nonsingular"
        ),
    ).orderBy("g")


# --------------------------------------------- Pisano periods

# Pisano periods (Lagrange 1774): Fibonacci mod m is periodic; the
# period pi(m) divides pi(p^k) lcm-wise and famously pi(10) = 60
# (the last-digit cycle every number-theory text shows). One guarded
# fold walks (F_k, F_{k+1}) mod m until the state returns to (0, 1);
# for m <= 120 the period is < 600, so a 600-step fold suffices.
# Known values are frozen as fixtures: pi(10) = 60, pi(2) = 3,
# pi(7) = 16, pi(100) = 300.
_PISANO_ORACLE = """
WITH RECURSIVE grp AS MATERIALIZED (
  SELECT DISTINCT s_suppkey % 90 AS g FROM supplier
),
ms AS MATERIALIZED (
  SELECT g, 2 + ('0x' || substr(md5('pi:' || CAST(g AS VARCHAR)),
                                1, 4))::BIGINT % 119 AS m
  FROM grp
  UNION ALL
  SELECT * FROM (VALUES (-1, 10), (-2, 2), (-3, 7), (-4, 100))
    v(g, m)
),
st(g, m, k, a, b, per) AS (
  SELECT g, m, 0, CAST(0 AS BIGINT), CAST(1 AS BIGINT),
         CAST(0 AS BIGINT)
  FROM ms
  UNION ALL
  SELECT g, m, k + 1, b, (a + b) % m,
         CASE WHEN per > 0 THEN per
              WHEN b = 0 AND (a + b) % m = 1 THEN k + 1
              ELSE 0 END
  FROM st WHERE per = 0 AND k < 600
)
SELECT CAST(g AS BIGINT) AS g, CAST(m AS BIGINT) AS m,
       CAST(max(per) AS BIGINT) AS pisano_period
FROM st GROUP BY g, m
ORDER BY g
"""


@register_extra("pisano_periods", _PISANO_ORACLE)
def pisano_periods(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pisano periods of Fibonacci mod m (see oracle comment) — one
    guarded 600-step fold per modulus, map-only."""
    s = _t(spark, sf_dir, "supplier")
    grp = s.select((F.col("s_suppkey") % 90).alias("g")).distinct()
    ms = grp.select(
        "g",
        (
            2
            + F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("pi:"), F.col("g").cast("string")
                        ).cast("binary")
                    ),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("long")
            % 119
        ).alias("m"),
    ).unionByName(
        s.sparkSession.createDataFrame(
            [(-1, 10), (-2, 2), (-3, 7), (-4, 100)], "g long, m long"
        )
    )
    fold = (
        "aggregate(sequence(1, 600),"
        " named_struct('a', 0L, 'b', 1L, 'per', 0L),"
        " (x, k) -> IF(x.per > 0, x, named_struct("
        "   'a', x.b, 'b', (x.a + x.b) % m,"
        "   'per', IF(x.b = 0 AND (x.a + x.b) % m = 1, k, 0L))))"
    )
    return (
        ms.withColumn("st", F.expr(fold))
        .select(
            F.col("g").cast("long"),
            F.col("m").cast("long"),
            F.col("st.per").cast("long").alias("pisano_period"),
        )
        .orderBy("g")
    )


# --------------------------------------------- Burnside necklaces

# Burnside / Polya counting (1897): binary necklaces of length n
# number (1/n) * sum_{d|n} phi(d) * 2^(n/d). The query computes this
# closed form (phi from a frozen table over d <= 12) AND brute-forces
# the orbit count — canonicalize all 2^n strings by their minimum
# rotation and count distinct — then freezes their EQUALITY per n:
# Burnside's lemma demonstrated inside the gate hash, n = 4..12.
_NECKLACE_ORACLE = """
WITH ns AS MATERIALIZED (
  SELECT unnest(generate_series(4, 12)) AS n
),
phi AS MATERIALIZED (
  SELECT * FROM (VALUES (1, 1), (2, 1), (3, 2), (4, 2), (5, 4),
                        (6, 2), (7, 6), (8, 4), (9, 6), (10, 4),
                        (11, 10), (12, 4)) v(d, ph)
),
formula AS MATERIALIZED (
  SELECT n.n,
         sum(p.ph * (1 << (n.n // p.d))) // n.n AS by_formula
  FROM ns n JOIN phi p ON n.n % p.d = 0
  GROUP BY n.n
),
strings AS MATERIALIZED (
  SELECT n.n, s.s
  FROM ns n, (SELECT unnest(generate_series(0, 4095)) AS s) s
  WHERE s.s < (1 << n.n)
),
canon AS MATERIALIZED (
  SELECT n, s,
         (SELECT min(((s >> r.r) | (s << (n - r.r))) & ((1 << n) - 1))
          FROM (SELECT unnest(generate_series(0, 11)) AS r) r
          WHERE r.r < n) AS c
  FROM strings
),
brute AS MATERIALIZED (
  SELECT n, count(DISTINCT c) AS by_orbits FROM canon GROUP BY n
)
SELECT CAST(f.n AS INT) AS n,
       CAST(f.by_formula AS BIGINT) AS by_formula,
       CAST(b.by_orbits AS BIGINT) AS by_orbits,
       CAST(CASE WHEN f.by_formula = b.by_orbits THEN 1 ELSE 0 END
            AS INT) AS burnside_holds
FROM formula f JOIN brute b ON b.n = f.n
ORDER BY n
"""


@register_extra("burnside_necklaces", _NECKLACE_ORACLE)
def burnside_necklaces(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Necklace counts two ways (see oracle comment) — the divisor
    formula is a broadcast join over the frozen phi table; the brute
    orbit count canonicalizes 2^n rotations via min-over-rotation,
    one partial-agg distinct. Equality frozen per n."""
    sess = spark
    ns = sess.range(4, 13).select(F.col("id").cast("int").alias("n"))
    phi = sess.createDataFrame(
        [(1, 1), (2, 1), (3, 2), (4, 2), (5, 4), (6, 2), (7, 6),
         (8, 4), (9, 6), (10, 4), (11, 10), (12, 4)],
        "d int, ph long",
    )
    formula = (
        ns.join(F.broadcast(phi), F.expr("n % d = 0"))
        .groupBy("n")
        .agg(
            F.expr("sum(ph * shiftleft(1L, n div d)) div n").alias(
                "by_formula"
            )
        )
    )
    strings = (
        ns.crossJoin(
            sess.range(0, 4096).select(F.col("id").cast("long").alias("s"))
        )
        .filter(F.expr("s < shiftleft(1L, n)"))
    )
    canon = strings.withColumn(
        "c",
        F.expr(
            "array_min(transform(sequence(0, n - 1), r ->"
            " ((s >> r) | (s << (n - r))) & (shiftleft(1L, n) - 1)))"
        ),
    )
    brute = canon.groupBy("n").agg(
        F.countDistinct("c").alias("by_orbits")
    )
    return (
        formula.join(brute, "n")
        .select(
            F.col("n").cast("int"),
            F.col("by_formula").cast("long"),
            F.col("by_orbits").cast("long"),
            F.when(F.col("by_formula") == F.col("by_orbits"), 1)
            .otherwise(0)
            .cast("int")
            .alias("burnside_holds"),
        )
        .orderBy("n")
    )


# --------------------------------------------- sparse table RMQ

# Sparse-table range-minimum queries (Bender & Farach-Colton 2000):
# precompute log-levels st[j][i] = min over [i, i + 2^j) by doubling,
# answer any range as the min of TWO overlapping power-of-two blocks
# — O(1) per query after O(n log n) build, the structure under every
# LCA/RMQ reduction. 64-element md5 arrays, 6 doubling levels built
# as chained array transforms; 20 md5 queries per array are answered
# BOTH ways (sparse lookup vs direct slice min) and their equality is
# hash-frozen. floor(log2(len)) is exact in doubles for len <= 64.
_RMQ_ORACLE = """
WITH grp AS MATERIALIZED (
  SELECT DISTINCT s_suppkey % 60 AS g FROM supplier
),
arr AS MATERIALIZED (
  SELECT g, list(('0x' || substr(md5('rq:' || CAST(g AS VARCHAR) || ':'
                    || CAST(i AS VARCHAR)), 1, 5))::BIGINT % 100000
                 ORDER BY i) AS a
  FROM grp, (SELECT unnest(generate_series(0, 63)) AS i)
  GROUP BY g
),
lv AS MATERIALIZED (
  SELECT g, a,
         a AS l0,
         list_transform(a, (v, i) ->
           CASE WHEN i + 1 <= 64 THEN least(v, coalesce(a[i + 1], v))
                ELSE v END) AS l1
  FROM arr
),
lv2 AS MATERIALIZED (
  SELECT *, list_transform(l1, (v, i) ->
    least(v, coalesce(l1[i + 2], v))) AS l2 FROM lv
),
lv3 AS MATERIALIZED (
  SELECT *, list_transform(l2, (v, i) ->
    least(v, coalesce(l2[i + 4], v))) AS l3 FROM lv2
),
lv4 AS MATERIALIZED (
  SELECT *, list_transform(l3, (v, i) ->
    least(v, coalesce(l3[i + 8], v))) AS l4 FROM lv3
),
lv5 AS MATERIALIZED (
  SELECT *, list_transform(l4, (v, i) ->
    least(v, coalesce(l4[i + 16], v))) AS l5 FROM lv4
),
lv6 AS MATERIALIZED (
  SELECT *, list_transform(l5, (v, i) ->
    least(v, coalesce(l5[i + 32], v))) AS l6 FROM lv5
),
qs AS MATERIALIZED (
  SELECT g, q.q,
         ('0x' || substr(md5('ql:' || CAST(g AS VARCHAR) || ':'
            || CAST(q.q AS VARCHAR)), 1, 4))::BIGINT % 64 AS l0q,
         ('0x' || substr(md5('qr:' || CAST(g AS VARCHAR) || ':'
            || CAST(q.q AS VARCHAR)), 1, 4))::BIGINT % 64 AS r0q
  FROM grp, (SELECT unnest(generate_series(0, 19)) AS q) q
),
qn AS MATERIALIZED (
  SELECT g, q, least(l0q, r0q) AS l, greatest(l0q, r0q) AS r,
         CAST(floor(log2(greatest(l0q, r0q) - least(l0q, r0q) + 1))
              AS BIGINT) AS k
  FROM qs
),
ans AS MATERIALIZED (
  SELECT q.g, q.q, q.l, q.r, q.k,
         least(
           CASE q.k WHEN 0 THEN v.l0[q.l + 1] WHEN 1 THEN v.l1[q.l + 1]
                WHEN 2 THEN v.l2[q.l + 1] WHEN 3 THEN v.l3[q.l + 1]
                WHEN 4 THEN v.l4[q.l + 1] WHEN 5 THEN v.l5[q.l + 1]
                ELSE v.l6[q.l + 1] END,
           CASE q.k WHEN 0 THEN v.l0[q.r - (1 << q.k) + 2]
                WHEN 1 THEN v.l1[q.r - (1 << q.k) + 2]
                WHEN 2 THEN v.l2[q.r - (1 << q.k) + 2]
                WHEN 3 THEN v.l3[q.r - (1 << q.k) + 2]
                WHEN 4 THEN v.l4[q.r - (1 << q.k) + 2]
                WHEN 5 THEN v.l5[q.r - (1 << q.k) + 2]
                ELSE v.l6[q.r - (1 << q.k) + 2] END) AS rmq_sparse,
         list_min(v.a[q.l + 1 : q.r + 1]) AS rmq_direct
  FROM qn q JOIN lv6 v ON v.g = q.g
)
SELECT CAST(g AS BIGINT) AS g, CAST(q AS INT) AS q,
       CAST(l AS BIGINT) AS l, CAST(r AS BIGINT) AS r,
       CAST(rmq_sparse AS BIGINT) AS rmq_sparse,
       CAST(rmq_direct AS BIGINT) AS rmq_direct,
       CAST(CASE WHEN rmq_sparse = rmq_direct THEN 1 ELSE 0 END AS INT)
         AS agree
FROM ans ORDER BY g, q
"""


@register_extra("sparse_table_rmq", _RMQ_ORACLE)
def sparse_table_rmq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse-table RMQ vs direct slice min (see oracle comment) —
    six chained array transforms build the table, per-query lookups
    are pure column algebra; agreement frozen per query."""
    s = _t(spark, sf_dir, "supplier")
    sess = s.sparkSession
    grp = s.select((F.col("s_suppkey") % 60).alias("g")).distinct()
    arr = (
        grp.crossJoin(
            sess.range(0, 64).select(F.col("id").cast("int").alias("i"))
        )
        .select(
            "g",
            "i",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("rq:"),
                                F.col("g").cast("string"),
                                F.lit(":"),
                                F.col("i").cast("string"),
                            ).cast("binary")
                        ),
                        1,
                        5,
                    ),
                    16,
                    10,
                ).cast("long")
                % 100000
            ).alias("v"),
        )
        .groupBy("g")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(i, v))),"
                " x -> x.v)"
            ).alias("a")
        )
        .withColumn("l0", F.col("a"))
    )
    cur = arr
    for j in range(1, 7):
        off = 1 << (j - 1)
        cur = cur.withColumn(
            f"l{j}",
            F.expr(
                f"transform(l{j-1}, (v, i) -> least(v,"
                f" coalesce(try_element_at(l{j-1}, i + {off} + 1), v)))"
            ),
        )
    qs = (
        grp.crossJoin(
            sess.range(0, 20).select(F.col("id").cast("int").alias("q"))
        )
        .select(
            "g",
            "q",
            *[
                (
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.lit(p),
                                    F.col("g").cast("string"),
                                    F.lit(":"),
                                    F.col("q").cast("string"),
                                ).cast("binary")
                            ),
                            1,
                            4,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % 64
                ).alias(nm)
                for p, nm in [("ql:", "l0q"), ("qr:", "r0q")]
            ],
        )
        .withColumn("l", F.least("l0q", "r0q"))
        .withColumn("r", F.greatest("l0q", "r0q"))
        .withColumn(
            "k",
            F.expr(
                "CAST(floor(log2(CAST(r - l + 1 AS DOUBLE))) AS BIGINT)"
            ),
        )
    )
    look = " ".join(
        f"WHEN {j} THEN try_element_at(l{j}, CAST({{pos}} AS INT))"
        for j in range(7)
    )
    sparse = (
        f"least(CASE k {look.format(pos='l + 1')} END,"
        f" CASE k {look.format(pos='r - shiftleft(1L, CAST(k AS INT)) + 2')}"
        " END)"
    )
    return (
        qs.join(cur, "g")
        .withColumn("rmq_sparse", F.expr(sparse))
        .withColumn(
            "rmq_direct",
            F.expr(
                "array_min(slice(a, CAST(l AS INT) + 1,"
                " CAST(r - l + 1 AS INT)))"
            ),
        )
        .select(
            F.col("g").cast("long"),
            F.col("q").cast("int"),
            F.col("l").cast("long"),
            F.col("r").cast("long"),
            F.col("rmq_sparse").cast("long"),
            F.col("rmq_direct").cast("long"),
            F.when(F.col("rmq_sparse") == F.col("rmq_direct"), 1)
            .otherwise(0)
            .cast("int")
            .alias("agree"),
        )
        .orderBy("g", "q")
    )


# --------------------------------------------- de Bruijn sequences

# de Bruijn sequences B(2, n) (1946) constructed the classic way:
# run a maximal-length LFSR (primitive taps, all four degree-4/5
# primitive pairs) for its 2^n - 1 period, then splice one extra 0
# into the unique run of n-1 zeros. The m-sequence property (all
# 2^n - 1 nonzero windows distinct) and the de Bruijn property (all
# 2^n cyclic windows distinct after the splice) are both recomputed
# by explicit window extraction and hash-frozen — the two-line
# construction every combinatorics course shows, certified in-query.
_DEBRUIJN_ORACLE = """
WITH RECURSIVE polys AS MATERIALIZED (
  SELECT * FROM (VALUES (4, 3, 4), (4, 1, 4), (5, 3, 5), (5, 2, 5))
    v(deg, t1, t2)
),
lf(deg, t1, t2, i, st, seq) AS (
  -- st bits: bit k = s_{n-1-k} (newest at bit 0); seed 1 at newest
  SELECT deg, t1, t2, 0, CAST(1 AS BIGINT), CAST(0 AS BIGINT)
  FROM polys
  UNION ALL
  SELECT deg, t1, t2, i + 1,
         (((st << 1) | (xor(st >> (t1 - 1), st >> (t2 - 1)) & 1))
          & ((1 << deg) - 1)),
         seq | (((st >> (deg - 1)) & 1) << i)
  FROM lf WHERE i < (1 << deg) - 1
),
ms AS MATERIALIZED (
  SELECT deg, t1, t2, seq, (1 << deg) - 1 AS per
  FROM lf WHERE i = (1 << deg) - 1
),
zrun AS MATERIALIZED (
  SELECT m.deg, m.t1, m.t2, m.seq, m.per,
         min(p.p) AS zp
  FROM ms m, (SELECT unnest(generate_series(0, 30)) AS p) p
  WHERE p.p < m.per
    AND CAST((((m.seq::HUGEINT | (m.seq::HUGEINT << m.per)) >> p.p)
         & ((1 << (m.deg - 1)) - 1)) AS BIGINT) = 0
  GROUP BY 1, 2, 3, 4, 5
),
db AS MATERIALIZED (
  SELECT deg, t1, t2, seq, per, zp,
         (seq & ((1 << zp) - 1))
         | CAST(((seq::HUGEINT >> zp) << (zp + 1)) AS BIGINT) AS dbv,
         per + 1 AS n
  FROM zrun
),
mwin AS MATERIALIZED (
  SELECT m.deg, m.seq, count(DISTINCT
    CAST((((m.seq::HUGEINT | (m.seq::HUGEINT << m.per)) >> p.p)
         & ((1 << m.deg) - 1)) AS BIGINT)) AS mdist
  FROM ms m, (SELECT unnest(generate_series(0, 30)) AS p) p
  WHERE p.p < m.per
  GROUP BY 1, 2
),
dwin AS MATERIALIZED (
  SELECT d.deg, d.dbv, d.n, count(DISTINCT
    CAST((((d.dbv::HUGEINT | (d.dbv::HUGEINT << d.n)) >> p.p)
         & ((1 << d.deg) - 1)) AS BIGINT)) AS ddist
  FROM db d, (SELECT unnest(generate_series(0, 31)) AS p) p
  WHERE p.p < d.n
  GROUP BY 1, 2, 3
)
SELECT CAST(d.deg AS INT) AS deg, CAST(d.t1 AS INT) AS t1,
       CAST(d.t2 AS INT) AS t2,
       CAST(d.seq AS BIGINT) AS mseq_bits,
       CAST(d.dbv AS BIGINT) AS debruijn_bits,
       CAST(w.mdist AS BIGINT) AS mseq_windows,
       CAST(x.ddist AS BIGINT) AS db_windows,
       CAST(CASE WHEN w.mdist = d.per AND x.ddist = d.n
            THEN 1 ELSE 0 END AS INT) AS certified
FROM db d
JOIN mwin w ON w.deg = d.deg AND w.seq = d.seq
JOIN dwin x ON x.deg = d.deg AND x.dbv = d.dbv
ORDER BY deg, t1
"""


@register_extra("debruijn_sequences", _DEBRUIJN_ORACLE)
def debruijn_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LFSR-spliced de Bruijn sequences with in-query certification
    (see oracle comment) — one LFSR fold per primitive polynomial,
    window extraction via HUGEINT-safe cyclic doubling, both
    distinctness certificates frozen."""
    sess = spark
    polys = sess.createDataFrame(
        [(4, 3, 4), (4, 1, 4), (5, 3, 5), (5, 2, 5)],
        "deg int, t1 int, t2 int",
    )
    fold = (
        "aggregate(sequence(0, CAST((shiftleft(1, deg) - 2) AS INT)),"
        " named_struct('st', 1L, 'seq', 0L),"
        " (a, i) -> named_struct("
        "   'st', ((a.st << 1)"
        "     | ((a.st >> (t1 - 1)) ^ (a.st >> (t2 - 1))) & 1)"
        "     & (shiftleft(1L, deg) - 1),"
        "   'seq', a.seq | (((a.st >> (deg - 1)) & 1) << i)),"
        " a -> a.seq)"
    )
    ms = polys.withColumn("seq", F.expr(fold)).withColumn(
        "per", F.expr("shiftleft(1L, deg) - 1")
    )
    ps = sess.range(0, 32).select(F.col("id").cast("int").alias("p"))
    win = (
        "(CAST(shiftright(seq | shiftleft(seq, CAST(per AS INT)),"
        " p) AS BIGINT) & (shiftleft(1L, {w}) - 1))"
    )
    zrun = (
        ms.crossJoin(F.broadcast(ps))
        .filter(F.col("p") < F.col("per"))
        .filter(F.expr(win.format(w="deg - 1") + " = 0"))
        .groupBy("deg", "t1", "t2", "seq", "per")
        .agg(F.min("p").alias("zp"))
    )
    db = zrun.withColumn(
        "dbv",
        F.expr(
            "(seq & (shiftleft(1L, CAST(zp AS INT)) - 1))"
            " | shiftleft(shiftright(seq, CAST(zp AS INT)),"
            " CAST(zp AS INT) + 1)"
        ),
    ).withColumn("n", F.col("per") + 1)
    mwin = (
        ms.crossJoin(F.broadcast(ps))
        .filter(F.col("p") < F.col("per"))
        .groupBy("deg", "seq")
        .agg(
            F.countDistinct(F.expr(win.format(w="deg"))).alias("mdist")
        )
    )
    dwin = (
        db.crossJoin(F.broadcast(ps))
        .filter(F.col("p") < F.col("n"))
        .groupBy("deg", "dbv")
        .agg(
            F.countDistinct(
                F.expr(
                    "(CAST(shiftright(dbv | shiftleft(dbv,"
                    " CAST(n AS INT)), p) AS BIGINT)"
                    " & (shiftleft(1L, deg) - 1))"
                )
            ).alias("ddist")
        )
    )
    return (
        db.join(mwin, ["deg", "seq"])
        .join(dwin, ["deg", "dbv"])
        .select(
            F.col("deg").cast("int"),
            F.col("t1").cast("int"),
            F.col("t2").cast("int"),
            F.col("seq").cast("long").alias("mseq_bits"),
            F.col("dbv").cast("long").alias("debruijn_bits"),
            F.col("mdist").cast("long").alias("mseq_windows"),
            F.col("ddist").cast("long").alias("db_windows"),
            F.when(
                (F.col("mdist") == F.col("per"))
                & (F.col("ddist") == F.col("n")),
                1,
            )
            .otherwise(0)
            .cast("int")
            .alias("certified"),
        )
        .orderBy("deg", "t1")
    )


# --------------------------------------------- Gray code + BLR

# Reflected binary Gray code (Gray 1953): g(k) = k ^ (k >> 1) walks
# ALL 2^n codes changing exactly one bit per step, cyclically — i.e.
# a Hamiltonian cycle on the hypercube. For n = 6..10 the query
# recomputes bijectivity (distinct count), the unit-Hamming-step
# property (including the wraparound edge) and freezes both.
_GRAY_ORACLE = """
WITH ns AS MATERIALIZED (SELECT unnest(generate_series(6, 10)) AS n),
codes AS MATERIALIZED (
  SELECT n, k.k, xor(k.k, k.k >> 1) AS g
  FROM ns, (SELECT unnest(generate_series(0, 1023)) AS k) k
  WHERE k.k < (1 << n)
),
steps AS MATERIALIZED (
  SELECT c.n, c.k,
         bit_count(xor(c.g,
           (SELECT g FROM codes x
            WHERE x.n = c.n AND x.k = (c.k + 1) % (1 << c.n)))) AS hd
  FROM codes c
)
SELECT CAST(c.n AS INT) AS n,
       CAST(count(DISTINCT c.g) AS BIGINT) AS n_distinct,
       CAST((SELECT min(hd) FROM steps s WHERE s.n = c.n) AS BIGINT)
         AS min_step,
       CAST((SELECT max(hd) FROM steps s WHERE s.n = c.n) AS BIGINT)
         AS max_step,
       CAST(CASE WHEN count(DISTINCT c.g) = (1 << c.n)
                  AND (SELECT max(hd) FROM steps s WHERE s.n = c.n) = 1
            THEN 1 ELSE 0 END AS INT) AS hamiltonian
FROM codes c GROUP BY c.n ORDER BY n
"""


@register_extra("gray_code_cycle", _GRAY_ORACLE)
def gray_code_cycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gray-code Hamiltonian-cycle certificate (see oracle comment) —
    pure column algebra plus a self-join for the successor step."""
    sess = spark
    ns = sess.range(6, 11).select(F.col("id").cast("int").alias("n"))
    ks = sess.range(0, 1024).select(F.col("id").cast("long").alias("k"))
    codes = (
        ns.crossJoin(F.broadcast(ks))
        .filter(F.expr("k < shiftleft(1L, n)"))
        .withColumn("g", F.expr("k ^ (k >> 1)"))
        .localCheckpoint(eager=True)
    )
    nxt = codes.select(
        F.col("n").alias("n2"), F.col("k").alias("k2"),
        F.col("g").alias("g2"),
    )
    steps = codes.join(
        nxt,
        (F.col("n2") == F.col("n"))
        & (F.col("k2") == F.expr("(k + 1) % shiftleft(1L, n)")),
    ).select("n", F.expr("bit_count(g ^ g2)").alias("hd"))
    agg1 = codes.groupBy("n").agg(F.countDistinct("g").alias("n_distinct"))
    agg2 = steps.groupBy("n").agg(
        F.min("hd").alias("min_step"), F.max("hd").alias("max_step")
    )
    return (
        agg1.join(agg2, "n")
        .select(
            F.col("n").cast("int"),
            F.col("n_distinct").cast("long"),
            F.col("min_step").cast("long"),
            F.col("max_step").cast("long"),
            F.when(
                (F.col("n_distinct") == F.expr("shiftleft(1L, n)"))
                & (F.col("max_step") == 1),
                1,
            )
            .otherwise(0)
            .cast("int")
            .alias("hamiltonian"),
        )
        .orderBy("n")
    )


# --------------------------------------------- BLR linearity test

# The BLR linearity test (Blum-Luby-Rubinfeld 1990) — the founding
# result of property testing and the core of PCP constructions: a
# Boolean function f: {0,1}^6 -> {0,1} is linear iff
# f(x) ^ f(y) = f(x ^ y) for ALL pairs. The query runs the test
# EXHAUSTIVELY (64 x 64 pairs per function) on md5 truth tables plus
# engineered fixtures: a true parity function chi_S (passes 4096 /
# 4096, frozen), and chi_S with ONE flipped entry — the
# property-testing punchline: a single point of corruption fails
# ~3/64 of pairs, far above the distance-to-linear bound, while
# random functions sit near the 1/2 pass floor.
_BLR_ORACLE = """
WITH fns AS MATERIALIZED (
  SELECT g.g, x.x,
         CASE WHEN g.g = -1 THEN bit_count(x.x & 21) % 2
              WHEN g.g = -2 THEN
                CASE WHEN x.x = 37 THEN 1 - bit_count(x.x & 21) % 2
                     ELSE bit_count(x.x & 21) % 2 END
              ELSE ('0x' || substr(md5('bl:' || CAST(g.g AS VARCHAR)
                     || ':' || CAST(x.x AS VARCHAR)), 1, 4))::BIGINT % 2
         END AS f
  FROM (SELECT unnest(generate_series(-2, 27)) AS g) g,
       (SELECT unnest(generate_series(0, 63)) AS x) x
),
test AS MATERIALIZED (
  SELECT a.g,
         sum(CASE WHEN xor(a.f, b.f) = c.f THEN 1 ELSE 0 END) AS npass,
         count(*) AS npairs
  FROM fns a
  JOIN fns b ON b.g = a.g
  JOIN fns c ON c.g = a.g AND c.x = xor(a.x, b.x)
  GROUP BY a.g
)
SELECT CAST(g AS BIGINT) AS g, CAST(npass AS BIGINT) AS n_pass,
       CAST(npairs AS BIGINT) AS n_pairs,
       CAST(CASE WHEN npass = npairs THEN 1 ELSE 0 END AS INT)
         AS is_linear
FROM test ORDER BY g
"""


@register_extra("blr_linearity_test", _BLR_ORACLE)
def blr_linearity_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exhaustive BLR linearity testing (see oracle comment) — one
    triple self-join per function over the 64-point cube; pass
    counts exact and hash-frozen."""
    sess = spark
    gs = sess.range(-2, 28).select(F.col("id").cast("long").alias("g"))
    xs = sess.range(0, 64).select(F.col("id").cast("long").alias("x"))
    fns = (
        gs.crossJoin(F.broadcast(xs))
        .withColumn(
            "f",
            F.expr(
                "CASE WHEN g = -1 THEN bit_count(x & 21) % 2"
                " WHEN g = -2 THEN"
                "   CASE WHEN x = 37 THEN 1 - bit_count(x & 21) % 2"
                "        ELSE bit_count(x & 21) % 2 END"
                " ELSE CAST(conv(substring(md5(CAST(concat('bl:',"
                " CAST(g AS STRING), ':', CAST(x AS STRING)) AS BINARY)),"
                " 1, 4), 16, 10) AS BIGINT) % 2 END"
            ).cast("long"),
        )
        .localCheckpoint(eager=True)
    )
    a = fns.select("g", F.col("x").alias("xa"), F.col("f").alias("fa"))
    b = fns.select(
        F.col("g").alias("gb"), F.col("x").alias("xb"),
        F.col("f").alias("fb"),
    )
    c = fns.select(
        F.col("g").alias("gc"), F.col("x").alias("xc"),
        F.col("f").alias("fc"),
    )
    return (
        a.join(b, F.col("gb") == F.col("g"))
        .join(
            c,
            (F.col("gc") == F.col("g"))
            & (F.col("xc") == F.expr("xa ^ xb")),
        )
        .groupBy("g")
        .agg(
            F.sum(
                F.when(F.expr("(fa ^ fb) = fc"), 1).otherwise(0)
            ).alias("n_pass"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
        .select(
            F.col("g").cast("long"),
            F.col("n_pass").cast("long"),
            F.col("n_pairs").cast("long"),
            F.when(F.col("n_pass") == F.col("n_pairs"), 1)
            .otherwise(0)
            .cast("int")
            .alias("is_linear"),
        )
        .orderBy("g")
    )


# --------------------------------------------- Zobrist hashing

# Zobrist hashing (1970) — the incremental position hash in every
# chess/go engine: position hash = XOR of per-(square, piece) random
# keys, so applying a move updates the hash with THREE xors instead
# of a full rescan. 120 md5 board states (8x8, 6 piece kinds, ~12
# pieces) each get one md5 move (src piece to an empty square); the
# query recomputes the destination hash BOTH ways — full rescan vs
# incremental xor — and freezes their equality, plus the
# empty-board = 0 convention.
_ZOBRIST_ORACLE = """
WITH grp AS MATERIALIZED (
  SELECT DISTINCT c_custkey % 120 AS g FROM customer
),
board AS MATERIALIZED (
  SELECT g, sq.sq,
         CASE WHEN ('0x' || substr(md5('zo:' || CAST(g AS VARCHAR)
                || ':' || CAST(sq.sq AS VARCHAR)), 1, 4))::BIGINT
                % 5 = 0
              THEN ('0x' || substr(md5('zp:' || CAST(g AS VARCHAR)
                     || ':' || CAST(sq.sq AS VARCHAR)), 1, 4))::BIGINT
                   % 6
              ELSE -1 END AS piece
  FROM grp, (SELECT unnest(generate_series(0, 63)) AS sq) sq
),
keys AS MATERIALIZED (
  SELECT sq.sq, p.p,
         ('0x' || substr(md5('zk:' || CAST(sq.sq AS VARCHAR) || ':'
            || CAST(p.p AS VARCHAR)), 1, 15))::BIGINT AS k
  FROM (SELECT unnest(generate_series(0, 63)) AS sq) sq,
       (SELECT unnest(generate_series(0, 5)) AS p) p
),
h0 AS MATERIALIZED (
  SELECT b.g, bit_xor(k.k) AS h
  FROM board b JOIN keys k ON k.sq = b.sq AND k.p = b.piece
  WHERE b.piece >= 0
  GROUP BY b.g
),
mv AS MATERIALIZED (
  -- source: first occupied square; destination: first empty square
  SELECT g,
         min(CASE WHEN piece >= 0 THEN sq END) AS src,
         min(CASE WHEN piece < 0 THEN sq END) AS dst
  FROM board GROUP BY g
),
moved AS MATERIALIZED (
  SELECT b.g,
         CASE WHEN b.sq = m.src THEN -1
              WHEN b.sq = m.dst THEN
                (SELECT piece FROM board x
                 WHERE x.g = b.g AND x.sq = m.src)
              ELSE b.piece END AS piece,
         b.sq
  FROM board b JOIN mv m ON m.g = b.g
),
h1full AS MATERIALIZED (
  SELECT b.g, bit_xor(k.k) AS h
  FROM moved b JOIN keys k ON k.sq = b.sq AND k.p = b.piece
  WHERE b.piece >= 0
  GROUP BY b.g
),
h1inc AS MATERIALIZED (
  SELECT h0.g,
         xor(xor(h0.h, ks.k), kd.k) AS h
  FROM h0
  JOIN mv m ON m.g = h0.g
  JOIN board bsrc ON bsrc.g = h0.g AND bsrc.sq = m.src
  JOIN keys ks ON ks.sq = m.src AND ks.p = bsrc.piece
  JOIN keys kd ON kd.sq = m.dst AND kd.p = bsrc.piece
)
SELECT CAST(f.g AS BIGINT) AS g,
       CAST(f.h AS BIGINT) AS hash_full,
       CAST(i.h AS BIGINT) AS hash_incremental,
       CAST(CASE WHEN f.h = i.h THEN 1 ELSE 0 END AS INT) AS agree
FROM h1full f JOIN h1inc i ON i.g = f.g
ORDER BY g
"""


@register_extra("zobrist_incremental_hash", _ZOBRIST_ORACLE)
def zobrist_incremental_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zobrist incremental hashing (see oracle comment) — full rescan
    vs three-xor update, equality frozen per board."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    sess = c.sparkSession
    grp = c.select((F.col("c_custkey") % 120).alias("g")).distinct()
    sqs = sess.range(0, 64).select(F.col("id").cast("long").alias("sq"))
    pps = sess.range(0, 6).select(F.col("id").cast("long").alias("p"))

    def _h4(prefix: str, a: str, b: str, chars: int = 4) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(prefix),
                        F.col(a).cast("string"),
                        F.lit(":"),
                        F.col(b).cast("string"),
                    ).cast("binary")
                ),
                1,
                chars,
            ),
            16,
            10,
        ).cast("long")

    board = (
        grp.crossJoin(F.broadcast(sqs))
        .select(
            "g",
            "sq",
            F.when(
                _h4("zo:", "g", "sq") % 5 == 0, _h4("zp:", "g", "sq") % 6
            )
            .otherwise(-1)
            .alias("piece"),
        )
        .localCheckpoint(eager=True)
    )
    keys = (
        sqs.crossJoin(F.broadcast(pps))
        .select("sq", "p", _h4("zk:", "sq", "p", 15).alias("k"))
        .localCheckpoint(eager=True)
    )
    h0 = (
        board.filter(F.col("piece") >= 0)
        .join(
            F.broadcast(keys),
            (keys.sq == board.sq) & (keys.p == board.piece),
        )
        .groupBy("g")
        .agg(F.expr("bit_xor(k)").alias("h0"))
    )
    mv = board.groupBy("g").agg(
        F.min(F.when(F.col("piece") >= 0, F.col("sq"))).alias("src"),
        F.min(F.when(F.col("piece") < 0, F.col("sq"))).alias("dst"),
    )
    srcp = board.select(
        F.col("g").alias("gs"), F.col("sq").alias("src"),
        F.col("piece").alias("sp"),
    )
    mv2 = mv.join(
        srcp, (F.col("gs") == F.col("g")) & (srcp.src == mv.src)
    ).select("g", mv.src, "dst", "sp")
    moved = (
        board.join(F.broadcast(mv2), "g")
        .select(
            "g",
            "sq",
            F.when(F.col("sq") == F.col("src"), -1)
            .when(F.col("sq") == F.col("dst"), F.col("sp"))
            .otherwise(F.col("piece"))
            .alias("piece"),
        )
    )
    h1full = (
        moved.filter(F.col("piece") >= 0)
        .join(
            F.broadcast(keys),
            (keys.sq == moved.sq) & (keys.p == moved.piece),
        )
        .groupBy("g")
        .agg(F.expr("bit_xor(k)").alias("hf"))
    )
    ks = keys.select(
        F.col("sq").alias("src"), F.col("p").alias("sp"),
        F.col("k").alias("ksrc"),
    )
    kd = keys.select(
        F.col("sq").alias("dst"), F.col("p").alias("sp"),
        F.col("k").alias("kdst"),
    )
    h1inc = (
        h0.join(F.broadcast(mv2), "g")
        .join(F.broadcast(ks), ["src", "sp"])
        .join(F.broadcast(kd), ["dst", "sp"])
        .select("g", F.expr("h0 ^ ksrc ^ kdst").alias("hi"))
    )
    return (
        h1full.join(h1inc, "g")
        .select(
            F.col("g").cast("long"),
            F.col("hf").cast("long").alias("hash_full"),
            F.col("hi").cast("long").alias("hash_incremental"),
            F.when(F.col("hf") == F.col("hi"), 1).otherwise(0).cast("int")
            .alias("agree"),
        )
        .orderBy("g")
    )


# ------------------------------------ STS(9) + Hadamard certificates

# Two classic construction-plus-certificate pairs. The Steiner triple
# system STS(9) is the affine plane AG(2,3): its 12 lines over
# GF(3)^2 (three slopes plus verticals) cover every one of the
# C(9,2) = 36 point pairs EXACTLY once — the defining design
# property, recomputed and frozen. The Sylvester-Hadamard matrix H8,
# H[i][j] = (-1)^popcount(i AND j), has pairwise-orthogonal rows:
# every off-diagonal dot product is 0 and every diagonal one is 8 —
# the orthogonality certificate behind Walsh codes (CDMA) and the
# WHT, frozen over all 64 row pairs.
_DESIGN_ORACLE = """
WITH lines AS MATERIALIZED (
  -- slope lines y = m x + b over GF(3), then verticals x = b
  SELECT m * 3 + b AS line_id, x AS px, (m * x + b) % 3 AS py
  FROM (SELECT unnest(generate_series(0, 2)) AS m),
       (SELECT unnest(generate_series(0, 2)) AS b),
       (SELECT unnest(generate_series(0, 2)) AS x)
  UNION ALL
  SELECT 9 + b, b, y
  FROM (SELECT unnest(generate_series(0, 2)) AS b),
       (SELECT unnest(generate_series(0, 2)) AS y)
),
pts AS MATERIALIZED (
  SELECT line_id, px * 3 + py AS pt FROM lines
),
paircover AS MATERIALIZED (
  SELECT a.pt AS p1, b.pt AS p2, count(*) AS cov
  FROM pts a JOIN pts b ON b.line_id = a.line_id AND b.pt > a.pt
  GROUP BY 1, 2
),
sts AS MATERIALIZED (
  SELECT count(*) AS n_pairs, min(cov) AS min_cov, max(cov) AS max_cov
  FROM paircover
),
had AS MATERIALIZED (
  SELECT a.i AS r1, b.i AS r2,
         sum(CASE WHEN bit_count(a.i & j.j) % 2 = bit_count(b.i & j.j) % 2
                  THEN 1 ELSE -1 END) AS dot
  FROM (SELECT unnest(generate_series(0, 7)) AS i) a,
       (SELECT unnest(generate_series(0, 7)) AS i) b,
       (SELECT unnest(generate_series(0, 7)) AS j) j
  GROUP BY a.i, b.i
),
hsum AS MATERIALIZED (
  SELECT count(*) FILTER (r1 <> r2 AND dot = 0) AS n_orth,
         count(*) FILTER (r1 = r2 AND dot = 8) AS n_diag
  FROM had
)
SELECT CAST(s.n_pairs AS BIGINT) AS sts_pairs,
       CAST(s.min_cov AS BIGINT) AS sts_min_cover,
       CAST(s.max_cov AS BIGINT) AS sts_max_cover,
       CAST(h.n_orth AS BIGINT) AS hadamard_orthogonal_pairs,
       CAST(h.n_diag AS BIGINT) AS hadamard_diagonal_ok,
       CAST(CASE WHEN s.n_pairs = 36 AND s.min_cov = 1
                  AND s.max_cov = 1 AND h.n_orth = 56
                  AND h.n_diag = 8 THEN 1 ELSE 0 END AS INT)
         AS certified
FROM sts s CROSS JOIN hsum h
"""


@register_extra("design_certificates", _DESIGN_ORACLE)
def design_certificates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STS(9) pair-coverage and H8 orthogonality certificates (see
    oracle comment) — pure constructive column algebra, one frozen
    row."""
    sess = spark
    r3 = sess.range(0, 3).select(F.col("id").cast("int"))
    m = r3.select(F.col("id").alias("m"))
    b = r3.select(F.col("id").alias("b"))
    x = r3.select(F.col("id").alias("x"))
    slope = (
        m.crossJoin(b).crossJoin(x)
        .selectExpr("m * 3 + b AS line_id", "x AS px", "(m * x + b) % 3 AS py")
    )
    vert = (
        b.crossJoin(r3.select(F.col("id").alias("y")))
        .selectExpr("9 + b AS line_id", "b AS px", "y AS py")
    )
    pts = slope.unionByName(vert).selectExpr(
        "line_id", "px * 3 + py AS pt"
    )
    p2 = pts.select(
        F.col("line_id").alias("l2"), F.col("pt").alias("pt2")
    )
    cover = (
        pts.join(
            p2,
            (F.col("l2") == F.col("line_id")) & (F.col("pt2") > F.col("pt")),
        )
        .groupBy("pt", "pt2")
        .agg(F.count(F.lit(1)).alias("cov"))
    )
    sts = cover.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.min("cov").alias("min_cov"),
        F.max("cov").alias("max_cov"),
    )
    r8 = sess.range(0, 8).select(F.col("id").cast("int"))
    had = (
        r8.select(F.col("id").alias("r1"))
        .crossJoin(r8.select(F.col("id").alias("r2")))
        .crossJoin(r8.select(F.col("id").alias("j")))
        .groupBy("r1", "r2")
        .agg(
            F.sum(
                F.expr(
                    "IF(bit_count(r1 & j) % 2 = bit_count(r2 & j) % 2,"
                    " 1, -1)"
                )
            ).alias("dot")
        )
    )
    hsum = had.agg(
        F.sum(
            F.when((F.col("r1") != F.col("r2")) & (F.col("dot") == 0), 1)
            .otherwise(0)
        ).alias("n_orth"),
        F.sum(
            F.when((F.col("r1") == F.col("r2")) & (F.col("dot") == 8), 1)
            .otherwise(0)
        ).alias("n_diag"),
    )
    return sts.crossJoin(hsum).select(
        F.col("n_pairs").cast("long").alias("sts_pairs"),
        F.col("min_cov").cast("long").alias("sts_min_cover"),
        F.col("max_cov").cast("long").alias("sts_max_cover"),
        F.col("n_orth").cast("long").alias("hadamard_orthogonal_pairs"),
        F.col("n_diag").cast("long").alias("hadamard_diagonal_ok"),
        F.when(
            (F.col("n_pairs") == 36)
            & (F.col("min_cov") == 1)
            & (F.col("max_cov") == 1)
            & (F.col("n_orth") == 56)
            & (F.col("n_diag") == 8),
            1,
        )
        .otherwise(0)
        .cast("int")
        .alias("certified"),
    )


# ------------------------------------ Costas array + magic square

# Two more construction/certificate pairs. The Welch-Costas array
# (Welch 1965 / Costas 1965, the radar-sonar waveform design):
# a_i = 2^i mod 11 for i = 0..9 is a permutation whose difference
# vectors are distinct within every row shift — the zero-ambiguity
# autocorrelation property, checked exhaustively. The 5x5 Siamese
# magic square in closed form M[i][j] = 5((i+j+3) mod 5)
# + ((i+2j+1) mod 5) + 1: all rows, columns and both diagonals sum
# to the magic constant 65, and the entries are a permutation of
# 1..25 — all recomputed and frozen in one row.
_COSTAS_ORACLE = """
WITH RECURSIVE cost(i, v) AS (
  SELECT 0, 1
  UNION ALL
  SELECT i + 1, (v * 2) % 11 FROM cost WHERE i < 9
),
cdiffs AS MATERIALIZED (
  SELECT d.d, a.v - b.v AS diff
  FROM (SELECT unnest(generate_series(1, 9)) AS d) d
  JOIN cost a ON true JOIN cost b ON b.i = a.i - d.d
),
cprop AS MATERIALIZED (
  SELECT CASE WHEN max(cnt) = 1 THEN 1 ELSE 0 END AS costas_ok,
         sum(cnt) AS n_diffs
  FROM (SELECT d, diff, count(*) AS cnt FROM cdiffs GROUP BY 1, 2)
),
cperm AS MATERIALIZED (
  SELECT CASE WHEN count(DISTINCT v) = 10 AND min(v) = 1
               AND max(v) = 10 THEN 1 ELSE 0 END AS perm_ok
  FROM cost
),
magic AS MATERIALIZED (
  SELECT i.i, j.j,
         5 * ((i.i + j.j + 3) % 5) + ((i.i + 2 * j.j + 1) % 5) + 1 AS v
  FROM (SELECT unnest(generate_series(0, 4)) AS i) i,
       (SELECT unnest(generate_series(0, 4)) AS j) j
),
msums AS MATERIALIZED (
  SELECT min(s) AS mn, max(s) AS mx, count(*) AS nlines FROM (
    SELECT sum(v) AS s FROM magic GROUP BY i
    UNION ALL SELECT sum(v) FROM magic GROUP BY j
    UNION ALL SELECT sum(v) FROM magic WHERE i = j
    UNION ALL SELECT sum(v) FROM magic WHERE i + j = 4
  )
),
mperm AS MATERIALIZED (
  SELECT CASE WHEN count(DISTINCT v) = 25 AND min(v) = 1
               AND max(v) = 25 THEN 1 ELSE 0 END AS perm_ok
  FROM magic
)
SELECT CAST(c.costas_ok AS INT) AS costas_ok,
       CAST(c.n_diffs AS BIGINT) AS costas_n_diffs,
       CAST(cp.perm_ok AS INT) AS costas_perm_ok,
       CAST(m.mn AS BIGINT) AS magic_min_sum,
       CAST(m.mx AS BIGINT) AS magic_max_sum,
       CAST(m.nlines AS BIGINT) AS magic_n_lines,
       CAST(mp.perm_ok AS INT) AS magic_perm_ok,
       CAST(CASE WHEN c.costas_ok = 1 AND cp.perm_ok = 1
                  AND m.mn = 65 AND m.mx = 65 AND m.nlines = 12
                  AND mp.perm_ok = 1 THEN 1 ELSE 0 END AS INT)
         AS certified
FROM cprop c CROSS JOIN cperm cp CROSS JOIN msums m CROSS JOIN mperm mp
"""


@register_extra("costas_magic_certificates", _COSTAS_ORACLE)
def costas_magic_certificates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch-Costas difference-vector and Siamese magic-square
    certificates (see oracle comment) — constructive column algebra,
    one frozen row."""
    sess = spark
    cost = sess.range(0, 10).selectExpr(
        "CAST(id AS INT) AS i",
        "CAST(IF(id = 0, 1L, aggregate(sequence(1, CAST(id AS INT)),"
        " 1L, (a, k) -> (a * 2) % 11)) AS BIGINT) AS v",
    ).localCheckpoint(eager=True)
    b = cost.select(F.col("i").alias("ib"), F.col("v").alias("vb"))
    ds = sess.range(1, 10).select(F.col("id").cast("int").alias("d"))
    cdiffs = (
        ds.crossJoin(cost)
        .join(b, F.col("ib") == F.col("i") - F.col("d"))
        .select("d", (F.col("v") - F.col("vb")).alias("diff"))
    )
    cprop = (
        cdiffs.groupBy("d", "diff")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(
            F.when(F.max("cnt") == 1, 1).otherwise(0).alias("costas_ok"),
            F.sum("cnt").alias("n_diffs"),
        )
    )
    cperm = cost.agg(
        F.when(
            (F.countDistinct("v") == 10)
            & (F.min("v") == 1)
            & (F.max("v") == 10),
            1,
        )
        .otherwise(0)
        .alias("costas_perm_ok")
    )
    ii = sess.range(0, 5).select(F.col("id").cast("int").alias("i"))
    jj = sess.range(0, 5).select(F.col("id").cast("int").alias("j"))
    magic = ii.crossJoin(jj).selectExpr(
        "i", "j",
        "5 * ((i + j + 3) % 5) + ((i + 2 * j + 1) % 5) + 1 AS v",
    ).localCheckpoint(eager=True)
    lines = (
        magic.groupBy("i").agg(F.sum("v").alias("s")).select("s")
        .unionAll(magic.groupBy("j").agg(F.sum("v").alias("s")).select("s"))
        .unionAll(
            magic.filter("i = j").agg(F.sum("v").alias("s")).select("s")
        )
        .unionAll(
            magic.filter("i + j = 4").agg(F.sum("v").alias("s")).select("s")
        )
    )
    msums = lines.agg(
        F.min("s").alias("mn"), F.max("s").alias("mx"),
        F.count(F.lit(1)).alias("nlines"),
    )
    mperm = magic.agg(
        F.when(
            (F.countDistinct("v") == 25)
            & (F.min("v") == 1)
            & (F.max("v") == 25),
            1,
        )
        .otherwise(0)
        .alias("magic_perm_ok")
    )
    return (
        cprop.crossJoin(cperm).crossJoin(msums).crossJoin(mperm)
        .select(
            F.col("costas_ok").cast("int"),
            F.col("n_diffs").cast("long").alias("costas_n_diffs"),
            F.col("costas_perm_ok").cast("int"),
            F.col("mn").cast("long").alias("magic_min_sum"),
            F.col("mx").cast("long").alias("magic_max_sum"),
            F.col("nlines").cast("long").alias("magic_n_lines"),
            F.col("magic_perm_ok").cast("int"),
            F.when(
                (F.col("costas_ok") == 1)
                & (F.col("costas_perm_ok") == 1)
                & (F.col("mn") == 65)
                & (F.col("mx") == 65)
                & (F.col("nlines") == 12)
                & (F.col("magic_perm_ok") == 1),
                1,
            )
            .otherwise(0)
            .cast("int")
            .alias("certified"),
        )
    )


# --------------------------------------------- Lucas-Lehmer test

# The Lucas-Lehmer test (1878/1930) — still how the largest known
# primes are found: M_p = 2^p - 1 is prime iff s_{p-2} = 0 mod M_p
# where s_0 = 4, s <- s^2 - 2. For every odd prime p <= 31 the
# squares stay under 2^62, so the whole GIMPS kernel runs in exact
# int64 folds; the famous verdict table is frozen — Mersenne primes
# at p = 3, 5, 7, 13, 17, 19, 31 and composites at p = 11 (= 23*89),
# 23, 29.
_LL_ORACLE = """
WITH RECURSIVE ps AS MATERIALIZED (
  SELECT unnest([3, 5, 7, 11, 13, 17, 19, 23, 29, 31]) AS p
),
st(p, mp, i, s) AS (
  SELECT p, (1::BIGINT << p) - 1, 0, CAST(4 AS BIGINT) FROM ps
  UNION ALL
  SELECT p, mp, i + 1, (s * s - 2) % mp
  FROM st WHERE i < p - 2
)
SELECT CAST(p AS INT) AS p, CAST(mp AS BIGINT) AS mersenne,
       CAST(s AS BIGINT) AS ll_residue,
       CAST(CASE WHEN s = 0 THEN 1 ELSE 0 END AS INT)
         AS is_mersenne_prime
FROM st WHERE i = p - 2
ORDER BY p
"""


@register_extra("lucas_lehmer_mersenne", _LL_ORACLE)
def lucas_lehmer_mersenne(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucas-Lehmer Mersenne verdicts (see oracle comment) — one
    guarded fold per exponent; the known prime/composite table is
    hash-fatal."""
    sess = spark
    ps = sess.createDataFrame(
        [(p,) for p in [3, 5, 7, 11, 13, 17, 19, 23, 29, 31]], "p int"
    )
    return (
        ps.withColumn("mp", F.expr("shiftleft(1L, p) - 1"))
        .withColumn(
            "s",
            F.expr(
                "aggregate(sequence(1, p - 2), 4L,"
                " (s, i) -> (s * s - 2) % mp)"
            ),
        )
        .select(
            F.col("p").cast("int"),
            F.col("mp").cast("long").alias("mersenne"),
            F.col("s").cast("long").alias("ll_residue"),
            F.when(F.col("s") == 0, 1).otherwise(0).cast("int")
            .alias("is_mersenne_prime"),
        )
        .orderBy("p")
    )


# --------------------------------------------- Wilson's theorem

# Wilson's theorem (Lagrange 1771): n > 1 is prime iff
# (n-1)! = -1 mod n — the only clean factorial-based primality
# characterization. One mulmod fold per n in 2..150 (products
# < 150^2, trivially exact); the Wilson verdict must agree with the
# trial-division verdict recomputed relationally in the same query —
# theorem equality frozen on every n (and for composites > 4 the
# factorial residue is 0, also classic, also frozen).
_WILSON_ORACLE = """
WITH RECURSIVE ns AS MATERIALIZED (
  SELECT unnest(generate_series(2, 150)) AS n
),
st(n, i, f) AS (
  SELECT n, 1, CAST(1 AS BIGINT) FROM ns
  UNION ALL
  SELECT n, i + 1, (f * (i + 1)) % n FROM st WHERE i < n - 1
),
wil AS MATERIALIZED (
  SELECT n, f AS residue,
         CASE WHEN f = n - 1 THEN 1 ELSE 0 END AS wilson_prime
  FROM st WHERE i = n - 1
),
td AS MATERIALIZED (
  SELECT n.n,
         CASE WHEN NOT EXISTS (
           SELECT 1 FROM (SELECT unnest(generate_series(2, 12)) AS d) d
           WHERE d.d * d.d <= n.n AND n.n % d.d = 0)
         THEN 1 ELSE 0 END AS td_prime
  FROM ns n
)
SELECT CAST(w.n AS INT) AS n, CAST(w.residue AS BIGINT) AS residue,
       CAST(w.wilson_prime AS INT) AS wilson_prime,
       CAST(t.td_prime AS INT) AS td_prime,
       CAST(CASE WHEN w.wilson_prime = t.td_prime THEN 1 ELSE 0 END
            AS INT) AS theorem_holds,
       CAST(CASE WHEN t.td_prime = 0 AND w.n > 4 AND w.residue = 0
                 THEN 1
                 WHEN t.td_prime = 1 OR w.n = 4 THEN 1
                 ELSE 0 END AS INT) AS composite_residue_zero
FROM wil w JOIN td t ON t.n = w.n
ORDER BY n
"""


@register_extra("wilson_primality", _WILSON_ORACLE)
def wilson_primality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson's theorem vs trial division (see oracle comment) —
    one factorial-mod fold per n plus a relational divisor test;
    both equivalences frozen."""
    sess = spark
    ns = sess.range(2, 151).select(F.col("id").cast("int").alias("n"))
    ds = sess.range(2, 13).select(F.col("id").cast("long").alias("d"))
    wil = ns.withColumn(
        "residue",
        F.expr(
            "IF(n = 2, 1L,"
            " aggregate(sequence(2, n - 1), 1L, (f, i) -> (f * i) % n))"
        ),
    ).withColumn(
        "wilson_prime",
        F.when(F.col("residue") == F.col("n") - 1, 1).otherwise(0),
    )
    td = (
        ns.crossJoin(F.broadcast(ds))
        .filter((F.col("d") * F.col("d") <= F.col("n")))
        .groupBy("n")
        .agg(
            F.max(
                F.when(F.col("n") % F.col("d") == 0, 1).otherwise(0)
            ).alias("has_div")
        )
    )
    return (
        wil.join(td, "n", "left")
        .withColumn(
            "td_prime",
            F.when(F.coalesce("has_div", F.lit(0)) == 0, 1).otherwise(0),
        )
        .select(
            F.col("n").cast("int"),
            F.col("residue").cast("long"),
            F.col("wilson_prime").cast("int"),
            F.col("td_prime").cast("int"),
            F.when(F.col("wilson_prime") == F.col("td_prime"), 1)
            .otherwise(0)
            .cast("int")
            .alias("theorem_holds"),
            F.when(
                (F.col("td_prime") == 0)
                & (F.col("n") > 4)
                & (F.col("residue") == 0),
                1,
            )
            .when((F.col("td_prime") == 1) | (F.col("n") == 4), 1)
            .otherwise(0)
            .cast("int")
            .alias("composite_residue_zero"),
        )
        .orderBy("n")
    )


# --------------------------------------------- Pell equations

# Pell's equation x^2 - D y^2 = 1 solved the classical way: the
# continued fraction of sqrt(D) (the (m, d, a) quadratic-irrational
# recurrence) generates convergents h/k until one satisfies the
# equation exactly (Lagrange 1768). The frozen table includes the
# showpiece D = 61 — Fermat's challenge — whose fundamental solution
# x = 1766319049 squares to 3.1e18, JUST inside int64, so the
# in-query certificate x^2 - D y^2 = 1 is still exact integer
# arithmetic. Eighty fold steps cover every period here.
_PELL_ORACLE = """
WITH RECURSIVE ds AS MATERIALIZED (
  SELECT unnest([2, 3, 5, 13, 19, 22, 23, 29, 61]) AS dd
),
init AS MATERIALIZED (
  SELECT dd, CAST(floor(sqrt(dd)) AS BIGINT) AS a0 FROM ds
),
st(dd, a0, i, m, d, a, h0, h1, k0, k1, x, y) AS (
  SELECT dd, a0, 0, CAST(0 AS BIGINT), CAST(1 AS BIGINT), a0,
         CAST(1 AS BIGINT), a0, CAST(0 AS BIGINT), CAST(1 AS BIGINT),
         CAST(0 AS BIGINT), CAST(0 AS BIGINT)
  FROM init
  UNION ALL
  SELECT dd, a0, i + 1, m2, d2, a2,
         h1, a2 * h1 + h0, k1, a2 * k1 + k0,
         CASE WHEN x = 0 AND h1 * h1 - dd * k1 * k1 = 1
              THEN h1 ELSE x END,
         CASE WHEN x = 0 AND h1 * h1 - dd * k1 * k1 = 1
              THEN k1 ELSE y END
  FROM (
    SELECT st.*, d2, (a0 + m2) // d2 AS a2, m2
    FROM (
      SELECT st.*, da - m AS m2,
             (dd - (da - m) * (da - m)) // d AS d2
      FROM (SELECT st.*, d * a AS da FROM st
            WHERE st.x = 0 AND st.i < 80) st
    ) st
  ) st
),
fin AS MATERIALIZED (
  SELECT dd, max(x) AS x, max(y) AS y FROM st GROUP BY dd
)
SELECT CAST(dd AS INT) AS d,
       CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y,
       CAST(CASE WHEN x * x - dd * y * y = 1 THEN 1 ELSE 0 END AS INT)
         AS pell_holds
FROM fin ORDER BY d
"""


@register_extra("pell_fundamental_solutions", _PELL_ORACLE)
def pell_fundamental_solutions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pell fundamental solutions via the sqrt-D continued fraction
    (see oracle comment) — one guarded fold per D, the equation
    certificate recomputed and frozen (including Fermat's D = 61)."""
    sess = spark
    ds = sess.createDataFrame(
        [(d,) for d in [2, 3, 5, 13, 19, 22, 23, 29, 61]], "dd int"
    )
    # 4-phase fold: i%4 = 0 -> m, 1 -> d, 2 -> a, 3 -> convergents +
    # solution check; keeps every branch expression small (the single
    # -step form exploded textually — see the engine-semantics note)
    fold = (
        "aggregate(sequence(0, 319),"
        " named_struct('m', 0L, 'd', 1L, 'a', a0,"
        "   'h0', 1L, 'h1', a0, 'k0', 0L, 'k1', 1L, 'x', 0L, 'y', 0L),"
        " (s, i) -> IF(s.x > 0, s,"
        "  IF(i % 4 = 0,"
        "   named_struct('m', s.d * s.a - s.m, 'd', s.d, 'a', s.a,"
        "     'h0', s.h0, 'h1', s.h1, 'k0', s.k0, 'k1', s.k1,"
        "     'x', s.x, 'y', s.y),"
        "  IF(i % 4 = 1,"
        "   named_struct('m', s.m, 'd', (dd - s.m * s.m) div s.d,"
        "     'a', s.a, 'h0', s.h0, 'h1', s.h1, 'k0', s.k0,"
        "     'k1', s.k1, 'x', s.x, 'y', s.y),"
        "  IF(i % 4 = 2,"
        "   named_struct('m', s.m, 'd', s.d, 'a', (a0 + s.m) div s.d,"
        "     'h0', s.h0, 'h1', s.h1, 'k0', s.k0, 'k1', s.k1,"
        "     'x', s.x, 'y', s.y),"
        "   named_struct('m', s.m, 'd', s.d, 'a', s.a,"
        "     'h0', s.h1, 'h1', s.a * s.h1 + s.h0,"
        "     'k0', s.k1, 'k1', s.a * s.k1 + s.k0,"
        "     'x', IF((s.a * s.h1 + s.h0) * (s.a * s.h1 + s.h0)"
        "           - dd * (s.a * s.k1 + s.k0) * (s.a * s.k1 + s.k0)"
        "           = 1, s.a * s.h1 + s.h0, 0L),"
        "     'y', IF((s.a * s.h1 + s.h0) * (s.a * s.h1 + s.h0)"
        "           - dd * (s.a * s.k1 + s.k0) * (s.a * s.k1 + s.k0)"
        "           = 1, s.a * s.k1 + s.k0, 0L)))))))"
    )
    return (
        ds.withColumn(
            "a0", F.expr("CAST(floor(sqrt(CAST(dd AS DOUBLE))) AS BIGINT)")
        )
        .withColumn("st", F.expr(fold))
        .select(
            F.col("dd").cast("int").alias("d"),
            F.col("st.x").cast("long").alias("x"),
            F.col("st.y").cast("long").alias("y"),
            F.expr(
                "CAST(IF(st.x * st.x - dd * st.y * st.y = 1, 1, 0) AS INT)"
            ).alias("pell_holds"),
        )
        .orderBy("d")
    )


# ------------------------------------ Farey + Pythagorean triples

# Two closing number-theory certificates. The Farey sequence F_9
# (all reduced fractions 0..1 with denominator <= 9, in order)
# satisfies the NEIGHBOR UNIMODULARITY b*c - a*d = 1 for every
# consecutive pair a/b < c/d — the mediant/Stern-Brocot property,
# checked on all |F_9| - 1 = 28 adjacent pairs. Euclid's formula
# (m^2 - n^2, 2mn, m^2 + n^2) over coprime opposite-parity (m, n)
# generates exactly the PRIMITIVE Pythagorean triples: the query
# certifies a^2 + b^2 = c^2 and pairwise-coprimality for every
# generated triple with c <= 100, and the famous count — 16
# primitive triples under 100 — is frozen.
_FAREY_ORACLE = """
WITH fr AS MATERIALIZED (
  SELECT a.a, b.b
  FROM (SELECT unnest(generate_series(0, 9)) AS a) a,
       (SELECT unnest(generate_series(1, 9)) AS b) b
  WHERE a.a <= b.b AND gcd(a.a, b.b) = 1
),
ordered AS MATERIALIZED (
  SELECT a, b, row_number() OVER (ORDER BY a * 2520 / b, b) AS r
  FROM fr
),
uni AS MATERIALIZED (
  SELECT count(*) AS n_pairs,
         sum(CASE WHEN x.b * y.a - x.a * y.b = 1 THEN 1 ELSE 0 END)
           AS n_unimodular
  FROM ordered x JOIN ordered y ON y.r = x.r + 1
),
mn AS MATERIALIZED (
  SELECT m.m, n.n, m.m * m.m - n.n * n.n AS a, 2 * m.m * n.n AS b,
         m.m * m.m + n.n * n.n AS c
  FROM (SELECT unnest(generate_series(2, 9)) AS m) m,
       (SELECT unnest(generate_series(1, 8)) AS n) n
  WHERE n.n < m.m AND gcd(m.m, n.n) = 1 AND (m.m + n.n) % 2 = 1
    AND m.m * m.m + n.n * n.n <= 100
),
pyth AS MATERIALIZED (
  SELECT count(*) AS n_triples,
         sum(CASE WHEN a * a + b * b = c * c THEN 1 ELSE 0 END)
           AS n_pythagorean,
         sum(CASE WHEN gcd(gcd(a, b), c) = 1 THEN 1 ELSE 0 END)
           AS n_primitive
  FROM mn
)
SELECT CAST(u.n_pairs AS BIGINT) AS farey_pairs,
       CAST(u.n_unimodular AS BIGINT) AS farey_unimodular,
       CAST(p.n_triples AS BIGINT) AS triples_c_le_100,
       CAST(p.n_pythagorean AS BIGINT) AS triples_pythagorean,
       CAST(p.n_primitive AS BIGINT) AS triples_primitive,
       CAST(CASE WHEN u.n_pairs = u.n_unimodular
                  AND p.n_triples = 16
                  AND p.n_pythagorean = 16
                  AND p.n_primitive = 16 THEN 1 ELSE 0 END AS INT)
         AS certified
FROM uni u CROSS JOIN pyth p
"""


@register_extra("farey_pythagoras_certificates", _FAREY_ORACLE)
def farey_pythagoras_certificates(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Farey neighbor unimodularity and Euclid's primitive triples
    (see oracle comment) — exact ordering via the common-denominator
    integer key a*2520/b, gcd via a bounded Euclid fold; one frozen
    row."""
    sess = spark
    gcdf = (
        "aggregate(sequence(1, 12), named_struct('u', %s, 'v', %s),"
        " (s, k) -> IF(s.v = 0, s, named_struct('u', s.v,"
        " 'v', s.u %% s.v)), s -> s.u)"
    )
    fr = (
        sess.range(0, 10)
        .select(F.col("id").cast("long").alias("a"))
        .crossJoin(
            sess.range(1, 10).select(F.col("id").cast("long").alias("b"))
        )
        .filter(F.col("a") <= F.col("b"))
        .filter(F.expr((gcdf % ("a", "b")) + " = 1"))
    )
    ordered = fr.withColumn(
        "r",
        F.row_number().over(
            Window.orderBy(F.expr("a * 2520 div b"), F.col("b"))
        ),
    )
    o2 = ordered.select(
        F.col("a").alias("a2"), F.col("b").alias("b2"),
        F.col("r").alias("r2"),
    )
    uni = (
        ordered.join(o2, F.col("r2") == F.col("r") + 1)
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(
                F.when(
                    F.col("b") * F.col("a2") - F.col("a") * F.col("b2")
                    == 1,
                    1,
                ).otherwise(0)
            ).alias("n_unimodular"),
        )
    )
    mn = (
        sess.range(2, 10)
        .select(F.col("id").cast("long").alias("m"))
        .crossJoin(
            sess.range(1, 9).select(F.col("id").cast("long").alias("n"))
        )
        .filter(F.col("n") < F.col("m"))
        .filter(F.expr((gcdf % ("m", "n")) + " = 1"))
        .filter((F.col("m") + F.col("n")) % 2 == 1)
        .selectExpr(
            "m * m - n * n AS a", "2 * m * n AS b", "m * m + n * n AS c"
        )
        .filter(F.col("c") <= 100)
    )
    pyth = mn.agg(
        F.count(F.lit(1)).alias("n_triples"),
        F.sum(
            F.when(
                F.col("a") * F.col("a") + F.col("b") * F.col("b")
                == F.col("c") * F.col("c"),
                1,
            ).otherwise(0)
        ).alias("n_pythagorean"),
        F.sum(
            F.when(
                F.expr(
                    (gcdf % ((gcdf % ("a", "b")), "c")) + " = 1"
                ),
                1,
            ).otherwise(0)
        ).alias("n_primitive"),
    )
    return uni.crossJoin(pyth).select(
        F.col("n_pairs").cast("long").alias("farey_pairs"),
        F.col("n_unimodular").cast("long").alias("farey_unimodular"),
        F.col("n_triples").cast("long").alias("triples_c_le_100"),
        F.col("n_pythagorean").cast("long").alias("triples_pythagorean"),
        F.col("n_primitive").cast("long").alias("triples_primitive"),
        F.when(
            (F.col("n_pairs") == F.col("n_unimodular"))
            & (F.col("n_triples") == 16)
            & (F.col("n_pythagorean") == 16)
            & (F.col("n_primitive") == 16),
            1,
        )
        .otherwise(0)
        .cast("int")
        .alias("certified"),
    )


# --------------------------------------------- Kaprekar's constant

# Kaprekar's routine (1949): take a 4-digit number (not all digits
# equal), sort digits descending minus ascending, repeat — EVERY
# seed reaches 6174 within 7 steps, and 6174 is a fixed point. 250
# md5 seeds (repdigits excluded) run an 8-step fold whose digit
# sort is a 5-comparator sorting network in min/max expressions;
# convergence (reached = 1) and the step count are frozen, and the
# fixed-point property is visible in the g = -1 row seeded at 6174
# itself (0 steps).
_KAPREKAR_ORACLE = """
WITH RECURSIVE grp AS MATERIALIZED (
  SELECT DISTINCT c_custkey % 250 AS g FROM customer
),
seeds AS MATERIALIZED (
  SELECT g, n FROM (
    SELECT g, 1 + ('0x' || substr(md5('kp:' || CAST(g AS VARCHAR)),
                                  1, 6))::BIGINT % 9998 AS n
    FROM grp
  ) WHERE n % 1111 <> 0
  UNION ALL
  SELECT -1, 6174
),
st(g, n0, i, n, steps) AS (
  SELECT g, n, 0, n, CASE WHEN n = 6174 THEN 0 ELSE -1 END FROM seeds
  UNION ALL
  SELECT g, n0, i + 1, nx,
         CASE WHEN steps >= 0 THEN steps
              WHEN nx = 6174 THEN i + 1 ELSE -1 END
  FROM (
    SELECT s.*,
           (d1 * 1000 + d2 * 100 + d3 * 10 + d4)
           - (d4 * 1000 + d3 * 100 + d2 * 10 + d1) AS nx
    FROM (
      -- 5-comparator sorting network on the four digits (desc)
      SELECT s.*,
             greatest(h1, h2) AS d1,
             greatest(least(h1, h2), greatest(l1, l2)) AS d2,
             least(greatest(l1, l2), least(h1, h2)) AS d3,
             least(l1, l2) AS d4
      FROM (
        SELECT st.*,
               greatest(st.n // 1000, (st.n // 100) % 10) AS h1,
               least(st.n // 1000, (st.n // 100) % 10) AS l1,
               greatest((st.n // 10) % 10, st.n % 10) AS h2,
               least((st.n // 10) % 10, st.n % 10) AS l2
        FROM st WHERE st.steps < 0 AND st.i < 8
      ) s
    ) s
  ) s
),
fin AS (
  SELECT g, n0, max(steps) AS steps FROM st GROUP BY g, n0
)
SELECT CAST(g AS BIGINT) AS g, CAST(n0 AS BIGINT) AS seed,
       CAST(steps AS BIGINT) AS steps_to_6174,
       CAST(CASE WHEN steps >= 0 THEN 1 ELSE 0 END AS INT) AS reached
FROM fin ORDER BY g
"""


@register_extra("kaprekar_6174", _KAPREKAR_ORACLE)
def kaprekar_6174(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaprekar convergence audit (see oracle comment) — one guarded
    8-step fold per seed with the digit sort as a min/max comparator
    network; universal convergence frozen."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    grp = c.select((F.col("c_custkey") % 250).alias("g")).distinct()
    seeds = (
        grp.select(
            "g",
            (
                1
                + F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("kp:"), F.col("g").cast("string")
                            ).cast("binary")
                        ),
                        1,
                        6,
                    ),
                    16,
                    10,
                ).cast("long")
                % 9998
            ).alias("n"),
        )
        .filter(F.col("n") % 1111 != 0)
        .unionByName(
            c.sparkSession.createDataFrame([(-1, 6174)], "g long, n long")
        )
    )
    # build desc-digit number and asc reverse via helper exprs
    d1 = ("greatest(greatest(n div 1000, (n div 100) % 10),"
          " greatest((n div 10) % 10, n % 10))")
    l1 = "least(n div 1000, (n div 100) % 10)"
    h1 = "greatest(n div 1000, (n div 100) % 10)"
    l2 = "least((n div 10) % 10, n % 10)"
    h2 = "greatest((n div 10) % 10, n % 10)"
    d2 = f"greatest(least({h1}, {h2}), greatest({l1}, {l2}))"
    d3 = f"least(greatest({l1}, {l2}), least({h1}, {h2}))"
    d4 = f"least({l1}, {l2})"
    nx = (
        f"(({d1}) * 1000 + ({d2}) * 100 + ({d3}) * 10 + ({d4}))"
        f" - (({d4}) * 1000 + ({d3}) * 100 + ({d2}) * 10 + ({d1}))"
    ).replace("n div", "a.n div").replace("n % 10", "a.n % 10")
    fold = (
        "aggregate(sequence(1, 8),"
        " named_struct('n', n, 'steps',"
        "   IF(n = 6174, 0L, CAST(-1 AS BIGINT))),"
        " (a, i) -> IF(a.steps >= 0, a,"
        f"   named_struct('n', {nx},"
        f"     'steps', IF(({nx}) = 6174, CAST(i AS BIGINT),"
        "       CAST(-1 AS BIGINT)))))"
    )
    return (
        seeds.withColumn("st", F.expr(fold))
        .select(
            F.col("g").cast("long"),
            F.col("n").cast("long").alias("seed"),
            F.col("st.steps").cast("long").alias("steps_to_6174"),
            F.when(F.col("st.steps") >= 0, 1).otherwise(0).cast("int")
            .alias("reached"),
        )
        .orderBy("g")
    )


# --------------------------------------------- Catalan two ways

# Catalan numbers derived TWO independent ways and frozen equal:
# binomially as C_n = binom(2n, n) / (n+1) with the binomial read
# out of a 24-row Pascal-triangle fold (exact adds, exact final
# division), and via Segner's 1758 recurrence
# C_{n+1} = sum_i C_i C_{n-i} as twelve staged self-convolution
# joins. Any drift in either derivation breaks the equality; the
# classical values (C_10 = 16796, C_12 = 208012) ride in the rows.
_CATALAN_SEG_SQL = """
seg{n} AS MATERIALIZED (
  SELECT * FROM seg{p}
  UNION ALL
  SELECT {n}, sum(a.c * b.c)
  FROM seg{p} a JOIN seg{p} b ON b.n = {n} - 1 - a.n
)
"""

_CATALAN_ORACLE = (
    """
WITH pascal AS MATERIALIZED (
  SELECT nn.nn,
         list_reduce(list_prepend([CAST(1 AS BIGINT)],
           list_transform(generate_series(1, 2 * nn.nn),
                          x -> [CAST(0 AS BIGINT)])),
           (row, _) -> list_concat(list_concat([CAST(1 AS BIGINT)],
             list_transform(generate_series(1, len(row) - 1),
               i -> row[i] + row[i + 1])), [CAST(1 AS BIGINT)]))
           AS row
  FROM (SELECT unnest(generate_series(1, 12)) AS nn) nn
),
bino AS MATERIALIZED (
  SELECT nn AS n, row[nn + 1] AS b,
         row[nn + 1] // (nn + 1) AS c_binom
  FROM pascal
),
seg0 AS MATERIALIZED (SELECT 0 AS n, CAST(1 AS BIGINT) AS c),
"""
    + ",".join(
        _CATALAN_SEG_SQL.format(n=n, p=n - 1) for n in range(1, 13)
    )
    + """
SELECT CAST(b.n AS INT) AS n, CAST(b.b AS BIGINT) AS binom_2n_n,
       CAST(b.c_binom AS BIGINT) AS catalan_binom,
       CAST(s.c AS BIGINT) AS catalan_segner,
       CAST(CASE WHEN b.c_binom = s.c THEN 1 ELSE 0 END AS INT)
         AS derivations_agree
FROM bino b JOIN seg12 s ON s.n = b.n
ORDER BY n
"""
)


@register_extra("catalan_two_ways", _CATALAN_ORACLE)
def catalan_two_ways(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalan numbers by Pascal-fold binomials and by Segner's
    recurrence (see oracle comment); equality frozen for n = 1..12."""
    sess = spark
    ns = sess.range(1, 13).select(F.col("id").cast("int").alias("n"))
    pascal_fold = (
        "aggregate(sequence(1, 2 * n), array(1L),"
        " (row, k) -> IF(size(row) = 1, array(1L, 1L),"
        "   concat(concat(array(1L),"
        "   transform(sequence(1, size(row) - 1),"
        "     i -> element_at(row, CAST(i AS INT))"
        "          + element_at(row, CAST(i AS INT) + 1))),"
        "   array(1L))))"
    )
    bino = ns.withColumn("row", F.expr(pascal_fold)).selectExpr(
        "n",
        "element_at(row, n + 1) AS b",
        "element_at(row, n + 1) div (n + 1) AS c_binom",
    )
    seg = sess.createDataFrame([(0, 1)], "n int, c long")
    for n in range(1, 13):
        b2 = seg.select(
            F.col("n").alias("n2"), F.col("c").alias("c2")
        )
        new = (
            seg.join(b2, F.col("n2") == F.lit(n) - 1 - F.col("n"))
            .agg(F.sum(F.col("c") * F.col("c2")).alias("c"))
            .select(F.lit(n).cast("int").alias("n"), F.col("c"))
        )
        seg = seg.unionByName(new).localCheckpoint(eager=True)
    return (
        bino.join(
            seg.select(F.col("n"), F.col("c").alias("c_seg")), "n"
        )
        .select(
            F.col("n").cast("int"),
            F.col("b").cast("long").alias("binom_2n_n"),
            F.col("c_binom").cast("long").alias("catalan_binom"),
            F.col("c_seg").cast("long").alias("catalan_segner"),
            F.when(F.col("c_binom") == F.col("c_seg"), 1)
            .otherwise(0)
            .cast("int")
            .alias("derivations_agree"),
        )
        .orderBy("n")
    )


# --------------------------------------------- Heronian triangles

# Heronian triangles (integer sides AND integer area): by Heron's
# formula 16 A^2 = (a+b+c)(-a+b+c)(a-b+c)(a+b-c), so the census over
# all side triples a <= b <= c <= 25 needs only an exact integer
# square test — isqrt comes from floor(sqrt(double)) verified by
# EXACT squaring (r*r = x), so float error cannot leak. The classic
# examples lead the rows ((3,4,5) area 6, the (5,5,6) and (5,5,8)
# twins both area 12); counts (27 Heronian / 18 primitive) and every
# area are hash-frozen.
_HERON_ORACLE = """
WITH tri AS MATERIALIZED (
  SELECT a.a, b.b, c.c,
         (a.a + b.b + c.c) * (-a.a + b.b + c.c)
         * (a.a - b.b + c.c) * (a.a + b.b - c.c) AS s16
  FROM (SELECT unnest(generate_series(1, 25)) AS a) a,
       (SELECT unnest(generate_series(1, 25)) AS b) b,
       (SELECT unnest(generate_series(1, 25)) AS c) c
  WHERE a.a <= b.b AND b.b <= c.c AND a.a + b.b > c.c
),
hq AS MATERIALIZED (
  SELECT a, b, c, s16, CAST(floor(sqrt(s16)) AS BIGINT) AS r0
  FROM tri
),
her AS MATERIALIZED (
  SELECT a, b, c, s16,
         CASE WHEN r0 * r0 = s16 THEN r0
              WHEN (r0 + 1) * (r0 + 1) = s16 THEN r0 + 1
              ELSE -1 END AS r
  FROM hq
)
SELECT CAST(a AS INT) AS a, CAST(b AS INT) AS b, CAST(c AS INT) AS c,
       CAST(r // 4 AS BIGINT) AS area,
       CAST(CASE WHEN gcd(gcd(a, b), c) = 1 THEN 1 ELSE 0 END AS INT)
         AS primitive
FROM her
WHERE r >= 0 AND r % 4 = 0 AND r > 0
ORDER BY a, b, c
"""


@register_extra("heronian_triangles", _HERON_ORACLE)
def heronian_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heronian triangle census to side 25 (see oracle comment) —
    Heron 16A^2 with a square-verified isqrt; 27 rows, every area
    exact."""
    sess = spark
    r25 = sess.range(1, 26).select(F.col("id").cast("long"))
    tri = (
        r25.select(F.col("id").alias("a"))
        .crossJoin(r25.select(F.col("id").alias("b")))
        .crossJoin(r25.select(F.col("id").alias("c")))
        .filter(
            (F.col("a") <= F.col("b"))
            & (F.col("b") <= F.col("c"))
            & (F.col("a") + F.col("b") > F.col("c"))
        )
        .withColumn(
            "s16",
            F.expr(
                "(a + b + c) * (-a + b + c) * (a - b + c) * (a + b - c)"
            ),
        )
    )
    her = tri.withColumn(
        "r0", F.expr("CAST(floor(sqrt(CAST(s16 AS DOUBLE))) AS BIGINT)")
    ).withColumn(
        "r",
        F.expr(
            "CASE WHEN r0 * r0 = s16 THEN r0"
            " WHEN (r0 + 1) * (r0 + 1) = s16 THEN r0 + 1"
            " ELSE -1 END"
        ),
    )
    gcdf = (
        "aggregate(sequence(1, 12), named_struct('u', %s, 'v', %s),"
        " (s, k) -> IF(s.v = 0, s, named_struct('u', s.v,"
        " 'v', s.u %% s.v)), s -> s.u)"
    )
    return (
        her.filter((F.col("r") > 0) & (F.col("r") % 4 == 0))
        .select(
            F.col("a").cast("int"),
            F.col("b").cast("int"),
            F.col("c").cast("int"),
            F.expr("r div 4").cast("long").alias("area"),
            F.expr(
                "CAST(IF(" + (gcdf % ((gcdf % ("a", "b")), "c")) + " = 1,"
                " 1, 0) AS INT)"
            ).alias("primitive"),
        )
        .orderBy("a", "b", "c")
    )


# --------------------------------------------- Ramsey R(3,3) = 6

# Ramsey's theorem, smallest case, certified EXHAUSTIVELY: among any
# six people, some three are mutual friends or mutual strangers. The
# query enumerates ALL 2^15 = 32768 two-colorings of K6's edges and
# finds a monochromatic triangle in every single one (escape count
# frozen at 0), while on K5 exactly the 12 pentagon/pentagram
# colorings escape (frozen at 12) — so R(3,3) = 6, both bounds
# proved by enumeration inside the gate hash. Triangle->edge-index
# tables are frozen literals shared by both engines.
_RAMSEY_TRIS = [(5, 0, 0, 1, 4), (5, 1, 0, 2, 5), (5, 2, 0, 3, 6), (5, 3, 1, 2, 7), (5, 4, 1, 3, 8), (5, 5, 2, 3, 9), (5, 6, 4, 5, 7), (5, 7, 4, 6, 8), (5, 8, 5, 6, 9), (5, 9, 7, 8, 9), (6, 0, 0, 1, 5), (6, 1, 0, 2, 6), (6, 2, 0, 3, 7), (6, 3, 0, 4, 8), (6, 4, 1, 2, 9), (6, 5, 1, 3, 10), (6, 6, 1, 4, 11), (6, 7, 2, 3, 12), (6, 8, 2, 4, 13), (6, 9, 3, 4, 14), (6, 10, 5, 6, 9), (6, 11, 5, 7, 10), (6, 12, 5, 8, 11), (6, 13, 6, 7, 12), (6, 14, 6, 8, 13), (6, 15, 7, 8, 14), (6, 16, 9, 10, 12), (6, 17, 9, 11, 13), (6, 18, 10, 11, 14), (6, 19, 12, 13, 14)]

_RAMSEY_ORACLE = """
WITH tris(n, t, e1, e2, e3) AS (VALUES (5, 0, 0, 1, 4), (5, 1, 0, 2, 5), (5, 2, 0, 3, 6), (5, 3, 1, 2, 7), (5, 4, 1, 3, 8), (5, 5, 2, 3, 9), (5, 6, 4, 5, 7), (5, 7, 4, 6, 8), (5, 8, 5, 6, 9), (5, 9, 7, 8, 9), (6, 0, 0, 1, 5), (6, 1, 0, 2, 6), (6, 2, 0, 3, 7), (6, 3, 0, 4, 8), (6, 4, 1, 2, 9), (6, 5, 1, 3, 10), (6, 6, 1, 4, 11), (6, 7, 2, 3, 12), (6, 8, 2, 4, 13), (6, 9, 3, 4, 14), (6, 10, 5, 6, 9), (6, 11, 5, 7, 10), (6, 12, 5, 8, 11), (6, 13, 6, 7, 12), (6, 14, 6, 8, 13), (6, 15, 7, 8, 14), (6, 16, 9, 10, 12), (6, 17, 9, 11, 13), (6, 18, 10, 11, 14), (6, 19, 12, 13, 14)),
cfg AS MATERIALIZED (
  SELECT n, ne FROM (VALUES (5, 10), (6, 15)) v(n, ne)
),
masks AS MATERIALIZED (
  SELECT c.n, m.m
  FROM cfg c, (SELECT unnest(generate_series(0, 32767)) AS m) m
  WHERE m.m < (1 << c.ne)
),
bad AS MATERIALIZED (
  SELECT DISTINCT k.n, k.m
  FROM masks k
  JOIN tris t ON t.n = k.n
  WHERE ((k.m >> t.e1) & 1) = ((k.m >> t.e2) & 1)
    AND ((k.m >> t.e2) & 1) = ((k.m >> t.e3) & 1)
)
SELECT CAST(c.n AS INT) AS n,
       CAST((1 << c.ne) AS BIGINT) AS n_colorings,
       CAST((1 << c.ne) - count(b.m) AS BIGINT) AS n_escaping,
       CAST(CASE WHEN c.n = 6 AND (1 << c.ne) - count(b.m) = 0 THEN 1
                 WHEN c.n = 5 AND (1 << c.ne) - count(b.m) = 12 THEN 1
                 ELSE 0 END AS INT) AS ramsey_certified
FROM cfg c LEFT JOIN bad b ON b.n = c.n
GROUP BY c.n, c.ne ORDER BY n
"""


@register_extra("ramsey_r33_certificate", _RAMSEY_ORACLE)
def ramsey_r33_certificate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exhaustive R(3,3) = 6 certificate (see oracle comment) — one
    coloring x triangle join per clique size; both bounds frozen."""
    sess = spark
    tris = sess.createDataFrame(
        _RAMSEY_TRIS, "n int, t int, e1 int, e2 int, e3 int"
    )
    cfg = sess.createDataFrame([(5, 10), (6, 15)], "n int, ne int")
    masks = (
        cfg.crossJoin(
            sess.range(0, 32768).select(F.col("id").cast("long").alias("m"))
        )
        .filter(F.expr("m < shiftleft(1L, ne)"))
    )
    bad = (
        masks.join(F.broadcast(tris), "n")
        .filter(
            F.expr(
                "((m >> e1) & 1) = ((m >> e2) & 1)"
                " AND ((m >> e2) & 1) = ((m >> e3) & 1)"
            )
        )
        .select("n", "m")
        .distinct()
    )
    return (
        cfg.join(
            bad.groupBy("n").agg(F.count(F.lit(1)).alias("n_bad")),
            "n",
            "left",
        )
        .selectExpr(
            "CAST(n AS INT) AS n",
            "CAST(shiftleft(1L, ne) AS BIGINT) AS n_colorings",
            "CAST(shiftleft(1L, ne) - coalesce(n_bad, 0) AS BIGINT)"
            " AS n_escaping",
            "CAST(CASE WHEN n = 6 AND shiftleft(1L, ne)"
            " - coalesce(n_bad, 0) = 0 THEN 1"
            " WHEN n = 5 AND shiftleft(1L, ne)"
            " - coalesce(n_bad, 0) = 12 THEN 1 ELSE 0 END AS INT)"
            " AS ramsey_certified",
        )
        .orderBy("n")
    )


# --------------------------------------------- Hanoi ruler census

# Tower of Hanoi, closed form: in the optimal 2^n - 1 move solution,
# move k moves disk = (number of trailing zeros of k) — the ruler
# sequence — so disk d moves exactly 2^(n-1-d) times. For n = 10 the
# query derives every move's disk via the trailing-zero bit trick
# tz(k) = bit_count((k & -k) - 1), aggregates the per-disk move
# counts and freezes the 2^(n-1-d) law plus the 1023-move total.
_HANOI_ORACLE = """
WITH mv AS MATERIALIZED (
  SELECT k.k, bit_count((k.k & (-k.k)) - 1) AS disk
  FROM (SELECT unnest(generate_series(1, 1023)) AS k) k
)
SELECT CAST(disk AS INT) AS disk,
       CAST(count(*) AS BIGINT) AS n_moves,
       CAST(1::BIGINT << (9 - disk) AS BIGINT) AS predicted,
       CAST(CASE WHEN count(*) = (1::BIGINT << (9 - disk))
            THEN 1 ELSE 0 END AS INT) AS law_holds
FROM mv GROUP BY disk ORDER BY disk
"""


@register_extra("hanoi_ruler_census", _HANOI_ORACLE)
def hanoi_ruler_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hanoi move census via the ruler sequence (see oracle comment)
    — per-disk counts match 2^(n-1-d) exactly, frozen."""
    sess = spark
    return (
        sess.range(1, 1024)
        .select(F.col("id").cast("long").alias("k"))
        .withColumn("disk", F.expr("bit_count((k & -k) - 1)"))
        .groupBy("disk")
        .agg(F.count(F.lit(1)).alias("n_moves"))
        .selectExpr(
            "CAST(disk AS INT) AS disk",
            "CAST(n_moves AS BIGINT) AS n_moves",
            "CAST(shiftleft(1L, 9 - disk) AS BIGINT) AS predicted",
            "CAST(IF(n_moves = shiftleft(1L, 9 - disk), 1, 0) AS INT)"
            " AS law_holds",
        )
        .orderBy("disk")
    )


# --------------------------------------------- Bouton's Nim theorem

# Bouton's theorem (1901) — the first solved combinatorial game:
# a Nim position is losing iff the XOR of its pile sizes is zero.
# The query proves it exhaustively for three piles <= 5: backward
# induction over 12 simultaneous rounds (a position is W once some
# move reaches a known L, L once every move reaches a known W)
# classifies all 216 positions, and the verdict must equal the XOR
# rule on every row — agreement frozen, 28 losing positions.
_NIM_ORACLE = """
WITH pos AS MATERIALIZED (
  SELECT a.a, b.b, c.c
  FROM (SELECT unnest(generate_series(0, 5)) AS a) a,
       (SELECT unnest(generate_series(0, 5)) AS b) b,
       (SELECT unnest(generate_series(0, 5)) AS c) c
),
mv AS MATERIALIZED (
  SELECT p.a, p.b, p.c, v.v AS ta, p.b AS tb, p.c AS tc
  FROM pos p, (SELECT unnest(generate_series(0, 4)) AS v) v
  WHERE v.v < p.a
  UNION ALL
  SELECT p.a, p.b, p.c, p.a, v.v, p.c
  FROM pos p, (SELECT unnest(generate_series(0, 4)) AS v) v
  WHERE v.v < p.b
  UNION ALL
  SELECT p.a, p.b, p.c, p.a, p.b, v.v
  FROM pos p, (SELECT unnest(generate_series(0, 4)) AS v) v
  WHERE v.v < p.c
),
st0 AS MATERIALIZED (
  SELECT 0 AS a, 0 AS b, 0 AS c, 'L' AS s
),
st1 AS MATERIALIZED (
  SELECT * FROM st0
  UNION ALL
  SELECT q.a, q.b, q.c, 'W' AS s
  FROM pos q
  WHERE NOT EXISTS (SELECT 1 FROM st0 z
                    WHERE z.a = q.a AND z.b = q.b AND z.c = q.c)
    AND EXISTS (SELECT 1 FROM mv m
                JOIN st0 z ON z.a = m.ta AND z.b = m.tb
                             AND z.c = m.tc AND z.s = 'L'
                WHERE m.a = q.a AND m.b = q.b AND m.c = q.c)
  UNION ALL
  SELECT q.a, q.b, q.c, 'L'
  FROM pos q
  WHERE NOT EXISTS (SELECT 1 FROM st0 z
                    WHERE z.a = q.a AND z.b = q.b AND z.c = q.c)
    AND NOT EXISTS (SELECT 1 FROM mv m
                    LEFT JOIN st0 z ON z.a = m.ta AND z.b = m.tb
                                      AND z.c = m.tc AND z.s = 'W'
                    WHERE m.a = q.a AND m.b = q.b AND m.c = q.c
                      AND z.a IS NULL)
    AND EXISTS (SELECT 1 FROM mv m
                WHERE m.a = q.a AND m.b = q.b AND m.c = q.c)
),
st2 AS MATERIALIZED (
  SELECT * FROM st1
  UNION ALL
  SELECT q.a, q.b, q.c, 'W' AS s
  FROM pos q
  WHERE NOT EXISTS (SELECT 1 FROM st1 z
                    WHERE z.a = q.a AND z.b = q.b AND z.c = q.c)
    AND EXISTS (SELECT 1 FROM mv m
                JOIN st1 z ON z.a = m.ta AND z.b = m.tb
                             AND z.c = m.tc AND z.s = 'L'
                WHERE m.a = q.a AND m.b = q.b AND m.c = q.c)
  UNION ALL
  SELECT q.a, q.b, q.c, 'L'
  FROM pos q
  WHERE NOT EXISTS (SELECT 1 FROM st1 z
                    WHERE z.a = q.a AND z.b = q.b AND z.c = q.c)
    AND NOT EXISTS (SELECT 1 FROM mv m
                    LEFT JOIN st1 z ON z.a = m.ta AND z.b = m.tb
                                      AND z.c = m.tc AND z.s = 'W'
                    WHERE m.a = q.a AND m.b = q.b AND m.c = q.c
                      AND z.a IS NULL)
    AND EXISTS (SELECT 1 FROM mv m
                WHERE m.a = q.a AND m.b = q.b AND m.c = q.c)
),
st3 AS MATERIALIZED (
  SELECT * FROM st2
  UNION ALL
  SELECT q.a, q.b, q.c, 'W' AS s
  FROM pos q
  WHERE NOT EXISTS (SELECT 1 FROM st2 z
                    WHERE z.a = q.a AND z.b = q.b AND z.c = q.c)
    AND EXISTS (SELECT 1 FROM mv m
                JOIN st2 z ON z.a = m.ta AND z.b = m.tb
                             AND z.c = m.tc AND z.s = 'L'
                WHERE m.a = q.a AND m.b = q.b AND m.c = q.c)
  UNION ALL
  SELECT q.a, q.b, q.c, 'L'
  FROM pos q
  WHERE NOT EXISTS (SELECT 1 FROM st2 z
                    WHERE z.a = q.a AND z.b = q.b AND z.c = q.c)
    AND NOT EXISTS (SELECT 1 FROM mv m
                    LEFT JOIN st2 z ON z.a = m.ta AND z.b = m.tb
                                      AND z.c = m.tc AND z.s = 'W'
                    WHERE m.a = q.a AND m.b = q.b AND m.c = q.c
                      AND z.a IS NULL)
    AND EXISTS (SELECT 1 FROM mv m
                WHERE m.a = q.a AND m.b = q.b AND m.c = q.c)
),
st4 AS MATERIALIZED (
  SELECT * FROM st3
  UNION ALL
  SELECT q.a, q.b, q.c, 'W' AS s
  FROM pos q
  WHERE NOT EXISTS (SELECT 1 FROM st3 z
                    WHERE z.a = q.a AND z.b = q.b AND z.c = q.c)
    AND EXISTS (SELECT 1 FROM mv m
                JOIN st3 z ON z.a = m.ta AND z.b = m.tb
                             AND z.c = m.tc AND z.s = 'L'
                WHERE m.a = q.a AND m.b = q.b AND m.c = q.c)
  UNION ALL
  SELECT q.a, q.b, q.c, 'L'
  FROM pos q
  WHERE NOT EXISTS (SELECT 1 FROM st3 z
                    WHERE z.a = q.a AND z.b = q.b AND z.c = q.c)
    AND NOT EXISTS (SELECT 1 FROM mv m
                    LEFT JOIN st3 z ON z.a = m.ta AND z.b = m.tb
                                      AND z.c = m.tc AND z.s = 'W'
                    WHERE m.a = q.a AND m.b = q.b AND m.c = q.c
                      AND z.a IS NULL)
    AND EXISTS (SELECT 1 FROM mv m
                WHERE m.a = q.a AND m.b = q.b AND m.c = q.c)
),
st5 AS MATERIALIZED (
  SELECT * FROM st4
  UNION ALL
  SELECT q.a, q.b, q.c, 'W' AS s
  FROM pos q
  WHERE NOT EXISTS (SELECT 1 FROM st4 z
                    WHERE z.a = q.a AND z.b = q.b AND z.c = q.c)
    AND EXISTS (SELECT 1 FROM mv m
                JOIN st4 z ON z.a = m.ta AND z.b = m.tb
                             AND z.c = m.tc AND z.s = 'L'
                WHERE m.a = q.a AND m.b = q.b AND m.c = q.c)
  UNION ALL
  SELECT q.a, q.b, q.c, 'L'
  FROM pos q
  WHERE NOT EXISTS (SELECT 1 FROM st4 z
                    WHERE z.a = q.a AND z.b = q.b AND z.c = q.c)
    AND NOT EXISTS (SELECT 1 FROM mv m
                    LEFT JOIN st4 z ON z.a = m.ta AND z.b = m.tb
                                      AND z.c = m.tc AND z.s = 'W'
                    WHERE m.a = q.a AND m.b = q.b AND m.c = q.c
                      AND z.a IS NULL)
    AND EXISTS (SELECT 1 FROM mv m
                WHERE m.a = q.a AND m.b = q.b AND m.c = q.c)
),
st6 AS MATERIALIZED (
  SELECT * FROM st5
  UNION ALL
  SELECT q.a, q.b, q.c, 'W' AS s
  FROM pos q
  WHERE NOT EXISTS (SELECT 1 FROM st5 z
                    WHERE z.a = q.a AND z.b = q.b AND z.c = q.c)
    AND EXISTS (SELECT 1 FROM mv m
                JOIN st5 z ON z.a = m.ta AND z.b = m.tb
                             AND z.c = m.tc AND z.s = 'L'
                WHERE m.a = q.a AND m.b = q.b AND m.c = q.c)
  UNION ALL
  SELECT q.a, q.b, q.c, 'L'
  FROM pos q
  WHERE NOT EXISTS (SELECT 1 FROM st5 z
                    WHERE z.a = q.a AND z.b = q.b AND z.c = q.c)
    AND NOT EXISTS (SELECT 1 FROM mv m
                    LEFT JOIN st5 z ON z.a = m.ta AND z.b = m.tb
                                      AND z.c = m.tc AND z.s = 'W'
                    WHERE m.a = q.a AND m.b = q.b AND m.c = q.c
                      AND z.a IS NULL)
    AND EXISTS (SELECT 1 FROM mv m
                WHERE m.a = q.a AND m.b = q.b AND m.c = q.c)
),
st7 AS MATERIALIZED (
  SELECT * FROM st6
  UNION ALL
  SELECT q.a, q.b, q.c, 'W' AS s
  FROM pos q
  WHERE NOT EXISTS (SELECT 1 FROM st6 z
                    WHERE z.a = q.a AND z.b = q.b AND z.c = q.c)
    AND EXISTS (SELECT 1 FROM mv m
                JOIN st6 z ON z.a = m.ta AND z.b = m.tb
                             AND z.c = m.tc AND z.s = 'L'
                WHERE m.a = q.a AND m.b = q.b AND m.c = q.c)
  UNION ALL
  SELECT q.a, q.b, q.c, 'L'
  FROM pos q
  WHERE NOT EXISTS (SELECT 1 FROM st6 z
                    WHERE z.a = q.a AND z.b = q.b AND z.c = q.c)
    AND NOT EXISTS (SELECT 1 FROM mv m
                    LEFT JOIN st6 z ON z.a = m.ta AND z.b = m.tb
                                      AND z.c = m.tc AND z.s = 'W'
                    WHERE m.a = q.a AND m.b = q.b AND m.c = q.c
                      AND z.a IS NULL)
    AND EXISTS (SELECT 1 FROM mv m
                WHERE m.a = q.a AND m.b = q.b AND m.c = q.c)
),
st8 AS MATERIALIZED (
  SELECT * FROM st7
  UNION ALL
  SELECT q.a, q.b, q.c, 'W' AS s
  FROM pos q
  WHERE NOT EXISTS (SELECT 1 FROM st7 z
                    WHERE z.a = q.a AND z.b = q.b AND z.c = q.c)
    AND EXISTS (SELECT 1 FROM mv m
                JOIN st7 z ON z.a = m.ta AND z.b = m.tb
                             AND z.c = m.tc AND z.s = 'L'
                WHERE m.a = q.a AND m.b = q.b AND m.c = q.c)
  UNION ALL
  SELECT q.a, q.b, q.c, 'L'
  FROM pos q
  WHERE NOT EXISTS (SELECT 1 FROM st7 z
                    WHERE z.a = q.a AND z.b = q.b AND z.c = q.c)
    AND NOT EXISTS (SELECT 1 FROM mv m
                    LEFT JOIN st7 z ON z.a = m.ta AND z.b = m.tb
                                      AND z.c = m.tc AND z.s = 'W'
                    WHERE m.a = q.a AND m.b = q.b AND m.c = q.c
                      AND z.a IS NULL)
    AND EXISTS (SELECT 1 FROM mv m
                WHERE m.a = q.a AND m.b = q.b AND m.c = q.c)
),
st9 AS MATERIALIZED (
  SELECT * FROM st8
  UNION ALL
  SELECT q.a, q.b, q.c, 'W' AS s
  FROM pos q
  WHERE NOT EXISTS (SELECT 1 FROM st8 z
                    WHERE z.a = q.a AND z.b = q.b AND z.c = q.c)
    AND EXISTS (SELECT 1 FROM mv m
                JOIN st8 z ON z.a = m.ta AND z.b = m.tb
                             AND z.c = m.tc AND z.s = 'L'
                WHERE m.a = q.a AND m.b = q.b AND m.c = q.c)
  UNION ALL
  SELECT q.a, q.b, q.c, 'L'
  FROM pos q
  WHERE NOT EXISTS (SELECT 1 FROM st8 z
                    WHERE z.a = q.a AND z.b = q.b AND z.c = q.c)
    AND NOT EXISTS (SELECT 1 FROM mv m
                    LEFT JOIN st8 z ON z.a = m.ta AND z.b = m.tb
                                      AND z.c = m.tc AND z.s = 'W'
                    WHERE m.a = q.a AND m.b = q.b AND m.c = q.c
                      AND z.a IS NULL)
    AND EXISTS (SELECT 1 FROM mv m
                WHERE m.a = q.a AND m.b = q.b AND m.c = q.c)
),
st10 AS MATERIALIZED (
  SELECT * FROM st9
  UNION ALL
  SELECT q.a, q.b, q.c, 'W' AS s
  FROM pos q
  WHERE NOT EXISTS (SELECT 1 FROM st9 z
                    WHERE z.a = q.a AND z.b = q.b AND z.c = q.c)
    AND EXISTS (SELECT 1 FROM mv m
                JOIN st9 z ON z.a = m.ta AND z.b = m.tb
                             AND z.c = m.tc AND z.s = 'L'
                WHERE m.a = q.a AND m.b = q.b AND m.c = q.c)
  UNION ALL
  SELECT q.a, q.b, q.c, 'L'
  FROM pos q
  WHERE NOT EXISTS (SELECT 1 FROM st9 z
                    WHERE z.a = q.a AND z.b = q.b AND z.c = q.c)
    AND NOT EXISTS (SELECT 1 FROM mv m
                    LEFT JOIN st9 z ON z.a = m.ta AND z.b = m.tb
                                      AND z.c = m.tc AND z.s = 'W'
                    WHERE m.a = q.a AND m.b = q.b AND m.c = q.c
                      AND z.a IS NULL)
    AND EXISTS (SELECT 1 FROM mv m
                WHERE m.a = q.a AND m.b = q.b AND m.c = q.c)
),
st11 AS MATERIALIZED (
  SELECT * FROM st10
  UNION ALL
  SELECT q.a, q.b, q.c, 'W' AS s
  FROM pos q
  WHERE NOT EXISTS (SELECT 1 FROM st10 z
                    WHERE z.a = q.a AND z.b = q.b AND z.c = q.c)
    AND EXISTS (SELECT 1 FROM mv m
                JOIN st10 z ON z.a = m.ta AND z.b = m.tb
                             AND z.c = m.tc AND z.s = 'L'
                WHERE m.a = q.a AND m.b = q.b AND m.c = q.c)
  UNION ALL
  SELECT q.a, q.b, q.c, 'L'
  FROM pos q
  WHERE NOT EXISTS (SELECT 1 FROM st10 z
                    WHERE z.a = q.a AND z.b = q.b AND z.c = q.c)
    AND NOT EXISTS (SELECT 1 FROM mv m
                    LEFT JOIN st10 z ON z.a = m.ta AND z.b = m.tb
                                      AND z.c = m.tc AND z.s = 'W'
                    WHERE m.a = q.a AND m.b = q.b AND m.c = q.c
                      AND z.a IS NULL)
    AND EXISTS (SELECT 1 FROM mv m
                WHERE m.a = q.a AND m.b = q.b AND m.c = q.c)
),
st12 AS MATERIALIZED (
  SELECT * FROM st11
  UNION ALL
  SELECT q.a, q.b, q.c, 'W' AS s
  FROM pos q
  WHERE NOT EXISTS (SELECT 1 FROM st11 z
                    WHERE z.a = q.a AND z.b = q.b AND z.c = q.c)
    AND EXISTS (SELECT 1 FROM mv m
                JOIN st11 z ON z.a = m.ta AND z.b = m.tb
                             AND z.c = m.tc AND z.s = 'L'
                WHERE m.a = q.a AND m.b = q.b AND m.c = q.c)
  UNION ALL
  SELECT q.a, q.b, q.c, 'L'
  FROM pos q
  WHERE NOT EXISTS (SELECT 1 FROM st11 z
                    WHERE z.a = q.a AND z.b = q.b AND z.c = q.c)
    AND NOT EXISTS (SELECT 1 FROM mv m
                    LEFT JOIN st11 z ON z.a = m.ta AND z.b = m.tb
                                      AND z.c = m.tc AND z.s = 'W'
                    WHERE m.a = q.a AND m.b = q.b AND m.c = q.c
                      AND z.a IS NULL)
    AND EXISTS (SELECT 1 FROM mv m
                WHERE m.a = q.a AND m.b = q.b AND m.c = q.c)
)
SELECT CAST(f.a AS INT) AS a, CAST(f.b AS INT) AS b,
       CAST(f.c AS INT) AS c, f.s AS verdict,
       CAST(xor(xor(f.a, f.b), f.c) AS INT) AS pile_xor,
       CAST(CASE WHEN (f.s = 'L') = (xor(xor(f.a, f.b), f.c) = 0)
            THEN 1 ELSE 0 END AS INT) AS bouton_agrees
FROM st12 f
ORDER BY a, b, c
"""


@register_extra("nim_bouton_theorem", _NIM_ORACLE)
def nim_bouton_theorem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bouton's Nim theorem proved exhaustively (see oracle comment)
    — 12 backward-induction rounds over the 216-position lattice in
    Spark mirror the staged SQL; XOR-rule agreement frozen per
    position."""
    sess = spark
    r6 = sess.range(0, 6).select(F.col("id").cast("int"))
    pos = (
        r6.select(F.col("id").alias("a"))
        .crossJoin(r6.select(F.col("id").alias("b")))
        .crossJoin(r6.select(F.col("id").alias("c")))
        .localCheckpoint(eager=True)
    )
    v5 = sess.range(0, 5).select(F.col("id").cast("int").alias("v"))
    mv = (
        pos.crossJoin(F.broadcast(v5))
        .filter(F.col("v") < F.col("a"))
        .selectExpr("a", "b", "c", "v AS ta", "b AS tb", "c AS tc")
        .unionByName(
            pos.crossJoin(F.broadcast(v5))
            .filter(F.col("v") < F.col("b"))
            .selectExpr("a", "b", "c", "a AS ta", "v AS tb", "c AS tc")
        )
        .unionByName(
            pos.crossJoin(F.broadcast(v5))
            .filter(F.col("v") < F.col("c"))
            .selectExpr("a", "b", "c", "a AS ta", "b AS tb", "v AS tc")
        )
        .localCheckpoint(eager=True)
    )
    st = sess.createDataFrame([(0, 0, 0, "L")], "a int, b int, c int, s string")
    for _ in range(12):
        zl = st.filter(F.col("s") == "L").select(
            F.col("a").alias("ta"), F.col("b").alias("tb"),
            F.col("c").alias("tc"),
        )
        zw = st.filter(F.col("s") == "W").select(
            F.col("a").alias("ta"), F.col("b").alias("tb"),
            F.col("c").alias("tc"), F.lit(1).alias("isw"),
        )
        uncls = pos.join(st.select("a", "b", "c"), ["a", "b", "c"],
                         "left_anti")
        wnew = (
            uncls.join(mv, ["a", "b", "c"])
            .join(F.broadcast(zl), ["ta", "tb", "tc"])
            .select("a", "b", "c")
            .distinct()
            .withColumn("s", F.lit("W"))
        )
        lnew = (
            uncls.join(mv, ["a", "b", "c"])
            .join(F.broadcast(zw), ["ta", "tb", "tc"], "left")
            .groupBy("a", "b", "c")
            .agg(
                F.count(F.lit(1)).alias("nm"),
                F.sum(F.coalesce("isw", F.lit(0))).alias("nw"),
            )
            .filter(F.col("nm") == F.col("nw"))
            .select("a", "b", "c")
            .join(wnew.select("a", "b", "c"), ["a", "b", "c"], "left_anti")
            .withColumn("s", F.lit("L"))
        )
        st = st.unionByName(wnew).unionByName(lnew)
        st = sess.createDataFrame(st.rdd.cache(), st.schema)
    return st.select(
        F.col("a").cast("int"),
        F.col("b").cast("int"),
        F.col("c").cast("int"),
        F.col("s").alias("verdict"),
        F.expr("CAST(a ^ b ^ c AS INT)").alias("pile_xor"),
        F.expr(
            "CAST(IF((s = 'L') = ((a ^ b ^ c) = 0), 1, 0) AS INT)"
        ).alias("bouton_agrees"),
    ).orderBy("a", "b", "c")
