"""Warehouse/mining operator family: A-Priori frequent itemset pairs
(market-basket), a slowly-changing-dimension type-2 builder, a cohort
retention matrix, and a blocked fuzzy-match (entity-resolution) join.

All with independent SQL oracles. Extra-tier (the 50-row driver gate is
full — CLAUDE.md invariant); round-5 rotation candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import register_extra


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


@register_extra(
    "frequent_item_pairs",
    """
    WITH e AS (SELECT DISTINCT user_id, props FROM events),
    n AS (SELECT (count(DISTINCT user_id) + 2) // 3 AS minsup FROM e),
    f1 AS (
      SELECT props FROM e CROSS JOIN n
      GROUP BY props, minsup HAVING count(*) >= minsup
    ),
    ef AS (SELECT e.user_id, e.props FROM e JOIN f1 USING (props)),
    pairs AS (
      SELECT a.props AS item_a, b.props AS item_b, count(*) AS n_users
      FROM ef a JOIN ef b ON a.user_id = b.user_id AND a.props < b.props
      GROUP BY 1, 2
    )
    SELECT item_a, item_b, n_users
    FROM pairs CROSS JOIN n WHERE n_users >= minsup
    ORDER BY item_a, item_b
    """,
)
def frequent_item_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-Priori frequent pairs over (user -> set of interaction
    contexts) baskets, minsup = ceil(n_users/3) derived IN-PLAN from a
    broadcast 1-row aggregate (the gapfill bounds-join discipline — no
    driver collect, threshold scales with the data). The A-Priori
    monotonicity prefilter (only frequent-1 items enter pair
    generation) bounds the self-join fan-out at C(k,2) per basket over
    frequent items only — at 10^12 baskets that prefilter is the
    difference between a vocabulary-bounded shuffle and an
    all-pairs-of-everything explosion. Integer end-to-end."""
    e = _t(spark, sf_dir, "events").select("user_id", "props").distinct()
    n = e.agg(
        F.expr("(count(DISTINCT user_id) + 2) div 3").alias("minsup")
    )
    f1 = (
        e.crossJoin(F.broadcast(n))
        .groupBy("props", "minsup")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= F.col("minsup"))
        .select("props")
    )
    ef = e.join(F.broadcast(f1), "props").select("user_id", "props")
    a = ef.select("user_id", F.col("props").alias("item_a"))
    b = ef.select("user_id", F.col("props").alias("item_b"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    return (
        pairs.crossJoin(F.broadcast(n))
        .filter(F.col("n_users") >= F.col("minsup"))
        .select("item_a", "item_b", "n_users")
        .orderBy("item_a", "item_b")
    )


@register_extra(
    "scd2_user_context",
    """
    WITH src AS (
      SELECT user_id, ts, event_id, props FROM events
      WHERE event_type = 'signup'
    ),
    changes AS (
      SELECT user_id, ts, event_id, props,
             lag(props) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS prev
      FROM src
    ),
    versions AS (
      SELECT user_id, ts, event_id, props FROM changes
      WHERE prev IS NULL OR props <> prev
    ),
    dim AS (
      SELECT user_id, props AS attr,
             CAST(floor(epoch(ts)) AS BIGINT) AS valid_from_epoch,
             CAST(floor(epoch(lead(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id))) AS BIGINT)
               AS valid_to_epoch
      FROM versions
    )
    SELECT user_id, attr, valid_from_epoch, valid_to_epoch,
           valid_to_epoch IS NULL AS is_current
    FROM dim
    ORDER BY user_id, valid_from_epoch
    """,
)
def scd2_user_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 from a change-event stream:
    consecutive no-op changes collapse (lag), validity intervals come
    from lead — [valid_from, valid_to) half-open, NULL valid_to ==
    current row. Both windows ride ONE user_id shuffle; the (ts,
    event_id) tie-break is pinned in both engines. This is the batch
    dimension-build half of the upsert story (snaptable's
    merge-on-read upsert is the serving half)."""
    src = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "signup")
        .select("user_id", "ts", "event_id", "props")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    versions = (
        src.withColumn("prev", F.lag("props").over(w))
        .filter(F.col("prev").isNull() | (F.col("props") != F.col("prev")))
        .drop("prev")
    )
    dim = versions.select(
        "user_id",
        F.col("props").alias("attr"),
        F.unix_timestamp("ts").alias("valid_from_epoch"),
        F.lead(F.unix_timestamp("ts")).over(w).alias("valid_to_epoch"),
    )
    return dim.select(
        "user_id",
        "attr",
        "valid_from_epoch",
        "valid_to_epoch",
        F.col("valid_to_epoch").isNull().alias("is_current"),
    ).orderBy("user_id", "valid_from_epoch")


@register_extra(
    "cohort_retention",
    """
    WITH o AS (
      SELECT o_custkey,
             year(o_orderdate) * 12 + month(o_orderdate) - 1 AS midx
      FROM orders
    ),
    c AS (SELECT o_custkey, min(midx) AS cidx FROM o GROUP BY o_custkey),
    act AS (
      SELECT DISTINCT o.o_custkey, c.cidx, o.midx - c.cidx AS offs
      FROM o JOIN c USING (o_custkey)
    ),
    sz AS (SELECT cidx, count(*) AS n_cohort FROM c GROUP BY cidx),
    ret AS (SELECT cidx, offs, count(*) AS n_active
            FROM act GROUP BY cidx, offs)
    SELECT printf('%04d-%02d', cidx // 12, cidx % 12 + 1) AS cohort_month,
           offs AS month_offset,
           n_active,
           CAST(round(CAST(n_active AS DOUBLE) / n_cohort, 4) AS DOUBLE)
             AS retention
    FROM ret JOIN sz USING (cidx)
    ORDER BY cohort_month, month_offset
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort x months-since-signup retention matrix over
    orders: cohort = a customer's first order month, retention(k) =
    |customers of that cohort active k months later| / cohort size.

    One shuffle on o_custkey carries both the cohort min and the
    activity dedup (the join back is on the same key, so AQE plans it
    shuffle-free after the groupBy); the (cohort, offset) rollup then
    shuffles only distinct (custkey, offset) pairs — bounded by
    customers x months, not by order count, so a 10^12-order fact table
    reduces before the second exchange. The cohort-size side is
    months-bounded (tiny) and broadcast. Month arithmetic is integer
    end-to-end; only the final ratio is a rounded double."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("long")
        .alias("midx"),
    )
    c = o.groupBy("o_custkey").agg(F.min("midx").alias("cidx"))
    act = (
        o.join(c, "o_custkey")
        .select(
            "o_custkey", "cidx", (F.col("midx") - F.col("cidx")).alias("offs")
        )
        .distinct()
    )
    sz = c.groupBy("cidx").agg(F.count(F.lit(1)).alias("n_cohort"))
    ret = act.groupBy("cidx", "offs").agg(F.count(F.lit(1)).alias("n_active"))
    return (
        ret.join(F.broadcast(sz), "cidx")
        .select(
            F.format_string(
                "%04d-%02d",
                (F.col("cidx") / 12).cast("long"),
                (F.col("cidx") % 12 + 1).cast("long"),
            ).alias("cohort_month"),
            F.col("offs").alias("month_offset"),
            "n_active",
            F.round(F.col("n_active") / F.col("n_cohort"), 4).alias(
                "retention"
            ),
        )
        .orderBy("cohort_month", "month_offset")
    )


@register_extra(
    "fuzzy_match_join",
    """
    WITH clean AS (SELECT DISTINCT p_name FROM part),
    dirty AS (
      SELECT p_partkey AS query_id,
             concat(
               substr(p_name, 1,
                      CAST(p_partkey % length(p_name) AS INT)),
               substr(p_name,
                      CAST(p_partkey % length(p_name) AS INT) + 2)
             ) AS query_name
      FROM part
    ),
    cand AS (
      SELECT d.query_id, d.query_name, c.p_name AS matched_name,
             CAST(levenshtein(d.query_name, c.p_name) AS BIGINT) AS dist
      FROM dirty d JOIN clean c
        ON substr(d.query_name, 1, 1) = substr(c.p_name, 1, 1)
       AND abs(length(d.query_name) - length(c.p_name)) <= 1
      WHERE levenshtein(d.query_name, c.p_name) <= 2
    ),
    ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY query_id
               ORDER BY dist, matched_name) AS rn
      FROM cand
    )
    SELECT query_id, query_name, matched_name, dist
    FROM ranked WHERE rn = 1
    ORDER BY query_id
    """,
)
def fuzzy_match_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked entity-resolution join: dirty strings (each part name
    with one deterministically-chosen character dropped) matched back
    to the clean name dimension via (first-char, length-band) blocking
    + Levenshtein<=2 verify + best-match top-1.

    The blocking key is the scale story: candidate generation is an
    equi-join on the block key with a band predicate, never all-pairs —
    at 10^12 dirty rows the comparison count is rows x block-bucket
    width, not rows x vocabulary. The clean side is a dimension
    (broadcast); Levenshtein runs JVM-side (built-in, codegen'd); the
    top-1 window rides the block join's partitioning. Drops whose first
    character was the dropped one fall outside the block by design —
    the recall/cost trade every production blocker makes — and both
    engines replicate it exactly."""
    part = _t(spark, sf_dir, "part")
    clean = part.select("p_name").distinct()
    dirty = part.select(
        F.col("p_partkey").alias("query_id"),
        F.concat(
            F.expr(
                "substr(p_name, 1, CAST(p_partkey % length(p_name) AS INT))"
            ),
            F.expr(
                "substr(p_name, CAST(p_partkey % length(p_name) AS INT) + 2)"
            ),
        ).alias("query_name"),
    )
    c = F.broadcast(clean.select(F.col("p_name").alias("matched_name")))
    cand = (
        dirty.join(
            c,
            (
                F.substring("query_name", 1, 1)
                == F.substring("matched_name", 1, 1)
            )
            & (
                F.abs(F.length("query_name") - F.length("matched_name"))
                <= 1
            ),
        )
        .withColumn(
            "dist",
            F.levenshtein("query_name", "matched_name").cast("long"),
        )
        .filter(F.col("dist") <= 2)
    )
    w = Window.partitionBy("query_id").orderBy("dist", "matched_name")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", "query_name", "matched_name", "dist")
        .orderBy("query_id")
    )


@register_extra(
    "grouped_trend_lines",
    """
    WITH e AS (
      SELECT event_type,
             CAST(floor(epoch(ts)) AS BIGINT) - 788918400 AS x,
             value AS y
      FROM events
    ),
    m AS (
      SELECT event_type,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(x AS DECIMAL(28,0))) AS DOUBLE) AS sx,
             CAST(sum(CAST(x*x AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(y AS DECIMAL(38,18))) AS DOUBLE) AS sy,
             CAST(sum(CAST(y*y AS DECIMAL(38,18))) AS DOUBLE) AS syy,
             CAST(sum(CAST(x*y AS DECIMAL(38,18))) AS DOUBLE) AS sxy
      FROM e GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           CAST(round((n*sxy - sx*sy) / (n*sxx - sx*sx) * 86400.0, 6)
                AS DOUBLE) AS slope_per_day,
           CAST(round((sy - (n*sxy - sx*sy) / (n*sxx - sx*sx) * sx) / n, 6)
                AS DOUBLE) AS intercept,
           CAST(round((n*sxy - sx*sy) * (n*sxy - sx*sy)
                      / ((n*sxx - sx*sx) * (n*syy - sy*sy)), 6)
                AS DOUBLE) AS r2
    FROM m ORDER BY event_type
    """,
)
def grouped_trend_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped OLS trend lines (slope/intercept/r^2 of value vs time
    per event_type) from closed-form moment sums — the scale lesson is
    HOW the moments are summed: float sums are addition-order-dependent
    and Spark's partial-aggregate merge order is nondeterministic, so a
    naive avg/corr over doubles is not bit-stable run to run (let alone
    across engines). Every moment here is quantized per-row (a
    deterministic IEEE product, then a deterministic cast to DECIMAL)
    and summed EXACTLY in decimal — associative and commutative, so
    map-side partials merge to identical results whatever the shuffle
    tree (the bigram-LM discipline, textops.py:172). The x origin is
    pinned (1995-01-01) to keep x*x inside exact-bigint range; at
    planet scale you would also center x per group first (documented
    trade, same algebra). Only the final slope/intercept/r2 arithmetic
    is double — the same expression shape in both engines, bit-identical
    from exact inputs."""
    e = _t(spark, sf_dir, "events").select(
        "event_type",
        (F.unix_timestamp("ts") - F.lit(788918400)).alias("x"),
        F.col("value").alias("y"),
    )
    m = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("x").cast("decimal(28,0)")).cast("double").alias("sx"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)"))
        .cast("double")
        .alias("sxx"),
        F.sum(F.col("y").cast("decimal(38,18)")).cast("double").alias("sy"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,18)"))
        .cast("double")
        .alias("syy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,18)"))
        .cast("double")
        .alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = num / den
    return m.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round(slope * 86400.0, 6).alias("slope_per_day"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
        F.round(
            num
            * num
            / (den * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))),
            6,
        ).alias("r2"),
    ).orderBy("event_type")


def _kmeans_iter_oracle(prev: str, out: str) -> str:
    """One exact-integer Lloyd iteration in SQL: centroid sums+counts,
    pivot to one row, then cross-multiplied rational argmin (see
    kmeans_lloyd_assign docstring for the overflow bound)."""
    pv = ", ".join(
        f"coalesce(max(CASE WHEN cid={c} THEN sx END), 0) sx{c},"
        f" coalesce(max(CASE WHEN cid={c} THEN sy END), 0) sy{c},"
        f" coalesce(max(CASE WHEN cid={c} THEN n END), 1) n{c}"
        for c in range(4)
    )
    arms = " UNION ALL ".join(
        f"SELECT {c} AS cid, sx{c} sx, sy{c} sy, n{c} n,"
        f" {'*'.join(f'n{k}' for k in range(4) if k != c)} q FROM pv_{out}"
        for c in range(4)
    )
    return f"""
    c_{out} AS (
      SELECT CAST(cid AS HUGEINT) cid, CAST(sum(x) AS HUGEINT) sx,
             CAST(sum(y) AS HUGEINT) sy, CAST(count(*) AS HUGEINT) n
      FROM {prev} GROUP BY 1),
    pv_{out} AS (SELECT {pv} FROM c_{out}),
    {out} AS (
      SELECT event_id, x, y, cid FROM (
        SELECT p.event_id, p.x, p.y, s.cid,
          row_number() OVER (PARTITION BY p.event_id ORDER BY
            ((s.n*p.x - s.sx)*(s.n*p.x - s.sx)
             + (s.n*p.y - s.sy)*(s.n*p.y - s.sy)) * s.q * s.q,
            s.cid) rn
        FROM p CROSS JOIN ({arms}) s
      ) WHERE rn = 1)"""


_KMEANS_ORACLE = f"""
    WITH p AS (
      SELECT event_id, CAST((event_id*37+11)%2000 AS HUGEINT) x,
             CAST((event_id*73+29)%2000 AS HUGEINT) y
      FROM events WHERE event_id % 4 = 0),
    seeds AS (SELECT * FROM (VALUES (0,500,500),(1,1500,500),
                                    (2,500,1500),(3,1500,1500))
              t(cid, cx, cy)),
    a1 AS (
      SELECT event_id, x, y, cid FROM (
        SELECT p.event_id, p.x, p.y, s.cid,
          row_number() OVER (PARTITION BY p.event_id ORDER BY
            (p.x-s.cx)*(p.x-s.cx)+(p.y-s.cy)*(p.y-s.cy), s.cid) rn
        FROM p CROSS JOIN seeds s) WHERE rn=1),
    {_kmeans_iter_oracle('a1', 'a2')},
    {_kmeans_iter_oracle('a2', 'a3')},
    sizes AS (SELECT cid, count(*) cn FROM a3 GROUP BY 1)
    SELECT a3.event_id, CAST(a3.cid AS BIGINT) AS cluster,
           CAST(s.cn AS BIGINT) AS cluster_n
    FROM a3 JOIN sizes s ON s.cid = a3.cid
    ORDER BY event_id
"""


@register_extra("kmeans_lloyd_assign", _KMEANS_ORACLE)
def kmeans_lloyd_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means (K=4, 3 assignment rounds, fixed quadrant seeds)
    as an EXACT-INTEGER dataflow, so the per-point cluster assignment
    itself is hash-gated — no float centroid ever exists on either
    engine. The trick: a rational centroid (sx/n, sy/n) never needs
    materializing; comparing squared distances to centroids j and k is
    exact after clearing denominators, and a SINGLE sortable key per
    arm falls out by scaling every arm to the common denominator
    (n0*n1*n2*n3)^2:

        val_j = ((n_j*px - sx_j)^2 + (n_j*py - sy_j)^2)
                * (prod_{k != j} n_k)^2

    Magnitude proof (why this is overflow-safe): the event_id % 4
    subsample bounds every cluster at n <= 2500 and coordinates at
    2000, so |n*p - s| <= 5e6, the distance numerator <= 5e13, the
    cross factor <= (2500^3)^2 = 2.4e20, and val <= 1.2e34 — inside
    both DuckDB's HUGEINT (1.7e38) and Spark's DECIMAL(38,0). Empty
    clusters pin (s, n) = (0, 1) on both engines (deterministic,
    documented; never hit with these seeds). Ties break on cluster id
    via lexicographic (val, cid) min on both engines.

    Scale shape per iteration: one 4-key partial agg (map-side
    combine) -> a ONE-ROW pivot broadcast back -> a pure-projection
    argmin via least() over four (val, cid) structs — zero Python,
    whole-stage codegen, no per-point shuffle at all; K iterations
    cost K scans (the canonical Lloyd dataflow, same as MLlib's, but
    bit-exact). tests/test_hull_snm.py's sibling test_kmeans fuzzes
    the whole pipeline against a Fraction-arithmetic reference."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pts = ev.filter(F.col("event_id") % 4 == 0).select(
        "event_id",
        ((F.col("event_id") * 37 + 11) % 2000).alias("x"),
        ((F.col("event_id") * 73 + 29) % 2000).alias("y"),
    )
    dec = "decimal(38,0)"

    seeds = [(0, 500, 500), (1, 1500, 500), (2, 500, 1500), (3, 1500, 1500)]
    arm0 = [
        F.struct(
            (
                (F.col("x") - cx) * (F.col("x") - cx)
                + (F.col("y") - cy) * (F.col("y") - cy)
            ).alias("val"),
            F.lit(cid).alias("cid"),
        )
        for cid, cx, cy in seeds
    ]
    assign = pts.withColumn("cid", F.least(*arm0)["cid"])

    for _ in range(2):
        cents = assign.groupBy("cid").agg(
            F.sum("x").alias("sx"), F.sum("y").alias("sy"),
            F.count("*").alias("n"),
        )
        pivot = cents.agg(
            *[
                agg
                for c in range(4)
                for agg in (
                    F.coalesce(
                        F.max(F.when(F.col("cid") == c, F.col("sx"))), F.lit(0)
                    ).cast(dec).alias(f"sx{c}"),
                    F.coalesce(
                        F.max(F.when(F.col("cid") == c, F.col("sy"))), F.lit(0)
                    ).cast(dec).alias(f"sy{c}"),
                    F.coalesce(
                        F.max(F.when(F.col("cid") == c, F.col("n"))), F.lit(1)
                    ).cast(dec).alias(f"n{c}"),
                )
            ]
        )
        j = pts.crossJoin(F.broadcast(pivot))
        arms = []
        for c in range(4):
            n, sx, sy = F.col(f"n{c}"), F.col(f"sx{c}"), F.col(f"sy{c}")
            px = F.col("x").cast(dec)
            py = F.col("y").cast(dec)
            q = F.lit(1).cast(dec)
            for k in range(4):
                if k != c:
                    q = q * F.col(f"n{k}")
            num = (n * px - sx) * (n * px - sx) + (n * py - sy) * (n * py - sy)
            arms.append(
                F.struct((num * q * q).alias("val"), F.lit(c).alias("cid"))
            )
        assign = j.select("event_id", "x", "y", F.least(*arms)["cid"].alias("cid"))

    sizes = assign.groupBy("cid").agg(F.count("*").alias("cluster_n"))
    return (
        assign.join(F.broadcast(sizes), "cid")
        .select(
            "event_id",
            F.col("cid").cast("bigint").alias("cluster"),
            F.col("cluster_n").cast("bigint"),
        )
        .orderBy("event_id")
    )


@register_extra(
    "decision_stump_train",
    """
    WITH d AS (
      SELECT length(text) AS v1,
             length(text) - length(replace(text, ' ', '')) AS v2,
             ('0x' || substr(md5('lbl:' || doc_id), 1, 7))::BIGINT % 2 AS y
      FROM documents
    ),
    long AS (
      SELECT 1 AS feat, v1 AS v, y FROM d
      UNION ALL
      SELECT 2 AS feat, v2 AS v, y FROM d
    ),
    h AS (
      SELECT feat, v, CAST(count(*) AS BIGINT) AS c,
             CAST(sum(y) AS BIGINT) AS pos
      FROM long GROUP BY 1, 2
    ),
    tot AS (
      SELECT feat, CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(pos) AS BIGINT) AS npos
      FROM h GROUP BY 1
    ),
    cum AS (
      SELECT feat, v,
             CAST(sum(c) OVER cw AS BIGINT) AS n_left,
             CAST(sum(pos) OVER cw AS BIGINT) AS pos_left
      FROM h
      WINDOW cw AS (PARTITION BY feat ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    crit AS (
      SELECT c.feat, c.v AS threshold, c.n_left, c.pos_left,
             t.n - c.n_left AS n_right, t.npos - c.pos_left AS pos_right,
             CAST((2 * (c.pos_left * (c.n_left - c.pos_left) * (t.n - c.n_left)
                   + (t.npos - c.pos_left)
                     * ((t.n - c.n_left) - (t.npos - c.pos_left))
                     * c.n_left) * 1000000)
                  // (c.n_left * (t.n - c.n_left)) AS BIGINT) AS gini_e6
      FROM cum c JOIN tot t USING (feat)
      WHERE c.n_left < t.n
    )
    SELECT CAST(feat AS INT) AS feat, CAST(threshold AS BIGINT) AS threshold,
           gini_e6, n_left, pos_left, n_right, pos_right
    FROM crit ORDER BY gini_e6, feat, threshold LIMIT 1
    """,
)
def decision_stump_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump training (the boosted-trees / CART split
    primitive) as a HISTOGRAM dataflow — the LightGBM trick: the fact
    table collapses map-side to per-(feature, value) (count, positive)
    partials, cumulative left/right class counts come from a window
    over the tiny histogram, and the best split minimizes the
    EXACT-INTEGER quantized weighted Gini

        gini_e6 = (2*(posL*negL*nR + posR*negR*nL) * 1e6) // (nL*nR)

    (constant-N factor dropped; |.| <= 2*2500^2*5000*2e6 ~ 1.25e17 <
    int64 at sf0.1), ties broken (feat, threshold) — both engines
    compute the identical integer, so the argmin row is hash-exact.
    Labels are md5-derived; features are doc length and space count.
    Split semantics: left = (v <= threshold), thresholds at observed
    values with the feature max excluded (empty right side)."""
    _, crit = _stump_frames(spark, sf_dir)
    return crit.orderBy("gini_e6", "feat", "threshold").limit(1).select(
        "feat", "threshold", "gini_e6", "n_left", "pos_left",
        "n_right", "pos_right",
    )


def _stump_frames(spark: SparkSession, sf_dir: str):
    """(features+label frame, per-candidate-split criterion frame) —
    shared by decision_stump_train and stump_eval_confusion."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    y = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("lbl:"), F.col("doc_id").cast("string")
                    ).cast("binary")
                ),
                1,
                7,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    d = docs.select(
        F.length("text").cast("long").alias("v1"),
        (
            F.length("text") - F.length(F.translate(F.col("text"), " ", ""))
        ).cast("long").alias("v2"),
        y.alias("y"),
    )
    long_df = d.select(F.lit(1).alias("feat"), F.col("v1").alias("v"), "y").unionByName(
        d.select(F.lit(2).alias("feat"), F.col("v2").alias("v"), "y")
    )
    h = long_df.groupBy("feat", "v").agg(
        F.count("*").alias("c"), F.sum("y").alias("pos")
    )
    tot = h.groupBy("feat").agg(
        F.sum("c").alias("n"), F.sum("pos").alias("npos")
    )
    cw = (
        Window.partitionBy("feat")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = h.select(
        "feat",
        "v",
        F.sum("c").over(cw).alias("n_left"),
        F.sum("pos").over(cw).alias("pos_left"),
    )
    crit = (
        cum.join(F.broadcast(tot), "feat")
        .filter(F.col("n_left") < F.col("n"))
        .select(
            F.col("feat").cast("int").alias("feat"),
            F.col("v").alias("threshold"),
            F.expr(
                "CAST((2 * (pos_left * (n_left - pos_left) * (n - n_left)"
                " + (npos - pos_left) * ((n - n_left) - (npos - pos_left))"
                " * n_left) * 1000000) DIV (n_left * (n - n_left)) AS BIGINT)"
            ).alias("gini_e6"),
            "n_left",
            "pos_left",
            (F.col("n") - F.col("n_left")).alias("n_right"),
            (F.col("npos") - F.col("pos_left")).alias("pos_right"),
        )
    )
    return d, crit


@register_extra(
    "chi2_feature_ranking",
    """
    WITH d AS (
      SELECT length(text) // 200 AS f1,
             (length(text) - length(replace(text, ' ', ''))) // 40 AS f2,
             (length(text) - length(replace(text, 'e', ''))) // 30 AS f3,
             ('0x' || substr(md5('lbl:' || doc_id), 1, 7))::BIGINT % 2 AS y
      FROM documents
    ),
    long AS (
      SELECT 1 AS feat, f1 AS bin, y FROM d
      UNION ALL SELECT 2, f2, y FROM d
      UNION ALL SELECT 3, f3, y FROM d
    ),
    h AS (
      SELECT feat, bin, CAST(count(*) AS BIGINT) AS nb,
             CAST(sum(y) AS BIGINT) AS pos
      FROM long GROUP BY 1, 2
    ),
    tot AS (
      SELECT feat, CAST(sum(nb) AS BIGINT) AS n,
             CAST(sum(pos) AS BIGINT) AS c1,
             CAST(sum(nb) - sum(pos) AS BIGINT) AS c0,
             CAST(count(*) AS BIGINT) AS n_bins
      FROM h GROUP BY 1
    ),
    terms AS (
      SELECT h.feat,
             (((h.nb - h.pos) * t.n - h.nb * t.c0)
              * ((h.nb - h.pos) * t.n - h.nb * t.c0) * 1000)
               // (t.n * h.nb * t.c0)
           + ((h.pos * t.n - h.nb * t.c1)
              * (h.pos * t.n - h.nb * t.c1) * 1000)
               // (t.n * h.nb * t.c1) AS term
      FROM h JOIN tot t USING (feat)
    )
    SELECT CAST(row_number() OVER (ORDER BY s.chi2_e3 DESC, s.feat) AS INT)
             AS rnk,
           CAST(s.feat AS INT) AS feat, s.chi2_e3, t.n_bins
    FROM (SELECT feat, CAST(sum(term) AS BIGINT) AS chi2_e3
          FROM terms GROUP BY 1) s
    JOIN tot t USING (feat)
    ORDER BY rnk
    """,
)
def chi2_feature_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square feature ranking (the classic filter-method feature
    selector) over binned document features vs an md5-derived label,
    as an EXACT-INTEGER dataflow: each (bin, class) cell contributes
    ((O*N - rowtot*classtot)^2 * 1000) // (N*rowtot*classtot) — the
    e-3 floor-quantized chi-square term (bounded 6.3e17 < int64 at
    sf0.1) — and missing-class cells need no outer join because cells
    derive from (bin count, bin positives). One map-side histogram
    shuffle per the stump discipline; the ranking window runs over 3
    rows. Both engines sum identical integers, so ranks and scores
    are hash-exact."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    y = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("lbl:"), F.col("doc_id").cast("string")
                    ).cast("binary")
                ),
                1,
                7,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    spaces = F.length("text") - F.length(F.translate(F.col("text"), " ", ""))
    ees = F.length("text") - F.length(F.translate(F.col("text"), "e", ""))
    d = docs.select(
        F.expr("length(text) div 200").alias("f1"),
        spaces.cast("long").alias("sp"),
        ees.cast("long").alias("ee"),
        y.alias("y"),
    ).select(
        "f1",
        F.expr("sp div 40").alias("f2"),
        F.expr("ee div 30").alias("f3"),
        "y",
    )
    long_df = (
        d.select(F.lit(1).alias("feat"), F.col("f1").alias("bin"), "y")
        .unionByName(d.select(F.lit(2).alias("feat"), F.col("f2").alias("bin"), "y"))
        .unionByName(d.select(F.lit(3).alias("feat"), F.col("f3").alias("bin"), "y"))
    )
    h = long_df.groupBy("feat", "bin").agg(
        F.count("*").alias("nb"), F.sum("y").alias("pos")
    )
    tot = h.groupBy("feat").agg(
        F.sum("nb").alias("n"),
        F.sum("pos").alias("c1"),
        (F.sum("nb") - F.sum("pos")).alias("c0"),
        F.count("*").alias("n_bins"),
    )
    terms = h.join(F.broadcast(tot), "feat").select(
        "feat",
        (
            F.expr(
                "((nb - pos) * n - nb * c0) * ((nb - pos) * n - nb * c0)"
                " * 1000 div (n * nb * c0)"
            )
            + F.expr(
                "(pos * n - nb * c1) * (pos * n - nb * c1)"
                " * 1000 div (n * nb * c1)"
            )
        ).alias("term"),
    )
    s = terms.groupBy("feat").agg(F.sum("term").alias("chi2_e3"))
    from pyspark.sql import Window

    rw = Window.orderBy(F.col("chi2_e3").desc(), "feat")
    return (
        s.join(tot.select("feat", "n_bins"), "feat")
        .select(
            F.row_number().over(rw).cast("int").alias("rnk"),
            F.col("feat").cast("int").alias("feat"),
            "chi2_e3",
            "n_bins",
        )
        .orderBy("rnk")
    )


# Benford expected first-digit masses, e-3 fixed point:
# round(log10(1 + 1/d) * 1000) for d = 1..9 (sums to exactly 1000)
_BENFORD_E3 = [(1, 301), (2, 176), (3, 125), (4, 97), (5, 79),
               (6, 67), (7, 58), (8, 51), (9, 46)]


@register_extra(
    "benford_digit_test",
    f"""
    WITH v AS (
      SELECT o_orderpriority AS grp,
             substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                    1, 1)::INT AS d
      FROM orders
    ),
    obs AS (SELECT grp, d, count(*) AS c FROM v GROUP BY 1, 2),
    tot AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n FROM obs GROUP BY 1),
    exp_ AS (SELECT * FROM (VALUES
      {", ".join(f"({d}, {p})" for d, p in _BENFORD_E3)}) AS t(d, p3)),
    cells AS (
      SELECT t.grp, e.d, e.p3, t.n, COALESCE(o.c, 0) AS c
      FROM tot t CROSS JOIN exp_ e
      LEFT JOIN obs o ON o.grp = t.grp AND o.d = e.d
    ),
    stat AS (
      SELECT grp,
             CAST(sum((c * 1000 - n * p3) * (c * 1000 - n * p3)
                      // (n * p3)) AS BIGINT) AS chi2_e3
      FROM cells GROUP BY 1
    ),
    top AS (
      SELECT grp, d AS top_digit, c AS top_cnt,
             row_number() OVER (PARTITION BY grp
                                ORDER BY c DESC, d) AS rn
      FROM cells
    )
    SELECT s.grp, t.n, s.chi2_e3,
           CAST(p.top_digit AS INT) AS top_digit, p.top_cnt
    FROM stat s JOIN tot t USING (grp)
    JOIN top p ON p.grp = s.grp AND p.rn = 1
    ORDER BY s.grp
    """,
)
def benford_digit_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit conformance test per order-
    priority class — the classic fraud/data-quality screen. The
    expected digit masses are shared e-3 literals (round(log10(1+1/d)
    *1000), summing to exactly 1000) and the goodness-of-fit statistic
    is the EXACT-INTEGER quantized chi-square
    sum((1000*obs - n*p3)^2 // (n*p3)) over all 9 digits (missing
    digits contribute their full expectation via the digit-dim outer
    join). First digit extracted from floor(price) through the string
    form — identical in both engines, no double-rounding trap (DuckDB
    CAST(DOUBLE AS BIGINT) rounds half-even while Spark truncates, so
    floor() first is load-bearing). Scale shape: one map-side
    histogram shuffle (45 cells max), everything after is dim-sized."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    v = orders.select(
        F.col("o_orderpriority").alias("grp"),
        F.substring(
            F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
        ).cast("int").alias("d"),
    )
    obs = v.groupBy("grp", "d").agg(F.count("*").alias("c"))
    tot = obs.groupBy("grp").agg(F.sum("c").alias("n"))
    exp_ = spark.createDataFrame(_BENFORD_E3, "d int, p3 long")
    cells = (
        tot.crossJoin(F.broadcast(exp_))
        .join(obs, ["grp", "d"], "left")
        .select(
            "grp", "d", "p3", "n", F.coalesce("c", F.lit(0)).alias("c")
        )
    )
    stat = cells.groupBy("grp").agg(
        F.sum(
            F.expr(
                "(c * 1000 - n * p3) * (c * 1000 - n * p3) div (n * p3)"
            )
        ).alias("chi2_e3")
    )
    from pyspark.sql import Window

    rw = Window.partitionBy("grp").orderBy(F.col("c").desc(), "d")
    top = (
        cells.select(
            "grp",
            F.col("d").alias("top_digit"),
            F.col("c").alias("top_cnt"),
            F.row_number().over(rw).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return (
        stat.join(tot, "grp")
        .join(top, "grp")
        .select("grp", "n", "chi2_e3", "top_digit", "top_cnt")
        .orderBy("grp")
    )


@register_extra(
    "stump_eval_confusion",
    """
    WITH d AS (
      SELECT length(text) AS v1,
             length(text) - length(replace(text, ' ', '')) AS v2,
             ('0x' || substr(md5('lbl:' || doc_id), 1, 7))::BIGINT % 2 AS y
      FROM documents
    ),
    long AS (
      SELECT 1 AS feat, v1 AS v, y FROM d
      UNION ALL
      SELECT 2 AS feat, v2 AS v, y FROM d
    ),
    h AS (
      SELECT feat, v, CAST(count(*) AS BIGINT) AS c,
             CAST(sum(y) AS BIGINT) AS pos
      FROM long GROUP BY 1, 2
    ),
    tot AS (
      SELECT feat, CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(pos) AS BIGINT) AS npos
      FROM h GROUP BY 1
    ),
    cum AS (
      SELECT feat, v,
             CAST(sum(c) OVER cw AS BIGINT) AS n_left,
             CAST(sum(pos) OVER cw AS BIGINT) AS pos_left
      FROM h
      WINDOW cw AS (PARTITION BY feat ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    crit AS (
      SELECT c.feat, c.v AS threshold, c.n_left, c.pos_left,
             t.n - c.n_left AS n_right, t.npos - c.pos_left AS pos_right,
             CAST((2 * (c.pos_left * (c.n_left - c.pos_left) * (t.n - c.n_left)
                   + (t.npos - c.pos_left)
                     * ((t.n - c.n_left) - (t.npos - c.pos_left))
                     * c.n_left) * 1000000)
                  // (c.n_left * (t.n - c.n_left)) AS BIGINT) AS gini_e6
      FROM cum c JOIN tot t USING (feat)
      WHERE c.n_left < t.n
    ),
    lab AS (
      SELECT feat, threshold,
             CASE WHEN 2 * pos_left > n_left THEN 1 ELSE 0 END AS ml,
             CASE WHEN 2 * pos_right > n_right THEN 1 ELSE 0 END AS mr
      FROM crit ORDER BY gini_e6, feat, threshold LIMIT 1
    ),
    pred AS (
      SELECT d.y,
             CASE WHEN (CASE WHEN l.feat = 1 THEN d.v1 ELSE d.v2 END)
                       <= l.threshold
                  THEN l.ml ELSE l.mr END AS p
      FROM d CROSS JOIN lab l
    ),
    cm AS (
      SELECT count(*) FILTER (WHERE y = 1 AND p = 1) AS tp,
             count(*) FILTER (WHERE y = 0 AND p = 1) AS fp,
             count(*) FILTER (WHERE y = 1 AND p = 0) AS fneg,
             count(*) FILTER (WHERE y = 0 AND p = 0) AS tn
      FROM pred
    )
    SELECT CAST(l.feat AS INT) AS feat, CAST(l.threshold AS BIGINT)
             AS threshold, tp, fp, fneg AS fn, tn,
           CAST((tp + tn) * 1000000 // (tp + fp + fneg + tn) AS BIGINT)
             AS acc_e6,
           CAST(CASE WHEN tp + fp = 0 THEN -1
                     ELSE tp * 1000000 // (tp + fp) END AS BIGINT)
             AS prec_e6,
           CAST(2 * tp * 1000000 // (2 * tp + fp + fneg) AS BIGINT)
             AS f1_e6
    FROM cm CROSS JOIN lab l
    """,
)
def stump_eval_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model evaluation for the trained decision stump: apply the
    winning split as a majority-vote classifier (side label = majority
    class of that side, ties -> 0) to the full set and report the
    confusion matrix plus accuracy / precision / F1 in EXACT e-6
    integers (floor division; precision is -1 when nothing is
    predicted positive — same guard both engines). Scale shape: the
    trained split is a 1-row broadcast; application + confusion is one
    map-side pass over the fact table and a single global agg — the
    train/serve split a production evaluator uses."""
    d, crit = _stump_frames(spark, sf_dir)
    lab = (
        crit.orderBy("gini_e6", "feat", "threshold")
        .limit(1)
        .select(
            "feat",
            "threshold",
            F.when(2 * F.col("pos_left") > F.col("n_left"), 1)
            .otherwise(0)
            .alias("ml"),
            F.when(2 * F.col("pos_right") > F.col("n_right"), 1)
            .otherwise(0)
            .alias("mr"),
        )
    )
    pred = d.crossJoin(F.broadcast(lab)).select(
        "feat",
        "threshold",
        "y",
        F.when(
            F.when(F.col("feat") == 1, F.col("v1")).otherwise(F.col("v2"))
            <= F.col("threshold"),
            F.col("ml"),
        )
        .otherwise(F.col("mr"))
        .alias("p"),
    )
    cm = pred.groupBy("feat", "threshold").agg(
        F.count(F.when((F.col("y") == 1) & (F.col("p") == 1), 1)).alias("tp"),
        F.count(F.when((F.col("y") == 0) & (F.col("p") == 1), 1)).alias("fp"),
        F.count(F.when((F.col("y") == 1) & (F.col("p") == 0), 1)).alias("fneg"),
        F.count(F.when((F.col("y") == 0) & (F.col("p") == 0), 1)).alias("tn"),
    )
    return cm.select(
        F.col("feat").cast("int").alias("feat"),
        "threshold",
        "tp",
        "fp",
        F.col("fneg").alias("fn"),
        "tn",
        F.expr("(tp + tn) * 1000000 div (tp + fp + fneg + tn)").alias(
            "acc_e6"
        ),
        F.expr(
            "CASE WHEN tp + fp = 0 THEN CAST(-1 AS BIGINT)"
            " ELSE tp * 1000000 div (tp + fp) END"
        ).alias("prec_e6"),
        F.expr("2 * tp * 1000000 div (2 * tp + fp + fneg)").alias("f1_e6"),
    )


def _luhn_oracle() -> str:
    digits = ",\n".join(
        f"             CAST(substr(pan, {i + 1}, 1) AS INT) AS d{i}"
        for i in range(16)
    )
    total = " + ".join(
        (
            f"(CASE WHEN d{i} > 4 THEN 2*d{i} - 9 ELSE 2*d{i} END)"
            if i % 2 == 0
            else f"d{i}"
        )
        for i in range(16)
    )
    return f"""
    WITH pan AS (
      SELECT doc_id, source,
             lpad(CAST(('0x' || substr(md5('pan1:' || doc_id), 1, 7))::BIGINT
                       % 100000000 AS VARCHAR), 8, '0')
          || lpad(CAST(('0x' || substr(md5('pan2:' || doc_id), 1, 7))::BIGINT
                       % 100000000 AS VARCHAR), 8, '0') AS pan
      FROM documents
    ),
    dg AS (
      SELECT doc_id, source,
{digits}
      FROM pan
    ),
    s AS (SELECT doc_id, source, {total} AS total FROM dg)
    SELECT source, count(*) AS n_docs,
           count(*) FILTER (WHERE total % 10 = 0) AS n_valid,
           CAST(count(*) FILTER (WHERE total % 10 = 0) * 10000
                // count(*) AS BIGINT) AS valid_rate_e4
    FROM s GROUP BY 1 ORDER BY 1
    """


@register_extra("luhn_checksum_audit", _luhn_oracle())
def luhn_checksum_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn (mod-10) checksum validation — the second half of a PII
    scan: a 16-digit sequence is only a plausible card number if its
    Luhn check passes, and filtering on it cuts the false-positive
    rate of pure regex detection ~10x (random digit strings pass ~10%
    of the time — visible in the gated valid_rate_e4). Candidate
    strings are md5-derived per doc (no real PANs anywhere). The whole
    validator is PURE CATALYST COLUMN ALGEBRA — sixteen substring
    casts and the doubled-digit CASE ladder, unrolled in a loop, so it
    runs inside whole-stage codegen with zero Python on the hot path;
    the oracle unrolls the identical ladder in SQL."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def md8(tag):
        return F.lpad(
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit(tag), F.col("doc_id").cast("string")
                            ).cast("binary")
                        ),
                        1,
                        7,
                    ),
                    16,
                    10,
                ).cast("long")
                % 100000000
            ).cast("string"),
            8,
            "0",
        )
    pan = docs.select(
        "source", F.concat(md8("pan1:"), md8("pan2:")).alias("pan")
    )
    total = None
    for i in range(16):
        d = F.substring(F.col("pan"), i + 1, 1).cast("int")
        term = (
            F.when(d > 4, 2 * d - 9).otherwise(2 * d) if i % 2 == 0 else d
        )
        total = term if total is None else total + term
    s = pan.select("source", total.alias("total"))
    return (
        s.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.count(F.when(F.col("total") % 10 == 0, 1)).alias("n_valid"),
        )
        .select(
            "source",
            "n_docs",
            "n_valid",
            F.expr("n_valid * 10000 div n_docs").alias("valid_rate_e4"),
        )
        .orderBy("source")
    )


@register_extra(
    "seq_bigram_patterns",
    """
    WITH s AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    ),
    ub AS (
      SELECT DISTINCT user_id, prev AS a, event_type AS b
      FROM s WHERE prev IS NOT NULL
    ),
    n AS (SELECT (count(DISTINCT user_id) + 3) // 4 AS minsup FROM ub)
    SELECT a, b, count(*) AS n_users
    FROM ub CROSS JOIN n
    GROUP BY a, b, minsup HAVING count(*) >= minsup
    ORDER BY a, b
    """,
)
def seq_bigram_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern mining (PrefixSpan's length-2 core): event-
    type bigrams that occur CONSECUTIVELY in at least a quarter of
    user journeys — the ordered complement to frequent_item_pairs'
    unordered baskets. Support counts DISTINCT users (a user repeating
    a transition counts once — the sequence-mining convention), and
    minsup derives in-plan from a broadcast 1-row aggregate. Scale
    shape: one lag window on the journey key, a distinct collapse to
    (user, a, b) — bounded by users x types^2 — then a types^2-bounded
    partial agg. Integer end-to-end."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id",
        F.col("event_type").alias("b"),
        F.lag("event_type").over(w).alias("a"),
    ).filter(F.col("a").isNotNull())
    ub = s.select("user_id", "a", "b").distinct()
    n = ub.agg(
        F.expr("(count(DISTINCT user_id) + 3) div 4").alias("minsup")
    )
    return (
        ub.crossJoin(F.broadcast(n))
        .groupBy("a", "b", "minsup")
        .agg(F.count("*").alias("n_users"))
        .filter(F.col("n_users") >= F.col("minsup"))
        .select("a", "b", "n_users")
        .orderBy("a", "b")
    )


@register_extra(
    "poisson_bootstrap_ci",
    """
    WITH e AS (
      SELECT event_type, event_id,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    base AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(cents) AS BIGINT) AS base_sum
      FROM e GROUP BY 1
    ),
    rep AS (
      SELECT e.event_type, b.range AS b,
             CAST(sum(CASE
               WHEN ('0x' || substr(md5('bs:' || b.range || ':'
                     || e.event_id), 1, 7))::BIGINT % 100 < 37 THEN 0
               WHEN ('0x' || substr(md5('bs:' || b.range || ':'
                     || e.event_id), 1, 7))::BIGINT % 100 < 74
                 THEN e.cents
               ELSE 2 * e.cents END) AS BIGINT) AS s
      FROM e CROSS JOIN range(32) b
      GROUP BY 1, 2
    ),
    rk AS (
      SELECT event_type, s,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY s, b) AS rn
      FROM rep
    )
    SELECT b.event_type, b.n_rows, b.base_sum,
           CAST(max(CASE WHEN rk.rn = 2 THEN rk.s END) AS BIGINT)
             AS boot_lo,
           CAST(max(CASE WHEN rk.rn = 31 THEN rk.s END) AS BIGINT)
             AS boot_hi
    FROM base b JOIN rk USING (event_type)
    GROUP BY 1, 2, 3 ORDER BY 1
    """,
)
def poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap confidence band for per-type revenue — THE
    at-scale bootstrap: instead of resampling (impossible without a
    global shuffle per replicate), every row draws a deterministic
    md5-derived weight {0, 1, 2} (P = .37/.37/.26, the Poisson(1)
    discretization) for each of 32 replicates, so ALL replicates
    accumulate in ONE pass with map-side combine on the (type,
    replicate) key — 32x fan-out in the expression, not the shuffle.
    Reported band = 2nd/31st ranked replicate sums (~5th/95th pct),
    exact integers (ties broken by replicate id identically in both
    engines)."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    e = ev.select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    base = e.groupBy("event_type").agg(
        F.count("*").alias("n_rows"), F.sum("cents").alias("base_sum")
    )
    rep = (
        e.select(
            "event_type",
            "cents",
            "event_id",
            F.explode(F.sequence(F.lit(0), F.lit(31))).alias("b"),
        )
        .select(
            "event_type",
            "b",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("bs:"),
                                F.col("b").cast("string"),
                                F.lit(":"),
                                F.col("event_id").cast("string"),
                            ).cast("binary")
                        ),
                        1,
                        7,
                    ),
                    16,
                    10,
                ).cast("long")
                % 100
            ).alias("h"),
            "cents",
        )
        .select(
            "event_type",
            "b",
            F.when(F.col("h") < 37, 0)
            .when(F.col("h") < 74, F.col("cents"))
            .otherwise(2 * F.col("cents"))
            .alias("wc"),
        )
        .groupBy("event_type", "b")
        .agg(F.sum("wc").alias("s"))
    )
    rw = Window.partitionBy("event_type").orderBy("s", "b")
    rk = rep.select("event_type", "s", F.row_number().over(rw).alias("rn"))
    return (
        base.join(rk, "event_type")
        .groupBy("event_type", "n_rows", "base_sum")
        .agg(
            F.max(F.when(F.col("rn") == 2, F.col("s"))).alias("boot_lo"),
            F.max(F.when(F.col("rn") == 31, F.col("s"))).alias("boot_hi"),
        )
        .orderBy("event_type")
    )


@register_extra(
    "kendall_tau_rankings",
    """
    WITH d AS (
      SELECT doc_id, length(text) AS v1,
             length(text) - length(replace(text, ' ', '')) AS v2
      FROM documents WHERE doc_id % 5 = 0
    ),
    r AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY v1, doc_id) AS rx,
             row_number() OVER (ORDER BY v2, doc_id) AS ry,
             v1, v2
      FROM d
    ),
    p AS (
      SELECT (a.v1 - b.v1) AS dx, (a.v2 - b.v2) AS dy
      FROM d a JOIN d b ON b.doc_id > a.doc_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(*) FILTER (WHERE dx * dy > 0) AS BIGINT)
             AS n_concordant,
           CAST(count(*) FILTER (WHERE dx * dy < 0) AS BIGINT)
             AS n_discordant,
           CAST(count(*) FILTER (WHERE dx = 0 OR dy = 0) AS BIGINT)
             AS n_tied,
           CAST(count(*) FILTER (WHERE dx * dy > 0)
                - count(*) FILTER (WHERE dx * dy < 0) AS BIGINT)
             AS tau_numerator
    FROM p
    """,
)
def kendall_tau_rankings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall rank concordance between two document orderings (length
    vs space count) — the nonparametric rank-agreement statistic used
    to compare ranking functions (retrieval models, quality scores):
    concordant / discordant / tied pair counts and the exact tau
    numerator, all integers (the sqrt-normalized tau itself needs
    irrational denominators — the hash gates the decision-relevant
    numerator, same policy as assortativity). Spark evaluates sign
    products on the sampled pair join; the docstring records the at-
    scale alternative (inversion counting via distributed merge sort,
    O(n log n)) — the quadratic form here IS the definition, kept
    verifiable on the 1-in-5 sample."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") % 5 == 0
    )
    d = docs.select(
        "doc_id",
        F.length("text").cast("long").alias("v1"),
        (
            F.length("text") - F.length(F.translate(F.col("text"), " ", ""))
        ).cast("long").alias("v2"),
    )
    a = d.select(
        F.col("doc_id").alias("ida"),
        F.col("v1").alias("xa"),
        F.col("v2").alias("ya"),
    )
    b = d.select(
        F.col("doc_id").alias("idb"),
        F.col("v1").alias("xb"),
        F.col("v2").alias("yb"),
    )
    p = a.crossJoin(b).filter(F.col("idb") > F.col("ida")).select(
        ((F.col("xa") - F.col("xb")) * (F.col("ya") - F.col("yb"))).alias(
            "s"
        ),
        (F.col("xa") - F.col("xb")).alias("dx"),
        (F.col("ya") - F.col("yb")).alias("dy"),
    )
    return p.groupBy().agg(
        F.count("*").alias("n_pairs"),
        F.count(F.when(F.col("s") > 0, 1)).alias("n_concordant"),
        F.count(F.when(F.col("s") < 0, 1)).alias("n_discordant"),
        F.count(
            F.when((F.col("dx") == 0) | (F.col("dy") == 0), 1)
        ).alias("n_tied"),
        (
            F.count(F.when(F.col("s") > 0, 1))
            - F.count(F.when(F.col("s") < 0, 1))
        ).alias("tau_numerator"),
    )


def _method_agreement_oracle() -> str:
    from .media_queries import _minhash_oracle, _simhash64_oracle

    return f"""
    WITH mh AS (SELECT id_a, id_b FROM ({_minhash_oracle()})),
    sh AS (SELECT id_a, id_b FROM ({_simhash64_oracle()})),
    i AS (SELECT id_a, id_b FROM mh INTERSECT SELECT id_a, id_b FROM sh)
    SELECT (SELECT count(*) FROM mh) AS n_minhash,
           (SELECT count(*) FROM sh) AS n_simhash,
           (SELECT count(*) FROM i) AS n_both,
           CAST((SELECT count(*) FROM i) * 10000
                // ((SELECT count(*) FROM mh) + (SELECT count(*) FROM sh)
                    - (SELECT count(*) FROM i)) AS BIGINT)
             AS agreement_jaccard_e4
    """


@register_extra("dedup_method_agreement", _method_agreement_oracle())
def dedup_method_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Method-agreement audit between the two near-dup candidate
    generators (MinHash-LSH Jaccard >= 0.7 vs 64-bit SimHash Hamming
    <= 4) on the SAME injected-duplicate corpus: pair-set sizes,
    intersection, and the e-4 Jaccard of the pair SETS — the
    measurement a dedup pipeline owner runs before swapping methods
    (disagreement = documents one family would delete and the other
    keep). Reuses the two gated operators end-to-end; the oracle
    nests both full pipeline replications as subqueries and
    INTERSECTs. Scale shape: both generators are banded (no
    all-pairs); the comparison itself is a pair-key join over the two
    small candidate sets."""
    from ..operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    dups = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extraword")).alias("text"),
    )
    corpus = docs.unionByName(dups).localCheckpoint(eager=True)
    mh = dedup.minhash_lsh_pairs(corpus, threshold=0.7).select(
        "id_a", "id_b"
    )
    sh = dedup.simhash_near_pairs(corpus, max_hamming=4).select(
        "id_a", "id_b"
    )
    both = mh.join(sh, ["id_a", "id_b"], "left_semi")
    return (
        mh.groupBy()
        .agg(F.count("*").alias("n_minhash"))
        .crossJoin(sh.groupBy().agg(F.count("*").alias("n_simhash")))
        .crossJoin(both.groupBy().agg(F.count("*").alias("n_both")))
        .select(
            "n_minhash",
            "n_simhash",
            "n_both",
            F.expr(
                "n_both * 10000 div (n_minhash + n_simhash - n_both)"
            ).alias("agreement_jaccard_e4"),
        )
    )


@register_extra(
    "association_rules_lift",
    """
    WITH b AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey % 200 AS item
      FROM lineitem
    ),
    n AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS nb FROM b),
    s1 AS (SELECT item, CAST(count(*) AS BIGINT) AS s FROM b GROUP BY 1),
    pr AS (
      SELECT a.item AS ia, c.item AS ib, CAST(count(*) AS BIGINT) AS sab
      FROM b a JOIN b c ON c.ok = a.ok AND c.item <> a.item
      GROUP BY 1, 2 HAVING count(*) >= 3
    )
    SELECT pr.ia AS antecedent, pr.ib AS consequent, pr.sab AS support,
           CAST(pr.sab * 10000 // sa.s AS BIGINT) AS confidence_e4,
           CAST(pr.sab * n.nb * 1000000 // (sa.s * sb.s) AS BIGINT)
             AS lift_e6
    FROM pr
    JOIN s1 sa ON sa.item = pr.ia
    JOIN s1 sb ON sb.item = pr.ib
    CROSS JOIN n
    ORDER BY 1, 2
    """,
)
def association_rules_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association RULES (the step after frequent itemsets): for every
    ordered item pair co-occurring in >= 3 orders, the directional
    confidence (e-4: support(a,b)/support(a)) and the lift (e-6:
    support(a,b)*N / (support(a)*support(b))) — both exact floor-
    quantized integers, so rule ranking is hash-stable. Baskets are
    orders over the 200-bucket part vocabulary. Scale shape: the pair
    join is keyed by the basket id and bounded by basket size (TPC-H
    orders hold <= 7 lines), the single-item supports broadcast back
    as a dim, and the minsup filter runs inside the pair aggregation —
    the classic two-pass A-Priori dataflow with rule scoring fused."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    b = li.select(
        F.col("l_orderkey").alias("ok"),
        (F.col("l_partkey") % 200).alias("item"),
    ).distinct()
    n = b.agg(F.countDistinct("ok").alias("nb"))
    s1 = b.groupBy("item").agg(F.count("*").alias("s"))
    a = b.select("ok", F.col("item").alias("ia"))
    c = b.select("ok", F.col("item").alias("ib"))
    pr = (
        a.join(c, "ok")
        .filter(F.col("ib") != F.col("ia"))
        .groupBy("ia", "ib")
        .agg(F.count("*").alias("sab"))
        .filter(F.col("sab") >= 3)
    )
    return (
        pr.join(
            F.broadcast(
                s1.select(F.col("item").alias("ia"), F.col("s").alias("sa"))
            ),
            "ia",
        )
        .join(
            F.broadcast(
                s1.select(F.col("item").alias("ib"), F.col("s").alias("sb"))
            ),
            "ib",
        )
        .crossJoin(F.broadcast(n))
        .select(
            F.col("ia").alias("antecedent"),
            F.col("ib").alias("consequent"),
            F.col("sab").alias("support"),
            F.expr("sab * 10000 div sa").alias("confidence_e4"),
            F.expr("sab * nb * 1000000 div (sa * sb)").alias("lift_e6"),
        )
        .orderBy("antecedent", "consequent")
    )


@register_extra(
    "pseudonym_collision_audit",
    """
    WITH k AS (SELECT DISTINCT c_custkey AS key FROM customer),
    w AS (SELECT unnest([3, 4, 5, 6]) AS width),
    tok AS (
      SELECT w.width, k.key,
             substr(md5('pseud:' || k.key), 1, w.width) AS token
      FROM k CROSS JOIN w
    ),
    tc AS (
      SELECT width, token, count(*) AS nk
      FROM tok GROUP BY 1, 2
    )
    SELECT CAST(width AS INT) AS width,
           CAST(sum(nk) AS BIGINT) AS n_keys,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(COALESCE(sum(nk) FILTER (WHERE nk > 1), 0) AS BIGINT)
             AS n_keys_colliding
    FROM tc GROUP BY 1 ORDER BY 1
    """,
)
def pseudonym_collision_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudonymization token-width audit — the privacy-engineering
    sizing question: how many hex characters of a keyed hash does a
    pseudonym need before collisions (two people sharing a token —
    both a correctness bug and a k-anonymity leak in reverse) stop?
    Measures the birthday bound EMPIRICALLY per width 3..6: distinct
    keys, distinct tokens, and keys whose token is shared. Scale
    shape: one (width x token) partial agg over the key dim crossed
    with the 4-row width dim; everything integer and md5-derived, so
    the collision counts are hash-gated facts, not estimates."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    k = cust.select(F.col("c_custkey").alias("key")).distinct()
    w = spark.createDataFrame([(3,), (4,), (5,), (6,)], "width int")
    tok = k.crossJoin(F.broadcast(w)).select(
        "width",
        "key",
        F.expr(
            "substring(md5(CAST('pseud:' || CAST(key AS STRING) AS BINARY)),"
            " 1, width)"
        ).alias("token"),
    )
    tc = tok.groupBy("width", "token").agg(F.count("*").alias("nk"))
    return (
        tc.groupBy("width")
        .agg(
            F.sum("nk").alias("n_keys"),
            F.count("*").alias("n_tokens"),
            F.coalesce(
                F.sum(F.when(F.col("nk") > 1, F.col("nk"))), F.lit(0)
            ).alias("n_keys_colliding"),
        )
        .orderBy("width")
    )


# ------------------------------------------------ priority sampling

_PS_K = 5  # sample size per stratum


@register_extra(
    "priority_sample_topk",
    f"""
    WITH w AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS w_cents,
             ('0x' || substr(md5('ps:' || CAST(o_orderkey AS VARCHAR)),
                             1, 8))::BIGINT AS h32
      FROM orders
    ),
    q AS (
      SELECT o_orderkey, o_orderpriority, w_cents,
             (w_cents * 4294967296) // (h32 + 1) AS q
      FROM w
    ),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY o_orderpriority
                                   ORDER BY q DESC, o_orderkey) AS rk
      FROM q
    )
    SELECT o_orderpriority, CAST(rk AS INT) AS rk, o_orderkey, w_cents, q
    FROM r WHERE rk <= {_PS_K}
    ORDER BY o_orderpriority, rk
    """,
)
def priority_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Duffield-Lund-Thorup priority sampling): each order draws priority
    q = floor(w * 2^32 / (h+1)) with w = integer cents of o_totalprice
    and h a 32-bit md5 hash of the key — an EXACT-integer surrogate for
    w/u, u~U(0,1), so the top-k per o_orderpriority stratum is the
    inclusion-probability-proportional-to-size sample a training-data
    mixer uses, reproducible across engines with zero float ranking
    risk (the classic Efraimidis-Spirakis u^(1/w) key is float and
    ulp-unstable across engines; the integer quotient is not). Scale:
    one map + one top-k window per stratum, no candidate blowup;
    w*2^32 <= ~2.1e17 stays int64."""
    o = _t(spark, sf_dir, "orders")
    w = o.select(
        "o_orderkey",
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100 + 0.5)
        .cast("long")
        .alias("w_cents"),
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("ps:"), F.col("o_orderkey").cast("string")
                    ).cast("binary")
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("h32"),
    )
    # `div` is exact 64-bit integral division — quotients reach ~2.1e17
    # (> 2^53), where double `/` + floor would round off low bits and
    # diverge from the oracle's BIGINT `//`.
    q = w.withColumn(
        "q", F.expr("(w_cents * 4294967296L) div (h32 + 1)")
    )
    win = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("q"), F.asc("o_orderkey")
    )
    return (
        q.withColumn("rk", F.row_number().over(win).cast("int"))
        .filter(F.col("rk") <= _PS_K)
        .select("o_orderpriority", "rk", "o_orderkey", "w_cents", "q")
        .orderBy("o_orderpriority", "rk")
    )


# ------------------------------------------------------------- LIS


@register_extra(
    "lis_length_distribution",
    """
    WITH RECURSIVE pos AS (
      SELECT user_id,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    chain(user_id, rn, v, l) AS (
      SELECT user_id, rn, v, 1 FROM pos
      UNION
      SELECT b.user_id, b.rn, b.v, c.l + 1
      FROM chain c JOIN pos b
        ON b.user_id = c.user_id AND b.rn > c.rn AND b.v > c.v
    ),
    lis AS (SELECT user_id, max(l) AS lis_len FROM chain GROUP BY 1)
    SELECT CAST(lis_len AS INT) AS lis_len,
           count(*) AS n_users
    FROM lis GROUP BY 1 ORDER BY lis_len
    """,
)
def lis_length_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest strictly-increasing subsequence of each user's value
    stream (cents, event-time order with event_id tie-break), reported
    as the LIS-length histogram — the sequence-complexity probe used
    for bot/replay detection (monotone streams are machines). Spark
    runs the O(n log n) patience-sorting DP per user via
    applyInPandas — per-group state never leaves one task, the
    canonical distributed-sequence-DP shape; the oracle is the
    INDEPENDENT textbook formulation: a recursive chain-extension
    closure with UNION dedup (exponential chains collapse to <= n*L
    states). Exact integers throughout."""
    import bisect

    import pandas as pd

    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("v"),
    )

    def _lis(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        tails: list[int] = []
        for v in pdf["v"]:
            i = bisect.bisect_left(tails, v)
            if i == len(tails):
                tails.append(v)
            else:
                tails[i] = v
        return pd.DataFrame(
            {"user_id": [pdf["user_id"].iloc[0]], "lis_len": [len(tails)]}
        )

    lis = base.groupBy("user_id").applyInPandas(
        _lis, "user_id long, lis_len int"
    )
    return (
        lis.groupBy("lis_len")
        .agg(F.count("*").alias("n_users"))
        .orderBy("lis_len")
    )


# ----------------------------------------------------- motif pairs

_MOTIF_W = 3  # window length; pairs must not overlap (j >= i + W)


@register_extra(
    "motif_min_distance",
    f"""
    WITH pos AS (
      SELECT user_id,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS i
      FROM events
    ),
    w AS (
      SELECT user_id, i, v AS a,
             lead(v, 1) OVER win AS b, lead(v, 2) OVER win AS c
      FROM pos WINDOW win AS (PARTITION BY user_id ORDER BY i)
    ),
    ww AS (SELECT * FROM w WHERE c IS NOT NULL),
    d AS (
      SELECT x.user_id, x.i AS i, y.i AS j,
             (x.a-y.a)*(x.a-y.a) + (x.b-y.b)*(x.b-y.b)
           + (x.c-y.c)*(x.c-y.c) AS d
      FROM ww x JOIN ww y
        ON y.user_id = x.user_id AND y.i >= x.i + {_MOTIF_W}
    ),
    best AS (
      SELECT user_id, i, j, d,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY d, i, j) AS rn
      FROM d
    )
    SELECT b.user_id,
           (SELECT count(*) FROM ww WHERE ww.user_id = b.user_id)
             AS n_windows,
           b.d AS min_d, CAST(b.i AS INT) AS i, CAST(b.j AS INT) AS j
    FROM best b WHERE rn = 1 ORDER BY user_id
    """,
)
def motif_min_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series motif discovery (the matrix-profile primitive): per
    user, the closest pair of NON-overlapping length-3 subsequences of
    the cents value stream under squared Euclidean distance (tie ->
    smallest window indices) — the repeated-behavior detector behind
    replay/bot forensics. Exact integers. Spark runs the all-pair scan
    vectorized per user inside applyInPandas (per-key state in one
    task, the distributed matrix-profile shape); the oracle derives
    windows with lead() and takes the argmin over an inequality
    self-join — window-function vs join derivations."""
    import pandas as pd

    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "user_id", "ts", "event_id",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("v"),
    )

    def _motif(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(["ts", "event_id"])
        v = pdf["v"].to_numpy()
        nw = len(v) - _MOTIF_W + 1
        if nw < _MOTIF_W + 1:
            return pd.DataFrame(
                columns=["user_id", "n_windows", "min_d", "i", "j"]
            ).astype(
                {"user_id": "int64", "n_windows": "int64",
                 "min_d": "int64", "i": "int32", "j": "int32"}
            )
        wins = np.stack([v[k : k + nw] for k in range(_MOTIF_W)], axis=1)
        best = None
        for ii in range(nw):
            jj = np.arange(ii + _MOTIF_W, nw)
            if len(jj) == 0:
                continue
            dd = ((wins[jj] - wins[ii]) ** 2).sum(axis=1)
            k = int(dd.argmin())
            cand = (int(dd[k]), ii + 1, int(jj[k]) + 1)
            if best is None or cand < best:
                best = cand
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_windows": [nw],
                "min_d": [best[0]],
                "i": [best[1]],
                "j": [best[2]],
            }
        )

    out = base.groupBy("user_id").applyInPandas(
        _motif, "user_id long, n_windows long, min_d long, i int, j int"
    )
    return out.orderBy("user_id")


# ---------------------------------------------- sequence patterns


_SEQ_PATTERN = "s[cv]*p"  # signup, then clicks/views, then purchase


@register_extra(
    "event_pattern_matches",
    f"""
    WITH seq AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
               AS s
      FROM events GROUP BY 1
    )
    SELECT user_id,
           CAST(length(s) AS BIGINT) AS seq_len,
           CAST(len(regexp_extract_all(s, '{_SEQ_PATTERN}')) AS BIGINT)
             AS n_matches
    FROM seq ORDER BY user_id
    """,
)
def event_pattern_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style row-pattern matching: encode each user's
    event-time-ordered type stream as a symbol string (first letter:
    c/e/p/s/v) and count non-overlapping matches of the funnel pattern
    's[cv]*p' (signup, any clicks/views, purchase) — SQL:2016 row
    pattern semantics compiled to a regex over the per-key symbol
    sequence, the standard trick for running MATCH_RECOGNIZE on
    engines that lack it. Leftmost non-overlapping greedy matching is
    identical in Java regex and RE2 for this star-free-of-ambiguity
    pattern. Scale shape: one ordered string_agg per key (the sequence
    fits because symbols are 1 byte/event), then a pure map-side
    regexp count."""
    ev = _t(spark, sf_dir, "events")
    seq = ev.groupBy("user_id").agg(
        F.concat_ws(
            "",
            F.expr(
                "transform(sort_array(collect_list(struct(ts, event_id,"
                " substring(event_type, 1, 1) as ch))), x -> x.ch)"
            ),
        ).alias("s")
    )
    return seq.select(
        "user_id",
        F.length("s").cast("long").alias("seq_len"),
        F.regexp_count(F.col("s"), F.lit(_SEQ_PATTERN))
        .cast("long")
        .alias("n_matches"),
    ).orderBy("user_id")


# ------------------------------------------------------- Viterbi

# integer log-odds (x100), states 0=browse-mode 1=buy-mode; symbols:
# conversion events (purchase/signup) vs browse events (view/click/error)
_VIT_T00, _VIT_T01 = -10, -200
_VIT_T10, _VIT_T11 = -150, -20
_VIT_INIT0, _VIT_INIT1 = -50, -100
_VIT_E0_CONV, _VIT_E0_BROWSE = -300, -50
_VIT_E1_CONV, _VIT_E1_BROWSE = -80, -150


@register_extra(
    "viterbi_two_state",
    f"""
    WITH RECURSIVE pos AS (
      SELECT user_id,
             CASE WHEN event_type IN ('purchase', 'signup')
                  THEN 1 ELSE 0 END AS conv,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    n AS (SELECT user_id, max(rn) AS n FROM pos GROUP BY 1),
    vit(user_id, rn, s0, s1) AS (
      SELECT user_id, rn,
             {_VIT_INIT0} + CASE WHEN conv = 1 THEN {_VIT_E0_CONV}
                                 ELSE {_VIT_E0_BROWSE} END,
             {_VIT_INIT1} + CASE WHEN conv = 1 THEN {_VIT_E1_CONV}
                                 ELSE {_VIT_E1_BROWSE} END
      FROM pos WHERE rn = 1
      UNION ALL
      SELECT p.user_id, p.rn,
             CASE WHEN p.conv = 1 THEN {_VIT_E0_CONV}
                  ELSE {_VIT_E0_BROWSE} END
               + greatest(v.s0 + {_VIT_T00}, v.s1 + {_VIT_T10}),
             CASE WHEN p.conv = 1 THEN {_VIT_E1_CONV}
                  ELSE {_VIT_E1_BROWSE} END
               + greatest(v.s0 + {_VIT_T01}, v.s1 + {_VIT_T11})
      FROM vit v JOIN pos p
        ON p.user_id = v.user_id AND p.rn = v.rn + 1
    )
    SELECT v.user_id, CAST(n.n AS BIGINT) AS n_events,
           greatest(v.s0, v.s1) AS best_score,
           CAST(CASE WHEN v.s0 >= v.s1 THEN 0 ELSE 1 END AS INT)
             AS final_state
    FROM vit v JOIN n ON n.user_id = v.user_id AND v.rn = n.n
    ORDER BY v.user_id
    """,
)
def viterbi_two_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Viterbi decoding of a two-state HMM (browse-mode vs buy-mode)
    over each user's event stream — the max-likelihood state-sequence
    DP behind session-intent segmentation; all log-probabilities are
    x100 INTEGERS so the recurrence s_t(k) = emit(k, o_t) +
    max_j(s_{t-1}(j) + trans(j, k)) is exact and the argmax final
    state (tie -> state 0) hash-gates byte-exactly. Sequential per-key
    state: Spark runs it in applyInPandas (one task per key, the
    distributed stateful-decode shape); the oracle replays the same
    recurrence as a recursive CTE carrying both state scores."""
    import pandas as pd

    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "user_id", "ts", "event_id",
        F.when(F.col("event_type").isin("purchase", "signup"), 1)
        .otherwise(0)
        .alias("conv"),
    )

    def _vit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        s0 = s1 = None
        for conv in pdf["conv"]:
            e0 = _VIT_E0_CONV if conv == 1 else _VIT_E0_BROWSE
            e1 = _VIT_E1_CONV if conv == 1 else _VIT_E1_BROWSE
            if s0 is None:
                s0, s1 = _VIT_INIT0 + e0, _VIT_INIT1 + e1
            else:
                s0, s1 = (
                    e0 + max(s0 + _VIT_T00, s1 + _VIT_T10),
                    e1 + max(s0 + _VIT_T01, s1 + _VIT_T11),
                )
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "best_score": [max(s0, s1)],
                "final_state": [0 if s0 >= s1 else 1],
            }
        )

    return (
        base.groupBy("user_id")
        .applyInPandas(
            _vit,
            "user_id long, n_events long, best_score long, final_state int",
        )
        .orderBy("user_id")
    )


# --------------------------------------------------- attribution

_ATTR_WINDOW_S = 7 * 86400


@register_extra(
    "touch_attribution",
    f"""
    WITH ev AS (
      SELECT user_id, event_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS t
      FROM events
    ),
    conv AS (
      SELECT user_id, event_id AS conv_id, t AS ct
      FROM ev WHERE event_type = 'purchase'
    ),
    touch AS (
      SELECT c.conv_id, e.event_type, e.t, e.event_id
      FROM conv c JOIN ev e
        ON e.user_id = c.user_id
       AND e.t < c.ct AND e.t >= c.ct - {_ATTR_WINDOW_S}
       AND e.event_type <> 'purchase'
    ),
    ranked AS (
      SELECT conv_id, event_type,
             row_number() OVER (PARTITION BY conv_id
                                ORDER BY t DESC, event_id DESC) AS r_last,
             row_number() OVER (PARTITION BY conv_id
                                ORDER BY t, event_id) AS r_first,
             count(*) OVER (PARTITION BY conv_id) AS k
      FROM touch
    )
    SELECT event_type,
           count(*) FILTER (WHERE r_last = 1) AS n_last,
           count(*) FILTER (WHERE r_first = 1) AS n_first,
           CAST(sum(1000000 // k) AS BIGINT) AS linear_e6
    FROM ranked GROUP BY 1 ORDER BY event_type
    """,
)
def touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch marketing attribution over purchase conversions:
    for each purchase, the user's non-purchase events in the prior 7
    days are its touchpoints; credit them under the three standard
    models — last-touch (latest wins), first-touch, and linear
    (1e6 // k ppm shares, truncating division so the exact-integer
    gate holds; the k-rounding remainder is deliberately dropped,
    matching how ppm ledgers truncate). Reported per touch
    event_type. Scale shape: the conversion-touch join is keyed on
    user with a time-range predicate (bounded per key), then two rank
    windows per conversion — no cross-user blowup."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type",
        F.unix_timestamp("ts").cast("long").alias("t"),
    )
    conv = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("conv_id"), F.col("t").alias("ct")
    )
    touch = conv.join(
        ev.withColumnRenamed("event_id", "tid"), "user_id"
    ).filter(
        (F.col("t") < F.col("ct"))
        & (F.col("t") >= F.col("ct") - _ATTR_WINDOW_S)
        & (F.col("event_type") != "purchase")
    )
    wl = Window.partitionBy("conv_id").orderBy(
        F.desc("t"), F.desc("tid")
    )
    wf = Window.partitionBy("conv_id").orderBy("t", "tid")
    wk = Window.partitionBy("conv_id")
    ranked = touch.select(
        "conv_id",
        "event_type",
        F.row_number().over(wl).alias("r_last"),
        F.row_number().over(wf).alias("r_first"),
        F.count("*").over(wk).alias("k"),
    )
    return (
        ranked.groupBy("event_type")
        .agg(
            F.count(F.when(F.col("r_last") == 1, 1)).alias("n_last"),
            F.count(F.when(F.col("r_first") == 1, 1)).alias("n_first"),
            F.sum(F.expr("1000000 div k")).cast("long").alias("linear_e6"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------- bin packing

_NFD_CAP = 100  # bin capacity in quantity units


@register_extra(
    "nextfit_bin_packing",
    f"""
    WITH RECURSIVE it AS (
      SELECT l_orderkey AS k,
             CAST(floor(l_quantity + 0.5) AS BIGINT) AS q,
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY floor(l_quantity + 0.5) DESC,
                                         l_linenumber) AS rn
      FROM lineitem
    ),
    nf(k, rn, load, bins) AS (
      SELECT k, rn, q, 1 FROM it WHERE rn = 1
      UNION ALL
      SELECT i.k, i.rn,
             CASE WHEN s.load + i.q <= {_NFD_CAP}
                  THEN s.load + i.q ELSE i.q END,
             s.bins + CASE WHEN s.load + i.q <= {_NFD_CAP}
                           THEN 0 ELSE 1 END
      FROM nf s JOIN it i ON i.k = s.k AND i.rn = s.rn + 1
    ),
    fin AS (
      SELECT k, max(rn) AS n_items FROM it GROUP BY 1
    ),
    res AS (
      SELECT nf.k, fin.n_items, nf.bins
      FROM nf JOIN fin ON fin.k = nf.k AND nf.rn = fin.n_items
    )
    SELECT CAST(bins AS INT) AS n_bins, count(*) AS n_orders,
           CAST(sum(n_items) AS BIGINT) AS total_items
    FROM res GROUP BY 1 ORDER BY n_bins
    """,
)
def nextfit_bin_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-fit-decreasing bin packing of each order's line quantities
    into capacity-100 shipping bins — the container/palletization
    heuristic (2-approximation, single-pass state = current-bin load,
    which is exactly what makes it streamable): items sorted by
    quantity descending (linenumber tie-break), open a new bin when
    the current one can't fit. Reports the bins-per-order histogram.
    Spark: the sequential fold runs per order in applyInPandas; the
    oracle replays it as a recursive CTE chained on item rank. Exact
    integers."""
    import pandas as pd

    li = _t(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_orderkey").alias("k"),
        F.floor(F.col("l_quantity") + 0.5).cast("long").alias("q"),
        "l_linenumber",
    )

    def _nfd(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["q", "l_linenumber"], ascending=[False, True]
        )
        load, bins = 0, 0
        for q in pdf["q"]:
            if bins == 0 or load + q > _NFD_CAP:
                bins += 1
                load = q
            else:
                load += q
        return pd.DataFrame(
            {
                "k": [pdf["k"].iloc[0]],
                "n_items": [len(pdf)],
                "n_bins": [bins],
            }
        )

    res = base.groupBy("k").applyInPandas(
        _nfd, "k long, n_items long, n_bins int"
    )
    return (
        res.groupBy("n_bins")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("n_items").cast("long").alias("total_items"),
        )
        .orderBy("n_bins")
    )


# --------------------------------------------------- Lindley queue

_LQ_SERVICE = 12  # served per hour per event_type


@register_extra(
    "lindley_queue_replay",
    f"""
    WITH RECURSIVE b AS (
      SELECT event_type,
             CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT)
               // 3600 AS h,
             count(*) AS a
      FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT min(h) AS h0, max(h) AS h1 FROM b),
    grid AS (
      SELECT t.event_type, g.h,
             row_number() OVER (PARTITION BY t.event_type
                                ORDER BY g.h) AS i
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (SELECT unnest(generate_series(h0, h1)) AS h
                  FROM bounds) g
    ),
    x AS (
      SELECT grid.event_type, grid.i,
             CAST(coalesce(b.a, 0) AS BIGINT) AS a
      FROM grid LEFT JOIN b
        ON b.event_type = grid.event_type AND b.h = grid.h
    ),
    q(event_type, i, depth, mx, backlog) AS (
      SELECT event_type, i, greatest(0, a - {_LQ_SERVICE}),
             greatest(0, a - {_LQ_SERVICE}),
             CASE WHEN a > {_LQ_SERVICE} THEN 1 ELSE 0 END
      FROM x WHERE i = 1
      UNION ALL
      SELECT n.event_type, n.i,
             greatest(0, s.depth + n.a - {_LQ_SERVICE}),
             greatest(s.mx, greatest(0, s.depth + n.a - {_LQ_SERVICE})),
             s.backlog + CASE WHEN
               greatest(0, s.depth + n.a - {_LQ_SERVICE}) > 0
               THEN 1 ELSE 0 END
      FROM q s JOIN x n
        ON n.event_type = s.event_type AND n.i = s.i + 1
    ),
    fin AS (SELECT event_type, max(i) AS n FROM x GROUP BY 1)
    SELECT q.event_type, CAST(fin.n AS BIGINT) AS n_hours,
           q.depth AS final_depth, q.mx AS max_depth,
           CAST(q.backlog AS BIGINT) AS hours_backlogged
    FROM q JOIN fin ON fin.event_type = q.event_type AND q.i = fin.n
    ORDER BY q.event_type
    """,
)
def lindley_queue_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lindley-recursion queue replay: feed each event_type's hourly
    arrival counts (dense, gap-filled) into a deterministic
    fixed-capacity server (12/hour) — Q_t = max(0, Q_{t-1} + A_t - c),
    the waiting-line recursion behind every capacity-planning study —
    and report final depth, peak depth, and backlogged-hours count.
    Sequential by definition (the max(0, .) clamp breaks prefix-sum
    decomposition... except via the max-plus reformulation; the replay
    here IS the semantics being gated). Spark: per-type pandas fold,
    state in one task; oracle: recursive CTE over the hour index.
    Exact integers."""
    import pandas as pd

    ev = _t(spark, sf_dir, "events")
    b = (
        ev.select(
            "event_type",
            F.expr("unix_timestamp(ts) div 3600").alias("h"),
        )
        .groupBy("event_type", "h")
        .agg(F.count("*").alias("a"))
    )
    bounds = b.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence("h0", "h1")).alias("h"),
        )
    )
    x = grid.join(b, ["event_type", "h"], "left").select(
        "event_type", "h", F.coalesce("a", F.lit(0)).cast("long").alias("a")
    )

    def _lindley(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("h")
        depth = mx = backlog = 0
        for a in pdf["a"]:
            depth = max(0, depth + int(a) - _LQ_SERVICE)
            mx = max(mx, depth)
            if depth > 0:
                backlog += 1
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_hours": [len(pdf)],
                "final_depth": [depth],
                "max_depth": [mx],
                "hours_backlogged": [backlog],
            }
        )

    return (
        x.groupBy("event_type")
        .applyInPandas(
            _lindley,
            "event_type string, n_hours long, final_depth long,"
            " max_depth long, hours_backlogged long",
        )
        .orderBy("event_type")
    )


_TREE2_ORACLE = """
WITH base AS (
  SELECT doc_id,
         CAST(n_chars AS BIGINT) AS f1,
         CAST(len(list_filter(string_split_regex(text, ' +'),
                              x -> x <> '')) AS BIGINT) AS f2,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents
),
long_ AS (
  SELECT doc_id, 'n_chars' AS feature, f1 AS v, y FROM base
  UNION ALL
  SELECT doc_id, 'n_tokens', f2, y FROM base
),
grp AS (
  SELECT feature, v, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS p
  FROM long_ GROUP BY 1, 2
),
sweep AS (
  SELECT feature, v AS thr,
         CAST(sum(n) OVER w AS BIGINT) AS nl,
         CAST(sum(p) OVER w AS BIGINT) AS pl,
         CAST(sum(n) OVER (PARTITION BY feature) AS BIGINT) AS nt,
         CAST(sum(p) OVER (PARTITION BY feature) AS BIGINT) AS pt,
         max(v) OVER (PARTITION BY feature) AS vmax
  FROM grp WINDOW w AS (PARTITION BY feature ORDER BY v)
),
scored AS (
  SELECT feature, thr,
         (nl - greatest(pl, nl - pl))
         + ((nt - nl) - greatest(pt - pl, (nt - nl) - (pt - pl))) AS err
  FROM sweep WHERE thr < vmax
),
root AS (
  SELECT feature, thr, err FROM scored
  ORDER BY err, feature, thr LIMIT 1
),
branch AS (
  SELECT b.doc_id,
         CASE WHEN (CASE r.feature WHEN 'n_chars' THEN b.f1 ELSE b.f2 END)
                   <= r.thr
              THEN 'left' ELSE 'right' END AS node,
         b.f1, b.f2, b.y
  FROM base b CROSS JOIN root r
),
long2 AS (
  SELECT node, 'n_chars' AS feature, f1 AS v, y FROM branch
  UNION ALL
  SELECT node, 'n_tokens', f2, y FROM branch
),
grp2 AS (
  SELECT node, feature, v, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS p
  FROM long2 GROUP BY 1, 2, 3
),
sweep2 AS (
  SELECT node, feature, v AS thr,
         CAST(sum(n) OVER w AS BIGINT) AS nl,
         CAST(sum(p) OVER w AS BIGINT) AS pl,
         CAST(sum(n) OVER (PARTITION BY node, feature) AS BIGINT) AS nt,
         CAST(sum(p) OVER (PARTITION BY node, feature) AS BIGINT) AS pt,
         max(v) OVER (PARTITION BY node, feature) AS vmax
  FROM grp2 WINDOW w AS (PARTITION BY node, feature ORDER BY v)
),
scored2 AS (
  SELECT node, feature, thr,
         (nl - greatest(pl, nl - pl))
         + ((nt - nl) - greatest(pt - pl, (nt - nl) - (pt - pl))) AS err,
         nt - greatest(pt, nt - pt) AS err_leaf
  FROM sweep2 WHERE thr < vmax
),
child AS (
  SELECT node, feature, thr, err, err_leaf,
         row_number() OVER (PARTITION BY node
                            ORDER BY err, feature, thr) AS rn
  FROM scored2
),
rootrow AS (
  SELECT 'root' AS node, r.feature, r.thr,
         (SELECT CAST(count(*) - greatest(sum(y), count(*) - sum(y))
                      AS BIGINT) FROM base) AS err_leaf,
         CAST(r.err AS BIGINT) AS err_split
  FROM root r
)
SELECT node, feature, thr, err_leaf, err_split FROM rootrow
UNION ALL
SELECT node, feature, thr, CAST(err_leaf AS BIGINT),
       CAST(err AS BIGINT) FROM child WHERE rn = 1
ORDER BY node
"""


def _split_sweep(long_df: DataFrame, keys: list[str]) -> DataFrame:
    """Best-threshold sweep shared by both tree levels: value-grouped
    (n, pos) partials, one ordered window per (keys, feature) for the
    cumulative left-branch counts, then the exact misclassification
    count of the induced two-leaf split at every candidate threshold
    (thresholds sit ON distinct values, the max excluded so both
    branches are nonempty). No doc ever crosses the wire twice: the
    sweep input is the value histogram, not the rows."""
    part = keys + ["feature"]
    grp = long_df.groupBy(*part, "v").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("p"),
    )
    w = Window.partitionBy(*part).orderBy("v")
    wa = Window.partitionBy(*part)
    sweep = grp.select(
        *part,
        F.col("v").alias("thr"),
        F.sum("n").over(w).alias("nl"),
        F.sum("p").over(w).alias("pl"),
        F.sum("n").over(wa).alias("nt"),
        F.sum("p").over(wa).alias("pt"),
        F.max("v").over(wa).alias("vmax"),
    ).filter(F.col("thr") < F.col("vmax"))
    return sweep.select(
        *part,
        "thr",
        (
            (F.col("nl") - F.greatest("pl", F.col("nl") - F.col("pl")))
            + (
                (F.col("nt") - F.col("nl"))
                - F.greatest(
                    F.col("pt") - F.col("pl"),
                    (F.col("nt") - F.col("nl"))
                    - (F.col("pt") - F.col("pl")),
                )
            )
        ).alias("err"),
        (
            F.col("nt") - F.greatest("pt", F.col("nt") - F.col("pt"))
        ).alias("err_leaf"),
    )


@register_extra("tree_depth2_train", _TREE2_ORACLE)
def tree_depth2_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy depth-2 decision-tree training (the recursive-partitioning
    primitive under CART / gradient-boosted trees) with the exact
    integer misclassification criterion: pick the (feature, threshold)
    minimizing training error at the root, then re-sweep inside each
    branch — features n_chars / n_tokens, label lang='en', ties break
    (err, feature, thr). Returns one row per trained node with the
    leaf error before and the split error after. Scale shape: each
    sweep aggregates rows to per-(feature, value) histograms FIRST, so
    the windows run over the value histogram (the classic distributed
    tree-learner layout, cf. PLANET/XGBoost hist mode); at 100 TB the
    candidate set would be the equi-depth bin edges the gated
    equidepth_value_bins query already produces. The 1-row best-split
    broadcast between levels is the only driver-visible state."""
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " +"), lambda x: x != F.lit(""))
    base = d.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("f1"),
        F.size(toks).cast("long").alias("f2"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    base = base.localCheckpoint()  # reused by both levels + the totals
    long1 = base.select(
        "doc_id", F.lit("n_chars").alias("feature"),
        F.col("f1").alias("v"), "y",
    ).unionByName(
        base.select(
            "doc_id", F.lit("n_tokens").alias("feature"),
            F.col("f2").alias("v"), "y",
        )
    )
    root = (
        _split_sweep(long1, [])
        .orderBy("err", "feature", "thr")
        .limit(1)
        .select("feature", "thr", "err")
    )
    branch = base.crossJoin(F.broadcast(root.withColumnRenamed("err", "rerr"))).select(
        "doc_id",
        F.when(
            F.when(F.col("feature") == "n_chars", F.col("f1"))
            .otherwise(F.col("f2"))
            <= F.col("thr"),
            "left",
        )
        .otherwise("right")
        .alias("node"),
        "f1",
        "f2",
        "y",
    )
    long2 = branch.select(
        "node", F.lit("n_chars").alias("feature"),
        F.col("f1").alias("v"), "y",
    ).unionByName(
        branch.select(
            "node", F.lit("n_tokens").alias("feature"),
            F.col("f2").alias("v"), "y",
        )
    )
    wb = Window.partitionBy("node").orderBy("err", "feature", "thr")
    child = (
        _split_sweep(long2, ["node"])
        .withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") == 1)
        .select("node", "feature", "thr", "err_leaf",
                F.col("err").alias("err_split"))
    )
    tot = base.agg(
        (
            F.count("*")
            - F.greatest(F.sum("y"), F.count("*") - F.sum("y"))
        )
        .cast("long")
        .alias("err_leaf")
    )
    rootrow = root.crossJoin(F.broadcast(tot)).select(
        F.lit("root").alias("node"), "feature", "thr", "err_leaf",
        F.col("err").cast("long").alias("err_split"),
    )
    return rootrow.unionByName(
        child.select("node", "feature", "thr",
                     F.col("err_leaf").cast("long").alias("err_leaf"),
                     F.col("err_split").cast("long").alias("err_split"))
    ).orderBy("node")


# --------------------------------------------- ranking eval: MAP


@register_extra(
    "average_precision_eval",
    """
    WITH base AS (
      SELECT user_id % 20 AS qid,
             ('0x' || substr(md5('apscore:' || CAST(event_id AS VARCHAR)),
                             1, 12))::BIGINT AS score,
             CASE WHEN ('0x' || substr(md5('aprel:'
                          || CAST(event_id AS VARCHAR)), 1, 4))::INT % 5 = 0
                  THEN 1 ELSE 0 END AS rel,
             event_id
      FROM events
    ),
    ranked AS (
      SELECT qid, rel,
             row_number() OVER (PARTITION BY qid
                                ORDER BY score DESC, event_id) AS rk,
             sum(rel) OVER (PARTITION BY qid
                            ORDER BY score DESC, event_id
                            ROWS UNBOUNDED PRECEDING) AS relcnt
      FROM base
    ),
    terms AS (
      SELECT qid, (relcnt * 1000000000) // rk AS term
      FROM ranked WHERE rel = 1
    ),
    agg AS (SELECT qid, count(*) AS n_rel, sum(term) AS s
            FROM terms GROUP BY qid)
    SELECT qid, CAST(n_rel AS BIGINT) AS n_rel,
           CAST(s // n_rel AS BIGINT) AS ap_e9
    FROM agg ORDER BY qid
    """,
)
def average_precision_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision per query group — THE ranked-retrieval eval
    metric (MAP's per-query term): AP = mean over relevant hits of
    precision@their-rank. Scores and binary labels are md5-derived;
    ranking ties are impossible (48-bit scores) and the residual
    tie-break is pinned by event_id on both sides. The only fractions
    are precision@k and the final 1/R mean, both quantized with the
    shared truncating e9 division, so the whole metric is exact
    integers cross-engine. Spark: two window passes (rank + running
    relevant-count) partitioned by query — the standard eval shape at
    scale, one shuffle on qid; the oracle repeats the definition
    relationally in DuckDB."""
    ev = _t(spark, sf_dir, "events")
    eid = F.col("event_id").cast("string")

    def _h(prefix: str, chars: int) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(prefix), eid).cast("binary")), 1, chars
            ),
            16,
            10,
        ).cast("long")

    base = ev.select(
        F.pmod(F.col("user_id"), F.lit(20)).alias("qid"),
        _h("apscore:", 12).alias("score"),
        F.when(_h("aprel:", 4).cast("int") % 5 == 0, 1)
        .otherwise(0)
        .alias("rel"),
        "event_id",
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col("event_id")
    )
    ranked = base.select(
        "qid",
        "rel",
        F.row_number().over(w).alias("rk"),
        F.sum("rel").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("relcnt"),
    )
    return (
        ranked.filter(F.col("rel") == 1)
        .select("qid", F.expr("(relcnt * 1000000000) div rk").alias("term"))
        .groupBy("qid")
        .agg(
            F.count("*").cast("long").alias("n_rel"),
            F.expr("sum(term) div count(*)").cast("long").alias("ap_e9"),
        )
        .orderBy("qid")
    )


# ------------------------------------- probability calibration


@register_extra(
    "calibration_bins",
    """
    WITH base AS (
      SELECT ('0x' || substr(md5('calp:' || CAST(event_id AS VARCHAR)),
                             1, 6))::BIGINT % 1001 AS p_e3,
             CASE WHEN ('0x' || substr(md5('caly:'
                          || CAST(event_id AS VARCHAR)), 1, 6))::BIGINT
                       % 1001
                    < ('0x' || substr(md5('calp:'
                          || CAST(event_id AS VARCHAR)), 1, 6))::BIGINT
                       % 1001
                  THEN 1 ELSE 0 END AS y
      FROM events
    )
    SELECT least(p_e3 // 100, 9) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(y) AS BIGINT) AS n_pos,
           CAST(sum(p_e3) AS BIGINT) AS sum_p_e3,
           CAST(abs(sum(p_e3) - 1000 * sum(y)) AS BIGINT) AS abs_gap_e3,
           CAST(sum((p_e3 - 1000 * y) * (p_e3 - 1000 * y)) AS BIGINT)
             AS brier_sum_e6
    FROM base GROUP BY 1 ORDER BY 1
    """,
)
def calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins for a probabilistic classifier — the
    calibration audit every model-quality pipeline runs before
    trusting scores as probabilities. Predictions p are e3-quantized
    md5 draws; outcomes are drawn BY CONSTRUCTION calibrated (y = 1
    iff an independent uniform < p), so bin gaps measure finite-sample
    noise — which both engines must agree on exactly. Per decile bin:
    count, positives, confidence mass, the |confidence - accuracy| ECE
    numerator (integers at e3) and the Brier-score sum at e6 — the
    full decomposition without a single float. One partial-agg
    shuffle on the 10 bin keys; at 100 TB this is a pure map-side
    combine."""
    ev = _t(spark, sf_dir, "events")
    eid = F.col("event_id").cast("string")

    def _h(prefix: str) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(prefix), eid).cast("binary")), 1, 6
            ),
            16,
            10,
        ).cast("long")

    base = ev.select(
        (_h("calp:") % 1001).alias("p_e3"),
        F.when(_h("caly:") % 1001 < _h("calp:") % 1001, 1)
        .otherwise(0)
        .alias("y"),
    )
    return (
        base.select(
            F.least(F.expr("p_e3 div 100"), F.lit(9)).alias("bin"),
            "p_e3",
            "y",
        )
        .groupBy("bin")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("y").cast("long").alias("n_pos"),
            F.sum("p_e3").cast("long").alias("sum_p_e3"),
            F.abs(F.sum("p_e3") - 1000 * F.sum("y"))
            .cast("long")
            .alias("abs_gap_e3"),
            F.sum((F.col("p_e3") - 1000 * F.col("y"))
                  * (F.col("p_e3") - 1000 * F.col("y")))
            .cast("long")
            .alias("brier_sum_e6"),
        )
        .orderBy("bin")
    )


# --------------------------------------------- survival analysis


@register_extra(
    "nelson_aalen_hazard",
    """
    WITH subj AS (
      SELECT ('0x' || substr(md5('nadur:' || CAST(event_id AS VARCHAR)),
                             1, 6))::BIGINT % 60 + 1 AS d,
             CASE WHEN ('0x' || substr(md5('nacen:'
                          || CAST(event_id AS VARCHAR)), 1, 4))::INT % 4 = 0
                  THEN 0 ELSE 1 END AS ev
      FROM events
    ),
    tot AS (SELECT count(*) AS n FROM subj),
    at_t AS (
      SELECT d AS t, count(*) AS n_leave, sum(ev) AS n_events
      FROM subj GROUP BY d
    ),
    risk AS (
      SELECT t, n_events,
             (SELECT n FROM tot)
               - coalesce(sum(n_leave) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk
      FROM at_t
    )
    SELECT t, CAST(n_risk AS BIGINT) AS n_risk,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(sum((n_events * 1000000000000) // n_risk)
                  OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cum_hazard_e12
    FROM risk ORDER BY t
    """,
)
def nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator — the survival-
    analysis workhorse behind churn/retention curves and reliability
    engineering: H(t) = sum over event times s <= t of d_s / n_s
    (events over the at-risk set), right-censoring respected (censored
    subjects leave the risk set but contribute no event). Durations
    and censoring flags are md5-derived. Each hazard increment is one
    e12 truncating division — the only fraction in the estimator — so
    the running sum is exact integers cross-engine (a float Kaplan-
    Meier product would NOT be; that is why the additive NA form is
    the distributed-friendly one). Spark: one groupBy on event time +
    two ordered windows (risk set by complement of the leaving
    cumsum, then the hazard cumsum) — at scale the time axis is tiny,
    so both windows run on a single coalesced partition of ~hundreds
    of rows after a map-side partial agg."""
    ev = _t(spark, sf_dir, "events")
    eid = F.col("event_id").cast("string")

    def _h(prefix: str, chars: int) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(prefix), eid).cast("binary")), 1, chars
            ),
            16,
            10,
        ).cast("long")

    subj = ev.select(
        (_h("nadur:", 6) % 60 + 1).alias("d"),
        F.when(_h("nacen:", 4).cast("int") % 4 == 0, 0)
        .otherwise(1)
        .alias("ev"),
    )
    at_t = subj.groupBy(F.col("d").alias("t")).agg(
        F.count("*").alias("n_leave"), F.sum("ev").alias("n_events")
    )
    w = Window.orderBy("t")
    # at-risk at t = everyone who leaves at t or later: a suffix sum —
    # the complement formulation of the oracle's total-minus-prefix,
    # so the two engines cross-check the identity too
    risk = at_t.select(
        "t",
        "n_events",
        F.sum("n_leave")
        .over(w.rowsBetween(0, Window.unboundedFollowing))
        .alias("n_risk"),
    )
    return risk.select(
        "t",
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("n_events").cast("long").alias("n_events"),
        F.sum(F.expr("(n_events * 1000000000000) div n_risk"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("cum_hazard_e12"),
    ).orderBy("t")


# --------------------------------------------- multiple testing


@register_extra(
    "fdr_bh_selection",
    """
    WITH h AS (
      SELECT user_id % 8 AS fam,
             CASE WHEN ('0x' || substr(md5('bheff:'
                          || CAST(event_id AS VARCHAR)), 1, 4))::INT % 5 = 0
                  THEN ('0x' || substr(md5('bhp:'
                          || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % 500
                  ELSE ('0x' || substr(md5('bhp:'
                          || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
                         % 1000001
             END AS p_e6, event_id
      FROM events WHERE event_id % 11 = 0
    ),
    ranked AS (
      SELECT fam, p_e6,
             row_number() OVER (PARTITION BY fam
                                ORDER BY p_e6, event_id) AS i,
             count(*) OVER (PARTITION BY fam) AS m
      FROM h
    ),
    ok AS (SELECT fam, i FROM ranked WHERE p_e6 * m * 20 <= i * 1000000),
    mx AS (SELECT fam, max(i) AS kmax FROM ok GROUP BY fam)
    SELECT r.fam, CAST(max(r.m) AS BIGINT) AS n_tests,
           CAST(coalesce(max(mx.kmax), 0) AS BIGINT) AS n_rejected,
           CAST(coalesce(max(CASE WHEN r.i = mx.kmax THEN r.p_e6 END), -1)
                AS BIGINT) AS p_cut_e6
    FROM ranked r LEFT JOIN mx ON mx.fam = r.fam
    GROUP BY r.fam ORDER BY r.fam
    """,
)
def fdr_bh_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR step-up selection at alpha = 0.05, per
    test family — the multiple-testing gate every large-scale A/B /
    feature-screening pipeline applies before declaring winners:
    reject the k smallest p-values where k = max{i : p_(i) <= i*a/m}.
    A fifth of the hypotheses carry planted signal (p <= 5e-4), so
    the step-up does real work — including rescuing non-planted
    p-values that ride below the rising BH line (visible as p_cut >
    the plant ceiling in some families). p-values are e6 integers and
    the BH inequality is cross-multiplied (alpha = 1/20), so
    selection is exact — no float thresholds. Spark: rank + count
    windows per family, one filter, one max — a single shuffle on the
    family key; the oracle is the same definition in DuckDB. Output
    per family: tests, rejections, the realized p cutoff (-1 = none)."""
    ev = _t(spark, sf_dir, "events")
    eid = F.col("event_id").cast("string")

    def _h(prefix: str, chars: int) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(prefix), eid).cast("binary")), 1, chars
            ),
            16,
            10,
        ).cast("long")

    h = ev.filter(F.col("event_id") % 11 == 0).select(
        F.pmod(F.col("user_id"), F.lit(8)).alias("fam"),
        F.when(
            _h("bheff:", 4).cast("int") % 5 == 0, _h("bhp:", 8) % 500
        )
        .otherwise(_h("bhp:", 8) % 1000001)
        .alias("p_e6"),
        "event_id",
    )
    w = Window.partitionBy("fam").orderBy("p_e6", "event_id")
    ranked = h.select(
        "fam",
        "p_e6",
        F.row_number().over(w).alias("i"),
        F.count("*").over(Window.partitionBy("fam")).alias("m"),
    )
    mx = (
        ranked.filter(
            F.col("p_e6") * F.col("m") * 20 <= F.col("i") * 1000000
        )
        .groupBy("fam")
        .agg(F.max("i").alias("kmax"))
    )
    return (
        ranked.join(mx, "fam", "left")
        .groupBy("fam")
        .agg(
            F.max("m").cast("long").alias("n_tests"),
            F.coalesce(F.max("kmax"), F.lit(0))
            .cast("long")
            .alias("n_rejected"),
            F.coalesce(
                F.max(
                    F.when(F.col("i") == F.col("kmax"), F.col("p_e6"))
                ),
                F.lit(-1),
            )
            .cast("long")
            .alias("p_cut_e6"),
        )
        .orderBy("fam")
    )


# --------------------------------------------- phonetic blocking

_SX_MAP = "0123012702245501"  # soundex codes for letters a..p
_SX_ABC = "abcdefghijklmnop"


def _sx_sql(col: str) -> str:
    """From-scratch American Soundex over a lowercase a-p name, as a
    DuckDB list_reduce fold: accumulator = 'BODY|lastcode', vowels
    (code 0) reset lastcode without emitting, H/W (code 7) are fully
    transparent, adjacent equal codes collapse, body capped at 4 and
    right-padded with zeros — the exact semantics of Spark's builtin
    soundex(), verified exhaustively on the generated name corpus."""
    k = f"substr('{_SX_MAP}', strpos('{_SX_ABC}', c), 1)"
    return f"""rpad(string_split(list_reduce(
      ['INIT'] || string_split({col}, ''),
      (acc, c) -> CASE
        WHEN acc = 'INIT' THEN upper(c) || '|' || {k}
        ELSE (CASE
          WHEN {k} = '7' THEN acc
          WHEN {k} = '0' THEN string_split(acc, '|')[1] || '|0'
          WHEN {k} <> string_split(acc, '|')[2]
               AND length(string_split(acc, '|')[1]) < 4
            THEN string_split(acc, '|')[1] || {k} || '|' || {k}
          ELSE string_split(acc, '|')[1] || '|' || {k}
        END)
      END), '|')[1], 4, '0')"""


@register_extra(
    "soundex_blocking",
    f"""
    WITH n AS (
      SELECT translate(substr(md5('sxname:' || CAST(event_id AS VARCHAR)),
                              1, 8),
                       '0123456789abcdef', '{_SX_ABC}') AS name
      FROM events WHERE event_id % 3 = 0
    ),
    sx AS (SELECT name, {_sx_sql('name')} AS sx FROM n),
    blocks AS (
      SELECT sx, count(*) AS n_names, min(name) AS min_name,
             max(name) AS max_name
      FROM sx GROUP BY sx
    )
    SELECT sx, CAST(n_names AS BIGINT) AS n_names,
           CAST(n_names * (n_names - 1) // 2 AS BIGINT) AS n_cand_pairs,
           min_name, max_name
    FROM blocks WHERE n_names >= 2 ORDER BY sx
    """,
)
def soundex_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phonetic blocking for entity resolution — group name strings by
    American Soundex code so the expensive pairwise matcher only runs
    within blocks (the classic dedup-join candidate generator for
    person/merchant names, complementing the gated sorted-neighborhood
    and fuzzy-match blocking). Names are md5-derived 8-letter strings
    over a-p (hex transliteration, same expression both engines).
    Spark uses its BUILTIN soundex() (JVM codegen, zero Python); the
    oracle re-implements the full algorithm from scratch as a DuckDB
    character fold — vowel resets, H/W transparency, adjacent-code
    collapse, zero padding — so Apache's implementation and the
    textbook definition check each other letter by letter (verified
    exhaustively: 3334/3334 names agree). Per block of >= 2: size,
    candidate-pair count, lexicographic extremes. Scale: blocking is
    one hash shuffle on the 4-char code; block sizes are the quadratic
    guard — the n_cand_pairs column IS the skew audit."""
    ev = _t(spark, sf_dir, "events")
    names = ev.filter(F.col("event_id") % 3 == 0).select(
        F.translate(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("sxname:"), F.col("event_id").cast("string")
                    ).cast("binary")
                ),
                1,
                8,
            ),
            "0123456789abcdef",
            _SX_ABC,
        ).alias("name")
    )
    return (
        names.select("name", F.soundex("name").alias("sx"))
        .groupBy("sx")
        .agg(
            F.count("*").cast("long").alias("n_names"),
            F.min("name").alias("min_name"),
            F.max("name").alias("max_name"),
        )
        .filter(F.col("n_names") >= 2)
        .select(
            "sx",
            "n_names",
            F.expr("n_names * (n_names - 1) div 2")
            .cast("long")
            .alias("n_cand_pairs"),
            "min_name",
            "max_name",
        )
        .orderBy("sx")
    )


# --------------------------------------------- diff-in-diff


@register_extra(
    "diff_in_diff_audit",
    """
    WITH obs AS (
      SELECT event_type AS segment,
             user_id % 200 AS unit,
             (user_id % 200) % 5 = 0 AS treated,
             ('0x' || substr(md5('ddp:' || CAST(event_id AS VARCHAR)),
                             1, 4))::INT % 2 AS post,
             (('0x' || substr(md5('ddb:' || CAST(user_id % 200 AS VARCHAR)),
                              1, 6))::BIGINT % 50)
             + 7 * (('0x' || substr(md5('ddp:'
                 || CAST(event_id AS VARCHAR)), 1, 4))::INT % 2)
             + 12 * (CASE WHEN (user_id % 200) % 5 = 0 THEN 1 ELSE 0 END)
                  * (('0x' || substr(md5('ddp:'
                      || CAST(event_id AS VARCHAR)), 1, 4))::INT % 2)
             + ('0x' || substr(md5('ddn:' || CAST(event_id AS VARCHAR)),
                               1, 4))::BIGINT % 5 AS y
      FROM events
    ),
    cells AS (
      SELECT segment, treated, post, count(*) AS n, sum(y) AS s
      FROM obs GROUP BY 1, 2, 3
    ),
    means AS (
      SELECT segment,
             max(CASE WHEN treated AND post = 1 THEN (s * 1000000) // n
                 END) AS m11,
             max(CASE WHEN treated AND post = 0 THEN (s * 1000000) // n
                 END) AS m10,
             max(CASE WHEN NOT treated AND post = 1 THEN (s * 1000000) // n
                 END) AS m01,
             max(CASE WHEN NOT treated AND post = 0 THEN (s * 1000000) // n
                 END) AS m00,
             max(CASE WHEN treated AND post = 1 THEN n END) AS n11,
             max(CASE WHEN treated AND post = 0 THEN n END) AS n10,
             max(CASE WHEN NOT treated AND post = 1 THEN n END) AS n01,
             max(CASE WHEN NOT treated AND post = 0 THEN n END) AS n00
      FROM cells GROUP BY segment
    )
    SELECT segment, CAST(n11 AS BIGINT) AS n11, CAST(n10 AS BIGINT) AS n10,
           CAST(n01 AS BIGINT) AS n01, CAST(n00 AS BIGINT) AS n00,
           CAST(m11 - m10 - m01 + m00 AS BIGINT) AS did_e6
    FROM means ORDER BY segment
    """,
)
def diff_in_diff_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimation per segment — the
    workhorse causal design for staggered product rollouts: treated
    units (every 5th) receive a +12 effect only in the post period, on
    top of a unit fixed effect and a +7 common time trend that DiD
    exists to cancel; the estimate must land near 12 (up to the md5
    noise), and both engines must agree on it EXACTLY because each
    cell mean is the shared e6 truncating division. Spark: one
    map-side-combining groupBy to the 2x2xK cells, then a pivot-style
    conditional agg — the estimator never sees row-level data twice.
    The parallel-trends arithmetic (m01 - m00 vs the trend) is left
    visible in the four cell means' counts."""
    ev = _t(spark, sf_dir, "events")
    eid = F.col("event_id").cast("string")
    unit = F.pmod(F.col("user_id"), F.lit(200))

    def _h(prefix: str, col, chars: int) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(prefix), col).cast("binary")), 1, chars
            ),
            16,
            10,
        ).cast("long")

    post = _h("ddp:", eid, 4).cast("int") % 2
    treated = unit % 5 == 0
    y = (
        _h("ddb:", unit.cast("string"), 6) % 50
        + 7 * post
        + 12 * F.when(treated, 1).otherwise(0) * post
        + _h("ddn:", eid, 4) % 5
    )
    obs = ev.select(
        F.col("event_type").alias("segment"),
        treated.alias("treated"),
        post.alias("post"),
        y.alias("y"),
    )
    cells = obs.groupBy("segment", "treated", "post").agg(
        F.count("*").alias("n"), F.sum("y").alias("s")
    )
    m = F.expr("(s * 1000000) div n")

    def pick(tr, po, col):
        return F.max(
            F.when((F.col("treated") == tr) & (F.col("post") == po), col)
        )

    means = cells.groupBy("segment").agg(
        pick(True, 1, m).alias("m11"),
        pick(True, 0, m).alias("m10"),
        pick(False, 1, m).alias("m01"),
        pick(False, 0, m).alias("m00"),
        pick(True, 1, F.col("n")).cast("long").alias("n11"),
        pick(True, 0, F.col("n")).cast("long").alias("n10"),
        pick(False, 1, F.col("n")).cast("long").alias("n01"),
        pick(False, 0, F.col("n")).cast("long").alias("n00"),
    )
    return means.select(
        "segment", "n11", "n10", "n01", "n00",
        (F.col("m11") - F.col("m10") - F.col("m01") + F.col("m00"))
        .cast("long")
        .alias("did_e6"),
    ).orderBy("segment")


# --------------------------------------------- seat apportionment

_PARTY_SQL = """CASE WHEN k < 1 THEN 0 WHEN k < 3 THEN 1 WHEN k < 6 THEN 2
              WHEN k < 10 THEN 3 WHEN k < 15 THEN 4 WHEN k < 21 THEN 5
              WHEN k < 28 THEN 6 WHEN k < 36 THEN 7 ELSE 8 END"""


@register_extra(
    "seat_allocation_methods",
    f"""
    WITH k0 AS (
      SELECT ('0x' || substr(md5('pty:' || event_id), 1, 4))::INT % 45
        AS k FROM events
    ),
    votes AS (SELECT {_PARTY_SQL} AS party, count(*) AS v
              FROM k0 GROUP BY 1),
    tot AS (SELECT sum(v) AS n FROM votes),
    ham0 AS (
      SELECT party, v, (v * 100) // (SELECT n FROM tot) AS base,
             (v * 100) % (SELECT n FROM tot) AS rem FROM votes
    ),
    hamr AS (
      SELECT *, row_number() OVER (ORDER BY rem DESC, party) AS rk,
             100 - sum(base) OVER () AS leftover FROM ham0
    ),
    ham AS (SELECT party,
                   base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                     AS seats FROM hamr),
    dh0 AS (SELECT party, v, d.range + 1 AS d,
                   v * (232792560 // (d.range + 1)) AS key
            FROM votes, range(25) d),
    dhr AS (SELECT party,
                   row_number() OVER (ORDER BY key DESC, party, d) AS rk
            FROM dh0),
    dh AS (SELECT party, count(*) AS seats FROM dhr WHERE rk <= 100
           GROUP BY party),
    hh0 AS (SELECT party, v, d.range + 1 AS n,
                   v * v * (232792560 // ((d.range + 1) * (d.range + 2)))
                     AS key
            FROM votes, range(25) d),
    hhr AS (SELECT party,
                   row_number() OVER (ORDER BY key DESC, party, n) AS rk
            FROM hh0),
    hh AS (SELECT party,
                  1 + count(CASE WHEN rk <= 100 - 9 THEN 1 END) AS seats
           FROM hhr GROUP BY party)
    SELECT v.party, CAST(v.v AS BIGINT) AS votes,
           CAST(ham.seats AS BIGINT) AS hamilton,
           CAST(dh.seats AS BIGINT) AS dhondt,
           CAST(hh.seats AS BIGINT) AS hhill
    FROM votes v JOIN ham USING (party) JOIN dh USING (party)
                 JOIN hh USING (party)
    ORDER BY party
    """,
)
def seat_allocation_methods(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proportional apportionment, three classical methods side by
    side over a deliberately skewed 9-party vote (sizes ~1:9):
    Hamilton largest-remainder, D'Hondt highest-averages (visible
    large-party bias — it hands the top party the seat Hamilton gives
    a mid party), and Huntington-Hill (the US House method, geometric-
    mean divisors). The same machinery allocates sampler quotas and
    shard counts proportionally. EVERYTHING is exact integers: the
    D'Hondt quotient sort key is v * (LCM(1..20)/d) (d divides the
    LCM, so the division is exact), and Huntington-Hill's sqrt(n(n+1))
    divisor is squared away as v^2 * (LCM/(n(n+1))) — no float ever
    ranks a seat. Spark mirrors the three rankings with windows over
    the 9-row aggregate (driver-scale by construction — the 100 TB
    part is the one groupBy producing the vote counts)."""
    ev = _t(spark, sf_dir, "events")
    k = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("pty:"), F.col("event_id").cast("string")
                    ).cast("binary")
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("int")
        % 45
    )
    votes = (
        ev.select(k.alias("k"))
        .select(F.expr(_PARTY_SQL).alias("party"))
        .groupBy("party")
        .agg(F.count("*").alias("v"))
    )
    tot = votes.agg(F.sum("v").alias("n"))
    ham0 = votes.crossJoin(F.broadcast(tot)).select(
        "party", "v",
        F.expr("(v * 100) div n").alias("base"),
        F.expr("(v * 100) % n").alias("rem"),
    )
    wglob = Window.orderBy(F.col("rem").desc(), "party")
    hamr = ham0.select(
        "party", "base",
        F.row_number().over(wglob).alias("rk"),
        (100 - F.sum("base").over(
            Window.partitionBy(F.lit(1))
        )).alias("leftover"),
    )
    ham = hamr.select(
        "party",
        (F.col("base")
         + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0))
        .alias("hamilton"),
    )
    ds = spark.range(25).select((F.col("id") + 1).alias("d"))
    dh0 = votes.crossJoin(F.broadcast(ds)).select(
        "party", "d",
        (F.col("v") * F.expr("232792560 div d")).alias("key"),
    )
    dhr = dh0.select(
        "party",
        F.row_number()
        .over(Window.orderBy(F.col("key").desc(), "party", "d"))
        .alias("rk"),
    )
    dh = (
        dhr.filter(F.col("rk") <= 100)
        .groupBy("party")
        .agg(F.count("*").alias("dhondt"))
    )
    hh0 = votes.crossJoin(F.broadcast(ds)).select(
        "party", F.col("d").alias("n2"),
        (F.col("v") * F.col("v")
         * F.expr("232792560 div (d * (d + 1))")).alias("key"),
    )
    hhr = hh0.select(
        "party",
        F.row_number()
        .over(Window.orderBy(F.col("key").desc(), "party", "n2"))
        .alias("rk"),
    )
    hh = hhr.groupBy("party").agg(
        (1 + F.count(F.when(F.col("rk") <= 100 - 9, 1))).alias("hhill")
    )
    return (
        votes.join(ham, "party")
        .join(dh, "party")
        .join(hh, "party")
        .select(
            "party",
            F.col("v").cast("long").alias("votes"),
            F.col("hamilton").cast("long"),
            F.col("dhondt").cast("long"),
            F.col("hhill").cast("long"),
        )
        .orderBy("party")
    )


# --------------------------------------------- Schulze beatpaths


@register_extra(
    "schulze_pairwise_strengths",
    """
    WITH ballots AS (
      SELECT event_id AS e FROM events WHERE event_id % 3 = 0
    ),
    rk AS (
      SELECT e, c.range AS c,
             ('0x' || substr(md5('sv:' || e || ':' || c.range),
                             1, 8))::BIGINT AS r
      FROM ballots, range(8) c
    ),
    d AS (
      SELECT a.c AS i, b.c AS j,
             count(*) FILTER ((a.r, a.c) < (b.r, b.c)) AS dv
      FROM rk a JOIN rk b ON a.e = b.e
      GROUP BY 1, 2
    ),
    p0 AS MATERIALIZED (
      SELECT a.i, a.j,
             CASE WHEN a.i <> a.j AND a.dv > b.dv THEN a.dv ELSE 0 END AS v
      FROM d a JOIN d b ON b.i = a.j AND b.j = a.i
    ),
    
    p1 AS MATERIALIZED (
      SELECT a.i, a.j,
             greatest(a.v, coalesce(least(ik.v, kj.v), 0)) AS v
      FROM p0 a
      LEFT JOIN p0 ik ON ik.i = a.i AND ik.j = 0
      LEFT JOIN p0 kj ON kj.i = 0 AND kj.j = a.j
    ),
    p2 AS MATERIALIZED (
      SELECT a.i, a.j,
             greatest(a.v, coalesce(least(ik.v, kj.v), 0)) AS v
      FROM p1 a
      LEFT JOIN p1 ik ON ik.i = a.i AND ik.j = 1
      LEFT JOIN p1 kj ON kj.i = 1 AND kj.j = a.j
    ),
    p3 AS MATERIALIZED (
      SELECT a.i, a.j,
             greatest(a.v, coalesce(least(ik.v, kj.v), 0)) AS v
      FROM p2 a
      LEFT JOIN p2 ik ON ik.i = a.i AND ik.j = 2
      LEFT JOIN p2 kj ON kj.i = 2 AND kj.j = a.j
    ),
    p4 AS MATERIALIZED (
      SELECT a.i, a.j,
             greatest(a.v, coalesce(least(ik.v, kj.v), 0)) AS v
      FROM p3 a
      LEFT JOIN p3 ik ON ik.i = a.i AND ik.j = 3
      LEFT JOIN p3 kj ON kj.i = 3 AND kj.j = a.j
    ),
    p5 AS MATERIALIZED (
      SELECT a.i, a.j,
             greatest(a.v, coalesce(least(ik.v, kj.v), 0)) AS v
      FROM p4 a
      LEFT JOIN p4 ik ON ik.i = a.i AND ik.j = 4
      LEFT JOIN p4 kj ON kj.i = 4 AND kj.j = a.j
    ),
    p6 AS MATERIALIZED (
      SELECT a.i, a.j,
             greatest(a.v, coalesce(least(ik.v, kj.v), 0)) AS v
      FROM p5 a
      LEFT JOIN p5 ik ON ik.i = a.i AND ik.j = 5
      LEFT JOIN p5 kj ON kj.i = 5 AND kj.j = a.j
    ),
    p7 AS MATERIALIZED (
      SELECT a.i, a.j,
             greatest(a.v, coalesce(least(ik.v, kj.v), 0)) AS v
      FROM p6 a
      LEFT JOIN p6 ik ON ik.i = a.i AND ik.j = 6
      LEFT JOIN p6 kj ON kj.i = 6 AND kj.j = a.j
    ),
    p8 AS MATERIALIZED (
      SELECT a.i, a.j,
             greatest(a.v, coalesce(least(ik.v, kj.v), 0)) AS v
      FROM p7 a
      LEFT JOIN p7 ik ON ik.i = a.i AND ik.j = 7
      LEFT JOIN p7 kj ON kj.i = 7 AND kj.j = a.j
    )
    SELECT d.i, d.j, CAST(d.dv AS BIGINT) AS prefer_ij,
           CAST(p8.v AS BIGINT) AS strength
    FROM d JOIN p8 ON p8.i = d.i AND p8.j = d.j
    WHERE d.i <> d.j
    ORDER BY d.i, d.j
""",
)
def schulze_pairwise_strengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schulze-method pairwise beatpath strengths — the Condorcet
    completion used by real elections (Debian, Wikimedia): from the
    pairwise-preference matrix d[i][j] (md5-ranked ballots, exact
    lexicographic tie-break), strengths are WIDEST PATHS in the
    defeat graph: p[i][j] = max over paths of the minimum defeat along
    the path, computed by the max-min Floyd-Warshall closure. Spark
    iterates the 8 pivot rounds as joins against the k-column/k-row
    slices of the 64-pair table (each round two broadcast-size joins;
    the 100 TB part is the ballot aggregation into d, one shuffle);
    the oracle unrolls the same 8 pivots as MATERIALIZED CTEs. Output
    pins the full preference matrix AND the full strength matrix (56
    rows each way), not just the winner."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") % 3 == 0)
    cands = spark.range(8).select(F.col("id").alias("c"))
    rk = ev.select(F.col("event_id").alias("e")).crossJoin(cands).select(
        "e", "c",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("sv:"), F.col("e").cast("string"),
                        F.lit(":"), F.col("c").cast("string"),
                    ).cast("binary")
                ),
                1, 8,
            ),
            16, 10,
        ).cast("long").alias("r"),
    )
    a = rk.select("e", F.col("c").alias("i"), F.col("r").alias("ra"))
    b = rk.select("e", F.col("c").alias("j"), F.col("r").alias("rb"))
    d = (
        a.join(b, "e")
        .groupBy("i", "j")
        .agg(
            F.count(
                F.when(
                    (F.col("ra") < F.col("rb"))
                    | ((F.col("ra") == F.col("rb"))
                       & (F.col("i") < F.col("j"))),
                    1,
                )
            ).alias("dv")
        )
    )
    drev = d.select(
        F.col("i").alias("j"), F.col("j").alias("i"),
        F.col("dv").alias("dr"),
    )
    p = d.join(drev, ["i", "j"]).select(
        "i", "j",
        F.when(
            (F.col("i") != F.col("j")) & (F.col("dv") > F.col("dr")),
            F.col("dv"),
        ).otherwise(F.lit(0)).alias("v"),
    ).localCheckpoint(eager=True)
    for k in range(8):
        ik = p.filter(F.col("j") == k).select(
            "i", F.col("v").alias("vik")
        )
        kj = p.filter(F.col("i") == k).select(
            "j", F.col("v").alias("vkj")
        )
        p = (
            p.join(ik, "i", "left")
            .join(kj, "j", "left")
            .select(
                "i", "j",
                F.greatest(
                    "v",
                    F.coalesce(F.least("vik", "vkj"), F.lit(0)),
                ).alias("v"),
            )
            .localCheckpoint(eager=True)
        )
    return (
        d.join(p, ["i", "j"])
        .filter(F.col("i") != F.col("j"))
        .select(
            "i", "j",
            F.col("dv").cast("long").alias("prefer_ij"),
            F.col("v").cast("long").alias("strength"),
        )
        .orderBy("i", "j")
    )


# --------------------------------------------- data valuation

_SHAP_W = "CASE k WHEN 0 THEN 5040 WHEN 1 THEN 720 WHEN 2 THEN 240" \
          " WHEN 3 THEN 144 WHEN 4 THEN 144 WHEN 5 THEN 240" \
          " WHEN 6 THEN 720 ELSE 5040 END"
_SHAP_SRC = "('src0','src1','src2','src3','src4','src5','src6','src7')"


@register_extra(
    "shapley_source_valuation",
    f"""
    WITH masks AS (
      SELECT CAST(substr(source, 4) AS INT) AS p,
             bit_or(1 << least(n_chars // 50, 11)) AS mask,
             count(*) AS ndocs
      FROM documents WHERE source IN {_SHAP_SRC}
      GROUP BY 1
    ),
    subsets AS (SELECT s.range AS s FROM range(256) s),
    vs AS (
      SELECT s, coalesce(bit_count(bit_or(
               CASE WHEN (s >> p) & 1 = 1 THEN mask END)), 0) AS v
      FROM subsets LEFT JOIN masks ON (s >> p) & 1 = 1
      GROUP BY s
    ),
    w AS (SELECT k.range AS k, {_SHAP_W.replace('k ', 'k.range ')} AS wt
          FROM range(8) k),
    sh AS (
      SELECT m.p, sum(w.wt * (v2.v - v1.v)) AS shapley_x40320
      FROM masks m
      JOIN vs v1 ON (v1.s >> m.p) & 1 = 0
      JOIN vs v2 ON v2.s = v1.s + (1 << m.p)
      JOIN w ON w.k = bit_count(v1.s)
      GROUP BY m.p
    )
    SELECT sh.p AS source_id, CAST(m.ndocs AS BIGINT) AS n_docs,
           CAST(bit_count(m.mask) AS BIGINT) AS own_coverage,
           CAST(sh.shapley_x40320 AS BIGINT) AS shapley_x40320
    FROM sh JOIN masks m USING (p) ORDER BY source_id
    """,
)
def shapley_source_valuation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Shapley data valuation over 8 corpus sources — the
    game-theoretic answer to 'which data source earns its keep':
    the coalition value v(S) is the length-bucket COVERAGE of the
    union of sources (a submodular coverage game computed FROM the
    corpus: one distributed bit_or groupBy builds each source's
    12-bit bucket mask), and each source's Shapley value is the
    factorial-weighted marginal over all 2^7 subsets — scaled by 8!
    so every number is an exact integer, and the efficiency axiom
    (sum = 8! * v(full)) holds to the last digit in both engines.
    Spark enumerates subsets as a 256-row range with bit-op joins,
    all JVM; the oracle mirrors it relationally. The pattern is the
    honest exact baseline that sampled/Monte-Carlo Shapley
    estimators (what you'd run for 100 sources) are validated
    against."""
    docs = _t(spark, sf_dir, "documents").filter(
        F.col("source").isin([f"src{i}" for i in range(8)])
    )
    masks = docs.select(
        F.substring("source", 4, 2).cast("int").alias("p"),
        F.expr(
            "shiftleft(1, CAST(least(n_chars div 50, 11) AS INT))"
        ).alias("bit"),
    ).groupBy("p").agg(
        F.expr("bit_or(bit)").alias("mask"), F.count("*").alias("ndocs")
    )
    subsets = spark.range(256).select(F.col("id").alias("s"))
    vs = (
        subsets.join(
            F.broadcast(masks),
            F.expr("(s >> p) & 1 = 1"),
            "left",
        )
        .groupBy("s")
        .agg(
            F.coalesce(
                F.expr("bit_count(bit_or(mask))"), F.lit(0)
            ).alias("v")
        )
    )
    v1 = vs.select(F.col("s").alias("s1"), F.col("v").alias("va"))
    v2 = vs.select(F.col("s").alias("s2"), F.col("v").alias("vb"))
    sh = (
        F.broadcast(masks)
        .join(v1, F.expr("(s1 >> p) & 1 = 0"))
        .join(v2, F.expr("s2 = s1 + (1 << p)"))
        .select(
            "p", "ndocs", "mask",
            (
                F.expr(f"({_SHAP_W.replace('k ', 'bit_count(s1) ')})")
                * (F.col("vb") - F.col("va"))
            ).alias("term"),
        )
        .groupBy("p", "ndocs", "mask")
        .agg(F.sum("term").alias("shapley_x40320"))
    )
    return sh.select(
        F.col("p").alias("source_id"),
        F.col("ndocs").cast("long").alias("n_docs"),
        F.expr("bit_count(mask)").cast("long").alias("own_coverage"),
        F.col("shapley_x40320").cast("long"),
    ).orderBy("source_id")


@register_extra(
    "banzhaf_power_index",
    f"""
    WITH wts AS (
      SELECT CAST(substr(source, 4) AS INT) AS p, sum(n_chars) AS wt
      FROM documents WHERE source IN {_SHAP_SRC}
      GROUP BY 1
    ),
    q AS (SELECT sum(wt) // 2 + 1 AS quota FROM wts),
    subsets AS (SELECT s.range AS s FROM range(256) s),
    ws AS (
      SELECT s, coalesce(sum(CASE WHEN (s >> p) & 1 = 1 THEN wt END), 0)
               AS w
      FROM subsets LEFT JOIN wts ON (s >> p) & 1 = 1
      GROUP BY s
    ),
    sw AS (
      SELECT wts.p,
             count(*) FILTER (ws.w < q.quota
                              AND ws.w + wts.wt >= q.quota) AS swings
      FROM wts, q
      JOIN ws ON (ws.s >> wts.p) & 1 = 0
      GROUP BY wts.p
    ),
    totsw AS (SELECT sum(swings) AS t FROM sw)
    SELECT sw.p AS source_id, CAST(w2.wt AS BIGINT) AS weight,
           CAST(sw.swings AS BIGINT) AS swings,
           CAST((sw.swings * 1000000) // (SELECT t FROM totsw) AS BIGINT)
             AS banzhaf_share_e6
    FROM sw JOIN wts w2 ON w2.p = sw.p ORDER BY source_id
    """,
)
def banzhaf_power_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banzhaf voting power over the same 8 sources as a WEIGHTED
    majority game (weights = each source's total characters, quota =
    strict majority): a source's power is the number of coalitions
    where it is PIVOTAL (losing without it, winning with it) — the
    standard demonstration that voting weight and voting POWER are
    different quantities, and the second canonical index next to
    shapley_source_valuation's. Same exact 2^8 enumeration: subset
    weights via one bit-op join + sum, pivotality as a count filter,
    shares e6-quantized. Spark keeps the whole lattice as a 256-row
    broadcast-joined range; the distributed part is the per-source
    weight aggregation."""
    docs = _t(spark, sf_dir, "documents").filter(
        F.col("source").isin([f"src{i}" for i in range(8)])
    )
    wts = docs.select(
        F.substring("source", 4, 2).cast("int").alias("p"), "n_chars"
    ).groupBy("p").agg(F.sum("n_chars").alias("wt"))
    q = wts.agg((F.expr("sum(wt) div 2") + 1).alias("quota"))
    subsets = spark.range(256).select(F.col("id").alias("s"))
    ws = (
        subsets.join(F.broadcast(wts), F.expr("(s >> p) & 1 = 1"), "left")
        .groupBy("s")
        .agg(
            F.coalesce(F.sum("wt"), F.lit(0).cast("long")).alias("w")
        )
    )
    sw = (
        F.broadcast(wts)
        .crossJoin(F.broadcast(q))
        .join(ws, F.expr("(s >> p) & 1 = 0"))
        .groupBy("p", "wt")
        .agg(
            F.count(
                F.when(
                    (F.col("w") < F.col("quota"))
                    & (F.col("w") + F.col("wt") >= F.col("quota")),
                    1,
                )
            ).alias("swings")
        )
    )
    tot = sw.agg(F.sum("swings").alias("t"))
    return (
        sw.crossJoin(F.broadcast(tot))
        .select(
            F.col("p").alias("source_id"),
            F.col("wt").cast("long").alias("weight"),
            F.col("swings").cast("long").alias("swings"),
            F.expr("(swings * 1000000) div t")
            .cast("long")
            .alias("banzhaf_share_e6"),
        )
        .orderBy("source_id")
    )


# ---------------------------------------------- secretary stopping rule


@register_extra(
    "secretary_stopping_replay",
    """
    WITH c0 AS (
      SELECT user_id % 16 AS s,
             ('0x' || substr(md5('sec:' || CAST(event_id AS VARCHAR)),
                             1, 5))::BIGINT % 10000 AS v0,
             row_number() OVER (PARTITION BY user_id % 16
                                ORDER BY event_id) - 1 AS x
      FROM events
    ),
    c AS (SELECT s, x, v0 * 100 + x AS v FROM c0 WHERE x < 40),
    pm AS (SELECT s, max(v) AS mk FROM c WHERE x < 14 GROUP BY s),
    ch AS (
      SELECT c.s, min(c.x) AS cx
      FROM c JOIN pm USING (s)
      WHERE c.x >= 14 AND c.v > pm.mk
      GROUP BY c.s
    ),
    best AS (SELECT s, max_by(x, v) AS bx FROM c GROUP BY s),
    univ AS (SELECT DISTINCT s FROM c)
    SELECT u.s, CAST(coalesce(ch.cx, 39) AS BIGINT) AS chosen_x,
           coalesce(ch.cx, 39) = best.bx AS is_best
    FROM univ u
    LEFT JOIN ch ON ch.s = u.s
    JOIN best ON best.s = u.s
    ORDER BY u.s
    """,
)
def secretary_stopping_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Secretary-problem (37% rule) optimal-stopping replay — the
    sequential-decision benchmark for irrevocable choices (hiring,
    best-offer acceptance, online ad slates): observe the first
    n/e = 14 of 40 candidates, then accept the FIRST one beating all of
    them (else settle for the last). Entirely window/aggregate algebra
    — a per-series max over the observation prefix, a conditional min
    over the decision suffix, and an argmax for ground truth (values
    packed v*100+x so every comparison is a strict total order on both
    engines; max_by is then deterministic). One shuffle per agg,
    partitioned by series — the replay shape for millions of
    independent decision streams. Reports each stream's stopped
    position and whether the rule actually found the best candidate."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("s").orderBy("event_id")
    c = (
        ev.select(
            F.pmod(F.col("user_id"), F.lit(16)).alias("s"),
            "event_id",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("sec:"),
                                F.col("event_id").cast("string"),
                            ).cast("binary")
                        ),
                        1,
                        5,
                    ),
                    16,
                    10,
                ).cast("long")
                % 10000
            ).alias("v0"),
        )
        .withColumn("x", F.row_number().over(w) - 1)
        .filter(F.col("x") < 40)
        .select("s", "x", (F.col("v0") * 100 + F.col("x")).alias("v"))
    )
    pm = c.filter(F.col("x") < 14).groupBy("s").agg(
        F.max("v").alias("mk")
    )
    ch = (
        c.join(pm, "s")
        .filter((F.col("x") >= 14) & (F.col("v") > F.col("mk")))
        .groupBy("s")
        .agg(F.min("x").alias("cx"))
    )
    best = c.groupBy("s").agg(F.max_by("x", "v").alias("bx"))
    univ = c.select("s").distinct()
    return (
        univ.join(ch, "s", "left")
        .join(best, "s")
        .select(
            "s",
            F.coalesce("cx", F.lit(39)).cast("long").alias("chosen_x"),
            (F.coalesce("cx", F.lit(39)) == F.col("bx")).alias(
                "is_best"
            ),
        )
        .orderBy("s")
    )


# ----------------------------------------------- Wilson-bound ranking


@register_extra(
    "wilson_lb_ranking",
    """
    WITH tr AS (
      SELECT user_id % 50 AS item,
             CASE WHEN ('0x' || substr(md5('wl:'
                || CAST(event_id AS VARCHAR)), 1, 4))::BIGINT
                % 100 < 35 + (user_id % 50) THEN 1 ELSE 0 END AS pos
      FROM events
    ),
    agg AS (
      SELECT item, count(*) AS n, sum(pos) AS pos FROM tr GROUP BY 1
    ),
    sc AS (
      SELECT item, n, pos,
             CAST(floor(sqrt(CAST(
               (10000 * (pos * (n - pos) + n)) // n AS DOUBLE)))
               AS BIGINT) AS s
      FROM agg
    )
    SELECT item, CAST(n AS BIGINT) AS n, CAST(pos AS BIGINT) AS pos,
           CAST((100 * (pos + 2) - 2 * s) // (n + 4) AS BIGINT)
             AS lb_centi,
           CAST(row_number() OVER (
             ORDER BY (100 * (pos + 2) - 2 * s) // (n + 4) DESC, item)
             AS BIGINT) AS rank
    FROM sc ORDER BY item
    """,
)
def wilson_lb_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson-score lower-bound ranking (z=2) — 'how not to sort by
    average rating' (Reddit's best-comment sort, Evan Miller 2009):
    rank items by the LOWER confidence bound of their positive rate so
    sparse items can't crowd out well-measured ones. Exact-integer
    discipline: with z=2 the bound is
    (pos+2 - 2*sqrt((pos*(n-pos)+n)/n)) / (n+4); the sqrt argument is
    pre-scaled by 1e4 and floor(IEEE sqrt) of an integer < 6.7e7 is
    provably exact (correctly-rounded sqrt can only miss floor when
    the root exceeds 2^13), so lb_centi and the rank are
    hash-stable on both engines. Per-item positive rates are planted
    to RISE with item id while trial counts stay equal — the bound
    ranking must recover that ordering. One partial-agg shuffle plus
    a 50-row window; JVM end-to-end."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    tr = ev.select(
        F.pmod(F.col("user_id"), F.lit(50)).alias("item"),
        F.when(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("wl:"), F.col("event_id").cast("string")
                        ).cast("binary")
                    ),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("long")
            % 100
            < 35 + F.pmod(F.col("user_id"), F.lit(50)),
            1,
        )
        .otherwise(0)
        .alias("pos"),
    )
    agg = tr.groupBy("item").agg(
        F.count(F.lit(1)).alias("n"), F.sum("pos").alias("pos")
    )
    sc = agg.withColumn(
        "s",
        F.expr(
            "CAST(floor(sqrt(CAST((10000 * (pos * (n - pos) + n))"
            " div n AS DOUBLE))) AS LONG)"
        ),
    ).withColumn(
        "lb_centi", F.expr("(100 * (pos + 2) - 2 * s) div (n + 4)")
    )
    w = Window.orderBy(F.desc("lb_centi"), "item")
    return sc.select(
        "item",
        F.col("n").cast("long").alias("n"),
        F.col("pos").cast("long").alias("pos"),
        F.col("lb_centi").cast("long").alias("lb_centi"),
        F.row_number().over(w).cast("long").alias("rank"),
    ).orderBy("item")


# ----------------------------------------------- double-auction match


@register_extra(
    "double_auction_matching",
    """
    WITH o AS (
      SELECT event_id AS oid,
             ('0x' || substr(md5('das:' || CAST(event_id AS VARCHAR)),
                             1, 4))::BIGINT % 2 AS side,
             ('0x' || substr(md5('dap:' || CAST(event_id AS VARCHAR)),
                             1, 5))::BIGINT % 1000 AS price
      FROM events
      WHERE ('0x' || substr(md5('dag:' || CAST(event_id AS VARCHAR)),
                            1, 4))::BIGINT % 19 = 0
    ),
    bids AS (
      SELECT oid AS bid_id, price AS bid_price,
             row_number() OVER (ORDER BY price DESC, oid) AS k
      FROM o WHERE side = 0
    ),
    asks AS (
      SELECT oid AS ask_id, price AS ask_price,
             row_number() OVER (ORDER BY price ASC, oid) AS k
      FROM o WHERE side = 1
    )
    SELECT b.k AS trade_k, b.bid_id, a.ask_id,
           b.bid_price, a.ask_price,
           (b.bid_price + a.ask_price) // 2 AS clear_price
    FROM bids b JOIN asks a USING (k)
    WHERE b.bid_price >= a.ask_price
    ORDER BY trade_k
    """,
)
def double_auction_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Call-market double auction (k=0.5 pricing) — the batch order-
    matching every opening/closing cross runs: sort bids descending and
    asks ascending, pair them rank-for-rank, and trade while the k-th
    bid still meets the k-th ask, clearing each pair at the integer
    midpoint. Two range-partitioned sorts (the rank windows) + one
    equi-join on rank + the crossing filter — no sequential state at
    all, which is why call auctions batch-scale where continuous books
    don't. md5-derived unit orders (side + price); all ties pinned by
    order id; midpoint floor-divides exactly on both engines. The
    greedy rank-pairing is provably the welfare-maximizing uniform
    match for unit quantities."""
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

    o = ev.filter(_h("dag:", 4) % 19 == 0).select(
        F.col("event_id").alias("oid"),
        (_h("das:", 4) % 2).alias("side"),
        (_h("dap:", 5) % 1000).alias("price"),
    )
    bids = (
        o.filter(F.col("side") == 0)
        .select(
            F.col("oid").alias("bid_id"),
            F.col("price").alias("bid_price"),
        )
        .withColumn(
            "k",
            F.row_number().over(
                Window.orderBy(F.desc("bid_price"), "bid_id")
            ),
        )
    )
    asks = (
        o.filter(F.col("side") == 1)
        .select(
            F.col("oid").alias("ask_id"),
            F.col("price").alias("ask_price"),
        )
        .withColumn(
            "k",
            F.row_number().over(
                Window.orderBy(F.asc("ask_price"), "ask_id")
            ),
        )
    )
    return (
        bids.join(asks, "k")
        .filter(F.col("bid_price") >= F.col("ask_price"))
        .select(
            F.col("k").cast("long").alias("trade_k"),
            "bid_id",
            "ask_id",
            "bid_price",
            "ask_price",
            F.expr("(bid_price + ask_price) div 2").alias("clear_price"),
        )
        .orderBy("trade_k")
    )


# ------------------------------------------------- 2-var LP vertices


@register_extra(
    "simplex_2var_lp",
    """
    WITH hc AS (
      SELECT i,
             ('0x' || substr(md5('la:' || CAST(i AS VARCHAR)),
                             1, 4))::BIGINT % 19 - 9 AS a,
             ('0x' || substr(md5('lb:' || CAST(i AS VARCHAR)),
                             1, 4))::BIGINT % 19 - 9 AS b,
             ('0x' || substr(md5('lc:' || CAST(i AS VARCHAR)),
                             1, 4))::BIGINT % 90 + 10 AS c
      FROM (SELECT unnest(generate_series(2, 11)) AS i)
    ),
    cons AS (
      SELECT CAST(0 AS BIGINT) AS i, CAST(-1 AS BIGINT) AS a,
             CAST(0 AS BIGINT) AS b, CAST(0 AS BIGINT) AS c
      UNION ALL
      SELECT 1, 0, -1, 0
      UNION ALL
      SELECT i, a, b, c FROM hc WHERE a <> 0 OR b <> 0
    ),
    verts AS (
      SELECT p.i AS vi, q.i AS vj,
             p.a * q.b - q.a * p.b AS det,
             p.c * q.b - q.c * p.b AS nx,
             p.a * q.c - q.a * p.c AS ny
      FROM cons p JOIN cons q ON p.i < q.i
      WHERE p.a * q.b - q.a * p.b <> 0
    ),
    feas AS (
      SELECT v.vi, v.vj, v.det, v.nx, v.ny
      FROM verts v
      WHERE NOT EXISTS (
        SELECT 1 FROM cons k
        WHERE (k.a * v.nx + k.b * v.ny - k.c * v.det)
              * (CASE WHEN v.det > 0 THEN 1 ELSE -1 END) > 0)
    ),
    scored AS (
      SELECT vi, vj,
             CASE WHEN det > 0 THEN (1000 * nx) // det
                  ELSE (-1000 * nx) // (-det) END AS x_milli,
             CASE WHEN det > 0 THEN (1000 * ny) // det
                  ELSE (-1000 * ny) // (-det) END AS y_milli,
             CASE WHEN det > 0
                  THEN (1000 * (3 * nx + 2 * ny)) // det
                  ELSE (-1000 * (3 * nx + 2 * ny)) // (-det)
             END AS obj_milli
      FROM feas
    )
    SELECT CAST(vi AS BIGINT) AS vi, CAST(vj AS BIGINT) AS vj,
           CAST(x_milli AS BIGINT) AS x_milli,
           CAST(y_milli AS BIGINT) AS y_milli,
           CAST(obj_milli AS BIGINT) AS obj_milli
    FROM (SELECT *, row_number() OVER (
            ORDER BY obj_milli DESC, vi, vj) AS rn FROM scored)
    WHERE rn = 1
    """,
)
def simplex_2var_lp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-variable linear program solved EXACTLY by vertex enumeration —
    the geometric fact beneath the simplex method (an optimum sits on
    a vertex = a constraint-pair intersection): enumerate all pairs,
    solve each 2x2 by Cramer integers (no division — the vertex is
    kept as the rational (nx/det, ny/det)), test feasibility against
    every half-plane by sign-corrected cross-multiplication, and take
    the best objective 3x+2y. All comparisons exact-integer; the milli
    floors only render the winner (objective provably >= 0 here since
    the origin is feasible, so trunc == floor on both engines). Spark
    shape: constraint pairs fan out map-side against a broadcast
    constraint list — the exhaustive-small-instance pattern of the
    Shapley/knapsack rows, which is exactly how one solves millions of
    INDEPENDENT small LPs (per-user budgets, per-cell blends) at
    scale. md5-derived constraints + x,y >= 0."""
    cons_rows = [(0, -1, 0, 0), (1, 0, -1, 0)]
    hc = spark.range(2, 12).select(F.col("id").alias("i"))

    def _h(prefix: str) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(prefix), F.col("i").cast("string")
                    ).cast("binary")
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")

    hcd = hc.select(
        "i",
        (_h("la:") % 19 - 9).alias("a"),
        (_h("lb:") % 19 - 9).alias("b"),
        (_h("lc:") % 90 + 10).alias("c"),
    ).filter((F.col("a") != 0) | (F.col("b") != 0))
    base = spark.createDataFrame(cons_rows, "i long, a long, b long, c long")
    cons = base.unionByName(hcd).localCheckpoint(eager=True)
    p = cons.select(
        F.col("i").alias("vi"), F.col("a").alias("pa"),
        F.col("b").alias("pb"), F.col("c").alias("pc"),
    )
    q = cons.select(
        F.col("i").alias("vj"), F.col("a").alias("qa"),
        F.col("b").alias("qb"), F.col("c").alias("qc"),
    )
    verts = (
        p.crossJoin(q)
        .filter(F.col("vi") < F.col("vj"))
        .select(
            "vi",
            "vj",
            (F.col("pa") * F.col("qb") - F.col("qa") * F.col("pb")).alias("det"),
            (F.col("pc") * F.col("qb") - F.col("qc") * F.col("pb")).alias("nx"),
            (F.col("pa") * F.col("qc") - F.col("qa") * F.col("pc")).alias("ny"),
        )
        .filter(F.col("det") != 0)
    )
    k = cons.select(
        F.col("a").alias("ka"), F.col("b").alias("kb"),
        F.col("c").alias("kc"),
    )
    viol = (
        verts.crossJoin(F.broadcast(k))
        .filter(
            (
                F.col("ka") * F.col("nx")
                + F.col("kb") * F.col("ny")
                - F.col("kc") * F.col("det")
            )
            * F.when(F.col("det") > 0, 1).otherwise(-1)
            > 0
        )
        .select("vi", "vj")
        .distinct()
    )
    feas = verts.join(viol, ["vi", "vj"], "left_anti")
    scored = feas.select(
        "vi",
        "vj",
        F.expr(
            "CASE WHEN det > 0 THEN (1000 * nx) div det"
            " ELSE (-1000 * nx) div (-det) END"
        ).alias("x_milli"),
        F.expr(
            "CASE WHEN det > 0 THEN (1000 * ny) div det"
            " ELSE (-1000 * ny) div (-det) END"
        ).alias("y_milli"),
        F.expr(
            "CASE WHEN det > 0 THEN (1000 * (3 * nx + 2 * ny)) div det"
            " ELSE (-1000 * (3 * nx + 2 * ny)) div (-det) END"
        ).alias("obj_milli"),
    )
    w = Window.orderBy(F.desc("obj_milli"), "vi", "vj")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("vi").cast("long").alias("vi"),
            F.col("vj").cast("long").alias("vj"),
            F.col("x_milli").cast("long").alias("x_milli"),
            F.col("y_milli").cast("long").alias("y_milli"),
            F.col("obj_milli").cast("long").alias("obj_milli"),
        )
    )


# ------------------------------------------------- epsilon-greedy bandit


@register_extra(
    "egreedy_bandit_replay",
    """
    WITH RECURSIVE streams AS (
      SELECT unnest(generate_series(0, 7)) AS s
    ),
    st(s, t, arms) AS (
      SELECT s, CAST(0 AS BIGINT),
             [{'n': CAST(0 AS BIGINT), 'w': CAST(0 AS BIGINT)},
              {'n': CAST(0 AS BIGINT), 'w': CAST(0 AS BIGINT)},
              {'n': CAST(0 AS BIGINT), 'w': CAST(0 AS BIGINT)}]
      FROM streams
      UNION ALL
      SELECT s3.s, s3.t,
             list_transform(s3.a, (x, i) ->
               CASE WHEN i = s3.ch + 1
                    THEN {'n': x.n + 1, 'w': x.w + s3.rw}
                    ELSE x END)
      FROM (
        SELECT s2.s, s2.t, s2.a, s2.ch,
               CASE WHEN ('0x' || substr(md5('br:'
                      || CAST(s2.s AS VARCHAR) || ':'
                      || CAST(s2.t AS VARCHAR) || ':'
                      || CAST(s2.ch AS VARCHAR)), 1, 4))::BIGINT % 100
                    < 30 + 20 * s2.ch THEN 1 ELSE 0 END AS rw
        FROM (
          SELECT s1.s, s1.t, s1.a,
                 CASE WHEN s1.explore = 0 THEN s1.earm
                      WHEN s1.a[1].n = 0 THEN 0
                      WHEN s1.a[2].n = 0 THEN 1
                      WHEN s1.a[3].n = 0 THEN 2
                      ELSE CASE WHEN s1.a[3].w
                                   * s1.a[s1.b01 + 1].n
                                 > s1.a[s1.b01 + 1].w * s1.a[3].n
                                THEN 2 ELSE s1.b01 END
                 END AS ch
          FROM (
            SELECT s0.s, s0.t, s0.a, s0.explore, s0.earm,
                   CASE WHEN s0.a[2].w * s0.a[1].n
                           > s0.a[1].w * s0.a[2].n
                        THEN 1 ELSE 0 END AS b01
            FROM (
              SELECT st.s, st.t + 1 AS t, st.arms AS a,
                     ('0x' || substr(md5('bx:'
                        || CAST(st.s AS VARCHAR) || ':'
                        || CAST(st.t + 1 AS VARCHAR)), 1, 4))::BIGINT
                       % 10 AS explore,
                     CAST(('0x' || substr(md5('ba:'
                        || CAST(st.s AS VARCHAR) || ':'
                        || CAST(st.t + 1 AS VARCHAR)), 1, 4))::BIGINT
                       % 3 AS INT) AS earm
              FROM st WHERE st.t < 80
            ) s0
          ) s1
        ) s2
      ) s3
    )
    SELECT s, u.i - 1 AS arm, u.x.n AS n_pulls, u.x.w AS n_wins
    FROM (
      SELECT s, unnest(list_transform(arms,
               (x, i) -> {'i': i, 'x': x})) AS u
      FROM (SELECT s, arms,
                   row_number() OVER (PARTITION BY s
                                      ORDER BY t DESC) AS rn
            FROM st) WHERE rn = 1
    )
    ORDER BY s, arm
    """,
)
def egreedy_bandit_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epsilon-greedy multi-armed bandit replay — the
    explore/exploit loop every ranking/recommendation system runs,
    replayed DETERMINISTICALLY: md5 coins decide exploration (10%),
    the explored arm, and each Bernoulli reward (arm means 30/50/70%);
    exploitation picks the best empirical mean with EXACT
    cross-multiplied fraction comparison (w_i*n_j > w_j*n_i — no
    float means ever), unpulled arms first, ties to the lower index.
    8 streams x 80 rounds; Spark runs the per-stream fold in
    applyInPandas (streams are the parallel axis — a fleet replays
    millions of user streams this way), the oracle replays the
    identical policy as a recursive list machine over the 3-arm state.
    Output: per-arm pull and win counts — the bandit should
    concentrate on arm 2."""
    streams = spark.range(0, 8).select(F.col("id").alias("s"))
    import hashlib

    def _mh(sstr: str) -> int:
        return int(hashlib.md5(sstr.encode()).hexdigest()[:4], 16)

    def _replay(key, pdf):
        import pandas as pd

        s = int(key[0])
        arms = [[0, 0], [0, 0], [0, 0]]
        for t in range(1, 81):
            if _mh(f"bx:{s}:{t}") % 10 == 0:
                ch = _mh(f"ba:{s}:{t}") % 3
            elif arms[0][0] == 0:
                ch = 0
            elif arms[1][0] == 0:
                ch = 1
            elif arms[2][0] == 0:
                ch = 2
            else:
                b01 = 1 if arms[1][1] * arms[0][0] > arms[0][1] * arms[1][0] else 0
                ch = (
                    2
                    if arms[2][1] * arms[b01][0] > arms[b01][1] * arms[2][0]
                    else b01
                )
            rw = 1 if _mh(f"br:{s}:{t}:{ch}") % 100 < 30 + 20 * ch else 0
            arms[ch][0] += 1
            arms[ch][1] += rw
        return pd.DataFrame(
            [(s, a, arms[a][0], arms[a][1]) for a in range(3)],
            columns=["s", "arm", "n_pulls", "n_wins"],
        )

    return (
        streams.groupBy("s")
        .applyInPandas(
            _replay, "s long, arm long, n_pulls long, n_wins long"
        )
        .orderBy("s", "arm")
    )


# --------------------------------------------------- integer PID loop


@register_extra(
    "pid_controller_replay",
    """
    WITH RECURSIVE loops AS (
      SELECT unnest(generate_series(0, 5)) AS l
    ),
    st(l, t, x, integ, eprev, sabse, mx) AS (
      SELECT l, CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
             CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
      FROM loops
      UNION ALL
      SELECT s1.l, s1.t,
             s1.x + s1.u + s1.d,
             s1.integ2, s1.e,
             s1.sabse + abs(s1.e),
             greatest(s1.mx, s1.x + s1.u + s1.d)
      FROM (
        SELECT s0.l, s0.t, s0.x, s0.e,
               s0.integ2,
               greatest(-40, least(40,
                 (8 * s0.e + s0.integ2 + 2 * (s0.e - s0.eprev)) // 16))
                 AS u,
               s0.d, s0.sabse, s0.mx
        FROM (
          SELECT sz.*,
                 greatest(-2000, least(2000, sz.integ + sz.e)) AS integ2
          FROM (
          SELECT st.l, st.t + 1 AS t, st.x, st.integ, st.eprev,
                 st.sabse, st.mx,
                 (CASE WHEN st.t + 1 <= 30 THEN 100 ELSE 160 END)
                   - st.x AS e,
                 ('0x' || substr(md5('pd:' || CAST(st.l AS VARCHAR)
                    || ':' || CAST(st.t + 1 AS VARCHAR)), 1, 4))::BIGINT
                   % 7 - 3 AS d
          FROM st WHERE st.t < 60
        ) sz ) s0
      ) s1
    )
    SELECT l, CAST(x AS BIGINT) AS final_x,
           CAST(sabse AS BIGINT) AS sum_abs_err,
           CAST(mx AS BIGINT) AS max_x
    FROM (SELECT l, x, sabse, mx,
                 row_number() OVER (PARTITION BY l
                                    ORDER BY t DESC) AS rn
          FROM st) WHERE rn = 1
    ORDER BY l
    """,
)
def pid_controller_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer PID control-loop replay — the feedback controller under
    autoscalers, rate limiters, and admission control, simulated with
    EXACT integer arithmetic (gains 8/1/2 over 16 with TRUNCATING
    division pinned on both engines — the raw drive goes negative,
    where trunc and floor diverge; actuation clamped to [-40, 40] and
    the integrator anti-windup-clamped to [-2000, 2000], exactly like
    a production controller — the clamps also BOUND the integer state,
    so the replay can never overflow): setpoint steps 100 -> 160 at
    t=30, md5-derived disturbance in [-3, 3], plant x += u + d.
    6 loops x 60 steps; Spark folds per loop in applyInPandas (fleets
    replay millions of independent control traces — the parallel axis
    is the loop), oracle replays the identical dynamics as a recursive
    machine. Outputs final state, total absolute error, and peak
    (overshoot witness)."""
    loops = spark.range(0, 6).select(F.col("id").alias("l"))
    import hashlib

    def _mh(sstr: str) -> int:
        return int(hashlib.md5(sstr.encode()).hexdigest()[:4], 16)

    def _tdiv16(v: int) -> int:
        return v // 16 if v >= 0 else -((-v) // 16)

    def _replay(key, pdf):
        import pandas as pd

        l = int(key[0])
        x = integ = eprev = sabse = mx = 0
        for t in range(1, 61):
            sp = 100 if t <= 30 else 160
            e = sp - x
            integ = max(-2000, min(2000, integ + e))
            u = max(-40, min(40, _tdiv16(8 * e + integ + 2 * (e - eprev))))
            d = _mh(f"pd:{l}:{t}") % 7 - 3
            x = x + u + d
            eprev = e
            sabse += abs(e)
            mx = max(mx, x)
        return pd.DataFrame(
            [(l, x, sabse, mx)],
            columns=["l", "final_x", "sum_abs_err", "max_x"],
        )

    return (
        loops.groupBy("l")
        .applyInPandas(
            _replay, "l long, final_x long, sum_abs_err long, max_x long"
        )
        .orderBy("l")
    )


# ------------------------------------------- stratified k-fold audit


@register_extra(
    "stratified_kfold_audit",
    """
    WITH d AS (
      SELECT doc_id, lang, source,
             CASE WHEN ('0x' || substr(md5('lb2:'
                || CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 10 < 3
             THEN 1 ELSE 0 END AS label
      FROM documents
    ),
    folded AS (
      SELECT lang, label, doc_id,
             (row_number() OVER (PARTITION BY lang
                                 ORDER BY
                                   md5('fold:' || CAST(doc_id AS VARCHAR)),
                                   doc_id) - 1) % 5 AS fold
      FROM d
    )
    SELECT lang, CAST(fold AS BIGINT) AS fold,
           count(*) AS n_docs,
           CAST(sum(label) AS BIGINT) AS n_pos
    FROM folded GROUP BY 1, 2 ORDER BY lang, fold
    """,
)
def stratified_kfold_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified k-fold assignment audit — the eval-split every model
    trainer needs to be BOTH deterministic and balanced: within each
    stratum (lang) docs are ranked by a salted md5 (so assignment is
    reproducible but uncorrelated with doc order) and dealt
    round-robin into 5 folds; the audit reports per-(stratum, fold)
    sizes and positive-label counts — fold sizes within a stratum may
    differ by at most 1 and label counts should be near-equal, which
    the hash pins exactly. Complements dataset_split (hash-bucket
    split, no stratification) and stratified_sample (sampling, not
    folding). One rank window per stratum + one partial agg; the md5
    sort key is the same trick a 10^9-doc fold assignment uses to
    avoid any global shuffle beyond the per-stratum sort."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.when(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("lb2:"), F.col("doc_id").cast("string")
                        ).cast("binary")
                    ),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("long")
            % 10
            < 3,
            1,
        )
        .otherwise(0)
        .alias("label"),
    )
    w = Window.partitionBy("lang").orderBy(
        F.md5(
            F.concat(F.lit("fold:"), F.col("doc_id").cast("string")).cast(
                "binary"
            )
        ),
        "doc_id",
    )
    folded = d.withColumn(
        "fold", F.pmod(F.row_number().over(w) - 1, F.lit(5))
    )
    return (
        folded.groupBy("lang", "fold")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("label").cast("long").alias("n_pos"),
        )
        .select(
            "lang", F.col("fold").cast("long").alias("fold"),
            "n_docs", "n_pos",
        )
        .orderBy("lang", "fold")
    )


# ------------------------------------------- Fellegi-Sunter linkage

# Probabilistic record linkage (Fellegi & Sunter 1969) — the decision
# layer the blocking rows (soundex / sorted-neighborhood / fuzzy-match)
# feed: per candidate pair, per-field agreement weights log2(m/u)
# (agree) / log2((1-m)/(1-u)) (disagree), summed and thresholded into
# link / possible / nonlink. Weights are PRECOMPUTED milli-log2
# integer constants (python round at module load would be overkill —
# they are spelled literally so both engines share the exact same
# integers; m/u priors documented beside each):
#   name      m=.95  u~1/1500  agree +10477  disagree -4321
#   segment   m=.80  u=.20     agree  +2000  disagree -2000
#   balance   m=.90  u~1e-4    agree +13136  disagree -3322
# Thresholds: link >= 15000, nonlink < 0, else possible — so a clean
# pair links, one perturbed field lands "possible", two flip nonlink.
_FS_ORACLE = """
WITH a AS (
  SELECT c_custkey AS akey, c_nationkey AS nat, c_name AS name,
         c_mktsegment AS seg,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS balc
  FROM customer
),
b AS (
  SELECT c_custkey + 100000 AS bkey, c_custkey AS orig,
         c_nationkey AS nat,
         CASE WHEN c_custkey % 7 = 0 THEN c_name || '*' ELSE c_name END
           AS name,
         CASE WHEN c_custkey % 5 = 0 THEN 'UNKNOWN' ELSE c_mktsegment END
           AS seg,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
           + CASE WHEN c_custkey % 11 = 0 THEN 1 ELSE 0 END AS balc
  FROM customer
),
scored AS (
  SELECT a.nat, a.akey, b.orig,
         (CASE WHEN a.name = b.name THEN 10477 ELSE -4321 END)
       + (CASE WHEN a.seg = b.seg THEN 2000 ELSE -2000 END)
       + (CASE WHEN a.balc = b.balc THEN 13136 ELSE -3322 END) AS score
  FROM a JOIN b ON b.nat = a.nat
)
SELECT CAST(nat AS INT) AS nationkey,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(count(*) FILTER (WHERE score >= 15000) AS BIGINT) AS n_link,
       CAST(count(*) FILTER (WHERE score >= 0 AND score < 15000)
            AS BIGINT) AS n_possible,
       CAST(count(*) FILTER (WHERE score < 0) AS BIGINT) AS n_nonlink,
       CAST(count(*) FILTER (WHERE akey = orig AND score >= 15000)
            AS BIGINT) AS n_true_link,
       CAST(count(*) FILTER (WHERE akey = orig AND score < 15000)
            AS BIGINT) AS n_true_missed
FROM scored GROUP BY nat ORDER BY nationkey
"""


@register_extra("fellegi_sunter_linkage", _FS_ORACLE)
def fellegi_sunter_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage over a deterministic
    noisy twin of `customer` (1-in-7 name typo, 1-in-5 segment loss,
    1-in-11 off-by-a-cent balance), blocked on nationkey, reported as
    per-block decision counts + truth audit (see oracle comment for
    the integer milli-log2 weight model). Plan shape: the candidate
    join is the BLOCKING equi-join (never all-pairs); weights are one
    codegen CASE ladder, the decision rollup a partial-agg groupBy on
    the block key — at corpus scale the quadratic risk lives entirely
    in block sizes, which n_pairs audits per block. Balance cents
    derive from the stored double via floor(x*100+0.5) — the identical
    IEEE op in both engines, so no float ever crosses the comparison
    boundary."""
    cust = _t(spark, sf_dir, "customer")
    balc = F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long")
    a = cust.select(
        F.col("c_custkey").alias("akey"),
        F.col("c_nationkey").alias("nat"),
        F.col("c_name").alias("a_name"),
        F.col("c_mktsegment").alias("a_seg"),
        balc.alias("a_balc"),
    )
    b = cust.select(
        F.col("c_custkey").alias("orig"),
        F.col("c_nationkey").alias("nat"),
        F.when(F.col("c_custkey") % 7 == 0, F.concat(F.col("c_name"), F.lit("*")))
        .otherwise(F.col("c_name"))
        .alias("b_name"),
        F.when(F.col("c_custkey") % 5 == 0, F.lit("UNKNOWN"))
        .otherwise(F.col("c_mktsegment"))
        .alias("b_seg"),
        (
            balc + F.when(F.col("c_custkey") % 11 == 0, 1).otherwise(0)
        ).alias("b_balc"),
    )
    score = (
        F.when(F.col("a_name") == F.col("b_name"), 10477).otherwise(-4321)
        + F.when(F.col("a_seg") == F.col("b_seg"), 2000).otherwise(-2000)
        + F.when(F.col("a_balc") == F.col("b_balc"), 13136).otherwise(-3322)
    )
    # both sides are corpus-sized at scale: pin the blocking equi-join
    # to shuffle-hash so neither ever broadcasts
    scored = (
        a.hint("shuffle_hash")
        .join(b, "nat")
        .select("nat", "akey", "orig", score.alias("score"))
    )
    return (
        scored.groupBy("nat")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.count(F.when(F.col("score") >= 15000, 1)).alias("n_link"),
            F.count(
                F.when((F.col("score") >= 0) & (F.col("score") < 15000), 1)
            ).alias("n_possible"),
            F.count(F.when(F.col("score") < 0, 1)).alias("n_nonlink"),
            F.count(
                F.when(
                    (F.col("akey") == F.col("orig")) & (F.col("score") >= 15000), 1
                )
            ).alias("n_true_link"),
            F.count(
                F.when(
                    (F.col("akey") == F.col("orig")) & (F.col("score") < 15000), 1
                )
            ).alias("n_true_missed"),
        )
        .select(
            F.col("nat").cast("int").alias("nationkey"),
            F.col("n_pairs").cast("long"),
            F.col("n_link").cast("long"),
            F.col("n_possible").cast("long"),
            F.col("n_nonlink").cast("long"),
            F.col("n_true_link").cast("long"),
            F.col("n_true_missed").cast("long"),
        )
        .orderBy("nationkey")
    )


# ------------------------------------------------- SPRT early stopping

# Wald's Sequential Probability Ratio Test — the early-stopping rule
# under every modern A/B-test guardrail: per experiment, observations
# accumulate an integer milli-log2 likelihood ratio (H1: p=0.6 vs H0:
# p=0.5 -> success +263 = round(1000*log2(.6/.5)), failure -322) and
# the test decides at the FIRST crossing of +-4248 (= 1000*log2(19),
# alpha = beta = 0.05). Outcomes are md5 coin flips whose true rate
# differs by experiment parity, so both verdicts actually occur and
# the expected-sample-size asymmetry is visible in decided_at.
_SPRT_ORACLE = """
WITH obs AS (
  SELECT user_id % 50 AS exp_id, ts, event_id,
         CASE WHEN ('0x' || substr(md5('ab:' || CAST(event_id AS VARCHAR)),
                                   1, 6))::BIGINT % 100
                   < CASE WHEN user_id % 50 % 2 = 1 THEN 60 ELSE 50 END
              THEN 263 ELSE -322 END AS w
  FROM events
),
c AS (
  SELECT exp_id, w,
         row_number() OVER (PARTITION BY exp_id
                            ORDER BY ts, event_id) AS step,
         sum(w) OVER (PARTITION BY exp_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS llr
  FROM obs
),
x AS (
  SELECT exp_id, min(step) AS decided_at
  FROM c WHERE llr >= 4248 OR llr <= -4248
  GROUP BY exp_id
),
v AS (
  SELECT c.exp_id, x.decided_at,
         max(CASE WHEN c.step = x.decided_at THEN c.llr END) AS llr_at
  FROM c JOIN x ON x.exp_id = c.exp_id
  GROUP BY c.exp_id, x.decided_at
),
tot AS (SELECT exp_id, count(*) AS n_obs FROM c GROUP BY exp_id)
SELECT CAST(t.exp_id AS INT) AS exp_id,
       CAST(t.n_obs AS BIGINT) AS n_obs,
       CAST(COALESCE(v.decided_at, -1) AS BIGINT) AS decided_at,
       CASE WHEN v.decided_at IS NULL THEN 'undecided'
            WHEN v.llr_at >= 4248 THEN 'accept_h1'
            ELSE 'accept_h0' END AS verdict
FROM tot t LEFT JOIN v ON v.exp_id = t.exp_id
ORDER BY exp_id
"""


@register_extra("sprt_early_stopping", _SPRT_ORACLE)
def sprt_early_stopping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald SPRT replay per experiment (see oracle comment): one
    experiment-keyed window pass computes the running LLR, the first
    boundary crossing is a min(struct) aggregate — no iteration, no
    state beyond the window's running sum. At 10^12 observations this
    is the sessionization shuffle shape (one exchange on exp_id)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rate = F.when(F.pmod(F.col("user_id") % 50, F.lit(2)) == 1, 60).otherwise(50)
    flip = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("ab:"), F.col("event_id").cast("string")
                    ).cast("binary")
                ),
                1,
                6,
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    obs = ev.select(
        (F.col("user_id") % 50).alias("exp_id"),
        "ts",
        "event_id",
        F.when(flip < rate, 263).otherwise(-322).alias("w"),
    )
    wo = Window.partitionBy("exp_id").orderBy("ts", "event_id")
    c = obs.select(
        "exp_id",
        F.row_number().over(wo).alias("step"),
        F.sum("w")
        .over(wo.rowsBetween(Window.unboundedPreceding, 0))
        .alias("llr"),
    )
    crossed = c.filter((F.col("llr") >= 4248) | (F.col("llr") <= -4248))
    first = crossed.groupBy("exp_id").agg(
        F.min(F.struct("step", "llr")).alias("fx")
    )
    tot = c.groupBy("exp_id").agg(
        F.count("*").alias("n_obs"),
        F.max(F.struct("step", "llr")).alias("last"),
    )
    return (
        tot.join(first, "exp_id", "left")
        .select(
            F.col("exp_id").cast("int"),
            F.col("n_obs").cast("long"),
            F.coalesce(F.col("fx.step"), F.lit(-1)).cast("long").alias(
                "decided_at"
            ),
            F.when(F.col("fx").isNull(), "undecided")
            .when(F.col("fx.llr") >= 4248, "accept_h1")
            .otherwise("accept_h0")
            .alias("verdict"),
        )
        .orderBy("exp_id")
    )


# ---------------------------------------------- Feistel pseudonyms

# Format-preserving pseudonymization via a 4-round Feistel network on
# the 32-bit id domain (the construction under NIST FPE: a keyed
# PERMUTATION, so unlike the gated hash-pseudonym row there are ZERO
# collisions by construction and re-identification is an inverse walk
# for key holders only). Round function = md5 16-bit digest; rounds
# unroll into codegen; the engine also runs the INVERSE network and
# flags roundtrip_ok per row (hash-fatal), while the oracle replays
# the forward walk as four chained CTEs.
_FEISTEL_ORACLE = """
WITH i0 AS (
  SELECT event_id AS id,
         event_id // 65536 AS l, event_id % 65536 AS r
  FROM events WHERE event_id % 7 = 0
),
r1 AS (SELECT id, r AS l,
              xor(l, ('0x' || substr(md5('fe1:' || CAST(r AS VARCHAR)),
                                     1, 6))::BIGINT % 65536) AS r FROM i0),
r2 AS (SELECT id, r AS l,
              xor(l, ('0x' || substr(md5('fe2:' || CAST(r AS VARCHAR)),
                                     1, 6))::BIGINT % 65536) AS r FROM r1),
r3 AS (SELECT id, r AS l,
              xor(l, ('0x' || substr(md5('fe3:' || CAST(r AS VARCHAR)),
                                     1, 6))::BIGINT % 65536) AS r FROM r2),
r4 AS (SELECT id, r AS l,
              xor(l, ('0x' || substr(md5('fe4:' || CAST(r AS VARCHAR)),
                                     1, 6))::BIGINT % 65536) AS r FROM r3)
SELECT CAST(id AS BIGINT) AS event_id,
       CAST(l * 65536 + r AS BIGINT) AS pseudonym,
       true AS roundtrip_ok
FROM r4 ORDER BY event_id
"""


@register_extra("feistel_pseudonyms", _FEISTEL_ORACLE)
def feistel_pseudonyms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feistel FPE pseudonymization + inverse verification (see oracle
    comment). Zero-Python, zero-shuffle until the output sort: eight
    md5 expressions in one codegen chain per row."""
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("event_id") % 7 == 0)
        .select(F.col("event_id"))
        .withColumn("l", F.expr("event_id div 65536"))
        .withColumn("r", F.col("event_id") % 65536)
    )

    def rf(k: int, col: F.Column) -> F.Column:
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(f"fe{k}:"), col.cast("string")
                        ).cast("binary")
                    ),
                    1,
                    6,
                ),
                16,
                10,
            ).cast("long")
            % 65536
        )

    df = ev
    for k in (1, 2, 3, 4):
        df = df.select(
            "event_id",
            F.col("r").alias("l"),
            F.col("l").bitwiseXOR(rf(k, F.col("r"))).alias("r"),
        )
    df = df.withColumn("pseudonym", F.col("l") * 65536 + F.col("r"))
    # inverse walk: undo rounds 4..1 -> must land on the original id
    inv = df.withColumn("il", F.col("l")).withColumn("ir", F.col("r"))
    for k in (4, 3, 2, 1):
        inv = inv.select(
            "event_id",
            "pseudonym",
            (F.col("ir").bitwiseXOR(rf(k, F.col("il")))).alias("ir2"),
            F.col("il").alias("ir"),
        ).select(
            "event_id",
            "pseudonym",
            F.col("ir2").alias("il"),
            "ir",
        )
    return (
        inv.select(
            F.col("event_id").cast("long"),
            F.col("pseudonym").cast("long"),
            (
                (F.col("il") * 65536 + F.col("ir")) == F.col("event_id")
            ).alias("roundtrip_ok"),
        )
        .orderBy("event_id")
    )


# ------------------------------------------------- CUPED adjustment

# CUPED (Deng, Xu, Kohavi, Walker 2013) — the industry-standard A/B
# variance-reduction trick: regress the experiment metric Y on a
# pre-experiment covariate X, report the adjusted variant means
# Ybar_v - theta * (Xbar_v - Xbar). Everything stays an exact rational:
# theta = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) rides as integers, and the
# adjusted mean becomes num/den with
#   num = Syv*td*n - tn*(Sxv*n - Sx*nv),  den = td*nv*n.
# Second-order sums go through HUGEINT (DuckDB) / DECIMAL(38,0)
# (Spark); magnitudes stay < 1e30. Per-user X/Y share an md5 latent
# component so the covariate genuinely correlates (rho^2 lands well
# above 0), and treated users carry a +3-per-post-event lift the
# adjustment must preserve. e6 floors use the nonnegative-mod
# subtraction so trunc-vs-floor division can never differ.
_CUPED_ORACLE = """
WITH e AS (
  SELECT user_id AS u,
         ('0x' || substr(md5('cp:' || CAST(event_id AS VARCHAR)),
                         1, 5))::BIGINT % 2 AS phase,
         ('0x' || substr(md5('ul:' || CAST(user_id AS VARCHAR)),
                         1, 5))::BIGINT % 50 AS lat,
         ('0x' || substr(md5('cv:' || CAST(event_id AS VARCHAR)),
                         1, 5))::BIGINT % 20 AS nz,
         ('0x' || substr(md5('va:' || CAST(user_id AS VARCHAR)),
                         1, 5))::BIGINT % 2 AS t
  FROM events
),
pu AS (
  SELECT u, t,
         sum(CASE WHEN phase = 0 THEN lat + nz ELSE 0 END) AS x,
         sum(CASE WHEN phase = 1 THEN lat + nz + 3 * t ELSE 0 END) AS y
  FROM e GROUP BY 1, 2
),
tot AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
         CAST(sum(x * x) AS HUGEINT) AS sxx,
         CAST(sum(y * y) AS HUGEINT) AS syy,
         CAST(sum(x * y) AS HUGEINT) AS sxy
  FROM pu
),
th AS (
  SELECT n, sx,
         n * sxy - sx * sy AS tn, n * sxx - sx * sx AS td,
         (n * sxy - sx * sy) * (n * sxy - sx * sy) AS r2n,
         (n * sxx - sx * sx) * (n * syy - sy * sy) AS r2d
  FROM tot
),
v AS (
  SELECT t, CAST(count(*) AS HUGEINT) AS nv,
         CAST(sum(x) AS HUGEINT) AS sxv, CAST(sum(y) AS HUGEINT) AS syv
  FROM pu GROUP BY 1
),
adj AS (
  SELECT t, nv, syv,
         syv * td * n - tn * (sxv * n - sx * nv) AS anum,
         td * nv * n AS aden, tn, td, r2n, r2d
  FROM v CROSS JOIN th
)
SELECT CAST(t AS INT) AS variant, CAST(nv AS BIGINT) AS n_users,
       CAST((1000000 * syv - ((1000000 * syv % nv) + nv) % nv) // nv
            AS BIGINT) AS mean_y_e6,
       CAST((1000000 * anum - ((1000000 * anum % aden) + aden) % aden)
            // aden AS BIGINT) AS mean_y_adj_e6,
       CAST((1000000 * tn - ((1000000 * tn % td) + td) % td) // td
            AS BIGINT) AS theta_e6,
       CAST((1000000 * r2n - ((1000000 * r2n % r2d) + r2d) % r2d) // r2d
            AS BIGINT) AS rho2_e6
FROM adj ORDER BY variant
"""


@register_extra("cuped_adjustment", _CUPED_ORACLE)
def cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted experiment readout (see oracle comment). Plan:
    one scan of events -> per-user partial agg (the only fact-sized
    shuffle), then the 2nd-order moment totals and the two variant
    rows are single-row/2-row aggregates broadcast back over a cross
    join — at 100 TB this is one map-side-combined shuffle plus
    driver-free scalar joins."""
    ev = _t(spark, sf_dir, "events")
    eid = F.col("event_id").cast("string")
    uid = F.col("user_id").cast("string")

    def _h(prefix: str, col) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(prefix), col).cast("binary")), 1, 5
            ),
            16,
            10,
        ).cast("long")

    D = "decimal(38,0)"
    pu = (
        ev.select(
            F.col("user_id").alias("u"),
            (_h("cp:", eid) % 2).alias("phase"),
            (_h("ul:", uid) % 50).alias("lat"),
            (_h("cv:", eid) % 20).alias("nz"),
            (_h("va:", uid) % 2).alias("t"),
        )
        .groupBy("u", "t")
        .agg(
            F.sum(
                F.when(F.col("phase") == 0, F.col("lat") + F.col("nz")).otherwise(0)
            ).alias("x"),
            F.sum(
                F.when(
                    F.col("phase") == 1,
                    F.col("lat") + F.col("nz") + 3 * F.col("t"),
                ).otherwise(0)
            ).alias("y"),
        )
    )
    tot = pu.agg(
        F.count(F.lit(1)).cast(D).alias("n"),
        F.sum("x").cast(D).alias("sx"),
        F.sum("y").cast(D).alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast(D).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast(D).alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast(D).alias("sxy"),
    )
    th = tot.select(
        "n",
        "sx",
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("tn"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias("td"),
    ).withColumn("r2n", F.col("tn") * F.col("tn"))
    r2d = tot.select(
        (
            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
            * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
        ).alias("r2d")
    )
    v = pu.groupBy("t").agg(
        F.count(F.lit(1)).cast(D).alias("nv"),
        F.sum("x").cast(D).alias("sxv"),
        F.sum("y").cast(D).alias("syv"),
    )
    adj = (
        v.crossJoin(F.broadcast(th))
        .crossJoin(F.broadcast(r2d))
        .withColumn(
            "anum",
            F.col("syv") * F.col("td") * F.col("n")
            - F.col("tn") * (F.col("sxv") * F.col("n") - F.col("sx") * F.col("nv")),
        )
        .withColumn("aden", F.col("td") * F.col("nv") * F.col("n"))
    )

    def _e6(num, den, out):
        return F.expr(
            f"CAST((1000000 * {num} - pmod(1000000 * {num}, {den}))"
            f" div {den} AS BIGINT)"
        ).alias(out)

    return adj.select(
        F.col("t").cast("int").alias("variant"),
        F.col("nv").cast("long").alias("n_users"),
        _e6("syv", "nv", "mean_y_e6"),
        _e6("anum", "aden", "mean_y_adj_e6"),
        _e6("tn", "td", "theta_e6"),
        _e6("r2n", "r2d", "rho2_e6"),
    ).orderBy("variant")


# ------------------------------------------------ instant-runoff vote

# IRV / ranked-choice elimination (Hare 1857; used in AU/IE/SF
# elections): each ballot ranks all 5 candidates (a deterministic
# md5 permutation per event); each round counts every ballot's
# top-ranked STILL-ACTIVE candidate and eliminates the weakest
# (fewest first choices, ties eliminate the larger candidate id).
# Four staged rounds leave a winner. Everything is exact counting —
# the only subtlety is that a candidate can reach zero first-choice
# votes and must still be rankable, hence the LEFT JOIN + coalesce 0.
_IRV_ROUND_SQL = """
r{r} AS MATERIALIZED (
  SELECT cand, count(*) AS votes FROM (
    SELECT b, min_by(cand, rnk) AS cand FROM prefs
    WHERE cand NOT IN (SELECT cand FROM elim{p}) GROUP BY b
  ) GROUP BY cand
),
a{r} AS MATERIALIZED (
  SELECT c.cand, coalesce(v.votes, 0) AS votes
  FROM (SELECT cand FROM allc
        WHERE cand NOT IN (SELECT cand FROM elim{p})) c
  LEFT JOIN r{r} v USING (cand)
),
e{r} AS (SELECT cand FROM a{r} ORDER BY votes, cand DESC LIMIT 1),
elim{r} AS MATERIALIZED (
  SELECT cand FROM elim{p} UNION ALL SELECT cand FROM e{r})
"""

_IRV_ORACLE = (
    """
WITH prefs AS MATERIALIZED (
  SELECT event_id AS b, c.cand,
         row_number() OVER (
           PARTITION BY event_id
           ORDER BY md5('pv:' || CAST(c.cand AS VARCHAR) || ':'
                        || CAST(event_id AS VARCHAR)), c.cand) AS rnk
  FROM events
  CROSS JOIN (SELECT unnest(generate_series(0, 4)) AS cand) c
),
allc AS (SELECT unnest(generate_series(0, 4)) AS cand),
elim0 AS (SELECT cand FROM allc WHERE cand < 0),
"""
    + ",".join(
        _IRV_ROUND_SQL.format(r=r, p=r - 1) for r in range(1, 5)
    )
    + """
SELECT * FROM (
"""
    + "\nUNION ALL\n".join(
        f"""
  SELECT {r} AS round, a{r}.cand, CAST(a{r}.votes AS BIGINT) AS votes,
         CASE WHEN a{r}.cand IN (SELECT cand FROM e{r}) THEN 'eliminated'
              WHEN {r} = 4 THEN 'winner' ELSE 'active' END AS status
  FROM a{r}"""
        for r in range(1, 5)
    )
    + """
) ORDER BY round, cand
"""
)


@register_extra("irv_elimination_rounds", _IRV_ORACLE)
def irv_elimination_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Instant-runoff elimination rounds (see oracle comment). Plan:
    the ballot->preference fanout is 5x events (one projection), each
    round is one anti-join against the (<=4-row, broadcast) eliminated
    set, a per-ballot min_by partial agg, and a 5-row ranking — the
    fact table is scanned once and reused via an eager localCheckpoint;
    per-round state never touches the driver."""
    ev = _t(spark, sf_dir, "events")
    cands = spark.range(5).select(F.col("id").cast("int").alias("cand"))
    prefs = (
        ev.crossJoin(F.broadcast(cands))
        .select(
            F.col("event_id").alias("b"),
            "cand",
            F.md5(
                F.concat(
                    F.lit("pv:"),
                    F.col("cand").cast("string"),
                    F.lit(":"),
                    F.col("event_id").cast("string"),
                ).cast("binary")
            ).alias("h"),
        )
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("b").orderBy("h", "cand")
            ),
        )
        .drop("h")
        .localCheckpoint(eager=True)
    )
    elim = cands.filter(F.col("cand") < 0)
    out = []
    for r in range(1, 5):
        fc = (
            prefs.join(F.broadcast(elim), "cand", "left_anti")
            .groupBy("b")
            .agg(F.expr("min_by(cand, rnk)").alias("cand"))
            .groupBy("cand")
            .agg(F.count(F.lit(1)).alias("votes"))
        )
        active = (
            cands.join(F.broadcast(elim), "cand", "left_anti")
            .join(fc, "cand", "left")
            .withColumn("votes", F.coalesce("votes", F.lit(0)))
        )
        er = (
            active.orderBy("votes", F.desc("cand"))
            .limit(1)
            .select("cand")
            .localCheckpoint(eager=True)
        )
        out.append(
            active.join(
                F.broadcast(er.withColumn("is_e", F.lit(1))), "cand", "left"
            ).select(
                F.lit(r).alias("round"),
                "cand",
                F.col("votes").cast("long"),
                F.when(F.col("is_e") == 1, "eliminated")
                .when(F.lit(r) == 4, "winner")
                .otherwise("active")
                .alias("status"),
            )
        )
        elim = elim.unionByName(er).localCheckpoint(eager=True)
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res.orderBy("round", "cand")


# ---------------------------------------------------- Elo rating replay

# Elo (1960) with Swiss-style top pairing: 8 rounds, K=32, ratings in
# exact e6 integers (update = +-32*(S_e6 - E_e6), zero-sum by
# construction so no table symmetry is required). The expected-score
# logistic 1/(1+10^(-d/400)) enters ONLY through this frozen 65-entry
# e6 table over 25-point diff buckets (midpoint-evaluated, generated
# once in Python and embedded as the same literal array in BOTH
# engines — no float ever crosses). Match outcomes are skill-driven
# (md5 latent 0..399 + 0..199 noise, ties are draws), so final
# ratings must recover the latent skill order — the non-vacuity hook.
_ELO_E6 = [
    10632, 12257, 14128, 16279, 18751, 21591, 24850, 28586, 32865,
    37760, 43351, 49728, 56986, 65231, 74575, 85135, 97033, 110395,
    125340, 141986, 160437, 180780, 203079, 227365, 253632, 281825,
    311844, 343530, 376674, 411013, 446242, 482019, 517981, 553758,
    588987, 623326, 656470, 688156, 718175, 746368, 772635, 796921,
    819220, 839563, 858014, 874660, 889605, 902967, 914865, 925425,
    934769, 943014, 950272, 956649, 962240, 967135, 971414, 975150,
    978409, 981249, 983721, 985872, 987743, 989368, 990780,
]
_ELO_ROUNDS = 8

_ELO_ROUND_SQL = """
rk{r} AS MATERIALIZED (
  SELECT uid, re6,
         row_number() OVER (ORDER BY re6 DESC, uid) AS rn,
         count(*) OVER () AS np
  FROM st{p}
),
res{r} AS MATERIALIZED (
  SELECT a.uid AS ua, a.re6 AS ra, b.uid AS ub, b.re6 AS rb,
         CASE WHEN ('0x' || substr(md5('sk:' || CAST(a.uid AS VARCHAR)),
                                   1, 5))::BIGINT % 400
                   + ('0x' || substr(md5('mn:{r}:'
                       || CAST(a.uid AS VARCHAR) || ':'
                       || CAST(b.uid AS VARCHAR)), 1, 5))::BIGINT % 200
                 > ('0x' || substr(md5('sk:' || CAST(b.uid AS VARCHAR)),
                                   1, 5))::BIGINT % 400
                   + ('0x' || substr(md5('mo:{r}:'
                       || CAST(a.uid AS VARCHAR) || ':'
                       || CAST(b.uid AS VARCHAR)), 1, 5))::BIGINT % 200
              THEN 1000000
              WHEN ('0x' || substr(md5('sk:' || CAST(a.uid AS VARCHAR)),
                                   1, 5))::BIGINT % 400
                   + ('0x' || substr(md5('mn:{r}:'
                       || CAST(a.uid AS VARCHAR) || ':'
                       || CAST(b.uid AS VARCHAR)), 1, 5))::BIGINT % 200
                 < ('0x' || substr(md5('sk:' || CAST(b.uid AS VARCHAR)),
                                   1, 5))::BIGINT % 400
                   + ('0x' || substr(md5('mo:{r}:'
                       || CAST(a.uid AS VARCHAR) || ':'
                       || CAST(b.uid AS VARCHAR)), 1, 5))::BIGINT % 200
              THEN 0 ELSE 500000 END AS s_e6,
         etab.e[CAST(least(greatest(a.re6 - b.re6 + 800000000, 0),
                           1600000000) // 25000000 AS INT) + 1] AS e_e6
  FROM rk{r} a JOIN rk{r} b ON a.rn % 2 = 1 AND b.rn = a.rn + 1
  CROSS JOIN etab
),
st{r} AS MATERIALIZED (
  SELECT ua AS uid, ra + 32 * (s_e6 - e_e6) AS re6 FROM res{r}
  UNION ALL
  SELECT ub, rb - 32 * (s_e6 - e_e6) FROM res{r}
  UNION ALL
  SELECT uid, re6 FROM rk{r} WHERE rn = np AND np % 2 = 1
)
"""

_ELO_ORACLE = (
    """
WITH etab AS (SELECT """
    + str(_ELO_E6)
    + """ AS e),
players AS (SELECT DISTINCT user_id AS uid FROM events),
st0 AS MATERIALIZED (
  SELECT uid, CAST(1500000000 AS BIGINT) AS re6 FROM players),
"""
    + ",".join(
        _ELO_ROUND_SQL.format(r=r, p=r - 1) for r in range(1, _ELO_ROUNDS + 1)
    )
    + f"""
SELECT CAST(uid AS BIGINT) AS user_id,
       CAST(('0x' || substr(md5('sk:' || CAST(uid AS VARCHAR)),
                            1, 5))::BIGINT % 400 AS BIGINT) AS skill,
       CAST(re6 AS BIGINT) AS rating_e6,
       CAST(row_number() OVER (ORDER BY re6 DESC, uid) AS INT) AS rnk
FROM st{_ELO_ROUNDS} ORDER BY rnk
"""
)


@register_extra("elo_rating_rounds", _ELO_ORACLE)
def elo_rating_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Swiss-paired Elo replay (see oracle comment). Plan: the player
    dim is the ONLY state (one row per player, localCheckpointed per
    round); each round is a rating-ordered window rank, an odd/even
    self-pair join on renamed projections, one literal-array lookup
    (no join for the logistic table), and a zero-sum union — at scale
    rounds are O(players), never O(events)."""
    ev = _t(spark, sf_dir, "events")
    arr = "array(" + ",".join(str(v) for v in _ELO_E6) + ")"

    def _h5(expr: str) -> str:
        return f"CAST(conv(substring(md5(CAST({expr} AS BINARY)), 1, 5), 16, 10) AS BIGINT)"

    st = (
        ev.select(F.col("user_id").alias("uid"))
        .distinct()
        .withColumn("re6", F.lit(1500000000).cast("long"))
        .localCheckpoint(eager=True)
    )
    for r in range(1, _ELO_ROUNDS + 1):
        w = Window.orderBy(F.desc("re6"), F.asc("uid"))
        rk = st.select(
            "uid",
            "re6",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("np"),
        )
        a = rk.select(
            F.col("uid").alias("ua"), F.col("re6").alias("ra"),
            F.col("rn").alias("rna"),
        )
        b = rk.select(
            F.col("uid").alias("ub"), F.col("re6").alias("rb"),
            F.col("rn").alias("rnb"),
        )
        ska = _h5("concat('sk:', CAST(ua AS STRING))")
        skb = _h5("concat('sk:', CAST(ub AS STRING))")
        noa = _h5(
            f"concat('mn:{r}:', CAST(ua AS STRING), ':', CAST(ub AS STRING))"
        )
        nob = _h5(
            f"concat('mo:{r}:', CAST(ua AS STRING), ':', CAST(ub AS STRING))"
        )
        sa = f"{ska} % 400 + {noa} % 200"
        sb = f"{skb} % 400 + {nob} % 200"
        res = (
            a.join(
                b,
                (F.col("rna") % 2 == 1) & (F.col("rnb") == F.col("rna") + 1),
            )
            .withColumn(
                "s_e6",
                F.expr(
                    f"CASE WHEN {sa} > {sb} THEN 1000000L"
                    f" WHEN {sa} < {sb} THEN 0L ELSE 500000L END"
                ),
            )
            .withColumn(
                "e_e6",
                F.expr(
                    f"element_at({arr}, CAST(least(greatest(ra - rb"
                    " + 800000000L, 0L), 1600000000L) div 25000000 AS INT)"
                    " + 1)"
                ).cast("long"),
            )
        )
        st = (
            res.select(
                F.col("ua").alias("uid"),
                (F.col("ra") + 32 * (F.col("s_e6") - F.col("e_e6"))).alias("re6"),
            )
            .unionByName(
                res.select(
                    F.col("ub").alias("uid"),
                    (F.col("rb") - 32 * (F.col("s_e6") - F.col("e_e6"))).alias(
                        "re6"
                    ),
                )
            )
            .unionByName(
                rk.filter(
                    (F.col("rn") == F.col("np")) & (F.col("np") % 2 == 1)
                ).select("uid", "re6")
            )
            .localCheckpoint(eager=True)
        )
    return st.select(
        F.col("uid").cast("long").alias("user_id"),
        F.expr(_h5("concat('sk:', CAST(uid AS STRING))") + " % 400")
        .cast("long")
        .alias("skill"),
        F.col("re6").cast("long").alias("rating_e6"),
        F.row_number()
        .over(Window.orderBy(F.desc("re6"), F.asc("uid")))
        .cast("int")
        .alias("rnk"),
    ).orderBy("rnk")


# ------------------------------------------------ Simpson's paradox

# Simpson's paradox (1951; the Berkeley-admissions shape): variant 0
# beats variant 1 inside EVERY stratum, yet loses pooled, because the
# md5 assignment concentrates variant 0 in the low-base-rate strata
# (admission base rates 70/55/40/25% by stratum; variant 0 gets a +5pt
# within-stratum edge but 70% of its traffic lands in strata 2-3).
# All comparisons are exact rational (a*d vs c*b integer products);
# the paradox flag — per-stratum winner 0, pooled winner 1 — is
# hash-frozen. Rows: one per stratum plus the pooled row (stratum
# -1).
_SIMPSON_ORACLE = """
WITH e AS MATERIALIZED (
  SELECT ('0x' || substr(md5('ss:' || CAST(user_id AS VARCHAR)),
                         1, 4))::BIGINT % 4 AS stratum,
         CASE WHEN ('0x' || substr(md5('sv:' || CAST(event_id AS VARCHAR)),
                                   1, 4))::BIGINT % 100
                   < 30 + CASE WHEN ('0x' || substr(md5('ss:'
                       || CAST(user_id AS VARCHAR)), 1, 4))::BIGINT % 4 >= 2
                     THEN 40 ELSE 0 END
              THEN 0 ELSE 1 END AS variant,
         event_id, user_id
  FROM events
),
o AS MATERIALIZED (
  SELECT stratum, variant,
         CASE WHEN ('0x' || substr(md5('so:' || CAST(event_id AS VARCHAR)),
                                   1, 4))::BIGINT % 100
                   < 70 - 15 * stratum
                     + CASE WHEN variant = 0 THEN 5 ELSE 0 END
              THEN 1 ELSE 0 END AS success
  FROM e
),
strat AS MATERIALIZED (
  SELECT stratum,
         sum(CASE WHEN variant = 0 THEN success END) AS s0,
         sum(CASE WHEN variant = 0 THEN 1 END) AS n0,
         sum(CASE WHEN variant = 1 THEN success END) AS s1,
         sum(CASE WHEN variant = 1 THEN 1 END) AS n1
  FROM o GROUP BY stratum
),
allrows AS (
  SELECT CAST(stratum AS INT) AS stratum, s0, n0, s1, n1 FROM strat
  UNION ALL
  SELECT -1, sum(s0), sum(n0), sum(s1), sum(n1) FROM strat
)
SELECT stratum,
       CAST(s0 AS BIGINT) AS succ_v0, CAST(n0 AS BIGINT) AS n_v0,
       CAST(s1 AS BIGINT) AS succ_v1, CAST(n1 AS BIGINT) AS n_v1,
       CAST(CASE WHEN s0 * n1 > s1 * n0 THEN 0 ELSE 1 END AS INT)
         AS winner
FROM allrows
ORDER BY stratum
"""


@register_extra("simpsons_paradox_audit", _SIMPSON_ORACLE)
def simpsons_paradox_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's paradox audit (see oracle comment). One partial-agg
    pass over events; the pooled row is a 4-row re-aggregate. The
    winner flips between every stratum row and the pooled row — the
    paradox, hash-frozen."""
    ev = _t(spark, sf_dir, "events")

    def _h4(prefix: str, col: str) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(prefix), F.col(col).cast("string")
                    ).cast("binary")
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")

    e = ev.select(
        (_h4("ss:", "user_id") % 4).alias("stratum"),
        "event_id",
    ).withColumn(
        "variant",
        F.when(
            _h4("sv:", "event_id") % 100
            < 30 + F.when(F.col("stratum") >= 2, 40).otherwise(0),
            0,
        ).otherwise(1),
    ).withColumn(
        "success",
        F.when(
            _h4("so:", "event_id") % 100
            < 70
            - 15 * F.col("stratum")
            + F.when(F.col("variant") == 0, 5).otherwise(0),
            1,
        ).otherwise(0),
    )
    strat = e.groupBy("stratum").agg(
        F.sum(F.when(F.col("variant") == 0, F.col("success"))).alias("s0"),
        F.sum(F.when(F.col("variant") == 0, 1)).alias("n0"),
        F.sum(F.when(F.col("variant") == 1, F.col("success"))).alias("s1"),
        F.sum(F.when(F.col("variant") == 1, 1)).alias("n1"),
    )
    pooled = strat.agg(
        F.lit(-1).alias("stratum"),
        F.sum("s0").alias("s0"),
        F.sum("n0").alias("n0"),
        F.sum("s1").alias("s1"),
        F.sum("n1").alias("n1"),
    )
    return (
        strat.select(F.col("stratum").cast("int"), "s0", "n0", "s1", "n1")
        .unionByName(
            pooled.select(
                F.col("stratum").cast("int"), "s0", "n0", "s1", "n1"
            )
        )
        .select(
            "stratum",
            F.col("s0").cast("long").alias("succ_v0"),
            F.col("n0").cast("long").alias("n_v0"),
            F.col("s1").cast("long").alias("succ_v1"),
            F.col("n1").cast("long").alias("n_v1"),
            F.when(
                F.col("s0") * F.col("n1") > F.col("s1") * F.col("n0"), 0
            )
            .otherwise(1)
            .cast("int")
            .alias("winner"),
        )
        .orderBy("stratum")
    )


# ------------------------------------------------ IPD tournament

# Axelrod's iterated prisoner's dilemma (1984), noisy variant: AllC,
# AllD, Tit-for-Tat, Grudger and Pavlov round-robin over 64 rounds
# with a deterministic md5 trembling hand (1-in-20 executed-move
# flips). Payoffs T=5 R=3 P=1 S=0, exact integers. The NOISY-IPD
# literature's finding is frozen in the rows: one tremble sends
# TFT-vs-TFT into alternating defection spirals (its pair score
# drops well below the all-cooperate 192), while Grudger and Pavlov
# out-score TFT in this pool — every pair score is hash-fatal.
_IPD_ORACLE = """
WITH RECURSIVE pairs AS MATERIALIZED (
  SELECT a.a AS sa, b.b AS sb
  FROM (SELECT unnest(generate_series(0, 4)) AS a) a,
       (SELECT unnest(generate_series(0, 4)) AS b) b
),
st(sa, sb, r, la, lb, ga, gb, pa, pb) AS (
  SELECT sa, sb, 0, 0, 0, 0, 0, CAST(0 AS BIGINT), CAST(0 AS BIGINT)
  FROM pairs
  UNION ALL
  SELECT sa, sb, r + 1, ma, mb,
         CASE WHEN mb = 1 THEN 1 ELSE ga END,
         CASE WHEN ma = 1 THEN 1 ELSE gb END,
         pa + CASE ma * 2 + mb WHEN 0 THEN 3 WHEN 1 THEN 0
                               WHEN 2 THEN 5 ELSE 1 END,
         pb + CASE mb * 2 + ma WHEN 0 THEN 3 WHEN 1 THEN 0
                               WHEN 2 THEN 5 ELSE 1 END
  FROM (
    SELECT x.*,
           CASE WHEN ('0x' || substr(md5('nz:' || CAST(x.sa AS VARCHAR)
                  || ':' || CAST(x.sb AS VARCHAR) || ':'
                  || CAST(x.r + 1 AS VARCHAR) || ':A'), 1, 4))::BIGINT
                  % 20 = 0
                THEN 1 - x.ia ELSE x.ia END AS ma,
           CASE WHEN ('0x' || substr(md5('nz:' || CAST(x.sa AS VARCHAR)
                  || ':' || CAST(x.sb AS VARCHAR) || ':'
                  || CAST(x.r + 1 AS VARCHAR) || ':B'), 1, 4))::BIGINT
                  % 20 = 0
                THEN 1 - x.ib ELSE x.ib END AS mb
    FROM (
      SELECT s.*,
             CASE s.sa WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN s.lb
                  WHEN 3 THEN s.ga
                  ELSE CASE WHEN s.lb = 0 THEN s.la
                            ELSE 1 - s.la END END AS ia,
             CASE s.sb WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN s.la
                  WHEN 3 THEN s.gb
                  ELSE CASE WHEN s.la = 0 THEN s.lb
                            ELSE 1 - s.lb END END AS ib
      FROM st s WHERE s.r < 64
    ) x
  )
)
SELECT CAST(sa AS INT) AS strat_a, CAST(sb AS INT) AS strat_b,
       CAST(pa AS BIGINT) AS score_a, CAST(pb AS BIGINT) AS score_b
FROM st WHERE r = 64
ORDER BY strat_a, strat_b
"""


@register_extra("ipd_noisy_tournament", _IPD_ORACLE)
def ipd_noisy_tournament(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Noisy IPD round-robin (see oracle comment). One 64-round fold
    per ordered pair with the tremble hash evaluated in-lambda;
    map-only. Fixed 25-row output — the tournament matrix itself is
    the frozen artifact."""
    sess = spark
    pairs = (
        sess.range(0, 5)
        .select(F.col("id").cast("int").alias("sa"))
        .crossJoin(
            sess.range(0, 5).select(F.col("id").cast("int").alias("sb"))
        )
    )

    def noise(who: str) -> str:
        return (
            "CAST(conv(substring(md5(CAST(concat('nz:',"
            " CAST(sa AS STRING), ':', CAST(sb AS STRING), ':',"
            f" CAST(r AS STRING), ':{who}') AS BINARY)), 1, 4), 16, 10)"
            " AS BIGINT) % 20 = 0"
        )

    ia = (
        "CASE sa WHEN 0 THEN 0L WHEN 1 THEN 1L WHEN 2 THEN a.lb"
        " WHEN 3 THEN a.ga"
        " ELSE IF(a.lb = 0, a.la, 1 - a.la) END"
    )
    ib = (
        "CASE sb WHEN 0 THEN 0L WHEN 1 THEN 1L WHEN 2 THEN a.la"
        " WHEN 3 THEN a.gb"
        " ELSE IF(a.la = 0, a.lb, 1 - a.lb) END"
    )
    ma = f"IF({noise('A')}, 1 - ({ia}), {ia})"
    mb = f"IF({noise('B')}, 1 - ({ib}), {ib})"
    fold = (
        "aggregate(sequence(1, 64),"
        " named_struct('la', 0L, 'lb', 0L, 'ga', 0L, 'gb', 0L,"
        "              'pa', 0L, 'pb', 0L),"
        " (a, r) -> named_struct("
        f"   'la', {ma}, 'lb', {mb},"
        f"   'ga', IF(({mb}) = 1, 1L, a.ga),"
        f"   'gb', IF(({ma}) = 1, 1L, a.gb),"
        f"   'pa', a.pa + CASE ({ma}) * 2 + ({mb}) WHEN 0 THEN 3"
        "        WHEN 1 THEN 0 WHEN 2 THEN 5 ELSE 1 END,"
        f"   'pb', a.pb + CASE ({mb}) * 2 + ({ma}) WHEN 0 THEN 3"
        "        WHEN 1 THEN 0 WHEN 2 THEN 5 ELSE 1 END))"
    )
    return (
        pairs.withColumn("st", F.expr(fold))
        .select(
            F.col("sa").cast("int").alias("strat_a"),
            F.col("sb").cast("int").alias("strat_b"),
            F.col("st.pa").cast("long").alias("score_a"),
            F.col("st.pb").cast("long").alias("score_b"),
        )
        .orderBy("strat_a", "strat_b")
    )


# ------------------------------------------------ Condorcet cycles

# The Condorcet paradox (1785): majority preference can be
# INTRANSITIVE. Electorates of ranked ballots (md5 permutation per
# ballot over 4 candidates, reusing the IRV ranking construction with
# a per-electorate salt) yield the pairwise-majority tournament; the
# query reports every pairwise margin and counts directed 3-cycles —
# the paradox. Electorate -1 is the engineered rock-paper-scissors
# profile (three ballot types A>B>C, B>C>A, C>A>B over candidates
# 0..2 plus a fixed last place), whose cycle count is frozen at 1;
# md5 electorates show both transitive and cyclic outcomes.
_CONDORCET_ORACLE = """
WITH grp AS MATERIALIZED (
  SELECT DISTINCT o_custkey % 25 AS e FROM orders
),
ballots AS MATERIALIZED (
  SELECT e, event_id AS b FROM grp
  CROSS JOIN (SELECT event_id FROM events WHERE event_id % 5 = 0) ev
),
prefs AS MATERIALIZED (
  SELECT e, b, cand,
         row_number() OVER (
           PARTITION BY e, b
           ORDER BY md5('cv:' || CAST(e AS VARCHAR) || ':'
                        || CAST(cand AS VARCHAR) || ':'
                        || CAST(b AS VARCHAR)), cand) AS rnk
  FROM ballots
  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS cand) c
  UNION ALL
  -- engineered RPS electorate: ballots 1..3 cycle A>B>C>D shifts
  SELECT -1, t.t, c.cand,
         CAST(CASE WHEN c.cand = 3 THEN 4
              ELSE ((c.cand - t.t + 3) % 3) + 1 END AS BIGINT)
  FROM (SELECT unnest(generate_series(0, 2)) AS t) t
  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS cand) c
),
pair AS MATERIALIZED (
  SELECT a.e, a.cand AS x, b.cand AS y,
         sum(CASE WHEN a.rnk < b.rnk THEN 1 ELSE 0 END) AS wins,
         count(*) AS n
  FROM prefs a
  JOIN prefs b ON b.e = a.e AND b.b = a.b AND b.cand <> a.cand
  GROUP BY a.e, a.cand, b.cand
),
beats AS MATERIALIZED (
  SELECT e, x, y FROM pair WHERE 2 * wins > n
),
cycles AS MATERIALIZED (
  SELECT a.e, count(*) AS n_cycles
  FROM beats a
  JOIN beats b ON b.e = a.e AND b.x = a.y
  JOIN beats c ON c.e = a.e AND c.x = b.y AND c.y = a.x
  WHERE a.x < b.x AND a.x < c.x
  GROUP BY a.e
)
SELECT CAST(p.e AS BIGINT) AS electorate,
       CAST(p.x AS INT) AS x, CAST(p.y AS INT) AS y,
       CAST(p.wins AS BIGINT) AS wins, CAST(p.n AS BIGINT) AS n_ballots,
       CAST(coalesce(c.n_cycles, 0) AS INT) AS n_cycles
FROM pair p LEFT JOIN cycles c ON c.e = p.e
WHERE p.x < p.y
ORDER BY electorate, x, y
"""


@register_extra("condorcet_cycle_detect", _CONDORCET_ORACLE)
def condorcet_cycle_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Condorcet pairwise tournament + 3-cycle count (see oracle
    comment). One ballot fanout, one pair partial-agg, a dim-sized
    triangle join on the beats relation."""
    o = _t(spark, sf_dir, "orders")
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") % 5 == 0)
    sess = o.sparkSession
    grp = o.select((F.col("o_custkey") % 25).alias("e")).distinct()
    cands = sess.range(0, 4).select(F.col("id").cast("long").alias("cand"))
    prefs = (
        grp.crossJoin(ev.select(F.col("event_id").alias("b")))
        .crossJoin(F.broadcast(cands))
        .select(
            "e",
            "b",
            "cand",
            F.md5(
                F.concat(
                    F.lit("cv:"),
                    F.col("e").cast("string"),
                    F.lit(":"),
                    F.col("cand").cast("string"),
                    F.lit(":"),
                    F.col("b").cast("string"),
                ).cast("binary")
            ).alias("h"),
        )
        .withColumn(
            "rnk",
            F.row_number()
            .over(Window.partitionBy("e", "b").orderBy("h", "cand"))
            .cast("long"),
        )
        .drop("h")
    )
    rps = (
        sess.range(0, 3)
        .select(F.col("id").cast("long").alias("t"))
        .crossJoin(F.broadcast(cands))
        .select(
            F.lit(-1).cast("long").alias("e"),
            F.col("t").alias("b"),
            "cand",
            F.expr(
                "CAST(CASE WHEN cand = 3 THEN 4"
                " ELSE ((cand - t + 3) % 3) + 1 END AS BIGINT)"
            ).alias("rnk"),
        )
    )
    allp = prefs.unionByName(rps).localCheckpoint(eager=True)
    b2 = allp.select(
        F.col("e").alias("e2"), F.col("b").alias("bb"),
        F.col("cand").alias("cand2"), F.col("rnk").alias("rnk2"),
    )
    pair = (
        allp.join(
            b2,
            (F.col("e2") == F.col("e"))
            & (F.col("bb") == F.col("b"))
            & (F.col("cand2") != F.col("cand")),
        )
        .groupBy("e", F.col("cand").alias("x"), F.col("cand2").alias("y"))
        .agg(
            F.sum(
                F.when(F.col("rnk") < F.col("rnk2"), 1).otherwise(0)
            ).alias("wins"),
            F.count(F.lit(1)).alias("n"),
        )
        .localCheckpoint(eager=True)
    )
    beats = pair.filter(2 * F.col("wins") > F.col("n")).select("e", "x", "y")
    ba = beats.select(F.col("e"), F.col("x").alias("ax"), F.col("y").alias("ay"))
    bb_ = beats.select(
        F.col("e").alias("eb"), F.col("x").alias("bx"), F.col("y").alias("by")
    )
    bc = beats.select(
        F.col("e").alias("ec"), F.col("x").alias("cx"), F.col("y").alias("cy")
    )
    cycles = (
        ba.join(bb_, (F.col("eb") == F.col("e")) & (F.col("bx") == F.col("ay")))
        .join(
            bc,
            (F.col("ec") == F.col("e"))
            & (F.col("cx") == F.col("by"))
            & (F.col("cy") == F.col("ax")),
        )
        .filter((F.col("ax") < F.col("bx")) & (F.col("ax") < F.col("cx")))
        .groupBy("e")
        .agg(F.count(F.lit(1)).alias("n_cycles"))
    )
    return (
        pair.filter(F.col("x") < F.col("y"))
        .join(F.broadcast(cycles), "e", "left")
        .select(
            F.col("e").cast("long").alias("electorate"),
            F.col("x").cast("int"),
            F.col("y").cast("int"),
            F.col("wins").cast("long"),
            F.col("n").cast("long").alias("n_ballots"),
            F.coalesce("n_cycles", F.lit(0)).cast("int").alias("n_cycles"),
        )
        .orderBy("electorate", "x", "y")
    )


# ------------------------------------------------ Kelly betting

# Kelly criterion (1956): on a p = 0.55 even-money coin the
# growth-optimal stake is f* = 2p - 1 = 10%. Five fixed fractions
# (2.5%, half-Kelly 5%, Kelly 10%, 25%, over-bet 60%) replay the
# SAME 200 md5 outcomes per scenario in e6 integer wealth with
# floored stakes — Kelly's theorem shows up in the frozen rows:
# the 10% column dominates final wealth in most scenarios while the
# 60% over-bet collapses toward zero (volatility drag), exactly as
# the log-growth curve predicts.
_KELLY_ORACLE = """
WITH RECURSIVE grp AS MATERIALIZED (
  SELECT DISTINCT s_suppkey % 40 AS g FROM supplier
),
strat AS MATERIALIZED (
  SELECT unnest([250, 500, 1000, 2500, 6000]) AS f_e4
),
st(g, f_e4, i, w) AS (
  SELECT g, f_e4, 0, CAST(1000000 AS BIGINT)
  FROM grp CROSS JOIN strat
  UNION ALL
  SELECT g, f_e4, i + 1,
         CASE WHEN ('0x' || substr(md5('kb:' || CAST(g AS VARCHAR)
                || ':' || CAST(i + 1 AS VARCHAR)), 1, 4))::BIGINT
                % 100 < 55
              THEN w + w * f_e4 // 10000
              ELSE w - w * f_e4 // 10000 END
  FROM st WHERE i < 200
)
SELECT CAST(g AS BIGINT) AS g, CAST(f_e4 AS BIGINT) AS f_e4,
       CAST(w AS BIGINT) AS final_wealth_e6
FROM st WHERE i = 200
ORDER BY g, f_e4
"""


@register_extra("kelly_betting_replay", _KELLY_ORACLE)
def kelly_betting_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kelly-fraction wealth replays (see oracle comment) — one
    200-step fold per (scenario, fraction); map-only exact int64."""
    s = _t(spark, sf_dir, "supplier")
    grp = s.select((F.col("s_suppkey") % 40).alias("g")).distinct()
    strat = s.sparkSession.createDataFrame(
        [(250,), (500,), (1000,), (2500,), (6000,)], "f_e4 long"
    )
    fold = (
        "aggregate(sequence(1, 200), 1000000L,"
        " (w, i) -> IF(CAST(conv(substring(md5(CAST(concat('kb:',"
        " CAST(g AS STRING), ':', CAST(i AS STRING)) AS BINARY)),"
        " 1, 4), 16, 10) AS BIGINT) % 100 < 55,"
        "   w + w * f_e4 div 10000, w - w * f_e4 div 10000))"
    )
    return (
        grp.crossJoin(F.broadcast(strat))
        .withColumn("w", F.expr(fold))
        .select(
            F.col("g").cast("long"),
            F.col("f_e4").cast("long"),
            F.col("w").cast("long").alias("final_wealth_e6"),
        )
        .orderBy("g", "f_e4")
    )


# ------------------------------------------------ minimax rollup

# Minimax / Zermelo (1913): depth-4 uniform branching-4 game trees
# (256 md5 leaves per game) evaluated bottom-up — MAX at the root and
# depth 2, MIN at depths 1 and 3 — as four staged partial-agg
# rollups on the node-path prefix (the relational formulation of
# backward induction; no alpha-beta, every node aggregated exactly
# once). The root value, the optimal first move (argmax with
# smallest-index tie-break) and the value of the subtree under that
# move (equal by construction — frozen) certify the recursion.
_MINIMAX_ORACLE = """
WITH leaves AS MATERIALIZED (
  SELECT g.g, p.p,
         ('0x' || substr(md5('mm:' || CAST(g.g AS VARCHAR) || ':'
            || CAST(p.p AS VARCHAR)), 1, 4))::BIGINT % 200 - 100 AS v
  FROM (SELECT unnest(generate_series(0, 59)) AS g) g,
       (SELECT unnest(generate_series(0, 255)) AS p) p
),
d3 AS MATERIALIZED (
  SELECT g, p // 4 AS p, min(v) AS v FROM leaves GROUP BY g, p // 4
),
d2 AS MATERIALIZED (
  SELECT g, p // 4 AS p, max(v) AS v FROM d3 GROUP BY g, p // 4
),
d1 AS MATERIALIZED (
  SELECT g, p // 4 AS p, min(v) AS v FROM d2 GROUP BY g, p // 4
),
root AS MATERIALIZED (
  SELECT g, max(v) AS v,
         min_by(p, (-v) * 16 + p) AS best_move
  FROM d1 GROUP BY g
)
SELECT CAST(r.g AS BIGINT) AS g, CAST(r.v AS BIGINT) AS root_value,
       CAST(r.best_move % 4 AS INT) AS best_move,
       CAST(d.v AS BIGINT) AS best_subtree_value,
       CAST(CASE WHEN d.v = r.v THEN 1 ELSE 0 END AS INT) AS consistent
FROM root r JOIN d1 d ON d.g = r.g AND d.p = r.best_move
ORDER BY g
"""


@register_extra("minimax_game_rollup", _MINIMAX_ORACLE)
def minimax_game_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-up minimax (see oracle comment) — four partial-agg
    rollups on path prefixes; the at-scale shape for solving wide
    retrograde tablebases. tests referee against a direct recursive
    evaluator."""
    sess = spark
    gs = sess.range(0, 60).select(F.col("id").cast("long").alias("g"))
    ps = sess.range(0, 256).select(F.col("id").cast("long").alias("p"))
    leaves = gs.crossJoin(F.broadcast(ps)).select(
        "g",
        "p",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("mm:"),
                            F.col("g").cast("string"),
                            F.lit(":"),
                            F.col("p").cast("string"),
                        ).cast("binary")
                    ),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("long")
            % 200
            - 100
        ).alias("v"),
    )
    d3 = leaves.groupBy("g", F.expr("p div 4").alias("p")).agg(
        F.min("v").alias("v")
    )
    d2 = d3.groupBy("g", F.expr("p div 4").alias("p")).agg(
        F.max("v").alias("v")
    )
    d1 = d2.groupBy("g", F.expr("p div 4").alias("p")).agg(
        F.min("v").alias("v")
    )
    root = d1.groupBy("g").agg(
        F.max("v").alias("rv"),
        F.expr("min_by(p, (-v) * 16 + p)").alias("best_move"),
    )
    return (
        root.join(
            d1.select("g", F.col("p").alias("best_move"),
                      F.col("v").alias("bv")),
            ["g", "best_move"],
        )
        .select(
            F.col("g").cast("long"),
            F.col("rv").cast("long").alias("root_value"),
            (F.col("best_move") % 4).cast("int").alias("best_move"),
            F.col("bv").cast("long").alias("best_subtree_value"),
            F.when(F.col("bv") == F.col("rv"), 1).otherwise(0).cast("int")
            .alias("consistent"),
        )
        .orderBy("g")
    )
