"""Sketch operators (operators/sketches.py): HLL mergeability +
accuracy, count-min upper-bound + fixed-size state, PageRank vs a
from-scratch numpy fixed-point oracle. Cross-engine value parity is
covered by tests/test_oracle_parity.py (extra tier)."""

import hashlib

import numpy as np
from pyspark.sql import functions as F

from osm2vdv462_spark.operators import sketches as sk


def _items(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            F.concat(
                F.col("user_id").cast("string"), F.lit(":"), F.col("props")
            ).alias("item"),
            "event_id",
        )
    )


def test_hll_merge_equals_whole(spark, sf_dir):
    """max-merging register tables built on two disjoint slices must
    equal the registers built on the union — the associativity that
    lets per-partition/per-day sketches roll up without a rescan."""
    base = _items(spark, sf_dir)
    whole = sk.hll_registers(base, [], "item")
    a = sk.hll_registers(base.filter(F.col("event_id") % 2 == 0), [], "item")
    b = sk.hll_registers(base.filter(F.col("event_id") % 2 == 1), [], "item")
    merged = sk.hll_merge(a, b)
    w = {(r.hll_bucket): r.hll_reg for r in whole.collect()}
    m = {(r.hll_bucket): r.hll_reg for r in merged.collect()}
    assert w == m


def test_hll_accuracy_and_state_bound(spark, sf_dir):
    base = _items(spark, sf_dir)
    regs = sk.hll_registers(base, [], "item")
    n_regs = regs.count()
    assert n_regs <= sk.HLL_M  # the sketch state is bounded by m
    est = sk.hll_estimate(regs, []).collect()[0].hll_estimate
    exact = base.select("item").distinct().count()
    # m=1024 -> std error ~3.2%; 4 sigma bound keeps the test stable
    assert abs(est - exact) / exact < 0.13, (est, exact)


def test_cm_upper_bound_and_fixed_state(spark, sf_dir):
    toks = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias(
                "token"
            )
        )
    )
    d, w = 4, 64
    sketch = sk.cm_sketch(toks, "token", d=d, w=w)
    assert sketch.count() <= d * w  # state is d*w cells, not vocab-sized
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("exact_cnt"))
    out = sk.cm_lookup(sketch, exact, "token", d=d, w=w).collect()
    assert len(out) > 0
    for r in out:  # count-min never underestimates
        assert r.cm_est >= r.exact_cnt, (r.token, r.cm_est, r.exact_cnt)


def test_hdr_histogram_merge_and_error_bound(spark, sf_dir):
    """Sum-merging histograms from two disjoint slices equals the whole
    histogram, and every quantile estimate is a lower bound within the
    2^-5 relative-error guarantee of the exact quantile."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    whole = sk.hdr_histogram(o, [], "cents")
    a = sk.hdr_histogram(o.filter(F.col("o_orderkey") % 2 == 0), [], "cents")
    b = sk.hdr_histogram(o.filter(F.col("o_orderkey") % 2 == 1), [], "cents")
    merged = (
        a.unionByName(b)
        .groupBy("hdr_bid", "hdr_lb")
        .agg(F.sum("hdr_cnt").alias("hdr_cnt"))
    )
    w = {(r.hdr_bid, r.hdr_lb): r.hdr_cnt for r in whole.collect()}
    m = {(r.hdr_bid, r.hdr_lb): r.hdr_cnt for r in merged.collect()}
    assert w == m

    est = sk.hdr_quantiles(whole, [], [0.5, 0.95, 0.99]).collect()[0]
    vals = sorted(r.cents for r in o.collect())
    import math

    for q, got in [(0.5, est.p50_est), (0.95, est.p95_est), (0.99, est.p99_est)]:
        exact = vals[math.ceil(q * len(vals)) - 1]
        assert got <= exact < got * (1 + 2**-5), (q, got, exact)


def test_pagerank_matches_numpy_fixed_point(spark, sf_dir):
    """Replicate the exact integer semantics (e12 fixed point,
    truncating div, dangling leak) in numpy and compare bit-for-bit."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("user_id", "event_id")
    edges_df = ev.select(
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
    got = {
        r.node: r.rank_e12 for r in sk.pagerank_e12(edges_df, iters=3).collect()
    }

    # independent edge derivation: hashlib, not Spark
    rows = ev.collect()
    edges = set()
    for r in rows:
        src = int(r.user_id) % 200
        dst = int(hashlib.md5(f"pr:{int(r.event_id)}".encode()).hexdigest()[:7], 16) % 200
        if src != dst:
            edges.add((src, dst))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    outdeg = np.zeros(len(nodes), dtype=np.int64)
    for s, _ in edges:
        outdeg[idx[s]] += 1
    rank = np.full(len(nodes), sk.PR_ONE_E12, dtype=np.int64)
    for _ in range(3):
        contrib = np.zeros(len(nodes), dtype=np.int64)
        for s, d in edges:
            contrib[idx[d]] += rank[idx[s]] // outdeg[idx[s]]
        rank = sk.PR_BASE_E12 + (85 * contrib) // 100
    want = {n: int(rank[idx[n]]) for n in nodes}
    assert got == want


class TestMillerRabinReferee:
    def test_matches_trial_division(self, spark, sf_dir):
        """Third derivation for miller_rabin_audit: brute trial
        division must agree with the two-base deterministic MR
        verdicts on every candidate, including the engineered
        strong-pseudoprime fixtures (2047 fools base 2; 703 and 121
        fool base 3)."""
        from osm2vdv462_spark.queries.sketch_queries import miller_rabin_audit

        rows = miller_rabin_audit(spark, sf_dir).collect()
        assert len(rows) > 100

        def isp(n):
            if n < 2:
                return False
            i = 2
            while i * i <= n:
                if n % i == 0:
                    return False
                i += 1
            return True

        fx = {r["n"]: (r["passes_b2"], r["passes_b3"]) for r in rows}
        assert fx[2047] == (1, 0) and fx[703] == (0, 1) and fx[121] == (0, 1)
        for r in rows:
            assert bool(r["is_prime"]) == isp(r["n"]), r


class TestBerlekampMasseyReferee:
    def test_matches_python_bm(self, spark, sf_dir):
        """Independent Python Berlekamp-Massey must agree on every
        (complexity, connection polynomial) pair, fixtures included."""
        from osm2vdv462_spark.queries.sketch_queries import (
            berlekamp_massey_lfsr,
        )

        def bm(bits, n=30):
            C, B, L, m, reg = 1, 1, 0, 1, 0
            for i in range(n):
                s_i = (bits >> i) & 1
                d = s_i ^ (bin((C >> 1) & reg).count("1") % 2)
                if d == 1:
                    T = C
                    C ^= B << m
                    if 2 * L <= i:
                        L, B, m = i + 1 - L, T, 1
                    else:
                        m += 1
                else:
                    m += 1
                reg = ((reg << 1) | s_i) % (1 << 30)
            return L, C

        rows = berlekamp_massey_lfsr(spark, sf_dir).collect()
        assert len(rows) > 10
        for r in rows:
            assert bm(r["bits"]) == (r["complexity"], r["conn_poly"]), r
        fx = {r["g"]: r["complexity"] for r in rows if r["g"] < 0}
        assert fx == {-1: 4, -2: 5, -3: 1, -4: 2}


class TestGF2RankReferee:
    def test_matches_python_elimination(self, spark, sf_dir):
        """Independent Python XOR-basis elimination must agree on rank
        and basis checksum for every matrix, fixtures included."""
        import hashlib

        from osm2vdv462_spark.queries.sketch_queries import (
            _GF2_FIXTURES,
            gf2_matrix_rank,
        )

        def rank16(rows):
            slots, rank = [0] * 16, 0
            for r in rows:
                cur = r
                for bit in range(15, -1, -1):
                    if (cur >> bit) & 1:
                        if slots[bit]:
                            cur ^= slots[bit]
                        else:
                            slots[bit] = cur
                            rank += 1
                            break
            return rank, sum(slots)

        got = {
            r["g"]: (r["rank_gf2"], r["basis_chk"])
            for r in gf2_matrix_rank(spark, sf_dir).collect()
        }
        for g, rows in _GF2_FIXTURES:
            assert got[g] == rank16(rows), g
        for g in [x for x in got if x >= 0]:
            rows = [
                int(hashlib.md5(f"gr:{g}:{j}".encode()).hexdigest()[:4], 16)
                % 65536
                for j in range(16)
            ]
            assert got[g] == rank16(rows), g


class TestCordicReferee:
    def test_tracks_real_trig(self, spark, sf_dir):
        """CORDIC Q26 outputs must track math.cos/sin within the
        14-iteration error bound on every angle."""
        import math

        from osm2vdv462_spark.queries.sketch_queries import cordic_rotation

        rows = cordic_rotation(spark, sf_dir).collect()
        assert len(rows) > 50
        sc = 1 << 26
        for r in rows:
            th = r["angle_q26"] / sc
            assert abs(r["cos_q26"] / sc - math.cos(th)) < 2e-4, r
            assert abs(r["sin_q26"] / sc - math.sin(th)) < 2e-4, r
            assert abs(r["residual_z"]) <= 8192  # last atan step


class TestVerhoeffLuhnReferee:
    def test_matches_python_checksums(self, spark, sf_dir):
        """Python reimplementations of both schemes must agree on the
        check digits, and Luhn's misses must be exactly the {0,9}
        adjacent swaps while Verhoeff misses none (its theorem)."""
        import hashlib

        from osm2vdv462_spark.queries.sketch_queries import (
            _VH_D,
            _VH_INV,
            _VH_P,
            verhoeff_luhn_transpositions,
        )

        D = [_VH_D[i * 10 : (i + 1) * 10] for i in range(10)]
        P = [_VH_P[i * 10 : (i + 1) * 10] for i in range(8)]

        def vh_check(payload):
            c = 0
            for i, dig in enumerate(reversed(payload)):
                c = D[c][P[(i + 1) % 8][dig]]
            return _VH_INV[c]

        def luhn_check(payload):
            s = 0
            for i, dig in enumerate(reversed(payload)):
                v = dig * 2 if i % 2 == 0 else dig
                s += v - 9 if v > 9 else v
            return (10 - s % 10) % 10

        rows = verhoeff_luhn_transpositions(spark, sf_dir).collect()
        assert len(rows) > 100
        for r in rows:
            pd = [
                int(
                    hashlib.md5(f"vd:{r['g']}:{i}".encode()).hexdigest()[:4],
                    16,
                )
                % 10
                for i in range(1, 11)
            ]
            assert r["verhoeff_cd"] == vh_check(pd), r
            assert r["luhn_cd"] == luhn_check(pd), r
            assert r["verhoeff_missed"] == 0, r
            lf = pd + [r["luhn_cd"]]
            expect_luhn_miss = sum(
                1
                for i in range(10)
                if {lf[i], lf[i + 1]} == {0, 9}
            )
            assert r["luhn_missed"] == expect_luhn_miss, r


class TestFloydCycleReferee:
    def test_matches_python_rho(self, spark, sf_dir):
        """Direct Python rho decomposition (walk until revisit) must
        agree with the tortoise-hare mu/lambda on every seed."""
        import hashlib

        from osm2vdv462_spark.queries.sketch_queries import (
            floyd_cycle_detection,
        )

        def f(g, x):
            return (
                int(hashlib.md5(f"fg:{g}:{x}".encode()).hexdigest()[:4], 16)
                % 64
            )

        rows = floyd_cycle_detection(spark, sf_dir).collect()
        assert len(rows) >= 10
        for r in rows:
            seen, path, x = {}, [], r["x0"]
            while x not in seen:
                seen[x] = len(path)
                path.append(x)
                x = f(r["g"], x)
            mu = seen[x]
            lam = len(path) - mu
            assert (r["mu"], r["lambda"]) == (mu, lam), r


class TestBareissReferee:
    def test_matches_fraction_gauss(self, spark, sf_dir):
        """Exact Fraction Gaussian elimination must agree with the
        Bareiss integer determinant on every matrix."""
        import hashlib
        from fractions import Fraction

        from osm2vdv462_spark.queries.sketch_queries import (
            bareiss_determinant,
        )

        def mat(g):
            m = [
                [
                    int(
                        hashlib.md5(f"bd:{g}:{i}:{j}".encode()).hexdigest()[
                            :4
                        ],
                        16,
                    )
                    % 41
                    - 20
                    for j in range(5)
                ]
                for i in range(5)
            ]
            for i in range(5):
                m[i][i] += 100
            return m

        def gauss_det(m):
            a = [[Fraction(v) for v in row] for row in m]
            det = Fraction(1)
            for k in range(5):
                det *= a[k][k]
                for i in range(k + 1, 5):
                    f = a[i][k] / a[k][k]
                    for j in range(k, 5):
                        a[i][j] -= f * a[k][j]
            return det

        rows = bareiss_determinant(spark, sf_dir).collect()
        assert len(rows) > 20
        for r in rows:
            assert Fraction(r["det"]) == gauss_det(mat(r["g"])), r["g"]
