"""Registry family: sketches (9 queries).

- sketch_countmin_topk
- sketch_hll_deterministic
- sketch_hll_rollup
- sketch_kmv_setops
- bloom_semi_prune
- sketch_join_cardinality
- sketch_hll_sliding
- sketch_hll_index_daily
- sketch_quantile_sample
"""

from ._shared import *  # noqa: F401,F403
from ._shared import _register  # noqa: F401



@_register(
    "sketch_countmin_topk",
    """
    WITH dd AS (SELECT UNNEST([0, 1, 2, 3]) AS d),
    sketch AS (
      SELECT dd.d,
             CAST('0x' || substr(md5(CAST(dd.d AS VARCHAR) || ':'
                                     || CAST(l_suppkey AS VARCHAR)), 1, 8)
                  AS BIGINT) % 256 AS bucket,
             COUNT(*) AS cnt
      FROM lineitem, dd
      GROUP BY 1, 2
    ),
    topk AS (
      SELECT l_suppkey, COUNT(*) AS true_cnt
      FROM lineitem GROUP BY 1
      ORDER BY true_cnt DESC, l_suppkey LIMIT 20
    ),
    est AS (
      SELECT t.l_suppkey, MIN(COALESCE(s.cnt, 0)) AS est_cnt
      FROM topk t
      CROSS JOIN dd
      LEFT JOIN sketch s
        ON s.d = dd.d
       AND s.bucket = CAST('0x' || substr(md5(CAST(dd.d AS VARCHAR) || ':'
                                     || CAST(t.l_suppkey AS VARCHAR)), 1, 8)
                           AS BIGINT) % 256
      GROUP BY 1
    )
    SELECT t.l_suppkey, t.true_cnt, e.est_cnt,
           e.est_cnt >= t.true_cnt AS ge_true
    FROM topk t JOIN est e USING (l_suppkey)
    ORDER BY true_cnt DESC, l_suppkey
    """,
)
def _sketch_countmin_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Count-min frequency sketch (operators/sketches.countmin_build /
    countmin_estimate) — a sketch query with a REAL hash-checked
    oracle, possible because the whole 4×256 counter state is
    md5-derived and ANSI-SQL-expressible (same exact-integer idiom as
    sample_weighted_bernoulli), no engine-internal estimator anywhere.
    Shape: one scan of lineitem exploded ×4 into one counter groupBy
    (KB-scale state regardless of input size, counter-wise mergeable
    across slices — pinned in tests/test_sketches.py); estimates for
    the top-20 true-frequency suppliers come from broadcasting the
    counter table onto the keys, min over 4 counters each. The output
    pins the CM overestimate guarantee (ge_true) per key, so a
    hash-collision arithmetic drift in EITHER engine flips a boolean
    the driver hashes."""
    li = read_table(spark, sf, "lineitem")
    sk = SKC.countmin_build(li, "l_suppkey", depth=4, width=256)
    topk = (
        li.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .orderBy(F.col("true_cnt").desc(), "l_suppkey")
        .limit(20)
    )
    est = SKC.countmin_estimate(
        sk, topk.select("l_suppkey"), "l_suppkey", depth=4, width=256
    )
    return (
        topk.join(est, "l_suppkey")
        .select(
            "l_suppkey",
            "true_cnt",
            "est_cnt",
            (F.col("est_cnt") >= F.col("true_cnt")).alias("ge_true"),
        )
        .orderBy(F.col("true_cnt").desc(), "l_suppkey")
    )


@_register(
    "sketch_hll_deterministic",
    f"""
    WITH h AS (
      SELECT o_orderstatus,
             CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8)
                  AS BIGINT) AS hv
      FROM orders
    ),
    regs AS (
      SELECT o_orderstatus, hv % 64 AS bucket,
             MAX(CASE WHEN instr(lpad(bin(hv // 64), 26, '0'), '1') = 0
                      THEN 27
                      ELSE instr(lpad(bin(hv // 64), 26, '0'), '1') END) AS r
      FROM h GROUP BY 1, 2
    ),
    est AS (
      SELECT o_orderstatus,
             CAST(SUM(CAST(1 AS BIGINT) << (27 - r))
                  + (64 - COUNT(*)) * 134217728 AS BIGINT) AS register_sum,
             CAST(64 - COUNT(*) AS BIGINT) AS zero_registers
      FROM regs GROUP BY 1
    ),
    ex AS (
      SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS exact_custs
      FROM orders GROUP BY 1
    )
    SELECT e.o_orderstatus, ex.exact_custs, e.register_sum, e.zero_registers,
           {_HLL_CONST!r} / e.register_sum AS hll_raw_est
    FROM est e JOIN ex USING (o_orderstatus)
    """,
)
def _sketch_hll_deterministic(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic HyperLogLog (operators/sketches.hll_det_registers
    / hll_det_estimate): the oracle-checkable sibling of the
    DataSketches HLL path — md5-bucketed registers, rho from string
    ops on bin() (no log/pow anywhere), harmonic-mean denominator kept
    as an EXACT scaled integer (absent registers contribute 2^27), one
    final IEEE division of identical operands. The oracle replays the
    identical arithmetic in DuckDB, so the register table, zero-count
    AND the raw estimate hash-match bit-for-bit — a cardinality
    sketch whose full state is cross-engine reproducible (per-bucket
    MAX merge pinned in tests/test_sketches.py; DataSketches' HLL++
    remains the production-accuracy path, hll_partials).
    Exact counts ride along so the estimate is auditable per group."""
    orders = read_table(spark, sf, "orders")
    regs = SKC.hll_det_registers(orders, "o_custkey", ["o_orderstatus"])
    est = SKC.hll_det_estimate(regs, ["o_orderstatus"])
    exact = orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("exact_custs")
    )
    return est.join(exact, "o_orderstatus").select(
        "o_orderstatus", "exact_custs", "register_sum", "zero_registers",
        "hll_raw_est",
    )


@_register(
    "sketch_hll_rollup",
    f"""
    WITH h AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
             o_orderdate AS day,
             CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8)
                  AS BIGINT) AS hv
      FROM orders
    ),
    daily AS (
      SELECT mon, day, hv % 64 AS bucket,
             MAX(CASE WHEN instr(lpad(bin(hv // 64), 26, '0'), '1') = 0
                      THEN 27
                      ELSE instr(lpad(bin(hv // 64), 26, '0'), '1') END) AS r
      FROM h GROUP BY 1, 2, 3
    ),
    monthly AS (
      SELECT mon, bucket, MAX(r) AS r FROM daily GROUP BY 1, 2
    ),
    est AS (
      SELECT mon,
             CAST(SUM(CAST(1 AS BIGINT) << (27 - r))
                  + (64 - COUNT(*)) * 134217728 AS BIGINT) AS register_sum,
             CAST(64 - COUNT(*) AS BIGINT) AS zero_registers
      FROM monthly GROUP BY 1
    ),
    ex AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
             COUNT(DISTINCT o_custkey) AS exact_custs
      FROM orders GROUP BY 1
    )
    SELECT e.mon, ex.exact_custs, e.register_sum, e.zero_registers,
           {_HLL_CONST!r} / e.register_sum AS hll_raw_est
    FROM est e JOIN ex USING (mon)
    """,
)
def _sketch_hll_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Sketch ROLLUP without rescan (operators/sketches.hll_det_rollup):
    per-(month, day) HLL register tables merge to per-month registers
    by per-bucket MAX — the continuous-aggregate contract
    (reference recounts whole tables per profiling run,
    dags/data_profiling/query/data_profiling_function.sql:37; here a
    month's distinct-customer count derives from the KB-scale daily
    register table, never the raw orders again). The oracle replays
    the identical two-level merge in DuckDB, so the rolled-up register
    state AND the estimate hash-match bit-for-bit; exact per-month
    distinct counts ride along for auditability."""
    orders = read_table(spark, sf, "orders")
    mon = F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("mon")
    base = orders.select(
        mon, F.col("o_orderdate").alias("day"), "o_custkey"
    )
    daily = SKC.hll_det_registers(base, "o_custkey", ["mon", "day"])
    monthly = SKC.hll_det_rollup(daily, ["mon"])
    est = SKC.hll_det_estimate(monthly, ["mon"])
    exact = orders.groupBy(mon).agg(
        F.countDistinct("o_custkey").alias("exact_custs")
    )
    return est.join(exact, "mon").select(
        "mon", "exact_custs", "register_sum", "zero_registers", "hll_raw_est"
    )


@_register(
    "sketch_kmv_setops",
    """
    WITH af AS (
      SELECT DISTINCT o_orderpriority AS prio,
             CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8)
                  AS BIGINT) AS hv
      FROM orders WHERE o_orderstatus = 'F'
    ),
    ak AS (
      SELECT prio, hv FROM (
        SELECT prio, hv,
               row_number() OVER (PARTITION BY prio ORDER BY hv) AS rn
        FROM af) WHERE rn <= 64
    ),
    bf AS (
      SELECT DISTINCT o_orderpriority AS prio,
             CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8)
                  AS BIGINT) AS hv
      FROM orders WHERE o_orderstatus = 'O'
    ),
    bk AS (
      SELECT prio, hv FROM (
        SELECT prio, hv,
               row_number() OVER (PARTITION BY prio ORDER BY hv) AS rn
        FROM bf) WHERE rn <= 64
    ),
    uni AS (
      SELECT prio, hv FROM (
        SELECT prio, hv,
               row_number() OVER (PARTITION BY prio ORDER BY hv) AS rn
        FROM (SELECT DISTINCT prio, hv FROM
                (SELECT * FROM ak UNION ALL SELECT * FROM bk))
      ) WHERE rn <= 64
    ),
    eu AS (
      SELECT prio,
             CASE WHEN COUNT(*) < 64 THEN CAST(COUNT(*) AS DOUBLE)
                  ELSE CAST(270582939648 AS DOUBLE) / MAX(hv) END AS est_union,
             COUNT(*) AS state_n
      FROM uni GROUP BY 1
    ),
    nand AS (
      SELECT u.prio, COUNT(*) AS n_and
      FROM uni u
      WHERE EXISTS (SELECT 1 FROM ak WHERE ak.prio = u.prio AND ak.hv = u.hv)
        AND EXISTS (SELECT 1 FROM bk WHERE bk.prio = u.prio AND bk.hv = u.hv)
      GROUP BY 1
    ),
    ea AS (
      SELECT prio,
             CASE WHEN COUNT(*) < 64 THEN CAST(COUNT(*) AS DOUBLE)
                  ELSE CAST(270582939648 AS DOUBLE) / MAX(hv) END AS est_f
      FROM ak GROUP BY 1
    ),
    eb AS (
      SELECT prio,
             CASE WHEN COUNT(*) < 64 THEN CAST(COUNT(*) AS DOUBLE)
                  ELSE CAST(270582939648 AS DOUBLE) / MAX(hv) END AS est_o
      FROM bk GROUP BY 1
    ),
    exu AS (
      SELECT o_orderpriority AS prio,
             COUNT(DISTINCT o_custkey) AS exact_union
      FROM orders WHERE o_orderstatus IN ('F', 'O') GROUP BY 1
    ),
    exi AS (
      SELECT prio, COUNT(*) AS exact_intersect FROM (
        SELECT o_orderpriority AS prio, o_custkey
        FROM orders WHERE o_orderstatus IN ('F', 'O')
        GROUP BY 1, 2 HAVING COUNT(DISTINCT o_orderstatus) = 2
      ) GROUP BY 1
    )
    SELECT eu.prio AS o_orderpriority, ea.est_f, eb.est_o, eu.est_union,
           COALESCE(nand.n_and, 0) * eu.est_union / eu.state_n
             AS est_intersect,
           exu.exact_union, COALESCE(exi.exact_intersect, 0)
             AS exact_intersect
    FROM eu
    JOIN ea USING (prio)
    JOIN eb USING (prio)
    LEFT JOIN nand USING (prio)
    JOIN exu USING (prio)
    LEFT JOIN exi USING (prio)
    """,
)
def _sketch_kmv_setops(spark: SparkSession, sf: str) -> DataFrame:
    """KMV bottom-k theta sketch SET OPERATIONS
    (operators/sketches.kmv_state/kmv_union/kmv_setop_estimate):
    distinct customers per priority with F-status vs O-status orders —
    each population's cardinality, their union, and their intersection
    estimated from two k=64 hash-sample states (Beyer et al.'s KMV
    estimators), never from the raw rows. The whole state is
    md5-derived integers under a total order, so the DuckDB oracle
    reproduces every estimate bit-for-bit (single final divisions of
    exact operands); exact union/intersection counts ride along. This
    is the sketch the HLL family can't be: set-intersectable."""
    orders = read_table(spark, sf, "orders")
    grp = ["o_orderpriority"]
    a = SKC.kmv_state(
        orders.filter(F.col("o_orderstatus") == "F"), "o_custkey", grp, k=64
    )
    b = SKC.kmv_state(
        orders.filter(F.col("o_orderstatus") == "O"), "o_custkey", grp, k=64
    )
    setops = SKC.kmv_setop_estimate(a, b, grp, k=64)
    est_a = SKC.kmv_estimate(a, grp, k=64, out_col="est_f").select(
        "o_orderpriority", "est_f"
    )
    est_b = SKC.kmv_estimate(b, grp, k=64, out_col="est_o").select(
        "o_orderpriority", "est_o"
    )
    fo = orders.filter(F.col("o_orderstatus").isin("F", "O"))
    exact_u = fo.groupBy(*grp).agg(
        F.countDistinct("o_custkey").alias("exact_union")
    )
    exact_i = (
        fo.groupBy(*grp, "o_custkey")
        .agg(F.countDistinct("o_orderstatus").alias("__ns"))
        .filter(F.col("__ns") == 2)
        .groupBy(*grp)
        .agg(F.count(F.lit(1)).alias("__xi"))
    )
    return (
        setops.join(est_a, grp)
        .join(est_b, grp)
        .join(exact_u, grp)
        .join(exact_i, grp, "left")
        .select(
            "o_orderpriority", "est_f", "est_o", "est_union",
            "est_intersect", "exact_union",
            F.coalesce(F.col("__xi"), F.lit(0)).alias("exact_intersect"),
        )
    )


@_register(
    "bloom_semi_prune",
    """
    WITH build AS (
      SELECT s_suppkey FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ), hh AS (SELECT UNNEST([0, 1, 2]) AS i),
    bits AS (
      SELECT CAST(pos // 32 AS INT) AS chunk,
             bit_or(CAST(power(2, CAST(pos % 32 AS INT)) AS BIGINT)) AS bits
      FROM (
        SELECT CAST('0x' || substr(md5(CAST(i AS VARCHAR) || ':'
                                    || CAST(s_suppkey AS VARCHAR)), 1, 8)
                    AS BIGINT) % 64 AS pos
        FROM build, hh
      ) GROUP BY 1
    ),
    probes AS (SELECT DISTINCT l_suppkey FROM lineitem),
    pp AS (
      SELECT l_suppkey, CAST(pos // 32 AS INT) AS chunk,
             CAST(power(2, CAST(pos % 32 AS INT)) AS BIGINT) AS mask
      FROM (
        SELECT l_suppkey,
               CAST('0x' || substr(md5(CAST(i AS VARCHAR) || ':'
                                    || CAST(l_suppkey AS VARCHAR)), 1, 8)
                    AS BIGINT) % 64 AS pos
        FROM probes, hh
      )
    ),
    mc AS (
      SELECT l_suppkey,
             (COUNT(*) FILTER (WHERE b.bits IS NOT NULL
                                 AND (b.bits & p.mask) = p.mask)) = 3
               AS might_contain
      FROM pp p LEFT JOIN bits b USING (chunk)
      GROUP BY 1
    )
    SELECT mc.might_contain, bd.s_suppkey IS NOT NULL AS is_member,
           COUNT(*) AS n_keys
    FROM mc LEFT JOIN build bd ON mc.l_suppkey = bd.s_suppkey
    GROUP BY 1, 2
    """,
)
def _bloom_semi_prune(spark: SparkSession, sf: str) -> DataFrame:
    """Bloom-filter join pruning (operators/sketches.bloom_build /
    bloom_probe): the bitmap of one nation-region's supplier keys is
    built in ONE bit_or aggregation (KB state), broadcast, and probed
    by every distinct lineitem supplier — the explicit form of Spark's
    runtime row-level filtering, which at 100 TB drops non-candidate
    fact rows at the scan, before the join's exchange. Output is the
    (might_contain × is_member) confusion matrix; a deliberately tiny
    m=64/k=3 filter forces REAL false positives into the hashed rows,
    and the absent (false, true) cell IS the no-false-negatives
    guarantee — a hash drift in either engine repaints the matrix.
    Production sizing (m=4096+) drives fp below 1e-8; same plan."""
    sup = read_table(spark, sf, "supplier")
    nat = read_table(spark, sf, "nation")
    reg = read_table(spark, sf, "region")
    build = (
        sup.join(nat, sup["s_nationkey"] == nat["n_nationkey"])
        .join(reg, nat["n_regionkey"] == reg["r_regionkey"])
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey")
    )
    probes = (
        read_table(spark, sf, "lineitem").select("l_suppkey").distinct()
    )
    flagged = SKC.bloom_probe(
        SKC.bloom_build(build, "s_suppkey", m_bits=64, k=3),
        probes,
        "l_suppkey",
        m_bits=64,
        k=3,
    )
    return (
        flagged.join(
            build.withColumnRenamed("s_suppkey", "l_suppkey").withColumn(
                "__m", F.lit(True)
            ),
            "l_suppkey",
            "left",
        )
        .groupBy(
            "might_contain",
            F.col("__m").isNotNull().alias("is_member"),
        )
        .agg(F.count(F.lit(1)).alias("n_keys"))
    )


@_register(
    "sketch_join_cardinality",
    """
    WITH ca AS (
      SELECT l_partkey AS k, COUNT(*) AS cnt_a,
             CAST('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8)
                  AS BIGINT) AS hv
      FROM lineitem GROUP BY 1
    ), sa AS (SELECT * FROM ca ORDER BY hv, k LIMIT 256),
    cb AS (
      SELECT p_partkey AS k, COUNT(*) AS cnt_b,
             CAST('0x' || substr(md5(CAST(p_partkey AS VARCHAR)), 1, 8)
                  AS BIGINT) AS hv
      FROM part WHERE p_size >= 25 GROUP BY 1
    ), sb AS (SELECT * FROM cb ORDER BY hv, k LIMIT 256),
    ta AS (SELECT CASE WHEN COUNT(*) >= 256 THEN MAX(hv)
                       ELSE 4294967296 END AS t FROM sa),
    tb AS (SELECT CASE WHEN COUNT(*) >= 256 THEN MAX(hv)
                       ELSE 4294967296 END AS t FROM sb),
    tt AS (SELECT least(ta.t, tb.t) AS tau FROM ta, tb),
    j AS (
      SELECT tt.tau, sa.cnt_a, sb.cnt_b
      FROM sa JOIN sb ON sa.k = sb.k AND sa.hv = sb.hv, tt
      WHERE sa.hv < tt.tau
    ),
    agg AS (
      -- global agg + tau reattached: one row even when the sampled
      -- region is empty (mirrors join_cardinality_estimate's
      -- always-one-row contract)
      SELECT tt.tau, a.n_sampled_pairs, a.sum_pairs
      FROM tt, (SELECT COUNT(*) AS n_sampled_pairs,
                       CAST(COALESCE(SUM(cnt_a * cnt_b), 0) AS BIGINT)
                         AS sum_pairs
                FROM j) a
    ),
    tj AS (
      SELECT COUNT(*) AS true_join
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_size >= 25
    )
    SELECT agg.tau, CAST(agg.tau AS DOUBLE) / 4294967296.0 AS p,
           agg.n_sampled_pairs, agg.sum_pairs,
           CAST(agg.sum_pairs AS DOUBLE)
             / (CAST(agg.tau AS DOUBLE) / 4294967296.0) AS est_join,
           tj.true_join
    FROM agg, tj
    """,
)
def _sketch_join_cardinality(spark: SparkSession, sf: str) -> DataFrame:
    """Join-size estimation WITHOUT running the join
    (operators/sketches.freq_sample / join_cardinality_estimate) —
    correlated bottom-k sampling (Vengerov et al., VLDB'15): both
    sides keep the 256 distinct keys with the smallest shared-hash
    values plus their exact row counts; Σ cntA·cntB over the region
    below τ = min(kth hashes), scaled by 1/p, estimates
    |lineitem ⋈ part(p_size ≥ 25)| — the planner statistic that
    decides broadcast vs shuffle vs pre-aggregation BEFORE paying for
    a 100-TB join. States are KB-scale (one map-combinable count agg
    + a distributed TakeOrdered each); everything after is metadata
    math. Exact-integer state end-to-end, one IEEE division ⇒ the
    estimate hash-matches DuckDB; the true join count rides along so
    the estimate is auditable (and the estimator goes EXACT when both
    key sets fit in k)."""
    li = read_table(spark, sf, "lineitem")
    pt = read_table(spark, sf, "part").filter(F.col("p_size") >= 25)
    sa = SKC.freq_sample(li.select("l_partkey"), "l_partkey", k=256)
    sb = SKC.freq_sample(pt.select("p_partkey"), "p_partkey", k=256)
    est = SKC.join_cardinality_estimate(
        sa, sb, "l_partkey", "p_partkey", k=256
    )
    true_j = (
        li.join(pt, li["l_partkey"] == pt["p_partkey"])
        .agg(F.count(F.lit(1)).alias("true_join"))
    )
    return est.crossJoin(F.broadcast(true_j))


@_register(
    "sketch_hll_sliding",
    f"""
    WITH b AS (
      SELECT CAST(ts AS DATE) AS day, user_id,
             CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
                  AS BIGINT) AS hv
      FROM events WHERE ts IS NOT NULL
    ),
    daily AS (
      SELECT day, hv % 64 AS bucket,
             MAX(CASE WHEN instr(lpad(bin(hv // 64), 26, '0'), '1') = 0
                      THEN 27
                      ELSE instr(lpad(bin(hv // 64), 26, '0'), '1') END) AS r
      FROM b GROUP BY 1, 2
    ),
    offs AS (SELECT UNNEST([0, 1, 2, 3, 4, 5, 6]) AS off),
    slid AS (
      SELECT day + off AS day, bucket, MAX(r) AS r
      FROM daily, offs GROUP BY 1, 2
    ),
    est AS (
      SELECT day,
             CAST(SUM(CAST(1 AS BIGINT) << (27 - r))
                  + (64 - COUNT(*)) * 134217728 AS BIGINT) AS register_sum,
             CAST(64 - COUNT(*) AS BIGINT) AS zero_registers
      FROM slid GROUP BY 1
    ),
    exact AS (
      SELECT day + off AS day, COUNT(DISTINCT user_id) AS exact_users
      FROM b, offs GROUP BY 1
    ),
    obs AS (SELECT DISTINCT day FROM b)
    SELECT e.day, x.exact_users, e.register_sum, e.zero_registers,
           {_HLL_CONST!r} / e.register_sum AS hll_raw_est
    FROM est e JOIN exact x USING (day) JOIN obs USING (day)
    """,
)
def _sketch_hll_sliding(spark: SparkSession, sf: str) -> DataFrame:
    """Trailing-7-day distinct users, every day, from KB-scale daily
    register state (operators/sketches.hll_det_sliding): each daily
    register row is exploded to the ≤7 windows it influences (bounded
    map-side explode) and per-bucket MAX-merged — the SLIDING form of
    the rollup lattice merge, which a window range-frame cannot
    produce (frames only fire on existing rows; absent (day, bucket)
    combinations must still merge away). The raw events are scanned
    once to build daily registers; every trailing window after that
    is register arithmetic. Exact trailing distincts ride along via
    the same explode for auditability; register state AND estimates
    hash-match DuckDB bit-for-bit. Restricted to observed days so the
    overhang past the last event day is not reported."""
    ev = read_table(spark, sf, "events").filter(F.col("ts").isNotNull())
    base = ev.select(F.to_date("ts").alias("day"), "user_id")
    daily = SKC.hll_det_registers(base, "user_id", ["day"])
    slid = SKC.hll_det_sliding(daily, [], "day", window_days=7)
    est = SKC.hll_det_estimate(slid, ["day"])
    # exactness rider: the x7 explode feeds countDistinct directly —
    # a pre-explode distinct() was tried (VERDICT r10 #2 plan pass)
    # and REJECTED: countDistinct's map-side partial aggregate already
    # dedups (day, user) within partitions post-explode, so the extra
    # exchange bought nothing (5-rep 0.596s -> 0.569s, inside noise)
    # while adding a full shuffle of the distinct pairs at scale
    exact = (
        base.withColumn("__off", F.explode(F.sequence(F.lit(0), F.lit(6))))
        .select(F.date_add("day", F.col("__off")).alias("day"), "user_id")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("exact_users"))
    )
    obs = base.select("day").distinct()
    return (
        est.join(exact, "day")
        .join(obs, "day", "left_semi")
        .select(
            "day", "exact_users", "register_sum", "zero_registers",
            "hll_raw_est",
        )
    )


@_register(
    "sketch_hll_index_daily",
    f"""
    WITH b AS (
      SELECT CAST(ts AS DATE) AS day, user_id,
             CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
                  AS BIGINT) AS hv
      FROM events WHERE ts IS NOT NULL
    ),
    bounds AS (SELECT MAX(day) AS d1 FROM b),
    win AS (
      SELECT b.* FROM b, bounds WHERE b.day >= d1 - 6 AND b.day <= d1
    ),
    regs AS (
      SELECT hv % 64 AS bucket,
             MAX(CASE WHEN instr(lpad(bin(hv // 64), 26, '0'), '1') = 0
                      THEN 27
                      ELSE instr(lpad(bin(hv // 64), 26, '0'), '1') END) AS r
      FROM win GROUP BY 1
    ),
    est AS (
      SELECT CAST(SUM(CAST(1 AS BIGINT) << (27 - r))
                  + (64 - COUNT(*)) * 134217728 AS BIGINT) AS register_sum,
             CAST(64 - COUNT(*) AS BIGINT) AS zero_registers
      FROM regs
    ),
    ex AS (SELECT COUNT(DISTINCT user_id) AS exact_users FROM win)
    SELECT est.register_sum, est.zero_registers,
           {_HLL_CONST!r} / est.register_sum AS hll_raw_est,
           ex.exact_users
    FROM est, ex
    """,
)
def _sketch_hll_index_daily(spark: SparkSession, sf: str) -> DataFrame:
    """Persisted continuous-aggregate lifecycle for sketches
    (operators/sketches.build_hll_index / hll_index_window_estimate):
    the corpus's older days are indexed ONCE (daily register tables,
    partitionBy(day)); each of the last 7 observed days is then
    appended as its own daily shard — the reference's daily cadence
    (dags/vcapital_staging/tasks/components/extract.py:41-43) applied
    to distinct-count state. The trailing-7-day answer is a
    partition-PRUNED read of exactly 7 day directories + one
    per-bucket MAX. The ORACLE recomputes the window from raw events
    with no index at all, so a hash match IS the incremental==full
    proof: 7 sequential appends must leave register state identical
    to a from-scratch build. Unlike the band-partitioned LSH index,
    the day partition key is the append unit, so this index never
    accrues small files and needs no compaction hook."""
    import os

    ev = read_table(spark, sf, "events").filter(F.col("ts").isNotNull())
    base = ev.select(F.to_date("ts").alias("day"), "user_id")
    days = sorted(
        r["day"] for r in base.select("day").distinct().collect()
    )  # bounded metadata collect: one row per observed day
    if not days:
        # no events at all: one all-NULL estimate row + exact 0, the
        # same shape the oracle's global aggregates produce
        est0 = SKC.hll_index_window_estimate(
            spark, "/tmp/spark_graft_hll_idx_void", "day",
            "1970-01-01", "1970-01-01",
        )
        exact0 = base.agg(F.countDistinct("user_id").alias("exact_users"))
        return est0.crossJoin(F.broadcast(exact0)).select(
            "register_sum", "zero_registers", "hll_raw_est", "exact_users"
        )
    # CALENDAR window [d1-6, d1] (not "last 7 observed days": with
    # sparse days the two differ and the oracle's raw recompute is
    # calendar-defined)
    import datetime as _dt

    d1 = days[-1]
    w0 = d1 - _dt.timedelta(days=6)
    shard_days = [d for d in days if d >= w0]
    corpus_days = [d for d in days if d < w0]
    path = "/tmp/spark_graft_hll_idx_" + os.path.basename(
        os.path.normpath(sf)
    )
    SKC.build_hll_index(
        base.filter(F.col("day").isin([str(d) for d in corpus_days])),
        path, "user_id", "day", mode="overwrite",
    )
    for d in shard_days:
        SKC.build_hll_index(
            base.filter(F.col("day") == F.lit(str(d))),
            path, "user_id", "day", mode="append",
        )
    est = SKC.hll_index_window_estimate(
        spark, path, "day", str(w0), str(d1)
    )
    exact = base.filter(
        (F.col("day") >= F.lit(str(w0))) & (F.col("day") <= F.lit(str(d1)))
    ).agg(F.countDistinct("user_id").alias("exact_users"))
    return est.crossJoin(F.broadcast(exact)).select(
        "register_sum", "zero_registers", "hll_raw_est", "exact_users"
    )


@_register(
    "sketch_quantile_sample",
    """
    WITH ids AS (
      SELECT CAST(l_orderkey AS VARCHAR) || '-'
               || CAST(l_linenumber AS VARCHAR) AS id,
             l_extendedprice
      FROM lineitem
    ), smp AS (
      SELECT l_extendedprice,
             CAST('0x' || substr(md5(id), 1, 8) AS BIGINT) AS hv, id
      FROM ids ORDER BY hv, id LIMIT 512
    ), est AS (
      SELECT CAST(0.5 AS DOUBLE) AS quantile,
             quantile_disc(l_extendedprice, 0.5) AS est_value FROM smp
      UNION ALL
      SELECT CAST(0.9 AS DOUBLE),
             quantile_disc(l_extendedprice, 0.9) FROM smp
      UNION ALL
      SELECT CAST(0.99 AS DOUBLE),
             quantile_disc(l_extendedprice, 0.99) FROM smp
    ), ex AS (
      SELECT CAST(0.5 AS DOUBLE) AS quantile,
             quantile_disc(l_extendedprice, 0.5) AS exact_value
      FROM lineitem
      UNION ALL
      SELECT CAST(0.9 AS DOUBLE),
             quantile_disc(l_extendedprice, 0.9) FROM lineitem
      UNION ALL
      SELECT CAST(0.99 AS DOUBLE),
             quantile_disc(l_extendedprice, 0.99) FROM lineitem
    )
    SELECT est.quantile, est.est_value, ex.exact_value
    FROM est JOIN ex USING (quantile)
    """,
)
def _sketch_quantile_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Quantile estimation from a deterministic bottom-k row sample
    (operators/sketches.row_sample_bottomk / quantile_from_sample) —
    the oracle-checkable DISC-quantile sketch that
    agg_percentile_disc_cont's docstring notes KLL cannot be (its
    state is engine-internal): the 512 rows whose unique ids md5-hash
    smallest form a reproducible, MERGEABLE uniform sample (bottom-k
    of union == bottom-k of parts' bottom-ks, pinned in tests; the
    sample ships as a TakeOrderedAndProject — per-partition heads, no
    global shuffle), and percentile_disc OVER the sample estimates
    the population quantile with √(q(1-q)/k) rank error. Exact
    population quantiles ride along so the error is auditable; every
    value here EXISTS in the data, so the hash check is epsilon-free.
    """
    li = read_table(spark, sf, "lineitem")
    ids = li.select(
        F.concat(
            F.col("l_orderkey").cast("string"),
            F.lit("-"),
            F.col("l_linenumber").cast("string"),
        ).alias("id"),
        "l_extendedprice",
    )
    smp = SKC.row_sample_bottomk(ids, "id", ["l_extendedprice"], k=512)
    est = SKC.quantile_from_sample(
        smp, "l_extendedprice", [0.5, 0.9, 0.99]
    )
    # exact population DISC quantiles via features.exact_quantiles —
    # the value-histogram + TWO-PHASE BUCKETED cumulative count (no
    # SinglePartition window anywhere: per-bucket local cumsums +
    # KB-sized prefix offsets; NOT percentile_disc, whose
    # implementation buffers every row in one reducer and was
    # measured 6.4 s / exponent 1.06 at sf0.1; and no longer the
    # r6 global Window.orderBy over distinct values, whose
    # single-reducer histogram pass this rewrite retires). Smallest
    # value with cum ≥ q·n IS percentile_disc semantics.
    one = FT.exact_quantiles(
        li,
        "l_extendedprice",
        [0.5, 0.9, 0.99],
        mode="disc",
        out_cols=["__v50", "__v90", "__v99"],
    )
    exact = one.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(0.5).alias("quantile"),
                    F.col("__v50").alias("exact_value"),
                ),
                F.struct(
                    F.lit(0.9).alias("quantile"),
                    F.col("__v90").alias("exact_value"),
                ),
                F.struct(
                    F.lit(0.99).alias("quantile"),
                    F.col("__v99").alias("exact_value"),
                ),
            )
        ).alias("s")
    ).select("s.quantile", "s.exact_value")
    return est.join(F.broadcast(exact), "quantile").select(
        "quantile", "est_value", "exact_value"
    )
