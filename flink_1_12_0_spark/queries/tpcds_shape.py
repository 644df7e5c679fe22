"""TPC-DS-shaped query pack (batch SQL breadth tier).

The reference validates its batch engine against all 103 TPC-DS queries at
sf1 (flink-end-to-end-tests/flink-tpcds-test/src/main/java/.../
TpcdsTestProgram.java:59-71, answer-set comparison via
TpcdsResultComparator.java:32).  Our fixture set has no TPC-DS star schema,
so this pack reproduces the distinctive TPC-DS *operator shapes* on the
available tables — each query below names the TPC-DS query whose plan shape
it mirrors.  Most queries are single ANSI SQL strings executed identically
by Spark and the DuckDB oracle (shared-SQL fast path); the round-9 heavy
shapes (q14a / q64 / q78) localCheckpoint their fact-join grain Spark-side
so Catalyst's CTE inlining cannot multiply the fact scan — their oracles
share the same CTE + tail text verbatim.

Scale notes (100 TB): every query is fully declarative — Catalyst handles
pushdown/pruning/broadcast; the window-over-aggregate and rollup queries
reuse the aggregation shuffle for the window stage (same partitioning keys),
and the self-join YoY query joins two instances of one aggregated CTE, which
AQE materializes once per side at a few rows per nation-year (tiny after the
agg — broadcast-able).  No Python on any data path.
"""

from flink_1_12_0_spark.queries import register_sql

# q76-shape: multi-channel UNION ALL fanned into one aggregation.
register_sql(
    "tpcds_channel_union",
    """
    WITH channels AS (
        SELECT 'urgent' AS channel,
               o_orderdate AS d,
               o_totalprice AS amt
        FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        UNION ALL
        SELECT 'normal' AS channel, o_orderdate AS d, o_totalprice AS amt
        FROM orders
        WHERE o_orderpriority = '3-MEDIUM'
        UNION ALL
        SELECT 'lax' AS channel, o_orderdate AS d, o_totalprice AS amt
        FROM orders
        WHERE o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')
    )
    SELECT channel,
           CAST(EXTRACT(YEAR FROM d) AS INT)    AS yr,
           CAST(EXTRACT(QUARTER FROM d) AS INT) AS qtr,
           count(*)                             AS order_cnt,
           CAST(sum(CAST(round(amt * 100) AS BIGINT)) AS BIGINT)
                                                AS total_amt_e2
    FROM channels
    GROUP BY channel, CAST(EXTRACT(YEAR FROM d) AS INT),
             CAST(EXTRACT(QUARTER FROM d) AS INT)
    ORDER BY channel, yr, qtr
    """,
)

# (revenue emitted FIXED-POINT in 1e-4 units — exact integer grain of
# price(2dp) * (1 - discount(2dp)) — so the aggregate is accumulation-
# order-independent; float sums of 2dp money land on 2dp half-boundaries
# where Spark's and DuckDB's rounding can diverge run-to-run)
# q75-shape: year-over-year revenue with a self-join of an aggregated CTE.
register_sql(
    "tpcds_yoy_growth",
    """
    WITH yearly AS (
        SELECT n_name,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                             AS BIGINT)) AS BIGINT)        AS rev_e4
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY n_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS INT)
    )
    SELECT cur.n_name                              AS n_name,
           cur.yr                                  AS yr,
           cur.rev_e4                              AS rev_e4,
           prev.rev_e4                             AS prev_rev_e4,
           CAST(cur.rev_e4 AS DOUBLE) / prev.rev_e4 AS growth
    FROM yearly cur
    JOIN yearly prev ON cur.n_name = prev.n_name AND cur.yr = prev.yr + 1
    ORDER BY n_name, yr
    """,
)

# q1-shape: per-group average threshold via correlated scalar subquery
# over an aggregated CTE (customers spending >1.2x their segment average).
register_sql(
    "tpcds_segment_outliers",
    """
    WITH cust_totals AS (
        -- exact integer cents: both the output and the 1.2x-average
        -- membership threshold are order-free
        SELECT c_custkey, c_mktsegment,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS spend_e2
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_mktsegment
    )
    SELECT c_custkey, c_mktsegment, spend_e2
    FROM cust_totals ct
    WHERE spend_e2 > (SELECT 1.2 * avg(spend_e2)
                      FROM cust_totals ct2
                      WHERE ct2.c_mktsegment = ct.c_mktsegment)
    ORDER BY c_mktsegment, spend_e2 DESC, c_custkey
    LIMIT 100
    """,
)

# q98-shape: revenue share of a class within its category — window function
# over an aggregate, reusing the groupBy partitioning.
register_sql(
    "tpcds_item_class_share",
    """
    SELECT p_type,
           p_brand,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                         AS BIGINT)) AS BIGINT)    AS revenue_e4,
           -- 100e0 (DOUBLE literal) keeps the whole share expression in
           -- IEEE double on BOTH engines: Spark would otherwise type
           -- BIGINT * 100.0 (decimal literal) as DecimalType while DuckDB
           -- divides to DOUBLE, mismatching every row.
           sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                    AS BIGINT)) * 100e0
             / sum(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                            AS BIGINT)))
                 OVER (PARTITION BY p_type)        AS revenue_share
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    GROUP BY p_type, p_brand
    ORDER BY p_type, revenue_share DESC, p_brand
    """,
)

# q38/q87-shape: set algebra over customer cohorts across periods
# (active in 1996 AND 1997 but not in 1995).
register_sql(
    "tpcds_customer_set_ops",
    """
    SELECT count(*) AS loyal_recent_cnt
    FROM (
        (SELECT o_custkey FROM orders
         WHERE CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) = 1996
         INTERSECT
         SELECT o_custkey FROM orders
         WHERE CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) = 1997)
        EXCEPT
        SELECT o_custkey FROM orders
        WHERE CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) = 1995
    ) t
    """,
)

# q47-shape: monthly revenue vs centered moving average, keep deviations.
register_sql(
    "tpcds_moving_avg_deviation",
    """
    WITH monthly AS (
        SELECT n_name,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) * 100
                 + CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS ym,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS rev_c
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY n_name,
                 CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) * 100
                   + CAST(EXTRACT(MONTH FROM o_orderdate) AS INT)
    ),
    with_ma AS (
        -- avg over exact integer cents: the <=7-term sum stays below
        -- 2^53 even as a double, so the moving average is bit-identical
        -- across engines and accumulation orders
        SELECT n_name, ym, rev_c,
               avg(rev_c)
                   OVER (PARTITION BY n_name ORDER BY ym
                         ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS ma_c
        FROM monthly
    )
    SELECT n_name, ym, rev_c, ma_c, rev_c / ma_c AS ratio
    FROM with_ma
    WHERE rev_c > 1.15 * ma_c
    ORDER BY n_name, ym
    """,
)

# q10-shape: customers with orders in one channel and provably absent from
# another — EXISTS plus NOT EXISTS in a single predicate.
register_sql(
    "tpcds_exists_not_exists",
    """
    SELECT c_mktsegment,
           count(*)       AS cust_cnt,
           avg(c_acctbal) AS avg_bal
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
      AND NOT EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey
                        AND o2.o_orderstatus = 'F'
                        AND o2.o_totalprice > 300000)
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)

# q9-shape: uncorrelated scalar subqueries as SELECT-list bucket stats.
register_sql(
    "tpcds_scalar_subquery_buckets",
    """
    SELECT r_name,
           (SELECT avg(l_extendedprice) FROM lineitem
            WHERE l_quantity BETWEEN 1 AND 10)  AS avg_low_qty,
           (SELECT avg(l_extendedprice) FROM lineitem
            WHERE l_quantity BETWEEN 11 AND 30) AS avg_mid_qty,
           (SELECT avg(l_extendedprice) FROM lineitem
            WHERE l_quantity > 30)              AS avg_high_qty,
           (SELECT count(*) FROM lineitem
            WHERE l_discount > 0.05)            AS discounted_cnt
    FROM region
    WHERE r_regionkey = 0
    """,
)

# q90-shape: ratio of activity between two time-of-day windows.
register_sql(
    "tpcds_hour_ratio",
    """
    SELECT event_type,
           count(*) FILTER (WHERE CAST(EXTRACT(HOUR FROM ts) AS INT)
                            BETWEEN 6 AND 11)  AS am_cnt,
           count(*) FILTER (WHERE CAST(EXTRACT(HOUR FROM ts) AS INT)
                            BETWEEN 18 AND 23) AS pm_cnt,
           CAST(count(*) FILTER (WHERE CAST(EXTRACT(HOUR FROM ts) AS INT)
                                 BETWEEN 6 AND 11) AS DOUBLE)
             / nullif(count(*) FILTER (WHERE CAST(EXTRACT(HOUR FROM ts) AS INT)
                                       BETWEEN 18 AND 23), 0) AS am_pm_ratio
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)

# q36-shape: ROLLUP hierarchy with rank-within-parent over grouping level.
register_sql(
    "tpcds_rollup_rank_within_parent",
    """
    SELECT coalesce(r_name, 'ALL')                    AS region,
           coalesce(n_name, 'ALL')                    AS nation,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                         AS BIGINT)) AS BIGINT)       AS revenue_e4,
           grouping(r_name) + grouping(n_name)        AS lochierarchy,
           rank() OVER (
               PARTITION BY grouping(r_name) + grouping(n_name),
                            CASE WHEN grouping(n_name) = 1
                                 THEN coalesce(r_name, 'ALL') END
               ORDER BY sum(CAST(round(l_extendedprice * (1 - l_discount)
                                       * 10000) AS BIGINT)) DESC,
                        coalesce(n_name, 'ALL'))      AS rank_within_parent
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    ORDER BY lochierarchy DESC, region, rank_within_parent, nation
    """,
)

# q51-shape: two per-key running cumulative sums (two "channels") FULL
# OUTER joined on (key, date), then running maxes compared — the classic
# dual-cumsum window chase.  Every window stage partitions on the same
# key, so one shuffle serves all four window computations.
register_sql(
    "tpcds_cumulative_compare",
    """
    WITH purchase AS (
        -- integer cents end-to-end: the cumulative sums and the
        -- run_p > run_c membership filter are accumulation-order-free
        SELECT user_id, CAST(ts AS DATE) AS d,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS amt
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
    click AS (
        SELECT user_id, CAST(ts AS DATE) AS d,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS amt
        FROM events WHERE event_type = 'click' GROUP BY 1, 2),
    pc AS (
        SELECT user_id, d,
               sum(amt) OVER (PARTITION BY user_id ORDER BY d
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_purchase
        FROM purchase),
    cc AS (
        SELECT user_id, d,
               sum(amt) OVER (PARTITION BY user_id ORDER BY d
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_click
        FROM click),
    j AS (
        SELECT coalesce(p.user_id, c.user_id) AS user_id,
               coalesce(p.d, c.d) AS d,
               p.cum_purchase, c.cum_click
        FROM pc p FULL OUTER JOIN cc c
          ON p.user_id = c.user_id AND p.d = c.d),
    f AS (
        SELECT user_id, d,
               max(cum_purchase) OVER (PARTITION BY user_id ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_p,
               max(cum_click) OVER (PARTITION BY user_id ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_c
        FROM j)
    SELECT user_id, CAST(d AS STRING) AS d,
           CAST(run_p AS BIGINT) AS run_purchase_e2,
           CAST(run_c AS BIGINT) AS run_click_e2
    FROM f
    WHERE run_p IS NOT NULL AND run_c IS NOT NULL AND run_p > run_c
      AND user_id < 40
    ORDER BY user_id, d
    """,
)

# q73/q34-shape: per-(customer, bucket) order counts filtered by a HAVING
# band, joined back to the dimension — the "frequent together" pattern.
register_sql(
    "tpcds_having_count_band",
    """
    WITH per AS (
        SELECT o_custkey,
               CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS mth,
               count(*) AS cnt
        FROM orders
        GROUP BY 1, 2
        HAVING count(*) BETWEEN 2 AND 5)
    SELECT c.c_name, c.c_mktsegment, p.mth, p.cnt
    FROM per p JOIN customer c ON c.c_custkey = p.o_custkey
    WHERE c.c_acctbal > 0
    ORDER BY c.c_name, p.mth
    """,
)

# Market-basket shape (cross-sell affinity, the q-shape behind TPC-DS's
# "frequently bought together" analyses): self-join lineitem on the order
# key, emit part pairs, count co-occurrences. Scale: an order has <= 7
# lines so pair generation is bounded (<= 21 pairs/order); the only wide
# exchange hashes on the (p1, p2) pair key — no quadratic blowup.
register_sql(
    "tpcds_market_basket",
    # Spark side: ONE lineitem scan — baskets via collect_list per order
    # (one shuffle of (orderkey, partkey)), then in-row pair expansion
    # with higher-order array functions (multiplicity-faithful: an order
    # holding partkey 5 twice and 7 once emits (5,7) twice, exactly like
    # the self-join), then partial+final count agg.  Halves the shuffled
    # bytes vs the two-sided self-join on l_orderkey; per-basket expansion
    # stays bounded (TPC-H <= 7 items/order).
    """
    WITH baskets AS (
        SELECT l_orderkey, collect_list(l_partkey) AS items
        FROM lineitem
        GROUP BY l_orderkey
    ),
    pairs AS (
        SELECT pr.p1 AS p1, pr.p2 AS p2
        FROM baskets
        LATERAL VIEW explode(
            flatten(transform(items, x ->
                filter(transform(items, y -> named_struct('p1', x, 'p2', y)),
                       s -> s.p1 < s.p2)))) t AS pr
    )
    SELECT p1, p2, count(*) AS together_cnt
    FROM pairs
    GROUP BY p1, p2
    HAVING count(*) >= 2
    ORDER BY together_cnt DESC, p1, p2
    LIMIT 100
    """,
    # oracle: the direct self-join formulation (DuckDB-only; quadratic
    # within each small basket, fine at oracle scale)
    oracle="""
    WITH pairs AS (
        SELECT a.l_partkey AS p1, b.l_partkey AS p2
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    SELECT p1, p2, count(*) AS together_cnt
    FROM pairs
    GROUP BY p1, p2
    HAVING count(*) >= 2
    ORDER BY together_cnt DESC, p1, p2
    LIMIT 100
    """,
)

# Cohort-retention shape (repeat-buyer analysis): per-customer quarterly
# activity, LAG over the per-customer quarter sequence, then the quarterly
# retention ratio. The window partitions by customer (high cardinality) —
# parallel at any scale; the final per-quarter rollup is a few rows.
register_sql(
    "tpcds_repeat_buyers",
    """
    WITH per_q AS (
        SELECT o_custkey,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) * 4
                   + CAST(EXTRACT(QUARTER FROM o_orderdate) AS INT) AS qidx
        FROM orders
        GROUP BY 1, 2),
    flagged AS (
        SELECT o_custkey, qidx,
               lag(qidx) OVER (PARTITION BY o_custkey ORDER BY qidx) AS prev_q
        FROM per_q)
    SELECT qidx,
           count(*) AS active_customers,
           CAST(sum(CASE WHEN prev_q = qidx - 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS retained,
           round(sum(CASE WHEN prev_q = qidx - 1 THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS retention_ratio
    FROM flagged
    GROUP BY qidx
    ORDER BY qidx
    """,
)

# q88-shape: eight filtered counts over one scan, cross-joined into a
# single row — the "one pass, many bands" pattern (each count is a
# conditional aggregate; Catalyst computes all eight in ONE partial+final
# aggregation over one lineitem scan, no self-joins).
register_sql(
    "tpcds_multi_band_counts",
    """
    SELECT
      CAST(sum(CASE WHEN qty_band = 0 THEN 1 ELSE 0 END) AS BIGINT) AS h1,
      CAST(sum(CASE WHEN qty_band = 1 THEN 1 ELSE 0 END) AS BIGINT) AS h2,
      CAST(sum(CASE WHEN qty_band = 2 THEN 1 ELSE 0 END) AS BIGINT) AS h3,
      CAST(sum(CASE WHEN qty_band = 3 THEN 1 ELSE 0 END) AS BIGINT) AS h4,
      CAST(sum(CASE WHEN disc_band = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
      CAST(sum(CASE WHEN disc_band = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d2,
      CAST(sum(CASE WHEN disc_band = 2 THEN 1 ELSE 0 END) AS BIGINT) AS d3,
      CAST(sum(CASE WHEN disc_band = 3 THEN 1 ELSE 0 END) AS BIGINT) AS d4
    FROM (
      SELECT CAST(floor(l_quantity / 13) AS INT) AS qty_band,
             CAST(floor(l_discount * 40) AS INT) AS disc_band
      FROM lineitem
      WHERE l_returnflag = 'N'
    )
    """,
)

# q62-shape: days-to-ship bucketed counts per priority — join orders to
# lineitem, bucket the latency, pivot the buckets as conditional sums.
# (datediff spelling differs between engines, so the oracle carries the
# DuckDB form explicitly.)
_LAT_BODY = """
    SELECT o_orderpriority,
           CAST(sum(CASE WHEN lat <= 30 THEN 1 ELSE 0 END) AS BIGINT)  AS d30,
           CAST(sum(CASE WHEN lat > 30 AND lat <= 60 THEN 1 ELSE 0 END) AS BIGINT) AS d60,
           CAST(sum(CASE WHEN lat > 60 AND lat <= 90 THEN 1 ELSE 0 END) AS BIGINT) AS d90,
           CAST(sum(CASE WHEN lat > 90 THEN 1 ELSE 0 END) AS BIGINT)   AS d90plus,
           count(*) AS total
    FROM (
      SELECT o.o_orderpriority, {lat} AS lat
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """

register_sql(
    "tpcds_ship_latency_buckets",
    _LAT_BODY.format(
        lat="datediff(CAST(l.l_shipdate AS DATE), CAST(o.o_orderdate AS DATE))"
    ),
    oracle=_LAT_BODY.format(
        lat="date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE))"
    ),
)

# q59-shape: week-over-week sales comparison — one weekly aggregate CTE
# self-joined on (priority, iso-week) across consecutive years, emitting
# this-year/next-year revenue side by side.  Both engines use ISO 8601
# week numbering for EXTRACT(WEEK ...).  The CTE aggregates orders down to
# priority x year x week (a few hundred rows at any scale) before the
# self-join — the join sides are broadcast-sized regardless of input size.
register_sql(
    "tpcds_week_over_week",
    """
    WITH weekly AS (
        SELECT o_orderpriority AS prio,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
               CAST(EXTRACT(WEEK FROM o_orderdate) AS INT) AS wk,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS rev_c,
               count(*) AS n_orders
        FROM orders
        GROUP BY 1, 2, 3)
    SELECT a.prio, a.yr, a.wk,
           a.rev_c AS rev_this_e2, b.rev_c AS rev_next_e2,
           a.n_orders AS orders_this, b.n_orders AS orders_next,
           round(CAST(b.rev_c AS DOUBLE) / CAST(a.rev_c AS DOUBLE), 6) AS wow_ratio
    FROM weekly a
    JOIN weekly b ON a.prio = b.prio AND a.wk = b.wk AND b.yr = a.yr + 1
    ORDER BY a.prio, a.yr, a.wk
    """,
)

# q74/q11-shape: per-customer year-over-year growth compared across two
# "channels" (urgent-vs-standard order priority standing in for the
# store/catalog split): customers whose fast-channel growth outpaces the
# slow channel.  The growth comparison cross-multiplies the exact decimal
# revenues instead of comparing division results, so the filter is
# engine-exact; ratios are emitted as rounded doubles.  All joins happen
# AFTER per-(customer, year, channel) aggregation — shuffle keys stay
# high-cardinality, no quadratic stage.
register_sql(
    "tpcds_customer_channel_growth",
    """
    WITH per AS (
        -- integer cents: the cross-multiplied growth filter below is an
        -- exact BIGINT comparison (max |rev1*rev2| ~ 1e16 < 2^63), so
        -- cohort membership is accumulation-order-free
        SELECT o_custkey,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
               CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 'fast' ELSE 'slow' END AS chan,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS rev
        FROM orders
        GROUP BY 1, 2, 3),
    paired AS (
        SELECT a.o_custkey, a.chan, a.yr, a.rev AS rev1, b.rev AS rev2
        FROM per a
        JOIN per b ON a.o_custkey = b.o_custkey AND a.chan = b.chan
                  AND b.yr = a.yr + 1)
    SELECT f.o_custkey, f.yr,
           round(CAST(f.rev2 AS DOUBLE) / CAST(f.rev1 AS DOUBLE), 6) AS fast_growth,
           round(CAST(s.rev2 AS DOUBLE) / CAST(s.rev1 AS DOUBLE), 6) AS slow_growth
    FROM paired f
    JOIN paired s ON f.o_custkey = s.o_custkey AND f.yr = s.yr
                 AND f.chan = 'fast' AND s.chan = 'slow'
    WHERE f.rev2 * s.rev1 > s.rev2 * f.rev1
    ORDER BY f.o_custkey, f.yr
    """,
)

# q93-shape: net revenue after returns — returned line items (the
# R-flagged rows standing in for the store_returns join) subtract from
# each customer's gross; one scan, conditional aggregation, no self-join.
register_sql(
    "tpcds_net_after_returns",
    """
    SELECT o.o_custkey,
           CAST(sum(CASE WHEN l.l_returnflag = 'R'
                         THEN 0
                         ELSE CAST(round(l.l_extendedprice
                                         * (1 - l.l_discount) * 10000)
                                   AS BIGINT) END) AS BIGINT)
               AS net_revenue_e4,
           CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
               AS returned_items,
           count(*) AS total_items
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_custkey
    HAVING sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) >= 5
    ORDER BY net_revenue_e4 DESC, o_custkey
    LIMIT 100
    """,
)

# q49-shape: dual-lens worst performers — parts in the top-25 by return
# RATE or by return VOLUME (union of two top-k lists over one shared
# aggregation).  Deliberately expressed as ORDER BY ... LIMIT top-k
# subqueries rather than a global rank() window: Catalyst runs each as
# TakeOrderedAndProject (per-partition top-k + a k-row merge), so there
# is NO single-task whole-table sort at any scale — the q49 answer set
# is identical because the tiebreak is total.
register_sql(
    "tpcds_dual_rank_returns",
    """
    WITH per_part AS (
        SELECT l_partkey,
               CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_returned,
               count(*) AS n_sold,
               round(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                     / CAST(count(*) AS DOUBLE), 6) AS return_rate
        FROM lineitem
        GROUP BY l_partkey
        HAVING count(*) >= 8),
    top_rate AS (SELECT l_partkey FROM per_part
                 ORDER BY return_rate DESC, l_partkey LIMIT 25),
    top_vol AS (SELECT l_partkey FROM per_part
                ORDER BY n_returned DESC, l_partkey LIMIT 25)
    SELECT p.l_partkey, p.n_returned, p.n_sold, p.return_rate,
           CASE WHEN r.l_partkey IS NOT NULL THEN TRUE ELSE FALSE END AS in_top_rate,
           CASE WHEN v.l_partkey IS NOT NULL THEN TRUE ELSE FALSE END AS in_top_vol
    FROM per_part p
    LEFT JOIN top_rate r ON p.l_partkey = r.l_partkey
    LEFT JOIN top_vol v ON p.l_partkey = v.l_partkey
    WHERE r.l_partkey IS NOT NULL OR v.l_partkey IS NOT NULL
    ORDER BY p.l_partkey
    """,
)

# q23-shape: two independently-derived cohorts intersected — frequently
# bought parts (>= 8 distinct orders) and top-spending customers — then
# the revenue those customers generated on those parts.  Both cohort
# CTEs aggregate before joining (small relations, broadcast-able), the
# final probe is one pass over lineitem.
register_sql(
    "tpcds_frequent_items_spenders",
    """
    WITH freq_parts AS (
        SELECT l_partkey
        FROM lineitem
        GROUP BY l_partkey
        HAVING count(DISTINCT l_orderkey) >= 8),
    spenders AS (
        -- cohort threshold on exact integer cents: membership is
        -- accumulation-order-free (a float sum near 800000.00 could
        -- land either side of the cut depending on partial-agg order)
        SELECT o_custkey
        FROM orders
        GROUP BY o_custkey
        HAVING sum(CAST(round(o_totalprice * 100) AS BIGINT)) > 80000000)
    SELECT count(*) AS n_lineitems,
           CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_customers,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
                         AS BIGINT)) AS BIGINT) AS focus_revenue_e4
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN freq_parts fp ON l.l_partkey = fp.l_partkey
    JOIN spenders s ON o.o_custkey = s.o_custkey
    """,
)

# q31-shape: quarter-over-quarter share growth compared between two
# dimensions — each region's share of total revenue per quarter, kept
# when the share GREW two quarters in a row (lag x2 over a small
# aggregated relation; the windows partition by region over a handful of
# quarter rows each — bounded, not data-scaled).
register_sql(
    "tpcds_share_growth_streak",
    """
    WITH per_q AS (
        -- integer cents: the share ratios (and the share > s1 > s2
        -- streak filter) divide exact BIGINTs, so both the outputs and
        -- row membership are accumulation-order-free
        SELECT r_name,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) * 4
                 + CAST(EXTRACT(QUARTER FROM o_orderdate) AS INT) AS qidx,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS rev
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY 1, 2),
    with_share AS (
        SELECT r_name, qidx, rev,
               round(CAST(rev AS DOUBLE)
                     / CAST(sum(rev) OVER (PARTITION BY qidx) AS DOUBLE), 6)
                   AS share
        FROM per_q),
    lagged AS (
        SELECT r_name, qidx, share,
               lag(share, 1) OVER (PARTITION BY r_name ORDER BY qidx) AS s1,
               lag(share, 2) OVER (PARTITION BY r_name ORDER BY qidx) AS s2
        FROM with_share)
    SELECT r_name, qidx, share, s1, s2
    FROM lagged
    WHERE share > s1 AND s1 > s2
    ORDER BY r_name, qidx
    """,
)

# q66-shape: 12-way monthly pivot — one scan, every month's revenue as a
# conditional sum column per (year, priority); the classic wide-pivot
# shape Catalyst folds into a single partial/final aggregation.
register_sql(
    "tpcds_monthly_pivot",
    """
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
           o_orderpriority,
           CAST(sum(CASE WHEN EXTRACT(MONTH FROM o_orderdate) = 1  THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS m1_e2,
           CAST(sum(CASE WHEN EXTRACT(MONTH FROM o_orderdate) = 2  THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS m2_e2,
           CAST(sum(CASE WHEN EXTRACT(MONTH FROM o_orderdate) = 3  THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS m3_e2,
           CAST(sum(CASE WHEN EXTRACT(MONTH FROM o_orderdate) = 4  THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS m4_e2,
           CAST(sum(CASE WHEN EXTRACT(MONTH FROM o_orderdate) = 5  THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS m5_e2,
           CAST(sum(CASE WHEN EXTRACT(MONTH FROM o_orderdate) = 6  THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS m6_e2,
           CAST(sum(CASE WHEN EXTRACT(MONTH FROM o_orderdate) = 7  THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS m7_e2,
           CAST(sum(CASE WHEN EXTRACT(MONTH FROM o_orderdate) = 8  THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS m8_e2,
           CAST(sum(CASE WHEN EXTRACT(MONTH FROM o_orderdate) = 9  THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS m9_e2,
           CAST(sum(CASE WHEN EXTRACT(MONTH FROM o_orderdate) = 10 THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS m10_e2,
           CAST(sum(CASE WHEN EXTRACT(MONTH FROM o_orderdate) = 11 THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS m11_e2,
           CAST(sum(CASE WHEN EXTRACT(MONTH FROM o_orderdate) = 12 THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS m12_e2
    FROM orders
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)

# q5-shape: per-channel profit rollup with a grand total — UNION ALL of
# channel-tagged relations into ROLLUP(channel), returns subtracted as
# negative profit (the R-flag again standing in for the returns tables).
register_sql(
    "tpcds_channel_profit_rollup",
    """
    WITH tagged AS (
        -- signed integer 1e-4 units: the rollup's grand total is an
        -- exact BIGINT sum, free of accumulation order
        SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 'expedited' ELSE 'standard' END AS channel,
               CASE WHEN l_returnflag = 'R'
                    THEN -CAST(round(l_extendedprice * (1 - l_discount)
                                     * 10000) AS BIGINT)
                    ELSE CAST(round(l_extendedprice * (1 - l_discount)
                                    * 10000) AS BIGINT) END AS profit_e4
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
    SELECT coalesce(channel, 'TOTAL') AS channel,
           count(*) AS n_items,
           CAST(sum(profit_e4) AS BIGINT) AS net_profit_e4
    FROM tagged
    GROUP BY ROLLUP(channel)
    ORDER BY channel
    """,
)

# q54-shape: revisit cohort — customers placing an urgent order and then
# ANY order within the next 90 days; the self-join keys on the customer
# (high cardinality) with per-customer order lists bounded, then a
# per-segment rollup.  (datediff spelling differs between engines, so
# the oracle carries the DuckDB form explicitly, like the q62 shape.)
_REVISIT_BODY = """
    WITH pairs AS (
        SELECT DISTINCT a.o_custkey
        FROM orders a JOIN orders b ON a.o_custkey = b.o_custkey
        WHERE a.o_orderpriority = '1-URGENT'
          AND {diff} BETWEEN 1 AND 90
    )
    SELECT c.c_mktsegment,
           count(*) AS revisit_customers,
           round(avg(c.c_acctbal), 4) AS avg_bal
    FROM pairs p JOIN customer c ON p.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """

register_sql(
    "tpcds_revisit_within_90d",
    _REVISIT_BODY.format(
        diff="datediff(CAST(b.o_orderdate AS DATE), CAST(a.o_orderdate AS DATE))"
    ),
    oracle=_REVISIT_BODY.format(
        diff="date_diff('day', CAST(a.o_orderdate AS DATE), CAST(b.o_orderdate AS DATE))"
    ),
)

# q64-shape: the same (customer, part) pair purchased in consecutive
# years — a self-join of one aggregated sales CTE on the HIGH-CARDINALITY
# (customer, part) compound key (contrast with the q75 nation-year
# self-join: here the join keys scale with the data, so the exchange
# hashes wide and stays parallel at any size).
register_sql(
    "tpcds_repeat_item_purchases",
    """
    WITH sales AS (
        SELECT o_custkey AS cust, l_partkey AS part,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
               sum(l_extendedprice * (1 - l_discount)) AS rev
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2, 3)
    SELECT a.yr AS first_yr,
           count(*) AS repeat_pairs,
           round(CAST(sum(b.rev) AS DOUBLE) / CAST(sum(a.rev) AS DOUBLE), 6)
               AS rev_ratio
    FROM sales a JOIN sales b
      ON a.cust = b.cust AND a.part = b.part AND b.yr = a.yr + 1
    GROUP BY a.yr
    ORDER BY a.yr
    """,
)


# q14a-shape (reference flink-tpcds-test/tpcds-tool/query/query14a.sql:1-105):
# the most distinctive absent shape of the pack — a cross-channel INTERSECT
# of aggregated CTEs (items sold in ALL THREE channels, by attribute),
# a scalar-subquery average over the union of the channels gating each
# channel aggregate via HAVING, and a final ROLLUP + LIMIT.  Channels map
# to order-priority bands (as tpcds_channel_union).  The HAVING threshold
# is the cross-multiplied integer rewrite (round-7 precedent): comparing
# group_sum/group_cnt > total_sum/total_cnt as group_sum * total_cnt >
# total_sum * group_cnt in DECIMAL(38, 0) — no float boundary for the two
# engines to disagree on, and no overflow at any SF.
# 100 TB: the fact join (lineitem-orders) is aggregated ONCE to the
# compact (channel, partkey) grain — at most 3x|part| rows — and
# localCheckpointed; the INTERSECT arms, the corpus-wide total, and the
# final channel/brand rollup all derive from that table, so Catalyst's
# CTE inlining can NOT multiply the fact scan (a naive single-string form
# recomputed lineitem-orders five times).  Everything downstream joins
# the small part dim — broadcast at any SF.  The DuckDB oracle shares the
# tail text verbatim (by_chan as a CTE), so the two engines cannot drift.
_XCI_BYCHAN = """
    SELECT channel, l_partkey,
           CAST(sum(rev_e4) AS BIGINT) AS rev_e4,
           count(*) AS n
    FROM (SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'urgent'
                      WHEN o_orderpriority = '3-MEDIUM' THEN 'normal'
                      ELSE 'lax' END AS channel,
                 l_partkey,
                 CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                      AS BIGINT) AS rev_e4
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
    GROUP BY channel, l_partkey
"""

_XCI_TAIL = """
    cross_parts AS (
        SELECT p_partkey FROM part
        JOIN (SELECT p.p_brand, p.p_type
              FROM by_chan b JOIN part p ON b.l_partkey = p.p_partkey
              WHERE b.channel = 'urgent'
              INTERSECT
              SELECT p.p_brand, p.p_type
              FROM by_chan b JOIN part p ON b.l_partkey = p.p_partkey
              WHERE b.channel = 'normal'
              INTERSECT
              SELECT p.p_brand, p.p_type
              FROM by_chan b JOIN part p ON b.l_partkey = p.p_partkey
              WHERE b.channel = 'lax') x
          ON part.p_brand = x.p_brand AND part.p_type = x.p_type),
    tot AS (SELECT CAST(sum(rev_e4) AS BIGINT) AS sum_e4,
                   CAST(sum(n) AS BIGINT) AS cnt
            FROM by_chan),
    per AS (
        SELECT b.channel, p.p_brand,
               CAST(sum(b.rev_e4) AS BIGINT) AS grp_e4,
               CAST(sum(b.n) AS BIGINT) AS grp_n
        FROM by_chan b JOIN part p ON b.l_partkey = p.p_partkey
        WHERE b.l_partkey IN (SELECT p_partkey FROM cross_parts)
        GROUP BY b.channel, p.p_brand
        HAVING CAST(sum(b.rev_e4) AS DECIMAL(38, 0)) * (SELECT cnt FROM tot)
               > CAST((SELECT sum_e4 FROM tot) AS DECIMAL(38, 0)) * sum(b.n))
    SELECT channel, p_brand,
           CAST(sum(grp_e4) AS BIGINT) AS sales_e4,
           CAST(sum(grp_n) AS BIGINT)  AS number_sales
    FROM per
    GROUP BY ROLLUP (channel, p_brand)
    ORDER BY channel NULLS FIRST, p_brand NULLS FIRST
    LIMIT 100
"""


def _register_cross_channel_intersect() -> None:
    from flink_1_12_0_spark.registry import query
    from flink_1_12_0_spark.tables import load_tables

    duck_sql = f"WITH by_chan AS ({_XCI_BYCHAN}),\n{_XCI_TAIL}"

    @query("tpcds_cross_channel_intersect", oracle=duck_sql)
    def tpcds_cross_channel_intersect(spark, sf_dir):  # noqa: ANN001
        load_tables(spark, sf_dir)
        by_chan = spark.sql(_XCI_BYCHAN).localCheckpoint(eager=True)
        by_chan.createOrReplaceTempView("by_chan")
        return spark.sql("WITH " + _XCI_TAIL)


_register_cross_channel_intersect()

# q64-shape, full form (reference query64.sql:1-119; the existing
# tpcds_repeat_item_purchases covers only the consecutive-year self-join
# kernel): a pre-aggregated HAVING CTE (sale > 2x refund — query64's
# cs_ui), then a LONG JOIN CHAIN over ten relations with the same
# dimension joined under two aliases twice (nation n1/n2, region r1/r2 —
# query64's d1/d2/d3, cd1/cd2, ad1/ad2, ib1/ib2) plus an inequality
# predicate ACROSS the aliases (n1 <> n2 — query64's cd1.cd_marital_status
# <> cd2.cd_marital_status), grouped per item-year, and finally the CTE
# self-joined on consecutive years with a count inequality
# (cs2.cnt <= cs1.cnt).
# 100 TB: every dim join is broadcast-able (nation/region/part/supplier);
# the only big-big join is lineitem-orders on the orderkey shuffle, and
# the chain CTE is aggregated to (item, year) grain and localCheckpointed
# ONCE before the self-join — Catalyst's CTE inlining would otherwise
# recompute the whole ten-relation join per self-join side (measured: no
# ReusedExchange fires, the sides differ after inlining).  The self-join
# keys on the HIGH-CARDINALITY item — hashes wide, stays parallel at any
# SF.  The DuckDB oracle shares both SQL fragments verbatim.
_CHAIN_CTE = """
    SELECT p.p_name AS product_name,
           p.p_partkey AS item_sk,
           CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS yr,
           count(*) AS cnt,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                               * 10000) AS BIGINT)) AS BIGINT) AS rev_e4,
           CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
    FROM lineitem l
    JOIN orders o          ON l.l_orderkey = o.o_orderkey
    JOIN customer c        ON o.o_custkey = c.c_custkey
    JOIN nation n1         ON c.c_nationkey = n1.n_nationkey
    JOIN region r1         ON n1.n_regionkey = r1.r_regionkey
    JOIN supplier su       ON l.l_suppkey = su.s_suppkey
    JOIN nation n2         ON su.s_nationkey = n2.n_nationkey
    JOIN region r2         ON n2.n_regionkey = r2.r_regionkey
    JOIN part p            ON l.l_partkey = p.p_partkey
    JOIN (SELECT l_partkey AS pk
          FROM lineitem
          GROUP BY l_partkey
          HAVING sum(CAST(round(l_extendedprice * 10000) AS BIGINT))
                 > 2 * sum(CASE WHEN l_returnflag = 'R'
                                THEN CAST(round(l_extendedprice * 10000)
                                          AS BIGINT)
                                ELSE 0 END)) rp
      ON p.p_partkey = rp.pk
    WHERE n1.n_name <> n2.n_name
      AND p.p_size BETWEEN 10 AND 25
    GROUP BY p.p_name, p.p_partkey,
             CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT)
"""

_CHAIN_TAIL = """
    SELECT cs1.product_name,
           cs1.item_sk,
           cs1.yr       AS yr1,
           cs2.yr       AS yr2,
           cs1.cnt      AS cnt1,
           cs2.cnt      AS cnt2,
           cs1.rev_e4   AS rev1_e4,
           cs2.rev_e4   AS rev2_e4,
           cs1.qty      AS qty1,
           cs2.qty      AS qty2
    FROM chain cs1 JOIN chain cs2
      ON cs1.item_sk = cs2.item_sk AND cs2.yr = cs1.yr + 1
    WHERE cs2.cnt <= cs1.cnt
    ORDER BY cs1.item_sk, yr1
"""


def _register_return_chain_yoy() -> None:
    from flink_1_12_0_spark.registry import query
    from flink_1_12_0_spark.tables import load_tables

    duck_sql = f"WITH chain AS ({_CHAIN_CTE})\n{_CHAIN_TAIL}"

    @query("tpcds_return_chain_yoy", oracle=duck_sql)
    def tpcds_return_chain_yoy(spark, sf_dir):  # noqa: ANN001
        load_tables(spark, sf_dir)
        chain = spark.sql(_CHAIN_CTE).localCheckpoint(eager=True)
        chain.createOrReplaceTempView("chain")
        return spark.sql(_CHAIN_TAIL)


_register_return_chain_yoy()


# q78-shape (reference query78.sql:1-58): the "sales WITHOUT returns"
# anti-join idiom — LEFT JOIN the returns relation and keep only NULL
# matches (here: lineitems of orders with NO returned item anywhere, a
# genuine anti-join not expressible as a row-local filter) — then the
# cross-channel LEFT JOIN ratio with COALESCE fallbacks (q78's
# store-vs-web+catalog).  The ratio is emitted as floor(qty * 100e0 /
# qty) e2 fixed point — the 100e0 DOUBLE literal keeps the division
# IEEE-double on BOTH engines (a 100.0 decimal literal makes Spark
# divide in DECIMAL(38,14) HALF_UP while DuckDB divides to DOUBLE — the
# tpcds_item_class_share lesson); floor of a small-int double quotient
# is then engine-identical, unlike round(x, 2) (half-boundary risk).
# 100 TB: one lineitem-orders pass builds the (channel, year, part)
# grain — checkpointed so the two channel arms and the self-join cannot
# re-derive the fact join (the q14a/q64 discipline); the returned-orders
# key list joins as a runtime-filter-style distinct key set.
_NORET_BYCHAN = """
    SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 'urgent' ELSE 'other' END AS channel,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
           l_partkey,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                         AS BIGINT)) AS BIGINT) AS rev_e4
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    LEFT JOIN (SELECT DISTINCT l_orderkey AS ro FROM lineitem
               WHERE l_returnflag = 'R') r
      ON l_orderkey = r.ro
    WHERE r.ro IS NULL
    GROUP BY CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 'urgent' ELSE 'other' END,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS INT),
             l_partkey
"""

_NORET_TAIL = """
    SELECT u.yr, u.l_partkey AS part_sk,
           u.qty AS clean_urgent_qty,
           coalesce(o.qty, 0) AS clean_other_qty,
           CAST(floor(u.qty * 100e0 / o.qty) AS BIGINT)
               AS urgent_other_ratio_e2,
           u.rev_e4 AS urgent_rev_e4,
           coalesce(o.rev_e4, 0) AS other_rev_e4
    FROM (SELECT yr, l_partkey, qty, rev_e4 FROM noret_chan
          WHERE channel = 'urgent') u
    LEFT JOIN (SELECT yr, l_partkey, qty, rev_e4 FROM noret_chan
               WHERE channel = 'other') o
      ON u.yr = o.yr AND u.l_partkey = o.l_partkey
    WHERE coalesce(o.qty, 0) > 0
    ORDER BY u.yr, part_sk
"""


def _register_no_returns_ratio() -> None:
    from flink_1_12_0_spark.registry import query
    from flink_1_12_0_spark.tables import load_tables

    duck_sql = f"WITH noret_chan AS ({_NORET_BYCHAN})\n{_NORET_TAIL}"

    @query("tpcds_no_returns_channel_ratio", oracle=duck_sql)
    def tpcds_no_returns_channel_ratio(spark, sf_dir):  # noqa: ANN001
        load_tables(spark, sf_dir)
        chan = spark.sql(_NORET_BYCHAN).localCheckpoint(eager=True)
        chan.createOrReplaceTempView("noret_chan")
        return spark.sql(_NORET_TAIL)


_register_no_returns_ratio()


# q4-shape (reference query4.sql:1-100+): the THREE-channel extension of
# the q74/q11 pattern tpcds_customer_channel_growth covers for two — one
# per-customer-per-channel-per-year aggregate instantiated SIX times
# (urgent/normal/lax x first/second year) with TWO growth comparisons
# (normal growth beats urgent growth AND lax growth), second-year arms as
# LEFT JOINs with COALESCE-0 fallbacks (q4's CASE WHEN > 0 guard),
# engine-exact via the cross-multiplied DECIMAL(38, 0) rewrite.
# 100 TB: the (cust, channel, yr) grain is one orders-scan aggregation,
# checkpointed so the six self-join arms read the materialized grain
# instead of re-deriving the scan per arm; all six joins key on the
# high-cardinality customer — hash wide, stay parallel.
_Q4_BYCUST = """
    SELECT o_custkey AS cust,
           CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'urgent'
                WHEN o_orderpriority = '3-MEDIUM' THEN 'normal'
                ELSE 'lax' END AS channel,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS spend_e2
    FROM orders
    WHERE CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) IN (1995, 1996)
    GROUP BY o_custkey,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'urgent'
                  WHEN o_orderpriority = '3-MEDIUM' THEN 'normal'
                  ELSE 'lax' END,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS INT)
"""

_Q4_TAIL = """
    SELECT u1.cust,
           u1.spend_e2 AS urgent_y1_e2,
           coalesce(u2.spend_e2, 0) AS urgent_y2_e2,
           n1.spend_e2 AS normal_y1_e2,
           coalesce(n2.spend_e2, 0) AS normal_y2_e2,
           l1.spend_e2 AS lax_y1_e2,
           coalesce(l2.spend_e2, 0) AS lax_y2_e2
    FROM q4_by_cust u1
    JOIN q4_by_cust n1
      ON u1.cust = n1.cust AND n1.channel = 'normal' AND n1.yr = 1995
    JOIN q4_by_cust l1
      ON u1.cust = l1.cust AND l1.channel = 'lax' AND l1.yr = 1995
    LEFT JOIN q4_by_cust u2
      ON u1.cust = u2.cust AND u2.channel = 'urgent' AND u2.yr = 1996
    LEFT JOIN q4_by_cust n2
      ON u1.cust = n2.cust AND n2.channel = 'normal' AND n2.yr = 1996
    LEFT JOIN q4_by_cust l2
      ON u1.cust = l2.cust AND l2.channel = 'lax' AND l2.yr = 1996
    WHERE u1.channel = 'urgent' AND u1.yr = 1995
      AND CAST(coalesce(n2.spend_e2, 0) AS DECIMAL(38, 0)) * u1.spend_e2
          > CAST(coalesce(u2.spend_e2, 0) AS DECIMAL(38, 0)) * n1.spend_e2
      AND CAST(coalesce(n2.spend_e2, 0) AS DECIMAL(38, 0)) * l1.spend_e2
          > CAST(coalesce(l2.spend_e2, 0) AS DECIMAL(38, 0)) * n1.spend_e2
    ORDER BY u1.cust
"""


def _register_triple_channel_growth() -> None:
    from flink_1_12_0_spark.registry import query
    from flink_1_12_0_spark.tables import load_tables

    duck_sql = f"WITH q4_by_cust AS ({_Q4_BYCUST})\n{_Q4_TAIL}"

    @query("tpcds_triple_channel_growth", oracle=duck_sql)
    def tpcds_triple_channel_growth(spark, sf_dir):  # noqa: ANN001
        load_tables(spark, sf_dir)
        grain = spark.sql(_Q4_BYCUST).localCheckpoint(eager=True)
        grain.createOrReplaceTempView("q4_by_cust")
        return spark.sql(_Q4_TAIL)


_register_triple_channel_growth()


# q95-shape (reference flink-tpcds-test/tpcds-tool/query/query95.sql:1-32):
# the same-table multi-hop EXISTS chain — orders shipped from AT LEAST TWO
# warehouses (ws_wh = web_sales self-joined on order with warehouse <>
# warehouse), consumed twice: once directly and once intersected with the
# returns table, both as IN-subqueries under a dim-filtered fact scan, all
# feeding ONE global aggregate row.  Mapping: warehouse -> l_suppkey,
# web_returns -> lineitem rows with l_returnflag = 'R', ship/net amounts
# -> tax/discount fixed-point sums (the q78 e4 discipline).
#
# Spark-first rewrite of the hot spot: the reference's ws_wh SELF-JOIN
# fans out quadratically per order (every same-order supplier pair) only
# to be deduplicated again by the IN; the Spark side computes the
# IDENTICAL key set as one grouped HAVING count(DISTINCT l_suppkey) > 1 —
# a single aggregation, no fan-out — and the oracle keeps the literal
# self-join formulation, so the driver's value-hash proves the rewrite
# equivalent.  100 TB: the key set is checkpointed once (it feeds two
# semi-joins — the q64 CTE-inlining discipline) and both INs plan as
# hash semi-joins keyed on the high-cardinality orderkey.
_Q95_MULTI_SUPP = """
    SELECT l_orderkey AS okey
    FROM lineitem
    GROUP BY l_orderkey
    HAVING count(DISTINCT l_suppkey) > 1
"""

_Q95_TAIL = """
    SELECT CAST(count(DISTINCT l.l_orderkey) AS BIGINT) AS order_cnt,
           CAST(sum(CAST(round(l.l_extendedprice * l.l_tax * 10000)
                         AS BIGINT)) AS BIGINT) AS ship_e4,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
                         AS BIGINT)) AS BIGINT) AS net_e4
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1996-06-30'
      AND n.n_name IN ('NATION_3', 'NATION_11', 'NATION_19')
      AND l.l_orderkey IN (SELECT okey FROM multi_supp)
      AND l.l_orderkey IN (SELECT l3.l_orderkey
                           FROM lineitem l3
                           JOIN multi_supp m ON l3.l_orderkey = m.okey
                           WHERE l3.l_returnflag = 'R')
"""

_Q95_DUCK = """
    WITH ws_wh AS (
      SELECT l1.l_orderkey AS okey
      FROM lineitem l1, lineitem l2
      WHERE l1.l_orderkey = l2.l_orderkey
        AND l1.l_suppkey <> l2.l_suppkey
    )
    SELECT CAST(count(DISTINCT l.l_orderkey) AS BIGINT) AS order_cnt,
           CAST(sum(CAST(round(l.l_extendedprice * l.l_tax * 10000)
                         AS BIGINT)) AS BIGINT) AS ship_e4,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
                         AS BIGINT)) AS BIGINT) AS net_e4
    FROM lineitem l, orders o, customer c, nation n
    WHERE l.l_orderkey = o.o_orderkey
      AND o.o_custkey = c.c_custkey
      AND c.c_nationkey = n.n_nationkey
      AND o.o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1996-06-30'
      AND n.n_name IN ('NATION_3', 'NATION_11', 'NATION_19')
      AND l.l_orderkey IN (SELECT okey FROM ws_wh)
      AND l.l_orderkey IN (SELECT l3.l_orderkey FROM lineitem l3, ws_wh
                           WHERE l3.l_returnflag = 'R'
                             AND l3.l_orderkey = ws_wh.okey)
"""


def _register_multi_warehouse_ship() -> None:
    from flink_1_12_0_spark.registry import query
    from flink_1_12_0_spark.tables import load_tables

    @query("tpcds_multi_warehouse_ship", oracle=_Q95_DUCK)
    def tpcds_multi_warehouse_ship(spark, sf_dir):  # noqa: ANN001
        load_tables(spark, sf_dir)
        keys = spark.sql(_Q95_MULTI_SUPP).localCheckpoint(eager=True)
        keys.createOrReplaceTempView("multi_supp")
        return spark.sql(_Q95_TAIL)


_register_multi_warehouse_ship()


# q72-shape (reference flink-tpcds-test/tpcds-tool/query/query72.sql:1-28):
# the inventory date-offset join fan-out — fact joined to a weekly
# per-item availability relation on SAME-WEEK equality
# (d1.d_week_seq = d2.d_week_seq) with an on-hand < ordered-quantity
# inequality residual, a SHIP-AFTER-SOLD date-offset inequality
# (d3.d_date > d1.d_date + 5 days), and two LEFT OUTER dims (promotion,
# returns) feeding null/not-null CASE counters.  Mapping: inventory ->
# weekly per-part shipped-quantity rollup of lineitem (our schema has no
# inventory table); promotion -> small parts (p_size <= 5); catalog_returns
# -> distinct returned (order, part) pairs; week_seq -> days-since-epoch
# DIV 7 (identical integer math both engines).  100 TB: the supply rollup
# shuffles once on (part, week) and the fact joins it on the same key —
# co-partitioned; the date-offset predicate is a residual on the
# orderkey-equi join (never a cross product); promo broadcasts.
_Q72_SPARK = """
    WITH supply AS (
      SELECT l_partkey AS sp_partkey,
             CAST(datediff(CAST(l_shipdate AS DATE), DATE '1995-01-02')
                  DIV 7 AS INT) AS sp_week,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS on_hand
      FROM lineitem GROUP BY 1, 2
    ),
    promo AS (SELECT p_partkey AS pr_partkey FROM part WHERE p_size <= 5),
    ret AS (SELECT DISTINCT l_orderkey AS r_okey, l_partkey AS r_pkey
            FROM lineitem WHERE l_returnflag = 'R')
    SELECT p.p_brand AS brand,
           CAST(datediff(CAST(o.o_orderdate AS DATE), DATE '1995-01-02')
                DIV 7 AS INT) AS wk,
           CAST(sum(CASE WHEN promo.pr_partkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS no_promo,
           CAST(sum(CASE WHEN promo.pr_partkey IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS promo_cnt,
           CAST(sum(CASE WHEN ret.r_okey IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS returned_cnt,
           CAST(count(*) AS BIGINT) AS total_cnt
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
                 AND l.l_shipdate > o.o_orderdate + INTERVAL 5 DAY
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supply s
      ON s.sp_partkey = l.l_partkey
     AND s.sp_week = CAST(datediff(CAST(o.o_orderdate AS DATE),
                                   DATE '1995-01-02') DIV 7 AS INT)
     AND s.on_hand < CAST(l.l_quantity AS BIGINT) * 3
    LEFT JOIN promo ON promo.pr_partkey = l.l_partkey
    LEFT JOIN ret ON ret.r_okey = l.l_orderkey AND ret.r_pkey = l.l_partkey
    WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND EXTRACT(YEAR FROM o.o_orderdate) BETWEEN 1996 AND 1998
    GROUP BY 1, 2
    ORDER BY total_cnt DESC, brand, wk LIMIT 100
"""

_Q72_DUCK = (
    _Q72_SPARK
    .replace("datediff(CAST(l_shipdate AS DATE), DATE '1995-01-02')\n"
             "                  DIV 7", "(CAST(l_shipdate AS DATE) "
             "- DATE '1995-01-02') // 7")
    .replace("datediff(CAST(o.o_orderdate AS DATE), DATE '1995-01-02')\n"
             "                DIV 7", "(CAST(o.o_orderdate AS DATE) "
             "- DATE '1995-01-02') // 7")
    .replace("datediff(CAST(o.o_orderdate AS DATE),\n"
             "                                   DATE '1995-01-02') DIV 7",
             "(CAST(o.o_orderdate AS DATE) - DATE '1995-01-02') // 7")
)

register_sql("tpcds_inventory_week_offset", _Q72_SPARK, oracle=_Q72_DUCK)


# q39-shape (reference flink-tpcds-test/tpcds-tool/query/query39a.sql:1-28):
# the inventory-variability pair — per (warehouse, item, month) coefficient
# of variation, keep volatile groups, then the consecutive-month SELF-JOIN
# on (warehouse, item).  Mapping: warehouse -> supplier nation, item ->
# part brand, inventory quantity -> l_quantity (integer-valued per the
# fixture fixed-point assertion).  The reference filters stddev/mean > 1
# with FLOAT stddev_samp — an order-dependent aggregate this repo's taint
# guard forbids; the SAME predicate is evaluated here in EXACT integer
# algebra by cross-multiplying the squared inequality:
#   stdev^2 > t^2 * mean^2  <=>  c * n * (n*s2 - s1^2) > (n-1) * s1^2
# over the exact sums s1 = sum(q), s2 = sum(q^2) (t = 1/2 on this fixture
# — uniform 1..50 quantities cap cov near 0.57, so the reference's t = 1
# would select nothing; the SHAPE is the point, the threshold is data —
# and the month pair generalizes from the reference's pinned Jan/Feb to
# ALL consecutive pairs so the row set is non-empty at every fixture SF,
# per the vacuous-green guard).
# Display mean/cov^2 are single IEEE divisions of exact integers —
# deterministic, unlike a float variance accumulation.  100 TB: one fact
# scan -> (wh, brand, moy) grain, the flagged self-join keys on the same
# grain — co-partitioned, no re-scan.
register_sql(
    "tpcds_inventory_variance_pair",
    """
    WITH inv AS (
      SELECT s.s_nationkey AS wh, p.p_brand AS brand,
             CAST(EXTRACT(MONTH FROM l.l_shipdate) AS INT) AS moy,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS s1,
             CAST(sum(CAST(l.l_quantity AS BIGINT)
                      * CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS s2
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE EXTRACT(YEAR FROM l.l_shipdate) = 1997
      GROUP BY s.s_nationkey, p.p_brand,
               CAST(EXTRACT(MONTH FROM l.l_shipdate) AS INT)
    ),
    flagged AS (
      SELECT * FROM inv
      WHERE n >= 2 AND 4 * n * (n * s2 - s1 * s1) > (n - 1) * s1 * s1
    )
    SELECT i1.wh, i1.brand, i1.moy AS moy1,
           round(i1.s1 / CAST(i1.n AS DOUBLE), 6) AS mean1,
           round((i1.n * (i1.n * i1.s2 - i1.s1 * i1.s1))
                 / CAST((i1.n - 1) * i1.s1 * i1.s1 AS DOUBLE), 6) AS covsq1,
           round(i2.s1 / CAST(i2.n AS DOUBLE), 6) AS mean2,
           round((i2.n * (i2.n * i2.s2 - i2.s1 * i2.s1))
                 / CAST((i2.n - 1) * i2.s1 * i2.s1 AS DOUBLE), 6) AS covsq2
    FROM flagged i1
    JOIN flagged i2 ON i1.wh = i2.wh AND i1.brand = i2.brand
                   AND i2.moy = i1.moy + 1
    ORDER BY i1.wh, i1.brand, i1.moy
    """,
)


# q51-shape (reference flink-tpcds-test/tpcds-tool/query/query51.sql:1-45):
# the cumulative-window FULL OUTER join of two channels — per-channel
# running totals (sum(sum()) OVER per item over dates), FULL OUTER joined
# on the (item, date) grain with COALESCE-style key recovery, then
# running MAXes over the UNION grain and a cross-channel cumulative
# comparison filter.  Mapping: web/store channels -> l_linestatus O/F;
# item_sk -> l_partkey; d_date -> ship month.  All cumulative sums are
# exact e4 integers (order-free); (item_sk, d) is unique per row so the
# ORDER BY ... LIMIT 100 is deterministic.  100 TB: each channel CTE is
# one hash aggregation to (item, month) grain + a window on the SAME
# partitioning key (no extra shuffle); the full-outer join and both
# running maxes key on item — every stage reuses one item-hash exchange
# family; months-per-item is bounded (~84) so no window partition ever
# concentrates work.  Running max skips NULLs identically in both engines.
register_sql(
    "tpcds_cumulative_channel_fullouter",
    """
    WITH web_v1 AS (
      SELECT l_partkey AS item_sk,
             substr(CAST(l_shipdate AS STRING), 1, 7) AS d,
             CAST(sum(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                     * 10000) AS BIGINT)))
                  OVER (PARTITION BY l_partkey
                        ORDER BY substr(CAST(l_shipdate AS STRING), 1, 7)
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cume_sales_e4
      FROM lineitem
      WHERE l_linestatus = 'O' AND l_partkey IS NOT NULL
      GROUP BY l_partkey, substr(CAST(l_shipdate AS STRING), 1, 7)),
    store_v1 AS (
      SELECT l_partkey AS item_sk,
             substr(CAST(l_shipdate AS STRING), 1, 7) AS d,
             CAST(sum(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                     * 10000) AS BIGINT)))
                  OVER (PARTITION BY l_partkey
                        ORDER BY substr(CAST(l_shipdate AS STRING), 1, 7)
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cume_sales_e4
      FROM lineitem
      WHERE l_linestatus = 'F' AND l_partkey IS NOT NULL
      GROUP BY l_partkey, substr(CAST(l_shipdate AS STRING), 1, 7))
    SELECT * FROM (
      SELECT item_sk, d, web_sales_e4, store_sales_e4,
             max(web_sales_e4)
                 OVER (PARTITION BY item_sk ORDER BY d
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS web_cumulative_e4,
             max(store_sales_e4)
                 OVER (PARTITION BY item_sk ORDER BY d
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS store_cumulative_e4
      FROM (SELECT CASE WHEN web.item_sk IS NOT NULL THEN web.item_sk
                        ELSE store.item_sk END AS item_sk,
                   CASE WHEN web.d IS NOT NULL THEN web.d
                        ELSE store.d END AS d,
                   web.cume_sales_e4 AS web_sales_e4,
                   store.cume_sales_e4 AS store_sales_e4
            FROM web_v1 web FULL OUTER JOIN store_v1 store
              ON web.item_sk = store.item_sk AND web.d = store.d) x ) y
    WHERE web_cumulative_e4 > store_cumulative_e4
    ORDER BY item_sk, d
    LIMIT 100
    """,
)


# q23a-shape (reference flink-tpcds-test/tpcds-tool/query/query23a.sql:
# 1-52): the frequent-items + best-customers double-CTE filter chain —
# CTE 1 mines items frequently sold within a year window (HAVING count >
# threshold on a (desc-prefix, item, year) grain), CTE 2 mines customers
# whose lifetime spend beats half the window-filtered per-customer MAX
# (a HAVING against a scalar subquery over a second aggregated CTE), and
# the tail sums a fixed month's sales across TWO channels, each
# semi-join-filtered by BOTH mined key sets (nested IN over two
# aggregated CTEs — the planner pattern nothing else exercises).
# Mapping: store_sales -> lineitem+orders; itemdesc -> substr(p_name);
# catalog/web channels -> order priority split; d_year/d_moy -> order
# date parts.  The tail aggregates per channel (2 rows — richer than
# q23a's single row, same shape).  100 TB: both mined CTEs aggregate to
# small grains (items-per-year, customers) and are localCheckpointed
# Spark-side so the two channel arms share ONE materialization instead
# of Catalyst re-inlining the mining joins per arm; the IN filters
# become hash semi-joins on high-cardinality keys; the part join
# broadcasts.  All money is exact e4 integers.
_Q23_FREQ = """
    SELECT substr(p.p_name, 1, 30) AS itemdesc, l.l_partkey AS item_sk,
           CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INT) AS sold_yr,
           count(*) AS cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE EXTRACT(YEAR FROM l.l_shipdate) IN (1995, 1996, 1997, 1998)
    GROUP BY substr(p.p_name, 1, 30), l.l_partkey,
             CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INT)
    HAVING count(*) > 6
"""

_Q23_BEST = """
    SELECT o.o_custkey AS c_sk,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                               * 10000) AS BIGINT)) AS BIGINT) AS ssales_e4
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_custkey
    HAVING sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
               AS BIGINT))
           > (50 / 100.0) * (SELECT max(csales_e4) FROM (
                 SELECT o2.o_custkey,
                        CAST(sum(CAST(round(l2.l_extendedprice
                                            * (1 - l2.l_discount) * 10000)
                                      AS BIGINT)) AS BIGINT) AS csales_e4
                 FROM lineitem l2 JOIN orders o2
                   ON l2.l_orderkey = o2.o_orderkey
                 WHERE EXTRACT(YEAR FROM l2.l_shipdate)
                       IN (1995, 1996, 1997, 1998)
                 GROUP BY o2.o_custkey) mx)
"""

_Q23_TAIL = """
    SELECT channel,
           CAST(sum(sales_e4) AS BIGINT) AS total_sales_e4,
           count(*) AS n_lines
    FROM (
      SELECT 'priority' AS channel,
             CAST(round(l.l_extendedprice * 10000) AS BIGINT) AS sales_e4
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE EXTRACT(YEAR FROM o.o_orderdate) = 1998
        AND EXTRACT(MONTH FROM o.o_orderdate) = 3
        AND o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        AND l.l_partkey IN (SELECT item_sk FROM frequent_items)
        AND o.o_custkey IN (SELECT c_sk FROM best_customers)
      UNION ALL
      SELECT 'standard' AS channel,
             CAST(round(l.l_extendedprice * 10000) AS BIGINT) AS sales_e4
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE EXTRACT(YEAR FROM o.o_orderdate) = 1998
        AND EXTRACT(MONTH FROM o.o_orderdate) = 3
        AND o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        AND l.l_partkey IN (SELECT item_sk FROM frequent_items)
        AND o.o_custkey IN (SELECT c_sk FROM best_customers)
    ) u
    GROUP BY channel
    ORDER BY channel
"""


def _register_freq_best_basket() -> None:
    from flink_1_12_0_spark.registry import query
    from flink_1_12_0_spark.tables import load_tables

    duck_sql = (f"WITH frequent_items AS ({_Q23_FREQ}),\n"
                f"best_customers AS ({_Q23_BEST})\n{_Q23_TAIL}")

    @query("tpcds_freq_best_basket", oracle=duck_sql)
    def tpcds_freq_best_basket(spark, sf_dir):  # noqa: ANN001
        load_tables(spark, sf_dir)
        freq = spark.sql(_Q23_FREQ).localCheckpoint(eager=True)
        freq.createOrReplaceTempView("frequent_items")
        best = spark.sql(_Q23_BEST).localCheckpoint(eager=True)
        best.createOrReplaceTempView("best_customers")
        return spark.sql(_Q23_TAIL)


_register_freq_best_basket()
