"""MATCH_RECOGNIZE queries over the events stream.

Reference: MatchRecognizeITCase patterns (StreamExecMatch.scala:68,
flink-libraries/flink-cep).  Oracles re-express the NFA semantics in pure
SQL: quantified runs via gaps-and-islands, fixed-length patterns via lag().
"""

from __future__ import annotations

from flink_1_12_0_spark.operators.cep import Step, match_recognize, match_recognize_stream
from flink_1_12_0_spark.registry import query
from flink_1_12_0_spark.streaming.core import events_stream, run_to_memory
from flink_1_12_0_spark.tables import load_tables

_ERR_RUN_ORACLE = """
    WITH seq AS (
        SELECT user_id, ts, event_id, event_type,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events),
    runs AS (
        SELECT *, rn - row_number() OVER (PARTITION BY user_id, event_type ORDER BY rn) AS grp
        FROM seq),
    eruns AS (
        SELECT user_id, grp, count(*) AS n_errors,
               arg_min(event_id, rn) AS first_error_id, max(rn) AS end_rn
        FROM runs WHERE event_type = 'error' GROUP BY 1, 2)
    SELECT e.user_id, e.n_errors, e.first_error_id, s.event_id AS purchase_id
    FROM eruns e
    JOIN seq s ON s.user_id = e.user_id AND s.rn = e.end_rn + 1
              AND s.event_type = 'purchase'
    ORDER BY e.user_id, purchase_id
"""

_ERR_STEPS = [
    Step("E", lambda r: r["event_type"] == "error", 1, None,
         where_vec=lambda p: p["event_type"].eq("error")),
    Step("P", lambda r: r["event_type"] == "purchase",
         where_vec=lambda p: p["event_type"].eq("purchase")),
]
_ERR_MEASURES = [
    ("n_errors", lambda m: m.count("E")),
    ("first_error_id", lambda m: m.first("E", "event_id")),
    ("purchase_id", lambda m: m.first("P", "event_id")),
]
_ERR_SCHEMA = "user_id bigint, n_errors bigint, first_error_id bigint, purchase_id bigint"


@query("cep_errors_then_purchase", oracle=_ERR_RUN_ORACLE)
def cep_errors_then_purchase(spark, sf_dir):
    """PATTERN (E+ P): one or more contiguous errors immediately followed
    by a purchase, greedy, AFTER MATCH SKIP PAST LAST ROW — batch NFA."""
    t = load_tables(spark, sf_dir)
    return match_recognize(
        t["events"].select("user_id", "ts", "event_id", "event_type"),
        partition_by=["user_id"],
        order_by=["ts", "event_id"],
        steps=_ERR_STEPS,
        measures=_ERR_MEASURES,
        out_schema=_ERR_SCHEMA,
    ).orderBy("user_id", "purchase_id")


@query(
    "cep_funnel_view_click_purchase",
    oracle="""
    SELECT user_id, v_id, c_id, event_id AS p_id
    FROM (SELECT user_id, event_id, ts, event_type,
                 lag(event_type, 2) OVER w AS t2,
                 lag(event_id, 2)   OVER w AS v_id,
                 lag(ts, 2)         OVER w AS ts2,
                 lag(event_type, 1) OVER w AS t1,
                 lag(event_id, 1)   OVER w AS c_id
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    WHERE event_type = 'purchase' AND t1 = 'click' AND t2 = 'view'
      AND ts - ts2 <= INTERVAL 2 DAY
    ORDER BY user_id, p_id
    """,
)
def cep_funnel_view_click_purchase(spark, sf_dir):
    """PATTERN (V C P) WITHIN 2 days, AFTER MATCH SKIP TO NEXT ROW —
    strict-contiguity conversion funnel; overlapping matches allowed."""
    t = load_tables(spark, sf_dir)
    steps = [
        Step("V", lambda r: r["event_type"] == "view",
             where_vec=lambda p: p["event_type"].eq("view")),
        Step("C", lambda r: r["event_type"] == "click",
             where_vec=lambda p: p["event_type"].eq("click")),
        Step("P", lambda r: r["event_type"] == "purchase",
             where_vec=lambda p: p["event_type"].eq("purchase")),
    ]
    measures = [
        ("v_id", lambda m: m.first("V", "event_id")),
        ("c_id", lambda m: m.first("C", "event_id")),
        ("p_id", lambda m: m.first("P", "event_id")),
    ]
    return match_recognize(
        t["events"].select("user_id", "ts", "event_id", "event_type"),
        partition_by=["user_id"],
        order_by=["ts", "event_id"],
        steps=steps,
        measures=measures,
        out_schema="user_id bigint, v_id bigint, c_id bigint, p_id bigint",
        within=2 * 86400,
        after_match="next_row",
    ).orderBy("user_id", "p_id")


@query("cep_stream_errors_purchase", oracle=_ERR_RUN_ORACLE)
def cep_stream_errors_purchase(spark, sf_dir):
    """Streaming MATCH_RECOGNIZE: the same (E+ P) pattern over the event
    stream with per-key NFA buffer state (WITHIN horizon = 40 days covers
    the fixture's whole span, so results equal the batch NFA)."""
    sdf = events_stream(spark, sf_dir, watermark=None).select(
        "user_id", "ts", "event_id", "event_type"
    )
    out = match_recognize_stream(
        sdf,
        partition_by=["user_id"],
        order_by=["ts", "event_id"],
        steps=_ERR_STEPS,
        measures=_ERR_MEASURES,
        out_schema=_ERR_SCHEMA,
        within=40 * 86400,
    )
    return run_to_memory(out, output_mode="update").orderBy("user_id", "purchase_id")


@query(
    "cep_timeout_abandoned",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, event_id, event_type,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events),
    runs AS (
        SELECT *, rn - row_number() OVER (PARTITION BY user_id, event_type ORDER BY rn) AS grp
        FROM seq),
    eruns AS (
        SELECT user_id, grp, min(rn) AS start_rn, max(rn) AS end_rn
        FROM runs WHERE event_type = 'error' GROUP BY 1, 2),
    abandoned AS (
        SELECT e.user_id, e.start_rn, e.end_rn
        FROM eruns e
        LEFT JOIN seq nx ON nx.user_id = e.user_id AND nx.rn = e.end_rn + 1
        WHERE nx.event_type IS DISTINCT FROM 'purchase')
    SELECT s.user_id,
           CAST(a.end_rn - s.rn + 1 AS BIGINT) AS n_errors,
           s.event_id AS first_error_id
    FROM abandoned a
    JOIN seq s ON s.user_id = a.user_id AND s.rn BETWEEN a.start_rn AND a.end_rn
    ORDER BY s.user_id, first_error_id
    """,
)
def cep_timeout_abandoned(spark, sf_dir):
    """CEP timeout side output (TimedOutPartialMatchHandler.java;
    PatternStream.select with an OutputTag timeout function): for
    PATTERN (E+ P), every error row that begins a partial match never
    completed by a purchase — funnel abandonment.  Oracle re-derives the
    same rows via gaps-and-islands: each error in a maximal error run NOT
    immediately followed by a purchase, with the run's remaining length as
    the partial's error count (one timeout per begin-event, exactly like
    the reference NFA's per-computation timeouts)."""
    from flink_1_12_0_spark.operators.cep import match_timeouts

    t = load_tables(spark, sf_dir)
    return match_timeouts(
        t["events"].select("user_id", "ts", "event_id", "event_type"),
        partition_by=["user_id"],
        order_by=["ts", "event_id"],
        steps=_ERR_STEPS,
        measures=[
            ("n_errors", lambda m: m.count("E")),
            ("first_error_id", lambda m: m.first("E", "event_id")),
        ],
        out_schema="user_id bigint, n_errors bigint, first_error_id bigint",
    ).orderBy("user_id", "first_error_id")


# ---- Pattern-API combinators: or / until / followedByAny / groups ----------


@query(
    "cep_or_until",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, event_id, event_type,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events),
    runs AS (
        SELECT *, rn - row_number() OVER (
                   PARTITION BY user_id, (event_type IN ('view', 'click'))
                   ORDER BY rn) AS grp
        FROM seq),
    aruns AS (
        SELECT user_id, grp, count(*) AS n_a,
               arg_min(event_id, rn) AS first_a_id, max(rn) AS end_rn
        FROM runs WHERE event_type IN ('view', 'click') GROUP BY 1, 2)
    SELECT a.user_id, a.n_a, a.first_a_id, s.event_id AS purchase_id
    FROM aruns a
    JOIN seq s ON s.user_id = a.user_id AND s.rn = a.end_rn + 1
              AND s.event_type = 'purchase'
    ORDER BY a.user_id, purchase_id
    """,
)
def cep_or_until(spark, sf_dir):
    """Pattern combinators or() + until() (Pattern.java:178,68): the loop
    variable A accepts view OR click OR purchase (three or_-chained
    conditions) but until(purchase) stops the loop before taking one —
    so A+ P matches each maximal view/click run immediately followed by
    the purchase the loop refused to swallow.  Oracle: gaps-and-islands
    over the (view|click) flag."""
    from flink_1_12_0_spark.operators.cep import Pattern

    t = load_tables(spark, sf_dir)
    pat = (
        Pattern.begin("A", lambda r: r["event_type"] == "view")
        .or_(lambda r: r["event_type"] == "click")
        .or_(lambda r: r["event_type"] == "purchase")
        .one_or_more()
        .until(lambda r: r["event_type"] == "purchase")
        .next("P", lambda r: r["event_type"] == "purchase")
    )
    return pat.select(
        t["events"].select("user_id", "ts", "event_id", "event_type"),
        partition_by=["user_id"],
        order_by=["ts", "event_id"],
        measures=[
            ("n_a", lambda m: m.count("A")),
            ("first_a_id", lambda m: m.first("A", "event_id")),
            ("purchase_id", lambda m: m.first("P", "event_id")),
        ],
        out_schema="user_id bigint, n_a bigint, first_a_id bigint, purchase_id bigint",
    ).orderBy("user_id", "purchase_id")


@query(
    "cep_skip_till_next",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, event_id, event_type,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events),
    errs AS (
        SELECT user_id, rn, event_id,
               lead(rn)       OVER (PARTITION BY user_id ORDER BY rn) AS rn2,
               lead(event_id) OVER (PARTITION BY user_id ORDER BY rn) AS eid2
        FROM seq WHERE event_type = 'error')
    SELECT e.user_id, e.event_id AS first_error_id, e.eid2 AS second_error_id,
           p.event_id AS purchase_id
    FROM errs e
    JOIN seq p ON p.user_id = e.user_id AND p.rn = e.rn2 + 1
              AND p.event_type = 'purchase'
    ORDER BY e.user_id, first_error_id
    """,
)
def cep_skip_till_next(spark, sf_dir):
    """Relaxed internal loop contiguity (flink-cep SKIP_TILL_NEXT — the
    reference's DEFAULT for looping patterns; this engine's loops default
    to strict/consecutive, so the mode is opt-in here): E{2} with relaxed
    iterations takes an error, SKIPS any non-error events, takes the next
    error, then requires a purchase on the very next row; SKIP TO NEXT
    ROW allows overlapping anchors.  Oracle: consecutive errors in
    error-only sequence order whose successor row is a purchase — under
    strict contiguity the two errors would have to be adjacent rows, so
    the row-number join over the error subsequence is exactly the relaxed
    semantics."""
    from flink_1_12_0_spark.operators.cep import Pattern

    t = load_tables(spark, sf_dir)
    pat = (
        Pattern.begin("E", lambda r: r["event_type"] == "error")
        .times(2)
        .skip_till_next()
        .next("P", lambda r: r["event_type"] == "purchase")
    )
    return pat.select(
        t["events"].select("user_id", "ts", "event_id", "event_type"),
        partition_by=["user_id"],
        order_by=["ts", "event_id"],
        measures=[
            ("first_error_id", lambda m: m.first("E", "event_id")),
            ("second_error_id", lambda m: m.last("E", "event_id")),
            ("purchase_id", lambda m: m.first("P", "event_id")),
        ],
        out_schema=(
            "user_id bigint, first_error_id bigint, "
            "second_error_id bigint, purchase_id bigint"
        ),
        after_match="next_row",
    ).orderBy("user_id", "first_error_id")


@query(
    "cep_followed_by_any",
    oracle="""
    SELECT e.user_id, e.event_id AS e_id, p.event_id AS p_id
    FROM events e JOIN events p ON p.user_id = e.user_id
    WHERE e.event_type = 'error' AND p.event_type = 'purchase'
      AND (p.ts > e.ts OR (p.ts = e.ts AND p.event_id > e.event_id))
      AND epoch(p.ts) - epoch(e.ts) <= 2 * 86400
    ORDER BY e.user_id, e_id, p_id
    """,
)
def cep_followed_by_any(spark, sf_dir):
    """Pattern.followedByAny (Pattern.java:322) — relaxed
    NON-DETERMINISTIC contiguity: every error pairs with EVERY purchase
    in the following 2 days (one match per alternative), not just the
    first — flink-cep's SKIP_TILL_ANY with NO_SKIP emission.  Oracle:
    the equivalent ordered self-join of all qualifying pairs."""
    from flink_1_12_0_spark.operators.cep import Pattern

    t = load_tables(spark, sf_dir)
    pat = (
        Pattern.begin("E", lambda r: r["event_type"] == "error")
        .followed_by_any("P", lambda r: r["event_type"] == "purchase")
        .within(2 * 86400)
    )
    return pat.select(
        t["events"].select("user_id", "ts", "event_id", "event_type"),
        partition_by=["user_id"],
        order_by=["ts", "event_id"],
        measures=[
            ("e_id", lambda m: m.first("E", "event_id")),
            ("p_id", lambda m: m.first("P", "event_id")),
        ],
        out_schema="user_id bigint, e_id bigint, p_id bigint",
    ).orderBy("user_id", "e_id", "p_id")


@query(
    "cep_group_pattern",
    oracle="""
    SELECT user_id, v1_id, c1_id, v2_id, event_id AS c2_id
    FROM (SELECT user_id, event_id, event_type,
                 lag(event_type, 3) OVER w AS t3, lag(event_id, 3) OVER w AS v1_id,
                 lag(event_type, 2) OVER w AS t2, lag(event_id, 2) OVER w AS c1_id,
                 lag(event_type, 1) OVER w AS t1, lag(event_id, 1) OVER w AS v2_id
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    WHERE event_type = 'click' AND t1 = 'view' AND t2 = 'click' AND t3 = 'view'
    ORDER BY user_id, c2_id
    """,
)
def cep_group_pattern(spark, sf_dir):
    """GroupPattern (Pattern.java:529): (V C) as the quantified unit,
    times(2) → V C V C strict-contiguous, overlapping matches allowed
    (SKIP TO NEXT ROW).  Oracle: the fixed-length lag() window."""
    from flink_1_12_0_spark.operators.cep import Pattern

    t = load_tables(spark, sf_dir)
    pat = Pattern.begin_group(
        Pattern.begin("V", lambda r: r["event_type"] == "view")
        .next("C", lambda r: r["event_type"] == "click")
    ).times(2)
    return pat.select(
        t["events"].select("user_id", "ts", "event_id", "event_type"),
        partition_by=["user_id"],
        order_by=["ts", "event_id"],
        measures=[
            ("v1_id", lambda m: m.first("V#1", "event_id")),
            ("c1_id", lambda m: m.first("C#1", "event_id")),
            ("v2_id", lambda m: m.first("V#2", "event_id")),
            ("c2_id", lambda m: m.first("C#2", "event_id")),
        ],
        out_schema=(
            "user_id bigint, v1_id bigint, c1_id bigint, v2_id bigint, c2_id bigint"
        ),
        after_match="next_row",
    ).orderBy("user_id", "c2_id")


@query(
    "cep_times_or_more_consecutive",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, event_id, event_type, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events),
    runs AS (
        SELECT *, rn - row_number() OVER (
                   PARTITION BY user_id, (event_type = 'view' AND value >= 10)
                   ORDER BY rn) AS grp
        FROM seq),
    vruns AS (
        SELECT user_id, grp, count(*) AS n_views,
               arg_min(event_id, rn) AS first_view_id, max(rn) AS end_rn
        FROM runs WHERE event_type = 'view' AND value >= 10
        GROUP BY 1, 2 HAVING count(*) >= 3)
    SELECT v.user_id, v.n_views, v.first_view_id, s.event_id AS purchase_id
    FROM vruns v
    JOIN seq s ON s.user_id = v.user_id AND s.rn = v.end_rn + 1
              AND s.event_type = 'purchase'
    ORDER BY v.user_id, purchase_id
    """,
)
def cep_times_or_more_consecutive(spark, sf_dir):
    """Pattern.where() conjunction + timesOrMore(3) + consecutive()
    (Pattern.java:157 where-AND, timesOrMore, looping-contiguity): runs
    of >= 3 STRICTLY consecutive high-value views (the where() narrows
    the view condition to value >= 10) immediately followed by a
    purchase.  Oracle: gaps-and-islands over the conjoined flag."""
    from flink_1_12_0_spark.operators.cep import Pattern

    t = load_tables(spark, sf_dir)
    pat = (
        Pattern.begin("V", lambda r: r["event_type"] == "view")
        .where(lambda r: r["value"] is not None and r["value"] >= 10)
        .times_or_more(3)
        .consecutive()
        .next("P", lambda r: r["event_type"] == "purchase")
    )
    return pat.select(
        t["events"].select("user_id", "ts", "event_id", "event_type", "value"),
        partition_by=["user_id"],
        order_by=["ts", "event_id"],
        measures=[
            ("n_views", lambda m: m.count("V")),
            ("first_view_id", lambda m: m.first("V", "event_id")),
            ("purchase_id", lambda m: m.first("P", "event_id")),
        ],
        out_schema=(
            "user_id bigint, n_views bigint, first_view_id bigint, "
            "purchase_id bigint"
        ),
    ).orderBy("user_id", "purchase_id")


@query(
    "cep_not_next",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, event_id, event_type,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events),
    anchors AS (
        SELECT e.user_id, e.rn, e.event_id
        FROM seq e
        JOIN seq s ON s.user_id = e.user_id AND s.rn = e.rn + 1
        WHERE e.event_type = 'error' AND s.event_type <> 'click'),
    matched AS (
        SELECT a.user_id, a.event_id AS error_id,
               arg_min(p.event_id, p.rn) AS purchase_id
        FROM anchors a
        JOIN seq p ON p.user_id = a.user_id AND p.rn > a.rn
                  AND p.event_type = 'purchase'
        GROUP BY a.user_id, a.rn, a.event_id)
    SELECT user_id, error_id, purchase_id
    FROM matched
    ORDER BY user_id, error_id
    """,
)
def cep_not_next(spark, sf_dir):
    """Pattern.notNext (flink-libraries/flink-cep/.../pattern/Pattern.java:273
    — strict-contiguity negation, dual of notFollowedBy): an error whose
    IMMEDIATE successor is not a click (a click right after the error
    kills the partial match, as in the reference NFACompiler's NOT_NEXT
    stop-state), eventually followed by a purchase.  AFTER MATCH SKIP TO
    NEXT ROW, so every qualifying error anchors exactly one match (the
    first purchase after it) — which keeps the oracle a plain
    successor-join + arg_min.  Contrast with not_followed_by, which would
    forbid clicks ANYWHERE in the gap."""
    from flink_1_12_0_spark.operators.cep import Pattern

    t = load_tables(spark, sf_dir)
    pat = (
        Pattern.begin("E", lambda r: r["event_type"] == "error")
        .not_next(lambda r: r["event_type"] == "click")
        .followed_by("P", lambda r: r["event_type"] == "purchase")
    )
    return pat.select(
        t["events"].select("user_id", "ts", "event_id", "event_type"),
        partition_by=["user_id"],
        order_by=["ts", "event_id"],
        measures=[
            ("error_id", lambda m: m.first("E", "event_id")),
            ("purchase_id", lambda m: m.first("P", "event_id")),
        ],
        out_schema="user_id bigint, error_id bigint, purchase_id bigint",
        after_match="next_row",
    ).orderBy("user_id", "error_id")
