"""Event-stream analytics, batch form: JSON props, time buckets,
sessionization, latest-event compaction.

These are the batch twins of the streaming surface (SURVEY §2.7): the
same tumbling-window and per-key logic runs as a streaming query in
hailstorm_spark.streaming with watermarks; here they are expressed over
the bounded ``events`` table so the DuckDB oracle can check them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hailstorm_spark.functions.decimal import dsum, dsum_sql, money, money_sql
from hailstorm_spark.io import load_table
from hailstorm_spark.registry import register


def _json_int_sql(props: str, path: str) -> str:
    """DuckDB: extract ``path`` from a JSON string column as int64 with
    the portable NULL-unless-exactly-integral contract — NULL for
    invalid JSON, missing keys, JSON null, strings that aren't integer
    literals, booleans, objects/arrays, non-integral numbers, and
    out-of-int64-range values.

    Why the regex gate: DuckDB TRY_CAST ROUNDS numeric text ('2.7' →
    3, '7.0' → 7) while Spark's try_cast NULLs non-numeric text — and
    Spark's try_cast additionally trims whitespace and accepts a '+'
    sign (try_cast(' 7')=7, try_cast('+7')=7), so NO bare-cast pair
    agrees on every string. The portable contract is therefore the
    STRICT integer-literal gate ^-?[0-9]+$ applied identically on BOTH
    sides: the Spark query rlike-gates the extracted string before its
    try_cast, and this oracle regexp-gates before TRY_CAST.
    Out-of-int64-range literals pass the gate and the final TRY_CAST
    NULLs them on both engines."""
    x = f"json_extract_string(CASE WHEN json_valid({props}) THEN {props} END, '{path}')"
    return (
        f"TRY_CAST(CASE WHEN regexp_matches({x}, '^-?[0-9]+$')"
        f" THEN {x} END AS BIGINT)"
    )


def _json_typed_int_sql(props: str, path: str) -> str:
    """DuckDB: extract ``path`` as int64 iff the JSON value is
    integer-TYPED — the variant-query contract. Strings ("7"), floats
    (7.0, 1e2), booleans, objects, arrays, JSON null, missing keys,
    invalid documents, and out-of-int64-range integers are all NULL.

    Why type-based rather than text-based: both engines NORMALIZE
    float text on extraction (Spark's variant turns 7.0 into
    DECIMAL(1,0) whose string is '7'; DuckDB rewrites 1e2 into
    '100.0'), in different directions, so no text rule can agree on
    float-notation values — but both preserve the integer/float/string
    TYPE distinction exactly (Spark schema_of_variant == 'BIGINT',
    DuckDB json_type IN ('BIGINT','UBIGINT'))."""
    jp = f"CASE WHEN json_valid({props}) THEN {props} END"
    return (
        f"TRY_CAST(CASE WHEN json_type({jp}, '{path}')"
        f" IN ('BIGINT', 'UBIGINT')"
        f" THEN json_extract_string({jp}, '{path}') END AS BIGINT)"
    )

SESSION_GAP_MIN = 30


@register(
    "events_json_props",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM({_json_int_sql("props", "$.k")}) AS BIGINT) AS sum_k,
           CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY event_type
    """,
    tags=("events", "json"),
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract a typed field from the JSON props column and aggregate.

    get_json_object stays JVM-side; at scale prefer from_json with an
    explicit schema once the shape is known (single parse, typed).

    try_cast on the extracted string: real corpora carry props whose
    `k` is a quoted string, float, object, or array — an ANSI CAST
    faults the whole scan on the first such row (the one-bad-row-kills-
    the-job class); NULL-on-mismatch is the ingest semantics both
    engines share (DuckDB TRY_CAST + json_valid gate).

    The rlike gate pins the cross-engine contract (see _json_int_sql):
    a bare try_cast would ALSO admit whitespace-padded and plus-signed
    text (' 7', '+7') that DuckDB's strict regexp rejects — the gate
    makes "integer literal" mean the same ^-?[0-9]+$ set on both
    engines, NULLing everything else. Anchors are \\A..\\z, not ^..$:
    Java's $ matches BEFORE a final line terminator (so "7\\n" would
    pass the Spark gate and then try_cast-trim to 7) while RE2's $ is
    end-of-text-only — \\A/\\z is the only pair with identical
    semantics in both engines (ADVICE r7; HOSTILE_PROPS pins the
    trailing-newline shape)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.expr(
                "try_cast(case when get_json_object(props, '$.k')"
                " rlike '\\\\A-?[0-9]+\\\\z'"
                " then get_json_object(props, '$.k') end as long)"
            )
        ).alias("sum_k"),
        dsum(money("value"), "sum_value"),
    )


@register(
    "events_tumbling_daily",
    oracle=f"""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           event_type,
           COUNT(*) AS n,
           {dsum_sql(money_sql('value'), 'sum_value')}
    FROM events
    GROUP BY 1, 2
    """,
    tags=("events", "window-time"),
)
def events_tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily tumbling aggregation — batch twin of the streaming
    ``F.window(ts, '1 day')`` aggregation."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), dsum(money("value"), "sum_value"))


@register(
    "events_tumbling_5min_buckets",
    oracle="""
    SELECT (epoch_us(ts) // 300000000) * 300 AS bucket_epoch,
           COUNT(*) AS n
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY 1
    """,
    tags=("events", "window-time"),
)
def events_tumbling_5min_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute buckets keyed by epoch seconds (integer-microsecond
    floor division — second-level epoch functions round vs truncate
    differently across engines; the streaming twin uses F.window)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    bucket = F.expr("unix_micros(ts) div 300000000") * 300
    return e.groupBy(bucket.alias("bucket_epoch")).agg(F.count(F.lit(1)).alias("n"))


@register(
    "events_sessionize",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, event_id, ts, epoch_us(ts) AS ts_us,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                       <= {SESSION_GAP_MIN} * 60 * 1000000
                  THEN 0 ELSE 1 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ),
    sessions AS (
      SELECT user_id, ts_us,
             SUM(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts_us ASC, event_id ASC
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           (MAX(ts_us) - MIN(ts_us)) // 1000000 AS duration_sec
    FROM sessions
    GROUP BY user_id, session_id
    """,
    tags=("events", "session"),
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) via lag + cumulative
    sum — the classic two-window formulation; one shuffle on user_id.
    Streaming twin: session_window / applyInPandasWithState.

    Time arithmetic stays in integer microseconds (unix_micros) —
    second-truncating functions would move session boundaries.
    """
    e = load_table(spark, sf_dir, "events").withColumn("ts_us", F.unix_micros("ts"))
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    wrun = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts_us"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gap_ok = (F.col("ts_us") - F.lag("ts_us").over(w)) <= SESSION_GAP_MIN * 60 * 1_000_000
    flagged = e.withColumn("new_session", F.when(gap_ok, 0).otherwise(1))
    sessions = flagged.withColumn(
        "session_id", F.sum("new_session").over(wrun).cast("long")
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        ((F.max("ts_us") - F.min("ts_us")) / 1_000_000).cast("long").alias("duration_sec"),
    )


@register(
    "events_latest_per_user",
    oracle="""
    SELECT user_id, event_id, event_type, CAST(value AS DOUBLE) AS value
    FROM (
      SELECT user_id, event_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) t
    WHERE rn = 1
    """,
    tags=("events", "dedup"),
)
def events_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-event compaction (CDC upsert shape): row_number over
    (user, ts desc) — one shuffle, no self-join."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", F.col("value").cast("double").alias("value"))
    )


@register(
    "events_rollup_multires",
    oracle="""
    WITH minutely AS (
      SELECT (epoch_us(ts) // 60000000) * 60 AS bucket_epoch, event_type,
             COUNT(*) AS n, SUM(CAST(value AS DECIMAL(14,2))) AS sum_dec
      FROM events GROUP BY 1, 2
    ),
    hourly AS (
      SELECT (bucket_epoch // 3600) * 3600 AS bucket_epoch, event_type,
             SUM(n) AS n, SUM(sum_dec) AS sum_dec
      FROM minutely GROUP BY 1, 2
    ),
    daily AS (
      SELECT (bucket_epoch // 86400) * 86400 AS bucket_epoch, event_type,
             SUM(n) AS n, SUM(sum_dec) AS sum_dec
      FROM hourly GROUP BY 1, 2
    )
    SELECT 'minute' AS resolution, bucket_epoch, event_type,
           CAST(n AS BIGINT) AS n, CAST(sum_dec AS DOUBLE) AS sum_value FROM minutely
    UNION ALL
    SELECT 'hour', bucket_epoch, event_type, CAST(n AS BIGINT), CAST(sum_dec AS DOUBLE) FROM hourly
    UNION ALL
    SELECT 'day', bucket_epoch, event_type, CAST(n AS BIGINT), CAST(sum_dec AS DOUBLE) FROM daily
    """,
    tags=("events", "window-time", "rollup"),
)
def events_rollup_multires(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style cascading rollup: minute → hour → day, where
    each coarser resolution re-aggregates the FINER level's partial
    aggregates (sum-of-sums / sum-of-counts), never the raw events.

    This is the continuous-aggregate pattern at 100 TB: the raw scan
    and the expensive first groupBy happen once; the hour and day
    levels each shuffle only the (already tiny) finer rollup. Value
    sums stay exact decimal through every level (decimal addition is
    associative — cascade == direct) and surface as double only at the
    output edge. Spark reuses the minutely exchange across the three
    union branches (ReusedExchange in the physical plan).
    """
    e = load_table(spark, sf_dir, "events")
    minute_bucket = (F.expr("unix_micros(ts) div 60000000") * 60).alias("bucket_epoch")
    minutely = e.groupBy(minute_bucket, "event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum(money("value")).alias("sum_dec")
    )
    hourly = minutely.groupBy(
        (F.expr("bucket_epoch div 3600") * 3600).alias("bucket_epoch"), "event_type"
    ).agg(F.sum("n").alias("n"), F.sum("sum_dec").alias("sum_dec"))
    daily = hourly.groupBy(
        (F.expr("bucket_epoch div 86400") * 86400).alias("bucket_epoch"), "event_type"
    ).agg(F.sum("n").alias("n"), F.sum("sum_dec").alias("sum_dec"))

    def out(df: DataFrame, res: str) -> DataFrame:
        return df.select(
            F.lit(res).alias("resolution"),
            "bucket_epoch",
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.col("sum_dec").cast("double").alias("sum_value"),
        )

    return out(minutely, "minute").unionByName(out(hourly, "hour")).unionByName(
        out(daily, "day")
    )


@register(
    "events_sliding_15min_5min",
    oracle="""
    WITH fd AS (
      -- exact FLOOR division of the event epoch by the 5-min slide:
      -- DuckDB's // truncates toward zero, so a bare // mis-buckets
      -- pre-epoch (negative-epoch) timestamps where Spark's F.window
      -- floor-aligns; (a - ((a % b + b) % b)) / b floors for any sign
      SELECT event_type, CAST(value AS DECIMAL(14,2)) AS v,
             epoch_us(ts) AS t,
             (epoch_us(ts)
              - ((epoch_us(ts) % 300000000 + 300000000) % 300000000))
             // 300000000 AS slot
      FROM events
    ),
    starts AS (
      SELECT event_type, v, (fd.slot - i) * 300 AS win_start_epoch
      FROM fd, range(3) t(i)
      WHERE (fd.slot - i) * 300000000 > fd.t - 900000000
    )
    SELECT win_start_epoch, event_type,
           COUNT(*) AS n, CAST(SUM(v) AS DOUBLE) AS sum_value
    FROM starts
    GROUP BY win_start_epoch, event_type
    """,
    tags=("events", "window-time", "sliding"),
)
def events_sliding_15min_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) event-time windows: 15-minute windows every 5
    minutes — each event lands in 3 overlapping windows (F.window with
    a slide). The oracle expands the same 3-window membership by hand
    (an event at t belongs to window starts in
    ((t-15min, t] ∩ 5-minute grid)).

    At scale the slide factor multiplies aggregation input 3× — Spark
    does this expansion BEFORE the partial aggregate, so the shuffle
    still carries only (window, type) partials, not 3× the events.
    """
    e = load_table(spark, sf_dir, "events")
    win = F.window("ts", "15 minutes", "5 minutes").alias("win")
    out = e.groupBy(win, "event_type").agg(
        F.count(F.lit(1)).alias("n"), dsum(money("value"), "sum_value")
    )
    return out.select(
        F.unix_timestamp(F.col("win.start")).alias("win_start_epoch"),
        "event_type",
        "n",
        "sum_value",
    )


@register(
    "events_gap_fill_hourly",
    oracle="""
    WITH pe AS (
      SELECT user_id, event_id, epoch_us(ts) // 3600000000 AS hr,
             CAST(value AS DOUBLE) AS value
      FROM events WHERE event_type = 'purchase'
    ),
    span AS (SELECT user_id, MIN(hr) AS h0, MAX(hr) AS h1 FROM pe GROUP BY user_id),
    grid AS (SELECT user_id, unnest(generate_series(h0, h1)) AS hr FROM span),
    obs AS (SELECT user_id, hr, arg_max(value, event_id) AS v
            FROM pe GROUP BY user_id, hr),
    joined AS (
      SELECT g.user_id, g.hr, o.v FROM grid g
      LEFT JOIN obs o ON o.user_id = g.user_id AND o.hr = g.hr
    )
    SELECT user_id, hr * 3600 AS hour_epoch,
           LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY hr ASC
                                            ROWS UNBOUNDED PRECEDING) AS filled_value,
           (v IS NOT NULL) AS observed
    FROM joined
    """,
    tags=("events", "temporal", "gap-fill"),
)
def events_gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-fill + forward fill: every hour in each user's
    observed purchase span gets the last-seen value (LOCF). The dense
    grid comes from exploding per-user hour sequences (row count =
    Σ user spans — generated, never shuffled raw); the fill is one
    window per user over the grid. Ties inside an hour resolve to the
    max event_id in both engines.
    """
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    pe = e.select(
        "user_id",
        "event_id",
        F.expr("unix_micros(ts) div 3600000000").alias("hr"),
        F.col("value").cast("double").alias("value"),
    )
    span = pe.groupBy("user_id").agg(F.min("hr").alias("h0"), F.max("hr").alias("h1"))
    grid = span.select(
        "user_id", F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("hr")
    )
    obs = pe.groupBy("user_id", "hr").agg(F.max_by("value", "event_id").alias("v"))
    joined = grid.join(obs, ["user_id", "hr"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("hr"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        (F.col("hr") * 3600).alias("hour_epoch"),
        F.last("v", ignorenulls=True).over(w).alias("filled_value"),
        F.col("v").isNotNull().alias("observed"),
    )


@register(
    "events_json_corrupt_accounting",
    oracle="""
    WITH raw AS (
      SELECT event_type,
             CASE WHEN event_id % 10 = 0
                  THEN substr(props, 1, length(props) - 1)
                  ELSE props END AS props
      FROM events
    ),
    judged AS (
      -- valid mirrors Spark's PERMISSIVE from_json('k BIGINT') rule:
      -- the document must parse AS A TOP-LEVEL OBJECT and k must be
      -- absent, JSON null, or an integer that fits int64 (strings/
      -- floats/bools/objects/arrays/out-of-range integers all
      -- quarantine the row; '' and NULL props never parse; top-level
      -- non-object valid JSON — '7', '[1,2]', 'true', 'null' — is
      -- corrupt to from_json with a struct schema, hence the OBJECT
      -- gate below). jp gates every JSON function: DuckDB
      -- json_type/json_extract_string FAULT on malformed input rather
      -- than returning NULL, and CASE is the documented guard.
      SELECT event_type,
             CASE WHEN json_valid(props) THEN props END AS jp
      FROM raw
    ),
    typed AS (
      SELECT event_type, jp,
             jp IS NOT NULL
             AND json_type(jp) = 'OBJECT'
             AND (json_type(jp, '$.k') IS NULL
                  OR json_type(jp, '$.k') = 'NULL'
                  OR (json_type(jp, '$.k') IN ('BIGINT', 'UBIGINT')
                      AND TRY_CAST(json_extract_string(jp, '$.k')
                                   AS BIGINT) IS NOT NULL)) AS ok
      FROM judged
    )
    SELECT event_type,
           CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
           CAST(SUM(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT) AS n_corrupt,
           CAST(SUM(CASE WHEN ok
                         THEN TRY_CAST(json_extract_string(jp, '$.k')
                                       AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS sum_k
    FROM typed
    GROUP BY event_type
    """,
    tags=("events", "json", "ingest"),
)
def events_json_corrupt_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-input accounting on JSON ingest — the dead-letter
    pattern: PERMISSIVE from_json with a declared corrupt-record column
    parses what it can and quarantines the rest in the same pass (no
    failed job, no second scan; pair with observe() for the running
    corrupt rate). Corruption is planted by truncating every 10th
    event's props; the oracle mirrors with json_valid. FAILFAST is the
    alternative when any corruption must abort the load.
    """
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.when(
            F.col("event_id") % 10 == 0,
            F.expr("substr(props, 1, length(props) - 1)"),
        )
        .otherwise(F.col("props"))
        .alias("props"),
    )
    parsed = e.select(
        "event_type",
        "props",
        F.from_json(
            "props",
            "k BIGINT, _corrupt STRING",
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ).alias("j"),
    )
    # NULL or empty-string props quarantine rather than silently count
    # valid: from_json yields a NULL STRUCT for both (so j._corrupt is
    # unreachable and would read as "parsed fine"); requiring the
    # struct itself non-null closes that hole, and the oracle's
    # json_valid gate falls to the corrupt branch the same way.
    #
    # The ltrim-'{' gate pins the top-level-OBJECT contract on the
    # Spark side too: from_json with a struct schema has historically
    # parsed a root ARRAY of objects by taking the FIRST element
    # ('[{"k":1}]' → k=1, _corrupt null; Spark 4.1.2 quarantines it,
    # earlier lines coerced) while the oracle's json_type(jp)='OBJECT'
    # quarantines every non-object root — the explicit gate makes
    # array-roots-are-corrupt version-independent on BOTH engines
    # (ADVICE r7; HOSTILE_PROPS pins '[{"k": 1}]' and
    # whitespace-prefixed objects, which both parsers accept, hence a
    # strip not a raw prefix test). The strip must cover all four JSON
    # whitespace chars (space/tab/CR/LF — RFC 8259 §2): Spark's ltrim
    # strips only U+0020, so '\t{"k":1}' — valid to from_json AND to
    # the oracle's json_valid — would be miscounted corrupt (ADVICE
    # r8). regexp_replace of ^[ \t\r\n]+ matches both parsers' rule.
    ok = (
        F.col("props").isNotNull()
        & F.regexp_replace(F.col("props"), "^[ \t\r\n]+", "").startswith("{")
        & F.col("j").isNotNull()
        & F.col("j._corrupt").isNull()
    )
    return parsed.groupBy("event_type").agg(
        F.sum(F.when(ok, 1).otherwise(0)).alias("n_valid"),
        F.sum(F.when(~ok, 1).otherwise(0)).alias("n_corrupt"),
        F.sum(F.when(ok, F.col("j.k")).otherwise(0)).alias("sum_k"),
    )


@register(
    "events_value_percentiles",
    oracle="""
    WITH r AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value ASC, event_id ASC) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events WHERE value IS NOT NULL
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n,
           MAX(CASE WHEN rn = (n + 1) // 2 THEN value END) AS p50,
           MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN value END) AS p90,
           MAX(CASE WHEN rn = (99 * n + 99) // 100 THEN value END) AS p99
    FROM r
    GROUP BY event_type
    """,
    tags=("events", "aggregate", "percentile"),
)
def events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group percentiles (percentile_disc semantics: the
    value at rank ceil(p·n), computed as INTEGER index arithmetic —
    (p·n ceil'd) as (k·n + k)//m — so no float-ceil edge case can
    diverge between engines; the (value, event_id) tiebreak makes the
    rank total). One shuffle on event_type; each group sorts within
    its partition. Groups here are few and bounded — for
    high-cardinality keys at 100 TB use approx_percentile sketches
    (see approx_median_price_rank_bound) or the distributed-NTILE
    machinery.

    NULL values are excluded up front — SQL percentile semantics — and
    necessarily so for parity: Spark's ASC window ordering puts NULLs
    FIRST where DuckDB puts them LAST, so a NULL that merely entered
    the ordering would shift every rank differently in each engine.
    NaN and ±Infinity stay: both engines order NaN greatest.
    """
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy(
        F.asc("value"), F.asc("event_id")
    )
    wn = Window.partitionBy("event_type")
    r = e.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    n = F.col("n")

    def pick(idx):
        return F.max(F.when(F.col("rn") == idx, F.col("value")))

    return r.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        pick(F.floor((n + F.lit(1)) / 2)).alias("p50"),
        pick(F.floor((F.lit(9) * n + F.lit(9)) / 10)).alias("p90"),
        pick(F.floor((F.lit(99) * n + F.lit(99)) / 100)).alias("p99"),
    )


@register(
    "events_funnel_3step",
    oracle="""
    WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
    c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
    p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
    vc AS (
      SELECT DISTINCT v.user_id
      FROM v JOIN c ON c.user_id = v.user_id
       AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 6 HOUR
    ),
    vc_ts AS (
      SELECT DISTINCT v.user_id, c.ts AS c_ts
      FROM v JOIN c ON c.user_id = v.user_id
       AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 6 HOUR
    ),
    vcp AS (
      SELECT DISTINCT vc_ts.user_id
      FROM vc_ts
      JOIN p ON p.user_id = vc_ts.user_id
       AND p.ts > vc_ts.c_ts AND p.ts <= vc_ts.c_ts + INTERVAL 6 HOUR
    )
    SELECT (SELECT COUNT(DISTINCT user_id) FROM v) AS n_view_users,
           (SELECT COUNT(*) FROM vc) AS n_view_click_users,
           (SELECT COUNT(*) FROM vcp) AS n_funnel_users
    """,
    tags=("events", "funnel", "join"),
)
def events_funnel_3step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-step temporal funnel: users who view, then click within
    six hours of the view, then purchase within six hours of that
    click (six hours discriminates on this corpus: 150 → 118 → 18) — the
    staged self-join every product-analytics stack runs. Each stage is
    an equi-join on user_id with the time bounds as residual
    predicates (SortMergeJoin on user — never a nested loop; the range
    condition filters within matched user groups), and each stage is
    deduplicated before the next: the view⋈click output collapses to
    distinct (user, click_ts) — the only columns the purchase stage
    reads — so the view-side fan-out cannot multiply into the purchase
    join (existence semantics are preserved because the purchase
    predicate depends only on user and click time). Single-row output,
    three counts.
    """
    e = load_table(spark, sf_dir, "events")

    def typed(t: str, prefix: str) -> DataFrame:
        return e.filter(F.col("event_type") == t).select(
            F.col("user_id").alias(f"{prefix}_user"),
            F.col("ts").alias(f"{prefix}_ts"),
        )

    v, c, p = typed("view", "v"), typed("click", "c"), typed("purchase", "p")
    hour = F.expr("INTERVAL 6 HOUR")
    vc_pairs = v.join(
        c,
        (F.col("c_user") == F.col("v_user"))
        & (F.col("c_ts") > F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + hour),
    )
    vc_users = vc_pairs.select(F.col("v_user").alias("user_id")).distinct()
    # Collapse the view×click fan-out to the columns the purchase
    # stage actually conditions on before joining it.
    vc_ts = vc_pairs.select("v_user", "c_ts").distinct()
    vcp_users = (
        vc_ts.join(
            p,
            (F.col("p_user") == F.col("v_user"))
            & (F.col("p_ts") > F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + hour),
        )
        .select(F.col("v_user").alias("user_id"))
        .distinct()
    )
    n_v = v.agg(F.count_distinct("v_user").alias("n_view_users"))
    n_vc = vc_users.agg(F.count(F.lit(1)).alias("n_view_click_users"))
    n_vcp = vcp_users.agg(F.count(F.lit(1)).alias("n_funnel_users"))
    return n_v.crossJoin(F.broadcast(n_vc)).crossJoin(F.broadcast(n_vcp))


@register(
    "events_variant_props",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM({_json_typed_int_sql("props", "$.k")}) AS BIGINT) AS sum_k,
           CAST(MIN({_json_typed_int_sql("props", "$.k")}) AS BIGINT) AS min_k
    FROM events
    GROUP BY event_type
    """,
    tags=("events", "json", "variant"),
)
def events_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props through Spark 4's VARIANT type:
    parse_json() once into the binary-encoded VARIANT, then typed
    variant_get extractions — the modern replacement for repeated
    get_json_object string re-parses (one parse per row, typed access,
    shreddable into columnar storage at rest). Same aggregation as the
    get_json_object twin (events_json_props) so the two paths are
    mutually checking; the oracle speaks DuckDB's JSON equivalent.
    """
    e = load_table(spark, sf_dir, "events")
    # try_parse_json / try_variant_get: malformed props or a non-long
    # `k` must NULL out, never fault the scan (one bad row would
    # otherwise kill the whole 100 TB job; the fixtures are clean but
    # real corpora are not — same class as the adversarial-sweep fixes)
    # the portable int64 contract is TYPE-based: k counts iff the
    # variant value is integer-typed (schema_of_variant == 'BIGINT').
    # Casting would lie cross-engine: try_variant_get(..., 'bigint')
    # TRUNCATES 2.7 where DuckDB TRY_CAST rounds, and float TEXT is
    # normalized differently by each engine (variant: 7.0 → DECIMAL →
    # '7'; DuckDB: 1e2 → '100.0') — only the integer/float/string TYPE
    # survives both parsers intact (oracle: _json_typed_int_sql).
    v = e.select(
        "event_type", F.try_parse_json("props").alias("vprops")
    ).select(
        "event_type",
        F.expr(
            "CASE WHEN schema_of_variant("
            "  try_variant_get(vprops, '$.k', 'variant')) = 'BIGINT'"
            " THEN try_variant_get(vprops, '$.k', 'long') END"
        ).alias("k"),
    )
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
    )


#: Equi-width histogram parameters for events.value.
HIST_LO = 0.0
HIST_W = 50.0
HIST_NB = 10


@register(
    "events_value_histogram",
    oracle=f"""
    SELECT least(greatest(CAST(floor((value - {HIST_LO}) / {HIST_W}) AS BIGINT),
                          0), {HIST_NB - 1}) AS bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1
    """,
    tags=("events", "histogram", "aggregate"),
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of event values: bucket index is a pure
    column expression (floor of a scaled difference, clamped to the
    band count), so the whole histogram is one map-side-combinable
    aggregation over at most HIST_NB groups — the cheapest possible
    distribution profile at any scale, and the standard first look at
    a numeric column before picking sketch parameters.

    Bucket arithmetic is floor((v - lo)/w) with IEEE doubles — the same
    correctly-rounded op sequence in every engine — and the value sum
    is exact decimal cents cast to double at the end (the library's
    standard money discipline).
    """
    e = load_table(spark, sf_dir, "events")
    bucket = F.least(
        F.greatest(
            F.floor((F.col("value") - F.lit(HIST_LO)) / F.lit(HIST_W)).cast("long"),
            F.lit(0).cast("long"),
        ),
        F.lit(HIST_NB - 1).cast("long"),
    )
    return (
        e.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(money("value"), "sum_value"),
        )
    )


@register(
    "events_value_outliers",
    oracle="""
    WITH r AS (
      SELECT event_id, event_type,
             CAST(ROUND(value * 100) AS BIGINT) AS x
      FROM events
    ),
    s AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS sxx
      FROM r GROUP BY event_type
    )
    SELECT r.event_id, r.event_type,
           (CAST(r.x AS DOUBLE) / 100.0) AS value
    FROM r JOIN s ON r.event_type = s.event_type
    WHERE (CAST(s.n AS DECIMAL(38,0)) * r.x - s.sx)
          * (CAST(s.n AS DECIMAL(38,0)) * r.x - s.sx)
          > 9 * (CAST(s.n AS DECIMAL(38,0)) * s.sxx
                 - CAST(s.sx AS DECIMAL(38,0)) * s.sx)
    """,
    tags=("events", "statistics", "outliers"),
)
def events_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type 3-sigma outliers with ZERO floating point in the
    decision: |x − mean| > 3σ_pop rearranged to the integer inequality
    (n·x − Σx)² > 9·(n·Σx² − (Σx)²) over exact cent values — the
    comparison no pair of engines can disagree on (the reported value
    is reconstructed from cents, also exact).

    Plan shape: one tiny per-type moment aggregate (map-side
    combinable), broadcast back, then a scan-level predicate — the
    corpus-never-shuffles profile, same as the mixture resampler.
    """
    e = load_table(spark, sf_dir, "events")
    r = e.select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("x"),
    )
    s = r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).cast("decimal(38,0)").alias("sxx"),
    )
    j = r.join(F.broadcast(s), "event_type")
    # every product gets a decimal(38,0) operand BEFORE multiplying:
    # n·x and n·Σx² overflow int64 at ~100 TB row counts, and Spark
    # (non-ANSI) would wrap silently while DuckDB raises — the one way
    # the "engines cannot disagree" claim could break
    n_dec = F.col("n").cast("decimal(38,0)")
    sx_dec = F.col("sx").cast("decimal(38,0)")
    dev = n_dec * F.col("x") - F.col("sx")
    disc = 9 * (n_dec * F.col("sxx") - sx_dec * F.col("sx"))
    return j.filter(dev * dev > disc).select(
        "event_id", "event_type", (F.col("x").cast("double") / 100.0).alias("value")
    )


@register(
    "events_dq_expectations",
    oracle="""
    WITH m AS (
      SELECT COUNT(*) AS n_rows,
             CAST(SUM(CASE WHEN event_id IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT) AS v_id_null,
             CAST(SUM(CASE WHEN value >= 0.0 AND value <= 1000.0 THEN 0 ELSE 1 END) AS BIGINT) AS v_value_rng,
             CAST(SUM(CASE WHEN event_type IN ('view','click','purchase','signup','error')
                           THEN 0 ELSE 1 END) AS BIGINT) AS v_type_set,
             CAST(SUM(CASE WHEN user_id >= 0 THEN 0 ELSE 1 END) AS BIGINT) AS v_user_neg,
             CAST(COUNT(DISTINCT event_id) AS BIGINT) AS d_id
      FROM events
    )
    SELECT u.rule, u.n_rows, u.n_violations, (u.n_violations = 0) AS passed
    FROM m, LATERAL (VALUES
      ('event_id_not_null', m.n_rows, m.v_id_null),
      ('value_between',     m.n_rows, m.v_value_rng),
      ('event_type_in_set', m.n_rows, m.v_type_set),
      ('user_id_between',   m.n_rows, m.v_user_neg),
      ('event_id_unique',   m.n_rows, m.n_rows - m.d_id)
    ) AS u(rule, n_rows, n_violations)
    """,
    tags=("events", "data-quality"),
)
def events_dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Publish-gate data validation: five declarative expectations over
    the events table evaluated in ONE scan (conditional counts fused
    into a single multi-aggregate; uniqueness adds the one genuine
    COUNT DISTINCT), unpivoted into a (rule, n_rows, n_violations,
    passed) report. The production pattern: run this before a table is
    promoted, quarantine or abort on any failed row.
    """
    from hailstorm_spark.operators.quality import Expectation, check_expectations

    e = load_table(spark, sf_dir, "events")
    rules = [
        Expectation("event_id_not_null", F.col("event_id").isNotNull()),
        Expectation(
            "value_between", (F.col("value") >= 0.0) & (F.col("value") <= 1000.0)
        ),
        Expectation(
            "event_type_in_set",
            F.col("event_type").isin(["view", "click", "purchase", "signup", "error"]),
        ),
        Expectation("user_id_between", F.col("user_id") >= 0),
    ]
    return check_expectations(e, rules, unique_cols=["event_id"])


@register(
    "events_dq_quarantine",
    oracle="""
    SELECT event_id,
           CAST(NOT (value >= 0.0 AND value <= 400.0) AS BOOLEAN) AS bad_value,
           CAST(event_type = 'error' AS BOOLEAN) AS bad_type
    FROM events
    WHERE NOT (value >= 0.0 AND value <= 400.0) OR event_type = 'error'
    """,
    tags=("events", "data-quality", "quarantine"),
)
def events_dq_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The row-level side of the DQ gate: rows violating ANY
    expectation route to quarantine (dead-letter) with per-rule flags,
    instead of poisoning the published table. Pure scan-level
    predicates — the split costs one pass, and the flags tell the
    triage which rule fired without re-checking.

    Thresholds here are fixture-tuned so both rules actually catch
    rows (the parity sweep's vacuity guard rejects empty checks).
    """
    e = load_table(spark, sf_dir, "events")
    bad_value = ~((F.col("value") >= 0.0) & (F.col("value") <= 400.0))
    bad_type = F.col("event_type") == "error"
    return e.filter(bad_value | bad_type).select(
        "event_id",
        bad_value.alias("bad_value"),
        bad_type.alias("bad_type"),
    )


@register(
    "events_cohort_retention",
    oracle="""
    WITH wk AS (
      SELECT user_id,
             CAST(epoch_us(ts) // (7::BIGINT * 86400 * 1000000) AS BIGINT) AS week
      FROM events
      GROUP BY 1, 2
    ),
    cohort AS (SELECT user_id, MIN(week) AS cohort_week FROM wk GROUP BY user_id),
    sizes AS (SELECT cohort_week, COUNT(*) AS cohort_size FROM cohort GROUP BY 1),
    act AS (
      SELECT c.cohort_week, w.week - c.cohort_week AS week_offset,
             COUNT(DISTINCT w.user_id) AS n_active
      FROM wk w JOIN cohort c ON c.user_id = w.user_id
      GROUP BY 1, 2
    )
    SELECT a.cohort_week, a.week_offset, a.n_active, s.cohort_size,
           (CAST(a.n_active AS DOUBLE) / s.cohort_size) AS retention
    FROM act a JOIN sizes s ON s.cohort_week = a.cohort_week
    """,
    tags=("events", "analytics", "cohort"),
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity week, then the
    fraction still active k weeks later — the canonical product-
    analytics table.

    Plan shape: one (user, week) dedup shuffle, a per-user MIN (reuses
    the user partitioning), a broadcast of the per-cohort sizes, and one
    (cohort, offset) distinct-count aggregation. Weeks are integer
    epoch-week indices (epoch µs // week-µs) so bucketing is exact in
    any engine; the retention ratio is the only double and divides the
    same two integers on both sides.
    """
    e = load_table(spark, sf_dir, "events")
    wk = (
        e.select(
            "user_id",
            F.expr("unix_micros(ts) div 604800000000").alias("week"),
        )
        .distinct()
    )
    cohort = wk.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    sizes = cohort.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("cohort_size"))
    act = (
        wk.join(cohort, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count_distinct("user_id").alias("n_active"))
    )
    return act.join(F.broadcast(sizes), "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_active",
        "cohort_size",
        (F.col("n_active").cast("double") / F.col("cohort_size")).alias("retention"),
    )


@register(
    "events_scd2_type_history",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
             LAG(event_type) OVER w AS prev_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ),
    flagged AS (
      SELECT user_id, event_type, ts_us,
             SUM(CASE WHEN prev_type IS NULL OR prev_type <> event_type
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC
                     ROWS UNBOUNDED PRECEDING) AS run_id
      FROM o
    ),
    runs AS (
      SELECT user_id, run_id, MIN(event_type) AS event_type,
             MIN(ts_us) AS valid_from_us,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM flagged GROUP BY user_id, run_id
    )
    SELECT user_id, event_type, valid_from_us,
           LEAD(valid_from_us)
             OVER (PARTITION BY user_id ORDER BY run_id) AS valid_to_us,
           n_events
    FROM runs
    """,
    tags=("events", "scd", "temporal", "window"),
)
def events_scd2_type_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history build: compress each user's event stream into
    validity intervals [valid_from, valid_to) over runs of the SAME
    event_type — the dimension-table historization every warehouse
    pipeline runs, expressed as the classic gaps-and-islands two-window
    chain (change flag via lag → run id via running sum → one interval
    per run, closed by the NEXT run's start; the current run stays
    open with NULL valid_to).

    Time arithmetic is integer microseconds, ordering is total
    ((ts, event_id)), so the runs — and therefore the intervals — are
    identical in any engine.

    Plan shape: ONE shuffle on user_id that all three windows and the
    per-run aggregation reuse (they share the partitioning key); the
    per-run frame is orders of magnitude smaller than the input after
    the groupBy. No joins.
    """
    e = load_table(spark, sf_dir, "events").withColumn("ts_us", F.unix_micros("ts"))
    w = Window.partitionBy("user_id").orderBy(F.asc("ts_us"), F.asc("event_id"))
    chg = F.when(
        F.lag("event_type").over(w).isNull()
        | (F.lag("event_type").over(w) != F.col("event_type")),
        F.lit(1),
    ).otherwise(F.lit(0))
    flagged = e.select(
        "user_id",
        "event_type",
        "ts_us",
        F.sum(chg).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("run_id"),
    )
    runs = flagged.groupBy("user_id", "run_id").agg(
        F.min("event_type").alias("event_type"),
        F.min("ts_us").alias("valid_from_us"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w_runs = Window.partitionBy("user_id").orderBy("run_id")
    return runs.select(
        "user_id",
        "event_type",
        "valid_from_us",
        F.lead("valid_from_us").over(w_runs).alias("valid_to_us"),
        "n_events",
    )


@register(
    "events_session_path_trigrams",
    oracle=f"""
    WITH o AS (
      SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
             LAG(epoch_us(ts)) OVER w AS prev_ts_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ),
    sess AS (
      SELECT user_id, event_type, ts_us, event_id,
             SUM(CASE WHEN prev_ts_us IS NULL
                       OR ts_us - prev_ts_us > {SESSION_GAP_MIN} * 60 * 1000000
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC
                     ROWS UNBOUNDED PRECEDING) AS session_id
      FROM o
    ),
    tri AS (
      SELECT event_type || '>' ||
             LEAD(event_type, 1) OVER ws || '>' ||
             LEAD(event_type, 2) OVER ws AS path,
             LEAD(event_type, 2) OVER ws AS t3
      FROM sess
      WINDOW ws AS (PARTITION BY user_id, session_id
                    ORDER BY ts_us ASC, event_id ASC)
    )
    SELECT path, COUNT(*) AS n
    FROM tri WHERE t3 IS NOT NULL
    GROUP BY path
    ORDER BY n DESC, path ASC
    LIMIT 20
    """,
    tags=("events", "analytics", "path", "topk"),
)
def events_session_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top behavioral paths: the 20 most frequent event-type TRIGRAMS
    within a session (same 30-min gap rule as events_sessionize) — the
    markov-path / clickstream-analysis staple that answers "what do
    users do next".

    Plan shape: one user_id shuffle shared by the sessionization lag
    and the run sum; the trigram leads run inside (user, session)
    partitions of the SAME exchange (Spark collapses the two window
    specs over one sort); then a path-keyed partial count and a
    TakeOrderedAndProject for the top 20 — never a global sort of all
    paths.
    """
    e = load_table(spark, sf_dir, "events").withColumn("ts_us", F.unix_micros("ts"))
    w = Window.partitionBy("user_id").orderBy(F.asc("ts_us"), F.asc("event_id"))
    new_sess = F.when(
        F.lag("ts_us").over(w).isNull()
        | (F.col("ts_us") - F.lag("ts_us").over(w) > SESSION_GAP_MIN * 60 * 1_000_000),
        F.lit(1),
    ).otherwise(F.lit(0))
    sess = e.select(
        "user_id",
        "event_type",
        "ts_us",
        "event_id",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("session_id"),
    )
    ws = Window.partitionBy("user_id", "session_id").orderBy(
        F.asc("ts_us"), F.asc("event_id")
    )
    tri = sess.select(
        F.concat_ws(
            ">",
            "event_type",
            F.lead("event_type", 1).over(ws),
            F.lead("event_type", 2).over(ws),
        ).alias("path"),
        F.lead("event_type", 2).over(ws).alias("t3"),
    ).filter(F.col("t3").isNotNull())
    return (
        tri.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(20)
    )


@register(
    "events_variant_typed_extraction",
    oracle=f"""
    SELECT event_type,
           CAST(SUM({_json_typed_int_sql("props", "$.k")}) AS BIGINT) AS sum_k,
           CAST(SUM(CASE WHEN {_json_typed_int_sql("props", "$.missing")}
                    IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing_null,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM events
    GROUP BY event_type
    """,
    tags=("events", "json", "variant"),
)
def events_variant_typed_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type:
    parse_json once into the binary variant encoding, then typed path
    extraction with variant_get — the modern replacement for
    string-re-parsing get_json_object (events_json_props documents that
    trade) and for rigid from_json schemas (events_json_corrupt_accounting):
    VARIANT keeps the full document queryable (schema evolution — new
    keys need no reload) while storing a parsed binary form that makes
    repeated path access O(path), not O(re-parse).

    At 100 TB the parse happens once at ingest and the shredded binary
    column travels in parquet; every downstream extraction is JVM-side.
    Missing paths: try-semantics return NULL (counted here as a typed
    column, 3VL-correct on both engines). The oracle reads the same
    paths with DuckDB's JSON extraction.
    """
    e = load_table(spark, sf_dir, "events")
    # try_parse_json: one malformed props row must NOT fault the scan
    # (strict parse_json throws from inside the variant builder) — the
    # try form NULLs the variant and every downstream try_variant_get
    # yields NULL, the same dead-letter semantics as the oracle's
    # json_valid gate.
    v = e.select("event_type", F.try_parse_json("props").alias("pv"))
    # type-gated int64 contract, same as events_variant_props: k
    # counts iff the variant value is integer-typed (casting would
    # truncate floats where the oracle rounds them).
    def typed_long(path):
        return F.expr(
            f"CASE WHEN schema_of_variant("
            f"  try_variant_get(pv, '{path}', 'variant')) = 'BIGINT'"
            f" THEN try_variant_get(pv, '{path}', 'long') END"
        )

    k = typed_long("$.k")
    missing = typed_long("$.missing")
    return v.groupBy("event_type").agg(
        F.sum(k).cast("long").alias("sum_k"),
        F.sum(F.when(missing.isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_missing_null"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )


#: Decay horizon in days: weight halves per day of age, zero past the
#: horizon. 2^14 fits comfortably: max |term| = 49_102 cents << 2^14
#: ~ 8*10^8, and even 10^9 such terms stay inside int64.
DECAY_HORIZON_DAYS = 14


@register(
    "events_decayed_engagement",
    oracle=f"""
    WITH a AS (SELECT MAX(CAST(ts AS DATE)) AS anchor FROM events),
    s AS (
      SELECT user_id,
             CAST(ROUND(value * 100) AS BIGINT)
               * CAST((1 << ({DECAY_HORIZON_DAYS}
                              - datediff('day', CAST(ts AS DATE), anchor)))
                      AS BIGINT) AS term
      FROM events, a
      WHERE datediff('day', CAST(ts AS DATE), anchor)
              <= {DECAY_HORIZON_DAYS}
    )
    SELECT user_id,
           CAST(SUM(term) AS BIGINT) AS decayed_score,
           CAST(COUNT(*) AS BIGINT) AS n_recent
    FROM s GROUP BY user_id
    """,
    tags=("events", "feature", "decay"),
)
def events_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially time-decayed engagement score — the
    standard recency-weighted feature for ranking, retention models,
    and training-data freshness weighting. The decay is a power of two
    per day of age (weight = 2^(H - age), zero past the H-day horizon),
    so the whole computation is INTEGER: value quantized to cents via
    the engine-portable ROUND(x*100) convention (same as
    events_value_outliers), the weight an int shift, the score an int64
    sum — no libm exp(), whose last-ulp behavior differs across engines,
    anywhere near the hash-compared result.

    The anchor date is the corpus max (one O(n) pass → 1-row broadcast,
    the scalar-subquery pattern the lint allowlists); everything else is
    a scan-level map plus ONE aggregation shuffle on user_id. At 100 TB
    the age filter is a partition-pruning predicate when events are
    date-partitioned — the scan reads only the horizon's days.

    Reference parity: the reference's per-key running aggregation stops
    at plain sums (reference src/Hailstorm/TransformBolt.hs); the decay
    weighting extends it along public feature-engineering practice.
    """
    ev = load_table(spark, sf_dir, "events")
    anchor = ev.agg(F.max(F.col("ts").cast("date")).alias("anchor"))
    return (
        ev.crossJoin(F.broadcast(anchor))
        .withColumn("age", F.datediff(F.col("anchor"), F.col("ts").cast("date")))
        .filter(F.col("age") <= DECAY_HORIZON_DAYS)
        .select(
            "user_id",
            (
                F.round(F.col("value") * 100).cast("long")
                * F.expr(
                    f"cast(shiftleft(1, {DECAY_HORIZON_DAYS} - age) as bigint)"
                )
            ).alias("term"),
        )
        .groupBy("user_id")
        .agg(
            F.sum("term").cast("long").alias("decayed_score"),
            F.count(F.lit(1)).cast("long").alias("n_recent"),
        )
    )


@register(
    "events_type_cooccurrence_lift",
    oracle="""
    WITH u AS (SELECT DISTINCT user_id, event_type FROM events),
    tot AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM u),
    s AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_t
      FROM u GROUP BY event_type
    ),
    p AS (
      SELECT a.event_type AS ta, b.event_type AS tb,
             CAST(COUNT(*) AS BIGINT) AS n_ab
      FROM u a JOIN u b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT ta, tb, n_ab,
           CAST((n_ab * n_users * 10000) // (sa.n_t * sb.n_t) AS BIGINT)
             AS lift_x10000
    FROM p
    CROSS JOIN tot
    JOIN s sa ON sa.event_type = p.ta
    JOIN s sb ON sb.event_type = p.tb
    """,
    tags=("events", "basket", "association"),
)
def events_type_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence with lift — the association-rule
    primitive (Agrawal & Srikant's Apriori support counting, pair
    stage) over (user, event_type) baskets: which behaviors co-occur in
    the same user beyond what their marginals predict.

    lift = P(a,b) / (P(a)·P(b)) is computed as the INTEGER
    (n_ab · n_users · 10^4) div (n_a · n_b) so the engines cannot
    disagree in a float last-ulp; positive operands make truncating
    division identical in Spark/DuckDB. Overflow bound: the triple
    product is ≤ n_users² · 10^4 — fine through ~10^7 users; beyond
    that drop the scale a decade (documented, same rule as PageRank's
    SCALE).

    Shape: dedup shuffle on (user, type), then a self-equi-join on
    user_id whose fan-out is the per-user distinct-type count (≤ the
    type-vocabulary size, bounded — never corpus²), then a pair
    aggregation. The marginals and the 1-row user total are broadcast.
    This is exactly how co-occurrence runs at catalog scale: the only
    large shuffles key on user_id.
    """
    ev = load_table(spark, sf_dir, "events")
    u = ev.select("user_id", "event_type").distinct()
    tot = u.agg(F.count_distinct("user_id").cast("long").alias("n_users"))
    singles = u.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_t")
    )
    a = u.alias("a")
    b = u.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("ta"), F.col("b.event_type").alias("tb")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
    )
    sa = singles.select(F.col("event_type").alias("ta"), F.col("n_t").alias("na"))
    sb = singles.select(F.col("event_type").alias("tb"), F.col("n_t").alias("nb"))
    return (
        pairs.join(F.broadcast(sa), "ta")
        .join(F.broadcast(sb), "tb")
        .crossJoin(F.broadcast(tot))
        .select(
            "ta",
            "tb",
            "n_ab",
            F.expr("cast((n_ab * n_users * 10000) div (na * nb) as bigint)").alias(
                "lift_x10000"
            ),
        )
    )


@register(
    "events_gap_fill_locf",
    oracle="""
    WITH e2 AS (
      SELECT user_id, date_trunc('hour', ts) AS hr, ts, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS x
      FROM events
    ),
    obs AS (
      SELECT user_id, hr, x FROM (
        SELECT user_id, hr, x,
               ROW_NUMBER() OVER (PARTITION BY user_id, hr
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM e2
      ) WHERE rn = 1
    ),
    span AS (SELECT user_id, MIN(hr) AS h0, MAX(hr) AS h1 FROM e2 GROUP BY user_id),
    grid AS (
      SELECT user_id, UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr
      FROM span
    ),
    filled AS (
      SELECT g.user_id, o.x,
             LAST_VALUE(o.x IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.hr
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS xf
      FROM grid g
      LEFT JOIN obs o ON o.user_id = g.user_id AND o.hr = g.hr
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_hours,
           CAST(SUM(CASE WHEN x IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
           CAST(SUM(xf) AS BIGINT) AS locf_sum_cents
    FROM filled GROUP BY user_id
    """,
    tags=("events", "timeseries", "gapfill"),
)
def events_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly gap fill with last-observation-carried-forward — the
    time-series regularization every downstream model needs when the
    raw stream is event-driven (sensor state, account balance, feature
    snapshots). Per user: dense hourly grid over [first, last] event
    hour, the hour's state = value of its LATEST event (deterministic:
    row_number over (ts, event_id) DESC — event_id breaks ts ties),
    missing hours inherit the previous state via an IGNORE NULLS
    last_value frame. The summary (hours, filled-hour count, LOCF sum
    in cents) hash-checks every carried value without shipping the
    dense series out of the engines.

    Shape: one (user, hour) dedup shuffle, a map-side sequence()
    explode for the grid (no join against a generated calendar table),
    one LEFT equi-join, one user-partitioned ordered window. The grid
    never exceeds span-hours × users and the first grid hour is always
    observed, so the LOCF column is never NULL. At 100 TB the window
    partitions by user (and chunks by month if spans grow unbounded) —
    no global sort anywhere. Complements events_gap_fill_hourly, which
    zero-fills COUNTS; this fills STATE.
    """
    ev = load_table(spark, sf_dir, "events")
    e2 = ev.select(
        "user_id",
        F.date_trunc("hour", "ts").alias("hr"),
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("x"),
    )
    w_latest = Window.partitionBy("user_id", "hr").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    obs = (
        e2.withColumn("rn", F.row_number().over(w_latest))
        .filter(F.col("rn") == 1)
        .select("user_id", "hr", "x")
    )
    span = e2.groupBy("user_id").agg(F.min("hr").alias("h0"), F.max("hr").alias("h1"))
    grid = span.select(
        "user_id",
        F.explode(F.sequence("h0", "h1", F.expr("interval 1 hour"))).alias("hr"),
    )
    w_locf = (
        Window.partitionBy("user_id")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = grid.join(obs, ["user_id", "hr"], "left").withColumn(
        "xf", F.last("x", ignorenulls=True).over(w_locf)
    )
    return filled.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_hours"),
        F.sum(F.when(F.col("x").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_filled"),
        F.sum("xf").cast("long").alias("locf_sum_cents"),
    )


@register(
    "events_pattern_consecutive_funnel",
    oracle="""
    WITH o AS (
      SELECT user_id, event_id, event_type,
             LAG(event_type, 1) OVER w AS prev1,
             LAG(event_type, 2) OVER w AS prev2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    m AS (
      SELECT user_id, event_id FROM o
      WHERE event_type = 'purchase' AND prev1 = 'click' AND prev2 = 'view'
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_matches,
           MIN(event_id) AS first_match_event_id
    FROM m GROUP BY user_id
    """,
    tags=("events", "pattern", "window"),
)
def events_pattern_consecutive_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern matching over the per-user event stream —
    the MATCH_RECOGNIZE shape (pattern: view, click, purchase as three
    STRICTLY CONSECUTIVE events, nothing in between) expressed with lag
    windows, the standard Spark encoding since it lacks the clause.
    Complements events_funnel_3step, which allows gaps and bounds time:
    consecutive-match is the stricter "clean conversion path" signal
    and the building block for n-gram behavioral features.

    One user-partitioned ordered window (ties broken by event_id for a
    total order), then a scan-level predicate and a user aggregation —
    a single shuffle on user_id end to end. Per-user streams are
    bounded, so the window never sees a skewed partition at 100 TB.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.lag("event_type", 1).over(w).alias("prev1"),
        F.lag("event_type", 2).over(w).alias("prev2"),
    )
    m = o.filter(
        (F.col("event_type") == "purchase")
        & (F.col("prev1") == "click")
        & (F.col("prev2") == "view")
    )
    return m.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_matches"),
        F.min("event_id").alias("first_match_event_id"),
    )


def _median_hist_sql(src: str, val: str) -> str:
    """Lower median per event_type from a (event_type, value) relation,
    by histogram + running count — no per-group row sort: the window
    runs over DISTINCT values only."""
    return f"""
      SELECT event_type, MIN({val}) AS med FROM (
        SELECT event_type, {val},
               SUM(c) OVER (PARTITION BY event_type ORDER BY {val}) AS cum,
               SUM(c) OVER (PARTITION BY event_type) AS n
        FROM (SELECT event_type, {val}, COUNT(*) AS c FROM {src} GROUP BY 1, 2)
      ) WHERE cum >= (n + 1) // 2 GROUP BY event_type
    """


@register(
    "events_mad_robust_outliers",
    oracle=f"""
    WITH q AS (
      SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS x FROM events
    ),
    med AS ({_median_hist_sql('q', 'x')}),
    d AS (
      SELECT q.event_type, ABS(q.x - m.med) AS dev, m.med
      FROM q JOIN med m USING (event_type)
    ),
    mad AS ({_median_hist_sql('(SELECT event_type, dev AS x FROM d)', 'x')})
    SELECT d.event_type,
           MIN(d.med) AS med_cents,
           MIN(mad.med) AS mad_cents,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN d.dev > 5 * mad.med THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers
    FROM d JOIN mad ON mad.event_type = d.event_type
    GROUP BY d.event_type
    """,
    tags=("events", "robust-stats", "outlier"),
)
def events_mad_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via median/MAD (the Hampel identifier
    with an integer 5×MAD fence) — the heavy-tail-safe alternative to
    the mean/stddev z-score in events_value_outliers, which a single
    corrupted value can recenter. Values quantize to cents (the
    portable ROUND(x*100) convention) so every statistic is integer
    and the engines cannot drift.

    Exact per-group medians WITHOUT a per-group row sort: aggregate a
    (type, value) histogram, then take the running count over the
    DISTINCT values only — the window input is bounded by the value
    cardinality (≤ ~50k cents values), not the row count, no matter
    how many trillion events each type has. Same two-phase idea as
    operators/selection.py, but expressed fully relationally so the
    oracle replays it verbatim (lower median: smallest value whose
    cumulative count reaches (n+1) div 2). Two histogram shuffles, two
    tiny broadcast joins of the per-type fences, one final aggregation.
    """
    ev = load_table(spark, sf_dir, "events")
    q = ev.select("event_type", F.round(F.col("value") * 100).cast("long").alias("x"))

    def median_hist(src: DataFrame, val: str) -> DataFrame:
        h = src.groupBy("event_type", val).agg(F.count(F.lit(1)).alias("c"))
        w_cum = Window.partitionBy("event_type").orderBy(val)
        w_all = Window.partitionBy("event_type")
        c = h.select(
            "event_type",
            val,
            F.sum("c").over(w_cum).alias("cum"),
            F.sum("c").over(w_all).alias("n"),
        )
        return (
            c.filter(F.col("cum") >= F.expr("(n + 1) div 2"))
            .groupBy("event_type")
            .agg(F.min(val).alias("med"))
        )

    med = median_hist(q, "x")
    d = q.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("x") - F.col("med")).alias("dev"), "med"
    )
    mad = median_hist(d.select("event_type", F.col("dev").alias("x")), "x").select(
        "event_type", F.col("med").alias("mad")
    )
    return (
        d.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.min("med").alias("med_cents"),
            F.min("mad").alias("mad_cents"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.when(F.col("dev") > 5 * F.col("mad"), 1).otherwise(0))
            .cast("long")
            .alias("n_outliers"),
        )
    )


@register(
    "stats_ks_drift_click_vs_purchase",
    oracle="""
    WITH q AS (
      SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS x
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    h AS (
      SELECT x,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS c2
      FROM q GROUP BY x
    ),
    c AS (
      SELECT x,
             CAST(SUM(c1) OVER (ORDER BY x) AS BIGINT) AS cum1,
             CAST(SUM(c2) OVER (ORDER BY x) AS BIGINT) AS cum2,
             CAST(SUM(c1) OVER () AS BIGINT) AS n1,
             CAST(SUM(c2) OVER () AS BIGINT) AS n2
      FROM h
    ),
    d AS (SELECT x, ABS(cum1 * n2 - cum2 * n1) AS gap, n1, n2 FROM c)
    SELECT MIN(n1) AS n1, MIN(n2) AS n2,
           CAST(MAX(gap) AS BIGINT) AS ks_num,
           MIN(CASE WHEN gap = (SELECT MAX(gap) FROM d) THEN x END) AS ks_at_x
    FROM d
    """,
    tags=("stats", "drift", "ks"),
)
def stats_ks_drift_click_vs_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift statistic between the click
    and purchase value distributions — THE distribution-shift test a
    training pipeline runs between data snapshots, sources, or time
    windows before trusting new data. Exactly and engine-portably:
    D = max|F1 − F2| is computed as the INTEGER max|cum1·n2 − cum2·n1|
    (common denominator n1·n2 — report the numerator, never the float
    quotient), with the argmax value as witness (min x on ties).

    Shape: one scan → one histogram shuffle on the VALUE (distinct
    cents), then running sums over the histogram — the window input is
    bounded by value cardinality (≤ ~50k rows), not event count, the
    same bounded-window discipline as events_mad_robust_outliers. The
    integer products stay under n1·n2 ≤ 10^14 per pair of billion-row
    samples — far inside int64.
    """
    ev = load_table(spark, sf_dir, "events")
    q = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("x")
    )
    h = q.groupBy("x").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("c1"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("c2"),
    )
    w_cum = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    c = h.select(
        "x",
        F.sum("c1").over(w_cum).alias("cum1"),
        F.sum("c2").over(w_cum).alias("cum2"),
        F.sum("c1").over(w_all).alias("n1"),
        F.sum("c2").over(w_all).alias("n2"),
    )
    d = c.select(
        "x",
        F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1")).alias("gap"),
        "n1",
        "n2",
    )
    # argmax witness: one aggregation computes both the max gap and the
    # smallest value achieving it — max over (gap, -x) lexicographic
    # struct recovers min-x-at-max-gap without a second pass or join.
    return d.agg(
        F.min("n1").alias("n1"),
        F.min("n2").alias("n2"),
        F.max("gap").cast("long").alias("ks_num"),
        (-F.max(F.struct(F.col("gap"), (-F.col("x")).alias("nx"))).getField("nx"))
        .cast("long")
        .alias("ks_at_x"),
    )


@register(
    "events_rfm_segments",
    oracle="""
    WITH a AS (SELECT MAX(CAST(ts AS DATE)) AS anchor FROM events),
    pu AS (
      SELECT user_id,
             datediff('day', MAX(CAST(ts AS DATE)), anchor) AS rec,
             CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS m
      FROM events, a GROUP BY user_id, anchor
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nu FROM pu),
    r AS (
      SELECT user_id,
             ROW_NUMBER() OVER (ORDER BY rec, user_id) AS rrn,
             ROW_NUMBER() OVER (ORDER BY freq DESC, user_id) AS frn,
             ROW_NUMBER() OVER (ORDER BY m DESC, user_id) AS mrn
      FROM pu
    ),
    s AS (
      SELECT (((rrn - 1) * 4) // nu + 1) * 100
             + (((frn - 1) * 4) // nu + 1) * 10
             + (((mrn - 1) * 4) // nu + 1) AS segment
      FROM r, n
    )
    SELECT CAST(segment AS BIGINT) AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM s GROUP BY segment
    """,
    tags=("events", "analytics", "rfm"),
)
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic recency/frequency/monetary
    customer scoring: each user ranked on all three axes, quartiled,
    and bucketed into one of 64 segments (111 = best across the board).
    Quartiles use the equal-width rank formula ((rank−1)·4) div n + 1
    rather than NTILE so the arithmetic is pure integer and identical
    in both engines regardless of NTILE's remainder-distribution rules.

    The three global ranks come from operators/ranking.py::
    global_row_number — range-bucketed distributed ranking, never a
    single-partition window, so a 10^8-user table ranks in parallel
    (the oracle's ROW_NUMBER is semantically identical; the operator's
    equivalence to the naive window is plan-pinned in its own tests).
    Ties break by user_id on every axis — total order, deterministic
    segments. Two 1-row broadcasts (date anchor, user count); monetary
    is exact cents.
    """
    from hailstorm_spark.operators.ranking import global_row_number

    ev = load_table(spark, sf_dir, "events")
    anchor = ev.agg(F.max(F.col("ts").cast("date")).alias("anchor"))
    pu = (
        ev.groupBy("user_id")
        .agg(
            F.max(F.col("ts").cast("date")).alias("last_d"),
            F.count(F.lit(1)).cast("long").alias("freq"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("m"),
        )
        .crossJoin(F.broadcast(anchor))
        .withColumn("rec", F.datediff("anchor", "last_d"))
        # materialize once: the three ranking passes each run actions
        # (quantile probe + windowed rank) over this aggregate — without
        # truncation the events scan+groupBy would recompute per pass
        .localCheckpoint(eager=True)
    )
    n = pu.agg(F.count(F.lit(1)).cast("long").alias("nu"))
    r = global_row_number(pu, "rec", "user_id", "rrn")
    r = global_row_number(r, "freq", "user_id", "frn", descending=True)
    r = global_row_number(r, "m", "user_id", "mrn", descending=True)
    s = r.crossJoin(F.broadcast(n)).select(
        F.expr(
            "cast(((((rrn - 1) * 4) div nu + 1) * 100"
            " + (((frn - 1) * 4) div nu + 1) * 10"
            " + (((mrn - 1) * 4) div nu + 1)) as bigint)"
        ).alias("segment")
    )
    return s.groupBy("segment").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )


@register(
    "events_markov_transitions",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    ),
    c AS (
      SELECT prev AS from_type, event_type AS to_type,
             CAST(COUNT(*) AS BIGINT) AS n_transitions
      FROM o WHERE prev IS NOT NULL
      GROUP BY 1, 2
    ),
    r AS (
      SELECT from_type, CAST(SUM(n_transitions) AS BIGINT) AS row_total
      FROM c GROUP BY from_type
    )
    SELECT c.from_type, c.to_type, c.n_transitions,
           CAST((c.n_transitions * 10000) // r.row_total AS BIGINT) AS p_x10000
    FROM c JOIN r USING (from_type)
    """,
    tags=("events", "markov", "sequence"),
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams — the behavioral model beneath next-action prediction,
    anomaly scoring ("this transition never happens"), and synthetic
    session generation. Row-normalized transition probabilities are
    integer-scaled ((n·10^4) div row_total, positive operands, so the
    engines cannot drift); the raw counts ship alongside so any other
    normalization can be recovered downstream.

    One user-partitioned ordered window (the same single-shuffle shape
    as the consecutive-pattern query — per-user streams bound the
    partitions), one |types|² aggregation, one broadcast join of the
    row totals. The transition matrix is |types|² rows no matter how
    many events flow in.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    c = o.groupBy(
        F.col("prev").alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
    r = c.groupBy("from_type").agg(
        F.sum("n_transitions").cast("long").alias("row_total")
    )
    return (
        c.join(F.broadcast(r), "from_type")
        .select(
            "from_type",
            "to_type",
            "n_transitions",
            F.expr("cast((n_transitions * 10000) div row_total as bigint)").alias(
                "p_x10000"
            ),
        )
    )


@register(
    "events_contingency_residuals",
    oracle="""
    WITH o AS (
      SELECT event_type, day(CAST(ts AS DATE)) % 7 AS day_bucket,
             CAST(COUNT(*) AS BIGINT) AS obs
      FROM events GROUP BY 1, 2
    ),
    r AS (SELECT event_type, CAST(SUM(obs) AS BIGINT) AS rt FROM o GROUP BY 1),
    c AS (SELECT day_bucket, CAST(SUM(obs) AS BIGINT) AS ct FROM o GROUP BY 1),
    n AS (SELECT CAST(SUM(obs) AS BIGINT) AS total FROM o)
    SELECT o.event_type, CAST(o.day_bucket AS BIGINT) AS day_bucket, o.obs,
           r.rt AS row_total, c.ct AS col_total,
           CAST(o.obs * n.total - r.rt * c.ct AS BIGINT) AS residual_num
    FROM o JOIN r USING (event_type) JOIN c USING (day_bucket) CROSS JOIN n
    """,
    tags=("stats", "contingency", "independence"),
)
def events_contingency_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact contingency-table independence analysis (event_type ×
    day-bucket): observed counts, marginals, and the Pearson-residual
    NUMERATOR obs·N − rowtotal·coltotal per cell — the quantity whose
    sign and magnitude say which cells drive dependence. The χ²
    aggregate itself needs (obs·N − r·c)²/(r·c·N), whose square
    overflows int64 at scale and whose decimal division is NOT
    engine-portable (DuckDB's `//` on DECIMAL degrades to float,
    Spark's decimal `div` wraps) — so the engine pins the exact
    integer components and leaves the one float division to the
    consumer, the same split events_value_outliers uses for variance.
    Bound: |obs·N| < 2^63 holds through ~3·10^9 events per table slice
    (shard the table into independence tests beyond that).

    One aggregation over the grid (|types|·7 cells), marginals derived
    from the cells (never a second scan), two broadcast joins and a
    1-row total. The day bucket is day-of-month mod 7 — pure integer,
    immune to engine dow-numbering conventions.
    """
    ev = load_table(spark, sf_dir, "events")
    o = ev.groupBy(
        "event_type",
        (F.dayofmonth(F.col("ts").cast("date")) % 7).alias("day_bucket"),
    ).agg(F.count(F.lit(1)).cast("long").alias("obs"))
    r = o.groupBy("event_type").agg(F.sum("obs").cast("long").alias("rt"))
    c = o.groupBy("day_bucket").agg(F.sum("obs").cast("long").alias("ct"))
    n = o.agg(F.sum("obs").cast("long").alias("total"))
    return (
        o.join(F.broadcast(r), "event_type")
        .join(F.broadcast(c), "day_bucket")
        .crossJoin(F.broadcast(n))
        .select(
            "event_type",
            F.col("day_bucket").cast("long").alias("day_bucket"),
            "obs",
            F.col("rt").alias("row_total"),
            F.col("ct").alias("col_total"),
            (F.col("obs") * F.col("total") - F.col("rt") * F.col("ct"))
            .cast("long")
            .alias("residual_num"),
        )
    )


#: Poisson(1) CDF thresholds scaled to 2^60 (floor(cdf_k * 2^60) for
#: k = 0..3; weights cap at 4, cdf(3) ≈ 0.981). Computed once from
#: math.exp/factorial and embedded as INTEGER literals, so both engines
#: compare the same constants — no libm at query time.
BOOT_T = (
    424136118829305344,
    848272237658610688,
    1060340297073263360,
    1131029650211480960,
)
BOOT_B = 16


def _boot_weight_case(u: str) -> str:
    """CASE ladder mapping a uniform 60-bit hash to a Poisson(1) draw —
    identical text in both dialects."""
    arms = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(BOOT_T)
    )
    return f"CASE {arms} ELSE 4 END"


@register(
    "stats_bootstrap_replicates",
    oracle=f"""
    WITH q AS (
      SELECT event_type, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS x
      FROM events
    ),
    w AS (
      SELECT event_type, x, t.b AS replicate,
             {_boot_weight_case("(('0x' || substr(md5(CAST(t.b AS VARCHAR) || ':' || CAST(event_id AS VARCHAR)), 1, 15))::BIGINT)")} AS wt
      FROM q, unnest(range(0, {BOOT_B})) AS t(b)
    )
    SELECT event_type, CAST(replicate AS BIGINT) AS replicate,
           CAST(SUM(wt) AS BIGINT) AS n_resampled,
           CAST(SUM(wt * x) AS BIGINT) AS sum_cents
    FROM w GROUP BY event_type, replicate
    """,
    tags=("stats", "bootstrap", "uncertainty"),
)
def stats_bootstrap_replicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Poisson bootstrap (the streaming/one-pass bootstrap
    of Oza & Russell / Chamandy et al.): every row contributes
    Poisson(1)-many copies to each of {BOOT_B} replicates, giving the
    sampling distribution of any sum/mean in ONE pass with no
    resampling shuffles — the way uncertainty bars are put on metrics
    at 100 TB, where B actual resamples are unthinkable. The draws are
    keyed-hash deterministic (md5 of (replicate, event_id) against
    integer CDF thresholds precomputed once — no RNG state to
    coordinate across executors, retries, or ENGINES), so DuckDB
    replays every draw and the replicate sums compare exactly.

    The output is the replicate table itself (type × {BOOT_B} rows of
    exact integer n/Σ): variance/CI derivation is one tiny downstream
    step, kept out of the engine so no overflow-prone square or float
    division ever nears the hash compare (the same split as
    events_contingency_residuals). Shape: one scan with a map-side
    ×{BOOT_B} expansion of (weight, weighted-value) pairs, one
    (type, replicate) aggregation — partial-combined, output size
    |types|·{BOOT_B} regardless of row count.
    """
    ev = load_table(spark, sf_dir, "events")
    q = ev.select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("x"),
    )
    u = (
        "cast(conv(substring(md5(concat(cast(b as string), ':',"
        " cast(event_id as string))), 1, 15), 16, 10) as bigint)"
    )
    # r14 optimization round (guide §4.1): HOF lambdas are interpreted
    # per element with NO codegen subexpression elimination, so putting
    # the CASE ladder directly in the transform evaluated the md5+conv
    # draw once per WHEN arm — up to 4x per (row, replicate). Nesting
    # two transforms binds the draw once per replicate, then maps it
    # through the ladder: identical values (same thresholds, same
    # order, posexplode's index is still the replicate id), 4x fewer
    # md5 evaluations on the hot map stage.
    w = q.select(
        "event_type",
        "x",
        F.posexplode(
            F.expr(
                f"transform(transform(sequence(0, {BOOT_B - 1}),"
                f" b -> {u}),"
                f" u -> {_boot_weight_case('u')})"
            )
        ).alias("replicate", "wt"),
    )
    return w.groupBy("event_type", F.col("replicate").cast("long").alias("replicate")).agg(
        F.sum("wt").cast("long").alias("n_resampled"),
        F.sum(F.col("wt") * F.col("x")).cast("long").alias("sum_cents"),
    )


@register(
    "events_pchart_out_of_control",
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN value >= 0.0 AND value <= 400.0
                           THEN 0 ELSE 1 END) AS BIGINT) AS nb
      FROM events GROUP BY 1
    ),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(nb) AS BIGINT) AS bb
          FROM d)
    SELECT day, n AS n_events, nb AS n_bad,
           CAST(nb * nn - n * bb AS BIGINT) AS deviation_num,
           (CAST(nb * nn - n * bb AS DECIMAL(38,0))
              * CAST(nb * nn - n * bb AS DECIMAL(38,0)))
             > CAST(9 AS DECIMAL(38,0)) * bb * (nn - bb) * n
             AS out_of_control
    FROM d, t
    """,
    tags=("events", "dq", "control-chart"),
)
def events_pchart_out_of_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shewhart p-chart over the daily bad-value rate — the
    statistical-process-control monitor a DQ pipeline runs on every
    partition before promoting it: a day is out of control when its
    defective proportion leaves the 3σ binomial band around the
    corpus rate. The 3σ test is evaluated EXACTLY by clearing
    denominators: |nb/n − B/N| > 3·√(p̂(1−p̂)/n) ⟺
    (nb·N − n·B)² > 9·B·(N−B)·n — no sqrt, no float; the squares are
    decimal(38,0) products (the events_value_outliers overflow
    discipline: int64 would wrap silently in Spark and widen in
    DuckDB). The signed deviation numerator ships as a witness.

    One daily aggregation + a 1-row totals broadcast; the per-day
    decision is a scan-level expression over the tiny daily table.
    Complements events_dq_expectations (static rules) with a
    DISTRIBUTIONAL gate: rules catch bad rows, the chart catches bad
    DAYS.
    """
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.when((F.col("value") >= 0.0) & (F.col("value") <= 400.0), 0).otherwise(1)
        )
        .cast("long")
        .alias("nb"),
    )
    t = d.agg(
        F.sum("n").cast("long").alias("nn"), F.sum("nb").cast("long").alias("bb")
    )
    return (
        d.crossJoin(F.broadcast(t))
        .select(
            "day",
            F.col("n").alias("n_events"),
            F.col("nb").alias("n_bad"),
            (F.col("nb") * F.col("nn") - F.col("n") * F.col("bb"))
            .cast("long")
            .alias("deviation_num"),
            (
                (F.col("nb") * F.col("nn") - F.col("n") * F.col("bb")).cast(
                    "decimal(38,0)"
                )
                * (F.col("nb") * F.col("nn") - F.col("n") * F.col("bb")).cast(
                    "decimal(38,0)"
                )
                > F.lit(9).cast("decimal(38,0)")
                * F.col("bb")
                * (F.col("nn") - F.col("bb"))
                * F.col("n")
            ).alias("out_of_control"),
        )
    )


@register(
    "stats_cusum_changepoint_daily",
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd, CAST(SUM(x) AS BIGINT) AS tot
          FROM d),
    c AS (
      SELECT day, x,
             CAST(SUM(x * nd - tot) OVER (ORDER BY day) AS BIGINT) AS cum
      FROM d, t
    )
    SELECT day, x AS day_cents,
           CAST(cum - MIN(cum) OVER (ORDER BY day) AS BIGINT) AS cusum_high,
           CAST(MAX(cum) OVER (ORDER BY day) - cum AS BIGINT) AS cusum_low
    FROM c
    """,
    tags=("stats", "changepoint", "cusum"),
)
def stats_cusum_changepoint_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint statistics over the daily value series — the
    drift detector that catches a GRADUAL level shift the per-day
    p-chart misses (each day individually in-band, the cumulative
    deviation marching steadily away). The textbook recursion
    S_d = max(0, S_{d−1} + dev_d) is not a window function, but its
    closed form is: S_d = C_d − min_{j≤d} C_j (and the downward chart
    mirrors with the running max) — two running extrema over the daily
    cumulative deviation, fully relational. Deviations are denominator-
    cleared integers (x_d·D − T, summing to zero over the series), so
    both charts are exact int64 — |x·D| stays under 2^63 through ~10^5
    daily-partition series of 10^13-cent days.

    One daily aggregation + a 1-row totals broadcast + ordered windows
    over the |days| table (bounded — the same bounded-window discipline
    as the KS and MAD queries). Where the alarm threshold goes is a
    policy choice; the engine pins the full statistic path so any
    threshold downstream is a filter.
    """
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("x")
    )
    t = d.agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.sum("x").cast("long").alias("tot"),
    )
    w_cum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    c = d.crossJoin(F.broadcast(t)).select(
        "day",
        "x",
        F.sum(F.col("x") * F.col("nd") - F.col("tot")).over(w_cum).alias("cum"),
    )
    return c.select(
        "day",
        F.col("x").alias("day_cents"),
        (F.col("cum") - F.min("cum").over(w_cum)).cast("long").alias("cusum_high"),
        (F.max("cum").over(w_cum) - F.col("cum")).cast("long").alias("cusum_low"),
    )


#: round(log10(1 + 1/d) * 10^6) for d = 1..9 — Benford's law expected
#: first-digit proportions in parts-per-million, precomputed once so no
#: libm log runs at query time in either engine.
BENFORD_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


@register(
    "stats_benford_first_digit",
    oracle=f"""
    WITH q AS (
      SELECT CAST(substr(CAST(CAST(ROUND(value * 100) AS BIGINT) AS VARCHAR), 1, 1)
                  AS BIGINT) AS digit
      FROM events WHERE value >= 0.01
    ),
    c AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM q GROUP BY digit
    ),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c),
    e AS (
      SELECT * FROM (VALUES
        {", ".join(f"({d}, {p})" for d, p in BENFORD_PPM.items())}
      ) AS v(digit, expected_ppm)
    )
    SELECT c.digit, c.n AS n_values,
           CAST((c.n * 1000000) // t.total AS BIGINT) AS observed_ppm,
           CAST(e.expected_ppm AS BIGINT) AS expected_ppm,
           CAST((c.n * 1000000) // t.total - e.expected_ppm AS BIGINT)
             AS deviation_ppm
    FROM c JOIN e ON e.digit = c.digit CROSS JOIN t
    """,
    tags=("stats", "dq", "benford"),
)
def stats_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit analysis of the value column — the forensic
    data-quality screen for fabricated, truncated, or unit-mangled
    numeric data (organic multi-scale magnitudes follow
    P(d) = log10(1 + 1/d); capped generators and copy-paste do not).
    Expected proportions are precomputed ppm INTEGER constants (no libm
    log at query time); observed proportions are integer-scaled; the
    per-digit deviation ships signed so a monitor thresholds it
    downstream.

    First digit is extracted from the decimal string of the exact
    cents value — both engines print int64 identically, so no float
    formatting can drift. One scan + a 9-group aggregation + a 1-row
    total broadcast; the expectation table is a 9-row literal.
    """
    ev = load_table(spark, sf_dir, "events")
    q = ev.filter(F.col("value") >= 0.01).select(
        F.substring(
            F.round(F.col("value") * 100).cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("digit")
    )
    c = q.groupBy("digit").agg(F.count(F.lit(1)).cast("long").alias("n"))
    t = c.agg(F.sum("n").cast("long").alias("total"))
    e = spark.createDataFrame(
        [(d, p) for d, p in BENFORD_PPM.items()], "digit long, expected_ppm long"
    )
    return (
        c.join(F.broadcast(e), "digit")
        .crossJoin(F.broadcast(t))
        .select(
            "digit",
            F.col("n").alias("n_values"),
            F.expr("cast((n * 1000000) div total as bigint)").alias("observed_ppm"),
            "expected_ppm",
            F.expr(
                "cast((n * 1000000) div total - expected_ppm as bigint)"
            ).alias("deviation_ppm"),
        )
    )


@register(
    "events_interarrival_magnitude_histogram",
    oracle=f"""
    WITH g AS (
      SELECT user_id,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    ),
    s AS (
      SELECT gap_us // 1000000 AS gap_s FROM g WHERE gap_us IS NOT NULL
    ),
    m AS (
      SELECT CASE WHEN gap_s = 0 THEN 0
                  ELSE length(CAST(gap_s AS VARCHAR)) END AS magnitude,
             gap_s,
             CASE WHEN gap_s * 1000000 <= {SESSION_GAP_MIN} * 60 * 1000000
                  THEN 1 ELSE 0 END AS in_session
      FROM s
    )
    SELECT CAST(magnitude AS BIGINT) AS magnitude,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           CAST(MIN(gap_s) AS BIGINT) AS min_gap_s,
           CAST(MAX(gap_s) AS BIGINT) AS max_gap_s,
           CAST(SUM(in_session) AS BIGINT) AS n_within_session_gap
    FROM m GROUP BY magnitude
    """,
    tags=("events", "timeseries", "interarrival"),
)
def events_interarrival_magnitude_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-user inter-arrival gap distribution, bucketed by order of
    magnitude — the evidence behind every sessionization gap choice:
    a bimodal histogram (within-visit seconds vs between-visit hours)
    justifies the {SESSION_GAP_MIN}-minute threshold the three
    sessionize implementations share; a unimodal one would say the
    cutoff is arbitrary. The magnitude bucket is the DIGIT COUNT of
    the gap in whole seconds — the same exact floor(log10)+1 stand-in
    as the token-frequency histogram, no libm — and each bucket also
    counts how many of its gaps fall inside the session threshold.

    One user-partitioned ordered window (per-user streams bound the
    partitions), then a ~7-group aggregation. At 100 TB this is the
    profile job that tunes watermarks, session gaps, and state TTLs
    from the data rather than folklore.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    s = g.select(F.expr("gap_us div 1000000").alias("gap_s"))
    m = s.select(
        F.when(F.col("gap_s") == 0, 0)
        .otherwise(F.length(F.col("gap_s").cast("string")))
        .cast("long")
        .alias("magnitude"),
        "gap_s",
        F.when(
            F.col("gap_s") * 1000000 <= SESSION_GAP_MIN * 60 * 1000000, 1
        )
        .otherwise(0)
        .alias("in_session"),
    )
    return m.groupBy("magnitude").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.min("gap_s").cast("long").alias("min_gap_s"),
        F.max("gap_s").cast("long").alias("max_gap_s"),
        F.sum("in_session").cast("long").alias("n_within_session_gap"),
    )


@register(
    "events_lorenz_activity_deciles",
    oracle="""
    WITH pu AS (
      SELECT user_id,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS m
      FROM events GROUP BY user_id
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nu,
                 CAST(SUM(m) AS BIGINT) AS total FROM pu),
    r AS (
      SELECT m, ROW_NUMBER() OVER (ORDER BY m, user_id) AS rn FROM pu
    ),
    d AS (
      SELECT ((rn - 1) * 10) // nu + 1 AS decile, m FROM r, n
    ),
    g AS (
      SELECT decile,
             CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(m) AS BIGINT) AS decile_cents
      FROM d GROUP BY decile
    )
    SELECT CAST(decile AS BIGINT) AS decile, n_users, decile_cents,
           CAST((CAST(SUM(decile_cents) OVER (ORDER BY decile) AS BIGINT)
                 * 10000) // n.total AS BIGINT) AS cum_share_x10000
    FROM g, n
    """,
    tags=("events", "analytics", "concentration"),
)
def events_lorenz_activity_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz concentration curve of per-user activity value — the
    corpus-balance profile behind "the top decile contributes X% of
    the data", which drives per-source caps, user-level dedup budgets,
    and contributor-skew alerts. Users rank ascending by exact cents
    (ties broken by user_id), deciles by the same ((rank−1)·10) div n
    arithmetic as the RFM segments, and the cumulative share is
    integer-scaled against the grand total — the full curve in 10 exact
    rows, no Gini division anywhere near the hash (the coefficient is
    one trapezoid sum downstream). Every intermediate stays ≤
    total·10^4, far inside int64 at any realistic corpus.

    The global rank goes through the range-bucketed distributed ranking
    operator — never a single-partition window over users; the decile
    rollup and the 10-row cumulative window are metadata-sized.
    """
    from hailstorm_spark.operators.ranking import global_row_number

    ev = load_table(spark, sf_dir, "events")
    pu = ev.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("m")
    )
    n = pu.agg(
        F.count(F.lit(1)).cast("long").alias("nu"),
        F.sum("m").cast("long").alias("total"),
    )
    r = global_row_number(pu, "m", "user_id", "rn")
    g = (
        r.crossJoin(F.broadcast(n))
        .select(F.expr("((rn - 1) * 10) div nu + 1").alias("decile"), "m")
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("m").cast("long").alias("decile_cents"),
        )
    )
    w_cum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        g.crossJoin(F.broadcast(n))
        .select(
            F.col("decile").cast("long").alias("decile"),
            "n_users",
            "decile_cents",
            F.expr(
                "cast((sum(decile_cents) over (order by decile"
                " rows between unbounded preceding and current row)"
                " * 10000) div total as bigint)"
            ).alias("cum_share_x10000"),
        )
    )
