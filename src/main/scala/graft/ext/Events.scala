package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Batch analytics over the `events` table (event_id, ts, user_id,
  * event_type, value, props) — the batch twins of the Structured
  * Streaming operators in graft.streaming. */
object Events {

  /** Tumbling-hour aggregation: the batch form of a windowed streaming
    * agg. Single hash shuffle on (hour, event_type). */
  def hourlyAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("h"),
               col("event_type"))
      .agg(count(lit(1)).as("n"),
           round(sum(col("value")), 2).as("sum_value"))

  /** Semi-structured props: parse the JSON payload column with an
    * explicit schema (`from_json` — columnar, codegen-friendly; schema
    * inference over 100 TB of JSON is not an option) and aggregate on
    * the extracted field. */
  def propsAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .withColumn("k",
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
          .getField("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
           round(avg(col("k")), 4).as("avg_k"))

  /** DISTINCT aggregates: unique users (and active days) per event
    * type alongside plain aggregates. Multiple distinct columns force
    * Catalyst's Expand-based plan — each input row fans out per
    * distinct group, partial-aggregated map-side, so the shuffle
    * carries (type, user) / (type, day) PAIRS once each rather than
    * raw events; the classic count-distinct-at-scale shape (the
    * approx_count_distinct sketch is the fallback when even the
    * distinct pair set is too wide). */
  def distinctAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(count_distinct(col("user_id")).as("n_users"),
           count_distinct(date_trunc("day", col("ts"))).as("n_days"),
           count(lit(1)).as("n_events"),
           round(sum(col("value")), 2).as("sum_value"))

  /** Trailing-hour activity via a RANGE window frame: for every event,
    * how many events the same user produced in the preceding hour
    * (inclusive). Event time is compared in exact integer microseconds
    * (ts carries sub-second precision; truncating to seconds would
    * merge distinct instants). One shuffle on user_id; the frame bound
    * keeps each window scan local to a sorted run — the standard
    * "activity in the last N minutes" feature-engineering shape. */
  def trailingHourCounts(spark: SparkSession, dir: String): DataFrame = {
    val hourUs = 3600L * 1000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(-hourUs, 0L)
    Tables.load(spark, dir, "events")
      .select(col("event_id"), col("user_id"),
              unix_micros(col("ts").cast("timestamp")).as("ts_us"))
      .withColumn("n_prev_hour", count(lit(1)).over(w))
      .select(col("event_id"), col("user_id"), col("ts_us"),
              col("n_prev_hour"))
  }

  /** Sessionization: a new session starts after a >30-minute gap. Gaps
    * via lag() over (user_id, ts) — one shuffle on user_id; at scale
    * this is the standard sort-within-partition sessionize. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.load(spark, dir, "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull, 1L)
          // ts is TIMESTAMP_NTZ (no direct cast to double); hop through
        // LTZ under the UTC session — identical epoch seconds.
        .when(col("ts").cast("timestamp").cast("double") -
                col("prev_ts").cast("timestamp").cast("double") > 1800.0, 1L)
          .otherwise(0L))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("new_session")).as("n_sessions"))
  }

  /** Per-user session statistics via Spark's NATIVE `session_window`
    * (gap-merged event-time windows, the built-in Catalyst operator
    * behind streaming sessionization) rather than the lag()-based
    * gaps-and-islands of [[sessionize]] — both shapes exist because at
    * scale they trade differently: session_window is one hash shuffle on
    * (user_id, merged-window) with the merge done inside the aggregation
    * operator (no per-partition full sort of the user's history), while
    * the lag() form needs the window sort but yields per-event session
    * ids for downstream joins. Semantics note: session_window merges
    * TOUCHING windows — a gap of exactly the session gap still merges
    * (next event at prev.ts + 30 min extends the session), so the
    * split condition is strictly `> 30 min`, identical to q33's lag()
    * form. Pinned by SessionWindowSpec's exact-gap case (which caught
    * the `>=` formulation as wrong — the driver data has no exact-gap
    * pairs, so only the synthetic case distinguishes them).
    *
    * Scale: one shuffle on user_id; state per open window is O(1); no
    * driver-side anything. The same expression runs unchanged under
    * `readStream` (see streaming.Streams.sessionWindowAvailableNow). */
  def sessionWindowStats(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      // session_window needs LTZ event time; UTC session makes the
      // NTZ→LTZ hop the identity on wall clocks
      .withColumn("ts", col("ts").cast("timestamp"))
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
           round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"),
              col("session_window.start").cast("timestamp_ntz").as("s_start"),
              col("session_window.end").cast("timestamp_ntz").as("s_end"),
              col("n_events"), col("sum_value"))

  /** Oracle for [[sessionWindowStats]]: gaps-and-islands with the
    * session_window semantics (new session at gap > 30 min — touching
    * windows merge; window end = last event + gap). */
  def sessionWindowOracleSql: String =
    """SELECT user_id, min(ts) AS s_start,
      | max(ts) + INTERVAL 30 MINUTE AS s_end,
      | CAST(count(*) AS BIGINT) AS n_events,
      | round(sum(value), 2) AS sum_value
      |FROM (SELECT user_id, ts, value,
      |  CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
      | FROM (SELECT user_id, ts, event_id, value,
      |   CASE WHEN lag(ts) OVER (PARTITION BY user_id
      |                           ORDER BY ts, event_id) IS NULL
      |        OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id
      |             ORDER BY ts, event_id)) > 1800.0 THEN 1
      |        ELSE 0 END AS new_s
      |  FROM events) t) s
      |GROUP BY user_id, sid""".stripMargin

  /** Hourly anomaly detection: hours whose event count sits more than
    * `sigma` sample standard deviations from the per-type mean — the
    * monitoring query an event pipeline alerts on. Engine-exact by
    * construction: counts are integers, so the per-type sums (n, Σc,
    * Σc²) are exact BIGINTs and mean/std/z are IEEE-deterministic double
    * trees mirrored verbatim in the oracle — the comparison against
    * `sigma` can never be a float-boundary coin flip across engines.
    *
    * Scale: the hourly aggregate is one shuffle (map-side combined);
    * per-type moment sums aggregate the already-tiny hourly table; the
    * stats join broadcasts (type cardinality is bounded). */
  def hourlyAnomalies(spark: SparkSession, dir: String,
                      sigma: Double = 2.0): DataFrame =
    anomaliesOf(Tables.load(spark, dir, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("c")), sigma)

  /** The stats + z-filter tail of [[hourlyAnomalies]] over ANY
    * (event_type, h, c) hourly frame — shared with the streaming twin
    * ([[graft.streaming.Streams.hourlyAnomaliesAvailableNow]]) so the
    * two engines' anomaly rule cannot drift. */
  private[graft] def anomaliesOf(hourly: DataFrame,
                                 sigma: Double): DataFrame = {
    val stats = hourly.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s1"),
           // Σc² in DECIMAL(38,0): an int64 c·c wraps silently once an
           // hourly count passes ~3e9 (DuckDB errors instead — engine
           // divergence); decimal stays exact to c ≈ 1e19
           sum(col("c").cast("decimal(38,0)") * col("c")).as("s2"))
    val nD = col("n").cast("double")
    val s1 = col("s1").cast("double"); val s2 = col("s2").cast("double")
    val cD = col("c").cast("double")
    val mean = s1 / nD
    val std = sqrt((nD * s2 - s1 * s1) / (nD * (nD - lit(1.0))))
    hourly.join(broadcast(stats), "event_type")
      .filter(abs(cD - mean) > lit(sigma) * std)
      .select(col("event_type"), col("h"), col("c"),
              ((cD - mean) / std).cast("decimal(28,10)").cast("double")
                .as("z"))
  }

  def hourlyAnomaliesOracleSql(sigma: Double = 2.0): String =
    s"""WITH hourly AS (
       |  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS c
       |  FROM events GROUP BY 1, 2),
       |st AS (
       |  SELECT event_type, count(*) AS n, sum(c) AS s1,
       |    sum(CAST(c AS HUGEINT) * c) AS s2
       |  FROM hourly GROUP BY 1)
       |SELECT event_type, h, c,
       |  CAST(CAST((CAST(c AS DOUBLE) - CAST(s1 AS DOUBLE)/CAST(n AS DOUBLE))
       |    / sqrt((CAST(n AS DOUBLE)*CAST(s2 AS DOUBLE)
       |            - CAST(s1 AS DOUBLE)*CAST(s1 AS DOUBLE))
       |           / (CAST(n AS DOUBLE)*(CAST(n AS DOUBLE)-1.0)))
       |    AS DECIMAL(28,10)) AS DOUBLE) AS z
       |FROM hourly JOIN st USING (event_type)
       |WHERE abs(CAST(c AS DOUBLE) - CAST(s1 AS DOUBLE)/CAST(n AS DOUBLE))
       |  > $sigma * sqrt((CAST(n AS DOUBLE)*CAST(s2 AS DOUBLE)
       |          - CAST(s1 AS DOUBLE)*CAST(s1 AS DOUBLE))
       |         / (CAST(n AS DOUBLE)*(CAST(n AS DOUBLE)-1.0)))""".stripMargin

  /** Retention cohorts — the product-analytics staple: users grouped by
    * first-activity day, with how many come back exactly 1 and 7 days
    * later. Exact integers throughout.
    *
    * Scale: one (user, day) distinct shuffle (bounded by activity, not
    * event volume — the distinct collapses within-day event counts
    * map-side), one min-per-user aggregate, one user-keyed join back,
    * one cohort-day distinct-aggregate (Expand plan, q71 shape). All
    * keyed shuffles, everything linear in active-user-days. */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    // day stays a (midnight) TIMESTAMP_NTZ, not a DATE: parquet DATE and
    // SQL DATE deserialize to different host types downstream (date vs
    // timestamp objects), while NTZ timestamps compare naive-to-naive on
    // both engines — the q32/q35 convention
    val ud = Tables.load(spark, dir, "events")
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .distinct()
    val cohorts = ud.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    ud.join(cohorts, "user_id")
      .groupBy(col("cohort_day"))
      .agg(count_distinct(col("user_id")).as("n_users"),
           count_distinct(when(
             col("day") === col("cohort_day") + expr("INTERVAL 1 DAY"),
             col("user_id"))).as("ret_1"),
           count_distinct(when(
             col("day") === col("cohort_day") + expr("INTERVAL 7 DAY"),
             col("user_id"))).as("ret_7"))
  }

  val retentionCohortsOracleSql: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, date_trunc('day', ts) AS day
      |  FROM events),
      |c AS (SELECT user_id, min(day) AS cohort_day FROM ud GROUP BY user_id)
      |SELECT cohort_day, count(DISTINCT ud.user_id) AS n_users,
      |  count(DISTINCT CASE WHEN day = cohort_day + INTERVAL 1 DAY
      |                      THEN ud.user_id END) AS ret_1,
      |  count(DISTINCT CASE WHEN day = cohort_day + INTERVAL 7 DAY
      |                      THEN ud.user_id END) AS ret_7
      |FROM ud JOIN c USING (user_id)
      |GROUP BY cohort_day""".stripMargin

  /** Rolling 7-day active users (WAU per day) — SLIDING-WINDOW DISTINCT,
    * the aggregation windowed counts can't express (distinct doesn't
    * decompose over overlapping windows the way sums do). Computed the
    * way a warehouse should: dedup to (day, user) pairs first — the
    * only corpus-sized step, one shuffle — then join the BOUNDED
    * distinct-days spine (broadcast) with a 7-day band condition, so
    * each (day, user) pair fans out to ≤7 target days, and count
    * distinct per target day. At 100 TB the fan-out is 7×|daily-active
    * pairs|, never 7×|events|. Output: (d, wau), integer-exact. */
  def rollingWau(spark: SparkSession, dir: String,
                 windowDays: Int = 7): DataFrame = {
    val du = Tables.load(spark, dir, "events")
      .select(date_trunc("day", col("ts")).as("d"), col("user_id"))
      .distinct()
    val days = du.select(col("d").as("td")).distinct()
    du.join(broadcast(days),
        col("d") <= col("td") &&
        col("d") >= col("td") - expr(s"INTERVAL ${windowDays - 1} DAYS"))
      .groupBy(col("td"))
      .agg(countDistinct(col("user_id")).as("wau"))
      .select(col("td").as("d"), col("wau"))
  }

  def rollingWauOracleSql(windowDays: Int = 7): String =
    s"""WITH du AS (
       |  SELECT DISTINCT date_trunc('day', ts) AS d, user_id FROM events),
       |days AS (SELECT DISTINCT d AS td FROM du)
       |SELECT td AS d, count(DISTINCT user_id) AS wau
       |FROM du JOIN days
       |  ON du.d <= days.td
       | AND du.d >= days.td - INTERVAL ${windowDays - 1} DAY
       |GROUP BY td""".stripMargin

  /** Top user-journey trigrams — the behavioral path-analysis staple:
    * each user's events ordered by (ts, event_id) form a sequence of
    * event types; emit the `topK` most frequent consecutive type
    * trigrams (count desc, path asc — deterministic). One user-keyed
    * shuffle+sort produces every trigram via two `lead()`s (the q114
    * lead-over-self-join lesson); the trigram count table is bounded at
    * |types|³ rows, and the final top-k is a TakeOrdered. At 100 TB the
    * only corpus-sized cost is the per-user sort — the same shape as
    * sessionization, partitioned by user so it scales out. */
  def journeyTrigrams(spark: SparkSession, dir: String,
                      topK: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    graft.Tables.load(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
              col("event_type"))
      .withColumn("t2", lead(col("event_type"), 1).over(w))
      .withColumn("t3", lead(col("event_type"), 2).over(w))
      .filter(col("t3").isNotNull)
      .groupBy(concat_ws(">", col("event_type"), col("t2"), col("t3"))
                 .as("path"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(topK)
  }

  /** Session conversion by customer segment — the product-analytics
    * rollup that composes three engine layers: gaps-and-islands
    * sessionization (q33's 30-min rule, with per-event session ids),
    * per-session funnel logic (converted = the session's first click
    * is followed, inclusively, by a purchase), and broadcast dimension
    * enrichment (segment from customer). Output per segment: sessions
    * with ≥1 click, converted sessions, conversion rate.
    *
    * Scale: one user-keyed sort for session ids (the sessionize
    * shape), one (user, session) rollup with map-side combine, one
    * broadcast join to the bounded customer-key side, bounded output.
    * The funnel condition needs only two per-session aggregates (first
    * click ts, last purchase ts) — no per-pair join like q46. */
  def segmentConversion(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val sess = Tables.load(spark, dir, "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull, 1L)
          .when(col("ts").cast("timestamp").cast("double") -
                  col("prev_ts").cast("timestamp").cast("double") > 1800.0,
                1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val perSession = sess.groupBy(col("user_id"), col("sid"))
      .agg(min(when(col("event_type") === "click", col("ts")))
             .as("first_click"),
           max(when(col("event_type") === "purchase", col("ts")))
             .as("last_purchase"))
      .filter(col("first_click").isNotNull)
      .withColumn("converted",
        when(col("last_purchase").isNotNull &&
             col("last_purchase") >= col("first_click"), 1L).otherwise(0L))
    val segments = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    perSession.join(broadcast(segments),
                    col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_click_sessions"),
           sum(col("converted")).as("n_converted"))
      .withColumn("conversion_rate",
        round(col("n_converted") / col("n_click_sessions").cast("double"),
              4))
  }

  def segmentConversionOracleSql(): String =
    """WITH sess AS (
      |  SELECT user_id, ts, event_type,
      |    CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
      |  FROM (SELECT user_id, ts, event_id, event_type,
      |      CASE WHEN lag(ts) OVER (PARTITION BY user_id
      |                              ORDER BY ts, event_id) IS NULL
      |             OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id
      |                  ORDER BY ts, event_id)) > 1800.0 THEN 1
      |           ELSE 0 END AS new_s
      |    FROM events) t),
      |per_session AS (
      |  SELECT user_id, sid,
      |    min(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
      |    max(CASE WHEN event_type = 'purchase' THEN ts END) AS last_purchase
      |  FROM sess GROUP BY user_id, sid
      |  HAVING min(CASE WHEN event_type = 'click' THEN ts END) IS NOT NULL)
      |SELECT c_mktsegment, count(*) AS n_click_sessions,
      |  CAST(sum(CASE WHEN last_purchase IS NOT NULL
      |                 AND last_purchase >= first_click THEN 1 ELSE 0 END)
      |       AS BIGINT) AS n_converted,
      |  round(sum(CASE WHEN last_purchase IS NOT NULL
      |                  AND last_purchase >= first_click THEN 1 ELSE 0 END)
      |        / CAST(count(*) AS DOUBLE), 4) AS conversion_rate
      |FROM per_session JOIN customer ON user_id = c_custkey
      |GROUP BY c_mktsegment""".stripMargin

  /** Time-series gap fill (forward fill) — the telemetry-reporting
    * staple: the hourly rollup joined against a complete hour × type
    * spine, with missing cells carrying the last present hour's value
    * forward. Leading gaps (before a type's first observation) stay
    * NULL — there is nothing to carry.
    *
    * Scale: the spine is hours × types (bounded, generated from a
    * 1-row min/max aggregate — never from the corpus); the only
    * corpus-sized step is the hourly rollup itself; the fill window
    * partitions by type over the bounded spine. DECIMAL sums so the
    * carried value is the exact one. */
  def gapFillHourly(spark: SparkSession, dir: String): DataFrame = {
    val agg = Tables.load(spark, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("sv"))
    val bounds = agg.agg(min(col("h")).as("mn"), max(col("h")).as("mx"))
    val hours = bounds.select(
      explode(sequence(col("mn"), col("mx"), expr("INTERVAL 1 HOUR")))
        .as("h"))
    val types = agg.select(col("event_type")).distinct()
    val spine = hours.crossJoin(broadcast(types))
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(agg, Seq("h", "event_type"), "left")
      .select(col("h"), col("event_type"),
              when(col("sv").isNull, 1L).otherwise(0L).as("is_gap"),
              round(last(col("sv"), ignoreNulls = true).over(w)
                      .cast("double"), 2).as("sum_value_filled"))
  }

  def gapFillHourlyOracleSql(): String =
    """WITH agg AS (
      |  SELECT date_trunc('hour', ts) AS h, event_type,
      |    sum(CAST(value AS DECIMAL(18,2))) AS sv
      |  FROM events GROUP BY 1, 2),
      |b AS (SELECT min(h) AS mn, max(h) AS mx FROM agg),
      |hours AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR))
      |            AS h FROM b),
      |spine AS (SELECT h, event_type
      |          FROM hours CROSS JOIN (SELECT DISTINCT event_type
      |                                 FROM agg) t),
      |j AS (SELECT s.h, s.event_type, a.sv
      |      FROM spine s LEFT JOIN agg a
      |        ON a.h = s.h AND a.event_type = s.event_type)
      |SELECT h, event_type,
      |  CAST(CASE WHEN sv IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_gap,
      |  round(CAST(last_value(sv IGNORE NULLS) OVER (
      |    PARTITION BY event_type ORDER BY h
      |    ROWS UNBOUNDED PRECEDING) AS DOUBLE), 2) AS sum_value_filled
      |FROM j""".stripMargin

  /** Cumulative-reach curve — per activity day: users active for the
    * FIRST time that day, and total distinct users reached so far (the
    * growth metric exact streaming can't give without unbounded
    * distinct state). Exact and cheap: distinct users fold to one
    * first-day row each (min-per-user, map-side combine), the curve is
    * a window cumsum over the bounded day table. */
  def cumulativeReach(spark: SparkSession, dir: String): DataFrame = {
    val du = Tables.load(spark, dir, "events")
      .select(date_trunc("day", col("ts")).as("d"), col("user_id"))
      .distinct()
    val firstDay = du.groupBy(col("user_id")).agg(min(col("d")).as("fd"))
      .groupBy(col("fd")).agg(count(lit(1)).as("new_users"))
    val days = du.select(col("d")).distinct()
    val w = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    days.join(firstDay, col("d") === col("fd"), "left")
      .select(col("d"), coalesce(col("new_users"), lit(0L))
                .as("new_users"))
      .withColumn("cum_users", sum(col("new_users")).over(w))
  }

  def cumulativeReachOracleSql(): String =
    """WITH du AS (
      |  SELECT DISTINCT date_trunc('day', ts) AS d, user_id FROM events),
      |fd AS (
      |  SELECT fd, count(*) AS new_users FROM (
      |    SELECT user_id, min(d) AS fd FROM du GROUP BY user_id) t
      |  GROUP BY fd),
      |days AS (SELECT DISTINCT d FROM du)
      |SELECT d, coalesce(new_users, 0) AS new_users,
      |  CAST(sum(coalesce(new_users, 0)) OVER (ORDER BY d
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
      |FROM days LEFT JOIN fd ON d = fd""".stripMargin

  /** Exponential time-decay trending scores — recency-weighted activity
    * (the "what's hot" ranking), computed EXACTLY: ages are whole days
    * from the corpus max day, and the decay weight is the INTEGER
    * `2^(effMaxAge − age)` (halving per day of age) — no pow()/libm
    * parity risk, no float summation order. The per-row weight is a
    * BIGINT; the horizon is clamped to the trailing 62 days
    * (`effMaxAge = least(maxAge, 61)`; rows older than that are dropped):
    * a 2^k BIGINT weight silently wraps at k ≥ 63 in Spark (Java `<<`
    * is mod-64) while DuckDB's `2 ** k` errors. The clamp bounds the
    * per-ROW weight only — with ≥3 events on the newest days the SUM
    * Σ2^(61−age) still exceeds Long.MaxValue, so the aggregation runs in
    * DECIMAL(38,0) (same discipline as the Σc² chi-square moments above)
    * and the final score is presented as a double: one deterministic
    * round-to-nearest of an exactly-accumulated integer, identical in
    * both engines. A trailing horizon is the honest semantics for a
    * trending score anyway (events older than two months have weight
    * < 2⁻⁶² of the newest day's: numerically invisible).
    * A day of history at 100 TB folds map-side: the weight is a pure
    * per-row expression, the rollup is one bounded groupBy.
    *
    * Output per type: events inside the horizon, exact decayed score,
    * and the score normalized by the all-type total (share of
    * recency-weighted mass, 6dp). */
  def trendingScores(spark: SparkSession, dir: String): DataFrame =
    trendingScoresFrom(Tables.load(spark, dir, "events")
      .select(col("event_type"), date_trunc("day", col("ts")).as("d")))

  /** Core of [[trendingScores]] over a prepared (event_type, d) frame —
    * exposed so the horizon-clamp spec can drive the REAL pipeline on a
    * synthetic >62-day corpus. */
  private[ext] def trendingScoresFrom(ev: DataFrame): DataFrame = {
    val maxDay = ev.agg(max(col("d")).as("mx"))
    val aged = ev.crossJoin(broadcast(maxDay))
      .withColumn("age", datediff(col("mx"), col("d")).cast("long"))
    val maxAge = aged.agg(least(max(col("age")), lit(61L)).as("max_age"))
    aged.crossJoin(broadcast(maxAge))
      .filter(col("age") <= col("max_age"))
      .withColumn("wt", expr("shiftleft(1L, int(max_age - age))"))
      .groupBy(col("event_type"))
      // Σwt in DECIMAL(38,0): the per-row wt fits a BIGINT by the clamp,
      // but 4·2^61 already wraps an int64 sum — accumulate exactly, then
      // present as double (single deterministic rounding, both engines)
      .agg(count(lit(1)).as("n"),
           sum(col("wt").cast("decimal(38,0)")).as("score_d"))
      .withColumn("share",
        round(col("score_d").cast("double") /
              sum(col("score_d")).over(
                Window.rowsBetween(Window.unboundedPreceding,
                                   Window.unboundedFollowing))
                .cast("double"), 6))
      .withColumn("score", col("score_d").cast("double"))
      .select("event_type", "n", "score", "share")
  }

  def trendingScoresOracleSql(): String =
    """WITH ev AS (
      |  SELECT event_type, date_trunc('day', ts) AS d FROM events),
      |aged AS (
      |  SELECT event_type,
      |    CAST(date_diff('day', d, (SELECT max(d) FROM ev)) AS BIGINT)
      |      AS age
      |  FROM ev),
      |ma AS (SELECT least(max(age), 61) AS max_age FROM aged),
      |wts AS (
      |  SELECT event_type,
      |    CAST(2 ** ((SELECT max_age FROM ma) - age) AS BIGINT) AS wt
      |  FROM aged WHERE age <= (SELECT max_age FROM ma)),
      |scores AS (
      |  SELECT event_type, count(*) AS n,
      |    sum(wt) AS score_x
      |  FROM wts GROUP BY event_type)
      |SELECT event_type, n,
      |  CAST(score_x AS DOUBLE) AS score,
      |  round(CAST(score_x AS DOUBLE) /
      |        CAST((SELECT sum(score_x) FROM scores) AS DOUBLE), 6)
      |    AS share
      |FROM scores""".stripMargin

  /** Rolling-baseline anomaly detection — each (day, type)'s event
    * count z-scored against its OWN trailing `window`-day baseline
    * (q88 z-scores against the global mean; real monitoring baselines
    * against the recent past so drifts don't poison the reference).
    * Moments accumulate as exact integer sums (Σn, Σn²) → one
    * IEEE-deterministic mean/std/z per row (the q88 discipline).
    * Output: the anomalous rows (|z| ≥ sigma, baseline ≥ minBaseline
    * days).
    *
    * Scale: the corpus folds to the bounded (day, type) table in one
    * counting shuffle; the trailing band is a ≤window-fan-out join of
    * that bounded table against its broadcast day spine (the q137
    * shape) — never a corpus-sized window. */
  def rollingAnomalies(spark: SparkSession, dir: String,
                       window: Int = 7, sigma: Double = 2.0,
                       minBaseline: Int = 3): DataFrame = {
    val daily = Tables.load(spark, dir, "events")
      .groupBy(date_trunc("day", col("ts")).as("d"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val target = daily.select(col("d").as("td"),
                              col("event_type").as("tt"),
                              col("n").as("tn"))
    target.join(broadcast(daily),
        col("event_type") === col("tt") &&
        col("d") < col("td") &&
        col("d") >= col("td") - expr(s"INTERVAL $window DAYS"))
      .groupBy(col("td"), col("tt"), col("tn"))
      .agg(count(lit(1)).as("nb"), sum(col("n")).as("s1"),
           // Σn² (and the s1² cross term below) in DECIMAL(38,0): the
           // q88 discipline — int64 n·n wraps past daily counts of
           // ~3e9 while DuckDB errors; decimal stays exact
           sum(col("n").cast("decimal(38,0)") * col("n")).as("s2"))
      .filter(col("nb") >= minBaseline)
      .withColumn("mean", col("s1").cast("double") / col("nb"))
      .withColumn("variance",
        (col("nb").cast("decimal(38,0)") * col("s2") -
         col("s1").cast("decimal(38,0)") * col("s1")).cast("double") /
          (col("nb") * col("nb")).cast("double"))
      .filter(col("variance") > 0)
      .withColumn("z", (col("tn") - col("mean")) / sqrt(col("variance")))
      .filter(abs(col("z")) >= sigma)
      .select(col("td").as("d"), col("tt").as("event_type"),
              col("tn").as("n"), round(col("mean"), 4).as("baseline_mean"),
              round(col("z"), 4).as("z"))
  }

  def rollingAnomaliesOracleSql(window: Int = 7, sigma: Double = 2.0,
                                minBaseline: Int = 3): String =
    s"""WITH daily AS (
       |  SELECT date_trunc('day', ts) AS d, event_type,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM events GROUP BY 1, 2),
       |stats AS (
       |  SELECT t.d AS td, t.event_type AS tt, t.n AS tn,
       |    count(*) AS nb,
       |    CAST(sum(b.n) AS BIGINT) AS s1,
       |    sum(CAST(b.n AS HUGEINT) * b.n) AS s2
       |  FROM daily t JOIN daily b
       |    ON b.event_type = t.event_type
       |   AND b.d < t.d AND b.d >= t.d - INTERVAL $window DAY
       |  GROUP BY t.d, t.event_type, t.n
       |  HAVING count(*) >= $minBaseline)
       |SELECT td AS d, tt AS event_type, tn AS n,
       |  round(CAST(s1 AS DOUBLE) / nb, 4) AS baseline_mean,
       |  round((tn - CAST(s1 AS DOUBLE) / nb) /
       |        sqrt(CAST(CAST(nb AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE) /
       |             CAST(nb * nb AS DOUBLE)), 4) AS z
       |FROM stats
       |WHERE CAST(CAST(nb AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE) > 0
       |  AND abs((tn - CAST(s1 AS DOUBLE) / nb) /
       |          sqrt(CAST(CAST(nb AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE) /
       |               CAST(nb * nb AS DOUBLE))) >= $sigma""".stripMargin

  /** Market-basket pairs over user behavior — for each event-type pair
    * (a < b): users doing both (support), and the directional
    * confidences P(b|a), P(a|b) plus lift — the association-rule
    * statistics, exact: supports are distinct-user counts (integers),
    * ratios are single double divisions rounded to 4.
    *
    * Scale: the corpus folds to the distinct (user, type) presence
    * table (one shuffle, map-side combine); the pair join fans out at
    * most |types| per user and the output is |types|² — the same
    * bounded-vocabulary discipline as q157's PMI. */
  def basketPairs(spark: SparkSession, dir: String): DataFrame = {
    val presence = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_type")).distinct()
    val counts = presence.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
    val nUsers = presence.select(col("user_id")).distinct()
      .agg(count(lit(1)).as("n_users"))
    val a = presence.join(broadcast(counts), Seq("event_type"))
      .select(col("user_id"), col("event_type").as("ta"),
              col("n").as("na"))
    val b = presence.join(broadcast(counts), Seq("event_type"))
      .select(col("user_id").as("u2"), col("event_type").as("tb"),
              col("n").as("nb"))
    a.join(b, col("user_id") === col("u2") && col("ta") < col("tb"))
      .groupBy(col("ta"), col("tb"), col("na"), col("nb"))
      .agg(count(lit(1)).as("n_both"))
      .crossJoin(broadcast(nUsers))
      .select(col("ta"), col("tb"), col("na"), col("nb"), col("n_both"),
        round(col("n_both") / col("na").cast("double"), 4)
          .as("conf_a_to_b"),
        round(col("n_both") / col("nb").cast("double"), 4)
          .as("conf_b_to_a"),
        round(col("n_both").cast("double") * col("n_users") /
              (col("na") * col("nb")).cast("double"), 4).as("lift"))
  }

  def basketPairsOracleSql(): String =
    """WITH presence AS (
      |  SELECT DISTINCT user_id, event_type FROM events),
      |counts AS (
      |  SELECT event_type, count(*) AS n FROM presence GROUP BY 1),
      |nu AS (SELECT count(DISTINCT user_id) AS n_users FROM presence)
      |SELECT a.event_type AS ta, b.event_type AS tb,
      |  ca.n AS na, cb.n AS nb, count(*) AS n_both,
      |  round(count(*) / CAST(ca.n AS DOUBLE), 4) AS conf_a_to_b,
      |  round(count(*) / CAST(cb.n AS DOUBLE), 4) AS conf_b_to_a,
      |  round(CAST(count(*) AS DOUBLE) * (SELECT n_users FROM nu)
      |        / CAST(ca.n * cb.n AS DOUBLE), 4) AS lift
      |FROM presence a
      |JOIN presence b ON a.user_id = b.user_id
      |  AND a.event_type < b.event_type
      |JOIN counts ca ON ca.event_type = a.event_type
      |JOIN counts cb ON cb.event_type = b.event_type
      |GROUP BY a.event_type, b.event_type, ca.n, cb.n""".stripMargin

  /** Week-over-week change report — weekly totals per type with the
    * percent change vs the prior week: DECIMAL weekly sums (exact),
    * one lag() over the bounded (week, type) table, one double
    * division rounded to 4. Weeks are Monday-started (`date_trunc
    * 'week'` in both engines). NULL change for each type's first week. */
  def weekOverWeek(spark: SparkSession, dir: String): DataFrame = {
    val weekly = Tables.load(spark, dir, "events")
      .groupBy(date_trunc("week", col("ts")).as("wk"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast("decimal(18,2)")).as("sv"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("wk"))
    weekly
      .withColumn("prev_sv", lag(col("sv"), 1).over(w))
      .select(col("wk"), col("event_type"), col("n"),
        round(col("sv").cast("double"), 2).as("sum_value"),
        round((col("sv") - col("prev_sv")).cast("double") /
              col("prev_sv").cast("double"), 4).as("wow_change"))
  }

  def weekOverWeekOracleSql(): String =
    """WITH weekly AS (
      |  SELECT date_trunc('week', ts) AS wk, event_type,
      |    count(*) AS n, sum(CAST(value AS DECIMAL(18,2))) AS sv
      |  FROM events GROUP BY 1, 2)
      |SELECT wk, event_type, n,
      |  round(CAST(sv AS DOUBLE), 2) AS sum_value,
      |  round(CAST(sv - lag(sv) OVER (PARTITION BY event_type
      |                                ORDER BY wk) AS DOUBLE) /
      |        CAST(lag(sv) OVER (PARTITION BY event_type ORDER BY wk)
      |             AS DOUBLE), 4) AS wow_change
      |FROM weekly""".stripMargin

  /** Stickiness curve — per day: DAU, trailing-7-day WAU (the q137
    * rolling distinct), and the DAU/WAU ratio ("how much of the weekly
    * audience shows up daily"), the engagement-quality metric next to
    * raw actives. Exact distinct counts, one double division @4dp.
    * Same scale shape as q137: dedup to (day,user), band-join the
    * bounded day spine. */
  def stickiness(spark: SparkSession, dir: String,
                 windowDays: Int = 7): DataFrame = {
    val du = Tables.load(spark, dir, "events")
      .select(date_trunc("day", col("ts")).as("d"), col("user_id"))
      .distinct()
    val dau = du.groupBy(col("d")).agg(countDistinct(col("user_id"))
      .as("dau"))
    val days = du.select(col("d").as("td")).distinct()
    val wau = du.join(broadcast(days),
        col("d") <= col("td") &&
        col("d") >= col("td") - expr(s"INTERVAL ${windowDays - 1} DAYS"))
      .groupBy(col("td"))
      .agg(countDistinct(col("user_id")).as("wau"))
    dau.join(wau, col("d") === col("td"))
      .select(col("d"), col("dau"), col("wau"),
              round(col("dau") / col("wau").cast("double"), 4)
                .as("stickiness"))
  }

  def stickinessOracleSql(windowDays: Int = 7): String =
    s"""WITH du AS (
       |  SELECT DISTINCT date_trunc('day', ts) AS d, user_id FROM events),
       |dau AS (SELECT d, count(DISTINCT user_id) AS dau FROM du GROUP BY d),
       |days AS (SELECT DISTINCT d AS td FROM du),
       |wau AS (
       |  SELECT td, count(DISTINCT user_id) AS wau
       |  FROM du JOIN days ON du.d <= days.td
       |    AND du.d >= days.td - INTERVAL ${windowDays - 1} DAY
       |  GROUP BY td)
       |SELECT d, dau, wau,
       |  round(dau / CAST(wau AS DOUBLE), 4) AS stickiness
       |FROM dau JOIN wau ON d = td""".stripMargin

  /** Time-to-convert distribution — for each click followed by the SAME
    * user's next purchase within `horizonHours`, the gap in seconds;
    * reported as per-horizon exact percentiles (p50/p90) plus pair
    * count and mean. Gaps come from the q46-shape banded pair join
    * (bounded fan-out); percentiles use the shared (n−1)·q
    * interpolation rule on exact integer seconds (the q54 discipline);
    * the mean divides an exact integer sum. */
  def timeToConvert(spark: SparkSession, dir: String,
                    horizonHours: Int = 1): DataFrame = {
    val clicks = Tables.load(spark, dir, "events")
      .filter(col("event_type") === "click")
      .select(col("user_id").as("cu"),
              unix_micros(col("ts").cast("timestamp")).as("cts"),
              col("event_id").as("cid"))
    val purchases = Tables.load(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"),
              unix_micros(col("ts").cast("timestamp")).as("pts"))
    val horizonUs = horizonHours * 3600L * 1000000L
    val gaps = clicks.join(purchases,
        col("cu") === col("pu") &&
        col("pts") >= col("cts") &&
        col("pts") <= col("cts") + lit(horizonUs))
      .groupBy(col("cu"), col("cts"), col("cid"))
      .agg(min(col("pts")).as("first_pts"))
      .select(((col("first_pts") - col("cts")) / 1000000L).cast("long")
                .as("gap_s"))
    gaps.agg(
        count(lit(1)).as("n_pairs"),
        round(sum(col("gap_s")).cast("double") / count(lit(1)), 4)
          .as("mean_s"),
        expr("percentile(gap_s, 0.5)").as("p50_s"),
        expr("percentile(gap_s, 0.9)").as("p90_s"))
  }

  def timeToConvertOracleSql(horizonHours: Int = 1): String =
    s"""WITH clk AS (SELECT user_id, ts, event_id FROM events
       |  WHERE event_type = 'click'),
       |pur AS (SELECT user_id, ts FROM events
       |  WHERE event_type = 'purchase'),
       |gaps AS (
       |  SELECT CAST(floor(epoch(min(p.ts) - c.ts)) AS BIGINT) AS gap_s
       |  FROM clk c JOIN pur p ON p.user_id = c.user_id
       |    AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL $horizonHours HOUR
       |  GROUP BY c.user_id, c.ts, c.event_id)
       |SELECT count(*) AS n_pairs,
       |  round(CAST(sum(gap_s) AS DOUBLE) / count(*), 4) AS mean_s,
       |  quantile_cont(gap_s, 0.5) AS p50_s,
       |  quantile_cont(gap_s, 0.9) AS p90_s
       |FROM gaps""".stripMargin

  /** Weekly cohort-retention matrix — the full triangle q91's two-point
    * day-1/day-7 summary samples from: users grouped by FIRST-active
    * week (cohort), and for each later week offset the fraction still
    * active. Exact: distinct (user, week) presence, min-week cohorts,
    * integer offsets from epoch-week arithmetic, one division @4dp.
    *
    * Scale: the corpus folds to distinct (user, week) in one shuffle
    * (map-side combine); cohorts are a min-per-user fold; the matrix
    * join is presence ⋈ broadcast cohort (user-keyed); output is
    * weeks × offsets — bounded. */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val uw = Tables.load(spark, dir, "events")
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      .distinct()
    val cohorts = uw.groupBy(col("user_id")).agg(min(col("wk")).as("cw"))
    val sizes = cohorts.groupBy(col("cw")).agg(count(lit(1)).as("cohort_n"))
    uw.join(broadcast(cohorts), Seq("user_id"))
      .withColumn("offset_w",
        ((unix_micros(col("wk").cast("timestamp")) -
          unix_micros(col("cw").cast("timestamp"))) /
         (7L * 86400L * 1000000L)).cast("long"))
      .groupBy(col("cw"), col("offset_w"))
      .agg(countDistinct(col("user_id")).as("active_n"))
      .join(broadcast(sizes), Seq("cw"))
      .select(col("cw").as("cohort_week"), col("offset_w"),
              col("cohort_n"), col("active_n"),
              round(col("active_n") / col("cohort_n").cast("double"), 4)
                .as("retention"))
  }

  def cohortRetentionOracleSql(): String =
    """WITH uw AS (
      |  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk
      |  FROM events),
      |cohorts AS (SELECT user_id, min(wk) AS cw FROM uw GROUP BY user_id),
      |sizes AS (SELECT cw, count(*) AS cohort_n FROM cohorts GROUP BY cw),
      |m AS (
      |  SELECT c.cw, CAST(date_diff('day', c.cw, uw.wk) // 7 AS BIGINT)
      |           AS offset_w,
      |    count(DISTINCT uw.user_id) AS active_n
      |  FROM uw JOIN cohorts c ON c.user_id = uw.user_id
      |  GROUP BY c.cw, date_diff('day', c.cw, uw.wk) // 7)
      |SELECT m.cw AS cohort_week, m.offset_w, s.cohort_n, m.active_n,
      |  round(m.active_n / CAST(s.cohort_n AS DOUBLE), 4) AS retention
      |FROM m JOIN sizes s ON s.cw = m.cw""".stripMargin

  def journeyTrigramsOracleSql(topK: Int = 20): String =
    s"""WITH seq AS (
       |  SELECT event_type AS t1,
       |    lead(event_type, 1) OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id) AS t2,
       |    lead(event_type, 2) OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id) AS t3
       |  FROM events)
       |SELECT t1 || '>' || t2 || '>' || t3 AS path, count(*) AS n
       |FROM seq WHERE t3 IS NOT NULL
       |GROUP BY 1 ORDER BY n DESC, path LIMIT $topK""".stripMargin
}
