package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.RangeJoin

/** Event-analytics and retrieval operators: cohort retention, histogram
  * binning, semi-structured (JSON) extraction, an inverted text index, and
  * BM25-ranked keyword retrieval.
  *
  * Oracle determinism (same discipline as CorpusStatsQueries): every float
  * crossing the hash gate is ONE IEEE-754 double operation on exact integer
  * inputs — BM25's score is a single division of two BIGINT-exact products
  * (the k1=5/4, b=3/4 parameters fold into integer arithmetic), histogram
  * bins floor one double division, and everything else is integer counts.
  * No libm, no float summation order.
  */
object AnalyticsQueries {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")

  /** events with `ts` normalized to int64 nanos (Tables.events handles the
    * driver's parquet encodings); DuckDB's µs clock is `ts div 1000`.
    */
  private def events(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)

  private def toks: Column = split(col("text"), " ")

  // ---- retention cohorts --------------------------------------------------

  private val DayUs = 86400000000L

  /** Classic cohort-retention matrix: users grouped by first-active day,
    * distinct active users per (cohort, age-in-days). All integer arithmetic
    * (µs ticks div'd to days).
    *
    * Scale: one user-keyed aggregation (first day), one user-keyed join
    * (both sides pre-shuffled on user_id — AQE plans it as one exchange
    * reuse), one (cohort, age) aggregation whose key space is tiny. The
    * distinct-user count is the only wide state; at 100 TB it would switch
    * to the KMV sketch (kmv_distinct) — exact here, where the gate demands
    * exactness.
    */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    // day = TRUNCATING division of the µs tick, matching the oracle's
    // integer `//` exactly: DuckDB's integer `//` truncates toward zero
    // just like Spark's `div` (measured on the oracle library:
    // (-1)//86400000000 = 0, not -1) — so the truncating form is the one
    // that stays hash-identical on pre-epoch timestamps too. (The ns→µs
    // step also truncates toward zero in BOTH engines.)
    val ev = events(spark, dir)
      .select(col("user_id"), expr(s"(ts div 1000) div $DayUs").as("day"))
    val cohort = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    ev.join(cohort, "user_id")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("age_days"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  val retentionCohortsSql: String =
    s"""WITH ev AS (
       |  SELECT user_id, epoch_us(ts) // $DayUs AS day FROM events),
       |c AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1)
       |SELECT c.cohort_day, ev.day - c.cohort_day AS age_days,
       |  count(DISTINCT ev.user_id) AS n_users
       |FROM ev JOIN c USING (user_id)
       |GROUP BY 1, 2""".stripMargin

  // ---- histogram binning --------------------------------------------------

  private val HistBinWidth = 25.0

  /** Fixed-width histogram over `events.value`: bin id, count, bin min/max.
    * The bin id is floor(value / 25.0) — one double division + floor, both
    * fully specified by IEEE-754, so the same everywhere; min/max of doubles
    * are order-independent (sum would not be).
    *
    * Scale: a single map-side-combinable aggregation on a bounded key space
    * — the canonical "histogram of a 100 TB column in one pass" shape.
    */
  def valueHistogram(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(floor(col("value") / HistBinWidth).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"), min(col("value")).as("vmin"),
        max(col("value")).as("vmax"))

  val valueHistogramSql: String =
    s"""SELECT CAST(floor(value / $HistBinWidth) AS BIGINT) AS bin,
       |  count(*) AS n, min(value) AS vmin, max(value) AS vmax
       |FROM events GROUP BY 1""".stripMargin

  // ---- semi-structured (JSON) extraction ----------------------------------

  /** Per-event-type stats over a field parsed OUT OF A JSON STRING column
    * (`props` = `{"k": <int>}`): the semi-structured path every event
    * pipeline needs. Spark side uses the real JSON parser
    * (`get_json_object`, codegen'd); the oracle replays the same extraction
    * with a regex, which is equivalent on this field and keeps the oracle
    * independent of DuckDB's JSON extension. The sum is over BIGINTs —
    * exact, order-free.
    */
  def jsonPropsStats(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), min(col("k")).as("k_min"),
        max(col("k")).as("k_max"), sum(col("k")).as("k_sum"),
        countDistinct(col("k")).as("k_distinct"))

  val jsonPropsStatsSql: String =
    """WITH e AS (
      |  SELECT event_type,
      |    CAST(NULLIF(regexp_extract(props, '"k": (-?\d+)', 1), '') AS BIGINT) AS k
      |  FROM events)
      |SELECT event_type, count(*) AS n, min(k) AS k_min, max(k) AS k_max,
      |  CAST(sum(k) AS BIGINT) AS k_sum, count(DISTINCT k) AS k_distinct
      |FROM e GROUP BY 1""".stripMargin

  // ---- inverted index ------------------------------------------------------

  private val IndexTerms = 5

  /** Posting lists for the corpus' top-5 terms (by total frequency, ties on
    * term): (term, doc_id, first_pos, tf) — the inverted-index build step of
    * a text search engine, exposed as rows so the gate can hash it.
    * Positions are 1-based.
    *
    * Scale: positions ride the explode (posexplode — no second tokenize
    * pass); the term-total aggregation is map-side combinable; the top-k
    * cut is a broadcast semi-join against a 5-row frame, so the posting
    * build shuffles only rows for indexed terms.
    */
  def invertedIndex(spark: SparkSession, dir: String): DataFrame = {
    val posts = docs(spark, dir)
      .select(col("doc_id"), posexplode(toks).as(Seq("pos", "term")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"), col("term"))
    val top = posts.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc).limit(IndexTerms)
      .select(col("term"))
    posts.join(broadcast(top), "term")
      .groupBy(col("term"), col("doc_id"))
      .agg(min(col("pos")).as("first_pos"), count(lit(1)).as("tf"))
  }

  val invertedIndexSql: String =
    s"""WITH p AS (
       |  SELECT doc_id, u.term, CAST(u.pos AS BIGINT) AS pos
       |  FROM documents,
       |    unnest(list_transform(string_split(text, ' '), (t, i) -> {'term': t, 'pos': i}))
       |      AS x(u)),
       |top AS (
       |  SELECT term FROM p GROUP BY term
       |  ORDER BY count(*) DESC, term ASC LIMIT $IndexTerms)
       |SELECT term, doc_id, min(pos) AS first_pos, count(*) AS tf
       |FROM p JOIN top USING (term)
       |GROUP BY term, doc_id""".stripMargin

  // ---- BM25 keyword retrieval ---------------------------------------------

  private val Bm25K = 10

  /** Top-10 documents per query term under BM25 (k1 = 5/4, b = 3/4), for the
    * corpus' 5 highest-df terms as the query set. The parameters are chosen
    * dyadic so the whole score folds into EXACT integer arithmetic with one
    * final double division:
    *
    *   score = 36·T·tf·(2N−2df+1) / ((2df+1)·(16·tf·T + 5·T + 15·dl·N))
    *
    * where N = #docs, T = total tokens, dl = doc length, tf/df as usual —
    * algebraically identical to idf_rational·tf·(k1+1)/(tf + k1(1−b+b·dl/avgdl))
    * with idf = (N−df+½)/(df+½) and avgdl = T/N. Rank ties break on doc_id.
    * (The classic ln-idf is monotone in this rational idf for fixed tf/dl,
    * and `ln` would hand the hash gate to libm — same trade as TF-IDF.)
    *
    * Scale: tf/df/dl are the inverted-index aggregations; the score join
    * keeps the query-term cut on the term exchange tf already paid
    * (ReusedExchange — broadcasting would recompute the tf subtree to
    * build the broadcast); top-k per term is a
    * rank window over term-partitioned scores (WindowGroupLimit pushes the
    * k cut into the sort). The integer products run in DECIMAL(38,0) —
    * BIGINT overflows around 10¹¹ total tokens once n_docs rides along —
    * then BOTH sides cast to double (round-to-nearest in every engine)
    * for the one division.
    */
  def bm25Keyword(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    // Document frequencies straight from in-row DISTINCT tokens: one
    // (term, count) aggregation with map-side combine — df(term) = number
    // of docs containing the term, identical to counting rows of a
    // (doc, term) tf table, but the corpus-scale (doc, dl, term) exchange
    // never happens for the df pass (the r11 plan computed the FULL tf
    // subtree twice — once for df, once for scoring — because the tiny
    // query-term set broadcast instead of reusing the term exchange).
    // widened: the tokenize+explode map cost must not inherit a narrow
    // small-file scan's parallelism (same rationale as Dedup.widened)
    val wide = graft.operators.Dedup.widened(d)
    val dfc = wide
      .select(explode(array_distinct(toks)).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val queryTerms = dfc.orderBy(col("df").desc, col("term").asc).limit(IndexTerms)
    // tf only for the query terms: the token stream is cut by a broadcast
    // join against the IndexTerms-row term set BEFORE the (doc, dl, term)
    // aggregation, so the exchange carries only matching tokens' partial
    // counts (guide §2.3: shuffle fewer bytes) instead of the whole
    // corpus's (doc, term) pairs. `df` rides the join and stays in the
    // grouping key (functionally dependent on term).
    val tf = wide
      .select(col("doc_id"), size(toks).cast("long").as("dl"),
        explode(toks).as("term"))
      .join(broadcast(queryTerms), "term")
      .groupBy(col("doc_id"), col("dl"), col("term"), col("df"))
      .agg(count(lit(1)).as("tf"))
    val totals = d.agg(count(lit(1)).as("n_docs"),
      sum(size(toks).cast("long")).as("t_tokens"))
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val scored = tf
      .crossJoin(broadcast(totals))
      .withColumn("score",
        (dec(lit(36L)) * dec(col("t_tokens")) * dec(col("tf")) *
          dec(lit(2L) * col("n_docs") - lit(2L) * col("df") + lit(1L))).cast("double") /
        ((dec(lit(2L) * col("df") + lit(1L)) *
          (dec(lit(16L)) * dec(col("tf")) * dec(col("t_tokens")) +
            dec(lit(5L)) * dec(col("t_tokens")) +
            dec(lit(15L)) * dec(col("dl")) * dec(col("n_docs")))).cast("double")))
    val w = Window.partitionBy(col("term"))
      .orderBy(col("score").desc, col("doc_id").asc)
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= Bm25K)
      .select(col("term"), col("doc_id"), col("tf"), col("df"),
        col("score"), col("rnk"))
  }

  val bm25KeywordSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, len(string_split(text, ' ')) AS dl,
       |    unnest(string_split(text, ' ')) AS term
       |  FROM documents),
       |tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM t GROUP BY 1, 2, 3),
       |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |q AS (SELECT term, df FROM dfc ORDER BY df DESC, term ASC LIMIT $IndexTerms),
       |tot AS (
       |  SELECT count(*) AS n_docs,
       |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS t_tokens
       |  FROM documents),
       |s AS (
       |  -- HUGEINT products (Spark side: DECIMAL(38,0)) then one double
       |  -- division of the two exactly-computed sides — BIGINT would
       |  -- overflow around 1e11 tokens once n_docs rides along
       |  SELECT tf.term, tf.doc_id, tf.tf, q.df,
       |    CAST(CAST(36 AS HUGEINT) * t_tokens * tf.tf
       |        * (2 * n_docs - 2 * q.df + 1) AS DOUBLE)
       |      / CAST((CAST(2 AS HUGEINT) * q.df + 1)
       |          * (CAST(16 AS HUGEINT) * tf.tf * t_tokens + 5 * t_tokens
       |              + 15 * tf.dl * n_docs) AS DOUBLE) AS score
       |  FROM tf JOIN q USING (term) CROSS JOIN tot),
       |r AS (
       |  SELECT *, row_number() OVER (PARTITION BY term
       |    ORDER BY score DESC, doc_id ASC) AS rnk FROM s)
       |SELECT term, doc_id, tf, df, score, rnk FROM r WHERE rnk <= $Bm25K""".stripMargin

  // ---- ordered funnel -----------------------------------------------------

  /** Strictly-ordered 3-step funnel (view → click → error) per user: the
    * first view, the first click AFTER it, the first error after THAT.
    * Event-sequence analytics in three user-keyed aggregations — left joins
    * keep users who stall mid-funnel (NULL later steps), and every timestamp
    * is exact µs integer arithmetic.
    *
    * Scale: all three joins and aggregations shuffle on user_id, so AQE
    * plans one exchange per side with reuse; no windows over the full event
    * stream, no per-user sorting (min beats sort for first-match).
    */
  def funnelSteps(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir).select(col("user_id"),
      col("event_type"), expr("ts div 1000").as("ts_us"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t1_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("__cu"), col("ts_us").as("__cts"))
    val s2 = v.join(clicks,
        v("user_id") === clicks("__cu") && col("__cts") > col("t1_us"), "left")
      .groupBy(col("user_id"), col("t1_us")).agg(min(col("__cts")).as("t2_us"))
    val errs = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("__eu"), col("ts_us").as("__ets"))
    s2.join(errs,
        s2("user_id") === errs("__eu") && col("__ets") > col("t2_us"), "left")
      .groupBy(col("user_id"), col("t1_us"), col("t2_us"))
      .agg(min(col("__ets")).as("t3_us"))
  }

  val funnelStepsSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS ts FROM events),
      |v AS (SELECT user_id, min(ts) AS t1 FROM ev
      |      WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT v.user_id, v.t1, min(e.ts) AS t2
      |      FROM v LEFT JOIN ev e ON e.user_id = v.user_id
      |        AND e.event_type = 'click' AND e.ts > v.t1
      |      GROUP BY 1, 2)
      |SELECT c.user_id, c.t1 AS t1_us, c.t2 AS t2_us, min(e.ts) AS t3_us
      |FROM c LEFT JOIN ev e ON e.user_id = c.user_id
      |  AND e.event_type = 'error' AND e.ts > c.t2
      |GROUP BY 1, 2, 3""".stripMargin

  // ---- event-type co-occurrence (market-basket lift) ----------------------

  /** Association mining over per-user event baskets: for every unordered
    * event-type pair, how many users did both, and the lift
    * `P(a∧b) / (P(a)·P(b))` — the signal a behavioral pipeline uses to find
    * correlated actions. Exact arithmetic: integer counts, ONE double
    * division (`(n_both·n_users) / (n_a·n_b)`), so the frame hash-replays.
    *
    * Scale: baskets = one distinct over (user, type) — user-keyed shuffle
    * with map-side partials; the pair self-join is per-user over that
    * user's DISTINCT types (bounded by the type vocabulary, not event
    * count); per-type counts broadcast back onto the (tiny) pair table.
    */
  def eventCooccurrence(spark: SparkSession, dir: String): DataFrame = {
    val baskets = events(spark, dir)
      .select(col("user_id"), col("event_type")).distinct()
    // one lazy scalar folded in via broadcast — not a driver-side action
    val nUsers = baskets.select(col("user_id")).distinct()
      .agg(count(lit(1)).as("n_users"))
    val perType = baskets.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val pairs = baskets.as("x").join(baskets.as("y"), "user_id")
      .filter(col("x.event_type") < col("y.event_type"))
      .groupBy(col("x.event_type").as("type_a"), col("y.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(perType.select(col("event_type").as("type_a"), col("n").as("n_a"))), "type_a")
      .join(broadcast(perType.select(col("event_type").as("type_b"), col("n").as("n_b"))), "type_b")
      .crossJoin(broadcast(nUsers))
      .select(col("type_a"), col("type_b"), col("n_both"), col("n_a"), col("n_b"),
        ((col("n_both") * col("n_users")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("lift"))
  }

  val eventCooccurrenceSql: String =
    """WITH b AS (SELECT DISTINCT user_id, event_type FROM events),
      |t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY 1),
      |u AS (SELECT count(DISTINCT user_id) AS nu FROM events),
      |p AS (SELECT x.event_type AS type_a, y.event_type AS type_b,
      |        CAST(count(*) AS BIGINT) AS n_both
      |      FROM b x JOIN b y ON x.user_id = y.user_id
      |        AND x.event_type < y.event_type
      |      GROUP BY 1, 2)
      |SELECT p.type_a, p.type_b, p.n_both, ta.n AS n_a, tb.n AS n_b,
      |  CAST(p.n_both * u.nu AS DOUBLE) / CAST(ta.n * tb.n AS DOUBLE) AS lift
      |FROM p
      |JOIN t ta ON ta.event_type = p.type_a
      |JOIN t tb ON tb.event_type = p.type_b
      |CROSS JOIN u""".stripMargin

  // ---- concurrent sessions (interval×interval overlap join) ---------------

  private val SessionBinMs = 3600000L // 1 h bins over session [start,end] ms

  /** Per-session concurrency: how many OTHER sessions (any user) overlap
    * this session's [start_ms, end_ms] — the interval×interval twin of
    * `concurrent_events`, routed through `RangeJoin.intervalInterval` so the
    * keyless overlap self-join is a binned equi-join instead of a cartesian
    * product. The self-pair is kept through the join (every session overlaps
    * itself, so every session survives the groupBy) and subtracted.
    */
  def concurrentSessions(spark: SparkSession, dir: String): DataFrame = {
    // the session frame feeds BOTH sides of the interval self-join, whose
    // plan subtrees are separate — without materialization the sessionize
    // window pipeline runs twice, concurrently, over the full event stream
    // (measured as the two largest stages of this query at sf0.1).
    // localCheckpoint: one row per session, the standard small-frame
    // materialization (see Dedup.released's trade-off note).
    val s = RelationalQueries.sessionizeBatch(spark, dir)
      .select(col("user_id"), col("session_idx"),
        col("start_ms"), col("end_ms"))
      .localCheckpoint()
    val b = s.select(col("user_id").as("__bu"), col("session_idx").as("__bs"),
      col("start_ms").as("__blo"), col("end_ms").as("__bhi"))
    RangeJoin.intervalInterval(s, "start_ms", "end_ms",
        b, "__blo", "__bhi", SessionBinMs)
      .groupBy(col("user_id"), col("session_idx"))
      .agg((count(lit(1)) - 1).as("n_overlap"))
  }

  val concurrentSessionsSql: String =
    """WITH o AS (
      |  SELECT user_id, event_id, ts,
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev
      |  FROM events),
      |x AS (
      |  SELECT user_id, ts,
      |    sum(CASE WHEN prev IS NULL OR epoch_ns(ts) - epoch_ns(prev) > 1800000000000
      |             THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
      |  FROM o),
      |s AS (
      |  SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
      |    epoch_ms(min(ts)) AS start_ms, epoch_ms(max(ts)) AS end_ms
      |  FROM x GROUP BY 1, 2)
      |SELECT a.user_id, a.session_idx, count(*) - 1 AS n_overlap
      |FROM s a JOIN s b
      |  ON a.start_ms <= b.end_ms AND b.start_ms <= a.end_ms
      |GROUP BY 1, 2""".stripMargin

  // ---- CUBE aggregation ----------------------------------------------------

  /** Corpus composition at every (lang, source) granularity in one pass —
    * GROUP BY CUBE, the OLAP rollup surface (Spark expands to grouping
    * sets; partial aggregation still combines map-side). Counts and BIGINT
    * sums only.
    */
  def cubeDocCounts(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .cube(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))

  val cubeDocCountsSql: String =
    """SELECT lang, source, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM documents GROUP BY CUBE (lang, source)""".stripMargin

  // ---- regular-grid resampling (gap fill + carry forward) ----------------

  /** Hourly per-user resampling of the event stream through the
    * `Resample.carryForwardGrid` operator: every (user, hour) cell between
    * the user's first and last activity, event count per cell (0 on gaps),
    * last observed `value` carried forward. The in-cell winner picks by
    * (ts, event_id) — deterministic; the carried value is a raw column
    * passthrough, so the whole frame hash-replays. Scale notes on the
    * operator; the grid here is users × ~700 h.
    */
  def resampleHourly(spark: SparkSession, dir: String): DataFrame = {
    val hourNs = 3600000000000L
    graft.operators.Resample.carryForwardGrid(
        events(spark, dir), "user_id", "ts", "event_id", "value", hourNs)
      .select(col("user_id"), (col("bin") * 3600000L).as("hour_ms"),
        col("n_events"), col("value"))
  }

  val resampleHourlySql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_ns(ts) // 3600000000000 AS bin, value,
      |    row_number() OVER (PARTITION BY user_id, epoch_ns(ts) // 3600000000000
      |                       ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events),
      |c AS (SELECT user_id, bin, count(*) AS n,
      |        max(CASE WHEN rn = 1 THEN value END) AS v
      |      FROM e GROUP BY 1, 2),
      |b AS (SELECT user_id, min(bin) AS b0, max(bin) AS b1 FROM c GROUP BY 1),
      |s AS (SELECT user_id, unnest(generate_series(b0, b1)) AS bin FROM b),
      |j AS (SELECT s.user_id, s.bin, coalesce(c.n, 0) AS n_events, c.v
      |      FROM s LEFT JOIN c USING (user_id, bin))
      |SELECT user_id, bin * 3600000 AS hour_ms,
      |  CAST(n_events AS BIGINT) AS n_events,
      |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY bin
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value
      |FROM j""".stripMargin

  // ---- snapshot diff (CDC between time halves) ---------------------------

  /** Per-user state diff between the event stream's first and second time
    * halves: latest (event_type, value) per user in each half, classified
    * added / removed / changed by `SnapshotDiff.diff` (unchanged users are
    * suppressed — the CDC contract: output is proportional to churn).
    * Midpoint and in-half winners are exact integer/tick math, so the full
    * frame hash-replays.
    */
  def stateDiff(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val b = ev.agg(min(col("ts")).as("t0"), max(col("ts")).as("t1"))
      .select(expr("t0 + (t1 - t0) div 2").as("mid")) // t0+t1 would overflow ns
    val e = ev.crossJoin(broadcast(b))
    def latest(half: Column): DataFrame = e.filter(half)
      .groupBy(col("user_id"))
      .agg(max_by(struct(col("event_type"), col("value")),
        struct(col("ts"), col("event_id"))).as("st"))
      .select(col("user_id"), col("st.event_type").as("event_type"),
        col("st.value").as("value"))
    graft.operators.SnapshotDiff.diff(
      latest(col("ts") < col("mid")), latest(col("ts") >= col("mid")),
      "user_id", Seq("event_type", "value"))
  }

  val stateDiffSql: String =
    """WITH b AS (
      |  SELECT min(epoch_ns(ts)) + (max(epoch_ns(ts)) - min(epoch_ns(ts))) // 2 AS mid
      |  FROM events),
      |e AS (SELECT user_id, event_type, value, epoch_ns(ts) AS tn, event_id
      |      FROM events),
      |o AS (SELECT user_id, event_type, value FROM (
      |    SELECT user_id, event_type, value,
      |      row_number() OVER (PARTITION BY user_id ORDER BY tn DESC, event_id DESC) AS rn
      |    FROM e, b WHERE tn < mid) WHERE rn = 1),
      |n AS (SELECT user_id, event_type, value FROM (
      |    SELECT user_id, event_type, value,
      |      row_number() OVER (PARTITION BY user_id ORDER BY tn DESC, event_id DESC) AS rn
      |    FROM e, b WHERE tn >= mid) WHERE rn = 1),
      |d AS (
      |  SELECT coalesce(o.user_id, n.user_id) AS user_id,
      |    CASE WHEN o.user_id IS NULL THEN 'added'
      |         WHEN n.user_id IS NULL THEN 'removed'
      |         WHEN o.event_type IS DISTINCT FROM n.event_type
      |           OR o.value IS DISTINCT FROM n.value THEN 'changed' END AS status,
      |    o.event_type AS old_event_type, o.value AS old_value,
      |    n.event_type AS new_event_type, n.value AS new_value
      |  FROM o FULL JOIN n ON o.user_id = n.user_id)
      |SELECT * FROM d WHERE status IS NOT NULL""".stripMargin

  // ---- pivot (wide per-entity feature row) -------------------------------

  /** Per-user event-type count matrix — the `pivot` relational operator
    * producing the wide feature row a training pipeline feeds downstream.
    * The value domain is EXPLICIT (the five event types): Spark skips the
    * extra distinct-values job and the output schema is fixed at plan time
    * — at 100 TB an implicit pivot would first scan everything just to
    * discover columns. One shuffle (user_id), map-side partial counts.
    */
  def eventTypePivot(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "view", "signup", "purchase", "error"))
      .agg(count(lit(1)))
      // scoped fill: an unscoped fill(0) would also rewrite a null GROUP KEY
      // to user_id=0, silently colliding with a real user
      .na.fill(0L, Seq("click", "view", "signup", "purchase", "error"))

  val eventTypePivotSql: String =
    """SELECT user_id,
      |  CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS click,
      |  CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS view,
      |  CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
      |  CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
      |  CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS error
      |FROM events GROUP BY user_id""".stripMargin

  /** Linear-interpolation twin of `resample_hourly`: gap cells take the
    * straight line between their nearest observed neighbors — fixed-order
    * per-row IEEE arithmetic, so the frame hash-replays.
    */
  def resampleInterp(spark: SparkSession, dir: String): DataFrame = {
    val hourNs = 3600000000000L
    graft.operators.Resample.interpolateGrid(
        events(spark, dir), "user_id", "ts", "event_id", "value", hourNs)
      .select(col("user_id"), (col("bin") * 3600000L).as("hour_ms"),
        col("n_events"), col("value"))
  }

  val resampleInterpSql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_ns(ts) // 3600000000000 AS bin, value,
      |    row_number() OVER (PARTITION BY user_id, epoch_ns(ts) // 3600000000000
      |                       ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events),
      |c AS (SELECT user_id, bin, count(*) AS n,
      |        max(CASE WHEN rn = 1 THEN value END) AS v
      |      FROM e GROUP BY 1, 2),
      |b AS (SELECT user_id, min(bin) AS b0, max(bin) AS b1 FROM c GROUP BY 1),
      |s AS (SELECT user_id, unnest(generate_series(b0, b1)) AS bin FROM b),
      |j AS (SELECT s.user_id, s.bin, coalesce(c.n, 0) AS n_events, c.v
      |      FROM s LEFT JOIN c USING (user_id, bin)),
      |w AS (
      |  SELECT user_id, bin, n_events,
      |    last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY bin
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
      |    last_value(CASE WHEN v IS NOT NULL THEN bin END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY bin
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb,
      |    first_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY bin
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
      |    first_value(CASE WHEN v IS NOT NULL THEN bin END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY bin
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
      |  FROM j)
      |SELECT user_id, bin * 3600000 AS hour_ms,
      |  CAST(n_events AS BIGINT) AS n_events,
      |  CASE WHEN nb = pb THEN pv
      |       ELSE pv + (nv - pv) * (bin - pb) / (nb - pb) END AS value
      |FROM w""".stripMargin

  // ---- exact-arithmetic outlier flags -------------------------------------

  /** Per-type z-score outlier flags over the JSON `props.k` field, in the
    * EXACT integer form 4·(n·k − S1)² > 9·(n·S2 − S1²) — i.e. |k − μ| >
    * 1.5σ with the mean and variance never materialized as floats (see
    * `Outliers.zScoreFlags`). 1.5σ because the field is uniform 0..99
    * (max |z| ≈ 1.7): the tails flag, the bulk doesn't, and the threshold
    * algebra is exercised with a non-integral rational.
    */
  def outlierEvents(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir).select(col("event_id"), col("event_type"),
      get_json_object(col("props"), "$.k").cast("long").as("k"))
    graft.operators.Outliers.zScoreFlags(ev, "event_type", "k", 3, 2)
      .select(col("event_id"), col("event_type"), col("k"), col("is_outlier"))
  }

  /** Same algebra over HUGEINT (int128) — exact on both engines. */
  val outlierEventsSql: String =
    """WITH k AS (SELECT event_id, event_type,
      |    -- NULLIF: a row without the field extracts '' and CAST('') errors;
      |    -- Spark's get_json_object yields NULL there — align the engines
      |    CAST(NULLIF(regexp_extract(props, '"k":\s*(-?\d+)', 1), '') AS BIGINT) AS k
      |  FROM events),
      |s AS (SELECT event_type, count(k) AS n, sum(k) AS s1, sum(k*k) AS s2
      |  FROM k GROUP BY 1)
      |SELECT k.event_id, k.event_type, k.k,
      |  CAST(CASE WHEN
      |      4 * CAST(n*k.k - s1 AS HUGEINT) * CAST(n*k.k - s1 AS HUGEINT)
      |      > 9 * (CAST(n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1)
      |    THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
      |FROM k LEFT JOIN s USING (event_type)""".stripMargin

  /** Robust quartile-fence outliers over per-doc length, per language —
    * the heavy-tail-safe counterpart to `outlier_events` (see
    * `Outliers.iqrFlags`). Fence multiplier 1/2 (an inner fence: this
    * corpus has no 1.5·IQR tails) exercises the rational algebra with a
    * non-trivial denominator.
    */
  def outlierIqr(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Outliers.iqrFlags(
        docs(spark, dir).select(col("doc_id"), col("lang"), col("n_chars")),
        "lang", "n_chars", mNumer = 1, mDenom = 2)
      .select(col("doc_id"), col("lang"), col("n_chars"), col("is_outlier"))

  /** Same rank selection (k = ⌈q·n⌉) and cleared-denominator fence. The
    * stats CTE excludes NULL value/key rows exactly as the operator does
    * (they'd otherwise rank last and inflate cnt, shifting k); the final
    * projection still emits every doc — NULL comparisons fall to flag 0
    * on both engines.
    */
  val outlierIqrSql: String =
    """WITH t AS (
      |  SELECT doc_id, lang, n_chars,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY n_chars ASC, doc_id ASC) AS rnk,
      |    count(*) OVER (PARTITION BY lang) AS cnt
      |  FROM documents
      |  WHERE n_chars IS NOT NULL AND lang IS NOT NULL),
      |s AS (SELECT lang,
      |    min(CASE WHEN rnk = (cnt + 3) // 4 THEN n_chars END) AS p25,
      |    min(CASE WHEN rnk = (cnt * 3 + 3) // 4 THEN n_chars END) AS p75
      |  FROM t GROUP BY lang)
      |SELECT d.doc_id, d.lang, d.n_chars,
      |  CAST(CASE WHEN 2 * d.n_chars > 2 * p75 + 1 * (p75 - p25)
      |         OR 2 * d.n_chars < 2 * p25 - 1 * (p75 - p25)
      |    THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
      |FROM documents d LEFT JOIN s USING (lang)""".stripMargin

  /** Rate-spike detection — windowed counts composed with the exact
    * z-score flags: hourly event counts per type, each hour flagged
    * against its type's own rate distribution. The operator-composition
    * shape of a monitoring pipeline (aggregate → flag), all integer-exact
    * end to end.
    */
  def hourlyAnomalies(spark: SparkSession, dir: String): DataFrame = {
    val hourly = events(spark, dir)
      .groupBy((expr("ts div 3600000000000") * 3600000L).as("hour_ms"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
    graft.operators.Outliers.zScoreFlags(hourly, "event_type", "n", 3, 2)
      .select(col("event_type"), col("hour_ms"), col("n"), col("is_outlier"))
  }

  // hour bucket = TRUNCATING division of the ns tick on BOTH sides (Spark
  // `div`, DuckDB integer `//` — see retentionCohorts), NOT date_trunc:
  // date_trunc floors, which diverges from `div` on pre-epoch timestamps.
  val hourlyAnomaliesSql: String =
    """WITH h AS (
      |  SELECT event_type, epoch_ns(ts) // 3600000000000 * 3600000 AS hour_ms,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |s AS (SELECT event_type, count(n) AS cnt, sum(n) AS s1, sum(n*n) AS s2
      |  FROM h GROUP BY 1)
      |SELECT h.event_type, h.hour_ms, h.n,
      |  CAST(CASE WHEN
      |      4 * CAST(cnt*h.n - s1 AS HUGEINT) * CAST(cnt*h.n - s1 AS HUGEINT)
      |      > 9 * (CAST(cnt AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1)
      |    THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
      |FROM h LEFT JOIN s USING (event_type)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "hourly_anomalies" -> (hourlyAnomalies(_, _)),
    "outlier_iqr" -> (outlierIqr(_, _)),
    "outlier_events" -> (outlierEvents(_, _)),
    "resample_interp" -> (resampleInterp(_, _)),
    "event_cooccurrence" -> (eventCooccurrence(_, _)),
    "state_diff" -> (stateDiff(_, _)),
    "event_type_pivot" -> (eventTypePivot(_, _)),
    "resample_hourly" -> (resampleHourly(_, _)),
    "retention_cohorts" -> (retentionCohorts(_, _)),
    "value_histogram" -> (valueHistogram(_, _)),
    "json_props_stats" -> (jsonPropsStats(_, _)),
    "inverted_index" -> (invertedIndex(_, _)),
    "bm25_keyword" -> (bm25Keyword(_, _)),
    "funnel_steps" -> (funnelSteps(_, _)),
    "concurrent_sessions" -> (concurrentSessions(_, _)),
    "cube_doc_counts" -> (cubeDocCounts(_, _)))

  val oracles: Map[String, String] = Map(
    "hourly_anomalies" -> hourlyAnomaliesSql,
    "outlier_iqr" -> outlierIqrSql,
    "outlier_events" -> outlierEventsSql,
    "resample_interp" -> resampleInterpSql,
    "event_cooccurrence" -> eventCooccurrenceSql,
    "state_diff" -> stateDiffSql,
    "event_type_pivot" -> eventTypePivotSql,
    "resample_hourly" -> resampleHourlySql,
    "retention_cohorts" -> retentionCohortsSql,
    "value_histogram" -> valueHistogramSql,
    "json_props_stats" -> jsonPropsStatsSql,
    "inverted_index" -> invertedIndexSql,
    "bm25_keyword" -> bm25KeywordSql,
    "funnel_steps" -> funnelStepsSql,
    "concurrent_sessions" -> concurrentSessionsSql,
    "cube_doc_counts" -> cubeDocCountsSql)
}
