package graft

/** Shuffle-BYTES regression gate over the heaviest declared queries
  * (VERDICT-r10 §next #7): `PlanAuditSpec` guards plan SHAPES (no
  * cartesians, no unexpected BNLJ), but a change can keep the shape and
  * silently double the exchange VOLUME — at 100 TB that is the difference
  * between a job that fits the shuffle tier and one that dies. Each row
  * runs the query at sf0.01 under a task-metrics listener and asserts its
  * shuffle-write bytes stay under a committed ceiling (~1.5× the measured
  * round-11 value — compression jitter never moves these fixed inputs more
  * than a few percent; a regression that trips +50% is structural, not
  * noise).
  *
  * The ceilings are per-query COMMITTED NUMBERS: when an intentional change
  * moves one, re-measure (the assertion message prints the observed bytes)
  * and update the table in the same commit — that's the point, byte
  * regressions become a reviewed diff instead of a bench wobble.
  */
class ByteAuditSpec extends SparkSpec {

  /** (query, sf0.01 shuffle-write ceiling in bytes). The ten heaviest rows
    * of BENCH_r10 by seconds.
    */
  private val ceilings: Seq[(String, Long)] = Seq(
    "minhash_pairs" -> 1095680L, // measured 728750 (r11)
    "simhash_pairs" -> 358400L, // measured 234256 (r11)
    // r13: keying the gram cache on the join key adds ONE explicit gram
    // exchange at every SF (the cache-build repartition). At sf0.01 the
    // gram frame is small enough that the old plan BROADCAST the self-join
    // (near-zero shuffle bytes); at sf0.1+ it never could — the keyed cache
    // halves the real shuffle there (2 join-side exchanges → 1 build
    // exchange, 56 MB read → local cache read). The sf0.01 ceiling moves up
    // accordingly; the sf0.1 row below is the one guarding the real shape.
    "substr_dedup" -> 3300000L, // measured 2199350 (r13; r11 194309, broadcast plan)
    "bm25_keyword" -> 573440L, // measured 378923 (r11)
    "boilerplate_para_scrub" -> 1474560L, // measured 981817 (r11)
    "boilerplate_coverage" -> 1597440L, // measured 1063485 (r11)
    "embed_neardup" -> 1187840L, // measured 787655 (r11)
    "resample_interp" -> 409600L, // measured 267350 (r11)
    "decontam_clean" -> 808960L, // measured 536900 (r11)
    "nn_join" -> 20480L) // measured 9177 (r11)

  private def shuffleBytesOf(fn: => Unit): Long = {
    val bytes = new java.util.concurrent.atomic.AtomicLong
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    // listener events are async: drain queued events from previous actions
    // before registering, and drain again before reading the counter
    org.apache.spark.sql.graft.Bridge.waitListenerBus(spark)
    spark.sparkContext.addSparkListener(l)
    try {
      fn
      org.apache.spark.sql.graft.Bridge.waitListenerBus(spark)
      bytes.get
    } finally spark.sparkContext.removeSparkListener(l)
  }

  /** One sf0.1 row per heavy family (VERDICT r11 #8): the sf0.01 ceilings
    * catch structural regressions, but a change whose cost hides inside the
    * tiny-SF constant terms (a broadcast flipping to shuffle under real
    * row counts, a pre-filter that stops pruning once the band tables grow)
    * only shows at 10×. Same committed-ceiling discipline, ~1.5× measured.
    */
  private val ceilingsSf01: Seq[(String, Long)] = Seq(
    // first three re-measured r13: the r12 numbers were recorded by the
    // interrupted r12 BUILD, before that round's signature kernels removed
    // the corpus-scale signature/tf exchanges — ceilings re-tightened to
    // ~1.5× today's measured values so the gate actually binds
    "minhash_pairs" -> 4400000L, // measured 2923408 (r13; r12 11453844)
    "bm25_keyword" -> 3010000L, // measured 2004878 (r13; r12 3749062)
    "boilerplate_coverage" -> 8460000L, // measured 5635755 (r13; r12 12776606)
    // the r13 rows: the rest of the bench's heavy-family head. substr_dedup
    // is the poster child — its r12 regression was TWO extra corpus-char-
    // sized exchanges (the un-keyed gram cache's self-join sides) that a
    // byte ceiling would have caught structurally, immune to host noise.
    "substr_dedup" -> 33000000L, // measured 21992592 (r13, keyed gram cache)
    "simhash_pairs" -> 2130000L, // measured 1416216 (r13)
    "decontam_pairs" -> 5200000L) // measured 3462379 (r13)

  private def auditRow(name: String, ceiling: Long, dir: String, sf: String): Unit =
    test(s"shuffle-byte ceiling: $name @ $sf") {
      val fn = SparkEntry.queries(name)
      val got = shuffleBytesOf {
        fn(spark, dir).write.mode("overwrite").format("noop").save()
      }
      if (sys.props.contains("graft.byteaudit.record"))
        info(f"MEASURED $name @ $sf: $got%d bytes (${got / 1e6}%.2f MB)")
      else
        assert(got <= ceiling,
          f"$name shuffled $got%d bytes (${got / 1e6}%.2f MB) > committed " +
            f"ceiling $ceiling%d (${ceiling / 1e6}%.2f MB) at $sf — if " +
            "intentional, re-measure with -Dgraft.byteaudit.record and " +
            "update the table in the same commit")
    }

  for ((name, ceiling) <- ceilingsSf01) auditRow(name, ceiling, sf01, "sf0.1")

  for ((name, ceiling) <- ceilings)
    test(s"shuffle-byte ceiling: $name") {
      val fn = SparkEntry.queries(name)
      val got = shuffleBytesOf {
        fn(spark, sf001).write.mode("overwrite").format("noop").save()
      }
      if (sys.props.contains("graft.byteaudit.record"))
        info(f"MEASURED $name: $got%d bytes (${got / 1e6}%.2f MB)")
      else
        assert(got <= ceiling,
          f"$name shuffled $got%d bytes (${got / 1e6}%.2f MB) > committed " +
            f"ceiling $ceiling%d (${ceiling / 1e6}%.2f MB) at sf0.01 — if " +
            "intentional, re-measure with -Dgraft.byteaudit.record and " +
            "update the table in the same commit")
    }
}
