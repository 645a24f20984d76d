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
    "substr_dedup" -> 296960L, // measured 194309 (r11)
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
    "minhash_pairs" -> 17180000L, // measured 11453844 (r12)
    "bm25_keyword" -> 5620000L, // measured 3749062 (r12)
    "boilerplate_coverage" -> 19160000L) // measured 12776606 (r12)

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
