package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR,
  * forcing full materialization through the noop sink (no collect, no
  * driver-side bottleneck), and prints ONE JSON line for the driver.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    // the f"" interpolator is locale-sensitive: a comma-decimal default
    // locale (de_DE, fr_FR, ...) would turn every number in the JSON lines
    // below into invalid JSON — pin ROOT before any formatting
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // SPARK_GRAFT_EVENTLOG=<dir>: write the Spark event log for offline
    // stage-level profiling (local diagnosis aid; driver never sets it)
    val spark = sys.env.get("SPARK_GRAFT_EVENTLOG").fold(builder) { d =>
      builder.config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", d)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
    }.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Per-query isolation is the DEFAULT: drop cached relations and any
    // leftover RDD blocks between queries. Operators release their own
    // corpus-scale caches eagerly now, but one leaked cache degrades every
    // later query in the shared session (r4 measured 10-80x per-query
    // GC-thrash degradation from exactly this). SPARK_GRAFT_SHARECACHE=1
    // restores the shared-session measurement for local comparison.
    val clearCache = !sys.env.get("SPARK_GRAFT_SHARECACHE").contains("1")
    // Best-of-N timing (default 2, SPARK_GRAFT_RUNS overrides): the bench
    // host is shared infrastructure — a single-shot measurement bakes
    // transient co-tenant contention into individual queries (observed:
    // 20-30x on unchanged plain aggregations in one run, gone on re-run).
    // The min across reps is the standard noisy-host estimator of what the
    // query actually costs; caches are cleared before every rep, so reps
    // re-do the full work rather than replaying a cache.
    // Default 3: with best-of-2, a single contended window (observed: 18 s
    // best-of-2 on a query that costs 1.6 s best-of-3 minutes later on the
    // same host) still lands in the round record; a third rep makes the min
    // robust to one bad window per query at ~50% extra wall clock.
    val runs = sys.env.get("SPARK_GRAFT_RUNS")
      .flatMap(s => scala.util.Try(s.toInt).toOption).filter(_ >= 1).getOrElse(3)
    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      if (clearCache) {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
      // label every job this query spawns (guide §1.5) so event-log/UI
      // profiling can attribute stages to queries; cleared after the rep
      spark.sparkContext.setJobDescription(s"bench:$name")
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      finally spark.sparkContext.setJobDescription(null)
      (System.nanoTime() - t0) / 1e9
    }
    // ---- stall detection. Three driver rounds in a row the OFFICIAL bench
    // artifact was contaminated by host stalls (co-tenant bursts covering
    // entire query windows: r9's dsir_select read 18.2 s with ALL reps
    // inside the stall vs 0.97 s quiet). min-of-reps only survives a stall
    // that misses at least one rep, so two independent defenses:
    //  (1) a micro-canary — a fixed ~50 ms all-core Spark job timed right
    //      after each rep; if the canary itself runs >3x its start-of-run
    //      calibration, the host was contended DURING that rep, and the rep
    //      is retried regardless of what its siblings read (catches the
    //      all-reps-slow case sibling statistics cannot);
    //  (2) sibling-median outliers — any rep >3x the median of the others
    //      is retried (catches a stall the canary window happened to miss).
    // Retries are capped (default 4/query) and counted into the artifact as
    // stall_retries so a reader can see exactly where the protocol fired.
    def canaryOnce(): Double = {
      val t0 = System.nanoTime()
      // all-core arithmetic scan: sensitive to co-tenant CPU pressure the
      // way real queries are (a single-thread busy loop is not). pmod keeps
      // the SUM bounded — 64M raw products overflow long under ANSI mode
      spark.range(0L, 64000000L, 1L, cpus.toInt)
        .selectExpr("sum(pmod(id * 2654435761 + 17, 1048576))").collect()
      (System.nanoTime() - t0) / 1e9
    }
    val canaryBase = { canaryOnce(); (1 to 5).map(_ => canaryOnce()).min } // first rep = warmup
    val stallK = 3.0
    val maxRetries = sys.env.get("SPARK_GRAFT_STALL_RETRIES")
      .flatMap(s => scala.util.Try(s.toInt).toOption).getOrElse(4)
    val repLog = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    val retryLog = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def time(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      // each rep: (seconds, canary-clean). Failed reps (-1) never retry.
      def rep(): (Double, Boolean) = {
        val t = timeOnce(name, fn)
        val clean = t < 0 || canaryOnce() <= stallK * canaryBase
        (t, clean)
      }
      var ts = (1 to runs).map(_ => rep()).toVector
      var retries = 0
      def suspect(i: Int): Boolean = {
        val (t, clean) = ts(i)
        if (t < 0) false
        else if (!clean) true
        else {
          val sibs = ts.zipWithIndex.collect { case ((s, _), j) if j != i && s >= 0 => s }
          if (sibs.isEmpty) false
          else {
            val sorted = sibs.sorted
            val med = sorted(sorted.size / 2)
            t > stallK * med && t - med > 0.25 // absolute floor: sub-second jitter is not a stall
          }
        }
      }
      var i = ts.indices.find(suspect)
      while (i.isDefined && retries < maxRetries) {
        retries += 1
        ts = ts.updated(i.get, rep())
        i = ts.indices.find(suspect)
      }
      if (retries > 0) retryLog(name) = retries
      repLog(name) = ts.map(_._1)
      val ok = ts.filter(_._1 >= 0)
      if (ok.isEmpty) return -1.0
      // headline = min over canary-clean reps when any exist (a stalled
      // rep's wall time is an artifact of the host, not the plan)
      val pool = { val clean = ok.filter(_._2); if (clean.nonEmpty) clean else ok }
      val sec = pool.map(_._1).min
      System.err.println(f"[bench] $name: $sec%.2f s" +
        (if (ts.size > 1) ts.map(t => f"${t._1}%.2f").mkString(" (reps: ", " ", ")") else "") +
        (if (retries > 0) s" [stall retries: $retries]" else ""))
      sec
    }

    // JVM/codegen warmup on the cheapest query, not counted.
    SparkEntry.queries.get("point_lookup")
      .foreach(fn => try fn(spark, sfDir).count() catch { case _: Throwable => () })

    // ---- environment fingerprint (host-wobble forensics, recorded IN the
    // round artifact so cross-round comparisons can be qualified without
    // a re-bench): 1-minute load average at start, count of OTHER resident
    // JVMs (stale sbt/spark daemons compete for the same cores), and a
    // fixed 3-rep sentinel (tpch q7 — code untouched for many rounds) whose
    // reps calibrate this window against previous rounds' recorded values.
    val loadAvg = scala.util.Try(
      scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0).toDouble
    ).getOrElse(-1.0)
    // `|| true`: grep -c exits 1 on ZERO matches, which would turn a
    // clean host into the -1 "probe failed" sentinel; and subtract this
    // JVM only when it was actually counted — i.e. only when OUR comm is
    // "java" (under a non-java launcher with one co-tenant java daemon,
    // unconditional n-1 would falsely report a clean host)
    val otherJvms = scala.util.Try {
      import scala.sys.process._
      val n = Seq("sh", "-c", "ps -e -o comm= | grep -c '^java$' || true")
        .!!.trim.toInt
      // /proc/self/comm is Linux-only; elsewhere fall back to the portable
      // ProcessHandle command (defaulting false would count our own JVM in
      // other_jvms and falsely report a contended host)
      val selfIsJava = scala.util.Try(
        scala.io.Source.fromFile("/proc/self/comm").mkString.trim == "java"
      ).orElse(scala.util.Try {
        val cmd = ProcessHandle.current().info().command()
        cmd.isPresent && {
          val base = cmd.get.substring(cmd.get.lastIndexOf('/') + 1)
          base == "java" || base == "java.exe"
        }
      }).getOrElse(false)
      if (selfIsJava && n > 0) n - 1 else n
    }.getOrElse(-1)
    val sentinel = SparkEntry.queries.get("q7_volume_shipping").map { fn =>
      (1 to 3).map(_ => timeOnce("__sentinel_q7", fn))
    }.getOrElse(Seq.empty)

    // SPARK_GRAFT_ONLY=q1,q2 restricts the run (local iteration aid; the
    // driver never sets it, so round benches always cover every query)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) => name -> time(name, fn) }
    def fmt(v: Double): String = if (v < 0) "-1" else f"$v%.3f"
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // per-rep times ride in the persisted record: a reader can tell a slow
    // QUERY (all reps slow) from one contended rep (min fine, max wild)
    // without a rerun — the r6 record's apparent regressions were exactly
    // this ambiguity
    val reps = repLog.map { case (k, ts) =>
      "\"" + k + "\":[" + ts.map(fmt).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val envJson = f""""env":{"loadavg1":$loadAvg%.2f,"other_jvms":$otherJvms,""" +
      f""""canary_base":$canaryBase%.3f,""" +
      s""""sentinel_q7":[${sentinel.map(fmt).mkString(",")}]}"""
    val retriesJson = retryLog.map { case (k, n) => "\"" + k + "\":" + n }
      .mkString("{", ",", "}")
    val full = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"reps":$reps,"stall_retries":$retriesJson,$envJson,"sf":"$sfDir"}"""
    // The driver parses a ~2 KiB tail of the run output; with 112 queries
    // the full per-query line is ~3 KiB and its head gets truncated away
    // (r5's bench came back parsed:null). So: full record to BENCH.out and
    // stdout for humans, then a compact line LAST — total plus the slowest
    // queries — sized to always land complete inside the tail capture.
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH.out"),
      (full + "\n").getBytes("UTF-8"))
    println(full)
    // The compact line's query set is the top-15 slowest UNION a FIXED
    // tracked set (the union of the r11 and r12 top-15s): with top-15-only,
    // a query that an optimization round SPEEDS UP falls out of the line and
    // the round-over-round diff reports it as "dropped_from_bench" (r12 PERF
    // showed 7 such phantom drops — six of them exactly the queries that
    // round optimized). The tracked set keeps the heavy families comparable
    // across rounds regardless of rank churn; additions-only, ~23 extra
    // entries ≈ 600 B, still safely inside the driver's ~2 KiB tail capture.
    val tracked = Set(
      "bm25_keyword", "boilerplate_coverage", "boilerplate_para_coverage",
      "boilerplate_para_scrub", "boilerplate_scrub", "cms_token_freq",
      "concurrent_sessions", "decontam_clean", "decontam_pairs",
      "embed_neardup", "event_type_pivot", "events_hourly", "graph_knn",
      "image_features", "minhash_pairs", "nn_join", "resample_interp",
      "rollup_revenue", "simhash_pairs", "substr_dedup", "window_running",
      "zorder3_key")
    val ok = results.filter(_._2 >= 0)
    val slow = (ok.sortBy(-_._2).take(15) ++ ok.filter(r => tracked(r._1)))
      .distinct.sortBy(-_._2)
    val slowJson = slow.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$slowJson,"nqueries":${results.size},"stall_retries_total":${retryLog.values.sum},"queries_full":"BENCH.out","sf":"$sfDir"}""")
    spark.stop()
  }
}
