package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `Outliers.zScoreFlags`: per-key z-score outlier flags
  * over an UNBOUNDED stream, each micro-batch's events judged against the
  * exact cumulative moments of everything ingested so far (including the
  * batch itself) — the live quality monitor a curation pipeline runs at
  * the ingest edge, where the batch operator would need a full re-scan per
  * arrival.
  *
  * The moments (n, Σx, Σx²) are order-free integer sums, so the flags are
  * DETERMINISTIC for any partitioning of the stream into micro-batches:
  * an event's flag depends only on WHICH prefix of the stream it arrived
  * in, never on ordering inside a batch — the property the batch-twin
  * spec replays. State is three numbers per key, carried as decimal
  * strings and summed in BigInt: exact at ANY stream length (the batch
  * operator's DECIMAL(38,0) envelope doesn't bound the streaming state).
  *
  * Scale: state is hash-partitioned by key across executors (constant
  * width per key); a micro-batch touches only keys with new events. No
  * timeout — monitored populations don't expire (callers with cohort
  * churn can wrap keys with a window epoch).
  */
object Monitor {

  case class Obs(key: String, id: Long, value: Long)
  case class Moments(n: Long, s1: String, s2: String)
  case class Flag(key: String, id: Long, value: Long, isOutlier: Long)

  def zScoreFlags(obs: Dataset[Obs], tNumer: Int, tDenom: Int): Dataset[Flag] = {
    require(tNumer > 0 && tDenom > 0,
      s"threshold must be a positive rational, got $tNumer/$tDenom")
    val spark = obs.sparkSession
    import spark.implicits._
    obs.groupByKey(_.key)
      .flatMapGroupsWithState[Moments, Flag](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key, evts, state) => updateKey(key, evts, state, tNumer, tDenom))
  }

  /** Unit-testable core: fold the batch into the cumulative moments, flag
    * every batch event against the UPDATED (prefix-inclusive) moments.
    */
  private[graft] def updateKey(key: String, evts: Iterator[Obs],
      state: GroupState[Moments], tNumer: Int, tDenom: Int): Iterator[Flag] = {
    val batch = evts.toArray
    val prev = state.getOption.getOrElse(Moments(0L, "0", "0"))
    var n = prev.n
    var s1 = BigInt(prev.s1)
    var s2 = BigInt(prev.s2)
    batch.foreach { e =>
      n += 1; s1 += e.value; s2 += BigInt(e.value) * e.value
    }
    state.update(Moments(n, s1.toString, s2.toString))
    val d2 = BigInt(tDenom) * tDenom
    val t2 = BigInt(tNumer) * tNumer
    val varN = BigInt(n) * s2 - s1 * s1
    batch.iterator.map { e =>
      val dev = BigInt(n) * e.value - s1
      Flag(key, e.id, e.value, if (d2 * dev * dev > t2 * varN) 1L else 0L)
    }
  }

  /** Streaming twin of `Outliers.iqrFlags`: Tukey-fence flags against the
    * EXACT cumulative quartiles of everything ingested so far. State is a
    * per-key value→count histogram — exact quantiles at any stream length
    * when the value domain is bounded (scores, ratings, bucketed metrics:
    * state width = distinct values per key, NOT stream length; an
    * unbounded-domain stream needs a sketch tier instead, documented
    * trade). Same determinism contract as `zScoreFlags`: histograms are
    * order-free, so a flag depends only on which prefix the event arrived
    * in.
    */
  def iqrFlags(obs: Dataset[Obs], mNumer: Int, mDenom: Int): Dataset[Flag] = {
    require(mNumer >= 0 && mDenom > 0,
      s"fence multiplier must be a non-negative rational, got $mNumer/$mDenom")
    val spark = obs.sparkSession
    import spark.implicits._
    obs.groupByKey(_.key)
      .flatMapGroupsWithState[Hist, Flag](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key, evts, state) => updateKeyIqr(key, evts, state, mNumer, mDenom))
  }

  case class Hist(counts: Map[Long, Long])

  private[graft] def updateKeyIqr(key: String, evts: Iterator[Obs],
      state: GroupState[Hist], mNumer: Int, mDenom: Int): Iterator[Flag] = {
    val batch = evts.toArray
    var h = state.getOption.map(_.counts).getOrElse(Map.empty[Long, Long])
    batch.foreach(e => h = h.updated(e.value, h.getOrElse(e.value, 0L) + 1L))
    state.update(Hist(h))
    // exact rank selection off the cumulative histogram: k(q) = ceil(q·n)
    val sorted = h.toArray.sortBy(_._1)
    val n = sorted.map(_._2).sum
    def kth(k: Long): Long = {
      var acc = 0L; var i = 0
      while (acc + sorted(i)._2 < k) { acc += sorted(i)._2; i += 1 }
      sorted(i)._1
    }
    val p25 = kth((n + 3) / 4)
    val p75 = kth((n * 3 + 3) / 4)
    val iqrM = BigInt(mNumer) * (BigInt(p75) - BigInt(p25))
    val d = BigInt(mDenom)
    batch.iterator.map { e =>
      val dv = d * e.value
      val out = dv > d * p75 + iqrM || dv < d * p25 - iqrM
      Flag(key, e.id, e.value, if (out) 1L else 0L)
    }
  }
}
