package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-selection operators for training-corpus curation: DSIR importance
  * resampling, CCNet-style per-group score terciles, and cluster-balanced
  * sampling caps. These are the production cores behind the declared
  * `dsir_select` / `ccnet_buckets` / `cluster_cap_sample` queries (which
  * gate them end-to-end against the DuckDB oracle) and the ScaleBench
  * `selection` section (which measures them at replicated-corpus scale).
  *
  * Everything is hash-deterministic and exact-integer where a comparison
  * decides survival; the single double cast in `dsirSelect` is also the
  * order key on both engine sides, so the top-K boundary cannot disagree.
  */
object Selection {

  /** md5-derived integer bucket in [0, mod): `hexOffset` selects which 4 hex
    * chars of the digest feed the bucket, so independent decisions (split
    * assignment vs sampling vs featurization) draw from decorrelated bits of
    * the same digest. The digest is over the STRING form of the value — both
    * engines agree on int64 rendering; for text the string IS the value.
    */
  def md5Bucket(v: Column, hexOffset: Int, mod: Int): Column =
    (conv(substring(md5(v.cast("string").cast("binary")), hexOffset, 4), 16, 10)
      .cast("long") % mod)

  /** Data Selection via Importance Resampling (Xie et al. 2023,
    * arXiv:2302.03169) in hash-gate-exact form: score every doc under a
    * bag-of-hashed-bigrams model of the TARGET distribution (`isTarget`
    * rows) against the RAW pool (everything else), then keep the top-`k`
    * scorers — the "make the web corpus look like the curated corpus"
    * selection step. DSIR's weight is the log-likelihood ratio
    * Σ c_f·ln(p̂_t(f)/p̂_r(f)); `ln` would hand an exact-replay gate to libm,
    * so the per-feature weight here is the cleared-denominator probability
    * DIFFERENCE — w_f = (t_f+1)·(R+B) − (r_f+1)·(T+B), i.e.
    * (p̂_t(f) − p̂_r(f)) scaled by the positive constant (T+B)(R+B) under
    * add-one smoothing over B hash buckets — the same "prefer features the
    * target over-expresses" signal in exact integer arithmetic end to end.
    *
    * Scale: the bigram stream is linear in corpus tokens; bucket counts are
    * a CONSTANT-width aggregate (B rows — the bounded driver collect IS the
    * trained model) broadcast back onto the stream; per-doc scores are one
    * doc-keyed sum; the top-K cut is TakeOrderedAndProject (map-side partial
    * top-K, never a global sort). Products run in DECIMAL(38,0) — t_f·R
    * passes the BIGINT envelope around 10⁹ target × 10¹⁰ raw occurrences —
    * with ONE cast to double at the end (round-to-nearest on every engine).
    *
    * `carryCols` are grouped alongside `idCol` (they must be functionally
    * dependent on it, e.g. the doc's source label) and appear in the output.
    */
  def dsirSelect(docs: DataFrame, idCol: String, textCol: String,
                 isTarget: Column, buckets: Int = 1024, k: Int = 200,
                 carryCols: Seq[String] = Nil): DataFrame = {
    val model = dsirTrain(docs, textCol, isTarget, buckets)
    dsirScore(docs, idCol, textCol, model, carryCols)
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** The trained DSIR model: the B-row hashed-bigram bucket-count table
    * plus its totals — bounded at ANY corpus scale, so it lives on the
    * driver and ships as a broadcast weight table to scorers (including
    * streaming micro-batches, which score against a FIXED snapshot model).
    */
  final case class DsirModel(cnts: Array[(Long, Long, Long)],
      tTot: Long, rTot: Long, buckets: Int)

  /** One corpus pass: hashed-bigram bucket counts split target-vs-raw.
    * `isTarget` is evaluated BEFORE the gram projection so it may reference
    * any input column (lang, source, ...).
    */
  def dsirTrain(docs: DataFrame, textCol: String, isTarget: Column,
      buckets: Int = 1024): DsirModel = {
    val spark = docs.sparkSession
    import spark.implicits._
    val occ = gramFeatures(docs.withColumn("__graft_tgt", isTarget),
      textCol, buckets, Seq(col("__graft_tgt").as("tgt")))
    val cnts = occ.groupBy(col("f")).agg(
      sum(when(col("tgt"), 1L).otherwise(0L)).as("t_f"),
      sum(when(col("tgt"), 0L).otherwise(1L)).as("r_f"))
      .as[(Long, Long, Long)].collect()
    DsirModel(cnts, cnts.map(_._2).sum, cnts.map(_._3).sum, buckets)
  }

  /** Score every doc under a fixed model: one gram pass, broadcast weight
    * join, doc-keyed sum (map-side partial agg). Stateless in the corpus —
    * the streaming twin scores arriving micro-batches with this exact plan.
    *
    * The weight table covers ALL B buckets: a feature the training snapshot
    * never saw still carries its add-one-smoothing weight
    * (1)·(R+B) − (1)·(T+B) — an inner join over observed-only buckets would
    * silently DROP unseen features, which matters exactly when the scored
    * stream is disjoint from the training snapshot (the firehose case).
    * Contract: a doc with fewer than 2 tokens has no bigram features and
    * emits NO score row (DSIR's empty feature bag — callers selecting over
    * streams treat absence as score-unknown, not zero).
    */
  def dsirScore(docs: DataFrame, idCol: String, textCol: String,
      model: DsirModel, carryCols: Seq[String] = Nil): DataFrame = {
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val spark = docs.sparkSession
    import spark.implicits._
    val byF = model.cnts.map(c => c._1 -> ((c._2, c._3))).toMap
    val full = (0 until model.buckets).map { f =>
      val (t, r) = byF.getOrElse(f.toLong, (0L, 0L))
      (f.toLong, t, r)
    }
    val weights = full.toDF("f", "t_f", "r_f").select(col("f"),
      (dec(col("t_f") + 1L) * dec(lit(model.rTot + model.buckets)) -
        dec(col("r_f") + 1L) * dec(lit(model.tTot + model.buckets))).as("w"))
    gramFeatures(docs, textCol, model.buckets, col(idCol) +: carryCols.map(col))
      .join(broadcast(weights), "f")
      .groupBy((col(idCol) +: carryCols.map(col)): _*)
      .agg(sum(col("w")).cast("double").as("score"))
  }

  /** Shared gram stream: (extra..., bg, f). widened: the tokenize+explode
    * map cost must not inherit a narrow small-file scan's parallelism
    * (same rationale as bm25_keyword).
    */
  private def gramFeatures(docs: DataFrame, textCol: String, buckets: Int,
      extra: Seq[Column]): DataFrame = {
    import graft.functions.vfn
    val toks = split(col(textCol), " ")
    Dedup.widened(docs)
      .filter(size(toks) >= 2)
      .select(extra :+ explode(vfn.ngrams(toks, 2)).as("bg"): _*)
      .withColumn("f", md5Bucket(col("bg"), 1, buckets))
  }

  /** CCNet's head/middle/tail bucketing (Wenzek et al. 2020,
    * arXiv:1911.00359): per `partCol` group, split rows into exact TERCILES
    * of `scoreCol` (higher = better fit ≈ lower perplexity) — the mixture
    * knob CCNet pipelines expose ("train on head+middle, drop tail").
    * Terciles are exact integer rank algebra (rank·3 ≤ n, rank·3 ≤ 2n — no
    * float quantile interpolation); the rank orders by score desc with
    * `idCol` tie-break. Output: the input plus a `bucket` column (an
    * existing `bucket` column is replaced; rank internals use collision-
    * safe temp names, so no other caller column is touched).
    *
    * Scale: one group-partitioned window (shuffle on `partCol`, no global
    * sort). At extreme per-group cardinality the same decision can run
    * rank-free: select the two boundary (score, id) pairs per group via
    * rank-selection and broadcast them back as tuple comparisons.
    */
  def scoreTerciles(scored: DataFrame, partCol: String, scoreCol: String,
                    idCol: String): DataFrame = {
    val w = Window.partitionBy(col(partCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    val n = Window.partitionBy(col(partCol))
    scored
      .withColumn("__graft_rnk", row_number().over(w).cast("long"))
      .withColumn("__graft_n", count(lit(1)).over(n))
      .withColumn("bucket",
        when(col("__graft_rnk") * 3 <= col("__graft_n"), "head")
          .when(col("__graft_rnk") * 3 <= col("__graft_n") * 2, "middle")
          .otherwise("tail"))
      .drop("__graft_rnk", "__graft_n")
  }

  /** Cluster-balanced curation cap (the D4-family debiasing step, Tirumala
    * et al. 2023, arXiv:2308.12284): cap every cluster at `cap` members so
    * dominant modes (boilerplate templates, scraped mirrors) cannot swamp
    * the mixture. Members kept per cluster are the `cap` smallest md5
    * digests of `idCol` — digest order is a fixed random permutation, so
    * within each cluster this IS a uniform sample, yet a pure function of
    * ids (replayable anywhere, stable under reruns/partitioning). Output:
    * the input plus digest rank `rnk` and a 0/1 `kept` flag — those two are
    * this operator's API columns and replace same-named input columns
    * (emitting the flag, not cutting, keeps the audit trail — a keep-only
    * variant is the same plan with the filter pushed into the window's
    * group limit).
    *
    * Scale: one cluster-keyed window; group sizes are bounded by choosing
    * the cluster count k ∝ corpus/target-cluster-size (the scaled-k row in
    * ScaleBench's selection section measures exactly that knob).
    */
  def clusterCap(assigned: DataFrame, clusterCol: String, idCol: String,
                 cap: Long): DataFrame = {
    val w = Window.partitionBy(col(clusterCol))
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
    assigned
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("kept", when(col("rnk") <= cap, 1L).otherwise(0L))
  }
}
