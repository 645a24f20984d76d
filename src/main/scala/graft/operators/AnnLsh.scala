package graft.operators

import scala.util.Random

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.SpaceType
import graft.functions.vfn

/** ANN tier — capability parity for the reference's HNSW index
  * (`internal/index/hnsw.go`, hnswlib `hnswalg.h:1381-1440`) re-expressed for
  * Spark's execution model (SURVEY §7.2 step 7): a per-row mutable graph
  * fights distributed execution, so the approximate tier is random-hyperplane
  * LSH — sign-bit signatures over `numTables` independent hyperplane sets,
  * bucket-equi-join candidates, exact re-rank.
  *
  *  - recall knob: `numTables` (more tables → more candidates → higher
  *    recall), the role efsearch plays in the reference
  *    (`hnsw.go:171-204`); bench sweeps it like `run_benchmarks.py:229-234`.
  *  - Scale: signatures are one narrow column per row; the candidate join is
  *    an equi-shuffle on (table, bucket) — no all-pairs work; re-rank touches
  *    only bucket-mates. Buckets bound the join fan-out; skew in a hot bucket
  *    is handled by AQE skew-join splitting.
  */
object AnnLsh {

  /** Deterministic hyperplanes: numTables × nbits planes of dim coords. */
  private[operators] def planesFor(dim: Int, numTables: Int, nbits: Int,
      seed: Long): Array[Array[Array[Float]]] = planes(dim, numTables, nbits, seed)

  /** Shared signature generator (see `signatures`). */
  private[operators] def signaturesFor(df: DataFrame, vecCol: String,
      idCols: Seq[String], pl: Array[Array[Array[Float]]]): DataFrame =
    signatures(df, vecCol, idCols, pl)

  /** Query-side multi-probe: each signature also meets buckets one flipped
    * bit away.
    */
  private[operators] def multiProbe(sig: DataFrame, nbits: Int): DataFrame =
    sig.withColumn("__bucket", explode(expr(
      s"array_union(array(__bucket), transform(sequence(0, ${nbits - 1}), " +
        "i -> __bucket ^ CAST(shiftleft(1, i) AS BIGINT)))")))

  private def planes(dim: Int, numTables: Int, nbits: Int, seed: Long): Array[Array[Array[Float]]] = {
    val rnd = new Random(seed)
    Array.fill(numTables, nbits)(Array.fill(dim)(rnd.nextGaussian().toFloat))
  }

  /** (table_id, bucket) signature rows for each input row. The per-row
    * tables×nbits×dim dot-product loop is the codegen `LshSignatures` kernel
    * (no UDF — the planes ride in the plan as a literal, the loop stays
    * inside whole-stage codegen).
    */
  private def signatures(df: DataFrame, vecCol: String, idCols: Seq[String],
      pl: Array[Array[Array[Float]]]): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.graft.{Bridge, LshSignatures}
    val nbits = pl(0).length
    // flatten row-major: plane for (table t, bit b) at index t*nbits+b
    val planesLit = Literal.create(
      pl.flatten.map(_.toSeq).toSeq, ArrayType(ArrayType(FloatType)))
    df.withColumn("__sigs", Bridge.column(LshSignatures(
        Bridge.expression(col(vecCol)), planesLit, Literal(nbits))))
      .select(idCols.map(col) :+ posexplode(col("__sigs")): _*)
      .withColumnRenamed("pos", "__table")
      .withColumnRenamed("col", "__bucket")
  }

  /** Candidate pairs from bucket collisions in any table (deduped per
    * (query, corpus id)) — the deterministic candidate set the exact re-rank
    * in `search` ranks, exported as an oracle input by Verify (an external
    * SQL engine replays "exact KNN restricted to these candidates").
    */
  /** nbits=0 (the default) → auto: enough hyperplane bits that expected
    * bucket occupancy stays near 256 rows — ceil(log2(n/256)), clamped to
    * [4, 20]. A FIXED bit width is a scale bug: at 8 bits (256 buckets per
    * table) a 2M-row corpus put ~29% of the corpus into every query's
    * candidate set and this "approximate" tier measured 1.6× SLOWER than
    * the exact scan (SCALE_r06 ann_1000x, pre-fix); the bit count must grow
    * with log(n) for the candidate fraction to shrink as the corpus grows.
    * The floor adapts DOWN too (min 4 bits): 8 fixed bits on a few hundred
    * rows leaves near-singleton buckets and recall collapses.
    * Deterministic (a pure function of the corpus row count), so the aux
    * oracle replay regenerates identical planes; costs one count() job when
    * auto is active.
    */
  private[graft] def autoBits(n: Long): Int = {
    val buckets = math.max(1L, n / 256L)
    math.min(20, math.max(4,
      math.ceil(math.log(buckets.toDouble) / math.log(2.0)).toInt))
  }

  def candidatePairs(
      corpus: DataFrame,
      queries: DataFrame,
      numTables: Int = 8,
      nbits: Int = 0, // 0 = auto-scale with corpus size (see autoBits)
      multiProbe: Boolean = true,
      seed: Long = 42L,
      corpusId: String = "id",
      corpusVec: String = "vector",
      queryId: String = "query_id",
      queryVec: String = "query_vec"): DataFrame = {
    require(nbits >= 0, s"nbits must be >= 0 (0 = auto), got $nbits")
    val nb = if (nbits > 0) nbits else autoBits(corpus.count())
    val dim = corpus.select(size(col(corpusVec))).first().getInt(0)
    val pl = planes(dim, numTables, nb, seed)

    val cSig = signatures(corpus.select(col(corpusId), col(corpusVec)), corpusVec,
      Seq(corpusId, corpusVec), pl)
    val qSigExact = signatures(queries.select(col(queryId), col(queryVec)), queryVec,
      Seq(queryId, queryVec), pl)
    // Multi-probe (query side only, corpus table untouched): additionally
    // probe every bucket at Hamming distance 1 from the query signature —
    // recall of ~(1+nbits)× more buckets for zero extra corpus-side state.
    val qSig = if (!multiProbe) qSigExact else AnnLsh.multiProbe(qSigExact, nb)

    cSig.join(broadcast(qSig), Seq("__table", "__bucket"))
      .select(col(queryId), col(queryVec), col(corpusId), col(corpusVec))
      .dropDuplicates(queryId, corpusId)
  }

  /** Approximate batch KNN: candidates from bucket collisions in any table,
    * exact re-rank with the true distance, top-k per query.
    */
  def search(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      space: SpaceType,
      numTables: Int = 8,
      nbits: Int = 0, // 0 = auto-scale with corpus size (see autoBits)
      multiProbe: Boolean = true,
      seed: Long = 42L,
      corpusId: String = "id",
      corpusVec: String = "vector",
      queryId: String = "query_id",
      queryVec: String = "query_vec"): DataFrame = {
    val cand = candidatePairs(corpus, queries, numTables, nbits, multiProbe,
      seed, corpusId, corpusVec, queryId, queryVec)
    val dist = vfn.distance(col(corpusVec), col(queryVec), space)
    val w = Window.partitionBy(col(queryId)).orderBy(col("distance").asc, col(corpusId).asc)
    cand.withColumn("distance", dist)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col(queryId), col(corpusId), col("distance"), col("rnk"))
  }
}
