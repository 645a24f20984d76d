package graft

import org.apache.spark.sql.functions._

import graft.core.SpaceType
import graft.operators.{AnnLsh, ExactKnn}

/** LSH ANN tier (HNSW-capability stand-in): recall@10 vs the exact oracle,
  * and the recall-knob monotonicity the reference's efsearch sweep measures
  * (`run_benchmarks.py:229-234`).
  */
class AnnLshSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    .select(col("vec_id").cast("string").as("id"), col("embedding").as("vector"))
  private lazy val queries = emb.filter(col("id").cast("long") < 20)
    .select(col("id").as("query_id"), col("vector").as("query_vec"))
  private lazy val exact = ExactKnn.knn(emb, queries, 10, SpaceType.Cos)
    .select("query_id", "id").as[(String, String)].collect()
    .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  private def recallAt(numTables: Int, nbits: Int): Double = {
    val approx = AnnLsh.search(emb, queries, 10, SpaceType.Cos,
        numTables = numTables, nbits = nbits)
      .select("query_id", "id").as[(String, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rs = exact.map { case (q, truth) =>
      approx.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    rs.sum / rs.size
  }

  test("recall@10 >= 0.8 at 8 tables x 6 bits on sf0.001") {
    val r = recallAt(8, 6)
    assert(r >= 0.8, f"recall@10 $r%.3f < 0.8")
  }

  test("recall knob: more tables does not reduce recall (efsearch-sweep analog)") {
    val lo = recallAt(2, 6)
    val hi = recallAt(8, 6)
    assert(hi >= lo, f"recall decreased with more tables: $lo%.3f -> $hi%.3f")
  }
}
