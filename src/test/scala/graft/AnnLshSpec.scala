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

  test("auto bit width grows with log(corpus) so the candidate fraction shrinks at scale") {
    // fixed 8 bits made the 2M-row tier slower than the exact scan
    // (SCALE_r06 ann_1000x pre-fix) — bits must track corpus size
    assert(AnnLsh.autoBits(0L) === 4)             // floor: tiny corpora get
    assert(AnnLsh.autoBits(2000L) === 4)          //   coarse, high-recall buckets
    assert(AnnLsh.autoBits(256L * 1024) === 10)   // 1024 buckets
    assert(AnnLsh.autoBits(2000000L) === 13)      // the measured regression point
    assert(AnnLsh.autoBits(Long.MaxValue) === 20) // clamped
    // default (auto) search still answers correctly on a small corpus
    val got = AnnLsh.search(emb, queries, 10, SpaceType.Cos)
      .select("query_id", "id").as[(String, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rs = exact.map { case (q, truth) =>
      got.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val r = rs.sum / rs.size
    assert(r >= 0.8, f"auto-bit recall@10 $r%.3f < 0.8")
  }
}
