package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.graft.{CosDist, HammingNe, L2Sq, NegDot}

/** SparkSessionExtensions entry point: registers the distance expression
  * family as SQL functions for any session built with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)` — the idiomatic public hook for
  * third-party Catalyst extensions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(name: String, usage: String) =
      new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")
    ext.injectFunction((FunctionIdentifier("l2_sq"),
      info("l2_sq", "l2_sq(a, b) - squared euclidean distance between float vectors"),
      es => L2Sq(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("neg_dot"),
      info("neg_dot", "neg_dot(a, b) - negative inner product"),
      es => NegDot(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("cos_dist"),
      info("cos_dist", "cos_dist(a, b) - 1 - cosine similarity (zero-norm -> 1.0)"),
      es => CosDist(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("hamming_ne"),
      info("hamming_ne", "hamming_ne(a, b) - count of element-wise differing positions"),
      es => HammingNe(es(0), es(1))))
  }
}
