package graft

import java.nio.file.Files

import graft.core.{DocStore, Document}

/** LWW store semantics — FIXTURES F-5 + the reference's compaction merge
  * (`tree_compact.go:109-130`), including a regression for the skiplist
  * last-node drop (`skiplist.go:137`, SURVEY §7.4) which must be impossible
  * here.
  */
class DocStoreSpec extends SparkSpec {

  private def freshStore(): (DocStore, String) = {
    val dir = testRoot("docstore")
    (new DocStore(spark, dir), dir)
  }
  private val dim = 3
  private def doc(id: String, x: Float, tag: String = "t") =
    Document(id, Array(x, 0f, 0f), Map("tag" -> tag))

  test("upsert twice → last write wins") {
    val (s, _) = freshStore(); s.init("c")
    s.upsert("c", Seq(doc("1", 1f, "old")), dim)
    s.upsert("c", Seq(doc("1", 9f, "new")), dim)
    val got = s.get("c", "1").get
    assert(got.vector(0) === 9f && got.params("tag") === "new")
    assert(s.read("c").count() === 1)
  }

  test("delete then get → absent (tombstone honored, divergence fix)") {
    val (s, _) = freshStore(); s.init("c")
    s.upsert("c", Seq(doc("1", 1f), doc("2", 2f)), dim)
    s.delete("c", Seq("1"), dim)
    assert(s.get("c", "1") === None)
    assert(s.get("c", "2").isDefined)
    assert(s.read("c").count() === 1)
  }

  test("upsert after delete resurrects the id") {
    val (s, _) = freshStore(); s.init("c")
    s.upsert("c", Seq(doc("1", 1f)), dim)
    s.delete("c", Seq("1"), dim)
    s.upsert("c", Seq(doc("1", 5f)), dim)
    assert(s.get("c", "1").get.vector(0) === 5f)
  }

  test("batch with one wrong-dimension doc rejects the whole batch (document.go:280-285)") {
    val (s, _) = freshStore(); s.init("c")
    intercept[IllegalArgumentException] {
      s.upsert("c", Seq(doc("1", 1f), Document("2", Array(1f, 2f))), dim)
    }
    assert(!Files.exists(java.nio.file.Paths.get(s"${"unused"}")) || s.log("c").count() === 0)
  }

  test("compaction flips data GENERATIONS: current+previous kept, older GC'd, reads stay correct throughout") {
    val (s, root) = freshStore(); s.init("c")
    def ex(p: String) = cfsOf(root).exists(p)
    s.upsert("c", Seq(doc("1", 1f), doc("2", 2f)), dim)
    s.delete("c", Seq("2"), dim)
    // gen 0 ('data') → gen 1: the pre-flip dir must SURVIVE (in-flight
    // scans planned against its listing finish against intact files)
    s.compact("c")
    assert(ex(s"$root/c/data_g1"), "gen 1 missing after first compaction")
    assert(ex(s"$root/c/data"), "superseded gen must be kept one cycle")
    assert(s.read("c").count() === 1 && s.get("c", "1").isDefined)
    // appends land in the CURRENT generation
    s.upsert("c", Seq(doc("3", 3f)), dim)
    assert(cfsOf(root).listNames(s"$root/c/data_g1").size > 1,
      "append after the flip must land in the current generation")
    // gen 1 → gen 2: gen 0 is now two cycles old — GC'd; gen 1 kept
    s.compact("c")
    assert(ex(s"$root/c/data_g2") && ex(s"$root/c/data_g1"))
    assert(!ex(s"$root/c/data"), "two-cycle-old generation must be GC'd")
    assert(s.read("c").count() === 2)
    assert(s.getFast("c", "3").map(_.vector(0)) === Some(3f))
    assert(s.get("c", "2").isEmpty, "tombstone must survive generation flips")
  }

  test("compact keeps exactly the LWW winners — including the largest key (skiplist.go:137 regression)") {
    val (s, _) = freshStore(); s.init("c")
    // single-element store: the reference's skiplist All() would emit nothing
    s.upsert("c", Seq(doc("zzz-largest", 7f)), dim)
    s.compact("c")
    assert(s.read("c").count() === 1)
    assert(s.get("c", "zzz-largest").get.vector(0) === 7f)
    // multi-element with overwrites + tombstone
    s.upsert("c", Seq(doc("a", 1f), doc("m", 2f)), dim)
    s.upsert("c", Seq(doc("a", 10f)), dim)
    s.delete("c", Seq("m"), dim)
    s.compact("c")
    val ids = s.read("c").select("id").collect().map(_.getString(0)).sorted
    assert(ids.toSeq === Seq("a", "zzz-largest"))
    assert(s.get("c", "a").get.vector(0) === 10f)
    // compaction physically dropped shadowed versions
    assert(s.log("c").count() === 2)
  }

  test("clustered compaction writes disjoint sorted id runs (LSM sorted-SSTable invariant)") {
    import org.apache.spark.sql.functions._
    val (s, _) = freshStore(); s.init("c")
    val n = 2000
    // insert in a scrambled order so clustering has real work to do
    val scrambled = (0 until n).map(i => doc(f"id-${(i * 733) % n}%06d", i.toFloat))
    scrambled.grouped(500).foreach(b => s.upsert("c", b, dim))
    s.compact("c", clusterById = true, files = 8)
    // value-invariant: same winners as a plain read
    assert(s.read("c").count() === n.toLong)
    // per-file id ranges are pairwise disjoint — the property parquet
    // min/max pruning needs to confine a point lookup to ONE file
    val ranges = s.log("c")
      .groupBy(input_file_name().as("f"))
      .agg(min(col("id")).as("lo"), max(col("id")).as("hi"))
      .collect().map(r => (r.getString(1), r.getString(2)))
      .sortBy(_._1)
    assert(ranges.length > 1, "expected multiple files")
    ranges.sliding(2).foreach { case Array((_, hi1), (lo2, _)) =>
      assert(hi1 < lo2, s"overlapping id ranges: $hi1 >= $lo2")
    }
    // still a functioning store afterwards
    assert(s.get("c", "id-000000").isDefined)
  }
}
