package graft.core

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

/** Collection catalog: create/get/list/drop with a JSON sidecar per
  * collection dir (the reference persists `IndexConfig` as
  * `indexfile/<name>.conf`, `internal/index/index_manager.go:274-276`, and
  * the collection record in the LSM under `collection:{name}`,
  * `internal/db/collection.go:50`).
  *
  * Unlike the reference, user index params are kept verbatim (the reference
  * silently drops HNSW params due to a string/float64 type-assert mismatch,
  * `collection.go:64-67` + `hnsw.go:25-39` — SURVEY §7.4).
  */
class Catalog(root: String) {

  AtomicFiles.requireLocalRoot(root, "Catalog")

  private def confFile(name: String) = Paths.get(s"$root/$name/config.json")

  def create(config: CollectionConfig): Boolean = {
    validateName(config.name)
    if (exists(config.name)) return false // duplicate → ok-with-message (handlers.go:90-93)
    Files.createDirectories(Paths.get(s"$root/${config.name}"))
    Files.write(confFile(config.name), toJson(config).getBytes(StandardCharsets.UTF_8))
    true
  }

  def exists(name: String): Boolean = Files.exists(confFile(name))

  def get(name: String): Option[CollectionConfig] =
    if (!exists(name)) None
    else Some(fromJson(new String(Files.readAllBytes(confFile(name)), StandardCharsets.UTF_8)))

  def list(): Seq[String] =
    if (!Files.exists(Paths.get(root))) Seq.empty
    else {
      val stream = Files.list(Paths.get(root))
      try stream.iterator().asScala
        .filter(p => Files.exists(p.resolve("config.json")))
        .map(_.getFileName.toString).toSeq.sorted
      finally stream.close()
    }

  def drop(name: String): Boolean = {
    if (!exists(name)) return false
    val dir = Paths.get(s"$root/$name")
    val stream = Files.walk(dir)
    try stream.iterator().asScala.toSeq.reverse.foreach(Files.delete)
    finally stream.close()
    true
  }

  private def validateName(name: String): Unit =
    require(name.nonEmpty && name.matches("[A-Za-z0-9_\\-]+"),
      s"invalid collection name '$name'")

  // Sidecars use the engine's JSON codec (graft.core.Json) — a real parser,
  // so param values containing commas/quotes/colons round-trip correctly.
  private def toJson(c: CollectionConfig): String = {
    def obj(m: Map[String, String]) =
      Json.Obj(m.map { case (k, v) => k -> Json.Str(v) })
    Json.write(Json.Obj.of(
      "name" -> Json.Str(c.name),
      "dimension" -> Json.Num(c.dimension),
      "indexType" -> Json.Str(c.indexType.name),
      "spaceType" -> Json.Str(c.spaceType.name),
      "params" -> obj(c.params),
      "metadata" -> obj(c.metadata)))
  }

  private def fromJson(s: String): CollectionConfig = {
    val o = Json.parse(s).asObj
    def mp(key: String): Map[String, String] =
      o.get(key).map(_.asObj.map { case (k, v) => k -> v.asStr }).getOrElse(Map.empty)
    CollectionConfig(o("name").asStr, o("dimension").asInt,
      IndexType.parse(o("indexType").asStr), SpaceType.parse(o("spaceType").asStr),
      mp("params"), mp("metadata"))
  }
}
