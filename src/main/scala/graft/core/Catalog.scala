package graft.core

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

  // scheme-routed control IO (java.nio on plain local roots, Hadoop FS
  // elsewhere) — the catalog sidecars live with the collection data
  private val cfs = ControlFs.forRoot(root)

  private def confFile(name: String) = s"$root/$name/config.json"

  def create(config: CollectionConfig): Boolean = {
    validateName(config.name)
    if (exists(config.name)) return false // duplicate → ok-with-message (handlers.go:90-93)
    cfs.mkdirs(s"$root/${config.name}")
    cfs.atomicWrite(confFile(config.name), toJson(config))
    true
  }

  def exists(name: String): Boolean = cfs.exists(confFile(name))

  def get(name: String): Option[CollectionConfig] =
    if (!exists(name)) None
    else Some(fromJson(cfs.readString(confFile(name))))

  def list(): Seq[String] =
    cfs.listNames(root)
      .filter(n => cfs.exists(s"$root/$n/config.json")).sorted

  def drop(name: String): Boolean = {
    if (!exists(name)) return false
    cfs.deleteRecursively(s"$root/$name")
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
