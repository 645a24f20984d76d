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
    else Files.list(Paths.get(root)).iterator().asScala
      .filter(p => Files.exists(p.resolve("config.json")))
      .map(_.getFileName.toString).toSeq.sorted

  def drop(name: String): Boolean = {
    if (!exists(name)) return false
    val dir = Paths.get(s"$root/$name")
    Files.walk(dir).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    true
  }

  private def validateName(name: String): Unit =
    require(name.nonEmpty && name.matches("[A-Za-z0-9_\\-]+"),
      s"invalid collection name '$name'")

  // Minimal hand-rolled JSON (flat, string-valued maps only) — avoids any
  // dependency beyond the Spark classpath.
  private def toJson(c: CollectionConfig): String = {
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case ch if ch < ' ' => f"\\u${ch.toInt}%04x"; case ch => ch.toString
    }
    def obj(m: Map[String, String]) =
      m.toSeq.sorted.map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }
        .mkString("{", ",", "}")
    s"""{"name":"${esc(c.name)}","dimension":${c.dimension},""" +
      s""""indexType":"${c.indexType.name}","spaceType":"${c.spaceType.name}",""" +
      s""""params":${obj(c.params)},"metadata":${obj(c.metadata)}}"""
  }

  private def fromJson(s: String): CollectionConfig = {
    def str(key: String): String = {
      val m = s"""(?s).*"$key":"((?:[^"\\\\]|\\\\.)*)".*""".r
      s match { case m(v) => unesc(v); case _ => throw new IllegalStateException(s"bad sidecar: $key") }
    }
    def int(key: String): Int = {
      val m = s"""(?s).*"$key":(\\d+).*""".r
      s match { case m(v) => v.toInt; case _ => throw new IllegalStateException(s"bad sidecar: $key") }
    }
    def mp(key: String): Map[String, String] = {
      val m = s"""(?s).*"$key":\\{([^}]*)\\}.*""".r
      s match {
        case m(body) if body.trim.nonEmpty =>
          body.split(",").map { kv =>
            val Array(k, v) = kv.split(":", 2)
            unesc(k.trim.stripPrefix("\"").stripSuffix("\"")) ->
              unesc(v.trim.stripPrefix("\"").stripSuffix("\""))
          }.toMap
        case _ => Map.empty
      }
    }
    CollectionConfig(str("name"), int("dimension"),
      IndexType.parse(str("indexType")), SpaceType.parse(str("spaceType")),
      mp("params"), mp("metadata"))
  }

  private def unesc(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\").replace("\\n", "\n")
}
