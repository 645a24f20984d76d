package graft.core

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.operators.{BinaryQuant, IvfIndex, IvfPq, Opq, ScalarQuant}

/** Index-snapshot persistence (SURVEY S8): centroids/codebooks as small
  * sidecar artifacts per collection, replacing the reference's gob snapshots
  * + background saver (`internal/index/index_manager.go:386-438`,
  * `ivf.go:252-293`, `ivfpq.go:325-374`). Writes are synchronous — the
  * artifact IS the durability point; recovery = read it back (the WAL-replay
  * capability of SURVEY S7 without a WAL).
  *
  * Format: a dense float text format (dims header + one row per centroid) —
  * dependency-free, byte-exact for float32 via Float.toString round-trip.
  */
object ModelStore {

  private def writeMatrix(sb: StringBuilder, m: Array[Array[Float]]): Unit = {
    sb.append(m.length).append(' ').append(if (m.isEmpty) 0 else m(0).length).append('\n')
    m.foreach { row => sb.append(row.mkString(",")).append('\n') }
  }

  private def readMatrix(lines: Iterator[String]): Array[Array[Float]] = {
    val Array(rows, _) = lines.next().split(' ').map(_.toInt)
    Array.fill(rows)(lines.next().split(',').map(_.toFloat))
  }

  def saveIvf(path: String, model: IvfIndex.Model): Unit = {
    val sb = new StringBuilder
    sb.append("ivf ").append(model.space.name).append('\n')
    writeMatrix(sb, model.centroids)
    Files.createDirectories(Paths.get(path).getParent)
    Files.write(Paths.get(path), sb.toString.getBytes(StandardCharsets.UTF_8))
  }

  def loadIvf(path: String): Option[IvfIndex.Model] = {
    if (!Files.exists(Paths.get(path))) return None
    val lines = Files.readAllLines(Paths.get(path)).iterator()
    val it = new Iterator[String] { def hasNext = lines.hasNext; def next() = lines.next() }
    val header = it.next().split(' ')
    require(header(0) == "ivf", s"not an ivf snapshot: $path")
    Some(IvfIndex.Model(readMatrix(it), SpaceType.parse(header(1))))
  }

  def savePq(path: String, model: IvfPq.Model): Unit = {
    val sb = new StringBuilder
    sb.append("ivfpq ").append(model.coarse.space.name).append(' ')
      .append(model.m).append(' ').append(model.subDim).append('\n')
    writeMatrix(sb, model.coarse.centroids)
    model.codebooks.foreach(writeMatrix(sb, _))
    Files.createDirectories(Paths.get(path).getParent)
    Files.write(Paths.get(path), sb.toString.getBytes(StandardCharsets.UTF_8))
  }

  def loadPq(path: String): Option[IvfPq.Model] = {
    if (!Files.exists(Paths.get(path))) return None
    val lines = Files.readAllLines(Paths.get(path)).iterator()
    val it = new Iterator[String] { def hasNext = lines.hasNext; def next() = lines.next() }
    val header = it.next().split(' ')
    require(header(0) == "ivfpq", s"not an ivfpq snapshot: $path")
    val coarse = IvfIndex.Model(readMatrix(it), SpaceType.parse(header(1)))
    val m = header(2).toInt; val subDim = header(3).toInt
    val codebooks = Array.fill(m)(readMatrix(it))
    Some(IvfPq.Model(coarse, codebooks, m, subDim))
  }

  /** OPQ = rotation matrix + the embedded IVFPQ snapshot fields (train
    * errors are a training-time diagnostic, not persisted).
    */
  def saveOpq(path: String, model: Opq.Model): Unit = {
    val sb = new StringBuilder
    sb.append("opq ").append(model.pq.coarse.space.name).append(' ')
      .append(model.pq.m).append(' ').append(model.pq.subDim).append('\n')
    writeMatrix(sb, model.rotation)
    writeMatrix(sb, model.pq.coarse.centroids)
    model.pq.codebooks.foreach(writeMatrix(sb, _))
    Files.createDirectories(Paths.get(path).getParent)
    Files.write(Paths.get(path), sb.toString.getBytes(StandardCharsets.UTF_8))
  }

  def loadOpq(path: String): Option[Opq.Model] = {
    if (!Files.exists(Paths.get(path))) return None
    val lines = Files.readAllLines(Paths.get(path)).iterator()
    val it = new Iterator[String] { def hasNext = lines.hasNext; def next() = lines.next() }
    val header = it.next().split(' ')
    require(header(0) == "opq", s"not an opq snapshot: $path")
    val rotation = readMatrix(it)
    val coarse = IvfIndex.Model(readMatrix(it), SpaceType.parse(header(1)))
    val m = header(2).toInt; val subDim = header(3).toInt
    val codebooks = Array.fill(m)(readMatrix(it))
    Some(Opq.Model(rotation, IvfPq.Model(coarse, codebooks, m, subDim), Array.empty))
  }

  /** SQ8 = the per-dimension min/max rows. */
  def saveSq(path: String, model: ScalarQuant.Model): Unit = {
    val sb = new StringBuilder
    sb.append("sq\n")
    writeMatrix(sb, Array(model.mins, model.maxs))
    Files.createDirectories(Paths.get(path).getParent)
    Files.write(Paths.get(path), sb.toString.getBytes(StandardCharsets.UTF_8))
  }

  def loadSq(path: String): Option[ScalarQuant.Model] = {
    if (!Files.exists(Paths.get(path))) return None
    val lines = Files.readAllLines(Paths.get(path)).iterator()
    val it = new Iterator[String] { def hasNext = lines.hasNext; def next() = lines.next() }
    require(it.next().startsWith("sq"), s"not an sq snapshot: $path")
    val m = readMatrix(it)
    Some(ScalarQuant.Model(m(0), m(1)))
  }

  /** BQ = the per-dimension threshold row. */
  def saveBq(path: String, model: BinaryQuant.Model): Unit = {
    val sb = new StringBuilder
    sb.append("bq\n")
    writeMatrix(sb, Array(model.thresholds))
    Files.createDirectories(Paths.get(path).getParent)
    Files.write(Paths.get(path), sb.toString.getBytes(StandardCharsets.UTF_8))
  }

  def loadBq(path: String): Option[BinaryQuant.Model] = {
    if (!Files.exists(Paths.get(path))) return None
    val lines = Files.readAllLines(Paths.get(path)).iterator()
    val it = new Iterator[String] { def hasNext = lines.hasNext; def next() = lines.next() }
    require(it.next().startsWith("bq"), s"not a bq snapshot: $path")
    Some(BinaryQuant.Model(readMatrix(it)(0)))
  }
}
