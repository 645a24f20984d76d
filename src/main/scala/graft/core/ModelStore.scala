package graft.core

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

  /** Snapshot IO routes through the path's ControlFs (java.nio on plain
    * local paths, Hadoop FS on scheme'd ones — snapshots live with the
    * collection they belong to) and commits atomically: a reader sees the
    * previous snapshot or the new one, never a torn matrix.
    */
  private def writeSnapshot(path: String, content: String): Unit = {
    val cfs = ControlFs.forRoot(path)
    val slash = path.lastIndexOf('/')
    if (slash > 0) cfs.mkdirs(path.substring(0, slash))
    cfs.atomicWrite(path, content)
  }

  private def readSnapshot(path: String): Option[Iterator[String]] = {
    val cfs = ControlFs.forRoot(path)
    if (!cfs.exists(path)) None
    else Some(cfs.readString(path).linesIterator)
  }

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
    writeSnapshot(path, sb.toString)
  }

  def loadIvf(path: String): Option[IvfIndex.Model] = {
    val it = readSnapshot(path).getOrElse(return None)
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
    writeSnapshot(path, sb.toString)
  }

  def loadPq(path: String): Option[IvfPq.Model] = {
    val it = readSnapshot(path).getOrElse(return None)
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
    writeSnapshot(path, sb.toString)
  }

  def loadOpq(path: String): Option[Opq.Model] = {
    val it = readSnapshot(path).getOrElse(return None)
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
    writeSnapshot(path, sb.toString)
  }

  def loadSq(path: String): Option[ScalarQuant.Model] = {
    val it = readSnapshot(path).getOrElse(return None)
    require(it.next().startsWith("sq"), s"not an sq snapshot: $path")
    val m = readMatrix(it)
    Some(ScalarQuant.Model(m(0), m(1)))
  }

  /** BQ = the per-dimension threshold row. */
  def saveBq(path: String, model: BinaryQuant.Model): Unit = {
    val sb = new StringBuilder
    sb.append("bq\n")
    writeMatrix(sb, Array(model.thresholds))
    writeSnapshot(path, sb.toString)
  }

  def loadBq(path: String): Option[BinaryQuant.Model] = {
    val it = readSnapshot(path).getOrElse(return None)
    require(it.next().startsWith("bq"), s"not a bq snapshot: $path")
    Some(BinaryQuant.Model(readMatrix(it)(0)))
  }
}
