package graft.testfs

import java.net.URI

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** A NON-`file:` Hadoop scheme backed by the local disk — the test double
  * for an hdfs://-class root: `ControlFs.forRoot` routes it to
  * `HadoopControlFs` (manifest counters, Hadoop marker renames), Spark
  * resolves it for parquet IO, and parquet-mr's driver-direct readers and
  * writers stream through it — so the whole Engine/DocStore protocol runs
  * exactly as it would on a remote store, observable on local disk.
  * Registered via META-INF/services (the standard FileSystem ServiceLoader
  * mechanism), so `new Configuration()` resolves it with no plumbing.
  */
class GraftTestFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: URI = URI.create("graftfs:///")
}

/** `GraftTestFileSystem` with one-shot fault injection on the two commit
  * primitives the control plane relies on — `create` (manifest counter
  * entries, tmp marker writes) and `rename` (marker commits, run-file
  * moves) — for replaying the crash windows the protocol scaladocs argue
  * about, on a real FileSystem boundary instead of a mock.
  */
class FaultFs extends RawLocalFileSystem {
  override def getScheme: String = "faultfs"
  override def getUri: URI = URI.create("faultfs:///")

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): org.apache.hadoop.fs.FSDataOutputStream = {
    FaultFs.maybeFail("create", f)
    super.create(f, permission, overwrite, bufferSize, replication, blockSize,
      progress)
  }

  // RawLocalFileSystem overrides this 6-arg variant directly —
  // FileSystem.create(Path, boolean) funnels here, NOT through the
  // permission variant above, so both must inject
  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: Progressable): org.apache.hadoop.fs.FSDataOutputStream = {
    FaultFs.maybeFail("create", f)
    super.create(f, overwrite, bufferSize, replication, blockSize, progress)
  }

  override def rename(src: Path, dst: Path): Boolean = {
    FaultFs.maybeFail("rename", dst)
    super.rename(src, dst)
  }
}

object FaultFs {
  // one-shot triggers: (op, path-substring) — first matching call throws
  // and disarms; everything else passes through
  private val armed =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]

  def failNext(op: String, pathSubstring: String): Unit =
    armed.add((op, pathSubstring))

  def disarm(): Unit = armed.clear()

  private[testfs] def maybeFail(op: String, p: Path): Unit = {
    val s = p.toString
    val it = armed.iterator()
    while (it.hasNext) {
      val t = it.next()
      if (t._1 == op && s.contains(t._2)) {
        it.remove()
        throw new java.io.IOException(
          s"FaultFs: injected $op failure at $s")
      }
    }
  }
}
