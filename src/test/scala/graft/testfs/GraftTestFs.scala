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

  // RawLocalFileSystem's create(overwrite = false) is CHECK-THEN-ACT (an
  // exists() test, then FileOutputStream) — two processes can both
  // "create-exclusively" the same path and silently last-write-win. The
  // real systems this scheme stands in for are atomic here (HDFS NameNode
  // create; S3 conditional PUT), and the ControlFs counter protocol rests
  // on exactly that, so the test double must be honest: O_EXCL via
  // java.nio, then delegate with overwrite = true (we hold exclusivity).
  private def exclusiveClaim(f: Path, overwrite: Boolean): Unit =
    if (!overwrite) {
      val p = java.nio.file.Paths.get(f.toUri.getPath)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      try { java.nio.file.Files.createFile(p); () }
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          throw new org.apache.hadoop.fs.FileAlreadyExistsException(s"$f exists")
      }
    }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): org.apache.hadoop.fs.FSDataOutputStream = {
    exclusiveClaim(f, overwrite)
    super.create(f, permission, true, bufferSize, replication, blockSize,
      progress)
  }

  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: Progressable): org.apache.hadoop.fs.FSDataOutputStream = {
    exclusiveClaim(f, overwrite)
    super.create(f, true, bufferSize, replication, blockSize, progress)
  }
}

/** `GraftTestFileSystem` with injected LIST latency on counter MANIFEST
  * dirs (`<counter>.d/`) — a targeted stand-in for the ~10-20 ms an object
  * store charges per LIST, applied ONLY where the serve path pays it (the
  * per-request counter-currency check) so the surrounding spec stays fast.
  * Knob: `graft.testfs.slowlist.ms` (sleep per matching listStatus).
  */
class SlowListFs extends GraftTestFileSystem {
  override def getScheme: String = "slowlistfs"
  override def getUri: URI = URI.create("slowlistfs:///")

  override def listStatus(p: Path): Array[org.apache.hadoop.fs.FileStatus] = {
    val ms = java.lang.Long.getLong("graft.testfs.slowlist.ms", 0L)
    if (ms > 0 && p.getName.endsWith(".d")) Thread.sleep(ms)
    super.listStatus(p)
  }
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

/** `GraftTestFileSystem` with OBJECT-STORE rename semantics: rename is a
  * COPY (each destination file appears whole — the single-object PUT
  * atomicity real stores give) followed by a DELETE of the source, with an
  * injectable crash BETWEEN the two — the exact non-transactional window
  * the `AtomicFiles`/`ControlFs` scaladocs argue every marker protocol
  * tolerates. Running the engine lifecycle on this scheme proves the
  * protocols never depended on rename atomicity.
  */
class ObjectStoreFs extends RawLocalFileSystem {
  override def getScheme: String = "objstorefs"
  override def getUri: URI = URI.create("objstorefs:///")

  override def rename(src: Path, dst: Path): Boolean = {
    if (!exists(src)) return false
    if (getFileStatus(src).isDirectory) {
      // dir rename: file-by-file copy (destination files appear one by
      // one, like s3a), crash window, then recursive source delete
      org.apache.hadoop.fs.FileUtil.copy(this, src, this, dst, false, getConf)
      ObjectStoreFs.maybeCrash(src)
      delete(src, true)
    } else {
      // file rename: the copied object becomes visible WHOLE (local
      // tmp + atomic move stands in for PUT-completes-atomically)
      val tmp = new Path(dst.getParent,
        s".${dst.getName}.put-${java.util.UUID.randomUUID()}")
      org.apache.hadoop.fs.FileUtil.copy(this, src, this, tmp, false, getConf)
      if (!super.rename(tmp, dst)) { delete(tmp, false); return false }
      ObjectStoreFs.maybeCrash(src)
      delete(src, false)
    }
    true
  }
}

object ObjectStoreFs {
  // one-shot crash triggers by source-path substring: the copy has
  // completed (destination visible), the source delete never runs — the
  // torn copy+delete rename
  private val armed = new java.util.concurrent.ConcurrentLinkedQueue[String]

  def crashBetweenCopyAndDelete(pathSubstring: String): Unit =
    armed.add(pathSubstring)

  def disarm(): Unit = armed.clear()

  private[testfs] def maybeCrash(src: Path): Unit = {
    val s = src.toString
    val it = armed.iterator()
    while (it.hasNext) {
      if (s.contains(it.next())) {
        it.remove()
        throw new java.io.IOException(
          s"ObjectStoreFs: injected crash between copy and delete at $s")
      }
    }
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
