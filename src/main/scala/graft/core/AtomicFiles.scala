package graft.core

import java.nio.file.{Files, Path, StandardCopyOption}

/** Shared crash-safe marker-file IO: every on-disk control file in the
  * engine (DocStore's `_version` counter, Engine's layout stamps, streaming
  * replay ledger/intent markers, bucketed-table meta) commits via
  * tmp + atomic rename, so a reader never observes a truncated file.
  *
  * Read-side policies differ by file AUTHORITY and stay at the call sites:
  * recoverable markers degrade to "absent" on corrupt content
  * (`readLongSafe` → fall back / rebuild), while DocStore's version counter
  * is authoritative and must never be defaulted — its reads stay strict.
  */
object AtomicFiles {

  def atomicWrite(p: Path, content: String): Unit = {
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    Files.writeString(tmp, content)
    Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Corrupt-tolerant read for RECOVERABLE markers (crash mid-write must
    * degrade to None, never wedge the recovery path).
    */
  def readLongSafe(p: Path): Option[Long] =
    if (!Files.exists(p)) None
    else scala.util.Try(Files.readString(p).trim.toLong).toOption
}
