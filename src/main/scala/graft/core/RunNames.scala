package graft.core

/** The store run-file naming convention that carries each batch's VERSION in
  * the file name — the visibility protocol's one moving part, shared by the
  * writers (LocalRunWriter, DocStore's staged Spark appends) and both
  * readers (DocStore.log's listing filter, LocalPointReader.listRuns).
  *
  * Why names, not footers: readers must decide a file's visibility (is its
  * version committed, i.e. ≤ the collection counter?) BEFORE opening it — a
  * crashed or in-flight writer's batch would otherwise serve phantom rows
  * that later tie a committed batch on (version, seq) and flip LWW winners
  * nondeterministically. Listing names is information the reader already
  * has; footers would cost an open per file.
  *
  * Files WITHOUT a version tag (pre-protocol stores, compaction output —
  * which rewrites only already-committed winners) are always visible.
  */
object RunNames {

  private val Tag = raw"-v(\d{20})[-.]".r

  /** The version a run name carries, None for untagged (always-visible)
    * names. The tag is `-v` + 20 zero-padded digits + a `-`/`.` delimiter:
    * UUID segments (≤12 hex chars) and Spark part numbers (5 digits) can
    * never counterfeit it.
    */
  def version(fileName: String): Option[Long] =
    Tag.findFirstMatchIn(fileName)
      .flatMap(m => scala.util.Try(m.group(1).toLong).toOption)

  /** A driver-local run file name for a batch committed under `v`. */
  def localRun(v: Long): String =
    f"part-local-v$v%020d-${java.util.UUID.randomUUID().toString}.parquet"

  /** A published name for the `i`-th part of a staged Spark batch. */
  def sparkRun(v: Long, batchId: String, i: Int): String =
    f"part-v$v%020d-$batchId-$i%05d.parquet"

  /** True for names the data-file listing convention counts as runs. */
  def isRun(name: String): Boolean =
    name.endsWith(".parquet") && !name.startsWith(".") && !name.startsWith("_")
}
