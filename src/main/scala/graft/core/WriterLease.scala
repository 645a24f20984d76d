package graft.core

/** Coarse per-collection CROSS-PROCESS writer lease — the liveness layer of
  * the two-writer protocol on a shared root (the reference never needs one:
  * it is single-process by design and serializes writers with an in-process
  * mutex, `internal/index/index_manager.go:291-301`; a shared hdfs://s3a://
  * root has the problem on day one).
  *
  * Layering — the lease is for LIVENESS, the counter for CORRECTNESS:
  *
  *  - The lease serializes writers in the common case, so version-counter
  *    collisions (both writers stamping the same version) are rare instead
  *    of constant. It is a single recoverable marker: `<nonce> <expiryMs>`,
  *    acquired create-exclusive (conditional-put semantics via
  *    [[ControlFs.createExclusive]]), renewed by a daemon heartbeat at
  *    TTL/3 while held, deleted on release, STOLEN when expired (a crashed
  *    holder's lease expires; the stealer reports `stole = true` so the
  *    caller can reconcile the crashed writer's debris first).
  *
  *  - Correctness never rests on the lease: even when two processes hold
  *    overlapping leases (clock skew, a steal racing a stalled holder), the
  *    version counter's create-exclusive commit makes the collision LOUD
  *    ([[CounterCollisionException]]) and the DocStore retry loop deletes
  *    the loser's batch and re-stamps — no silent last-writer-wins, no
  *    duplicate (version, seq) ties.
  *
  * Residual window, stated honestly: a rename-based FileSystem API has no
  * compare-and-swap on the lease file itself, so "verify the lease is still
  * mine, then commit" ([[HeldLease.fence]], called immediately before the
  * counter commit) is check-then-act with a sub-millisecond gap. Exploiting
  * it requires a holder stalled past the whole TTL (heartbeats make that a
  * crash-length stall, not a long Spark job), a stealer that completes
  * reconcile+write+commit inside that gap, and the stalled writer resuming
  * in the same instant — and even then the loser's commit collides and its
  * batch is retried whole. The only uncovered interleaving is the stealer's
  * reconcile deleting a still-in-flight writer's uncommitted run in the
  * fence-to-commit gap; deployments that cannot accept it should point the
  * lease at a CAS-capable store (the seam is one `ControlFs` method).
  *
  * Clock skew: expiry compares the HOLDER's clock (writer of the expiry
  * stamp) against the OBSERVER's; skew greater than the TTL can cause a
  * premature steal — which the counter collision again turns loud, not
  * corrupt. Knobs: `graft.lease.ttlMs` (default 60 s), `graft.lease.waitMs`
  * (acquire timeout, default 120 s), `graft.lease.enabled` (default true;
  * disabling is a TEST knob for driving the collision backstop directly —
  * a disabled lease also disables steal-reconciliation, so crash debris
  * with reused version names is only prevented by the lease being on).
  */
object WriterLease {

  final class LeaseLost(path: String, detail: String)
    extends java.io.IOException(s"writer lease $path lost: $detail")

  final class LeaseTimeout(path: String, waitedMs: Long, holder: String)
    extends java.io.IOException(
      s"writer lease $path not acquired after ${waitedMs} ms (held by $holder)")

  /** What `withLease` hands the body: `lease` None when leasing is disabled;
    * `stole` true when this acquisition recovered an EXPIRED lease — the
    * previous holder crashed mid-write (a clean writer always releases), so
    * the caller must reconcile its debris before stamping new versions.
    */
  final case class LeaseCtx(lease: Option[HeldLease], stole: Boolean) {
    /** Throws [[LeaseLost]] unless the lease is still ours (no-op when
      * leasing is disabled). Call immediately before the commit point. */
    def fence(): Unit = lease.foreach(_.fence())
  }

  def enabled: Boolean = sys.props.get("graft.lease.enabled").forall(_.toBoolean)
  def ttlMs: Long = java.lang.Long.getLong("graft.lease.ttlMs", 60000L)
  def waitMs: Long = java.lang.Long.getLong("graft.lease.waitMs", 120000L)

  // shared heartbeat scheduler: one daemon thread renews every held lease
  private lazy val renewer = {
    val t = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(r => {
      val th = new Thread(r, "graft-lease-renewer"); th.setDaemon(true); th
    })
    t
  }

  def withLease[A](cfs: ControlFs, path: String)(body: LeaseCtx => A): A = {
    if (!enabled) return body(LeaseCtx(None, stole = false))
    val (lease, stole) = acquire(cfs, path)
    try body(LeaseCtx(Some(lease), stole))
    finally lease.release()
  }

  /** Acquire (blocking up to `waitMs`), returning the held lease and
    * whether an expired predecessor was stolen along the way.
    */
  private def acquire(cfs: ControlFs, path: String): (HeldLease, Boolean) = {
    val nonce = java.util.UUID.randomUUID().toString
    val deadline = System.currentTimeMillis() + waitMs
    var stole = false
    var sleep = 2L
    while (true) {
      if (cfs.createExclusive(path, s"$nonce ${System.currentTimeMillis() + ttlMs}"))
        return (new HeldLease(cfs, path, nonce), stole)
      cfs.readLinesSafe(path).flatMap(_.headOption) match {
        case None => () // vanished between create and read (a release) — retry now
        case Some(line) =>
          val expiry = parseExpiry(line)
          // corrupt content is a torn marker = recoverable = treat expired
          if (expiry.forall(_ < System.currentTimeMillis())) {
            // steal: delete the dead lease; the create-exclusive retry
            // decides between racing stealers
            cfs.deleteIfExists(path)
            stole = true
          } else {
            if (System.currentTimeMillis() > deadline)
              throw new LeaseTimeout(path, waitMs, line)
            Thread.sleep(sleep)
            sleep = math.min(sleep * 2, 100L)
          }
      }
      if (System.currentTimeMillis() > deadline)
        throw new LeaseTimeout(path, waitMs, "<unknown>")
    }
    throw new IllegalStateException("unreachable")
  }

  private[core] def parseExpiry(line: String): Option[Long] = {
    val i = line.indexOf(' ')
    if (i < 0) None
    else scala.util.Try(line.substring(i + 1).trim.toLong).toOption
  }

  /** A held lease: heartbeat-renewed at TTL/3 until released. */
  final class HeldLease private[WriterLease](cfs: ControlFs, val path: String,
      nonce: String) {
    @volatile private var lost: String = null
    @volatile private var released = false
    // serializes renew() against release(): without it, a heartbeat that
    // passed its released/mine checks can be interleaved by release()'s
    // delete and then RESURRECT the lease file with a fresh TTL — a ghost
    // lease no process holds, blocking the next writer for a full TTL and
    // forcing a spurious steal + orphan-reconcile pass
    private val ioLock = new Object
    private val heartbeat = renewer.scheduleAtFixedRate(() => renew(),
      ttlMs / 3, ttlMs / 3, java.util.concurrent.TimeUnit.MILLISECONDS)

    private def mine(): Boolean =
      cfs.readLinesSafe(path).flatMap(_.headOption)
        .exists(_.startsWith(nonce + " "))

    private def renew(): Unit = ioLock.synchronized {
      try {
        if (!released && lost == null) {
          if (!mine()) lost = "stolen or expired under heartbeat"
          // verify-then-write: a stealer in this gap is resolved loudly by
          // the counter collision, per the layering contract above
          else cfs.atomicWrite(path, s"$nonce ${System.currentTimeMillis() + ttlMs}")
        }
      } catch { case scala.util.control.NonFatal(_) =>
        // transient renew failures are fine while TTL remains; fence() is
        // the authoritative check
        ()
      }
    }

    def fence(): Unit = {
      if (lost != null) throw new LeaseLost(path, lost)
      if (!mine()) { lost = "foreign holder at fence"; throw new LeaseLost(path, lost) }
    }

    def release(): Unit = ioLock.synchronized {
      released = true
      heartbeat.cancel(false)
      try { if (mine()) cfs.deleteIfExists(path) }
      catch { case scala.util.control.NonFatal(_) => () } // TTL reclaims it
    }
  }
}
