package graft.icelite

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/**
 * Crash-safe FOLD of sibling `prefix<id>` directories into one — the shared
 * mechanism behind steady-state compaction (ANN index batches, dedup-history
 * batches). After D incremental appends a reader opens ≥D file sets per
 * probe; folding restores ~one file set without changing a single row.
 *
 * Safe WITHOUT multi-directory atomic rename (object stores have none):
 *
 *  1. the merged copy is staged under `base/_compact_tmp` — underscore
 *     paths are invisible both to parquet partition discovery and to any
 *     enumeration that filters on `prefix`;
 *  2. a `_covers` marker (the folded-through id) is written INSIDE the
 *     staging dir;
 *  3. the `base/_compacted_through` watermark write is the COMMIT POINT;
 *  4. the swap deletes the folded source dirs and renames staging into
 *     `prefix<target>`. The marker RIDES the rename — deleting it before
 *     the rename would open a window (sources deleted, marker gone,
 *     staging still underscore-named) where a rerun discards the only
 *     surviving copy as "uncommitted". After the rename it is pure
 *     cleanup: a crash leaves only an ignored underscore file.
 *
 * A rerun after a crash compares marker to watermark: equal ⇒ committed,
 * FINISH the swap (source deletes are idempotent); unequal or missing ⇒
 * uncommitted, discard staging — the sources are still intact. Readers call
 * [[ensureRecovered]] before enumerating `prefix` dirs, so a crash INSIDE
 * the swap (sources deleted, staging not yet renamed — the one window where
 * enumeration would miss folded rows) is healed by the first stored read,
 * not only by the next maintenance compact(). The swap is still not atomic
 * w.r.t. a reader running CONCURRENTLY with the fold itself — compaction is
 * a maintenance operation and runs in the ingest loop's quiet slot (the
 * Demo steady-state shape), like every metadata-less table format.
 *
 * Appends racing the fold are safe as long as they land ABOVE the folded
 * ids — both callers guarantee that (appendIvfPq refuses ids at or below
 * the watermark; streaming batch ids are checkpoint-monotone).
 */
object FoldSwap {

  val TmpName = "_compact_tmp"
  val WatermarkName = "_compacted_through"

  /** Highest id folded into `base` by compaction (-1 = none). */
  def compactedThrough(fs: FileSystem, base: String): Long =
    readLong(fs, new Path(s"$base/$WatermarkName"))

  /** Ids of existing `prefix<id>` dirs directly under `base`. */
  def listIds(fs: FileSystem, base: String, prefix: String): Seq[Long] = {
    val p = new Path(base)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
      .map { st =>
        val suffix = st.getPath.getName.stripPrefix(prefix)
        // r7 (ADVICE): a stray non-numeric dir (a manual 'batch_id=bak'
        // copy) must fail with the offending path and remedy, matching
        // readLong's loud-with-remedy convention — a bare
        // NumberFormatException here wedged every stored read and compact
        suffix.toLongOption.getOrElse(throw new IllegalStateException(
          s"non-numeric ${prefix}<id> directory ${st.getPath} under $base — " +
            "not FoldSwap layout. Remove or rename the stray directory " +
            "(ids must be plain longs for watermark ordering)"))
      }
  }

  private def readLong(fs: FileSystem, p: Path): Long =
    if (!fs.exists(p)) -1L
    else {
      val in = fs.open(p)
      val txt =
        try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
          java.nio.charset.StandardCharsets.UTF_8).trim
        finally in.close()
      // writes are atomic (temp + rename-overwrite below), so a non-long here
      // is EXTERNAL corruption — fail with the remedy, not a bare
      // NumberFormatException that wedges every ingest with no context
      try txt.toLong
      catch {
        case _: NumberFormatException => throw new IllegalStateException(
          s"corrupt compaction marker $p (content ${txt.take(40)}'): not a " +
            "long. This file is written atomically — corruption is external. " +
            "Restore it from backup or, if the fold state is known-good, " +
            "delete it (deleting the watermark loses folded-batch replay " +
            "REFUSAL: replays of folded ids would then duplicate rows).")
      }
    }

  /** Marker writes are ATOMIC (temp + rename-overwrite): the watermark is
    * the COMMIT POINT, and a crash mid-write must leave either the old
    * value or the new one — never a zero-length/partial file that wedges
    * every later `compactedThrough` (ingest calls it before appending).
    * Everything goes through FileContext: its local impl skips the
    * ChecksumFileSystem wrapper, so no `.crc` sidecar can go stale across
    * the data-file-only rename and poison a later checksummed open. */
  private def writeLong(fs: FileSystem, p: Path, v: Long): Unit = {
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(fs.getUri, fs.getConf)
    val tmp = new Path(p.getParent, p.getName + "._tmp")
    val out = fc.create(tmp,
      java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE,
        org.apache.hadoop.fs.CreateFlag.OVERWRITE),
      org.apache.hadoop.fs.Options.CreateOpts.createParent())
    try out.write(v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // a marker written by fs.create in an older layout left a checksum
    // sidecar; the rename below replaces only the data file, so drop it
    fs.delete(new Path(p.getParent, s".${p.getName}.crc"), false)
    fc.rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Swap-finish CLAIM file (the icelite snapshot-claim CAS precedent):
    * whoever atomically CREATE_NEWs it owns the three finish steps. Without
    * it, two racing finishers lose data — the delete set includes the very
    * path the winner renames staging into, so the loser's delete destroys
    * the only surviving copy of every folded batch. The claim carries an
    * OWNER TOKEN: release verifies it, so no party can delete another's
    * live claim (an unowned delete re-enables the two-finishers race
    * through release/sweep interleavings). Takeover after [[FinishWaitMs]]
    * is the lease-less trade: a finisher legitimately slower than the wait
    * (pathological object-store delete stalls) would be raced — deployments
    * where that is possible must raise the wait; true fencing needs a
    * coordination service, a declared boundary. */
  val ClaimName = "_recover.claim"

  /** Bounded wait for another party's finish (tests shrink it). */
  private[graft] var FinishWaitMs: Long = 60000L

  private def claimPath(base: String) = new Path(s"$base/$ClaimName")

  /** Atomic CREATE_NEW with an owner token. Returns the token, or None when
    * the claim is already held. Other IO faults PROPAGATE (the
    * MetaIO.createNew exists-qualified semantics — swallowing them would
    * misreport an FS outage as "claim held" and block reads for the wait). */
  private def tryClaim(fs: FileSystem, base: String): Option[String] = {
    val token = java.util.UUID.randomUUID().toString
    try {
      val out = fs.create(claimPath(base), false)
      try out.write(token.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      Some(token)
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => None
      case e: java.io.IOException =>
        if (fs.exists(claimPath(base))) None else throw e
    }
  }

  private def readClaimToken(fs: FileSystem, base: String): Option[String] =
    if (!fs.exists(claimPath(base))) None
    else {
      val in = fs.open(claimPath(base))
      try Some(new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8))
      finally in.close()
    }

  /** Delete the claim ONLY if `token` still owns it — read-verify-delete
    * (the residual TOCTOU needs a takeover to interleave between the two
    * steps, orders of magnitude narrower than the unowned delete it
    * replaces, and survivable: the next compact sweeps or takes over). */
  private def releaseClaim(fs: FileSystem, base: String, token: String): Unit =
    if (readClaimToken(fs, base).contains(token)) { fs.delete(claimPath(base), false); () }

  /** Maintenance-only: delete regardless of owner (presumed-dead takeover). */
  private def breakClaim(fs: FileSystem, base: String): Unit = {
    fs.delete(claimPath(base), false); ()
  }

  /** The three finish steps — ONE definition shared by [[compact]] and
    * [[ensureRecovered]] so the delete-set rule can never fork between
    * writer recovery and reader healing. MUST be called holding the claim. */
  private def finishSwap(fs: FileSystem, base: String, prefix: String, w: Long): Unit = {
    listIds(fs, base, prefix).filter(_ <= w).foreach(id =>
      fs.delete(new Path(s"$base/$prefix$id"), true))
    require(fs.rename(new Path(s"$base/$TmpName"), new Path(s"$base/$prefix$w")),
      s"compaction rename failed for $base")
    fs.delete(new Path(s"$base/$prefix$w/_covers"), false)
  }

  /** Wait (bounded) for the claim holder's finish; loud failure names the
    * remedy — a stale claim is a crash-mid-finish artifact only compact()
    * (the single maintenance writer) may take over. */
  private def awaitFinished(fs: FileSystem, base: String): Unit = {
    val tmp = new Path(s"$base/$TmpName")
    val deadline = System.nanoTime() + FinishWaitMs * 1000000L
    while (fs.exists(tmp) && System.nanoTime() < deadline) Thread.sleep(100L)
    if (fs.exists(tmp)) throw new IllegalStateException(
      s"committed compaction swap at $base still unfinished after $FinishWaitMs ms " +
        s"while another party holds $ClaimName — if that process is dead, run the " +
        "table's maintenance compact() (it takes over stale claims after the same wait)")
  }

  /**
   * Finish an interrupted but COMMITTED swap, if any — called by stored
   * READERS before enumerating `prefix` dirs, closing the post-crash window
   * (watermark committed, sources deleted, staging still underscore-named)
   * where enumeration would silently miss every folded row until the next
   * maintenance compact(). Uncommitted staging needs nothing: the sources
   * are intact and the underscore dir is invisible to discovery. A fold
   * running concurrently in its pre-commit phase is left alone (its
   * `_covers` cannot equal the current watermark — targets are strictly
   * above it). Finishing is CLAIM-serialized; a reader that loses the claim
   * waits for the holder and fails LOUDLY on timeout (a reader never takes
   * over a stale claim — presumed-dead judgements belong to the single
   * maintenance writer, not to N concurrent readers).
   */
  def ensureRecovered(spark: SparkSession, base: String, prefix: String): Unit = {
    val fs = new Path(base).getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new Path(s"$base/$TmpName")
    if (!fs.exists(tmp)) return
    val w = compactedThrough(fs, base)
    val tmpCovers = readLong(fs, new Path(s"$base/$TmpName/_covers"))
    if (tmpCovers != w || w < 0) return // uncommitted — compact() discards it
    tryClaim(fs, base) match {
      case Some(token) =>
        try {
          // re-derive EVERYTHING under the claim — the pre-claim peek may
          // be stale (another finisher completed and a NEW fold committed
          // in between; finishing to the stale target would rename the new
          // staging over an old dir and leave its sources as duplicates)
          val wNow = compactedThrough(fs, base)
          if (fs.exists(tmp) && wNow >= 0 &&
            readLong(fs, new Path(s"$base/$TmpName/_covers")) == wNow)
            finishSwap(fs, base, prefix, wNow)
        } finally releaseClaim(fs, base, token)
      case None => awaitFinished(fs, base)
    }
  }

  /**
   * Fold the dirs `selectFoldable` picks (from the current listing) into
   * `prefix<max(foldable)>`. `stage(tmpPath, foldIds, target)` writes the
   * merged copy to `tmpPath` — it must read ONLY the foldable sources (a
   * caller whose reader sees every dir filters to `foldIds` itself).
   * No-op (returns the current watermark) when fewer than 2 dirs are
   * foldable. `failAt` ("before-commit" | "after-commit") is a TEST-ONLY
   * failpoint. Returns the new watermark.
   */
  def compact(spark: SparkSession, base: String, prefix: String,
              selectFoldable: Seq[Long] => Seq[Long],
              stage: (String, Seq[Long], Long) => Unit,
              failAt: Option[String] = None): Long = {
    val fs = new Path(base).getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new Path(s"$base/$TmpName")
    val covers = new Path(s"$base/$TmpName/_covers")
    // claim-or-take-over: compact IS the single maintenance writer, so a
    // claim that outlives [[FinishWaitMs]] is a crash-mid-finish artifact
    // (or a wedged finisher — the lease-less trade documented on
    // [[ClaimName]]); readers only wait, compact may break it. Returns
    // Some(ourToken) when WE must finish, None when another party did.
    def claimAsMaintenance(): Option[String] =
      tryClaim(fs, base) match {
        case s @ Some(_) => s
        case None =>
          try { awaitFinished(fs, base); None } // live holder finished
          catch {
            case _: IllegalStateException => // presumed dead: take over
              breakClaim(fs, base)
              Some(tryClaim(fs, base).getOrElse(throw new IllegalStateException(
                s"could not take over the stale $ClaimName at $base")))
          }
      }
    // finish a COMMITTED swap under the claim, re-deriving the target from
    // the fresh watermark (never a pre-claim peek)
    def finishCommittedClaimed(): Unit =
      claimAsMaintenance() match {
        case Some(token) =>
          try {
            val wNow = compactedThrough(fs, base)
            if (fs.exists(tmp) && wNow >= 0 && readLong(fs, covers) == wNow)
              finishSwap(fs, base, prefix, wNow)
          } finally releaseClaim(fs, base, token)
        case None => () // another party finished it
      }
    // crash recovery from a previous run
    if (fs.exists(tmp)) {
      val w = compactedThrough(fs, base)
      val tmpCovers = readLong(fs, covers)
      if (tmpCovers == w && w >= 0) {
        // committed: finish. Deleting every remaining source dir at or
        // below the watermark is exactly the interrupted swap's delete set
        // (fold sets are always "all selected ids ≤ target").
        finishCommittedClaimed()
        return compactedThrough(fs, base)
      } else fs.delete(tmp, true) // uncommitted: sources intact, discard staging
    }
    // any claim with NO staging behind it is stale (a finisher crashed after
    // its rename but before releasing; a live one's remaining work — the
    // _covers cleanup and its token-checked self-release — cannot race a
    // later claim) — sweep so it cannot wedge readers
    if (fs.exists(claimPath(base))) breakClaim(fs, base)
    val ids = listIds(fs, base, prefix)
    val foldable = selectFoldable(ids)
    if (foldable.size <= 1) return compactedThrough(fs, base)
    val target = foldable.max
    // recovery's delete-everything-<=-watermark is the interrupted swap's
    // delete set ONLY for a downward-closed fold set; a selector that skips
    // an id below target would make recovery delete the skipped dir — rows
    // that exist nowhere else. Enforce the invariant instead of trusting it.
    require(foldable.toSet == ids.filter(_ <= target).toSet,
      s"fold set must be downward-closed (every existing id <= $target): " +
        s"selected ${foldable.sorted} of ${ids.sorted} — a crash after commit " +
        "would make recovery delete the skipped dirs' only copy")
    stage(tmp.toString, foldable, target)
    writeLong(fs, covers, target)
    if (failAt.contains("before-commit"))
      throw new RuntimeException("failpoint: before-commit")
    writeLong(fs, new Path(s"$base/$WatermarkName"), target) // COMMIT POINT
    if (failAt.contains("after-commit"))
      throw new RuntimeException("failpoint: after-commit")
    // the claim is taken AFTER the commit point: a crash here leaves no
    // claim, so reader healing stays immediate for the common crash; only a
    // crash INSIDE finishSwap leaves a stale claim (readers fail loudly,
    // the next compact takes it over after the wait). If a reader claimed
    // first and then DIED mid-finish, this — the maintenance writer — takes
    // the claim over right here instead of throwing the reader-oriented
    // "run compact()" advice at itself.
    finishCommittedClaimed()
    target
  }
}
