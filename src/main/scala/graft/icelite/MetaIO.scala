package graft.icelite

import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

/**
 * Metadata IO for the icelite snapshot layer — the seam that makes the
 * table layer storage-agnostic. Every manifest/pointer/claim operation in
 * [[Icelite]] goes through this trait; the DATA files already do (Spark's
 * parquet reader/writer speaks Hadoop `FileSystem` natively), so with this
 * seam an icelite root can be a local directory, `file://`, `hdfs://`, or
 * any other Hadoop-registered scheme.
 *
 * Two implementations, dispatched on the root's scheme
 * ([[MetaIO.forRoot]]):
 *
 *  - [[NioMetaIO]] for scheme-less local paths — keeps the POSIX `O_EXCL`
 *    guarantee behind the snapshot-id claim CAS (java.nio `CREATE_NEW` is
 *    truly atomic on one filesystem, including across processes).
 *  - [[HadoopMetaIO]] for URIs — `FileSystem.create(path, overwrite=false)`
 *    is the claim CAS (atomic in the HDFS namenode; object stores without
 *    conditional writes weaken this to best-effort — documented below),
 *    and renames go through `FileContext.rename`, whose
 *    `Options.Rename` flag expresses both the fail-if-exists manifest
 *    commit and the overwriting pointer advance.
 *
 * S3A caveat (documented, not hidden): `create(overwrite=false)` on S3 is
 * check-then-put unless the store provides conditional writes, and rename
 * is copy+delete. On such stores the claim CAS and pointer atomicity
 * degrade to best-effort; run concurrent WRITERS against HDFS-backed
 * metadata (or a single ingest driver, the steady-state shape) and keep
 * S3 for the immutable data dirs, which never rename after commit.
 */
private[icelite] sealed trait MetaIO extends Serializable {
  /** Join path segments with the layer's separator (both impls use '/'). */
  def join(parts: String*): String = parts.mkString("/")
  def exists(p: String): Boolean
  def mkdirs(p: String): Unit
  def readString(p: String): String
  /** Write `content` to `tmp`, then atomically rename onto `dst`.
    * `replace=false` must FAIL if `dst` exists (manifest commit);
    * `replace=true` must atomically overwrite (pointer advance). */
  def writeAtomic(tmp: String, dst: String, content: String, replace: Boolean): Unit
  /** Atomic create-if-absent (the id-claim CAS): true = this caller created
    * the file, false = it already existed. */
  def createNew(p: String): Boolean
  def deleteIfExists(p: String): Unit
  /** Child NAMES (not paths) of `dir`; empty when `dir` is absent. */
  def list(dir: String): Seq[String]
  def lastModifiedMs(p: String): Long
  def deleteRecursive(dir: String): Unit
}

private[icelite] object MetaIO {
  private val SchemeRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://.*".r

  /** Scheme-less root → NIO (keeps O_EXCL claims); URI root → Hadoop. */
  def forRoot(root: String): MetaIO =
    if (SchemeRe.matches(root)) new HadoopMetaIO else NioMetaIO
}

/** java.nio implementation for plain local paths. */
private[icelite] object NioMetaIO extends MetaIO {
  private def path(p: String) = Paths.get(p)

  override def exists(p: String): Boolean = Files.exists(path(p))
  override def mkdirs(p: String): Unit = { Files.createDirectories(path(p)); () }
  override def readString(p: String): String =
    new String(Files.readAllBytes(path(p)), "UTF-8")

  override def writeAtomic(tmp: String, dst: String, content: String,
                           replace: Boolean): Unit = {
    Files.write(path(tmp), content.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    if (replace) {
      Files.move(path(tmp), path(dst),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING); ()
    } else {
      // the contract says replace=false must FAIL if dst exists, but
      // ATOMIC_MOVE alone maps to rename(2) on POSIX, which silently
      // REPLACES an existing target. A hard link is the real atomic
      // create-if-absent commit (throws FileAlreadyExistsException);
      // fall back to check+move only where the FS has no links.
      // r7 (ADVICE): filesystems that reject hard links don't all raise
      // UnsupportedOperationException — FUSE/network/SELinux-restricted
      // mounts surface plain IOException/FileSystemException. Treat ANY
      // link failure EXCEPT FileAlreadyExistsException (the contract's
      // loud already-exists signal, which must propagate) as "no link
      // support here" and take the check+move fallback.
      try { Files.createLink(path(dst), path(tmp)); () }
      catch {
        case e: java.nio.file.FileAlreadyExistsException => throw e
        case _: UnsupportedOperationException | _: java.io.IOException =>
          if (Files.exists(path(dst)))
            throw new java.nio.file.FileAlreadyExistsException(dst)
          Files.move(path(tmp), path(dst),
            java.nio.file.StandardCopyOption.ATOMIC_MOVE); ()
      }
      Files.deleteIfExists(path(tmp)); ()
    }
  }

  override def createNew(p: String): Boolean =
    try { Files.createFile(path(p)); true }
    catch { case _: java.nio.file.FileAlreadyExistsException => false }

  override def deleteIfExists(p: String): Unit = { Files.deleteIfExists(path(p)); () }

  override def list(dir: String): Seq[String] = {
    val d = path(dir)
    if (!Files.exists(d)) return Nil
    val stream = Files.list(d) // holds a directory fd until closed
    try stream.iterator().asScala.map(_.getFileName.toString).toList
    finally stream.close()
  }

  override def lastModifiedMs(p: String): Long =
    Files.getLastModifiedTime(path(p)).toMillis

  override def deleteRecursive(dir: String): Unit = {
    val d = path(dir)
    if (!Files.exists(d)) return
    val walk = Files.walk(d)
    try walk.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => { Files.deleteIfExists(p); () })
    finally walk.close()
  }
}

/** Hadoop FileSystem implementation for URI roots (file://, hdfs://, …). */
private[icelite] final class HadoopMetaIO extends MetaIO {
  import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}

  // FileSystem/FileContext are not Serializable — rebuilt lazily per JVM.
  // The active session's Hadoop conf (when present) carries the user's
  // fs.* settings; metadata ops are driver-side so the fallback bare
  // Configuration (core-site defaults) only matters in non-Spark tooling.
  @transient private lazy val conf =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  private def fs(p: Path): FileSystem = p.getFileSystem(conf)
  private def fc(p: Path): FileContext =
    FileContext.getFileContext(p.toUri, conf)

  override def exists(p: String): Boolean = { val hp = new Path(p); fs(hp).exists(hp) }
  override def mkdirs(p: String): Unit = { val hp = new Path(p); fs(hp).mkdirs(hp); () }

  override def readString(p: String): String = {
    val hp = new Path(p)
    val in = fs(hp).open(hp)
    try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
    finally in.close()
  }

  override def writeAtomic(tmp: String, dst: String, content: String,
                           replace: Boolean): Unit = {
    val tp = new Path(tmp); val dp = new Path(dst)
    val out = fs(tp).create(tp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    val flag = if (replace) Options.Rename.OVERWRITE else Options.Rename.NONE
    fc(tp).rename(tp, dp, flag) // atomic on HDFS; NONE throws if dst exists
  }

  override def createNew(p: String): Boolean = {
    val hp = new Path(p)
    try { fs(hp).create(hp, false).close(); true }
    catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      // RawLocalFileSystem signals exists-collision as a plain IOException
      case _: java.io.IOException if fs(hp).exists(hp) => false
    }
  }

  override def deleteIfExists(p: String): Unit = {
    val hp = new Path(p); fs(hp).delete(hp, false); ()
  }

  override def list(dir: String): Seq[String] = {
    val hp = new Path(dir)
    val f = fs(hp)
    if (!f.exists(hp)) Nil
    else f.listStatus(hp).toSeq.map(_.getPath.getName)
  }

  override def lastModifiedMs(p: String): Long = {
    val hp = new Path(p); fs(hp).getFileStatus(hp).getModificationTime
  }

  override def deleteRecursive(dir: String): Unit = {
    val hp = new Path(dir); fs(hp).delete(hp, true); ()
  }
}
