package graft.tools

/**
 * Shared local-FS file-count helpers for the scale probes (probe-only:
 * engine code never walks directories — readers go through partition
 * discovery). ONE definition so a storage-layout change (file naming,
 * nesting) cannot silently desynchronize the probes' pruning counts.
 */
object ProbeFs {
  import scala.jdk.CollectionConverters._

  /** Walk `dir` with the stream CLOSED afterwards (Files.walk holds open
    * DirectoryStreams — dropping it leaks a descriptor per directory). */
  private def walkCount(dir: String)(pred: java.nio.file.Path => Boolean): Long = {
    val p = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(p)) 0L
    else scala.util.Using.resource(java.nio.file.Files.walk(p))(
      _.iterator().asScala.count(pred).toLong)
  }

  /** Number of .parquet files under `dir` (0 when absent). */
  def parquetFiles(dir: String): Long =
    walkCount(dir)(_.toString.endsWith(".parquet"))

  /** Number of .parquet files under `dir` whose path carries a `tb=<n>`
    * partition value in `buckets` — "files a pruned query opens". */
  def parquetFilesInBuckets(dir: String, buckets: Set[Int]): Long = {
    val re = "tb=(\\d+)".r
    walkCount(dir)(f => f.toString.endsWith(".parquet") &&
      re.findFirstMatchIn(f.toString).exists(m => buckets.contains(m.group(1).toInt)))
  }
}
