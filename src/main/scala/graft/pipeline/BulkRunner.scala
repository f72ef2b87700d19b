package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.curie.Converter
import graft.icelite.Icelite
import graft.sources.{OboGraphReader, SourceResolver}

/**
 * Bulk driver (SURVEY S11 — scripts/from_bioregistry.py): iterate many
 * ontologies, resolve each through the cascading source list, standardize,
 * log the version, and run the corpus pipeline per prefix. Failures are
 * recorded and skipped — one bad ontology never kills the sweep
 * (from_bioregistry.py catches subprocess/ValueError the same way).
 */
object BulkRunner {

  final case class OntologyJob(prefix: String, sources: Seq[SourceResolver.SourceSpec])
  final case class JobReport(prefix: String, ok: Boolean, version: Option[String],
                             triples: Long, messages: Seq[String])

  def run(spark: SparkSession,
          jobs: Seq[OntologyJob],
          transcripts: DataFrame,
          converter: Converter,
          icelite: Option[Icelite] = None): Seq[JobReport] = {
    jobs.map { job =>
      // P8 canonical-prefix guard (robot.py:132-133): hard, driver-side
      converter.normalizePrefix(job.prefix) match {
        case None =>
          JobReport(job.prefix, ok = false, None, 0L,
            Seq(s"'${job.prefix}' is not a canonical prefix"))
        case Some(canonicalPrefix) =>
          val res = SourceResolver.resolve(spark, job.sources)
          res.graphs match {
            case None =>
              JobReport(canonicalPrefix, ok = false, None, 0L, res.messages)
            case Some(graphs) =>
              try {
                val version = OboGraphReader.squeezeGraph(graphs, Some(canonicalPrefix))
                  .select(OboGraphReader.versionColumn).collect()
                  .headOption.flatMap(r => Option(r.getString(0)))
                val ctx = KgPipeline.prepare(spark, sourcePathOf(res), converter,
                  Some(canonicalPrefix))
                // per-job context released once counted: a 1.2k-prefix sweep
                // must not accumulate 1.2k cached tables + broadcast automatons
                try {
                  val result = KgPipeline.runPrepared(spark, transcripts, ctx,
                    icelite, runTag = s"bulk/$canonicalPrefix")
                  JobReport(canonicalPrefix, ok = true, version,
                    result.triples.count(), res.messages)
                } finally ctx.release()
              } catch {
                case e: Exception =>
                  JobReport(canonicalPrefix, ok = false, None, 0L,
                    res.messages :+ s"pipeline failed: ${e.getMessage}")
              }
          }
      }
    }
  }

  /** The path the PARSEABLE JSON actually lives at: a ConvertedSource's
    * `path` is the raw pre-conversion OWL/OBO — feeding that to the pipeline
    * would re-parse garbage; its converter output (`outPath`) is the document
    * the resolution succeeded on. */
  private def sourcePathOf(res: SourceResolver.Resolution): String =
    res.resolvedFrom.map {
      case c: SourceResolver.ConvertedSource => c.outPath
      case s                                 => s.path
    }.getOrElse(throw new IllegalStateException("resolved graphs without a source"))
}
