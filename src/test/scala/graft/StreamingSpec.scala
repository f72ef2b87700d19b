package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.fixtures.{MiniOntology, Transcripts}
import graft.pipeline.KgPipeline
import graft.streaming.IncrementalKg

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("Trigger.AvailableNow processes only new snapshot deltas; restart is incremental") {
    val base = Files.createTempDirectory("graft_stream").toString
    val in = s"$base/in"; val out = s"$base/out"; val cp = s"$base/cp"
    val ctx = KgPipeline.prepare(spark, MiniOntology.writeTo("target/fixtures"))

    // snapshot delta #1: conversations 0..99
    Transcripts.synthetic(spark, 100).write.mode("append").parquet(in)
    val b1 = IncrementalKg.processAvailable(spark, in, ctx, out, cp)
    assert(b1 >= 1)
    val afterFirst = spark.read.parquet(out).count()
    assert(afterFirst > 0)

    // no new data: re-run must process nothing new (output unchanged)
    IncrementalKg.processAvailable(spark, in, ctx, out, cp)
    assert(spark.read.parquet(out).count() == afterFirst)

    // snapshot delta #2: different conversations (ids offset via filter trick)
    Transcripts.synthetic(spark, 140)
      .filter(col("conv_id").isin((100 until 140).map("conv" + _): _*))
      .write.mode("append").parquet(in)
    IncrementalKg.processAvailable(spark, in, ctx, out, cp)
    val afterSecond = spark.read.parquet(out)

    // delta-1 triples appear exactly once (no reprocessing), delta-2 added
    assert(afterSecond.count() > afterFirst)
    val dupCheck = afterSecond.groupBy("subj", "pred", "obj").count()
      .filter(col("count") > 1).count()
    assert(dupCheck == 0, "incremental restart reprocessed old files")
  }
}
