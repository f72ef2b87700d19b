package graft
import org.apache.spark.sql.SparkSession
import graft.fixtures.{MiniOntology, Transcripts}
import graft.pipeline.KgPipeline
object BenchProbe {
  def run(cpus: Int, nConvs: Long, reps: Int): Double = {
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled","true").config("spark.ui.enabled","false")
      .config("spark.local.dir","/dev/shm/graft-spark").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val tr = Transcripts.synthetic(s, nConvs).cache(); val nT = tr.count()
    val ont = MiniOntology.writeTo("target/fixtures")
    val ctx = KgPipeline.prepare(s, ont, extraLexicon = Some(Transcripts.bigLexicon(s)))
    KgPipeline.runPrepared(s, tr.limit(2000), ctx).triples.count() // warm
    var best = Double.MaxValue
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = KgPipeline.runPrepared(s, tr, ctx).triples.count()
      val sec = (System.nanoTime()-t0)/1e9
      println(f"cpus=$cpus rep=$r turns=$nT triples=$n sec=$sec%.2f thr=${nT/sec}%.0f")
      best = math.min(best, sec)
    }
    s.stop(); nT / best
  }
  def main(args: Array[String]): Unit = {
    val convs = args.headOption.map(_.toLong).getOrElse(300000L)
    val thr8 = run(8, convs, 4)
    val thr32 = run(32, convs, 4)
    println(f"EFFICIENCY=${thr32/thr8/4.0}%.3f thr8=$thr8%.0f thr32=$thr32%.0f")
  }
}
