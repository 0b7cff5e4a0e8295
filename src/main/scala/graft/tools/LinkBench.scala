package graft.tools

import graft.operators.LinkOps
import org.apache.spark.sql.SparkSession

/** Timing harness for the link-graph family: per-phase wall times for
  * q68 extraction, the PageRank loop, and q70 aggregation at a given
  * fixture dir. Usage: runMain graft.tools.LinkBench [sfDir] [cores]
  */
object LinkBench {
  private def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[linkbench] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cores = args.lift(1).getOrElse("8")
    val factor = args.lift(2).map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-linkbench")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir =
      if (factor == 1) baseDir
      else time(s"inflate x$factor")(graft.Bench.inflate(spark, baseDir, factor)._1)
    time("warmup count")(graft.corpus.Corpus.documents(spark, sfDir).count())
    time("q68 linkGraph")(LinkOps.linkGraph(spark, sfDir).collect().length)
    time("q68 linkGraph rep2")(LinkOps.linkGraph(spark, sfDir).collect().length)
    time("q69 pageRank")(LinkOps.pageRank(spark, sfDir).collect().length)
    time("q69 pageRank rep2")(LinkOps.pageRank(spark, sfDir).collect().length)
    time("q70 anchorText")(LinkOps.anchorText(spark, sfDir).collect().length)
    spark.stop()
  }
}
