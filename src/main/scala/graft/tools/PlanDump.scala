package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dump `.explain("formatted")` of registry queries to files — the
  * plan-evidence half of the optimization round's measure→change→prove
  * loop (plans/r06/<query>_{before,after}.txt):
  * `runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> <q1> [q2 ...]`.
  * Each query's physical plan goes to `<outDir>/<name>_<suffix>.txt`.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val suffix = args(2)
    val names = args.drop(3).toSeq
    java.nio.file.Files.createDirectories(outDir)
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names) {
      graft.SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[plandump] no such query: $name")
        case Some(fn) =>
          val plan =
            try fn(spark, sfDir).queryExecution.explainString(FormattedMode)
            catch { case e: Throwable => s"EXPLAIN FAILED: $e" }
          java.nio.file.Files.writeString(
            outDir.resolve(s"${name}_$suffix.txt"), plan)
          println(s"[plandump] wrote ${name}_$suffix.txt (${plan.length} chars)")
      }
    }
    spark.stop()
  }
}
