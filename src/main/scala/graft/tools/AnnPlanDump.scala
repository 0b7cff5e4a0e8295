package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Plan dump for the persisted-ANN search paths (q44/q45/q47): their
  * registry forms `localized(...)` the result (the temp index is
  * deleted before return), so [[PlanDump]] only sees a LocalTableScan —
  * this tool builds the same throwaway indexes and dumps the INNER
  * search plans: `runMain graft.tools.AnnPlanDump <sfDir> <outDir> <suffix>`.
  */
object AnnPlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val suffix = args(2)
    java.nio.file.Files.createDirectories(outDir)
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-annplandump")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      java.nio.file.Files.writeString(
        outDir.resolve(s"${name}_$suffix.txt"),
        df.queryExecution.explainString(FormattedMode))
      println(s"[annplandump] wrote ${name}_$suffix.txt")
    }
    val lshIdx = java.nio.file.Files.createTempDirectory("graft-plan-lsh-").toString
    val ivfQIdx = java.nio.file.Files.createTempDirectory("graft-plan-sq-").toString
    val ivfFIdx = java.nio.file.Files.createTempDirectory("graft-plan-f64-").toString
    try {
      graft.index.AnnIndex.buildLsh(spark, sfDir, lshIdx)
      dump("q44_search_inner", graft.index.AnnIndex.searchLshAll(spark, lshIdx, sfDir))
      val mq = graft.index.AnnIndex.buildIvf(spark, sfDir, ivfQIdx,
        nlist = 16, quantLevels = 255)
      dump("q45_search_inner", graft.index.AnnIndex.searchIvfAll(
        spark, ivfQIdx, sfDir, nprobe = math.max(1, mq.nlist)))
      val mf = graft.index.AnnIndex.buildIvf(spark, sfDir, ivfFIdx, nlist = 16)
      dump("q47_search_inner", graft.index.AnnIndex.searchIvfAll(
        spark, ivfFIdx, sfDir, nprobe = math.max(1, mf.nlist)))
    } finally graft.operators.StreamingOps.deleteRec(lshIdx, ivfQIdx, ivfFIdx)
    spark.stop()
  }
}
