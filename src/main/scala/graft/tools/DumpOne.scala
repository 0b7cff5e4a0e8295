package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump ONE registry query's result + oracle SQL for a quick DuckDB
  * spot-check without a full Verify sweep:
  * `runMain graft.tools.DumpOne <sfDir> <queryName> <outDir> [cores]`.
  * Writes `<outDir>/<queryName>` (parquet) and `<outDir>/<queryName>.sql`.
  */
object DumpOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val outDir = args(2)
    val cores = if (args.length > 3) args(3).toInt else 8
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-dumpone-$name")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    graft.SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    graft.SparkEntry.oracleSql.get(name).foreach(sql =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$outDir/$name.sql"), sql))
    spark.stop()
  }
}
