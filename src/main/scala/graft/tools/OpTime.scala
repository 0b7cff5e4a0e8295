package graft.tools

import org.apache.spark.sql.SparkSession

/** Time one registry query in isolation:
  * `runMain graft.tools.OpTime <sfDir> <queryName> [reps] [cores]`.
  * Prints one line per rep plus the min — the same min-of-reps
  * convention as Bench (noisy-VM discipline).
  */
object OpTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    val cores = if (args.length > 3) args(3).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-optime-$name")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    val times = (1 to reps).map { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).collect().length
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[optime] $name rep$i: $s%.3f s ($n rows)")
      s
    }
    println(f"[optime] $name min: ${times.min}%.3f s")
    spark.stop()
  }
}
