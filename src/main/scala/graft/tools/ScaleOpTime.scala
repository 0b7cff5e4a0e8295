package graft.tools

import org.apache.spark.sql.SparkSession

/** Linearity evidence for per-row / single-aggregate pipeline ops:
  * time registry queries on ×factor replicated corpora (the Bench
  * inflate — shifted doc ids, preserved term distribution) and report
  * sec plus sec-per-million-docs, min-of-reps. An operator whose
  * sec/Mdoc holds flat across ×1 → ×10 → ×100 is linear in corpus
  * size — the property that rides a 1000-executor cluster unchanged.
  *
  * `runMain graft.tools.ScaleOpTime <sfDir> <factors> <q1,q2,...> [reps]`
  * e.g. `ScaleOpTime /root/testdata/sf0.1 1,10,100 q63_pii_scrub,q64_line_dedup`
  */
object ScaleOpTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val factors = args(1).split(",").map(_.toInt).toSeq
    val names = args(2).split(",").toSeq
    val reps = if (args.length > 3) args(3).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-scale-optime")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      for (factor <- factors) {
        val (dir, nDocs) =
          if (factor == 1) (sfDir, graft.corpus.Corpus.documents(spark, sfDir).count())
          else graft.Bench.inflate(spark, sfDir, factor)
        try {
          for (name <- names) {
            val fn = graft.SparkEntry.queries(name)
            fn(spark, dir).collect() // warmup (codegen/JIT/metadata)
            val times = (1 to reps).map { _ =>
              val t0 = System.nanoTime()
              fn(spark, dir).collect()
              (System.nanoTime() - t0) / 1e9
            }
            val m = times.min
            println(f"[scale] $name x$factor ($nDocs%,d docs): $m%.2f s  " +
              f"(${m * 1e6 / nDocs}%.2f s/Mdoc)")
          }
        } finally if (factor != 1) graft.operators.StreamingOps.deleteRec(dir)
      }
    } finally spark.stop()
  }
}
