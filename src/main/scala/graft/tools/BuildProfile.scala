package graft.tools

import graft.analysis.Tokenizer
import graft.index.IndexBuilder
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level build profiler (scaling diagnosis): runs the build's
  * constituent passes separately at a given core count.
  * Usage: runMain graft.tools.BuildProfile <corpusDir> <cores>
  */
object BuildProfile {
  def main(args: Array[String]): Unit = {
    val corpusDir = args(0)
    val cores = args(1).toInt
    sys.props("graft.profile.build") = "1" // per-phase [build-phase] lines
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = spark.read.parquet(s"$corpusDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    // warmup (codegen/JIT)
    docs.limit(5000).select(size(Tokenizer.tokensCol(col("text"))).as("dl"))
      .agg(sum("dl")).collect()
    t("A_stats_pass") {
      docs.select(size(Tokenizer.tokensCol(col("text"))).as("dl"))
        .agg(count(lit(1)), sum("dl")).collect()
    }
    t("B_tf_agg_count") {
      Tokenizer.termFrequencies(docs).groupBy().count().collect()
    }
    val ix = java.nio.file.Files.createTempDirectory(s"graft-prof-$cores-").toString
    t("C_full_build_cold") {
      IndexBuilder.build(spark, corpusDir, ix, numShards = 32)
    }
    // warm rep separates per-build fixed cost from one-time session
    // cost (codegen, committer init) — this is what Bench's min-of-reps
    // measures
    t("C_full_build_warm") {
      IndexBuilder.build(spark, corpusDir, ix, numShards = 32)
    }
    spark.stop()
  }
}
