package graft.tools

import graft.analysis.Tokenizer
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-probe for the tf-aggregation scaling anomaly.
  * Usage: runMain graft.tools.AggProbe <corpusDir> <cores> <shufflePartitions>
  */
object AggProbe {
  def main(args: Array[String]): Unit = {
    val Array(corpusDir, cores, parts) = args
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$corpusDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $name cores=$cores parts=$parts: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    t("warm")(docs.limit(100).count())
    t("explode_count") {
      Tokenizer.explodeTerms(docs).groupBy().count().collect()
    }
    t("tf_groupby") {
      Tokenizer.termFrequencies(docs).groupBy().count().collect()
    }
    t("tf_groupby_again") {
      Tokenizer.termFrequencies(docs).groupBy().count().collect()
    }
    spark.stop()
  }
}
