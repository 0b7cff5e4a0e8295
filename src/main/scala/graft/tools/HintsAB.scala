package graft.tools

import graft.analysis.Tokenizer
import graft.functions.BM25
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** A/B the hints top-H pass: codegen'd full-term window vs the
  * skew-safe HintsTopH typed aggregator, on an inflated corpus.
  * Usage: runMain graft.tools.HintsAB <sfDir> <inflate> <cores>
  */
object HintsAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val inflate = args(1).toInt
    val cores = args(2).toInt
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val n0 = docs0.agg(max("doc_id")).head().getLong(0) + 1
    val docs = docs0.crossJoin(spark.range(inflate).select(col("id").as("rep")))
      .select((col("doc_id") + col("rep") * n0).as("doc_id"), col("text"))
    val avgdl = 40.0
    val tf = Tokenizer.termFrequencies(docs)
      .select(col("term"), col("doc_id"), col("tf").cast("long"), col("dl").cast("long"))
      .persist()
    println(s"[ab] tf rows: ${tf.count()}")
    def t(name: String)(f: => Any): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"[ab] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    val out = java.nio.file.Files.createTempDirectory("graft-hints-ab-").toString
    t("window") {
      val hw = org.apache.spark.sql.expressions.Window
        .partitionBy("term").orderBy(col("tfn").desc, col("doc_id").asc)
      tf.select(col("term"), col("doc_id"), col("tf"), col("dl"),
          BM25.tfNormCol(col("tf"), col("dl"), lit(avgdl)).as("tfn"))
        .withColumn("rn", row_number().over(hw))
        .filter(col("rn") <= graft.index.IndexBuilder.HintsPerTerm)
        .select("term", "doc_id", "tf", "dl")
        .write.mode(SaveMode.Overwrite).parquet(s"$out/w")
    }
    t("aggregator") {
      import spark.implicits._
      tf.select(col("term"), col("doc_id"), col("tf"), col("dl"),
          BM25.tfNormCol(col("tf"), col("dl"), lit(avgdl)).as("tfn"))
        .as[(String, Long, Long, Long, Double)]
        .groupByKey(_._1)
        .agg(new graft.index.IndexBuilder.HintsTopH(
          graft.index.IndexBuilder.HintsPerTerm).toColumn.name("hs"))
        .flatMap { case (term, hs) => hs.map(r => (term, r.doc_id, r.tf, r.dl)) }
        .toDF("term", "doc_id", "tf", "dl")
        .write.mode(SaveMode.Overwrite).parquet(s"$out/a")
    }
    graft.operators.StreamingOps.deleteRec(out)
    spark.stop()
  }
}
