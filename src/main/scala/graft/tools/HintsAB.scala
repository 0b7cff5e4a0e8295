package graft.tools

import graft.analysis.Tokenizer
import graft.functions.BM25
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** A/B harnesses for the hints sidecar.
  *
  * Build-pass mode (`runMain graft.tools.HintsAB <sfDir> <inflate> <cores>`):
  * codegen'd full-term window vs the skew-safe HintsTopH typed
  * aggregator, on an inflated corpus.
  *
  * Strategy mode (`runMain graft.tools.HintsAB strategies <sfDir> [cores]`):
  * docs-scored comparison of the θ warm-start under TopHHints vs
  * EpsilonNetHints vs no hints, on the fixed query set AND the
  * selective needle+hay workload (the two sets the round-3 verdict
  * names) — the observable that decides which witness-selection rule
  * prunes more.
  */
object HintsAB {

  private def strategies(sfDir: String, cores: Int): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.index.{IndexBuilder, Wand}
    def cost(ix: String, qs: Seq[graft.core.Types.TermQuery], useHints: Boolean) = {
      val m = Wand.topKWithMetrics(spark, ix, Seq(1L), qs, useHints)._2.collect()
      (m.map(_.getLong(1)).sum, m.map(_.getLong(2)).sum, m.map(_.getLong(3)).sum)
    }
    // the selective workload from Bench: one df=0.1% needle over a
    // universal base vocabulary — where θ-pruning can actually fire
    val selDir = java.nio.file.Files.createTempDirectory("graft-hints-sel-").toString
    val base = "hay wheat barley rye oat corn spelt millet"
    spark.range(100000).select(col("id").as("doc_id"),
        when(col("id") % 1000 === 0, lit(s"needle $base")).otherwise(lit(base)).as("text"))
      .repartition(cores)
      .write.mode(SaveMode.Overwrite).parquet(s"$selDir/documents.parquet")
    val selQs = Seq(graft.core.Types.TermQuery(0, Seq("needle", "hay"), 5))
    val dirs = scala.collection.mutable.ArrayBuffer.empty[String]
    try {
      Seq[(String, graft.index.IndexBuilder.HintStrategy)](
        "topH" -> IndexBuilder.TopHHints,
        "epsNet" -> IndexBuilder.EpsilonNetHints(),
        "random" -> IndexBuilder.RandomWitnessHints()).foreach { case (nm, strat) =>
        val fixedIx = java.nio.file.Files.createTempDirectory(s"graft-hab-$nm-").toString
        val selIx = java.nio.file.Files.createTempDirectory(s"graft-hab-sel-$nm-").toString
        dirs += fixedIx; dirs += selIx
        IndexBuilder.build(spark, sfDir, fixedIx, numShards = 4, hintStrategy = strat)
        IndexBuilder.build(spark, selDir, selIx, numShards = cores, hintStrategy = strat)
        val f = cost(fixedIx, graft.queries.QuerySet.queries, useHints = true)
        val s = cost(selIx, selQs, useHints = true)
        println(s"[ab] $nm fixed-set: docs_scored=${f._1} decoded=${f._2} skipped=${f._3}")
        println(s"[ab] $nm selective: docs_scored=${s._1} decoded=${s._2} skipped=${s._3}")
        if (nm == "topH") {
          val f0 = cost(fixedIx, graft.queries.QuerySet.queries, useHints = false)
          val s0 = cost(selIx, selQs, useHints = false)
          println(s"[ab] none fixed-set: docs_scored=${f0._1} decoded=${f0._2} skipped=${f0._3}")
          println(s"[ab] none selective: docs_scored=${s0._1} decoded=${s0._2} skipped=${s0._3}")
        }
      }
    } finally {
      graft.operators.StreamingOps.deleteRec(dirs.toSeq: _*)
      graft.operators.StreamingOps.deleteRec(selDir)
      spark.stop()
    }
  }

  def main(args: Array[String]): Unit = {
    if (args.nonEmpty && args(0) == "strategies") {
      strategies(args(1), if (args.length > 2) args(2).toInt else 8)
      return
    }
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
