package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Micro-slices of the shingle-derivation pipeline, each timed with the
  * noop sink (guide §1.4) — pinpoints WHERE the substring/shingle
  * family's cost actually sits (scan? repartition? tokenize? shingle?
  * explode? checkpoint?): `runMain graft.tools.SliceProbe <sfDir> [cores]`.
  */
object SliceProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cores = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-sliceprobe")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.analysis.Tokenizer

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t(name: String, reps: Int = 2)(f: => Unit): Unit = {
      f // warmup
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[slice] $name%-42s min ${times.min}%7.3f s  (${times.map(x => f"$x%.3f").mkString(", ")})")
    }

    val docs = () => graft.corpus.Corpus.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val par = spark.sparkContext.defaultParallelism
    val toks = Tokenizer.tokensCol(col("text"))
    def shingle(c: org.apache.spark.sql.Column) = array_distinct(
      when(size(c) >= 3,
        expr("transform(sequence(1, size(t) - 2), " +
          "i -> concat(t[i-1], ' ', t[i], ' ', t[i+1]))"))
        .otherwise(array().cast("array<string>")))

    t("scan only")(noop(docs()))
    t("scan+repartition")(noop(docs().repartition(par)))
    t("tokenize (1 split)")(noop(docs().select(col("doc_id"), toks.as("t"))))
    t("tokenize (par)")(noop(docs().repartition(par).select(col("doc_id"), toks.as("t"))))
    t("tok+shingle (1 split)")(noop(docs().select(col("doc_id"), toks.as("t"))
      .select(col("doc_id"), shingle(col("t")).as("shingles"))))
    t("tok+shingle (par)")(noop(docs().repartition(par).select(col("doc_id"), toks.as("t"))
      .select(col("doc_id"), shingle(col("t")).as("shingles"))))
    t("tok+shingle+explode (par)")(noop(
      docs().repartition(par).select(col("doc_id"), toks.as("t"))
        .select(col("doc_id"), shingle(col("t")).as("shingles"))
        .select(col("doc_id"), explode(col("shingles")).as("shingle"))))
    t("... + localCheckpoint")(
      docs().repartition(par).select(col("doc_id"), toks.as("t"))
        .select(col("doc_id"), shingle(col("t")).as("shingles"))
        .select(col("doc_id"), explode(col("shingles")).as("shingle"))
        .localCheckpoint().unpersist())
    // candidate fixes for the explode re-evaluation
    t("ckpt(arrays) then explode")(
      noop(docs().repartition(par).select(col("doc_id"), toks.as("t"))
        .select(col("doc_id"), shingle(col("t")).as("shingles"))
        .localCheckpoint()
        .select(col("doc_id"), explode(col("shingles")).as("shingle"))))
    t("exchange barrier then explode")(
      noop(docs().select(col("doc_id"), toks.as("t"))
        .select(col("doc_id"), shingle(col("t")).as("shingles"))
        .repartition(par)
        .select(col("doc_id"), explode(col("shingles")).as("shingle"))))
    t("posexplode(toks) direct (par)")(
      noop(docs().repartition(par)
        .select(col("doc_id"), posexplode(toks).as(Seq("p", "tok")))))
    t("posexplode after barrier")(
      noop(docs().select(col("doc_id"), toks.as("t")).repartition(par)
        .select(col("doc_id"), posexplode(col("t")).as(Seq("p", "tok")))))
    t("explodeTerms (IndexBuilder shape)")(
      noop(Tokenizer.explodeTerms(docs())))
    println("==== plan: tok+shingle+explode (par) ====")
    docs().repartition(par).select(col("doc_id"), toks.as("t"))
      .select(col("doc_id"), shingle(col("t")).as("shingles"))
      .select(col("doc_id"), explode(col("shingles")).as("shingle"))
      .explain("formatted")
    println("==== plan: exchange barrier then explode ====")
    docs().select(col("doc_id"), toks.as("t"))
      .select(col("doc_id"), shingle(col("t")).as("shingles"))
      .repartition(par)
      .select(col("doc_id"), explode(col("shingles")).as("shingle"))
      .explain("formatted")
    println("==== plan: posexplode(toks) direct ====")
    docs().repartition(par)
      .select(col("doc_id"), posexplode(toks).as(Seq("p", "tok")))
      .explain("formatted")
    spark.stop()
  }
}
