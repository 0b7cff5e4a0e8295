package graft

import graft.operators.StreamingOps
import org.scalatest.funsuite.AnyFunSuite

/** Real-ingest streaming surface: the append-mode parquet sink must
  * emit exactly the batch-equivalent windows once a late batch advances
  * the watermark past them (checkpoint-resumed second run), matching
  * the complete-mode/memory-sink fixture query row for row.
  */
class StreamingSpec extends AnyFunSuite {

  test("file-sink append mode + late-data watermark finalization ≡ complete mode") {
    val spark = TestSpark.spark
    def key(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Long, Double)] =
      df.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val appended = key(StreamingOps.windowedEventCountsFileSink(spark, TestSpark.Sf0001))
    val complete = key(StreamingOps.windowedEventCounts(spark, TestSpark.Sf0001))
    assert(appended.nonEmpty, "no windows were finalized into the file sink")
    assert(appended == complete,
      s"append-mode sink diverges: only-in-sink=${(appended -- complete).take(3)} " +
        s"missing=${(complete -- appended).take(3)}")
  }

  /** The sessionizer's GroupState must be REAL incremental state: the
    * same events split across two checkpoint-resumed micro-batch runs
    * (batch 2 EXTENDS user 1's open session and CLOSES user 2's) must
    * produce exactly the single-batch sessions — and both must equal
    * the hand-computed gaps-and-islands gold.
    */
  test("stateful sessionization: 2-batch checkpoint-resumed ≡ 1-batch ≡ gold") {
    val spark = TestSpark.spark
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ev(u: Long, minute: Long, id: Long, v: Double) =
      (u, new java.sql.Timestamp(base + minute * 60000L), id, v)
    val batch1 = Seq(ev(1, 0, 1, 1.0), ev(1, 10, 2, 2.0),
      ev(2, 0, 3, 1.5), ev(2, 5, 4, 0.5))
    // 20 min extends user 1 (gap 10 ≤ 30); 200/180 min close + reopen
    val batch2 = Seq(ev(1, 20, 5, 3.0), ev(1, 200, 6, 1.0), ev(2, 180, 7, 2.0))
    val sentinel = Seq(ev(-1, 60L * 24 * 40, 99, 0.0)) // +40 days: flush all

    def runScenario(batches: Seq[Seq[(Long, java.sql.Timestamp, Long, Double)]])
        : Set[(Long, Long, Long, Long, Double)] = {
      val stage = java.nio.file.Files.createTempDirectory("sess-spec-stage-").toString
      val out = java.nio.file.Files.createTempDirectory("sess-spec-out-").toString
      val ck = java.nio.file.Files.createTempDirectory("sess-spec-ck-").toString
      try {
        batches.foreach { b =>
          b.toDF("user_id", "ts", "event_id", "value")
            .coalesce(1).write.mode("append").parquet(stage)
          val schema = spark.read.parquet(stage).schema
          graft.operators.StreamingOps.sessionizeRun(spark, stage, out, ck, schema)
        }
        spark.read.parquet(out).filter(org.apache.spark.sql.functions.col("user_id") >= 0)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getDouble(4))).toSet
      } finally graft.operators.StreamingOps.deleteRec(stage, out, ck)
    }

    def us(minute: Long) = (base + minute * 60000L) * 1000L
    val gold = Set(
      (1L, us(0), us(20), 3L, 6.0),
      (1L, us(200), us(200), 1L, 1.0),
      (2L, us(0), us(5), 2L, 2.0),
      (2L, us(180), us(180), 1L, 2.0))
    val twoBatch = runScenario(Seq(batch1, batch2, sentinel))
    val oneBatch = runScenario(Seq(batch1 ++ batch2, sentinel))
    assert(oneBatch == gold, s"1-batch != gold: $oneBatch")
    assert(twoBatch == gold,
      s"2-batch != gold: extra=${twoBatch -- gold} missing=${gold -- twoBatch}")
  }

  /** Streaming dedup state must survive micro-batch boundaries AND
    * checkpoint-resumed runs: the same docs split id-ordered across
    * two runs (batch 2 re-sends batch-1 content under new ids AND
    * introduces a fresh hash) must produce exactly the single-batch
    * decisions — and both must equal the hand-computed
    * first-arrival gold.
    */
  test("streaming dedup: 2-run checkpoint-resumed ≡ 1-run ≡ gold") {
    val spark = TestSpark.spark
    import spark.implicits._
    val batch1 = Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa"))
    val batch2 = Seq((4L, "bbb"), (5L, "ccc"), (6L, "ccc"), (7L, "aaa"))

    def runScenario(batches: Seq[Seq[(Long, String)]]): Set[(Long, Long, Int)] = {
      val stage = java.nio.file.Files.createTempDirectory("dedup-spec-stage-").toString
      val out = java.nio.file.Files.createTempDirectory("dedup-spec-out-").toString
      val ck = java.nio.file.Files.createTempDirectory("dedup-spec-ck-").toString
      try {
        batches.foreach { b =>
          b.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(stage)
          val schema = spark.read.parquet(stage).schema
          StreamingOps.streamDedupRun(spark, stage, out, ck, schema)
        }
        spark.read.parquet(out).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      } finally StreamingOps.deleteRec(stage, out, ck)
    }

    val gold = Set((1L, 1L, 1), (2L, 2L, 1), (3L, 1L, 0),
      (4L, 2L, 0), (5L, 5L, 1), (6L, 5L, 0), (7L, 1L, 0))
    val oneRun = runScenario(Seq(batch1 ++ batch2))
    val twoRun = runScenario(Seq(batch1, batch2))
    assert(oneRun == gold, s"1-run != gold: $oneRun")
    assert(twoRun == gold,
      s"2-run != gold: extra=${twoRun -- gold} missing=${gold -- twoRun}")
  }
}
