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
}
