package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming coverage over the `events` table: a windowed
  * aggregation driven to completion synchronously (memory sink +
  * processAllAvailable), so the registry query is deterministic and
  * batch-comparable — the DuckDB oracle is the equivalent batch
  * windowed GROUP BY. The reference has no streaming (SURVEY.md §2.5);
  * this covers the engine-side streaming surface a web-scale ingest
  * pipeline needs (tumbling windows + watermark + event-time).
  */
object StreamingOps {

  def windowedEventCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val path = s"$sfDir/events.parquet"
    val schema = spark.read.parquet(path).schema
    // the streaming file source wants a directory; stage the fixture
    // file into one (a real deployment points at the ingest directory)
    val stageDir = java.nio.file.Files.createTempDirectory("graft-events-")
    java.nio.file.Files.copy(java.nio.file.Paths.get(path),
      stageDir.resolve("events.parquet"))
    val name = s"graft_stream_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val stream = spark.readStream.schema(schema).parquet(stageDir.toString)
      // the fixture stores TIMESTAMP_NTZ; event time must be TIMESTAMP
      // (session tz pinned to UTC, so epochs match the naive oracle)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
      .select(
        unix_timestamp(col("window.start")).cast("long").as("window_start"),
        col("event_type"),
        col("n").cast("long"),
        col("sum_value").cast("double"))
      .orderBy("window_start", "event_type")
  }

  val windowedEventCountsOracleSql: String =
    """SELECT CAST(epoch(time_bucket(INTERVAL '5 minutes', ts)) AS BIGINT) AS window_start,
      |       event_type,
      |       CAST(count(*) AS BIGINT) AS n,
      |       CAST(round(sum(value), 4) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin
}
