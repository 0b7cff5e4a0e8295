package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, Trigger}

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

  /** The REAL-INGEST shape of [[windowedEventCounts]]: append-mode
    * parquet sink + checkpoint, in two AvailableNow runs. Run 1
    * aggregates the fixture but emits nothing (append mode only emits a
    * window once the watermark passes its end). A LATE sentinel file
    * (the max-ts event shifted +30 days) then lands in the ingest
    * directory; run 2 — a NEW query resumed from the same checkpoint,
    * the way a real micro-batch ingest restarts — advances the
    * watermark past every original window and appends them, finalized,
    * to the sink. Output therefore equals the batch oracle over the
    * original events (the sentinel's own window is never finalized).
    */
  def windowedEventCountsFileSink(spark: SparkSession, sfDir: String): DataFrame = {
    val path = s"$sfDir/events.parquet"
    val schema = spark.read.parquet(path).schema
    val stageDir = java.nio.file.Files.createTempDirectory("graft-ingest-")
    java.nio.file.Files.copy(java.nio.file.Paths.get(path),
      stageDir.resolve("events.parquet"))
    val outDir = java.nio.file.Files.createTempDirectory("graft-sink-").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft-ck-").toString
    def run(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(stageDir.toString)
        .withColumn("ts", col("ts").cast("timestamp"))
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
        .select(
          unix_timestamp(col("window.start")).cast("long").as("window_start"),
          col("event_type"), col("n").cast("long"),
          col("sum_value").cast("double"))
      val q = stream.writeStream
        .outputMode("append")
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckDir)
        .trigger(Trigger.AvailableNow())
        .start()
      q.processAllAvailable()
      q.stop()
    }
    run()
    // late data: the newest event re-arrives 30 days later — beyond
    // every original window + watermark, so run 2 finalizes them all
    val tsType = schema("ts").dataType
    spark.read.parquet(path).orderBy(col("ts").desc).limit(1)
      .withColumn("ts",
        (col("ts").cast("timestamp") + expr("INTERVAL 30 DAYS")).cast(tsType))
      .write.mode("append").parquet(stageDir.toString)
    run()
    spark.read.parquet(outDir)
      .select(col("window_start").cast("long"), col("event_type"),
        col("n").cast("long"), col("sum_value").cast("double"))
      .orderBy("window_start", "event_type")
  }

  final case class SessionRow(user_id: Long, session_start: Long,
      session_end: Long, n: Long, sum_value: Double)

  /** Custom streaming state: per-user sessionization (30-minute
    * inactivity gap) with `flatMapGroupsWithState` — the
    * KeyValueGroupedDataset custom-state surface. Driven to completion
    * synchronously like [[windowedEventCounts]]; the DuckDB oracle is
    * the batch gaps-and-islands formulation, so the stateful handler's
    * semantics are pinned cross-engine.
    */
  def sessionize(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val path = s"$sfDir/events.parquet"
    val schema = spark.read.parquet(path).schema
    val stageDir = java.nio.file.Files.createTempDirectory("graft-sess-")
    java.nio.file.Files.copy(java.nio.file.Paths.get(path),
      stageDir.resolve("events.parquet"))
    val gapUs = 30L * 60 * 1000000
    val name = s"graft_sess_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val events = spark.readStream.schema(schema).parquet(stageDir.toString)
      .select(col("user_id").cast("long"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"),
        col("event_id").cast("long"), col("value").cast("double"))
      .as[(Long, Long, Long, Double)]
    val sessions = events.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, it: Iterator[(Long, Long, Long, Double)],
            state: org.apache.spark.sql.streaming.GroupState[Long]) => {
          // single AvailableNow batch: all of the user's events arrive
          // together; split the time-ordered run at >30-min gaps
          val evs = it.toSeq.sortBy(e => (e._2, e._3))
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionRow]
          var start = -1L; var last = -1L; var n = 0L; var sum = 0.0
          evs.foreach { case (_, ts, _, v) =>
            if (start < 0) { start = ts; last = ts; n = 1; sum = v }
            else if (ts - last > gapUs) {
              out += SessionRow(user, start, last, n, sum)
              start = ts; last = ts; n = 1; sum = v
            } else { last = ts; n += 1; sum += v }
          }
          if (start >= 0) out += SessionRow(user, start, last, n, sum)
          out.iterator
        })
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n"), round(col("sum_value"), 4).cast("double").as("sum_value"))
      .orderBy("user_id", "session_start")
  }

  val sessionizeOracleSql: String =
    """WITH e AS (
      |  SELECT CAST(user_id AS BIGINT) AS user_id, epoch_us(ts) AS ts_us,
      |         CAST(event_id AS BIGINT) AS event_id, value
      |  FROM events
      |), flagged AS (
      |  SELECT *, CASE WHEN ts_us - lag(ts_us) OVER w > 30 * 60 * 1000000
      |                 OR lag(ts_us) OVER w IS NULL THEN 1 ELSE 0 END AS brk
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
      |), numbered AS (
      |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |                           ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM flagged
      |)
      |SELECT user_id, CAST(min(ts_us) AS BIGINT) AS session_start,
      |       CAST(max(ts_us) AS BIGINT) AS session_end,
      |       CAST(count(*) AS BIGINT) AS n,
      |       CAST(round(sum(value), 4) AS DOUBLE) AS sum_value
      |FROM numbered GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  val windowedEventCountsOracleSql: String =
    """SELECT CAST(epoch(time_bucket(INTERVAL '5 minutes', ts)) AS BIGINT) AS window_start,
      |       event_type,
      |       CAST(count(*) AS BIGINT) AS n,
      |       CAST(round(sum(value), 4) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin
}
