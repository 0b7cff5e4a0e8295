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

  /** Recursive temp-dir cleanup: the registry streaming queries stage
    * ingest/sink/checkpoint directories per invocation, and the bench
    * re-runs them — without cleanup /tmp grows without bound.
    */
  private[graft] def deleteRec(dirs: String*): Unit = dirs.foreach { d =>
    val p = java.nio.file.Paths.get(d)
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      // Files.walk holds open directory handles until closed — the
      // bench calls this once per op/rep cycle, so rely on close, not GC
      val walk = java.nio.file.Files.walk(p)
      val paths = try walk.iterator().asScala.toSeq finally walk.close()
      paths.reverseIterator.foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  /** Pin a small result locally (driver rows) so its backing temp files
    * can be deleted before return; preserves row order and schema.
    */
  private[graft] def localized(df: DataFrame): DataFrame = {
    val rows = df.collect()
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), df.schema)
  }

  /** Run `f` with streaming-friendly session conf, restored after: 8
    * state partitions and no checkpoint checksum sidecars. The registry
    * streaming queries drive 2 AvailableNow runs over a fixture-scale
    * input through a throwaway checkpoint; at the session's 32 shuffle
    * partitions each run churns 32 state-store delta/snapshot (+
    * checksum twin) files PER stateful operator — the measured floor is
    * checkpoint file I/O, not aggregation. The state partition count is
    * pinned at checkpoint CREATION, so the override only shapes the
    * temp checkpoints these queries stage themselves; a production
    * ingest keeps its own sizing.
    */
  private def withStreamConf[A](spark: SparkSession)(f: => A): A = {
    val conf = spark.conf
    def restore(k: String, old: Option[String]): Unit =
      old.fold(conf.unset(k))(v => conf.set(k, v))
    val kp = "spark.sql.shuffle.partitions"
    val kc = "spark.sql.streaming.checkpoint.fileChecksum.enabled"
    val savedP = conf.getOption(kp)
    val savedC = conf.getOption(kc)
    conf.set(kp, "8")
    conf.set(kc, "false")
    try f finally { restore(kp, savedP); restore(kc, savedC) }
  }

  def windowedEventCounts(spark: SparkSession, sfDir: String): DataFrame =
      withStreamConf(spark) {
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
    deleteRec(stageDir.toString) // memory sink holds the rows; stage done
    spark.table(name)
      .select(
        unix_timestamp(col("window.start")).cast("long").as("window_start"),
        col("event_type"),
        col("n").cast("long"),
        col("sum_value").cast("double"))
      .orderBy("window_start", "event_type")
  }

  def windowedEventCountsFileSink(spark: SparkSession, sfDir: String): DataFrame =
    withStreamConf(spark)(windowedEventCountsFileSinkImpl(spark, sfDir))

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
  private def windowedEventCountsFileSinkImpl(spark: SparkSession, sfDir: String): DataFrame = {
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
    // pin the (small, finalized) result locally, then drop all three
    // temp dirs — the returned frame must not depend on them
    try localized(
      spark.read.parquet(outDir)
        .select(col("window_start").cast("long"), col("event_type"),
          col("n").cast("long"), col("sum_value").cast("double"))
        .orderBy("window_start", "event_type"))
    finally deleteRec(stageDir.toString, outDir, ckDir)
  }

  final case class SessionRow(user_id: Long, session_start: Long,
      session_end: Long, n: Long, sum_value: Double)

  /** The open (not yet gap-closed) session of one user, held in
    * `GroupState` across micro-batches. Timestamps in event-time
    * micros.
    */
  final case class OpenSession(start: Long, last: Long, n: Long, sum: Double)

  /** Inactivity gap: 30 minutes. */
  val SessionGapUs: Long = 30L * 60 * 1000000

  /** The per-batch state-transition function — REAL incremental state:
    * each micro-batch folds its (batch-sorted) events into the user's
    * open session from `GroupState`, emits every session CLOSED by a
    * gap, keeps the trailing open session in state, and arms an
    * event-time timeout at `last + gap` — when the watermark passes it,
    * the session is provably complete (no non-late event can extend
    * it) and the timeout path emits it. Multi-batch ingest therefore
    * produces the same sessions as single-batch (StreamingSpec pins
    * 2-batch ≡ 1-batch ≡ the batch oracle).
    */
  private[operators] def sessionStep(user: Long,
      it: Iterator[(Long, Long, Long, Double, java.sql.Timestamp)],
      state: org.apache.spark.sql.streaming.GroupState[OpenSession]): Iterator[SessionRow] = {
    if (state.hasTimedOut) {
      // watermark passed last + gap: the open session is final
      val s = state.get
      state.remove()
      Iterator.single(SessionRow(user, s.start, s.last, s.n, s.sum))
    } else {
      val evs = it.toArray.sortBy(e => (e._2, e._3)) // in-batch (ts, event_id) order
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionRow]
      var cur: OpenSession = state.getOption.orNull
      evs.foreach { case (_, ts, _, v, _) =>
        if (cur == null) cur = OpenSession(ts, ts, 1L, v)
        else if (ts - cur.last > SessionGapUs) {
          out += SessionRow(user, cur.start, cur.last, cur.n, cur.sum)
          cur = OpenSession(ts, ts, 1L, v)
        } else cur = OpenSession(math.min(cur.start, ts), math.max(cur.last, ts),
          cur.n + 1L, cur.sum + v)
      }
      if (cur != null) {
        state.update(cur)
        // ms granularity; +1 so the timeout strictly exceeds last + gap
        state.setTimeoutTimestamp(cur.last / 1000 + SessionGapUs / 1000 + 1)
      }
      out.iterator
    }
  }

  /** One AvailableNow micro-batch run of the sessionizer over whatever
    * files currently sit in `stageDir`, resumed from `ckDir` — the unit
    * the registry query AND the 2-batch ≡ 1-batch spec compose.
    */
  private[graft] def sessionizeRun(spark: SparkSession, stageDir: String,
      outDir: String, ckDir: String,
      schema: org.apache.spark.sql.types.StructType): Unit = {
    import spark.implicits._
    // the watermarked event-time column `ts` must survive projection
    // into the grouped Dataset (event-time timeout requires it); the
    // handler itself works on exact micros (ts_us)
    val events = spark.readStream.schema(schema).parquet(stageDir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "10 minutes")
      .select(col("user_id").cast("long"),
        unix_micros(col("ts")).as("ts_us"),
        col("event_id").cast("long"), col("value").cast("double"),
        col("ts"))
      .as[(Long, Long, Long, Double, java.sql.Timestamp)]
    val sessions = events.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(sessionStep)
    val q = sessions.writeStream.outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
  }

  /** Custom streaming state: per-user sessionization (30-minute
    * inactivity gap) with `flatMapGroupsWithState` over REAL
    * incremental `GroupState` + event-time timeout (see
    * [[sessionStep]]). Registry form uses the same two-run
    * checkpoint-resumed append-sink harness as
    * [[windowedEventCountsFileSink]]: run 1 ingests the fixture and
    * emits gap-closed sessions; a sentinel event (user −1, +30 days)
    * then advances the watermark and run 2 — a NEW query resumed from
    * the same checkpoint — times out and emits every remaining open
    * session. Output ≡ the batch gaps-and-islands oracle over the
    * original events (the sentinel's own open session never emits and
    * is filtered defensively).
    */
  def sessionize(spark: SparkSession, sfDir: String): DataFrame =
    withStreamConf(spark)(sessionizeImpl(spark, sfDir))

  private def sessionizeImpl(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val path = s"$sfDir/events.parquet"
    val schema = spark.read.parquet(path).schema
    val stageDir = java.nio.file.Files.createTempDirectory("graft-sess-")
    java.nio.file.Files.copy(java.nio.file.Paths.get(path),
      stageDir.resolve("events.parquet"))
    val outDir = java.nio.file.Files.createTempDirectory("graft-sess-sink-").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft-sess-ck-").toString
    def run(): Unit = sessionizeRun(spark, stageDir.toString, outDir, ckDir, schema)
    run()
    // sentinel: a user −1 event 30 days past the fixture max — advances
    // the watermark beyond every open session's timeout in run 2
    val tsType = schema("ts").dataType
    spark.read.parquet(path).orderBy(col("ts").desc).limit(1)
      .withColumn("ts",
        (col("ts").cast("timestamp") + expr("INTERVAL 30 DAYS")).cast(tsType))
      .withColumn("user_id", lit(-1L).cast(schema("user_id").dataType))
      .write.mode("append").parquet(stageDir.toString)
    run()
    try localized(
      spark.read.parquet(outDir)
        .filter(col("user_id") >= 0)
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n"), round(col("sum_value"), 4).cast("double").as("sum_value"))
        .orderBy("user_id", "session_start"))
    finally deleteRec(stageDir.toString, outDir, ckDir)
  }

  final case class DedupRow(doc_id: Long, canonical_id: Long, kept: Int)

  /** First-arrival representative for one content hash, held in
    * `GroupState` across micro-batches AND across checkpoint-resumed
    * runs.
    */
  final case class SeenHash(rep: Long)

  /** Per-batch dedup transition: the first batch that carries a hash
    * elects its min doc_id as the canonical representative (emitted
    * with kept=1); every other arrival of that hash — later in the
    * same batch, a later batch, or a later checkpoint-resumed run —
    * is emitted as a drop decision (kept=0) pointing at the stored
    * representative. No timeout: dedup state is permanent by design
    * (a production ingest would TTL it; fixture scale keeps it all).
    */
  private[operators] def dedupStep(h: String, it: Iterator[(String, Long)],
      state: org.apache.spark.sql.streaming.GroupState[SeenHash]): Iterator[DedupRow] = {
    val ids = it.map(_._2).toArray.sorted
    state.getOption match {
      case Some(s) => ids.iterator.map(id => DedupRow(id, s.rep, 0))
      case None if ids.isEmpty => Iterator.empty
      case None =>
        val rep = ids.head
        state.update(SeenHash(rep))
        Iterator.single(DedupRow(rep, rep, 1)) ++
          ids.iterator.drop(1).map(id => DedupRow(id, rep, 0))
    }
  }

  /** One AvailableNow dedup run over the files in `stageDir`, resumed
    * from `ckDir` — composed by the registry query and by the
    * 2-batch ≡ 1-batch spec.
    */
  private[graft] def streamDedupRun(spark: SparkSession, stageDir: String,
      outDir: String, ckDir: String,
      schema: org.apache.spark.sql.types.StructType): Unit = {
    import spark.implicits._
    val docs = spark.readStream.schema(schema).parquet(stageDir)
      .select(md5(col("text")).as("h"), col("doc_id").cast("long"))
      .as[(String, Long)]
    val decisions = docs.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(dedupStep)
    val q = decisions.writeStream.outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
  }

  /** Streaming dedup-on-ingest — the keep/drop decision stream a
    * training-data pipeline applies at ingest time, as stateful
    * streaming (`flatMapGroupsWithState` keyed by content hash, state
    * = first-arrival canonical id). Registry form: run 1 ingests the
    * fixture (single-batch, so canonical = min doc_id per hash — the
    * q12 batch semantics); then the min-id document RE-ARRIVES under a
    * fresh doc_id (max+1) and run 2, a NEW query resumed from the same
    * checkpoint, emits the drop decision (kept=0, canonical = the
    * run-1 representative) — cross-run dedup state proven inside the
    * oracled output itself. Semantics divergence from batch q12 is
    * first-arrival-wins: a hash's canonical is the min doc_id of the
    * EARLIEST batch carrying it (equal to the global min when batches
    * arrive in id order, as here and in the spec's 2-batch split).
    */
  def streamDedup(spark: SparkSession, sfDir: String): DataFrame =
    withStreamConf(spark)(streamDedupImpl(spark, sfDir))

  private def streamDedupImpl(spark: SparkSession, sfDir: String): DataFrame = {
    val path = s"$sfDir/documents.parquet"
    val schema = spark.read.parquet(path).schema
    val stageDir = java.nio.file.Files.createTempDirectory("graft-dedup-")
    val outDir = java.nio.file.Files.createTempDirectory("graft-dedup-sink-").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft-dedup-ck-").toString
    // everything from the fixture copy onward sits inside the cleanup
    // scope: a failed streaming run must not strand a fixture-sized
    // copy per bench rep (opOnce catches and the rep loop re-invokes)
    try {
      java.nio.file.Files.copy(java.nio.file.Paths.get(path),
        stageDir.resolve("documents.parquet"))
      def run(): Unit = streamDedupRun(spark, stageDir.toString, outDir, ckDir, schema)
      run()
      // the min-id document re-arrives as a new ingest file under doc_id
      // max+1 — run 2 must recognize it from checkpointed state
      val bounds = spark.read.parquet(path)
        .agg(min("doc_id").cast("long"), max("doc_id").cast("long")).head()
      val (minId, maxId) = (bounds.getLong(0), bounds.getLong(1))
      spark.read.parquet(path).filter(col("doc_id") === minId)
        .withColumn("doc_id", lit(maxId + 1).cast(schema("doc_id").dataType))
        .write.mode("append").parquet(stageDir.toString)
      run()
      localized(
        spark.read.parquet(outDir)
          .select(col("doc_id").cast("long"), col("canonical_id").cast("long"),
            col("kept").cast("int"))
          .orderBy("doc_id"))
    } finally deleteRec(stageDir.toString, outDir, ckDir)
  }

  val streamDedupOracleSql: String =
    """WITH d AS (SELECT doc_id, md5(text) AS h FROM documents),
      |c AS (SELECT h, min(doc_id) AS canonical_id FROM d GROUP BY h)
      |SELECT doc_id, canonical_id, kept FROM (
      |  SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
      |         CAST(c.canonical_id AS BIGINT) AS canonical_id,
      |         CAST(CASE WHEN d.doc_id = c.canonical_id THEN 1 ELSE 0 END AS INT) AS kept
      |  FROM d JOIN c USING (h)
      |  UNION ALL
      |  SELECT CAST((SELECT max(doc_id) + 1 FROM documents) AS BIGINT),
      |         CAST((SELECT min(doc_id) FROM documents) AS BIGINT),
      |         CAST(0 AS INT)
      |) ORDER BY doc_id""".stripMargin

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
