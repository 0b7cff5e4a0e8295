package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-stage profile of one registry query:
  * `runMain graft.tools.ProfileOp <sfDir> <queryName> [cores]`.
  * Runs the op once untimed (codegen/JIT warm), then once under a
  * stage listener; prints every stage of the timed run with its
  * wall-clock, task count, and callsite — the stage-level evidence the
  * sandbox's disabled UI cannot provide (guide §7.1).
  */
object ProfileOp {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val cores = if (args.length > 2) args(2).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-profile-$name")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    fn(spark, sfDir).collect() // warmup
    case class St(id: Int, name: String, tasks: Int, ms: Long,
        submitted: Long, runMs: Long, cpuMs: Long, gcMs: Long,
        deserMs: Long, resultMs: Long)
    val stages = scala.collection.mutable.ArrayBuffer.empty[St]
    val jobs = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, String)]
    val t00 = System.currentTimeMillis()
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val m = i.taskMetrics
        stages += St(i.stageId, i.name, i.numTasks,
          i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L),
          i.submissionTime.getOrElse(0L) - t00,
          m.executorRunTime, m.executorCpuTime / 1000000,
          m.jvmGCTime, m.executorDeserializeTime,
          m.resultSerializationTime)
      }
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs += ((js.jobId, System.currentTimeMillis() - t00,
          Option(js.properties.getProperty("spark.job.description")).getOrElse("")))
    }
    spark.sparkContext.addSparkListener(listener)
    // sampling stack profiler for the task threads: every 500 ms dump
    // the top frames of busy "Executor task launch worker" threads —
    // the sandbox has no UI/async-profiler, this is the §7.3 thread
    // dump done in-process
    val sampling = new java.util.concurrent.atomic.AtomicBoolean(true)
    val sampleCounts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val sampler = new Thread(() => {
      while (sampling.get()) {
        val ts = Thread.getAllStackTraces
        ts.forEach { (t, st) =>
          if (t.getName.startsWith("Executor task launch worker") &&
              t.getState == Thread.State.RUNNABLE && st.nonEmpty) {
            val key = st.take(12).map(f => s"${f.getClassName}.${f.getMethodName}")
              .mkString(" <- ")
            sampleCounts.merge(key, 1, (a, b) => a + b)
          }
        }
        Thread.sleep(500)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    val t0 = System.nanoTime()
    val n = fn(spark, sfDir).collect().length
    val total = (System.nanoTime() - t0) / 1e9
    sampling.set(false)
    import scala.jdk.CollectionConverters._
    sampleCounts.asScala.toSeq.sortBy(-_._2).take(8).foreach { case (k, c) =>
      println(s"[profile] $c samples: $k")
    }
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(500) // let the listener bus drain
    println(f"[profile] $name total: $total%.3f s ($n rows), ${stages.length} stages, ${jobs.length} jobs")
    jobs.foreach { case (id, at, desc) =>
      println(f"[profile] job $id%3d @ ${at / 1000.0}%7.3f s  $desc")
    }
    stages.sortBy(-_.ms).foreach { s =>
      println(f"[profile] stage ${s.id}%3d @ ${s.submitted / 1000.0}%7.3f s  ${s.ms / 1000.0}%7.3f s  ${s.tasks}%4d tasks  run=${s.runMs / 1000.0}%.3f cpu=${s.cpuMs / 1000.0}%.3f gc=${s.gcMs / 1000.0}%.3f deser=${s.deserMs / 1000.0}%.3f  ${s.name.take(90)}")
    }
    spark.stop()
  }
}
