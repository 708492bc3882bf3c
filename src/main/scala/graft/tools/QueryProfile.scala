package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.{SparkEntry, Tune}

/** Per-query execution-shape profile at one SF (r16 optimization round,
  * guide §1: measure first): for each declared query, min-of-2 timed
  * noop-sink passes with a listener counting Spark JOBS, STAGES, TASKS
  * and summed executor task time during the measured pass. The ratio
  * task_time / (wall · cores) separates compute-bound queries (ratio
  * near 1 — the machine was busy) from dispatch/overhead-bound ones
  * (ratio near 0 — the wall clock went to job/stage dispatch, driver
  * work, or serialized single-task stages; `max_task_ms` vs wall tells
  * which). Output: one JSON line per query, sorted by wall time.
  *
  *   tools/run_tool.sh graft.tools.QueryProfile /root/testdata/sf0.1 [name...]
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val only = args.drop(1).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    System.setProperty("graft.canon.sort", "false")
    Tune.applyShuffleWidth(spark, sfDir)

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskMs = 0L
    @volatile var maxTaskMs = 0L
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        synchronized { jobs += 1 }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        synchronized { stages += 1 }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
        tasks += 1
        val ms = t.taskInfo.duration
        taskMs += ms
        if (ms > maxTaskMs) maxTaskMs = ms
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val qs = SparkEntry.queries.filter { case (n, _) =>
      only.isEmpty || only.contains(n) }
    // JIT warm-up at the smallest SF, like Bench
    qs.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001").write.format("noop")
        .mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    def resetCounters(): Unit = synchronized {
      jobs = 0; stages = 0; tasks = 0; taskMs = 0L; maxTaskMs = 0L
    }
    case class Prof(name: String, wall: Double, jobs: Int, stages: Int,
                    tasks: Int, taskSec: Double, maxTaskSec: Double)
    val out = qs.toSeq.flatMap { case (name, fn) =>
      try {
        // warm at the target SF, then two measured passes; keep the
        // counter set from the FASTER pass (the steady state)
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        def pass(): Prof = {
          Thread.sleep(150) // let the async listener bus drain
          resetCounters()
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val wall = (System.nanoTime() - t0) / 1e9
          Thread.sleep(150)
          Prof(name, wall, jobs, stages, tasks, taskMs / 1e3,
            maxTaskMs / 1e3)
        }
        val p1 = pass(); val p2 = pass()
        Some(if (p1.wall <= p2.wall) p1 else p2)
      } catch { case e: Throwable =>
        System.err.println(s"[profile] $name failed: $e"); None
      }
    }
    val cores = cpus.toInt
    def f(v: Double) = String.format(java.util.Locale.ROOT, "%.3f",
      Double.box(v))
    out.sortBy(-_.wall).foreach { p =>
      val busy = p.taskSec / (p.wall * cores)
      println(s"""{"q":"${p.name}","wall":${f(p.wall)},"jobs":${p.jobs},""" +
        s""""stages":${p.stages},"tasks":${p.tasks},""" +
        s""""task_sec":${f(p.taskSec)},"max_task_sec":${f(p.maxTaskSec)},""" +
        s""""busy":${f(busy)}}""")
    }
    spark.stop()
  }
}
