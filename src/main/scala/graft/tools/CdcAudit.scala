package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Tables, Tune}
import graft.functions.Text
import graft.operators.Dedup

/** Stage decomposition for the CDC/text-kernel families' residual 1000×
  * marginal (r15): the r14 width fix targeted shuffle spill, but t25 is
  * MAP-SIDE (no corpus shuffle beyond spreadPartitions' spread), and
  * its 1000× marginal still runs ~4× the 100× one — so the growth must
  * live in the scan→spread→kernel chain, not the joins. Stages:
  *
  *   scan_count      — parquet scan + count (split count printed)
  *   spread_count    — + spreadPartitions (the corpus exchange)
  *   normalize       — + the normalize projection
  *   kernel          — + CdcKernel ends (boundary scan, no explode)
  *   t25_chunks      — full cdcChunks (explode + md5 per chunk)
  *   d18_neardup     — full cdcNearDup
  *
  * Each stage runs at TWO scan granularities: the 128 MB default
  * maxPartitionBytes (a 600 MB replica file = ~5 scan tasks) and 16 MB
  * (≥32 tasks — decompression parallelizes and the spread exchange
  * becomes a no-op because the scan already exceeds the core count).
  *
  *   /tmp/graftrun.sh graft.tools.CdcAudit /tmp/graftscale/x100 /tmp/graftscale/x1000
  */
object CdcAudit {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import graft.functions.Core.spreadPartitions
    val stages: Seq[(String, String => DataFrame)] = Seq(
      "scan_count" -> { d: String =>
        Tables.documents(spark, d).agg(count(lit(1)).as("n"),
          sum(length(col("text"))).as("chars"))
      },
      "spread_count" -> { d: String =>
        spreadPartitions(Tables.documents(spark, d))
          .agg(count(lit(1)).as("n"), sum(length(col("text"))).as("chars"))
      },
      "normalize" -> { d: String =>
        spreadPartitions(Tables.documents(spark, d))
          .select(Text.normalize(col("text")).as("t"))
          .agg(sum(length(col("t"))).as("chars"))
      },
      "kernel" -> { d: String =>
        spreadPartitions(Tables.documents(spark, d))
          .select(graft.plans.Expressions.cdcEnds(
            Text.normalize(col("text")), 8).as("e"))
          .agg(sum(size(col("e"))).as("nb"))
      },
      "t25_chunks" -> { d: String =>
        Dedup.cdcChunks(Tables.documents(spark, d), w = 8)
      },
      "d18_neardup" -> { d: String =>
        Dedup.cdcNearDup(Tables.documents(spark, d), w = 8,
          minShared = 3, maxDocsPerChunk = Some(16))
      })

    def t(fn: () => Unit): Double = {
      val t0 = System.nanoTime(); fn(); (System.nanoTime() - t0) / 1e9
    }
    def min2(fn: () => Unit): Double = math.min(t(fn), t(fn))

    dirs.foreach { d =>
      val w = Tune.shuffleWidth(Tune.inputBytes(spark, d),
        spark.sparkContext.defaultParallelism)
      spark.conf.set("spark.sql.shuffle.partitions", w.toString)
      // the 16MB granularity sweep already ruled scan splits out (r15:
      // both widths within noise at 100x and 1000x) — keep it opt-in
      sys.env.getOrElse("GRAFT_CDC_MPB", "128MB")
          .split(",").toSeq.foreach { mpb =>
        spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
        val splits = Tables.documents(spark, d).rdd.getNumPartitions
        stages.foreach { case (name, q) =>
          val sec = min2(() =>
            q(d).write.format("noop").mode("overwrite").save())
          println(f"[cdcaudit] $d%s mpb=$mpb%-6s splits=$splits%-4d " +
            f"$name%-14s ${sec}%.2f s")
        }
      }
    }
    spark.stop()
  }
}
