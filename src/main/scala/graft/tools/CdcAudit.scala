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
      // d18 split three ways: the (doc, fp) distinct, + the cap window,
      // + the self-join — r16, to attribute the residual 1000× marginal
      // (0.243 vs 0.073 s/unit at 100×) that survived the r15 kernels
      "d18_distinct" -> { d: String =>
        Dedup.cdcChunks(Tables.documents(spark, d), w = 8)
          .select(col("doc_id"), unhex(col("chunk_fp")).as("chunk_fp"))
          .distinct()
      },
      "d18_capwin" -> { d: String =>
        Dedup.cdcChunks(Tables.documents(spark, d), w = 8)
          .select(col("doc_id"), unhex(col("chunk_fp")).as("chunk_fp"))
          .distinct()
          .withColumn("nd", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("chunk_fp"))))
          .filter(col("nd") <= 16)
          .select(col("doc_id"), col("chunk_fp"))
      },
      "d18_neardup" -> { d: String =>
        Dedup.cdcNearDup(Tables.documents(spark, d), w = 8,
          minShared = 3, maxDocsPerChunk = Some(16))
      })

    /** The d17-style fixture quantification (r15 verdict #1): per
      * chunk_fp occupancy over the DISTINCT (doc, fp) rows — how many
      * fps blow the 16-doc cap, how much of the corpus-scale row volume
      * they carry (window-sort skew), the surviving join pair volume,
      * and how many fps SPAN replicas (doc_id ÷ 10M — the
      * scale_fixtures key offset): stopword-run chunks are built from
      * PRESERVE words the salter never touches, so their occupancy
      * grows ×K with the replica count exactly like d17's grams.
      */
    def quantify(d: String): Unit = {
      val occ = Dedup.cdcChunks(Tables.documents(spark, d), w = 8)
        .select(col("doc_id"), unhex(col("chunk_fp")).as("chunk_fp"))
        .distinct()
        .groupBy(col("chunk_fp"))
        .agg(count(lit(1)).as("occ"),
          count_distinct(floor(col("doc_id") / 10000000L)).as("reps"))
      val r = occ.agg(
        count(lit(1)).as("fps"),
        sum(col("occ")).as("rows"),
        max(col("occ")).as("max_occ"),
        sum(when(col("occ") > 16, lit(1)).otherwise(lit(0))).as("hot_fps"),
        sum(when(col("occ") > 16, col("occ")).otherwise(lit(0)))
          .as("hot_rows"),
        sum(when(col("occ") <= 16,
            (col("occ") * (col("occ") - 1) / 2).cast("long"))
          .otherwise(lit(0L))).as("join_pairs"),
        sum(when(col("reps") > 1, lit(1)).otherwise(lit(0)))
          .as("xrep_fps"),
        sum(when(col("reps") > 1, col("occ")).otherwise(lit(0)))
          .as("xrep_rows")).head()
      println(s"[cdcaudit] $d quantify fps=${r.getLong(0)} " +
        s"rows=${r.getLong(1)} max_occ=${r.getLong(2)} " +
        s"hot_fps=${r.getLong(3)} hot_rows=${r.getLong(4)} " +
        s"join_pairs=${r.getLong(5)} xrep_fps=${r.getLong(6)} " +
        s"xrep_rows=${r.getLong(7)}")
    }

    /** Same fixture question for d15's (source, gram) keys (r15 verdict
      * #6: the 0.047→0.064 s/unit uptick): how many gram hashes span
      * replicas and how much of the reduced (gram, doc) row volume —
      * the frame every post-shuffle d15 stage reads — they carry.
      */
    def quantifyD15(d: String): Unit = {
      import graft.functions.Core.spreadPartitions
      val perDocGram = spreadPartitions(Tables.documents(spark, d))
        .select(col("doc_id"), col("source"),
          posexplode(Text.shingles(col("text"), 8)))
        .filter(col("pos") % 8 === 0)
        .select(col("doc_id"),
          xxhash64(col("source"), col("col")).as("gh"))
        .groupBy(col("gh"), col("doc_id"))
        .agg(count(lit(1)).as("c"))
      val occ = perDocGram.groupBy(col("gh"))
        .agg(count(lit(1)).as("nd"), sum(col("c")).as("chunks"),
          count_distinct(floor(col("doc_id") / 10000000L)).as("reps"))
      val r = occ.agg(
        count(lit(1)).as("ghs"),
        sum(col("nd")).as("rows"),
        max(col("nd")).as("max_nd"),
        sum(when(col("reps") > 1, lit(1)).otherwise(lit(0)))
          .as("xrep_ghs"),
        sum(when(col("reps") > 1, col("nd")).otherwise(lit(0)))
          .as("xrep_rows"),
        sum(when(col("reps") > 1, col("chunks")).otherwise(lit(0)))
          .as("xrep_chunks")).head()
      println(s"[cdcaudit] $d quantify_d15 ghs=${r.getLong(0)} " +
        s"rows=${r.getLong(1)} max_nd=${r.getLong(2)} " +
        s"xrep_ghs=${r.getLong(3)} xrep_rows=${r.getLong(4)} " +
        s"xrep_chunks=${r.getLong(5)}")
    }

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
      quantify(d)
      quantifyD15(d)
    }
    spark.stop()
  }
}
