package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Tables, Tune}
import graft.operators.Dedup

/** Stage decomposition for d14_canonical_pick's rising 1000× marginal
  * (r15 verdict #2: 0.201→0.276→0.38 s/unit across the decades, 381 s
  * at 1000× — the slowest non-anchor SCALING entry, with no audit).
  * The hypothesis space, each stage isolating one:
  *
  *   pairs         — minhashNearDup alone (the d2 baseline cost; if
  *                   ITS marginal already accounts for the growth, CC
  *                   is innocent)
  *   cc            — connectedComponents over the pairs, with the
  *                   per-round log (V/E, seconds per round, round
  *                   count): distinguishes "rounds grow with decade"
  *                   (diameter — needs frontier/contraction) from
  *                   "constant rounds, linear rounds cost" (the edge
  *                   re-shuffle per round) from "the sym build paid
  *                   the pair chain twice" (the r16 union→explode fix)
  *   d14           — full canonicalPick (adds the docs⋈comp member
  *                   join, winner agg, anti-join apply)
  *
  * Run on 100×/1000× via the canonical runner:
  *   tools/run_tool.sh graft.tools.D14Audit /tmp/graftsf/sf10 /tmp/graftsf/sf100
  */
object D14Audit {
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

    def t(fn: () => Unit): Double = {
      val t0 = System.nanoTime(); fn(); (System.nanoTime() - t0) / 1e9
    }
    def min2(fn: () => Unit): Double = math.min(t(fn), t(fn))
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    dirs.foreach { d =>
      val w = Tune.shuffleWidth(Tune.inputBytes(spark, d),
        spark.sparkContext.defaultParallelism)
      spark.conf.set("spark.sql.shuffle.partitions", w.toString)
      def pairs = Dedup.minhashNearDup(Tables.documents(spark, d),
        n = 3, theta = 0.8)

      val pSec = min2(() => noop(pairs))
      println(f"[d14audit] $d%s width=$w%d pairs          $pSec%.2f s")

      // cc with the round log — run once verbose (the log itself adds
      // two count jobs), then min2 quiet for the headline number
      Dedup.connectedComponentsLogged(
        pairs.select(col("doc_a"), col("doc_b")),
        s => println(s"[d14audit] $d verbose $s"))
      val cSec = min2(() => noop(Dedup.connectedComponents(
        pairs.select(col("doc_a"), col("doc_b")))))
      println(f"[d14audit] $d%s width=$w%d cc             $cSec%.2f s")

      val fSec = min2(() => noop(Dedup.canonicalPick(
        Tables.documents(spark, d), pairs)))
      println(f"[d14audit] $d%s width=$w%d d14_full       $fSec%.2f s")
    }
    spark.stop()
  }
}
