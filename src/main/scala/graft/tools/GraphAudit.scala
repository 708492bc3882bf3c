package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Dedup, Similarity}

/** Why is the SHIPPED n8/d16 (knnGraphAuto / embeddingGraphGroupsAuto)
  * ~2× its fixed-bits Scaling twin at 100× when both resolve to the same
  * knnGraph call? (r15; SCALING r14: n8 10.0 s vs n8_adaptive_bits 6.37,
  * d16 30.15 vs d16_adaptive_bits 15.98.) The candidates:
  *   (a) the bits VALUE — autoBits(count, 32) lands 1+ bit wider than
  *       the twin's 6+ceil(log2(f)) at most decades;
  *   (b) the eager vecs.count() job the Auto forms pay at plan build;
  *   (c) nothing structural — min-of-2 scheduling noise.
  * One run times knnGraph at the twin's bits, at autoBits, and the full
  * Auto form, min-of-2 each, noop sink, plus the count() job alone.
  *
  *   java -cp "<classes>:<spark jars>" graft.tools.GraphAudit \
  *     /tmp/graftscale/x100 100
  */
object GraphAudit {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val factor = args(1).toDouble
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions",
      graft.Tune.shuffleWidth(graft.Tune.inputBytes(spark, dir),
        spark.sparkContext.defaultParallelism).toString)

    val v = Tables.embeddings(spark, dir)
    val n = v.count()
    val twinBits = 6 + math.ceil(math.log(factor) / math.log(2)).toInt
    val autoB = Similarity.autoBits(n)
    println(s"[graphaudit] n=$n twinBits=$twinBits autoBits=$autoB")

    def t(fn: () => Unit): Double = {
      val t0 = System.nanoTime(); fn(); (System.nanoTime() - t0) / 1e9
    }
    def report(name: String, mk: () => DataFrame): Unit = {
      def once(): Double = t(() =>
        mk().write.format("noop").mode("overwrite").save())
      once() // warm
      println(f"[graphaudit] $name%-22s ${math.min(once(), once())}%.2f s")
    }

    report("count_only", () => v.groupBy().count())
    report("n8_twin_bits", () => Similarity.knnGraph(v, 5, 4, twinBits))
    report("n8_auto_bits", () => Similarity.knnGraph(v, 5, 4, autoB))
    report("n8_full_auto", () => Similarity.knnGraphAuto(v, 5))
    report("d16_twin_bits", () =>
      Dedup.embeddingGraphGroups(v, 5, 0.3, 4, twinBits))
    report("d16_auto_bits", () =>
      Dedup.embeddingGraphGroups(v, 5, 0.3, 4, autoB))
    report("d16_full_auto", () =>
      Dedup.embeddingGraphGroupsAuto(v, 5, 0.3))
    spark.stop()
  }
}
