package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Tables, Tune}
import graft.plans.Int128Sum

/** Stage decomposition for the two slowest remaining 1000× anchors
  * (r15 verdict #5): b15 Q17 136.2 s and b17 Q8 103.4 s, neither with
  * a PLANS stage table. Hypotheses, one stage each:
  *
  * b15 (Q17, per-part 20%-of-mean threshold):
  *   b15_li_scan   — the brand-pruned fact alone (scan + broadcast
  *                   semi): if ~half the total, the shipped two-scan
  *                   shape (thr aggregate + re-join both re-run it) is
  *                   the defect
  *   b15_shipped   — the current groupBy + join-back form
  *   b15_window    — the one-scan twin: thr as a whole-partition
  *                   window over ONE exchange of the pruned fact
  *                   (identical arithmetic: the same Int128Sum units
  *                   descaled, divided, ×0.2 in the same IEEE order)
  *
  * b17 (Q8, market share): the fact exchanges ALL rows into the
  * orderkey join while only ~5.7% survive the ASIA × two-year order
  * slice — the b19 shape, one join deeper.
  *   b17_okeys     — the surviving order-key side alone (region→
  *                   nation→customer→orders)
  *   b17_shipped   — the current form
  *   b17_bloom     — + a bloom runtime prefilter on l_orderkey built
  *                   from the pruned order keys (~8.6M at 1000× —
  *                   past the comfortable broadcast-semi size, so
  *                   bloom rather than b19's exact semi; false
  *                   positives just ride into the exact join)
  *
  * Run: tools/run_tool.sh graft.tools.AnchorAudit /tmp/graftsf/sf10 /tmp/graftsf/sf100
  */
object AnchorAudit {
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

    import graft.functions.Core.xsum

    def liPruned(d: String): DataFrame = {
      val pk = Tables.part(spark, d)
        .filter(col("p_brand") === "Brand#23").select(col("p_partkey"))
      Tables.lineitem(spark, d)
        .join(pk, col("l_partkey") === col("p_partkey"), "left_semi")
    }

    def b15Window(d: String): DataFrame = {
      val li = liPruned(d)
      val w = Window.partitionBy(col("l_partkey"))
      val qUnits = floor(col("l_quantity") * lit(100d) + lit(0.5d))
        .cast("long")
      li.withColumn("thr",
          (Int128Sum.int128Sum(qUnits).over(w) / lit(100d)
            / count(col("l_quantity")).over(w)) * lit(0.2d))
        .filter(col("l_quantity") < col("thr"))
        .agg((xsum(col("l_extendedprice"), dp = 2) / 7.0d)
          .as("avg_yearly"), count(lit(1)).as("n"))
    }

    def okeys(d: String): DataFrame = {
      val from = to_timestamp(lit("1996-01-01 00:00:00"))
      val until = to_timestamp(lit("1998-01-01 00:00:00"))
      Tables.region(spark, d).filter(col("r_name") === "ASIA")
        .join(Tables.nation(spark, d),
          col("r_regionkey") === col("n_regionkey"))
        .join(Tables.customer(spark, d),
          col("n_nationkey") === col("c_nationkey"))
        .join(Tables.orders(spark, d)
            .filter(col("o_orderdate") >= from &&
              col("o_orderdate") < until),
          col("c_custkey") === col("o_custkey"))
        .select(col("o_orderkey"))
    }

    def b17Bloom(d: String): DataFrame = {
      val from = to_timestamp(lit("1996-01-01 00:00:00"))
      val until = to_timestamp(lit("1998-01-01 00:00:00"))
      val rev = col("l_extendedprice") * (lit(1d) - col("l_discount"))
      val ok = okeys(d)
      val nk = ok.count()
      val bloom = ok.agg(graft.plans.Expressions
        .bloomFilterAgg(xxhash64(col("o_orderkey")), nk,
          math.max(16384L, 10L * nk)).as("bf")).scalar()
      val fact = Tables.lineitem(spark, d)
        .filter(graft.plans.Expressions
          .mightContain(bloom, xxhash64(col("l_orderkey"))))
      val suppNation = Tables.nation(spark, d)
        .select(col("n_nationkey").as("sn_key"),
          col("n_name").as("supp_nation"))
      Tables.region(spark, d).filter(col("r_name") === "ASIA")
        .join(Tables.nation(spark, d),
          col("r_regionkey") === col("n_regionkey"))
        .join(Tables.customer(spark, d),
          col("n_nationkey") === col("c_nationkey"))
        .join(Tables.orders(spark, d)
            .filter(col("o_orderdate") >= from &&
              col("o_orderdate") < until),
          col("c_custkey") === col("o_custkey"))
        .join(fact, col("o_orderkey") === col("l_orderkey"))
        .join(Tables.supplier(spark, d),
          col("l_suppkey") === col("s_suppkey"))
        .join(suppNation, col("s_nationkey") === col("sn_key"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg((xsum(when(col("supp_nation") === "NATION_1", rev)
            .otherwise(lit(0d)), dp = 4) / xsum(rev, dp = 4))
          .as("mkt_share"),
          count(lit(1)).as("n"))
    }

    val stages: Seq[(String, String => DataFrame)] = Seq(
      "b15_li_scan" -> { d: String =>
        liPruned(d).agg(count(lit(1)).as("n")) },
      "b15_shipped" -> { d: String =>
        graft.SparkEntry.queries("b15_tpch_q17")(spark, d) },
      "b15_window" -> (b15Window _),
      "b17_okeys" -> { d: String =>
        okeys(d).agg(count(lit(1)).as("n")) },
      "b17_shipped" -> { d: String =>
        graft.SparkEntry.queries("b17_tpch_q8")(spark, d) },
      "b17_bloom" -> (b17Bloom _))

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
      // result parity first, timing second: the two b15/b17 forms must
      // agree bit-for-bit before a timing row is worth anything
      val shipped15 = graft.SparkEntry
        .queries("b15_tpch_q17")(spark, d).collect().toSeq
      val win15 = b15Window(d).collect().toSeq
      println(s"[anchoraudit] $d b15 parity=${shipped15 == win15} " +
        s"(${shipped15.headOption} vs ${win15.headOption})")
      val shipped17 = graft.SparkEntry.queries("b17_tpch_q8")(spark, d)
        .orderBy(col("o_year")).collect().toSeq
      val bloom17 = b17Bloom(d).orderBy(col("o_year")).collect().toSeq
      println(s"[anchoraudit] $d b17 parity=${shipped17 == bloom17}")
      stages.foreach { case (name, q) =>
        val sec = min2(() => noop(q(d)))
        println(f"[anchoraudit] $d%s width=$w%d $name%-12s $sec%.2f s")
      }
    }
    spark.stop()
  }
}
