package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Tables, Tune}

/** Marginal audit for b19_tpch_q9 (r14 verdict #3, the J1Audit
  * pattern): the Q9 profit query's 1000× marginal grew to 0.053 s/unit
  * (53.75 s, superlinearity 1.77 vs the 100× decade). The plan has two
  * corpus-sized shuffles (lineitem⋈partsupp on the two-part key,
  * then ⋈orders on orderkey) plus the in-plan partsupp derivation, so
  * this tool decomposes the chain stage by stage — fact scan, partsupp
  * derivation, each join added in turn, the full query — and times
  * every stage at BOTH the historical fixed-32 shuffle width and the
  * r15 size-derived width (Tune.shuffleWidth), attributing the growth
  * to either a join shape or the partition-count policy.
  *
  *   java -cp "<classes>:<spark jars>" graft.tools.Q9Audit \
  *     /root/testdata/sf0.1 /tmp/graftscale/x100 [/tmp/graftscale/x1000]
  */
object Q9Audit {
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

    val profit = col("l_extendedprice") * (lit(1d) - col("l_discount")) -
      col("ps_supplycost") * col("l_quantity")
    def ps(d: String): DataFrame = Tables.partsupp(spark, d)
      .join(Tables.part(spark, d).filter(col("p_name").contains("red"))
          .select(col("p_partkey")),
        col("p_partkey") === col("ps_partkey"))
    def factPs(d: String): DataFrame = Tables.lineitem(spark, d)
      .join(ps(d), col("ps_partkey") === col("l_partkey") &&
        col("ps_suppkey") === col("l_suppkey"))

    val stages: Seq[(String, String => DataFrame)] = Seq(
      // the 5 columns the query reads, reduced map-side — the scan floor
      "fact_scan" -> { d: String =>
        Tables.lineitem(spark, d)
          .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
            col("l_quantity"), col("l_extendedprice"), col("l_discount"))
          .agg(count(lit(1)).as("n"),
            sum(col("l_extendedprice")).as("chk"))
      },
      // the in-plan partsupp derivation + name-filtered part semi-slice
      "ps_derive" -> { d: String =>
        ps(d).agg(count(lit(1)).as("n"),
          sum(col("ps_supplycost")).as("chk"))
      },
      // + the two-key fact join (first corpus shuffle)
      "fact_ps_join" -> { d: String =>
        factPs(d).agg(count(lit(1)).as("n"), sum(profit).as("chk"))
      },
      // + supplier (1M rows at 1000× — above the broadcast threshold,
      // so this leg turns into a shuffle from ~30× on)
      "plus_supplier" -> { d: String =>
        factPs(d)
          .join(Tables.supplier(spark, d),
            col("s_suppkey") === col("l_suppkey"))
          .agg(count(lit(1)).as("n"), sum(profit).as("chk"))
      },
      // + supplier FORCED broadcast — 1M×(key,nationkey) is ~16 MB of
      // longs; if this wins, the fix is a pruned-column broadcast hint
      "plus_supplier_bcast" -> { d: String =>
        factPs(d)
          .join(broadcast(Tables.supplier(spark, d)
              .select(col("s_suppkey"), col("s_nationkey"))),
            col("s_suppkey") === col("l_suppkey"))
          .agg(count(lit(1)).as("n"), sum(profit).as("chk"))
      },
      // + orders (the second corpus-sized shuffle)
      "plus_orders" -> { d: String =>
        factPs(d)
          .join(Tables.supplier(spark, d),
            col("s_suppkey") === col("l_suppkey"))
          .join(Tables.orders(spark, d),
            col("o_orderkey") === col("l_orderkey"))
          .agg(count(lit(1)).as("n"), sum(profit).as("chk"))
      },
      // the shipped query (adds the nation broadcast + the grouped xsum)
      "full_b19" -> { d: String =>
        graft.SparkEntry.queries("b19_tpch_q9")(spark, d)
      },
      // the shipped aggregate over a double sum — isolates xsum's share
      "full_doublesum" -> { d: String =>
        factPs(d)
          .join(Tables.supplier(spark, d),
            col("s_suppkey") === col("l_suppkey"))
          .join(Tables.orders(spark, d),
            col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(Tables.nation(spark, d)),
            col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("nation"),
            year(col("o_orderdate")).as("o_year"))
          .agg(sum(profit).as("sum_profit"), count(lit(1)).as("n"))
      })

    def t(fn: () => Unit): Double = {
      val t0 = System.nanoTime(); fn(); (System.nanoTime() - t0) / 1e9
    }
    def min2(fn: () => Unit): Double = math.min(t(fn), t(fn))

    dirs.foreach { d =>
      val auto = Tune.shuffleWidth(Tune.inputBytes(spark, d),
        spark.sparkContext.defaultParallelism)
      val widths: Seq[(String, Int)] =
        if (auto == cpus.toInt) Seq(s"w$cpus" -> cpus.toInt)
        else Seq(s"w$cpus" -> cpus.toInt, s"auto$auto" -> auto)
      stages.foreach { case (name, q) =>
        widths.foreach { case (wname, w) =>
          spark.conf.set("spark.sql.shuffle.partitions", w.toString)
          val sec = min2(() =>
            q(d).write.format("noop").mode("overwrite").save())
          println(f"[q9audit] $d%s $name%-20s $wname%-9s ${sec}%.2f s")
        }
      }
    }
    spark.stop()
  }
}
