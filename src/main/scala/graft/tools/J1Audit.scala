package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Core.dsum

/** One-off marginal audit for j1_fact_dims (r13 verdict #3): the plan is
  * already the textbook star shape (single 3-column fact scan, four
  * BroadcastHashJoins, partial agg, 5-row exchange), so this tool
  * decomposes the per-row cost instead: scan-only, scan+joins with a
  * cheap count, joins + double sum, joins + the exact decimal sum the
  * oracle contract requires. Timings print min-of-3 per stage at each
  * given SF dir; the deltas attribute the marginal.
  *
  *   sbt "runMain graft.tools.J1Audit /root/testdata/sf0.01 /root/testdata/sf0.1"
  */
object J1Audit {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def joined(d: String): DataFrame = {
      val li = Tables.lineitem(spark, d)
      li.join(Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(spark, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(spark, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(spark, d)),
          col("n_regionkey") === col("r_regionkey"))
    }
    def t(fn: () => Unit): Double = {
      val t0 = System.nanoTime(); fn(); (System.nanoTime() - t0) / 1e9
    }
    def min3(fn: () => Unit): Double = {
      fn() // warm
      Seq.fill(3)(t(fn)).min
    }
    val stages: Seq[(String, String => DataFrame)] = Seq(
      "scan_only" -> { d: String =>
        Tables.lineitem(spark, d)
          .select(col("l_orderkey"), col("l_extendedprice"),
            col("l_discount"))
      },
      "joins_count" -> { d: String =>
        joined(d).groupBy(col("r_name")).agg(count(lit(1)).as("n"))
      },
      "joins_doublesum" -> { d: String =>
        joined(d).groupBy(col("r_name"))
          .agg(sum(col("l_extendedprice") * (lit(1d) - col("l_discount")))
            .as("revenue"), count(lit(1)).as("n"))
      },
      "joins_decimalsum_j1" -> { d: String =>
        joined(d).groupBy(col("r_name"))
          .agg(dsum(col("l_extendedprice") * (lit(1d) - col("l_discount")))
            .as("revenue"), count(lit(1)).as("n"))
      },
      // fixed-point alternatives: prices are 2dp by schema, so the
      // product is exactly a 4dp grid value — round(x·1e4) recovers the
      // true integer; longs sum associatively
      "joins_longsum" -> { d: String =>
        joined(d).groupBy(col("r_name"))
          .agg((sum(round(
            (col("l_extendedprice") * (lit(1d) - col("l_discount")))
              * lit(10000d)).cast("long")) / lit(10000d)).as("revenue"),
            count(lit(1)).as("n"))
      },
      // the shipped form: exact 128-bit two-long accumulator (Core.xsum)
      "joins_xsum_shipped" -> { d: String =>
        joined(d).groupBy(col("r_name"))
          .agg(graft.functions.Core.xsum(
            col("l_extendedprice") * (lit(1d) - col("l_discount")))
            .as("revenue"), count(lit(1)).as("n"))
      },
      // overflow-safe at 100 TB: the long units sum into DECIMAL(38,0)
      // (cheap per-row long→Decimal, compact adds) instead of wrapping
      "joins_longdecsum" -> { d: String =>
        joined(d).groupBy(col("r_name"))
          .agg((sum(round(
            (col("l_extendedprice") * (lit(1d) - col("l_discount")))
              * lit(10000d)).cast("long")
            .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
            .cast("double") / lit(10000d)).as("revenue"),
            count(lit(1)).as("n"))
      })
    dirs.foreach { d =>
      stages.foreach { case (name, q) =>
        val sec = min3(() =>
          q(d).write.format("noop").mode("overwrite").save())
        println(f"[j1audit] $d%s $name%-22s ${sec}%.3f s")
      }
    }
    spark.stop()
  }
}
