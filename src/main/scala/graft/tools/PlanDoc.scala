package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Physical-plan dump for PLANS.md: prints the optimized physical plan of
  * each named query (all queries if none given) at the given SF.
  *
  *   sbt "runMain graft.tools.PlanDoc /root/testdata/sf0.01 j11_asof_join"
  */
object PlanDoc {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"==== $n ====")
      try println(SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.executedPlan.toString)
      catch { case e: Throwable => println(s"(failed: ${e.getMessage})") }
    }
    spark.stop()
  }
}
