package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (Spark startup is ~5 s;
  * per-suite sessions would dominate test time).
  */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** sf0.001 fixture dir (smallest driver-provided data; read-only). */
  val sfDir = "/root/testdata/sf0.001"
}
