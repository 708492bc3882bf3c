package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * Every query in [[SparkEntry.queries]] receives `(spark, sfDir)` and reads
  * through these helpers so filter/column pushdown reaches the parquet scan
  * (Catalyst handles pruning; we never cache the raw frames globally because
  * the correctness runner executes each query once).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to map
    * to TimestampType. Read it as a raw nanos LONG (legacy conf) and floor
    * to microseconds — the same truncation DuckDB applies, so the oracle
    * sees identical instants.
    *
    * Our own sessions (Verify/Bench/tests) set the conf at build time; the
    * runtime set below stays because the driver smoke-checks `entry` with a
    * session it builds itself. It is an idempotent conf write, not a
    * behavior toggle mid-query (flagged in the round-1 review; this is the
    * narrowest form that keeps driver-owned sessions working).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(s, d, "events")
      .withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
  }

  /** events with `ts >= cut` applied on the RAW nanos column, BEFORE the
    * micros conversion. A filter on the converted `ts` sits above a
    * derived projection and can never reach the parquet scan; filtering
    * the stored long pushes down (PushedFilters: GreaterThanOrEqual(ts,…))
    * and prunes row groups — the difference between scanning a day and
    * scanning 100 TB. Equivalent to filtering the converted column because
    * cutoffs carry micro precision: floor_micros(nanos) ≥ cutMicros ⟺
    * nanos ≥ cutMicros·1000.
    */
  def eventsFrom(s: SparkSession, d: String,
                 cut: java.time.Instant): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val cutNanos = Math.addExact(
      Math.multiplyExact(cut.getEpochSecond, 1000000000L), cut.getNano.toLong)
    apply(s, d, "events")
      .filter(org.apache.spark.sql.functions.col("ts") >= cutNanos)
      .withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
