package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.Sinks

/** Sink round-trips: partitioned append (S7), dynamic-partition snapshot
  * replace (S9), CSV last-wins upsert (S5).
  */
class SinkSpec extends AnyFunSuite {

  import SparkTestSession.spark
  import spark.implicits._

  private def tmp(p: String): String =
    Files.createTempDirectory(p).resolve("t").toString

  test("S7: appendPartitioned accumulates batches under partition dirs") {
    val path = tmp("graft-s7")
    Sinks.appendPartitioned(
      Seq((1L, "2024-01", 5.0), (2L, "2024-02", 6.0))
        .toDF("id", "month", "v"), path, "month")
    Sinks.appendPartitioned(
      Seq((3L, "2024-02", 7.0)).toDF("id", "month", "v"), path, "month")
    val got = spark.read.parquet(path).select("id", "month", "v")
      .as[(Long, String, Double)].collect().toSet
    assert(got == Set((1L, "2024-01", 5.0), (2L, "2024-02", 6.0),
      (3L, "2024-02", 7.0)))
  }

  test("T3/S7: batchedAppend bounds every flushed file at maxItems rows") {
    val path = tmp("graft-t3")
    // one 2_500-row burst through an 800-row buffer: no INSERT-analog
    // (output file) may exceed 800 rows, and all rows must land exactly once
    Sinks.batchedAppend(
      spark.range(2500).select(col("id"), lit("2024-01").as("month"))
        .coalesce(1),
      path, "month", maxItems = 800)
    val files = new java.io.File(s"$path/month=2024-01").listFiles()
      .filter(f => f.getName.endsWith(".parquet"))
    assert(files.length >= 4) // ceil(2500/800)
    files.foreach { f =>
      val n = spark.read.parquet(f.getPath).count()
      assert(n <= 800, s"${f.getName} has $n rows > maxItems")
    }
    assert(spark.read.parquet(path).count() == 2500)
    assert(spark.read.parquet(path).select("id").distinct().count() == 2500)
  }

  test("T3: batchedSink drains a landing burst into bounded files") {
    val landing = tmp("graft-t3-land")
    val out = tmp("graft-t3-out")
    val ck = tmp("graft-t3-ck")
    new java.io.File(landing).mkdirs()
    spark.range(2000).select(col("id"), (col("id") % 7).as("k"))
      .coalesce(1).write.mode("overwrite").parquet(landing)
    val q = Sinks.batchedSink(
      spark.readStream
        .schema("id LONG, k LONG")
        .parquet(landing),
      out, ck, maxItems = 600, maxWaitMs = 50L)
    try {
      // time threshold: the ProcessingTime trigger must fire and drain the
      // burst well within a few periods
      val deadline = System.currentTimeMillis() + 30000
      while (System.currentTimeMillis() < deadline &&
        (!new java.io.File(out).exists() ||
          spark.read.option("ignoreCorruptFiles", "true")
            .schema("id LONG, k LONG")
            .parquet(out).count() < 2000)) Thread.sleep(100)
    } finally q.stop()
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val n = spark.read.parquet(f.getPath).count()
      assert(n <= 600, s"${f.getName} has $n rows > maxItems")
    }
    assert(spark.read.parquet(out).count() == 2000)
  }

  test("partitioned layout prunes non-matching partitions at read time") {
    val path = tmp("graft-prune")
    Sinks.appendPartitioned(
      spark.range(300).select(col("id"),
        concat(lit("2024-0"), (col("id") % 3 + 1).cast("string"))
          .as("month")),
      path, "month")
    val q = spark.read.parquet(path).filter(col("month") === "2024-02")
    // the month predicate must become a PARTITION filter (directory
    // pruning), not a data filter evaluated per row — at 100 TB this is
    // the difference between listing one month and scanning the world
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("month"))
    assert(q.count() == 100)
    // only the matching partition's files are read
    val scanned = q.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(!scanned.contains("month=2024-01") || scanned.contains("..."))
  }

  test("compactSmallFiles shrinks file count and preserves every row") {
    val path = tmp("graft-compact")
    spark.range(10000).select(col("id"), (col("id") % 5).as("k"))
      .repartition(40).write.parquet(path)
    def parquetFiles() = new java.io.File(path).listFiles()
      .count(_.getName.endsWith(".parquet"))
    val before = parquetFiles()
    assert(before >= 30)
    val bytes = org.apache.commons.io.FileUtils
      .sizeOfDirectory(new java.io.File(path))
    Sinks.compactSmallFiles(spark, path, targetBytes = bytes)
    val after = parquetFiles()
    assert(after <= 2, s"still $after files after compaction")
    assert(spark.read.parquet(path).count() == 10000)
    assert(spark.read.parquet(path).select("id").distinct().count() == 10000)
  }

  test("compactSmallFiles on one sealed batch partition preserves the " +
      "partitioned layout (the streaming-index maintenance recipe)") {
    // the neardupIngest/annIndexMaintenance scaladocs direct compaction
    // at `batch=N` dirs, never the root — prove the in-place partition
    // compaction keeps partition discovery, values, and replayability
    // (the compacted dir stays exactly one batch=N partition)
    val root = tmp("graft-compact-part")
    spark.range(0, 3000).select(col("id"))
      .repartition(20).write.parquet(s"$root/batch=0")
    spark.range(3000, 4000).select(col("id"))
      .coalesce(1).write.parquet(s"$root/batch=1")
    def files(dir: String) = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files(s"$root/batch=0") >= 15)
    val bytes = org.apache.commons.io.FileUtils
      .sizeOfDirectory(new java.io.File(s"$root/batch=0"))
    Sinks.compactSmallFiles(spark, s"$root/batch=0", targetBytes = bytes)
    assert(files(s"$root/batch=0") <= 2)
    // root read still discovers both partitions with intact values
    val got = spark.read.parquet(root)
    assert(got.columns.toSet == Set("id", "batch"))
    assert(got.count() == 4000)
    assert(got.filter(col("batch") === 0).count() == 3000)
    // no stray _tmp_ sibling left behind, and no phantom partition dir
    // (only checksum droppings are excusable — excluding all '_' names
    // would hide exactly the _tmp_ leak this assertion exists to catch)
    val stray = new java.io.File(root).listFiles().map(_.getName)
      .filterNot(n => n == "batch=0" || n == "batch=1" || n.startsWith("."))
    assert(stray.isEmpty, s"unexpected entries: ${stray.mkString(", ")}")
  }

  test("config-table CRUD: insertIfAbsent skips conflicts, deleteWhere " +
      "removes by key (watchlist lifecycle)") {
    val path = tmp("graft-watchlist")
    // POST: two wallets watch tokens (id, wallet_id, token_id, note)
    Sinks.insertIfAbsent(spark,
      Seq((1L, 10L, 100L, "a"), (2L, 10L, 200L, "b"), (3L, 20L, 100L, "c"))
        .toDF("id", "wallet_id", "token_id", "note"),
      path, Seq("wallet_id", "token_id"))
    // re-POST a duplicate (wallet 10, token 100) + one genuinely new row:
    // ON CONFLICT DO NOTHING — the dup must not land, the new row must
    Sinks.insertIfAbsent(spark,
      Seq((4L, 10L, 100L, "dup"), (5L, 20L, 200L, "d"))
        .toDF("id", "wallet_id", "token_id", "note"),
      path, Seq("wallet_id", "token_id"))
    def rows() = spark.read.parquet(path)
      .select("id", "wallet_id", "token_id", "note")
      .as[(Long, Long, Long, String)].collect().toSet
    assert(rows() == Set((1L, 10L, 100L, "a"), (2L, 10L, 200L, "b"),
      (3L, 20L, 100L, "c"), (5L, 20L, 200L, "d")))
    // DELETE /watchlist/2
    Sinks.deleteWhere(spark, path, col("id") === 2L)
    assert(rows() == Set((1L, 10L, 100L, "a"),
      (3L, 20L, 100L, "c"), (5L, 20L, 200L, "d")))
    // SQL DELETE semantics: a NULL predicate must RETAIN the row — a
    // note-matching delete can't take out the rows whose note is NULL
    Sinks.insertIfAbsent(spark,
      Seq((6L, 30L, 100L, null.asInstanceOf[String]))
        .toDF("id", "wallet_id", "token_id", "note"),
      path, Seq("wallet_id", "token_id"))
    Sinks.deleteWhere(spark, path, col("note") === "c")
    assert(spark.read.parquet(path).count() == 3)
    assert(spark.read.parquet(path).filter(col("id") === 6L).count() == 1)
  }

  test("alerts lifecycle: POST → PATCH → evaluate → event append → " +
      "throttle suppresses (all four CRUD verbs on the config table)") {
    val rules = tmp("graft-alerts")
    // POST /alerts (insertIfAbsent): three rules, all active
    Sinks.insertIfAbsent(spark,
      Seq((1L, "purchase", "price_cross_above", 40.0, true, 60L),
          (2L, "purchase", "price_cross_below", 100.0, true, 60L),
          (3L, "click", "price_cross_above", 99.0, true, 60L))
        .toDF("rule_id", "event_type", "kind", "threshold",
          "is_active", "throttle_sec"),
      rules, Seq("rule_id"))
    // PATCH /alerts/2: toggle off (ref api/routes/alerts.js:40-62);
    // PATCH /alerts/1: raise throttle to 600 s
    Sinks.updateWhere(spark, rules, col("rule_id") === 2L,
      Map("is_active" -> lit(false)))
    Sinks.updateWhere(spark, rules, col("rule_id") === 1L,
      Map("throttle_sec" -> lit(600L)))
    val cfg = spark.read.parquet(rules)
    // patched columns took; unassigned columns and unmatched rows intact
    assert(cfg.filter(col("rule_id") === 2L)
      .select("is_active", "throttle_sec", "threshold")
      .as[(Boolean, Long, Double)].head() == ((false, 60L, 100.0)))
    assert(cfg.filter(col("rule_id") === 1L)
      .select("is_active", "throttle_sec")
      .as[(Boolean, Long)].head() == ((true, 600L)))
    assert(cfg.filter(col("rule_id") === 3L)
      .select("is_active", "throttle_sec")
      .as[(Boolean, Long)].head() == ((true, 60L)))
    // evaluation tick (t10 shape): latest value per event_type vs ACTIVE
    // rules only. Rule 1 fires (55 > 40); rule 2 WOULD fire (55 < 100)
    // but was toggled off by the PATCH; rule 3's predicate is false.
    val events = Seq(
      (1L, "purchase", 45.0, 1000L), (2L, "purchase", 55.0, 1100L),
      (3L, "click", 10.0, 1200L))
      .toDF("event_id", "event_type", "value", "sec")
    val latest = events.groupBy(col("event_type"))
      .agg(max_by(col("value"), col("event_id")).as("last_value"),
        max(col("sec")).as("sec"))
    val fired = latest.join(cfg.filter(col("is_active")), Seq("event_type"))
      .withColumn("fired",
        when(col("kind") === "price_cross_above",
          col("last_value") > col("threshold"))
        .otherwise(col("last_value") < col("threshold")))
      .filter(col("fired"))
      .select(col("rule_id").as("ruleId"), col("sec").as("ts"))
    assert(fired.select("ruleId").as[Long].collect().toSeq == Seq(1L))
    // fired alerts land in alert_events through the throttle, using the
    // PATCHED throttle_sec: rule 1 re-fires 100 s later (suppressed) and
    // 700 s later (allowed) — state carries ACROSS micro-batches
    val throttleSec = cfg.filter(col("rule_id") === 1L)
      .select("throttle_sec").as[Long].head()
    val land = tmp("graft-alerts-land")
    val evPath = tmp("graft-alert-events")
    val ckpt = tmp("graft-alerts-ck")
    new java.io.File(land).mkdirs()
    def tick(batch: String, evs: Seq[graft.streaming.Streams.AlertEvent])
        : Unit = {
      evs.toDS().write.parquet(s"$land/$batch")
      val stream = spark.readStream.schema("ruleId BIGINT, ts BIGINT")
        .option("recursiveFileLookup", "true").parquet(land)
        .as[graft.streaming.Streams.AlertEvent]
      val q = graft.streaming.Streams.throttleAlerts(stream, throttleSec)
        .toDF().writeStream.format("parquet").option("path", evPath)
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val first = fired.as[graft.streaming.Streams.AlertEvent].collect().toSeq
    tick("b1", first)
    tick("b2", Seq(graft.streaming.Streams.AlertEvent(1L, 1200L),
      graft.streaming.Streams.AlertEvent(1L, 1800L)))
    val got = spark.read.parquet(evPath)
      .as[graft.streaming.Streams.AlertEvent]
      .collect().map(e => (e.ruleId, e.ts)).toSet
    assert(got == Set((1L, 1100L), (1L, 1800L)))
    // DELETE /alerts/1 closes the loop: all four verbs exercised
    Sinks.deleteWhere(spark, rules, col("rule_id") === 1L)
    assert(spark.read.parquet(rules).select("rule_id").as[Long]
      .collect().toSet == Set(2L, 3L))
  }

  test("price-refresh job: append-only upsert ticks, latest snapshot " +
      "serves the newest price per (token, pool)") {
    // the write half of jobs/price-from-reserves.js (upsertPrice: INSERT
    // into prices + price_ticks, "latest" recovered with argMax at read):
    // two refresh ticks append; history keeps every row (the price_ticks
    // role), the serving view is last-wins per key (the prices role)
    val prices = tmp("graft-prices")
    def tick(t: Long, px: Seq[(Long, Long, Double)]): Unit =
      px.toDF("token_id", "pool_id", "price_in_zig")
        .withColumn("updated_at", lit(t))
        .write.mode("append").parquet(prices)
    tick(1000L, Seq((1L, 10L, 2.5), (2L, 20L, 4.0)))
    tick(2000L, Seq((1L, 10L, 2.75), (3L, 30L, 9.0)))
    assert(spark.read.parquet(prices).count() == 4) // append-only history
    val latest = graft.operators.Relational.dedupeKeepLatest(
        spark.read.parquet(prices), Seq("token_id", "pool_id"),
        col("updated_at"))
      .select("token_id", "pool_id", "price_in_zig")
      .as[(Long, Long, Double)].collect().toSet
    assert(latest == Set((1L, 10L, 2.75), (2L, 20L, 4.0), (3L, 30L, 9.0)))
  }

  test("dropPartitionsOlderThan removes old partitions, retains the rest") {
    val path = tmp("graft-retain")
    Sinks.appendPartitioned(
      spark.range(300).select(col("id"),
        concat(lit("2024-0"), (col("id") % 3 + 1).cast("string"))
          .as("month")),
      path, "month")
    // retention cutoff mid-range: 2024-01 goes, 2024-02 and 2024-03 stay
    val n = Sinks.dropPartitionsOlderThan(spark, path, "month", "2024-02")
    assert(n == 1)
    val kept = spark.read.parquet(path)
    assert(kept.select("month").distinct().as[String].collect().toSet ==
      Set("2024-02", "2024-03"))
    // retained data fully intact, not just present
    assert(kept.count() == 200)
    assert(kept.select("id").distinct().count() == 200)
    // idempotent: nothing below the cutoff remains
    assert(Sinks.dropPartitionsOlderThan(spark, path, "month", "2024-02") == 0)
  }

  test("materialized rollup serves identically to direct compute, via one scan") {
    // the reference's §3.3 pattern: a 60 s job persists token_matrix and
    // the API reads the TABLE, never recomputing the aggregation chain.
    // Materialize a11 → read back → values identical, and the serving
    // read's plan is a bare file scan (no joins, no aggregates).
    val sf = SparkTestSession.sfDir
    val path = tmp("graft-matrix")
    val direct = SparkEntry.queries("a11_token_matrix")(spark, sf)
    direct.write.mode("overwrite").parquet(path)
    val served = spark.read.parquet(path)
    assert(served.collect().map(_.toSeq).toSet ==
      direct.collect().map(_.toSeq).toSet)
    val page = served.orderBy(col("mcap_zig").desc, col("token_id")).limit(20)
    val plan = page.queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("HashAggregate"))
    assert(plan.contains("FileScan") || plan.contains("Scan parquet"))
    assert(page.count() == 20)
  }

  test("S9: snapshotReplace overwrites only the snapshot's partitions") {
    val path = tmp("graft-s9")
    Sinks.snapshotReplace(
      Seq((1L, 100L, 10.0), (2L, 100L, 20.0), (3L, 200L, 30.0))
        .toDF("id", "token_id", "bal"), path, "token_id")
    // refresh token 100 with a fresh snapshot; token 200 must be untouched
    Sinks.snapshotReplace(
      Seq((9L, 100L, 99.0)).toDF("id", "token_id", "bal"), path, "token_id")
    val got = spark.read.parquet(path).select("id", "token_id", "bal")
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((9L, 100L, 99.0), (3L, 200L, 30.0)))
  }

  test("S6: appendRate truncates to the minute and appends per poll") {
    val path = tmp("graft-s6")
    Sinks.appendRate(spark,
      java.time.Instant.parse("2024-05-01T10:30:45Z"), 1.23, path)
    Sinks.appendRate(spark,
      java.time.Instant.parse("2024-05-01T10:31:12Z"), 1.25, path)
    val got = spark.read.parquet(path)
      .select(col("minute_ts").cast("string"), col("rate"))
      .as[(String, Double)].collect().toSet
    assert(got == Set(("2024-05-01 10:30:00", 1.23),
      ("2024-05-01 10:31:00", 1.25)))
  }

  test("JSON-lines and ORC roundtrips preserve rows (source formats)") {
    val df = Tables.events(spark, SparkTestSession.sfDir)
      .select("event_id", "user_id", "event_type", "value")
      .filter(col("event_id") < 500L)
    val want = df.as[(Long, Long, String, Double)].collect().toSet

    val jsonPath = tmp("graft-json")
    df.write.mode("overwrite").json(jsonPath)
    val viaJson = spark.read.json(jsonPath)
      .select("event_id", "user_id", "event_type", "value")
      .as[(Long, Long, String, Double)].collect().toSet
    assert(viaJson == want)

    val orcPath = tmp("graft-orc")
    df.write.mode("overwrite").orc(orcPath)
    val viaOrc = spark.read.orc(orcPath)
      .select("event_id", "user_id", "event_type", "value")
      .as[(Long, Long, String, Double)].collect().toSet
    assert(viaOrc == want)
  }

  test("bucketed tables join with no shuffle exchange on the join key") {
    val e = Tables.events(spark, SparkTestSession.sfDir)
    val a = e.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"))
    val b = e.groupBy(col("user_id"))
      .agg(max(col("value")).as("hi"))
    Sinks.writeBucketed(a, "bk_a", "user_id", 8)
    Sinks.writeBucketed(b, "bk_b", "user_id", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("bk_a").join(spark.table("bk_b"), "user_id")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      // and the result matches the direct (shuffling) join
      val direct = a.join(b, "user_id")
        .as[(Long, Long, Double)].collect().toSet
      assert(j.as[(Long, Long, Double)].collect().toSet == direct)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bk_a")
      spark.sql("DROP TABLE IF EXISTS bk_b")
    }
  }

  test("compactBucketed: compaction keeps the shuffle-free join and " +
      "cuts files to one per bucket") {
    // r9 verdict #8: writeBucketed and compaction are separately proven;
    // prove they COMPOSE. A fragmented write (16 input partitions × 8
    // buckets → up to 128 files) is compacted to exactly 8 files, and
    // the no-Exchange join property plus the data survive the rewrite.
    val e = Tables.events(spark, SparkTestSession.sfDir)
    val a = e.repartition(16)                       // fragment the input
      .select(col("user_id"), col("event_id"), col("value"))
    val b = e.groupBy(col("user_id")).agg(max(col("value")).as("hi"))
    Sinks.writeBucketed(a, "bk_frag", "user_id", 8)
    Sinks.writeBucketed(b, "bk_dim", "user_id", 8)
    def dataFiles(table: String): Int = {
      val loc = new java.io.File(new java.net.URI(
        spark.sql(s"DESCRIBE FORMATTED $table").filter(col("col_name")
          === "Location").head.getString(1)))
      loc.listFiles.count(_.getName.endsWith(".parquet"))
    }
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      val before = spark.table("bk_frag").as[(Long, Long, Double)]
        .collect().toSet
      assert(dataFiles("bk_frag") > 8,
        "fixture write was not fragmented; test setup is vacuous")
      Sinks.compactBucketed(spark, "bk_frag")
      // exactly one file per NON-EMPTY bucket after compaction (a bucket
      // no key hashes to at this sf writes no file), and every file is
      // task-aligned: part-0000N carries bucket suffix _0000N — the
      // repartition mapping and the writer's bucket mapping agree
      val loc = new java.io.File(new java.net.URI(
        spark.sql(s"DESCRIBE FORMATTED bk_frag").filter(col("col_name")
          === "Location").head.getString(1)))
      val names = loc.listFiles.map(_.getName)
        .filter(_.endsWith(".parquet")).toSeq
      assert(names.size <= 8 && names.size >= 6)
      val aligned = names.forall { n =>
        "part-(\\d+)-.*_(\\d+)\\.".r.findFirstMatchIn(n)
          .exists(m => m.group(1).toInt == m.group(2).toInt)
      }
      assert(aligned, s"files not bucket-aligned: $names")
      // data survived byte-for-byte
      assert(spark.table("bk_frag").as[(Long, Long, Double)]
        .collect().toSet == before)
      // and the join is STILL shuffle-free on the bucketed sides
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("bk_frag").join(spark.table("bk_dim"), "user_id")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"compaction broke the bucketed join:\n$plan")
      assert(j.count() == before.size)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bk_frag")
      spark.sql("DROP TABLE IF EXISTS bk_frag_compacting")
      spark.sql("DROP TABLE IF EXISTS bk_frag_precompact")
      spark.sql("DROP TABLE IF EXISTS bk_dim")
    }
  }

  test("writeZOrdered: z-layout makes file stats tight on BOTH query " +
      "dimensions; a time-sorted layout prunes only time") {
    import org.apache.spark.sql.DataFrame
    val e = Tables.events(spark, SparkTestSession.sfDir)
      .select(col("user_id"),
        unix_timestamp(col("ts")).as("tsec"), col("value"))
    val zDir = tmp("graft-zorder")
    val tDir = tmp("graft-tsorted")
    Sinks.writeZOrdered(e, zDir, "user_id", "tsec", files = 16)
    e.repartitionByRange(16, col("tsec")).sortWithinPartitions(col("tsec"))
      .write.mode("overwrite").parquet(tDir)
    // rows survive the rewrite
    assert(spark.read.parquet(zDir).count() == e.count())
    // per-FILE min/max — the statistics the scan's row-group filter
    // consults (one row group per file at this size)
    def stats(dir: String, c: String): Seq[(Long, Long)] =
      new java.io.File(dir).listFiles
        .filter(_.getName.endsWith(".parquet")).toSeq.map { f =>
          val r = spark.read.parquet(f.getPath)
            .agg(min(col(c)), max(col(c))).head
          (r.getLong(0), r.getLong(1))
        }
    def containFrac(st: Seq[(Long, Long)], vs: Seq[Long]): Double =
      vs.map(v => st.count { case (lo, hi) => lo <= v && v <= hi })
        .sum.toDouble / (st.size * vs.size)
    val users = e.select("user_id").distinct()
      .orderBy(col("user_id")).limit(40).as[Long].collect().toSeq
    val zUser = containFrac(stats(zDir, "user_id"), users)
    val tUser = containFrac(stats(tDir, "user_id"), users)
    // time-sorted: every file spans ~all users → a user predicate reads
    // everything; z-ordered: files cover z-rectangles → most files'
    // user range excludes any given user
    assert(tUser > 0.9, s"time-sorted user stats unexpectedly tight: $tUser")
    assert(zUser < 0.5 && zUser < tUser / 2,
      s"z-order did not tighten user stats: z=$zUser ts=$tUser")
    // and the time dimension STAYS prunable under z-order (files cover
    // bounded time rectangles too — that's the simultaneity claim)
    val times = e.select("tsec").distinct().limit(40).as[Long].collect()
    val zTime = containFrac(stats(zDir, "tsec"), times.toSeq)
    assert(zTime < 0.6, s"z-order lost time prunability: $zTime")
  }

  test("training-shard export: deterministic placement, one file per " +
      "shard, manifest matches disk, root read = corpus") {
    val docs = Tables.documents(spark, SparkTestSession.sfDir)
      .select(col("doc_id"), col("n_chars"))
    val dir = Files.createTempDirectory("graft-shards").toString + "/out"
    val n = 8
    val manifest = Sinks.writeTrainingShards(docs, dir, "doc_id",
      "n_chars", n)
    // manifest totals describe exactly what's on disk
    val m = manifest.as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(m.keySet.subsetOf((0L until n).toSet) && m.nonEmpty)
    assert(m.values.map(_._1).sum == docs.count())
    // reading the export root yields the corpus (manifest underscore-
    // hidden), every row in its xxhash64-assigned shard
    val back = spark.read.parquet(dir)
    assert(back.count() == docs.count())
    assert(back.filter(
      col("shard") =!= pmod(xxhash64(col("doc_id")), lit(n.toLong)))
      .count() == 0)
    // one data file per shard — loaders stripe over files
    for ((shard, (rows, _)) <- m) {
      val files = new java.io.File(s"$dir/shard=$shard")
        .listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"shard $shard fragmented")
      assert(spark.read.parquet(s"$dir/shard=$shard").count() == rows)
    }
    // re-export is placement-stable (same manifest)
    val again = Sinks.writeTrainingShards(docs, dir, "doc_id",
      "n_chars", n).as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(again == m)
  }

  test("training-shard export carries opaque binary media columns " +
      "byte-exactly (the multimodal shard shape)") {
    val dir = Files.createTempDirectory("graft-media-shards").toString
    val rows = (1L to 20L).map { i =>
      (i, Array.fill(16)((i * 7 + 3).toByte), i % 5 + 1)
    }
    val df = rows.toDF("doc_id", "payload", "n_tok")
    val manifest = Sinks.writeTrainingShards(df, dir, "doc_id", "n_tok", 4)
    assert(manifest.agg(org.apache.spark.sql.functions.sum("n_rows"))
      .head.getLong(0) == 20L)
    // read back: every payload byte-equal to the source (parquet BINARY
    // round-trip through the partitioned shard layout)
    val back = spark.read.parquet(dir)
      .filter(col("doc_id").isNotNull)
      .select("doc_id", "payload").as[(Long, Array[Byte])]
      .collect().toMap
    rows.foreach { case (id, bytes, _) =>
      assert(java.util.Arrays.equals(back(id), bytes), s"doc $id drifted")
    }
  }

  test("S5: csvUpsert — incoming wins on key, last-wins within batch") {
    val dir = Files.createTempDirectory("graft-s5")
    val csv = dir.resolve("pools.csv")
    val table = dir.resolve("table").toString
    Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "v", "ord")
      .write.mode("overwrite").parquet(table)
    Files.writeString(csv,
      "k,v,ord\n2,b2,5\n2,b3,9\n4,d,2\n")
    Sinks.csvUpsert(spark, csv.toString, table, "k", col("ord"))
    val got = spark.read.parquet(table).select("k", "v")
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "b3"), (4L, "d")))
  }
}
