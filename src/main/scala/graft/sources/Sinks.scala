package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Relational.dedupeKeepLatest

/** Sources/sinks — SURVEY §2.1 S5 (CSV import + upsert), S7 (batched
  * append), S9 (snapshot-replace). The reference's sinks are ClickHouse
  * INSERT batching (lib/batch.js) and DELETE+INSERT refresh
  * (jobs/holders-refresher.js:131-194); the Spark-native forms are
  * partitioned parquet append, dynamic-partition overwrite (the
  * replaceWhere twin), and a read-merge-write upsert (the Delta MERGE
  * twin without a transactional table format in this environment).
  */
object Sinks {

  import org.apache.hadoop.fs.{FileSystem, Path}

  /** All maintenance/CRUD below goes through the Hadoop FileSystem API
    * (never java.io.File): the partition-retention and two-phase-
    * overwrite claims these ops headline hold on whatever filesystem the
    * path's scheme resolves to — local in tests, HDFS/S3A on a cluster.
    */
  private def fsFor(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Two-phase table rewrite: materialize `df` into a sibling temp dir,
    * then overwrite `path` from the temp and remove it. The guarantee is
    * CRASH-safety of the source data: the expensive first write reads and
    * rewrites without touching `path`, so a failure mid-flight leaves the
    * table intact, and the second write is a cheap copy that cannot fail
    * on a compute error. It is NOT concurrent-reader isolation — phase 2
    * is a delete-and-rewrite of the live path, and a reader overlapping
    * it can see a missing or partial table; serializing readers against
    * config-table maintenance (or a transactional format / view flip) is
    * the deployment's job.
    */
  private def twoPhaseOverwrite(spark: SparkSession, df: DataFrame,
                                path: String): Unit = {
    // underscore-prefixed sibling: hidden from Spark's partition/file
    // discovery, so compacting one `batch=N` partition of a partitioned
    // root never surfaces a phantom `batch=N.tmp` partition (which would
    // break concurrent readers' partition-column inference mid-phase-1)
    val p = new Path(path)
    val tmp = new Path(p.getParent, "_tmp_" + p.getName).toString
    df.write.mode(SaveMode.Overwrite).parquet(tmp)
    spark.read.parquet(tmp).write.mode(SaveMode.Overwrite).parquet(path)
    val (fs, tmpPath) = fsFor(spark, tmp)
    fs.delete(tmpPath, true)
  }

  /** S7: batched append — micro-batch rows land as a partitioned append.
    * `partitionCol` plays the monthly range partitioning of the trades
    * table (phase3schema.sql:353-368): at 100 TB the partition column is
    * what makes time-window reads prune files instead of listing the
    * world.
    */
  def appendPartitioned(df: DataFrame, path: String,
                        partitionCol: String): Unit =
    df.write.mode(SaveMode.Append).partitionBy(partitionCol).parquet(path)

  /** S7/T3: count+time buffered append — the BatchQueue twin
    * (lib/batch.js:16-23; trades 800 rows/120 ms, core/trades.js:82-83).
    * The reference bounds every ClickHouse INSERT by `maxItems` rows and
    * flushes a partial buffer after `maxWaitMs`. Spark-native mapping:
    * the COUNT threshold is `maxRecordsPerFile` — no output file (the
    * INSERT analog) ever exceeds `maxItems` rows, regardless of
    * micro-batch size; the TIME threshold is the processing-time trigger
    * of the streaming form below. Enforced by the writer per-task with no
    * extra shuffle or count pass.
    */
  def batchedAppend(df: DataFrame, path: String, partitionCol: String,
                    maxItems: Int): Unit =
    df.write.mode(SaveMode.Append)
      .option("maxRecordsPerFile", maxItems.toLong)
      .partitionBy(partitionCol)
      .parquet(path)

  /** T3 streaming form: flush the landing stream every `maxWaitMs` (the
    * BatchQueue time threshold → processing-time trigger) with every
    * flushed file capped at `maxItems` rows (count threshold). A burst
    * bigger than `maxItems` lands as several bounded files in one
    * trigger; a trickle waits at most `maxWaitMs` — the exact semantics
    * of lib/batch.js push/timer.
    */
  def batchedSink(stream: DataFrame, path: String, checkpoint: String,
                  maxItems: Int, maxWaitMs: Long)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .option("maxRecordsPerFile", maxItems.toLong)
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime(maxWaitMs))
      .format("parquet")
      .option("path", path)
      .start()

  /** S9: snapshot-replace — overwrite ONLY the partitions present in the
    * incoming snapshot (dynamic partition overwrite), the twin of
    * "DELETE token's rows, INSERT fresh snapshot". Other partitions are
    * untouched, so concurrent readers of other keys never see a hole.
    */
  def snapshotReplace(df: DataFrame, path: String,
                      partitionCol: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(path)

  /** Morton (Z-order) interleave of two non-negative longs already
    * scaled into [0, 2^bitsPer): bit i of `a` lands at z-bit 2i, bit i
    * of `b` at 2i+1, so sorting by z clusters BOTH dimensions at every
    * scale simultaneously. Folded shift/mask Column composition — one
    * codegen'd projection, no UDF. 21+21 bits = 42-bit z, Long-safe.
    */
  def mortonInterleave(a: Column, b: Column, bitsPer: Int = 21): Column =
    (0 until bitsPer).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** Z-ordered layout write — the multi-column pruning lever the
    * partition/bucket layouts can't give: partitioning prunes on ONE
    * hierarchy (month), bucketing co-locates a JOIN key but its hash
    * scatters range predicates. Z-ordering sorts by the Morton
    * interleave of two query dimensions (pool × time is the DEX shape:
    * "this pool, this week" touches a handful of row groups instead of
    * every file of the month), so parquet min/max stats become TIGHT on
    * BOTH columns and the reader's row-group skipping fires for
    * predicates on either. Columns are min/max-scaled into 21-bit space
    * with one tiny bounds aggregate (broadcast, never a shuffle of the
    * data itself); the write is repartitionByRange(z) +
    * sortWithinPartitions(z) — range partitioning keeps z-runs disjoint
    * across files, so each file covers a contiguous z-rectangle.
    * SinkSpec proves the claim from the parquet FOOTERS: the fraction
    * of files whose [min,max] admits a given key under z-order vs a
    * time-sorted layout — the same statistics the scan's row-group
    * filter consults.
    */
  def writeZOrdered(df: DataFrame, path: String, colA: String,
                    colB: String, files: Int): Unit = {
    val bounds = df.agg(
      min(col(colA)).as("amin"), max(col(colA)).as("amax"),
      min(col(colB)).as("bmin"), max(col(colB)).as("bmax"))
    def scaled(c: Column, lo: Column, hi: Column): Column = {
      val span = (hi - lo).cast("double")
      val unit = when(span > 0d, (c - lo).cast("double") / span)
        .otherwise(lit(0d))
      least(floor(unit * (1L << 21).toDouble).cast("long"),
        lit((1L << 21) - 1L))
    }
    df.crossJoin(broadcast(bounds))
      .withColumn("__z", mortonInterleave(
        scaled(col(colA), col("amin"), col("amax")),
        scaled(col(colB), col("bmin"), col("bmax"))))
      .drop("amin", "amax", "bmin", "bmax")
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Bucketed table write — the co-located-join storage layout: both
    * sides of a recurring equi-join (trades ⋈ pool_state on pool_id,
    * matrix reads, …), bucketed on the join key with the same bucket
    * count, join WITHOUT a shuffle exchange — each bucket pair joins
    * locally (SinkSpec asserts the plan has no hash-partitioning
    * exchange).
    * At 100 TB this converts every repeated key-aligned join/aggregation
    * from a full shuffle into a local merge. sortBy gives in-bucket order
    * for merge joins and row-group skipping.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** Bucket-preserving compaction — [[compactSmallFiles]] for BUCKETED
    * tables, where the path-based pass would be a correctness bug: a
    * plain repartition(n) rewrite scatters each bucket's rows across
    * files, the rewritten table loses its bucket metadata, and every
    * join that was shuffle-free pays the exchange again. Instead:
    * re-read the table, cluster back to one partition per bucket with
    * repartition(numBuckets, bucketCols) — Spark's repartition uses the
    * same murmur3 HashPartitioning that bucketing does, so each write
    * task holds exactly one bucket and emits exactly ONE file — and
    * rewrite through the SAME bucketBy/sortBy path into a staging
    * table, then swap names in the catalog. Result: file count drops
    * from files-per-ingest × buckets to one per non-empty bucket (at
    * most `buckets`), and the no-Exchange join property is untouched
    * (SinkSpec pins both).
    */
  def compactBucketed(spark: SparkSession, table: String): Unit = {
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    val spec = meta.bucketSpec.getOrElse(throw new IllegalArgumentException(
      s"compactBucketed: $table has no bucket spec — use " +
        "compactSmallFiles for unbucketed layouts"))
    val bucketCols = spec.bucketColumnNames.map(col)
    // read the table's FILES as plain parquet, not spark.table(table):
    // against the bucketed scan the optimizer can simultaneously drop
    // the repartition as redundant (the scan claims the bucket hash
    // partitioning) AND disable the bucketed scan as unnecessary for a
    // write — leaving size-packed input partitions and one file per
    // (task × bucket) instead of one per bucket. A metadata-free read
    // keeps the exchange real; repartition's murmur3-pmod is the same
    // mapping the bucket writer uses, so each task holds exactly one
    // bucket and emits exactly one file.
    val clustered = spark.read.parquet(meta.location.toString)
      .repartition(spec.numBuckets, bucketCols: _*)
    val staging = s"${table}_compacting"
    var w = clustered.write.mode(SaveMode.Overwrite)
      .bucketBy(spec.numBuckets, spec.bucketColumnNames.head,
        spec.bucketColumnNames.tail: _*)
    if (spec.sortColumnNames.nonEmpty)
      w = w.sortBy(spec.sortColumnNames.head, spec.sortColumnNames.tail: _*)
    w.saveAsTable(staging)
    // swap via rename-aside, not DROP-then-RENAME: a crash between the
    // two catalog ops must never lose the data or leave NO table — the
    // old data survives under `<table>_precompact` until the new name
    // is in place, and recovery from any crash point is a rename, not
    // a restore. (The brief window where `table` resolves to neither
    // name is inherent to a two-op catalog swap; readers retry.)
    val retired = s"${table}_precompact"
    spark.sql(s"DROP TABLE IF EXISTS `$retired`")
    spark.sql(s"ALTER TABLE `$table` RENAME TO `$retired`")
    spark.sql(s"ALTER TABLE `$staging` RENAME TO `$table`")
    spark.sql(s"DROP TABLE `$retired`")
  }

  /** Small-file compaction — the maintenance pass every append-heavy
    * layout needs at scale: a 120 ms-flush ingest (T3) leaves thousands
    * of row-group-sized files per partition, and scan cost becomes file-
    * open cost. Rewrite a directory into ceil(bytes/targetBytes) files
    * (ClickHouse's background merge / OPTIMIZE TABLE analog). Two-phase
    * write through a temp dir — crash-safe for the source, see
    * [[twoPhaseOverwrite]]'s reader-isolation caveat.
    */
  def compactSmallFiles(spark: SparkSession, path: String,
                        targetBytes: Long): Unit = {
    val (fs, p) = fsFor(spark, path)
    val bytes = fs.getContentSummary(p).getLength
    val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    twoPhaseOverwrite(spark, spark.read.parquet(path).repartition(nFiles),
      path)
  }

  /** Config-table CRUD, insert half — the watchlist/alerts writer
    * (api/routes/watchlist.js POST: `INSERT ... ON CONFLICT (wallet_id,
    * token_id) DO NOTHING`; phase3schema.sql:272-316). Incoming rows
    * whose `keyCols` already exist are silently skipped; the rest
    * append. The existence probe is a keys-only anti-join against the
    * current table and the write is a plain append — no rewrite of
    * existing data. No broadcast hint: config tables are user-scale, but
    * user-scale still grows unbounded (alert rules × users); AQE
    * broadcasts the key frame at runtime while it is genuinely small.
    */
  def insertIfAbsent(spark: SparkSession, df: DataFrame, path: String,
                     keyCols: Seq[String]): Unit = {
    val (fs, p) = fsFor(spark, path)
    val fresh =
      if (fs.exists(p)) {
        val current = spark.read.parquet(path)
        df.join(current.select(keyCols.map(col): _*), keyCols, "left_anti")
      } else df
    fresh.write.mode(SaveMode.Append).parquet(path)
  }

  /** Config-table CRUD, delete half (watchlist.js DELETE /:id — `DELETE
    * FROM watchlist WHERE id=$1`). Without a transactional format a
    * keyed delete is read-filter-overwrite through a temp dir (two-phase
    * — crash-safe for the source, see [[twoPhaseOverwrite]]'s isolation
    * caveat) — the right trade for
    * user-scale config tables; FACT-table deletion is partition
    * retention ([[dropPartitionsOlderThan]]), never this.
    */
  def deleteWhere(spark: SparkSession, path: String,
                  predicate: Column): Unit = {
    // SQL DELETE semantics: remove rows where the predicate is TRUE —
    // NULL-valued predicates RETAIN the row (a bare !predicate would
    // silently delete them: !NULL is NULL, which filter() drops)
    val remaining = spark.read.parquet(path)
      .filter(!coalesce(predicate, lit(false)))
    twoPhaseOverwrite(spark, remaining, path)
  }

  /** Config-table CRUD, update half (alerts.js PATCH /alerts/:id —
    * `UPDATE alerts SET is_active=$1, params=$2, throttle_sec=$3 WHERE
    * id=$4`). Rows matching `predicate` take the `assignments` values;
    * every other row — and every unassigned column — passes through
    * unchanged. Same read-modify-overwrite shape as [[deleteWhere]]
    * (two-phase, crash-safe), and the same scope note: this is for
    * user-scale config tables, never the fact table. NULL-valued
    * predicates leave the row unmodified, matching SQL UPDATE.
    */
  def updateWhere(spark: SparkSession, path: String, predicate: Column,
                  assignments: Map[String, Column]): Unit = {
    val current = spark.read.parquet(path)
    // SQL UPDATE errors on an unknown column — a typo'd assignment key
    // must fail loudly, not rewrite the whole table unchanged while the
    // caller believes the PATCH took (exact match: the projection below
    // binds by the table's own column names)
    val unknown = assignments.keySet.diff(current.columns.toSet)
    require(unknown.isEmpty,
      s"updateWhere: no such column(s): ${unknown.toSeq.sorted.mkString(", ")}")
    // ONE projection evaluates the predicate AND every assignment RHS
    // against PRE-update values — SQL UPDATE semantics: `SET a=b, b=a`
    // swaps, an assigned predicate column can't re-match, and the result
    // can't depend on assignment iteration order (a sequential
    // withColumn fold would feed post-update values into later RHS)
    val hit = coalesce(predicate, lit(false))
    val updated = current.select(current.columns.map { name =>
      assignments.get(name) match {
        case Some(value) => when(hit, value).otherwise(col(name)).as(name)
        case None => col(name)
      }
    }: _*)
    twoPhaseOverwrite(spark, updated, path)
  }

  /** Partition retention — the other half of the fact table's lifecycle
    * (ref jobs/partitions.js: monthly partition creation + retention
    * drop). The appendPartitioned layout encodes the partition value in
    * the directory name (`col=value`), so retention is a METADATA
    * operation: delete whole partition directories lexicographically
    * below `cutoff` — no scan, no rewrite, reader-safe (concurrent
    * readers of retained partitions never touch the dropped paths). At
    * 100 TB this is exactly why the fact table partitions by month:
    * dropping a month is O(1) directory removals, not a 100 TB rewrite.
    * Values must compare lexicographically in time order (zero-padded
    * dates like `2024-01` — what monthKey writes); returns the number of
    * partitions dropped.
    */
  def dropPartitionsOlderThan(spark: SparkSession, path: String,
                              partitionCol: String, cutoff: String): Int = {
    val prefix = partitionCol + "="
    val (fs, p) = fsFor(spark, path)
    if (!fs.exists(p)) return 0
    val dropped = fs.listStatus(p)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix) &&
        st.getPath.getName.stripPrefix(prefix) < cutoff)
    dropped.foreach(st => fs.delete(st.getPath, true))
    dropped.length
  }

  /** S6: FX-rate style side-input append — one (minute-truncated ts, rate)
    * row per poll (jobs/fx-zig.js:13-62: external quote every 36 s →
    * `exchange_rates(toStartOfMinute(now()), zig_usd)`). The fetch itself
    * is driver-side I/O outside the engine; the engine-side contract is
    * the truncation + append.
    */
  def appendRate(spark: SparkSession, ts: java.time.Instant, rate: Double,
                 path: String): Unit = {
    import spark.implicits._
    Seq((ts, rate)).toDF("ts", "rate")
      .select(date_trunc("minute", col("ts")).as("minute_ts"), col("rate"))
      .write.mode(SaveMode.Append).parquet(path)
  }

  /** S5: CSV import with header + last-wins upsert into an existing table
    * (bin/import-pools-csv.js:105-191). Incoming rows win over current
    * rows on `key`; within the incoming batch the highest `ord` wins
    * (S10 last-wins compaction). Without a transactional format this is
    * read-merge-overwrite; on Delta it would be MERGE WHEN MATCHED.
    */
  def csvUpsert(spark: SparkSession, csvPath: String, tablePath: String,
                key: String, ord: Column): Unit = {
    val incoming = dedupeKeepLatest(
      spark.read.option("header", "true").option("inferSchema", "true")
        .csv(csvPath),
      Seq(key), ord)
    val (fs, tp) = fsFor(spark, tablePath)
    val merged =
      if (fs.exists(tp)) {
        val current = spark.read.parquet(tablePath)
        current.join(incoming, Seq(key), "left_anti")
          .unionByName(incoming.select(current.columns.map(col): _*))
      } else incoming
    // two-phase write: materialize the merge before overwriting the source
    twoPhaseOverwrite(spark, merged, tablePath)
  }

  /** Training-shard export — the dataloader-facing last mile after
    * gate → dedup → pack (pipe1/t12/t23): write the corpus as `nShards`
    * shard directories plus a `_manifest` table the loader reads first.
    *
    *   - assignment is `xxhash64(id) mod nShards` — content-independent
    *     and deterministic, so re-exports place every row in the same
    *     shard (resumable pipelines), and hash balance keeps shard sizes
    *     within a few percent at corpus scale;
    *   - one repartition ON THE SHARD KEY aligns tasks with shards, so
    *     each shard is ONE parquet file (loaders stripe readers over
    *     files; a shard fragmented into per-task slivers defeats that),
    *     written in stable (shard, id) order for reproducible bytes;
    *   - the manifest (shard, n_rows, n_tokens) aggregates the data as
    *     WRITTEN (read-back, not the input plan), so it describes what
    *     is actually on disk; `_manifest` is underscore-hidden from
    *     parquet directory listings, so reading the export root still
    *     yields exactly the corpus.
    *
    * Returns the manifest. At 100 TB: nShards is chosen so a shard fits
    * a loader worker (thousands); the shuffle is one exchange of the
    * final packed corpus — the same exchange any deterministic global
    * placement costs.
    */
  def writeTrainingShards(df: DataFrame, path: String, idCol: String,
                          tokenCol: String, nShards: Int): DataFrame = {
    val spark = df.sparkSession
    df.withColumn("shard", pmod(xxhash64(col(idCol)), lit(nShards.toLong)))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col(idCol))
      .write.mode(SaveMode.Overwrite).partitionBy("shard").parquet(path)
    // read back with the EXPLICIT schema: an all-rows-filtered input
    // writes only _SUCCESS, and schema inference over that throws where
    // an empty export should just produce an empty manifest
    val written = org.apache.spark.sql.types.StructType(
      df.schema.fields :+ org.apache.spark.sql.types.StructField(
        "shard", org.apache.spark.sql.types.LongType))
    val manifest = spark.read.schema(written).parquet(path)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"), sum(col(tokenCol)).as("n_tokens"))
    manifest.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$path/_manifest")
    spark.read.parquet(s"$path/_manifest")
  }
}
