package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Crash-safe compaction for `batch=<id>`-sliced streaming artifacts —
  * the small-files answer for every index-maintenance path: a stream
  * that appends one slice per micro-batch accumulates thousands of tiny
  * partitions at 100 TB, and every serve pays the file-listing and
  * row-group-open tax. Compaction folds the accumulated slices into ONE
  * partition under `batch=<maxSeenId>` with a rename-aside swap
  * (generalized from the dataset-card implementation, which now calls
  * through here):
  *
  *   1. write the folded data to `<live>._compacting/batch=<max>`
  *   2. copy the `_stream_id` checkpoint marker through the swap
  *   3. move `<live>` aside, activate the compacted dir, drop the aside
  *
  * A crash between the renames leaves either the live dir or the aside
  * copy intact — never a half-state both paths read. Keeping the folded
  * partition at `batch=<maxSeenId>` preserves the checkpoint contract:
  * a restart with the SAME checkpoint appends fresh ids above it, and a
  * retry of the last pre-compaction batch overwrites the folded
  * partition — so compact only at a trigger boundary (AvailableNow
  * drained), exactly like `CorpusCard.compactSlices` documents.
  */
object Compaction {

  /** Replace the slice dir at `live` with `fold(slices)` under one
    * `batch=<maxSeenId>` partition. `fold` receives the accumulated
    * rows WITHOUT the batch column; additive-partial artifacts (card
    * counters, BM25 dict/meta) pass a summing fold, row-disjoint
    * artifacts use [[rewrite]]. No-op on a missing or empty dir.
    */
  def swapFolded(spark: SparkSession, live: String, schema: String,
                 fold: DataFrame => DataFrame): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val livePath = new org.apache.hadoop.fs.Path(live)
    val fs = livePath.getFileSystem(conf)
    val next = s"$live._compacting"
    val aside = s"$live._precompact"
    val nextPath = new org.apache.hadoop.fs.Path(next)
    val asidePath = new org.apache.hadoop.fs.Path(aside)
    // crash recovery: a failure between the two renames strands the data
    // at the aside name with NO live dir — restore it before anything
    // else, so a compaction re-run (or any caller) never reads the
    // artifact as silently empty
    if (!fs.exists(livePath) && fs.exists(asidePath))
      require(fs.rename(asidePath, livePath),
        s"compaction: cannot restore $aside to $live")
    if (!fs.exists(livePath)) return
    // a crashed earlier attempt may have left a stale fold here; the
    // per-partition overwrite below would NOT clear other batch=<id>
    // dirs, and activating them alongside the fresh fold would serve
    // every pre-crash row twice
    fs.delete(nextPath, true)
    val df = spark.read.schema(StructType.fromDDL(
      schema + ", batch BIGINT")).parquet(live)
    val maxBatch = df.agg(max(col("batch"))).head.get(0)
    if (maxBatch == null) return
    val folded = fold(df.drop("batch"))
    folded.write.mode("overwrite").parquet(s"$next/batch=$maxBatch")
    // preserve the stream-identity marker through the swap
    val marker = new org.apache.hadoop.fs.Path(s"$live/_stream_id")
    if (fs.exists(marker))
      org.apache.hadoop.fs.FileUtil.copy(fs, marker, fs,
        new org.apache.hadoop.fs.Path(s"$next/_stream_id"), false, conf)
    fs.delete(asidePath, true)
    require(fs.rename(livePath, asidePath),
      s"compaction: cannot move $live aside")
    require(fs.rename(nextPath, livePath),
      s"compaction: cannot activate $next (old data at $aside)")
    fs.delete(asidePath, true)
  }

  /** Compact ROW-DISJOINT slices (each row lives in exactly one slice —
    * the ANN cells/codes, SQ8 codes, and BM25 postings shape) by plain
    * rewrite: same rows, one partition.
    */
  def rewrite(spark: SparkSession, live: String, schema: String): Unit =
    swapFolded(spark, live, schema, identity)
}
