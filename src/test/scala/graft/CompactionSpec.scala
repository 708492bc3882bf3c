package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.streaming.Compaction

/** Crash recovery for the shared slice compactor: the rename-aside swap
  * claims "a crash leaves old-or-new, never neither/both" — these tests
  * exercise the two crash points and the stale-leftover case directly.
  */
class CompactionSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def freshSlices(): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-compact").toString + "/art"
    Seq(1L, 2L).toDF("k").write.parquet(s"$dir/batch=0")
    Seq(3L, 4L).toDF("k").write.parquet(s"$dir/batch=1")
    dir
  }

  private def ks(dir: String): Seq[Long] =
    spark.read.parquet(dir).select("k").as[Long].collect().sorted.toSeq

  private def fs(dir: String) = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("a stale _compacting fold from a crashed attempt is cleared, " +
      "not activated alongside the fresh fold (no row duplication)") {
    val dir = freshSlices()
    // simulate: an earlier compaction wrote its complete fold to
    // _compacting/batch=0 and crashed before the renames; the stream
    // then appended batch=1
    Seq(1L, 2L).toDF("k").write
      .parquet(s"$dir._compacting/batch=0")
    Compaction.rewrite(spark, dir, "k BIGINT")
    assert(ks(dir) == Seq(1L, 2L, 3L, 4L)) // each row exactly once
    // folded into the single max-batch partition
    assert(spark.read.parquet(dir).select("batch").distinct()
      .as[Long].collect().toSeq == Seq(1L))
  }

  test("a crash between the two renames (live gone, data at the aside " +
      "name) auto-recovers on the next run instead of serving empty") {
    val dir = freshSlices()
    // simulate the mid-swap crash: live moved aside, activation never ran
    require(fs(dir).rename(
      new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(s"$dir._precompact")))
    Compaction.rewrite(spark, dir, "k BIGINT")
    assert(ks(dir) == Seq(1L, 2L, 3L, 4L))
  }

  test("missing dir and empty slices are no-ops, not errors") {
    val gone = java.nio.file.Files
      .createTempDirectory("graft-compact-none").toString + "/nothing"
    Compaction.rewrite(spark, gone, "k BIGINT")
    assert(!fs(gone).exists(new org.apache.hadoop.fs.Path(gone)))
  }
}
