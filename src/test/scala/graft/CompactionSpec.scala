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

  test("a reader concurrent with the swap sees old-or-new, never mixed: " +
      "a pre-swap plan either returns exactly the old rows or fails " +
      "loudly; it can never double-count or blend slices") {
    // The remaining window the crash tests don't cover (r13 verdict #8):
    // a serve PLANNED against the live dir while the fold activates.
    // Spark snapshots the file listing when read.parquet() builds the
    // DataFrame; the swap then atomically renames the whole dir, so at
    // execution the reader holds paths that are either all-old (read
    // raced ahead of the rename — old data, complete) or all-gone
    // (FileNotFound — a LOUD failure the serve retries). The fold's new
    // files live under fresh UUID part names in a dir that only becomes
    // `live` atomically, so no execution can open a mixture.
    val dir = freshSlices()
    val preSwapPlan = spark.read
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "k BIGINT, batch BIGINT"))
      .parquet(dir) // file listing snapshots HERE, pre-swap
    val old = Seq(1L, 2L, 3L, 4L)
    Compaction.rewrite(spark, dir, "k BIGINT")
    val outcome = scala.util.Try(
      preSwapPlan.select("k").as[Long].collect().sorted.toSeq)
    outcome match {
      case scala.util.Success(rows) =>
        // if it read at all, it read a complete consistent snapshot —
        // the exact old row set, no duplication, no partial slice
        assert(rows == old, s"mixed/partial read: $rows")
      case scala.util.Failure(e) =>
        // the loud path: missing files, never silent partial data
        val s = e.toString + Option(e.getCause).fold("")(_.toString)
        assert(s.contains("FileNotFound") || s.contains("does not exist")
            || s.contains("FAILED_READ_FILE"),
          s"expected a missing-file failure, got: $e")
    }
    // and a post-swap reader sees exactly the folded artifact
    assert(ks(dir) == old)
    assert(spark.read.parquet(dir).select("batch").distinct()
      .as[Long].collect().toSeq == Seq(1L))
  }

  test("missing dir and empty slices are no-ops, not errors") {
    val gone = java.nio.file.Files
      .createTempDirectory("graft-compact-none").toString + "/nothing"
    Compaction.rewrite(spark, gone, "k BIGINT")
    assert(!fs(gone).exists(new org.apache.hadoop.fs.Path(gone)))
  }
}
