package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The synthesized partsupp derivation (Tables.partsupp / FIXTURES.md §A):
  * the Spark expression arithmetic must equal the documented integer
  * formula exactly — including at the sf0.001 fixture's S=10, where the
  * dbgen-step adaptation produces duplicate (partkey, suppkey) pairs
  * (the documented caveat) — because the b18-b22 oracles re-derive the
  * same rows in DuckDB and any arithmetic drift breaks five hash
  * compares at once.
  */
class PartsuppSpec extends AnyFunSuite {

  import SparkTestSession.{spark, sfDir}

  /** The FIXTURES.md formula, executed in plain Scala. */
  private def reference(partKeys: Seq[Long], s: Long)
      : Seq[(Long, Long, Long, Double)] =
    for (pk <- partKeys; i <- 0L to 3L) yield (
      pk,
      (pk + i * (s / 4 + pk / s)) % s,
      (pk * 37 + i * 101) % 9999 + 1,
      ((pk * 53 + i * 7) % 99901 + 100).toDouble / 100.0)

  test("Spark derivation == the documented integer formula at S=10 " +
      "(sf0.001), dup-pair caveat included") {
    val got = Tables.partsupp(spark, sfDir)
      .orderBy(col("ps_partkey"), col("ps_suppkey"), col("ps_availqty"))
      .as[(Long, Long, Long, Double)](
        org.apache.spark.sql.Encoders.product)
      .collect().toSeq
    val s = Tables.supplier(spark, sfDir).count()
    val pks = Tables.part(spark, sfDir)
      .select(col("p_partkey")).as[Long](
        org.apache.spark.sql.Encoders.scalaLong).collect().toSeq
    val want = reference(pks, s)
      .sortBy(t => (t._1, t._2, t._3))
    assert(got == want)
    // the caveat is REAL at S=10: some (partkey, suppkey) pair repeats
    // (step ≡ 0 or 5 mod 10 collides i-values)...
    val pairs = want.map(t => (t._1, t._2))
    assert(pairs.distinct.size < pairs.size)
    // ...and every part still carries 4 rows with 4 DISTINCT costs
    // (7·Δi ≢ 0 mod 99901), so b18's min-cost row stays unique per part
    want.groupBy(_._1).foreach { case (pk, rows) =>
      assert(rows.size == 4)
      assert(rows.map(_._4).distinct.size == 4, s"pk=$pk cost collision")
    }
  }

  test("at sf0.01's S=100 all four suppliers per part are distinct " +
      "(the FIXTURES claim the oracles lean on)") {
    val dup = Tables.partsupp(spark, "/root/testdata/sf0.01")
      .groupBy(col("ps_partkey"), col("ps_suppkey"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
    assert(dup.isEmpty)
  }
}
