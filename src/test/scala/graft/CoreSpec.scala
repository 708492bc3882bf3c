package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.Core._

/** Determinism properties of the core expression library — the reasons
  * the DuckDB hash-compare holds: partition-order-independent sums,
  * bounded approx-distinct error (the a2_approx_distinct claim), stable
  * ids, microsecond-preserving literal anchors.
  */
class CoreSpec extends AnyFunSuite {

  import SparkTestSession.{spark, sfDir}
  import spark.implicits._

  test("dsum is independent of partitioning (exact decimal accumulation)") {
    val r = new scala.util.Random(42)
    val xs = Seq.fill(20000)(r.nextDouble() * 1e6 - 5e5)
    val results = Seq(1, 7, 32).map { p =>
      xs.toDF("x").repartition(p).agg(dsum(col("x"))).head.getDouble(0)
    }
    assert(results.distinct.size == 1,
      s"dsum drifted across partitionings: $results")
    // plain double sum would NOT be stable at this magnitude spread —
    // sanity-check dsum equals the BigDecimal ground truth
    val exact = xs.map(BigDecimal(_).setScale(6,
      BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    assert(results.head == exact)
  }

  test("xsum: exact on the fixed-point grid, partition-order-independent, " +
      "and the 128-bit accumulator survives long-limb overflow") {
    // grid-valued inputs (2dp money), the xsum contract
    val r = new scala.util.Random(11)
    val xs = Seq.fill(20000)((r.nextInt(20000000) - 10000000) / 100d)
    val results = Seq(1, 7, 32).map { p =>
      xs.toDF("x").repartition(p).agg(xsum(col("x"), dp = 2))
        .head.getDouble(0)
    }
    assert(results.distinct.size == 1,
      s"xsum drifted across partitionings: $results")
    // ground truth in exact integer cents
    val exact = xs.map(x => math.floor(x * 100d + 0.5d).toLong).sum / 100d
    assert(results.head == exact)
    // the 4dp product default matches dsum's decimal path on j1-shaped
    // inputs (price × (1−discount) — a 4dp grid where BOTH are exact)
    val prices = Seq.fill(5000)((r.nextInt(10000000) + 100) / 100d)
    val discs = Seq.fill(5000)(r.nextInt(11) / 100d)
    val df = prices.zip(discs).toDF("p", "d")
    val viaX = df.agg(xsum(col("p") * (lit(1d) - col("d"))))
      .head.getDouble(0)
    val truth = prices.zip(discs).map { case (p, d) =>
      (BigDecimal(p) * (1 - BigDecimal(d))).setScale(4,
        BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble
    assert(math.abs(viaX - truth) < 1e-6, s"$viaX vs $truth")
    // limb overflow: values big enough that the scaled-long PARTIAL sums
    // exceed 2^63 — the carry into the hi limb must keep the total exact
    // (a plain sum(long) wraps negative here)
    val big = 9e14 // 9e18 units at dp=4; two of them overflow a long
    val bigs = Seq.fill(64)(big)
    val got = bigs.toDF("x").repartition(2).agg(xsum(col("x")))
      .head.getDouble(0)
    assert(got == big * 64, s"hi-limb carry lost: $got vs ${big * 64}")
    // the naive built-in long sum on the same input either throws (ANSI
    // default) or wraps negative (legacy) — both prove the overflow the
    // 128-bit accumulator just absorbed is real, not a vacuous case
    val naive = scala.util.Try(bigs.toDF("x")
      .agg((sum(floor(col("x") * 1e4 + 0.5d).cast("long")) / lit(1e4)))
      .head.getDouble(0))
    assert(naive.isFailure || naive.get < 0,
      s"expected the naive long sum to overflow, got $naive")
  }

  test("davg matches decimal-sum/count to the bit across partitionings") {
    val r = new scala.util.Random(7)
    val xs = Seq.fill(5000)(r.nextDouble() * 1000)
    val res = Seq(1, 13).map { p =>
      xs.toDF("x").repartition(p).agg(davg(col("x"))).head.getDouble(0)
    }
    assert(res.distinct.size == 1)
  }

  test("approx_count_distinct(0.02) within 5% of exact on events users") {
    val e = Tables.events(spark, sfDir)
    val both = e.groupBy(col("event_type"))
      .agg(count_distinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id"), 0.02).as("approx"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val (exact, approx) = (r.getAs[Long]("exact"), r.getAs[Long]("approx"))
      assert(math.abs(approx - exact) <= math.max(1L, (exact * 0.05).toLong),
        s"${r.get(0)}: approx=$approx exact=$exact")
    }
  }

  test("HLL rolling uniques within 5% of exact, stable across partitionings") {
    // the a20 sketch path: per-day hll_sketch_agg then 7-day union —
    // bound the estimate against exact rolling distincts computed the
    // expensive way, and pin partition-order independence
    val e = Tables.events(spark, sfDir)
    def rolling(parts: Int): Map[(String, Long), Long] = {
      val day = e.repartition(parts)
        .groupBy(col("event_type"), bucketSec(col("ts"), 86400L).as("day"))
        .agg(expr("hll_sketch_agg(user_id)").as("sk"))
      day.as("a").join(day.as("b"),
          col("a.event_type") === col("b.event_type") &&
            col("b.day") <= col("a.day") &&
            col("b.day") >= col("a.day") - 6L * 86400L)
        .groupBy(col("a.event_type").as("t"), col("a.day").as("d"))
        .agg(expr("hll_sketch_estimate(hll_union_agg(b.sk))").as("u"))
        .as[(String, Long, Long)].collect()
        .map { case (t, d, u) => (t, d) -> u }.toMap
    }
    val est = rolling(32)
    assert(est == rolling(3), "sketch estimate drifted across partitionings")
    val exact = e.select(col("event_type"),
        bucketSec(col("ts"), 86400L).as("day"), col("user_id"))
      .distinct().as[(String, Long, Long)].collect()
      .groupBy(_._1).toSeq.flatMap { case (t, rows) =>
        val days = rows.map(_._2).distinct
        days.map { d =>
          (t, d) -> rows.filter(r => r._2 <= d && r._2 >= d - 6L * 86400L)
            .map(_._3).distinct.size.toLong
        }
      }.toMap
    assert(est.keySet == exact.keySet)
    est.foreach { case (k, u) =>
      val x = exact(k)
      assert(math.abs(u - x) <= math.max(1L, (x * 0.05).toLong),
        s"$k: sketch=$u exact=$x")
    }
  }

  test("stableId is deterministic and injective on distinct sample keys") {
    val keys = (1 to 1000).map(i => s"denom$i")
    val ids1 = keys.toDF("k").select(stableId(col("k"))).as[Long].collect()
    val ids2 = keys.toDF("k").select(stableId(col("k"))).as[Long].collect()
    assert(ids1.sameElements(ids2))
    assert(ids1.distinct.length == keys.length)
  }

  test("anchorMinusSec preserves sub-second precision") {
    val df = Seq("2024-03-01 10:00:00.123456", "2024-03-05 00:00:00.654321")
      .toDF("s").select(to_timestamp(col("s")).as("ts"))
    val cut = anchorMinusSec(df, col("ts"), 86400L)
    val got = df.select(cut.as("c")).head.getTimestamp(0)
    assert(got.toString == "2024-03-04 00:00:00.654321")
  }

  test("saltedAggregate equals direct aggregation (skew-safe two-stage)") {
    val e = Tables.events(spark, sfDir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("event_type", "n", "hi", "v")
        .as[(String, Long, Double, Double)].collect().toSet
    val direct = rows(e.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), max(col("value")).as("hi"),
        dsum(col("value")).as("v")))
    val salted = rows(graft.operators.Relational.saltedAggregate(
      e, Seq("event_type"), saltBuckets = 16, Seq(
        ("n", count(lit(1)), c => sum(c)),
        ("hi", max(col("value")), c => max(c)),
        ("v", dsum(col("value")), c => dsum(c)))))
    assert(salted == direct)
  }

  test("txHash matches the sha-256 upper-hex contract") {
    val got = Seq("hello").toDF("t").select(txHash(col("t"))).head.getString(0)
    assert(got ==
      "2CF24DBA5FB0A30E26E83B2AC5B9E29E1B161E5C1FA7425E73043362938B9824")
  }
}
