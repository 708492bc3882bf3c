package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.operators.Ohlcv

/** Property tests for the OHLCV engine (SURVEY A5/A6/W5 + gap fill) —
  * the invariants cited in queries/TimeSeries.scala: resample
  * compositionality, high/low envelope, prev-close continuity, gap-fill
  * row spine + idempotence. Random tick sets, deterministic oracle
  * computed with plain Scala collections.
  */
object OhlcvSpec extends Properties("Ohlcv") {

  import SparkTestSession.spark
  import spark.implicits._

  private val base = 1700000000L // epoch anchor for generated ticks

  // (key, ts, ord, price, vol) — tuples, not a nested case class: Spark's
  // encoder codegen cannot instantiate object-nested private classes.
  private type Tick = (String, Long, Long, Double, Double)

  private val genTicks: Gen[List[Tick]] = for {
    n <- Gen.choose(1, 120)
    keys <- Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c")).map(_.distinct)
    ticks <- Gen.listOfN(n, for {
      k <- Gen.oneOf(keys)
      off <- Gen.choose(0L, 20000L)
      p <- Gen.choose(1, 10000).map(_ / 100.0)
      v <- Gen.choose(1, 1000).map(_ / 10.0)
    } yield (k, off, p, v))
  } yield ticks.sortBy(_._2).zipWithIndex.map { case ((k, off, p, v), i) =>
    // ord follows time order — the engine's stated precondition (TESTDATA
    // event_id is strictly time-ordered; SURVEY §7.3 hard-spot 5). The
    // resample-compositionality invariant REQUIRES it: with ord independent
    // of ts, the min-ord tick of a coarse bucket can sit in a later fine
    // bucket and open/close picks diverge.
    (k, base + off, i.toLong, p, v)
  }

  private def df(ticks: List[Tick]): DataFrame =
    ticks.toDF("key", "ts", "ord", "price", "vol")
      .select(col("key"), timestamp_seconds(col("ts")).as("ts"),
        col("ord"), col("price"), col("vol"))

  private def candles(ticks: List[Tick], step: Long): DataFrame =
    Ohlcv.candles(df(ticks), Seq("key"), col("ts"), col("ord"),
      col("price"), col("vol"), step)

  /** Scala-collections oracle for the candle build. */
  private def candleOracle(ticks: List[Tick], step: Long)
      : Map[(String, Long), (Double, Double, Double, Double, Long)] =
    ticks.groupBy(t => (t._1, t._2 / step * step)).map { case (k, ts) =>
      val byOrd = ts.sortBy(_._3)
      k -> (byOrd.head._4, ts.map(_._4).max, ts.map(_._4).min,
        byOrd.last._4, ts.size.toLong)
    }

  private def collectCandles(c: DataFrame)
      : Map[(String, Long), (Double, Double, Double, Double, Long)] =
    c.collect().map { r =>
      (r.getAs[String]("key"), r.getAs[Long]("bucket_ts")) ->
        (r.getAs[Double]("open"), r.getAs[Double]("high"),
          r.getAs[Double]("low"), r.getAs[Double]("close"),
          r.getAs[Long]("trade_count"))
    }.toMap

  property("candleBuild matches collections oracle") =
    Prop.forAllNoShrink(genTicks) { ticks =>
      collectCandles(candles(ticks, 300L)) == candleOracle(ticks, 300L)
    }

  property("resample(1m→6m) ≡ direct 6m build (compositionality)") =
    Prop.forAllNoShrink(genTicks) { ticks =>
      val direct = collectCandles(candles(ticks, 360L))
      val resampled = collectCandles(
        Ohlcv.resample(candles(ticks, 60L), Seq("key"), 360L))
      direct == resampled
    }

  property("high ≥ max(open,close) and low ≤ min(open,close)") =
    Prop.forAllNoShrink(genTicks) { ticks =>
      candles(ticks, 300L).collect().forall { r =>
        val (o, h, l, c) = (r.getAs[Double]("open"), r.getAs[Double]("high"),
          r.getAs[Double]("low"), r.getAs[Double]("close"))
        h >= math.max(o, c) && l <= math.min(o, c)
      }
    }

  property("withPrevCloseOpen: open_n = close_{n-1} per series") =
    Prop.forAllNoShrink(genTicks) { ticks =>
      val rows = Ohlcv.withPrevCloseOpen(candles(ticks, 300L), Seq("key"))
        .select("key", "bucket_ts", "open", "close")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3)))
        .groupBy(_._1).values
      rows.forall { series =>
        val s = series.sortBy(_._2)
        s.zip(s.drop(1)).forall { case (prev, cur) => cur._3 == prev._4 }
      }
    }

  property("withFormingBar: closed+forming partition the resample exactly") =
    Prop.forAllNoShrink(genTicks) { ticks =>
      val fine = candles(ticks, 300L)
      val step = 1800L
      val asOf = ticks.map(_._2).max
      val formingStart = asOf / step * step
      val out = Ohlcv.withFormingBar(fine, Seq("key"), step, asOf)
        .select("key", "bucket_ts", "open", "high", "low", "close",
          "volume", "trade_count", "forming").collect()
      val direct = collectCandles(
        Ohlcv.resample(fine, Seq("key"), step))
      // closed rows are exactly the direct resample below formingStart
      val closedOk = out.filter(!_.getBoolean(8)).forall { r =>
        val k = (r.getString(0), r.getLong(1))
        r.getLong(1) < formingStart && direct.get(k).contains(
          (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
            r.getLong(7)))
      }
      // the forming bar sits AT formingStart; its close/count match the
      // direct resample of that bucket, and high/low only widen toward
      // the open (the ws.js clamp)
      val formingOk = out.filter(_.getBoolean(8)).forall { r =>
        val k = (r.getString(0), r.getLong(1))
        r.getLong(1) == formingStart && direct.get(k).exists {
          case (o, h, l, c, n) =>
            r.getDouble(2) == o && r.getDouble(5) == c && r.getLong(7) == n &&
              r.getDouble(3) == math.max(h, o) && r.getDouble(4) == math.min(l, o)
        }
      }
      // nothing is lost: every direct bucket appears exactly once
      closedOk && formingOk && out.length == direct.size
    }

  property("gapFill(zero): fills carry price 0 and volume 0; none: identity") =
    Prop.forAllNoShrink(genTicks) { ticks =>
      val c = candles(ticks, 300L)
      val real = c.select("key", "bucket_ts").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      val zeroed = Ohlcv.gapFill(c, Seq("key"), 300L, mode = "zero")
        .select("key", "bucket_ts", "close", "volume", "trade_count")
        .collect()
      val fillsOk = zeroed
        .filter(r => !real.contains((r.getString(0), r.getLong(1))))
        .forall(r => r.getDouble(2) == 0.0 && r.getDouble(3) == 0.0 &&
          r.getLong(4) == 0L)
      val noneIsIdentity = Ohlcv.gapFill(c, Seq("key"), 300L, "none")
        .collect().toSet == c.collect().toSet
      fillsOk && noneIsIdentity
    }

  property("gapFill(prev): full spine, zero-volume fills, idempotent") =
    Prop.forAllNoShrink(genTicks) { ticks =>
      val c = candles(ticks, 300L)
      val filled = Ohlcv.gapFill(c, Seq("key"), 300L, mode = "prev")
      val rows = filled.select("key", "bucket_ts", "close", "volume",
        "trade_count").collect()
      val bySeries = rows.groupBy(_.getString(0))
      val spineOk = bySeries.values.forall { rs =>
        val ts = rs.map(_.getLong(1)).sorted
        ts.zip(ts.drop(1)).forall { case (a, b) => b - a == 300L } &&
          ts.length == ((ts.last - ts.head) / 300L + 1)
      }
      val fillOk = rows.filter(_.getLong(4) == 0L)
        .forall(r => r.getDouble(3) == 0.0)
      // idempotence: filling an already-gapless frame is identity
      val again = Ohlcv.gapFill(
        filled.select(c.columns.map(col): _*), Seq("key"), 300L, "prev")
      val same = again.select("key", "bucket_ts", "close", "volume")
        .collect().toSet ==
        filled.select("key", "bucket_ts", "close", "volume").collect().toSet
      spineOk && fillOk && same
    }
}
