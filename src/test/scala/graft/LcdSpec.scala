package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.Lcd
import graft.sources.Lcd._

/** S4 — the LCD enrichment source behind the mockable client trait:
  * failover policy, TTL-cached reserves, owners paging, and the meta
  * derivation rules, all driven through the fixture client (the sandbox
  * has no network; the reference's HTTP layer is exactly the part the
  * trait abstracts away).
  */
class LcdSpec extends AnyFunSuite {

  import SparkTestSession.spark

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("failover rotates endpoints with capped backoff and recovers " +
      "(lib/lcd.js:9-26 policy)") {
    val dead = new FixtureLcdClient(failFirst = Int.MaxValue)
    val live = new FixtureLcdClient(
      meta = Map("uzig" -> DenomMeta("Zig", "ZIG", "zig", Some(6))))
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    val got = Lcd.failover(Seq(dead, live), sleep = sleeps += _) {
      _.denomMetadata("uzig")
    }
    assert(got.contains(DenomMeta("Zig", "ZIG", "zig", Some(6))))
    // endpoint 0 failed once, backoff fired once, endpoint 1 answered
    assert(sleeps.toSeq == Seq(1000L))
    // all-dead fleet fails loudly after maxAttempts (terminating batch
    // semantics, vs the reference's unbounded retry loop)
    val ex = intercept[RuntimeException] {
      Lcd.failover(Seq(dead), maxAttempts = 4, sleep = sleeps += _) {
        _.denomMetadata("uzig")
      }
    }
    assert(ex.getMessage.contains("after 4 attempts"))
    // capped exponential between retries: 1000·1.5^a, ceiling 10000 —
    // and NO trailing backoff after the final attempt (the terminal
    // failure throws immediately, it doesn't stall a dead wait first)
    assert(sleeps.toSeq.drop(1) == Seq(1000L, 1500L, 2250L))
  }

  test("CachedReserves: TTL hit serves the cache, expiry reloads " +
      "(core/prices.js:35-41)") {
    var now = 0L
    val fix = new FixtureLcdClient(reserves = Map(
      "pair1" -> Seq(Reserve("uzig", "1000"), Reserve("coin.a", "500"))))
    val cached = new CachedReserves(fix, ttlMillis = 2000L, clock = () => now)
    assert(cached.get("pair1").map(_.denom) == Seq("uzig", "coin.a"))
    now = 1000L
    cached.get("pair1") // within TTL — served from cache
    assert(cached.loadCount == 1L)
    now = 3000L
    cached.get("pair1") // expired — reloaded
    assert(cached.loadCount == 2L)
  }

  test("holdersSnapshot pages to completion with last-wins addresses, " +
      "and a page-capped sweep reports incomplete") {
    val fix = new FixtureLcdClient(
      owners = Map("uzig" -> Seq(
        ("addr1", "10"), ("addr2", "20"), ("addr3", "30"),
        ("addr1", "15"), ("addr4", "40"))),
      pageSize = 2)
    val (owners, complete) = Lcd.holdersSnapshot("uzig", fix)
    assert(complete)
    // 5 entries over 3 pages; addr1's later balance wins (addrMap)
    assert(owners.toMap == Map("addr1" -> "15", "addr2" -> "20",
      "addr3" -> "30", "addr4" -> "40"))
    val (_, truncated) = Lcd.holdersSnapshot("uzig", fix, maxPages = 1)
    assert(!truncated)
  }

  test("refreshHolders writes a per-denom snapshot partition and " +
      "refuses to write a truncated sweep") {
    val fix = new FixtureLcdClient(
      owners = Map(
        "uzig" -> Seq(("a1", "1"), ("a2", "2"), ("a3", "3")),
        "coin.b" -> Seq(("b1", "9"))),
      pageSize = 2)
    val path = tmpDir("graft-lcd-holders")
    assert(Lcd.refreshHolders(spark, "uzig", fix, path))
    assert(Lcd.refreshHolders(spark, "coin.b", fix, path))
    val all = spark.read.parquet(path)
    assert(all.count() == 4)
    // refresh uzig with fewer holders: snapshot REPLACES its partition,
    // coin.b untouched (the S9 delete+insert without the hole)
    val fix2 = new FixtureLcdClient(
      owners = Map("uzig" -> Seq(("a9", "99"))), pageSize = 2)
    assert(Lcd.refreshHolders(spark, "uzig", fix2, path))
    val after = spark.read.parquet(path)
    assert(after.filter(col("denom") === "uzig").count() == 1)
    assert(after.filter(col("denom") === "coin.b").count() == 1)
    // a truncated sweep writes nothing (complete = false)
    val big = new FixtureLcdClient(
      owners = Map("uzig" -> (1 to 10).map(i => (s"h$i", s"$i"))),
      pageSize = 2)
    assert(!Lcd.refreshHolders(spark, "uzig", big, path, maxPages = 2))
    assert(spark.read.parquet(path)
      .filter(col("denom") === "uzig").count() == 1)
  }

  test("enrichTokenMeta: IBC trace resolution, display-exponent rules, " +
      "u-prefix derivation, factory supplies (core/tokens.js:269-310)") {
    val fix = new FixtureLcdClient(
      meta = Map(
        "uzig" -> DenomMeta("Zig", "ZIG", "zig", Some(6)),
        "uatom" -> DenomMeta("", "", "", None)),
      supplies = Map(
        "uzig" -> FactorySupply(Some("1000000000"), Some("500000000"))),
      traces = Map("ibc/ABCD" -> "uatom"))
    val df = Lcd.enrichTokenMeta(spark,
      Seq("uzig", "ibc/ABCD", "coin.factory1"), fix)
      .orderBy(col("denom")).collect()
    val byDenom = df.map(r => r.getString(0) -> r).toMap
    // native with display exponent + supplies
    val z = byDenom("uzig")
    assert(z.getString(1) == "native" && z.getString(3) == "ZIG" &&
      z.getInt(5) == 6 && z.getString(6) == "1000000000")
    // ibc: trace→base lookup, empty metadata → exponent 6 (ibc rule),
    // u-prefix derivation for symbol/display off the BASE denom
    val i = byDenom("ibc/ABCD")
    assert(i.getString(1) == "ibc" && i.getInt(5) == 6 &&
      i.getString(3) == "ATOM" && i.getString(4) == "atom")
    // unknown native: no metadata → exponent 0, denom-derived names
    val c = byDenom("coin.factory1")
    assert(c.getInt(5) == 0 && c.getString(3) == "COIN.FACTORY1")
  }

  test("poolReserves builds the bounded side-input frame through the " +
      "cache (one load per contract)") {
    val fix = new FixtureLcdClient(reserves = Map(
      "pair1" -> Seq(Reserve("uzig", "1000"), Reserve("coin.a", "500")),
      "pair2" -> Seq(Reserve("uzig", "30"))))
    val cached = new CachedReserves(fix, ttlMillis = Long.MaxValue)
    val df = Lcd.poolReserves(spark, Seq("pair1", "pair2", "pair1"), cached)
    assert(df.count() == 5)
    assert(cached.loadCount == 2L)
    assert(df.filter(col("pair_contract") === "pair1").count() == 4)
  }
}
