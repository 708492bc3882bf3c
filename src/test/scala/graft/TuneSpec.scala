package graft

import org.scalatest.funsuite.AnyFunSuite

/** The shuffle-width policy's arithmetic contract (Tune): the ceil rule,
  * the core-count floor, the local-mode cap, and monotonicity in bytes —
  * the properties the r14 1000×-decade fix rests on.
  */
class TuneSpec extends AnyFunSuite {

  import SparkTestSession.spark

  private val MB = 1L << 20

  test("shuffleWidth floors at the core count for small inputs") {
    // the whole sf0.1 fixture (~17 MB) resolves to the floor — the
    // historical fixed-width behavior is unchanged where it was right
    assert(Tune.shuffleWidth(17 * MB, floor = 32) == 32)
    assert(Tune.shuffleWidth(0L, floor = 32) == 32)
  }

  test("shuffleWidth is ceil(bytes/target) between floor and cap") {
    // 17 GB at the 8 MB default target = 2176 -> capped at 2048;
    // 1.7 GB = ceil(1740.8/8) = 218
    assert(Tune.shuffleWidth(17000L * MB, floor = 32) == 2048)
    assert(Tune.shuffleWidth(1700L * MB, floor = 32) == 213)
    // exact-multiple and one-past boundaries of the ceil
    assert(Tune.shuffleWidth(512 * MB, floor = 4) == 64)
    assert(Tune.shuffleWidth(512 * MB + 1, floor = 4) == 65)
  }

  test("shuffleWidth is monotone in bytes and respects a custom cap") {
    val widths = Seq(1L, 100L, 10000L, 1000000L)
      .map(mb => Tune.shuffleWidth(mb * MB, floor = 8, cap = 512))
    assert(widths == widths.sorted)
    assert(widths.last == 512)
  }

  test("scanSplitBytes targets >=2 splits per core within [4MB, 128MB]") {
    // mid-sized input: bytes/(2*cores) inside the clamp band
    assert(Tune.scanSplitBytes(1536 * MB, cores = 32) == 24 * MB)
    // small input: the 4 MB floor binds (don't shatter tiny tables)
    assert(Tune.scanSplitBytes(17 * MB, cores = 32) == 4 * MB)
    assert(Tune.scanSplitBytes(0L, cores = 32) == 4 * MB)
    // huge input: the 128 MB vectorized-reader ceiling binds
    assert(Tune.scanSplitBytes(100L * 1024 * MB, cores = 32) == 128 * MB)
    // the derived split always yields >= 2*cores splits when the input
    // is big enough to leave the floor
    val bytes = 1536 * MB
    assert(bytes / Tune.scanSplitBytes(bytes, cores = 32) >= 64)
  }

  test("applyShuffleWidth measures the dir and sets the session conf") {
    val dir = java.nio.file.Files.createTempDirectory("tune").toString
    // ~40 MB of payload at the 8 MB target on a 4-core test session ->
    // width 5 (above the floor, so the probe is proven to reach conf)
    val f = java.nio.file.Paths.get(dir, "blob.bin")
    java.nio.file.Files.write(f, new Array[Byte](40 * MB.toInt))
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    val savedSplit = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      val w = Tune.applyShuffleWidth(spark, dir)
      assert(w == 5)
      assert(spark.conf.get("spark.sql.shuffle.partitions") == "5")
      // 40 MB on the 4-core test session -> 40/(2*4) = 5 MB split
      assert(spark.conf.get("spark.sql.files.maxPartitionBytes")
        == (5 * MB).toString)
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", saved)
      spark.conf.set("spark.sql.files.maxPartitionBytes", savedSplit)
    }
  }
}
