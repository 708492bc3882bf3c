package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.{SparkTestSession, Tables}

/** Byte-equality pins for the r16 driver-local sampled trainers
  * ([[LocalTrain]]) against the distributed Lloyd loops they replace
  * below the LocalTrainMaxRows gate. The switch is only free if the two
  * paths are BIT-identical — float bits compared raw, so a ±0.0 or ULP
  * drift in the mean/argmin arithmetic fails loudly here rather than as
  * a downstream oracle-hash mismatch.
  */
class LocalTrainSpec extends AnyFunSuite {

  import SparkTestSession.{spark, sfDir}
  import spark.implicits._

  private lazy val vecs = Tables.embeddings(spark, sfDir)

  private def centMap(df: org.apache.spark.sql.DataFrame)
      : Map[Long, Seq[Int]] =
    df.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
      .map { case (id, e) =>
        id -> e.map(java.lang.Float.floatToIntBits).toSeq }
      .toMap

  private def bookMap(df: org.apache.spark.sql.DataFrame)
      : Map[(Int, Long), Seq[Int]] =
    df.select(col("sub").cast("int"), col("code").cast("long"), col("cw"))
      .as[(Int, Long, Seq[Float])].collect()
      .map { case (s, c, w) =>
        (s, c) -> w.map(java.lang.Float.floatToIntBits).toSeq }
      .toMap

  /** The distributed sampled-kmeans chain sampledTrainCentroids ran
    * before r16 (and still runs above the gate), spelled out.
    */
  private def distributedCentroids(df: org.apache.spark.sql.DataFrame,
                                   targetSample: Long, kCentroids: Long,
                                   iters: Int)
      : org.apache.spark.sql.DataFrame = {
    val n = df.select(count(lit(1))).head().getLong(0)
    val mod = math.max(1L, n / targetSample)
    val seeds = Similarity.sampleSeedIds(df, mod, kCentroids)
    Similarity.kmeansCentroids(df.filter(col("vec_id") % mod === 0),
      df.filter(col("vec_id").isInCollection(seeds)), iters)
  }

  private def distributedBook(df: org.apache.spark.sql.DataFrame, m: Int,
                              iters: Int, targetSample: Long, kCodes: Long)
      : org.apache.spark.sql.DataFrame = {
    val dim = df.select(size(col("embedding"))).head().getInt(0)
    val n = df.select(count(lit(1))).head().getLong(0)
    val mod = math.max(1L, n / targetSample)
    val seeds = Similarity.sampleSeedIds(df, mod, kCodes)
    Similarity.pqTrainSliced(
      Similarity.pqSliced(df, m, dim / m).filter(col("id") % mod === 0),
      iters, col("id").isInCollection(seeds))
  }

  test("local sampled kmeans ≡ distributed, float-bit exact (mod > 1)") {
    // targetSample 100 over the ~2k-row fixture → mod ≈ 20, a real
    // subsample; 16 seed centroids, 2 Lloyd iterations
    val local = Similarity.sampledTrainCentroids(vecs, 100L, 16L, 2)
    assert(local.queryExecution.optimizedPlan.collectLeaves()
      .forall(_.nodeName == "LocalRelation"),
      "expected the driver-local trainer below the gate")
    assert(centMap(local) == centMap(
      distributedCentroids(vecs, 100L, 16L, 2)))
  }

  test("local sampled kmeans ≡ distributed on offset ids (mod = 1)") {
    val offset = vecs.select((col("vec_id") + 10000000L).as("vec_id"),
      col("embedding"))
    val local = Similarity.sampledTrainCentroids(offset, 5000L, 16L, 2)
    assert(centMap(local) == centMap(
      distributedCentroids(offset, 5000L, 16L, 2)))
  }

  test("local pq train ≡ distributed, float-bit exact (mod > 1)") {
    val local = Similarity.pqTrainSampled(vecs, m = 4, iters = 2,
      targetSample = 100L, kCodes = 10L)
    assert(bookMap(local) == bookMap(
      distributedBook(vecs, 4, 2, 100L, 10L)))
  }

  test("local pq train ≡ distributed on truncated vectors") {
    // truncate some embeddings so tail subspaces go short/empty — the
    // slice/posexplode semantics the local trainer must replicate
    val ragged = vecs.select(col("vec_id"),
      when(col("vec_id") % 7 === 3, slice(col("embedding"), 1, 18))
        .otherwise(col("embedding")).as("embedding"))
    val local = Similarity.pqTrainSampled(ragged, m = 4, iters = 2,
      targetSample = 150L, kCodes = 8L)
    assert(bookMap(local) == bookMap(
      distributedBook(ragged, 4, 2, 150L, 8L)))
  }

  test("pqEncodePacked ≡ pqPackCodes(pqEncode(...)), byte exact") {
    val cb = Similarity.pqTrainSampled(vecs, m = 4, iters = 2)
    def bytesOf(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Byte]] =
      df.select(col("vec_id").cast("long"), col("pcodes"))
        .as[(Long, Array[Byte])].collect()
        .map { case (id, b) => id -> b.toSeq }.toMap
    val fused = bytesOf(Similarity.pqEncodePacked(vecs, cb))
    val longForm = bytesOf(
      Similarity.pqPackCodes(Similarity.pqEncode(vecs, cb), cb))
    assert(fused == longForm)
  }

  test("adaptive geometry: local path matches distributed cells + coarse") {
    val (centL, coarseL) = Similarity.adaptiveTrainGeom(vecs, 2)
    // distributed twin of the same derivation
    val n = vecs.select(count(lit(1))).head().getLong(0)
    val nl = Similarity.autoNlist(n)
    val mod = math.max(1L, n / (32L * nl))
    val seeds = Similarity.sampleSeedIds(vecs, mod, nl)
    val centD = Similarity.kmeansCentroids(
      vecs.filter(col("vec_id") % mod === 0),
      vecs.filter(col("vec_id").isInCollection(seeds)), 2)
    val g = math.max(1L, math.ceil(math.sqrt(nl.toDouble)).toLong).toInt
    val coarseD = seeds.zipWithIndex.collect {
      case (id, j) if j % g == 0 => id }
    assert(coarseL.toSeq == coarseD.toSeq)
    assert(centMap(centL) == centMap(centD))
  }
}
