package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.operators.Similarity

/** Codegen ↔ interpreted parity for the custom Catalyst expressions.
  *
  * Every kernel in plans/Expressions.scala ships two execution paths —
  * `nullSafeEval` (interpreted) and `doGenCode` (whole-stage codegen) —
  * and Spark silently falls back to the interpreted path whenever a plan
  * exceeds the generated-method budget (wholeStage off, 64 KB method
  * splits, nested-expression fallback). The two paths drifting apart is
  * the classic custom-expression bug: results then depend on which plan
  * shape a query happens to compile into. This spec runs one battery per
  * expression over the real fixtures under the default codegen session
  * AND under `spark.sql.codegen.factoryMode=NO_CODEGEN` +
  * `spark.sql.codegen.wholeStage=false`, asserting bit-identical rows.
  */
class CodegenParitySpec extends AnyFunSuite {

  import SparkTestSession.{spark, sfDir}

  /** Collect `df` under forced-interpreted evaluation, restoring the
    * session's codegen confs afterwards (the session is shared).
    */
  private def collectInterpreted(df: => DataFrame): Seq[String] = {
    val factory = "spark.sql.codegen.factoryMode"
    val whole = "spark.sql.codegen.wholeStage"
    val prevF = spark.conf.getOption(factory)
    val prevW = spark.conf.getOption(whole)
    spark.conf.set(factory, "NO_CODEGEN")
    spark.conf.set(whole, "false")
    try df.collect().map(_.toString).toSeq
    finally {
      prevF.fold(spark.conf.unset(factory))(spark.conf.set(factory, _))
      prevW.fold(spark.conf.unset(whole))(spark.conf.set(whole, _))
    }
  }

  private def assertParity(name: String)(df: => DataFrame): Unit = {
    val gen = df.collect().map(_.toString).toSeq
    val interp = collectInterpreted(df)
    assert(gen.nonEmpty, s"$name produced no rows")
    assert(gen == interp, s"$name: codegen and interpreted rows differ")
  }

  private lazy val docs =
    Tables.documents(spark, sfDir).orderBy("doc_id").limit(200)
  private lazy val embs =
    Tables.embeddings(spark, sfDir).orderBy("vec_id").limit(200)

  test("shingles / minhash signature: codegen == interpreted") {
    assertParity("shingles+minhash") {
      docs.select(col("doc_id"), Text.shingles(col("text"), 3).as("sh"),
        Text.minhashSig(Text.shingleSet(col("text"), 3), 16).as("sig"))
    }
  }

  test("simhash32: codegen == interpreted") {
    assertParity("simhash32") {
      docs.select(col("doc_id"), Text.simhash32(col("text")).as("h"))
    }
  }

  test("text profile (langPredict + qualityScore): codegen == interpreted") {
    assertParity("textProfile") {
      docs.select(col("doc_id"), Text.langPredict(col("text")).as("lang"),
        Text.qualityScore(col("text")).as("q"))
    }
  }

  test("char n-grams: codegen == interpreted") {
    assertParity("charNgrams") {
      docs.select(col("doc_id"),
        graft.plans.Expressions.charNgrams(Text.normalize(col("text")), 3)
          .as("grams"))
    }
  }

  test("scaled dot product / LSH codes: codegen == interpreted") {
    assertParity("dotScaled+lshCodes") {
      embs.select(col("vec_id"),
        Similarity.dotScaled(col("embedding"), col("embedding")).as("d"),
        Similarity.lshCodes(col("embedding"), 4, 8).as("codes"))
    }
  }

  test("sq8 encode/dequant kernel: codegen == interpreted == the " +
      "Column-form round-trip") {
    import graft.plans.Expressions
    val stats = Similarity.sq8Stats(embs)
    def kernel = embs.crossJoin(broadcast(stats))
      .select(col("vec_id"),
        Expressions.sq8Dequant(
          Expressions.sq8Encode(col("embedding"), col("mns"), col("mxs")),
          col("mns"), col("mxs")).as("dq"))
    assertParity("sq8Encode∘sq8Dequant")(kernel)
    // and the kernel round-trip is bit-identical to the interpreted
    // Column-form transform the n10 oracle was pinned against — the
    // kernel can replace it in the hot path without moving a result
    val viaColumns = embs.crossJoin(broadcast(stats))
      .select(col("vec_id"),
        Similarity.sq8Dequant(col("embedding"), col("mns"), col("mxs"))
          .as("dq"))
      .collect().map(_.toString).toSeq
    assert(kernel.collect().map(_.toString).toSeq == viaColumns)
  }

  test("pq_adc / pq_adc_cos / pack_bytes kernels: codegen == interpreted") {
    import graft.plans.Expressions
    // synthetic geometry: m=4 subspaces × K=8 dense codes, LUT literals,
    // codes derived from vec_id so every row exercises different slots
    val m = 4
    val k = 8
    val lutP = array((0 until m * k).map(i => lit((i * 7 + 3).toLong)): _*)
    val lutC = array((0 until m * k).map(i => lit((i * 11 + 5).toLong)): _*)
    assertParity("pqAdc+pqAdcCos+packBytes") {
      embs.select(col("vec_id"),
          Expressions.packBytes(array((0 until m).map(j =>
            pmod(col("vec_id") + lit(j), lit(k.toLong))): _*)).as("pc"))
        .select(col("vec_id"),
          Expressions.pqAdc(col("pc"), lutP, lutC).as("ar"),
          Expressions.pqAdcCos(col("pc"), lutP, lutC,
            col("vec_id") + lit(1L)).as("ac"))
    }
  }
}
