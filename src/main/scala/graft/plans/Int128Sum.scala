package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Exact 128-bit integer SUM over a LONG column, as a
  * [[DeclarativeAggregate]] of pure long arithmetic — the fast exact
  * path for fixed-point money sums (`Core.xsum`).
  *
  * Why it exists: the repo's cross-engine exactness contract needs
  * order-independent sums (an IEEE double sum re-associates across
  * partitionings), and `dsum`'s `SUM(CAST(x AS DECIMAL(38,6)))` delivers
  * that — but Spark's wide-decimal aggregation runs on boxed BigDecimal
  * (every row pays a double→BigDecimal conversion and an object add),
  * measured as the ENTIRE j1 marginal over its DuckDB twin
  * (tools/J1Audit: the star join's marginal is ~at parity; the decimal
  * sum adds +0.4 s per 9 units vs +0.07 for a double sum). DuckDB's
  * twin decimal sum is a vectorized int128 — this aggregate is the same
  * idea in Tungsten terms: the accumulator is TWO unboxed longs
  * (lo, hi) living in the codegen'd hash-aggregate row, updated with
  * carry-propagating long adds, no allocation anywhere.
  *
  * All arithmetic uses `EvalMode.LEGACY` adds: the carry formula NEEDS
  * wrapping two's-complement semantics (the 128-bit value is exact even
  * though each 64-bit limb wraps), and under Spark 4's ANSI default a
  * wrapping add would throw instead.
  *
  * Overflow: 2^127 ≈ 1.7e38 — beyond any physical corpus (6e11 rows of
  * 1e9-unit values is 6e20). The double conversion at evaluate is exact
  * whenever the total fits a signed 64-bit limb (every measured SF and
  * any realistic money total ≤ 9.2e14 in 4dp units); above that the
  * hi·2^64 + lo composition can double-round vs a correctly-rounded
  * single conversion — same class of tail as casting any >2^53 integer
  * to double.
  */
case class Int128Sum(child: Expression) extends DeclarativeAggregate
    with UnaryLike[Expression] {

  override def dataType: DataType = DoubleType
  // SUM semantics: null inputs are skipped and an all-null/empty group
  // yields NULL (load-bearing under pivot, where a missing bucket
  // aggregates only nulls — x6's DuckDB FILTER twin returns NULL there)
  override def nullable: Boolean = true
  override def prettyName: String = "int128_sum"

  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val cnt =
    AttributeReference("cnt", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(lo, hi, cnt)
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(0L))

  private def addL(a: Expression, b: Expression): Expression =
    Add(a, b, EvalMode.LEGACY)

  /** Carry-out of the unsigned 64-bit add a + b (= s): the classic
    * bit formula ((a & b) | ((a | b) & ~s)) >>> 63 — 1 iff the unsigned
    * sum wrapped.
    */
  private def carry(a: Expression, b: Expression, s: Expression)
      : Expression =
    ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(a, b), BitwiseAnd(BitwiseOr(a, b),
        BitwiseNot(s))),
      Literal(63))

  /** (newLo, newHi) of the 128-bit add (lo,hi) + (vLo,vHi). */
  private def add128(lo0: Expression, hi0: Expression,
                     vLo: Expression, vHi: Expression)
      : (Expression, Expression) = {
    val nLo = addL(lo0, vLo)
    (nLo, addL(addL(hi0, vHi), carry(lo0, vLo, nLo)))
  }

  override lazy val updateExpressions: Seq[Expression] = {
    // NULL inputs are SKIPPED (SUM semantics): the accumulating add
    // still runs on a coalesced 0 (cheaper than branching the carry
    // chain), but cnt only advances on non-null rows, so an all-null
    // group keeps cnt = 0 and evaluates NULL below
    val v = Coalesce(Seq(child, Literal(0L)))
    // sign-extend the 64-bit input to 128 bits: vHi = v >> 63 (0 or -1)
    val (nLo, nHi) = add128(lo, hi, v, ShiftRight(v, Literal(63)))
    Seq(nLo, nHi,
      addL(cnt, If(IsNull(child), Literal(0L), Literal(1L))))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val (nLo, nHi) = add128(lo.left, hi.left, lo.right, hi.right)
    Seq(nLo, nHi, addL(cnt.left, cnt.right))
  }

  /** Double of the 128-bit total; NULL when no non-null input reached
    * the group. Exact (single rounding) when the value fits a signed
    * long — i.e. hi is just lo's sign extension; the wide branch
    * composes hi·2^64 + unsigned(lo).
    */
  override lazy val evaluateExpression: Expression = {
    val two64 = Literal(1.8446744073709552e19) // 2^64
    val loD = Cast(lo, DoubleType)
    val unsignedLoD = If(LessThan(lo, Literal(0L)),
      Add(loD, two64, EvalMode.LEGACY), loD)
    val total = If(EqualTo(hi, ShiftRight(lo, Literal(63))),
      loD,
      Add(Multiply(Cast(hi, DoubleType), two64, EvalMode.LEGACY),
        unsignedLoD, EvalMode.LEGACY))
    If(EqualTo(cnt, Literal(0L)), Literal(null, DoubleType), total)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Int128Sum = copy(child = newChild)
}

object Int128Sum {
  /** Column wrapper: exact 128-bit sum of a LONG column, as DOUBLE. */
  def int128Sum(c: Column): Column =
    Bridge.column(Int128Sum(Bridge.expression(c)).toAggregateExpression())
}
