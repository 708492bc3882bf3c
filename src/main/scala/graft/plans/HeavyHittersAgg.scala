package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Bounded frequent-items summary: at most k (item → count) counters.
  * The Misra–Gries invariant — every counter undercounts its item by at
  * most the total decrement mass — is maintained by `add` and `absorb`.
  */
final class MgBuffer(val k: Int) extends Serializable {
  val counts: mutable.LongMap[Long] = mutable.LongMap.empty
  /** Total rows observed (exact — needed for the n/(k+1) error bound). */
  var n: Long = 0L

  /** Streaming MG update. The decrement-all branch runs at most once per
    * k+1 discarded increments, so total update work is O(n) amortized
    * regardless of how adversarial the stream is.
    */
  def add(item: Long): Unit = {
    n += 1
    val cur = counts.getOrElse(item, 0L)
    if (cur > 0L) counts.update(item, cur + 1)
    else if (counts.size < k) counts.update(item, 1L)
    else {
      // decrement every counter by 1, dropping zeros; the incoming item's
      // single increment is absorbed by the same decrement
      val keys = counts.keys.toArray
      var i = 0
      while (i < keys.length) {
        val v = counts(keys(i))
        if (v == 1L) counts.remove(keys(i)) else counts.update(keys(i), v - 1)
        i += 1
      }
    }
  }

  /** Mergeable-summaries combine (Agarwal et al., PODS'12 §3): sum the two
    * counter maps, then if more than k counters remain, subtract the
    * (k+1)-th largest count from all and drop non-positive ones. Keeps the
    * MG error bound additive across merges, so partial aggregation and
    * arbitrary shuffle merge orders preserve the guarantee: any item with
    * true count > n/(k+1) is still present in the final summary.
    */
  def absorb(o: MgBuffer): Unit = {
    n += o.n
    o.counts.foreach { case (key, v) =>
      counts.update(key, counts.getOrElse(key, 0L) + v)
    }
    if (counts.size > k) {
      val vals = counts.values.toArray
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - (k + 1)) // (k+1)-th largest
      val keys = counts.keys.toArray
      var i = 0
      while (i < keys.length) {
        val v = counts(keys(i))
        if (v - cut <= 0L) counts.remove(keys(i))
        else counts.update(keys(i), v - cut)
        i += 1
      }
    }
  }
}

/** Misra–Gries heavy hitters as ONE mergeable TypedImperativeAggregate:
  * `heavy_hitters(item, k)` returns the ≤k candidate items (sorted) whose
  * frequency MAY exceed n/(k+1) — every item whose true count exceeds
  * n/(k+1) is guaranteed present (the classic MG bound, preserved under
  * the PODS'12 merge above, so map-side partial aggregation is safe).
  *
  * Scale story: the shuffle carries one ≤k-entry summary per group
  * instead of one row per distinct item — the reference's "top holders /
  * hot pairs" screens (api/routes/tokens.js:1303-1332 ranks by grouped
  * counts) at 100 TB without materializing the full (group, item)
  * cardinality. Estimates are intentionally NOT emitted: MG counts depend
  * on partition merge order, so a deterministic caller (a23) re-counts
  * the ≤k candidates exactly with a broadcast semi-join and thresholds on
  * the exact counts — output is then partition-invariant and
  * oracle-checkable while the full-cardinality aggregate is never built.
  *
  * Items are LONGs (ids); hash strings first (xxhash64) like the rest of
  * the sketch family. The LongType contract is enforced by the builders:
  * both the Column wrappers below and the SQL registration
  * (GraftExtensions) wrap the item in Cast(_, LongType), so a mistyped
  * column fails Cast's ANALYSIS-time check — before r15 the SQL path
  * passed the raw child and a string column threw ClassCastException on
  * the executors inside `update` instead.
  */
case class HeavyHittersAgg(child: Expression, k: Int,
                           emitCounts: Boolean = false,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MgBuffer] {
  require(k > 0 && k <= 100000, s"heavy_hitters: k must be in [1,100000], got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false

  /** Default: the candidate items alone (partition-invariant input to an
    * exact recount — a23's oracle surface). `emitCounts`: the full
    * summary struct (n, entries(item, cnt)) — the streaming-slice form,
    * whose cnt values are merge-order-dependent LOWER BOUNDS (true count
    * ≥ cnt ≥ true − n/(k+1)) and therefore stay OFF the oracle surface.
    */
  override def dataType: DataType =
    if (emitCounts) HeavyHittersAgg.summaryType
    else ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(k)

  override def update(b: MgBuffer, input: InternalRow): MgBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Number].longValue)
    b
  }

  override def merge(b: MgBuffer, o: MgBuffer): MgBuffer = { b.absorb(o); b }

  override def eval(b: MgBuffer): Any = {
    val items = b.counts.keys.toArray
    java.util.Arrays.sort(items)
    if (!emitCounts) new GenericArrayData(items)
    else {
      val entries = items.map { it =>
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](it, b.counts(it)))
      }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](b.n, new GenericArrayData(entries.asInstanceOf[Array[Any]])))
    }
  }

  override def serialize(b: MgBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.k)
    out.writeLong(b.n)
    out.writeInt(b.counts.size)
    b.counts.foreach { case (key, v) => out.writeLong(key); out.writeLong(v) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new MgBuffer(in.readInt())
    b.n = in.readLong()
    var left = in.readInt()
    while (left > 0) {
      b.counts.update(in.readLong(), in.readLong())
      left -= 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHittersAgg =
    copy(child = newChildren(0))
  override def prettyName: String = "heavy_hitters"
}

object HeavyHittersAgg {
  val summaryType: StructType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("entries", ArrayType(StructType(Seq(
      StructField("item", LongType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
      containsNull = false), nullable = false)))

  /** Column wrapper: `heavyHitters(items, k)` → sorted array<long> of ≤k
    * candidates containing every item with true count > n/(k+1).
    */
  def heavyHitters(item: Column, k: Int): Column =
    Bridge.column(HeavyHittersAgg(Bridge.expression(item.cast("long")), k)
      .toAggregateExpression())

  /** Column wrapper: the full (n, entries(item, cnt)) summary — the
    * streaming-maintenance slice form (see Streams.heavyHittersMaintenance).
    */
  def heavyHittersSummary(item: Column, k: Int): Column =
    Bridge.column(HeavyHittersAgg(Bridge.expression(item.cast("long")), k,
      emitCounts = true).toAggregateExpression())
}
