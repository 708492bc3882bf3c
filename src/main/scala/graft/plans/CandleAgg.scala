package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Mutable single-pass candle accumulator. Mirrors the semantics of the
  * six-aggregate form exactly: open/close = price at min/max `ord`
  * (null-ord rows skipped), high/low over non-null prices, volume as an
  * exact Decimal(38,6) sum of per-row HALF_UP-rounded inputs (== dsum),
  * trade_count counts every row.
  */
final class CandleBuffer extends Serializable {
  var n: Long = 0L
  var hasPrice: Boolean = false
  var openOrd: Long = 0L
  var open: Double = 0d
  var closeOrd: Long = 0L
  var close: Double = 0d
  var high: Double = 0d
  var low: Double = 0d
  var hasVol: Boolean = false
  var vol: java.math.BigDecimal = java.math.BigDecimal.ZERO
}

/** SURVEY §4's optional custom-Catalyst candidate (a): the OHLCV candle as
  * ONE TypedImperativeAggregate instead of six independent aggregate
  * buffers (min_by/max/min/max_by/sum/count). Same single hash-aggregate
  * shuffle shape with map-side partial aggregation — update/merge are the
  * partial/final phases — but one buffer allocation and one state walk
  * per row. Output struct: (open, high, low, close, volume, trade_count).
  * The classic six-aggregate form in operators/Ohlcv delegates here; the
  * DuckDB oracles for every candle query prove value-equality.
  */
case class CandleAggExpr(ord: Expression, price: Expression, vol: Expression,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CandleBuffer] {

  override def children: Seq[Expression] = Seq(ord, price, vol)
  override def nullable: Boolean = true
  override def dataType: DataType = CandleAggExpr.outType

  override def createAggregationBuffer(): CandleBuffer = new CandleBuffer

  override def update(b: CandleBuffer, input: InternalRow): CandleBuffer = {
    b.n += 1
    val o = ord.eval(input)
    val p = price.eval(input)
    if (o != null && p != null) {
      val ov = o.asInstanceOf[Number].longValue
      val pv = p.asInstanceOf[Number].doubleValue
      if (!b.hasPrice) {
        b.hasPrice = true
        b.openOrd = ov; b.open = pv
        b.closeOrd = ov; b.close = pv
        b.high = pv; b.low = pv
      } else {
        if (ov < b.openOrd) { b.openOrd = ov; b.open = pv }
        if (ov > b.closeOrd) { b.closeOrd = ov; b.close = pv }
        if (pv > b.high) b.high = pv
        if (pv < b.low) b.low = pv
      }
    }
    val v = vol.eval(input)
    if (v != null) {
      val vd = new java.math.BigDecimal(v.asInstanceOf[Number].doubleValue)
        .setScale(6, java.math.RoundingMode.HALF_UP)
      b.vol = b.vol.add(vd)
      b.hasVol = true
    }
    b
  }

  override def merge(b: CandleBuffer, o: CandleBuffer): CandleBuffer = {
    b.n += o.n
    if (o.hasPrice) {
      if (!b.hasPrice) {
        b.hasPrice = true
        b.openOrd = o.openOrd; b.open = o.open
        b.closeOrd = o.closeOrd; b.close = o.close
        b.high = o.high; b.low = o.low
      } else {
        if (o.openOrd < b.openOrd) { b.openOrd = o.openOrd; b.open = o.open }
        if (o.closeOrd > b.closeOrd) { b.closeOrd = o.closeOrd; b.close = o.close }
        if (o.high > b.high) b.high = o.high
        if (o.low < b.low) b.low = o.low
      }
    }
    if (o.hasVol) {
      b.vol = b.vol.add(o.vol)
      b.hasVol = true
    }
    b
  }

  override def eval(b: CandleBuffer): Any = {
    val open = if (b.hasPrice) b.open else null
    val high = if (b.hasPrice) b.high else null
    val low = if (b.hasPrice) b.low else null
    val close = if (b.hasPrice) b.close else null
    val v = if (b.hasVol) b.vol.doubleValue else null
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](open, high, low, close, v, b.n))
  }

  override def serialize(b: CandleBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(b.n)
    out.writeBoolean(b.hasPrice)
    out.writeLong(b.openOrd); out.writeDouble(b.open)
    out.writeLong(b.closeOrd); out.writeDouble(b.close)
    out.writeDouble(b.high); out.writeDouble(b.low)
    out.writeBoolean(b.hasVol)
    out.writeUTF(b.vol.toString)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CandleBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new CandleBuffer
    b.n = in.readLong()
    b.hasPrice = in.readBoolean()
    b.openOrd = in.readLong(); b.open = in.readDouble()
    b.closeOrd = in.readLong(); b.close = in.readDouble()
    b.high = in.readDouble(); b.low = in.readDouble()
    b.hasVol = in.readBoolean()
    b.vol = new java.math.BigDecimal(in.readUTF())
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): CandleAggExpr =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CandleAggExpr =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CandleAggExpr =
    copy(ord = newChildren(0), price = newChildren(1), vol = newChildren(2))
  override def prettyName: String = "candle_agg"
}

object CandleAggExpr {
  val outType: StructType = StructType(Seq(
    StructField("open", DoubleType),
    StructField("high", DoubleType),
    StructField("low", DoubleType),
    StructField("close", DoubleType),
    StructField("volume", DoubleType),
    StructField("trade_count", LongType)))

  /** Column wrapper: one-buffer candle aggregate. */
  def candleAgg(ord: Column, price: Column, vol: Column): Column =
    Bridge.column(CandleAggExpr(Bridge.expression(ord),
      Bridge.expression(price), Bridge.expression(vol))
      .toAggregateExpression())
}
