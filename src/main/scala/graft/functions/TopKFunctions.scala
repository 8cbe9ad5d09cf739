package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** Exact top-k as an AGGREGATE function: `graft_topk(value, id, k)` keeps
  * the k largest (value, id) pairs per group, ordered by value DESC then id
  * ASC (deterministic tie-break), returned as `array<struct<value,id>>`.
  *
  * Why an aggregate and not a window: `row_number() OVER (PARTITION BY g
  * ORDER BY v) <= k` must shuffle EVERY row of every group and sort it
  * (WindowGroupLimit prunes per-partition, but rows still carry their full
  * payload through the exchange). A TypedImperativeAggregate participates
  * in partial aggregation: each map task reduces its slice to ≤ k pairs per
  * group BEFORE the shuffle, so the exchange moves O(groups × k) data
  * regardless of input size — the shape a 100 TB per-key top-k needs.
  *
  * The buffer is a bounded ArrayBuffer compacted at 4k entries (k is
  * small by contract), serialized as plain length-prefixed pairs.
  */
case class TopKBy(
    valueChild: Expression,
    idChild: Expression,
    kChild: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]] {

  private lazy val k: Int = kChild.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult =
    if (!kChild.foldable)
      TypeCheckResult.TypeCheckFailure("graft_topk: k must be a literal")
    else if (!Seq[DataType](ByteType, ShortType, IntegerType, LongType)
        .contains(kChild.dataType) || kChild.eval() == null)
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk: k must be a non-null integer literal, got " +
          s"${kChild.dataType.simpleString}")
    else if (valueChild.dataType != DoubleType || idChild.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk requires (double, bigint, int), got " +
          s"(${valueChild.dataType.simpleString}, ${idChild.dataType.simpleString})")
    else TypeCheckResult.TypeCheckSuccess

  override def children: Seq[Expression] = Seq(valueChild, idChild, kChild)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("value", DoubleType), StructField("id", LongType))), containsNull = false)
  override def prettyName: String = "graft_topk"

  // value DESC, id ASC — via Double.compare's TOTAL order (NaN greatest,
  // deterministic): a naive `>`-based comparator violates strict weak
  // ordering when NaN appears, which TimSort detects and throws on
  private def lt(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(b._1, a._1)
    c < 0 || (c == 0 && a._2 < b._2)
  }

  private def compact(buf: ArrayBuffer[(Double, Long)]): Unit =
    if (buf.length > k) {
      val kept = buf.sortWith(lt).take(k)
      buf.clear()
      buf ++= kept
    }

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    ArrayBuffer.empty

  override def update(buf: ArrayBuffer[(Double, Long)],
                      input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val v = valueChild.eval(input)
    val id = idChild.eval(input)
    if (v != null && id != null) {
      buf += ((v.asInstanceOf[Double], id.asInstanceOf[Long]))
      if (buf.length >= 4 * math.max(k, 1)) compact(buf)
    }
    buf
  }

  override def merge(b1: ArrayBuffer[(Double, Long)],
                     b2: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    b1 ++= b2
    compact(b1)
    b1
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any = {
    compact(buf)
    new GenericArrayData(buf.sortWith(lt).take(k)
      .map(p => InternalRow(p._1, p._2)).toArray[Any])
  }

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    compact(buf)
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (v, id) => out.writeDouble(v); out.writeLong(id) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < n) { buf += ((in.readDouble(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKBy =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(valueChild = newChildren(0), idChild = newChildren(1),
      kChild = newChildren(2))
}

object TopKFunctions {

  private val fid = FunctionIdentifier("graft_topk")

  /** Shared SQL builder (used by register() and GraftExtensions) with an
    * arity check. */
  private[functions] val topkBuilder: Seq[Expression] => Expression = children => {
    require(children.size == 3,
      s"graft_topk requires exactly 3 arguments (value, id, k), got ${children.size}")
    TopKBy(children(0), children(1), children(2)).toAggregateExpression()
  }

  /** Idempotently register `graft_topk` (Column API + SQL). */
  def register(spark: SparkSession): Unit = synchronized {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(fid))
      reg.registerFunction(fid,
        new ExpressionInfo(classOf[TopKBy].getName, "graft_topk"),
        topkBuilder)
  }

  /** Top-k (value, id) pairs per group, value DESC / id ASC. */
  def topkBy(value: Column, id: Column, k: Int): Column =
    call_function("graft_topk", value, id,
      org.apache.spark.sql.functions.lit(k))
}
