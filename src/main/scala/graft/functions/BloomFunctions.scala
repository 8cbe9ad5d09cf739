package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, element_at, lit, pmod, xxhash64}
import org.apache.spark.sql.types._

/** Bloom filter as an AGGREGATE function: `graft_bloom(key)` folds a
  * stream of bigint keys into an M-bit bitmap (Bloom 1970), returned as
  * `array<bigint>` of M/64 words. Membership probe for a key = all K
  * bit positions set — no false negatives, false-positive rate
  * ≈ (1 − e^{−Kn/M})^K.
  *
  * Two jobs at 100 TB scale, same sketch:
  *   - PER-FILE INDEX (`src_bloom_skipping`): `groupBy(input_file_name)`
  *     builds one 4 KiB bitmap per data file in a single stats scan; a
  *     point lookup on a non-sort column consults the bitmaps
  *     (metadata-sized) and opens only files that might contain the key —
  *     min/max stats can't prune a hashed-everywhere key, blooms can.
  *     This is Delta/Iceberg's bloom-filter-index planning model.
  *   - SEMI-JOIN REDUCTION (`rel_bloom_prefilter`): the build side folds
  *     to ONE 4 KiB row regardless of row count, broadcast to prefilter
  *     the probe side before the exact join — the runtime-filter pattern
  *     (Spark's own `runtime.bloomFilter` optimization, made explicit)
  *     for when the build side's key set is too big to broadcast as a
  *     hash relation but its bitmap is not.
  *
  * The bit positions come from Spark's own XXH64 chain, so the SQL side
  * recomputes them with the BUILT-IN `xxhash64(key, i)` (seed chaining:
  * hashLong(i, hashLong(key, 42))) — probes are plain Column arithmetic
  * over the returned array (element_at + shiftright + bit test), no UDF;
  * `mightContain` mirrors the same chain driver-side for metadata-only
  * planning decisions.
  */
case class BloomAgg(
    keyChild: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  import BloomFunctions.{BLOOM_K, BLOOM_M, BLOOM_WORDS}

  override def checkInputDataTypes(): TypeCheckResult =
    if (keyChild.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom requires a bigint key, got ${keyChild.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def children: Seq[Expression] = Seq(keyChild)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_bloom"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](BLOOM_WORDS)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val k = keyChild.eval(input)
    if (k != null) BloomFunctions.add(buf, k.asInstanceOf[Long])
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(buf.length * 8)
    val out = new DataOutputStream(bos)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    Array.fill(BLOOM_WORDS)(in.readLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(keyChild = newChildren(0))
}

object BloomFunctions {

  /** M = 32768 bits (512 longs = 4 KiB) with K = 6 probes: at n = 1000
    * keys per sketch that's ~33 bits/key → fpp ≈ 2e-4; even n = 5000
    * (6.5 bits/key) stays under 4%. Constant-size partials — the same
    * map-side-combine contract as graft_cms. */
  val BLOOM_M = 1 << 15
  val BLOOM_K = 6
  val BLOOM_WORDS: Int = BLOOM_M / 64

  private val fid = FunctionIdentifier("graft_bloom")

  private[functions] val bloomBuilder: Seq[Expression] => Expression = children => {
    require(children.size == 1,
      s"graft_bloom requires exactly 1 argument (key), got ${children.size}")
    BloomAgg(children(0)).toAggregateExpression()
  }

  /** Idempotently register `graft_bloom` (Column API + SQL). */
  def register(spark: SparkSession): Unit = synchronized {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(fid))
      reg.registerFunction(fid,
        new ExpressionInfo(classOf[BloomAgg].getName, "graft_bloom"),
        bloomBuilder)
  }

  /** The M-bit bloom bitmap of a bigint key column, as M/64 longs. */
  def bloomSketch(key: Column): Column = call_function("graft_bloom", key)

  /** Membership probe in pure Column arithmetic — all K bits set. Mirrors
    * the kernel's XXH64 chain exactly (the built-in `xxhash64(key, i)`
    * folds seed 42 over key then i); variable bit shifts go through the
    * SQL `shiftright`, which accepts a column shift amount (the
    * `functions.shiftright` helper only takes a literal). */
  def bloomMightContain(bloom: Column, key: Column): Column =
    (0 until BLOOM_K).map { i =>
      val bit = pmod(xxhash64(key, lit(i.toLong)), lit(BLOOM_M.toLong))
      val word = element_at(bloom, (bit / 64).cast("int") + lit(1))
      (call_function("shiftright", word, pmod(bit, lit(64L)).cast("int"))
        .bitwiseAND(lit(1L))) === lit(1L)
    }.reduce(_ && _)

  /** Set a key's K bits in a bitmap in place — the kernel `BloomAgg`
    * folds per row, also used directly by streaming state
    * (`StreamOps.bloomDedup`) where the bitmap lives in a GroupState. */
  def add(words: Array[Long], key: Long): Unit = {
    val base = XXH64.hashLong(key, 42L)
    var i = 0
    while (i < BLOOM_K) {
      val bit = java.lang.Math.floorMod(XXH64.hashLong(i.toLong, base), BLOOM_M.toLong).toInt
      words(bit >>> 6) |= (1L << (bit & 63))
      i += 1
    }
  }

  /** Driver-side probe over a collected bitmap — used for metadata-only
    * file pruning (the planner's side of `src_bloom_skipping`). */
  def mightContain(words: Array[Long], key: Long): Boolean = {
    val base = XXH64.hashLong(key, 42L)
    var i = 0
    while (i < BLOOM_K) {
      val bit = java.lang.Math.floorMod(XXH64.hashLong(i.toLong, base), BLOOM_M.toLong).toInt
      if ((words(bit >>> 6) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }
}
