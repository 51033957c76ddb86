package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Gear rolling-hash content-defined chunking — the production CDC
  * boundary kernel (Gear hashing: Zhang et al. 2015 "Ddelta"; the
  * FastCDC family builds on the same per-byte table-lookup + shift
  * recurrence). One table lookup, one shift and one add per
  * character, against the md5-per-character-position contract the
  * first CDC operator shipped with (one full md5 per position —
  * correct, linear, ~100x the constant factor). The reference's one
  * performance idea is exactly this hot-loop specialization
  * (avro_decoder.hpp:87-161 burns the decode path into compile-time
  * tables); this is the same move for the chunking pass.
  *
  * Boundary contract (engine-portable by construction):
  *   h_0 = 0;  h_i = (h_{i-1} << 1) + GEAR[cp_i & 0xFF]   (mod 2^64)
  * over code points cp_1..cp_len, and position i (1-indexed, counted
  * in code points to match SQL `substring`) is a chunk boundary iff
  *   minPos <= i <= len-1  and  (h_i & (2^maskBits - 1)) == 0.
  * The final chunk always ends at len (same rule as the md5 form).
  *
  * The shift recurrence gives the windowed-equivalence property the
  * oracle replay depends on: carries in two's-complement addition
  * only propagate upward, so the low `maskBits` bits of h_i depend
  * on exactly the last `maskBits` code points —
  *   h_i mod 2^b  ==  (sum_{j=0}^{b-1} GEAR[cp_{i-j}] << j) mod 2^b.
  * DuckDB therefore replays the boundary rule as a per-position
  * windowed sum over a 256-entry table of GEAR & (2^b - 1) literals
  * (the knn_lsh inline-plane-constant technique) with no 64-bit
  * rolling state, while the Spark kernel runs the one-lookup-per-
  * character rolling form. `GearCdcSpec` pins rolling == windowed on
  * planted and property-generated inputs.
  *
  * With maskBits = 4, P(boundary) = 1/16 per eligible position —
  * the same expected chunk length (~16 chars at fixture scale) as
  * the md5-mask-'0' contract, so the two operators are drop-in
  * siblings with different (but equally content-defined) boundaries.
  */
object GearCdc {

  /** splitmix64 (Steele et al. 2014) — the standard public-domain
    * 64-bit finalizer; gives the 256 gear constants a fixed,
    * seed-derived, documented derivation instead of a magic blob. */
  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** The 256-entry gear table, GEAR[b] = splitmix64(b). */
  val TABLE: Array[Long] = Array.tabulate(256)(i => splitmix64(i.toLong))

  /** The gear table reduced mod 2^maskBits, as a SQL list literal —
    * everything the windowed oracle replay needs (low bits of the
    * shifted sum never see the high bits of any table entry). */
  def lowBitsSqlList(maskBits: Int): String = {
    require(maskBits >= 1 && maskBits <= 32)
    val mask = (1L << maskBits) - 1
    TABLE.map(_ & mask).mkString("[", ",", "]")
  }

  /** The rolling-hash boundary pass — shared verbatim by the
    * interpreted eval and the generated code (the codegen emits a
    * call to this static method: the expression stays inside the
    * whole-stage-codegen projection with no UDF ser/de, and the hot
    * loop exists exactly once). Returns the boundary positions
    * (code-point-indexed chunk ENDS) with the final `len` appended —
    * the `__b` array the chunk-slicing SQL consumes. */
  def boundaries(text: UTF8String, minPos: Int, maskBits: Int): ArrayData = {
    val s = text.toString
    val mask = (1L << maskBits) - 1
    val nChars = s.length
    // worst case every eligible position is a boundary; exact-size
    // second pass would re-run the hash, so take the small overshoot
    val buf = new Array[Int](nChars + 1)
    var nOut = 0
    val totalCp = s.codePointCount(0, nChars)
    var h = 0L
    var ci = 0
    var pos = 0
    while (ci < nChars) {
      val cp = s.codePointAt(ci)
      ci += Character.charCount(cp)
      pos += 1
      h = (h << 1) + TABLE(cp & 0xFF)
      if (pos >= minPos && pos < totalCp && (h & mask) == 0L) {
        buf(nOut) = pos; nOut += 1
      }
    }
    buf(nOut) = totalCp; nOut += 1
    new GenericArrayData(java.util.Arrays.copyOf(buf, nOut))
  }

  /** Column API over [[GearBoundaries]]. */
  def boundariesCol(text: Column, minPos: Int = 16, maskBits: Int = 4): Column =
    org.apache.spark.sql.graftglue.Bridge.column(
      GearBoundaries(org.apache.spark.sql.graftglue.Bridge.expression(text),
        minPos, maskBits))

  /** The BYTE-level rolling pass — the storage-dedup proper form
    * (LBFS/Gear chunk raw bytes, not decoded text): identical
    * recurrence over `bytes(i) & 0xFF` with positions counted in
    * bytes. On pure-ASCII input it coincides with [[boundaries]]
    * exactly (one byte per code point — pinned in GearCdcSpec). */
  def binaryBoundaries(bytes: Array[Byte], minPos: Int,
                       maskBits: Int): ArrayData = {
    val mask = (1L << maskBits) - 1
    val n = bytes.length
    val buf = new Array[Int](n + 1)
    var nOut = 0
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h << 1) + TABLE(bytes(i) & 0xFF)
      val pos = i + 1
      if (pos >= minPos && pos < n && (h & mask) == 0L) {
        buf(nOut) = pos; nOut += 1
      }
      i += 1
    }
    buf(nOut) = n; nOut += 1
    new GenericArrayData(java.util.Arrays.copyOf(buf, nOut))
  }

  /** Column API over [[GearBinaryBoundaries]]. */
  def binaryBoundariesCol(bin: Column, minPos: Int = 16,
                          maskBits: Int = 4): Column =
    org.apache.spark.sql.graftglue.Bridge.column(
      GearBinaryBoundaries(
        org.apache.spark.sql.graftglue.Bridge.expression(bin),
        minPos, maskBits))
}

/** Catalyst expression for [[GearCdc.boundaries]]: string -> array<int>
  * of CDC chunk ends. Parameters live in the case class, so two
  * independently-built identical plans compare `sameResult` (the
  * PersistSlots / exchange-reuse requirement every graft kernel
  * meets — see SignSignature's Seq-not-Array note). */
case class GearBoundaries(child: Expression, minPos: Int, maskBits: Int)
  extends UnaryExpression {

  require(minPos >= 1, s"gear_boundaries: minPos must be >= 1, got $minPos")
  require(maskBits >= 1 && maskBits <= 32,
    s"gear_boundaries: maskBits must be in [1, 32], got $maskBits")
  // the windowed oracle replay is only exact when every tested
  // position has maskBits predecessors — guaranteed by minPos
  require(minPos >= maskBits,
    s"gear_boundaries: minPos ($minPos) must be >= maskBits ($maskBits) " +
      "so the windowed SQL replay matches the rolling form")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gear_boundaries requires a string argument, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    GearCdc.boundaries(input.asInstanceOf[UTF8String], minPos, maskBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.GearCdc.boundaries($c, $minPos, $maskBits);")

  override protected def withNewChildInternal(newChild: Expression): GearBoundaries =
    copy(child = newChild)
}

/** [[GearBoundaries]]' binary twin: raw-byte CDC chunk ends of a
  * `binary` column — the storage-layer form that chunks encoded
  * payloads (media bytes, serialized records) without any text
  * decode. Same Gear table, same windowed-equivalence property (the
  * oracle replays boundaries over `hex(payload)` byte slices). */
case class GearBinaryBoundaries(child: Expression, minPos: Int, maskBits: Int)
  extends UnaryExpression {

  require(minPos >= 1, s"gear_bin_boundaries: minPos must be >= 1, got $minPos")
  require(maskBits >= 1 && maskBits <= 32,
    s"gear_bin_boundaries: maskBits must be in [1, 32], got $maskBits")
  require(minPos >= maskBits,
    s"gear_bin_boundaries: minPos ($minPos) must be >= maskBits ($maskBits) " +
      "so the windowed SQL replay matches the rolling form")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gear_bin_boundaries requires a binary argument, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    GearCdc.binaryBoundaries(input.asInstanceOf[Array[Byte]], minPos, maskBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.GearCdc.binaryBoundaries($c, $minPos, $maskBits);")

  override protected def withNewChildInternal(newChild: Expression): GearBinaryBoundaries =
    copy(child = newChild)
}
