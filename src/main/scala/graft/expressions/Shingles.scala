package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-row kernel for distinct word n-gram shingles, shared by the
  * interpreted and codegen paths so both produce byte-identical output.
  *
  * Replicates the composable chain
  * `array_distinct(transform(sequence(1, len-n+1), i ->
  * array_join(slice(toks, i, n), ' ')))` exactly:
  *  - windows in left-to-right order;
  *  - `concatWs` skips null elements like `array_join` does;
  *  - the LinkedHashSet keeps FIRST-occurrence order like
  *    `array_distinct`.
  * `concatWs` copies bytes out of the (possibly Unsafe, buffer-backed)
  * input array, so retained strings never alias scan buffers.
  */
object ShingleKernel {
  private val SEP = UTF8String.fromString(" ")

  def compute(toks: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    if (n < 1 || len < n) return new GenericArrayData(new Array[Any](0))
    val m = len - n + 1
    val seen = new java.util.LinkedHashSet[UTF8String](m * 2)
    val buf = new Array[UTF8String](n)
    var i = 0
    while (i < m) {
      var j = 0
      while (j < n) { buf(j) = toks.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(SEP, buf: _*))
      i += 1
    }
    new GenericArrayData(
      seen.toArray(new Array[AnyRef](seen.size)).asInstanceOf[Array[Any]])
  }

  /** ALL windows in order, repeats kept — the occurrence stream
    * (repetition statistics need counts, not the set).
    */
  def computeAll(toks: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    if (n < 1 || len < n) return new GenericArrayData(new Array[Any](0))
    val m = len - n + 1
    val out = new Array[Any](m)
    val buf = new Array[UTF8String](n)
    var i = 0
    while (i < m) {
      var j = 0
      while (j < n) { buf(j) = toks.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(SEP, buf: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  private val HEX = "0123456789abcdef".toCharArray

  /** Smallest md5 hex over all n-token windows, or null for short
    * docs. Equals `array_min(transform(…, md5(array_join(slice(…)))))`
    * exactly: the min is tracked on the 16 RAW digest bytes compared
    * unsigned — hex encoding maps each byte to two chars monotonically,
    * so unsigned-byte order IS lowercase-hex string order — and only
    * the winner is hex-encoded.
    */
  def minShingleMd5(toks: ArrayData, n: Int): UTF8String = {
    val len = toks.numElements()
    if (n < 1 || len < n) return null
    val m = len - n + 1
    val md = java.security.MessageDigest.getInstance("MD5")
    val buf = new Array[UTF8String](n)
    var best: Array[Byte] = null
    var i = 0
    while (i < m) {
      var j = 0
      while (j < n) { buf(j) = toks.getUTF8String(i + j); j += 1 }
      val d = md.digest(UTF8String.concatWs(SEP, buf: _*).getBytes)
      if (best == null || unsignedLess(d, best)) best = d
      i += 1
    }
    val hex = new Array[Char](32)
    var k = 0
    while (k < 16) {
      hex(2 * k) = HEX((best(k) >> 4) & 0xf)
      hex(2 * k + 1) = HEX(best(k) & 0xf)
      k += 1
    }
    UTF8String.fromString(new String(hex))
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }
}

/** Native Catalyst `shingles(toks, n)` → distinct n-gram strings.
  *
  * Why a custom Expression (SURVEY preference order (b)): the
  * higher-order-function chain it replaces runs on Spark's INTERPRETED
  * expression path — `transform`/`array_distinct` lambdas never enter
  * whole-stage codegen, and at one lambda invocation per token plus an
  * `array_join` tree walk per window the shingle construction was the
  * attributed root cause of the three slowest inventory queries
  * (q47/q67/q87 — round-4 verdict). This expression does the whole
  * row's work in one compiled kernel call from inside the codegen'd
  * consumer: no per-element closure dispatch, no intermediate
  * transform array, one hash-set pass for distinctness.
  *
  * Output (values AND order) is identical to the chain it replaces —
  * first-occurrence order, space-joined windows — so every downstream
  * digest/join/oracle hash is unchanged.
  */
case class Shingles(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"shingles expects (array<string>, int), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(toks: Any, n: Any): Any =
    ShingleKernel.compute(toks.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) =>
      s"${ev.value} = graft.expressions.ShingleKernel.compute($t, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Shingles =
    copy(left = newLeft, right = newRight)
}

/** `shingles_all(toks, n)` → every n-gram window in order, repeats
  * kept — the codegen replacement for the interpreted
  * `transform(sequence(…), i -> array_join(slice(…)))` occurrence
  * stream (repetition statistics, chunk windows).
  */
case class ShinglesAll(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles_all"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"shingles_all expects (array<string>, int), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(toks: Any, n: Any): Any =
    ShingleKernel.computeAll(toks.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) =>
      s"${ev.value} = graft.expressions.ShingleKernel.computeAll($t, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShinglesAll =
    copy(left = newLeft, right = newRight)
}

/** `min_shingle_md5(toks, n)` → smallest window-md5 hex, null for
  * short docs — the one-pass codegen form of the winnowing-lite
  * fingerprint (no intermediate shingle or digest array exists at
  * all; the interpreted chain materialized both per row).
  */
case class MinShingleMd5(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "min_shingle_md5"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"min_shingle_md5 expects (array<string>, int), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(toks: Any, n: Any): Any =
    ShingleKernel.minShingleMd5(toks.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) =>
      s"""${ev.value} = graft.expressions.ShingleKernel.minShingleMd5($t, $n);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinShingleMd5 =
    copy(left = newLeft, right = newRight)
}
