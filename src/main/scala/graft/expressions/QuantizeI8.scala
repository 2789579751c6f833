package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.BinaryExpression
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, LongType}

/** Symmetric int8 quantization of an embedding vector:
  * `quantize_i8(arr, scale)` → binary, where byte i =
  * clamp(round(arr[i] / scale), -127, 127); `scale <= 0` (the all-zero
  * vector) yields all-zero bytes.
  *
  * Rounding is literally `floor(x/scale + 0.5)` — the engine's one
  * portable rounding convention (same as `Fns.exactSumScaled`), so a
  * SQL oracle replays it exactly with `FLOOR(x/scale + 0.5)` and the
  * quantized codes are INTEGER-identical across engines. NOT
  * `Math.round`: the JDK special-cases boundary doubles (e.g.
  * `Math.round(0.49999999999999994) == 0` while
  * `floor(x + 0.5) == 1` there), which would open a one-code gap
  * between the engine and any SQL replay.
  *
  * Why int8 at 100 TB: the quantized corpus is 4× smaller than float32
  * in every broadcast, shuffle, and cache, and the coarse scoring pass
  * runs on integer multiplies ([[DotProductI8]]) — the standard
  * two-stage retrieval design (quantized scan → exact re-rank of the
  * surviving candidates).
  */
case class QuantizeI8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "quantize_i8"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"quantize_i8 expects (array<double>, double), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(a: Any, s: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val scale = s.asInstanceOf[Double]
    val n = arr.numElements()
    val out = new Array[Byte](n)
    if (scale > 0) {
      var i = 0
      while (i < n) {
        var r = Math.floor(arr.getDouble(i) / scale + 0.5).toLong
        if (r > 127L) r = 127L
        if (r < -127L) r = -127L
        out(i) = r.toByte
        i += 1
      }
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, s) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val r = ctx.freshName("r")
      val out = ctx.freshName("out")
      s"""
         |final int $n = $a.numElements();
         |final byte[] $out = new byte[$n];
         |if ($s > 0) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $r = (long) java.lang.Math.floor($a.getDouble($i) / $s + 0.5);
         |    if ($r > 127L) $r = 127L;
         |    if ($r < -127L) $r = -127L;
         |    $out[$i] = (byte) $r;
         |  }
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizeI8 =
    copy(left = newLeft, right = newRight)
}

/** Integer dot product over two int8-quantized vectors (binary
  * columns): Σ aᵢ·bᵢ over signed bytes, accumulated in long — exact
  * (max |term| = 127² and parquet arrays are far below 2⁵⁴ elements),
  * so the coarse scores that drive candidate selection are
  * bit-reproducible on any engine.
  */
case class DotProductI8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "dot_product_i8"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_product_i8 expects (binary, binary), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    val n = math.min(x.length, y.length)
    var acc = 0L
    var i = 0
    while (i < n) { acc += x(i).toLong * y(i).toLong; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($x.length, $y.length);
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((long) $x[$i]) * ((long) $y[$i]);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductI8 =
    copy(left = newLeft, right = newRight)
}
