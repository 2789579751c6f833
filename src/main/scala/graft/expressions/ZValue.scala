package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Bit-interleave (Morton / Z-order) of 2-4 bucket-id columns.
  *
  * `z_value(bits, id0, id1, …)`: bit `b` of bucket id `c` lands at z-bit
  * `b * n + c`, so a range of z-values maps to a small hyper-rectangle
  * of bucket ids in EVERY dimension — the property that makes
  * `repartitionByRange(z)` + parquet min/max stats prune scans on any
  * clustered column, not just the leading one (the multi-dimensional
  * generalization of ORDER BY file clustering; same layout Delta Lake's
  * OPTIMIZE ZORDER BY produces).
  *
  * A custom Expression for the same reason as [[DotProduct]] (SURVEY
  * preference order (b)): the composable formulation is 2 × bits
  * shift/and/or terms — a ~120-node expression tree per row — while
  * this is one codegen'd loop. `bits` is the first child as a foldable
  * int literal so the function registers through the standard
  * FunctionRegistry path.
  */
case class ZValue(children: Seq[Expression]) extends Expression {

  private def ids: Seq[Expression] = children.tail
  private lazy val bits: Int =
    children.head.eval(InternalRow.empty).asInstanceOf[Int]

  override def nullable: Boolean = ids.exists(_.nullable)
  override def dataType: DataType = LongType
  override def prettyName: String = "z_value"

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.size < 3 || children.size > 5)
      TypeCheckResult.TypeCheckFailure(
        "z_value takes (bits literal, 2-4 bucket-id columns)")
    else if (!(children.head.foldable && children.head.dataType == IntegerType))
      TypeCheckResult.TypeCheckFailure("z_value bits must be an int literal")
    else if (!ids.forall(c => c.dataType == IntegerType || c.dataType == LongType))
      TypeCheckResult.TypeCheckFailure(
        s"z_value bucket ids must be int/bigint, got " +
          ids.map(_.dataType.simpleString).mkString(", "))
    else if (bits < 1 || bits * ids.size > 63)
      TypeCheckResult.TypeCheckFailure(
        s"z_value needs 1 <= bits * columns <= 63, got $bits * ${ids.size}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def eval(input: InternalRow): Any = {
    val n = ids.size
    var z = 0L
    var c = 0
    while (c < n) {
      val v = ids(c).eval(input)
      if (v == null) return null
      val x = v match { case i: Int => i.toLong; case l: Long => l }
      var b = 0
      while (b < bits) { z |= ((x >> b) & 1L) << (b * n + c); b += 1 }
      c += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = ids.size
    val evals = ids.map(_.genCode(ctx))
    val isNull = if (nullable) evals.map(_.isNull).mkString(" || ") else "false"
    val loops = evals.zipWithIndex.map { case (e, c) =>
      val b = ctx.freshName("b")
      s"""for (int $b = 0; $b < $bits; $b++) {
         |  ${ev.value} |= ((((long) ${e.value}) >> $b) & 1L) << ($b * $n + $c);
         |}""".stripMargin
    }.mkString("\n")
    ev.copy(code = code"""
      ${evals.map(_.code).mkString("\n")}
      boolean ${ev.isNull} = $isNull;
      long ${ev.value} = 0L;
      if (!${ev.isNull}) {
        $loops
      }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZValue = copy(children = newChildren)
}

/** Binary search over a sorted double-array literal:
  * `search_sorted(v, boundaries)` = number of boundary values <= v —
  * i.e. the quantile-bucket id of `v` given `boundaries` =
  * approxQuantile cut points. O(log bins) per row inside whole-stage
  * codegen, vs the O(bins)-deep CASE WHEN chain (or the non-codegen UDF
  * MLlib's Bucketizer uses) that a composable formulation needs.
  * Boundaries are builder-supplied literals and must be sorted,
  * distinct, and null-free.
  */
case class SearchSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "search_sorted"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DoubleType, ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"search_sorted expects (double, array<double>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(v: Any, bs: Any): Any = {
    val arr = bs.asInstanceOf[ArrayData]
    val x = v.asInstanceOf[Double]
    var lo = 0
    var hi = arr.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (arr.getDouble(mid) <= x) lo = mid + 1 else hi = mid
    }
    lo
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, bs) => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      s"""
         |int $lo = 0;
         |int $hi = $bs.numElements();
         |while ($lo < $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($bs.getDouble($mid) <= $v) { $lo = $mid + 1; } else { $hi = $mid; }
         |}
         |${ev.value} = $lo;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SearchSorted =
    copy(left = newLeft, right = newRight)
}
