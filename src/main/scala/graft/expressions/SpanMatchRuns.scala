package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}

/** Kernel for [[SpanMatchRuns]]: the diagonal-run replacement for
  * per-candidate [[SpanMatchLenKernel]] invocations in the
  * maximal-match dedup family. A maximal cross-doc match of length m
  * spawns m−minLen+1 aligned anchor candidates, ALL on one
  * (doc_a, doc_b, pos_a−pos_b) diagonal at consecutive positions —
  * so instead of attaching both token arrays to every candidate and
  * verifying each (only the leftmost survives the head check), the
  * operator groups candidates per diagonal and this kernel scans the
  * grouped span ONCE, emitting every maximal match in it.
  *
  * Given the two token arrays, the 1-based positions of the
  * diagonal's FIRST candidate (`loA`, `loB`), and the candidate span
  * (`hiA − loA + minLen` token positions), it finds maximal
  * equal-token runs in the span and returns one (pos_a, match_len)
  * struct per run of length ≥ minLen. Token equality decides
  * everything, which is why the rewrite is EXACT:
  *
  *   - every true maximal match's start position carries a true-equal
  *     window, whose hashes are then equal BY DETERMINISM, so the
  *     start is always a candidate and always inside the grouped
  *     span — spurious (hash-collision) candidates can only widen
  *     the scanned span, never suppress or shift a match;
  *   - a run beginning after the scan start is left-maximal by
  *     construction (the preceding comparison failed); the run
  *     beginning AT the scan start re-checks the preceding tokens
  *     explicitly, which in the uncapped operator can never fire (a
  *     left-extending equal window would itself be a candidate at
  *     loA−1, contradicting loA = min) but under the hot-anchor
  *     sub-bucket cap reproduces the documented drop-the-straddling-
  *     match semantics of the per-candidate head check — lost, not
  *     truncated;
  *   - extension runs to the true mismatch (or array end), exactly
  *     the per-candidate extend-while-equal.
  *
  * Cost: one O(span + match extension) pass per DIAGONAL instead of
  * one O(minLen..match_len) pass per CANDIDATE — and, the dominant
  * saving, the token arrays join once per diagonal instead of once
  * per candidate (sf1 measured 86,630 candidates for 2,210
  * diagonals).
  */
object SpanMatchRunsKernel {
  val OutType: DataType = ArrayType(StructType(Seq(
    StructField("pos_a", IntegerType, nullable = false),
    StructField("match_len", LongType, nullable = false))),
    containsNull = false)

  def compute(a: ArrayData, loA: Int, b: ArrayData, loB: Int,
              span: Int, minLen: Int): ArrayData = {
    val la = a.numElements()
    val lb = b.numElements()
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    if (minLen >= 1 && loA >= 1 && loB >= 1) {
      var k = 0
      while (k < span && loA - 1 + k < la && loB - 1 + k < lb) {
        if (a.getUTF8String(loA - 1 + k).equals(b.getUTF8String(loB - 1 + k))) {
          var e = 1
          while (loA - 1 + k + e < la && loB - 1 + k + e < lb &&
            a.getUTF8String(loA - 1 + k + e)
              .equals(b.getUTF8String(loB - 1 + k + e))) e += 1
          val leftMaximal = k > 0 || loA < 2 || loB < 2 ||
            !a.getUTF8String(loA - 2).equals(b.getUTF8String(loB - 2))
          if (e >= minLen && leftMaximal)
            out += new GenericInternalRow(Array[Any](loA + k, e.toLong))
          k += e + 1
        } else k += 1
      }
    }
    new GenericArrayData(out.toArray)
  }
}

/** `span_match_runs(toksA, loA, toksB, loB, span)` with the window
  * length carried as a construction parameter (the [[SpanMatchLen]]
  * idiom; built via GraftColumnBridge, not the string registry).
  * Returns array<struct<pos_a int, match_len bigint>> — every maximal
  * match in the diagonal span; see [[SpanMatchRunsKernel]].
  */
case class SpanMatchRuns(ta: Expression, loA: Expression, tb: Expression,
                         loB: Expression, span: Expression, minLen: Int)
    extends Expression {

  override def children: Seq[Expression] = Seq(ta, loA, tb, loB, span)
  override def nullable: Boolean = children.exists(_.nullable)
  override def dataType: DataType = SpanMatchRunsKernel.OutType
  override def prettyName: String = "span_match_runs"

  override def checkInputDataTypes(): TypeCheckResult =
    (ta.dataType, loA.dataType, tb.dataType, loB.dataType, span.dataType) match {
      case (ArrayType(StringType, _), IntegerType,
            ArrayType(StringType, _), IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "span_match_runs expects (array<string>, int, array<string>, " +
          s"int, int), got ${children.map(_.dataType.simpleString)}")
    }

  override def eval(input: InternalRow): Any = {
    val a = ta.eval(input)
    val pa = loA.eval(input)
    val b = tb.eval(input)
    val pb = loB.eval(input)
    val sp = span.eval(input)
    if (a == null || pa == null || b == null || pb == null || sp == null) null
    else SpanMatchRunsKernel.compute(a.asInstanceOf[ArrayData],
      pa.asInstanceOf[Int], b.asInstanceOf[ArrayData],
      pb.asInstanceOf[Int], sp.asInstanceOf[Int], minLen)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evs = children.map(_.genCode(ctx))
    val javaType = CodeGenerator.javaType(dataType)
    val nullCheck =
      if (nullable) evs.map(e => s"${e.isNull}").mkString(" || ") else "false"
    val childCode = evs.map(_.code.toString).mkString("\n")
    ev.copy(code = code"""
      $childCode
      boolean ${ev.isNull} = $nullCheck;
      $javaType ${ev.value} = null;
      if (!${ev.isNull}) {
        ${ev.value} = graft.expressions.SpanMatchRunsKernel.compute(
          ${evs(0).value}, ${evs(1).value}, ${evs(2).value},
          ${evs(3).value}, ${evs(4).value}, $minLen);
      }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SpanMatchRuns =
    copy(ta = newChildren(0), loA = newChildren(1), tb = newChildren(2),
      loB = newChildren(3), span = newChildren(4))
}
