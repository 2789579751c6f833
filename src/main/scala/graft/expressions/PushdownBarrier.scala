package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity expression whose ONLY effect is `deterministic = false` —
  * an optimizer pushdown barrier (round 14).
  *
  * Why it exists: Catalyst pushes FILTERS below projections and
  * repartitions by SUBSTITUTING the referenced alias with its defining
  * expression. For a heavy staged column (the per-doc regex split a
  * `spreadIfNarrow` exchange exists to parallelize), any filter on the
  * alias — a user guard like `size(toks) >= n`, a join key's inferred
  * IS NOT NULL, or the `size(..) > 0` filter InferFiltersFromGenerate
  * mints for a plain explode — re-runs the whole computation INSIDE
  * the narrow scan stage below the exchange (measured: 1.9 s 2-task
  * stages at sf1, the q190/q198 finding). Wrapping the staged
  * expression in this barrier makes such substitution illegal (the
  * optimizer may not duplicate or reorder non-deterministic
  * expressions), so the filter stays ABOVE the projection and the
  * exchange, and the computation runs exactly once at full
  * parallelism.
  *
  * Honesty of the flag: evaluation is a bit-for-bit pass-through of
  * the child — same value on every evaluation, retries included — so
  * the `deterministic = false` declaration is a conservative LIE TO
  * THE OPTIMIZER ONLY (it forgoes optimizations, never enables a wrong
  * one; Catalyst semantics require only that non-deterministic
  * expressions not be moved, which is exactly the effect wanted).
  * Nondeterministic expressions are only legal in Project/Filter — use
  * this in the staging projection, never inside aggregates or join
  * conditions.
  */
case class PushdownBarrier(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override lazy val deterministic: Boolean = false
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): PushdownBarrier =
    copy(child = newChild)
  override def prettyName: String = "pushdown_barrier"
}
