package graft.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Kernel for [[PrefixGrams]]: given a doc's DISTINCT shingle strings,
  * emit the xxhash64 codes of its PPJoin prefix — the first
  * `|d| − ⌊t·|d|⌋ + 1` shingles under the global
  * (document-frequency asc, hash asc) canonical order.
  *
  * Hashing uses `XxHash64Function` with Spark's default seed 42, so the
  * codes are bit-identical to the `xxhash64(...)` column function that
  * built the document-frequency map (spec-asserted).
  */
object PrefixGramsKernel {
  def compute(sh: ArrayData, threshold: Double,
              df: java.util.HashMap[java.lang.Long, java.lang.Long]): ArrayData = {
    val m = sh.numElements()
    if (m == 0) return new GenericArrayData(new Array[Any](0))
    // L = m - floor(t*m) + 1, the one-longer-than-textbook prefix (see
    // ngramJaccardPairs — immune to IEEE t*m landing a hair high)
    val len = math.min(m, m - math.floor(threshold * m).toInt + 1)
    val hs = new Array[Long](m)
    val dfs = new Array[Long](m)
    var i = 0
    while (i < m) {
      val h = XxHash64Function.hash(sh.getUTF8String(i), StringType, 42L)
      hs(i) = h
      val d = df.get(h)
      // a gram absent from the df map can only mean the map was built
      // from a different corpus snapshot; rank it last and let the
      // exact verification decide — never throw on data skew
      dfs(i) = if (d == null) Long.MaxValue else d.longValue()
      i += 1
    }
    val idx = Array.range(0, m)
    // sort indices by (df asc, hash asc) — any one consistent total
    // order preserves PPJoin recall; df-asc minimizes candidates
    val boxed = idx.map(Integer.valueOf)
    java.util.Arrays.sort(boxed, new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = {
        val c = java.lang.Long.compare(dfs(a), dfs(b))
        if (c != 0) c else java.lang.Long.compare(hs(a), hs(b))
      }
    })
    val out = new Array[Any](len)
    i = 0
    while (i < len) { out(i) = hs(boxed(i)); i += 1 }
    new GenericArrayData(out)
  }
}

/** Map-side PPJoin prefix: `prefix_grams(sh)` → array<long> of the
  * doc's prefix gram hashes, with the global document-frequency table
  * carried as a BROADCAST java map instead of a joined DataFrame.
  *
  * Why: the DataFrame formulation of prefix selection (explode → join
  * df → window rank per doc → filter) shuffles the full exploded gram
  * stream twice (once to attach df, once to regroup by doc). When the
  * vocabulary fits one executor's memory, the whole selection is a
  * per-row kernel: zero shuffles of the gram stream, candidates come
  * straight off the persisted doc rows. `ngramJaccardPairs` exposes
  * this as the opt-in `mapSidePrefix = true` variant; the default
  * (`mapSidePrefix = false`) keeps the shuffle formulation, which
  * makes no assumption about vocabulary size.
  */
case class PrefixGrams(child: Expression, threshold: Double,
                       df: Broadcast[java.util.HashMap[java.lang.Long, java.lang.Long]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "prefix_grams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"prefix_grams expects array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(sh: Any): Any =
    PrefixGramsKernel.compute(sh.asInstanceOf[ArrayData], threshold, df.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("dfBc", df, classOf[Broadcast[_]].getName)
    nullSafeCodeGen(ctx, ev, sh =>
      s"""${ev.value} = graft.expressions.PrefixGramsKernel.compute($sh, $threshold,
         |  (java.util.HashMap) ((org.apache.spark.broadcast.Broadcast) $bc).value());
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PrefixGrams =
    copy(child = newChild)
}
