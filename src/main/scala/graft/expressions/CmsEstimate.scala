package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Probe a serialized count-min sketch for a key's estimated count:
  * `cms_estimate(sketch, key)` → long.
  *
  * Spark ships the SKETCH side (`count_min_sketch(col, eps, conf,
  * seed)` — mergeable, partition-order-independent: counter merges are
  * exact long additions) but no SQL surface to QUERY the result; this
  * expression closes that gap with Spark's own
  * `org.apache.spark.util.sketch.CountMinSketch` deserializer, so
  * estimates are bit-identical to the JVM API's.
  *
  * Evaluation is interpreted (CodegenFallback), which is fine where
  * probes belong: against a handful of candidate keys per sketch
  * (heavy-hitter verification, alerting thresholds), not per corpus
  * row. The deserialized sketch is cached per byte-array reference —
  * a broadcast sketch column repeats the SAME array instance across
  * rows, so the parse happens once per partition, not once per row.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cms_estimate expects (binary sketch, bigint key), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  // single-reference cache (bytes, parsed): expression instances are
  // per-task after closure deserialization, but if one were ever shared
  // a torn two-field cache could pair bytes with the WRONG sketch — one
  // immutable tuple can at worst be recomputed, never mismatched
  @transient private var cache: (Array[Byte], CountMinSketch) = _

  override def nullSafeEval(sk: Any, key: Any): Any = {
    val bytes = sk.asInstanceOf[Array[Byte]]
    val c = cache
    val sketch =
      if (c != null && (c._1 eq bytes)) c._2
      else {
        val parsed =
          CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
        cache = (bytes, parsed)
        parsed
      }
    sketch.estimateCount(key.asInstanceOf[Long])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}
