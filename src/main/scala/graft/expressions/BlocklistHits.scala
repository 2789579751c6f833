package graft.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Serializable Aho–Corasick automaton over a categorized term list —
  * the multi-pattern matcher behind [[graft.operators.Blocklist]].
  *
  * Why an automaton and not N regexes: the bad-words / URL-blocklist
  * filter a curation pipeline runs before quality scoring carries
  * 10³–10⁴ terms; N separate `rlike`/`replace` passes cost
  * O(N · doc_len) per document, where one AC scan costs
  * O(doc_len + matches) whatever N is. The automaton is built ONCE on
  * the driver (O(Σ term lengths)), broadcast, and referenced by the
  * codegen'd [[BlocklistHits]] expression — the [[PrefixGrams]]
  * broadcast-state idiom.
  *
  * Matching semantics (pinned by the scalacheck parity spec and the
  * q183 oracle): EVERY occurrence of every term counts — overlapping
  * occurrences, occurrences inside longer words, and terms that are
  * suffixes of other terms all count, per (term, category) row (a
  * term listed under two categories counts for both). Matching is
  * case-SENSITIVE on char content: the caller decides folding (the
  * operator lowercases both terms and text so the DuckDB oracle can
  * mirror with `LOWER`).
  *
  * Construction: classic goto/fail BFS; per-node match counts are
  * pre-aggregated through the fail chain at build time (node's counts
  * += fail-target's counts, in BFS order), so the scan never walks
  * suffix links for output — one sparse per-category count array per
  * node, added on arrival.
  */
final class AhoCorasick private (
    val categories: Array[String],
    edges: Array[java.util.HashMap[Character, Integer]],
    fail: Array[Int],
    outCat: Array[Array[Int]],
    outCnt: Array[Array[Long]],
    outLens: Array[Array[Int]]) extends Serializable {

  def nCategories: Int = categories.length

  /** Per-category occurrence counts of all terms in `text` — one
    * left-to-right scan, O(len + fail chases) amortized.
    */
  def countHits(text: UTF8String): Array[Long] = {
    val out = new Array[Long](categories.length)
    val s = text.toString
    val n = s.length
    var cur = 0
    var i = 0
    while (i < n) {
      val ch = Character.valueOf(s.charAt(i))
      var nxt = edges(cur).get(ch)
      while (cur != 0 && nxt == null) {
        cur = fail(cur)
        nxt = edges(cur).get(ch)
      }
      cur = if (nxt == null) 0 else nxt.intValue()
      val cats = outCat(cur)
      if (cats != null) {
        val cnts = outCnt(cur)
        var j = 0
        while (j < cats.length) { out(cats(j)) += cnts(j); j += 1 }
      }
      i += 1
    }
    out
  }

  /** Redact every character covered by ANY term occurrence (the union
    * of all match intervals — overlapping and nested matches merge
    * into one masked run) with `maskChar`, matching case-insensitively
    * (per-char `Character.toLowerCase` — build the automaton from
    * lowercased terms) while preserving the original characters
    * everywhere else. Returns (redacted, nMasked) where nMasked is the
    * exact count of covered positions.
    *
    * One AC scan + a difference-array interval accumulation —
    * O(len + matches), no per-interval inner loop over covered
    * positions. `outLens` carries the DISTINCT match lengths ending at
    * each node (a node's own terminal length is its trie depth; the
    * fail chain contributes the proper-suffix terms' depths), so each
    * match end marks its interval directly.
    */
  def redact(text: UTF8String, maskChar: Char): (UTF8String, Int) = {
    val s = text.toString
    val n = s.length
    if (n == 0) return (text, 0)
    var diff: Array[Int] = null
    var cur = 0
    var i = 0
    while (i < n) {
      val ch = Character.valueOf(Character.toLowerCase(s.charAt(i)))
      var nxt = edges(cur).get(ch)
      while (cur != 0 && nxt == null) {
        cur = fail(cur)
        nxt = edges(cur).get(ch)
      }
      cur = if (nxt == null) 0 else nxt.intValue()
      val lens = outLens(cur)
      if (lens != null) {
        if (diff == null) diff = new Array[Int](n + 1)
        var j = 0
        while (j < lens.length) {
          diff(i - lens(j) + 1) += 1
          diff(i + 1) -= 1
          j += 1
        }
      }
      i += 1
    }
    if (diff == null) return (text, 0)
    val out = s.toCharArray
    var cov = 0
    var masked = 0
    i = 0
    while (i < n) {
      cov += diff(i)
      if (cov > 0) { out(i) = maskChar; masked += 1 }
      i += 1
    }
    (UTF8String.fromString(new String(out)), masked)
  }
}

object AhoCorasick {

  /** Build from (term, category) rows; terms must be non-empty.
    * `categories` on the result is the SORTED distinct category list —
    * the index space of [[AhoCorasick.countHits]]'s output array.
    */
  def build(termCats: Seq[(String, String)]): AhoCorasick = {
    require(termCats.nonEmpty, "blocklist must hold at least one term")
    termCats.foreach { case (t, _) =>
      require(t.nonEmpty, "blocklist terms must be non-empty") }
    val categories = termCats.map(_._2).distinct.sorted.toArray
    val catIdx = categories.zipWithIndex.toMap

    val edges = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    val ownCnt = scala.collection.mutable.ArrayBuffer(
      new Array[Long](categories.length))
    val depth = scala.collection.mutable.ArrayBuffer(0)
    termCats.foreach { case (term, cat) =>
      var cur = 0
      term.foreach { c =>
        val ch = Character.valueOf(c)
        val nxt = edges(cur).get(ch)
        if (nxt == null) {
          edges += new java.util.HashMap[Character, Integer]()
          ownCnt += new Array[Long](categories.length)
          depth += depth(cur) + 1
          edges(cur).put(ch, Integer.valueOf(edges.size - 1))
          cur = edges.size - 1
        } else cur = nxt.intValue()
      }
      ownCnt(cur)(catIdx(cat)) += 1L
    }

    val n = edges.size
    val fail = new Array[Int](n)
    val agg = Array.tabulate(n)(i => ownCnt(i).clone())
    // distinct match lengths ending at each node: the node's own depth
    // if terminal, plus the fail chain's (proper-suffix terms — their
    // depths are strictly smaller, so the union stays duplicate-free)
    val lens = Array.fill[List[Int]](n)(Nil)
    val queue = new java.util.ArrayDeque[Integer]()
    edges(0).values().forEach { v => fail(v) = 0; queue.add(v) }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      // fail(u) is already final and was aggregated before u entered
      // the queue's level — BFS order guarantees it
      var k = 0
      while (k < categories.length) {
        agg(u)(k) += agg(fail(u))(k); k += 1
      }
      lens(u) =
        (if (ownCnt(u).exists(_ != 0L)) depth(u) :: lens(fail(u))
         else lens(fail(u)))
      edges(u).forEach { (ch, v) =>
        var f = fail(u)
        while (f != 0 && edges(f).get(ch) == null) f = fail(f)
        val t = edges(f).get(ch)
        fail(v) = if (t != null && t.intValue() != v.intValue())
          t.intValue() else 0
        queue.add(v)
      }
    }

    // sparsify: most trie nodes match nothing — store null for them
    val outCat = new Array[Array[Int]](n)
    val outCnt = new Array[Array[Long]](n)
    val outLens = new Array[Array[Int]](n)
    var i = 0
    while (i < n) {
      val nz = agg(i).indices.filter(agg(i)(_) != 0L)
      if (nz.nonEmpty) {
        outCat(i) = nz.toArray
        outCnt(i) = nz.map(agg(i)(_)).toArray
      }
      if (lens(i).nonEmpty) outLens(i) = lens(i).toArray
      i += 1
    }
    new AhoCorasick(categories, edges.toArray, fail, outCat, outCnt,
      outLens)
  }
}

/** `blocklist_redact(text)` → struct<redacted: string, n_masked: int>
  * — union-of-intervals masking over every term occurrence, automaton
  * carried as broadcast state (see [[AhoCorasick.redact]]).
  */
case class BlocklistRedact(child: Expression, ac: Broadcast[AhoCorasick],
                           maskChar: Char)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("redacted", StringType, nullable = false),
    StructField("n_masked", IntegerType, nullable = false)))
  override def prettyName: String = "blocklist_redact"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"blocklist_redact expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(text: Any): Any =
    BlocklistRedact.compute(text.asInstanceOf[UTF8String], ac.value,
      maskChar)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("acBc", ac, classOf[Broadcast[_]].getName)
    nullSafeCodeGen(ctx, ev, t =>
      s"""${ev.value} = graft.expressions.BlocklistRedact.compute($t,
         |  (graft.expressions.AhoCorasick)
         |    ((org.apache.spark.broadcast.Broadcast) $bc).value(),
         |  (char) ${maskChar.toInt});
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): BlocklistRedact =
    copy(child = newChild)
}

object BlocklistRedact {
  /** Shared interpreted/codegen kernel entry. */
  def compute(text: UTF8String, ac: AhoCorasick,
              maskChar: Char): InternalRow = {
    val (red, masked) = ac.redact(text, maskChar)
    new GenericInternalRow(Array[Any](red, Integer.valueOf(masked)))
  }
}

/** `blocklist_hits(text)` → array<long> of per-category term
  * occurrence counts, automaton carried as broadcast state (the
  * [[PrefixGrams]] idiom — built via GraftColumnBridge, not the
  * string registry). Output array index i is category
  * `ac.categories(i)`.
  */
case class BlocklistHits(child: Expression, ac: Broadcast[AhoCorasick])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "blocklist_hits"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"blocklist_hits expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(text: Any): Any =
    new GenericArrayData(
      ac.value.countHits(text.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("acBc", ac, classOf[Broadcast[_]].getName)
    nullSafeCodeGen(ctx, ev, t =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  ((graft.expressions.AhoCorasick)
         |    ((org.apache.spark.broadcast.Broadcast) $bc).value())
         |    .countHits($t));
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): BlocklistHits =
    copy(child = newChild)
}
