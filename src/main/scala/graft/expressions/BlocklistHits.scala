package graft.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
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
    outCnt: Array[Array[Long]]) extends Serializable {

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
    termCats.foreach { case (term, cat) =>
      var cur = 0
      term.foreach { c =>
        val ch = Character.valueOf(c)
        val nxt = edges(cur).get(ch)
        if (nxt == null) {
          edges += new java.util.HashMap[Character, Integer]()
          ownCnt += new Array[Long](categories.length)
          edges(cur).put(ch, Integer.valueOf(edges.size - 1))
          cur = edges.size - 1
        } else cur = nxt.intValue()
      }
      ownCnt(cur)(catIdx(cat)) += 1L
    }

    val n = edges.size
    val fail = new Array[Int](n)
    val agg = Array.tabulate(n)(i => ownCnt(i).clone())
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
    var i = 0
    while (i < n) {
      val nz = agg(i).indices.filter(agg(i)(_) != 0L)
      if (nz.nonEmpty) {
        outCat(i) = nz.toArray
        outCnt(i) = nz.map(agg(i)(_)).toArray
      }
      i += 1
    }
    new AhoCorasick(categories, edges.toArray, fail, outCat, outCnt)
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
