package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One codepoint class of a [[TextClassSpec]]: count codepoints inside
  * (or, with `negate`, outside) the inclusive range union — the kernel
  * form of a `[a-z0-9]` / `[^a-z0-9\s]` regex character class.
  */
final case class CharClass(ranges: Seq[(Int, Int)], negate: Boolean = false)

/** Compiled single-scan text classifier — the state behind
  * [[TextClassCounts]].
  *
  * Why this exists (round 13, the VERDICT-r12 #1 item): the
  * text-classification operators (`TextAnalysis.qualityScore`,
  * `langId`, `scriptProfile`) each counted their classes via one
  * `regexp_replace`/`LIST_FILTER` pass PER CLASS — 7 full regex scans
  * of every document's bytes for the script profile, 5 token-array
  * materializations for language ID. Correct and map-only, but
  * measured 9–22× behind the same-scale DuckDB oracle at sf1 on pure
  * map work. This kernel is the `BlocklistHits` idiom applied to
  * counting: ONE walk over the document emits every requested count at
  * once — total codepoints, whitespace-split token count, all
  * codepoint-class counts, and all exact-token-set counts.
  *
  * Exact contracts replicated (pinned by TextKernelLawsSpec against
  * the regex/split formulations they replace):
  *   - codepoint counting = Spark `length` = DuckDB `LENGTH` (both
  *     count codepoints; a 4-byte UTF-8 sequence is ONE);
  *   - token segmentation = `split(text, '\\s+')` with Spark's
  *     limit = -1 semantics: segments BETWEEN maximal whitespace runs,
  *     INCLUDING the empty leading/trailing segments a boundary run
  *     produces, so `n_tokens = (# maximal ws runs) + 1` (the empty
  *     string has one empty token);
  *   - whitespace = Java regex `\s` = the six ASCII chars
  *     `[ \t\n\x0B\f\r]` — spelled as an explicit class in the DuckDB
  *     oracles from round 13 on, because RE2's `\s` omits `\x0B`
  *     (the r12 ADVICE portability item);
  *   - token-set matching is EXACT and case-sensitive
  *     (`t IN (...)` semantics), one count per set per occurrence.
  *
  * Representation: ASCII codepoints classify through a precomputed
  * 128-entry bitmask table (bit c = class c membership, one load per
  * char); non-ASCII codepoints walk the per-class range lists (≤ a
  * handful of ranges each — the script-profile classes). Token sets
  * compile to a dense trie (`trie(state · 128 + c)`, the AhoCorasick
  * layout without fail links — exact match only): state −1 is the
  * dead state any non-member prefix (or any non-ASCII char) falls
  * into until the next whitespace boundary. The whole spec is a few
  * KB — it rides the serialized plan as a codegen reference object,
  * no broadcast needed.
  */
final class TextClassSpec private (
    val nCharClasses: Int,
    val nTokenSets: Int,
    asciiMask: Array[Int],       // per byte < 128: bit k = char-class k
    asciiWs: Array[Boolean],     // per byte < 128: Java-\s membership
    rangeLo: Array[Array[Int]],  // per class: range lows (non-ASCII path)
    rangeHi: Array[Array[Int]],
    negate: Array[Boolean],
    trie: Array[Int],            // dense token trie, -1 = no edge
    termSets: Array[Array[Int]]  // per trie node: set ids it terminates
) extends Serializable {

  /** Output slots: [n_chars, n_tokens, charClass*, tokenSet*]. */
  def nSlots: Int = 2 + nCharClasses + nTokenSets

  @inline private def isWsCp(cp: Int): Boolean =
    cp == 0x20 || (cp >= 0x09 && cp <= 0x0D)

  @inline private def classify(cp: Int, out: Array[Long]): Unit = {
    var k = 0
    while (k < nCharClasses) {
      val lo = rangeLo(k); val hi = rangeHi(k)
      var in = false
      var r = 0
      while (!in && r < lo.length) {
        if (cp >= lo(r) && cp <= hi(r)) in = true
        r += 1
      }
      if (in != negate(k)) out(2 + k) += 1L
      k += 1
    }
  }

  /** The single pass: decodes UTF-8 inline (the [[AhoCorasick]] byte
    * walker), classifying each codepoint and stepping the token trie.
    * Malformed sequences — which valid Spark string data never
    * contains — count as one non-class, non-ws codepoint.
    */
  def profile(text: UTF8String): Array[Long] = {
    val out = new Array[Long](nSlots)
    val n = text.numBytes
    var i = 0
    var wsRuns = 0L
    var prevWs = false      // inside a whitespace run
    var tokLen = 0          // codepoints in the current token
    var st = 0              // trie state; -1 = dead
    @inline def endToken(): Unit = {
      if (tokLen > 0) {
        if (st > 0) {
          val sets = termSets(st)
          if (sets != null) {
            var j = 0
            while (j < sets.length) { out(2 + nCharClasses + sets(j)) += 1L; j += 1 }
          }
        }
        tokLen = 0; st = 0
      }
    }
    while (i < n) {
      val b0 = text.getByte(i) & 0xff
      var cp = 0
      if (b0 < 0x80) { cp = b0; i += 1 }
      else if ((b0 & 0xe0) == 0xc0 && i + 1 < n) {
        cp = ((b0 & 0x1f) << 6) | (text.getByte(i + 1) & 0x3f); i += 2
      } else if ((b0 & 0xf0) == 0xe0 && i + 2 < n) {
        cp = ((b0 & 0x0f) << 12) | ((text.getByte(i + 1) & 0x3f) << 6) |
          (text.getByte(i + 2) & 0x3f); i += 3
      } else if ((b0 & 0xf8) == 0xf0 && i + 3 < n) {
        cp = ((b0 & 0x07) << 18) | ((text.getByte(i + 1) & 0x3f) << 12) |
          ((text.getByte(i + 2) & 0x3f) << 6) | (text.getByte(i + 3) & 0x3f)
        i += 4
      } else { cp = 0xFFFD; i += 1 }
      out(0) += 1L // n_chars
      val ws = if (cp < 128) {
        val m = asciiMask(cp)
        var k = 0
        while (k < nCharClasses) {
          if (((m >>> k) & 1) == 1) out(2 + k) += 1L
          k += 1
        }
        asciiWs(cp)
      } else {
        classify(cp, out)
        isWsCp(cp)
      }
      if (ws) {
        endToken()
        if (!prevWs) wsRuns += 1L
        prevWs = true
      } else {
        prevWs = false
        tokLen += 1
        if (st >= 0)
          st = if (cp < 128) trie(st * 128 + cp) else -1
      }
    }
    endToken()
    out(1) = wsRuns + 1L // split('\s+', -1) segment count
    out
  }
}

object TextClassSpec {

  /** Compile a spec. `charClasses` index into output slots
    * 2..2+|classes|; `tokenSets` into the slots after. Token-set
    * members must be non-empty ASCII strings (they are whitespace-split
    * tokens — a member containing `\s` could never match one).
    */
  def build(charClasses: Seq[CharClass],
            tokenSets: Seq[Seq[String]]): TextClassSpec = {
    require(charClasses.size <= 30, "at most 30 char classes (bitmask)")
    tokenSets.flatten.foreach { t =>
      require(t.nonEmpty && t.forall(c => c < 128 && !c.isWhitespace),
        s"token-set members must be non-empty ASCII sans whitespace: '$t'")
    }
    val negate = charClasses.map(_.negate).toArray
    val rangeLo = charClasses.map(_.ranges.map(_._1).toArray).toArray
    val rangeHi = charClasses.map(_.ranges.map(_._2).toArray).toArray
    val asciiWs = Array.tabulate(128)(c => c == 0x20 || (c >= 0x09 && c <= 0x0D))
    val asciiMask = Array.tabulate(128) { c =>
      charClasses.zipWithIndex.foldLeft(0) { case (m, (cc, k)) =>
        val in = cc.ranges.exists { case (lo, hi) => c >= lo && c <= hi }
        if (in != cc.negate) m | (1 << k) else m
      }
    }
    // dense exact-match trie over all token-set members
    val rows = scala.collection.mutable.ArrayBuffer(Array.fill(128)(-1))
    val terms = scala.collection.mutable.ArrayBuffer[List[Int]](Nil)
    tokenSets.zipWithIndex.foreach { case (set, sid) =>
      set.foreach { tok =>
        var cur = 0
        tok.foreach { ch =>
          var nxt = rows(cur)(ch)
          if (nxt < 0) {
            rows += Array.fill(128)(-1); terms += Nil
            nxt = rows.size - 1; rows(cur)(ch) = nxt
          }
          cur = nxt
        }
        terms(cur) = sid :: terms(cur)
      }
    }
    val trie = new Array[Int](rows.size * 128)
    rows.indices.foreach(u => System.arraycopy(rows(u), 0, trie, u * 128, 128))
    val termSets = terms.map(l => if (l.isEmpty) null else l.reverse.toArray).toArray
    new TextClassSpec(charClasses.size, tokenSets.size, asciiMask, asciiWs,
      rangeLo, rangeHi, negate, trie, termSets)
  }
}

/** `text_class_counts(text)` → array<long> — one single-scan profile
  * per document: `[n_chars, n_tokens, <char-class counts...>,
  * <token-set counts...>]` per the carried [[TextClassSpec]].
  */
case class TextClassCounts(child: Expression, spec: TextClassSpec)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "text_class_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"text_class_counts expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(text: Any): Any =
    new GenericArrayData(spec.profile(text.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sp = ctx.addReferenceObj("tcSpec", spec, classOf[TextClassSpec].getName)
    nullSafeCodeGen(ctx, ev, t =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  ((graft.expressions.TextClassSpec) $sp).profile($t));
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): TextClassCounts =
    copy(child = newChild)
}
