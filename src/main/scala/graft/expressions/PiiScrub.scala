package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Hand-rolled single-expression PII scrubber — the kernel form of the
  * email/URL/phone regex family in `TextAnalysis.piiScrub` (round 13,
  * VERDICT-r12 #1: the regex formulation paid SIX java.util.regex
  * passes per document — 3 `regexp_extract_all` + 3 chained
  * `regexp_replace` — and measured 22× behind the DuckDB oracle at sf1
  * on pure map work).
  *
  * Semantics are EXACTLY the regex formulation's, matcher for matcher
  * (pinned by the TextKernelLawsSpec scalacheck laws, which replay
  * every scanner against `java.util.regex` on adversarial generators):
  *
  *   - email `[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}`:
  *     leftmost start; the local-part run needs no backtracking (`@`
  *     is outside its class, so shrinking it can never help); the
  *     greedy domain backtracks to the LAST `.` in the domain run
  *     followed by ≥ 2 letters (Java's quantifier-priority order —
  *     the scanner walks candidate dots from the right);
  *   - URL `https?://[^\s]+`: literal prefix, then the maximal
  *     non-whitespace run (`\s` = the six ASCII chars, Java's table);
  *   - phone `\+?[0-9][0-9()\- ]{6,}[0-9]`: optional plus, a digit,
  *     then the greedy body backtracks to the LAST digit in the
  *     `[0-9()\- ]` run at body length ≥ 6.
  *
  * Failed candidates resume exactly where `Matcher.find` would: one
  * position forward, except the email scanner which can prove every
  * start inside the failed local run also fails and jumps past the
  * `@` (same leftmost result, linear scanning).
  *
  * Counts are per-category over the ORIGINAL text (three independent
  * scans — `regexp_extract_all` semantics); the scrubbed text applies
  * the three replacements IN ORDER (email → URL → phone), each over
  * the PREVIOUS pass's output (`regexp_replace` chain semantics —
  * a phone-shaped digit run inside a replaced URL is gone before the
  * phone pass sees it). Five cheap char scans total, zero regex
  * machinery, no intermediate UTF8String round-trips.
  */
object PiiKernel {

  @inline private def isLocal(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || c == '.' || c == '_' || c == '%' ||
      c == '+' || c == '-'

  @inline private def isDomain(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || c == '.' || c == '-'

  @inline private def isLetter(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')

  @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || (c >= '\t' && c <= '\r')

  @inline private def isPhoneBody(c: Char): Boolean =
    isDigit(c) || c == '(' || c == ')' || c == '-' || c == ' '

  /** Match intervals [start, end) of the email pattern, leftmost,
    * non-overlapping — `Matcher.find` order.
    */
  def emails(s: CharSequence): java.util.ArrayList[Array[Int]] = {
    val out = new java.util.ArrayList[Array[Int]]()
    val n = s.length
    var i = 0
    while (i < n) {
      if (!isLocal(s.charAt(i))) i += 1
      else {
        var j = i + 1
        while (j < n && isLocal(s.charAt(j))) j += 1
        if (j >= n || s.charAt(j) != '@') i = j + 1
        else {
          var k = j + 1
          while (k < n && isDomain(s.charAt(k))) k += 1
          // last '.' with a non-empty domain part before it and >= 2
          // letters after it (greedy-backtracking order: right to left)
          var end = -1
          var p = k - 1
          while (end < 0 && p >= j + 2) {
            if (s.charAt(p) == '.') {
              var m = p + 1
              while (m < k && isLetter(s.charAt(m))) m += 1
              if (m - p - 1 >= 2) end = m
            }
            p -= 1
          }
          if (end >= 0) { out.add(Array(i, end)); i = end }
          else i = j + 1 // all starts in [i+1, j] provably fail too
        }
      }
    }
    out
  }

  /** Match intervals of `https?://[^\s]+`, leftmost, non-overlapping. */
  def urls(s: CharSequence): java.util.ArrayList[Array[Int]] = {
    val out = new java.util.ArrayList[Array[Int]]()
    val n = s.length
    var i = 0
    while (i < n) {
      var base = -1
      if (s.charAt(i) == 'h' && i + 6 < n && s.charAt(i + 1) == 't' &&
          s.charAt(i + 2) == 't' && s.charAt(i + 3) == 'p') {
        if (s.charAt(i + 4) == 's' && i + 7 < n && s.charAt(i + 5) == ':' &&
            s.charAt(i + 6) == '/' && s.charAt(i + 7) == '/') base = i + 8
        else if (s.charAt(i + 4) == ':' && s.charAt(i + 5) == '/' &&
          s.charAt(i + 6) == '/') base = i + 7
      }
      if (base < 0) i += 1
      else {
        var e = base
        while (e < n && !isWs(s.charAt(e))) e += 1
        if (e > base) { out.add(Array(i, e)); i = e }
        else i += 1
      }
    }
    out
  }

  /** Match intervals of `\+?[0-9][0-9()\- ]{6,}[0-9]`, leftmost,
    * non-overlapping.
    */
  def phones(s: CharSequence): java.util.ArrayList[Array[Int]] = {
    val out = new java.util.ArrayList[Array[Int]]()
    val n = s.length
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      val d0 = if (isDigit(c)) i
        else if (c == '+' && i + 1 < n && isDigit(s.charAt(i + 1))) i + 1
        else -1
      if (d0 < 0) i += 1
      else {
        var e = d0 + 1
        while (e < n && isPhoneBody(s.charAt(e))) e += 1
        // last digit in the body run at body length >= 6 (greedy)
        var p = e - 1
        while (p >= d0 + 7 && !isDigit(s.charAt(p))) p -= 1
        if (p >= d0 + 7 && isDigit(s.charAt(p))) { out.add(Array(i, p + 1)); i = p + 1 }
        else i += 1
      }
    }
    out
  }

  /** Replace each interval with `repl`, preserving everything else. */
  def replace(s: String, matches: java.util.ArrayList[Array[Int]],
              repl: String): String = {
    if (matches.isEmpty) return s
    val sb = new java.lang.StringBuilder(s.length)
    var pos = 0
    var i = 0
    while (i < matches.size) {
      val m = matches.get(i)
      sb.append(s, pos, m(0)).append(repl)
      pos = m(1)
      i += 1
    }
    sb.append(s, pos, s.length)
    sb.toString
  }

  /** The full q69 kernel: (n_emails, n_urls, n_phones, scrubbed). */
  def scrub(text: UTF8String): InternalRow = {
    val s = text.toString
    val em = emails(s)
    val nUrls = urls(s).size.toLong
    val nPhones = phones(s).size.toLong
    val s1 = replace(s, em, "<EMAIL>")
    val s2 = replace(s1, urls(s1), "<URL>")
    val s3 = replace(s2, phones(s2), "<PHONE>")
    new GenericInternalRow(Array[Any](
      em.size.toLong, nUrls, nPhones,
      if (s3 eq s) text else UTF8String.fromString(s3)))
  }
}

/** `pii_scrub(text)` → struct<n_emails: long, n_urls: long,
  * n_phones: long, scrubbed: string> — see [[PiiKernel]].
  */
case class PiiScrubExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_emails", LongType, nullable = false),
    StructField("n_urls", LongType, nullable = false),
    StructField("n_phones", LongType, nullable = false),
    StructField("scrubbed", StringType, nullable = false)))
  override def prettyName: String = "pii_scrub"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pii_scrub expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(text: Any): Any =
    PiiKernel.scrub(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.expressions.PiiKernel.scrub($t);")

  override protected def withNewChildInternal(newChild: Expression): PiiScrubExpr =
    copy(child = newChild)
}
