package graft

import java.util.regex.Pattern

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.expressions.{CharClass, PiiKernel, TextClassSpec}
import org.apache.spark.unsafe.types.UTF8String

/** Parity laws for the round-13 single-scan text kernels: every count
  * and every match interval the kernels emit must equal the
  * `java.util.regex` / `String.split` formulation they replaced —
  * the SAME engine Spark's regexp functions run on, so agreement here
  * plus the unchanged DuckDB oracles pins both sides of the q41/q43/
  * q69/q196 contracts.
  */
class TextKernelLawsSpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int = 300): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  // ---------------------------------------------------------- generators

  /** Codepoints spanning every kernel-relevant regime: ASCII letters /
    * digits / punctuation, ALL six Java-`\s` whitespace chars
    * (including the `\x0B` RE2 disagrees on), each script block, block
    * boundaries, and supplementary (4-byte) codepoints.
    */
  private val cpGen: Gen[Int] = Gen.frequency(
    8 -> Gen.chooseNum('a'.toInt, 'z'.toInt),
    2 -> Gen.chooseNum('A'.toInt, 'Z'.toInt),
    3 -> Gen.chooseNum('0'.toInt, '9'.toInt),
    3 -> Gen.oneOf(0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x20),
    2 -> Gen.oneOf('.', ',', '!', '@', '+', '-', '_', '%', ':', '/').map(_.toInt),
    1 -> Gen.chooseNum(0xC0, 0x24F),   // latin supplement/extended
    1 -> Gen.chooseNum(0x400, 0x4FF),  // cyrillic
    1 -> Gen.chooseNum(0x370, 0x3FF),  // greek
    1 -> Gen.chooseNum(0x4E00, 0x4E40),// cjk
    1 -> Gen.chooseNum(0xAC00, 0xAC40),// hangul
    1 -> Gen.oneOf(0xBF, 0x250, 0x3FF, 0x500, 0x9FFF, 0xA000, 0xD7A3),
    1 -> Gen.oneOf(0x1F600, 0x10348))  // supplementary (2 UTF-16 chars)

  /** Truncation that cannot strand a high surrogate — Spark strings
    * (UTF8String) rewrite lone surrogates, so the reference and kernel
    * inputs would silently diverge.
    */
  private def safeTake(s: String, n: Int): String = {
    val t = s.take(n)
    if (t.nonEmpty && Character.isHighSurrogate(t.last)) t.dropRight(1) else t
  }

  private val textGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 60)
    cps <- Gen.listOfN(n, cpGen)
    stops <- Gen.listOfN(3, Gen.oneOf("the", "a", "and", "of", "to", "el",
      "de", "thee", "an", "o"))
    mode <- Gen.chooseNum(0, 3)
  } yield {
    val base = new String(cps.toArray, 0, cps.size)
    mode match {
      case 0 => base
      case 1 => stops.mkString(" ") + " " + base
      case 2 => base + "\t" + stops.mkString("")
      case _ => stops.mkString(safeTake(base, 3), " ", "")
    }
  }

  // ------------------------------------------- char/token counting laws

  private val wsClass = "[ \\t\\n\\x0B\\f\\r]"

  private def regexCount(s: String, cls: String): Long = {
    val m = Pattern.compile(cls).matcher(s)
    var c = 0L
    while (m.find()) c += 1
    c
  }

  private val qualityLikeSpec = TextClassSpec.build(
    Seq(CharClass(Seq('a'.toInt -> 'z'.toInt, '0'.toInt -> '9'.toInt,
      0x09 -> 0x0D, 0x20 -> 0x20), negate = true)),
    Seq(Seq("the", "a", "and", "of", "to")))

  private val scriptLikeSpec = TextClassSpec.build(
    Seq(
      CharClass(Seq('A'.toInt -> 'Z'.toInt, 'a'.toInt -> 'z'.toInt, 0xC0 -> 0x24F)),
      CharClass(Seq(0x400 -> 0x4FF)),
      CharClass(Seq(0x370 -> 0x3FF)),
      CharClass(Seq(0x4E00 -> 0x9FFF)),
      CharClass(Seq(0xAC00 -> 0xD7A3)),
      CharClass(Seq('0'.toInt -> '9'.toInt)),
      CharClass(Seq(0x09 -> 0x0D, 0x20 -> 0x20))),
    Seq(Seq("el", "la", "de"), Seq("de5", "shi4", "le5")))

  test("kernel n_chars / n_tokens match codePointCount and split('\\s+', -1) (property)") {
    samples(textGen, 600).foreach { s =>
      val a = qualityLikeSpec.profile(UTF8String.fromString(s))
      assert(a(0) === s.codePointCount(0, s.length).toLong, s"n_chars on ${esc(s)}")
      assert(a(1) === s.split("\\s+", -1).length.toLong, s"n_tokens on ${esc(s)}")
    }
  }

  test("kernel negated char class matches [^a-z0-9\\s] regex count (property)") {
    samples(textGen, 600).foreach { s =>
      val a = qualityLikeSpec.profile(UTF8String.fromString(s))
      assert(a(2) === regexCount(s, "[^a-z0-9" + wsClass.drop(1)),
        s"punct on ${esc(s)}")
    }
  }

  test("kernel token-set counts match split+filter (property)") {
    val stop = Set("the", "a", "and", "of", "to")
    samples(textGen, 600).foreach { s =>
      val a = qualityLikeSpec.profile(UTF8String.fromString(s))
      assert(a(3) === s.split("\\s+", -1).count(stop).toLong,
        s"n_stop on ${esc(s)}")
    }
  }

  test("kernel script-range classes match per-class regex counts (property)") {
    val classes = Seq(
      "[A-Za-zÀ-ɏ]", "[Ѐ-ӿ]", "[Ͱ-Ͽ]",
      "[一-鿿]", "[가-힣]", "[0-9]", wsClass)
    val sets = Seq(Set("el", "la", "de"), Set("de5", "shi4", "le5"))
    samples(textGen, 600).foreach { s =>
      val a = scriptLikeSpec.profile(UTF8String.fromString(s))
      classes.zipWithIndex.foreach { case (cls, k) =>
        assert(a(2 + k) === regexCount(s, cls), s"class $cls on ${esc(s)}")
      }
      sets.zipWithIndex.foreach { case (set, k) =>
        assert(a(2 + classes.size + k) === s.split("\\s+", -1).count(set).toLong,
          s"set $k on ${esc(s)}")
      }
    }
  }

  // ------------------------------------------------------ PII scan laws

  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val UrlRe = "https?://[^\\s]+"
  private val PhoneRe = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"

  private def refIntervals(s: String, re: String): Seq[(Int, Int)] = {
    val m = Pattern.compile(re).matcher(s)
    val out = Seq.newBuilder[(Int, Int)]
    while (m.find()) out += ((m.start, m.end))
    out.result()
  }

  private def kernelIntervals(
      xs: java.util.ArrayList[Array[Int]]): Seq[(Int, Int)] = {
    import scala.jdk.CollectionConverters._
    xs.asScala.map(a => (a(0), a(1))).toSeq
  }

  /** Fragments tuned to hit every scanner branch: valid matches,
    * near-misses one char short, boundary-adjacent runs, doubled
    * separators, and plain noise.
    */
  private val fragGen: Gen[String] = Gen.oneOf(
    Gen.oneOf("a.b@x.co", "a@b.commm.c", "x@y.c", "a@b", "@x.com", "a@@b.co",
      "_%+-@dom.org", "a@b.co.uk", "a@b..com", "A9@9A.ZZ", "a@-.-co",
      "e@ha.ha@z.io"),
    Gen.oneOf("http://x", "https://", "http:/x", "xhttp://a", "https://a b",
      "http://http://y", "HTTPS://nope", "https://ok/path?q=1#f", "http://v"),
    Gen.oneOf("+1 (555) 123-4567", "12345678", "123456", "1234-567",
      "+12345678", "555-123", "((((((((", "0(1)2-3 4x", "1------2",
      "+1+2345678", "99 99 99 99", "123456x7"),
    Gen.oneOf(" ", "", "\t", "", ".", "-", "word", "the and of",
      "0,0", "..", "@", "+"),
    textGen.map(safeTake(_, 12)))

  private val piiTextGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 8)
    frags <- Gen.listOfN(n, fragGen)
    seps <- Gen.listOfN(math.max(n - 1, 0), Gen.oneOf("", " ", "", "x", "1"))
  } yield frags.zipAll(seps, "", "").map { case (f, sp) => f + sp }.mkString

  test("email scanner matches java.util.regex intervals (property)") {
    samples(piiTextGen, 800).foreach { s =>
      assert(kernelIntervals(PiiKernel.emails(s)) === refIntervals(s, EmailRe),
        s"emails on ${esc(s)}")
    }
  }

  test("url scanner matches java.util.regex intervals (property)") {
    samples(piiTextGen, 800).foreach { s =>
      assert(kernelIntervals(PiiKernel.urls(s)) === refIntervals(s, UrlRe),
        s"urls on ${esc(s)}")
    }
  }

  test("phone scanner matches java.util.regex intervals (property)") {
    samples(piiTextGen, 800).foreach { s =>
      assert(kernelIntervals(PiiKernel.phones(s)) === refIntervals(s, PhoneRe),
        s"phones on ${esc(s)}")
    }
  }

  test("scrub equals the chained regexp_replace formulation (property)") {
    samples(piiTextGen, 800).foreach { s =>
      val row = PiiKernel.scrub(UTF8String.fromString(s))
      val expected = s
        .replaceAll(EmailRe, "<EMAIL>")
        .replaceAll(UrlRe, "<URL>")
        .replaceAll(PhoneRe, "<PHONE>")
      assert(row.getUTF8String(3).toString === expected, s"scrub on ${esc(s)}")
      assert(row.getLong(0) === refIntervals(s, EmailRe).size.toLong)
      assert(row.getLong(1) === refIntervals(s, UrlRe).size.toLong)
      assert(row.getLong(2) === refIntervals(s, PhoneRe).size.toLong)
    }
  }

  // ------------------------------------------- operator-level edge rows

  test("rewired operators handle boundary rows (empty / ws-only / null / unicode)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("text", StringType)))
    val rows = Seq(
      Row(1L, "en", "the quick brown fox and the hound of to a"),
      Row(2L, "en", ""),
      Row(3L, "en", " \t\n "),
      Row(4L, "en", null),
      Row(5L, "es", "el la de el la de x"),
      Row(6L, "en", "  leading and trailing  "),
      Row(7L, "en", "你好 Да αβ 가! 12"),
      Row(8L, "en", "mail a.b@x.co and https://h.io/z +1 (555) 123-4567 ok"))
    val docs = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)

    val q = graft.operators.TextAnalysis.qualityScore(docs)
      .orderBy("doc_id").collect()
    // row 1: 10 tokens, 6 stop hits ("the"×2, "and", "of", "to", "a")
    assert(q(0).getLong(2) === 10L && q(0).getLong(3) === 6L)
    // empty text: one empty token, zero stops, keep = 0
    assert(q(1).getLong(2) === 1L && q(1).getInt(6) === 0)
    // ws-only: two empty tokens (leading + trailing of the single run)
    assert(q(2).getLong(2) === 2L)
    // null text: null metrics, keep = 0 (the legacy null-propagation)
    assert(q(3).isNullAt(1) && q(3).getInt(6) === 0)
    // leading/trailing ws adds the empty boundary tokens: 2 + 3
    assert(q(5).getLong(2) === 5L)

    val l = graft.operators.TextAnalysis.langId(docs)
      .orderBy("doc_id").collect()
    assert(l(4).getString(7) === "es" && l(4).getLong(3) === 6L)
    assert(l(3).isNullAt(2)) // null text -> null scores

    val p = graft.operators.TextAnalysis.scriptProfile(
        docs, org.apache.spark.sql.functions.col("text"),
        org.apache.spark.sql.functions.col("doc_id"))
      .orderBy("doc_id").collect()
    // doc 7 columns: (doc_id, n_chars, latin, cyrillic, greek, cjk,
    // hangul, digit, other, dominant, dominant_ratio)
    val u = p(6)
    assert(u.getLong(3) === 2L && u.getLong(4) === 2L && u.getLong(5) === 2L
      && u.getLong(6) === 1L && u.getLong(7) === 2L)
    assert(u.getString(9) === "cyrillic") // priority argmax at 3-way tie

    val s = graft.operators.TextAnalysis.piiScrub(docs)
      .orderBy("doc_id").collect()
    assert(s(7).getLong(1) === 1L && s(7).getLong(2) === 1L && s(7).getLong(3) === 1L)
    assert(s(3).isNullAt(1) && s(3).isNullAt(4))
  }

  private def esc(s: String): String =
    s.map(c => if (c >= 0x20 && c < 0x7F) c.toString else f"\\u${c.toInt}%04X").mkString

  // ------------------------------------------------- PushdownBarrier laws

  test("PushdownBarrier: bit-for-bit identity (interpreted + codegen) " +
       "and filters stay above the barrier projection") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def barrier(c: org.apache.spark.sql.Column) =
      org.apache.spark.sql.classic.GraftColumnBridge.column(
        graft.expressions.PushdownBarrier(
          org.apache.spark.sql.classic.GraftColumnBridge.expression(c)))
    val df = Seq("a b c", " lead", "trail ", "", "one",
      "x y z w v u t").zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    // value law: wrapped ≡ unwrapped, array + scalar types
    val a = df.select(split(col("text"), "\\s+").as("t"),
        length(col("text")).as("l")).collect().toSeq
    val b = df.select(barrier(split(col("text"), "\\s+")).as("t"),
        barrier(length(col("text"))).as("l")).collect().toSeq
    assert(a.map(_.toString) === b.map(_.toString))
    // plan law: a size filter on the barrier-staged alias must NOT be
    // substituted below the staging projection into the scan-side
    // DataFilters (the spreadIfNarrow caller hazard this expression
    // exists to stop) — with a plain alias the same filter IS pushed
    val staged = df.repartition(4, col("id"))
      .select(col("id"), barrier(split(col("text"), "\\s+")).as("toks"))
      .filter(size(col("toks")) >= 2)
    staged.write.format("noop").mode("overwrite").save()
    val planned = staged.queryExecution.executedPlan.toString
    val scanLine = planned.linesIterator.filter(_.contains("LocalTableScan"))
    // LocalTableScan carries no filters at all — assert instead that no
    // Filter node sits BELOW the Exchange in the executed tree
    val lines = planned.linesIterator.toVector
    val exIdx = lines.indexWhere(_.contains("Exchange"))
    assert(exIdx >= 0, s"no exchange in:\n$planned")
    assert(!lines.drop(exIdx + 1).exists(_.contains("Filter")),
      s"filter pushed below the exchange despite the barrier:\n$planned")
    // rows with >= 2 split elements: "a b c" (3), " lead" (["","lead"]),
    // "trail " (["trail",""] — Spark split keeps trailing empties),
    // "x y z w v u t" (7)
    assert(staged.count() === 4L)
    scanLine.size: Unit
  }

  test("PushdownBarrier: placements outside Project/Filter fail loudly " +
       "at analysis; window placements stay value-correct") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def barrier(c: org.apache.spark.sql.Column) =
      org.apache.spark.sql.classic.GraftColumnBridge.column(
        graft.expressions.PushdownBarrier(
          org.apache.spark.sql.classic.GraftColumnBridge.expression(c)))
    val df = Seq((1L, "a b"), (2L, "c"), (3L, "a b")).toDF("id", "text")
    // The barrier's safety argument (PushdownBarrier.scala doc) rests
    // on Catalyst REFUSING the placements where a `deterministic =
    // false` expression could change plan semantics. Pin each refusal:
    // a Spark upgrade or helper refactor that lets one slip through
    // silently must fail here, not in production plans.
    val grpEx = intercept[Exception] {
      df.groupBy(barrier(col("text")).as("g")).count().collect()
    }
    assert(grpEx.getMessage.toLowerCase.contains("deterministic"),
      s"grouping placement no longer refused: $grpEx")
    val aggEx = intercept[Exception] {
      df.agg(sum(barrier(col("id")))).collect()
    }
    assert(aggEx.getMessage.toLowerCase.contains("deterministic"),
      s"aggregate-arg placement no longer refused: $aggEx")
    val joinEx = intercept[Exception] {
      df.as("l").join(df.as("r"),
        barrier(col("l.id")) === col("r.id")).count()
    }
    assert(joinEx.getMessage.toLowerCase.contains("deterministic"),
      s"join-condition placement no longer refused: $joinEx")
    // Window placements ARE legal: PullOutNondeterministic stages the
    // barrier into a Project below the window — its legal home, one
    // evaluation — so values must match the unwrapped twin exactly.
    import org.apache.spark.sql.expressions.Window
    val wrapped = df.select(col("id"),
      count(lit(1)).over(Window.partitionBy(barrier(col("text")))).as("c"),
      row_number().over(Window.orderBy(barrier(col("id")))).as("rn"))
    val plain = df.select(col("id"),
      count(lit(1)).over(Window.partitionBy(col("text"))).as("c"),
      row_number().over(Window.orderBy(col("id"))).as("rn"))
    assert(wrapped.collect().map(_.toString).sorted.toSeq ===
      plain.collect().map(_.toString).sorted.toSeq)
  }
}
