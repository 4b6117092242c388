package graft

import org.apache.spark.sql.functions._
import graft.functions.DateBank
import graft.operators.UndatumOps

/** The native date-bank bitmask kernel must match the declarative
  * `try_to_timestamp`-per-format form EXACTLY — per row and per
  * format — on valid dates of every family, near-misses, trailing
  * junk, signs, unicode, and empties. The feature guards may only
  * skip attempts that would fail.
  */
class DateBankSpec extends SparkSpecBase {

  private def adversarial: Seq[String] = {
    val rng = new scala.util.Random(99)
    val valid = (0 until 120).flatMap { _ =>
      val y = 1800 + rng.nextInt(400)
      val mo = 1 + rng.nextInt(12); val da = 1 + rng.nextInt(28)
      val mon = Seq("Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul",
        "Aug", "Sep", "Oct", "Nov", "Dec")(mo - 1)
      Seq(
        f"$y%04d-$mo%02d-$da%02d", f"$da%02d.$mo%02d.$y%04d",
        f"$mo%02d/$da%02d/$y%04d", f"$y%04d/$mo%02d/$da%02d",
        f"$da%02d/$mo%02d/$y%04d", f"$da%02d-$mo%02d-$y%04d",
        f"$y%04d$mo%02d$da%02d", f"$da%02d $mon $y%04d",
        f"$mon $da%02d, $y%04d", f"$da%02d.$mo%02d.${y % 100}%02d",
        f"$y%04d-$mo%02d-$da%02d ${rng.nextInt(24)}%02d:${rng.nextInt(60)}%02d:${rng.nextInt(60)}%02d")
    }
    val nearMisses = Seq(
      "2023-13-45", "31.02.2023", "99.99.99", "Jan 32, 2023",
      "2023-01-02x", "x2023-01-02", " 2023-01-02", "2023-01-02 ",
      "2023-1-2", "1.2.3", "01.02.03", "20230230", "0000-00-00",
      "+12023-01-01", "-0004-03-05", "00010101", "99991231",
      "12 Foo 2023", "Jan 2, 2023", "Jan  02, 2023", "02  Jan 2023",
      "2023-01-02T10:00:00", "2023-01-02 25:00:00", "2023-01-02 10:00",
      "10:00:00", "2023/1/2", "02/03", "...", "---", "///", "", " ",
      "äöü", "2023年01月02日", "٢٠٢٣-٠١-٠٢", "1e4", "0x20230101",
      "123456789012345678901234567890123456789012345")
    val garbage = (0 until 60).map(_ => rng.alphanumeric.take(rng.nextInt(14)).mkString)
    valid ++ nearMisses ++ garbage
  }

  test("kernel bitmask == per-format try_to_timestamp, per row") {
    val s = spark
    import s.implicits._
    val df = (adversarial.map(Option(_)) :+ None).toDF("v")
    DateBank.register(s)
    val cols = DateBank.formats.zipWithIndex.map { case (fmt, i) =>
      (try_to_timestamp(col("v"), lit(fmt)).isNotNull =!=
        (shiftright(call_function("date_bank_mask", col("v")), i)
          .bitwiseAND(lit(1)) === 1)).as(s"diff_$i")
    }
    val bad = df.na.drop().select(cols: _*)
      .where(cols.indices.map(i => col(s"diff_$i")).reduce(_ || _))
    assert(bad.count() == 0, s"kernel/declarative mismatch rows: ${bad.count()}")
  }

  test("dateFormatScores (native) == dateFormatScoresDeclarative") {
    val s = spark
    import s.implicits._
    val df = adversarial.toDF("v")
    val a = UndatumOps.dateFormatScores(df, "v").collect().map(_.toSeq).toSeq
    val b = UndatumOps.dateFormatScoresDeclarative(df, "v").collect().map(_.toSeq).toSeq
    assert(a == b)
    // the mixed column really exercises the bank: at least the four
    // generator families must have scored
    assert(a.count(_.last.asInstanceOf[Long] > 0L) >= 4)
  }

  /** Wide-family valid strings + ru month-name strings formatted by
    * the SAME JVM's CLDR symbols (no hardcoded Cyrillic month list to
    * drift from the parser's own locale data).
    */
  private def wideCorpus: Seq[String] = {
    import java.time.format.DateTimeFormatter
    import java.time.{LocalDate, LocalDateTime}
    val ru = java.util.Locale.forLanguageTag("ru")
    val rng = new scala.util.Random(7)
    val fmts = Seq(
      DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss"),
      DateTimeFormatter.ofPattern("dd.MM.yyyy HH:mm:ss"),
      DateTimeFormatter.ofPattern("dd.MM.yyyy HH:mm"),
      DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm"),
      DateTimeFormatter.ofPattern("MM/dd/yyyy hh:mm a", java.util.Locale.US),
      DateTimeFormatter.ofPattern("dd MMMM yyyy", java.util.Locale.US),
      DateTimeFormatter.ofPattern("MMMM dd, yyyy", java.util.Locale.US),
      DateTimeFormatter.ofPattern("d MMMM yyyy", ru),
      DateTimeFormatter.ofPattern("dd MMMM yyyy", ru),
      DateTimeFormatter.ofPattern("d MMM yyyy", ru),
      DateTimeFormatter.ofPattern("d MMMM yyyy 'г.'", ru),
      DateTimeFormatter.ofPattern("yyyy.MM.dd"))
    val valid = (0 until 60).flatMap { _ =>
      val dt = LocalDateTime.of(1900 + rng.nextInt(200), 1 + rng.nextInt(12),
        1 + rng.nextInt(28), rng.nextInt(24), rng.nextInt(60), rng.nextInt(60))
      fmts.map(_.format(dt))
    }
    val ruMisses = Seq("1 январь 2012", "32 января 2012", "1 января 12",
      "1 января 2012 г", "января 1 2012", "5 ян. 2019", "1  января  2012",
      "1 Jan 2012 г.", "28 сентября 2012г.")
    valid ++ ruMisses ++ Seq(LocalDate.now.toString)
  }

  test("WIDE kernel bitmask == unguarded formatter walk, per row per format") {
    val all = (adversarial ++ wideCorpus).distinct
    val bad = all.flatMap { v =>
      val m = DateBank.maskWide(
        org.apache.spark.unsafe.types.UTF8String.fromString(v))
      DateBank.formatsWide.indices.collect {
        case i if ((m >> i) & 1) != (if (DateBank.parsesWide(v, i)) 1 else 0) =>
          (v, DateBank.formatsWide(i), (m >> i) & 1)
      }
    }
    assert(bad.isEmpty, s"guard skipped a parseable format or invented a match: $bad")
  }

  test("WIDE bank narrow prefix == narrow mask (bits 0-10 unchanged)") {
    val all = (adversarial ++ wideCorpus).distinct
    val bad = all.filter { v =>
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(v)
      (DateBank.maskWide(u) & 0x7FF) != DateBank.mask(u)
    }
    assert(bad.isEmpty, s"wide/narrow disagree on the shared 11 formats: $bad")
  }

  test("ru month-name families parse: positives land on the right bits") {
    val ruIdx = DateBank.formatsWide.indexOf("d MMMM yyyy (ru)")
    val ruAbbr = DateBank.formatsWide.indexOf("d MMM yyyy (ru)")
    val ruG = DateBank.formatsWide.indexOf("d MMMM yyyy г. (ru)")
    def m(s: String) =
      DateBank.maskWide(org.apache.spark.unsafe.types.UTF8String.fromString(s))
    val janFull = java.time.format.DateTimeFormatter
      .ofPattern("d MMMM yyyy", java.util.Locale.forLanguageTag("ru"))
      .format(java.time.LocalDate.of(2012, 1, 1))
    assert(((m(janFull) >> ruIdx) & 1) == 1, s"'$janFull' must parse (ru full)")
    val sepG = java.time.format.DateTimeFormatter
      .ofPattern("d MMMM yyyy 'г.'", java.util.Locale.forLanguageTag("ru"))
      .format(java.time.LocalDate.of(2012, 9, 28))
    assert(((m(sepG) >> ruG) & 1) == 1, s"'$sepG' must parse (ru г.)")
    val mayAbbr = java.time.format.DateTimeFormatter
      .ofPattern("d MMM yyyy", java.util.Locale.forLanguageTag("ru"))
      .format(java.time.LocalDate.of(2019, 5, 5))
    assert(((m(mayAbbr) >> ruAbbr) & 1) == 1, s"'$mayAbbr' must parse (ru abbr)")
    // English month strings must NOT light the ru bits
    assert(((m("28 January 2023") >> ruIdx) & 1) == 0)
    // and Cyrillic strings must not light the English bits
    val en = DateBank.formatsWide.indexOf("dd MMMM yyyy")
    assert(((m(janFull) >> en) & 1) == 0)
  }

  test("dateFormatScoresWide: one row per wide format, via codegen") {
    val s = spark
    import s.implicits._
    val df = (adversarial ++ wideCorpus).toDF("v")
    val r = UndatumOps.dateFormatScoresWide(df, "v").collect()
    assert(r.length == DateBank.formatsWide.size)
    val byFmt = r.map(x => x.getString(0) -> x.getLong(1)).toMap
    // every wide family generated 60 valid strings; each must score
    assert(byFmt("yyyy-MM-dd'T'HH:mm:ss") >= 60)
    assert(byFmt("d MMMM yyyy (ru)") >= 60)   // "d" also parses the dd form
    assert(byFmt("d MMM yyyy (ru)") >= 60)
    assert(byFmt("d MMMM yyyy г. (ru)") >= 60)
    assert(byFmt("MM/dd/yyyy hh:mm a") >= 60)
    assert(byFmt("yyyy.MM.dd") >= 60)
  }

  test("custom bank still takes the declarative path") {
    val s = spark
    import s.implicits._
    val df = Seq("2023|01|02", "x").toDF("v")
    val r = UndatumOps.dateFormatScores(df, "v", Seq("yyyy|MM|dd")).collect()
    assert(r.length == 1 && r.head.getLong(1) == 1L)
  }
}
