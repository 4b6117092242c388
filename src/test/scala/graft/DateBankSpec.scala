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

  test("custom bank still takes the declarative path") {
    val s = spark
    import s.implicits._
    val df = Seq("2023|01|02", "x").toDF("v")
    val r = UndatumOps.dateFormatScores(df, "v", Seq("yyyy|MM|dd")).collect()
    assert(r.length == 1 && r.head.getLong(1) == 1L)
  }
}
