package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar validators from the reference's validate command, as pure
  * Scala functions + Column builders (SURVEY.md §2.8).
  */
object Validators {

  /** Email shape — reference accepts anything parseaddr yields an
    * '@' for (undatum/validate/commonrules.py:5-6); we use a stricter
    * practical shape.
    */
  def isEmailCol(c: Column): Column =
    c.rlike("^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$")

  /** URL shape (undatum/validate/commonrules.py:8-9 via `validators`). */
  def isUrlCol(c: Column): Column =
    c.rlike("^(https?|ftp)://[^\\s/$.?#].[^\\s]*$")

  /** Russian tax id (INN) checksum — weighted mod-11-mod-10 digit
    * checks (undatum/validate/ruscodes.py:104-134).
    */
  def isValidInn(s: String): Boolean = {
    if (s == null || !s.forall(_.isDigit)) return false
    val d = s.map(_ - '0')
    def check(weights: Seq[Int]): Int =
      weights.zip(d).map { case (w, x) => w * x }.sum % 11 % 10
    s.length match {
      case 10 => check(Seq(2, 4, 10, 3, 5, 9, 4, 6, 8)) == d(9)
      case 12 =>
        check(Seq(7, 2, 4, 10, 3, 5, 9, 4, 6, 8)) == d(10) &&
          check(Seq(3, 7, 2, 4, 10, 3, 5, 9, 4, 6, 8)) == d(11)
      case _ => false
    }
  }

  /** OGRN/OGRNIP checksum (undatum/validate/ruscodes.py:136-150):
    * 13-digit mod 11, 15-digit mod 13, of the leading digits, low
    * digit must equal the last digit.
    */
  def isValidOgrn(s: String): Boolean = {
    if (s == null || !s.forall(_.isDigit)) return false
    s.length match {
      case 13 => (BigInt(s.take(12)) % 11 % 10) == BigInt(s.takeRight(1))
      case 15 => (BigInt(s.take(14)) % 13 % 10) == BigInt(s.takeRight(1))
      case _ => false
    }
  }

  val innUdf = udf(isValidInn _)
  val ogrnUdf = udf(isValidOgrn _)
}
