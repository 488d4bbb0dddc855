package graft.score

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Keyword-count content moderation
  * (reference: webtoolkit/contentmoderation.py). Both plain-Scala forms (for
  * the row pipeline) and Column forms (codegen'd, no UDF) are provided.
  */
object Moderation {

  val pornKeywords: Seq[String] =
    Seq("masturbat", "porn", "xxx", "sex", "slutt", "nude", "chaturbat")

  val pornPointKeywords: Seq[String] = Seq("live", "nast", "slut", "webcam")

  val casinoKeywords: Seq[String] = Seq(
    "casino", "lotter", "bingo", "slot", "poker", "jackpot", "gacor",
    "bandar judi", "pagcor", "slotlara kadar", "canli bahis", "terpopuler",
    "deposit")

  val notFoundTitles: Seq[String] = Seq(
    "forbidden", "access denied", "site not found", "page not found",
    "this page could not found", "404 not found", "404: not found",
    "404 not_found", "404 - not found", "404 error", "404 page",
    "404 file not found", "error 404", "purged account", "410 gone",
    "squarespace - website expired", "domain name for sale",
    "account suspended", "the request could not be satisfied")

  val ageKeywords: Seq[String] = Seq(
    "sexua", "lesbian", "bisexual", "queer ", "drag quee", "fuck", "porn",
    "nsfw")

  private def lc(s: String): String = if (s == null) "" else s.toLowerCase

  private def countOccurrences(text: String, keyword: String): Int = {
    var count = 0
    var idx = text.indexOf(keyword)
    while (idx >= 0) { count += 1; idx = text.indexOf(keyword, idx + keyword.length) }
    count
  }

  /** Title-substring heuristics for dead/parked pages
    * (contentmoderation.py:85-115). */
  def isSiteNotFound(title: String): Boolean = {
    val t = lc(title)
    notFoundTitles.exists(t.contains)
  }

  /** Hard keyword in title, or >3 soft points (contentmoderation.py:117-150). */
  def isPornBlocked(title: String): Boolean = {
    val t = lc(title)
    if (pornKeywords.exists(t.contains)) return true
    pornPointKeywords.count(t.contains) > 3
  }

  /** Σ count(keyword in title+desc) > 3 (contentmoderation.py:152-188). */
  def isCasinoBlocked(title: String, description: String): Boolean = {
    val t = lc(title)
    if (t.contains("slot server")) return true
    val text = t + "\n" + lc(description)
    casinoKeywords.map(countOccurrences(text, _)).sum > 3
  }

  def isValid(title: String, description: String): Boolean =
    !isSiteNotFound(title) && !isPornBlocked(title) &&
      !isCasinoBlocked(title, description)

  /** Age requirement: Σ > 1 ⇒ 15, else none (contentmoderation.py:199-228). */
  def age(title: String, description: String): Option[Int] = {
    val text = lc(title) + "\n" + lc(description)
    if (ageKeywords.map(countOccurrences(text, _)).sum > 1) Some(15) else None
  }

  // ---- Column forms: higher-order functions, fully codegen-friendly. ----

  private def countCol(text: Column, keyword: String): Column =
    when(length(lit(keyword)) > 0,
      (length(text) - length(regexp_replace(text,
        java.util.regex.Pattern.quote(keyword), ""))) / length(lit(keyword)))
      .otherwise(0)

  def casinoScoreCol(title: Column, description: Column): Column = {
    val text = concat_ws("\n", lower(coalesce(title, lit(""))),
      lower(coalesce(description, lit(""))))
    casinoKeywords.map(k => countCol(text, k)).reduce(_ + _).cast("int")
  }

  def isCasinoBlockedCol(title: Column, description: Column): Column =
    lower(coalesce(title, lit(""))).contains("slot server") ||
      casinoScoreCol(title, description) > 3

  def isPornBlockedCol(title: Column): Column = {
    val t = lower(coalesce(title, lit("")))
    pornKeywords.map(t.contains(_)).reduce(_ || _) ||
      pornPointKeywords.map(k => when(t.contains(k), 1).otherwise(0))
        .reduce(_ + _) > 3
  }

  def isSiteNotFoundCol(title: Column): Column = {
    val t = lower(coalesce(title, lit("")))
    notFoundTitles.map(t.contains(_)).reduce(_ || _)
  }

  def isValidCol(title: Column, description: Column): Column =
    !isSiteNotFoundCol(title) && !isPornBlockedCol(title) &&
      !isCasinoBlockedCol(title, description)

  def ageCol(title: Column, description: Column): Column = {
    val text = concat_ws("\n", lower(coalesce(title, lit(""))),
      lower(coalesce(description, lit(""))))
    when(ageKeywords.map(k => countCol(text, k)).reduce(_ + _) > 1, 15)
      .otherwise(lit(null).cast("int"))
  }
}
