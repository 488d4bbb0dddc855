package graft.parse

import java.time._
import java.time.format.{DateTimeFormatter, DateTimeFormatterBuilder}
import java.time.temporal.ChronoField
import java.util.Locale
import scala.util.matching.Regex

/** Loose date parsing with the reference's UTC quirk.
  *
  * The reference parses with `dateutil.parser` and then *replaces* the zone
  * with UTC instead of converting (reference:
  * webtoolkit/utils/dateutils.py:24-26) — "2024-05-10T09:04:54-07:00"
  * becomes 09:04:54 UTC, not 16:04. All functions here therefore extract the
  * local wall-clock fields and stamp them UTC.
  */
object DateKit {

  private def fmt(pattern: String): DateTimeFormatter =
    new DateTimeFormatterBuilder()
      .parseCaseInsensitive()
      .appendPattern(pattern)
      .parseDefaulting(ChronoField.HOUR_OF_DAY, 0)
      .parseDefaulting(ChronoField.MINUTE_OF_HOUR, 0)
      .parseDefaulting(ChronoField.SECOND_OF_MINUTE, 0)
      .toFormatter(Locale.US)

  // Ordered format list covering the shapes the reference's fixtures use:
  // ISO-8601, RFC-822/1123 (RSS pubDate), bare dates, "Jan 15, 2024" styles.
  private val formats: Seq[DateTimeFormatter] = Seq(
    fmt("yyyy-MM-dd'T'HH:mm:ss[.SSS][XXX]"),
    fmt("yyyy-MM-dd'T'HH:mm:ss[.SSS][X]"),
    fmt("yyyy-MM-dd'T'HH:mm:ssXX"),
    fmt("yyyy-MM-dd'T'HH:mm:ss"),
    fmt("yyyy-MM-dd HH:mm:ss[XXX]"),
    fmt("yyyy-MM-dd HH:mm:ss"),
    fmt("yyyy-MM-dd"),
    fmt("yyyy/MM/dd"),
    fmt("EEE, dd MMM yyyy HH:mm:ss zzz"),
    fmt("EEE, dd MMM yyyy HH:mm:ss XX"),
    fmt("EEE, dd MMM yyyy HH:mm:ss"),
    fmt("EEE, dd MMM yyyy HH:mm zzz"),
    fmt("dd MMM yyyy HH:mm:ss zzz"),
    fmt("dd MMM yyyy HH:mm:ss"),
    fmt("dd MMM yyyy HH:mm zzz"),
    fmt("dd MMM yyyy HH:mm"),
    fmt("dd MMM yyyy"),
    fmt("dd MMMM yyyy HH:mm zzz"),
    fmt("dd MMMM yyyy HH:mm"),
    fmt("dd MMMM yyyy"),
    fmt("MMM d, yyyy"),
    fmt("MMM. d, yyyy"),
    fmt("MMMM d, yyyy"),
    fmt("MMM d yyyy"),
    fmt("yyyy MMM d"))

  /** Parse a date string; zone information is discarded and the local
    * fields are stamped UTC (the `to_utc_date` replace-not-convert quirk). */
  def parseLoose(s0: String): Option[Instant] = {
    if (s0 == null) return None
    val s = s0.trim
    if (s.isEmpty) return None
    formats.foreach { f =>
      try {
        val parsed = f.parse(s)
        val date = LocalDate.from(parsed)
        val time =
          try LocalTime.from(parsed)
          catch { case _: Exception => LocalTime.MIDNIGHT }
        return Some(LocalDateTime.of(date, time).toInstant(ZoneOffset.UTC))
      } catch { case _: Exception => }
    }
    None
  }

  /** `date_str_to_date` — strips a "Published:" prefix then parses loose
    * (reference: webtoolkit/webtools.py:150-176). */
  def dateStrToDate(s0: String): Option[Instant] = {
    if (s0 == null || s0.isEmpty) return None
    var s = s0
    val wh = s.indexOf("Published:")
    if (wh >= 0) {
      val colon = s.indexOf(':', wh)
      s = s.substring(colon + 1).trim
    }
    parseLoose(s)
  }

  private val monthNames: Map[String, Int] = Map(
    "jan" -> 1, "feb" -> 2, "mar" -> 3, "apr" -> 4, "may" -> 5, "jun" -> 6,
    "jul" -> 7, "aug" -> 8, "sep" -> 9, "oct" -> 10, "nov" -> 11, "dec" -> 12,
    "january" -> 1, "february" -> 2, "march" -> 3, "april" -> 4, "june" -> 6,
    "july" -> 7, "august" -> 8, "september" -> 9, "october" -> 10,
    "november" -> 11, "december" -> 12)

  private val monthRe =
    "(jan(?:uary)?|feb(?:ruary)?|mar(?:ch)?|apr(?:il)?|may|jun(?:e)?|jul(?:y)?|aug(?:ust)?|sep(?:tember)?|oct(?:ober)?|nov(?:ember)?|dec(?:ember)?)\\.?"

  private val isoPattern: Regex = raw"(\d{4})-(\d{1,2})-(\d{1,2})".r
  private val usPattern: Regex = (raw"(\d{4})\s*" + monthRe + raw"\s*(\d{1,2})").r
  private val us2Pattern: Regex = (monthRe + raw"\s*(\d{1,2})\s*(\d{4})").r
  private val uePattern: Regex = (raw"(\d{1,2})\s*" + monthRe + raw"\s*(\d{4})").r
  private val monthDayPattern: Regex = ("\\b" + monthRe + raw"\s*(\d+)\b").r
  private val fourDigit: Regex = raw"\b\d{4}\b".r

  /** `guess_date` — find a year anchor in free text, then try 5 date shapes
    * in a ±15/20-char scope (reference: webtoolkit/contentinterface.py:213-344).
    * `now` is a parameter, not wall clock, for deterministic replay. */
  def guessDate(content0: String, now: Instant): Option[Instant] = {
    if (content0 == null || content0.isEmpty) return None
    val content = content0.toLowerCase
    val currentYear = now.atZone(ZoneOffset.UTC).getYear
    val currentYearRe = ("\\b" + currentYear.toString + "\\b").r

    val (year, scope) = currentYearRe.findFirstMatchIn(content) match {
      case Some(m) =>
        (currentYear,
          content.substring(math.max(0, m.start - 15),
            math.min(content.length, m.start + 20)))
      case None =>
        fourDigit.findFirstMatchIn(content) match {
          case Some(m) =>
            (m.matched.toInt,
              content.substring(math.max(0, m.start - 15),
                math.min(content.length, m.start + 20)))
          case None => return None
        }
    }
    guessByScope(scope, year)
  }

  private def guessByScope(scope: String, year: Int): Option[Instant] = {
    isoPattern.findFirstMatchIn(scope).flatMap { m =>
      mkDate(m.group(1).toInt, m.group(2).toInt, m.group(3).toInt)
    }.orElse(usPattern.findFirstMatchIn(scope).flatMap { m =>
      monthNames.get(m.group(2)).flatMap(mo =>
        mkDate(m.group(1).toInt, mo, m.group(3).toInt))
    }).orElse(us2Pattern.findFirstMatchIn(scope).flatMap { m =>
      monthNames.get(m.group(1)).flatMap(mo =>
        mkDate(m.group(3).toInt, mo, m.group(2).toInt))
    }).orElse(uePattern.findFirstMatchIn(scope).flatMap { m =>
      monthNames.get(m.group(2)).flatMap(mo =>
        mkDate(m.group(3).toInt, mo, m.group(1).toInt))
    }).orElse(monthDayPattern.findFirstMatchIn(scope).flatMap { m =>
      monthNames.get(m.group(1)).flatMap(mo =>
        mkDate(year, mo, m.group(2).toInt))
    })
  }

  private def mkDate(y: Int, m: Int, d: Int): Option[Instant] =
    try Some(LocalDate.of(y, m, d).atStartOfDay.toInstant(ZoneOffset.UTC))
    catch { case _: Exception => None }
}
