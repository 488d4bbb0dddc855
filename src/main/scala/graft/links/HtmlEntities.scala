package graft.links

/** Minimal HTML entity decoder (numeric + the common named entities).
  *
  * Stands in for Python's `html.unescape` as used by the reference's link
  * decoding (reference: webtoolkit/contentlinkparser.py:120-121) and the
  * escaped-RSS workaround (webtoolkit/pages.py:346-358). The named-entity
  * set covers what the reference's fixtures exercise.
  */
object HtmlEntities {
  private val named: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ", "copy" -> "©",
    "reg" -> "®", "trade" -> "™", "hellip" -> "…",
    "mdash" -> "—", "ndash" -> "–", "lsquo" -> "‘",
    "rsquo" -> "’", "ldquo" -> "“", "rdquo" -> "”",
    "laquo" -> "«", "raquo" -> "»", "deg" -> "°",
    "plusmn" -> "±", "frac12" -> "½", "times" -> "×",
    "divide" -> "÷", "euro" -> "€", "pound" -> "£",
    "yen" -> "¥", "cent" -> "¢", "sect" -> "§",
    "para" -> "¶", "middot" -> "·", "bull" -> "•",
    "dagger" -> "†", "shy" -> "­", "eacute" -> "é",
    "egrave" -> "è", "agrave" -> "à", "ccedil" -> "ç",
    "uuml" -> "ü", "ouml" -> "ö", "auml" -> "ä",
    "szlig" -> "ß", "ntilde" -> "ñ")

  def unescape(s: String): String = {
    if (s == null || s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 12) {
          val body = s.substring(i + 1, semi)
          decodeEntity(body) match {
            case Some(rep) => sb.append(rep); i = semi + 1
            case None      => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def decodeEntity(body: String): Option[String] = {
    if (body.startsWith("#x") || body.startsWith("#X")) {
      val hex = body.substring(2)
      if (hex.nonEmpty && hex.forall(isHexDigit))
        codePointStr(Integer.parseInt(hex, 16))
      else None
    } else if (body.startsWith("#")) {
      val dec = body.substring(1)
      if (dec.nonEmpty && dec.forall(_.isDigit))
        try codePointStr(dec.toInt) catch { case _: Exception => None }
      else None
    } else named.get(body)
  }

  private def codePointStr(cp: Int): Option[String] =
    if (cp >= 0 && cp <= 0x10ffff) Some(new String(Character.toChars(cp)))
    else None

  private def isHexDigit(c: Char): Boolean =
    c.isDigit || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
}
