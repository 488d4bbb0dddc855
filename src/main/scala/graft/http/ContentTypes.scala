package graft.http

/** Header-map content-type semantics
  * (reference: webtoolkit/response.py:25-176, 297-369). */
object ContentTypes {

  /** Case-insensitive single-header lookup (the reference probes the
    * canonical then lowercase spelling; we accept any casing). */
  def header(headers: Map[String, String], name: String): Option[String] =
    headers.get(name).orElse {
      headers.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }
    }

  def contentType(headers: Map[String, String]): Option[String] =
    header(headers, "Content-Type")

  /** `text/html; charset=x` → Seq("text","html") with `+` treated as `/`
    * (response.py:61-68). */
  def contentTypeKeys(headers: Map[String, String]): Option[Seq[String]] =
    contentType(headers).map { ct0 =>
      var ct = ct0
      val semi = ct.indexOf(';')
      if (semi >= 0) ct = ct.substring(0, semi)
      ct.replace("+", "/").split("/", -1).toSeq
    }

  /** charset from Content-Type with quote/comma handling
    * (response.py:107-127). */
  def charset(headers: Map[String, String]): Option[String] =
    contentType(headers).flatMap { content =>
      content.split(";", -1).collectFirst {
        case element if element.toLowerCase.contains("charset") &&
            element.contains("=") =>
          var cs = element.split("=", -1)(1)
          if (cs.startsWith("\"") || cs.startsWith("'"))
            cs = cs.substring(1, math.max(1, cs.length - 1))
          val comma = cs.indexOf(',')
          if (comma >= 0) cs = cs.substring(0, comma)
          cs
      }
    }

  def isHtml(headers: Map[String, String]): Boolean =
    contentType(headers).exists(_.toLowerCase.contains("html"))

  def isImage(headers: Map[String, String]): Boolean =
    contentType(headers).exists(_.toLowerCase.contains("image"))

  /** rss OR xml both count as feed-ish (response.py:145-153). */
  def isRss(headers: Map[String, String]): Boolean =
    contentType(headers).exists { c =>
      val l = c.toLowerCase
      l.contains("rss") || l.contains("xml")
    }

  def isJson(headers: Map[String, String]): Boolean =
    contentType(headers).exists(_.toLowerCase.contains("json"))

  /** text | application | xml anywhere (response.py:357-369). */
  def isText(contentTypeValue: String): Boolean =
    contentTypeValue != null &&
      (contentTypeValue.contains("text") ||
        contentTypeValue.contains("application") ||
        contentTypeValue.contains("xml"))

  def contains(headers: Map[String, String], token: String): Boolean =
    contentType(headers).exists(_.toLowerCase.contains(token))

  def contentLength(headers: Map[String, String]): Option[Long] =
    header(headers, "Content-Length").flatMap(_.trim.toLongOption)

  def redirectUrl(headers: Map[String, String]): Option[String] =
    header(headers, "Location").filter(_.nonEmpty)
}
