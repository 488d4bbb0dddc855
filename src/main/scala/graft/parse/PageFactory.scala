package graft.parse

import java.time.Instant
import java.sql.Timestamp
import graft.http.ContentTypes
import graft.model.PageMeta
import graft.score.Rating

/** Content-type-ordered page recognition — cheapest likely parser first,
  * validity checks deciding the cascade
  * (reference: webtoolkit/pages.py:1328-1432). */
object PageFactory {

  sealed trait Parsed { def kind: String }
  final case class ParsedHtml(meta: HtmlMeta) extends Parsed { val kind = "html" }
  final case class ParsedRss(meta: RssMeta) extends Parsed { val kind = "rss" }
  final case class ParsedOpml(entries: Vector[OpmlParser.OpmlEntry], url: String)
      extends Parsed { val kind = "opml" }
  final case class ParsedDefault(url: String, contents: String) extends Parsed {
    val kind = "default"
  }

  /** The trial order per suggested content type (pages.py:1339-1432).
    * Media/font responses yield None; unknown types fall back to guessing. */
  def recognize(url: String, headers: Map[String, String],
      text: Option[String]): Option[Parsed] = {
    val contents = text.getOrElse(return None)
    if (contents.isEmpty) return None

    def tryHtml: Option[Parsed] = {
      val m = new HtmlMeta(url, contents)
      if (m.isValidHtml) Some(ParsedHtml(m)) else None
    }
    def tryRss: Option[Parsed] = {
      val m = new RssMeta(url, contents)
      if (m.isValid) Some(ParsedRss(m)) else None
    }
    def tryOpml: Option[Parsed] =
      if (OpmlParser.isValid(contents))
        Some(ParsedOpml(OpmlParser.entries(contents), url))
      else None
    def tryJson: Option[Parsed] = None // JsonPage is never valid (pages.py:79-93)

    if (ContentTypes.isHtml(headers))
      return tryHtml.orElse(tryRss).orElse(tryOpml).orElse(tryJson)
        .orElse(guess(url, contents))
    if (ContentTypes.isRss(headers))
      return tryRss.orElse(tryOpml).orElse(tryHtml).orElse(tryJson)
        .orElse(guess(url, contents))
    if (ContentTypes.isJson(headers))
      return tryJson.orElse(tryRss).orElse(tryHtml)
        .orElse(guess(url, contents))
    if (ContentTypes.contains(headers, "image") ||
        ContentTypes.contains(headers, "audio") ||
        ContentTypes.contains(headers, "video") ||
        ContentTypes.contains(headers, "font")) return None
    guess(url, contents)
  }

  /** Unknown content type: guess in html→rss→opml→json order, then the
    * throw-nothing default page (pages.py:1404-1432). */
  private def guess(url: String, contents: String): Option[Parsed] = {
    val html = new HtmlMeta(url, contents)
    if (html.isValidHtml) return Some(ParsedHtml(html))
    val rss = new RssMeta(url, contents)
    if (rss.isValid) return Some(ParsedRss(rss))
    if (OpmlParser.isValid(contents))
      return Some(ParsedOpml(OpmlParser.entries(contents), url))
    Some(ParsedDefault(url, contents))
  }

  /** Flatten a parsed page into the wide [[PageMeta]] struct
    * (the §3.2 properties projection). */
  def toPageMeta(url: String, parsed: Option[Parsed]): PageMeta =
    parsed match {
      case Some(ParsedHtml(m)) =>
        PageMeta(
          link = url,
          title = m.title,
          description = m.description,
          author = m.author,
          album = None,
          thumbnail = m.thumbnail,
          language = Some(m.language),
          pageRating = Rating.htmlRating(url, m),
          datePublished = m.datePublished.map(Timestamp.from),
          tags = m.tags,
          linkCanonical = m.canonicalUrl.orElse(Some(url)),
          metaTitle = m.metaField("title"),
          metaDescription = m.metaField("description"),
          ogTitle = m.ogField("title"),
          ogDescription = m.ogField("description"),
          ogSiteName = m.ogField("site_name"),
          ogLocale = m.ogField("locale"),
          ogImage = m.ogField("image"),
          charset = m.charset,
          feeds = m.feeds,
          favicons = m.favicons,
          contentsLength = Some(m.contents.length.toLong),
          pageType = "html",
          bodyHashHex = m.bodyHash.map(Hashing.toHex))
      case Some(ParsedRss(m)) =>
        PageMeta(
          link = url,
          title = m.title,
          description = m.description,
          author = m.author,
          album = None,
          thumbnail = m.thumbnail,
          language = m.language,
          pageRating = Rating.contentRating(url, m.title, m.description,
            m.language, m.thumbnail, m.datePublished.isDefined),
          datePublished = m.datePublished.map(Timestamp.from),
          tags = None,
          linkCanonical = Some(url),
          metaTitle = None, metaDescription = None, ogTitle = None,
          ogDescription = None, ogSiteName = None, ogLocale = None,
          ogImage = None,
          charset = m.charset,
          feeds = m.feeds,
          favicons = Map.empty,
          contentsLength = Option(m.contents).map(_.length.toLong),
          pageType = "rss",
          bodyHashHex = m.bodyHash.map(Hashing.toHex))
      case Some(ParsedOpml(entries, u)) =>
        PageMeta(u, None, None, None, None, None, None, 0, None, None,
          Some(u), None, None, None, None, None, None, None, None,
          entries.map(_.url), Map.empty, None, "opml", None)
      case Some(ParsedDefault(u, contents)) =>
        PageMeta(u, None, None, None, None, None, None, 0, None, None,
          Some(u), None, None, None, None, None, None, None, None,
          Seq.empty, Map.empty, Some(contents.length.toLong), "default",
          Hashing.md5(contents).map(Hashing.toHex))
      case None =>
        PageMeta(url, None, None, None, None, None, None, 0, None, None,
          Some(url), None, None, None, None, None, None, None, None,
          Seq.empty, Map.empty, None, "none", None)
      case Some(other) =>
        toPageMeta(url, None).copy(pageType = other.kind)
    }
}
