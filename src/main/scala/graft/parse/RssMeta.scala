package graft.parse

import java.time.Instant
import graft.links.HtmlEntities
import graft.url.UrlKit
import graft.score.Rating
import graft.parse.FeedParser.{ParsedFeed, FeedEntryRaw}

/** One exploded feed entry — the "one page → N rows" generator output
  * (reference: webtoolkit/pages.py:131-304). */
final case class FeedEntry(
    link: String,
    source: String,
    title: Option[String],
    description: Option[String],
    author: Option[String],
    album: String,
    thumbnail: Option[String],
    language: Option[String],
    pageRating: Int,
    datePublished: Instant,
    tags: Seq[String],
    bookmarked: Boolean)

/** RSS page semantics over [[FeedParser]]
  * (reference: webtoolkit/pages.py:307-573). */
final class RssMeta(val url: String, contents0: String) {

  /** Contents after the escaped-RSS-in-HTML workaround, when applied. */
  var contents: String = contents0
  var feed: Option[ParsedFeed] = None

  if (contents != null && contents.nonEmpty) {
    feed = FeedParser.parse(contents)
    if (feed.forall(_.entries.isEmpty) &&
        contents.contains("html") && contents.contains("rss")) {
      tryWorkaround()
    }
  }

  /** HTML-escaped RSS embedded in HTML: slice `&lt;rss`…`&gt;`, unescape,
    * reparse (pages.py:346-358). */
  private def tryWorkaround(): Unit = {
    val start = contents.indexOf("&lt;rss")
    val end = contents.lastIndexOf("&gt;")
    if (start == -1 || end == -1 || end <= start) return
    contents = contents.substring(start, end + 4)
    contents = HtmlEntities.unescape(contents)
    feed = FeedParser.parse(contents)
  }

  def title: Option[String] = feed.flatMap(_.channel.title)

  def description: Option[String] =
    feed.flatMap(f => f.channel.description.orElse(f.channel.subtitle))

  def link: Option[String] = feed.flatMap(_.channel.link)

  def language: Option[String] = feed.flatMap(_.channel.language)

  /** image href → url, resolved when not already https (pages.py:452-493). */
  def thumbnail: Option[String] =
    feed.flatMap { f =>
      f.channel.imageHref.orElse(f.channel.imageUrl).map { image =>
        if (!image.toLowerCase.contains("https://"))
          UrlKit.resolve(url, image)
        else image
      }
    }

  def author: Option[String] = feed.flatMap(_.channel.author)

  def datePublished: Option[Instant] =
    feed.flatMap(_.channel.published).flatMap(DateKit.dateStrToDate)

  /** entries>0 ∨ `<feed`/`<rss` token present (pages.py:529-541). */
  def isValid: Boolean =
    feed.exists(_.entries.nonEmpty) ||
      (contents != null &&
        (contents.contains("<feed") || contents.contains("<rss")))

  /** MD5 over the canonicalized entries, else over contents
    * (pages.py:403-422; the reference hashes Python's repr of the
    * feedparser structs — our canonical form is the entry list's fields). */
  def bodyHash: Option[Array[Byte]] = {
    if (contents == null || contents.isEmpty) return None
    feed match {
      case None => None
      case Some(f) =>
        if (f.entries.isEmpty) Hashing.md5(contents)
        else Hashing.md5(f.entries.mkString("|"))
    }
  }

  def charset: Option[String] =
    if (contents != null && contents.contains("encoding")) Some("utf-8")
    else None

  def feeds: Seq[String] = Seq(url)

  /** Positional `<item`/`<entry` → `<link>` text fallback for feeds whose
    * parser yields empty links (pages.py:168-214). */
  private def tryToExtractLink(feedIndex: Int): Option[String] = {
    val c = contents
    val hasItem = c.indexOf("<item") >= 0
    val hasEntry = c.indexOf("<entry") >= 0
    var wh = 0
    var index = 0
    while (index <= feedIndex) {
      if (hasItem) {
        wh = c.indexOf("<item", wh + 1)
        if (wh == -1) return None
      }
      if (hasEntry) {
        wh = c.indexOf("<entry", wh + 1)
        if (wh == -1) return None
      }
      index += 1
    }
    wh = c.indexOf("<link", wh + 1)
    if (wh == -1) return None
    wh = c.indexOf(">", wh + 1)
    if (wh == -1) return None
    val wh2 = c.indexOf("<", wh + 1)
    if (wh2 == -1) return None
    Some(c.substring(wh + 1, wh2))
  }

  /** Entry date: parse published, missing/unparsable/future → `batchTime`
    * (pages.py:254-285 — wall clock replaced by the deterministic batch
    * time parameter). */
  private def entryDate(raw: FeedEntryRaw, batchTime: Instant): Instant = {
    val parsed = raw.published.filter(_.nonEmpty).flatMap(DateKit.parseLoose)
    parsed match {
      case Some(d) if !d.isAfter(batchTime) => d
      case _                                => batchTime
    }
  }

  /** The generator: one [[FeedEntry]] per feed item with inherited
    * language/author, thumbnail cascade, date clamp and rating
    * (pages.py:360-401, 131-304). */
  def entries(batchTime: Instant): Vector[FeedEntry] = {
    val f = feed.getOrElse(return Vector.empty)
    val parentLanguage = language
    val parentAuthor = author
    f.entries.zipWithIndex.flatMap { case (raw, idx) =>
      val link0 = raw.link match {
        case Some("")   => tryToExtractLink(idx)
        case other      => other
      }
      link0.map(_.trim).filter(_.nonEmpty).map { link =>
        val thumb = raw.mediaThumbnail.orElse(raw.mediaContent)
        val auth = raw.author.orElse(parentAuthor)
        val date = entryDate(raw, batchTime)
        val rating = Rating.fromVector(
          Rating.contentVector(raw.title, raw.description.orElse(Some("")),
            parentLanguage, thumb, hasDate = true) ++
            Rating.linkVector(url))
        FeedEntry(
          link = link,
          source = url,
          title = raw.title,
          description = raw.description.orElse(Some("")),
          author = auth,
          album = "",
          thumbnail = thumb,
          language = parentLanguage,
          pageRating = rating,
          datePublished = date,
          tags = raw.tags,
          bookmarked = false)
      }
    }
  }
}
