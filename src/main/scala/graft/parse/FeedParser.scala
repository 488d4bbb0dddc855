package graft.parse

import scala.collection.mutable
import graft.links.HtmlEntities

/** Tolerant RSS/Atom feed scanner.
  *
  * Plays the role of the reference's vendored feedparser ("BruteFeedParser",
  * webtoolkit/pages.py:307-423): no XML validation, CDATA-aware element
  * text, namespaced fallbacks (itunes:author, dc:creator, media:thumbnail),
  * channel metadata + ordered entries. Field precedence mirrors what the
  * reference's fixtures exercise (tests/unit/test_rsspage.py).
  */
object FeedParser {

  final case class FeedEntryRaw(
      link: Option[String],
      title: Option[String],
      description: Option[String],
      published: Option[String],
      author: Option[String],
      mediaThumbnail: Option[String],
      mediaContent: Option[String],
      tags: Seq[String])

  final case class FeedChannel(
      title: Option[String],
      description: Option[String],
      subtitle: Option[String],
      link: Option[String],
      language: Option[String],
      imageHref: Option[String],
      imageUrl: Option[String],
      author: Option[String],
      published: Option[String],
      tags: Seq[String])

  final case class ParsedFeed(channel: FeedChannel, entries: Vector[FeedEntryRaw])

  // ---------------------------------------------------------------- helpers

  private def indexOfIgnoreCase(s: String, probe: String, from: Int): Int = {
    var i = math.max(from, 0)
    val limit = s.length - probe.length
    while (i <= limit) {
      if (s.regionMatches(true, i, probe, 0, probe.length)) return i
      i += 1
    }
    -1
  }

  /** Start index of each `<name` occurrence followed by space/'>'/'/'
    * (case-insensitive, like feedparser). */
  private def elementStarts(content: String, name: String): Vector[Int] = {
    val out = Vector.newBuilder[Int]
    val probe = "<" + name
    var i = indexOfIgnoreCase(content, probe, 0)
    while (i >= 0) {
      val after = i + probe.length
      if (after >= content.length || content.charAt(after).isWhitespace ||
          content.charAt(after) == '>' || content.charAt(after) == '/')
        out += i
      i = indexOfIgnoreCase(content, probe, i + 1)
    }
    out.result()
  }

  /** (contentStart, contentEnd) of the first `name` element at/after `from`,
    * or None. Self-closing elements yield an empty span. */
  private def elementSpan(content: String, name: String, from: Int,
      until: Int): Option[(Int, Int)] = {
    val starts = elementStarts(content, name).filter(s => s >= from && s < until)
    starts.headOption.flatMap { s =>
      val gt = content.indexOf('>', s)
      if (gt < 0 || gt >= until) None
      else if (content.charAt(gt - 1) == '/') Some((gt + 1, gt + 1))
      else {
        val close = indexOfIgnoreCase(content, "</" + name, gt)
        if (close < 0 || close > until) Some((gt + 1, until))
        else Some((gt + 1, close))
      }
    }
  }

  /** Element text: CDATA unwrapped, else entity-decoded; trimmed. */
  private def elementText(content: String, name: String, from: Int,
      until: Int): Option[String] =
    elementSpan(content, name, from, until).map { case (s, e) =>
      decodeText(content.substring(s, e))
    }.filter(_.nonEmpty)

  def decodeText(raw0: String): String = {
    val raw = raw0.trim
    if (raw.startsWith("<![CDATA[")) {
      val end = raw.lastIndexOf("]]>")
      if (end >= 0) raw.substring(9, end).trim else raw.substring(9).trim
    } else HtmlEntities.unescape(raw).trim
  }

  /** First attribute value of the first `name` element in a range. */
  private def elementAttr(content: String, name: String, attr: String,
      from: Int, until: Int): Option[String] = {
    elementStarts(content, name).filter(s => s >= from && s < until)
      .headOption.flatMap { s =>
        val gt = content.indexOf('>', s)
        if (gt < 0) None
        else attrOf(content.substring(s, gt + 1), attr)
      }
  }

  private val attrRe = raw"""([a-zA-Z0-9:_-]+)\s*=\s*("([^"]*)"|'([^']*)')""".r

  private def attrOf(tag: String, attr: String): Option[String] =
    attrRe.findAllMatchIn(tag)
      .find(_.group(1).equalsIgnoreCase(attr))
      .map(m => Option(m.group(3)).getOrElse(m.group(4)))
      .map(HtmlEntities.unescape)

  private def allElementAttrs(content: String, name: String, attr: String,
      from: Int, until: Int): Seq[String] =
    elementStarts(content, name).filter(s => s >= from && s < until).flatMap { s =>
      val gt = content.indexOf('>', s)
      if (gt < 0) None else attrOf(content.substring(s, gt + 1), attr)
    }

  // ----------------------------------------------------------------- parse

  def parse(contents: String): Option[ParsedFeed] = {
    if (contents == null || contents.isEmpty) return None
    val itemStarts = elementStarts(contents, "item")
    val entryStarts = elementStarts(contents, "entry")
    val isAtom = itemStarts.isEmpty && entryStarts.nonEmpty
    val starts = if (isAtom) entryStarts else itemStarts
    val entryTag = if (isAtom) "entry" else "item"

    val channelEnd = if (starts.nonEmpty) starts.head else contents.length
    val channel = parseChannel(contents, channelEnd)

    val entries = starts.map { s =>
      val gt = contents.indexOf('>', s)
      val close = contents.indexOf("</" + entryTag, s)
      val until = if (close >= 0) close else contents.length
      parseEntry(contents, if (gt >= 0) gt + 1 else s, until, isAtom)
    }
    if (channel == FeedChannel(None, None, None, None, None, None, None,
        None, None, Nil) && entries.isEmpty) {
      // nothing feed-shaped at all
      val lower = contents.toLowerCase
      if (!lower.contains("<rss") && !lower.contains("<feed") &&
          !lower.contains("<rdf")) return None
    }
    Some(ParsedFeed(channel, entries.toVector))
  }

  private def parseChannel(c: String, until: Int): FeedChannel = {
    // channel region: everything before the first item/entry; the <image>
    // block nests its own title/link, but the channel's appear first.
    val imageSpan = elementSpan(c, "image", 0, until)
    val imageUrl = imageSpan.flatMap { case (s, e) => elementText(c, "url", s, e) }
    FeedChannel(
      title = elementText(c, "title", 0, until),
      description = elementText(c, "description", 0, until),
      subtitle = elementText(c, "subtitle", 0, until),
      link = elementText(c, "link", 0, until)
        .orElse(elementAttr(c, "atom:link", "href", 0, until))
        .orElse(elementAttr(c, "link", "href", 0, until)),
      language = elementText(c, "language", 0, until),
      imageHref = elementAttr(c, "itunes:image", "href", 0, until),
      imageUrl = imageUrl,
      author = authorOf(c, 0, until),
      published = elementText(c, "pubdate", 0, until)
        .orElse(elementText(c, "published", 0, until)),
      tags = allElementAttrs(c, "category", "term", 0, until) ++
        elementTexts(c, "category", 0, until))
  }

  private def elementTexts(c: String, name: String, from: Int,
      until: Int): Seq[String] =
    elementStarts(c, name).filter(s => s >= from && s < until).flatMap { s =>
      elementText(c, name, s, until)
    }

  private def authorOf(c: String, from: Int, until: Int): Option[String] = {
    // Atom <author><name>…</name></author>, else plain text forms.
    elementSpan(c, "author", from, until).flatMap { case (s, e) =>
      elementText(c, "name", s, e).orElse {
        val t = decodeText(c.substring(s, e))
        if (t.nonEmpty && !t.contains("<")) Some(t) else None
      }
    }
      .orElse(elementText(c, "dc:creator", from, until))
      .orElse(elementText(c, "itunes:author", from, until))
  }

  private def parseEntry(c: String, from: Int, until: Int,
      isAtom: Boolean): FeedEntryRaw = {
    val link =
      if (isAtom)
        elementAttr(c, "link", "href", from, until)
          .orElse(elementText(c, "link", from, until))
      else
        elementSpan(c, "link", from, until).map { case (s, e) =>
          decodeText(c.substring(s, e))
        } // keep "" so the positional fallback can trigger
    FeedEntryRaw(
      link = link,
      title = elementText(c, "title", from, until),
      description = elementText(c, "description", from, until)
        .orElse(elementText(c, "summary", from, until)),
      published = elementText(c, "pubdate", from, until)
        .orElse(elementText(c, "published", from, until))
        .orElse(elementText(c, "dc:date", from, until))
        .orElse(elementText(c, "updated", from, until)),
      author = authorOf(c, from, until),
      mediaThumbnail = elementAttr(c, "media:thumbnail", "url", from, until),
      mediaContent = elementAttr(c, "media:content", "url", from, until),
      tags = allElementAttrs(c, "category", "term", from, until) ++
        elementTexts(c, "category", from, until))
  }
}
