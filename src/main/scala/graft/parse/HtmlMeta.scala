package graft.parse

import java.time.Instant
import graft.url.UrlKit
import graft.parse.HtmlScanner.{Doc, Tag}

/** HTML metadata extraction — the cascades of the reference's HTML page
  * (reference: webtoolkit/pages.py:705-1291).
  *
  * One parse produces every field; in the engine this backs a single
  * `parseHtml(content) → PageMeta` projection so each page is scanned once.
  */
final class HtmlMeta(val url: String, val contents: String) {
  val doc: Doc = HtmlScanner.parse(if (contents == null) "" else contents)
  private def hasContents: Boolean = contents != null && contents.nonEmpty

  // ---- primitive getters ------------------------------------------------

  /** `<field>text</field>` head-style lookup (pages.py:731-739). */
  def headField(field: String): Option[String] =
    if (!hasContents) None
    else doc.find(field).flatMap(doc.text).filter(_ != "")

  /** `<meta attrType=field content=…>` (pages.py:741-747). */
  def metaCustomField(attrType: String, field: String): Option[String] =
    if (!hasContents) None
    else doc.findWithAttr("meta", attrType, field).flatMap(_.attrs.get("content"))

  def metaField(field: String): Option[String] =
    metaCustomField("name", field)

  def propertyField(name: String): Option[String] =
    metaCustomField("property", name)

  /** Open Graph field (ogp.me; pages.py:803-810). */
  def ogField(name: String): Option[String] =
    propertyField("og:" + name)

  /** First element carrying `itemprop=<name>`: link→href, meta→content,
    * else text (pages.py:749-766). */
  def schemaField(itemprop: String): Option[String] = {
    doc.findAllWithAttrPresent("itemprop")
      .find(_.attrs.get("itemprop").contains(itemprop))
      .flatMap { el =>
        el.name match {
          case "link" => el.attrs.get("href")
          case "meta" => el.attrs.get("content")
          case _      => doc.text(el).map(_.trim)
        }
      }
  }

  /** Scoped variant: first `itemprop` descendant of the first element with
    * the given `itemtype` (pages.py:768-787). */
  def schemaFieldEx(itemtype: String, itemprop: String, field: String): Option[String] = {
    val idx = doc.tags.indexWhere(t =>
      !t.isClose && t.attrs.get("itemtype").contains(itemtype))
    if (idx < 0) return None
    val closeIdx = doc.closeIndexOf(idx)
    val end = if (closeIdx > idx) closeIdx else doc.tags.length
    doc.tags.slice(idx + 1, end)
      .find(t => !t.isClose && t.attrs.get("itemprop").contains(itemprop))
      .flatMap(_.attrs.get(field))
  }

  // ---- cascades ---------------------------------------------------------

  /** og:title → meta[title] → <title> → og:site_name, stripped. The
    * reference computes but drops schema "name" (pages.py:818-819) —
    * reproduced by omission. */
  def title: Option[String] =
    if (!hasContents) None
    else ogField("title")
      .orElse(metaField("title"))
      .orElse(headField("title"))
      .orElse(ogField("site_name"))
      .map(_.trim)

  /** og:description → schema description → meta → head (pages.py:868-886). */
  def description: Option[String] =
    if (!hasContents) None
    else ogField("description")
      .orElse(schemaField("description"))
      .orElse(metaField("description"))
      .orElse(headField("description"))
      .map(_.trim)

  /** article:published_time → music:release_date → schema datePublished
    * (pages.py:836-854), each through the loose parser. */
  def datePublished: Option[Instant] =
    propertyField("article:published_time").flatMap(DateKit.dateStrToDate)
      .orElse(metaField("music:release_date").flatMap(DateKit.dateStrToDate))
      .orElse(schemaField("datePublished").flatMap(DateKit.dateStrToDate))

  /** og:image → schema thumbnailUrl → schema image, resolved against the
    * page when not already https (pages.py:906-924). */
  def thumbnail: Option[String] =
    if (!hasContents) None
    else ogField("image")
      .orElse(schemaField("thumbnailUrl"))
      .orElse(schemaField("image"))
      .map { image =>
        if (!image.toLowerCase.contains("https://"))
          UrlKit.resolve(url, image)
        else image
      }

  /** `<html lang>` → og:locale → "" (pages.py:926-938). */
  def language: String =
    if (!hasContents) ""
    else doc.find("html").flatMap(_.attrs.get("lang"))
      .orElse(ogField("locale"))
      .getOrElse("")

  /** meta charset attr, or http-equiv content-type `charset=` (lowercased)
    * (pages.py:940-959). */
  def charset: Option[String] = {
    if (!hasContents) return None
    doc.findAll("meta").foreach { meta =>
      meta.attrs.get("charset").foreach(v => return Some(v))
      if (meta.attrs.contains("http-equiv")) {
        meta.attrs.get("content").foreach { content =>
          val text = content.toLowerCase
          val wh = text.indexOf("charset")
          if (wh >= 0) {
            val wh2 = text.indexOf('=', wh)
            if (wh2 >= 0) return Some(text.substring(wh2 + 1).trim)
          }
        }
      }
    }
    None
  }

  /** meta author → og author (pages.py:961-972). */
  def author: Option[String] =
    if (!hasContents) None
    else metaField("author").orElse(ogField("author"))

  /** meta keywords, else og:video:tag values comma-joined — note the empty
    * string (not null) when neither exists (pages.py:1016-1035). */
  def tags: Option[String] = {
    if (!hasContents) return None
    metaField("keywords") match {
      case some @ Some(_) => some
      case None =>
        val vals = doc.findAll("meta")
          .filter(_.attrs.get("property").contains("og:video:tag"))
          .flatMap(_.attrs.get("content"))
        Some(vals.mkString(","))
    }
  }

  /** link rel=canonical href, trailing "/" stripped (pages.py:1037-1043). */
  def canonicalUrl: Option[String] =
    doc.findAll("link")
      .find(t => relMatches(t, "canonical"))
      .flatMap(_.attrs.get("href"))
      .map(h => if (h.endsWith("/")) h.dropRight(1) else h)

  private def relMatches(tag: Tag, wanted: String): Boolean =
    tag.attrs.get("rel").exists { rel =>
      val tokens = rel.split("\\s+").toSet
      wanted.split("\\s+").forall(tokens.contains)
    }

  /** rel=icon + rel="shortcut icon" href→sizes map; the reference's `in`
    * check never finds `sizes` (a Tag membership test, pages.py:991), so
    * values are always "" — reproduced. */
  def favicons: Map[String, String] = {
    if (!hasContents) return Map.empty
    val links = doc.findAll("link")
    val icons = links.filter(relMatches(_, "icon")) ++
      links.filter(relMatches(_, "shortcut icon"))
    icons.flatMap { l =>
      l.attrs.get("href") match {
        case Some(h) if h.trim.nonEmpty =>
          Some(UrlKit.resolve(url, h) -> "")
        case _ => None
      }
    }.toMap
  }

  /** Feed discovery: link[type*=application/rss+xml] then atom+xml, hrefs
    * resolved (pages.py:1065-1104). */
  def feeds: Seq[String] = {
    if (!hasContents) return Seq.empty
    def byType(feedType: String): Seq[String] =
      doc.findAll("link")
        .filter(_.attrs.get("type").exists(_.contains(feedType)))
        .flatMap(_.attrs.get("href"))
    (byType("application/rss+xml") ++ byType("application/atom+xml"))
      .map(UrlKit.resolve(url, _))
  }

  /** link rel=manifest href (pages.py:1284-1291). */
  def pwaManifest: Option[String] =
    doc.findAll("link").find(relMatches(_, "manifest")).flatMap(_.attrs.get("href"))

  def isPwa: Boolean = pwaManifest.isDefined

  /** `<body>` text (pages.py:1252-1260). */
  def bodyText: Option[String] = {
    if (!hasContents) return None
    val idx = doc.tags.indexWhere(t => !t.isClose && t.name == "body")
    if (idx < 0) None else Some(doc.innerText(idx))
  }

  /** MD5 of body text, falling back to MD5 of contents (pages.py:1262-1275). */
  def bodyHash: Option[Array[Byte]] = {
    if (!hasContents) return None
    bodyText match {
      case Some(b) => Hashing.md5(b)
      case None    => Hashing.md5(contents)
    }
  }

  /** `<html` before any rss tags, with `<body` or `<meta` present
    * (contentinterface.py:390-402, pages.py:1232-1250). */
  def isValidHtml: Boolean = PageValidity.isContentsHtml(contents)
}
