package graft.links

import scala.util.matching.Regex
import graft.url.UrlKit

/** Link extraction from page content — the engine's generator ("one page row
  * → N link rows", exploded in the crawl loop).
  *
  * Behavior parity with the reference's content link parser
  * (reference: webtoolkit/contentlinkparser.py): three scans (raw regex,
  * HTML-entity-encoded regex, href attributes), suspicious-char truncation,
  * invalid-link removal. The reference computes but discards a final
  * `is_web_link` filter (contentlinkparser.py:42-47 returns the pre-filter
  * set) — reproduced here; frontier admission applies that filter later.
  */
object LinkExtractor {

  private val rawPatterns: Map[String, Regex] = Map(
    "https" -> raw"(https?://[a-zA-Z0-9./\-_?&=#;:]+)".r,
    "http" -> raw"(http?://[a-zA-Z0-9./\-_?&=#;:]+)".r)

  private val encodedPatterns: Map[String, Regex] = Map(
    "https" -> raw"(https?:&#x2F;&#x2F;[a-zA-Z0-9./\-_?&=#;:]+)".r,
    "http" -> raw"(http?:&#x2F;&#x2F;[a-zA-Z0-9./\-_?&=#;:]+)".r)

  /** Plain `https?://…` scan; trailing dots stripped
    * (contentlinkparser.py:90-98). */
  def linksRaw(contents: String, protocol: String = "https"): Set[String] =
    rawPatterns(protocol).findAllIn(contents)
      .map(_.reverse.dropWhile(_ == '.').reverse).toSet

  /** Entity-encoded `https?:&#x2F;&#x2F;…` scan, decoded after match.
    * Returns a Seq — the reference returns a list here, duplicates intact
    * (contentlinkparser.py:100-110). */
  def linksEncoded(contents: String, protocol: String = "https"): Seq[String] =
    encodedPatterns(protocol).findAllIn(contents)
      .map(_.reverse.dropWhile(_ == '.').reverse)
      .map(HtmlEntities.unescape).toSeq

  private val hrefPattern = raw"""href="([a-zA-Z0-9./\-_?&=@#;:]+)""".r
  private val schemePrefix = raw"^[a-zA-Z0-9]+:".r
  private val userAtPrefix = raw"^[a-zA-Z0-9]+@".r

  /** href attribute scan with per-item normalization
    * (contentlinkparser.py:123-141). */
  def linksHref(pageUrl: String, contents: String): Set[String] = {
    val url = pageUrl match {
      case null => null
      case u    => UrlKit.noArgLink(u).orNull
    }
    val domain = UrlKit.domainFull(url).orNull
    hrefPattern.findAllMatchIn(contents)
      .flatMap(m => processAhrefItem(url, domain, m.group(1))).toSet
  }

  private def isLinkValid(link: String): Boolean =
    link != null && link.nonEmpty &&
      !Set("http://", "https://", "ftp://", "smb://").contains(link)

  private def joinUrlParts(a0: String, b0: String): String = {
    val a = if (a0.endsWith("/")) a0 else a0 + "/"
    val b = if (b0.startsWith("/")) b0.substring(1) else b0
    a + b
  }

  /** Normalize one href: strip mailto:/tel:-style schemes, `//`→https,
    * `/`→domain join, strip `user@`, relative→page join, https default,
    * entity decode (contentlinkparser.py:143-201). */
  def processAhrefItem(url: String, domain0: String, item0: String): Option[String] = {
    var item = item0.trim
    if (schemePrefix.findFirstIn(item).isDefined &&
        !item.startsWith("http") && !item.startsWith("ftp") &&
        !item.startsWith("smb")) {
      item = item.substring(item.indexOf(':') + 1)
    }
    if (item.startsWith("//") && !item.startsWith("http"))
      item = "https:" + item
    if (item.startsWith("/")) {
      if (!isLinkValid(domain0)) return None
      item = joinUrlParts(domain0, item)
    }
    if (userAtPrefix.findFirstIn(item).isDefined)
      item = item.substring(item.indexOf('@') + 1)
    if (!item.startsWith("http") && !item.startsWith("ftp") &&
        !item.startsWith("smb")) {
      val dom = UrlKit.domainOnly("https://" + item).orNull
      if (!isLinkValid(dom)) return None
      if (dom.count(_ == '.') <= 0) {
        if (!isLinkValid(url)) return None
        item = joinUrlParts(url, item)
      }
    }
    if (!item.startsWith("http") && !item.startsWith("ftp") &&
        !item.startsWith("smb")) {
      item = "https://" + item
    }
    if (item.startsWith("https:&#x2F;&#x2F") || item.startsWith("http:&#x2F;&#x2F"))
      item = HtmlEntities.unescape(item)
    Some(item)
  }

  /** Truncate at the first of `"`, `<`, `>`, `&quot;`, `&gt;`, `&lt;`
    * — in that scan order — then trim (contentlinkparser.py:49-72). */
  def filterSuspicious(links: Set[String]): Set[String] =
    links.map { item0 =>
      var item = item0
      Seq("\"", "<", ">", "&quot;", "&gt;", "&lt;").foreach { marker =>
        val wh = item.indexOf(marker)
        if (wh != -1) item = item.substring(0, wh)
      }
      item.trim
    }

  /** Drop null/empty/bare-scheme artifacts (contentlinkparser.py:74-88). */
  def filterInvalid(links: Set[String]): Set[String] =
    links -- Set(null, "", "http", "https", "http://", "https://")

  /** The full union scan (contentlinkparser.py:30-47). */
  def links(pageUrl: String, contents: String): Set[String] = {
    val all = linksRaw(contents, "https") ++ linksEncoded(contents, "https") ++
      linksRaw(contents, "http") ++ linksEncoded(contents, "http") ++
      linksHref(pageUrl, contents)
    filterInvalid(filterSuspicious(all))
  }

  def filterLinkHtml(links: Set[String]): Set[String] =
    links.filter(UrlKit.isWebpageLink)

  /** Substring containment, not prefix — quirk of the reference
    * (contentlinkparser.py:212-222). */
  def filterInDomain(links: Set[String], domain: String): Set[String] =
    if (!isLinkValid(domain)) Set.empty
    else links.filter(_.contains(domain))

  def filterOutDomain(links: Set[String], domain: String): Set[String] =
    if (!isLinkValid(domain)) Set.empty
    else links.filterNot(_.contains(domain))

  /** Page-internal webpage links (contentlinkparser.py:299-304). */
  def linksInner(pageUrl: String, contents: String): Set[String] = {
    val pageNoArg = UrlKit.noArgLink(pageUrl).orNull
    val dom = UrlKit.domainFull(pageNoArg).orNull
    filterInDomain(filterLinkHtml(links(pageUrl, contents)), dom)
  }

  /** External webpage links (contentlinkparser.py:306-313). */
  def linksOuter(pageUrl: String, contents: String): Set[String] = {
    val pageNoArg = UrlKit.noArgLink(pageUrl).orNull
    val dom = UrlKit.domainFull(pageNoArg).orNull
    val html = filterLinkHtml(links(pageUrl, contents))
    html -- filterInDomain(html, dom)
  }

  /** Distinct valid domains of all extracted links
    * (contentlinkparser.py:254-281). */
  def domains(pageUrl: String, contents: String): Set[String] = {
    val out = links(pageUrl, contents).flatMap { link =>
      val dom = UrlKit.domainFull(link).orNull
      if (!isLinkValid(dom)) None
      else if (dom == "https://" || dom == "http://") None
      else if (!UrlKit.isWebLink(link)) None
      else Some(dom)
    }
    filterInvalid(out)
  }

  /** Deterministic array form for the Spark explode path: sorted so the
    * crawl order is a pure function of content, not of set iteration. */
  def extractLinksSorted(pageUrl: String, contents: String): Array[String] =
    links(pageUrl, contents).toArray.sorted
}
