package graft.score

import graft.url.UrlKit

/** Page/link rating arithmetic — pure per-row scoring
  * (reference: webtoolkit/contentinterface.py:97-148, 418-455 and
  * webtoolkit/pages.py:1161-1219).
  */
object Rating {

  /** `(Σ score / Σ max) · 100` as int; 0 when either sum is 0
    * (contentinterface.py:97-121). */
  def fromVector(vec: Seq[(Int, Int)]): Int = {
    val total = vec.map(_._1).sum
    val max = vec.map(_._2).sum
    if (total == 0 || max == 0) 0
    else ((total.toDouble * 100.0) / max.toDouble).toInt
  }

  /** Base content vector: title 10, description 5, language 1, thumbnail 1,
    * date 1 — each only when present and non-empty
    * (contentinterface.py:123-148). */
  def contentVector(
      title: Option[String], description: Option[String],
      language: Option[String], thumbnail: Option[String],
      hasDate: Boolean): Seq[(Int, Int)] = {
    val out = Seq.newBuilder[(Int, Int)]
    if (title.exists(_.nonEmpty)) out += ((10, 10))
    if (description.exists(_.nonEmpty)) out += ((5, 5))
    if (language.exists(_.nonEmpty)) out += ((1, 1))
    if (thumbnail.exists(_.nonEmpty)) out += ((1, 1))
    if (hasDate) out += ((1, 1))
    out.result()
  }

  /** Link-quality vector: https 1, is-domain 1, dot-count bucket 2, length
    * bucket 2 (contentinterface.py:418-455). */
  def linkVector(url: String): Seq[(Int, Int)] = {
    val out = Seq.newBuilder[(Int, Int)]
    if (url.startsWith("https://") || url.startsWith("ftp://") ||
        url.startsWith("smb://")) out += ((1, 1))
    else out += ((0, 1))
    if (UrlKit.isDomain(url)) out += ((1, 1))
    UrlKit.domainOnly(url) match {
      case None | Some("") => out += ((0, 2))
      case Some(dom) =>
        dom.count(_ == '.') match {
          case 1 => out += ((2, 2))
          case 2 => out += ((1, 2))
          case _ => out += ((0, 2))
        }
    }
    if (url.length < 25) out += ((2, 2))
    else if (url.length < 30) out += ((1, 2))
    else out += ((0, 2))
    out.result()
  }

  /** Generic content rating = content vector + link vector. */
  def contentRating(
      url: String, title: Option[String], description: Option[String],
      language: Option[String], thumbnail: Option[String],
      hasDate: Boolean): Int =
    fromVector(contentVector(title, description, language, thumbnail,
      hasDate) ++ linkVector(url))

  /** HTML variant: meta/og titles length-bucketed, og-image 5, date 3
    * (pages.py:1161-1219). */
  def htmlVector(
      titleMeta: Option[String], titleOg: Option[String],
      descriptionMeta: Option[String], descriptionOg: Option[String],
      language: Option[String], author: Option[String], tags: Option[String],
      hasDate: Boolean, imageOg: Option[String]): Seq[(Int, Int)] = {
    def titleRating(t: Option[String]): (Int, Int) = t match {
      case None => (0, 10)
      case Some(title) =>
        if (title.length > 1000) (5, 10)
        else if (title.split(" ").length < 2) (5, 10)
        else if (title.length < 4) (2, 10)
        else (10, 10)
    }
    def descRating(d: Option[String]): (Int, Int) =
      if (d.isDefined) (5, 5) else (0, 5)
    // language: +5 when non-null (even ""), +1 when it contains "en"
    // (pages.py:1212-1219 — max recorded as 5, so "en" can overshoot)
    def langRating(l: Option[String]): (Int, Int) = l match {
      case None => (0, 5)
      case Some(lang) => (5 + (if (lang.contains("en")) 1 else 0), 5)
    }
    val out = Seq.newBuilder[(Int, Int)]
    out += titleRating(titleMeta)
    out += titleRating(titleOg)
    out += descRating(descriptionMeta)
    out += descRating(descriptionOg)
    out += langRating(language)
    if (author.isDefined) out += ((1, 1))
    if (tags.isDefined) out += ((1, 1))
    if (hasDate) out += ((3, 3))
    if (imageOg.exists(_.nonEmpty)) out += ((5, 5))
    out.result()
  }

  def htmlRating(url: String, meta: graft.parse.HtmlMeta): Int = {
    val vec = htmlVector(
      titleMeta = meta.metaField("title"),
      titleOg = meta.ogField("title"),
      descriptionMeta = meta.metaField("description"),
      descriptionOg = meta.ogField("description"),
      language = Some(meta.language),
      author = meta.author,
      tags = meta.tags,
      hasDate = meta.datePublished.isDefined,
      imageOg = meta.ogField("image"))
    fromVector(vec ++ linkVector(url))
  }
}
