package graft.parse

import java.security.MessageDigest
import java.nio.charset.StandardCharsets

/** Cheap token-scan page-type validity checks shared by the parser cascade
  * (reference: webtoolkit/contentinterface.py:390-416). */
object PageValidity {

  /** Position of `<html` when `<body` or `<meta` also present, else -1. */
  def positionOfHtmlTags(contents: String): Int = {
    if (contents == null || contents.isEmpty) return -1
    val lower = contents.toLowerCase
    val html = lower.indexOf("<html")
    if (html >= 0 && lower.contains("<body")) return html
    if (html >= 0 && lower.contains("<meta")) return html
    -1
  }

  /** Position of `<rss`/`<feed`/`<rdf` with their container tags, else -1. */
  def positionOfRssTags(contents: String): Int = {
    if (contents == null || contents.isEmpty) return -1
    val lower = contents.toLowerCase
    if (lower.contains("<rss") && lower.contains("<channel"))
      return lower.indexOf("<rss")
    if (lower.contains("<feed") && lower.contains("<entry"))
      return lower.indexOf("<feed")
    if (lower.contains("<rdf") && lower.contains("<channel"))
      return lower.indexOf("<rdf")
    -1
  }

  /** HTML wins when its tags appear before RSS tags (pages.py:1232-1250). */
  def isContentsHtml(contents: String): Boolean = {
    val html = positionOfHtmlTags(contents)
    val rss = positionOfRssTags(contents)
    if (html >= 0 && rss >= 0) html < rss
    else html >= 0
  }

  /** Captcha fingerprints (contentinterface.py:184-211). */
  private val captchaFingerprints = Seq(
    "google.com/recaptcha", "recaptcha/api.js", "g-recaptcha",
    "hcaptcha.com", "hcaptcha-box", "h-captcha",
    "challenges.cloudflare.com/turnstile", "cf-turnstile")

  def isCaptchaProtected(contents: String): Boolean =
    contents != null && captchaFingerprints.exists(contents.contains)
}

/** MD5 content hashing (reference: webtoolkit/webtools.py:179-204). */
object Hashing {
  /** MD5 digest of UTF-8 text; None for null/empty (the reference returns
    * None for falsy input). */
  def md5(text: String): Option[Array[Byte]] =
    if (text == null || text.isEmpty) None
    else Some(MessageDigest.getInstance("MD5")
      .digest(text.getBytes(StandardCharsets.UTF_8)))

  def md5Binary(binary: Array[Byte]): Option[Array[Byte]] =
    if (binary == null || binary.isEmpty) None
    else Some(MessageDigest.getInstance("MD5").digest(binary))

  def toHex(bytes: Array[Byte]): String =
    bytes.map("%02x".format(_)).mkString
}
