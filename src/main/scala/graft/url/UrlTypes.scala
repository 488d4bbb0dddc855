package graft.url

/** URL type enum strings.
  *
  * Mirrors the reference's page-type constants
  * (reference: webtoolkit/webtools.py:36-42).
  */
object UrlTypes {
  val Rss        = "rss"
  val Css        = "css"
  val Javascript = "javascript"
  val Html       = "html"
  val Font       = "font"
  val File       = "file"
  val Unknown    = "unknown"
}
