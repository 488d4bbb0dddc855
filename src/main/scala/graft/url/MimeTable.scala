package graft.url

/** Frozen extension → MIME-type table.
  *
  * The reference classifies URLs through Python's `mimetypes.guess_type`
  * (reference: webtoolkit/urllocation.py:259-274). That stdlib table is
  * environment data, not code, so it is snapshotted here verbatim (captured
  * from the same interpreter the reference's unit tests pass under —
  * e.g. avi → video/x-msvideo per tests/unit/test_urllocation.py:947-950)
  * to keep the URL-seen set stable across environments.
  *
  * Behavioral quirks reproduced from `mimetypes.guess_type` on a URL string:
  *   - the extension is taken from the basename (text after the last '/'),
  *     after the last '.' in it; no dot or a leading-dot-only name → no type;
  *   - a query string or fragment is NOT stripped ("a.jpg?x=1" → no match);
  *   - matching is case-insensitive;
  *   - encoding suffixes (.gz/.bz2/.xz/.br/.Z) are stripped first and the
  *     remaining extension is looked up ("a.tar.gz" → application/x-tar).
  */
object MimeTable {
  private val encodingSuffixes = Set("gz", "bz2", "xz", "br", "z")

  val extToMime: Map[String, String] = Map(
    // images
    "jpg" -> "image/jpeg", "jpeg" -> "image/jpeg", "jpe" -> "image/jpeg",
    "png" -> "image/png", "gif" -> "image/gif", "webp" -> "image/webp",
    "bmp" -> "image/bmp", "tiff" -> "image/tiff", "tif" -> "image/tiff",
    "avif" -> "image/avif", "heic" -> "image/heic", "heif" -> "image/heif",
    "ico" -> "image/vnd.microsoft.icon", "svg" -> "image/svg+xml",
    "svgz" -> "image/svg+xml",
    // audio
    "mp3" -> "audio/mpeg", "ogg" -> "audio/ogg", "oga" -> "audio/ogg",
    "opus" -> "audio/ogg", "wav" -> "audio/x-wav", "flac" -> "audio/flac",
    "aac" -> "audio/aac", "m4a" -> "audio/mp4", "mid" -> "audio/sp-midi",
    "3gp" -> "audio/3gpp", "3gpp" -> "audio/3gpp",
    // video
    "mp4" -> "video/mp4", "avi" -> "video/x-msvideo", "webm" -> "video/webm",
    "mkv" -> "video/x-matroska", "mov" -> "video/quicktime",
    "wmv" -> "video/x-ms-wmv", "flv" -> "video/x-flv",
    "mpg" -> "video/mpeg", "mpeg" -> "video/mpeg", "ogv" -> "video/ogg",
    // text / web
    "html" -> "text/html", "htm" -> "text/html",
    "xhtml" -> "application/xhtml+xml",
    "js" -> "text/javascript", "mjs" -> "text/javascript",
    "css" -> "text/css", "txt" -> "text/plain", "md" -> "text/markdown",
    "markdown" -> "text/markdown", "csv" -> "text/csv",
    "xml" -> "application/xml", "rss" -> "application/x-rss+xml",
    "atom" -> "application/atom+xml", "json" -> "application/json",
    "webmanifest" -> "application/manifest+json",
    "py" -> "text/x-python", "sh" -> "text/x-sh", "c" -> "text/x-csrc",
    "h" -> "text/x-chdr", "sql" -> "application/sql",
    // documents
    "pdf" -> "application/pdf", "doc" -> "application/msword",
    "docx" -> "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    "xls" -> "application/vnd.ms-excel",
    "ppt" -> "application/vnd.ms-powerpoint",
    "epub" -> "application/epub+zip",
    // archives / binaries
    "zip" -> "application/zip", "tar" -> "application/x-tar",
    "7z" -> "application/x-7z-compressed", "rar" -> "application/vnd.rar",
    "iso" -> "application/x-iso9660-image",
    "bin" -> "application/octet-stream", "so" -> "application/octet-stream",
    "o" -> "application/octet-stream", "a" -> "application/octet-stream",
    "obj" -> "application/octet-stream",
    "exe" -> "application/x-msdos-program",
    "dll" -> "application/x-msdos-program",
    "bat" -> "application/x-msdos-program",
    "com" -> "application/x-msdos-program",
    "apk" -> "application/vnd.android.package-archive",
    "deb" -> "application/vnd.debian.binary-package",
    "rpm" -> "application/x-redhat-package-manager",
    "jar" -> "application/java-archive",
    "swf" -> "application/vnd.adobe.flash.movie",
    // fonts
    "woff" -> "font/woff", "woff2" -> "font/woff2",
    "ttf" -> "font/ttf", "otf" -> "font/otf",
    "eot" -> "application/vnd.ms-fontobject",
    // misc
    "m3u8" -> "application/vnd.apple.mpegurl",
    "ts" -> "text/vnd.trolltech.linguist"
  )

  /** Equivalent of `mimetypes.guess_type(url)[0] or ""` on a URL string. */
  def guessType(url: String): String = {
    if (url == null) return ""
    val base0 = url.substring(url.lastIndexOf('/') + 1)
    // strip encoding suffix (.gz etc.) like mimetypes does
    val base = {
      val d = base0.lastIndexOf('.')
      if (d > 0 && encodingSuffixes.contains(base0.substring(d + 1).toLowerCase))
        base0.substring(0, d)
      else base0
    }
    val dot = base.lastIndexOf('.')
    if (dot <= 0) "" // no extension, or dotfile
    else extToMime.getOrElse(base.substring(dot + 1).toLowerCase, "")
  }
}
