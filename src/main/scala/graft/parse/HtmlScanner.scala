package graft.parse

import scala.collection.mutable
import graft.links.HtmlEntities

/** Forgiving single-pass HTML tag scanner.
  *
  * Stand-in for the reference's BeautifulSoup usage (reference:
  * webtoolkit/pages.py:717-729) with no external jars: tokenizes tags with
  * lowercased names/attribute keys and entity-decoded attribute values,
  * skips comments/doctype/CDATA, and treats script/style bodies as opaque
  * text — the subset of html.parser behavior the metadata cascades need.
  */
object HtmlScanner {

  /** One parsed tag. `contentStart` is the index just past the `>`. */
  final case class Tag(
      name: String,
      attrs: Map[String, String],
      isClose: Boolean,
      start: Int,
      contentStart: Int)

  private val voidTags = Set(
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr")

  final class Doc(val source: String, val tags: Vector[Tag]) {

    /** First tag with the given (lowercase) name. */
    def find(name: String): Option[Tag] =
      tags.find(t => !t.isClose && t.name == name)

    def findAll(name: String): Vector[Tag] =
      tags.filter(t => !t.isClose && t.name == name)

    /** First tag of `name` whose attribute `attr` equals `value` exactly. */
    def findWithAttr(name: String, attr: String, value: String): Option[Tag] =
      tags.find(t =>
        !t.isClose && t.name == name && t.attrs.get(attr).contains(value))

    /** Tags (any name) that carry the attribute at all. */
    def findAllWithAttrPresent(attr: String): Vector[Tag] =
      tags.filter(t => !t.isClose && t.attrs.contains(attr))

    /** `.string` semantics: the text content when the immediately following
      * tag closes this element; entity-decoded, else None. */
    def text(tag: Tag): Option[String] = {
      val idx = tags.indexOf(tag)
      if (idx < 0) return None
      val nextLt = source.indexOf('<', tag.contentStart)
      val raw =
        if (nextLt >= 0) source.substring(tag.contentStart, nextLt)
        else source.substring(tag.contentStart)
      val nxt = if (idx + 1 < tags.length) Some(tags(idx + 1)) else None
      nxt match {
        case Some(t) if t.isClose && t.name == tag.name =>
          Some(HtmlEntities.unescape(raw))
        case None => Some(HtmlEntities.unescape(raw))
        case _    => None
      }
    }

    /** Index (within `tags`) of the close tag matching an open tag, honoring
      * same-name nesting. -1 when unclosed. */
    def closeIndexOf(openIdx: Int): Int = {
      val name = tags(openIdx).name
      if (voidTags.contains(name)) return openIdx
      var depth = 1
      var i = openIdx + 1
      while (i < tags.length) {
        val t = tags(i)
        if (t.name == name) {
          if (t.isClose) { depth -= 1; if (depth == 0) return i }
          else depth += 1
        }
        i += 1
      }
      -1
    }

    /** All text inside an element (tags stripped, entities decoded) —
      * `get_text()` equivalent for body hashing. */
    def innerText(openIdx: Int): String = {
      val open = tags(openIdx)
      val closeIdx = closeIndexOf(openIdx)
      val endPos =
        if (closeIdx > openIdx) tags(closeIdx).start else source.length
      val sb = new StringBuilder
      var pos = open.contentStart
      var i = openIdx + 1
      while (i < tags.length && tags(i).start < endPos) {
        val t = tags(i)
        if (t.start > pos) sb.append(source.substring(pos, t.start))
        pos = math.max(pos, t.contentStart)
        i += 1
      }
      if (endPos > pos) sb.append(source.substring(pos, endPos))
      HtmlEntities.unescape(sb.toString)
    }
  }

  /** One-entry per-thread memo of the last parse, keyed by String
    * IDENTITY (`eq`, never `equals` — no scan of the text). The fetch
    * path parses the same page text twice on the same partition thread —
    * once for the charset sniff inside the fetch client (X14), once for
    * page recognition — and the identical String instance flows between
    * the two, so this turns the second full tag scan into a hit. Pure
    * function + identity key ⇒ no semantic risk; holds at most one
    * (text, doc) pair per live thread. */
  private val lastParse = new ThreadLocal[(String, Doc)]

  def parse(source: String): Doc = {
    val cached = lastParse.get()
    if (cached != null && (cached._1 eq source)) return cached._2
    val doc = doParse(source)
    lastParse.set((source, doc))
    doc
  }

  private def doParse(source: String): Doc = {
    val tags = Vector.newBuilder[Tag]
    val n = source.length
    var i = 0
    var skipUntilClose: String = null // inside <script>/<style>
    while (i < n) {
      val lt = source.indexOf('<', i)
      if (lt < 0) { i = n }
      else if (skipUntilClose != null) {
        // only honor the matching close tag inside script/style bodies
        if (regionMatchesIgnoreCase(source, lt + 1, "/" + skipUntilClose)) {
          val gt = source.indexOf('>', lt)
          tags += Tag(skipUntilClose, Map.empty, isClose = true, lt,
            if (gt >= 0) gt + 1 else n)
          skipUntilClose = null
          i = if (gt >= 0) gt + 1 else n
        } else i = lt + 1
      } else if (lt + 1 >= n) { i = n }
      else {
        val c = source.charAt(lt + 1)
        if (c == '!' || c == '?') {
          // comment / doctype / CDATA / processing instruction
          if (regionMatchesIgnoreCase(source, lt, "<!--")) {
            val end = source.indexOf("-->", lt)
            i = if (end >= 0) end + 3 else n
          } else {
            val gt = source.indexOf('>', lt)
            i = if (gt >= 0) gt + 1 else n
          }
        } else if (c == '/' || c.isLetter) {
          parseTag(source, lt) match {
            case Some(tag) =>
              tags += tag
              if (!tag.isClose && (tag.name == "script" || tag.name == "style"))
                skipUntilClose = tag.name
              i = tag.contentStart
            case None => i = lt + 1
          }
        } else i = lt + 1
      }
    }
    new Doc(source, tags.result())
  }

  private def regionMatchesIgnoreCase(s: String, at: Int, probe: String): Boolean =
    at + probe.length <= s.length &&
      s.regionMatches(true, at, probe, 0, probe.length)

  private def parseTag(source: String, lt: Int): Option[Tag] = {
    val n = source.length
    var i = lt + 1
    val isClose = source.charAt(i) == '/'
    if (isClose) i += 1
    val nameStart = i
    while (i < n && (source.charAt(i).isLetterOrDigit ||
        source.charAt(i) == ':' || source.charAt(i) == '-' ||
        source.charAt(i) == '_')) i += 1
    if (i == nameStart) return None
    val name = source.substring(nameStart, i).toLowerCase
    val attrs = mutable.LinkedHashMap[String, String]()
    var done = false
    while (!done && i < n) {
      while (i < n && source.charAt(i).isWhitespace) i += 1
      if (i >= n) done = true
      else source.charAt(i) match {
        case '>' => done = true
        case '/' => i += 1
        case _ =>
          val keyStart = i
          while (i < n && !source.charAt(i).isWhitespace &&
              source.charAt(i) != '=' && source.charAt(i) != '>' &&
              source.charAt(i) != '/') i += 1
          val key = source.substring(keyStart, i).toLowerCase
          while (i < n && source.charAt(i).isWhitespace) i += 1
          if (i < n && source.charAt(i) == '=') {
            i += 1
            while (i < n && source.charAt(i).isWhitespace) i += 1
            if (i < n && (source.charAt(i) == '"' || source.charAt(i) == '\'')) {
              val quote = source.charAt(i)
              val vStart = i + 1
              val vEnd = source.indexOf(quote, vStart)
              if (vEnd < 0) {
                attrs(key) = HtmlEntities.unescape(source.substring(vStart))
                i = n
              } else {
                attrs(key) = HtmlEntities.unescape(source.substring(vStart, vEnd))
                i = vEnd + 1
              }
            } else {
              val vStart = i
              while (i < n && !source.charAt(i).isWhitespace &&
                  source.charAt(i) != '>') i += 1
              attrs(key) = HtmlEntities.unescape(source.substring(vStart, i))
            }
          } else if (key.nonEmpty) attrs(key) = ""
      }
    }
    val gt = source.indexOf('>', i)
    val contentStart =
      if (i < n && source.charAt(i) == '>') i + 1
      else if (gt >= 0) gt + 1
      else n
    Some(Tag(name, attrs.toMap, isClose, lt, contentStart))
  }
}
