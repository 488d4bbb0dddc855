package graft.handlers

import graft.url.UrlKit

/** Site-specific handler dispatch — ordered first-match-wins
  * (reference: webtoolkit/baseurl.py:111-132 "Order is important" and
  * baseurl.py:280-317; per-handler semantics under webtoolkit/handlers/).
  *
  * In the engine this is a pure per-row function: URL in →
  * (handler, code, possibly-rewritten URL, canonical URL, feed URLs,
  * social-API URL) out. The multi-fetch behaviors (YouTube handle → feed
  * discovery second round, compound-source merge) are expressed as extra
  * crawl-loop rounds, not hidden I/O.
  */
object Handlers {

  final case class HandlerResult(
      name: String,
      url: String, // after any handler rewrite (baseurl.py:305)
      code: Option[String],
      canonicalUrl: Option[String],
      feeds: Seq[String],
      socialApiUrl: Option[String])

  /** Ordered dispatch (baseurl.py:117-132). Returns None for onion, empty
    * and non-http-ish unhandled URLs. */
  def dispatch(url: String): Option[HandlerResult] = {
    if (url == null || url.isEmpty) return None
    if (UrlKit.isOnion(url)) return None
    val protocolless = UrlKit.protocolless(url)
    if (protocolless.isEmpty) return None

    youTubeVideo(url)
      .orElse(odyseeVideo(url))
      .orElse(odyseeChannel(url))
      .orElse(reddit(url))
      .orElse(returnDislike(url))
      .orElse(gitHub(url))
      .orElse(hackerNews(url))
      .orElse(internetArchive(url))
      .orElse(fourChan(url))
      .orElse(twitter(url))
      .orElse(youTubeChannel(url))
      .orElse {
        if (url.startsWith("https") || url.startsWith("http"))
          Some(HandlerResult("HttpPageHandler", url, None, None, Seq.empty, None))
        else None // smb/ftp: NotImplemented in the reference (baseurl.py:316)
      }
  }

  // ---- YouTube video (handlers/handlervideoyoutube.py) ----

  private def youTubeVideo(url: String): Option[HandlerResult] = {
    val pl = UrlKit.protocolless(url)
    val watch = Seq("www.youtube.com/watch", "youtube.com/watch",
      "m.youtube.com/watch").exists(pl.startsWith)
    val shorts = Seq("www.youtube.com/shorts", "youtube.com/shorts",
      "m.youtube.com/shorts").exists(pl.startsWith)
    val be = pl.startsWith("youtu.be/") && pl.length > "youtu.be/".length
    if (!watch && !shorts && !be) return None
    val code = youTubeVideoCode(url)
    Some(HandlerResult(
      name = "YouTubeVideoHandler",
      url = url,
      code = code,
      canonicalUrl = code.map(c => s"https://www.youtube.com/watch?v=$c"),
      feeds = Seq.empty,
      socialApiUrl =
        code.map(c => s"https://returnyoutubedislikeapi.com/votes?videoId=$c")))
  }

  /** watch?v= / shorts/ / youtu.be/ extraction
    * (handlervideoyoutube.py:72-113). */
  def youTubeVideoCode(url: String): Option[String] = {
    if (url == null) return None
    if (url.contains("watch") && url.contains("v="))
      UrlKit.paramsFirst(url).get("v")
    else if (url.contains("shorts")) {
      val wh = url.indexOf("shorts")
      val q = url.indexOf('?', wh)
      Some(if (q >= 0) url.substring(wh + 7, q) else url.substring(wh + 7))
    } else if (url.contains("youtu.be")) {
      val wh = url.indexOf("youtu.be")
      val q = url.indexOf('?', wh)
      Some(if (q >= 0) url.substring(wh + 9, q) else url.substring(wh + 9))
    } else None
  }

  // ---- Odysee video (handlers/handlervideoodysee.py) ----

  private def odyseeVideo(url: String): Option[HandlerResult] = {
    val pl = UrlKit.protocolless(url)
    val handled =
      if (pl.startsWith("odysee.com/@")) {
        val wh1 = pl.indexOf('@')
        pl.indexOf('/', wh1 + 1) >= 0
      } else if (pl.startsWith("odysee.com/$")) false
      else pl.startsWith("odysee.com/")
    if (!handled) return None
    val lines = pl.split("/", -1)
    if (pl.startsWith("odysee.com/@") && lines.length >= 3) {
      val channelCode = lines(1)
      var videoCode = lines(2)
      val q = videoCode.indexOf('?')
      if (q >= 0) videoCode = videoCode.substring(0, q)
      val rewritten = s"https://odysee.com/$channelCode/$videoCode"
      Some(HandlerResult("OdyseeVideoHandler", rewritten, Some(videoCode),
        Some(rewritten), Seq(s"https://odysee.com/$$/rss/$channelCode"), None))
    } else if (lines.length >= 2) {
      val videoCode = lines(1)
      val rewritten = s"https://odysee.com/$videoCode"
      Some(HandlerResult("OdyseeVideoHandler", rewritten, Some(videoCode),
        Some(rewritten), Seq.empty, None))
    } else None
  }

  // ---- Odysee channel (handlers/handlerchannelodysee.py) ----

  private def odyseeChannel(url: String): Option[HandlerResult] = {
    val pl = UrlKit.protocolless(url)
    if (!pl.startsWith("odysee.com/@") && !pl.startsWith("odysee.com/$/rss"))
      return None
    val lines = pl.split("/", -1)
    val code =
      if (url.contains("https://odysee.com/$/rss/") && lines.length >= 4)
        Some(stripQuery(lines(3)))
      else if (lines.length >= 2) Some(stripQuery(lines(1)))
      else None
    Some(HandlerResult("OdyseeChannelHandler", url, code,
      code.map(c => s"https://odysee.com/$c"),
      code.map(c => s"https://odysee.com/$$/rss/$c").toSeq, None))
  }

  private def stripQuery(s: String): String = {
    val q = s.indexOf('?')
    if (q >= 0) s.substring(0, q) else s
  }

  // ---- Reddit (handlers/handlers.py:10-172) ----

  private def reddit(url: String): Option[HandlerResult] = {
    val dom = UrlKit.domainOnly(url).getOrElse(return None)
    if (!dom.contains("reddit.com")) return None
    val parts = UrlKit.split(url)
    if (parts.length >= 7 && parts(3) == "r" && parts(5) == "comments") {
      val subreddit = parts(4); val postId = parts(6)
      Some(HandlerResult("RedditUrlHandler", url, Some(postId), None,
        Seq(s"https://www.reddit.com/r/$subreddit/.rss"),
        Some(s"https://www.reddit.com/$postId.json")))
    } else if (parts.length >= 5 && parts(3) == "r") {
      val subreddit = parts(4)
      Some(HandlerResult("RedditUrlHandler", url, Some(subreddit), None,
        Seq(s"https://www.reddit.com/r/$subreddit/.rss"),
        Some(s"https://www.reddit.com/r/$subreddit/.json")))
    } else None
  }

  // ---- ReturnDislike votes API (handlers/handlers.py:289-356) ----

  private def returnDislike(url: String): Option[HandlerResult] =
    if (url.contains("https://returnyoutubedislikeapi.com/votes?videoId"))
      Some(HandlerResult("ReturnDislike", url, None, None, Seq.empty, None))
    else None

  // ---- GitHub (handlers/handlers.py:175-286) ----

  private def gitHub(url: String): Option[HandlerResult] = {
    val dom = UrlKit.domainOnly(url).getOrElse(return None)
    val parts = UrlKit.split(url)
    val code =
      if (dom.contains("api.github.com")) {
        if (parts.length >= 6) Some((parts(4), parts(5))) else None
      } else if (dom.contains("github.com")) {
        if (parts.length >= 5) Some((parts(3), parts(4))) else None
      } else return None
    code.map { case (owner, repo) =>
      HandlerResult("GitHubUrlHandler", url, Some(s"$owner/$repo"), None,
        Seq(s"https://github.com/$owner/$repo/commits.atom",
          s"https://github.com/$owner/$repo/releases.atom"),
        Some(s"https://api.github.com/repos/$owner/$repo"))
    }
  }

  // ---- HackerNews (handlers/handlers.py:359-437) ----

  private def hackerNews(url: String): Option[HandlerResult] = {
    val dom = UrlKit.domainOnly(url).getOrElse(return None)
    if (!dom.contains("news.ycombinator.com")) return None
    val parts = UrlKit.split(url)
    if (parts.length >= 5) {
      val sp = parts(4).split("=", -1)
      if (sp.length > 1) {
        val postId = sp(1)
        return Some(HandlerResult("HackerNewsHandler", url, Some(postId),
          None, Seq.empty,
          Some(s"https://hacker-news.firebaseio.com/v0/item/$postId.json?print=pretty")))
      }
    }
    None
  }

  // ---- Internet Archive (handlers/handlers.py:440-455) ----

  private def internetArchive(url: String): Option[HandlerResult] = {
    val dom = UrlKit.domainOnly(url).getOrElse(return None)
    if (dom.contains("archive.org"))
      Some(HandlerResult("InternetArchive", url, None, None, Seq.empty, None))
    else None
  }

  def archiveUrlFor(url: String): String =
    "https://web.archive.org/web/*/" + url

  // ---- 4chan (handlers/handlers.py:458-508) ----

  private def fourChan(url: String): Option[HandlerResult] = {
    val dom = UrlKit.domainOnly(url).getOrElse(return None)
    if (!dom.contains("4chan.org")) return None
    val parts = UrlKit.split(url)
    val code = if (parts.length >= 4) Some(parts(3)) else None
    Some(HandlerResult("FourChanChannelHandler", url, code, None, Seq.empty,
      None))
  }

  // ---- Twitter / X (handlers/handlers.py:511-539) ----

  private def twitter(url: String): Option[HandlerResult] = {
    if (!url.contains("https://x.com") && !url.contains("https://twitter.com"))
      return None
    val wh = url.indexOf("?ref_src=")
    val rewritten = if (wh >= 0) url.substring(0, wh) else url
    Some(HandlerResult("TwitterUrlHandler", rewritten, None, None, Seq.empty,
      None))
  }

  // ---- YouTube channel (handlers/handlerchannelyoutube.py) ----

  private val ytHosts = Seq("www.youtube.com", "youtube.com", "m.youtube.com")

  private def startsWithAny(pl: String, suffix: String): Boolean =
    ytHosts.exists(h => pl.startsWith(h + suffix))

  private def youTubeChannel(url: String): Option[HandlerResult] = {
    val pl = UrlKit.protocolless(url)
    val isChannel = startsWithAny(pl, "/channel")
    val isFeed = startsWithAny(pl, "/feeds")
    val isName = startsWithAny(pl, "/@") || startsWithAny(pl, "/user") ||
      startsWithAny(pl, "/c/")
    if (!isChannel && !isFeed && !isName) return None
    val code = youTubeChannelCode(url)
    val canonical =
      if (url.contains("feeds")) Some(url)
      else code.map(c => s"https://www.youtube.com/channel/$c")
    Some(HandlerResult("YouTubeChannelHandler", url, code, canonical,
      code.map(c =>
        s"https://www.youtube.com/feeds/videos.xml?channel_id=$c").toSeq,
      None))
  }

  /** /channel/<id> or /feeds/…=<id>; name forms need a fetch round
    * (handlerchannelyoutube.py:115-182). */
  def youTubeChannelCode(url: String): Option[String] = {
    if (!url.contains("youtube.com")) return None
    val pl = UrlKit.protocolless(url)
    if (startsWithAny(pl, "/@") || startsWithAny(pl, "/user") ||
        startsWithAny(pl, "/c/")) return None
    if (url.contains("/channel/")) {
      val path = UrlKit.noArgLink(url).getOrElse(url)
      val parts = UrlKit.protocolless(path).split("/", -1).filter(_.nonEmpty)
      val idx = parts.indexOf("channel")
      if (idx >= 0 && idx + 1 < parts.length) Some(parts(idx + 1)) else None
    } else if (url.contains("/feeds/")) {
      val wh = url.indexOf('=')
      if (wh >= 0) Some(url.substring(wh + 1)) else None
    } else None
  }
}
