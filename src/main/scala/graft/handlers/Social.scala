package graft.handlers

/** Social-data extraction from handler side-fetch JSON (A2 / J-5).
  *
  * Reference semantics:
  *   - the tolerant raw-text value scan (reddit comment JSON is not valid
  *     JSON; webtoolkit/handlers/handlers.py:81-96 reads values by
  *     `find('"key"')` → `:` → `,` slicing) — reproduced verbatim;
  *   - per-handler field mapping: ReturnDislike likes/dislikes/viewCount/
  *     rating (webtoolkit/pages.py:1628-1666), Reddit post upvote_ratio +
  *     rating=score (handlers.py:108-144), Reddit subreddit
  *     followers_count=subreddit_subscribers, HN upvote_diff=score
  *     (handlers.py:422-433);
  *   - the derivations upvote_ratio / upvote_diff / upvote_view_ratio
  *     (webtoolkit/handlers/handlerinterface.py:162-184).
  */
object Social {

  final case class SocialData(
      thumbsUp: Option[Long] = None,
      thumbsDown: Option[Long] = None,
      viewCount: Option[Long] = None,
      upvoteRatio: Option[Double] = None,
      rating: Option[Double] = None,
      followersCount: Option[Long] = None,
      upvoteDiff: Option[Long] = None) {

    /** handlerinterface.py:162-184 — derived when both inputs present. */
    def derivedUpvoteRatio: Option[Double] = upvoteRatio.orElse {
      for (up <- thumbsUp; down <- thumbsDown) yield {
        val all = up + down
        if (all == 0) 0.0 else up.toDouble / all
      }
    }

    def derivedUpvoteDiff: Option[Long] = upvoteDiff.orElse {
      for (up <- thumbsUp; down <- thumbsDown) yield up - down
    }

    def upvoteViewRatio: Option[Double] =
      for (up <- thumbsUp; v <- viewCount if v > 0) yield up.toDouble / v
  }

  /** The reference's raw scan (handlers.py:81-96): text after the `:`
    * following `"var"`, up to the next `,`. Returns the trimmed slice. */
  def jsonValueRaw(jsonText: String, key: String): Option[String] = {
    if (jsonText == null) return None
    val whStart = jsonText.indexOf("\"" + key + "\"")
    if (whStart == -1) return None
    val whSemi = jsonText.indexOf(":", whStart)
    if (whSemi == -1) return None
    val whColon = jsonText.indexOf(",", whSemi)
    if (whColon == -1) return None
    Some(jsonText.substring(whSemi + 1, whColon).trim)
  }

  private def longOf(s: Option[String]): Option[Long] =
    s.flatMap(_.toLongOption)
  private def doubleOf(s: Option[String]): Option[Double] =
    s.flatMap(_.toDoubleOption)

  // strict JSON field access (ReturnDislike/HN/GitHub parse real JSON in
  // the reference — json.loads; only reddit needs the raw scan)
  private def jsonField(jsonText: String, key: String): Option[org.json4s.JValue] = {
    val parsed = try org.json4s.jackson.JsonMethods.parse(jsonText)
      catch { case _: Exception => return None }
    parsed \ key match {
      case org.json4s.JNothing | org.json4s.JNull => None
      case v => Some(v)
    }
  }

  private def jsonLong(jsonText: String, key: String): Option[Long] =
    jsonField(jsonText, key).collect {
      case org.json4s.JInt(v)    => v.toLong
      case org.json4s.JLong(v)   => v
      case org.json4s.JDouble(v) => v.toLong
    }

  private def jsonDouble(jsonText: String, key: String): Option[Double] =
    jsonField(jsonText, key).collect {
      case org.json4s.JInt(v)     => v.toDouble
      case org.json4s.JLong(v)    => v.toDouble
      case org.json4s.JDouble(v)  => v
      case org.json4s.JDecimal(v) => v.toDouble
    }

  /** Map a side-fetch body to social data for a given handler. `apiUrl`
    * distinguishes reddit post vs subreddit (post = `/<id>.json`,
    * subreddit = `/r/<sub>/.json`, handlers.py:50-57). */
  def forHandler(handlerName: String, apiUrl: String,
      jsonText: String): SocialData = handlerName match {
    case "YouTubeVideoHandler" | "ReturnDislike" =>
      // proper JSON (pages.py:1628-1666)
      SocialData(
        thumbsUp = jsonLong(jsonText, "likes"),
        thumbsDown = jsonLong(jsonText, "dislikes"),
        viewCount = jsonLong(jsonText, "viewCount"),
        rating = jsonDouble(jsonText, "rating"))
    case "RedditUrlHandler" if apiUrl != null && apiUrl.contains("/r/") =>
      SocialData(followersCount =
        longOf(jsonValueRaw(jsonText, "subreddit_subscribers")))
    case "RedditUrlHandler" =>
      SocialData(
        upvoteRatio = doubleOf(jsonValueRaw(jsonText, "upvote_ratio")),
        rating = doubleOf(jsonValueRaw(jsonText, "score")))
    case "HackerNewsHandler" =>
      // json.loads + social_data["upvote_diff"] = json["score"]
      // (handlers.py:394-433)
      SocialData(upvoteDiff = jsonLong(jsonText, "score"))
    case "GitHubUrlHandler" =>
      SocialData(followersCount = jsonLong(jsonText, "stargazers_count"))
    case _ => SocialData()
  }
}
