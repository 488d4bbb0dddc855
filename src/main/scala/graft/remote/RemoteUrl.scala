package graft.remote

import java.sql.Timestamp
import org.json4s._

import graft.http.Statuses
import graft.model.{FetchRequest, FetchResponse}
import graft.parse.DateKit

/** S12: property reader over the remote crawl result (reference
  * remoteurl.py:23-288) — a URL whose crawling happened on the buddy;
  * this side only reads sections. Fetches `/api/get` lazily on first
  * access (or operates on pre-fetched `allProperties`), coerces
  * `date_published` strings through the loose date parser exactly like
  * the reference, and exposes the same accessor surface. */
final class RemoteUrl(
    val url: String,
    server: RemoteServer,
    request: Option[FetchRequest] = None,
    allProperties0: Option[JValue] = None,
    socialProperties0: Option[JValue] = None) {

  private var allPropertiesOpt: Option[JValue] = allProperties0
  private var socialPropertiesOpt: Option[JValue] = socialProperties0

  /** The raw section list (lazy; remoteurl.py:68-78,122-127). */
  def allProperties: Option[JValue] = {
    if (allPropertiesOpt.isEmpty)
      allPropertiesOpt = server.getGetJ(url = Some(url), request = request)
    allPropertiesOpt
  }

  /** Streams responses, insertion-ordered (remoteurl.py:68-78). */
  def responses: Map[String, FetchResponse] =
    allProperties.map(RemoteServer.getResponses).getOrElse(Map.empty)

  /** The primary response (remoteurl.py:80-86). */
  def response: Option[FetchResponse] =
    allProperties.flatMap(RemoteServer.getResponse)

  def text: Option[String] = response.flatMap(_.text)
  def binary: Option[Array[Byte]] =
    response.map(_.body).filter(b => b != null && b.nonEmpty)

  /** Properties section with date_published coerced (remoteurl.py:100-120). */
  def properties: Map[String, JValue] = allProperties
    .flatMap(RemoteServer.readPropertiesSection("Properties", _)) match {
    case Some(JObject(fields)) => fields.toMap
    case _                     => Map.empty
  }

  private def strProp(name: String): Option[String] =
    properties.get(name) match {
      case Some(JString(s)) => Some(s)
      case _                => None
    }

  def title: Option[String] = strProp("title")
  def description: Option[String] = strProp("description")
  def language: Option[String] = strProp("language")
  def thumbnail: Option[String] = strProp("thumbnail")
  def author: Option[String] = strProp("author")
  def album: Option[String] = strProp("album")
  def canonicalLink: Option[String] = strProp("link_canonical")
  def tags: Option[Seq[String]] = properties.get("tags") match {
    case Some(JArray(vs)) =>
      Some(vs.collect { case JString(s) => s })
    case _ => None
  }
  def datePublished: Option[Timestamp] =
    strProp("date_published").flatMap(DateKit.dateStrToDate)
      .map(Timestamp.from)

  def statusCode: Option[Int] = response.map(_.status)
  def isValid: Boolean = response.exists(r => Statuses.isValid(r.status))
  def isInvalid: Boolean = response.exists(r => Statuses.isInvalid(r.status))

  /** Entries section, date-coerced per entry (remoteurl.py:206-225).
    * Reads only PRE-FETCHED properties — the reference never triggers a
    * remote /api/get from here and returns [] when nothing was fetched. */
  def entries: Seq[Map[String, JValue]] = allPropertiesOpt
    .flatMap(RemoteServer.readPropertiesSection("Entries", _)) match {
    case Some(JArray(es)) => es.collect { case JObject(fields) =>
      fields.toMap.map {
        case ("date_published", JString(s)) =>
          "date_published" -> (DateKit.dateStrToDate(s)
            .map(t => JString(t.toString): JValue)
            .getOrElse(JString(s)))
        case kv => kv
      }
    }
    case _ => Seq.empty
  }

  /** Feeds: from the Properties section when pre-fetched, else the
    * dedicated /api/feeds endpoint (remoteurl.py:227-246). */
  def feeds: Set[String] = {
    val fromProps =
      if (allPropertiesOpt.nonEmpty) properties.get("feeds") match {
        case Some(JArray(vs)) => Some(vs.collect { case JString(s) => s })
        case _                => None
      } else None
    fromProps.map(_.toSet).getOrElse {
      if (allPropertiesOpt.nonEmpty) Set.empty
      else server.getFeedsJ(url = Some(url)).flatMap(_ \ "feeds" match {
        case JArray(vs) => Some(vs.collect { case JString(s) => s }.toSet)
        case _          => None
      }).getOrElse(Set.empty)
    }
  }

  /** Link info from /api/link (remoteurl.py:248-253). */
  def links: Option[JValue] = server.getLinkJ(url = Some(url))

  def hash: Option[Array[Byte]] = response.flatMap(_.bodyHash)
  def bodyHash: Option[Array[Byte]] = response.flatMap(_.bodyHash)

  /** PropertiesHash section, base64-decoded (remoteurl.py:269-277;
    * webtools.json_decode_field). Like [[entries]], pre-fetched
    * properties only — no lazy remote call (remoteurl.py reads
    * `self.all_properties` directly and yields None when absent). */
  def metaHash: Option[Array[Byte]] = allPropertiesOpt
    .flatMap(RemoteServer.readPropertiesSection("PropertiesHash", _)) match {
    case Some(JString(b64)) if b64.nonEmpty =>
      scala.util.Try(java.util.Base64.getDecoder.decode(b64)).toOption
    case _ => None
  }

  /** Social properties, lazily via /api/social (remoteurl.py:279-288). */
  def socialProperties: Option[JValue] = {
    if (socialPropertiesOpt.isEmpty)
      socialPropertiesOpt =
        server.getSocialJ(url = Some(url), request = request)
    socialPropertiesOpt
  }
}
