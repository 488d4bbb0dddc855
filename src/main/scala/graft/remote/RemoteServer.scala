package graft.remote

import org.json4s._
import org.json4s.jackson.JsonMethods
import scala.collection.immutable.ListMap

import graft.http.WireFormats
import graft.model.{FetchRequest, FetchResponse}

/** How a RemoteServer reaches its crawler buddy. The production transport
  * is plain HTTP (`java.net.http` — one GET/POST per call); this sandbox
  * has zero egress, so tests plug in [[CrawlerBuddy.InProcessTransport]],
  * which runs the actual engine behind the same wire protocol — exactly
  * what the reference's buddy does on the far side of the socket. */
trait RemoteTransport {
  /** GET the fully-encoded URL; body text, or None on any error. */
  def get(url: String, timeoutS: Int): Option[String]
  /** POST a JSON body (the /set endpoint); true on HTTP 200. */
  def post(url: String, json: String, params: Map[String, String],
      timeoutS: Int): Boolean
}

/** S11: the crawler-buddy communication client (reference
  * remoteserver.py:21-370). Speaks the section-list wire protocol this
  * engine already produces ([[graft.http.AllProperties]]): requests go out
  * GET-encoded (`request_encode`), responses come back as the JSON section
  * list, errors and `success: false` collapse to None like the reference.
  */
final class RemoteServer(
    val remoteServer: String,
    transport: RemoteTransport,
    timeoutS: Int = 30,
    clientId: Option[String] = None,
    key: Option[String] = None) {

  private def callFor(endpoint: String, url: Option[String],
      request: Option[FetchRequest]): Option[JValue] = {
    val req = request.orElse(url.map(u => FetchRequest.default(u.trim)))
      .getOrElse(return None)
    if (req.url == null || req.url.isEmpty) return None
    performRemoteCall(s"$remoteServer$endpoint", req)
  }

  /** /api/get → the full section list (remoteserver.py:41-56). */
  def getGetJ(url: Option[String] = None,
      request: Option[FetchRequest] = None): Option[JValue] =
    callFor("/api/get", url, request)

  /** /api/feeds (remoteserver.py:58-73). */
  def getFeedsJ(url: Option[String] = None,
      request: Option[FetchRequest] = None): Option[JValue] =
    callFor("/api/feeds", url, request)

  /** /api/social (remoteserver.py:75-91). */
  def getSocialJ(url: Option[String] = None,
      request: Option[FetchRequest] = None): Option[JValue] =
    callFor("/api/social", url, request)

  /** /api/link (remoteserver.py:93-108). */
  def getLinkJ(url: Option[String] = None,
      request: Option[FetchRequest] = None): Option[JValue] =
    callFor("/api/link", url, request)

  /** /api/ping → just the status code (remoteserver.py:110-126). */
  def getPingJ(url: Option[String] = None,
      request: Option[FetchRequest] = None): Option[Int] =
    callFor("/api/ping", url, request).flatMap(_ \ "status" match {
      case JInt(i) => Some(i.toInt)
      case _       => None
    })

  /** /api/info — a bare GET, no request payload (remoteserver.py:278-310). */
  def getInfoJ(): Option[JValue] =
    transport.get(s"$remoteServer/api/info", 10)
      .flatMap(t => scala.util.Try(JsonMethods.parse(t)).toOption)

  /** POST /set — store a crawled response on the buddy
    * (remoteserver.py:312-345). */
  def set(response: FetchResponse, crawlId: Option[String] = None,
      url: Option[String] = None, crawlerName: Option[String] = None,
      handlerName: Option[String] = None): Boolean = {
    val params = List(
      url.map("url" -> _), crawlId.map("crawl_id" -> _),
      crawlerName.map("crawler_name" -> _),
      handlerName.map("handler_name" -> _)).flatten.toMap
    transport.post(s"$remoteServer/set",
      WireFormats.responseToJsonString(response), params, 60)
  }

  /** GET /findj — look a stored response up (remoteserver.py:347-370). */
  def findJ(crawlId: Option[String] = None, url: Option[String] = None,
      crawlerName: Option[String] = None,
      handlerName: Option[String] = None): Option[JValue] = {
    val params = List(
      url.map("url" -> _), crawlId.map("crawl_id" -> _),
      crawlerName.map("crawler_name" -> _),
      handlerName.map("handler_name" -> _)).flatten
    val qs = params.map { case (k, v) =>
      k + "=" + java.net.URLEncoder.encode(v, "UTF-8")
    }.mkString("&")
    val sep = if (qs.isEmpty) "" else "?"
    transport.get(s"$remoteServer/findj$sep$qs", 60)
      .flatMap(t => scala.util.Try(JsonMethods.parse(t)).toOption)
  }

  /** Properties section of /api/get (remoteserver.py:385-391). */
  def getProperties(url: Option[String] = None,
      request: Option[FetchRequest] = None): Option[JValue] =
    getGetJ(url, request)
      .flatMap(RemoteServer.readPropertiesSection("Properties", _))

  /** One GET against the buddy: endpoint + `request_encode` query (+key,
    * +client_id), JSON-parse, `success: false` → None
    * (remoteserver.py:137-196). */
  private def performRemoteCall(linkCall: String,
      request: FetchRequest): Option[JValue] = {
    var encoded = WireFormats.requestEncode(request)
    key.foreach(k => encoded += s"&key=$k")
    clientId.foreach(c => encoded += s"&client_id=$c")
    // the remote buddy applies timeout_s itself; wiggle room for the wire.
    // Reference (remoteserver.py:159-165): any present timeout_s — zero
    // included — maps to timeout_s+5; 60 is reserved for a genuinely
    // absent one, which this Int field encodes as a negative value.
    val callTimeout =
      if (request.timeoutS >= 0) request.timeoutS + 5 else 60
    val text = transport.get(s"$linkCall?$encoded", callTimeout)
      .getOrElse(return None)
    if (text.isEmpty) return None
    val parsed = scala.util.Try(JsonMethods.parse(text)).toOption
      .getOrElse(return None)
    parsed \ "success" match {
      case JBool(false) => None
      case _            => Some(parsed)
    }
  }
}

object RemoteServer {

  /** Deployment-facing construction of the production client — every
    * knob in one place, notably `verifyTls` (r5 ADVICE: the flag existed
    * on [[HttpTransport]] but nothing wired it through configuration). */
  final case class Config(
      remoteServer: String,
      timeoutS: Int = 30,
      clientId: Option[String] = None,
      key: Option[String] = None,
      /** false mirrors the reference's `verify=False` (the buddy lives
        * inside the deployment's own network); true selects stock JSSE
        * chain validation + hostname verification — a buddy with a real
        * certificate flips this without a code change. */
      verifyTls: Boolean = false)

  def apply(cfg: Config): RemoteServer =
    new RemoteServer(cfg.remoteServer, new HttpTransport(cfg.verifyTls),
      cfg.timeoutS, cfg.clientId, cfg.key)

  /** Reference env-var pair naming the buddy (remoteserver.py:35-39). */
  def remoteServerLocation(env: String => Option[String] = sys.env.get)
      : Option[String] =
    for {
      server <- env("CRAWLER_BUDDY_SERVER")
      port <- env("CRAWLER_BUDDY_PORT")
    } yield s"http://$server:$port"

  /** Find a named section's data in the section list
    * (remoteserver.py:393-404). */
  def readPropertiesSection(name: String,
      allProperties: JValue): Option[JValue] = allProperties match {
    case JArray(sections) =>
      sections.collectFirst {
        case o: JObject if (o \ "name") == JString(name) => o \ "data"
      }
    case _ => None
  }

  /** Streams section → ordered (name → response) map
    * (remoteserver.py:406-420). */
  def getResponses(allProperties: JValue): ListMap[String, FetchResponse] =
    readPropertiesSection("Streams", allProperties) match {
      case Some(JObject(fields)) =>
        fields.foldLeft(ListMap.empty[String, FetchResponse]) {
          case (acc, (name, data)) =>
            WireFormats.jsonToResponse(
              JsonMethods.compact(JsonMethods.render(data))) match {
              case Some(r) if r.url != null && r.url.nonEmpty =>
                acc + (name -> r)
              case _ => acc
            }
        }
      case _ => ListMap.empty
    }

  /** Response section → the primary response (remoteserver.py:422-444). */
  def getResponse(allProperties: JValue): Option[FetchResponse] =
    readPropertiesSection("Response", allProperties).flatMap { data =>
      WireFormats.jsonToResponse(
        JsonMethods.compact(JsonMethods.render(data)))
    }
}
