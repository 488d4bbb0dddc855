package graft.remote

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.security.SecureRandom
import java.security.cert.X509Certificate
import java.time.Duration
import javax.net.ssl.{SSLContext, X509TrustManager}

/** The production [[RemoteTransport]]: plain HTTP over `java.net.http`,
  * one GET/POST per call — the socket path of the reference client
  * (remoteserver.py:159-196 GET with per-request timeout; :312-345 POST
  * /set with JSON body + query params, 200 → true).
  *
  * Semantics mirrored deliberately:
  *  - certificate verification is DISABLED by default (`verify=False` in
  *    every reference call — the buddy lives inside the crawl
  *    deployment's own network, not the open web); a deployment whose
  *    buddy presents a real certificate passes `verifyTls = true` to get
  *    full JSSE chain validation + hostname verification without a code
  *    change;
  *  - GET returns the body text on ANY status (the reference reads
  *    `result.text` without checking `status_code`; truthiness filtering
  *    happens in the caller), None only on transport errors;
  *  - redirects are followed (requests' default).
  */
final class HttpTransport(verifyTls: Boolean = false)
    extends RemoteTransport {

  // trust-all = requests' verify=False. An X509ExtendedTrustManager is
  // required, not the plain interface: JSSE wraps a plain trust manager
  // in one that still performs HTTPS endpoint identification, so only
  // the extended form with no-op checks disables BOTH chain validation
  // and hostname verification (the buddy is typically addressed by IP
  // or internal alias with a self-signed cert). Fall back to the default
  // context if the platform refuses — verification then stays ON, which
  // only ever narrows what connects.
  private val sslContext: SSLContext =
    if (verifyTls) SSLContext.getDefault
    else try {
      val trustAll = new javax.net.ssl.X509ExtendedTrustManager {
        override def checkClientTrusted(c: Array[X509Certificate], a: String): Unit = ()
        override def checkServerTrusted(c: Array[X509Certificate], a: String): Unit = ()
        override def checkClientTrusted(c: Array[X509Certificate], a: String,
            s: java.net.Socket): Unit = ()
        override def checkServerTrusted(c: Array[X509Certificate], a: String,
            s: java.net.Socket): Unit = ()
        override def checkClientTrusted(c: Array[X509Certificate], a: String,
            e: javax.net.ssl.SSLEngine): Unit = ()
        override def checkServerTrusted(c: Array[X509Certificate], a: String,
            e: javax.net.ssl.SSLEngine): Unit = ()
        override def getAcceptedIssuers: Array[X509Certificate] = Array.empty
      }
      val ctx = SSLContext.getInstance("TLS")
      ctx.init(null, Array[javax.net.ssl.TrustManager](trustAll),
        new SecureRandom())
      ctx
    } catch { case scala.util.control.NonFatal(_) => SSLContext.getDefault }

  private val client: HttpClient = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NORMAL)
    .connectTimeout(Duration.ofSeconds(10))
    .sslContext(sslContext)
    .build()

  override def get(url: String, timeoutS: Int): Option[String] =
    try {
      val req = HttpRequest.newBuilder(URI.create(url))
        .timeout(Duration.ofSeconds(math.max(1, timeoutS).toLong))
        .GET().build()
      val resp = client.send(req,
        HttpResponse.BodyHandlers.ofString(StandardCharsets.UTF_8))
      Some(resp.body())
    } catch {
      // the reference maps any request error to None — but cancellation
      // must keep its interrupt flag, and fatal VM errors must propagate
      case _: InterruptedException =>
        Thread.currentThread().interrupt(); None
      case scala.util.control.NonFatal(_) => None
    }

  override def post(url: String, json: String,
      params: Map[String, String], timeoutS: Int): Boolean =
    try {
      val qs = params.toSeq.map { case (k, v) =>
        java.net.URLEncoder.encode(k, "UTF-8") + "=" +
          java.net.URLEncoder.encode(v, "UTF-8")
      }.mkString("&")
      val full = if (qs.isEmpty) url
      else url + (if (url.contains('?')) "&" else "?") + qs
      val req = HttpRequest.newBuilder(URI.create(full))
        .timeout(Duration.ofSeconds(math.max(1, timeoutS).toLong))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(json, StandardCharsets.UTF_8))
        .build()
      val resp = client.send(req, HttpResponse.BodyHandlers.discarding())
      resp.statusCode() == 200
    } catch {
      case _: InterruptedException =>
        Thread.currentThread().interrupt(); false
      case scala.util.control.NonFatal(_) => false
    }
}
