package graft.fetch

import java.nio.charset.{Charset, StandardCharsets}
import scala.collection.mutable
import scala.util.Try
import graft.model.{FetchRequest, FetchResponse}
import graft.http.{ContentTypes, Statuses}
import graft.parse.{Hashing, PageValidity}

/** The per-partition fetch client — S1-S5 of the operator inventory.
  *
  * Runs inside `mapPartitions` over a host-partitioned request Dataset:
  * requests for one host land in one partition (J-3), are fetched
  * sequentially in deterministic order, and honor a per-host minimum gap
  * (the reference's `delay_s`, webtoolkit/request.py:31). Guards are
  * header-first like the reference (webtoolkit/crawlers/
  * requestscrawler.py:49-70): byte limit and accept types are checked
  * before the body is materialized.
  */
object FetchClient {

  /** Accept-type token set: "text/html,application/xml" → {text, html,
    * application, xml}; empty → all (crawlerinterface.py:208-227). */
  def acceptTypeTokens(acceptTypes: Seq[String]): Set[String] = {
    if (acceptTypes.isEmpty) return Set("all")
    val out = mutable.Set[String]()
    acceptTypes.foreach { media0 =>
      val semi = media0.indexOf(';')
      val media = if (semi >= 0) media0.substring(0, semi) else media0
      media.split(",").foreach { m =>
        m.trim.replace("+", "/").split("/").foreach { part =>
          if (part.trim.nonEmpty) out += part.trim
        }
      }
    }
    out.toSet
  }

  /** One request against the synthetic internet, with the reference's
    * guard order: status → byte limit → accept types → decode. */
  def fetchOne(req: FetchRequest, internet: SyntheticInternet,
      nowNanos: () => Long = () => System.nanoTime()): FetchResponse = {
    val t0 = nowNanos()
    val raw = internet.get(req.url)
    val errors = mutable.ArrayBuffer[String]()

    var status = raw.status
    var body: Array[Byte] = raw.body
    var text: Option[String] = raw.text

    // ping/head stop at headers (request.py:11-13, requestscrawler.py:61-63)
    val headerOnly = req.requestType == FetchRequest.TypePing ||
      req.requestType == FetchRequest.TypeHead

    // byte-limit guard BEFORE body read (crawlerinterface.py:174-180)
    val contentLength = ContentTypes.contentLength(raw.headers)
    if (!headerOnly && contentLength.exists(_ > req.bytesLimit)) {
      errors += s"Page is too big: ${contentLength.get}"
      status = Statuses.CodeFileTooBig
      body = Array.empty
      text = None
    }

    // accept-type guard (crawlerinterface.py:182-199)
    val accepts = acceptTypeTokens(req.acceptTypes)
    if (!headerOnly && status == 200 && !accepts.contains("all")) {
      ContentTypes.contentTypeKeys(raw.headers).foreach { keys =>
        if (!keys.exists(accepts.contains)) {
          errors += s"Response type is not supported:${ContentTypes.contentType(raw.headers).getOrElse("")}"
          status = Statuses.CodePageUnsupported
          body = Array.empty
          text = None
        }
      }
    }

    if (headerOnly) { body = Array.empty; text = None }

    // encoding resolution chain: header charset → meta charset → utf-8
    // (requestscrawler.py:108-142)
    val headerCharset = ContentTypes.charset(raw.headers)
    val encoding = headerCharset
      .orElse(text.flatMap(t => new graft.parse.HtmlMeta(req.url, t).charset))
      .getOrElse("utf-8")

    val decodedText = text.orElse {
      if (body.nonEmpty &&
          ContentTypes.contentType(raw.headers).exists(ContentTypes.isText))
        Try(new String(body, Charset.forName(encoding))).toOption
      else None
    }

    val recognized = ContentTypes.contentType(raw.headers).map { ct =>
      val semi = ct.indexOf(';')
      if (semi >= 0) ct.substring(0, semi) else ct
    }

    FetchResponse(
      url = req.url,
      requestUrl = req.url,
      status = status,
      headers = raw.headers,
      body = if (body == null) Array.empty else body,
      text = decodedText,
      encoding = encoding,
      errors = errors.toSeq,
      crawlTimeMs = (nowNanos() - t0) / 1000000L,
      recognizedContentType = recognized,
      bodyHash = decodedText.flatMap(Hashing.md5)
        .orElse(Hashing.md5Binary(body)))
  }

  /** Partition-level fetch: sequential within the partition, per-host
    * minimum-gap politeness (token bucket per host). Requests must arrive
    * host-partitioned and pre-sorted for deterministic order. */
  def fetchPartition(requests: Iterator[FetchRequest],
      internet: SyntheticInternet): Iterator[FetchResponse] = {
    val lastFetchNanos = mutable.Map[String, Long]()
    requests.map { req =>
      val host = graft.url.UrlKit.domainOnly(req.url).getOrElse("")
      if (req.delayS > 0) {
        lastFetchNanos.get(host).foreach { last =>
          val elapsed = System.nanoTime() - last
          val needed = req.delayS * 1000000000L
          if (elapsed < needed) Thread.sleep((needed - elapsed) / 1000000L)
        }
      }
      val resp = fetchOne(req, internet)
      lastFetchNanos(host) = System.nanoTime()
      resp
    }
  }
}
