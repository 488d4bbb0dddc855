package graft

import scala.collection.mutable
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

import graft.fetch.{FetchClient, SyntheticConfig, SyntheticInternet}
import graft.handlers.Handlers
import graft.http.{ContentTypes, Statuses}
import graft.links.LinkExtractor
import graft.model.FetchRequest
import graft.parse.PageFactory
import graft.robots.Robots
import graft.url.UrlKit

/** De-circularizes the q22 golden pin (r3 VERDICT #5): an INDEPENDENT,
  * sequential, Spark-free reimplementation of the crawl-loop semantics —
  * plain queues, sets and sorts, no DataFrames, no joins, no windows —
  * walked over the same synthetic internet with the same seed and
  * config as `SparkEntry.q22_crawl_log`. It shares only the row-level
  * primitives (fetch, parse, URL canonicalization, robots matcher) with
  * the engine; every piece of DISTRIBUTED state logic the golden could
  * have circularly pinned (priority dequeue, per-host budget, seq
  * assignment, two-tier dedup, redirect credit, robots gating, retry
  * transitions) is re-derived here from first principles. The engine's
  * live output AND the committed golden fixture must both equal this
  * walk. */
class CrawlOracleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Spark's xxhash64(col) — same public algorithm (seed 42), evaluated
    * scalar-wise; used only because the dequeue tiebreak orders by it. */
  private def xxh(s: String): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(
      org.apache.spark.sql.catalyst.expressions.Literal.create(s,
        org.apache.spark.sql.types.StringType)), 42L).eval(null)
      .asInstanceOf[Long]

  private def admitUrl(raw: String): Option[String] =
    UrlKit.cleanedLink(raw).filter(clean => clean.nonEmpty &&
      UrlKit.isWebLink(clean) && !UrlKit.isAnalytics(clean) &&
      !UrlKit.isLinkService(clean))

  case class PendingRow(url: String, urlHash: Long, host: String,
      discoveredAtMs: Long, tries: Int, notBeforeMs: Option[Long])
  case class LogRow(batch: Int, seq: Long, url: String, finalUrl: String,
      status: Int, host: String, contentType: String)

  /** The sequential reference walk — mirrors CrawlLoop.run semantics. */
  private def oracleWalk(internet: SyntheticInternet, seeds: Seq[String],
      maxBatches: Int, perHostBudget: Int = 100,
      maxTries: Int = 3): Seq[LogRow] = {
    val ua = "Mozilla/5.0 (X11; Linux x86_64) graft/1.0"
    val startMs = java.time.Instant.parse("2024-01-01T00:00:00Z")
      .toEpochMilli
    def batchMs(b: Int): Long = startMs + 60000L * b

    var pending = mutable.ArrayBuffer[PendingRow]()
    val seen = mutable.Set[String]()
    val rules = mutable.Map[String, String]() // host -> robots txt ("" = none)
    val log = mutable.ArrayBuffer[LogRow]()

    def admitWave(raws: Seq[String], bMs: Long): Seq[PendingRow] = {
      val cleaned = raws.flatMap(admitUrl)
      val distinct = mutable.LinkedHashSet[String]()
      cleaned.foreach(distinct.add)
      distinct.toSeq.map(u => PendingRow(u, xxh(u),
        UrlKit.domainOnly(u).orNull, bMs, 0, None))
    }

    pending ++= admitWave(seeds, batchMs(0))
    pending.foreach(r => seen.add(r.url))

    for (batch <- 0 until maxBatches) {
      val bMs = batchMs(batch)
      // dequeue: per-host budget over the deterministic total order
      // (priority desc — all equal — then discovered_at, url_hash, url)
      val eligible = pending.filter(r => r.notBeforeMs.forall(_ <= bMs))
      val byHost = eligible.groupBy(_.host)
      val dequeued = byHost.values.flatMap { rows =>
        rows.sortBy(r => (r.discoveredAtMs, r.urlHash, r.url))
          .take(perHostBudget)
      }.toSeq
      // global seq over the same order
      val withSeq = dequeued
        .sortBy(r => (r.discoveredAtMs, r.urlHash, r.url)).zipWithIndex
        .map { case (r, i) => (r, i + 1L) }
      if (withSeq.nonEmpty) {
        // robots refresh for missing hosts; sitemap lines of NEW rules
        val missing = withSeq.map(_._1.host).distinct.filterNot(rules.contains)
        val sitemapLinks = mutable.ArrayBuffer[String]()
        missing.foreach { host =>
          val resp = FetchClient.fetchOne(
            FetchRequest.default(s"https://$host/robots.txt")
              .copy(timeoutS = 20, userAgent = ua), internet)
          val txt = if (resp.status == 200) resp.text.getOrElse("") else ""
          rules(host) = txt
          if (resp.status == 200) sitemapLinks ++= Robots.sitemapLines(txt)
        }
        val gated = withSeq.map { case (r, seq) =>
          val txt = rules.getOrElse(r.host, "")
          (r, seq, txt.isEmpty || Robots.allows(txt, ua, r.url))
        }
        // fetch + parse the allowed rows; collect links and transitions
        val allLinks = mutable.ArrayBuffer[String]()
        allLinks ++= sitemapLinks
        val redirectRaw = mutable.ArrayBuffer[String]()
        val retries = mutable.ArrayBuffer[PendingRow]()
        gated.foreach { case (r, seq, allowed) =>
          if (allowed) {
            val req = FetchRequest.default(r.url).copy(
              bytesLimit = 5000000L, timeoutS = 20, userAgent = ua)
            val dispatched = Handlers.dispatch(req.url)
            val fetchUrl = dispatched.map(_.url).getOrElse(req.url)
            val resp = FetchClient.fetchOne(req.copy(url = fetchUrl), internet)
            val isImage = ContentTypes.isImage(resp.headers)
            val parsed =
              if (Statuses.isValid(resp.status) && !isImage)
                PageFactory.recognize(resp.url, resp.headers, resp.text)
              else None
            val meta = PageFactory.toPageMeta(resp.url, parsed)
            val entryLinks: Seq[String] = parsed match {
              case Some(PageFactory.ParsedRss(m)) =>
                m.entries(java.time.Instant.ofEpochMilli(startMs)).map(_.link)
              case Some(PageFactory.ParsedOpml(entries, _)) =>
                entries.map(_.url)
              case _ => Seq.empty
            }
            val isSitemap = resp.text.exists(t =>
              t.contains("<urlset") || t.contains("<sitemapindex"))
            val links: Seq[String] = parsed match {
              case Some(PageFactory.ParsedHtml(m)) =>
                LinkExtractor.extractLinksSorted(resp.url, m.contents).toSeq
              case _ if isSitemap && Statuses.isValid(resp.status) =>
                LinkExtractor.extractLinksSorted(resp.url, resp.text.get).toSeq
              case _ => Seq.empty
            }
            val handlerFeeds = dispatched.map(_.feeds).getOrElse(Seq.empty)
            allLinks ++= links ++ meta.feeds ++ handlerFeeds ++ entryLinks
            if (resp.url != r.url) redirectRaw += resp.url
            log += LogRow(batch, seq, r.url, resp.url, resp.status, r.host,
              resp.recognizedContentType.getOrElse(""))
            // retry transition (429-family) with a next-batch not_before
            val isRetry = resp.status == Statuses.TooManyRequests ||
              resp.status == Statuses.CodeServerTooManyRequests
            if (isRetry && r.tries + 1 < maxTries)
              retries += r.copy(tries = r.tries + 1,
                notBeforeMs = Some(batchMs(batch + 1)))
          }
        }
        // two-tier dedup with redirect credit: targets outrank same-batch
        // link discoveries and tombstone any pre-existing pending row
        val admitted = admitWave(allLinks.toSeq, bMs)
        val redirectTargets = redirectRaw.flatMap(u => UrlKit.cleanedLink(u))
          .distinct.toSet
        val fresh = admitted.filter(r => !seen.contains(r.url) &&
          !redirectTargets.contains(r.url))
        val dequeuedKeys = dequeued.map(r => (r.urlHash, r.url)).toSet
        pending = pending.filterNot(r => dequeuedKeys.contains((r.urlHash, r.url)))
          .filterNot(r => redirectTargets.contains(r.url))
        pending ++= retries
        pending ++= fresh
        seen ++= fresh.map(_.url)
        seen ++= redirectTargets.filterNot(seen.contains)
      }
    }
    log.toSeq
  }

  test("q22 crawl log: engine and committed golden equal the oracle walk") {
    spark.sparkContext.setLogLevel("WARN")
    // identical internet + config as SparkEntry.miniCrawl / the golden
    val internet = SyntheticInternet(SyntheticConfig(
      seed = 42L, nSites = 3, pagesPerSite = 3, imagesPerSite = 1,
      itemsPerFeed = 2))
    val walk = oracleWalk(internet, Seq("https://site-0.test/"),
      maxBatches = 2)
      .map(r => (r.batch, r.seq, r.url, r.finalUrl, r.status, r.host,
        r.contentType)).sortBy(t => (t._1, t._2))
    assert(walk.nonEmpty)

    def rowsOf(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (r.getAs[Int]("batch"), r.getAs[Long]("seq"), r.getAs[String]("url"),
        r.getAs[String]("final_url"), r.getAs[Int]("status"),
        r.getAs[String]("host"), r.getAs[String]("content_type"))
    }.sortBy(t => (t._1, t._2)).toSeq

    val live = rowsOf(
      SparkEntry.queries("q22_crawl_log")(spark, "/root/testdata/sf0.001"))
    assert(live == walk, "live engine crawl log diverges from oracle walk")

    val fixturesDir = sys.env.getOrElse("SPARK_GRAFT_FIXTURES",
      "fixtures/golden")
    val golden = spark.read.parquet(s"$fixturesDir/q22_crawl_log.parquet")
    assert(rowsOf(golden) == walk,
      "committed golden fixture diverges from oracle walk")
  }

  test("oracle walk with a BINDING per-host budget across 3 batches") {
    // q22's config never saturates the per-host budget; this scenario
    // does (5 pages/site, budget 2), so the walk independently pins the
    // budget-carryover semantics: rows beyond the budget stay pending
    // and drain in later batches in the same deterministic order
    val internet = graft.fetch.SyntheticInternet(
      graft.fetch.SyntheticConfig(seed = 42L, nSites = 3, pagesPerSite = 5,
        imagesPerSite = 1, itemsPerFeed = 2))
    val seeds = Seq("https://site-0.test/")
    val walk = oracleWalk(internet, seeds, maxBatches = 3,
      perHostBudget = 2)
      .map(r => (r.batch, r.seq, r.url, r.finalUrl, r.status, r.host,
        r.contentType)).sortBy(t => (t._1, t._2))
    assert(walk.nonEmpty)
    // the budget must actually bind somewhere: some batch has exactly 2
    // fetches for a host with more pending
    assert(walk.groupBy(r => (r._1, r._6)).values.exists(_.size == 2),
      "scenario failed to exercise the budget")
    val live = new graft.crawl.CrawlLoop(spark, internet,
      graft.crawl.CrawlConfig(maxBatches = 3, perHostBudget = 2))
      .run(seeds).crawlLog
      .select("batch", "seq", "url", "final_url", "status", "host",
        "content_type")
      .collect().map { r =>
        (r.getAs[Int]("batch"), r.getAs[Long]("seq"),
          r.getAs[String]("url"), r.getAs[String]("final_url"),
          r.getAs[Int]("status"), r.getAs[String]("host"),
          r.getAs[String]("content_type"))
      }.sortBy(t => (t._1, t._2)).toSeq
    assert(live == walk,
      "engine diverges from oracle walk under a binding budget")
  }

  test("oracle walk pins retry/not-before and failure transitions") {
    // a 429 host must be re-fetched once per batch until tries hits
    // maxTries (3): visible in batches 0, 1 and 2; a 404 and an
    // exception (600) are terminal after one fetch
    val internet = graft.fetch.SyntheticInternet(
      graft.fetch.SyntheticConfig(seed = 42L, nSites = 1, pagesPerSite = 2,
        imagesPerSite = 1, itemsPerFeed = 2))
    val seeds = Seq("https://status-429.test/", "https://status-404.test/",
      "https://crash.test/", "https://site-0.test/")
    def key(t: (Int, Long, String, String, Int, String, String)) =
      (t._1, t._2)
    val walk = oracleWalk(internet, seeds, maxBatches = 3)
      .map(r => (r.batch, r.seq, r.url, r.finalUrl, r.status, r.host,
        r.contentType)).sortBy(key)
    val retries = walk.filter(_._3 == "https://status-429.test")
    assert(retries.map(_._1) == Seq(0, 1, 2), s"retry batches: $retries")
    assert(retries.forall(_._5 == 429))
    assert(walk.count(_._3 == "https://status-404.test") == 1)
    val crash = walk.filter(_._6 == "crash.test")
    assert(crash.size == 1 && crash.head._5 == 600)
    val live = new graft.crawl.CrawlLoop(spark, internet,
      graft.crawl.CrawlConfig(maxBatches = 3)).run(seeds).crawlLog
      .select("batch", "seq", "url", "final_url", "status", "host",
        "content_type")
      .collect().map { r =>
        (r.getAs[Int]("batch"), r.getAs[Long]("seq"),
          r.getAs[String]("url"), r.getAs[String]("final_url"),
          r.getAs[Int]("status"), r.getAs[String]("host"),
          r.getAs[String]("content_type"))
      }.sortBy(key).toSeq
    assert(live == walk,
      "engine diverges from oracle walk on retry/failure transitions")
  }
}
