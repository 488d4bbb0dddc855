package graft.crawl

import java.sql.Timestamp
import java.time.Instant
import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.fetch.{FetchClient, SyntheticInternet, ImageKit}
import graft.frontier.{Frontier, SeenSet}
import graft.handlers.Handlers
import graft.http.{ContentTypes, Statuses}
import graft.links.LinkExtractor
import graft.model.{FetchRequest, FrontierRow}
import graft.parse.{PageFactory, Hashing}
import graft.robots.Robots
import graft.store.SnapshotStore

/** One fetched-and-parsed page — fetch and parse are fused inside the same
  * partition so response bodies never cross a shuffle boundary. */
final case class FetchedPage(
    url: String,
    url_hash: Long,
    host: String,
    status: Int,
    content_type: String,
    crawl_time_ms: Long,
    page_type: String,
    title: String,
    description: String,
    language: String,
    date_published: Timestamp,
    page_rating: Int,
    links: Seq[String],
    feeds: Seq[String],
    entry_links: Seq[String],
    is_image: Boolean,
    image_bytes: Array[Byte],
    body_hash_hex: String,
    errors: Seq[String])

final case class CrawlConfig(
    maxBatches: Int = 5,
    perHostBudget: Int = 100,
    delayS: Int = 0,
    respectRobots: Boolean = true,
    bytesLimit: Long = 5000000L,
    maxTries: Int = 3,
    saltBuckets: Int = 4,
    fetchPartitions: Int = 0, // 0 → spark.sql.shuffle.partitions
    useBloom: Boolean = true,
    /** Bloom capacity — size to the run's URL budget; oversizing inflates
      * the per-batch filter aggregation shuffled to the driver. */
    bloomExpected: Long = 1L << 20,
    verbose: Boolean = false,
    startTime: Instant = Instant.parse("2024-01-01T00:00:00Z"))

final case class CrawlResult(
    frontier: DataFrame,
    seen: DataFrame,
    crawlLog: DataFrame,
    pages: DataFrame,
    images: DataFrame,
    metrics: DataFrame)

/** The micro-batch crawl driver (SURVEY.md §7.3; north rule):
  * per iteration — load snapshots, per-host priority dequeue, robots gate,
  * host-partitioned fetch+parse, link extraction, two-tier dedup,
  * re-enqueue, snapshot commit. Deterministic: batch time is derived from
  * the batch number, the dequeue order is a total order, and extracted
  * links are sorted before enqueue.
  */
final class CrawlLoop(spark: SparkSession, internet: SyntheticInternet,
    config: CrawlConfig, store: Option[SnapshotStore] = None) {

  import spark.implicits._

  private val robotsRules = mutable.Map[String, Robots.RobotRules]()

  private def batchTime(batch: Int): Timestamp =
    Timestamp.from(config.startTime.plusSeconds(60L * batch))

  /** Fetch robots.txt for hosts not yet cached (driver-side cache across
    * batches — the reference's LRU(400) singleton, domaincache.py:170-259;
    * at cluster scale this map becomes a broadcast domain-rules table
    * refreshed per batch, J-2). */
  private def ensureRobots(hosts: Seq[String]): Unit = {
    hosts.filterNot(robotsRules.contains).foreach { host =>
      val resp = internet.get(s"https://$host/robots.txt")
      val contents = resp.text.getOrElse("")
      robotsRules(host) =
        if (resp.status == 200) Robots.parse(contents)
        else Robots.RobotRules(Seq.empty, Seq.empty)
    }
  }

  /** Seeds → initial frontier (batch 0). */
  def seedFrontier(seeds: Seq[String]): DataFrame = {
    val raw = seeds.toDF("url")
    Frontier.admit(raw, lit(0), lit(batchTime(0)), config.saltBuckets)
  }

  def run(seeds: Seq[String]): CrawlResult = {
    var frontier = seedFrontier(seeds).localCheckpoint(true)
    var seen = frontier.select("url", "url_hash")
    // accumulated outputs are kept as per-batch increments, each
    // checkpointed once — re-checkpointing the growing union every batch
    // would be O(batches²)
    val logParts = mutable.ArrayBuffer[DataFrame]()
    val pageParts = mutable.ArrayBuffer[DataFrame]()
    val imageParts = mutable.ArrayBuffer[DataFrame]()
    val metricParts = mutable.ArrayBuffer[DataFrame]()
    // seen-set Bloom accelerator, merged incrementally (never rescans the
    // full seen table); fpp kept at 1% — false positives only cost a probe
    val bloomExpected = config.bloomExpected
    val bloom = SeenSet.newBloom(bloomExpected)
    // n.b. stat.bloomFilter NPEs on an empty input frame — guard every merge
    def mergeBloom(df: DataFrame): Unit =
      if (df.head(1).nonEmpty)
        bloom.mergeInPlace(
          df.stat.bloomFilter(col("url_hash"), bloomExpected, 0.01))
    mergeBloom(seen)

    def unionAll(parts: Seq[DataFrame]): DataFrame =
      if (parts.isEmpty) spark.emptyDataFrame
      else parts.reduce(_ unionByName _)

    def timed[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val out = body
      if (config.verbose)
        println(f"[crawl] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      out
    }

    for (batch <- 0 until config.maxBatches) {
      val bt = batchTime(batch)
      val (dequeued, n) = timed(s"b$batch dequeue") {
        val d = Frontier.withCrawlSeq(
          Frontier.dequeue(frontier, lit(bt), config.perHostBudget))
          .persist()
        (d, d.count())
      }
      if (n > 0) {
        // robots gate (J-2): evaluate allowance per row, driver-cached rules
        val hosts = dequeued.select("host").distinct().as[String].collect()
        if (config.respectRobots) ensureRobots(hosts.toSeq)
        val rulesBc = spark.sparkContext.broadcast(robotsRules.toMap)
        val respectRobots = config.respectRobots
        val allowedUdf = udf { (host: String, url: String) =>
          !respectRobots ||
            rulesBc.value.get(host).forall(_.canFetch("*", url))
        }
        val gated = dequeued.withColumn("allowed",
          allowedUdf(col("host"), col("url"))).persist()
        timed(s"b$batch robots-gate")(gated.count())
        val excluded = gated.filter(!col("allowed"))
        val toFetch = gated.filter(col("allowed"))

        // host-partitioned, deterministically ordered fetch+parse (J-3)
        val parts =
          if (config.fetchPartitions > 0) config.fetchPartitions
          else spark.sessionState.conf.numShufflePartitions
        val internetL = internet
        val cfg = config
        val fetched: Dataset[FetchedPage] = toFetch
          .select("url", "url_hash", "host", "host_hash_salted", "seq")
          .repartition(parts, col("host_hash_salted"))
          .sortWithinPartitions("host", "seq")
          .as[(String, Long, String, Long, Long)]
          .mapPartitions { it =>
            CrawlLoop.fetchAndParse(it, internetL, cfg)
          }.persist()
        timed(s"b$batch fetch+parse")(fetched.count())

        // crawl log rows for this batch (the crawl-order parity artifact)
        logParts += timed(s"b$batch log-ckpt") { fetched
          .join(toFetch.select("url_hash", "seq"), Seq("url_hash"))
          .select(lit(batch).as("batch"), col("seq"), col("url"),
            col("status"), col("host"), col("crawl_time_ms"),
            col("content_type"))
          .localCheckpoint(true) }

        pageParts += timed(s"b$batch pages-ckpt") { fetched.drop("links", "feeds", "entry_links",
          "image_bytes")
          .withColumn("batch", lit(batch))
          .localCheckpoint(true) }

        imageParts += timed(s"b$batch images-ckpt") { fetched.filter(col("is_image"))
          .select(col("url"), col("image_bytes").as("bytes"))
          .withColumn("image_id",
            regexp_extract(col("url"), "/img/(img\\d+)\\.", 1))
          .withColumn("batch", lit(batch))
          .localCheckpoint(true) }

        // metrics rollup (A4)
        metricParts += timed(s"b$batch metrics-ckpt") { fetched.groupBy("host")
          .agg(count(lit(1)).as("fetches"),
            avg("crawl_time_ms").as("avg_crawl_time_ms"),
            sum(when(Statuses.invalidCol(col("status")), 1).otherwise(0))
              .as("failures"))
          .withColumn("batch", lit(batch))
          .localCheckpoint(true) }

        // new links: union of page links, feeds, entry links → admit → dedup
        val rawLinks = fetched
          .select(explode(concat(col("links"), col("feeds"),
            col("entry_links"))).as("url"))
        val admitted = Frontier.admit(rawLinks, lit(batch + 1), lit(bt),
          config.saltBuckets).persist()
        val fresh0 =
          if (config.useBloom)
            SeenSet.filterNewWithBloom(admitted, seen, bloom)
          else SeenSet.filterNewExact(admitted, seen)
        val fresh = timed(s"b$batch links-dedup")(fresh0.localCheckpoint(true))
        admitted.unpersist()
        timed(s"b$batch bloom-merge") {
          if (config.useBloom) mergeBloom(fresh)
        }

        // frontier state transitions
        val statusByUrl = fetched.select(col("url_hash"),
          col("status").as("fetch_status"))
        val transitioned = frontier
          .join(excluded.select(col("url_hash").as("ex_hash")),
            col("url_hash") === col("ex_hash"), "left")
          .join(statusByUrl, Seq("url_hash"), "left")
          .withColumn("state",
            when(col("ex_hash").isNotNull, FrontierRow.StateExcluded)
              .when(col("fetch_status").isNotNull &&
                Statuses.retryCol(col("fetch_status")) &&
                col("tries") + 1 < config.maxTries, FrontierRow.StatePending)
              .when(col("fetch_status").isNotNull &&
                Statuses.invalidCol(col("fetch_status")),
                FrontierRow.StateFailed)
              .when(col("fetch_status").isNotNull, FrontierRow.StateFetched)
              .otherwise(col("state")))
          .withColumn("tries",
            when(col("fetch_status").isNotNull &&
              Statuses.retryCol(col("fetch_status")),
              col("tries") + 1).otherwise(col("tries")))
          .withColumn("not_before",
            when(col("state") === FrontierRow.StatePending &&
              col("fetch_status").isNotNull,
              lit(batchTime(batch + 1))).otherwise(col("not_before")))
          .drop("ex_hash", "fetch_status")

        frontier = transitioned.unionByName(fresh)
        seen = seen.unionByName(fresh.select("url", "url_hash"))

        // truncate state lineage each iteration; commit snapshots when a
        // store is attached (resumable exactly from any batch)
        store match {
          case Some(s) =>
            val lineage = Map("batch" -> batch.toString,
              "dequeued" -> n.toString)
            s.commit("frontier", batch, frontier, lineage)
            s.commit("seen", batch, seen, lineage)
            s.commit("crawl_log", batch, unionAll(logParts.toSeq), lineage)
            frontier = s.read(spark, "frontier", Some(batch)).get
            seen = s.read(spark, "seen", Some(batch)).get
          case None =>
            timed(s"b$batch state-ckpt") {
              frontier = frontier.localCheckpoint(true)
              seen = seen.localCheckpoint(true)
            }
        }
        fetched.unpersist()
        gated.unpersist()
      }
      dequeued.unpersist()
    }
    CrawlResult(frontier, seen, unionAll(logParts.toSeq),
      unionAll(pageParts.toSeq), unionAll(imageParts.toSeq),
      unionAll(metricParts.toSeq))
  }
}

object CrawlLoop {

  /** Fused fetch + parse for one partition. Pure w.r.t. its inputs — the
    * only nondeterminism (crawl_time_ms) never feeds back into state. */
  def fetchAndParse(it: Iterator[(String, Long, String, Long, Long)],
      internet: SyntheticInternet, config: CrawlConfig): Iterator[FetchedPage] = {
    val requests = it.map { case (url, urlHash, host, _, _) =>
      (FetchRequest.default(url).copy(delayS = config.delayS,
        bytesLimit = config.bytesLimit), urlHash, host)
    }
    val lastFetchNanos = scala.collection.mutable.Map[String, Long]()
    requests.map { case (req, urlHash, host) =>
      // handler dispatch may rewrite the URL before fetch (baseurl.py:305)
      val dispatched = Handlers.dispatch(req.url)
      val fetchUrl = dispatched.map(_.url).getOrElse(req.url)
      val handlerFeeds = dispatched.map(_.feeds).getOrElse(Seq.empty)
      // per-host min-gap politeness (J-3; reference delay_s, request.py:31)
      if (req.delayS > 0) {
        lastFetchNanos.get(host).foreach { last =>
          val waitMs =
            req.delayS * 1000L - (System.nanoTime() - last) / 1000000L
          if (waitMs > 0) Thread.sleep(waitMs)
        }
      }
      val resp = FetchClient.fetchOne(req.copy(url = fetchUrl), internet)
      if (req.delayS > 0) lastFetchNanos(host) = System.nanoTime()

      val isImage = ContentTypes.isImage(resp.headers)
      val parsed =
        if (Statuses.isValid(resp.status) && !isImage)
          PageFactory.recognize(resp.url, resp.headers, resp.text)
        else None
      val meta = PageFactory.toPageMeta(resp.url, parsed)
      val batchInstant = config.startTime
      val entryLinks: Seq[String] = parsed match {
        case Some(PageFactory.ParsedRss(m)) =>
          m.entries(batchInstant).map(_.link)
        case Some(PageFactory.ParsedOpml(entries, _)) => entries.map(_.url)
        case _ => Seq.empty
      }
      val links: Seq[String] = parsed match {
        case Some(PageFactory.ParsedHtml(m)) =>
          LinkExtractor.extractLinksSorted(resp.url, m.contents).toSeq
        case _ => Seq.empty
      }
      FetchedPage(
        url = resp.url,
        url_hash = urlHash,
        host = host,
        status = resp.status,
        content_type = resp.recognizedContentType.getOrElse(""),
        crawl_time_ms = resp.crawlTimeMs,
        page_type = meta.pageType,
        title = meta.title.orNull,
        description = meta.description.orNull,
        language = meta.language.orNull,
        date_published = meta.datePublished.orNull,
        page_rating = meta.pageRating,
        links = links,
        feeds = meta.feeds ++ handlerFeeds,
        entry_links = entryLinks,
        is_image = isImage,
        image_bytes = if (isImage) resp.body else Array.empty[Byte],
        body_hash_hex = meta.bodyHashHex.orNull,
        errors = resp.errors)
    }
  }
}
