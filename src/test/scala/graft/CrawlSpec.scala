package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.crawl.{CrawlLoop, CrawlConfig}
import graft.fetch.{SyntheticInternet, SyntheticConfig, ImageKit}
import graft.store.SnapshotStore

/** End-to-end crawl over the deterministic SyntheticInternet: frontier
  * growth, robots exclusion, crawl-order determinism across runs, image
  * fidelity (PSNR/caption), snapshot resume. */
class CrawlSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val internet = SyntheticInternet(SyntheticConfig(
    seed = 42L, nSites = 4, pagesPerSite = 4, imagesPerSite = 2,
    itemsPerFeed = 3))

  def newLoop(cfg: CrawlConfig = CrawlConfig(maxBatches = 3),
      store: Option[SnapshotStore] = None) =
    new CrawlLoop(spark, internet, cfg, store)

  test("crawl discovers pages across sites and batches") {
    spark.sparkContext.setLogLevel("WARN")
    val result = newLoop().run(Seq("https://site-0.test/"))
    val log = result.crawlLog.collect()
    assert(log.nonEmpty)
    // batch 0 fetches exactly the seed
    assert(log.count(_.getAs[Int]("batch") == 0) == 1)
    // later batches discover site pages and cross-site roots
    val urls = log.map(_.getAs[String]("url")).toSet
    assert(urls.contains("https://site-0.test"))
    assert(urls.exists(_.contains("/page/")))
    assert(urls.exists(_.contains("site-1.test")))
    // seen set has no duplicates
    val seen = result.seen.collect().map(_.getAs[String]("url"))
    assert(seen.length == seen.distinct.length)
  }

  test("crawl order is deterministic across runs") {
    def runOnce(): Seq[(Int, Long, String)] =
      newLoop().run(Seq("https://site-0.test/"))
        .crawlLog.orderBy("batch", "seq")
        .collect().map(r => (r.getAs[Int]("batch"), r.getAs[Long]("seq"),
          r.getAs[String]("url"))).toSeq
    val a = runOnce()
    val b = runOnce()
    assert(a == b)
  }

  test("robots gate excludes /private/ and even-site /page/7") {
    val bigInternet = SyntheticInternet(SyntheticConfig(
      seed = 42L, nSites = 2, pagesPerSite = 8, imagesPerSite = 1))
    val loop = new CrawlLoop(spark, bigInternet,
      CrawlConfig(maxBatches = 3), None)
    val result = loop.run(Seq("https://site-0.test/"))
    val fetchedUrls = result.crawlLog.collect().map(_.getAs[String]("url"))
    assert(!fetchedUrls.exists(_.contains("/private")))
    assert(!fetchedUrls.contains("https://site-0.test/page/7")) // even site
    val excluded = result.frontier
      .filter(org.apache.spark.sql.functions.col("state") === "excluded")
      .collect().map(_.getAs[String]("url"))
    assert(excluded.exists(_.contains("/private")))
  }

  test("fetched image bytes match the corpus (PSNR / caption invariant)") {
    val result = newLoop().run(Seq("https://site-0.test/"))
    val images = result.images.collect()
    assert(images.nonEmpty)
    images.foreach { row =>
      val id = row.getAs[String]("image_id")
      val bytes = row.getAs[Array[Byte]]("bytes")
      val idx = id.substring(3).toInt
      val expected = ImageKit.imageRow(42L, idx)
      assert(expected.image_id == id)
      if (expected.fmt == "png") {
        assert(java.util.Arrays.equals(bytes, expected.bytes))
      } else {
        val p = ImageKit.psnrOf(bytes, expected.bytes)
        assert(p >= 40.0, s"PSNR $p for $id")
      }
      // phash must match the corpus row exactly (same decoded pixels)
      assert(ImageKit.hamming(
        ImageKit.phashOf(bytes), expected.phash) <= 2)
      assert(ImageKit.captionFor(42L, id) == expected.caption)
    }
  }

  test("snapshot store commits and resumes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-snap").toString
    val store = new SnapshotStore(dir)
    val result = newLoop(CrawlConfig(maxBatches = 2), Some(store))
      .run(Seq("https://site-0.test/"))
    assert(store.latestSnapshot("frontier").contains(1L))
    // time travel: batch-0 frontier is smaller than batch-1 frontier
    val f0 = store.read(spark, "frontier", Some(0)).get.count()
    val f1 = store.read(spark, "frontier", Some(1)).get.count()
    assert(f0 <= f1)
    // resumed seen-set equals the in-memory result
    val resumed = store.read(spark, "seen", Some(1)).get
    assert(resumed.count() == result.seen.count())
    assert(store.manifest("frontier", 1).exists(_.contains("\"lineage\"")))
  }

  test("per-host budget limits fetches per batch") {
    val result = newLoop(CrawlConfig(maxBatches = 2, perHostBudget = 2))
      .run(Seq("https://site-0.test/"))
    val batch1 = result.crawlLog
      .filter(org.apache.spark.sql.functions.col("batch") === 1)
      .collect()
    val byHost = batch1.groupBy(_.getAs[String]("host"))
    byHost.foreach { case (host, rows) =>
      assert(rows.length <= 2, s"host $host fetched ${rows.length} > budget")
    }
  }

  test("bloom-accelerated dedup matches exact dedup") {
    val exact = newLoop(CrawlConfig(maxBatches = 3, useBloom = false))
      .run(Seq("https://site-0.test/"))
    val bloom = newLoop(CrawlConfig(maxBatches = 3, useBloom = true))
      .run(Seq("https://site-0.test/"))
    val a = exact.seen.collect().map(_.getAs[String]("url")).sorted
    val b = bloom.seen.collect().map(_.getAs[String]("url")).sorted
    assert(a.toSeq == b.toSeq)
  }
}
