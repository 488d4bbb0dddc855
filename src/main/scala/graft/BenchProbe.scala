package graft

import org.apache.spark.sql.SparkSession
import graft.crawl.{CrawlConfig, CrawlLoop}
import graft.fetch.{SyntheticConfig, SyntheticInternet}

/** Ad-hoc timing probe for the crawl loop (not part of the driver
  * contract) — validates the Bench warmup/measure sequence. */
object BenchProbe {

  def session(threads: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** One crawl at a given parallelism (= partition count ≈ task slots). */
  def crawl(spark: SparkSession, sites: Int, parallelism: Int,
      paragraphs: Int, verbose: Boolean = false): (Long, Double) = {
    spark.conf.set("spark.sql.shuffle.partitions", parallelism.toString)
    val internet = SyntheticInternet(SyntheticConfig(
      seed = 42L, nSites = sites, pagesPerSite = 60, imagesPerSite = 2,
      itemsPerFeed = 3, bodyParagraphs = paragraphs))
    val loop = new CrawlLoop(spark, internet,
      CrawlConfig(maxBatches = 2, perHostBudget = 100,
        fetchPartitions = parallelism, useBloom = true, verbose = verbose))
    val seeds = (0 until sites).map(k => s"https://site-$k.test/")
    val t0 = System.nanoTime()
    val result = loop.run(seeds)
    val n = result.crawlLog.count()
    ((n, (System.nanoTime() - t0) / 1e9))
  }

  def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
  }

  def main(args: Array[String]): Unit = {
    val sites = args.headOption.map(_.toInt).getOrElse(200)
    val paragraphs = args.lift(1).map(_.toInt).getOrElse(60)
    val spark = session(32) // one session; parallelism via partition count
    (1 to 2).foreach { r =>
      val g0 = gcMillis()
      val (n, s) = crawl(spark, sites, 32, paragraphs)
      println(f"PROBE warmup$r urls=$n sec=$s%.1f gc=${gcMillis() - g0}ms")
    }
    Seq(2, 8, 2, 8).zipWithIndex.foreach { case (p, i) =>
      val g0 = gcMillis()
      val (n, s) = crawl(spark, sites, p, paragraphs, verbose = false)
      println(f"PROBE timed$i p=$p urls=$n sec=$s%.1f tput=${n / s}%.1f gc=${gcMillis() - g0}ms")
    }
    spark.stop()
  }
}
