package graft

import org.apache.spark.sql.SparkSession
import graft.crawl.{CrawlConfig, CrawlLoop}
import graft.fetch.{SyntheticConfig, SyntheticInternet}

/** Ad-hoc timing probe for the crawl loop (not part of the driver
  * contract) — prints per-phase wall times to size the bench. */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val threads = args.headOption.map(_.toInt).getOrElse(8)
    val sites = args.lift(1).map(_.toInt).getOrElse(40)
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val internet = SyntheticInternet(SyntheticConfig(
      seed = 42L, nSites = sites, pagesPerSite = 60, imagesPerSite = 2,
      itemsPerFeed = 3))
    val loop = new CrawlLoop(spark, internet,
      CrawlConfig(maxBatches = 2, perHostBudget = 100,
        fetchPartitions = threads, useBloom = true))
    val seeds = (0 until sites).map(k => s"https://site-$k.test/")
    (1 to 3).foreach { round =>
      val loopR = new CrawlLoop(spark, internet,
        CrawlConfig(maxBatches = 2, perHostBudget = 100,
          fetchPartitions = threads, useBloom = true))
      val t0 = System.nanoTime()
      val result = loopR.run(seeds)
      val n = result.crawlLog.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"PROBE round=$round threads=$threads sites=$sites urls=$n sec=$sec%.1f tput=${n / sec}%.1f")
    }
    spark.stop()
  }
}
