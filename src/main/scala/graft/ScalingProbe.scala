package graft

import org.apache.spark.sql.SparkSession
import graft.crawl.{CrawlConfig, CrawlLoop}
import graft.fetch.{SyntheticConfig, SyntheticInternet}

/** Ad-hoc slot-scaling probe (not part of the driver contract): one crawl
  * per requested slot count at a fixed scale, printed raw. Usage:
  *   runMain graft.ScalingProbe <sites> <slots,slots,...> [reps]
  */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val sites = args.headOption.map(_.toInt).getOrElse(250)
    val slotList = args.lift(1).getOrElse("8,32").split(",").map(_.toInt)
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val internet = SyntheticInternet(SyntheticConfig(
      seed = 42L, nSites = sites, pagesPerSite = 60, imagesPerSite = 2,
      itemsPerFeed = 3, bodyParagraphs = 60))
    for (rep <- 1 to reps; slots <- slotList) {
      spark.conf.set("spark.sql.shuffle.partitions", slots.toString)
      val loop = new CrawlLoop(spark, internet,
        CrawlConfig(maxBatches = 2, perHostBudget = 100,
          fetchPartitions = slots, useBloom = true, bloomRanges = 16,
          emitCrawlSeq = false,
          robotsCacheSize = math.max(1024, 2 * sites), verbose = true))
      val seeds = (0 until sites).map(k => s"https://site-$k.test/")
      val t0 = System.nanoTime()
      val result = loop.run(seeds)
      val fetched = result.crawlLog.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] rep=$rep slots=$slots sites=$sites urls=$fetched " +
        f"sec=$sec%.1f tput=${fetched / sec}%.0f")
    }
    spark.stop()
  }
}
