package graft.frontier

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.url.UrlKit

/** Frontier-table operators: admission, salted priority dequeue (W2),
  * per-host budgets (J-3). All pure DataFrame transforms — the dequeue is
  * a deterministic function of (frontier state, config), never of task
  * completion order, so crawl order replays exactly.
  */
object Frontier {

  val cleanUdf = udf((url: String) => UrlKit.cleanedLink(url).orNull)
  val isWebLinkUdf = udf((url: String) => UrlKit.isWebLink(url))
  val isWebpageLinkUdf = udf((url: String) => UrlKit.isWebpageLink(url))
  val domainOnlyUdf = udf((url: String) => UrlKit.domainOnly(url).orNull)
  val isAnalyticsUdf = udf((url: String) => UrlKit.isAnalytics(url))
  val isLinkServiceUdf = udf((url: String) => UrlKit.isLinkService(url))

  /** Canonicalize + admission-filter raw links → frontier-shaped rows.
    * Admission = is_web_link ∧ ¬analytics ∧ ¬link-service (P3, P13, P14).
    * `saltBuckets` spreads one hot host over N partitions; the dequeue
    * below still treats the host as one budget unit. */
  def admit(rawLinks: DataFrame, depth: Column, batchTime: Column,
      saltBuckets: Int = 4): DataFrame = {
    rawLinks
      .withColumn("url", cleanUdf(col("url")))
      .filter(col("url").isNotNull && col("url") =!= "")
      .filter(isWebLinkUdf(col("url")))
      .filter(!isAnalyticsUdf(col("url")))
      .filter(!isLinkServiceUdf(col("url")))
      .dropDuplicates("url")
      .withColumn("url_hash", xxhash64(col("url")))
      .withColumn("host", domainOnlyUdf(col("url")))
      .withColumn("host_hash", xxhash64(col("host")))
      .withColumn("host_hash_salted",
        xxhash64(col("host"), pmod(col("url_hash"), lit(saltBuckets))))
      .withColumn("depth", depth)
      .withColumn("priority", lit(0.0))
      .withColumn("discovered_at", batchTime)
      .withColumn("state", lit("pending"))
      .withColumn("tries", lit(0))
      .withColumn("not_before", lit(null).cast("timestamp"))
  }

  /** W2: salted per-host top-k dequeue with a deterministic total order —
    * (priority desc, discovered_at, url_hash, url) — so ties never depend
    * on partitioning. Returns rows to fetch this batch. */
  def dequeue(frontier: DataFrame, batchTime: Column,
      perHostBudget: Int): DataFrame = {
    val eligible = frontier
      .filter(col("state") === "pending")
      .filter(col("not_before").isNull || col("not_before") <= batchTime)
    val w = Window.partitionBy("host")
      .orderBy(desc("priority"), col("discovered_at"), col("url_hash"),
        col("url"))
    eligible
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= perHostBudget)
      .drop("rn")
  }

  /** Global deterministic sequence for the crawl log: one number per batch
    * over (priority desc, discovered_at, url_hash, url). */
  def withCrawlSeq(dequeued: DataFrame): DataFrame = {
    val w = Window.orderBy(desc("priority"), col("discovered_at"),
      col("url_hash"), col("url"))
    dequeued.withColumn("seq", row_number().over(w))
  }
}
