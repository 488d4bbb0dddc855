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

  /** One fused pass per link: canonicalize then admission-check
    * (is_web_link ∧ ¬analytics ∧ ¬link-service — P3, P13, P14); null when
    * rejected. Fused because each separate predicate re-parses the URL. */
  val admitUdf = udf { (url: String) =>
    UrlKit.cleanedLink(url) match {
      case Some(clean) if clean.nonEmpty && UrlKit.isWebLink(clean) &&
        !UrlKit.isAnalytics(clean) && !UrlKit.isLinkService(clean) => clean
      case _ => null
    }
  }

  /** Canonicalize + admission-filter raw links → frontier-shaped rows.
    * `saltBuckets` spreads one hot host over N partitions; the dequeue
    * below still treats the host as one budget unit. The per-link hot
    * path runs as native codegen expressions (graft.functions), not
    * ScalaUDFs — no encoder round-trip, stays in whole-stage codegen. */
  def admit(rawLinks: DataFrame, depth: Column, batchTime: Column,
      saltBuckets: Int = 4): DataFrame = {
    graft.functions.GraftFunctions.register(rawLinks.sparkSession)
    rawLinks
      .withColumn("url", expr("url_admit(url)"))
      .filter(col("url").isNotNull)
      // hash BEFORE the dedup and dedup on (url_hash, url): url_hash is
      // a pure function of url, so the distinct set is unchanged — but
      // the dedup's exchange is now keyed exactly like every downstream
      // seen-set/redirect anti-join (url_hash, url), so those joins
      // reuse this partitioning instead of re-shuffling the candidate
      // links (guide §2.4: two operations keyed the same way share one
      // exchange)
      .withColumn("url_hash", xxhash64(col("url")))
      .dropDuplicates("url_hash", "url")
      .withColumn("host", expr("url_domain_only(url)"))
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
    * over (priority desc, discovered_at, url_hash, url). Implemented as a
    * parallel range-partitioned sort + zipWithIndex — a global
    * `row_number()` window would drag every row through one partition. */
  def withCrawlSeq(dequeued: DataFrame): DataFrame = {
    val spark = dequeued.sparkSession
    val sorted = dequeued.orderBy(desc("priority"), col("discovered_at"),
      col("url_hash"), col("url"))
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+
        org.apache.spark.sql.types.StructField("seq",
          org.apache.spark.sql.types.LongType, nullable = false))
    val rows = sorted.rdd.zipWithIndex().map { case (row, idx) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (idx + 1L))
    }
    spark.createDataFrame(rows, schema)
  }
}
