package graft.handlers

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Compound-handler multi-source merge (J-5 / W4).
  *
  * The reference's DefaultCompoundChannelHandler fetches N sources per
  * logical URL and (a) picks the representative response — the first
  * *invalid* one if any (so failures surface), else the one matching the
  * logical URL, else the first (webtoolkit/handlers/
  * defaulturlhandler.py:145-207) — and (b) coalesces each metadata field
  * across sources in source order, first non-null wins (:263-309).
  *
  * Engine form: one ordered-coalescing aggregation, no per-row loops.
  * `sources` needs (logical_url, source_order, is_valid, url, plus the
  * meta columns to coalesce). Scale shape: a single hash aggregation on
  * logical_url — partial map-side agg applies, nothing else shuffles.
  */
object Compound {

  /** min_by key implementing pick-first semantics: invalid sources sort
    * ahead of valid ones, then source order; url-match preference sits
    * between (reference checks invalid → url-match → first). */
  private def pickKey(logicalUrl: Column, url: Column, isValid: Column,
      order: Column): Column =
    when(!isValid, order)
      .when(url === logicalUrl, order + lit(1000000L))
      .otherwise(order + lit(2000000L))

  /** First-non-null-in-source-order coalesce of column `c`. */
  private def coalesceInOrder(c: Column, order: Column): Column =
    min_by(c, when(c.isNotNull, order).otherwise(lit(Long.MaxValue)))

  /** Merge: one row per logical_url with the picked response's url/
    * validity and each meta column coalesced in source order. */
  def mergeSources(sources: DataFrame,
      metaCols: Seq[String] = Seq("title", "description", "language")): DataFrame = {
    val key = pickKey(col("logical_url"), col("url"), col("is_valid"),
      col("source_order"))
    val aggs =
      Seq(min_by(col("url"), key).as("picked_url"),
        min_by(col("is_valid"), key).as("picked_valid")) ++
        metaCols.map(c => coalesceInOrder(col(c), col("source_order")).as(c))
    sources.groupBy("logical_url").agg(aggs.head, aggs.tail: _*)
  }
}
