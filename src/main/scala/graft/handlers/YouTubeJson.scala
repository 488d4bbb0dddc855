package graft.handlers

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** YouTube video / ReturnDislike JSON accessors (Y1/Y2) as `from_json`
  * column mappings — pure Catalyst, no UDFs
  * (reference: webtoolkit/pages.py:1435-1668).
  */
object YouTubeJson {

  /** yt-dlp-shaped video JSON (the field subset the reference reads). */
  val videoSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("url", StringType),
    StructField("title", StringType),
    StructField("description", StringType),
    StructField("duration", LongType),
    StructField("thumbnail", StringType),
    StructField("thumbnails", ArrayType(StructType(Seq(
      StructField("url", StringType))))),
    StructField("tags", ArrayType(StringType)),
    StructField("categories", ArrayType(StringType)),
    StructField("upload_date", StringType),
    StructField("epoch", LongType),
    StructField("timestamp", LongType),
    StructField("channel", StringType),
    StructField("channel_url", StringType),
    StructField("channel_id", StringType),
    StructField("channel_follower_count", LongType),
    StructField("view_count", LongType),
    StructField("like_count", LongType),
    StructField("live_status", StringType),
    StructField("was_live", BooleanType)))

  /** Parse a yt-dlp JSON column into the reference's accessor columns:
    * thumbnail falls back to thumbnails[0].url (pages.py:1499-1505), the
    * date cascade is upload_date → epoch (UTC) → timestamp
    * (pages.py:1520-1531), live = ¬(live_status∈{not_live,False}) ∨
    * was_live (pages.py:1599-1615). */
  def parseVideo(df: DataFrame, jsonCol: String): DataFrame = {
    val j = from_json(col(jsonCol), videoSchema)
    df.withColumn("yt", j)
      .withColumn("video_id", col("yt.id"))
      .withColumn("title", col("yt.title"))
      .withColumn("description", col("yt.description"))
      .withColumn("duration_s", col("yt.duration"))
      .withColumn("thumbnail",
        coalesce(col("yt.thumbnail"),
          col("yt.thumbnails").getItem(0).getField("url")))
      .withColumn("tags", col("yt.tags"))
      .withColumn("categories", col("yt.categories"))
      .withColumn("date_published",
        coalesce(
          to_timestamp(col("yt.upload_date"), "yyyyMMdd"),
          to_timestamp(from_unixtime(col("yt.epoch"))),
          to_timestamp(from_unixtime(col("yt.timestamp")))))
      .withColumn("channel_name", col("yt.channel"))
      .withColumn("channel_url", col("yt.channel_url"))
      .withColumn("channel_code", col("yt.channel_id"))
      .withColumn("followers_count", col("yt.channel_follower_count"))
      .withColumn("channel_feed_url",
        concat(lit("https://www.youtube.com/feeds/videos.xml?channel_id="),
          col("yt.channel_id")))
      .withColumn("view_count", coalesce(col("yt.view_count"), lit(0L)))
      .withColumn("thumbs_up", coalesce(col("yt.like_count"), lit(0L)))
      .withColumn("is_live",
        (col("yt.live_status").isNotNull &&
          !col("yt.live_status").isin("not_live", "False")) ||
          coalesce(col("yt.was_live"), lit(false)))
      .withColumn("link_url",
        concat(lit("https://www.youtube.com/watch?v="), col("yt.id")))
      .drop("yt")
  }

  /** ReturnDislike votes JSON (pages.py:1628-1666) + the social
    * derivations of A2 (handlers/handlerinterface.py:162-184). */
  val dislikeSchema: StructType = StructType(Seq(
    StructField("likes", LongType),
    StructField("dislikes", LongType),
    StructField("viewCount", LongType),
    StructField("rating", DoubleType)))

  def parseDislike(df: DataFrame, jsonCol: String): DataFrame = {
    val j = from_json(col(jsonCol), dislikeSchema)
    df.withColumn("rd", j)
      .withColumn("thumbs_up", col("rd.likes"))
      .withColumn("thumbs_down", col("rd.dislikes"))
      .withColumn("view_count", col("rd.viewCount"))
      .withColumn("rating", col("rd.rating"))
      .withColumn("upvote_ratio",
        when(col("rd.likes") + col("rd.dislikes") > 0,
          col("rd.likes").cast("double") /
            (col("rd.likes") + col("rd.dislikes"))))
      .withColumn("upvote_diff", col("rd.likes") - col("rd.dislikes"))
      .withColumn("upvote_view_ratio",
        when(col("rd.viewCount") > 0,
          col("rd.likes").cast("double") / col("rd.viewCount")))
      .drop("rd")
  }
}
