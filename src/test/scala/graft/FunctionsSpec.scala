package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{GraftExtensions, GraftFunctions, UrlIsWebLink}
import graft.url.UrlKit

/** Native Catalyst URL expressions: equal to the reference Scala
  * functions, registered as SQL functions, and codegen'd (no ScalaUDF in
  * the plan of the admission path). */
class FunctionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val urls = Seq(
    "https://site-0.test/page/1",
    "https://site-0.test/page/1/",           // trailing slash strip
    "HTTPS://Site-0.Test/Page",              // domain lowercased, path kept
    "https://www.youtube.com/watch?v=abc",
    "https://s3.amazonaws.com/bucket/key",   // analytics infra → rejected
    "https://bit.ly/xyz",                    // link service → rejected
    "mailto:someone@example.com",            // not a web link
    "https://user@site-1.test/a",
    "not a url at all",
    "")

  test("url_admit / url_domain_only / url_is_web_link match UrlKit exactly") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
    val out = urls.toDF("url")
      .select(col("url"),
        expr("url_admit(url)").as("admitted"),
        expr("url_domain_only(url)").as("host"),
        expr("url_is_web_link(url)").as("is_web"))
      .collect()
    out.foreach { r =>
      val u = r.getAs[String]("url")
      val expected = UrlKit.cleanedLink(u) match {
        case Some(c) if c.nonEmpty && UrlKit.isWebLink(c) &&
          !UrlKit.isAnalytics(c) && !UrlKit.isLinkService(c) => c
        case _ => null
      }
      assert(r.getAs[String]("admitted") == expected, s"admit($u)")
      assert(r.getAs[String]("host") == UrlKit.domainOnly(u).orNull,
        s"domain($u)")
      assert(r.getAs[Boolean]("is_web") == UrlKit.isWebLink(u), s"web($u)")
    }
    // the analytics / link-service / mailto rows are rejected
    val admitted = out.flatMap(r => Option(r.getAs[String]("admitted")))
    assert(!admitted.exists(_.contains("amazonaws")))
    assert(!admitted.exists(_.contains("bit.ly")))
    assert(!admitted.exists(_.startsWith("mailto")))
  }

  test("admission path is native codegen — no ScalaUDF in the plan") {
    GraftFunctions.register(spark)
    // a range-backed source: literal tables get constant-folded away,
    // which would hide the expression from the physical plan
    val df = spark.range(1000)
      .selectExpr("concat('https://site-', id % 50, '.test/page/', id) AS url")
      .selectExpr("url_admit(url) AS u")
      .filter(col("u").isNotNull)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
    assert(plan.contains("url_admit"), plan)
    // whole-stage codegen wraps the projection+filter (the "*(n)" marker)
    assert(plan.contains("*(1) Project"), plan)
    assert(plan.contains("*(1) Filter"), plan)
    assert(df.count() == 1000)
  }

  test("url_is_web_link is false (never null) on null input, both paths") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // nullable column through codegen: null url → false, not null/NPE
    val df = Seq(Some("https://a.test/"), None, Some("mailto:x@y"))
      .toDF("url").selectExpr("url", "url_is_web_link(url) AS ok")
    val rows = df.collect()
    assert(!rows.exists(_.isNullAt(1)), "url_is_web_link returned null")
    assert(rows.map(_.getBoolean(1)).toSeq == Seq(true, false, false))
    // interpreted eval path agrees
    val e = UrlIsWebLink(org.apache.spark.sql.catalyst.expressions.Literal(
      null, org.apache.spark.sql.types.StringType))
    assert(e.eval(null) == false)
    assert(!e.nullable)
  }

  test("GraftExtensions injects the same functions at session build") {
    // unit-level: apply the extension to a fresh builder-backed session
    val ext = new GraftExtensions()
    val session = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .withExtensions(ext)
      .getOrCreate()
    GraftFunctions.register(session) // getOrCreate may reuse: ensure present
    val row = session.sql(
      "SELECT url_admit('https://site-9.test/a/') AS u").head()
    assert(row.getString(0) == "https://site-9.test/a")
  }
}
