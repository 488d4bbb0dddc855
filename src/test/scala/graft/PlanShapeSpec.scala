package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Pins the physical-plan shapes the 100 TB posture claims — regressions
  * here are silent performance cliffs, not wrong answers, so they need
  * their own assertions. */
class PlanShapeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.queryExecution.executedPlan.toString
  }

  test("rules LRU eviction is a TakeOrderedAndProject, not a global sort") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val rules = (1 to 500).map(i => (s"host-$i", s"txt$i", 200, i % 7))
      .toDF("host", "robots_txt", "robots_status", "fetched_batch")
    val evict = rules
      .orderBy(col("fetched_batch").desc, col("host").desc)
      .limit(100)
    val plan = planOf(evict)
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange rangepartitioning"),
      s"global sort leaked into eviction:\n$plan")
  }

  test("frontier dequeue budget is a WindowGroupLimit, host-partitioned") {
    import spark.implicits._
    val pending = (1 to 200).map(i =>
      (s"u$i", i.toLong, s"host-${i % 9}", 0.0,
        new java.sql.Timestamp(0L), "pending",
        null.asInstanceOf[java.sql.Timestamp]))
      .toDF("url", "url_hash", "host", "priority", "discovered_at",
        "state", "not_before")
    val dq = graft.frontier.Frontier.dequeue(pending, lit(
      new java.sql.Timestamp(60000L)), perHostBudget = 5)
    val plan = planOf(dq)
    assert(plan.contains("WindowGroupLimit"), plan)
    // the window is partitioned — never the r2 "No Partition Defined"
    assert(!plan.contains("No Partition Defined"), plan)
  }

  test("robots gate joins the rules as a broadcast, never a shuffle") {
    import spark.implicits._
    val batch = (1 to 300).map(i => (s"u$i", s"host-${i % 40}"))
      .toDF("url", "host")
    val rules = (1 to 40).map(i => (s"host-$i", s"txt$i"))
      .toDF("host", "robots_txt")
    val gated = batch.join(broadcast(rules), Seq("host"), "left")
    val plan = planOf(gated)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
