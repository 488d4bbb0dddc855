package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc stage-level profiling for the expensive composite queries
  * (q17/q25/q27 internals) — measurement tooling for the optimization
  * rounds, not part of the driver contract. */
object ProbeStages {

  private def t[T](name: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val out = body
    println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    out
  }

  def main(args: Array[String]): Unit = {
    val what = args.headOption.getOrElse("q25")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docsHalf: DataFrame = {
      val base = spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(col("doc_id") % 2 === 0)
        .select("doc_id", "text")
      val planted = base.orderBy("doc_id").limit(3)
        .withColumn("doc_id", col("doc_id") + lit(1000000000L))
        .withColumn("text", concat(col("text"), lit(" appended")))
      base.unionByName(planted)
    }

    what match {
      case "q25stages" =>
        // replicate exactJaccardPairs internals with per-stage timing
        // (kept in sync with Dedup.exactJaccardPairs: UDF-side sort,
        // threshold early-exit verify); two reps — rep 2 is the warm
        // (JIT-settled) number
        for (rep <- 1 to 2) {
        println(s"=== rep $rep ===")
        val n = 3; val threshold = 0.6
        val gramsUdf = udf((s: String) => {
          val a = graft.ml.TextKit.charNgramHashes(s, n)
          java.util.Arrays.sort(a); a
        })
        val jacUdf = udf((a: Array[Long], b: Array[Long]) =>
          graft.ml.TextKit.jaccardSortedAtLeast(a, b, threshold))
        val docs = t("grams checkpoint") {
          docsHalf.select(col("doc_id").as("id"),
            gramsUdf(col("text")).as("g"))
            .localCheckpoint(true)
        }
        println("docs: " + docs.count())
        val exploded = docs.select(col("id"), size(col("g")).as("glen"),
          explode(col("g")).as("gram"))
        val freq = exploded.groupBy("gram").agg(count(lit(1)).as("gram_df"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("id").orderBy(col("gram_df"), col("gram"))
        val prefix = exploded.join(freq, Seq("gram"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <=
            col("glen") - ceil(lit(threshold) * col("glen")).cast("int") + 1)
          .select("id", "gram", "rn", "glen")
        val indexed = t("prefix index checkpoint") {
          prefix.unionByName(docs.filter(size(col("g")) === 0)
            .select(col("id"), lit(Long.MinValue).as("gram"),
              lit(1).as("rn"), lit(0).as("glen")))
            .localCheckpoint(true)
        }
        println("indexed rows: " + t("index count")(indexed.count()))
        val alpha = floor(lit(threshold / (1.0 + threshold)) *
          (col("glen_a") + col("glen_b")))
        def candSides(positional: Boolean) = {
          val raw = indexed.select(col("gram"), col("id").as("id_a"),
              col("rn").as("rn_a"), col("glen").as("glen_a"))
            .join(indexed.select(col("gram"), col("id").as("id_b"),
              col("rn").as("rn_b"), col("glen").as("glen_b")), Seq("gram"))
            .filter(col("id_a") < col("id_b"))
          if (positional) raw.filter(
            col("rn_a") <= col("glen_a") - alpha + 1 &&
              col("rn_b") <= col("glen_b") - alpha + 1)
          else raw
        }
        if (rep == 1) {
          println("raw candidates (pre-distinct, static prefix): " +
            t("raw candidate count")(candSides(false).count()))
          println("raw candidates (pre-distinct, positional): " +
            t("raw positional count")(candSides(true).count()))
        }
        val numShuffle =
          spark.conf.get("spark.sql.shuffle.partitions").toInt
        val candidates = indexed.repartition(numShuffle, col("id"))
          .select(col("gram"), col("id").as("id_a"), col("rn").as("rn_a"),
            col("glen").as("glen_a"))
          .join(indexed.select(col("gram"), col("id").as("id_b"),
            col("rn").as("rn_b"), col("glen").as("glen_b")), Seq("gram"))
          .filter(col("id_a") < col("id_b") &&
            col("rn_a") <= col("glen_a") - alpha + 1 &&
            col("rn_b") <= col("glen_b") - alpha + 1)
          .select("id_a", "id_b").distinct()
        val cand = t("candidates checkpoint") { candidates.localCheckpoint(true) }
        println("candidates: " + cand.count())
        println("partitions docs=" + docs.rdd.getNumPartitions +
          " indexed=" + indexed.rdd.getNumPartitions +
          " cand=" + cand.rdd.getNumPartitions)
        val pairs = cand
          .join(docs.select(col("id").as("id_a"), col("g").as("g_a")), Seq("id_a"))
          .join(docs.select(col("id").as("id_b"), col("g").as("g_b")), Seq("id_b"))
          .withColumn("jaccard", jacUdf(col("g_a"), col("g_b")))
          .filter(col("jaccard") >= threshold)
          .select("id_a", "id_b")
        val p = t("verify checkpoint") { pairs.localCheckpoint(true) }
        println("pairs: " + p.count())
        // CC timing
        val nodes = docsHalf.select(col("doc_id").as("id"))
        t("cc neighbor-min") {
          val r = graft.ml.Dedup.connectedComponents(nodes, p)
          println("cc rows: " + r.count())
        }
        t("cc star") {
          val r = graft.ml.Dedup.connectedComponentsStar(nodes, p)
          println("cc star rows: " + r.count())
        }
        }

      case "candplan" =>
        // final (post-AQE) physical plan of the q17/q25/q27 candidate
        // stage — join strategy and partition counts after coalescing
        val n = 3; val threshold = 0.6
        val gramsUdf = udf((s: String) => {
          val a = graft.ml.TextKit.charNgramHashes(s, n)
          java.util.Arrays.sort(a); a
        })
        val docs = docsHalf.select(col("doc_id").as("id"),
          gramsUdf(col("text")).as("g"))
          .localCheckpoint(true)
        val exploded0 = docs.select(col("id"), size(col("g")).as("glen"),
          explode(col("g")).as("gram"))
        val freq0 = exploded0.groupBy("gram").agg(count(lit(1)).as("gram_df"))
        val w0 = org.apache.spark.sql.expressions.Window
          .partitionBy("id").orderBy(col("gram_df"), col("gram"))
        val prefix0 = exploded0.join(freq0, Seq("gram"))
          .withColumn("rn", row_number().over(w0))
          .filter(col("rn") <=
            col("glen") - ceil(lit(threshold) * col("glen")).cast("int") + 1)
          .select("id", "gram")
        val indexed0 = prefix0.unionByName(docs.filter(size(col("g")) === 0)
          .select(col("id"), lit(Long.MinValue).as("gram")))
          .localCheckpoint(true)
        def candsOf(probe: DataFrame) =
          probe.select(col("gram"), col("id").as("id_a"))
            .join(indexed0.select(col("gram"), col("id").as("id_b")),
              Seq("gram"))
            .filter(col("id_a") < col("id_b"))
            .select("id_a", "id_b").distinct()
        def walk(p: org.apache.spark.sql.execution.SparkPlan,
            depth: Int): Unit = {
          val m = p.metrics.map { case (k, v) =>
            s"$k=${v.value}"
          }.mkString(", ")
          println(("  " * depth) + p.nodeName + "  [" + m + "]")
          p match {
            case a: org.apache.spark.sql.execution.adaptive
                .AdaptiveSparkPlanExec => walk(a.executedPlan, depth + 1)
            case q: org.apache.spark.sql.execution.adaptive
                .QueryStageExec => walk(q.plan, depth + 1)
            case r: org.apache.spark.sql.execution.adaptive
                .AQEShuffleReadExec => r.children.foreach(walk(_, depth + 1))
            case other => other.children.foreach(walk(_, depth + 1))
          }
        }
        val dp = spark.sparkContext.defaultParallelism
        for (variant <- Seq("plain", "spreadid", "plain2", "spreadid2")) {
          val probe =
            if (variant.startsWith("spreadid"))
              indexed0.repartition(dp, col("id"))
            else indexed0
          val c = candsOf(probe)
          val q = c.queryExecution
          t(s"candidates action [$variant]") {
            q.toRdd.foreachPartition(it => it.foreach(_ => ()))
          }
          println(s"=== [$variant] plan with runtime metrics ===")
          walk(q.executedPlan, 0)
        }
        println("indexed partitions: " + indexed0.rdd.getNumPartitions)

      case "innerplans" =>
        // formatted plans of the INTERNAL stages the optimization round
        // touched — the eager pair/CC operators return checkpoint scans,
        // so their load-bearing plans are these subtrees (committed as
        // plans/r07 evidence alongside the *_before/_after.txt files)
        import org.apache.spark.sql.execution.ExplainMode
        val outDir = args.lift(1).getOrElse("/root/repo/plans/r07")
        val suffix = args.lift(2).getOrElse("after")
        new java.io.File(outDir).mkdirs()
        def dump(name: String, df: DataFrame): Unit = {
          val w = new java.io.PrintWriter(s"$outDir/${name}_$suffix.txt")
          try w.println(df.queryExecution
            .explainString(ExplainMode.fromString("formatted")))
          finally w.close()
          System.err.println(s"[probe] wrote $outDir/${name}_$suffix.txt")
        }
        // (a) one neighbor-min CC round: union + single groupBy(min),
        //     convergence sum as CollectMetrics on the same subtree
        val und0 = spark.range(2).selectExpr("id AS src", "id + 1 AS dst")
        val labels0 = spark.range(3).selectExpr("id", "id AS component")
        val contributions = labels0.unionByName(und0
          .join(labels0.select(col("id").as("dst"),
            col("component").as("ncomp")), Seq("dst"))
          .select(col("src").as("id"), col("ncomp").as("component")))
        dump("cc_round_shape", contributions
          .groupBy("id").agg(min(col("component")).as("component")))
        // (b) the exact-Jaccard candidate+verify pipeline over the real
        //     sf corpus EXACTLY as Dedup.exactJaccardPairs builds it
        //     (from its two checkpoints): the only Exchange is the
        //     explicit probe-side repartition by id — candidate
        //     generation, the dedup aggregation and both (broadcast)
        //     verify joins ride ONE stage, because HashPartitioning(id)
        //     propagates through the broadcast join and satisfies the
        //     distinct's ClusteredDistribution(id_a, id_b)
        val n2 = 3; val t2 = 0.6
        val gramsUdf = udf((s: String) => {
          val a = graft.ml.TextKit.charNgramHashes(s, n2)
          java.util.Arrays.sort(a); a
        })
        val jacUdf = udf((a: Array[Long], b: Array[Long]) =>
          graft.ml.TextKit.jaccardSortedAtLeast(a, b, t2))
        val docs2 = docsHalf.select(col("doc_id").as("id"),
          gramsUdf(col("text")).as("g"))
          .localCheckpoint(true)
        val exploded2 = docs2.select(col("id"), size(col("g")).as("glen"),
          explode(col("g")).as("gram"))
        val freq2 = exploded2.groupBy("gram").agg(count(lit(1)).as("gram_df"))
        val w2 = org.apache.spark.sql.expressions.Window
          .partitionBy("id").orderBy(col("gram_df"), col("gram"))
        val prefix2 = exploded2.join(freq2, Seq("gram"))
          .withColumn("rn", row_number().over(w2))
          .filter(col("rn") <=
            col("glen") - ceil(lit(t2) * col("glen")).cast("int") + 1)
          .select("id", "gram", "rn", "glen")
        val indexed2 = prefix2.unionByName(docs2
          .filter(size(col("g")) === 0)
          .select(col("id"), lit(Long.MinValue).as("gram"),
            lit(1).as("rn"), lit(0).as("glen")))
          .localCheckpoint(true)
        val nShuf = spark.conf.get("spark.sql.shuffle.partitions").toInt
        val alpha2 = floor(lit(t2 / (1.0 + t2)) *
          (col("glen_a") + col("glen_b")))
        val cand2 = indexed2.repartition(nShuf, col("id"))
          .select(col("gram"), col("id").as("id_a"), col("rn").as("rn_a"),
            col("glen").as("glen_a"))
          .join(indexed2.select(col("gram"), col("id").as("id_b"),
            col("rn").as("rn_b"), col("glen").as("glen_b")), Seq("gram"))
          .filter(col("id_a") < col("id_b") &&
            col("rn_a") <= col("glen_a") - alpha2 + 1 &&
            col("rn_b") <= col("glen_b") - alpha2 + 1)
          .select("id_a", "id_b").distinct()
        dump("jaccard_verify_shape", cand2
          .join(docs2.select(col("id").as("id_a"), col("g").as("g_a")),
            Seq("id_a"))
          .join(docs2.select(col("id").as("id_b"), col("g").as("g_b")),
            Seq("id_b"))
          .withColumn("jaccard", jacUdf(col("g_a"), col("g_b")))
          .filter(col("jaccard") >= t2)
          .select("id_a", "id_b"))
        // (c) admit-dedup exchange reuse: the (url_hash, url)-keyed
        //     dedup aggregation feeds the (url_hash, url) anti-join with
        //     no second Exchange on the candidate side
        val raw = spark.range(1000).selectExpr(
          "concat('https://site-', id % 50, '.test/page/', id) AS url")
        val seen = spark.range(100).selectExpr(
          "concat('https://site-', id % 50, '.test/page/', id) AS url")
          .withColumn("url_hash", xxhash64(col("url")))
        val admitted = graft.frontier.Frontier.admit(raw, lit(1),
          lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")), 4)
        dump("admit_dedup_antijoin",
          graft.frontier.SeenSet.filterNewExact(admitted, seen))

      case "ccstages" =>
        // per-round timing of the neighbor-min CC loop over the q25 edges
        val nodes = docsHalf.select(col("doc_id").as("id"))
        val edges = t("edges (exactJaccardPairs)") {
          graft.ml.Dedup.exactJaccardPairs(docsHalf, "doc_id", "text", 3, 0.6)
        }
        println("edges: " + edges.count())
        val und = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
          .unionByName(
            edges.select(col("id_b").as("src"), col("id_a").as("dst")))
          .localCheckpoint(true)
        var labels = nodes.select(col("id"), col("id").as("component"))
          .localCheckpoint(true)
        var changed = 1L
        var iter = 0
        while (changed > 0 && iter < 50) {
          val t0 = System.nanoTime()
          val neighborMin = und
            .join(labels.select(col("id").as("dst"),
              col("component").as("ncomp")), Seq("dst"))
            .groupBy(col("src").as("id"))
            .agg(min(col("ncomp")).as("nmin"))
          val obs = org.apache.spark.sql.Observation()
          labels = labels.join(neighborMin, Seq("id"), "left")
            .withColumn("next",
              least(col("component"), coalesce(col("nmin"), col("component"))))
            .observe(obs, sum(when(col("next") < col("component"), 1L)
              .otherwise(0L)).as("changed"))
            .select(col("id"), col("next").as("component"))
            .localCheckpoint(true)
          changed = obs.get("changed").asInstanceOf[Long]
          iter += 1
          println(f"[probe] cc round $iter: ${(System.nanoTime() - t0) / 1e9}%.2fs changed=$changed")
        }

      case "fetchpath" =>
        // per-URL cost of each layer of the fetch+parse path, on plain
        // threads (no Spark): internet.get vs fetchOne vs full
        // CrawlLoop.fetchAndParse row work
        import graft.fetch.{FetchClient, SyntheticConfig, SyntheticInternet}
        import graft.model.FetchRequest
        val sites = args.lift(1).map(_.toInt).getOrElse(250)
        val threads = args.lift(2).map(_.toInt).getOrElse(8)
        val internet = SyntheticInternet(SyntheticConfig(
          seed = 42L, nSites = sites, pagesPerSite = 60, imagesPerSite = 2,
          itemsPerFeed = 3, bodyParagraphs = 60))
        val cfg = graft.crawl.CrawlConfig(maxBatches = 2, perHostBudget = 100,
          fetchPartitions = threads, useBloom = true, bloomRanges = 16,
          emitCrawlSeq = false, robotsCacheSize = math.max(1024, 2 * sites))
        val urls = (0 until sites).flatMap { s =>
          (0 until 60).map(p => s"https://site-$s.test/page/$p") ++
            (0 until 2).map(i => s"https://site-$s.test/img/img$i.png")
        }
        def onThreads(name: String)(f: String => Unit): Unit = {
          // JIT warm
          urls.take(2000).foreach(f)
          val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
          val t0 = System.nanoTime()
          urls.foreach(u => pool.submit(new Runnable { def run(): Unit = f(u) }))
          pool.shutdown()
          pool.awaitTermination(600, java.util.concurrent.TimeUnit.SECONDS)
          val sec = (System.nanoTime() - t0) / 1e9
          println(f"[probe] $name: $sec%.2fs (${urls.size / sec}%.0f urls/s)")
        }
        onThreads("internet.get")(u => { internet.get(u); () })
        onThreads("fetchOne") { u =>
          val req = FetchRequest.default(u).copy(timeoutS = cfg.timeoutS,
            userAgent = cfg.userAgent)
          FetchClient.fetchOne(req, internet); ()
        }
        onThreads("fetchAndParse-row") { u =>
          val host = graft.url.UrlKit.domainOnly(u).getOrElse("")
          graft.crawl.CrawlLoop.fetchAndParse(
            Iterator((u, 0L, host, 0L, 0L)), internet, cfg).foreach(_ => ())
        }

      case "q17stages" =>
        val base = spark.read.parquet(s"$sfDir/documents.parquet")
          .select("doc_id", "text")
        val planted = base.orderBy("doc_id").limit(3)
          .withColumn("doc_id", col("doc_id") + lit(1000000000L))
          .withColumn("text", concat(col("text"), lit(" appended")))
        val all = base.unionByName(planted)
        val out = t("exactJaccardPairs total") {
          val r = graft.ml.Dedup.exactJaccardPairs(all, "doc_id", "text",
            3, 0.6)
          r.count()
        }
        println("pairs: " + out)
    }
    spark.stop()
  }
}
