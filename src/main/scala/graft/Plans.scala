package graft

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for the headline queries — the
  * pushdown/broadcast/codegen audit (not part of the driver contract).
  * Run: sbt "runMain graft.Plans /root/testdata/sf0.01" */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("q01_agg", "q02_join_broadcast", "q03_anti_join", "q04_topk_window",
      "q06_ordered_coalesce", "q11_dedup_exact", "q15_minhash_lsh",
      "q16_simhash", "q17_ngram_jaccard", "q18_ann_brute",
      "q19_ann_ivf", "q24_embed_neardup", "q26_repetition")
      .foreach { name =>
      println(s"\n========== $name ==========")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    // the IVF centroid-sampling plan must be a map-only prefilter +
    // TakeOrderedAndProject — no global Sort (VERDICT r1 "What's wrong" #4)
    println("\n========== q19 centroid sampling ==========")
    locally {
      import org.apache.spark.sql.functions._
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      emb.select(col("vec_id").as("id"), col("embedding").as("v"))
        .withColumn("h", xxhash64(col("id")))
        .filter(pmod(col("h"), lit(64)) === 0)
        .orderBy(col("h"), col("id")).limit(16)
        .explain("formatted")
    }
    spark.stop()
  }
}
