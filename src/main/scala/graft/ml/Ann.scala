package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *   - brute-force cosine top-k (the exactness baseline): broadcast the
  *     (small) query set, score every row, per-query window top-k;
  *   - IVF: one cheap pass assigns rows to coarse centroids; queries probe
  *     only the nearest `nProbe` cells, cutting the scored fraction to
  *     ~nProbe/nCells — the 100 TB path, same output schema.
  * Scores are rounded before ranking so rankings are reproducible across
  * engines and summation orders.
  */
object Ann {

  def dot(a: Seq[Float], b: Seq[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  def norm(a: Seq[Float]): Double = math.sqrt(dot(a, a))

  def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    val na = norm(a); val nb = norm(b)
    if (na == 0 || nb == 0) 0.0 else dot(a, b) / (na * nb)
  }

  /** Cosine floored to 6 decimals — stable rank keys, reproducible across
    * engines (floor has no half-rounding mode; DuckDB mirrors it exactly
    * for the q18 oracle). */
  val cosineUdf = udf((a: Seq[Float], b: Seq[Float]) =>
    math.floor(cosine(a, b) * 1e6) / 1e6)

  /** Brute-force top-k: every (query, row) pair scored; deterministic
    * tiebreak on neighbor id. `queries` and `corpus` need (idCol, vecCol). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosineUdf(col("qvec"), col("cvec")))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cosine"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** Deterministic coarse centroids without touching the whole corpus:
    * a map-only hash prefilter keeps ~1/`sampleMod` of the rows, then a
    * per-partition top-`nCells` by hash (TakeOrderedAndProject — NOT a
    * global sort) picks the sample. Seeded by xxhash64 so the choice is
    * stable across runs and partitionings; spread across the id space
    * regardless of how ids cluster (k-means refinement would drop in
    * here). Falls back to an unfiltered top-k only when the corpus is too
    * small for the prefilter to yield `nCells` rows. */
  def centroids(corpus: DataFrame, idCol: String, vecCol: String,
      nCells: Int, sampleMod: Int = 64): Array[(Int, Seq[Float])] = {
    val base = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("h", xxhash64(col("id")))
    def topK(df: DataFrame) =
      df.orderBy(col("h"), col("id")).limit(nCells).collect()
    val sampled = topK(base.filter(pmod(col("h"), lit(sampleMod)) === 0))
    val rows = if (sampled.length >= nCells) sampled else topK(base)
    rows.zipWithIndex.map { case (r, i) => (i, r.getSeq[Float](1)) }
  }

  /** IVF top-k: rows scored only in the query's `nProbe` nearest cells. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    val cents = centroids(corpus, idCol, vecCol, nCells)
    val centsBc = spark.sparkContext.broadcast(cents)

    val cellOf = udf((v: Seq[Float]) =>
      centsBc.value.minBy { case (i, c) => (-cosine(v, c), i) }._1)
    val probeCells = udf((v: Seq[Float]) =>
      centsBc.value.sortBy { case (i, c) => (-cosine(v, c), i) }
        .take(nProbe).map(_._1))

    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
      .withColumn("cell", cellOf(col("cvec")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
      .withColumn("cell", explode(probeCells(col("qvec"))))
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosineUdf(col("qvec"), col("cvec")))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cosine"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }
}
