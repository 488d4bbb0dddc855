package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed near-duplicate detection: MinHash+LSH, SimHash, n-gram
  * Jaccard. The shapes are the standard web-scale ones: sketch per row in
  * one map pass (no shuffle), band-bucket join for candidates (shuffle only
  * the tiny sketches, never the text), exact verify on the candidate pairs
  * only.
  */
object Dedup {

  // ------------------------------------------------------------ MinHash

  /** 64-permutation MinHash signature of word 3-shingles. */
  def minhashSignature(text: String, numHashes: Int = 64,
      shingleWidth: Int = 3): Array[Long] = {
    val shingles = TextKit.wordShingleHashes(text, shingleWidth)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < shingles.length) {
      val x = shingles(i)
      var h = 0
      while (h < numHashes) {
        // one multiply-xor per permutation — cheap, stable
        val v = graft.fetch.ImageKit.mix(x ^ (h.toLong * 0x9e3779b97f4a7c15L))
        if (v < sig(h)) sig(h) = v
        h += 1
      }
      i += 1
    }
    sig
  }

  /** Estimated Jaccard from two signatures. */
  def minhashSimilarity(a: Array[Long], b: Array[Long]): Double = {
    var same = 0
    var i = 0
    while (i < a.length) { if (a(i) == b(i)) same += 1; i += 1 }
    same.toDouble / a.length
  }

  val minhashUdf = udf((text: String) => minhashSignature(text))

  /** Hash of one signature band (rows per band = sig.length / bands). */
  def bandHashes(sig: Array[Long], bands: Int): Array[Long] = {
    val rows = sig.length / bands
    (0 until bands).map { b =>
      var h = b.toLong
      var i = b * rows
      while (i < (b + 1) * rows) { h = graft.fetch.ImageKit.mix(h ^ sig(i)); i += 1 }
      h
    }.toArray
  }

  val bandHashesUdf = udf((sig: Seq[Long], bands: Int) =>
    bandHashes(sig.toArray, bands))

  /** MinHash-LSH candidate pairs: df(idCol, textCol) → (id_a, id_b) with
    * id_a < id_b. Only sketches shuffle; bucket sizes stay small because a
    * band collision already implies high similarity. */
  def lshCandidatePairs(df: DataFrame, idCol: String, textCol: String,
      bands: Int = 16): DataFrame = {
    val withSig = df.select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("sig", minhashUdf(col("text")))
      .withColumn("band", explode(bandHashesUdf(col("sig"), lit(bands))))
    val buckets = withSig.groupBy("band")
      .agg(collect_set(col("id")).as("ids"))
      .filter(size(col("ids")) > 1)
    buckets.select(explode(pairsOfUdf(col("ids"))).as("pair"))
      .select(col("pair._1").as("id_a"), col("pair._2").as("id_b"))
      .distinct()
  }

  val pairsOfUdf = udf((ids: Seq[Long]) => {
    val sorted = ids.sorted
    for {
      i <- sorted.indices
      j <- (i + 1) until sorted.length
    } yield (sorted(i), sorted(j))
  })

  /** Candidates verified by exact shingle Jaccard ≥ threshold. The text
    * joins back only for the (rare) candidate rows. */
  def nearDuplicatePairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, bands: Int = 16): DataFrame = {
    val texts = df.select(col(idCol).as("id"), col(textCol).as("text"))
    val candidates = lshCandidatePairs(df, idCol, textCol, bands)
    val jaccardUdf = udf((a: String, b: String) =>
      TextKit.jaccard(TextKit.wordShingleHashes(a, 3),
        TextKit.wordShingleHashes(b, 3)))
    candidates
      .join(texts.withColumnRenamed("id", "id_a")
        .withColumnRenamed("text", "text_a"), Seq("id_a"))
      .join(texts.withColumnRenamed("id", "id_b")
        .withColumnRenamed("text", "text_b"), Seq("id_b"))
      .withColumn("jaccard", jaccardUdf(col("text_a"), col("text_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // ------------------------------------------------------------ SimHash

  /** 64-bit SimHash over unigram token hashes weighted by count. */
  def simhash(text: String): Long = {
    val toks = TextKit.tokens(text)
    if (toks.isEmpty) return 0L
    val weights = new Array[Int](64)
    toks.foreach { t =>
      val h = TextKit.hash64(t)
      var bit = 0
      while (bit < 64) {
        if (((h >> bit) & 1L) == 1L) weights(bit) += 1
        else weights(bit) -= 1
        bit += 1
      }
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (weights(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  val simhashUdf = udf((text: String) => simhash(text))

  /** SimHash near-dup pairs: block on 4 × 16-bit chunks (two docs within
    * Hamming distance ≤ 3 of 64 bits must agree on at least one chunk),
    * verify Hamming on candidates. */
  def simhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val withHash = df.select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("simhash", simhashUdf(col("text")))
    val chunked = withHash.select(col("id"), col("simhash"),
      explode(chunksUdf(col("simhash"))).as("chunk"))
    val buckets = chunked.groupBy("chunk")
      .agg(collect_set(struct(col("id"), col("simhash"))).as("members"))
      .filter(size(col("members")) > 1)
    val maxH = maxHamming
    val pairUdf = udf((members: Seq[org.apache.spark.sql.Row]) => {
      val sorted = members.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      for {
        i <- sorted.indices
        j <- (i + 1) until sorted.length
        d = java.lang.Long.bitCount(sorted(i)._2 ^ sorted(j)._2)
        if d <= maxH
      } yield (sorted(i)._1, sorted(j)._1, d)
    })
    buckets.select(explode(pairUdf(col("members"))).as("p"))
      .select(col("p._1").as("id_a"), col("p._2").as("id_b"),
        col("p._3").as("hamming"))
      .distinct()
  }

  val chunksUdf = udf((h: Long) =>
    (0 until 4).map(i => (i.toLong << 32) | ((h >>> (i * 16)) & 0xffffL)))
}
