package graft.frontier

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Two-tier URL-seen dedup (J-1; SURVEY.md §2.5).
  *
  * The exact `left_anti` join on `url_hash`+`url` is the source of truth —
  * the north rule requires the seen set to match the reference exactly, so
  * the Bloom filter is only an accelerator: candidates the filter marks
  * "definitely new" skip the shuffle join entirely; "possibly seen" rows go
  * through the exact anti-join. At 10^10-URL scale the filter absorbs the
  * overwhelmingly-common case (a link never seen before) at ~zero shuffle
  * cost; false positives only cost a join probe, never correctness.
  */
object SeenSet {

  /** Candidate columns required: `url` (canonical). Adds `url_hash`. */
  def withHash(df: DataFrame): DataFrame =
    df.withColumn("url_hash", xxhash64(col("url")))

  /** Exact-only path: candidates not present in `seen`. */
  def filterNewExact(candidates: DataFrame, seen: DataFrame): DataFrame =
    candidates.join(seen.select("url_hash", "url"), Seq("url_hash", "url"),
      "left_anti")

  /** Bloom-accelerated path. `expectedSeen`/`fpp` size the filter; the
    * exact anti-join still guards every "possibly seen" candidate. */
  def filterNewBloom(candidates: DataFrame, seen: DataFrame,
      expectedSeen: Long, fpp: Double = 0.01): DataFrame = {
    if (expectedSeen <= 0) return filterNewExact(candidates, seen)
    val bloom: BloomFilter =
      seen.stat.bloomFilter(col("url_hash"), math.max(expectedSeen, 1000L), fpp)
    filterNewWithBloom(candidates, seen, bloom)
  }

  /** Same split with a caller-maintained filter — the crawl loop merges a
    * per-batch filter of the fresh URLs into one accumulated filter instead
    * of rescanning the whole seen table every iteration. */
  def filterNewWithBloom(candidates: DataFrame, seen: DataFrame,
      bloom: BloomFilter): DataFrame = {
    val spark = candidates.sparkSession
    val bloomBc = spark.sparkContext.broadcast(bloom)
    val mightContain = udf((h: Long) => bloomBc.value.mightContainLong(h))
    // candidates is read twice — callers pass a materialized (persisted or
    // checkpointed) frame and own its lifecycle; persisting here would leak
    val definitelyNew = candidates.filter(!mightContain(col("url_hash")))
    val possiblySeen = candidates.filter(mightContain(col("url_hash")))
    definitelyNew.unionByName(filterNewExact(possiblySeen, seen))
  }

  /** An empty filter sized for the run's URL budget; per-batch filters
    * built with the same parameters merge into it with `mergeInPlace`. */
  def newBloom(expectedTotal: Long, fpp: Double = 0.01): BloomFilter =
    BloomFilter.create(math.max(expectedTotal, 1000L), fpp)

  /** Bloom filter built as a task-side accumulator: the crawl loop taps
    * every `url_hash` flowing through the seen-delta checkpoint, so the
    * filter is populated inside a job that runs anyway — no separate
    * `stat.bloomFilter` aggregation pass per batch. Properties that make
    * an accumulator safe here: inserts are idempotent (task retries and
    * speculative duplicates just re-set the same bits) and the driver only
    * reads the value between jobs, after all task merges have landed.
    * Allocation is lazy so an empty accumulator serializes in bytes, not
    * filter-size. */
  final class BloomAccumulator(expected: Long, fpp: Double = 0.01)
      extends org.apache.spark.util.AccumulatorV2[Long, BloomFilter] {
    private var filter: BloomFilter = null
    override def isZero: Boolean = filter == null
    override def copy(): BloomAccumulator = {
      val c = new BloomAccumulator(expected, fpp)
      if (filter != null) { c.ensure(); c.filter.mergeInPlace(filter) }
      c
    }
    override def reset(): Unit = filter = null
    private def ensure(): Unit =
      if (filter == null) filter = newBloom(expected, fpp)
    override def add(h: Long): Unit = { ensure(); filter.putLong(h) }
    override def merge(
        o: org.apache.spark.util.AccumulatorV2[Long, BloomFilter]): Unit =
      if (!o.isZero) { ensure(); filter.mergeInPlace(o.value) }
    /** Snapshot for broadcast — never exposes the live mutable filter. */
    override def value: BloomFilter = {
      ensure()
      val snap = newBloom(expected, fpp)
      snap.mergeInPlace(filter)
      snap
    }
  }
}
