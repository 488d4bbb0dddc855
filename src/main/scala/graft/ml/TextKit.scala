package graft.ml

import scala.collection.mutable

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, shingles, language-ID, quality scoring, fingerprinting.
  * All pure functions — used from UDFs in the Spark queries and directly
  * in tests. Designed so the per-row cost is one pass over the text.
  */
object TextKit {

  /** splitmix64-based string hash (stable across JVMs — String.hashCode is
    * stable too, but 32-bit; this gives 64 bits for sketching). */
  def hash64(s: String, seed: Long = 0L): Long = {
    var h = seed ^ 0x9e3779b97f4a7c15L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0xbf58476d1ce4e5b9L
      h ^= h >>> 27
      i += 1
    }
    h ^ (h >>> 31)
  }

  /** Whitespace tokenization (lowercased). */
  def tokens(text: String): Array[String] =
    if (text == null || text.isEmpty) Array.empty
    else text.toLowerCase.split("\\s+").filter(_.nonEmpty)

  /** BPE-ish subword count estimate: whitespace tokens plus extra units
    * for long tokens (≈ 4 chars per subword unit) — a deterministic proxy
    * for tokenizer cost accounting at corpus scale. */
  def tokenCountBpeIsh(text: String): Int =
    tokens(text).map(t => 1 + (t.length - 1) / 4).sum

  /** Character n-gram set hashes (for Jaccard). */
  def charNgramHashes(text: String, n: Int): Array[Long] = {
    if (text == null || text.length < n) return Array.empty
    val t = text.toLowerCase
    val out = new mutable.HashSet[Long]()
    var i = 0
    while (i + n <= t.length) {
      out += hash64(t.substring(i, i + n))
      i += 1
    }
    out.toArray
  }

  /** Word w-shingle hashes (for MinHash). */
  def wordShingleHashes(text: String, w: Int): Array[Long] = {
    val toks = tokens(text)
    if (toks.length < w) {
      if (toks.isEmpty) return Array.empty
      return Array(hash64(toks.mkString(" ")))
    }
    val out = new mutable.HashSet[Long]()
    var i = 0
    while (i + w <= toks.length) {
      out += hash64(toks.slice(i, i + w).mkString(" "))
      i += 1
    }
    out.toArray
  }

  /** Exact Jaccard over two SORTED distinct hash arrays — linear merge,
    * no per-pair set allocation (the verify step of the set-similarity
    * join calls this millions of times on a dense corpus). */
  def jaccardSorted(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      val x = a(i); val y = b(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (a.length + b.length - inter)
  }

  /** [[jaccardSorted]] with a threshold early-exit for verify filters:
    * returns the exact Jaccard when the pair can still reach `t`, and
    * -1.0 as soon as the remaining elements provably cannot — so under a
    * `result >= t` filter the kept rows and their scores are identical
    * to [[jaccardSorted]], while the merge stops early on the (majority)
    * failing candidates.
    *
    * Exactness at the threshold boundary: `req` is the smallest
    * intersection size whose Jaccard — computed with the SAME double
    * division as the exact path — passes `>= t` (the ceil seed is
    * adjusted against that exact expression, so float error in the seed
    * cannot shift the boundary). IEEE division is correctly rounded and
    * I/(|A|+|B|-I) is monotone in I, so "reachable intersection < req"
    * implies the double the exact path would compute is < t. */
  def jaccardSortedAtLeast(a: Array[Long], b: Array[Long], t: Double): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    val la = a.length; val lb = b.length
    val maxI = math.min(la, lb)
    var req = math.ceil(t * (la + lb) / (1.0 + t)).toInt
    if (req < 0) req = 0
    while (req > 0 && (req - 1).toDouble / (la + lb - (req - 1)) >= t) req -= 1
    while (req <= maxI && req.toDouble / (la + lb - req) < t) req += 1
    if (req > maxI) return -1.0
    var i = 0; var j = 0; var inter = 0
    while (i < la && j < lb) {
      val x = a(i); val y = b(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else {
        if (x < y) i += 1 else j += 1
        val rem = if (la - i < lb - j) la - i else lb - j
        if (inter + rem < req) return -1.0
      }
    }
    inter.toDouble / (la + lb - inter)
  }

  /** Exact Jaccard over two hash sets. */
  def jaccard(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    val sa = a.toSet
    val inter = b.count(sa.contains)
    val union = sa.size + b.toSet.size - inter
    inter.toDouble / union
  }

  // ------------------------------------------------------- language ID

  /** Tiny per-language marker-word tables (deterministic heuristic — the
    * SQL-expressible stopword variant lives in SparkEntry so DuckDB can
    * mirror it; this richer n-gram/stopword mix is the engine-side API). */
  private val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " and ", " of ", " to ", " in ", " is ", " that "),
    "de" -> Seq(" der ", " die ", " das ", " und ", " ist ", " nicht ", " ein "),
    "fr" -> Seq(" le ", " la ", " les ", " et ", " est ", " une ", " dans "),
    "es" -> Seq(" el ", " los ", " las ", " y ", " es ", " una ", " que "),
    "it" -> Seq(" il ", " gli ", " che ", " e ", " di ", " una ", " per "),
    "pl" -> Seq(" i ", " nie ", " jest ", " się ", " na ", " do ", " że "))

  def countOccurrences(text: String, sub: String): Int = {
    var count = 0
    var idx = text.indexOf(sub)
    while (idx >= 0) { count += 1; idx = text.indexOf(sub, idx + 1) }
    count
  }

  /** Best-scoring language, ties broken by language code order; "und"
    * (undetermined) when nothing matches. */
  def languageOf(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    val padded = " " + text.toLowerCase + " "
    val scores = langMarkers.map { case (lang, markers) =>
      lang -> markers.map(countOccurrences(padded, _)).sum
    }
    val best = scores.toSeq.sortBy { case (lang, n) => (-n, lang) }.head
    if (best._2 == 0) "und" else best._1
  }

  // --------------------------------------------------- quality scoring

  final case class Quality(
      nChars: Int,
      nWords: Int,
      meanWordLen: Double,
      punctRatio: Double,
      stopwordRatio: Double,
      upperRatio: Double,
      score: Double)

  private val enStopwords = Set("the", "and", "of", "to", "in", "a", "is",
    "that", "it", "for", "on", "as", "with", "was", "at", "by")

  /** Length / punctuation / stopword heuristics (Gopher-rules-style). */
  def quality(text: String): Quality = {
    if (text == null || text.isEmpty)
      return Quality(0, 0, 0, 0, 0, 0, 0.0)
    val toks = tokens(text)
    val nWords = toks.length
    val nChars = text.length
    var punct = 0; var upper = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (!c.isLetterOrDigit && !c.isWhitespace) punct += 1
      if (c.isUpper) upper += 1
      i += 1
    }
    val meanWordLen =
      if (nWords == 0) 0.0 else toks.map(_.length).sum.toDouble / nWords
    val punctRatio = punct.toDouble / nChars
    val stopRatio =
      if (nWords == 0) 0.0
      else toks.count(enStopwords.contains).toDouble / nWords
    val upperRatio = upper.toDouble / nChars
    // score in [0,1]: reward sane lengths and stopword presence,
    // penalize punctuation/caps walls
    var score = 1.0
    if (nWords < 5 || nWords > 100000) score *= 0.2
    if (meanWordLen < 2 || meanWordLen > 12) score *= 0.4
    if (punctRatio > 0.3) score *= 0.3
    if (upperRatio > 0.4) score *= 0.3
    if (stopRatio < 0.05) score *= 0.6
    Quality(nChars, nWords, meanWordLen, punctRatio, stopRatio, upperRatio,
      score)
  }

  // ------------------------------------------------- winnowing fingerprint

  /** Winnowing document fingerprint: k-gram rolling hashes, minimum per
    * window of size w — robust to small edits, standard for near-dup and
    * plagiarism detection at corpus scale. */
  def winnowingFingerprint(text: String, k: Int = 8, w: Int = 4): Array[Long] = {
    val grams = {
      if (text == null || text.length < k) return Array.empty
      val t = text.toLowerCase
      val out = new Array[Long](t.length - k + 1)
      var i = 0
      while (i + k <= t.length) { out(i) = hash64(t.substring(i, i + k)); i += 1 }
      out
    }
    if (grams.length <= w) return Array(grams.min)
    val picked = new mutable.LinkedHashSet[Long]()
    var i = 0
    while (i + w <= grams.length) {
      var min = grams(i)
      var j = i + 1
      while (j < i + w) { if (grams(j) < min) min = grams(j); j += 1 }
      picked += min
      i += 1
    }
    picked.toArray
  }
}
