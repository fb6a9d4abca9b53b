package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: flag training documents
  * sharing word n-grams with an evaluation/benchmark set (the standard
  * 13-gram-overlap methodology of GPT-3 appx. C / Dolma, here with a
  * configurable n). Everything is codegen'd built-ins — no UDF.
  *
  * Scale shape: the benchmark side is eval-suite-sized (thousands of
  * documents, millions of distinct grams) and is always broadcast — the
  * 100 TB corpus side is scanned once, exploded map-side, hash-joined
  * against the broadcast gram set, and aggregated per document with
  * map-side partial counts. The corpus never shuffles except on
  * (doc_id) for the final count, and only for rows that HIT a benchmark
  * gram — a tiny fraction of the corpus.
  */
object Decontamination {

  /** Distinct word n-grams of a document: lowercase, whitespace-split,
    * windows of n joined by single spaces. Documents shorter than n tokens
    * produce no grams.
    */
  def wordNgrams(text: Column, n: Int): Column = {
    val toks = filter(split(lower(trim(text)), "\\s+"), t => length(t) > 0)
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(array_distinct(
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n))))))
  }

  /** Distinct 64-bit hashes of a document's word n-grams, via the native
    * codegen'd kernel [[graft.functions.WordNgramHashes]] — one tight-loop
    * call per document. What flows through the plan (explode, broadcast,
    * join) is 8-byte longs, a ~5× reduction over gram text; at corpus scale
    * that is the difference between broadcasting a benchmark gram set and
    * not.
    */
  def wordNgramHashes(text: Column, n: Int): Column =
    graft.functions.WordNgramHashes(text, n)

  /** Per-document contamination report: documents of `corpus` sharing at
    * least `minOverlap` distinct `n`-grams with any benchmark document.
    * Returns (idCol, n_contaminated) — the count of distinct shared grams.
    * Matching is on 64-bit gram hashes (collision odds ~m²/2⁶⁵ — vanishing
    * for any real benchmark suite).
    */
  def contaminationReport(corpus: DataFrame, idCol: String, textCol: String,
                          bench: DataFrame, benchTextCol: String,
                          n: Int = 13, minOverlap: Int = 1): DataFrame = {
    val benchGrams = bench
      .select(explode(wordNgramHashes(col(benchTextCol), n)).as("gram")).distinct()
    val docGrams = corpus
      .select(col(idCol), explode(wordNgramHashes(col(textCol), n)).as("gram"))
    // grams are distinct per doc already (wordNgramHashes dedups) ⇒ plain count
    docGrams.join(broadcast(benchGrams), "gram")
      .groupBy(idCol).agg(count(lit(1)).as("n_contaminated"))
      .filter(col("n_contaminated") >= minOverlap)
  }

  /** Span-removal variant: null out documents whose contamination exceeds
    * `maxOverlap` grams (drop), pass the rest through unchanged — the
    * filter actually applied before training.
    */
  def decontaminate(corpus: DataFrame, idCol: String, textCol: String,
                    bench: DataFrame, benchTextCol: String,
                    n: Int = 13, maxOverlap: Int = 0): DataFrame = {
    val contaminated = contaminationReport(corpus, idCol, textCol, bench, benchTextCol, n,
      minOverlap = maxOverlap + 1).select(col(idCol))
    corpus.join(contaminated, Seq(idCol), "left_anti")
  }

  /** SEMANTIC contamination report: corpus rows whose embedding is within
    * `minCosine` of at least one benchmark embedding — the embedding-space
    * complement of the n-gram overlap above, catching paraphrased or
    * translated benchmark leakage that shares no literal grams.
    * Returns (idCol, n_matches, max_cos).
    *
    * Scale shape: benchmark suites are small by nature, so the benchmark
    * embeddings BROADCAST and the corpus side is one narrow pass — a
    * broadcast nested-loop join with the codegen'd cosine as the
    * condition, then a per-id partial aggregation. The corpus never
    * shuffles except the hit rows (a tiny fraction), exactly like the
    * n-gram path. Cost is corpus × bench cosines map-side: fine for
    * eval-suite-sized benchmarks; pre-filter the benchmark, not the
    * corpus, if it ever grows.
    */
  def semanticContaminationReport(
      corpus: DataFrame, idCol: String, vecCol: String,
      bench: DataFrame, benchVecCol: String,
      minCosine: Double): DataFrame = {
    val b = broadcast(bench.select(col(benchVecCol).as("__bv")))
    corpus.select(col(idCol), col(vecCol).as("__cv"))
      .join(b, graft.ops.Similarity.cosine(col("__cv"), col("__bv")) >= minCosine)
      .groupBy(idCol).agg(
        count(lit(1)).as("n_matches"),
        max(graft.ops.Similarity.cosine(col("__cv"), col("__bv"))).as("max_cos"))
  }

  /** Drop corpus rows the semantic report flags; pass the rest through
    * unchanged. The anti-join side is the flagged ids only.
    */
  def decontaminateByEmbedding(
      corpus: DataFrame, idCol: String, vecCol: String,
      bench: DataFrame, benchVecCol: String,
      minCosine: Double): DataFrame = {
    val flagged = semanticContaminationReport(
      corpus, idCol, vecCol, bench, benchVecCol, minCosine).select(col(idCol))
    corpus.join(flagged, Seq(idCol), "left_anti")
  }
}
