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

  /** Paragraph-level decontamination (the Dolma/CCNet span rule — surgical
    * where [[decontaminate]] is wholesale): remove only the PARAGRAPHS
    * sharing at least one word `n`-gram with the benchmark set, and
    * rebuild each document from its surviving paragraphs in original
    * order. A document whose every paragraph is contaminated disappears
    * entirely (consistent with the doc-level drop); paragraphs shorter
    * than `n` tokens carry no grams and always survive, as do blank ones.
    *
    * Scale shape: same as [[contaminationReport]] — the benchmark gram
    * hashes broadcast, paragraph grams explode map-side into a broadcast
    * hash join, and only the contaminated (id, pos) hits flow onward. The
    * one corpus shuffle is the per-document rebuild keyed on `idCol`
    * (uniformly distributed), the same shape as
    * [[graft.ops.Dedup.paragraphDedup]] — no stage keys on a hot gram.
    */
  def decontaminateParagraphs(
      corpus: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String,
      n: Int = 13, sep: String = "\n"): DataFrame = {
    val paras = splitParagraphs(corpus, idCol, textCol, sep)
    val bad = contaminatedParagraphs(paras, idCol, bench, benchTextCol, n)
      .select(col(idCol), col("__pos"))
    paras.join(bad, Seq(idCol, "__pos"), "left_anti")
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("__pos"), col("__para")))).as("__arr"))
      .select(col(idCol),
        concat_ws(sep, transform(col("__arr"), x => x.getField("__para"))).as(textCol))
  }

  /** Span-level observability twin of [[decontaminateParagraphs]] (what
    * [[contaminationReport]] is to [[decontaminate]]): one row per
    * CONTAMINATED paragraph — `(idCol, paragraph_pos, n_contaminated)`,
    * the count of distinct benchmark grams the span shares. Feed it to a
    * reviewer before committing a span-removal pass; same broadcast
    * shapes, no corpus shuffle beyond the hit rows.
    */
  def paragraphContaminationReport(
      corpus: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String,
      n: Int = 13, sep: String = "\n"): DataFrame =
    contaminatedParagraphs(
        splitParagraphs(corpus, idCol, textCol, sep), idCol, bench, benchTextCol, n)
      .withColumnRenamed("__pos", "paragraph_pos")

  /** `(idCol, __pos, __para)` — documents split on `sep`, position kept.
    * NULL text coalesces to "" first: split(null) is null and posexplode
    * of null emits NO rows, which would silently DROP the document from
    * the rebuilt output — unlike doc-level [[decontaminate]], where a
    * null-text doc has no grams and survives the anti-join. Coalescing
    * keeps the two levels row-preserving alike (the null doc survives as
    * one empty paragraph, the blank-paragraph rule).
    */
  private def splitParagraphs(
      corpus: DataFrame, idCol: String, textCol: String, sep: String): DataFrame =
    corpus.select(col(idCol),
      posexplode(split(coalesce(col(textCol), lit("")), java.util.regex.Pattern.quote(sep)))
        .as(Seq("__pos", "__para")))

  /** `(idCol, __pos, n_contaminated)` for paragraphs sharing >= 1 word
    * n-gram with the benchmark: grams explode map-side into a broadcast
    * hash join against the distinct benchmark gram hashes (grams are
    * distinct per paragraph already — wordNgramHashes dedups — so the
    * count is a plain count).
    */
  private def contaminatedParagraphs(
      paras: DataFrame, idCol: String,
      bench: DataFrame, benchTextCol: String, n: Int): DataFrame = {
    val benchGrams = bench
      .select(explode(wordNgramHashes(col(benchTextCol), n)).as("gram")).distinct()
    paras
      .select(col(idCol), col("__pos"),
        explode(wordNgramHashes(col("__para"), n)).as("gram"))
      .join(broadcast(benchGrams), "gram")
      .groupBy(col(idCol), col("__pos"))
      .agg(count(lit(1)).as("n_contaminated"))
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
    *
    * Per-pair cost is bounded by a PREFIX-BOUND prefilter: each side
    * precomputes (once per ROW, not per pair) its unit-normalized first
    * `prefilterDims` components and the residual norm of the remaining
    * dimensions. By Cauchy–Schwarz on the suffixes,
    * `cos(a,b) <= dot(prefixA, prefixB) + residualA*residualB`, so a pair
    * whose bound is already below `minCosine` skips the full O(d) cosine —
    * an unrolled `prefilterDims`-term conjunct (codegen'd, short-circuit
    * AND) ahead of it. How much it prunes depends on how much embedding
    * energy the leading dims carry (PCA-rotated embeddings prune best);
    * it can only cut cost, never change the answer (an epsilon guard
    * keeps float-rounding from dropping borderline true pairs, and
    * vectors shorter than the prefix bypass the bound entirely).
    */
  def semanticContaminationReport(
      corpus: DataFrame, idCol: String, vecCol: String,
      bench: DataFrame, benchVecCol: String,
      minCosine: Double, prefilterDims: Int = 8): DataFrame = {
    val k = prefilterDims
    val fullCos =
      graft.ops.Similarity.cosine(col("__cv"), col("__bv")) >= minCosine
    if (k <= 0) { // prefilter disabled: the bare BNLJ (the pre-r14 shape)
      val b = broadcast(bench.select(col(benchVecCol).as("__bv")))
      return corpus.select(col(idCol), col(vecCol).as("__cv"))
        .join(b, fullCos)
        .groupBy(idCol).agg(
          count(lit(1)).as("n_matches"),
          max(graft.ops.Similarity.cosine(col("__cv"), col("__bv"))).as("max_cos"))
    }
    // unit-normalized K-prefix + suffix residual, computed once per row
    def prep(v: Column, prefix: String): Seq[Column] = {
      val n = graft.ops.Similarity.norm(v)
      val pre = transform(slice(v, 1, k), x => x / n)
      val preSq = aggregate(pre, lit(0.0), (acc, x) => acc + x * x)
      Seq(pre.as(s"__${prefix}p"),
        sqrt(greatest(lit(0.0), lit(1.0) - preSq)).as(s"__${prefix}r"))
    }
    val b = broadcast(bench.select(
      col(benchVecCol).as("__bv") +: prep(col(benchVecCol), "b"): _*))
    val c = corpus.select(
      col(idCol) +: col(vecCol).as("__cv") +: prep(col(vecCol), "c"): _*)
    // unrolled prefix dot (element_at stays in whole-stage codegen; the
    // array HOFs above are per-row precompute, not per-pair)
    val preDot = (1 to k).map(i =>
      element_at(col("__cp"), i) * element_at(col("__bp"), i)).reduce(_ + _)
    val bound = preDot + col("__cr") * col("__br")
    // short vectors carry a null/partial prefix — bypass the bound for
    // them; 1e-6 slack keeps float rounding from dropping borderline pairs
    val pass = (size(col("__cv")) < k) || (size(col("__bv")) < k) ||
      (bound >= minCosine - 1e-6)
    c.join(b, pass && fullCos)
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
