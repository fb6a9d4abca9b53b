package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language ID, document fingerprinting. Everything is
  * built from codegen'd `org.apache.spark.sql.functions` (no UDF on the hot
  * path except langId's per-row scoring, which is a single pass).
  */
object TextAnalysis {

  /** Whitespace token count (non-empty tokens). */
  def tokenCount(text: Column): Column =
    size(filter(split(text, "\\s+"), t => length(t) > 0))

  /** Non-empty whitespace tokens — stage this ONCE per row (as its own
    * projection alias) when several metrics below consume it: Spark gives
    * higher-order array functions no codegen subexpression elimination, so
    * the single-column metric forms re-split per metric (r16, see
    * [[repetitionMetrics]]).
    */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** [[meanTokenLength]] over a pre-staged [[tokens]] array (same values). */
  def meanTokenLengthOf(toks: Column): Column =
    when(size(toks) === 0, lit(0.0))
      .otherwise(aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))

  /** [[stopwordRatio]] over pre-staged tokens of the LOWERCASED text. */
  def stopwordRatioOf(lowerToks: Column): Column = {
    val stops = filter(lowerToks, t => t.isin(EnglishStopwords.map(lit(_)): _*))
    when(size(lowerToks) === 0, lit(0.0))
      .otherwise(size(stops).cast("double") / size(lowerToks))
  }

  /** BPE-ish subword count estimate: word-pieces + digits + punctuation
    * runs, via one regexp extraction — a cheap proxy for tokenizer cost.
    */
  def subwordCount(text: Column): Column =
    size(filter(
      split(text, "(?=[^a-zA-Z0-9])|(?<=[^a-zA-Z0-9])"),
      t => length(trim(t)) > 0))

  /** Punctuation character ratio. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(
        (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double") /
          length(text))

  /** Stopword ratio over a fixed English stopword list. */
  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "at", "by", "be", "this", "are", "was", "from")

  def stopwordRatio(text: Column): Column = {
    val toks = filter(split(lower(text), "\\s+"), t => length(t) > 0)
    val stops = filter(toks, t => t.isin(EnglishStopwords.map(lit(_)): _*))
    when(size(toks) === 0, lit(0.0)).otherwise(size(stops).cast("double") / size(toks))
  }

  /** Mean token length over whitespace tokens. */
  def meanTokenLength(text: Column): Column = {
    val toks = filter(split(text, "\\s+"), t => length(t) > 0)
    when(size(toks) === 0, lit(0.0))
      .otherwise(aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))
  }

  /** Composite quality score in [0,1]: length band + punctuation sanity +
    * mean-token-length sanity. Deterministic and cheap — the shape of a
    * C4/Gopher-style rule filter.
    */
  def qualityScore(text: Column): Column = qualityScoreOf(text, tokens(text))

  /** [[qualityScore]] over a pre-staged [[tokens]] array (same values) —
    * the scalar form derives the token array twice per row (count + mean
    * length). */
  def qualityScoreOf(text: Column, toks: Column): Column = {
    val n = size(toks)
    val lenScore = when(n >= 10 && n <= 10000, lit(1.0))
      .when(n >= 3, lit(0.5)).otherwise(lit(0.0))
    val punct = punctRatio(text)
    val punctScore = when(punct <= 0.2, lit(1.0)).when(punct <= 0.4, lit(0.5)).otherwise(lit(0.0))
    val mtl = meanTokenLengthOf(toks)
    val mtlScore = when(mtl >= 3.0 && mtl <= 12.0, lit(1.0)).otherwise(lit(0.5))
    round((lenScore + punctScore + mtlScore) / 3.0, 4)
  }

  /** Character n-gram profiles per language for the 5 testdata languages —
    * a tiny deterministic trigram-frequency heuristic (public-knowledge
    * n-gram language ID, cf. Cavnar & Trenkle 1994).
    */
  val profiles: Map[String, Seq[String]] = Map(
    "en" -> Seq(" th", "the", "he ", " an", "and", "nd ", " of", "of ", "ing", "ng "),
    "de" -> Seq("er ", " de", "der", "ie ", "die", " un", "und", "sch", "ein", "ch "),
    "fr" -> Seq(" de", "de ", " le", "le ", "es ", "ent", " la", "la ", "ion", "que"),
    "es" -> Seq(" de", "de ", " la", "la ", "os ", " el", "el ", "ión", "ent", "que"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "就", "不", "人"))

  /** Language ID over the profile table; returns the best-scoring language
    * code or "und". Single-pass scoring per row.
    */
  def langIdUdf: org.apache.spark.sql.expressions.UserDefinedFunction = udf { (text: String) =>
    if (text == null || text.isEmpty) "und"
    else {
      val t = text.toLowerCase
      // CJK shortcut: any profile char hit dominates
      val scores = profiles.map { case (lang, grams) =>
        lang -> grams.map(g => {
          var c = 0; var i = t.indexOf(g)
          while (i >= 0) { c += 1; i = t.indexOf(g, i + 1) }
          c
        }).sum
      }
      val (best, score) = scores.maxBy { case (l, s) => (s, l) }
      if (score == 0) "und" else best
    }
  }

  /** Corpus-unigram log-probability score (the computable analog of
    * CCNet's KenLM perplexity filter): token frequencies come from the
    * corpus ITSELF, each document scores as the mean `log10` of its
    * tokens' add-one-smoothed probabilities — gibberish and
    * rare-token-heavy documents score low, boilerplate-like ones high.
    *
    * Scale shape: the frequency table is (token, count) — vocabulary-sized,
    * partitioned by token, NEVER broadcast (web-scale vocabularies are
    * hundreds of millions of rows); scoring is a shuffle join on token
    * followed by the per-document mean. The two tiny scalars (total count,
    * vocab size) are the only driver-side values.
    */
  def unigramLogProb(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(s"`$idCol`"),
      explode(filter(split(lower(col(s"`$textCol`")), "\\s+"), t => length(t) > 0)).as("tok"))
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = freq.agg(sum("cnt").cast("double").as("n"), count(lit(1)).cast("double").as("v"))
      .collect()(0)
    val denom = stats.getDouble(0) + stats.getDouble(1)
    toks.join(freq, "tok")
      .groupBy(col(s"`$idCol`"))
      .agg(avg(log10((col("cnt") + lit(1.0)) / lit(denom))).as("unigram_lp"))
  }

  /** Interpolated bigram language-model score per document — the step up
    * from [[unigramLogProb]] toward CCNet's LM-based filtering: documents
    * are scored under `log(λ·P(w₂|w₁) + (1−λ)·P(w₂))` averaged over their
    * bigrams, with both distributions estimated from the corpus itself
    * (P(w₂|w₁) = c(w₁w₂)/c(w₁·), P(w₂) = c(w₂)/N). Word-salad and
    * rare-sequence documents score low; fluent/boilerplate-like ones high.
    * Returns (idCol, n_bigrams, bigram_lp); single-token docs report
    * (0, 0.0).
    *
    * Scale shape: three shuffle joins keyed on words / word pairs — the
    * model tables are vocabulary-sized and stay PARTITIONED, never
    * broadcast (web-scale vocabularies are hundreds of millions of rows);
    * hot words ("the") are linear per key and AQE-skew-splittable. All
    * counts come from partial-aggregating groupBys; the only driver-side
    * value is the scalar N.
    */
  def bigramLogProb(df: DataFrame, idCol: String, textCol: String,
      lambda: Double = 0.9): DataFrame = {
    val id = col(s"`$idCol`")
    val toksArr = filter(split(lower(trim(col(s"`$textCol`"))), "\\s+"),
      t => length(t) > 0)
    val docs = df.select(id, toksArr.as("__toks"))
    val toks = docs.select(id, explode(col("__toks")).as("__w"))
    val uni = toks.groupBy("__w").agg(count(lit(1)).as("__cu"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = uni.agg(sum("__cu").cast("double")).collect()(0).getDouble(0)
    val bi = docs.select(id,
      explode(filter(
        // slice length must stay clear of Int overflow (start+length); size()
        // bounds it exactly
        zip_with(col("__toks"), slice(col("__toks"), lit(2), size(col("__toks"))),
          (a, b) => when(b.isNotNull, struct(a.as("__w1"), b.as("__w2")))),
        x => x.isNotNull)).as("__b"))
      .select(id, col("__b.__w1").as("__w1"), col("__b.__w2").as("__w2"))
    val cb = bi.groupBy("__w1", "__w2").agg(count(lit(1)).as("__cb"))
    // context totals c(w₁·) — identical to c(w₁) minus its doc-final
    // occurrences; computed exactly from the bigram table
    val ctx = cb.groupBy("__w1").agg(sum("__cb").as("__ctx"))
    val scored = bi
      .join(cb, Seq("__w1", "__w2"))
      .join(ctx, Seq("__w1"))
      .join(uni.withColumnRenamed("__w", "__w2"), Seq("__w2"))
      .withColumn("__lp", log(
        lit(lambda) * col("__cb") / col("__ctx") +
          lit(1.0 - lambda) * col("__cu") / lit(n)))
    val agg = scored.groupBy(id)
      .agg(count(lit(1)).as("n_bigrams"), avg(col("__lp")).as("bigram_lp"))
    df.select(id).join(agg, Seq(idCol), "left")
      .select(id, coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("bigram_lp"), lit(0.0)).as("bigram_lp"))
  }

  /** Corpus-wide word frequencies, top `k` (vocabulary extraction — the
    * stopword-list / tokenizer-audit primitive). Whitespace tokens,
    * lowercased; ties break on the word for determinism.
    *
    * Scale shape: explode → partial-aggregating groupBy (one row per
    * distinct word per map partition shuffles) → TakeOrdered for the
    * top-k. No window, no broadcast; vocabulary never collects.
    */
  def wordFrequencies(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(filter(split(lower(col(s"`$textCol`")), "\\s+"),
        t => length(t) > 0)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(k)

  /** TF-IDF keyword extraction: the `k` highest-scoring terms per document
    * (score = tf · (ln((N+1)/(df+1)) + 1), the smoothed-idf convention;
    * ties → lexicographic). Returns (idCol, term, score). The standard
    * per-document topic signal for corpus exploration and cluster labeling.
    *
    * Scale shape: two partial-aggregating groupBys (per-(doc,term) tf, then
    * per-term df — one row per distinct key per map partition shuffles); N
    * arrives as a broadcast 1-row frame, never a driver action. The df
    * join keys on the term — hot terms ("the") are linear per key and
    * AQE-skew-splittable. Top-k per doc is a doc-local array sort (docs
    * bound their own vocabulary), NOT a corpus-wide window.
    */
  def tfIdfKeywords(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5): DataFrame = {
    val id = col(s"`$idCol`")
    val terms = df.select(id,
      explode(filter(split(lower(trim(col(s"`$textCol`"))), "\\s+"),
        t => length(t) > 0)).as("__term"))
    val tf = terms.groupBy(id, col("__term")).agg(count(lit(1)).as("__tf"))
    val dfreq = tf.groupBy("__term").agg(count(lit(1)).as("__df"))
    val total = df.select(count(lit(1)).as("__n"))
    val scored = tf.join(dfreq, "__term")
      .crossJoin(broadcast(total))
      .withColumn("__score",
        col("__tf") * (log((col("__n") + 1).cast("double") / (col("__df") + 1)) + 1.0))
    scored.groupBy(id)
      .agg(slice(array_sort(collect_list(
        struct((-col("__score")).as("__neg"), col("__term").as("term"),
          col("__score").as("score")))), 1, k).as("__top"))
      .select(id, explode(col("__top")).as("__kw"))
      .select(id, col("__kw.term").as("term"), col("__kw.score").as("score"))
  }

  // ------------------------------------------------- cleaning / redaction

  /** PII redaction patterns, kept to the RE2-compatible subset of Java
    * regex so external engines (and the DuckDB oracle) replicate the
    * transformation byte-for-byte. Order matters: emails first (they
    * contain dots and digits), then IPs, then phone shapes.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"

  /** Redact emails / IPv4s / phone numbers with typed placeholders — a
    * Dolma/CCNet-style pre-training scrub, pure codegen'd regexp chain.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Strip non-whitespace C0/DEL control characters (keeps \t \n \r). */
  def stripControls(text: Column): Column =
    regexp_replace(text, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")

  /** Unicode NFC normalization (é as one codepoint, not e+combining accent)
    * — single-pass UDF; no Spark built-in exists.
    */
  val nfcNormalizeUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (s: String) =>
      if (s == null) null
      else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    }

  /** Full cleaning chain: NFC → control-strip → PII redaction. */
  def cleanText(text: Column): Column =
    redactPii(stripControls(nfcNormalizeUdf(text)))

  /** Rolling-hash document fingerprint: xxhash64 over the normalized text —
    * stable against whitespace runs and case.
    */
  def fingerprint(text: Column): Column =
    xxhash64(lower(regexp_replace(trim(text), "\\s+", " ")))

  /** Winnowing-style robust fingerprint: min shingle hash per document
    * window band — k minimum hashes of character 8-grams, as an array.
    */
  def robustFingerprint(text: Column, k: Int = 4): Column = {
    val grams = expr(
      "CASE WHEN length(__norm) < 8 THEN array(__norm) ELSE " +
        "transform(sequence(1, length(__norm) - 7), i -> substring(__norm, i, 8)) END")
    // callers must provide __norm; wrapped by [[textStats]]-style helpers
    slice(array_sort(transform(grams, g => xxhash64(g))), 1, k)
  }

  // ------------------------------------------------- repetition (Gopher-style)

  /** Non-empty trimmed lines of a document. */
  private def docLines(text: Column): Column =
    filter(transform(split(text, "\n"), l => trim(l)), l => length(l) > 0)

  /** Lines surviving the C4 per-line rules (Raffel et al. 2020, the
    * "Colossal Clean Crawled Corpus" heuristics): a trimmed line is kept
    * iff it ends in terminal punctuation, carries at least
    * `minWordsPerLine` words, and does not mention "javascript". Pure
    * codegen'd array functions — no UDF, no shuffle.
    */
  def c4KeptLines(text: Column, minWordsPerLine: Int = 5): Column =
    filter(transform(split(text, "\n"), l => trim(l)), l =>
      l.rlike("[.!?]$") &&
        size(filter(split(l, "\\s+"), w => w =!= lit(""))) >= minWordsPerLine &&
        !contains(lower(l), lit("javascript")))

  /** C4-style rule cleaning: per-line [[c4KeptLines]], then page-level
    * drops — fewer than `minLines` surviving lines, any "lorem ipsum"
    * mention, or a curly brace (code markers). Returns the surviving
    * pages as `(idCol, clean_text)` with the kept lines re-joined — the
    * same projection shape as the sibling per-document APIs; a narrow
    * map + filter, so it scales linearly with the corpus.
    */
  def c4Clean(df: DataFrame, idCol: String, textCol: String,
      minLines: Int = 3, minWordsPerLine: Int = 5): DataFrame =
    df.withColumn("__kept", c4KeptLines(col(s"`$textCol`"), minWordsPerLine))
      .filter(size(col("__kept")) >= minLines &&
        !contains(lower(col(s"`$textCol`")), lit("lorem ipsum")) &&
        !contains(col(s"`$textCol`"), lit("{")))
      .select(col(s"`$idCol`"), array_join(col("__kept"), "\n").as("clean_text"))

  /** Word bigrams of the lowercased document, as "a b" strings. zip_with
    * pads the shorter side with null and concat propagates it, so the
    * trailing partial pair drops out in the filter.
    */
  private def wordBigrams(text: Column): Column = {
    val ws = filter(split(lower(text), "\\s+"), t => length(t) > 0)
    filter(
      zip_with(ws, slice(ws, lit(2), greatest(size(ws) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b)),
      g => g.isNotNull)
  }

  /** Fraction of lines that repeat an earlier line (the Gopher repetition
    * filter family, Rae et al. 2021 appendix A1.1): `1 - distinct/total`
    * over trimmed non-empty lines. Pure codegen'd array functions.
    */
  def dupLineFraction(text: Column): Column = {
    val ls = docLines(text)
    when(size(ls) === 0, lit(0.0))
      .otherwise(lit(1.0) - size(array_distinct(ls)).cast("double") / size(ls))
  }

  /** Fraction of line CHARACTERS sitting in duplicate lines — weights the
    * filter toward big copy-pasted blocks rather than repeated one-liners.
    */
  def dupLineCharFraction(text: Column): Column = {
    val ls = docLines(text)
    val total = aggregate(ls, lit(0L), (acc, l) => acc + length(l))
    val distinctChars = aggregate(array_distinct(ls), lit(0L), (acc, l) => acc + length(l))
    when(total === 0L, lit(0.0))
      .otherwise(lit(1.0) - distinctChars.cast("double") / total)
  }

  /** Fraction of word bigrams that repeat an earlier bigram. */
  def dupBigramFraction(text: Column): Column = {
    val gs = wordBigrams(text)
    when(size(gs) === 0, lit(0.0))
      .otherwise(lit(1.0) - size(array_distinct(gs)).cast("double") / size(gs))
  }

  /** All three Gopher repetition metrics computed from ONE evaluation of
    * the line / bigram arrays (r16 perf). The single-column forms above
    * re-derive the arrays per metric, and Spark gives higher-order array
    * functions no codegen subexpression elimination — so the split/regexp
    * and array_distinct work ran up to 3x per row. Here the arrays and
    * their distinct forms stage through separate projections whose aliases
    * are multi-referenced and non-cheap, which CollapseProject keeps (it
    * only inlines cheap or singly-referenced aliases). Values are
    * bit-identical to the single-column forms; `lineText` and `bigramText`
    * may differ (the Gopher line metrics usually run on a re-lined view).
    */
  def repetitionMetrics(df: DataFrame, idCol: String,
      lineText: Column, bigramText: Column): DataFrame = {
    val total = aggregate(col("__ls"), lit(0L), (acc, l) => acc + length(l))
    val distinctChars = aggregate(col("__dls"), lit(0L), (acc, l) => acc + length(l))
    df.select(col(s"`$idCol`"),
        docLines(lineText).as("__ls"), wordBigrams(bigramText).as("__gs"))
      .select(col(s"`$idCol`"), col("__ls"), col("__gs"),
        array_distinct(col("__ls")).as("__dls"),
        array_distinct(col("__gs")).as("__dgs"))
      .select(col(s"`$idCol`"),
        when(size(col("__ls")) === 0, lit(0.0))
          .otherwise(lit(1.0) -
            size(col("__dls")).cast("double") / size(col("__ls")))
          .as("dup_line_frac"),
        when(total === 0L, lit(0.0))
          .otherwise(lit(1.0) - distinctChars.cast("double") / total)
          .as("dup_line_char_frac"),
        when(size(col("__gs")) === 0, lit(0.0))
          .otherwise(lit(1.0) -
            size(col("__dgs")).cast("double") / size(col("__gs")))
          .as("dup_bigram_frac"))
  }

  /** One-pass document statistics frame: id, token/char counts, ratios,
    * quality, language guess, fingerprint.
    */
  def documentStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      length(t).as("n_chars"),
      tokenCount(t).as("n_tokens"),
      subwordCount(t).as("n_subwords"),
      round(punctRatio(t), 6).as("punct_ratio"),
      round(stopwordRatio(t), 6).as("stopword_ratio"),
      round(meanTokenLength(t), 6).as("mean_token_len"),
      qualityScore(t).as("quality"),
      langIdUdf(t).as("lang_guess"),
      fingerprint(t).as("fingerprint"))
  }
}
