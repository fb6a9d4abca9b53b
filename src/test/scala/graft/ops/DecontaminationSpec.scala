package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecontaminationSpec extends SparkSpec {
  import spark.implicits._

  test("wordNgrams: exact windows, normalized, deduped, short docs empty") {
    val df = Seq(
      (1L, "The quick  brown fox jumps"), // double space + case → normalized
      (2L, "a b"),                        // shorter than n → no grams
      (3L, "x y z x y z x y z")           // repeated windows dedup
    ).toDF("id", "text")
    val got = df.select(col("id"), Decontamination.wordNgrams(col("text"), 3).as("g"))
      .as[(Long, Seq[String])].collect().toMap
    got(1L).toSet shouldBe Set("the quick brown", "quick brown fox", "brown fox jumps")
    got(2L) shouldBe Seq.empty
    got(3L).toSet shouldBe Set("x y z", "y z x", "z x y")
  }

  test("native kernel agrees with the composable string version") {
    val df = Seq(
      (1L, "The quick  brown fox jumps over the lazy dog"),
      (2L, "a b"),
      (3L, "x y z x y z x y z"),
      (4L, "Tabs\tand\nnewlines   mixed \u000B whitespace everywhere okay")
    ).toDF("id", "text")
    val both = df.select(
      col("id"),
      org.apache.spark.sql.functions.size(
        Decontamination.wordNgrams(col("text"), 3)).as("n_str"),
      org.apache.spark.sql.functions.size(
        Decontamination.wordNgramHashes(col("text"), 3)).as("n_hash"))
      .as[(Long, Int, Int)].collect()
    both.foreach { case (_, nStr, nHash) => nHash shouldBe nStr }
    // shared-gram structure too: two docs sharing a window share a hash
    val h = df.select(col("id"), explode(Decontamination.wordNgramHashes(col("text"), 3)).as("g"))
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    h(3L).size shouldBe 3
    (h(1L) intersect h(3L)) shouldBe empty
  }

  test("contaminationReport counts distinct shared grams per doc") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("bid", "btext")
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // shares 3 distinct 4-grams... plus own
      (2L, "alpha beta gamma nothing else here"),  // shares 1 (alpha beta gamma ... no, n=4)
      (3L, "totally clean document with no overlap at all")
    ).toDF("doc_id", "text")
    val got = Decontamination.contaminationReport(corpus, "doc_id", "text",
      bench, "btext", n = 4, minOverlap = 1)
      .as[(Long, Long)].collect().toMap
    // bench 4-grams: {a b g d, b g d e}; doc1 contains both, doc2 neither
    got shouldBe Map(1L -> 2L)
  }

  test("decontaminate drops flagged docs, keeps the rest intact") {
    val bench = Seq((100L, "one two three four five six")).toDF("bid", "btext")
    val corpus = Seq(
      (1L, "prefix one two three four five six suffix"),
      (2L, "independent text that shares nothing with the benchmark set")
    ).toDF("doc_id", "text")
    val kept = Decontamination.decontaminate(corpus, "doc_id", "text",
      bench, "btext", n = 5, maxOverlap = 0)
    kept.select("doc_id").as[Long].collect().toSeq shouldBe Seq(2L)
    kept.columns.toSeq shouldBe corpus.columns.toSeq
  }

  test("paragraph decontamination drops only the leaking spans, in order") {
    // doc 1: middle paragraph is a verbatim benchmark span -> only it drops;
    // doc 2: clean -> survives byte-identical; doc 3: every paragraph leaks
    // -> the whole doc vanishes; doc 4: a 2-token paragraph can't carry a
    // 3-gram -> always survives even though its words appear in the bench
    val corpus = Seq(
      (1L, "alpha beta gamma\nthe secret benchmark answer is here\ndelta epsilon zeta"),
      (2L, "totally original prose\nnothing shared at all"),
      (3L, "the secret benchmark answer is here"),
      (4L, "secret benchmark")
    ).toDF("doc_id", "text")
    val bench = Seq(Tuple1("unrelated preamble the secret benchmark answer is here and more"))
      .toDF("btext")
    val out = Decontamination.decontaminateParagraphs(
        corpus, "doc_id", "text", bench, "btext", n = 3)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    out shouldBe Seq(
      (1L, "alpha beta gamma\ndelta epsilon zeta"),
      (2L, "totally original prose\nnothing shared at all"),
      (4L, "secret benchmark"))
    // scale shape: gram matching is broadcast hash joins (bench grams +
    // the contaminated-hit set both broadcast); the corpus gram stream
    // must never sort-merge — its only shuffles are the tiny hit set and
    // the per-document rebuild
    val plan = Decontamination.decontaminateParagraphs(
        corpus, "doc_id", "text", bench, "btext", n = 3)
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
    // the report half names exactly the spans the removal drops, with the
    // distinct shared-gram count (doc 1 pos 1 and doc 3 pos 0 share the
    // same 4 three-grams of the leaked sentence)
    val rep = Decontamination.paragraphContaminationReport(
        corpus, "doc_id", "text", bench, "btext", n = 3)
      .orderBy("doc_id").as[(Long, Int, Long)].collect().toSeq
    rep shouldBe Seq((1L, 1, 4L), (3L, 0, 4L))
    // NULL-text docs are row-preserving like doc-level decontaminate (they
    // carry zero contamination): they survive as empty docs under the
    // blank-paragraph rule instead of silently vanishing from the rebuild
    val withNull = corpus.unionByName(
      Seq((5L, null.asInstanceOf[String]), (6L, "")).toDF("doc_id", "text"))
    Decontamination.decontaminateParagraphs(
        withNull, "doc_id", "text", bench, "btext", n = 3)
      .filter($"doc_id" >= 5L).orderBy("doc_id")
      .as[(Long, String)].collect().toSeq shouldBe Seq((5L, ""), (6L, ""))
  }

  test("semantic decontamination flags embedding-space leakage, no corpus shuffle") {
    // doc 1 ≈ bench vector (paraphrase leakage: same direction), doc 2
    // orthogonal, doc 3 anti-parallel (cosine -1: must NOT flag)
    val corpus = Seq(
      (1L, Array(1.0f, 0.1f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
      (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("doc_id", "vec")
    val bench = Seq(Tuple1(Array(1.0f, 0.0f, 0.0f, 0.0f))).toDF("bvec")
    val rep = Decontamination.semanticContaminationReport(
      corpus, "doc_id", "vec", bench, "bvec", minCosine = 0.9)
    rep.select("doc_id", "n_matches").as[(Long, Long)].collect().toSeq shouldBe
      Seq((1L, 1L))
    val kept = Decontamination.decontaminateByEmbedding(
      corpus, "doc_id", "vec", bench, "bvec", minCosine = 0.9)
    kept.select("doc_id").as[Long].collect().toSeq.sorted shouldBe Seq(2L, 3L)
    kept.columns.toSeq shouldBe corpus.columns.toSeq
    // scale shape: the benchmark broadcasts; the corpus side must not
    // exchange before the join (a shuffled corpus would defeat the point)
    val plan = rep.queryExecution.executedPlan.toString
    plan should include("BroadcastNestedLoopJoin")
  }

  test("semantic prefix-bound prefilter never changes the answer") {
    // 16-dim vectors (longer than the 8-dim prefix): energy in the TAIL
    // dims so the prefix bound is loose for true pairs (the dangerous
    // direction — an over-tight bound would drop them), plus a borderline
    // pair sitting near the threshold and prefix-heavy non-pairs the
    // bound prunes early
    val rng = new scala.util.Random(7)
    def vec(seed: Array[Float]): Array[Float] =
      seed ++ Array.fill(16 - seed.length)(rng.nextFloat() * 0.05f)
    val base = Array.fill(16)(rng.nextFloat())
    val near = base.clone(); near(15) = near(15) + 0.02f // cosine ≈ 1
    val corpus = (Seq(
      (1L, base), (2L, near),
      (3L, vec(Array(1f, 0f))), (4L, vec(Array(0.9f, 0.1f)))
    ) ++ (5L to 40L).map(i => i -> Array.fill(16)(rng.nextFloat() - 0.5f)))
      .toDF("doc_id", "vec")
    val bench = Seq(Tuple1(base), Tuple1(vec(Array(0f, 1f)))).toDF("bvec")
    for (threshold <- Seq(0.5, 0.9, 0.99)) {
      def run(k: Int) = Decontamination.semanticContaminationReport(
          corpus, "doc_id", "vec", bench, "bvec", minCosine = threshold,
          prefilterDims = k)
        .orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          math.round(r.getDouble(2) * 1e6))).toSeq
      withClue(s"threshold=$threshold: ") {
        run(8) shouldBe run(0) // prefiltered ≡ bare BNLJ, bit for bit
      }
    }
    // the identical-direction pair survives the tightest threshold
    Decontamination.semanticContaminationReport(
        corpus, "doc_id", "vec", bench, "bvec", minCosine = 0.99)
      .select("doc_id").as[Long].collect().toSet should contain(1L)
  }
}
