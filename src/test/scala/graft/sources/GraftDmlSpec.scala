package graft.sources

import graft.SparkSpec
import graft.ktk.{DatasetMetadata, Ktk}
import org.apache.spark.sql.functions._

/** SQL UPDATE / MERGE INTO over graft tables (GraftDmlRule, injected by
  * GraftExtensions at session build): both route to the MERGE-ON-READ
  * operators — tombstone + append in one commit, zero rewrites of
  * untouched files — instead of a group-based copy-on-write rewrite.
  */
class GraftDmlSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def withCatalog[A](f: (String, String) => A): A = {
    val base = tmpDir("dml")
    n += 1
    val cat = s"dml$n"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.base", base)
    f(cat, base)
  }

  private def seed(base: String): Unit =
    Ktk.store(spark, base, "t",
      Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0), (4L, "b", 40.0))
        .toDF("k", "p", "v"),
      partitionOn = Seq("p"))

  private def content(base: String): Seq[(Long, String, Double)] =
    Ktk.readTable(spark, base, "t").select("k", "p", "v")
      .as[(Long, String, Double)].collect().sorted.toSeq

  test("SQL UPDATE with old-value SET is one merge-on-read commit") {
    withCatalog { (gk, base) =>
      seed(base)
      val files0 = DatasetMetadata.load(spark, base, "t").partitions.keySet
      val res = spark.sql(s"UPDATE $gk.default.t SET v = v * 2 WHERE p = 'a' AND k > 1")
      res.columns.toSeq shouldBe Seq("rows_updated", "version")
      res.as[(Long, Long)].head() shouldBe ((1L, 2L))
      // zero rewrites: every original file survives
      files0.subsetOf(DatasetMetadata.load(spark, base, "t").partitions.keySet) shouldBe true
      content(base) shouldBe Seq(
        (1L, "a", 10.0), (2L, "a", 40.0), (3L, "b", 30.0), (4L, "b", 40.0))
      // no-WHERE UPDATE touches every row
      spark.sql(s"UPDATE $gk.default.t SET v = 0.0")
      content(base).map(_._3).toSet shouldBe Set(0.0)
    }
  }

  test("DNF-able SQL UPDATE conditions prune candidate files; others stay exact") {
    withCatalog { (gk, base) =>
      seed(base)
      val total = DatasetMetadata.load(spark, base, "t").partitions.size
      // translatable: partition equality prunes to p='a' files only
      spark.sql(s"UPDATE $gk.default.t SET v = v + 1 WHERE p = 'a'")
      Ktk.lastUpdateCandidates.get() should be < total
      Ktk.lastUpdateCandidates.get() should be >= 1
      // untranslatable (expression over a column): full candidate list
      // (the first update appended files, so re-count), result still exact
      val total2 = DatasetMetadata.load(spark, base, "t").partitions.size
      spark.sql(s"UPDATE $gk.default.t SET v = v + 1 WHERE k % 2 = 0")
      Ktk.lastUpdateCandidates.get() shouldBe total2
      content(base) shouldBe Seq(
        (1L, "a", 11.0), (2L, "a", 22.0), (3L, "b", 30.0), (4L, "b", 41.0))
    }
  }

  test("MERGE INTO upsert (UPDATE SET * + INSERT *)") {
    withCatalog { (gk, base) =>
      seed(base)
      Seq((2L, "a", 222.0), (9L, "c", 90.0)).toDF("k", "p", "v")
        .createOrReplaceTempView("src_upsert")
      val files0 = DatasetMetadata.load(spark, base, "t").partitions.keySet
      spark.sql(
        s"""MERGE INTO $gk.default.t AS t USING src_upsert AS s ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      files0.subsetOf(DatasetMetadata.load(spark, base, "t").partitions.keySet) shouldBe true
      content(base) shouldBe Seq(
        (1L, "a", 10.0), (2L, "a", 222.0), (3L, "b", 30.0), (4L, "b", 40.0),
        (9L, "c", 90.0))
    }
  }

  test("MERGE INTO matched-delete and insert-only shapes") {
    withCatalog { (gk, base) =>
      seed(base)
      Seq((2L, "x"), (9L, "x")).toDF("k", "ignore").createOrReplaceTempView("src_del")
      spark.sql(
        s"""MERGE INTO $gk.default.t AS t USING src_del AS s ON t.k = s.k
           |WHEN MATCHED THEN DELETE""".stripMargin)
      content(base).map(_._1) shouldBe Seq(1L, 3L, 4L)
      Seq((3L, "b", 999.0), (7L, "c", 70.0)).toDF("k", "p", "v")
        .createOrReplaceTempView("src_ins")
      spark.sql(
        s"""MERGE INTO $gk.default.t AS t USING src_ins AS s ON t.k = s.k
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      // k=3 matched -> untouched (999 NOT applied); k=7 inserted
      content(base) shouldBe Seq(
        (1L, "a", 10.0), (3L, "b", 30.0), (4L, "b", 40.0), (7L, "c", 70.0))
    }
  }

  test("MERGE INTO update-only does not insert unmatched source rows") {
    withCatalog { (gk, base) =>
      seed(base)
      Seq((4L, "b", 444.0), (8L, "z", 80.0)).toDF("k", "p", "v")
        .createOrReplaceTempView("src_upd")
      spark.sql(
        s"""MERGE INTO $gk.default.t AS t USING src_upd AS s ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
      content(base) shouldBe Seq(
        (1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0), (4L, "b", 444.0))
    }
  }

  test("MERGE partial-column UPDATE keeps unassigned columns from the target") {
    withCatalog { (gk, base) =>
      seed(base)
      val files0 = DatasetMetadata.load(spark, base, "t").partitions.keySet
      Seq((2L, 5.0), (4L, 6.0), (9L, 99.0)).toDF("k", "delta")
        .createOrReplaceTempView("src_part")
      // target-referencing value + partial columns: p keeps its value
      spark.sql(
        s"""MERGE INTO $gk.default.t AS t USING src_part AS s ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET v = t.v + s.delta""".stripMargin)
      content(base) shouldBe Seq(
        (1L, "a", 10.0), (2L, "a", 25.0), (3L, "b", 30.0), (4L, "b", 46.0))
      // merge-on-read still: no original file rewritten
      files0.subsetOf(DatasetMetadata.load(spark, base, "t").partitions.keySet) shouldBe true
    }
  }

  test("MERGE partial UPDATE + INSERT * inserts only unmatched keys") {
    withCatalog { (gk, base) =>
      seed(base)
      Seq((4L, "z", 4.5), (8L, "z", 80.0)).toDF("k", "p", "v")
        .createOrReplaceTempView("src_pi")
      // matched k=4: only v updates (p stays 'b'); unmatched k=8 inserts whole
      spark.sql(
        s"""MERGE INTO $gk.default.t AS t USING src_pi AS s ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET v = s.v
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      content(base) shouldBe Seq(
        (1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0), (4L, "b", 4.5),
        (8L, "z", 80.0))
    }
  }

  test("conditioned MERGE actions route rows first-true-wins in one commit") {
    withCatalog { (gk, base) =>
      seed(base)
      val files0 = DatasetMetadata.load(spark, base, "t").partitions.keySet
      val v0 = DatasetMetadata.load(spark, base, "t").version
      Seq((1L, "big", 100.0), (2L, "del", 0.0), (3L, "keep", 5.0), (8L, "new", 80.0),
        (9L, "skip", -1.0)).toDF("k", "tag", "nv").createOrReplaceTempView("src_cond")
      // k=1: tag='big' → doubled; k=2: tag='del' → deleted; k=3: neither
      // condition holds → untouched; k=8: nv>0 → inserted; k=9: nv<0 → not
      spark.sql(
        s"""MERGE INTO $gk.default.t AS t USING src_cond AS s ON t.k = s.k
           |WHEN MATCHED AND s.tag = 'del' THEN DELETE
           |WHEN MATCHED AND s.tag = 'big' THEN UPDATE SET v = t.v + s.nv
           |WHEN NOT MATCHED AND s.nv > 0 THEN INSERT (k, p, v) VALUES (s.k, s.tag, s.nv)""".stripMargin)
      content(base) shouldBe Seq(
        (1L, "a", 110.0), (3L, "b", 30.0), (4L, "b", 40.0), (8L, "new", 80.0))
      // ONE commit, merge-on-read: no original file rewritten
      val md1 = DatasetMetadata.load(spark, base, "t")
      md1.version shouldBe v0 + 1
      files0.subsetOf(md1.partitions.keySet) shouldBe true
    }
  }

  test("conditioned MERGE: first-true action wins when conditions overlap") {
    withCatalog { (gk, base) =>
      seed(base)
      Seq((2L, 7.0)).toDF("k", "nv").createOrReplaceTempView("src_ovl")
      // both conditions true for k=2: the FIRST declared action (update) wins
      spark.sql(
        s"""MERGE INTO $gk.default.t AS t USING src_ovl AS s ON t.k = s.k
           |WHEN MATCHED AND s.nv > 0 THEN UPDATE SET v = s.nv
           |WHEN MATCHED THEN DELETE""".stripMargin)
      content(base) shouldBe Seq(
        (1L, "a", 10.0), (2L, "a", 7.0), (3L, "b", 30.0), (4L, "b", 40.0))
    }
  }

  test("NOT MATCHED BY SOURCE updates and deletes target orphans in the same commit") {
    withCatalog { (gk, base) =>
      seed(base)
      val v0 = DatasetMetadata.load(spark, base, "t").version
      Seq((2L, 999.0), (4L, 444.0)).toDF("k", "nv").createOrReplaceTempView("src_sync")
      // full sync: matched rows take the source value; target-only rows in
      // partition 'a' flag v = -1, the rest delete — one commit
      spark.sql(
        s"""MERGE INTO $gk.default.t AS t USING src_sync AS s ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET v = s.nv
           |WHEN NOT MATCHED BY SOURCE AND t.p = 'a' THEN UPDATE SET v = -1.0
           |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
      content(base) shouldBe Seq(
        (1L, "a", -1.0), (2L, "a", 999.0), (4L, "b", 444.0))
      DatasetMetadata.load(spark, base, "t").version shouldBe v0 + 1
      // source-column references in NMBS clauses refuse (no source image)
      intercept[Exception] {
        spark.sql(
          s"""MERGE INTO $gk.default.t AS t USING src_sync AS s ON t.k = s.k
             |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = s.nv""".stripMargin)
      }.getMessage should (include("source column") or include("cannot be resolved") or
        include("UNRESOLVED"))
    }
  }

  test("MERGE WITH SCHEMA EVOLUTION adds new source columns additively") {
    withCatalog { (gk, base) =>
      seed(base)
      val v0 = DatasetMetadata.load(spark, base, "t").version
      val files0 = DatasetMetadata.load(spark, base, "t").partitions.keySet
      Seq((2L, "a", 222.0, "beta", 7L), (9L, "c", 90.0, "gamma", 8L))
        .toDF("k", "p", "v", "tag", "n").createOrReplaceTempView("src_evo")
      spark.sql(
        s"""MERGE WITH SCHEMA EVOLUTION INTO $gk.default.t AS t
           |USING src_evo AS s ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      // the analyzer widened the table through alterTable (its own commit),
      // then the merge committed — old rows read the new column as null
      val md = DatasetMetadata.load(spark, base, "t")
      md.schema.fieldNames should contain allOf ("tag", "n")
      // new int columns normalize to bigint like every other write path
      md.schema("n").dataType shouldBe org.apache.spark.sql.types.LongType
      md.version shouldBe v0 + 2
      files0.subsetOf(md.partitions.keySet) shouldBe true // still merge-on-read
      Ktk.readTable(spark, base, "t").select("k", "p", "v", "tag", "n")
        .as[(Long, String, Double, Option[String], Option[Long])]
        .collect().sorted.toSeq shouldBe Seq(
        (1L, "a", 10.0, None, None), (2L, "a", 222.0, Some("beta"), Some(7L)),
        (3L, "b", 30.0, None, None), (4L, "b", 40.0, None, None),
        (9L, "c", 90.0, Some("gamma"), Some(8L)))
      // pre-evolution versions keep their own schema
      Ktk.readTableAsOf(spark, base, "t", v0)
        .columns.toSeq should not contain "tag"
    }
  }

  test("MERGE WITH SCHEMA EVOLUTION is a no-op when schemas already align") {
    withCatalog { (gk, base) =>
      seed(base)
      val v0 = DatasetMetadata.load(spark, base, "t").version
      Seq((2L, "a", 2.5)).toDF("k", "p", "v").createOrReplaceTempView("src_evo2")
      spark.sql(
        s"""MERGE WITH SCHEMA EVOLUTION INTO $gk.default.t AS t
           |USING src_evo2 AS s ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
      val md = DatasetMetadata.load(spark, base, "t")
      md.version shouldBe v0 + 1 // no alterTable commit
      content(base) shouldBe Seq(
        (1L, "a", 10.0), (2L, "a", 2.5), (3L, "b", 30.0), (4L, "b", 40.0))
    }
  }

  test("MERGE WITH SCHEMA EVOLUTION with int source: evolution lands promoted, plain retry works") {
    withCatalog { (gk, base) =>
      seed(base)
      // source column n is INT; the engine declares integrals as BIGINT
      // (normalize_type), but Spark's evolution recompute demands the
      // source's EXACT types — the ADD COLUMN commit lands (promoted), the
      // recompute then refuses. The remedy is a plain MERGE: store-
      // assignment casts handle int -> bigint by name.
      Seq((2L, "a", 222.0, 7), (9L, "c", 90.0, 8))
        .toDF("k", "p", "v", "n").createOrReplaceTempView("src_evo_int")
      intercept[Throwable] {
        spark.sql(
          s"""MERGE WITH SCHEMA EVOLUTION INTO $gk.default.t AS t
             |USING src_evo_int AS s ON t.k = s.k
             |WHEN MATCHED THEN UPDATE SET *
             |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      }
      val md = DatasetMetadata.load(spark, base, "t")
      md.schema("n").dataType shouldBe org.apache.spark.sql.types.LongType
      spark.sql(
        s"""MERGE INTO $gk.default.t AS t USING src_evo_int AS s ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      Ktk.readTable(spark, base, "t").select("k", "v", "n")
        .as[(Long, Double, Option[Long])].collect().sorted.toSeq shouldBe Seq(
        (1L, 10.0, None), (2L, 222.0, Some(7L)), (3L, 30.0, None),
        (4L, 40.0, None), (9L, 90.0, Some(8L)))
    }
  }

  test("unsupported MERGE shapes fail loudly, changing nothing") {
    withCatalog { (gk, base) =>
      seed(base)
      Seq((2L, "a", 1.0)).toDF("k", "p", "v").createOrReplaceTempView("src_bad")
      // INSERT referencing target columns is meaningless
      val e2 = intercept[Exception] {
        spark.sql(
          s"""MERGE INTO $gk.default.t AS t USING src_bad AS s ON t.k = s.k
             |WHEN NOT MATCHED THEN INSERT (k, p, v) VALUES (s.k, s.p, t.v)""".stripMargin)
      }
      e2.getMessage should (include("references target") or include("cannot be resolved") or
        include("UNRESOLVED"))
      // non-equi ON
      val e3 = intercept[Exception] {
        spark.sql(
          s"""MERGE INTO $gk.default.t AS t USING src_bad AS s ON t.k > s.k
             |WHEN MATCHED THEN DELETE""".stripMargin)
      }
      e3.getMessage should include("conjunction")
      content(base) shouldBe Seq(
        (1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0), (4L, "b", 40.0))
    }
  }
}
