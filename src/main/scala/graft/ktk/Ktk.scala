package graft.ktk

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{PredLiteral, Predicates, SchemaUtil, UrlCodec}

/** The dataset engine: store / read / update / index / GC over partitioned
  * Parquet with a single-blob metadata commit.
  *
  * Spark-first re-expression of the reference's io layer:
  *  - store      ≙ store_dataframes_as_dataset (io/eager.py:589-876) +
  *                 write pipeline sort→partition_on→index→commit
  *                 (io_components/write.py:53-243)
  *  - readTable  ≙ read_table / dispatch_metapartitions_from_factory
  *                 (io/eager.py:344-425, io_components/read.py:75-178)
  *  - update     ≙ update_dataset_from_dataframes w/ delete_scope
  *                 (io_components/update.py:23-57)
  *  - indices    ≙ ExplicitSecondaryIndex build/merge/query
  *                 (core/index.py, metapartition.py:1370-1420)
  *  - gc         ≙ garbage_collect_dataset (io_components/gc.py:8-55)
  *
  * Planning (metadata load, partition pruning, index semi-join) is driver-side
  * over small data, exactly like the reference; bulk work is plain DataFrame
  * jobs so Catalyst/Tungsten/AQE handle projection pushdown, row-group
  * pruning, codegen and spill. At cluster scale the driver only ever holds
  * the file listing and index value→labels maps — both O(metadata), not
  * O(data).
  */
object Ktk extends org.apache.spark.internal.Logging {

  val IndexDirName = "indices"

  /** Test/diagnostic probe: file-candidate count of the LAST [[merge]]'s
    * matched-row scan (−1 = none computed). Lets specs pin that collected
    * key sets — single- OR multi-column — prune below the full label set.
    */
  private[graft] val lastMergeCandidates =
    new java.util.concurrent.atomic.AtomicInteger(-1)

  /** Same probe for [[updateRows]]: candidate-file count of the last
    * update's matched-row scan (−1 = none computed).
    */
  private[graft] val lastUpdateCandidates =
    new java.util.concurrent.atomic.AtomicInteger(-1)

  /** Liveness marker file inside each compact staging root (see
    * [[compact]]'s stale-staging reaper).
    */
  private[ktk] val CompactHeartbeat = "heartbeat"

  /** Fresh VERSION-ADDRESSED sidecar file name: every canonical sidecar
    * build/rewrite writes a NEW `<col>.<nonce>.parquet` dir and commits the
    * name through the registry, never mutating a dir an older snapshot
    * references — so each snapshot's registries stay trustworthy and
    * [[readTableAsOf]] keeps full four-layer pruning. Old dirs survive
    * until [[garbageCollect]] finds them referenced by no retained version.
    * A nonce (not the commit version) keeps racing writers from colliding
    * on the same target; orphans of lost races are unreferenced and gc'd.
    */
  private[ktk] def newSidecarName(col: String): String =
    s"$col.${java.util.UUID.randomUUID.toString.replace("-", "").take(8)}.parquet"


  /** Legacy fixed-name sidecars (`<col>.parquet`) are rewritten IN PLACE by
    * later commits, so a snapshot cannot trust them; nonce-named ones are
    * canonical-immutable (append-only commits only ever ADD rows for new
    * labels, which every probe tolerates).
    */
  private def isVersionAddressed(col: String, name: String): Boolean =
    name != s"$col.parquet"

  /** Write a sidecar dir under a dot-prefixed temp name, then rename into
    * place: in-flight sidecar builds stay INVISIBLE to a concurrent
    * [[garbageCollect]] (which skips dot-prefixed names) until complete —
    * the write itself never mutates an existing dir (version-addressing).
    */
  private def atomicSidecarWrite(spark: SparkSession, dir: String, name: String)(
      write: String => Unit): Unit = {
    val fsys = DatasetMetadata.fs(spark, dir)
    val tmp = s"$dir/.$name.new"
    write(tmp)
    // FileSystem.rename signals failure by returning false, not throwing;
    // fail loudly while tmp still holds the only copy
    if (!fsys.rename(new Path(tmp), new Path(s"$dir/$name")))
      throw new java.io.IOException(s"sidecar rename $tmp -> $dir/$name failed")
  }

  // ---------------------------------------------------------------- store

  /** Write a DataFrame as a new dataset. Pipeline: normalize schema →
    * sortWithinPartitions(sortBy) for tight row-group stats
    * (≙ sort_partitions_by, io_components/write.py:82-83) → Hive-layout
    * partitionBy → build secondary indices → single-blob metadata commit.
    */
  def store(
      spark: SparkSession,
      base: String,
      uuid: String,
      df: DataFrame,
      partitionOn: Seq[String] = Nil,
      sortBy: Seq[String] = Nil,
      secondaryIndices: Seq[String] = Nil,
      overwrite: Boolean = false,
      userMetadata: Map[String, String] = Map.empty,
      bucketBy: Seq[String] = Nil,
      numBuckets: Int = 32,
      zoneMapFor: Seq[String] = Nil,
      bloomFor: Seq[String] = Nil,
      parquetBloomFor: Seq[String] = Nil): DatasetMetadata = {

    if (!overwrite && DatasetMetadata.exists(spark, base, uuid))
      throw new IllegalStateException(s"Dataset '$uuid' already exists (pass overwrite=true)")
    partitionOn.foreach(c => require(df.columns.contains(c), s"partition_on column '$c' missing"))
    parquetBloomFor.foreach(c => require(df.columns.contains(c), s"parquet-bloom column '$c' missing"))

    val normalized = SchemaUtil.normalize(df, partitionOn)
    // hash-bucket shuffle before the write (≙ io/dask/_shuffle.py:23-137):
    // co-locates rows by a DERIVED bucket id `pmod(hash(bucketBy), numBuckets)`
    // so files-per-partition-dir stays bounded by the bucket count while the
    // shuffle itself uses `spark.sql.shuffle.partitions` tasks — bucket count
    // and write parallelism are decoupled (repartition(numBuckets, ...) would
    // cap TOTAL write parallelism at numBuckets regardless of cluster size)
    val bucketed =
      if (bucketBy.nonEmpty) bucketFrame(normalized, partitionOn, bucketBy, numBuckets)
      else normalized
    // partition columns FIRST: FileFormatWriter requires the task ordering
    // to lead with them for dynamic-partition writes — otherwise it inserts
    // its own partition-only sort, which does NOT preserve the secondary
    // order (destroying exactly the row-group tightness sortBy buys)
    val sorted =
      if (sortBy.nonEmpty)
        bucketed.sortWithinPartitions((partitionOn ++ sortBy).map(c => col(s"`$c`")): _*)
      else bucketed

    val tableDir = s"$base/$uuid/table"
    // ROW-GROUP-level bloom filters inside the files (parquet-mr native,
    // applied automatically by the vectorized reader's row-group filtering
    // on pushed Eq/In) — complements the CATALOG-level sidecars (bloomFor),
    // which skip whole files before any task is scheduled. At 100 TB the two
    // compose: sidecars bound the task count, parquet blooms bound pages
    // read within the survivors.
    val writer0 = sorted.write.mode(SaveMode.Overwrite)
    val writer = parquetBloomFor.foldLeft(writer0)((w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true"))
    (if (partitionOn.nonEmpty) writer.partitionBy(partitionOn: _*) else writer).parquet(tableDir)

    // record the layout so maintenance rewrites keep files sorted (tight
    // row-group stats / zone ranges survive compaction)
    val meta =
      if (sortBy.isEmpty) userMetadata
      else userMetadata + (DatasetMetadata.SortByKey -> sortBy.mkString(","))
    commitAfterWrite(spark, base, uuid, partitionOn, secondaryIndices,
      normalized.schema, meta, zoneMapFor, bloomFor)
  }

  /** Hash-bucket co-location for the write: shuffle on (partitionOn,
    * derived bucket id) with `spark.sql.shuffle.partitions` parallelism.
    * Task count and bucket count stay DECOUPLED — files-per-partition-dir
    * is bounded by `numBuckets` while the shuffle scales with the cluster.
    */
  private[graft] def bucketFrame(
      df: DataFrame, partitionOn: Seq[String], bucketBy: Seq[String], numBuckets: Int): DataFrame = {
    val bucketId = pmod(hash(bucketBy.map(c => col(s"`$c`")): _*), lit(numBuckets))
    df.repartition((partitionOn.map(c => col(s"`$c`")) :+ bucketId): _*)
  }

  /** List written files, reject null partition values (kartothek's
    * partition_on null check, metapartition.py:1447-1453 — Spark encodes a
    * null key as `__HIVE_DEFAULT_PARTITION__`, which we detect for free from
    * the listing instead of paying a validation scan), then build indices and
    * commit.
    */
  private def commitAfterWrite(
      spark: SparkSession,
      base: String,
      uuid: String,
      partitionKeys: Seq[String],
      secondaryIndices: Seq[String],
      schema: StructType,
      userMetadata: Map[String, String],
      zoneMapFor: Seq[String] = Nil,
      bloomFor: Seq[String] = Nil): DatasetMetadata = {

    val tableDir = s"$base/$uuid/table"
    val partitions = listDataFiles(spark, tableDir)
    if (partitions.keys.exists(_.contains("__HIVE_DEFAULT_PARTITION__"))) {
      DatasetMetadata.fs(spark, base).delete(new Path(s"$base/$uuid"), true)
      DatasetMetadata.invalidateCache(base, uuid)
      throw new IllegalArgumentException(
        s"Original dataframe size does not match a row-count-preserving partition_on: " +
          s"null values in partition columns ${partitionKeys.mkString(",")} are not allowed")
    }

    (zoneMapFor ++ bloomFor).foreach(c => require(schema.fieldNames.contains(c),
      s"zone-map/bloom column '$c' not in schema"))
    val md0 = DatasetMetadata(
      uuid = uuid, partitionKeys = partitionKeys, partitions = partitions,
      partitionSeq = partitions.keys.map(_ -> 0L).toMap,
      schemaJson = schema.json, metadata = userMetadata)

    val indices = secondaryIndices.map { c =>
      require(schema.fieldNames.contains(c), s"index column '$c' not in schema")
      val name = newSidecarName(c)
      buildIndex(spark, base, md0, c, name)
      c -> name
    }.toMap
    val blooms = bloomFor.map { c =>
      val name = newSidecarName(c)
      buildBloom(spark, base, md0, c, partitions.keys.toSeq.sorted, name)
      c -> name
    }.toMap
    val zones = zoneMapFor.map(c => c -> newSidecarName(c)).toMap
    buildZoneSidecars(spark, base, md0, zones, partitions.keys.toSeq.sorted)

    val md = md0.copy(indices = indices, blooms = blooms, zones = zones)
    DatasetMetadata.store(spark, base, md, operation = "WRITE")
  }

  /** Relative-file-path label → size, from a recursive listing. */
  private def listDataFiles(spark: SparkSession, tableDir: String): Map[String, Long] = {
    val fs = DatasetMetadata.fs(spark, tableDir)
    val root = fs.makeQualified(new Path(tableDir))
    if (!fs.exists(root)) return Map.empty
    val prefix = root.toString + "/"
    val out = Map.newBuilder[String, Long]
    walkFiles(fs, root) { st =>
      val name = st.getPath.getName
      if (!name.startsWith("_") && !name.startsWith("."))
        out += st.getPath.toString.stripPrefix(prefix) -> st.getLen
    }
    out.result()
  }

  // -------------------------------------------------------------- zone maps

  /** Per-file min/max for ALL of `cols` from ONE narrow scan: a row per
    * label with `__min_c`/`__max_c` string columns (≙ Parquet zone maps
    * lifted into a catalog sidecar). O(#files) rows — catalog-sized, never
    * data-sized — and it stays DISTRIBUTED: nothing collects to the driver.
    */
  private def zoneAggRows(
      spark: SparkSession, tableDir: String, labels: Seq[String],
      cols: Seq[String]): DataFrame = {
    val scan = spark.read.option("basePath", tableDir)
      .parquet(labels.map(l => s"$tableDir/$l"): _*)
    val aggs = cols.flatMap(c => Seq(
      min(col(s"`$c`")).cast("string").as(s"__min_$c"),
      max(col(s"`$c`")).cast("string").as(s"__max_$c")))
    scan.groupBy(labelCol(spark, tableDir, input_file_name()).as("label")).agg(aggs.head, aggs.tail: _*)
  }

  /** Build a zone sidecar for each (column → target file name): one
    * (label, mn, mx) row per data file (null mn/mx = all-null file).
    * All columns share one scan; the catalog blob carries only the registry
    * entry — same storage pattern as [[buildBloom]], so at millions of files
    * the commit object never inlines ranges and planning reads stay lazy.
    */
  private[ktk] def buildZoneSidecars(
      spark: SparkSession, base: String, md: DatasetMetadata,
      targets: Map[String, String], labels: Seq[String]): Unit = {
    if (targets.isEmpty || labels.isEmpty) return
    val cols = targets.keys.toSeq.sorted
    val agg = zoneAggRows(spark, md.tableDir(base), labels, cols)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try cols.foreach { c =>
      atomicSidecarWrite(spark, s"$base/${md.uuid}/zones", targets(c)) { tmp =>
        agg.select(col("label"), col(s"__min_$c").as("mn"), col(s"__max_$c").as("mx"))
          .write.mode(SaveMode.Overwrite).parquet(tmp)
      }
    } finally { agg.unpersist(); () }
  }

  /** Incremental zone-sidecar merge, same shape as [[mergeBloomsIncremental]]:
    * surviving labels keep their rows (semi-join, never an inlined In-list),
    * new labels get freshly aggregated ones; `appendOnly` is the streaming
    * fast path (new rows land as extra files, [[compact]] re-canonicalizes).
    * Returns the zone registry to COMMIT: canonical rewrites land in a fresh
    * version-addressed dir ([[sidecarName]]) so snapshots never see their
    * sidecars mutate; appends keep the current name.
    */
  private def mergeZonesIncremental(
      spark: SparkSession, base: String, md: DatasetMetadata, tableDir: String,
      survivingOld: Seq[String], newLabels: Seq[String],
      appendOnly: Boolean = false): Map[String, String] = {
    import spark.implicits._
    val cols = md.zoneRegistry.keys.toSeq.sorted
    if (cols.isEmpty) return md.zoneRegistry
    val fsys = DatasetMetadata.fs(spark, base)
    val freshAgg =
      if (newLabels.isEmpty) None
      else Some(zoneAggRows(spark, tableDir, newLabels, cols)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    try cols.map { c =>
      val fsPath = md.zonePath(base, c)
      val oldExists = fsys.exists(new Path(fsPath))
      def fresh = freshAgg.get.select(col("label"),
        col(s"__min_$c").as("mn"), col(s"__max_$c").as("mx"))
      if (appendOnly && oldExists) {
        if (newLabels.nonEmpty) fresh.write.mode(SaveMode.Append).parquet(fsPath)
        c -> md.zoneRegistry(c)
      } else if (oldExists || newLabels.nonEmpty) {
        val survivors = survivingOld.toDF("label")
        val rows = (oldExists, newLabels.nonEmpty) match {
          case (true, true) =>
            spark.read.parquet(fsPath)
              .join(broadcast(survivors), Seq("label"), "left_semi")
              .unionByName(fresh)
          case (true, false) =>
            spark.read.parquet(fsPath)
              .join(broadcast(survivors), Seq("label"), "left_semi")
          case (false, _) => fresh
        }
        val name = newSidecarName(c)
        atomicSidecarWrite(spark, s"$base/${md.uuid}/zones", name) { tmp =>
          rows.coalesce(SidecarCanonicalFiles)
            .write.mode(SaveMode.Overwrite).parquet(tmp)
        }
        c -> name
      } else c -> md.zoneRegistry(c)
    }.toMap
    finally freshAgg.foreach { a => a.unpersist(); () }
  }

  /** Migrate LEGACY inline zone maps (pre-sidecar blobs) to sidecar form:
    * ranges move out of the blob into `<uuid>/zones/`, the blob keeps only
    * registry entries. Runs on the first mutating op against an old dataset;
    * the returned metadata is committed by the caller's single blob put.
    */
  private def migrateInlineZones(
      spark: SparkSession, base: String, md: DatasetMetadata): DatasetMetadata = {
    val inline = md.inlineZoneMaps
    if (inline.isEmpty) return md
    import spark.implicits._
    val names = inline.toSeq.sortBy(_._1).map { case (c, perLabel) =>
      val rows = perLabel.toSeq.map { case (l, s) =>
        if (s == null || s.isEmpty) (l, null: String, null: String)
        else (l, s.head, s(1))
      }
      val name = newSidecarName(c)
      atomicSidecarWrite(spark, s"$base/${md.uuid}/zones", name) { tmp =>
        rows.toDF("label", "mn", "mx").repartition(1)
          .write.mode(SaveMode.Overwrite).parquet(tmp)
      }
      c -> name
    }
    md.copy(zoneMaps = Map.empty, zones = md.zoneRegistry ++ names)
  }

  /** Materialized zone map of `column` — (label → [min, max] strings, empty
    * seq = all-null file) — from the sidecar, or the legacy inline form for
    * pre-sidecar blobs. Catalog-sized; intended for tooling/tests, the read
    * path probes the sidecar distributed without materializing this.
    */
  def zoneMapOf(spark: SparkSession, base: String, md: DatasetMetadata,
      column: String): Map[String, Seq[String]] = {
    if (md.zoneRegistry.contains(column)) {
      val p = new Path(md.zonePath(base, column))
      if (!DatasetMetadata.fs(spark, base).exists(p)) Map.empty
      else spark.read.parquet(p.toString).select("label", "mn", "mx").collect().map { r =>
        val mn = r.getString(1); val mx = r.getString(2)
        r.getString(0) -> (if (mn == null || mx == null) Seq.empty[String] else Seq(mn, mx))
      }.toMap
    } else md.inlineZoneMaps.getOrElse(column, Map.empty)
  }

  /** Normalize a value for zone-range comparison: date/timestamp strings
    * (the rendered form of `cast(ts as string)`) become epoch millis so
    * they compare numerically with date literals.
    */
  private def zoneValue(x: Any): Any = x match {
    case s: String =>
      try java.sql.Timestamp.valueOf(s).getTime
      catch {
        case _: Exception =>
          try java.sql.Date.valueOf(s).getTime catch { case _: Exception => s }
      }
    case d: java.sql.Date => d.getTime
    case t: java.sql.Timestamp => t.getTime
    case other => other
  }

  private def zoneCmp(a: Any, b: Any): Int =
    Predicates.compare(zoneValue(a), zoneValue(b))

  /** May rows in [mn, mx] satisfy the literal? CONSERVATIVE: any comparison
    * failure keeps the file. Stats exclude nulls, so null-matching literals
    * never prune (handled by the caller).
    */
  private def zoneMayMatch(l: PredLiteral, mn: String, mx: String): Boolean = {
    import graft.core.PredOp._
    try l.op match {
      case Eq => zoneCmp(l.value, mn) >= 0 && zoneCmp(l.value, mx) <= 0
      case Ne => !(zoneCmp(mn, mx) == 0 && zoneCmp(l.value, mn) == 0)
      case Lt => zoneCmp(mn, l.value) < 0
      case Le => zoneCmp(mn, l.value) <= 0
      case Gt => zoneCmp(mx, l.value) > 0
      case Ge => zoneCmp(mx, l.value) >= 0
      case In => l.value.asInstanceOf[Seq[Any]]
        .exists(v => v != null && zoneCmp(v, mn) >= 0 && zoneCmp(v, mx) <= 0)
    } catch { case _: Exception => true }
  }

  /** Range check for one literal, closed over for driver or executor use.
    * Large IN lists (semiJoinRead pushes up to maxKeys values): sort once,
    * binary-search per file — O(files·log keys), not O(files·keys).
    */
  private def zoneCheckFn(l: PredLiteral): (String, String) => Boolean = l.op match {
    case graft.core.PredOp.In =>
      val sorted =
        try l.value.asInstanceOf[Seq[Any]].filter(_ != null)
          .sortWith(zoneCmp(_, _) < 0).toIndexedSeq
        catch { case _: Exception => null }
      if (sorted == null) (mn, mx) => zoneMayMatch(l, mn, mx)
      else (mn, mx) => try {
        // least value >= mn, then test <= mx
        var lo = 0; var hi = sorted.size
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (zoneCmp(sorted(mid), mn) < 0) lo = mid + 1 else hi = mid
        }
        lo < sorted.size && zoneCmp(sorted(lo), mx) <= 0
      } catch { case _: Exception => true }
    case _ => (mn, mx) => zoneMayMatch(l, mn, mx)
  }

  // ---------------------------------------------------------------- blooms

  /** Bloom sizing bounds. Filters are sized to each file's ACTUAL distinct
    * hash count (clamped to these bounds), so small files don't pay a
    * fixed ~120 KB and huge files don't blow past the target FPP. An
    * overfull bloom only raises the false-positive rate — `mightContain`
    * never false-negatives — so sizing degrades pruning, never correctness.
    */
  val BloomMinItems: Long = 1000L
  val BloomMaxItems: Long = 10000000L
  val BloomFpp: Double = 0.01

  /** One (label, bloom bytes) row per data file for `column`: scan only that
    * column + file name, hash values with xxhash64 (the probe hashes literals
    * identically), group by file label, fold each group into a Bloom filter.
    * The shuffle moves (label, long) pairs — O(rows × 8 bytes), never values.
    * Coverage is TOTAL over the scanned labels: a file with no non-null
    * value gets a row with a NULL bloom (matches nothing — only
    * non-null-matching literals ever reach the probe), so the probe can
    * treat "not a survivor" as "safe to skip" and collect survivors only.
    */
  private def bloomPairs(
      spark: SparkSession, tableDir: String, column: String, labels: Seq[String]): DataFrame = {
    import spark.implicits._
    if (labels.isEmpty) return spark.emptyDataset[(String, Array[Byte])].toDF("label", "bloom")
    spark.read.option("basePath", tableDir)
      .parquet(labels.map(l => s"$tableDir/$l"): _*)
      .select(col(s"`$column`").as("v"), labelCol(spark, tableDir, input_file_name()).as("label"))
      .select(col("label"),
        when(col("v").isNotNull, xxhash64(col("v"))).as("h"))
      .as[(String, java.lang.Long)]
      .groupByKey(_._1)
      .mapGroups { (label, it) =>
        // two-pass per file: buffer the 8-byte hashes (bounded by rows per
        // file), then size the filter to the DISTINCT count — exact FPP
        // control per file instead of a one-size guess
        val hs = new java.util.HashSet[java.lang.Long]()
        it.foreach { case (_, h) => if (h != null) { hs.add(h); () } }
        if (hs.isEmpty) (label, null: Array[Byte])
        else {
          val n = math.min(BloomMaxItems, math.max(BloomMinItems, hs.size.toLong))
          val bf = org.apache.spark.util.sketch.BloomFilter.create(n, BloomFpp)
          hs.forEach(h => bf.putLong(h))
          val bos = new java.io.ByteArrayOutputStream()
          bf.writeTo(bos)
          (label, bos.toByteArray)
        }
      }
      .toDF("label", "bloom")
  }

  /** Build the Bloom sidecar `<uuid>/blooms/<target>` for the given labels
    * (equality/IN data skipping on high-cardinality columns where zone
    * ranges are too wide and a secondary index too big; the catalog blob
    * carries only the registry entry, the sidecar stays on storage).
    */
  private[ktk] def buildBloom(
      spark: SparkSession, base: String, md: DatasetMetadata, column: String,
      labels: Seq[String], target: String): Unit =
    atomicSidecarWrite(spark, s"$base/${md.uuid}/blooms", target) { tmp =>
      bloomPairs(spark, md.tableDir(base), column, labels)
        .write.mode(SaveMode.Overwrite).parquet(tmp)
    }

  /** Incremental sidecar merge, same shape as [[mergeIndicesIncremental]]:
    * surviving labels keep their bloom rows (semi-join, never an inlined
    * In-list), new labels get freshly built ones. Returns the bloom
    * registry to COMMIT — canonical rewrites go to a fresh
    * version-addressed dir, appends keep the current name.
    */
  private def mergeBloomsIncremental(
      spark: SparkSession, base: String, md: DatasetMetadata, tableDir: String,
      survivingOld: Seq[String], newLabels: Seq[String],
      appendOnly: Boolean = false): Map[String, String] = {
    import spark.implicits._
    val fsys = DatasetMetadata.fs(spark, base)
    md.bloomRegistry.keys.toSeq.sorted.map { c =>
      val fsPath = md.bloomPath(base, c)
      val oldExists = fsys.exists(new Path(fsPath))
      if (appendOnly && oldExists) {
        // streaming-commit fast path (see mergeIndicesIncremental): new
        // labels' bloom rows append as extra files, O(new files) per commit
        if (newLabels.nonEmpty)
          bloomPairs(spark, tableDir, c, newLabels)
            .write.mode(SaveMode.Append).parquet(fsPath)
        c -> md.bloomRegistry(c)
      } else if (oldExists || newLabels.nonEmpty) {
        val survivors = survivingOld.toDF("label")
        def fresh = bloomPairs(spark, tableDir, c, newLabels)
        val rows = (oldExists, newLabels.nonEmpty) match {
          case (true, true) =>
            spark.read.parquet(fsPath)
              .join(broadcast(survivors), Seq("label"), "left_semi")
              .unionByName(fresh)
          case (true, false) =>
            spark.read.parquet(fsPath)
              .join(broadcast(survivors), Seq("label"), "left_semi")
          case (false, _) => fresh
        }
        val name = newSidecarName(c)
        atomicSidecarWrite(spark, s"$base/${md.uuid}/blooms", name) { tmp =>
          rows.coalesce(SidecarCanonicalFiles)
            .write.mode(SaveMode.Overwrite).parquet(tmp)
        }
        c -> name
      } else c -> md.bloomRegistry(c)
    }.toMap
  }

  /** Highest parquet-fragment count across all registered sidecars (index /
    * bloom / zone). Append-only streaming commits add one fragment set per
    * batch; this is the signal for re-canonicalization. O(sidecar dirs)
    * flat listings — never touches the table dir.
    */
  def sidecarFragments(spark: SparkSession, base: String, uuid: String): Int = {
    val md = DatasetMetadata.load(spark, base, uuid)
    val fsys = DatasetMetadata.fs(spark, base)
    val paths =
      md.indices.keys.map(c => md.indexPath(base, c)) ++
        md.bloomRegistry.keys.map(c => md.bloomPath(base, c)) ++
        md.zoneRegistry.keys.map(c => md.zonePath(base, c))
    paths.map { p =>
      val dir = new Path(p)
      if (!fsys.exists(dir)) 0
      else fsys.listStatus(dir).count { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
    }.maxOption.getOrElse(0)
  }

  /** Re-canonicalize ONLY the sidecars: each index/bloom/zone sidecar is
    * merged back to one canonical file set (semi-join against live labels,
    * single rewrite). No data files move, metadata is unchanged — O(sidecar)
    * cost, so a streaming sink can afford it on a fragment-count trigger
    * independent of full [[compact]] cadence.
    */
  def canonicalizeSidecars(spark: SparkSession, base: String, uuid: String): Unit = {
    val md0 = DatasetMetadata.load(spark, base, uuid)
    val md = migrateInlineZones(spark, base, md0)
    val tableDir = md.tableDir(base)
    val live = md.partitions.keys.toSeq.sorted
    val idx = mergeIndicesIncremental(spark, base, md, tableDir, survivingOld = live, newLabels = Nil)
    val blm = mergeBloomsIncremental(spark, base, md, tableDir, survivingOld = live, newLabels = Nil)
    val zon = mergeZonesIncremental(spark, base, md, tableDir, survivingOld = live, newLabels = Nil)
    // canonical rewrites landed in fresh version-addressed dirs — the
    // registries naming them (plus any inline-zone migration) must COMMIT;
    // one put covers all. No-op canonicalizations commit nothing.
    if (idx != md.indices || blm != md.bloomRegistry || zon != md.zoneRegistry || (md ne md0)) {
      DatasetMetadata.store(spark, base,
        md.copy(indices = idx, blooms = blm, zones = zon), parentMd = Some(md0),
        operation = "CANONICALIZE SIDECARS")
      ()
    }
  }

  /** Register + compute zone maps on an EXISTING dataset (retrofit analog of
    * [[addIndex]]/[[addBloom]] — the migration path for datasets stored
    * before zone columns were chosen, or adopted from the reference layout
    * which has no zone maps). One narrow scan; O(#files × #cols) metadata.
    */
  def addZoneMaps(spark: SparkSession, base: String, uuid: String,
      columns: Seq[String]): DatasetMetadata = {
    val md = migrateInlineZones(spark, base, DatasetMetadata.load(spark, base, uuid))
    columns.foreach(c => require(md.schema.fieldNames.contains(c),
      s"zone-map column '$c' not in schema"))
    val targets = columns.map(c => c -> newSidecarName(c)).toMap
    buildZoneSidecars(spark, base, md, targets, md.partitions.keys.toSeq.sorted)
    val md2 = md.copy(zones = md.zoneRegistry ++ targets)
    DatasetMetadata.store(spark, base, md2, parentMd = Some(md),
      operation = "ADD ZONEMAPS")
  }

  /** Register + build a Bloom sidecar on an EXISTING dataset (the bloom
    * analog of [[addIndex]]).
    */
  def addBloom(spark: SparkSession, base: String, uuid: String, column: String): DatasetMetadata = {
    val md = DatasetMetadata.load(spark, base, uuid)
    require(md.schema.fieldNames.contains(column), s"bloom column '$column' not in schema")
    val name = newSidecarName(column)
    buildBloom(spark, base, md, column, md.partitions.keys.toSeq.sorted, name)
    val md2 = md.copy(blooms = md.bloomRegistry + (column -> name))
    DatasetMetadata.store(spark, base, md2, parentMd = Some(md),
      operation = "ADD BLOOM")
  }

  /** xxhash64 of predicate literals AT THE COLUMN'S TYPE — must agree
    * bit-for-bit with the build side's `xxhash64(col)`, so each literal is
    * cast through the same Catalyst type first. ONE local job hashes the
    * whole batch (an IN-list must not cost a job per value). None (= never
    * prune) when any cast fails or yields null: such a literal set cannot
    * be safely probed.
    */
  private def literalHashes(spark: SparkSession, dt: org.apache.spark.sql.types.DataType,
      vals: Seq[Any]): Option[Seq[Long]] =
    try {
      val arr = array(vals.map(v => lit(v).cast(dt)): _*)
      val rows = spark.range(1).select(explode(arr).as("v"))
        .select(col("v").isNull.as("n"), xxhash64(col("v")).as("h")).collect()
      if (rows.isEmpty || rows.exists(_.getBoolean(0))) None
      else Some(rows.map(_.getLong(1)).toSeq)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Distributed Bloom-sidecar probe for one Eq/In literal: each file's
    * filter deserializes and evaluates ON EXECUTORS, the survivor filter is
    * applied there too, and only labels that MIGHT match are collected —
    * O(matching labels) driver transfer, the pruning factor itself, never
    * O(#files). Sound to skip non-survivors because sidecar coverage is
    * total: every committed label has a row ([[bloomPairs]] emits a null
    * bloom for all-null files, which no non-null-matching literal — the only
    * kind routed here — can match). Labels a LEGACY sidecar lacks are
    * exactly the all-null files, so skipping them stays harmless.
    * None = this literal cannot be probed safely (no sidecar file yet, or a
    * literal failed to cast/hash) → no pruning.
    */
  private[graft] def bloomProbe(
      spark: SparkSession, base: String, md: DatasetMetadata,
      l: PredLiteral): Option[Set[String]] = {
    val sidecar = new Path(md.bloomPath(base, l.col))
    if (!DatasetMetadata.fs(spark, base).exists(sidecar)) None
    else {
      val dt = md.schema(l.col).dataType
      val vals = l.op match {
        case graft.core.PredOp.Eq => Seq(l.value)
        case graft.core.PredOp.In => l.value.asInstanceOf[Seq[Any]].filter(_ != null)
        case _                    => Seq.empty
      }
      // every literal must hash (a failed cast means we cannot mirror the
      // build-side hashing for it) or the probe is unsound for this conj
      literalHashes(spark, dt, vals) match {
        case None => None
        case Some(hashes) =>
          val hs = hashes.toArray
          val might = udf { (bytes: Array[Byte]) =>
            bytes != null && {
              val bf = org.apache.spark.util.sketch.BloomFilter
                .readFrom(new java.io.ByteArrayInputStream(bytes))
              hs.exists(bf.mightContainLong)
            }
          }
          Some(spark.read.parquet(sidecar.toString)
            .filter(might(col("bloom")))
            .select(col("label")).collect().map(_.getString(0)).toSet)
      }
    }
  }

  /** Distributed zone-sidecar probe for one literal: the range check
    * evaluates on executors, survivors only come back — O(matching labels),
    * never O(#files). Null mn/mx = all-null or empty file, which no
    * non-null-matching literal (the only kind routed here) can satisfy, so
    * coverage is total over committed labels and skipping non-survivors is
    * sound. None = no sidecar file → no pruning.
    */
  private[graft] def zoneProbe(
      spark: SparkSession, base: String, md: DatasetMetadata,
      l: PredLiteral): Option[Set[String]] = {
    val sidecar = new Path(md.zonePath(base, l.col))
    if (!DatasetMetadata.fs(spark, base).exists(sidecar)) None
    else {
      val check = zoneCheckFn(l)
      val may = udf { (mn: String, mx: String) =>
        mn != null && mx != null && check(mn, mx)
      }
      Some(spark.read.parquet(sidecar.toString)
        .filter(may(col("mn"), col("mx")))
        .select(col("label")).collect().map(_.getString(0)).toSet)
    }
  }

  // ---------------------------------------------------------------- indices

  /** Build one secondary index as a Parquet table `(value, partitions:
    * array<string>)` — the Spark-native form of ExplicitSecondaryIndex
    * storage (core/index.py:899-955). One shuffle agg over only the indexed
    * column + file name; Parquet column pruning keeps the scan narrow.
    * Writes to `target` under the index dir (version-addressed by callers).
    */
  def buildIndex(spark: SparkSession, base: String, md: DatasetMetadata, column: String,
      target: String): Unit = {
    val tableDir = md.tableDir(base)
    val df = spark.read.option("basePath", tableDir).parquet(
      md.partitions.keys.toSeq.sorted.map(l => s"$tableDir/$l"): _*)
    val labeled = df.select(col(s"`$column`").as("value"), labelCol(spark, tableDir, input_file_name()).as("label"))
    atomicSidecarWrite(spark, s"$base/${md.uuid}/$IndexDirName", target) { tmp =>
      indexFromPairs(labeled).write.mode(SaveMode.Overwrite).parquet(tmp)
    }
  }

  /** Decode a URI-encoded path column back to the on-disk/metadata label
    * form. `_metadata.file_path` and `input_file_name()` render the file's
    * URI (space → %20, '%' → %25, …) while the metadata maps, DV
    * fragments, index partition lists and storage listings all use the
    * decoded on-disk form — every label comparison must happen in ONE
    * coordinate system, or an encodable label silently misses its
    * tombstones and deleted rows RESURRECT (pinned in LabelEncodingSpec).
    * url_decode's '+'-as-space hazard is fenced by re-escaping literal
    * '+' first (URI path encoding leaves '+' literal); all codegen'd
    * builtins — no UDF lands on scan hot paths.
    */
  private[graft] def decodeUriPathCol(c: Column): Column =
    url_decode(regexp_replace(c, lit("\\+"), lit("%2B")))

  /** Partition label of the current input file by EXACT qualified-root
    * stripping — the ONE label-from-path idiom (the DV scans' driver-side
    * twin is [[stripLabelPrefix]]; two idioms for one coordinate system is
    * how the URI-resurrection bug happened). `_metadata.file_path` renders
    * a URI whose scheme/authority form (`file:///x`) differs from Hadoop's
    * qualified-path form (`file:/x`), so both sides normalize to the DECODED
    * filesystem path: the column drops `scheme:(//authority)?` then
    * URI-decodes; the prefix is the qualified table root's `toUri.getPath`
    * (Hadoop `Path` round-trips literal `%`/space through its internal URI,
    * so `getPath` returns the on-disk form). Loud on mismatch, like
    * [[stripLabelPrefix]]: a file outside the table root means the two
    * sides qualified differently, and guessing a label there risks
    * attributing rows (or tombstones) to the wrong file. All codegen'd
    * builtins — `raise_error` sits in the never-taken CASE branch.
    */
  private[graft] def labelCol(spark: SparkSession, tableDir: String,
      pathCol: Column = col("_metadata.file_path")): Column = {
    val qualified = DatasetMetadata.fs(spark, tableDir).makeQualified(new Path(tableDir))
    val prefix = qualified.toUri.getPath.stripSuffix("/") + "/"
    val decoded = decodeUriPathCol(
      regexp_replace(pathCol, lit("^[a-zA-Z][a-zA-Z0-9+.\\-]*:(//[^/]*)?"), lit("")))
    // Spark substr/length count CODE POINTS while String.length counts
    // UTF-16 units — a table root containing a supplementary character
    // (emoji volume name, rare CJK) would shift the label start by one per
    // such character and mislabel every row without tripping startsWith
    when(decoded.startsWith(lit(prefix)),
      decoded.substr(lit(prefix.codePointCount(0, prefix.length) + 1), length(decoded)))
      .otherwise(raise_error(concat(
        lit("input file '"), decoded,
        lit(s"' is not under the qualified table root '$prefix' — refusing " +
          "to guess its table-relative label"))))
  }

  /** (value,label) pairs → deterministic (value, partitions) index rows. */
  /** Canonical sidecar rewrites bound their output to this many files so
    * the streaming fragment cap converges (a canonical result wider than
    * the cap would re-trigger every commit). Files stay value-sorted, so
    * row-group stats prune regardless of file count.
    */
  private[ktk] val SidecarCanonicalFiles = 4

  private def indexFromPairs(pairs: DataFrame, outFiles: Int = 0): DataFrame = {
    val agg = pairs
      .where(col("value").isNotNull) // nulls are not indexable (core/index.py:83-86)
      .groupBy("value")
      .agg(sort_array(collect_set(col("label"))).as("partitions"))
    (if (outFiles > 0) agg.repartition(outFiles, col("value")) else agg)
      .sortWithinPartitions("value")
  }

  /** The raw index frame. One row per value after [[store]]/[[update]]/
    * [[compact]]; append-only streaming commits ([[update]] with
    * `appendSidecars`) may leave a value spread over several rows until the
    * next [[compact]] — consumers must treat rows per value as a union.
    */
  def loadIndex(spark: SparkSession, base: String, md: DatasetMetadata, column: String): DataFrame =
    spark.read.parquet(md.indexPath(base, column))

  /** Distinct indexed values (≙ IndexBase.observed_values). */
  def observedValues(spark: SparkSession, base: String, md: DatasetMetadata, column: String): DataFrame =
    loadIndex(spark, base, md, column).select(col("value")).distinct()

  /** ≙ dataset.query / get_indices_as_dataframe (core/dataset.py:392-516):
    * labels matching the predicates using ONLY partition keys + secondary
    * indices. Per conjunction: intersect per-column label sets (the
    * index-intersection join, smallest-first is irrelevant at driver scale);
    * union across conjunctions.
    */
  def queryLabels(
      spark: SparkSession,
      base: String,
      md: DatasetMetadata,
      predicates: Predicates): Seq[String] = {
    val all = md.partitions.keys.toSeq.sorted
    if (predicates.isEmpty || all.isEmpty) return all
    val indexed = md.indices.keySet
    val partCols = md.partitionKeys.toSet

    // per (column, literal): evaluate the literal INSIDE the index scan —
    // the predicate pushes into the index parquet (written sorted by value,
    // so row-group stats prune tightly) and only MATCHING labels come back
    // to the driver, never the whole index. O(matching labels), not O(index).
    val lookupCache = scala.collection.mutable.Map.empty[(String, PredLiteral), Set[String]]
    def matchingLabels(l: PredLiteral): Set[String] =
      lookupCache.getOrElseUpdate((l.col, l), {
        val onValue = Predicates(Seq(Seq(l.copy(col = "value"))))
        loadIndex(spark, base, md, l.col)
          .filter(onValue.toColumn)
          .select(explode(col("partitions")).as("label"))
          .distinct()
          .collect().map(_.getString(0)).toSet
      })

    // per (column, literal): probe the bloom / zone sidecars DISTRIBUTED —
    // see [[bloomProbe]] / [[zoneProbe]]. Only SURVIVING labels are
    // collected, so driver transfer is O(matching) — the pruning factor
    // itself — never O(#files).
    val bloomLookupCache =
      scala.collection.mutable.Map.empty[(String, PredLiteral), Option[Set[String]]]
    def bloomSets(l: PredLiteral): Option[Set[String]] =
      bloomLookupCache.getOrElseUpdate((l.col, l), bloomProbe(spark, base, md, l))
    val zoneLookupCache =
      scala.collection.mutable.Map.empty[(String, PredLiteral), Option[Set[String]]]
    def zoneSets(l: PredLiteral): Option[Set[String]] =
      zoneLookupCache.getOrElseUpdate((l.col, l), zoneProbe(spark, base, md, l))

    val surviving = predicates.splitPerConjunction(partCols).zip(predicates.disjunction).flatMap {
      case ((partLits, _), conj) =>
        // 1. partition-key pruning from decoded labels (PartitionIndex)
        val afterPart = all.filter { label =>
          val values = md.partitionValues(label)
          Predicates(Seq(partLits)).matchesValues(values)
        }
        // 2. secondary-index pruning: intersect per-literal label sets.
        // Null-valued literals are NOT index-prunable: nulls are never
        // indexed (indexFromPairs drops them), so pruning on `== null` /
        // `in [.., null, ..]` would silently drop every partition whose
        // rows hold nulls — leave those literals to the residual filter.
        def indexPrunable(l: PredLiteral): Boolean = l.op match {
          case graft.core.PredOp.Eq => l.value != null
          case graft.core.PredOp.In =>
            l.value == null || !l.value.asInstanceOf[Seq[Any]].contains(null)
          case _ => true
        }
        val idxLits = conj.filter(l =>
          indexed.contains(l.col) && !partCols.contains(l.col) && indexPrunable(l))
        val afterIdx =
          idxLits.foldLeft(afterPart.toSet)((labels, l) => labels intersect matchingLabels(l))
        // 3. zone-map pruning: drop files whose [min, max] range excludes
        // the literal. `indexPrunable` doubles as the null guard — nulls
        // are invisible to stats, so null-matching literals never prune.
        // A file with null/empty stats holds only nulls for that column,
        // which no non-null-matching literal can satisfy. Sidecar columns
        // probe DISTRIBUTED (zoneSets above); legacy inline maps evaluate
        // on the driver.
        val zoneLits = conj.filter(l =>
          md.zoneColumns.contains(l.col) && !partCols.contains(l.col) && indexPrunable(l))
        val afterZone = zoneLits.foldLeft(afterIdx) { (labels, l) =>
          if (md.zoneRegistry.contains(l.col)) {
            zoneSets(l) match {
              case None           => labels
              case Some(matching) => labels intersect matching
            }
          } else {
            val zm = md.inlineZoneMaps(l.col)
            val check = zoneCheckFn(l)
            labels.filter { lbl =>
              zm.get(lbl) match {
                case None                  => true // no stats recorded: keep
                case Some(s) if s.isEmpty  => false // all-null file
                case Some(s)               => check(s.head, s(1))
              }
            }
          }
        }
        // 4. Bloom pruning: equality/IN literals on bloom-registered columns.
        // Labels absent from the sidecar are always kept (files written after
        // the bloom build, or holding only nulls) — absence is conservative.
        val bloomLits = conj.filter(l =>
          (l.op == graft.core.PredOp.Eq || l.op == graft.core.PredOp.In) &&
            md.bloomRegistry.contains(l.col) && !partCols.contains(l.col) && indexPrunable(l))
        bloomLits.foldLeft(afterZone) { (labels, l) =>
          bloomSets(l) match {
            case None           => labels
            case Some(matching) => labels intersect matching
          }
        }
    }.toSet
    all.filter(surviving.contains)
  }

  /** STRING-key merge-envelope pruning, exact by construction: every
    * comparison runs under Spark's UTF8-binary string order — the same
    * order the envelope's `min`/`max` were computed in — never the
    * driver-side UTF-16 comparator or the legacy inline-zone coercions
    * (both diverge from UTF8-binary, see the merge envelope comment).
    *
    *  - partition values: decoded label values compared as UTF-8 BYTES on
    *    the driver (byte-identical to Spark's order);
    *  - secondary index: the range evaluates INSIDE the index scan with
    *    Spark expressions; labels the index does not mention AT ALL are
    *    KEPT (keep-on-absence, like the bloom layer in queryLabels);
    *  - zone sidecar: Spark-side `mn <= hi && mx >= lo` over the sidecar
    *    table (stats present-but-null ⇒ all-null file ⇒ no `=` match ⇒
    *    dropped; label absent from the sidecar ⇒ KEPT);
    *  - legacy INLINE zone maps and blooms: fenced off — no pruning.
    *
    * Soundness: a batch key s with lo ≤ s ≤ hi (UTF8 order, by min/max
    * construction) that exists in a file implies the file's partition
    * value equals s's (kept), its index rows contain s (kept), and its
    * zone [mn, mx] straddles s (kept) — pruning can only drop files that
    * hold NO batch key; the residual semi join stays exact regardless.
    */
  private[graft] def stringEnvelopeCandidates(
      spark: SparkSession, base: String, md: DatasetMetadata,
      candidates: Seq[String], bounds: Seq[(String, String, String)]): Seq[String] = {
    val partCols = md.partitionKeys.toSet
    bounds.foldLeft(candidates) { case (labels0, (k, lo, hi)) =>
      var cur = labels0
      if (partCols(k) && cur.nonEmpty)
        cur = cur.filter { lbl =>
          md.partitionValues(lbl).get(k)
            .forall(v => utf8Leq(lo, v) && utf8Leq(v, hi))
        }
      // both sidecar passes are KEEP-ON-ABSENCE (the bloom layer's
      // convention in queryLabels): a committed label with no row in the
      // index/zone sidecar stays a candidate rather than being pruned —
      // intersecting would let any commit path that skips a sidecar append
      // make merge silently skip tombstoning matched rows. ONE sidecar scan
      // answers both questions: emit (label, hit) rows, restrict to the
      // (small, broadcast) candidate list, and take max(hit) per label —
      // keep a candidate iff it has a matching row OR no rows at all.
      // Driver transfer is O(candidates), the scan runs once.
      def keepMatchingOrUncovered(perLabelHits: DataFrame): Unit = {
        import spark.implicits._
        val candDf = broadcast(spark.createDataset(cur).toDF("label"))
        val verdict = perLabelHits.join(candDf, Seq("label"))
          .groupBy("label").agg(max(col("hit")).as("any_hit"))
          .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
        cur = cur.filter(l => verdict.getOrElse(l, true))
      }
      if (md.indices.contains(k) && cur.nonEmpty)
        keepMatchingOrUncovered(
          // hit is evaluated BEFORE the explode (null values cannot equal a
          // non-null key → coalesce to false, never null)
          loadIndex(spark, base, md, k).select(
            explode(col("partitions")).as("label"),
            coalesce(col("value") >= lit(lo) && col("value") <= lit(hi),
              lit(false)).as("hit")))
      if (md.zoneRegistry.contains(k) && cur.nonEmpty) {
        val sidecar = new Path(md.zonePath(base, k))
        if (DatasetMetadata.fs(spark, base).exists(sidecar))
          keepMatchingOrUncovered(
            // null stats = all-null column in that file: present in the
            // sidecar but never matching ⇒ dropped, as before
            spark.read.parquet(sidecar.toString).select(
              col("label"),
              coalesce(col("mn").isNotNull && col("mx").isNotNull &&
                col("mn") <= lit(hi) && col("mx") >= lit(lo),
                lit(false)).as("hit")))
      }
      cur
    }
  }

  /** `a <= b` under UTF-8 unsigned-byte order — byte-identical to Spark's
    * default (UTF8_BINARY) string comparison, property-tested against
    * `UTF8String.compareTo` in MergePruneSpec. The ONLY driver-side string
    * comparator the string envelope is allowed to touch.
    */
  private[graft] def utf8Leq(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < x.length && i < y.length) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length <= y.length
  }

  // ---------------------------------------------------------------- read

  /** Read a dataset as one DataFrame with DNF predicate pushdown:
    * driver-side label pruning (partition keys + secondary indices) picks the
    * file list, then a vanilla multi-file Parquet scan gets Catalyst column
    * pruning + row-group stats pushdown, and the exact residual filter is
    * re-applied (≙ the reference's three-stage filter,
    * serialization/_parquet.py:186-274).
    */
  def readTable(
      spark: SparkSession,
      base: String,
      uuid: String,
      columns: Seq[String] = Nil,
      predicates: Predicates = Predicates.empty,
      dispatchBy: Seq[String] = Nil,
      indexOn: Option[String] = None,
      labelFilter: String => Boolean = _ => true,
      filterQuery: Option[String] = None): DataFrame = {
    // predicates XOR filter_query, like the reference (_generic.py:56-66);
    // filterQuery is strictly more powerful (full Spark SQL expression)
    require(filterQuery.isEmpty || predicates.isEmpty,
      "predicates and filterQuery are mutually exclusive")
    val md0 = DatasetMetadata.load(spark, base, uuid)
    // label_filter hook (≙ io_components/read.py:123-124): restrict the
    // partition listing before any pruning/planning
    val md = md0.copy(partitions = md0.partitions.filter { case (l, _) => labelFilter(l) })
    val df0 = readTableWithMetadata(spark, base, md, columns, predicates, dispatchBy)
    val df = filterQuery.map(q => df0.filter(expr(q))).getOrElse(df0)
    // dask_index_on equivalent (io/dask/dataframe.py:160-169): range-
    // partitioned, sorted-within-partition layout on the index column
    indexOn match {
      case Some(c) => df.repartitionByRange(col(s"`$c`")).sortWithinPartitions(col(s"`$c`"))
      case None    => df
    }
  }

  def readTableWithMetadata(
      spark: SparkSession,
      base: String,
      md: DatasetMetadata,
      columns: Seq[String] = Nil,
      predicates: Predicates = Predicates.empty,
      dispatchBy: Seq[String] = Nil,
      withOverlayOrder: Boolean = false): DataFrame = {
    val labels = queryLabels(spark, base, md, predicates)
    val tableDir = md.tableDir(base)
    val schema = md.schema

    val base0: DataFrame =
      if (labels.isEmpty) {
        val empty = spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
        if (withOverlayOrder) empty.withColumn("__seq", lit(0L)).withColumn("__pos", lit(0L))
        else empty
      } else {
        // merge-on-read row-level deletes: split the scan so ONLY files the
        // deletion vectors touch pay the (label, pos) anti-join — clean
        // files (the overwhelming majority after routine maintenance) scan
        // exactly as if no delete had ever happened
        val dirtyL = labels.filter(dirtyDeleteLabels(spark, base, md).contains)
        val cleanL = labels.filterNot(dirtyL.toSet)
        val needPos = withOverlayOrder || dirtyL.nonEmpty
        // explicit schema: stable types + partition-column reconstruction
        def scanOf(ls: Seq[String]): DataFrame = {
          val s = spark.read
            .option("basePath", tableDir)
            .schema(schema)
            .parquet(ls.map(l => s"$tableDir/$l"): _*)
          if (needPos)
            // label → partitionSeq / DV lookups key on (label, position
            // within file), both from the hidden _metadata column
            s.withColumn("__label",
                labelCol(spark, tableDir))
              .withColumn("__pos", col("_metadata.row_index"))
          else s
        }
        val undeleted: DataFrame =
          if (dirtyL.isEmpty) scanOf(labels)
          else {
            val dv = deleteVectors(spark, base, md).get
              .select(col("label").as("__dvl"), col("pos").as("__dvp"))
            val cleaned = scanOf(dirtyL).join(dv,
              col("__label") === col("__dvl") && col("__pos") === col("__dvp"),
              "left_anti")
            if (cleanL.isEmpty) cleaned else scanOf(cleanL).unionByName(cleaned)
          }
        if (withOverlayOrder) {
          // commit-order column: label → partitionSeq via a broadcast map
          // (metadata-sized)
          import spark.implicits._
          val seqDf = broadcast(
            labels.map(l => (l, md.seqOf(l))).toDF("__label", "__seq"))
          undeleted.join(seqDf, Seq("__label")).drop("__label")
        } else if (needPos) undeleted.drop("__label", "__pos")
        else undeleted
      }

    val filtered =
      if (predicates.isEmpty) base0 else base0.filter(predicates.toColumn)
    val extras = if (withOverlayOrder) Seq("__seq", "__pos") else Nil
    val ordered = filtered.select((schema.fieldNames.toSeq ++ extras).map(c => col(s"`$c`")): _*)
    val projected =
      if (columns.isEmpty) ordered
      else {
        val missing = columns.filterNot(schema.fieldNames.contains)
        require(missing.isEmpty, s"Columns not in dataset: ${missing.mkString(",")}")
        ordered.select((columns ++ extras).map(c => col(s"`$c`")): _*)
      }
    if (dispatchBy.nonEmpty) projected.repartition(dispatchBy.map(c => col(s"`$c`")): _*)
    else projected
  }

  /** Semi-join FILE pruning — the catalog-level analog of Spark's dynamic
    * file pruning, driven by our own metadata instead of a runtime filter:
    * when the probe side's distinct keys fit `maxKeys`, collect them and
    * read with an IN predicate, so `queryLabels` prunes files through every
    * skipping layer that applies (partition keys, secondary indices, zone
    * maps, Bloom sidecars) and the residual IN filter keeps the result
    * EXACTLY the semi join. Oversized key sets fall back to a plain read +
    * broadcast-or-shuffled left_semi join — correct at any probe size, just
    * without file-level skipping.
    *
    * The classic 100 TB shape: a point-ish dimension filter (thousands of
    * keys) against a fact table with a Bloom sidecar on the join key touches
    * only the files that can contain those keys, instead of scheduling a
    * full fact scan to throw 99.99% of it away at the join.
    */
  def semiJoinRead(
      spark: SparkSession,
      base: String,
      uuid: String,
      column: String,
      keysDf: DataFrame,
      maxKeys: Int = 10000,
      columns: Seq[String] = Nil): DataFrame = {
    require(columns.isEmpty || columns.contains(column),
      s"projection must retain join column '$column'")
    val keyCol = keysDf.columns.head
    val distinctKeys = keysDf.select(col(s"`$keyCol`")).where(col(s"`$keyCol`").isNotNull).distinct()
    // cap check collects at most maxKeys+1 rows, never the whole probe side
    val keys = distinctKeys.limit(maxKeys + 1).collect().map(_.get(0)).toSeq
    if (keys.size <= maxKeys)
      readTable(spark, base, uuid, columns = columns,
        predicates = Predicates(Seq(Seq(PredLiteral(column, graft.core.PredOp.In, keys)))))
    else
      readTable(spark, base, uuid, columns = columns)
        .join(distinctKeys.withColumnRenamed(keyCol, column), Seq(column), "left_semi")
  }

  /** Iterator backend (≙ io/iter.py) — lazy per-partition pull. */
  def readTableAsIterator(
      spark: SparkSession,
      base: String,
      uuid: String,
      columns: Seq[String] = Nil,
      predicates: Predicates = Predicates.empty): Iterator[Row] = {
    import scala.jdk.CollectionConverters._
    readTable(spark, base, uuid, columns, predicates).toLocalIterator().asScala
  }

  // ------------------------------------------------------- CHECK constraints

  private val ConstraintPrefix = "graft.constraint."

  /** Registered CHECK constraints: name → boolean SQL expression. They ride
    * in `metadata`, so every commit record and snapshot carries them and
    * time travel sees the constraint set of its version.
    */
  def constraints(md: DatasetMetadata): Map[String, String] =
    md.metadata.collect {
      case (k, v) if k.startsWith(ConstraintPrefix) =>
        k.stripPrefix(ConstraintPrefix) -> v
    }

  /** Add a CHECK constraint (Delta `ALTER TABLE ADD CONSTRAINT` analog):
    * validates EXISTING data first (one scan — a constraint that current
    * rows violate is rejected with a sample), then commits the rule;
    * every subsequent [[update]]/[[merge]]/[[mergeCdc]] batch is checked
    * before any file lands, and a violating batch fails the WHOLE commit.
    * NULL results follow SQL CHECK semantics: only rows evaluating FALSE
    * violate.
    */
  def addCheckConstraint(
      spark: SparkSession, base: String, uuid: String,
      name: String, sqlExpr: String): DatasetMetadata = {
    require(name.nonEmpty && name.forall(c => c.isLetterOrDigit || c == '_'),
      s"constraint name must be [A-Za-z0-9_]+, got '$name'")
    val md = DatasetMetadata.load(spark, base, uuid)
    val existing = readTableWithMetadata(spark, base, md)
      .filter(expr(sqlExpr) <=> lit(false)).limit(3)
      .collect()
    require(existing.isEmpty,
      s"cannot add constraint '$name' ($sqlExpr): existing rows violate it, " +
        s"e.g. ${existing.take(1).mkString}")
    val md1 = md.copy(metadata = md.metadata + (s"$ConstraintPrefix$name" -> sqlExpr))
    DatasetMetadata.store(spark, base, md1, parentMd = Some(md),
      operation = "ADD CONSTRAINT")
  }

  def dropConstraint(
      spark: SparkSession, base: String, uuid: String, name: String): DatasetMetadata = {
    val md = DatasetMetadata.load(spark, base, uuid)
    require(md.metadata.contains(s"$ConstraintPrefix$name"),
      s"no constraint named '$name'")
    val md1 = md.copy(metadata = md.metadata - s"$ConstraintPrefix$name")
    DatasetMetadata.store(spark, base, md1, parentMd = Some(md),
      operation = "DROP CONSTRAINT")
  }

  /** Fail loudly if `batch` violates any registered constraint — called by
    * the mutation paths BEFORE any file is written, so a bad batch leaves
    * nothing behind. One pass per constraint over the batch only (never
    * the table); at 100 TB that's O(commit), the price of the guarantee.
    */
  private def enforceConstraints(md: DatasetMetadata, batch: DataFrame): Unit =
    constraints(md).toSeq.sortBy(_._1).foreach { case (name, sqlExpr) =>
      val bad = batch.filter(expr(sqlExpr) <=> lit(false)).limit(3).collect()
      if (bad.nonEmpty)
        throw new IllegalArgumentException(
          s"batch violates CHECK constraint '$name' ($sqlExpr): " +
            s"${bad.length}+ row(s), e.g. ${bad.take(1).mkString}")
    }

  // ------------------------------------------------- row-level deletes (DV)

  private val DvSchema = StructType(Seq(
    StructField("label", StringType, nullable = false),
    StructField("pos", LongType, nullable = false)))

  private def newDeleteFragmentName(): String =
    s"dv.${java.util.UUID.randomUUID.toString.replace("-", "").take(8)}.parquet"

  /** The union of a dataset's deletion-vector fragments as `(label, pos)`
    * rows — a row of the table is DELETED iff any fragment lists its
    * (file label, `_metadata.row_index`) pair. None when the dataset has
    * no row-level deletes (the overwhelmingly common case — reads then pay
    * nothing at all).
    */
  private[graft] def deleteVectors(
      spark: SparkSession, base: String, md: DatasetMetadata): Option[DataFrame] = {
    val frags = md.deleteFragments
    if (frags.isEmpty) None
    else Some(spark.read.schema(DvSchema)
      .parquet(frags.map(md.deletePath(base, _)): _*))
  }

  /** Per-fragment affected-label cache: fragments are immutable and
    * nonce-named, so a fragment's label set never changes — one entry per
    * fragment ever read by this JVM, LRU-bounded.
    */
  private val fragLabelCache: java.util.LinkedHashMap[String, Set[String]] =
    new java.util.LinkedHashMap[String, Set[String]](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Set[String]]): Boolean = size() > 4096
    }

  /** Labels with at least one deleted row — the file set that must pay the
    * merge-on-read anti-join. Planning must NOT cost a Spark job per read:
    * each fragment dir carries a `_labels.json` manifest (written with the
    * fragment; underscore-prefixed, so parquet scans ignore it) read with
    * one tiny FS get and cached forever (fragments are immutable).
    * Fragments lacking the manifest (older writers) fall back to a scan of
    * the fragment's label column.
    */
  /** Driver-side collection of the LIVE tombstones touching `labels`, as a
    * per-label SORTED position array — the shippable form a DSv2 reader
    * needs to apply deletion vectors per file (Delta ships per-file DV
    * bitmaps the same way). Bounded by `maxRows`: the count runs first
    * (one cheap job over the small fragment files), so an over-limit
    * dataset fails with guidance BEFORE anything is materialized on the
    * driver.
    */
  /** Per-snapshot LRU for [[collectDeleteVectors]]: fragments are immutable
    * and keyed by the commit version, so repeated plannings of the same
    * DV-bearing snapshot (a dashboard's 50 SELECTs) pay the collection
    * jobs ONCE, not per query.
    */
  private val dvCollectCache: java.util.LinkedHashMap[(String, String, Long, Set[String]), Map[String, Array[Long]]] =
    new java.util.LinkedHashMap[(String, String, Long, Set[String]), Map[String, Array[Long]]](8, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String, Long, Set[String]), Map[String, Array[Long]]]): Boolean =
        size() > 8
    }

  private[graft] def collectDeleteVectors(
      spark: SparkSession, base: String, md: DatasetMetadata,
      labels: Set[String], maxRows: Long): Map[String, Array[Long]] = {
    import spark.implicits._
    val key = (base, md.uuid, md.version, labels)
    dvCollectCache.synchronized(Option(dvCollectCache.get(key))) match {
      case Some(hit) => return hit
      case None      => ()
    }
    val dvAll = deleteVectors(spark, base, md).getOrElse(return Map.empty)
    val dv = dvAll
      .join(broadcast(labels.toSeq.toDF("label")), Seq("label"), "left_semi")
    // count-first: an over-limit dataset fails BEFORE anything
    // materializes on the driver (one cheap job over the small fragments)
    val total = dv.count()
    if (total > maxRows)
      throw new IllegalStateException(
        s"dataset '${md.uuid}' has $total pending row-level deletes (limit $maxRows " +
          "for the DSv2 scan path). Materialize them first with " +
          "Ktk.materializeDeletes / Ktk.compact, read via Ktk.readTable, or raise " +
          ".option(\"maxDvScanRows\", n)")
    val out = dv.groupBy("label").agg(collect_set("pos").as("ps"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toArray.sorted)
      .toMap
    dvCollectCache.synchronized(dvCollectCache.put(key, out))
    out
  }

  private[graft] def dirtyDeleteLabels(
      spark: SparkSession, base: String, md: DatasetMetadata): Set[String] = {
    val frags = md.deleteFragments
    if (frags.isEmpty) return Set.empty
    val fsys = DatasetMetadata.fs(spark, base)
    frags.flatMap { name =>
      val key = md.deletePath(base, name)
      val cached = fragLabelCache.synchronized(Option(fragLabelCache.get(key)))
      cached.getOrElse {
        val manifest = new Path(s"$key/$DvLabelsManifest")
        val labels: Set[String] =
          try {
            val in = fsys.open(manifest)
            val bytes = try in.readAllBytes() finally in.close()
            parseJsonStringArray(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
          } catch {
            case _: java.io.FileNotFoundException =>
              spark.read.schema(DvSchema).parquet(key)
                .select("label").distinct().collect().map(_.getString(0)).toSet
          }
        fragLabelCache.synchronized(fragLabelCache.put(key, labels))
        labels
      }
    }.toSet
  }

  private val DvLabelsManifest = "_labels.json"

  private def parseJsonStringArray(s: String): Set[String] = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.registerModule(com.fasterxml.jackson.module.scala.DefaultScalaModule)
    m.readValue(s, classOf[Array[String]]).toSet
  }

  /** The (label, pos) pairs of live rows in `candidates` matching `cond`,
    * minus pairs an existing fragment already deletes — fragments stay
    * DISJOINT, so re-running the same DELETE finds nothing and deleted-row
    * counts stay meaningful.
    */
  private def freshDeletePairs(
      spark: SparkSession, base: String, md: DatasetMetadata,
      candidates: Seq[String], cond: org.apache.spark.sql.Column): DataFrame = {
    val tableDir = md.tableDir(base)
    val hits = spark.read.option("basePath", tableDir).schema(md.schema)
      .parquet(candidates.map(l => s"$tableDir/$l"): _*)
      .filter(cond)
      .select(
        labelCol(spark, tableDir).as("label"),
        col("_metadata.row_index").as("pos"))
    deleteVectors(spark, base, md) match {
      case None     => hits
      case Some(dv) => hits.join(dv, Seq("label", "pos"), "left_anti")
    }
  }

  /** Write `pairs` as one immutable DV fragment and return its name, or
    * None when `pairs` is empty (no rows matched — callers skip the
    * commit). Files bounded by the cluster parallelism without a shuffle
    * (a DV row is ~30 bytes; even a mass delete stays small next to the
    * data it tombstones).
    */
  private def writeDeleteFragment(
      spark: SparkSession, base: String, uuid: String, pairs: DataFrame): Option[(String, Long)] = {
    val name = newDeleteFragmentName()
    val dir = s"$base/$uuid/${DatasetMetadata.DeletesDirName}"
    atomicSidecarWrite(spark, dir, name) { tmp =>
      pairs.coalesce(spark.sparkContext.defaultParallelism)
        .write.mode(SaveMode.Overwrite).parquet(tmp)
    }
    // one job gives row count AND the affected-label manifest, written
    // INSIDE the fragment dir under an underscore name (parquet scans
    // ignore it) BEFORE the metadata commit references the fragment —
    // read planning then learns the dirty file set with one FS get
    // instead of a Spark job per table read
    val fin = s"$dir/$name"
    val perLabel = spark.read.schema(DvSchema).parquet(fin)
      .groupBy("label").count().collect()
    val n = perLabel.map(_.getLong(1)).sum
    if (n == 0L) {
      DatasetMetadata.fs(spark, base).delete(new Path(fin), true)
      None
    } else {
      val labels = perLabel.map(_.getString(0))
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val fsys = DatasetMetadata.fs(spark, base)
      val out = fsys.create(new Path(s"$fin/$DvLabelsManifest"), true)
      try out.write(m.writeValueAsBytes(labels)) finally out.close()
      fragLabelCache.synchronized(fragLabelCache.put(fin, labels.toSet))
      Some(name -> n)
    }
  }

  /** Last-consumed version recorded in a consumer checkpoint; 0 when the
    * checkpoint does not exist yet (nothing consumed — keep everything).
    * Two shapes are understood, so every consumer kind can register with
    * [[garbageCollect]]'s `consumerCheckpoints` floor:
    *
    *  - a [[consumeChanges]]/[[mirrorChanges]] blob (a plain version
    *    number in one small file);
    *  - a Structured Streaming `checkpointLocation` DIRECTORY of a
    *    `graft`/`graft-cdc` stream: the floor is the offset of the batch
    *    BEFORE the newest committed one (V1 sources replay the last
    *    committed batch on restart, so its whole input range must stay
    *    readable; planned-but-uncommitted batches never advance it). The
    *    offset file's [[graft.sources.GraftOffset]] json is the commit
    *    version; the MINIMUM of the file's numeric-parseable offset lines
    *    is taken, conservative for multi-source queries.
    *
    * Corrupt contents fail loudly with recovery instructions.
    */
  def readChangeCheckpoint(spark: SparkSession, checkpointPath: String): Long = {
    val fsys = DatasetMetadata.fs(spark, checkpointPath)
    val ckpt = new Path(checkpointPath)
    val offsetsDir = new Path(ckpt, "offsets")
    val isDir =
      try fsys.getFileStatus(ckpt).isDirectory
      catch { case _: java.io.FileNotFoundException => return 0L }
    // a directory WITHOUT offsets/ is a checkpoint Spark created but has
    // not planned a batch into yet — nothing consumed
    if (isDir && !fsys.exists(offsetsDir)) return 0L
    if (isDir) {
      // batch ids are plain numbers (compaction-less OffsetSeqLog names).
      // Planned-but-uncommitted batches never advance the floor
      // (conservatively 0 while no batch has completed yet).
      def digitNames(dir: Path): Seq[Long] =
        try fsys.listStatus(dir).toSeq
          .map(_.getPath.getName).filter(n => n.nonEmpty && n.forall(_.isDigit)).map(_.toLong)
        catch { case _: java.io.FileNotFoundException => Nil }
      val batches = digitNames(offsetsDir)
      if (batches.isEmpty) return 0L
      val committed = digitNames(new Path(ckpt, "commits")).toSet
      val maxCommitted = batches.filter(committed.contains).maxOption.getOrElse(return 0L)
      // V1 sources (graft-cdc) additionally REPLAY the last committed
      // batch on restart — Spark re-calls getBatch(prevOffset, lastOffset)
      // to restore source state — so the floor is the PREVIOUS committed
      // batch's offset: versions of the replayed range must survive too.
      // (Conservative for the V2 graft source by exactly one batch.)
      val floorBatch = maxCommitted - 1
      if (floorBatch < 0 || !batches.contains(floorBatch)) return 0L
      val newest = new Path(offsetsDir, floorBatch.toString)
      val in = fsys.open(newest)
      val txt = new String(
        try in.readAllBytes() finally in.close(),
        java.nio.charset.StandardCharsets.UTF_8)
      // OffsetSeqLog: "v1" line, metadata json line, then one offset json
      // per source — graft offsets serialize as the bare version number
      val versions = txt.linesIterator.drop(2)
        .map(_.trim.stripPrefix("\"").stripSuffix("\""))
        .flatMap(l => scala.util.Try(l.toLong).toOption)
        .toSeq
      if (versions.isEmpty) throw new IllegalStateException(
        s"streaming checkpoint $ckpt carries no graft version offset in " +
          s"offsets/$floorBatch — is this a graft/graft-cdc stream's checkpoint?")
      return versions.min
    }
    try {
      val in = fsys.open(ckpt)
      val bytes = try in.readAllBytes() finally in.close()
      val txt = new String(bytes, java.nio.charset.StandardCharsets.UTF_8).trim
      try txt.toLong catch {
        case _: NumberFormatException => throw new IllegalStateException(
          s"corrupt change checkpoint $ckpt (contents: '${txt.take(64)}'). " +
            "Delete the file to replay from version 0, or write a plain " +
            "version number to resume from that version.")
      }
    } catch { case _: java.io.FileNotFoundException => 0L }
  }

  /** At-least-once incremental consumption of [[readChangeFeed]]: reads
    * the last-consumed version from a tiny checkpoint blob, hands
    * `(changes, fromVersion, toVersion]` to `f`, and advances the
    * checkpoint ONLY after `f` returns — a crash mid-`f` redelivers the
    * same range (idempotent consumers, the foreachBatch contract).
    * `maxVersionsPerPoll` bounds each batch like the streaming source's
    * admission control; loop until 0 to drain. The downstream-mirror
    * companion of the append-only stream for consumers that need the
    * DELETE side.
    */
  def consumeChanges(
      spark: SparkSession,
      base: String,
      uuid: String,
      checkpointPath: String,
      maxVersionsPerPoll: Int = 100)(f: (DataFrame, Long, Long) => Unit): Long = {
    require(maxVersionsPerPoll >= 1, "maxVersionsPerPoll must be >= 1")
    val fsys = DatasetMetadata.fs(spark, checkpointPath)
    val ckpt = new Path(checkpointPath)
    val last: Long = readChangeCheckpoint(spark, checkpointPath)
    val cur = DatasetMetadata.load(spark, base, uuid).version
    if (cur <= last) return 0L
    val to = math.min(cur, last + maxVersionsPerPoll)
    f(readChangeFeed(spark, base, uuid, last, to), last, to)
    // advance AFTER the consumer succeeded, via ATOMIC replace: a
    // delete-then-rename pair could lose the checkpoint entirely if the
    // process dies between the two calls (next poll would replay from 0,
    // or fail outright once early versions are gc'd)
    val tmp = new Path(ckpt.getParent, s".${ckpt.getName}.tmp")
    val out = fsys.create(tmp, true)
    try out.write(to.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    DatasetMetadata.atomicReplace(spark, fsys, tmp, ckpt)
    to - last
  }

  /** Fragment-count ceiling: past it, a delete/merge commit folds ALL
    * fragments (old ∪ new) into ONE canonical fragment in the same commit
    * — a sidecar-only rewrite of O(live tombstones), no data movement —
    * so a long run of small deletes cannot make every read union an
    * unbounded fragment list (the deletion-vector twin of
    * `maxSidecarFragments`). Rows for labels no longer referenced are
    * dropped while folding.
    */
  val MaxDeleteFragments = 64

  private def fragmentsToCommit(
      spark: SparkSession, base: String, md: DatasetMetadata,
      withNew: Seq[String], cap: Int): Seq[String] = {
    if (withNew.size <= cap) return withNew
    import spark.implicits._
    val dv = spark.read.schema(DvSchema)
      .parquet(withNew.map(md.deletePath(base, _)): _*)
    val live = dv.join(
      broadcast(md.partitions.keys.toSeq.toDF("label")), Seq("label"), "left_semi")
    writeDeleteFragment(spark, base, md.uuid, live).map(_._1).toSeq
  }

  /** Row-level DELETE (Delta/Iceberg merge-on-read): mark every live row
    * matching the predicate deleted by committing ONE immutable
    * deletion-vector fragment of `(file label, row position)` pairs — NO
    * data file is rewritten, so a GDPR-style delete of a few rows from a
    * 100 TB dataset costs one scan of the files that can match (pruned
    * through partition keys / indices / zone maps / Bloom sidecars for DNF
    * `predicates`; `filterQuery` takes arbitrary Spark SQL but scans all
    * files) plus a tombstone write O(#matched rows). Reads apply the
    * vectors as a (label, pos) anti-join on exactly the touched files;
    * [[compact]], [[clusterZOrder]] and [[materializeDeletes]] drop the
    * rows physically and shed the fragments.
    *
    * DELETES ARE PHYSICAL-ROW OPERATIONS: on an overlay (keep-last cube)
    * dataset the predicate marks matching rows in EVERY commit, shadowed
    * ones included; a shadowed row that does NOT match a predicate its
    * shadowing winner matches will resurface. Plain (non-overlay) datasets
    * — every `Ktk.store`/`update` table — have no shadowing and no such
    * subtlety.
    *
    * Returns the committed metadata and the number of rows deleted; a
    * predicate matching nothing commits nothing and returns (current, 0).
    */
  def deleteRows(
      spark: SparkSession,
      base: String,
      uuid: String,
      predicates: Predicates = Predicates.empty,
      filterQuery: Option[String] = None,
      maxFragments: Int = MaxDeleteFragments): (DatasetMetadata, Long) = {
    require(predicates.isEmpty ^ filterQuery.isEmpty,
      "deleteRows takes exactly one of predicates / filterQuery")
    val md = DatasetMetadata.load(spark, base, uuid)
    if (md.partitions.isEmpty) return (md, 0L)
    val candidates =
      if (predicates.isEmpty) md.partitions.keys.toSeq.sorted
      else queryLabels(spark, base, md, predicates)
    if (candidates.isEmpty) return (md, 0L)
    val cond = filterQuery.map(expr).getOrElse(predicates.toColumn)
    writeDeleteFragment(spark, base, uuid,
        freshDeletePairs(spark, base, md, candidates, cond)) match {
      case None => (md, 0L)
      case Some((name, n)) =>
        val md1 = md.copy(deletes = fragmentsToCommit(spark, base, md,
          md.deleteFragments :+ name, maxFragments))
        (DatasetMetadata.store(spark, base, md1, parentMd = Some(md),
      operation = "DELETE"), n)
    }
  }

  /** Row-level UPDATE (merge-on-read, the SQL `UPDATE t SET ... WHERE ...`
    * shape Delta/Iceberg expose): every live row matching the predicate is
    * tombstoned (one DV fragment, [[deleteRows]] mechanics) and re-appended
    * with the `set` expressions applied — ONE atomic commit, ZERO rewrites
    * of untouched rows, so updating a few rows of a 100 TB dataset costs a
    * pruned scan of the files that can match plus O(matched rows) of
    * tombstone + new-file bytes. `set` values are Columns and may reference
    * the row's OLD values (`col("v") * 2`); each is cast to the column's
    * declared type. Updating a partition column moves rows to their new
    * directory through the normal dynamic-partition write. CHECK
    * constraints gate the UPDATED rows before any side effect. The matched
    * set is persisted (memory-and-disk) so the scan runs once for both the
    * tombstone and the rewrite sides.
    *
    * Returns the committed metadata and the number of rows updated; a
    * predicate matching nothing commits nothing.
    */
  def updateRows(
      spark: SparkSession,
      base: String,
      uuid: String,
      set: Map[String, Column],
      predicates: Predicates = Predicates.empty,
      filterQuery: Option[String] = None,
      maxFragments: Int = MaxDeleteFragments,
      conditionCol: Option[Column] = None): (DatasetMetadata, Long) = {
    require(set.nonEmpty, "updateRows requires at least one SET column")
    require(Seq(!predicates.isEmpty, filterQuery.nonEmpty, conditionCol.nonEmpty)
        .count(x => x) == 1,
      "updateRows takes exactly one of predicates / filterQuery / conditionCol")
    val md = DatasetMetadata.load(spark, base, uuid)
    val schema = md.schema
    set.keys.foreach(c => require(schema.fieldNames.contains(c),
      s"SET column '$c' not in dataset schema"))
    if (md.partitions.isEmpty) return (md, 0L)
    val candidates =
      if (predicates.isEmpty) md.partitions.keys.toSeq.sorted
      else queryLabels(spark, base, md, predicates)
    lastUpdateCandidates.set(candidates.size)
    if (candidates.isEmpty) return (md, 0L)
    val cond = conditionCol.orElse(filterQuery.map(expr)).getOrElse(predicates.toColumn)
    val tableDir = md.tableDir(base)
    // one scan feeds BOTH sides: (label, pos) tombstones + rows to rewrite
    val matched = spark.read.option("basePath", tableDir).schema(schema)
      .parquet(candidates.map(l => s"$tableDir/$l"): _*)
      .filter(cond)
      .withColumn("__label",
        labelCol(spark, tableDir))
      .withColumn("__pos", col("_metadata.row_index"))
    val live = (deleteVectors(spark, base, md) match {
      case None => matched
      case Some(dv) =>
        val d = dv.select(col("label").as("__dvl"), col("pos").as("__dvp"))
        matched.join(d,
          col("__label") === col("__dvl") && col("__pos") === col("__dvp"), "left_anti")
    }).select((schema.fieldNames.toSeq ++ Seq("__label", "__pos")).map(c => col(s"`$c`")): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val updated = live.select(schema.fields.toSeq.map { f =>
        set.get(f.name).map(_.cast(f.dataType).as(f.name))
          .getOrElse(col(s"`${f.name}`"))
      }: _*)
      val normalized = SchemaUtil.normalize(updated, md.partitionKeys)
      // constraints gate the batch before ANY side effect
      enforceConstraints(md, normalized)
      val fragment: Option[(String, Long)] = writeDeleteFragment(spark, base, uuid,
        live.select(col("__label").as("label"), col("__pos").as("pos")))
      if (fragment.isEmpty) return (md, 0L)
      val newFiles: Seq[(String, Long)] = ManifestCommitProtocol.collecting(spark) {
        val writer = normalized.write.mode(SaveMode.Append)
        (if (md.partitionKeys.nonEmpty) writer.partitionBy(md.partitionKeys: _*) else writer)
          .parquet(tableDir)
      }
      val newLabels = newFiles.map(_._1).toSet
      if (newLabels.exists(_.contains("__HIVE_DEFAULT_PARTITION__")))
        throw new IllegalArgumentException("null values in partition columns are not allowed")
      val nextSeq = nextMonotoneSeq(md)
      val finalPartitions = md.partitions.keys.map(l => l -> md.sizeOf(l)).toMap ++ newFiles
      val finalSeq = finalPartitions.keys.map { l =>
        l -> (if (newLabels.contains(l)) nextSeq else md.seqOf(l))
      }.toMap
      val survivors = md.partitions.keys.toSeq
      val idxReg = mergeIndicesIncremental(spark, base, md, tableDir,
        survivingOld = survivors, newLabels = newLabels.toSeq)
      val bloomReg = mergeBloomsIncremental(spark, base, md, tableDir,
        survivingOld = survivors, newLabels = newLabels.toSeq)
      val zoneReg = mergeZonesIncremental(spark, base, md, tableDir,
        survivingOld = survivors, newLabels = newLabels.toSeq)
      val md1 = md.copy(partitions = finalPartitions, partitionSeq = finalSeq,
        indices = idxReg, blooms = bloomReg, zones = zoneReg,
        deletes = fragmentsToCommit(spark, base, md,
          md.deleteFragments ++ fragment.map(_._1), maxFragments),
        metadata = md.metadata +
          (DatasetMetadata.SeqHwmKey -> nextSeq.toString))
      (DatasetMetadata.store(spark, base, md1, parentMd = Some(md),
      operation = "UPDATE"), fragment.get._2)
    } finally live.unpersist()
  }

  /** MERGE (upsert): every live target row whose `keys` match a source row
    * is replaced by the source's rows; source rows with unmatched keys are
    * inserted. One atomic commit, ZERO data-file rewrites — the matched
    * target rows become a deletion-vector fragment (merge-on-read, see
    * [[deleteRows]]) and the source appends as new files, so a continuous
    * upsert feed pays O(batch) per merge regardless of target size. Source
    * multiplicity is preserved: N source rows sharing a key all land (the
    * matched target rows are deleted once).
    *
    * Matched-row discovery prunes through every skipping layer when the
    * source's distinct key tuples fit `maxCollectKeys` (single-key sources
    * also push an IN filter into the parquet scan — the [[semiJoinRead]]
    * pattern); larger sources prune through their per-key-column min/max
    * RANGE envelope (partition values + zone maps + row-group stats — one
    * map-side agg over the batch), so a clustered wide-key CDC batch never
    * scans the whole table; the semi join keeps either path exact.
    *
    * `deleteKeys` (columns in `keys` order) adds WHEN MATCHED THEN DELETE
    * keys: their matches tombstone without any row landing — the CDC
    * delete-marker path ([[mergeCdc]]).
    *
    * Returns the committed metadata and the number of target rows replaced.
    */
  def merge(
      spark: SparkSession,
      base: String,
      uuid: String,
      source: DataFrame,
      keys: Seq[String],
      maxCollectKeys: Int = 10000,
      extraMetadata: Map[String, String] = Map.empty,
      deleteKeys: Option[DataFrame] = None,
      evolveSchema: Boolean = false): (DatasetMetadata, Long) = {
    require(keys.nonEmpty, "merge requires at least one key column")
    lastMergeCandidates.set(-1)
    val md = DatasetMetadata.load(spark, base, uuid)
    val schema = md.schema
    keys.foreach(k => require(schema.fieldNames.contains(k),
      s"merge key '$k' not in dataset schema"))
    // additive evolution mirrors update(): new source columns append as
    // nullable (old files read null); the upstream-ALTER-TABLE case of a
    // CDC mirror. Registered sidecar columns must still arrive.
    val evolvedSchema: StructType =
      if (evolveSchema) {
        val cand = SchemaUtil.normalizeSchema(source.schema, md.partitionKeys)
        val sidecarCols = md.indices.keySet ++ md.bloomRegistry.keySet ++ md.zoneColumns
        val absent = sidecarCols.filterNot(cand.fieldNames.contains).toSeq.sorted
        require(absent.isEmpty,
          s"evolveSchema merge must still carry the registered index/bloom/zone " +
            s"column(s): ${absent.mkString(", ")}")
        SchemaUtil.evolveSchemas(schema, cand)
      } else {
        SchemaUtil.validateCompatible(schema,
          SchemaUtil.normalizeSchema(source.schema, md.partitionKeys))
        schema
      }
    val tableDir = md.tableDir(base)
    // CHECK constraints gate the batch before ANY side effect (even the
    // tombstone fragment) — a violating batch leaves nothing behind
    val normalized = SchemaUtil.normalize(source, md.partitionKeys)
    enforceConstraints(md, normalized)

    // 1. matched target rows → one DV fragment. Collectable key sets prune
    //    files through queryLabels (partition / index / zone / bloom); the
    //    residual semi join keeps the result exact either way. `deleteKeys`
    //    (CDC delete markers) tombstone matches WITHOUT contributing rows —
    //    a delete of an absent key is a no-op, like SQL MERGE's
    //    WHEN MATCHED THEN DELETE.
    val srcKeys = deleteKeys.map(_.toDF(keys: _*))
      .foldLeft(source.select(keys.map(c => col(s"`$c`")): _*))(_ unionByName _)
      .distinct()
    val collected: Option[Seq[Row]] = {
      val rows = srcKeys.limit(maxCollectKeys + 1).collect().toSeq
      if (rows.size <= maxCollectKeys) Some(rows) else None
    }
    // large source (distinct keys exceed maxCollectKeys): ONE map-side
    // min/max agg over the batch keys gives a per-column RANGE envelope.
    // The Ge/Le conjunction still prunes through partition values, the
    // secondary index (its lookup evaluates the range with SPARK
    // expressions over the index table, so it stays exact) and zone
    // maps; bloom is the only IN/Eq-gated layer that passes ranges
    // through. So a time- or id-clustered wide-key CDC batch
    // scans only the files whose stats intersect the batch envelope, not
    // the whole table; the residual semi join keeps the result exact.
    // Only types whose Spark min/max ORDER provably agrees with the
    // pruning comparator's order contribute bounds. Numerics are safe:
    // `Predicates.toDouble` is MONOTONE, so a strict less-than in double
    // implies a true less-than — pruning never drops a file wrongly (it
    // can only keep extra near 2^53, the conservative direction).
    // Date/Timestamp compare chronologically on both sides (the existing
    // user-predicate path). STRING bounds take a DEDICATED pruning pass
    // ([[stringEnvelopeCandidates]]) that evaluates ONLY under Spark's
    // UTF8-binary order — the general driver-side comparator is Java
    // String.compareTo (UTF-16 code units), which diverges on
    // supplementary characters (emoji in text keys), and the legacy
    // inline-zone comparator additionally coerces numeric-parseable
    // strings per PAIR (non-transitive); an envelope that is not an
    // interval under the pruning order could drop a file holding a
    // matching key and its row would silently survive the merge. So
    // string envelopes probe partition values as UTF-8 BYTES on the
    // driver (byte-identical to Spark's order), and the index/zone
    // sidecars with Spark expressions only; legacy inline zone maps are
    // fenced off from string bounds entirely. This matters because LLM
    // pipelines key on STRING doc ids — the flagship use case must not
    // fall back to a full candidate scan.
    // Arrays/binary/structs contribute no bounds. A null min
    // means the column held ONLY nulls, which matches nothing (MERGE ON
    // `=` is null-rejecting).
    lazy val keyBounds: Seq[(String, Any, Any)] = {
      val aggExprs = keys.flatMap(k =>
        Seq(min(col(s"`$k`")).as(s"__lo_$k"), max(col(s"`$k`")).as(s"__hi_$k")))
      val row = srcKeys.agg(aggExprs.head, aggExprs.drop(1): _*).collect()(0)
      keys.zipWithIndex.map { case (k, i) => (k, row.get(2 * i), row.get(2 * i + 1)) }
    }
    def comparableBound(v: Any): Boolean = v match {
      case _: Number | _: Boolean => true
      case _: java.sql.Date | _: java.sql.Timestamp => true
      case _ => false
    }
    // Spark equality (the residual semi join) treats -0.0 = 0.0, but the
    // driver-side pruning comparator is Double.compare, which orders
    // -0.0 < 0.0. Widen float/double bounds at the signed-zero boundary
    // so an envelope of [0.0, x] also admits files whose only matching
    // key is -0.0 (and vice versa) — otherwise the matched row survives
    // un-tombstoned and the merge inserts a duplicate key.
    def widenLo(v: Any): Any = v match {
      case d: java.lang.Double if d.doubleValue == 0.0 => java.lang.Double.valueOf(-0.0)
      case f: java.lang.Float if f.floatValue == 0.0f => java.lang.Float.valueOf(-0.0f)
      case other => other
    }
    def widenHi(v: Any): Any = v match {
      case d: java.lang.Double if d.doubleValue == 0.0 => java.lang.Double.valueOf(0.0)
      case f: java.lang.Float if f.floatValue == 0.0f => java.lang.Float.valueOf(0.0f)
      case other => other
    }
    val fragment: Option[(String, Long)] =
      if (md.partitions.isEmpty) None
      else {
        // collectable key sets prune PER KEY COLUMN: a conjunction of
        // per-column IN predicates runs through the full pruning ladder
        // (partition values / index / zone maps / bloom), so a clustered
        // multi-column CDC batch touches only the files whose stats
        // intersect EVERY key column's value set — a superset of the
        // exact struct match (the residual semi join below keeps it
        // exact), never the whole table. A key column that collected
        // only nulls can match no row (MERGE ON `=` is null-rejecting).
        val perColVals: Option[Seq[(String, Seq[Any])]] = collected.map { rows =>
          keys.zipWithIndex.map { case (k, i) =>
            k -> rows.map(_.get(i)).filter(_ != null).distinct
          }
        }
        val candidates = perColVals match {
          case Some(cols) =>
            if (cols.exists(_._2.isEmpty)) Nil
            else queryLabels(spark, base, md, Predicates(Seq(
              cols.map { case (k, vs) => PredLiteral(k, graft.core.PredOp.In, vs) })))
          case None =>
            if (keyBounds.exists(_._2 == null)) Nil
            else {
              val rangeLits = keyBounds.flatMap {
                case (k, lo, hi) if comparableBound(lo) && comparableBound(hi) =>
                  Seq(PredLiteral(k, graft.core.PredOp.Ge, widenLo(lo)),
                    PredLiteral(k, graft.core.PredOp.Le, widenHi(hi)))
                case _ => Nil
              }
              val stringBounds = keyBounds.collect {
                case (k, lo: String, hi: String) => (k, lo, hi)
              }
              val cands0 =
                if (rangeLits.isEmpty) md.partitions.keys.toSeq.sorted
                else queryLabels(spark, base, md, Predicates(Seq(rangeLits)))
              if (stringBounds.isEmpty) cands0
              else stringEnvelopeCandidates(spark, base, md, cands0, stringBounds)
            }
        }
        lastMergeCandidates.set(candidates.size)
        if (candidates.isEmpty) None
        else {
          val scan0 = spark.read.option("basePath", tableDir).schema(schema)
            .parquet(candidates.map(l => s"$tableDir/$l"): _*)
          // collected keys: also push the per-column INs into row-group
          // pruning (conjunction is a superset of the struct match);
          // large sources push their range envelope the same way
          val scan = perColVals match {
            case Some(cols) =>
              cols.foldLeft(scan0) { case (s, (k, vs)) =>
                s.filter(col(s"`$k`").isin(vs: _*))
              }
            case None =>
              // string bounds push too: Spark evaluates `>=`/`<=` on
              // strings under the same UTF8-binary order min/max used,
              // and parquet row-group stats prune binary-exact
              keyBounds.foldLeft(scan0) {
                case (s, (k, lo, hi)) if comparableBound(lo) && comparableBound(hi) =>
                  s.filter(col(s"`$k`") >= lit(lo) && col(s"`$k`") <= lit(hi))
                case (s, (k, lo: String, hi: String)) =>
                  s.filter(col(s"`$k`") >= lit(lo) && col(s"`$k`") <= lit(hi))
                case (s, _) => s
              }
          }
          // SQL MERGE ON semantics: `=` matching, null keys never match
          val probe = if (collected.isDefined) broadcast(srcKeys) else srcKeys
          val hits = scan
            .join(probe, keys.map(k => scan(k) === probe(k)).reduce(_ && _), "left_semi")
            .select(
              labelCol(spark, tableDir).as("label"),
              col("_metadata.row_index").as("pos"))
          val fresh = deleteVectors(spark, base, md) match {
            case None     => hits
            case Some(dv) => hits.join(dv, Seq("label", "pos"), "left_anti")
          }
          writeDeleteFragment(spark, base, uuid, fresh)
        }
      }

    // 2. append the source as new files (the update() write path)
    val newFiles: Seq[(String, Long)] = ManifestCommitProtocol.collecting(spark) {
      val writer = normalized.write.mode(SaveMode.Append)
      (if (md.partitionKeys.nonEmpty) writer.partitionBy(md.partitionKeys: _*) else writer)
        .parquet(tableDir)
    }
    val newLabels = newFiles.map(_._1).toSet
    if (newLabels.exists(_.contains("__HIVE_DEFAULT_PARTITION__")))
      throw new IllegalArgumentException("null values in partition columns are not allowed")
    val nextSeq = nextMonotoneSeq(md)
    val finalPartitions = md.partitions.keys.map(l => l -> md.sizeOf(l)).toMap ++ newFiles
    val finalSeq = finalPartitions.keys.map { l =>
      l -> (if (newLabels.contains(l)) nextSeq else md.seqOf(l))
    }.toMap
    val survivors = md.partitions.keys.toSeq
    val idxReg = mergeIndicesIncremental(spark, base, md, tableDir,
      survivingOld = survivors, newLabels = newLabels.toSeq)
    val bloomReg = mergeBloomsIncremental(spark, base, md, tableDir,
      survivingOld = survivors, newLabels = newLabels.toSeq)
    val zoneReg = mergeZonesIncremental(spark, base, md, tableDir,
      survivingOld = survivors, newLabels = newLabels.toSeq)
    val md1 = md.copy(partitions = finalPartitions, partitionSeq = finalSeq,
      schemaJson = evolvedSchema.json,
      indices = idxReg, blooms = bloomReg, zones = zoneReg,
      deletes = fragmentsToCommit(spark, base, md,
        md.deleteFragments ++ fragment.map(_._1), MaxDeleteFragments),
      metadata = md.metadata ++ extraMetadata +
        (DatasetMetadata.SeqHwmKey -> nextSeq.toString))
    (DatasetMetadata.store(spark, base, md1, parentMd = Some(md),
      operation = "MERGE"),
      fragment.map(_._2).getOrElse(0L))
  }

  /** Batch CDC reader (Delta CHANGE DATA FEED analog): every row-level
    * change committed in `(fromVersion, toVersion]`, with
    * `_change_type` ('insert' | 'delete') and `_commit_version` columns
    * appended to the table schema. Complements the append-only streaming
    * change feed with the DELETE side deletion vectors made precise:
    *
    *  - INSERTS: labels a commit added with a NEW sequence number (same
    *    rewrite-vs-append discrimination as the streaming source — compact
    *    / z-order / materializeDeletes re-adds carry their victims' seq and
    *    stay SILENT).
    *  - DELETES: (a) deletion-vector fragments the commit added, joined
    *    back to their data files — exactly the tombstoned rows; (b) labels
    *    the commit removed with NO same-seq re-add (a delete_scope), minus
    *    rows already dead at the parent version.
    *
    * Work per version is O(that commit's changed rows); snapshots resolve
    * through the cached delta log. Needs the range's snapshots AND the
    * referenced files/fragments still present — run gc with
    * `retainVersions` covering the consumer's lag, like the stream.
    * Limitations (documented, not silent): a `rollback` restores content
    * by re-adding OLD-seq labels, which the feed reports only on the
    * remove side — re-sync after rollbacks; intra-commit insert+delete of
    * the same row (no current writer produces one) would emit both.
    */
  /** One version's CDF plan — everything [[readChangeFeed]]'s DataFrame
    * construction needs, derived either from driver snapshots (small
    * ranges) or from the distributed record scan (deep ranges), so the
    * emit code cannot diverge between modes. `parentFilter` restricts a
    * new fragment's labels to files that exist at the parent version.
    */
  private final case class CdfVersionPlan(
      freshAdds: Seq[String],
      newFrags: Seq[String],
      parentFrags: Seq[String],
      gone: Seq[String],
      parentFilter: Seq[String] => Seq[String])

  def readChangeFeed(
      spark: SparkSession,
      base: String,
      uuid: String,
      fromVersion: Long,
      toVersion: Long = -1L,
      diffThreshold: Int = SessionDiffThreshold): DataFrame = {
    val cur = DatasetMetadata.load(spark, base, uuid)
    val to = if (toVersion < 0) cur.version else toVersion
    require(fromVersion <= to,
      s"empty change range: fromVersion=$fromVersion > toVersion=$to")
    val schema = cur.schema
    val tableDir = cur.tableDir(base)
    def emptyChanges: DataFrame =
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
        .withColumn("_change_type", lit(""))
        .withColumn("_commit_version", lit(0L))
    // Always read with the CURRENT schema: additive evolution guarantees
    // files from pre-evolution versions surface the new columns as null,
    // so a feed range spanning an evolveSchema commit projects cleanly
    // (reading with each version's own schema would leave the final
    // current-schema projection unresolved).
    def scanLabels(ls: Seq[String], withPos: Boolean): DataFrame = {
      val s = spark.read.option("basePath", tableDir).schema(schema)
        .parquet(ls.map(l => s"$tableDir/$l"): _*)
      if (withPos)
        s.withColumn("__label",
            labelCol(spark, tableDir))
          .withColumn("__pos", col("_metadata.row_index"))
      else s
    }
    def project(df: DataFrame, ct: String, v: Long): DataFrame =
      df.select(schema.fieldNames.map(c => col(s"`$c`")): _*)
        .withColumn("_change_type", lit(ct))
        .withColumn("_commit_version", lit(v))
    def hwmOf(md: DatasetMetadata): Long = math.max(
      md.metadata.get(DatasetMetadata.SeqHwmKey).map(_.toLong).getOrElse(0L),
      (0L +: md.partitions.keys.toSeq.map(md.seqOf)).max)
    def readFrags(frags: Seq[String]): DataFrame =
      spark.read.schema(DvSchema)
        .parquet(frags.map(n =>
          s"$base/$uuid/${DatasetMetadata.DeletesDirName}/$n"): _*)

    // per-version plan, driver snapshots (the exact legacy walk)
    def driverPlan(v: Long): CdfVersionPlan = {
      val mdV = DatasetMetadata.loadVersion(spark, base, uuid, v)
      // fromVersion = 0 reads the initial commit against an empty parent —
      // the whole v1 content arrives as inserts (bootstrap semantics)
      val mdP =
        if (v == 1L) DatasetMetadata(uuid = uuid, schemaJson = mdV.schemaJson)
        else DatasetMetadata.loadVersion(spark, base, uuid, v - 1)
      // bootstrap: the initial commit's labels legitimately carry seq 0 —
      // same sentinel the streaming source uses for its first batch
      val hwm = if (v == 1L) Long.MinValue else hwmOf(mdP)
      val added = mdV.partitions.keySet -- mdP.partitions.keySet
      val removed = mdP.partitions.keySet -- mdV.partitions.keySet
      val rewrittenSeqs = added.filter(l => mdV.seqOf(l) <= hwm).map(mdV.seqOf)
      CdfVersionPlan(
        freshAdds = added.filter(l => mdV.seqOf(l) > hwm).toSeq.sorted,
        newFrags = mdV.deleteFragments.filterNot(mdP.deleteFragments.toSet),
        parentFrags = mdP.deleteFragments,
        gone = removed.filter(l => !rewrittenSeqs.contains(mdP.seqOf(l))).toSeq.sorted,
        parentFilter = ls => ls.filter(mdP.partitions.keySet.contains))
    }

    // deep-range mode: the SAME plans reconstructed from the distributed
    // commit-record scan — label add/remove events via per-label lag/lead
    // over the per-version presence rows (seqs ride along), hwm and
    // fragment lists from each version's own record. The driver collects
    // O(changed labels in range), never a snapshot.
    def distributedPlans(recordSizes: Map[String, Long])
        : (Map[Long, CdfVersionPlan], () => Unit) = {
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      val targets = (math.max(1L, fromVersion) to to).toSeq
      val recordNames = recordSizes.keySet
      targets.find(v => !recordNames.contains(f"v$v%08d.json") &&
          !recordNames.contains(f"v$v%08d.delta.json")).foreach { v =>
        throw new NoSuchElementException(
          s"Dataset '$uuid' has no version $v (vacuumed by gc, or never " +
            s"committed); available: " +
            DatasetMetadata.listVersions(spark, base, uuid).mkString(","))
      }
      val (chainStarts, broken) =
        resolveChains(spark, base, uuid, targets, recordNames)
      broken.headOption.foreach { case (v, gap) =>
        throw new NoSuchElementException(
          s"Dataset '$uuid': version $v is unreachable — commit record $gap " +
            "of its replay chain is missing; the change feed cannot replay " +
            "it (run fsck)")
      }
      val scan = new CommitRecordScan(spark, base, uuid, chainStarts,
        hasFullIn(recordNames))
      val pres = scan.perVersionLabels
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val w = Window.partitionBy("label").orderBy("version")
      val flagged = pres
        .withColumn("prevV", lag("version", 1).over(w))
        .withColumn("nextV", lead("version", 1).over(w))
      val addEvents = flagged
        .filter(col("version") > fromVersion &&
          (col("prevV").isNull || col("prevV") =!= col("version") - 1))
        .select("version", "label", "seq").as[(Long, String, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq).toMap
      // a presence row at p with no row at p+1 = removed at p+1; the row's
      // seq IS the parent-side seq the rewrite check needs
      val removeEvents = flagged
        .filter((col("nextV").isNull || col("nextV") =!= col("version") + 1) &&
          col("version") < lit(to))
        .select((col("version") + 1).as("v"), col("label"), col("seq"))
        .as[(Long, String, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq).toMap
      val maxSeq = pres.groupBy("version").agg(max("seq"))
        .as[(Long, Long)].collect().toMap
      val hwmMeta = scan.recRows.filter(col("kind") === "meta_hwm")
        .select("rv", "name").as[(Long, String)].collect()
        .map { case (v, s) => v -> s.toLong }.toMap
      def hwmAt(v: Long): Long =
        math.max(hwmMeta.getOrElse(v, 0L), math.max(0L, maxSeq.getOrElse(v, 0L)))
      val fragsByV = scan.recRows.filter(col("kind") === "missing_dv_fragment")
        .select("rv", "name").as[(Long, String)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
      val plans = (fromVersion + 1 to to).map { v =>
        val hwm = if (v == 1L) Long.MinValue else hwmAt(v - 1)
        val adds = addEvents.getOrElse(v, Nil)
        val rewritten = adds.collect { case (_, s) if s <= hwm => s }.toSet
        val parentFrags = if (v == 1L) Nil else fragsByV.getOrElse(v - 1, Nil)
        val parentFragSet = parentFrags.toSet
        v -> CdfVersionPlan(
          freshAdds = adds.collect { case (l, s) if s > hwm => l }.sorted,
          newFrags = fragsByV.getOrElse(v, Nil).filterNot(parentFragSet),
          parentFrags = parentFrags,
          gone = removeEvents.getOrElse(v, Nil)
            .collect { case (l, s) if !rewritten.contains(s) => l }.sorted,
          parentFilter = ls =>
            if (v == 1L || ls.isEmpty) Nil
            else ls.toDF("label")
              .join(pres.filter(col("version") === v - 1), Seq("label"), "left_semi")
              .as[String].collect().toSeq)
      }.toMap
      (plans, () => { pres.unpersist(blocking = false); scan.close() })
    }

    val fsys = DatasetMetadata.fs(spark, base)
    val recordSizes = versionRecordSizes(spark, fsys, base, uuid)
    val estimated = estimatePairs(cur.partitions.size.toLong,
      (to - fromVersion).toInt + 1, recordSizes)
    val threshold = auditThreshold(spark, diffThreshold)
    val distributed = estimated > threshold && to > fromVersion
    lastAuditDistributed.set(distributed)
    val (planOf: (Long => CdfVersionPlan), closePlans: (() => Unit)) =
      if (!distributed) ((v: Long) => driverPlan(v), () => ())
      else { val (m, c) = distributedPlans(recordSizes); ((v: Long) => m(v), c) }

    val perVersion: Seq[DataFrame] = try {
      (fromVersion + 1 to to).flatMap { v =>
        val plan = planOf(v)
        val inserts: Option[DataFrame] =
          if (plan.freshAdds.isEmpty) None
          else Some(project(scanLabels(plan.freshAdds, withPos = false), "insert", v))
        // (a) tombstones this commit added — the fragment IS the row list.
        // Pairs already dead at the parent are excluded: a fragment-count
        // canonicalization folds ALL history into one "new" fragment, and
        // without the anti-join it would re-emit every old delete.
        val dvDeletes: Option[DataFrame] =
          if (plan.newFrags.isEmpty) None
          else {
            val dvNew = readFrags(plan.newFrags)
            val fresh =
              if (plan.parentFrags.isEmpty) dvNew
              else dvNew.join(readFrags(plan.parentFrags),
                Seq("label", "pos"), "left_anti")
            val dv = fresh.select(col("label").as("__dvl"), col("pos").as("__dvp"))
            val labels = plan.parentFilter(
              dv.select("__dvl").distinct().collect().map(_.getString(0)).toSeq)
              .sorted
            if (labels.isEmpty) None
            else Some(project(
              scanLabels(labels, withPos = true)
                .join(dv, col("__label") === col("__dvl") && col("__pos") === col("__dvp"),
                  "left_semi"),
              "delete", v))
          }
        // (b) delete_scope: removed labels with no same-seq rewrite; rows
        // already tombstoned at the parent don't die twice
        val scopeDeletes: Option[DataFrame] =
          if (plan.gone.isEmpty) None
          else {
            val raw = scanLabels(plan.gone, withPos = true)
            val live =
              if (plan.parentFrags.isEmpty) raw
              else {
                val dv = readFrags(plan.parentFrags)
                  .select(col("label").as("__dvl"), col("pos").as("__dvp"))
                raw.join(dv,
                  col("__label") === col("__dvl") && col("__pos") === col("__dvp"),
                  "left_anti")
              }
            Some(project(live, "delete", v))
          }
        Seq(inserts, dvDeletes, scopeDeletes).flatten
      }
    } finally closePlans()
    // BALANCED union tree: a left-deep unionByName chain re-analyzes a
    // growing plan per link (quadratic in the version count); grouping
    // keeps analysis O(n log n), so wide ranges (100+ versions) plan flat.
    // (consumeChanges bounds ranges anyway — this covers the direct API.)
    def unionBalanced(dfs: Seq[DataFrame]): DataFrame =
      if (dfs.size <= 8) dfs.reduce(_ unionByName _)
      // recurse on the group results too — reducing them left-deep would
      // reintroduce the quadratic chain one level up
      else unionBalanced(dfs.grouped(8).map(unionBalanced).toSeq)
    if (perVersion.isEmpty) emptyChanges else unionBalanced(perVersion)
  }

  /** Commit history as a DataFrame (`DESCRIBE HISTORY` analog): one row
    * per surviving version with file/byte/tombstone counts, the commit
    * record's filesystem mtime as `committed_at`, and rollback
    * attribution from the commit markers. O(retained versions) metadata
    * loads through the snapshot cache plus ONE `_versions` listing —
    * never touches data.
    */
  def history(spark: SparkSession, base: String, uuid: String,
      diffThreshold: Int = SessionDiffThreshold): DataFrame = {
    import spark.implicits._
    // ONE listing feeds both the version list and the mtimes; filename
    // parsing stays in DatasetMetadata (single source of truth). A version
    // with several records (e.g. a delta plus a later checkpoint of the
    // same commit line) reports the EARLIEST mtime — the original commit.
    val records = DatasetMetadata.versionRecords(spark, base, uuid)
    val mtimes: Map[Long, Long] = records.groupMapReduce(_._1)(_._2)(math.min)
    // past the same estimated-pairs threshold fsck/gc use, per-version
    // metrics reconstruct from the distributed commit-record scan instead
    // of loading every snapshot through the driver cache — DESCRIBE
    // HISTORY on a million-version table stays O(versions) driver rows
    val fsys = DatasetMetadata.fs(spark, base)
    val recordSizes = versionRecordSizes(spark, fsys, base, uuid)
    val curLabels = DatasetMetadata.load(spark, base, uuid).partitions.size.toLong
    val allVersions = records.map(_._1).distinct.sorted
    val estimated = estimatePairs(curLabels, allVersions.size, recordSizes)
    val threshold = auditThreshold(spark, diffThreshold)
    lastAuditDistributed.set(estimated > threshold)
    if (estimated > threshold)
      return historyDistributed(spark, base, uuid, allVersions, mtimes,
        recordSizes.keySet)
    // per-commit metrics diff against the PREVIOUS RETAINED version (the
    // ascending walk already loads it). The earliest retained version
    // after a gc has an unknown parent — its metrics report null rather
    // than claiming the whole content was added there.
    var prev: Option[DatasetMetadata] = None
    val rows = records.map(_._1).distinct.sorted.map { v =>
      val md = DatasetMetadata.loadVersion(spark, base, uuid, v)
      val parentForMetrics: Option[DatasetMetadata] =
        if (v == 1L) Some(DatasetMetadata(uuid = uuid, schemaJson = md.schemaJson))
        else prev.filter(_.version == v - 1)
      val (fAdd, fDel, bAdd) = parentForMetrics match {
        case Some(p) =>
          val pL = Option(p.partitions).getOrElse(Map.empty[String, Long]).keySet
          val added = md.partitions.keysIterator.filterNot(pL.contains).toSeq
          (Some(added.size.toLong), Some((pL -- md.partitions.keySet).size.toLong),
            Some(added.map(md.sizeOf).sum))
        case None => (None, None, None)
      }
      prev = Some(md)
      val rb = md.metadata.get(DatasetMetadata.RollbackCommitKey)
        .exists(_.toLong == v)
      // in-commit stamp (monotone, copy-stable) wins; record mtime is the
      // fallback for commits predating the stamp
      val at = md.metadata.get(DatasetMetadata.CommitTsKey).map(_.toLong)
        .orElse(mtimes.get(v)).map(new java.sql.Timestamp(_))
      // operation verb only when stamped BY this commit — inherited
      // copies carry an older commit number and display as null
      val op = md.metadata.get(DatasetMetadata.OperationKey).filter(_ =>
        md.metadata.get(DatasetMetadata.OperationCommitKey).exists(_.toLong == v))
      (v, at, op, md.partitions.size.toLong,
        // sizeOf, not values.sum: Jackson narrows the erased Map[String,
        // Long] to Integer on deserialization — summing would unbox-throw
        // on any version parsed from disk (fresh JVM, pre-cache history)
        md.partitions.keysIterator.map(md.sizeOf).sum,
        fAdd, fDel, bAdd, md.deleteFragments.size.toLong, rb,
        if (rb) md.metadata.get(DatasetMetadata.RollbackOfKey).map(_.toLong) else None)
    }
    rows.toDF("version", "committed_at", "operation", "files", "bytes",
      "files_added", "files_removed", "bytes_added",
      "tombstone_fragments", "is_rollback", "rollback_of")
  }

  /** [[history]]'s big-table mode: per-version metrics reconstructed from
    * the distributed commit-record scan — the driver never materializes a
    * snapshot, so a deep history costs O(versions) result rows instead of
    * O(versions × labels) snapshot loads through the cache. Semantics
    * match the driver walk exactly (parity-pinned in HistorySpec):
    * files/bytes from each version's last-op-wins label state;
    * added/removed/bytes_added diffed against version v-1 via per-label
    * lag/lead over the presence rows (null for the oldest retained version
    * after a gc, whose parent is unknown — the driver rule); operation /
    * commit-ts / rollback attribution and the tombstone-fragment count
    * from each version's OWN record (deltas carry them wholesale).
    */
  private def historyDistributed(spark: SparkSession, base: String,
      uuid: String, versions: Seq[Long], mtimes: Map[Long, Long],
      recordNames: Set[String]): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val (chainStarts, broken) = resolveChains(spark, base, uuid, versions, recordNames)
    // a version whose chain is broken fails history exactly like the
    // driver path's loadVersion would
    broken.headOption.foreach { case (v, gap) =>
      throw new NoSuchElementException(
        s"Dataset '$uuid': version $v is unreachable — commit record $gap of " +
          "its replay chain is missing; history cannot replay it (run fsck)")
    }
    val scan = new CommitRecordScan(spark, base, uuid, chainStarts,
      hasFullIn(recordNames))
    try {
      val vMax = versions.max
      val pres = scan.perVersionLabels
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val w = Window.partitionBy("label").orderBy("version")
        val flagged = pres
          .withColumn("prevV", lag("version", 1).over(w))
          .withColumn("nextV", lead("version", 1).over(w))
        val perV = pres.groupBy("version")
          .agg(count(lit(1)).as("files"), sum("size").as("bytes"))
        // a label counts ADDED at v when it has no presence row at v-1
        // (retained versions are dense, so lag == v-1 ⇔ present at parent)
        val adds = flagged
          .filter(col("prevV").isNull || col("prevV") =!= col("version") - 1)
          .groupBy("version")
          .agg(count(lit(1)).as("files_added"), sum("size").as("bytes_added"))
        // ...and REMOVED at p+1 when present at p with no row at p+1
        val rems = flagged
          .filter((col("nextV").isNull || col("nextV") =!= col("version") + 1) &&
            col("version") < lit(vMax))
          .select((col("version") + 1).as("version"))
          .groupBy("version").agg(count(lit(1)).as("files_removed"))
        val meta = scan.recRows
          .filter(col("kind").isin("meta_ts", "meta_op", "meta_rb",
            "missing_dv_fragment"))
          .withColumnRenamed("rv", "version")
          .groupBy("version").agg(
            max(when(col("kind") === "meta_ts", col("name"))).as("ts"),
            max(when(col("kind") === "meta_op", col("name"))).as("op"),
            max(when(col("kind") === "meta_rb", col("name"))).as("rb"),
            sum(when(col("kind") === "missing_dv_fragment", 1L).otherwise(0L))
              .as("frags"))
        val joined = versions.toDF("version")
          .join(perV, Seq("version"), "left")
          .join(adds, Seq("version"), "left")
          .join(rems, Seq("version"), "left")
          .join(meta, Seq("version"), "left")
          .join(mtimes.toSeq.toDF("version", "mtime"), Seq("version"), "left")
          .orderBy("version")
          .collect()
        def optLong(r: Row, field: String): Option[Long] =
          Option(r.getAs[java.lang.Long](field)).map(_.toLong)
        val retained = versions.toSet
        val rows = joined.toSeq.map { r =>
          val v = r.getAs[Long]("version")
          // a version whose parent (v-1) is NOT retained has an unknown
          // parent — its metrics report null, like the driver walk
          // (`prev.filter(_.version == v - 1)`). Membership, not `> vMin`:
          // retained versions need not be contiguous — a middle version's
          // records can be vacuumed while a later checkpoint keeps later
          // versions loadable, and the lag/lead diff would otherwise count
          // every surviving label as added at the post-gap version (v1
          // diffs against the empty dataset: all its labels count added)
          val parentKnown = v == 1L || retained.contains(v - 1)
          val fAdd = if (parentKnown) Some(optLong(r, "files_added").getOrElse(0L)) else None
          val fDel = if (parentKnown) Some(optLong(r, "files_removed").getOrElse(0L)) else None
          val bAdd = if (parentKnown) Some(optLong(r, "bytes_added").getOrElse(0L)) else None
          val at = Option(r.getAs[String]("ts")).map(_.toLong)
            .orElse(optLong(r, "mtime")).map(new java.sql.Timestamp(_))
          val rbOf = Option(r.getAs[String]("rb")).map(_.toLong)
          (v, at, Option(r.getAs[String]("op")),
            optLong(r, "files").getOrElse(0L), optLong(r, "bytes").getOrElse(0L),
            fAdd, fDel, bAdd, optLong(r, "frags").getOrElse(0L),
            rbOf.isDefined, rbOf)
        }
        rows.toDF("version", "committed_at", "operation", "files", "bytes",
          "files_added", "files_removed", "bytes_added",
          "tombstone_fragments", "is_rollback", "rollback_of")
      } finally { pres.unpersist(blocking = false); () }
    } finally scan.close()
  }

  /** Latest commit version whose committed-at time (the in-commit stamp
    * when present, else the earliest record mtime — the same rule
    * [[history]] reports) is <= `atMillis` — the resolution rule behind
    * SQL `TIMESTAMP AS OF`. One `_versions` listing plus O(retained
    * versions) snapshot-cached metadata loads, no data reads. None when
    * the dataset has no commit at or before the instant.
    */
  def versionAtTimestamp(
      spark: SparkSession, base: String, uuid: String, atMillis: Long): Option[Long] = {
    val mtimes = DatasetMetadata.versionRecords(spark, base, uuid)
      .groupMapReduce(_._1)(_._2)(math.min)
    val versions = mtimes.keys.toArray.sorted
    if (versions.isEmpty) return None
    def stampOpt(v: Long): Option[Long] =
      DatasetMetadata.loadVersion(spark, base, uuid, v)
        .metadata.get(DatasetMetadata.CommitTsKey).map(_.toLong)
    // head fast path: "now-ish" instants resolve with ONE load, and the
    // head is the latest version regardless of any ordering caveat below
    if (stampOpt(versions.last).getOrElse(mtimes(versions.last)) <= atMillis)
      return Some(versions.last)
    // In-commit stamps are strictly monotone along the version line (each
    // floors on its parent's) and stamped commits form a SUFFIX (every
    // commit since the feature stamps; copies preserve records verbatim) —
    // so the suffix BINARY-SEARCHES: O(log versions) loads on a long
    // retained history instead of a descending walk's O(versions) worst
    // case for old instants. Pre-stamp commits fall back to record
    // MTIMES, which a dataset copy REFRESHES (young mtimes, gc's keepFrom0
    // documents the same caveat) — non-monotone, so the prefix keeps the
    // legacy descending walk (legacy-only, bounded by the prefix).
    var lo = 0
    var hi = versions.length - 1
    var b = versions.length // lowest stamped index ("stamped" is suffix-closed)
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (stampOpt(versions(mid)).isDefined) { b = mid; hi = mid - 1 }
      else lo = mid + 1
    }
    if (b < versions.length) {
      var l = b
      var h = versions.length - 2 // head already ruled out
      var ans = -1
      while (l <= h) {
        val mid = (l + h) >>> 1
        if (stampOpt(versions(mid)).exists(_ <= atMillis)) { ans = mid; l = mid + 1 }
        else h = mid - 1
      }
      // a stamped match is a LATER version than any prefix match — done
      if (ans >= 0) return Some(versions(ans))
    }
    versions.slice(0, b).reverseIterator.find(v => mtimes(v) <= atMillis)
  }

  /** Versions in `(fromVersion, toVersion]` that were [[rollback]] commits,
    * as `(version, restoredToVersion)` — the change-feed consumer's
    * RE-SYNC signal: a rollback restores content the feed reports only as
    * removes, so a mirror that sees one must re-seed from a snapshot
    * (see [[mirrorChanges]]) instead of trusting the delta stream.
    */
  def rollbackVersions(
      spark: SparkSession, base: String, uuid: String,
      fromVersion: Long, toVersion: Long): Seq[(Long, Long)] =
    (fromVersion + 1 to toVersion).flatMap { v =>
      val md = DatasetMetadata.loadVersion(spark, base, uuid, v)
      // inherited markers carry an OLDER commit number — only a marker
      // equal to the version itself identifies an actual rollback commit
      md.metadata.get(DatasetMetadata.RollbackCommitKey)
        .filter(_.toLong == v)
        .map(_ => v -> md.metadata(DatasetMetadata.RollbackOfKey).toLong)
    }

  /** Maintain a downstream MIRROR dataset from an upstream's change feed —
    * the rate-limited incremental CDC poller: one call consumes at most
    * `maxVersionsPerPoll` upstream commits (checkpointed, at-least-once,
    * [[consumeChanges]] semantics) and applies them to the mirror as ONE
    * atomic [[mergeCdc]] commit. The range's changes collapse to the LAST
    * operation per key first (an update's delete+insert pair at the same
    * version resolves to the insert), so out-of-range history never
    * resurrects. A range containing a [[rollback]] commit re-seeds the
    * mirror from the upstream snapshot instead — the feed's removes-only
    * view of a rollback cannot reconstruct restored content. A missing
    * mirror bootstraps from the first batch (feed-from-0 emits the full
    * upstream content as inserts). Assumes upstream keys are unique (the
    * CDC-mirror contract, like mergeCdc). Returns versions consumed; loop
    * until 0 to drain.
    */
  def mirrorChanges(
      spark: SparkSession,
      srcBase: String,
      srcUuid: String,
      dstBase: String,
      dstUuid: String,
      keys: Seq[String],
      checkpointPath: String,
      maxVersionsPerPoll: Int = 100,
      maxCollectKeys: Int = 10000): Long = {
    require(keys.nonEmpty, "mirrorChanges requires at least one key column")
    consumeChanges(spark, srcBase, srcUuid, checkpointPath, maxVersionsPerPoll) {
      (changes, from, to) =>
        if (rollbackVersions(spark, srcBase, srcUuid, from, to).nonEmpty) {
          val snap = readTableAsOf(spark, srcBase, srcUuid, to)
          if (!DatasetMetadata.exists(spark, dstBase, dstUuid))
            store(spark, dstBase, dstUuid, snap)
          else
            // bounded re-seed: write only the snapshot-vs-mirror DIFF as
            // one merge commit — the mirror's version line survives the
            // recovery, and write amplification is O(diff) not O(table)
            reseedFromSnapshot(spark, dstBase, dstUuid, snap, keys,
              maxCollectKeys = maxCollectKeys)
        } else {
          import org.apache.spark.sql.expressions.Window
          val w = Window.partitionBy(keys.map(c => col(s"`$c`")): _*)
            .orderBy(col("_commit_version").desc,
              when(col("_change_type") === "insert", 0).otherwise(1))
          val collapsed = changes
            .withColumn("__rn", row_number().over(w))
            .filter(col("__rn") === 1)
            .drop("__rn", "_commit_version")
          if (!DatasetMetadata.exists(spark, dstBase, dstUuid))
            store(spark, dstBase, dstUuid,
              collapsed.filter(col("_change_type") === "insert").drop("_change_type"))
          else
            mergeCdc(spark, dstBase, dstUuid, collapsed, keys,
              opCol = "_change_type", deleteOp = "delete",
              maxCollectKeys = maxCollectKeys, evolveSchema = true)
        }
    }
  }

  /** Re-seed a keyed MIRROR from an upstream snapshot with a BOUNDED
    * write: full-outer-join the snapshot against the mirror's current
    * content on `keys`, keep only rows that actually differ, and apply
    * them as ONE [[mergeCdc]] commit — upserts for new/changed keys,
    * tombstones for keys gone upstream. Read cost is one scan of each
    * side (the same as a full overwrite); WRITE cost drops from O(table)
    * to O(diff), and the mirror's own commit history survives — a
    * rollback recovery no longer physically clobbers the mirror's
    * version line. Schema drift in either direction is handled by
    * aligning both sides to the UNION schema (missing columns read as
    * null, so a row differing only in a one-sided column still upserts);
    * the merge commit evolves the mirror's schema additively when the
    * snapshot carries new columns. Assumes upstream keys are unique
    * (the CDC-mirror contract, like [[mergeCdc]]).
    */
  def reseedFromSnapshot(
      spark: SparkSession,
      dstBase: String,
      dstUuid: String,
      snapshot: DataFrame,
      keys: Seq[String],
      maxCollectKeys: Int = 10000): (DatasetMetadata, Long) = {
    require(keys.nonEmpty, "reseedFromSnapshot requires at least one key column")
    keys.foreach(k => require(snapshot.columns.contains(k),
      s"key column '$k' missing from the snapshot"))
    val cur = readTable(spark, dstBase, dstUuid)
    keys.foreach(k => require(cur.columns.contains(k),
      s"key column '$k' missing from the mirror"))
    // union schema, snapshot's field order first — either side may lag the
    // other (a rollback can restore a PRE-evolution upstream schema while
    // the mirror already evolved)
    val unionFields = snapshot.schema.fields ++
      cur.schema.fields.filterNot(f => snapshot.columns.contains(f.name))
    def align(df: DataFrame): DataFrame = df.select(unionFields.toSeq.map { f =>
      if (df.columns.contains(f.name)) col(s"`${f.name}`").as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
    // presence markers instead of key-null tests: full-outer rows from one
    // side only are detected without assuming keys are never null
    val s = align(snapshot).withColumn("__s", lit(1)).as("s")
    val d = align(cur).withColumn("__d", lit(1)).as("d")
    val keyCond = keys.map(k => col(s"s.`$k`") <=> col(s"d.`$k`")).reduce(_ && _)
    val joined = s.join(d, keyCond, "full_outer")
    val payload = unionFields.map(_.name).filterNot(keys.contains)
    val changed = payload
      .map(c => !(col(s"s.`$c`") <=> col(s"d.`$c`")))
      .foldLeft(lit(false))(_ || _)
    val upserts = joined
      .filter(col("s.__s").isNotNull && (col("d.__d").isNull || changed))
      .select(unionFields.toSeq.map(f => col(s"s.`${f.name}`").as(f.name)) :+
        lit("insert").as("_change_type"): _*)
    val deletes = joined
      .filter(col("s.__s").isNull)
      .select(unionFields.toSeq.map { f =>
        if (keys.contains(f.name)) col(s"d.`${f.name}`").as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      } :+ lit("delete").as("_change_type"): _*)
    mergeCdc(spark, dstBase, dstUuid, upserts.unionByName(deletes), keys,
      opCol = "_change_type", deleteOp = "delete",
      maxCollectKeys = maxCollectKeys, evolveSchema = true)
  }

  /** Fragment list to commit after a rewrite dropped `removed` labels
    * (whose deleted rows were materialized away by [[rewriteGroupsStaged]]):
    * untouched fragments stay; touched ones canonicalize into ONE fragment
    * holding only surviving labels' rows; a fully-materialized dataset
    * sheds the list entirely. Old fragments become unreferenced →
    * [[garbageCollect]].
    */
  /** Partition-scope filter for the maintenance rewrites (`compact`,
    * `materializeDeletes`, `clusterZOrder`): a condition over partition
    * keys only, evaluated against label-path values.
    */
  private def partitionScope(
      md: DatasetMetadata, scope: Predicates, op: String): String => Boolean =
    if (scope.isEmpty) _ => true
    else {
      scope.columns.foreach(c => require(md.partitionKeys.contains(c),
        s"$op scope column '$c' must be a partition key"))
      l => scope.matchesValues(md.partitionValues(l))
    }

  private def prunedDeleteFragments(
      spark: SparkSession, base: String, md: DatasetMetadata,
      removed: Set[String]): Seq[String] = {
    if (md.deleteFragments.isEmpty) return Nil
    // only vectors over LIVE files matter: fragments referencing labels
    // earlier commits already removed are inert and must not keep a
    // fully-materialized dataset looking dirty (hasRowDeletes gates footer
    // pushdown and keyed joins)
    val dirty = dirtyDeleteLabels(spark, base, md).intersect(md.partitions.keySet)
    if (dirty.forall(removed.contains)) return Nil
    if (!dirty.exists(removed.contains)) return md.deleteFragments
    import spark.implicits._
    // rewrite to exactly the surviving LIVE labels' rows (a semi-join on
    // the survivors also sheds dead-label rows, unlike an anti-join on
    // `removed`)
    val live = (dirty -- removed).toSeq
    val keep = deleteVectors(spark, base, md).get
      .join(broadcast(live.toDF("label")), Seq("label"), "left_semi")
    writeDeleteFragment(spark, base, md.uuid, keep).map(_._1).toSeq
  }

  /** Apply one CDC batch (Debezium-style row images with an operation
    * column): rows where `opCol` = `deleteOp` tombstone their keys (a
    * delete of an absent key is a no-op), every other row upserts — ONE
    * atomic merge-on-read commit, zero rewrites ([[merge]] mechanics).
    * With [[graft.streaming.KtkSink.upsertStream]] feeding batches this
    * maintains a queryable mirror of a source table under
    * insert/update/delete traffic.
    */
  def mergeCdc(
      spark: SparkSession,
      base: String,
      uuid: String,
      batch: DataFrame,
      keys: Seq[String],
      opCol: String,
      deleteOp: String = "D",
      maxCollectKeys: Int = 10000,
      extraMetadata: Map[String, String] = Map.empty,
      evolveSchema: Boolean = false): (DatasetMetadata, Long) = {
    require(batch.columns.contains(opCol), s"CDC batch lacks op column '$opCol'")
    // Null-safe op split: `=== / =!=` are both null-rejecting, so a
    // malformed NULL-op row would silently vanish from BOTH sides. Route
    // NULL (and any non-delete marker) to the upsert side instead.
    val dels = batch.filter(col(s"`$opCol`") <=> deleteOp)
      .select(keys.map(c => col(s"`$c`")): _*)
    val ups = batch.filter(!(col(s"`$opCol`") <=> deleteOp)).drop(opCol)
    merge(spark, base, uuid, ups, keys, maxCollectKeys, extraMetadata,
      Some(dels), evolveSchema)
  }

  /** Physically drop deleted rows: rewrite exactly the files the deletion
    * vectors touch (per commit-seq groups, like [[compact]] — overlay
    * order survives), clear the fragment list, publish one atomic commit.
    * The rewrite is O(dirty files), not O(dataset); [[compact]] and
    * [[clusterZOrder]] also fold deletes into any rewrite they were doing
    * anyway, so routine maintenance sheds tombstones for free.
    */
  def materializeDeletes(
      spark: SparkSession,
      base: String,
      uuid: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      scope: Predicates = Predicates.empty): DatasetMetadata = {
    val md = migrateInlineZones(spark, base, DatasetMetadata.load(spark, base, uuid))
    if (md.deleteFragments.isEmpty) return md
    val tableDir = md.tableDir(base)
    // optional partition scope: fold tombstones only for matching
    // partitions' files — fragments covering out-of-scope files survive
    val inScope = partitionScope(md, scope, "materialize")
    val dirtyAll = dirtyDeleteLabels(spark, base, md).intersect(md.partitions.keySet)
    if (dirtyAll.isEmpty) {
      // fragments reference only labels later commits already removed
      val md1 = md.copy(deletes = Nil)
      return DatasetMetadata.store(spark, base, md1, parentMd = Some(md),
        operation = "MATERIALIZE DELETES")
    }
    val dirty = dirtyAll.filter(inScope)
    if (dirty.isEmpty) return md // nothing in scope; out-of-scope vectors stay
    val bySeq: Map[Long, Seq[String]] =
      dirty.toSeq.sorted.groupBy(md.seqOf)
    val movedBySeq = rewriteGroupsStaged(spark, base, md, bySeq) { (data, labels) =>
      val totalBytes = labels.map(md.sizeOf).sum
      val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
      val shaped =
        if (md.partitionKeys.nonEmpty)
          data.repartition(nOut, md.partitionKeys.map(c => col(s"`$c`")): _*)
        else data.repartition(nOut)
      val sortCols = recordedSortCols(md)
      if (sortCols.isEmpty) shaped else shaped.sortWithinPartitions(sortCols: _*)
    }
    val newSeqOf = scala.collection.mutable.Map.empty[String, Long]
    movedBySeq.foreach { case (seq, ls) => ls.foreach { case (l, _) => newSeqOf(l) = seq } }
    val finalPartitions: Map[String, Long] =
      md.partitions.keys.filterNot(dirty.contains)
        .map(l => l -> md.sizeOf(l)).toMap ++ movedBySeq.flatMap(_._2)
    val finalSeq = finalPartitions.keys.map { l =>
      l -> newSeqOf.getOrElse(l, md.seqOf(l))
    }.toMap
    val newLabels = newSeqOf.keys.toSeq.sorted
    val idxReg = mergeIndicesIncremental(spark, base, md, tableDir,
      survivingOld = finalPartitions.keys.toSeq.filterNot(newSeqOf.contains),
      newLabels = newLabels)
    val bloomReg = mergeBloomsIncremental(spark, base, md, tableDir,
      survivingOld = finalPartitions.keys.toSeq.filterNot(newSeqOf.contains),
      newLabels = newLabels)
    val zoneReg = mergeZonesIncremental(spark, base, md, tableDir,
      survivingOld = finalPartitions.keys.toSeq.filterNot(newSeqOf.contains),
      newLabels = newLabels)
    val md1 = md.copy(partitions = finalPartitions, partitionSeq = finalSeq,
      indices = idxReg, blooms = bloomReg, zones = zoneReg,
      // fragments covering only the rewritten files drop; with a scope,
      // fragments for untouched dirty files must survive or their deleted
      // rows would resurrect
      deletes = prunedDeleteFragments(spark, base, md, dirty))
    DatasetMetadata.store(spark, base, md1, parentMd = Some(md),
      operation = "MATERIALIZE DELETES")
  }

  /** Additive schema evolution WITHOUT data — register new nullable
    * columns in ONE metadata-only commit (the engine behind SQL
    * `ALTER TABLE ... ADD COLUMNS`). Existing files simply lack the
    * columns and read as null, exactly like `update(evolveSchema = true)`;
    * no data file is touched, so the commit is O(metadata) at any table
    * size. Columns must be new and are forced nullable (a required column
    * could never be satisfied by the existing files).
    */
  def addColumns(
      spark: SparkSession,
      base: String,
      uuid: String,
      newFields: Seq[StructField]): DatasetMetadata = {
    require(newFields.nonEmpty, "addColumns requires at least one column")
    val md = DatasetMetadata.load(spark, base, uuid)
    // duplicates WITHIN the call would commit a schema no reader accepts
    val dupes = newFields.groupBy(_.name.toLowerCase).collect {
      case (_, fs) if fs.size > 1 => fs.head.name
    }
    require(dupes.isEmpty, s"duplicate new column name(s): ${dupes.mkString(", ")}")
    newFields.foreach { f =>
      require(!md.schema.fieldNames.exists(_.equalsIgnoreCase(f.name)),
        s"column '${f.name}' already exists")
    }
    // run through the SAME normalization as every write path (type
    // promotion + partition-keys-first / payload-alphabetical order) so a
    // later update's validateCompatible sees identical shapes
    val evolved = SchemaUtil.normalizeSchema(
      StructType(md.schema.fields ++ newFields.map(_.copy(nullable = true))),
      md.partitionKeys)
    DatasetMetadata.store(spark, base, md.copy(schemaJson = evolved.json),
      parentMd = Some(md), operation = "ADD COLUMNS")
  }

  /** Update USER table properties in ONE metadata-only commit (the engine
    * behind SQL `ALTER TABLE ... SET/UNSET TBLPROPERTIES`). The `graft.`
    * namespace is reserved for engine state (sort order, sequence
    * watermark, constraints, rollback markers) and refused in both
    * directions — constraints have their own add/drop surface.
    */
  def setTableProperties(
      spark: SparkSession,
      base: String,
      uuid: String,
      set: Map[String, String] = Map.empty,
      unset: Seq[String] = Nil): DatasetMetadata = {
    require(set.nonEmpty || unset.nonEmpty, "nothing to change")
    (set.keys ++ unset).foreach(k => require(!k.startsWith("graft."),
      s"property '$k' is in the reserved engine namespace 'graft.'"))
    val md = DatasetMetadata.load(spark, base, uuid)
    DatasetMetadata.store(spark, base,
      md.copy(metadata = md.metadata -- unset ++ set), parentMd = Some(md),
      operation = "SET TBLPROPERTIES")
  }

  // ---------------------------------------------------------------- update

  /** Incremental update in ONE metadata commit (≙ update_dataset_from_dataframes,
    * io_components/update.py:23-57): append `newData` as new files, drop
    * partitions matched by `deleteScope` (a predicate over partition-key
    * columns), merge secondary indices incrementally, single blob put.
    * Existing partition files are immutable — deletion is logical first
    * (metadata), physical cleanup via [[garbageCollect]].
    */
  /** Next commit sequence number: strictly greater than every seq EVER
    * assigned (high watermark), not merely than the currently referenced
    * ones — a delete scope that removes the newest labels must not let a
    * later append reuse their seq (overlay order and the change feed's
    * rewrite detection both key on monotonicity).
    */
  private def nextMonotoneSeq(md: DatasetMetadata): Long = {
    val hwm = md.metadata.get(DatasetMetadata.SeqHwmKey).map(_.toLong).getOrElse(0L)
    math.max(hwm, (0L +: md.partitions.keys.toSeq.map(md.seqOf)).max) + 1L
  }

  def update(
      spark: SparkSession,
      base: String,
      uuid: String,
      newData: Option[DataFrame],
      deleteScope: Predicates = Predicates.empty,
      sortBy: Seq[String] = Nil,
      extraMetadata: Map[String, String] = Map.empty,
      appendSidecars: Boolean = false,
      evolveSchema: Boolean = false,
      replaceAll: Boolean = false,
      requireAppendsInScope: Boolean = false,
      dynamicPartitionOverwrite: Boolean = false): DatasetMetadata = {

    val md = migrateInlineZones(spark, base, DatasetMetadata.load(spark, base, uuid))
    val tableDir = md.tableDir(base)
    if (dynamicPartitionOverwrite) {
      require(!replaceAll && deleteScope.isEmpty,
        "dynamicPartitionOverwrite derives its own scope from the batch")
      require(newData.nonEmpty, "dynamicPartitionOverwrite requires new data")
    }
    // dynamic overwrite of an UNPARTITIONED dataset degenerates to a full
    // versioned replace — there is exactly one "partition" and the batch
    // rewrites it (the same rule every engine applies)
    val effReplaceAll = replaceAll ||
      (dynamicPartitionOverwrite && md.partitionKeys.isEmpty)
    val effDynamic = dynamicPartitionOverwrite && md.partitionKeys.nonEmpty

    // 1. which existing labels survive the delete scope? `replaceAll`
    //    (INSERT OVERWRITE semantics) drops every current reference in the
    //    SAME commit the new files land in — a versioned content swap, not
    //    a physical clobber: old files stay for time travel until gc.
    //    (dynamic partition overwrite defers this to AFTER the write: its
    //    scope is the partition set the batch actually lands in — ONE pass
    //    over the source, no pre-computed distinct.)
    val deleted: Set[String] =
      if (effDynamic) Set.empty
      else if (effReplaceAll) {
        require(deleteScope.isEmpty, "replaceAll and deleteScope are mutually exclusive")
        md.partitions.keySet
      } else if (deleteScope.isEmpty) Set.empty
      else {
        deleteScope.columns.foreach(c => require(md.partitionKeys.contains(c),
          s"delete_scope column '$c' must be a partition key"))
        md.partitions.keySet.filter(l => deleteScope.matchesValues(md.partitionValues(l)))
      }

    // 2. append new files. New labels come from the write job's own commit
    //    manifest (ManifestCommitProtocol) — NO directory listing. The dir
    //    may hold unreferenced leftovers (compacted-away files awaiting gc,
    //    failed writes); since we never list, they can never be resurrected
    //    into the commit, and commit cost is O(batch) regardless of how many
    //    historical files the dataset holds.
    // additive evolution (Delta mergeSchema semantics): new columns append
    // as nullable — old files simply lack them and the explicit-schema read
    // fills nulls. Registered sidecar columns must still arrive: their
    // incremental merges scan the new files for exactly those columns.
    val evolvedSchema: StructType = newData match {
      case Some(df) if evolveSchema =>
        val cand = SchemaUtil.normalizeSchema(df.schema, md.partitionKeys)
        val sidecarCols = md.indices.keySet ++ md.bloomRegistry.keySet ++ md.zoneColumns
        val absent = sidecarCols.filterNot(cand.fieldNames.contains).toSeq.sorted
        require(absent.isEmpty,
          s"evolveSchema update must still carry the registered index/bloom/zone " +
            s"column(s): ${absent.mkString(", ")}")
        SchemaUtil.evolveSchemas(md.schema, cand)
      case _ => md.schema
    }
    val newFiles: Seq[(String, Long)] = newData match {
      case None => Nil
      case Some(df) =>
        if (!evolveSchema)
          SchemaUtil.validateCompatible(md.schema, SchemaUtil.normalizeSchema(df.schema, md.partitionKeys))
        val normalized = SchemaUtil.normalize(df, md.partitionKeys)
        // CHECK constraints gate the batch BEFORE any file lands
        enforceConstraints(md, normalized)
        // partition columns first — see store(): the dynamic-partition
        // writer's own sort would destroy the secondary order otherwise
        val sorted =
          if (sortBy.nonEmpty)
            normalized.sortWithinPartitions(
              (md.partitionKeys ++ sortBy).map(c => col(s"`$c`")): _*)
          else normalized
        ManifestCommitProtocol.collecting(spark) {
          val writer = sorted.write.mode(SaveMode.Append)
          (if (md.partitionKeys.nonEmpty) writer.partitionBy(md.partitionKeys: _*) else writer)
            .parquet(tableDir)
        }
    }
    val newLabels = newFiles.map(_._1).toSet
    if (newLabels.exists(_.contains("__HIVE_DEFAULT_PARTITION__")))
      throw new IllegalArgumentException("null values in partition columns are not allowed")
    // REPLACE WHERE contract: every appended row must fall INSIDE the
    // partitions being replaced, or out-of-scope rows would silently
    // duplicate surviving files' content. O(newLabels) label parsing —
    // the check fails BEFORE the metadata commit, so nothing publishes
    // (the orphan files are unreferenced; gc reclaims them).
    if (requireAppendsInScope && !deleteScope.isEmpty) {
      val outOfScope = newLabels.filterNot(l => deleteScope.matchesValues(md.partitionValues(l)))
      if (outOfScope.nonEmpty)
        throw new IllegalArgumentException(
          s"overwrite scope violation: ${outOfScope.size} appended file(s) land outside " +
            s"the replaced partitions (e.g. ${md.partitionValues(outOfScope.head)}); " +
            "the source rows must all match the REPLACE WHERE / PARTITION clause")
    }

    // 3. commit tail, parameterized by the PARENT snapshot: drop scope,
    //    incremental sidecar merges, snapshot assembly, versioned store.
    //    Parameterized so a lost PURE-APPEND race retries the metadata
    //    commit ONLY against the freshly reloaded parent — the batch's
    //    data files are content-complete and parent-independent, so
    //    re-running the whole update (the withCommitRetries shape) would
    //    rewrite the batch and orphan the first attempt: O(batch) wasted
    //    I/O per lost race, the dominant retry cost at scale. Deletes /
    //    overwrites still re-run wholesale — their scope is derived FROM
    //    the parent and must be re-decided, never mechanically replayed.
    def commitTail(parent: DatasetMetadata, deletedNow: Set[String]): DatasetMetadata = {
      val refs = parent.partitions.keySet
      // dynamic partition overwrite: drop exactly the existing files whose
      // partition tuple the batch re-wrote (derived from the appended labels
      // — partition-count-sized, label parsing only, no extra job)
      val dropped: Set[String] =
        if (!effDynamic) deletedNow
        else {
          val touched = newLabels.map(parent.partitionValues)
          refs.filter(l => touched.contains(parent.partitionValues(l)))
        }
      // schema re-derived against THIS parent (a concurrent commit may
      // have evolved it since the batch was validated pre-write); an
      // incompatibility found on retry fails loudly like first-attempt
      val evolvedNow: StructType = newData match {
        case Some(df) if evolveSchema =>
          SchemaUtil.evolveSchemas(parent.schema,
            SchemaUtil.normalizeSchema(df.schema, parent.partitionKeys))
        case Some(df) if parent.version != md.version =>
          SchemaUtil.validateCompatible(parent.schema,
            SchemaUtil.normalizeSchema(df.schema, parent.partitionKeys))
          parent.schema
        case _ => evolvedSchema
      }
      val finalPartitions: Map[String, Long] =
        refs.filterNot(dropped.contains).map(l => l -> parent.sizeOf(l)).toMap ++ newFiles
      val nextSeq = nextMonotoneSeq(parent)
      val finalSeq = finalPartitions.keys.map { l =>
        l -> (if (newLabels.contains(l)) nextSeq else parent.seqOf(l))
      }.toMap
      // incremental index merge (≙ update_indices, io_components/write.py:283-309):
      // keep surviving labels of the old index, union the new files' pairs.
      // Zone and bloom sidecars merge the same way; canonical rewrites land
      // in fresh version-addressed dirs whose names commit with the blob.
      // append-only sidecar maintenance: only meaningful with no deletes —
      // after a delete the canonical merge must drop the dead labels' rows so
      // loadIndex/observedValues stay exact (queryLabels alone would tolerate
      // stale labels via its live-partition intersection)
      val appendOnly = appendSidecars && dropped.isEmpty
      val survivingOld = finalPartitions.keys.toSeq.filter(refs.contains)
      val idxReg = mergeIndicesIncremental(spark, base, parent, tableDir,
        survivingOld = survivingOld, newLabels = newLabels.toSeq, appendOnly = appendOnly)
      val bloomReg = mergeBloomsIncremental(spark, base, parent, tableDir,
        survivingOld = survivingOld, newLabels = newLabels.toSeq, appendOnly = appendOnly)
      val zoneReg = mergeZonesIncremental(spark, base, parent, tableDir,
        survivingOld = survivingOld, newLabels = newLabels.toSeq, appendOnly = appendOnly)
      val sortMeta =
        if (sortBy.isEmpty) Map.empty[String, String]
        else Map(DatasetMetadata.SortByKey -> sortBy.mkString(","))
      val md1 = parent.copy(partitions = finalPartitions, partitionSeq = finalSeq,
        schemaJson = evolvedNow.json,
        indices = idxReg, blooms = bloomReg, zones = zoneReg,
        // a full content replacement also sheds pending deletion vectors —
        // every file they tombstone just left the referenced set
        deletes = if (effReplaceAll) Nil else parent.deletes,
        metadata = parent.metadata ++ extraMetadata ++ sortMeta +
          (DatasetMetadata.SeqHwmKey -> nextSeq.toString))
      DatasetMetadata.store(spark, base, md1, parentMd = Some(parent),
        operation =
          if (effReplaceAll) "OVERWRITE"
          else if (newData.isEmpty) "DELETE SCOPE" else "WRITE")
    }

    val pureAppend = !effReplaceAll && !effDynamic && deleteScope.isEmpty && newData.nonEmpty
    if (!pureAppend) commitTail(md, deleted)
    else {
      // blind-append auto-resolution (the Delta AddFile-only rule): appends
      // commute, so a lost claim re-commits the SAME files under the new
      // parent. Bounded; the final failure still surfaces as
      // ConcurrentCommitException for the caller's withCommitRetries.
      var parent = md
      var tries = 0
      while (true) {
        try return commitTail(parent, Set.empty)
        catch {
          case e: ConcurrentCommitException =>
            tries += 1
            if (tries > appendCommitRetries(spark)) throw e
            // FULL-JITTER backoff (uniform in [0, 25ms * tries]): N writers
            // that collide once must NOT reclaim in lockstep — a
            // deterministic sleep resynchronizes the losers and burns the
            // retry budget under fan-in (the 4x10 probe saw 3/40
            // escalations to full re-runs before jitter)
            Thread.sleep(java.util.concurrent.ThreadLocalRandom.current()
              .nextLong(25L * tries + 1))
            val reloaded = DatasetMetadata.load(spark, base, uuid)
            // a concurrent re-layout (REPLACE TABLE changing partition
            // keys) invalidates the written files' directory layout — the
            // fast path cannot resolve that; let the caller re-run wholesale
            if (reloaded.partitionKeys != md.partitionKeys) throw e
            // the batch was constraint-checked against the OLD set; if a
            // concurrent commit changed the constraints, re-check (rare —
            // one predicate pass over the batch) before re-committing
            if (constraints(reloaded) != constraints(md))
              newData.foreach(df => enforceConstraints(reloaded,
                SchemaUtil.normalize(df, reloaded.partitionKeys)))
            parent = reloaded
        }
      }
      throw new IllegalStateException("unreachable")
    }
  }

  /** Fast-retry bound for lost pure-append commit races ([[update]]'s
    * metadata-only re-commit loop), `spark.graft.append.commitRetries`
    * (default 8). Kept separate from the caller-level
    * [[withCommitRetries]] budget: the fast path is cheap (no data
    * rewrite), so it can afford more attempts than a full re-run. Raise
    * it for high-fan-in multi-writer tables; 0 disables the fast path
    * (every lost race surfaces to the caller).
    */
  private def appendCommitRetries(spark: SparkSession): Int = {
    val key = "spark.graft.append.commitRetries"
    spark.conf.getOption(key).map { s =>
      val n =
        try s.trim.toInt
        catch {
          case e: NumberFormatException =>
            throw new IllegalArgumentException(
              s"invalid $key='$s': must be a non-negative retry count", e)
        }
      if (n < 0) throw new IllegalArgumentException(
        s"invalid $key=$n: must be a non-negative retry count")
      n
    }.getOrElse(8)
  }

  /** REPLACE TABLE AS SELECT: swap a dataset's entire content, SCHEMA and
    * partition layout in ONE versioned commit on the SAME version line —
    * unlike `store(overwrite = true)` (which physically clobbers the
    * `_versions` log) the previous snapshots stay travelable and gc
    * reclaims the unreferenced files later. Because the schema is replaced
    * wholesale, registered sidecars (indices/blooms/zones), pending
    * deletion vectors, CHECK constraints, the recorded sort order and the
    * previous user properties are all dropped with it — they describe
    * columns that may no longer exist. Old snapshots keep their OWN
    * schema/partition keys (each version record carries them).
    */
  def replaceTable(
      spark: SparkSession,
      base: String,
      uuid: String,
      df: DataFrame,
      partitionOn: Seq[String] = Nil,
      userMetadata: Map[String, String] = Map.empty): DatasetMetadata = {
    val md = DatasetMetadata.load(spark, base, uuid)
    val tableDir = md.tableDir(base)
    partitionOn.foreach(c => require(df.columns.contains(c),
      s"partition_on column '$c' missing"))
    val normalized = SchemaUtil.normalize(df, partitionOn)
    val newFiles: Seq[(String, Long)] = ManifestCommitProtocol.collecting(spark) {
      val writer = normalized.write.mode(SaveMode.Append)
      (if (partitionOn.nonEmpty) writer.partitionBy(partitionOn: _*) else writer)
        .parquet(tableDir)
    }
    if (newFiles.exists(_._1.contains("__HIVE_DEFAULT_PARTITION__")))
      throw new IllegalArgumentException("null values in partition columns are not allowed")
    val nextSeq = nextMonotoneSeq(md)
    val md1 = md.copy(
      partitionKeys = partitionOn,
      schemaJson = SchemaUtil.normalizeSchema(df.schema, partitionOn).json,
      partitions = newFiles.toMap,
      partitionSeq = newFiles.map(_._1 -> nextSeq).toMap,
      indices = Map.empty, blooms = Map.empty, zones = Map.empty,
      zoneMaps = Map.empty, deletes = Nil,
      metadata = userMetadata +
        (DatasetMetadata.SeqHwmKey -> nextSeq.toString))
    DatasetMetadata.store(spark, base, md1, parentMd = Some(md),
      operation = "REPLACE TABLE")
  }

  /** Incremental index merge (≙ update_indices, io_components/write.py:
    * 283-309): each registered index keeps its surviving labels' pairs and
    * unions freshly scanned pairs for the new labels. Shared by [[update]],
    * [[commit]] and [[compact]]. Returns the index registry to COMMIT —
    * canonical rewrites go to a fresh version-addressed dir, appends keep
    * the current name.
    */
  private def mergeIndicesIncremental(
      spark: SparkSession, base: String, md: DatasetMetadata, tableDir: String,
      survivingOld: Seq[String], newLabels: Seq[String],
      appendOnly: Boolean = false): Map[String, String] = {
    import spark.implicits._
    val fsys = DatasetMetadata.fs(spark, base)
    md.indices.keys.toSeq.sorted.map { c =>
      val fsPath = md.indexPath(base, c)
      // an index registered at createEmpty has no file until data first lands
      val oldExists = fsys.exists(new Path(fsPath))
      if (appendOnly && oldExists) {
        // streaming-commit fast path: O(new files), never O(index). New
        // labels' rows land as EXTRA parquet files in the index dir; a value
        // may then span several rows until [[compact]] re-canonicalizes
        // (consumers take the union — see [[loadIndex]]).
        if (newLabels.nonEmpty)
          indexFromPairs(spark.read.option("basePath", tableDir)
              .parquet(newLabels.map(l => s"$tableDir/$l"): _*)
              .select(col(s"`$c`").as("value"), labelCol(spark, tableDir, input_file_name()).as("label")))
            .write.mode(SaveMode.Append).parquet(fsPath)
        c -> md.indices(c)
      } else if (oldExists || newLabels.nonEmpty) {
        // surviving-old-labels as a semi-join, not a giant In-list — the label
        // set is O(partitions) and must never inline into the plan
        val survivors = survivingOld.toDF("label")
        def freshPairs = spark.read.option("basePath", tableDir)
          .parquet(newLabels.map(l => s"$tableDir/$l"): _*)
          .select(col(s"`$c`").as("value"), labelCol(spark, tableDir, input_file_name()).as("label"))
        val pairs = (oldExists, newLabels.nonEmpty) match {
          case (true, true) =>
            spark.read.parquet(fsPath)
              .select(col("value"), explode(col("partitions")).as("label"))
              .join(broadcast(survivors), Seq("label"), "left_semi")
              .unionByName(freshPairs)
          case (true, false) =>
            spark.read.parquet(fsPath)
              .select(col("value"), explode(col("partitions")).as("label"))
              .join(broadcast(survivors), Seq("label"), "left_semi")
          case (false, _) => freshPairs
        }
        val name = newSidecarName(c)
        atomicSidecarWrite(spark, s"$base/${md.uuid}/$IndexDirName", name) { tmp =>
          indexFromPairs(pairs, SidecarCanonicalFiles)
            .write.mode(SaveMode.Overwrite).parquet(tmp)
        }
        c -> name
      } else c -> md.indices(c)
    }.toMap
  }

  /** Small-file compaction: rewrite undersized data files into
    * ~`targetFileBytes` files and publish ONE atomic metadata commit; the
    * replaced files become unreferenced (a later [[garbageCollect]] removes
    * them), so concurrent readers keep a consistent view throughout.
    *
    * Victims are grouped by commit sequence and rewritten one job per seq,
    * with new labels inheriting that seq — overlay keep-last semantics
    * (which dedup by `partitionSeq`) are preserved exactly; files from
    * different commits are never merged. At 100 TB this is the routine
    * maintenance op that keeps scan task counts sane after many
    * small incremental [[update]]s / streaming batches.
    */
  def compact(
      spark: SparkSession,
      base: String,
      uuid: String,
      smallFileBytes: Long = 32L * 1024 * 1024,
      targetFileBytes: Long = 128L * 1024 * 1024,
      extraMetadata: Map[String, String] = Map.empty,
      scope: Predicates = Predicates.empty): DatasetMetadata = {

    val md = migrateInlineZones(spark, base, DatasetMetadata.load(spark, base, uuid))
    val tableDir = md.tableDir(base)
    def dirOf(label: String): String = {
      val i = label.lastIndexOf('/')
      if (i < 0) "" else label.substring(0, i)
    }
    // optional partition scope (OPTIMIZE ... WHERE over partition keys): at
    // large scale maintenance targets the HOT partitions, not the table —
    // out-of-scope files are untouchable, label parsing only
    val inScope = partitionScope(md, scope, "compact")
    // compaction victims: small files sharing (partition dir, commit seq)
    // with at least one other small file — singletons gain nothing.
    // Sizes come from the catalog (sizeOf widens Jackson's narrowed
    // integrals) — no listing of the table dir.
    val victimsBySeq: Map[Long, Seq[String]] = md.partitions.keys.toSeq
      .filter(inScope)
      .map(l => l -> md.sizeOf(l))
      .filter(_._2 < smallFileBytes)
      .groupBy { case (l, _) => (dirOf(l), md.seqOf(l)) }
      .filter(_._2.size >= 2)
      .toSeq.flatMap { case ((_, seq), fs) => fs.map { case (l, _) => seq -> l } }
      .groupBy(_._1).map { case (s, ls) => s -> ls.map(_._2).sorted }
    val victims = victimsBySeq.values.flatten.toSet
    if (victims.isEmpty) {
      // nothing to rewrite, but callers piggybacking metadata on the
      // compaction commit (e.g. the streaming sink's maintenance counter)
      // still need it persisted.
      if (extraMetadata.isEmpty) return md
      val md0 = md.copy(metadata = md.metadata ++ extraMetadata)
      return DatasetMetadata.store(spark, base, md0, parentMd = Some(md),
        operation = "COMPACT")
    }

    val movedBySeq = rewriteGroupsStaged(spark, base, md, victimsBySeq) { (data, labels) =>
      val totalBytes = labels.map(md.sizeOf).sum
      val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
      val shaped =
        if (md.partitionKeys.nonEmpty)
          data.repartition(nOut, md.partitionKeys.map(c => col(s"`$c`")): _*)
        else data.repartition(nOut)
      // preserve the recorded sort layout: merged files keep tight
      // row-group stats and zone-map ranges
      val sortCols = recordedSortCols(md)
      if (sortCols.isEmpty) shaped else shaped.sortWithinPartitions(sortCols: _*)
    }
    val newSeqOf = scala.collection.mutable.Map.empty[String, Long]
    movedBySeq.foreach { case (seq, ls) => ls.foreach { case (l, _) => newSeqOf(l) = seq } }

    // survivors keep their catalog sizes; moved files carry the size
    // captured during the staging walk — no table-dir relisting
    val finalPartitions: Map[String, Long] =
      md.partitions.keys.filterNot(victims.contains)
        .map(l => l -> md.sizeOf(l)).toMap ++ movedBySeq.flatMap(_._2)
    val finalSeq = finalPartitions.keys.map { l =>
      l -> newSeqOf.getOrElse(l, md.seqOf(l))
    }.toMap

    val newLabels = newSeqOf.keys.toSeq.sorted
    val idxReg = mergeIndicesIncremental(spark, base, md, tableDir,
      survivingOld = finalPartitions.keys.toSeq.filterNot(newSeqOf.contains),
      newLabels = newLabels)
    val bloomReg = mergeBloomsIncremental(spark, base, md, tableDir,
      survivingOld = finalPartitions.keys.toSeq.filterNot(newSeqOf.contains),
      newLabels = newLabels)
    val zoneReg = mergeZonesIncremental(spark, base, md, tableDir,
      survivingOld = finalPartitions.keys.toSeq.filterNot(newSeqOf.contains),
      newLabels = newLabels)
    val md1 = md.copy(partitions = finalPartitions, partitionSeq = finalSeq,
      indices = idxReg, blooms = bloomReg, zones = zoneReg,
      // victims' deleted rows were materialized away during the rewrite
      deletes = prunedDeleteFragments(spark, base, md, victims),
      metadata = md.metadata ++ extraMetadata)
    DatasetMetadata.store(spark, base, md1, parentMd = Some(md),
      operation = "COMPACT")
  }

  /** Sort columns recorded at write time (`graft.sort_by`), restricted to
    * columns still in the schema (additive evolution can't remove one, but
    * be defensive) — maintenance rewrites re-apply them.
    */
  private def recordedSortCols(md: DatasetMetadata): Seq[org.apache.spark.sql.Column] = {
    val cols = md.metadata.get(DatasetMetadata.SortByKey).toSeq
      .flatMap(_.split(",").toSeq).filter(md.schema.fieldNames.contains)
    // partition columns first — see store(): otherwise the dynamic-
    // partition writer re-sorts on them alone and discards the rest
    if (cols.isEmpty) Nil
    else (md.partitionKeys ++ cols).map(c => col(s"`$c`"))
  }

  /** Shared staged-rewrite machinery of [[compact]] and [[clusterZOrder]].
    *
    * Per-seq groups rewrite CONCURRENTLY, each into its own staging dir
    * under the dataset root (dot-prefixed: invisible to listings and
    * readers), then files move into the table dir as pure metadata
    * renames — wall-time is max-over-groups, not sum-over-groups (after a
    * long streaming run there is one group per micro-batch commit).
    *
    * The NONCE-named staging root keeps two racing maintenance ops from
    * deleting each other's in-flight staging; the loser of the final
    * commit CAS leaves only unreferenced table-dir files that
    * [[garbageCollect]] reclaims. Crash leftovers are reaped here too, but
    * only when STALE — staleness keys on a HEARTBEAT FILE inside each
    * staging root (touched per rewrite group), never the directory mtime:
    * per-seq subdirectory writes don't refresh the root's mtime on HDFS,
    * and object stores report unreliable/zero directory mtimes — keying
    * on those could reap a LIVE concurrent (or merely >1h) op's staging
    * mid-run. File mtimes are reliable everywhere.
    *
    * `shape(groupData, groupLabels)` decides the rewrite layout (hash
    * repartition for compact, z-rank range repartition for clusterZOrder);
    * returns (seq → moved (label, size)) per group, sizes captured during
    * the staging walk so no table-dir relisting is ever needed.
    */
  private def rewriteGroupsStaged(
      spark: SparkSession,
      base: String,
      md: DatasetMetadata,
      victimsBySeq: Map[Long, Seq[String]])(
      shape: (DataFrame, Seq[String]) => DataFrame): Seq[(Long, Seq[(String, Long)])] = {
    val tableDir = md.tableDir(base)
    val fsys = DatasetMetadata.fs(spark, base)
    // rewrites MATERIALIZE row-level deletes: groups holding a
    // deletion-vector-touched file anti-join the vectors before reshaping,
    // so deleted rows never travel into the rewritten files (resurrection
    // would corrupt the dataset — the caller drops the labels from the
    // fragment list). Clean groups pay nothing.
    val dvDirty: Set[String] = dirtyDeleteLabels(spark, base, md)
    def applyDeletes(raw: DataFrame, labels: Seq[String]): DataFrame =
      if (!labels.exists(dvDirty.contains)) raw
      else {
        val dv = deleteVectors(spark, base, md).get
          .select(col("label").as("__dvl"), col("pos").as("__dvp"))
        raw
          .withColumn("__label",
            labelCol(spark, tableDir))
          .withColumn("__pos", col("_metadata.row_index"))
          .join(dv, col("__label") === col("__dvl") && col("__pos") === col("__dvp"),
            "left_anti")
          .drop("__label", "__pos")
      }
    val stagingRoot = new Path(s"$base/${md.uuid}/" +
      s".compacting-${java.util.UUID.randomUUID.toString.take(8)}")
    val dsRoot = new Path(s"$base/${md.uuid}")
    val staleAfterMs = 60L * 60 * 1000
    if (fsys.exists(dsRoot)) fsys.listStatus(dsRoot).foreach { st =>
      if (st.getPath.getName.startsWith(".compacting")) {
        val lastAlive =
          try fsys.getFileStatus(new Path(st.getPath, CompactHeartbeat)).getModificationTime
          catch { case _: java.io.FileNotFoundException =>
            // pre-heartbeat leftover (or a racer's ms-wide creation
            // window): the directory mtime is the only signal left
            st.getModificationTime }
        if (lastAlive < System.currentTimeMillis() - staleAfterMs) {
          fsys.delete(st.getPath, true); ()
        }
      }
    }
    fsys.mkdirs(stagingRoot)
    val heartbeat = new Path(stagingRoot, CompactHeartbeat)
    fsys.create(heartbeat, true).close()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(8, victimsBySeq.size))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    try Await.result(Future.sequence(victimsBySeq.toSeq.sortBy(_._1).map {
      case (seq, labels) => Future {
        // liveness signal for foreign ops' stale-staging checks
        try fsys.setTimes(heartbeat, System.currentTimeMillis(), -1)
        catch { case _: java.io.IOException => () }
        val staging = s"$stagingRoot/$seq"
        val data = applyDeletes(
          spark.read.option("basePath", tableDir)
            .parquet(labels.map(l => s"$tableDir/$l"): _*),
          labels)
        val rewritten = shape(data, labels)
        val writer = rewritten.write.mode(SaveMode.Overwrite)
        (if (md.partitionKeys.nonEmpty) writer.partitionBy(md.partitionKeys: _*) else writer)
          .parquet(staging)
        val stPath = fsys.makeQualified(new Path(staging))
        val prefix = stPath.toString + "/"
        val moved = Seq.newBuilder[(String, Long)]
        walkFiles(fsys, stPath) { st =>
          val name = st.getPath.getName
          if (!name.startsWith("_") && !name.startsWith(".")) {
            val rel = st.getPath.toString.stripPrefix(prefix)
            val dest = new Path(s"$tableDir/$rel")
            // FileSystem.rename/mkdirs signal failure by returning false,
            // not throwing. A swallowed false here would let the finally
            // block delete the staging dir holding the only copy of the
            // rewritten rows while metadata still commits the move.
            if (!fsys.mkdirs(dest.getParent))
              throw new java.io.IOException(
                s"staged rewrite: mkdirs failed for ${dest.getParent}")
            if (!fsys.rename(st.getPath, dest))
              throw new java.io.IOException(
                s"staged rewrite: rename ${st.getPath} -> $dest failed")
            moved += (rel -> st.getLen)
          }
        }
        seq -> moved.result()
      }
    }), Duration.Inf)
    finally { pool.shutdown(); fsys.delete(stagingRoot, true); () }
  }

  /** Z-ORDER layout rewrite — the Delta/Iceberg `OPTIMIZE ZORDER BY`
    * technique applied to graft's zone-map sidecars. Files are rewritten
    * so each holds a tight range of the Morton code over quantile-bucketed
    * `columns` values ([[graft.core.ZOrder]]): tight in EVERY clustered
    * dimension at once, so zone pruning skips files on a predicate over
    * ANY clustered column — a plain `sortBy` gives that only for the
    * leading column. No reference analog (its layout control stops at
    * partition_on + sort_partitions_by, io_components/write.py:82-83).
    *
    * Mechanics: ONE `approxQuantile` pass fixes global per-column bucket
    * boundaries; the rank is pure codegen'd Column arithmetic
    * ([[graft.core.ZOrder.rankColumn]], no UDF); each commit-seq group is
    * range-repartitioned + sorted on (partitionKeys, rank) and rewritten
    * through the shared staged-rename path — like [[compact]], files from
    * different commits are never merged, so overlay keep-last semantics
    * survive (a bulk-loaded dataset is one group = full clustering). Zone
    * sidecars for `columns` are (re)built and registered, everything
    * publishes as ONE atomic metadata commit, and the replaced files
    * become unreferenced for [[garbageCollect]].
    */
  def clusterZOrder(
      spark: SparkSession,
      base: String,
      uuid: String,
      columns: Seq[String],
      targetFileBytes: Long = 128L * 1024 * 1024,
      scope: Predicates = Predicates.empty): DatasetMetadata = {
    val md = migrateInlineZones(spark, base, DatasetMetadata.load(spark, base, uuid))
    require(columns.nonEmpty && columns.size <= 8,
      s"z-order takes 1..8 columns, got ${columns.size}")
    val schema = md.schema
    columns.foreach { c =>
      require(schema.fieldNames.contains(c), s"z-order column '$c' not in schema")
      require(!md.partitionKeys.contains(c),
        s"z-order column '$c' is a partition key — directory layout already prunes it")
      val dt = schema(c).dataType
      require(dt.isInstanceOf[NumericType] || dt == DateType || dt == TimestampType,
        s"z-order column '$c' must be numeric/date/timestamp, got $dt")
    }
    if (md.partitions.isEmpty) return md
    val tableDir = md.tableDir(base)
    // optional partition scope (OPTIMIZE ZORDER ... WHERE): rewrite only
    // the matching partitions' files; quantile boundaries are computed
    // over the scoped set (zone pruning is per-file min/max, so scoped
    // boundaries only affect balance within the rewritten files)
    val inScope = partitionScope(md, scope, "z-order")
    val allLabels = md.partitions.keys.toSeq.filter(inScope).sorted
    if (allLabels.isEmpty) return md
    val untouched = md.partitions.keys.toSeq.filterNot(inScope).sorted
    def asDouble(c: String): org.apache.spark.sql.Column = schema(c).dataType match {
      case DateType      => unix_date(col(s"`$c`")).cast("double")
      case TimestampType => unix_micros(col(s"`$c`")).cast("double")
      case _             => col(s"`$c`").cast("double")
    }
    // one global quantile pass fixes the bucket boundaries — groups must
    // agree on them or ranges would only be tight within a group
    val probe = spark.read.option("basePath", tableDir)
      .parquet(allLabels.map(l => s"$tableDir/$l"): _*)
      .select(columns.zipWithIndex.map { case (c, i) => asDouble(c).as(s"__z$i") }: _*)
    val probs = (1 until graft.core.ZOrder.Buckets)
      .map(_.toDouble / graft.core.ZOrder.Buckets).toArray
    val boundaries = probe.stat.approxQuantile(
      columns.indices.map(i => s"__z$i").toArray, probs, 0.001)

    val bySeq: Map[Long, Seq[String]] =
      allLabels.groupBy(md.seqOf).map { case (s, ls) => s -> ls.sorted }
    val zc = "__graft_zrank"
    val movedBySeq = rewriteGroupsStaged(spark, base, md, bySeq) { (data, labels) =>
      val totalBytes = labels.map(md.sizeOf).sum
      val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
      val ranked = data.withColumn(zc,
        graft.core.ZOrder.rankColumn(columns.map(asDouble), boundaries))
      val parts = md.partitionKeys.map(c => col(s"`$c`")) :+ col(zc)
      // range partition AND sort within files on the rank: file-level
      // ranges are tight (zone pruning) and row groups inside follow
      ranked.repartitionByRange(nOut, parts: _*)
        .sortWithinPartitions(parts: _*)
        .drop(zc)
    }
    val newSeqOf = scala.collection.mutable.Map.empty[String, Long]
    movedBySeq.foreach { case (seq, ls) => ls.foreach { case (l, _) => newSeqOf(l) = seq } }
    val finalPartitions: Map[String, Long] =
      untouched.map(l => l -> md.sizeOf(l)).toMap ++ movedBySeq.flatMap(_._2)
    val finalSeq = finalPartitions.keys.map(l =>
      l -> newSeqOf.getOrElse(l, md.seqOf(l))).toMap
    val newLabels = newSeqOf.keys.toSeq.sorted

    // zone maps over the clustered columns are the POINT of the layout —
    // register any that are missing, then merge sidecars over the new
    // files (out-of-scope files survive with their existing entries).
    // Under a SCOPE, a brand-new zone column may only register if the
    // rewrite covers every file: zoneProbe pruning treats the sidecar as
    // TOTAL coverage, so a partial sidecar would silently drop every
    // out-of-scope file from predicate reads. Already-registered columns
    // merge incrementally (untouched labels keep their rows).
    val registrable =
      if (untouched.isEmpty) columns.filterNot(md.zoneRegistry.contains)
      else Nil
    val mdZ = md.copy(zones = md.zoneRegistry ++
      registrable.map(c => c -> newSidecarName(c)))
    val idxReg = mergeIndicesIncremental(spark, base, mdZ, tableDir,
      survivingOld = untouched, newLabels = newLabels)
    val bloomReg = mergeBloomsIncremental(spark, base, mdZ, tableDir,
      survivingOld = untouched, newLabels = newLabels)
    val zoneReg = mergeZonesIncremental(spark, base, mdZ, tableDir,
      survivingOld = untouched, newLabels = newLabels)
    val md1 = mdZ.copy(partitions = finalPartitions, partitionSeq = finalSeq,
      indices = idxReg, blooms = bloomReg, zones = zoneReg,
      // the rewritten files had their deletion vectors applied; fragments
      // covering only them drop, fragments for untouched files remain
      deletes = prunedDeleteFragments(spark, base, md, allLabels.toSet))
    DatasetMetadata.store(spark, base, md1, parentMd = Some(md),
      operation = "ZORDER")
  }

  // ------------------------------------------------------- two-phase write

  /** Phase 1 of the external-committer workflow (≙
    * create_empty_dataset_header, io/eager.py:642-714): commit a dataset
    * header — schema, partition keys, index registry — with NO partitions.
    * N independent jobs can then [[writePartition]] against it and a single
    * coordinator [[commit]]s once.
    */
  def createEmpty(
      spark: SparkSession,
      base: String,
      uuid: String,
      schema: StructType,
      partitionOn: Seq[String] = Nil,
      secondaryIndices: Seq[String] = Nil,
      overwrite: Boolean = false,
      userMetadata: Map[String, String] = Map.empty,
      zoneMapFor: Seq[String] = Nil,
      bloomFor: Seq[String] = Nil): DatasetMetadata = {
    if (!overwrite && DatasetMetadata.exists(spark, base, uuid))
      throw new IllegalStateException(s"Dataset '$uuid' already exists (pass overwrite=true)")
    if (overwrite) {
      // clear stale data files too, matching store(overwrite) — otherwise
      // a later writePartition would append beside invisible leftovers.
      // This deletes `_versions` and RESTARTS the version line at v1, so
      // any cached snapshots of the old line are poison — invalidate.
      DatasetMetadata.fs(spark, base).delete(new Path(s"$base/$uuid"), true)
      DatasetMetadata.invalidateCache(base, uuid)
    }
    partitionOn.foreach(c => require(schema.fieldNames.contains(c), s"partition_on column '$c' missing"))
    (secondaryIndices ++ zoneMapFor ++ bloomFor).foreach(c =>
      require(schema.fieldNames.contains(c), s"index/zone/bloom column '$c' not in schema"))
    val normalized = SchemaUtil.normalizeSchema(schema, partitionOn)
    val md = DatasetMetadata(
      uuid = uuid, partitionKeys = partitionOn,
      indices = secondaryIndices.map(c => c -> newSidecarName(c)).toMap,
      // registered zone/bloom columns start with no sidecar files; [[commit]]
      // builds them as partitions publish (probes treat absence as keep-all)
      zones = zoneMapFor.map(c => c -> newSidecarName(c)).toMap,
      blooms = bloomFor.map(c => c -> newSidecarName(c)).toMap,
      schemaJson = normalized.json, metadata = userMetadata)
    DatasetMetadata.store(spark, base, md, operation = "CREATE EMPTY")
  }

  /** Phase 2 (≙ write_single_partition, io/eager.py:717-773): write one
    * batch of files into the dataset directory WITHOUT touching the
    * metadata blob — invisible to readers until [[commit]]. Returns the new
    * labels to hand to the committer. Safe to run from many jobs
    * concurrently: file names are unique per write, and only [[commit]]
    * mutates metadata.
    */
  def writePartition(
      spark: SparkSession,
      base: String,
      uuid: String,
      df: DataFrame,
      sortBy: Seq[String] = Nil): Seq[String] = {
    val md = DatasetMetadata.load(spark, base, uuid)
    val tableDir = md.tableDir(base)
    SchemaUtil.validateCompatible(md.schema, SchemaUtil.normalizeSchema(df.schema, md.partitionKeys))
    val normalized = SchemaUtil.normalize(df, md.partitionKeys)
    val sorted =
      if (sortBy.nonEmpty) normalized.sortWithinPartitions(sortBy.map(c => col(s"`$c`")): _*)
      else normalized
    // labels come from the write job's commit manifest — no directory
    // listing, so concurrent writePartition jobs never observe each other
    // and cost stays O(batch) at any historical file count
    val newFiles = ManifestCommitProtocol.collecting(spark) {
      val writer = sorted.write.mode(SaveMode.Append)
      (if (md.partitionKeys.nonEmpty) writer.partitionBy(md.partitionKeys: _*) else writer)
        .parquet(tableDir)
    }
    val newLabels = newFiles.map(_._1).sorted
    if (newLabels.exists(_.contains("__HIVE_DEFAULT_PARTITION__")))
      throw new IllegalArgumentException("null values in partition columns are not allowed")
    newLabels
  }

  /** Phase 3 (≙ commit_dataset, io/eager.py:433-527): register the labels
    * produced by [[writePartition]] calls (plus an optional delete scope
    * over partition keys), build or merge secondary indices, and publish
    * everything in ONE metadata put — readers see the union atomically.
    */
  def commit(
      spark: SparkSession,
      base: String,
      uuid: String,
      newLabels: Seq[String],
      deleteScope: Predicates = Predicates.empty): DatasetMetadata = {
    val md = migrateInlineZones(spark, base, DatasetMetadata.load(spark, base, uuid))
    val tableDir = md.tableDir(base)
    // validate + size ONLY the labels being registered — O(newLabels)
    // point lookups, never a recursive listing of the table dir
    val fsys = DatasetMetadata.fs(spark, base)
    val newSizes: Map[String, Long] = newLabels.map { l =>
      val p = new Path(s"$tableDir/$l")
      val st = try fsys.getFileStatus(p) catch {
        case _: java.io.FileNotFoundException =>
          throw new IllegalArgumentException(s"label '$l' not found under $tableDir")
      }
      l -> st.getLen
    }.toMap

    val deleted: Set[String] =
      if (deleteScope.isEmpty) Set.empty
      else {
        deleteScope.columns.foreach(c => require(md.partitionKeys.contains(c),
          s"delete_scope column '$c' must be a partition key"))
        md.partitions.keySet.filter(l => deleteScope.matchesValues(md.partitionValues(l)))
      }
    val keepOld = md.partitions.keySet -- deleted
    val finalPartitions: Map[String, Long] =
      keepOld.map(l => l -> md.sizeOf(l)).toMap ++ newSizes
    val nextSeq = nextMonotoneSeq(md)
    val finalSeq = finalPartitions.keys.map { l =>
      l -> (if (newLabels.contains(l)) nextSeq else md.seqOf(l))
    }.toMap
    // provisional view with the FINAL partition set, for full index builds
    val md1p = md.copy(partitions = finalPartitions, partitionSeq = finalSeq)

    // indices: first commit (no file yet) builds from scratch over the full
    // final partition set; later commits merge incrementally exactly like
    // [[update]] — per column, so a mixed built/unbuilt registry stays exact
    val fsysI = DatasetMetadata.fs(spark, base)
    val idxReg = md.indices.toSeq.sortBy(_._1).map { case (c, cur) =>
      if (!fsysI.exists(new Path(md.indexPath(base, c)))) {
        if (finalPartitions.nonEmpty) {
          val name = newSidecarName(c)
          buildIndex(spark, base, md1p, c, name)
          c -> name
        } else c -> cur
      } else {
        val one = mergeIndicesIncremental(spark, base, md.copy(indices = Map(c -> cur)),
          tableDir, survivingOld = keepOld.toSeq.filter(finalPartitions.contains),
          newLabels = newLabels)
        c -> one(c)
      }
    }.toMap
    val bloomReg = mergeBloomsIncremental(spark, base, md, tableDir,
      survivingOld = keepOld.toSeq.filter(finalPartitions.contains),
      newLabels = newLabels)
    val zoneReg = mergeZonesIncremental(spark, base, md, tableDir,
      survivingOld = keepOld.toSeq.filter(finalPartitions.contains),
      newLabels = newLabels)
    val md1 = md1p.copy(indices = idxReg, blooms = bloomReg, zones = zoneReg,
      metadata = md.metadata + (DatasetMetadata.SeqHwmKey -> nextSeq.toString))

    DatasetMetadata.store(spark, base, md1, parentMd = Some(md),
      operation = "COMMIT PARTITIONS")
  }

  /** Register + build a secondary index on an EXISTING dataset
    * (≙ build_dataset_indices, io/eager.py): index job + metadata commit.
    */
  def addIndex(spark: SparkSession, base: String, uuid: String, column: String): DatasetMetadata = {
    val md = DatasetMetadata.load(spark, base, uuid)
    require(md.schema.fieldNames.contains(column), s"index column '$column' not in schema")
    val name = newSidecarName(column)
    buildIndex(spark, base, md, column, name)
    val md2 = md.copy(indices = md.indices + (column -> name))
    DatasetMetadata.store(spark, base, md2, parentMd = Some(md),
      operation = "ADD INDEX")
  }

  /** Dataset-merge join (≙ merge_datasets_as_delayed,
    * io_components/merge.py:25-128): join two datasets on their shared
    * columns (pandas-merge semantics: key columns appear once). The
    * reference aligns partitions by label to co-locate the join; on Spark
    * bucketing/AQE provide placement, so semantics reduce to a plain join
    * with both sides' predicates pushed into their own scans.
    *
    * `mergeFunc` is the custom merge hook (≙ MetaPartition.merge_dataframes'
    * `merge_func`, io_components/metapartition.py:983-1064): when given, it
    * receives the two predicate-filtered DataFrames and fully replaces the
    * default shared-column join — any Spark combination (asof join, union,
    * custom keying) plugs in.
    *
    * SIDE EFFECT when both datasets share partition keys: enables the three
    * SPJ session confs (v2.bucketing.enabled, pushPartValues.enabled,
    * requireAllClusterKeysForCoPartition=false) and CANNOT restore them —
    * they must still hold when the caller's action plans the returned
    * DataFrame. They persist for the session and may change plan selection
    * for other DSv2 joins; wrap execution in
    * `SparkEntry.withVolatileConfs` (or save/restore the keys yourself) to
    * scope them.
    */
  def mergeDatasets(
      spark: SparkSession,
      base: String,
      leftUuid: String,
      rightUuid: String,
      how: String = "inner",
      predicates: Predicates = Predicates.empty,
      mergeFunc: Option[(DataFrame, DataFrame) => DataFrame] = None): DataFrame = {
    val l = DatasetMetadata.load(spark, base, leftUuid)
    val r = DatasetMetadata.load(spark, base, rightUuid)
    val lp = predicates.restrictToColumns(l.schema.fieldNames.toSet).getOrElse(Predicates.empty)
    val rp = predicates.restrictToColumns(r.schema.fieldNames.toSet).getOrElse(Predicates.empty)
    // Co-partitioned datasets merge as a storage-partitioned join: both
    // sides read through the keyed DSv2 scan, which reports
    // KeyGroupedPartitioning over the shared partition columns, so the join
    // plans with ZERO Exchange — the Spark-native form of the reference's
    // partition-aligned merge (io_components/merge.py:25-128 zips
    // equal-labelled partitions pairwise). At 100 TB this is the difference
    // between shuffling both datasets and shuffling nothing.
    val colocated = l.partitionKeys.nonEmpty && l.partitionKeys == r.partitionKeys
    def readSide(md: DatasetMetadata, p: Predicates): DataFrame = {
      val df =
        if (colocated) {
          spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
          spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
          // join keys = ALL shared columns, a superset of the partition
          // keys; co-partitioning on the key subset is still valid
          spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
          spark.read.format("graft").option("uuid", md.uuid).option("keyed", "true").load(base)
        } else readTableWithMetadata(spark, base, md, predicates = p)
      if (colocated && !p.isEmpty) df.filter(p.toColumn) else df
    }
    val leftDf = readSide(l, lp)
    val rightDf = readSide(r, rp)
    mergeFunc match {
      case Some(f) => f(leftDf, rightDf)
      case None =>
        val shared = (l.schema.fieldNames.toSet intersect r.schema.fieldNames.toSet).toSeq.sorted
        require(shared.nonEmpty, s"datasets '$leftUuid' and '$rightUuid' share no columns")
        leftDf.join(rightDf, shared, how)
    }
  }

  // ---------------------------------------------------------------- gc / copy

  /** Delete files under the dataset dir not referenced by metadata
    * (≙ garbage_collect_dataset, io_components/gc.py:8-55).
    * Returns deleted keys.
    */
  /** Run `attempt` with optimistic-concurrency retries: on
    * [[ConcurrentCommitException]] the closure re-runs (it must RELOAD and
    * re-derive its commit — the helper only handles the retry loop and
    * backoff). The pattern for multi-writer datasets:
    * {{{
    *   Ktk.withCommitRetries() { Ktk.update(spark, base, uuid, Some(batch)) }
    * }}}
    * Each update re-reads the current metadata internally, so re-running
    * the call IS the correct conflict resolution for append-style commits;
    * read-modify-write flows must re-derive their decision inside the
    * closure.
    */
  def withCommitRetries[T](maxRetries: Int = 5, backoffMs: Long = 50L)(
      attempt: => T): T = {
    var tries = 0
    while (true) {
      try return attempt
      catch {
        case e: ConcurrentCommitException =>
          tries += 1
          if (tries > maxRetries) throw e
          // full-jitter, same rationale as update's append fast path:
          // deterministic sleeps resynchronize lost racers under fan-in
          Thread.sleep(java.util.concurrent.ThreadLocalRandom.current()
            .nextLong(backoffMs * tries + 1))
      }
    }
    throw new IllegalStateException("unreachable")
  }

  // ------------------------------------------------------- versioning

  /** All commit versions still materialized as snapshots (ascending).
    * Every commit writes an immutable `_versions/v<n>.json` snapshot next
    * to the latest-pointer blob; [[garbageCollect]] prunes them by its
    * retention setting.
    */
  def listVersions(spark: SparkSession, base: String, uuid: String): Seq[Long] =
    DatasetMetadata.listVersions(spark, base, uuid)

  /** Time travel: read the dataset EXACTLY as of commit `version` (Delta /
    * Iceberg-style snapshot read). Works until [[garbageCollect]] reclaims
    * the snapshot or its files — gc's `retainVersions` controls how much
    * history survives maintenance.
    *
    * Sidecar pruning APPLIES on as-of reads for version-addressed
    * (nonce-named) sidecars: those dirs are never rewritten after the
    * snapshot referenced them (append-only commits only add rows for
    * labels the snapshot doesn't contain, which every probe tolerates), so
    * the snapshot's own registries are trustworthy — the full four-layer
    * skipping stack survives time travel. Only LEGACY fixed-name sidecars
    * (`<col>.parquet`, rewritten in place by pre-r6 commits) are dropped,
    * conservatively. Inline zone maps live in the snapshot blob itself and
    * are always safe.
    */
  def readTableAsOf(
      spark: SparkSession,
      base: String,
      uuid: String,
      version: Long,
      columns: Seq[String] = Nil,
      predicates: Predicates = Predicates.empty): DataFrame = {
    val snap = DatasetMetadata.loadVersion(spark, base, uuid, version)
    def trusted(reg: Map[String, String]): Map[String, String] =
      reg.filter { case (c, n) => isVersionAddressed(c, n) }
    val md = snap.copy(
      indices = trusted(snap.indices),
      blooms = trusted(snap.bloomRegistry),
      zones = trusted(snap.zoneRegistry))
    readTableWithMetadata(spark, base, md, columns, predicates)
  }

  /** Restore the dataset to the CONTENT of `toVersion` as a NEW commit
    * (roll-forward, ≙ Delta RESTORE — history is never rewritten, so
    * concurrent readers and the optimistic-concurrency chain stay intact).
    * Fails cleanly when the target's data files have already been
    * garbage-collected. Version-addressed sidecars whose files still exist
    * are RE-ADOPTED as-is (they are immutable and exactly describe the
    * restored content — no rebuild cost); legacy or vacuumed ones are
    * rebuilt against the restored partition set.
    */
  def rollback(spark: SparkSession, base: String, uuid: String, toVersion: Long): DatasetMetadata = {
    val cur = DatasetMetadata.load(spark, base, uuid)
    require(toVersion != cur.version,
      s"dataset '$uuid' is already at version ${cur.version}")
    val target = DatasetMetadata.loadVersion(spark, base, uuid, toVersion)
    val fsys = DatasetMetadata.fs(spark, base)
    val tableDir = cur.tableDir(base)
    // only files absent from the CURRENT commit can have been gc'd —
    // point lookups on exactly that difference, not an O(#files) walk
    val missing = (target.partitions.keySet -- cur.partitions.keySet)
      .filterNot(l => fsys.exists(new Path(s"$tableDir/$l")))
    if (missing.nonEmpty)
      throw new IllegalStateException(
        s"cannot roll back '$uuid' to version $toVersion: ${missing.size} data " +
          s"file(s) were garbage-collected (e.g. '${missing.head}'); " +
          "run gc with retainVersions > 0 to keep history restorable")
    // deletion-vector fragments are part of the target's CONTENT (reads
    // are wrong without them) — unlike pruning sidecars they cannot be
    // dropped-and-rebuilt, so a vacuumed fragment blocks the rollback
    val missingDv = (target.deleteFragments.toSet -- cur.deleteFragments.toSet)
      .filterNot(n => fsys.exists(new Path(target.deletePath(base, n))))
    if (missingDv.nonEmpty)
      throw new IllegalStateException(
        s"cannot roll back '$uuid' to version $toVersion: ${missingDv.size} deletion-" +
          s"vector fragment(s) were garbage-collected (e.g. '${missingDv.head}')")
    // the seq high watermark must survive the rollback: restoring the
    // TARGET's (older) hwm would let a post-rollback commit reuse sequence
    // numbers assigned between toVersion and now, and the change feed
    // (which filters on seq > checkpoint) would silently drop those rows —
    // carry forward the max over both commits' hwm and every assigned seq
    val hwm = Seq(
      target.metadata.get(DatasetMetadata.SeqHwmKey).map(_.toLong).getOrElse(0L),
      cur.metadata.get(DatasetMetadata.SeqHwmKey).map(_.toLong).getOrElse(0L),
      (0L +: cur.partitions.keys.toSeq.map(cur.seqOf)).max).max
    // re-adopt the target's version-addressed sidecars that still exist —
    // immutable, so they describe the restored content exactly
    def surviving(reg: Map[String, String], dir: String): Map[String, String] =
      reg.filter { case (c, n) =>
        isVersionAddressed(c, n) && fsys.exists(new Path(s"$base/$uuid/$dir/$n")) }
    val keptIdx = surviving(target.indices, IndexDirName)
    val keptBlm = surviving(target.bloomRegistry, "blooms")
    val keptZon = surviving(target.zoneRegistry, "zones")
    val restored = target.copy(
      indices = keptIdx, blooms = keptBlm, zones = keptZon,
      metadata = target.metadata +
        (DatasetMetadata.VersionKey -> cur.version.toString) +
        (DatasetMetadata.SeqHwmKey -> hwm.toString) +
        // re-sync signal for change-feed consumers (rollbackVersions):
        // keyed by the rollback commit's OWN version so inherited copies
        // on later commits don't read as rollbacks
        (DatasetMetadata.RollbackCommitKey -> (cur.version + 1).toString) +
        (DatasetMetadata.RollbackOfKey -> toVersion.toString))
    var out = DatasetMetadata.store(spark, base, restored, parentMd = Some(cur),
      operation = "ROLLBACK")
    (target.indices.keySet -- keptIdx.keySet).toSeq.sorted
      .foreach(c => out = addIndex(spark, base, uuid, c))
    (target.bloomRegistry.keySet -- keptBlm.keySet).toSeq.sorted
      .foreach(c => out = addBloom(spark, base, uuid, c))
    // inline zone maps travel INSIDE the restored blob and stay readable
    // directly; only vacuumed sidecar-registry columns need a rebuild
    val missingZones =
      (target.zoneRegistry.keySet -- keptZon.keySet -- target.inlineZoneMaps.keySet).toSeq.sorted
    if (missingZones.nonEmpty) out = addZoneMaps(spark, base, uuid, missingZones)
    out
  }

  /** Recursive file enumeration via a listStatus walk — NEVER
    * `FileSystem.listFiles(recursive)`: that API materializes
    * `LocatedFileStatus`es, whose construction copies permissions, and on
    * a RawLocalFileSystem without the native-hadoop library the
    * permission load EXECs `ls -ld` PER FILE (measured here: 400 files in
    * 2.13 s via listFiles vs a 20k-file listStatus walk in 0.51 s —
    * ~260× per file). No caller of these walks reads permissions or
    * block locations, so the copy buys nothing. On object stores this
    * trades the flat prefix LIST for one LIST per directory; the big
    * walks (fsck/gc/salvage) recurse DISTRIBUTED per first-level
    * directory (see [[listTableFilesCore]]), so each task issues its
    * directory fan-out in requests, not its file count.
    */
  private[graft] def walkFiles(fs: org.apache.hadoop.fs.FileSystem, root: Path)(
      f: org.apache.hadoop.fs.FileStatus => Unit): Unit = {
    val stack = scala.collection.mutable.Stack(root)
    while (stack.nonEmpty) {
      fs.listStatus(stack.pop()).foreach { st =>
        if (st.isDirectory) { stack.push(st.getPath); () }
        else if (st.isFile) f(st) // isFile, not !isDirectory: skip symlinks
      }
    }
  }

  /** Recursively list the DATA files under `table/` as table-relative
    * paths (labels), skipping `_`/`.` names. Small trees list on the
    * driver; past [[ParallelListThreshold]] first-level directories the
    * per-directory recursions run as a Spark job (the InMemoryFileIndex
    * parallel-discovery pattern) — a 100 TB table's maintenance pass
    * (gc, fsck) must not serialize a million object-store LIST calls
    * through the driver.
    */
  private[graft] val ParallelListThreshold = 32

  /** Core listing shared by [[listTableFiles]] and [[listTableFilesDS]]:
    * top-level files always list on the driver; subdirectory recursion is
    * either a driver walk (≤ threshold first-level dirs) or an RDD of
    * per-directory recursions (Right) that callers can keep distributed.
    */
  /** Past this many TOP-LEVEL files the driver stops retaining their
    * labels and the flat remainder re-lists inside the Spark job: an
    * UNPARTITIONED table accumulates every file in `table/` itself, where
    * the directory-count trigger above never fires — without this cap a
    * million-file flat table would funnel a million labels through the
    * driver on every maintenance pass. The root statuses still STREAM
    * through the driver once (listStatusIterator, O(1) retained) to
    * discover subdirectories; only label RETENTION is capped.
    */
  private[graft] val FlatListThreshold = 100000

  private def listTableFilesCore(
      spark: SparkSession, fsys: org.apache.hadoop.fs.FileSystem,
      tableRoot: Path, threshold: Int,
      flatThreshold: Int = FlatListThreshold)
      : (Seq[String], Either[Seq[String], org.apache.spark.rdd.RDD[String]]) = {
    if (!fsys.exists(tableRoot)) return (Nil, Left(Nil))
    // the `_`/`.` filter applies to LEAF FILE NAMES ONLY (matching the
    // old recursive walk): a partition COLUMN may legally start with '_'
    // (UrlCodec keeps it), so directories always recurse
    def keep(name: String): Boolean = !name.startsWith("_") && !name.startsWith(".")
    // relativize against the EXACT qualified root, never a path pattern: a
    // component under the root that happens to be named like the root dir
    // must not shift the label, because gc deletes by label difference and a
    // wrong label is a wrong delete
    val prefix = tableRoot.toString + "/"
    def rel(p: String): String = stripLabelPrefix(p, prefix)
    // stream the root listing: retain dir paths + at most flatThreshold
    // top-level labels; a flat overflow re-lists the root distributed
    val dirs = scala.collection.mutable.ArrayBuffer.empty[Path]
    val topKept = scala.collection.mutable.ArrayBuffer.empty[String]
    var topOverflow = false
    val rootIt = fsys.listStatusIterator(tableRoot)
    while (rootIt.hasNext) {
      val st = rootIt.next()
      if (st.isDirectory) dirs += st.getPath
      else if (st.isFile && keep(st.getPath.getName)) {
        if (topKept.size < flatThreshold) topKept += rel(st.getPath.toString)
        else topOverflow = true
      }
    }
    val topFiles = if (topOverflow) Nil else topKept.toSeq
    val subFiles: Either[Seq[String], org.apache.spark.rdd.RDD[String]] =
      if (!topOverflow && dirs.length <= threshold) {
        Left(dirs.toSeq.flatMap { d =>
          val out = Seq.newBuilder[String]
          walkFiles(fsys, d) { st =>
            if (keep(st.getPath.getName)) out += rel(st.getPath.toString)
          }
          out.result()
        })
      } else {
        val conf = new org.apache.spark.util.SerializableConfiguration(
          spark.sessionState.newHadoopConf())
        // work item = (path, recurse): subdirectories walk recursively; on
        // flat overflow the ROOT re-lists its own files only (its subdirs
        // are already separate items)
        val items: Seq[(String, Boolean)] =
          dirs.map(_.toString -> true).toSeq ++
            (if (topOverflow) Seq(tableRoot.toString -> false) else Nil)
        Right(spark.sparkContext.parallelize(items, math.min(64, items.size))
          .flatMap { case (ds, recurse) =>
            val p = new Path(ds)
            val f = p.getFileSystem(conf.value)
            val out = Seq.newBuilder[String]
            def emit(st: org.apache.hadoop.fs.FileStatus): Unit = {
              val name = st.getPath.getName
              if (!name.startsWith("_") && !name.startsWith("."))
                out += stripLabelPrefix(st.getPath.toString, prefix)
            }
            if (recurse) walkFiles(f, p)(emit)
            else {
              val it = f.listStatusIterator(p)
              while (it.hasNext) {
                val st = it.next()
                if (st.isFile) emit(st)
              }
            }
            out.result()
          })
      }
    (topFiles, subFiles)
  }

  private[graft] def listTableFiles(
      spark: SparkSession, fsys: org.apache.hadoop.fs.FileSystem,
      tableRoot: Path, threshold: Int = ParallelListThreshold,
      flatThreshold: Int = FlatListThreshold): Seq[String] =
    listTableFilesCore(spark, fsys, tableRoot, threshold, flatThreshold) match {
      case (top, Left(sub))  => top ++ sub
      case (top, Right(rdd)) => top ++ rdd.collect()
    }

  /** The listing as a Dataset of labels that STAYS DISTRIBUTED when the
    * parallel branch fires — the input side of [[fsck]]/[[salvage]]'s
    * anti-join diff, which at 100 TB metadata sizes must not funnel a
    * million label strings through a driver Set.
    */
  private[graft] def listTableFilesDS(
      spark: SparkSession, fsys: org.apache.hadoop.fs.FileSystem,
      tableRoot: Path, threshold: Int = ParallelListThreshold,
      flatThreshold: Int = FlatListThreshold)
      : org.apache.spark.sql.Dataset[String] = {
    import spark.implicits._
    listTableFilesCore(spark, fsys, tableRoot, threshold, flatThreshold) match {
      case (top, Left(sub))  => (top ++ sub).toDS()
      case (top, Right(rdd)) =>
        val topDs =
          if (top.isEmpty) spark.emptyDataset[String] else top.toDS()
        topDs.union(spark.createDataset(rdd))
    }
  }

  /** Exact-prefix label relativization, loud on mismatch: the caller hands
    * the qualified table root, and a listed path that does not start with it
    * means the two sides qualified differently — guessing a label there
    * risks attributing (and in gc, DELETING) the wrong file.
    */
  private[graft] def stripLabelPrefix(path: String, prefix: String): String = {
    // normalize the URI form first: PartitionedFile renders `file:///x`
    // where Path.toString (the prefix's form) renders `file:/x`
    val norm = new Path(path).toString
    if (!norm.startsWith(prefix))
      throw new IllegalStateException(
        s"listed file '$norm' is not under the qualified table root '$prefix' — " +
          "refusing to guess its table-relative label")
    norm.substring(prefix.length)
  }

  /** Past this many (label × retained-version) attribution pairs, fsck and
    * salvage compute referenced-vs-present as DataFrame anti-joins instead
    * of driver-side Sets/Maps — same threshold pattern as the parallel
    * listing: a 1M-file table with deep retained history would otherwise
    * cost O(100M) driver map operations and hundreds of MB of label
    * strings (the Delta-VACUUM driver bottleneck). fsck ESTIMATES the
    * count as (newest reachable snapshot's labels × retained versions) so
    * the mode decision itself never loads the full history; both sides of
    * the threshold are exact and FsckSpec pins their parity at 0.
    */
  private[graft] val DistributedDiffThreshold = 2 * 1000 * 1000

  /** Ship driver-resident (version, labels) references to executors for
    * [[salvage]]'s distributed missing-data diff (the CURRENT snapshot is
    * already on the driver there — the repair commit rewrites it — so
    * shipping its label references beats re-reading the record).
    * [[fsck]]'s multi-version side no longer goes through here: its
    * distributed mode reconstructs every retained version from a record
    * scan without materializing snapshots at all ([[distributedAudit]]).
    * ONE `parallelize` call over bounded slices; the (label, version)
    * tupling runs in the executor flatMap.
    */
  private def parallelizeLabels(
      spark: SparkSession, perVersion: Seq[(Long, Seq[String])]): org.apache.spark.rdd.RDD[(String, Long)] = {
    val slices: Seq[(Long, Seq[String])] = perVersion.flatMap { case (v, ls) =>
      if (ls.size <= 100000) Seq(v -> ls)
      else ls.grouped(100000).map(v -> _).toSeq
    }
    spark.sparkContext
      .parallelize(slices, math.max(1, math.min(64, slices.size)))
      .flatMap { case (v, ls) => ls.iterator.map((_, v)) }
  }

  /** Integrity audit (the FSCK verb of operational table formats),
    * METADATA-DRIVEN and strictly read-only: verifies that everything the
    * retained commit history references still exists in storage, and
    * previews unreferenced leftovers gc would reap. One recursive listing
    * of `table/` + O(retained versions) commit-record reads — cached
    * snapshot loads on small tables, a distributed record scan that never
    * materializes a snapshot on the driver past [[DistributedDiffThreshold]]
    * ([[distributedAudit]]) — no data pages read, safe against a live
    * table at any size. Rows
    * `(kind, version, path)`, `version` = the newest retained commit
    * affected:
    *
    *  - `missing_dv_fragment` — tombstones GONE: reads would silently
    *    RESURRECT deleted rows (the one silent-corruption case; first);
    *  - `missing_data_file` — a retained snapshot references a vanished
    *    file: reads of that version fail;
    *  - `missing_index` / `missing_bloom` / `missing_zone` — registry
    *    entry whose sidecar is gone (index reads fail; bloom/zone pruning
    *    silently degrades to keep-all);
    *  - `broken_replay_chain` — a version whose delta chain no longer
    *    reaches a checkpoint (unreachable for time travel); `version` is
    *    the stranded commit, `path` the MISSING record that severed it
    *    (the one an operator can restore);
    *  - `orphan_file` — present under `table/`, referenced by NO retained
    *    version (gc-candidate preview, not a fault). The ONE unbounded
    *    fault class (O(garbage), not O(damage)): listed rows cap at
    *    `spark.graft.fsck.orphanLimit` (sorted, deterministic), with an
    *    `orphan_overflow` row carrying the FULL count in `version` when
    *    truncated — a million-orphan table audits with a bounded driver.
    *
    * Output order is deterministic in BOTH diff modes: the final
    * `(kind, path, version)` sort normalizes whatever order the
    * driver maps or the distributed anti-join collects produced.
    */
  def fsck(spark: SparkSession, base: String, uuid: String,
      diffThreshold: Int = SessionDiffThreshold): DataFrame = {
    import spark.implicits._
    val fs = DatasetMetadata.fs(spark, base)
    val issues = Seq.newBuilder[(String, Long, String)]
    val versions = DatasetMetadata.listVersions(spark, base, uuid)
    // replay-chain reachability is audited from STORAGE record names, never
    // through loadVersion: this JVM's snapshot cache would mask a vacuumed
    // record that strands every FRESH reader (the fault fsck exists to
    // find). One listing + at most one tiny delta read per non-checkpoint
    // version (self-contained deltas terminate chains like checkpoints).
    val recordSizes = versionRecordSizes(spark, fs, base, uuid)
    val recordNames = recordSizes.keySet
    val (chainStarts, brokenChains) =
      resolveChains(spark, base, uuid, versions, recordNames)
    brokenChains.foreach { case (v, gap) =>
      issues += (("broken_replay_chain", v,
        DatasetMetadata.versionDeltaKey(base, uuid, gap)))
    }
    val reachable = chainStarts.map(_._1)
    // one (parallel-capable) listing answers both data-file checks
    val tableRoot = fs.makeQualified(new Path(s"$base/$uuid/table"))
    def labelsOf(md: DatasetMetadata): scala.collection.Iterable[String] =
      Option(md.partitions).getOrElse(Map.empty[String, Long]).keys
    // the mode decision must not itself materialize every snapshot, so the
    // pair count is ESTIMATED ([[estimatePairs]]): newest reachable
    // snapshot × retained count, floored by total record bytes so a
    // mass-delete-shrunk current snapshot can't hide huge old checkpoints
    val newestMd = reachable.lastOption
      .map(v => DatasetMetadata.loadVersion(spark, base, uuid, v))
    val estimatedPairs = estimatePairs(
      newestMd.map(labelsOf(_).size.toLong).getOrElse(0L),
      reachable.size, recordSizes)
    val threshold = auditThreshold(spark, diffThreshold)
    lastAuditDistributed.set(estimatedPairs > threshold)
    val sidecarRefs: Seq[(String, Long, String)] =
      if (estimatedPairs <= threshold) {
        val loaded: Seq[(Long, DatasetMetadata)] =
          reachable.map(v => v -> DatasetMetadata.loadVersion(spark, base, uuid, v))
        val present: Set[String] = listTableFiles(spark, fs, tableRoot).toSet
        // newest version referencing each label wins the attribution
        // (Option-guarded: absent fields deserialize to null on old blobs)
        val referenced = scala.collection.mutable.Map.empty[String, Long]
        loaded.foreach { case (v, md) =>
          labelsOf(md).foreach(l => referenced(l) =
            math.max(referenced.getOrElse(l, Long.MinValue), v))
        }
        referenced.toSeq.sorted.foreach { case (label, v) =>
          if (!present.contains(label)) issues += (("missing_data_file", v, label))
        }
        val orphans = present.toSeq.sorted.filterNot(referenced.contains)
        val cap = orphanLimit(spark)
        orphans.take(cap).foreach(l => issues += (("orphan_file", -1L, l)))
        if (orphans.size > cap)
          issues += (("orphan_overflow", orphans.size.toLong, overflowMsg(orphans.size.toLong, cap)))
        loaded.flatMap { case (v, md) =>
          md.deleteFragments.map(("missing_dv_fragment", v, _)) ++
            Option(md.indices).getOrElse(Map.empty[String, String]).values
              .map(("missing_index", v, _)) ++
            md.bloomRegistry.values.map(("missing_bloom", v, _)) ++
            md.zoneRegistry.values.map(("missing_zone", v, _))
        }
      } else {
        // DISTRIBUTED diff with NO driver-side snapshots at all: the
        // retained states are reconstructed from a distributed scan of the
        // commit records themselves. Every record carries its version's
        // complete sidecar registries plus either the full label set
        // (checkpoints, self-contained deltas) or its adds/removes; a
        // version's referenced labels are exactly "the LAST record in its
        // chain window [start, v] that touched the label said add" — an
        // argmax over (record version, isAdd), with isAdd breaking the
        // same-record tie the way applyDelta does (adds win over removes).
        // Driver memory: ONE snapshot (the estimate above) + fault rows +
        // registry-sized sidecar refs; the per-version label maps never
        // exist anywhere — not even on executors, which stream (rv, label,
        // isAdd) tuples straight out of Jackson parses. Measured in
        // StressFsck.
        distributedAudit(spark, fs, base, uuid, tableRoot, chainStarts,
          hasFullIn(recordNames), issues)
      }
    // sidecars + fragments: newest referencing version attributed, one
    // existence probe per distinct name (registries are metadata-sized)
    val sidecarDirs = Map(
      "missing_dv_fragment" -> DatasetMetadata.DeletesDirName,
      "missing_index" -> IndexDirName,
      "missing_bloom" -> "blooms",
      "missing_zone" -> "zones")
    sidecarRefs.groupMapReduce(r => (r._1, r._3))(_._2)(math.max)
      .toSeq.sortBy { case ((k, n), v) => (k, n, v) }
      .foreach { case ((kind, name), v) =>
        if (sidecarMissing(fs, base, uuid, sidecarDirs(kind), name))
          issues += ((kind, v, s"${sidecarDirs(kind)}/$name"))
      }
    val order = Seq("missing_dv_fragment", "missing_data_file", "missing_index",
      "missing_bloom", "missing_zone", "broken_replay_chain", "orphan_file",
      "orphan_overflow").zipWithIndex.toMap
    issues.result().sortBy { case (k, v, p) => (order(k), p, v) }
      .toDF("kind", "version", "path")
  }

  /** One `_versions` listing as name → byte size — the storage-truth
    * input of chain resolution (never the snapshot cache: a vacuumed
    * record that strands FRESH readers is exactly what the audits exist
    * to find). Sizes feed the pair-count estimate below.
    */
  private[graft] def versionRecordSizes(
      spark: SparkSession, fs: org.apache.hadoop.fs.FileSystem,
      base: String, uuid: String): Map[String, Long] =
    try fs.listStatus(new Path(DatasetMetadata.versionsDir(base, uuid)))
      .map(st => st.getPath.getName -> st.getLen).toMap
    catch { case _: java.io.FileNotFoundException => Map.empty }

  /** Default `diffThreshold` argument: "not explicitly set" — resolve via
    * the session conf, falling back to [[DistributedDiffThreshold]]. A
    * NEGATIVE sentinel (rather than the constant itself) so a caller
    * deliberately passing `DistributedDiffThreshold` is honored verbatim
    * instead of being silently overridden by the conf.
    */
  private[graft] val SessionDiffThreshold = -1

  /** Default cap on the names a maintenance verb's REPORT returns through
    * the driver (gc's reclaimed paths, salvage's dropped references). The
    * full count always reports; only the listed sample is bounded.
    */
  val DefaultMaintenanceReportLimit = 10000

  /** Bounded [[garbageCollectReport]] result: the full reclaimed count,
    * whether the listed sample was truncated, and at most `reportLimit`
    * reclaimed paths.
    */
  final case class GcReport(reclaimedCount: Long, truncated: Boolean,
      reclaimed: Seq[String])

  /** Bounded [[salvageReport]] result: the full dropped-reference count,
    * whether the listed sample was truncated, and at most `reportLimit`
    * `(kind, path)` references.
    */
  final case class SalvageReport(droppedCount: Long, truncated: Boolean,
      dropped: Seq[(String, String)])

  /** Cap on the `orphan_file` rows [[fsck]] lists (`orphan_overflow`
    * carries the full count past it): the one fault class whose
    * cardinality is O(garbage) rather than O(damage), so it must not
    * return a million rows through the driver. Tunable per session.
    */
  private def orphanLimit(spark: SparkSession): Int = {
    val key = "spark.graft.fsck.orphanLimit"
    spark.conf.getOption(key).map { s =>
      val cap =
        try s.trim.toInt
        catch {
          case e: NumberFormatException =>
            throw new IllegalArgumentException(
              s"invalid $key='$s': must be an integer row cap", e)
        }
      // zero/negative caps would make the two fsck modes diverge (the
      // driver path previews empty; the distributed path's .limit(cap)
      // throws mid-audit) — reject up front, same style as the parse error
      if (cap <= 0) throw new IllegalArgumentException(
        s"invalid $key=$cap: must be a positive row cap")
      cap
    }.getOrElse(DefaultMaintenanceReportLimit * 10)
  }

  private def overflowMsg(total: Long, cap: Int): String =
    s"$total orphan files total; listing the first $cap " +
      "(raise spark.graft.fsck.orphanLimit to list more, or gc to reap)"

  /** Resolve the audit threshold: any explicit (non-negative) caller value
    * wins; the [[SessionDiffThreshold]] sentinel consults
    * `spark.graft.audit.diffThreshold` so operators can tune the
    * driver-vs-distributed switch per session without code.
    */
  private def auditThreshold(spark: SparkSession, requested: Int): Int =
    if (requested >= 0) requested
    else {
      val key = "spark.graft.audit.diffThreshold"
      spark.conf.getOption(key).map { s =>
        try s.trim.toInt
        catch {
          case e: NumberFormatException =>
            throw new IllegalArgumentException(
              s"invalid $key='$s': must be an integer attribution-pair count " +
                "(the driver-vs-distributed audit mode switch)", e)
        }
      }.getOrElse(DistributedDiffThreshold)
    }

  /** Test observability: did the last fsck/gc on this JVM take the
    * distributed record-scan path? (Same pattern as lastMergeCandidates.)
    */
  private[graft] val lastAuditDistributed =
    new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Attribution-pair estimate for the driver-vs-distributed mode choice:
    * the max of (newest snapshot's labels × retained count) and (total
    * record bytes ÷ ~64 B per JSON label entry). The first alone would
    * UNDERESTIMATE a table whose current snapshot shrank after mass
    * deletes while old checkpoints stayed huge — exactly when driver-mode
    * loading hurts most; record bytes can't shrink behind the estimate.
    * Both sides of the threshold are exact, so over-estimating only
    * trades a little wall time for bounded driver memory.
    */
  private def estimatePairs(
      newestLabels: Long, retainedCount: Int,
      recordSizes: Map[String, Long]): Long =
    math.max(newestLabels * retainedCount, recordSizes.valuesIterator.sum / 64)

  private[graft] def hasFullIn(recordNames: Set[String])(k: Long): Boolean =
    recordNames.contains(f"v$k%08d.json")

  /** Resolve each version's replay chain from STORAGE record names:
    * returns (reachable `(v, chainStart)` pairs, broken `(v, gapRecord)`
    * pairs) — `chainStart` is the checkpoint / self-contained record the
    * replay folds forward from (the CHAIN WINDOW `[start, v]`), `gapRecord`
    * the MISSING record an operator could restore. At most one tiny delta
    * read per non-checkpoint version (for the self-contained flag).
    */
  private[graft] def resolveChains(
      spark: SparkSession, base: String, uuid: String,
      versions: Seq[Long], recordNames: Set[String])
      : (Seq[(Long, Long)], Seq[(Long, Long)]) = {
    val hasFull = hasFullIn(recordNames) _
    def hasDelta(k: Long): Boolean = recordNames.contains(f"v$k%08d.delta.json")
    val selfContained = scala.collection.mutable.Map.empty[Long, Boolean]
    def resolve(v: Long): Either[Long, Long] = {
      var k = v
      while (k >= 1) {
        if (hasFull(k)) return Right(k)
        if (!hasDelta(k)) return Left(k)
        if (selfContained.getOrElseUpdate(k,
            DatasetMetadata.readDeltaRecord(spark, base, uuid, k).full)) return Right(k)
        k -= 1
      }
      Left(0L)
    }
    val (ok, broken) = versions.map(v => v -> resolve(v)).partition(_._2.isRight)
    (ok.collect { case (v, Right(s)) => (v, s) },
      broken.collect { case (v, Left(g)) => (v, g) })
  }

  /** Distributed scan of a dataset's commit records — the shared engine
    * behind [[fsck]]'s and [[garbageCollect]]'s big-table modes, where the
    * retained history is reconstructed WITHOUT ever materializing a
    * snapshot on the driver. Each record parses ON EXECUTORS into a
    * stream of `(recordVersion, kind, name, isAdd)` tuples (labels from
    * checkpoint snapshots / delta adds+removes; sidecar registries, which
    * every record carries in full); a version's referenced label set is
    * the last-op-wins argmax over its replay window `[chainStart, v]` —
    * exactly what `applyDelta` folding computes, including the
    * same-record tie (a label in both adds and removes resolves to add,
    * because `isAdd` is the struct's second sort key).
    *
    * Driver memory: registry-sized sidecar refs + whatever the caller
    * collects (fsck: fault rows; gc: orphan names). Executor memory: one
    * record's parse at a time. Scan cost is bounded by
    * `CheckpointEvery × (labels × versions)` shuffled rows — horizontal,
    * never vertical. Callers MUST `close()` to release the persisted
    * frames once their actions ran.
    */
  private[graft] final class CommitRecordScan(
      spark: SparkSession, base: String, uuid: String,
      chainStarts: Seq[(Long, Long)], hasFull: Long => Boolean) {
    private val windows: Seq[(Long, Long)] =
      chainStarts.flatMap { case (v, start) => (start to v).map(v -> _) }
    private val targetVersions = chainStarts.map(_._1)

    /** `(rv, kind, name, isAdd, size)` for every record in any replay
      * window: labels (with the add's byte size), sidecar registry entries,
      * and the per-record `meta_*` scalars [[Ktk.historyDistributed]]
      * consumes (commit-ts, operation verb when stamped BY the record's own
      * commit, rollback target).
      */
    val recRows: DataFrame = {
      val conf = new org.apache.spark.util.SerializableConfiguration(
        spark.sessionState.newHadoopConf())
      val recs: Seq[(Long, String, Boolean)] =
        windows.map(_._2).distinct.sorted.map { rv =>
          val full = hasFull(rv) // loadVersion's preference: checkpoint over delta
          (rv,
            if (full) DatasetMetadata.versionKey(base, uuid, rv)
            else DatasetMetadata.versionDeltaKey(base, uuid, rv),
            full)
        }
      import spark.implicits._
      spark.sparkContext
        .parallelize(recs, math.max(1, math.min(64, recs.size)))
        .mapPartitions { it =>
          val m = new com.fasterxml.jackson.databind.ObjectMapper()
          m.registerModule(com.fasterxml.jackson.module.scala.DefaultScalaModule)
          m.configure(
            com.fasterxml.jackson.databind.DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES,
            false)
          // Jackson narrows the erased Map[String, Long] values to Integer
          // on deserialization — widen via Number, like md.sizeOf
          def widen(v: Any): Long = v match {
            case n: Number => n.longValue()
            case other     => other.toString.toLong
          }
          def sidecars(rv: Long, dv: Seq[String], idx: Iterable[String],
              blm: Iterable[String], zn: Iterable[String]) =
            dv.map((rv, "missing_dv_fragment", _, true, 0L, 0L)) ++
              idx.map((rv, "missing_index", _, true, 0L, 0L)) ++
              blm.map((rv, "missing_bloom", _, true, 0L, 0L)) ++
              zn.map((rv, "missing_zone", _, true, 0L, 0L))
          def metas(rv: Long, metadata: Map[String, String]) = {
            val md = Option(metadata).getOrElse(Map.empty[String, String])
            md.get(DatasetMetadata.CommitTsKey).map((rv, "meta_ts", _, true, 0L, 0L)).toSeq ++
              md.get(DatasetMetadata.SeqHwmKey).map((rv, "meta_hwm", _, true, 0L, 0L)) ++
              md.get(DatasetMetadata.OperationKey).filter(_ =>
                  md.get(DatasetMetadata.OperationCommitKey).exists(_.toLong == rv))
                .map((rv, "meta_op", _, true, 0L, 0L)) ++
              (if (md.get(DatasetMetadata.RollbackCommitKey).exists(_.toLong == rv))
                 md.get(DatasetMetadata.RollbackOfKey).map((rv, "meta_rb", _, true, 0L, 0L))
               else None)
          }
          it.flatMap { case (rv, pathStr, isFull) =>
            val p = new Path(pathStr)
            val in = p.getFileSystem(conf.value).open(p)
            try {
              if (isFull) {
                val md = m.readValue(in: java.io.InputStream, classOf[DatasetMetadata])
                Option(md.partitions).getOrElse(Map.empty[String, Long])
                  .asInstanceOf[Map[String, Any]]
                  .iterator.map { case (l, s) =>
                    (rv, "label", l, true, widen(s), md.seqOf(l)) }.toSeq ++
                  sidecars(rv, md.deleteFragments,
                    Option(md.indices).getOrElse(Map.empty[String, String]).values,
                    md.bloomRegistry.values, md.zoneRegistry.values) ++
                  metas(rv, md.metadata)
              } else {
                val d = m.readValue(in: java.io.InputStream, classOf[VersionDelta])
                val seqs = Option(d.addSeq).getOrElse(Map.empty[String, Long])
                  .asInstanceOf[Map[String, Any]]
                val addSizes = Option(d.adds).getOrElse(Map.empty[String, Long])
                  .asInstanceOf[Map[String, Any]]
                // applyDelta folds adds and addSeq into the snapshot
                // INDEPENDENTLY, so the delta format permits a seq change
                // without a size change (or vice versa) — iterate the
                // UNION of both keysets, each side falling back to the
                // other map or 0, so a seq-only entry still lands a label
                // row instead of being silently dropped (which would
                // misclassify rewrites in the distributed CDF's seq<=hwm
                // detection if a future writer ever split the two maps)
                (addSizes.keySet ++ seqs.keySet).iterator.map { l =>
                    (rv, "label", l, true,
                      addSizes.get(l).map(widen).getOrElse(0L),
                      seqs.get(l).map(widen).getOrElse(0L)) }.toSeq ++
                  Option(d.removes).getOrElse(Nil).map((rv, "label", _, false, 0L, 0L)) ++
                  sidecars(rv, Option(d.deletes).getOrElse(Nil),
                    Option(d.indices).getOrElse(Map.empty[String, String]).values,
                    Option(d.blooms).getOrElse(Map.empty[String, String]).values,
                    Option(d.zones).getOrElse(Map.empty[String, String]).values) ++
                  metas(rv, d.metadata)
              }
            } finally in.close()
          }
        }
        .toDF("rv", "kind", "name", "isAdd", "size", "seq")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

    /** `(version, label, size)` — each target version's full label state
      * (the last-op-wins argmax over its replay window), carrying the
      * winning add's byte size. The shared core of [[referenced]] and the
      * distributed history's per-version metrics.
      */
    def perVersionLabels: DataFrame = {
      import spark.implicits._
      recRows.filter(col("kind") === "label")
        .join(broadcast(windows.toDF("v", "rv")), Seq("rv"))
        .groupBy(col("v"), col("name"))
        .agg(max(struct(col("rv"), col("isAdd"), col("size"), col("seq"))).as("last"))
        .filter(col("last.isAdd"))
        .select(col("v").as("version"), col("name").as("label"),
          col("last.size").as("size"), col("last.seq").as("seq"))
    }

    /** `(label, version)` — every label some target version references,
      * attributed to the NEWEST referencing version. Deliberately NOT
      * built on [[perVersionLabels]]: fsck/gc need neither sizes nor
      * seqs, and keeping the argmax struct narrow prunes those 16 B/row
      * out of the audit shuffle (the history/CDF consumers pay for the
      * payload only when they use it).
      */
    val referenced: DataFrame = {
      import spark.implicits._
      recRows.filter(col("kind") === "label")
        .join(broadcast(windows.toDF("v", "rv")), Seq("rv"))
        .groupBy(col("v"), col("name"))
        .agg(max(struct(col("rv"), col("isAdd"))).as("last"))
        .filter(col("last.isAdd"))
        .select(col("name").as("label"), col("v").as("version"))
        .groupBy("label").agg(max("version").as("version"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

    /** Sidecar registries of the target versions' OWN records — what the
      * driver path reads off each loaded snapshot. Registry-sized collect:
      * `(issueKind, version, name)`.
      */
    def sidecarRefs(): Seq[(String, Long, String)] = {
      import spark.implicits._
      recRows.filter(col("kind").isin("missing_dv_fragment", "missing_index",
          "missing_bloom", "missing_zone"))
        .join(broadcast(targetVersions.toDF("rv")), Seq("rv"))
        .select(col("kind"), col("rv"), col("name")).distinct()
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    }

    def close(): Unit = {
      recRows.unpersist(blocking = false)
      referenced.unpersist(blocking = false)
      ()
    }
  }

  /** [[fsck]]'s big-table path over [[CommitRecordScan]]: appends
    * missing/orphan fault rows to `issues` and returns the registry-sized
    * sidecar references.
    */
  private def distributedAudit(
      spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem,
      base: String, uuid: String, tableRoot: Path,
      chainStarts: Seq[(Long, Long)],
      hasFull: Long => Boolean,
      issues: scala.collection.mutable.Builder[(String, Long, String), Seq[(String, Long, String)]])
      : Seq[(String, Long, String)] = {
    import spark.implicits._
    val scan = new CommitRecordScan(spark, base, uuid, chainStarts, hasFull)
    val present = listTableFilesDS(spark, fs, tableRoot).toDF("label")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      scan.referenced.join(present, Seq("label"), "left_anti")
        .collect().foreach(r =>
          issues += (("missing_data_file", r.getLong(1), r.getString(0))))
      // the orphan PREVIEW is the one fault class whose cardinality is
      // unbounded (O(garbage), not O(damage)): cap the listed rows like
      // gc's bounded report — sorted limit for determinism, full count on
      // the overflow row — so a million-orphan table audits with a
      // bounded driver, in both modes identically
      val orphans = present.join(scan.referenced, Seq("label"), "left_anti")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val n = orphans.count()
        val cap = orphanLimit(spark)
        orphans.orderBy("label").as[String].limit(cap)
          .collect().foreach(l => issues += (("orphan_file", -1L, l)))
        if (n > cap) issues += (("orphan_overflow", n, overflowMsg(n, cap)))
      } finally { orphans.unpersist(blocking = false); () }
      scan.sidecarRefs()
    } finally {
      present.unpersist(blocking = false)
      scan.close()
    }
  }

  /** Sidecar/fragment existence probe shared by [[fsck]] and [[salvage]]
    * so path construction cannot silently diverge between audit and repair.
    */
  private def sidecarMissing(fs: org.apache.hadoop.fs.FileSystem,
      base: String, uuid: String, dir: String, name: String): Boolean =
    !fs.exists(new Path(s"$base/$uuid/$dir/$name"))

  /** Salvage after a storage incident — the REPAIR companion of [[fsck]]:
    * commit ONE version that drops every CURRENT-snapshot reference whose
    * backing storage is gone (vanished data files, dead index/bloom/zone
    * sidecar registry entries) so reads work again instead of failing on
    * the first missing file. Loud semantics where integrity is at stake:
    *
    *  - dropping a missing DATA file loses its rows — acknowledged data
    *    loss, returned in the report;
    *  - a missing DV FRAGMENT would RESURRECT deleted rows if simply
    *    dropped, so salvage REFUSES unless `acceptResurrection = true`
    *    (GDPR deletions may reappear — the caller must opt in);
    *  - older retained versions still reference what storage lost: fsck
    *    keeps flagging them (time travel to them IS broken) until gc
    *    prunes them.
    *
    * Returns the dropped references as `(kind, path)`; `dryRun` reports
    * without committing. No-op (no commit) when nothing is missing.
    */
  def salvage(spark: SparkSession, base: String, uuid: String,
      acceptResurrection: Boolean = false,
      dryRun: Boolean = false,
      diffThreshold: Int = SessionDiffThreshold): Seq[(String, String)] = {
    val fs = DatasetMetadata.fs(spark, base)
    val md = DatasetMetadata.load(spark, base, uuid)
    val tableRoot = fs.makeQualified(new Path(md.tableDir(base)))
    val refLabels = Option(md.partitions).getOrElse(Map.empty[String, Long]).keys
    val missingData: Seq[String] =
      if (refLabels.size <= auditThreshold(spark, diffThreshold)) {
        val present = listTableFiles(spark, fs, tableRoot).toSet
        refLabels.toSeq.sorted.filterNot(present.contains)
      } else {
        // distributed diff (same shape as fsck's): only the MISSING labels
        // return to the driver — they feed the repair commit either way
        import spark.implicits._
        val present = listTableFilesDS(spark, fs, tableRoot).toDF("label")
        parallelizeLabels(spark, Seq(md.version -> refLabels.toSeq))
          .map(_._1).toDF("label")
          .join(present, Seq("label"), "left_anti")
          .as[String].collect().sorted.toSeq
      }
    def missingIn(dir: String, names: Map[String, String]): Seq[(String, String)] =
      names.toSeq.sortBy(_._1).collect {
        case (c, n) if sidecarMissing(fs, base, uuid, dir, n) => (c, n)
      }
    val deadIdx = missingIn(IndexDirName, Option(md.indices).getOrElse(Map.empty))
    val deadBloom = missingIn("blooms", md.bloomRegistry)
    val deadZone = missingIn("zones", md.zoneRegistry)
    val missingFrags = md.deleteFragments.filterNot(n =>
      fs.exists(new Path(md.deletePath(base, n))))
    val report =
      missingData.map("missing_data_file" -> _) ++
        deadIdx.map { case (c, n) => "missing_index" -> s"$IndexDirName/$n (column $c)" } ++
        deadBloom.map { case (c, n) => "missing_bloom" -> s"blooms/$n (column $c)" } ++
        deadZone.map { case (c, n) => "missing_zone" -> s"zones/$n (column $c)" } ++
        missingFrags.map("missing_dv_fragment" -> _)
    // dry runs REPORT the fragment loss (that's what damage assessment is
    // for); only a real repair needs the resurrection opt-in
    if (report.isEmpty || dryRun) return report
    if (missingFrags.nonEmpty && !acceptResurrection)
      throw new IllegalStateException(
        s"dataset '$uuid' lost ${missingFrags.size} deletion-vector fragment(s) " +
          s"(${missingFrags.mkString(", ")}): dropping them would RESURRECT deleted " +
          "rows (e.g. GDPR deletions). Restore the fragments from backup, or pass " +
          "acceptResurrection = true to salvage anyway.")
    val gone = missingData.toSet
    val repaired = md.copy(
      partitions = Option(md.partitions).getOrElse(Map.empty[String, Long]) -- gone,
      partitionSeq = Option(md.partitionSeq).getOrElse(Map.empty) -- gone,
      indices = Option(md.indices).getOrElse(Map.empty) -- deadIdx.map(_._1),
      blooms = md.bloomRegistry -- deadBloom.map(_._1),
      zones = md.zoneRegistry -- deadZone.map(_._1),
      deletes = md.deleteFragments.filterNot(missingFrags.contains))
    DatasetMetadata.store(spark, base, repaired, parentMd = Some(md),
      operation = "SALVAGE")
    report
  }

  /** [[salvage]] with a BOUNDED returned report (count + at most
    * `reportLimit` `(kind, path)` references + truncation marker) — the
    * form the `salvage_report` SQL procedure uses. Unlike gc's orphan
    * reap, salvage's intrinsic driver floor is the CURRENT snapshot (the
    * repair commit rewrites it, so it is resident either way); the bound
    * here is about not RETURNING a million-reference damage report
    * through the caller, not about the repair's own memory.
    */
  def salvageReport(spark: SparkSession, base: String, uuid: String,
      acceptResurrection: Boolean = false,
      dryRun: Boolean = false,
      diffThreshold: Int = SessionDiffThreshold,
      reportLimit: Int = DefaultMaintenanceReportLimit): SalvageReport = {
    require(reportLimit >= 0, s"reportLimit must be >= 0, got $reportLimit " +
      "(use salvage for the unbounded Seq-returning form)")
    val full = salvage(spark, base, uuid, acceptResurrection, dryRun, diffThreshold)
    SalvageReport(full.size.toLong, full.size > reportLimit, full.take(reportLimit))
  }

  /** One-call table maintenance (the OPTIMIZE entry point a scheduler
    * runs): [[compact]] small files (which also drains deletion vectors
    * for its victims and re-canonicalizes appended sidecar fragments),
    * [[materializeDeletes]] for any remaining tombstoned files,
    * [[canonicalizeSidecars]] if fragments still exceed the cap, then
    * optionally [[garbageCollect]] with the given retention. Each step is
    * its own atomic commit; a crash between steps leaves a smaller,
    * still-consistent dataset.
    */
  def optimize(
      spark: SparkSession,
      base: String,
      uuid: String,
      smallFileBytes: Long = 32L * 1024 * 1024,
      targetFileBytes: Long = 128L * 1024 * 1024,
      maxSidecarFragments: Int = 64,
      gcRetainVersions: Int = -1,
      scope: Predicates = Predicates.empty,
      // maintenance jobs are exactly where a lagging CDC consumer gets
      // stranded — the floor applies to the optimize-embedded gc too
      consumerCheckpoints: Seq[String] = Nil): DatasetMetadata = {
    // the scope flows into the rewrite stages; sidecar canonicalization
    // and gc stay global (they are metadata/file reaping, not rewrites)
    compact(spark, base, uuid, smallFileBytes, targetFileBytes, scope = scope)
    var md = materializeDeletes(spark, base, uuid, targetFileBytes, scope = scope)
    if (sidecarFragments(spark, base, uuid) > maxSidecarFragments) {
      canonicalizeSidecars(spark, base, uuid)
      md = DatasetMetadata.load(spark, base, uuid)
    }
    if (gcRetainVersions >= 0) {
      // the report form, not the Seq API: optimize discards the names, so
      // a scheduler-driven pass after a compaction storm must not build a
      // million-path Seq on the driver just to throw it away
      garbageCollectReport(spark, base, uuid, gcRetainVersions,
        consumerCheckpoints = consumerCheckpoints,
        reportLimit = DefaultMaintenanceReportLimit)
      md = DatasetMetadata.load(spark, base, uuid)
    }
    md
  }

  // ---------------------------------------------------------------- gc

  /** Delete files no retained commit references (≙ garbage_collect,
    * io/eager.py + Delta VACUUM). `retainVersions` = how many commits of
    * history stay time-travelable: snapshots in
    * `[current - retainVersions, current]` survive and PIN their data
    * files; older snapshots are pruned. The default 0 keeps only the
    * current commit — maximal reclamation, no history (exactly the
    * reference's gc semantics).
    *
    * `sidecarGraceMs` (Delta-VACUUM-style retention): an unreferenced
    * sidecar dir YOUNGER than this is skipped, because every commit has a
    * window after [[atomicSidecarWrite]] renames the nonce dir into place
    * and before `DatasetMetadata.store` publishes the registry naming
    * it — in that window the dir is an in-flight commit, not garbage.
    * Reaping it would leave the about-to-commit registry pointing at a
    * missing path (probes degrade to no-pruning; loadIndex throws until
    * the next canonicalize). Tests that need immediate reclamation pass 0
    * — with the documented caveat that 0 is only safe when no writer is
    * concurrently committing.
    *
    * `consumerCheckpoints`: registering a consumer that has NOT polled yet
    * requires its checkpoint's PARENT DIRECTORY to exist — gc fails loudly
    * on a checkpoint path whose parent is also absent, because such a path
    * is indistinguishable from a typo and a typo'd path would silently pin
    * retention at version 0 forever. `mirrorChanges`/`consumeChanges`
    * create the parent on their first poll; to register ahead of the first
    * poll, pre-create the parent directory (one `fs.mkdirs`).
    */
  def garbageCollect(spark: SparkSession, base: String, uuid: String,
      retainVersions: Int = 0,
      sidecarGraceMs: Long = 15L * 60 * 1000,
      dryRun: Boolean = false,
      retainLastMs: Long = -1L,
      consumerCheckpoints: Seq[String] = Nil,
      diffThreshold: Int = SessionDiffThreshold): Seq[String] =
    gcCore(spark, base, uuid, retainVersions, sidecarGraceMs, dryRun,
      retainLastMs, consumerCheckpoints, diffThreshold, reportLimit = -1)
      .reclaimed

  /** [[garbageCollect]] with a BOUNDED driver-side report — the form an
    * operator (or the `gc_report` SQL procedure) should use on incident
    * scale: a pathological million-orphan reap must not return a 100 MB
    * `Seq` through the driver. `reclaimedCount` is always the full count;
    * `reclaimed` holds at most `reportLimit` paths (label-sorted for the
    * data-file portion, so the sample is deterministic) and `truncated`
    * says whether anything was dropped. Under a bound the orphan names
    * never materialize on the driver at all: the present-vs-referenced
    * diff stays a DataFrame end to end — counted distributed, sampled via
    * `limit`, and DELETED via `foreachPartition` — in BOTH diff modes (the
    * below-threshold referenced set ships to executors instead of the
    * listing collecting to the driver).
    */
  def garbageCollectReport(spark: SparkSession, base: String, uuid: String,
      retainVersions: Int = 0,
      sidecarGraceMs: Long = 15L * 60 * 1000,
      dryRun: Boolean = false,
      retainLastMs: Long = -1L,
      consumerCheckpoints: Seq[String] = Nil,
      diffThreshold: Int = SessionDiffThreshold,
      reportLimit: Int = DefaultMaintenanceReportLimit): GcReport = {
    require(reportLimit >= 0, s"reportLimit must be >= 0, got $reportLimit " +
      "(use garbageCollect for the unbounded Seq-returning form)")
    gcCore(spark, base, uuid, retainVersions, sidecarGraceMs, dryRun,
      retainLastMs, consumerCheckpoints, diffThreshold, reportLimit)
  }

  private def gcCore(spark: SparkSession, base: String, uuid: String,
      retainVersions: Int,
      sidecarGraceMs: Long,
      dryRun: Boolean,
      retainLastMs: Long,
      consumerCheckpoints: Seq[String],
      diffThreshold: Int,
      reportLimit: Int): GcReport = {
    import spark.implicits._
    val bounded = reportLimit >= 0
    val md = DatasetMetadata.load(spark, base, uuid)
    val fs = DatasetMetadata.fs(spark, base)
    val tableRoot = fs.makeQualified(new Path(md.tableDir(base)))
    val allVersions = DatasetMetadata.listVersions(spark, base, uuid)
    // `retainLastMs` (Delta VACUUM's RETAIN <n> HOURS): every version
    // committed inside the wall-clock window ALSO survives — it can only
    // WIDEN what `retainVersions` keeps, so a lagging CDC consumer's
    // window can be protected by time without counting commits.
    // Deliberately keyed on record MTIMES, not the in-commit stamp: a
    // freshly copied dataset gets young mtimes and so RETAINS MORE — the
    // safe direction for deletion, while time travel uses the stamp
    val keepFrom0 = {
      val byCount = md.version - retainVersions
      if (retainLastMs < 0L) byCount
      else {
        val cutoff = System.currentTimeMillis() - retainLastMs
        val timeKept = DatasetMetadata.versionRecords(spark, base, uuid)
          .groupMapReduce(_._1)(_._2)(math.min)
          .collect { case (v, m) if m >= cutoff => v }
        math.min(byCount, if (timeKept.isEmpty) byCount else timeKept.min)
      }
    }
    // consumer-aware floor: a REGISTERED change consumer (consumeChanges /
    // mirrorChanges checkpoint files) whose poll lags must keep its whole
    // remaining window replayable — the feed over (v, cur] loads every
    // snapshot back to v itself (parent diffs), so the floor is the
    // checkpointed version. A checkpoint that does not exist yet floors at
    // 0 (nothing consumed: keep everything rather than strand the consumer
    // before its first poll). Unregistered consumers keep today's loud
    // failure: their next poll hits the vacuumed-version error.
    val keepFrom = consumerCheckpoints.foldLeft(keepFrom0) { (kf, cp) =>
      val floor = readChangeCheckpoint(spark, cp)
      // floor 0 = nothing consumed = retention fully disabled. Legitimate
      // for a registered-but-not-yet-started consumer — but byte-identical
      // to a TYPO'D path, which would pin keepFrom at 0 forever with no
      // signal. Distinguish the two: a real about-to-start consumer's
      // checkpoint has (or will have) a parent directory the operator
      // created; a path whose parent does not exist either is almost
      // certainly mistyped, so fail loudly instead of silently keeping
      // every version for eternity.
      if (floor == 0L) {
        val fsys = DatasetMetadata.fs(spark, cp)
        val p = new Path(cp)
        val parent = Option(p.getParent)
        if (!fsys.exists(p) && !parent.exists(fsys.exists))
          throw new IllegalArgumentException(
            s"consumer checkpoint '$cp' does not exist and neither does its " +
              "parent directory — a mistyped path here would silently disable " +
              "gc retention forever (floor 0 keeps every version). Create the " +
              "parent directory to register a consumer that has not started " +
              "yet, or fix the path.")
        logWarning(s"consumer checkpoint '$cp' has consumed nothing yet: gc " +
          s"retention floored at version 0 (ALL versions kept) until its first poll")
      }
      math.min(kf, floor)
    }
    val (keptVersions, prunedVersions) = allVersions.partition(_ >= keepFrom)
    // past the (estimated, like fsck's) pair threshold the retained states
    // are reconstructed via the distributed commit-record scan instead of
    // loading every snapshot on the driver: the referenced set never
    // exists as a driver Set, the orphan diff is an anti-join, and only
    // the ORPHAN NAMES come back (the gc API returns them) — the one
    // driver-side O(orphans) cost this verb's contract already implies
    // ALL record bytes, not just the kept versions': a kept delta's replay
    // window can reach below keepFrom (its checkpoint), and over-estimating
    // only trades wall time for bounded driver memory
    val recordSizes = versionRecordSizes(spark, fs, base, uuid)
    val estimatedPairs = estimatePairs(
      md.partitions.size.toLong, keptVersions.size, recordSizes)
    val threshold = auditThreshold(spark, diffThreshold)
    lastAuditDistributed.set(estimatedPairs > threshold)
    val deleted = Seq.newBuilder[String]
    var total = 0L
    def record(p: String): Unit = {
      total += 1
      if (!bounded || total <= reportLimit) { deleted += p; () }
    }
    val prefix = tableRoot.toString + "/"
    // referenced labels + per-kind valid sidecar names, by diff mode. In
    // BOUNDED mode the referenced set is exposed as a DataFrame in both
    // modes so the orphan diff never lands on the driver; unbounded keeps
    // the exact legacy shapes (driver Set below threshold, collected
    // anti-join above — the Seq API returns every name anyway).
    var scanOpen: Option[CommitRecordScan] = None
    val (refSet: Option[Set[String]], refDF: Option[DataFrame],
        sidecarValid: Seq[(String, Set[String])]) =
      if (estimatedPairs <= threshold) {
        val retainedMds = keptVersions.filter(_ != md.version)
          .map(v => DatasetMetadata.loadVersion(spark, base, uuid, v))
        val referenced = md.partitions.keySet ++ retainedMds.flatMap(_.partitions.keySet)
        val allMds = md +: retainedMds
        val sv = Seq(
          IndexDirName -> allMds.flatMap(_.indices.values).toSet,
          "blooms" -> allMds.flatMap(_.bloomRegistry.values).toSet,
          "zones" -> allMds.flatMap(_.zoneRegistry.values).toSet,
          // deletion-vector fragments pin exactly like pruning sidecars —
          // a retained snapshot NEEDS its fragments for correct reads
          DatasetMetadata.DeletesDirName -> allMds.flatMap(_.deleteFragments).toSet)
        if (bounded)
          (None, Some(parallelizeLabels(spark, Seq(md.version -> referenced.toSeq))
            .map(_._1).toDF("label")), sv)
        else (Some(referenced), None, sv)
      } else {
        val recordNames = recordSizes.keySet
        val (chainStarts, broken) =
          resolveChains(spark, base, uuid, keptVersions, recordNames)
        // a retained version whose chain is broken fails gc exactly like
        // the driver path's loadVersion would — deleting "orphans" while
        // blind to part of the history is how data loss happens
        broken.headOption.foreach { case (v, gap) =>
          throw new NoSuchElementException(
            s"Dataset '$uuid': retained version $v is unreachable — commit record " +
              s"$gap of its replay chain is missing; refusing to gc (run fsck)")
        }
        val scan = new CommitRecordScan(spark, base, uuid, chainStarts,
          hasFullIn(recordNames))
        scanOpen = Some(scan)
        val refs = scan.sidecarRefs()
        def valid(kind: String): Set[String] =
          refs.collect { case (`kind`, _, n) => n }.toSet
        (None, Some(scan.referenced), Seq(
          IndexDirName -> valid("missing_index"),
          "blooms" -> valid("missing_bloom"),
          "zones" -> valid("missing_zone"),
          DatasetMetadata.DeletesDirName -> valid("missing_dv_fragment")))
      }
    try {
      if (fs.exists(tableRoot)) {
        if (!bounded) {
          // parallel-capable listing (listTableFiles): a wide table's
          // listing distributes like the deletes below already do
          val toDeleteRels: Seq[String] = refSet match {
            case Some(rs) => listTableFiles(spark, fs, tableRoot).filterNot(rs.contains)
            case None => listTableFilesDS(spark, fs, tableRoot).toDF("label")
              .join(refDF.get, Seq("label"), "left_anti")
              .as[String].collect().toSeq
          }
          if (toDeleteRels.nonEmpty) {
            val toDelete = toDeleteRels.map(rel => new Path(prefix + rel))
            // distribute the deletes: after heavy compaction/streaming
            // churn the orphan count is O(#historical files), and
            // sequential driver-side deletes against an object store
            // dominate the maintenance pass
            if (dryRun)
              toDelete.foreach(p => record(p.toString))
            else if (toDelete.size <= 16)
              toDelete.foreach { p => fs.delete(p, false); record(p.toString) }
            else {
              val serializableConf = new org.apache.spark.util.SerializableConfiguration(
                spark.sessionState.newHadoopConf())
              val paths = toDelete.map(_.toString)
              spark.sparkContext.parallelize(paths, math.min(32, 1 + paths.size / 64))
                .foreachPartition { ps =>
                  val conf = serializableConf.value
                  ps.foreach { s =>
                    val p = new Path(s)
                    p.getFileSystem(conf).delete(p, false); ()
                  }
                }
              paths.foreach(record)
            }
          }
        } else {
          // BOUNDED: present-vs-referenced stays a DataFrame end to end —
          // counted distributed, sampled with a sorted limit (deterministic
          // report), deleted via foreachPartition; only reportLimit names
          // ever reach the driver no matter how many orphans exist
          val orphans = listTableFilesDS(spark, fs, tableRoot).toDF("label")
            .join(refDF.get, Seq("label"), "left_anti")
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            val n = orphans.count()
            val sample: Array[String] =
              if (reportLimit == 0 || n == 0) Array.empty
              else orphans.orderBy("label").as[String].limit(reportLimit).collect()
            total += n
            sample.foreach(rel => deleted += (prefix + rel))
            if (!dryRun && n > 0) {
              val serializableConf = new org.apache.spark.util.SerializableConfiguration(
                spark.sessionState.newHadoopConf())
              orphans.as[String].foreachPartition { (ps: Iterator[String]) =>
                val conf = serializableConf.value
                ps.foreach { rel =>
                  val p = new Path(prefix + rel)
                  p.getFileSystem(conf).delete(p, false); ()
                }
              }
            }
          } finally { orphans.unpersist(blocking = false); () }
        }
      }
    } finally scanOpen.foreach(_.close())
    // index / bloom / zone sidecar files referenced by NO retained version's
    // registry — retained snapshots pin their version-addressed sidecars
    // exactly like their data files, so time travel keeps full pruning
    sidecarValid.foreach { case (dir, valid) =>
      val root = fs.makeQualified(new Path(s"$base/$uuid/$dir"))
      if (fs.exists(root)) {
        val now = System.currentTimeMillis()
        fs.listStatus(root).foreach { st =>
          if (!valid.contains(st.getPath.getName) && !st.getPath.getName.startsWith(".")) {
            // grace check: age = newest mtime of the dir OR its direct
            // children (directory mtimes alone are unreliable/zero on
            // object stores; the parquet files inside carry real ones)
            val newest = (st.getModificationTime +:
              (try fs.listStatus(st.getPath).toSeq.map(_.getModificationTime)
               catch { case _: java.io.IOException => Nil })).max
            if (newest < now - sidecarGraceMs) {
              if (!dryRun) fs.delete(st.getPath, true)
              record(st.getPath.toString)
            }
          }
        }
      }
    }
    // commit records older than the retention window — history beyond
    // `retainVersions` stops being time-travelable here, by design. The
    // OLDEST retained version may be a delta whose replay chain runs
    // through records about to be pruned: materialize it as a
    // self-contained checkpoint FIRST, so every retained version stays
    // loadable from retained records alone.
    if (prunedVersions.nonEmpty && !dryRun)
      keptVersions.minOption.foreach { v =>
        DatasetMetadata.materializeCheckpoint(spark, base, uuid, v)
      }
    prunedVersions.foreach { v =>
      Seq(DatasetMetadata.versionKey(base, uuid, v),
          DatasetMetadata.versionDeltaKey(base, uuid, v)).foreach { k =>
        val p = new Path(k)
        if (dryRun) { if (fs.exists(p)) record(p.toString) }
        else if (fs.delete(p, false)) record(p.toString)
      }
      // a post-gc loadVersion of a pruned commit must fail loudly, not
      // answer from this JVM's snapshot cache
      if (!dryRun) DatasetMetadata.uncacheVersion(base, uuid, v)
    }
    GcReport(total, bounded && total > reportLimit, deleted.result())
  }

  /** Copy a dataset to a new uuid (≙ copy_dataset + modify_uuid,
    * io/eager.py:946-1007, core/dataset.py:956-993). The byte copy runs as
    * a DISTRIBUTED job over the file list — a driver-side recursive copy of
    * a 100 TB dataset would take days; this scales with the cluster. The
    * new metadata blob commits LAST, so the copy is invisible until whole.
    */
  def copyDataset(spark: SparkSession, base: String, fromUuid: String, toUuid: String): DatasetMetadata = {
    val md = DatasetMetadata.load(spark, base, fromUuid)
    val fs = DatasetMetadata.fs(spark, base)
    val srcRoot = fs.makeQualified(new Path(s"$base/$fromUuid"))
    val prefix = srcRoot.toString + "/"
    val files = scala.collection.mutable.ArrayBuffer.empty[String]
    if (fs.exists(srcRoot)) {
      walkFiles(fs, srcRoot) { st =>
        val rel = st.getPath.toString.stripPrefix(prefix)
        // version snapshots embed the SOURCE uuid — the copy starts a fresh
        // history (its commit below becomes v1) instead of inheriting blobs
        // that name another dataset
        if (!rel.startsWith("_versions/"))
          files += rel
      }
    }
    val serializableConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val srcStr = srcRoot.toString
    val dstStr = s"$base/$toUuid"
    if (files.nonEmpty)
      spark.sparkContext.parallelize(files.toSeq, math.min(32, 1 + files.size / 8))
        .foreachPartition { rels =>
          val conf = serializableConf.value
          rels.foreach { rel =>
            val src = new Path(s"$srcStr/$rel")
            val dst = new Path(s"$dstStr/$rel")
            val sfs = src.getFileSystem(conf)
            org.apache.hadoop.fs.FileUtil.copy(sfs, src, dst.getFileSystem(conf), dst,
              false, true, conf)
            ()
          }
        }
    // fresh version line for the copy: v1, not the source's counter
    val md2 = md.copy(uuid = toUuid,
      metadata = md.metadata - DatasetMetadata.VersionKey)
    DatasetMetadata.store(spark, base, md2, operation = "COPY")
    DatasetMetadata.load(spark, base, toUuid)
  }

  // ---------------------------------------------------------------- stats

  /** Per-file Parquet footer stats (≙ get_parquet_metadata,
    * metapartition.py:1720-1771, and collect_dataset_metadata's `frac`
    * sampling, io/dask/dataframe.py:491-574): rows, row groups, size.
    * Footer reads are distributed via mapPartitions over the file list —
    * no data scan. `frac` < 1 samples that fraction of the FILE LIST
    * (deterministically, by `seed`) before any footer is read — the
    * reference's cheap table-profile mode; at least one file is always
    * read on a non-empty table.
    */
  def parquetStats(spark: SparkSession, base: String, uuid: String,
      frac: Double = 1.0, seed: Long = 42L): DataFrame = {
    require(frac > 0.0 && frac <= 1.0, s"frac must be in (0, 1], got $frac")
    val md = DatasetMetadata.load(spark, base, uuid)
    val tableDir = md.tableDir(base)
    val all = md.partitions.keys.toSeq.sorted.map(l => s"$tableDir/$l")
    val files =
      if (frac >= 1.0 || all.isEmpty) all
      else new scala.util.Random(seed).shuffle(all)
        .take(math.max(1, math.round(frac * all.size).toInt))
    val serializableConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    import spark.implicits._
    spark.sparkContext.parallelize(files, math.max(1, math.min(files.size, 32)))
      .mapPartitions { it =>
        val conf = serializableConf.value
        it.map { f =>
          val p = new Path(f)
          val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf)
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try {
            val fm = reader.getFooter.getBlocks
            val rows = fm.stream().mapToLong(_.getRowCount).sum()
            (f, fm.size(), rows)
          } finally reader.close()
        }
      }.toDF("file", "row_groups", "rows")
  }

  /** Content hash per group (≙ hash_dataset, io/dask/dataframe.py:577-649):
    * order-independent per-group sum of row hashes, accumulated in decimal
    * so ANSI mode cannot overflow, folded back to one long.
    */
  def hashDataset(df: DataFrame, groupKeys: Seq[String],
      hashExpr: Option[Column] = None): DataFrame = {
    val payload = df.columns.toSeq
    // default per-row hash: codegen'd xxhash64 over the raw column values
    // (no serialization cost). `hashExpr` swaps in any other non-negative
    // long-valued row hash — e.g. [[md5RowHash]], whose string-serialized
    // form replays bit-for-bit in engines without xxhash64
    val h = hashExpr
      .getOrElse(xxhash64(payload.map(c => col(s"`$c`")): _*))
      .cast("decimal(38,0)")
    val folded = pmod(sum(h), lit(Long.MaxValue).cast("decimal(38,0)")).cast("long").as("hash")
    if (groupKeys.isEmpty) df.agg(folded)
    else df.groupBy(groupKeys.map(c => col(s"`$c`")): _*).agg(folded)
  }

  /** Portable per-row hash for [[hashDataset]]'s `hashExpr`: the first 60
    * bits of `md5("|"-joined string casts of every column)` as a
    * non-negative long. Unlike the xxhash64 default this serializes
    * through strings, so any engine with `md5` + hex→int reproduces it
    * exactly (DuckDB: `CAST('0x'||substring(md5(concat_ws(...)),1,15) AS
    * BIGINT)`); the cost is the string materialization, so the default
    * stays xxhash64 for production fingerprints. Caveat of the string
    * form: rows that serialize identically collide — a value containing
    * the `|` separator can alias a column boundary, and `concat_ws`
    * skips nulls entirely (null ≠ empty string is NOT preserved). The
    * xxhash64 default hashes raw typed values and has neither ambiguity.
    */
  def md5RowHash(df: DataFrame): Column = {
    val s = concat_ws("|", df.columns.toSeq.map(c => col(s"`$c`").cast("string")): _*)
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")
  }
}
