package graft.sources

import graft.functions.TypeLattice
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, lit, when}
import org.apache.spark.sql.types._
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Parquet-backed table catalog with the reference's additive-only
  * schema evolution (SURVEY §2A A5): every table is a directory of
  * parquet part-files plus a JSON schema sidecar; `addColumns` is
  * ALTER TABLE ADD COLUMN IF NOT EXISTS — existing columns never change
  * type or disappear (/root/reference/pkg/destinations/duckdb/insert.go:12-26).
  *
  * Reads apply the sidecar schema over the whole directory: part files
  * written before a column existed simply yield NULL for it (Spark's
  * by-name parquet schema evolution), exactly matching the backend
  * behavior the reference relies on.
  *
  * Scale: a table is a plain parquet dir — at warehouse scale the same
  * layout partitions/buckets by any column via `df.write.partitionBy`;
  * nothing here assumes a single file or a single node.
  */
final class GraftCatalog(val spark: SparkSession, val root: String) {

  private def tableDir(db: String, table: String): Path = Paths.get(root, db, table)
  private def dataDir(db: String, table: String): Path = tableDir(db, table).resolve("data")
  private def schemaFile(db: String, table: String): Path = tableDir(db, table).resolve("schema.json")
  private def partitionFile(db: String, table: String): Path = tableDir(db, table).resolve("partition.json")

  /** Seed column the reference creates every table with
    * (pkg/destinations/duckdb/insert.go:72-76). */
  val RowIdColumn = "__row_id"

  def tableExists(db: String, table: String): Boolean = Files.exists(schemaFile(db, table))

  def listTables(db: String): Seq[String] = {
    val d = Paths.get(root, db)
    if (!Files.exists(d)) Nil
    else Files.list(d).iterator().asScala.filter(p => Files.exists(p.resolve("schema.json")))
      .map(_.getFileName.toString).toSeq.sorted
  }

  /** CREATE TABLE IF NOT EXISTS with the __row_id seed column. */
  def ensureTable(db: String, table: String): Unit = synchronized {
    if (!tableExists(db, table)) {
      Files.createDirectories(dataDir(db, table))
      writeSchema(db, table, Vector(RowIdColumn -> TypeLattice.Int))
    }
  }

  /** ALTER TABLE ADD COLUMN IF NOT EXISTS, per column. Conflicting
    * re-adds keep the existing type (backend semantics). */
  def addColumns(db: String, table: String, types: Map[String, String]): Unit = synchronized {
    ensureTable(db, table)
    // fail loud on a type outside the lattice — the sidecar reader
    // would otherwise silently coerce it to string (and e.g. range-
    // cluster numerically-intended keys in lexicographic order)
    val bad = types.collect {
      case (n, t) if !Set(TypeLattice.String, TypeLattice.Int,
        TypeLattice.Float, TypeLattice.Bool).contains(t) => s"$n: $t"
    }
    require(bad.isEmpty, s"unknown lattice type(s): ${bad.mkString(", ")} " +
      "(valid: string, int, float, bool)")
    val existing = readSchemaSeq(db, table)
    val have = existing.map(_._1).toSet
    val added = types.toSeq.sortBy(_._1).filterNot { case (n, _) => have.contains(n) }
    if (added.nonEmpty) writeSchema(db, table, existing ++ added)
  }

  def schemaOf(db: String, table: String): Map[String, String] = readSchemaSeq(db, table).toMap

  def structOf(db: String, table: String): StructType =
    StructType(readSchemaSeq(db, table).map { case (n, t) =>
      StructField(n, TypeLattice.toSparkType(t), nullable = true)
    })

  /** Hive-style directory partitioning for a table. Must be declared
    * while the table is still empty — the layout is fixed after the
    * first write (same rule as every warehouse). Partition columns
    * must already exist in the schema. At 100 TB this is what turns
    * `WHERE lang = 'en'` into a directory prune instead of a scan:
    * Spark's partition discovery + PartitionFilters skip whole
    * subtrees before any parquet footer is opened. */
  def setPartitioning(db: String, table: String, cols: Seq[String]): Unit = synchronized {
    ensureTable(db, table)
    val have = readSchemaSeq(db, table).map(_._1).toSet
    require(cols.forall(have.contains),
      s"partition columns must exist in schema: ${cols.filterNot(have.contains)}")
    require(!hasData(db, table), "cannot re-partition a non-empty table")
    Files.writeString(partitionFile(db, table),
      cols.map(quote).mkString("[", ",", "]"))
  }

  def partitioningOf(db: String, table: String): Seq[String] = {
    import graft.functions.JValue, graft.functions.JValue._
    if (!Files.exists(partitionFile(db, table))) Nil
    else JValue.parse(Files.readString(partitionFile(db, table))) match {
      case JArr(items) => items.collect { case JStr(s) => s }
      case other => throw new IllegalStateException(s"bad partition sidecar: $other")
    }
  }

  // ---- clustering (sort-order data skipping) ----------------------

  private def clusterFile(db: String, table: String): Path =
    tableDir(db, table).resolve("cluster.json")

  /** Declare a clustering (sort) order for the table. Unlike
    * partitioning this is a LAYOUT property, not a path property — it
    * takes effect at the next [[cluster]] rewrite (and [[compact]]
    * preserves it), so it can be set on a non-empty table. */
  def setClustering(db: String, table: String, cols: Seq[String]): Unit = synchronized {
    ensureTable(db, table)
    val have = readSchemaSeq(db, table).map(_._1).toSet
    require(cols.forall(have.contains),
      s"cluster columns must exist in schema: ${cols.filterNot(have.contains)}")
    Files.writeString(clusterFile(db, table),
      cols.map(quote).mkString("[", ",", "]"))
  }

  def clusteringOf(db: String, table: String): Seq[String] = {
    import graft.functions.JValue, graft.functions.JValue._
    if (!Files.exists(clusterFile(db, table))) Nil
    else JValue.parse(Files.readString(clusterFile(db, table))) match {
      case JArr(items) => items.collect { case JStr(s) => s }
      case other => throw new IllegalStateException(s"bad cluster sidecar: $other")
    }
  }

  /** Cluster rewrite — the data-skipping maintenance op. Rewrites the
    * data dir range-partitioned + sorted on the table's clustering
    * columns, so every output file (and every parquet row group inside
    * it) covers a narrow, disjoint key range. Selective scans then
    * skip whole row groups on footer min/max stats — at 100 TB this is
    * the difference between touching ~1/nFiles of the table and
    * touching all of it, with zero layout knowledge in the query. The
    * sort itself is one distributed range-shuffle + per-partition
    * sort (`repartitionByRange` + `sortWithinPartitions`), never a
    * global single-task sort. Same non-transactional dir-swap as
    * [[compact]]. Returns (files before, files after). */
  def cluster(db: String, table: String, sortCols: Seq[String] = Nil,
              targetFileBytes: Long = 128L << 20): (Int, Int) = synchronized {
    val cols0 = if (sortCols.nonEmpty) sortCols else clusteringOf(db, table)
    require(cols0.nonEmpty, "no cluster columns: pass sortCols or setClustering first")
    if (sortCols.nonEmpty) setClustering(db, table, sortCols)
    rewriteData(db, table, targetFileBytes, Some(cols0))
  }

  // ---- per-table ingest dedup policy ------------------------------

  private def dedupFile(db: String, table: String): Path =
    tableDir(db, table).resolve("dedup.json")

  /** Where the table's dedup index lives: two raw parquet dirs (bands,
    * sigs) under the table dir — internal state, not user tables. */
  def dedupIndexDir(db: String, table: String): Path =
    tableDir(db, table).resolve("dedup_index")

  def setDedupPolicy(db: String, table: String,
                     policy: GraftCatalog.DedupPolicy): Unit = synchronized {
    ensureTable(db, table)
    require(policy.mode == "tag" || policy.mode == "drop",
      s"dedup mode must be tag|drop: ${policy.mode}")
    require(policy.params.method == "minhash" || policy.params.method == "semantic",
      s"dedup method must be minhash|semantic: ${policy.params.method}")
    // fail FAST on a convention change under a live index: signatures
    // from different kernels/params are not mutually comparable — a
    // mismatched probe would silently pass every duplicate as novel
    storedIndexParams(db, table).foreach { stored =>
      val want = policy.params
      if (stored != want) throw new IllegalStateException(
        s"dedup index for $db.$table was built under $stored; new policy " +
          s"wants $want — clear or rebuild the index before changing the convention")
    }
    Files.writeString(dedupFile(db, table),
      s"""{"textCol":${quote(policy.textCol)},"mode":${quote(policy.mode)},""" +
        s""""threshold":${policy.threshold},""" + policy.params.json + "}")
  }

  def dedupPolicyOf(db: String, table: String): Option[GraftCatalog.DedupPolicy] = {
    import graft.functions.JValue, graft.functions.JValue._
    if (!Files.exists(dedupFile(db, table))) None
    else JValue.parse(Files.readString(dedupFile(db, table))) match {
      case o: JObj =>
        Some(GraftCatalog.DedupPolicy(
          o.get("textCol").collect { case JStr(s) => s }.get,
          o.get("mode").collect { case JStr(s) => s }.getOrElse("tag"),
          o.get("threshold").collect { case JNum(n) => n.toDouble }.getOrElse(0.7),
          GraftCatalog.DedupParams.fromJson(o)))
      case other => throw new IllegalStateException(s"bad dedup sidecar: $other")
    }
  }

  /** The convention the table's stored index was BUILT under —
    * persisted in `dedup_index/params.json` when the index is first
    * written and required to match the policy at every probe. Indexes
    * predating the sidecar could only have been built with the
    * defaults (nothing else was ever forwarded), so absence reads as
    * [[GraftCatalog.DedupParams]] defaults. */
  def storedIndexParams(db: String, table: String): Option[GraftCatalog.DedupParams] = {
    import graft.functions.JValue, graft.functions.JValue._
    val f = dedupIndexDir(db, table).resolve("params.json")
    if (Files.exists(f)) JValue.parse(Files.readString(f)) match {
      case o: JObj => Some(GraftCatalog.DedupParams.fromJson(o))
      case other => throw new IllegalStateException(s"bad index params sidecar: $other")
    }
    else if (Files.exists(dedupIndexDir(db, table).resolve("bands")))
      Some(GraftCatalog.DedupParams()) // legacy index: defaults by construction
    else None
  }

  /** Append a batch: project to catalog columns (missing → NULL), cast
    * to catalog types, write parquet part-files (Hive-layout when the
    * table declares partitioning). */
  /** Append via a per-call staging directory + rename publish.
    *
    * A plain `mode("append")` into the shared data dir is unsafe under
    * the worker pool: concurrent Spark write jobs share the
    * committer's `_temporary/0` under the output path, so one job's
    * commit sweeps the other's finished task files into the table and
    * its cleanup deletes the rival's in-flight staging. The
    * IngestProbe run that motivated this surfaced both faces at once —
    * racing loads dying with "_temporary/0 does not exist" AND ~15k
    * duplicate rows published by the winners' commits before the
    * losers retried.
    *
    * Each call therefore writes (mode=overwrite) into its own
    * `.stage/<key>` directory — committer isolation — then renames the
    * part files into `data/` as `<key>-<n>.parquet` (partition subdirs
    * preserved). With the default random key, concurrent appends can
    * never collide. Queue-driven callers pass their QUEUE JOB ID as
    * `jobKey`: the publish step first deletes any `<key>-*` files an
    * earlier attempt of the same job landed, so an at-least-once
    * redelivery converges to exactly-once publication instead of
    * duplicating rows. */
  def append(db: String, table: String, df: DataFrame,
             jobKey: Option[String] = None): Unit = {
    val target = structOf(db, table)
    val present = df.columns.toSet
    val projected = df.select(target.fields.toIndexedSeq.map { f =>
      if (present.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
    // arbitrary caller keys (queue ids, file paths) → fixed-width hex
    val key = jobKey match {
      case Some(k) =>
        val md = java.security.MessageDigest.getInstance("SHA-256")
        md.digest(k.getBytes("UTF-8")).take(16).map("%02x".format(_)).mkString
      case None => java.util.UUID.randomUUID().toString.replace("-", "")
    }
    val stage = tableDir(db, table).resolve(".stage").resolve(key)
    val w = projected.write.mode("overwrite")
    val parts = partitioningOf(db, table)
    (if (parts.nonEmpty) w.partitionBy(parts: _*) else w)
      .parquet(stage.toString)
    publishStage(stage, dataDir(db, table), key)
  }

  /** Rename-publish a staged write into the data dir (see [[append]]):
    * idempotent per key — a previous attempt's published files are
    * removed first, then the staged part files move in under
    * deterministic `<key>-<n>.parquet` names. Local-FS renames, no
    * data copy. */
  private def publishStage(stage: Path, data: Path, key: String): Unit = {
    Files.createDirectories(data)
    val prefix = key + "-"
    val prior = Files.walk(data)
    try prior.iterator().asScala
      .filter(p => p.getFileName.toString.startsWith(prefix)).toList
      .foreach(Files.delete)
    finally prior.close()
    val walk = Files.walk(stage)
    val staged =
      try walk.iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(".parquet")).toList
        .sortBy(_.toString)
      finally walk.close()
    staged.zipWithIndex.foreach { case (src, i) =>
      val destDir = data.resolve(stage.relativize(src.getParent))
      Files.createDirectories(destDir)
      Files.move(src, destDir.resolve(s"$key-$i.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    // best-effort staging cleanup (stray _SUCCESS/_temporary markers)
    val rm = Files.walk(stage)
    try rm.iterator().asScala.toList.reverse.foreach(p =>
      try Files.deleteIfExists(p) catch { case _: Exception => () })
    finally rm.close()
  }

  private def hasData(db: String, table: String): Boolean = {
    val dir = dataDir(db, table)
    Files.exists(dir) && {
      val walk = Files.walk(dir)
      try walk.iterator().asScala.exists(_.getFileName.toString.endsWith(".parquet"))
      finally walk.close()
    }
  }

  /** Read the table under its full sidecar schema (partition columns
    * resolve from the directory layout by name). */
  def read(db: String, table: String): DataFrame = {
    val struct = structOf(db, table)
    if (hasData(db, table))
      spark.read.schema(struct).parquet(dataDir(db, table).toString)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], struct)
  }

  /** Small-file compaction (maintenance op). The rotation-based ingest
    * path writes one parquet part per NDJSON batch — at warehouse scale
    * that accretes tiny files until scan PLANNING (listing + footer
    * reads) dominates query time. One distributed job rewrites the
    * data dir into ~targetFileBytes parts, then swaps directories via
    * the Hadoop FS client (same code path on file://, s3a://, gs://).
    *
    * Not transactional, like the reference's backends: a reader racing
    * the two renames can transiently miss the table; serialize
    * compactions through the control-plane job queue in deployments.
    * Returns (files before, files after). */
  def compact(db: String, table: String,
              targetFileBytes: Long = 128L << 20): (Int, Int) = synchronized {
    // a compaction of a clustered table must not destroy its sort
    // order — route through the same rewrite with the stored columns
    val cl = clusteringOf(db, table)
    rewriteData(db, table, targetFileBytes, if (cl.nonEmpty) Some(cl) else None)
  }

  /** Shared rewrite behind [[compact]] and [[cluster]]: one
    * distributed job into ~targetFileBytes parts (range-sorted when
    * clusterCols is set), then the dir swap. */
  private def rewriteData(db: String, table: String, targetFileBytes: Long,
                          clusterCols: Option[Seq[String]]): (Int, Int) = {
    import org.apache.hadoop.fs.{Path => HPath}
    val conf = spark.sparkContext.hadoopConfiguration
    val dataPath = new HPath(dataDir(db, table).toString)
    val fs = dataPath.getFileSystem(conf)
    if (!fs.exists(dataPath)) return (0, 0)
    def parquetParts(p: HPath): Seq[org.apache.hadoop.fs.FileStatus] = {
      val out = Seq.newBuilder[org.apache.hadoop.fs.FileStatus]
      val it = fs.listFiles(p, true) // recursive: partitioned layouts nest
      while (it.hasNext) {
        val st = it.next()
        if (st.getPath.getName.endsWith(".parquet")) out += st
      }
      out.result()
    }
    val parts = parquetParts(dataPath)
    if (parts.isEmpty) return (0, 0)
    if (parts.length <= 1 && clusterCols.isEmpty) return (parts.length, parts.length)
    val totalBytes = parts.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val tmp = new HPath(tableDir(db, table).resolve("data.compacting").toString)
    val old = new HPath(tableDir(db, table).resolve("data.old").toString)
    fs.delete(tmp, true); fs.delete(old, true)
    val partCols = partitioningOf(db, table)
    val rewrite = (clusterCols, partCols) match {
      // clustered: disjoint key ranges per file, rows sorted inside —
      // row-group min/max stats become selective
      case (Some(cc), pc) if pc.isEmpty =>
        read(db, table).repartitionByRange(nOut, cc.map(col): _*)
          .sortWithinPartitions(cc.map(col): _*)
          .write.mode("overwrite")
      case (Some(cc), pc) =>
        // hive-partitioned AND clustered: cluster within partition dirs
        read(db, table).repartitionByRange(nOut, (pc ++ cc).map(col): _*)
          .sortWithinPartitions((pc ++ cc).map(col): _*)
          .write.mode("overwrite").partitionBy(pc: _*)
      // partitioned: shuffle rows to their partition dirs so each dir
      // compacts to ~one part; flat: straight repartition(nOut)
      case (None, pc) if pc.nonEmpty =>
        read(db, table).repartition(nOut, pc.map(col): _*)
          .write.mode("overwrite").partitionBy(pc: _*)
      case _ =>
        read(db, table).repartition(nOut).write.mode("overwrite")
    }
    rewrite.parquet(tmp.toString)
    fs.rename(dataPath, old)
    fs.rename(tmp, dataPath)
    fs.delete(old, true)
    (parts.length, parquetParts(dataPath).length)
  }

  /** Append honoring the table's [[GraftCatalog.DedupPolicy]] — the
    * ONE policy-aware entry shared by every ingest surface (HTTP batch
    * loads via Loader, structured-streaming micro-batches via
    * StreamingIngest): no policy, or a batch without the text column,
    * is a plain [[append]]; otherwise the batch probes the table's
    * stored MinHash band index (batch-sized work, never corpus-sized
    * — [[graft.operators.Dedup.minhashIncrementalAgainst]]), near-dups
    * are tagged `__is_dup`/`__dup_of` or dropped, and ONLY survivors'
    * band/sig rows join the index — re-ingesting a document any
    * number of times grows the index once, upgrading at-least-once
    * delivery to effectively-once. Returns appended row count.
    *
    * `jobKey` (the queue job id for worker-driven loads) keys the
    * PLAIN append paths' idempotent publish (see [[append]]). The
    * dedup paths stay keyless on purpose: a retried job's survivor set
    * is NOT the original batch (the index now knows attempt 1's
    * survivors, so the retry's survivors are empty) — a key-based
    * republish there would delete attempt 1's published rows and
    * replace them with nothing. Their retry convergence is the
    * content-level index probe itself. */
  def appendWithPolicy(db: String, table: String, df: DataFrame,
                       jobKey: Option[String] = None): Long =
    dedupPolicyOf(db, table) match {
      case Some(p) if df.columns.contains(p.textCol) =>
        if (p.params.method == "semantic") appendDedupedSemantic(db, table, df, p)
        else appendDeduped(db, table, df, p)
      case Some(p) =>
        // policy-bearing table taking the PLAIN append path (batch
        // lacks the text column — usually a typo'd text_col): count
        // it so the downgrade from effectively-once is observable
        policyBypassCount.incrementAndGet()
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"table $db.$table has a dedup policy on '${p.textCol}' but the " +
            "batch lacks that column; appending WITHOUT dedup")
        append(db, table, df, jobKey)
        df.count()
      case None =>
        append(db, table, df, jobKey)
        df.count()
    }

  /** Batches appended to a policy-bearing table WITHOUT the probe
    * because the text column was absent (see [[appendWithPolicy]]). */
  val policyBypassCount = new java.util.concurrent.atomic.AtomicLong(0)

  // appendDeduped and compactDedupIndex serialize per (db, table):
  // two concurrent batches would otherwise both probe before either
  // appends its survivors (concurrent near-dups all surviving), and a
  // batch racing the compactor's non-atomic dir swap would find no
  // index and skip the probe entirely
  private val tableLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(db: String, table: String): Object =
    tableLocks.computeIfAbsent(s"$db/$table", _ => new Object)

  /** Cross-driver lease store. The JVM lock above only serializes
    * batches INSIDE this driver; a warehouse shared by several drivers
    * (or several GraftCatalog instances) needs a metastore lease or
    * two drivers' batches can both probe before either appends — every
    * concurrent near-dup survives. GraftServer wires its MetaStore in;
    * embedders running a single catalog instance may leave it None. */
  @volatile var leaseStore: Option[graft.control.LeaseStore] = None
  /** This driver's lease identity (stable for the catalog's lifetime). */
  val leaseHolder: String = java.util.UUID.randomUUID().toString
  /** Lease TTL: generous — it only bounds how long a CRASHED driver
    * can block the table, not how long a healthy append may run
    * (healthy holders keep the row until release). */
  @volatile var leaseTtlMs: Long = 10 * 60 * 1000L
  /** How long an append waits for a contended lease before failing the
    * batch back to the (at-least-once) queue for redelivery. */
  @volatile var leaseWaitMs: Long = 5 * 60 * 1000L

  /** Per-(db, table) critical section: JVM lock always; metastore
    * lease additionally when wired. Lock order (JVM then lease) is
    * deadlock-free — the lease is only ever taken while holding the
    * JVM lock for the same key. */
  private def withTableLease[T](db: String, table: String)(body: => T): T =
    lockFor(db, table).synchronized {
      leaseStore match {
        case None => body
        case Some(ls) =>
          val name = s"dedup/$db/$table"
          val deadline = System.currentTimeMillis() + leaseWaitMs
          var tok = ls.acquireLease(name, leaseHolder, leaseTtlMs)
          while (tok.isEmpty && System.currentTimeMillis() < deadline) {
            Thread.sleep(50)
            tok = ls.acquireLease(name, leaseHolder, leaseTtlMs)
          }
          if (tok.isEmpty) throw new IllegalStateException(
            s"could not acquire ingest-dedup lease '$name' within ${leaseWaitMs} ms " +
              "— another driver holds it; nack the batch for redelivery")
          try body finally ls.releaseLease(name, leaseHolder)
      }
    }

  /** The policy-gated append. The id-stamped batch is pinned
    * (localCheckpoint) before probing: snowflake ids are time-derived,
    * so an unpinned plan recomputed between the probe and the append
    * could re-stamp rows. */
  private def appendDeduped(db: String, table: String, df: DataFrame,
                            policy: GraftCatalog.DedupPolicy): Long = withTableLease(db, table) {
    val idCol = RowIdColumn
    val pr = policy.params
    // streaming batches arrive without row ids; batch loads pre-stamp
    val stamped =
      if (df.columns.contains(idCol)) df
      else df.withColumn(idCol, graft.functions.NativeExpressions.snowflake_id())
    val batch = stamped.transform(graft.util.Checkpoints.pin)
    val dir = dedupIndexDir(db, table)
    val (bandsPath, sigsPath) = (dir.resolve("bands"), dir.resolve("sigs"))
    val haveIndex = Files.exists(bandsPath)
    // refuse a probe under a convention the index was not built with:
    // cross-kernel signatures share no buckets, so the mismatch would
    // not error — it would pass EVERY duplicate as novel
    storedIndexParams(db, table).foreach { stored =>
      if (stored != pr) throw new IllegalStateException(
        s"dedup index for $db.$table was built under $stored but the policy " +
          s"probes with $pr — rebuild the index or restore the original params")
    }

    val indexVerdicts =
      if (!haveIndex)
        batch.select(col(idCol), lit(false).as("__ix_dup"),
          lit(null).cast("long").as("__ix_of"))
      else {
        val index = graft.operators.Dedup.MinhashIndex(
          spark.read.parquet(bandsPath.toString),
          spark.read.parquet(sigsPath.toString))
        graft.operators.Dedup.minhashIncrementalAgainst(
          index, batch, idCol, policy.textCol,
          shingleK = pr.shingleK, numHashes = pr.numHashes, bands = pr.bands,
          threshold = policy.threshold, seed = pr.seed, useMd5 = pr.useMd5,
          oph = pr.oph)
          .select(col(idCol), col("is_dup").as("__ix_dup"),
            col("dup_of").as("__ix_of"))
      }
    // WITHIN-batch near-dups (a redelivered row often lands in the
    // same rotation file — the index can't see those): one-hop group
    // rep per batch doc, the group min keeps, the rest tag/drop. An
    // index match wins precedence (the corpus row is the original).
    val batchGroups = graft.operators.Dedup.minhashDedup(
      batch, idCol, policy.textCol,
      shingleK = pr.shingleK, numHashes = pr.numHashes, bands = pr.bands,
      threshold = policy.threshold, seed = pr.seed, useMd5 = pr.useMd5,
      oph = pr.oph)
      .select(col(idCol), col("dup_group").as("__bg"))
    val verdicts = indexVerdicts.join(batchGroups, Seq(idCol))
      .select(col(idCol),
        (col("__ix_dup") || col("__bg") =!= col(idCol)).as("__is_dup"),
        coalesce(col("__ix_of"),
          when(col("__bg") =!= col(idCol), col("__bg"))).as("__dup_of"))
    val tagged = batch.join(verdicts, Seq(idCol)).transform(graft.util.Checkpoints.pin)
    val survivors = tagged.filter(!col("__is_dup"))

    // TABLE append happens BEFORE the index append: if the worker dies
    // between the two, the retry re-probes an index that does not yet
    // know the batch, re-appends, and converges (a duplicate table row
    // at worst — the at-least-once baseline). The reverse order could
    // tag the retry as a dup of an index entry whose table row never
    // landed, silently losing the document.
    val appended =
      if (policy.mode == "drop") {
        append(db, table, survivors.drop("__is_dup", "__dup_of"))
        survivors.count()
      } else {
        addColumns(db, table, Map(
          "__is_dup" -> TypeLattice.Bool, "__dup_of" -> TypeLattice.Int))
        append(db, table, tagged)
        tagged.count()
      }
    val survivorIndex = graft.operators.Dedup.buildMinhashIndex(
      survivors, idCol, policy.textCol,
      shingleK = pr.shingleK, numHashes = pr.numHashes, bands = pr.bands,
      seed = pr.seed, useMd5 = pr.useMd5, oph = pr.oph)
    survivorIndex.bands.write.mode("append").parquet(bandsPath.toString)
    survivorIndex.sigs.write.mode("append").parquet(sigsPath.toString)
    // record the convention the index is built under, once, so every
    // future probe (and setDedupPolicy) can verify against it
    val paramsFile = dir.resolve("params.json")
    if (!Files.exists(paramsFile))
      Files.writeString(paramsFile, "{" + pr.json + "}")
    appended
  }

  /** The SEMANTIC sibling of [[appendDeduped]] — dedup by MEANING, not
    * surface: the policy's column carries the document's embedding as
    * a JSON array string (the shape the 4-type ingest lattice
    * transports — horizontal flattening would shred a raw JSON array
    * into indexed columns), and batches probe a stored IVF index
    * ([[graft.operators.Similarity]]'s cells) instead of minhash
    * bands: centroids are seeded from the FIRST batch and pinned (the
    * standard IVF contract — re-cluster by rebuilding the index),
    * each incoming row routes to its nProbe nearest cells, candidates
    * within those cells verify by cosine ≥ threshold, and only
    * survivors' (doc, cell, vec) rows join the index. Paraphrase
    * pairs whose embeddings land beyond nProbe cells are the standard
    * ANN recall trade, same as band misses on the minhash path.
    * Unparseable embeddings pass as novel and stay OUT of the index. */
  private def appendDedupedSemantic(db: String, table: String, df: DataFrame,
                                    policy: GraftCatalog.DedupPolicy): Long = withTableLease(db, table) {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{broadcast, coalesce, from_json, least, min, row_number, when}
    val idCol = RowIdColumn
    val nProbe = 2
    val centroidCap = 64
    val stamped =
      if (df.columns.contains(idCol)) df
      else df.withColumn(idCol, graft.functions.NativeExpressions.snowflake_id())
    val batch = stamped.transform(graft.util.Checkpoints.pin)
    val dir = dedupIndexDir(db, table)
    val (vecsPath, centsPath) = (dir.resolve("vecs"), dir.resolve("centroids"))
    val haveIndex = Files.exists(centsPath)
    storedIndexParams(db, table).foreach { stored =>
      if (stored != policy.params) throw new IllegalStateException(
        s"dedup index for $db.$table was built under $stored but the policy " +
          s"probes with ${policy.params} — rebuild the index or restore the original params")
    }
    val parsed = batch
      .select(col(idCol), from_json(col(policy.textCol),
        ArrayType(DoubleType)).as("__vec"))
      .filter(col("__vec").isNotNull)
    val cents =
      if (haveIndex) spark.read.parquet(centsPath.toString)
      else parsed.orderBy(idCol).limit(centroidCap)
        .select(col(idCol).as("centroid_id"), col("__vec").as("centroid_vec"))
        .transform(graft.util.Checkpoints.pin)
    val cos = graft.operators.Similarity.cosine(_, _)

    val indexVerdicts =
      if (!haveIndex)
        batch.select(col(idCol), lit(false).as("__ix_dup"),
          lit(null).cast("long").as("__ix_of"))
      else {
        val qCells = parsed.crossJoin(broadcast(cents))
          .select(col(idCol), col("__vec"), col("centroid_id"),
            cos(col("__vec"), col("centroid_vec")).as("__sim"))
          .withColumn("__r", row_number().over(Window.partitionBy(idCol)
            .orderBy(col("__sim").desc, col("centroid_id"))))
          .filter(col("__r") <= nProbe)
          .select(col(idCol).as("__in"), col("__vec"), col("centroid_id").as("cell"))
        val matched = spark.read.parquet(vecsPath.toString)
          .join(qCells, Seq("cell"))
          .filter(cos(col("vec"), col("__vec")) >= policy.threshold)
          .groupBy("__in").agg(min("doc").as("__ix_of"))
        batch.select(col(idCol))
          .join(matched.withColumnRenamed("__in", idCol), Seq(idCol), "left_outer")
          .select(col(idCol), col("__ix_of").isNotNull.as("__ix_dup"), col("__ix_of"))
      }
    // within-batch near-dups: cell-bucketed self-join, one-hop group min
    val assigned = graft.operators.Similarity.ivfAssign(parsed, idCol, "__vec", cents)
    val a = assigned.select(col("cell"), col(idCol).as("__a"), col("__vec").as("__va"))
    val b = assigned.select(col("cell"), col(idCol).as("__b"), col("__vec").as("__vb"))
    val nb = a.join(b, Seq("cell")).filter(col("__a") < col("__b"))
      .filter(cos(col("__va"), col("__vb")) >= policy.threshold)
      .groupBy(col("__b").as(idCol)).agg(min("__a").as("__nbm"))
    val batchGroups = batch.select(col(idCol))
      .join(nb, Seq(idCol), "left_outer")
      .select(col(idCol),
        least(col(idCol), coalesce(col("__nbm"), col(idCol))).as("__bg"))
    val verdicts = indexVerdicts.join(batchGroups, Seq(idCol))
      .select(col(idCol),
        (col("__ix_dup") || col("__bg") =!= col(idCol)).as("__is_dup"),
        coalesce(col("__ix_of"),
          when(col("__bg") =!= col(idCol), col("__bg"))).as("__dup_of"))
    val tagged = batch.join(verdicts, Seq(idCol)).transform(graft.util.Checkpoints.pin)
    val survivors = tagged.filter(!col("__is_dup"))

    // same crash-ordering rule as the minhash path: table first, index
    // second — a retry re-probes an index that missed the batch and
    // converges on at-least-once
    val appended =
      if (policy.mode == "drop") {
        append(db, table, survivors.drop("__is_dup", "__dup_of"))
        survivors.count()
      } else {
        addColumns(db, table, Map(
          "__is_dup" -> TypeLattice.Bool, "__dup_of" -> TypeLattice.Int))
        append(db, table, tagged)
        tagged.count()
      }
    val survivorVecs = assigned
      .join(survivors.select(col(idCol)), Seq(idCol))
      .select(col(idCol).as("doc"), col("cell"), col("__vec").as("vec"))
    survivorVecs.write.mode("append").parquet(vecsPath.toString)
    if (!haveIndex) {
      cents.write.mode("overwrite").parquet(centsPath.toString)
      Files.writeString(dir.resolve("params.json"), "{" + policy.params.json + "}")
    }
    appended
  }

  /** Compact the table's dedup-index dirs (bands, sigs): the ingest
    * path appends one parquet part per batch, so at a
    * batch-every-few-seconds rate the index accretes tiny files until
    * probe PLANNING (listing + footers) dominates probe time — the
    * same disease [[compact]] cures for tables, applied to the raw
    * index dirs. Takes the same per-(db, table) lock as
    * [[appendWithPolicy]]'s dedup path, so an ingesting batch can
    * never race the non-atomic dir swap (during the rename window the
    * index transiently looks absent and a probe would be skipped).
    * Returns (files before, files after) summed over both dirs. */
  def compactDedupIndex(db: String, table: String,
                        targetFileBytes: Long = 128L << 20): (Int, Int) = withTableLease(db, table) {
    import org.apache.hadoop.fs.{Path => HPath}
    val conf = spark.sparkContext.hadoopConfiguration
    var (before, after) = (0, 0)
    for (part <- Seq("bands", "sigs")) {
      val dir = new HPath(dedupIndexDir(db, table).resolve(part).toString)
      val fs = dir.getFileSystem(conf)
      if (fs.exists(dir)) {
        def parts(p: HPath): Int = {
          var n = 0
          val it = fs.listFiles(p, false)
          while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
          n
        }
        val nIn = parts(dir)
        before += nIn
        if (nIn <= 1) after += nIn
        else {
          val bytes = {
            var s = 0L
            val it = fs.listFiles(dir, false)
            while (it.hasNext) { val st = it.next(); if (st.getPath.getName.endsWith(".parquet")) s += st.getLen }
            s
          }
          val nOut = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
          val tmp = new HPath(dedupIndexDir(db, table).resolve(s"$part.compacting").toString)
          val old = new HPath(dedupIndexDir(db, table).resolve(s"$part.old").toString)
          fs.delete(tmp, true); fs.delete(old, true)
          spark.read.parquet(dir.toString).repartition(nOut)
            .write.mode("overwrite").parquet(tmp.toString)
          fs.rename(dir, old)
          fs.rename(tmp, dir)
          fs.delete(old, true)
          after += parts(dir)
        }
      }
    }
    (before, after)
  }

  /** Register all tables of a db as temp views for SQL passthrough. */
  def registerViews(db: String): Unit =
    listTables(db).foreach(t => read(db, t).createOrReplaceTempView(t))

  def columns(db: String, table: String): Seq[(String, String)] = readSchemaSeq(db, table)

  // sidecar format: JSON array of {"name":..,"type":..} preserving order
  private def writeSchema(db: String, table: String, cols: Seq[(String, String)]): Unit = {
    val json = cols.map { case (n, t) =>
      s"""{"name":${quote(n)},"type":${quote(t)}}"""
    }.mkString("[", ",", "]")
    Files.writeString(schemaFile(db, table), json)
  }

  private def readSchemaSeq(db: String, table: String): Vector[(String, String)] = {
    import graft.functions.JValue, graft.functions.JValue._
    if (!tableExists(db, table)) return Vector.empty
    JValue.parse(Files.readString(schemaFile(db, table))) match {
      case JArr(items) => items.map {
        case o: JObj =>
          val n = o.get("name").collect { case JStr(s) => s }.get
          val t = o.get("type").collect { case JStr(s) => s }.get
          n -> t
        case other => throw new IllegalStateException(s"bad schema entry: $other")
      }
      case other => throw new IllegalStateException(s"bad schema sidecar: $other")
    }
  }

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}

object GraftCatalog {
  /** The signature CONVENTION of a minhash dedup index — everything
    * that decides whether two sketches are comparable. Persisted in
    * the policy sidecar AND next to the index it built; a probe whose
    * params disagree with the stored index's refuses loudly instead
    * of silently declaring every duplicate novel. */
  final case class DedupParams(shingleK: Int = 5, numHashes: Int = 128,
                               bands: Int = 32, seed: Long = 42L,
                               useMd5: Boolean = false, oph: Boolean = true,
                               method: String = "minhash") {
    def json: String =
      s""""shingleK":$shingleK,"numHashes":$numHashes,"bands":$bands,""" +
        s""""seed":$seed,"useMd5":$useMd5,"oph":$oph,"method":${
          "\"" + method + "\""}"""
  }
  object DedupParams {
    def fromJson(o: graft.functions.JValue.JObj): DedupParams = {
      import graft.functions.JValue._
      def num(k: String, dflt: Long) =
        o.get(k).collect { case JNum(n) => n.toLong }.getOrElse(dflt)
      def bool(k: String, dflt: Boolean) =
        o.get(k).collect { case JBool(b) => b }.getOrElse(dflt)
      DedupParams(num("shingleK", 5).toInt, num("numHashes", 128).toInt,
        num("bands", 32).toInt, num("seed", 42L),
        bool("useMd5", false), bool("oph", true),
        o.get("method").collect { case JStr(s) => s }.getOrElse("minhash"))
    }
  }

  /** Opt-in near-dup policy for the ingest path: batches probe the
    * table's stored MinHash band index before appending. mode "tag"
    * appends every row with (__is_dup, __dup_of) columns; mode "drop"
    * appends survivors only. Either way only non-dup rows join the
    * index, so re-ingesting the same document any number of times
    * grows the index once — the reference's at-least-once-with-
    * duplicates ingest upgraded to effectively-once. Carries the full
    * signature convention ([[DedupParams]]) so an index built under
    * any kernel family (e.g. the md5 family `dedup_incremental`
    * uses) is probed with matching signatures. */
  final case class DedupPolicy(textCol: String, mode: String = "tag",
                               threshold: Double = 0.7,
                               params: DedupParams = DedupParams())
}
