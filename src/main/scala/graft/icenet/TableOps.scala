package graft.icenet

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keyed-table write semantics over parquet directories — the Spark
  * re-expression of the reference's PostgreSQL write path:
  *
  *  - S5 `INSERT ... ON CONFLICT DO NOTHING` (processor.py:249-257, 326-334)
  *    -> [[insertIgnore]]: left-anti join of incoming vs existing keys, then
  *    append. First write wins, re-ingest converges.
  *  - S6 `INSERT ... SELECT ... ON CONFLICT DO UPDATE` (processor.py:375-403)
  *    -> [[upsert]]: union-by-key with incoming precedence (last write wins).
  *  - S7 `REFRESH MATERIALIZED VIEW` (processor.py:444-448) ->
  *    [[overwriteView]]: full recompute + crash-safe directory swap.
  *  - S8 `CREATE TABLE IF NOT EXISTS` (processor.py:198-209 etc.) ->
  *    [[exists]]/first-write bootstrap; parquet needs no DDL-before-write.
  *
  * On a shared cluster these four become Delta/Iceberg `MERGE`/`INSERT`/
  * `CREATE OR REPLACE` with optimistic concurrency; this parquet
  * implementation keeps identical *semantics* (idempotent convergence,
  * verified by ForecastPipelineSpec) with single-writer discipline — which is
  * exactly the reference's own concurrency model (host.json:4-8 forces
  * strictly serial processing).
  *
  * Crash-safety model (the parquet stand-in for a transactional commit):
  *  - [[replace]] never deletes the current table before its successor is in
  *    place: write `.staging`, rename current -> `.old`, rename `.staging` ->
  *    current, delete `.old`. The commit point is the second rename; at every
  *    instant either the table dir or its `.old` sibling holds one complete
  *    consistent version, and [[read]]/[[exists]] fall back to `.old` when a
  *    crash landed between the renames. Leftover `.staging`/`.old` dirs are
  *    cleaned by the next replace.
  *  - [[insertIgnore]]'s append commits file-at-a-time (Spark's task-commit
  *    rename). A crash can leave a PARTIAL batch visible, but every appended
  *    row is a brand-new key (anti-joined), so re-running the same ingest
  *    inserts exactly the missing rows — the same convergence granularity as
  *    the reference's row-at-a-time ON CONFLICT inserts.
  *
  * Scale notes: the anti-join reads ONLY the key columns of the existing side
  * (column pruning reaches the parquet scan) and, when the table is
  * partitioned, ONLY the partitions whose values occur in the incoming batch
  * ([[freshRows]] seeds partition pruning from the incoming frame) — so a
  * one-date ingest against years of facts touches one date's files, matching
  * the PG unique-index cost model it replaces. The existing side is the BUILD
  * side of the left-anti join only after pruning makes it small; Catalyst
  * picks broadcast vs shuffle from the pruned size via AQE. Tables are
  * partitioned by the date column when `partitionCols` is given, replacing
  * the reference's b-tree indexes (processor.py:286-288) with pruning.
  */
object TableOps {

  def exists(spark: SparkSession, path: String): Boolean =
    rawExists(spark, path) || rawExists(spark, path + ".old")

  /** Single-writer arbitration for the parquet commit protocol. The
    * reference delegates concurrent-writer conflicts to PostgreSQL
    * (processor.py:91-115 retries on conflict) and then forces strictly
    * serial processing anyway (host.json:4-8); the parquet swap protocol
    * here is likewise only correct under ONE writer per table — two
    * concurrent [[insertIgnore]] calls could both pass the anti-join and
    * double-insert a key. Every mutating op therefore takes a lease via
    * atomic create-if-absent of a `.lock` sibling file and FAILS FAST
    * (`IllegalStateException`) when another writer holds it — the Spark
    * analogue of PG failing the second transaction rather than corrupting.
    *
    * A writer that dies without releasing leaves a stale lock; that is a
    * deliberate fail-safe (writes stay blocked until an operator confirms
    * the writer is gone and calls [[forceUnlock]]) rather than a timeout
    * lease, which could let two live writers overlap on a long GC pause.
    *
    * Atomicity caveat: create-if-absent is a true atomic lease only on
    * HDFS-like filesystems (namenode-arbitrated create). LocalFileSystem's
    * exists-then-create and object stores' PUT are not atomic, so on those
    * backends the lock is best-effort double-write *detection*, not
    * prevention — acceptable under the single-writer deployment model, and
    * the seam where a real deployment swaps in Delta/Iceberg OCC. Only a
    * FileAlreadyExistsException is interpreted as "locked"; any other
    * IOException (permissions, transient IO) is rethrown as-is so an
    * operator is never misled into force-unlocking a live writer.
    */
  def withTableLock[T](spark: SparkSession, path: String)(body: => T): T = {
    val lock = new Path(path + ".lock")
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out =
      try fs.create(lock, false) // atomic create-if-absent = lease acquire
      catch {
        case e @ (_: org.apache.hadoop.fs.FileAlreadyExistsException |
                  _: java.nio.file.FileAlreadyExistsException) =>
          throw new IllegalStateException(
            s"$path is locked by another writer ($lock exists); concurrent " +
              "keyed writes would break first/last-write-wins. If the " +
              "holder crashed, remove the lock with TableOps.forceUnlock.", e)
      }
    try {
      out.writeBytes(s"pid=${ProcessHandle.current().pid()}\n")
      out.close()
      body
    } finally fs.delete(lock, false)
  }

  /** Removes a stale lock left by a crashed writer. Operator-invoked only —
    * see [[withTableLock]] for why there is no automatic timeout.
    */
  def forceUnlock(spark: SparkSession, path: String): Unit = {
    val lock = new Path(path + ".lock")
    lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(lock, false)
  }

  /** Readers racing a crashed swap must always see one complete committed
    * version (the class crash-safety model): [[resolve]] covers a crashed
    * full-table [[replace]] (fall back to `.old`); the union below covers a
    * crashed [[replacePartitions]] — any parked `.oldparts` leaf whose
    * current partition dir is missing is the last committed version of that
    * partition and is read alongside the table (read-only: [[heal]], which
    * physically promotes it, only runs under the writer lock).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val root = resolve(spark, path)
    val oldparts = new Path(path + ".oldparts")
    val fs = oldparts.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val orphans = parkedLeaves(fs, oldparts).collect {
      case (leaf, rel) if !fs.exists(new Path(new Path(root), rel)) => leaf
    }
    def parked(df: Option[DataFrame], leaves: Seq[Path]): DataFrame =
      leaves.map(l =>
          spark.read.option("basePath", oldparts.toString).parquet(l.toString))
        .foldLeft(df)((acc, d) => Some(acc.fold(d)(_.unionByName(d)))).get
    // A crash between [[replacePartitions]]' park rename and staging rename
    // on a table whose ONLY partition was being swapped leaves the root with
    // no data files at all (just _SUCCESS and empty partition skeletons) —
    // spark.read.parquet(root) would fail schema inference even though the
    // parked leaves hold a complete committed version. Read those alone.
    if (orphans.nonEmpty && !hasDataFiles(fs, new Path(root))) parked(None, orphans)
    else parked(Some(spark.read.parquet(root)), orphans)
  }

  /** True iff `root` contains at least one non-hidden data file anywhere
    * below it (`_SUCCESS`/`.crc` markers don't count). Short-circuits on the
    * first hit, so on a healthy table this is one or two list calls — it
    * never walks a large table.
    */
  private def hasDataFiles(fs: FileSystem, root: Path): Boolean = {
    def isData(p: Path) = !p.getName.startsWith("_") && !p.getName.startsWith(".")
    def walk(p: Path): Boolean = {
      val entries = fs.listStatus(p)
      entries.exists(e => e.isFile && isData(e.getPath)) ||
        entries.exists(e => e.isDirectory && walk(e.getPath))
    }
    fs.exists(root) && walk(root)
  }

  /** S5: idempotent first-write-wins append. Rows whose key already exists
    * in the table are silently dropped (the PG unique-index arbitration).
    * Incoming duplicates are also collapsed to one row per key — same net
    * effect as the reference's row-at-a-time conflict handling.
    *
    * `allowSchemaEvolution = true` opts into ADDITIVE schema evolution
    * (the Delta `mergeSchema` semantic): columns present on only one side
    * are added to the union schema and null-filled on the other; a common
    * column whose type differs still fails. An evolving write rewrites the
    * table through the crash-safe swap (appending wider files would hide
    * the new column from readers without mergeSchema) — the cost profile
    * of ALTER TABLE ADD COLUMN + backfill, paid only when the schema
    * actually changes. Default remains fail-fast rejection.
    */
  def insertIgnore(
      spark: SparkSession, path: String, incoming: DataFrame,
      keys: Seq[String], partitionCols: Seq[String] = Nil,
      allowSchemaEvolution: Boolean = false): Unit =
    withTableLock(spark, path) {
      heal(spark, path)
      val deduped = incoming.dropDuplicates(keys)
      if (!exists(spark, path)) {
        write(deduped, path, "overwrite", partitionCols)
      } else if (allowSchemaEvolution &&
          read(spark, path).columns.sorted.toSeq != deduped.columns.sorted.toSeq) {
        val (existingU, incomingU) = unionSchemas(read(spark, path), deduped, path)
        val fresh = incomingU.join(
          existingU.select(keys.map(col): _*), keys, "left_anti")
        replace(spark, path, existingU.unionByName(fresh), partitionCols)
      } else {
        val existing = read(spark, path)
        requireSameColumns(existing, deduped, path)
        val fresh = freshRows(spark, path, deduped, keys, partitionCols)
        // normalize to the TABLE's column order so every appended file shares
        // one field layout
        write(fresh.select(existing.columns.map(col).toIndexedSeq: _*),
          path, "append", partitionCols)
      }
    }

  /** Additive schema union for [[insertIgnore]]/[[upsert]] evolution: both
    * frames projected to existing-columns ++ incoming-only-columns, with
    * each side's missing columns null-filled at the other side's type.
    * Keys must exist on both sides; a shared column with conflicting types
    * fails (evolution never rewrites a column's type).
    */
  private def unionSchemas(
      existing: DataFrame, incoming: DataFrame, path: String): (DataFrame, DataFrame) = {
    val ex = existing.schema.map(f => f.name -> f.dataType).toMap
    val in = incoming.schema.map(f => f.name -> f.dataType).toMap
    val conflicts = ex.keySet.intersect(in.keySet).filter(c => ex(c) != in(c))
    require(conflicts.isEmpty,
      s"$path: schema evolution cannot change column types: " +
        conflicts.map(c => s"$c (${ex(c)} vs ${in(c)})").mkString(", "))
    val all = existing.columns ++ incoming.columns.filterNot(ex.contains)
    def pad(df: DataFrame, types: Map[String, org.apache.spark.sql.types.DataType]) =
      df.select(all.map(c =>
        if (types.contains(c)) col(c)
        else lit(null).cast(ex.getOrElse(c, in(c))).as(c)).toIndexedSeq: _*)
    (pad(existing, ex), pad(incoming, in))
  }

  /** Fail-fast guard against silent schema drift: a batch whose column set
    * differs from the table's would otherwise append parquet files the
    * table's readers resolve inconsistently (missing columns as nulls, new
    * columns invisible without mergeSchema). Types are checked too — a
    * same-named column of a different type would append files the reader
    * cannot reconcile with the table's footer schema.
    */
  private def requireSameColumns(
      existing: DataFrame, incoming: DataFrame, path: String): Unit = {
    def sig(df: DataFrame) =
      df.schema.map(f => s"${f.name}:${f.dataType.simpleString}").sorted
    require(sig(existing) == sig(incoming),
      s"$path: incoming schema [${sig(incoming).mkString(",")}] does not match " +
        s"table schema [${sig(existing).mkString(",")}]")
  }

  /** Incoming rows whose key is NOT yet in the table at `path`.
    *
    * When the table is partitioned, the existing side is first filtered to
    * the partition values present in the incoming batch — those values are
    * collected (an ingest batch carries O(1) distinct partition values, e.g.
    * one generation date) and pushed as literal predicates, so the scan
    * prunes to the affected partitions instead of reading every partition's
    * key columns on each ingest. Exposed (not private) so tests can assert
    * the pruning reaches the scan.
    */
  def freshRows(
      spark: SparkSession, path: String, deduped: DataFrame,
      keys: Seq[String], partitionCols: Seq[String] = Nil): DataFrame = {
    requirePartitionColsInKeys(partitionCols, keys)
    val pruned = pruneToPartitions(read(spark, path), deduped, partitionCols)
    deduped.join(pruned.select(keys.map(col): _*), keys, "left_anti")
  }

  /** Partition pruning is only a valid optimization of the key anti-join
    * when the partition value is determined by the key: a partition column
    * outside the key set would let an existing key hide in an unpruned
    * partition and be silently re-inserted, breaking first-write-wins.
    */
  private def requirePartitionColsInKeys(
      partitionCols: Seq[String], keys: Seq[String]): Unit =
    require(partitionCols.forall(keys.contains),
      s"partition columns [${partitionCols.mkString(",")}] must be a subset " +
        s"of the key columns [${keys.mkString(",")}]: a partition column " +
        "outside the keys would break keyed-write pruning")

  /** Existing rows restricted to the partition values present in the
    * incoming batch. NULL partition values are matched explicitly —
    * `isin()` never matches NULL, so a null-partition key would otherwise
    * escape the prune and be re-appended.
    */
  private def pruneToPartitions(
      existing: DataFrame, deduped: DataFrame,
      partitionCols: Seq[String]): DataFrame =
    partitionCols.foldLeft(existing) { (df, pc) =>
      val values = deduped.select(col(pc)).distinct().collect().map(_.get(0))
      val (nulls, nonNull) = values.partition(_ == null)
      val base =
        if (nonNull.isEmpty) lit(false)
        else col(pc).isin(nonNull.toIndexedSeq: _*)
      df.filter(if (nulls.nonEmpty) base || col(pc).isNull else base)
    }

  /** S6: last-write-wins upsert — matched keys take the incoming row,
    * unmatched existing rows are kept, new keys are inserted.
    *
    * PARTITION-TARGETED when `partitionCols` is set: only the partitions
    * whose values occur in the incoming batch are read, merged, and
    * rewritten — a one-date upsert against years of facts touches one
    * date's files, not the whole table ([[replacePartitions]]). Untouched
    * partitions' files are left byte-identical. Sound because
    * `partitionCols` must be a subset of `keys` (enforced): the key
    * determines the partition, so a matched key can only live in an
    * affected partition. Unpartitioned tables fall back to the full
    * crash-safe swap.
    */
  def upsert(
      spark: SparkSession, path: String, incoming: DataFrame,
      keys: Seq[String], partitionCols: Seq[String] = Nil,
      allowSchemaEvolution: Boolean = false): Unit =
    withTableLock(spark, path) {
      heal(spark, path)
      val deduped = incoming.dropDuplicates(keys)
      if (!exists(spark, path)) {
        write(deduped, path, "overwrite", partitionCols)
      } else if (allowSchemaEvolution &&
          read(spark, path).columns.sorted.toSeq != deduped.columns.sorted.toSeq) {
        // evolving upsert: full rewrite on the union schema (also for
        // partitioned tables — a partition-targeted swap would leave
        // untouched partitions' files without the new column)
        val (existingU, incomingU) = unionSchemas(read(spark, path), deduped, path)
        val kept = existingU.join(
          incomingU.select(keys.map(col): _*), keys, "left_anti")
        replace(spark, path, kept.unionByName(incomingU), partitionCols)
      } else {
        val existing = read(spark, path)
        requireSameColumns(existing, deduped, path)
        if (partitionCols.isEmpty) {
          val kept = existing.join(deduped.select(keys.map(col): _*), keys, "left_anti")
          val merged = kept.select(deduped.columns.map(col).toIndexedSeq: _*).unionByName(deduped)
          replace(spark, path, merged, partitionCols)
        } else {
          requirePartitionColsInKeys(partitionCols, keys)
          val pruned = pruneToPartitions(existing, deduped, partitionCols)
          val kept = pruned.join(deduped.select(keys.map(col): _*), keys, "left_anti")
          val merged = kept.select(deduped.columns.map(col).toIndexedSeq: _*).unionByName(deduped)
          replacePartitions(spark, path, merged, partitionCols)
        }
      }
    }

  /** S7: materialized-view refresh — full recompute, crash-safe swap. */
  def overwriteView(
      spark: SparkSession, path: String, view: DataFrame,
      partitionCols: Seq[String] = Nil): Unit =
    withTableLock(spark, path) {
      heal(spark, path)
      replace(spark, path, view, partitionCols)
    }

  /** Compacts a table's files into ~`targetBytes` outputs via the same
    * crash-safe swap as a view refresh. Incremental keyed ingest
    * ([[insertIgnore]]) appends one small file set per batch — after
    * thousands of one-date ingests the table is a small-files swamp whose
    * scan cost is dominated by per-file open/footer overhead. Compaction
    * rewrites it to size-targeted files (per partition directory when
    * `partitionCols` is set, since `partitionBy` re-splits the repartitioned
    * data on write). Content is byte-identical; only layout changes.
    */
  def compact(
      spark: SparkSession, path: String,
      partitionCols: Seq[String] = Nil,
      targetBytes: Long = 128L * 1024 * 1024,
      sortCols: Seq[String] = Nil): Unit =
    withTableLock(spark, path) {
      heal(spark, path)
      val src = new Path(resolve(spark, path))
      val fs = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val totalBytes = fs.getContentSummary(src).getLength
      val nFiles = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
      // optional clustered layout: range-partition + sort by `sortCols` so
      // parquet column min/max statistics become selective — point/range
      // predicates on the sort key then prune whole files and row groups,
      // the poor man's Z-order (exact for a single-column key, prefix-major
      // for a composite). Incremental appends don't maintain the layout;
      // re-compaction restores it — same lifecycle as OPTIMIZE ... ZORDER.
      val laid =
        if (sortCols.isEmpty) read(spark, path).repartition(nFiles)
        else read(spark, path)
          .repartitionByRange(nFiles, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      replace(spark, path, laid, partitionCols)
    }

  /** Crash-safe table swap (see the class doc's crash-safety model). The
    * old data is never deleted before the replacement is committed; readers
    * that race a crash fall back to the `.old` sibling via [[resolve]].
    */
  private def replace(
      spark: SparkSession, path: String, df: DataFrame,
      partitionCols: Seq[String]): Unit = {
    val staging = new Path(path + ".staging")
    val old = new Path(path + ".old")
    val cur = new Path(path)
    // materialize the successor BEFORE touching the current table (Spark
    // cannot overwrite an input path of the running plan anyway)
    write(df, staging.toString, "overwrite", partitionCols)
    val fs = cur.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(old, true) // leftover from an earlier crash, already superseded
    if (fs.exists(cur)) fs.rename(cur, old)
    fs.rename(staging, cur) // commit point
    fs.delete(old, true)
  }

  /** Partition-directory swap: replaces ONLY the leaf partition directories
    * present in `df`, leaving every other partition's files untouched (the
    * spec asserts byte-identity). Protocol mirrors [[replace]] at leaf
    * granularity: materialize the new partitions under `.staging`, then per
    * leaf rename current -> `.oldparts/<leaf>` and `.staging/<leaf>` ->
    * current. Displaced versions are parked OUTSIDE the table dir (a
    * `pc=v.old` sibling INSIDE it would be parsed as a partition value by
    * readers). A crash mid-sequence leaves each partition individually
    * consistent — some new, some old — and [[heal]] promotes any orphaned
    * `.oldparts` leaf whose current dir is missing; re-running the same
    * upsert then converges (it is idempotent per partition).
    */
  private def replacePartitions(
      spark: SparkSession, path: String, df: DataFrame,
      partitionCols: Seq[String]): Unit = {
    val staging = new Path(path + ".staging")
    val oldparts = new Path(path + ".oldparts")
    val cur = new Path(path)
    write(df, staging.toString, "overwrite", partitionCols)
    val fs = cur.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(oldparts, true) // leftover from an earlier crash, superseded
    for (leaf <- leafPartitionDirs(fs, staging, partitionCols.length)) {
      // listStatus returns scheme-qualified paths (file:/..., hdfs://...)
      // while `staging` may be unqualified, so a string stripPrefix can
      // silently no-op; rebuild the table-relative path from the leaf's
      // trailing name segments instead (one per partition column).
      val rel = Iterator.iterate(leaf)(_.getParent)
        .take(partitionCols.length).map(_.getName).toSeq.reverse.mkString("/")
      val dst = new Path(cur, rel)
      if (fs.exists(dst)) {
        val parked = new Path(oldparts, rel)
        fs.mkdirs(parked.getParent)
        fs.rename(dst, parked)
      } else fs.mkdirs(dst.getParent)
      fs.rename(leaf, dst) // commit point for this partition
    }
    fs.delete(oldparts, true)
    fs.delete(staging, true)
  }

  /** Directories exactly `depth` levels below `base` (the leaf partition
    * dirs of a `partitionBy(partitionCols)` layout; `_SUCCESS` etc. are
    * files and drop out of the directory filter).
    */
  private def leafPartitionDirs(
      fs: FileSystem, base: Path, depth: Int): Seq[Path] =
    if (depth == 0) Seq(base)
    else fs.listStatus(base).toSeq.filter(_.isDirectory).map(_.getPath)
      .flatMap(p => leafPartitionDirs(fs, p, depth - 1))

  /** Repairs a crashed swap BEFORE any new write: if the table dir is gone
    * but `.old` survives (a crash between [[replace]]'s two renames),
    * promote `.old` back to the table dir. Without this, an append after
    * such a crash would create a fresh table dir that SHADOWS the committed
    * data still sitting in `.old`. Must run before plans over [[read]] are
    * built, so lazy scans never point at a path the heal then moves.
    *
    * Likewise repairs a crashed PARTITION swap: any `.oldparts` leaf whose
    * current partition dir is missing (crash between [[replacePartitions]]'
    * two renames) is promoted back; leaves whose current dir exists were
    * already superseded and are discarded.
    */
  private def heal(spark: SparkSession, path: String): Unit = {
    val cur = new Path(path)
    val old = new Path(path + ".old")
    val fs = cur.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(cur) && fs.exists(old)) fs.rename(old, cur)
    val oldparts = new Path(path + ".oldparts")
    if (fs.exists(oldparts)) {
      for ((leaf, rel) <- parkedLeaves(fs, oldparts)) {
        val dst = new Path(cur, rel)
        if (!fs.exists(dst)) { fs.mkdirs(dst.getParent); fs.rename(leaf, dst) }
      }
      fs.delete(oldparts, true)
    }
  }

  /** (parked leaf dir, table-relative path) pairs under `.oldparts`: the
    * directories that directly contain files, keyed by their path below
    * `.oldparts`. The depth of the partition layout is discoverable from
    * the layout itself, so no partition-column count is needed. Empty when
    * `.oldparts` is absent — and crucially, EMPTY directories are never
    * emitted: a crash between `mkdirs(parked.getParent)` and the park
    * rename leaves a file-less skeleton, and emitting it (or the bare
    * `.oldparts` root with an empty rel) would make every read/heal throw
    * on `new Path(cur, "")` or fail parquet schema inference — bricking
    * the table until manual cleanup.
    */
  private def parkedLeaves(fs: FileSystem, oldparts: Path): Seq[(Path, String)] = {
    def walk(p: Path, rel: String): Seq[(Path, String)] = {
      val entries = fs.listStatus(p)
      val leaf =
        if (rel.nonEmpty && entries.exists(_.isFile)) Seq((p, rel)) else Nil
      leaf ++ entries.filter(_.isDirectory).toSeq.flatMap(d => walk(d.getPath,
        if (rel.isEmpty) d.getPath.getName else rel + "/" + d.getPath.getName))
    }
    if (fs.exists(oldparts)) walk(oldparts, "") else Nil
  }

  /** ANALYZE: per-column (min, max, null count, exact NDV) in long form —
    * the statistics layer that feeds file skipping, join reordering and
    * broadcast decisions (the reference delegates this to PostgreSQL's
    * analyzer; a lakehouse table must collect its own).
    *
    * Shape: ONE narrow aggregate computes every min/max/null metric
    * (min/max rendered as strings so heterogeneous columns share a
    * schema), `stack`-unpivoted to a row per column; exact NDV runs as a
    * per-column partial-distinct branch (column-pruned scan -> hash
    * distinct whose exchange carries only the DISTINCT VALUES -> count)
    * joined back at |cols| rows. Folding the NDVs into the single
    * aggregate instead plans Spark's multi-distinct Expand — the input
    * duplicated once per distinct column through one exchange — measured
    * 5.1 s vs this plan's sub-second at sf0.1. The 100 TB path swaps the
    * exact branches for `approx_count_distinct` inside the one narrow
    * aggregate (HLL, no distinct exchange at all) where estimates
    * suffice, which file-skipping stats do.
    */
  def columnStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"))
    }
    val stackArgs = cols.map(c =>
      s"'$c', `${c}__min`, `${c}__max`, `${c}__nulls`").mkString(", ")
    val plain = df.agg(aggs.head, aggs.tail: _*)
      .select(expr(
        s"stack(${cols.size}, $stackArgs) AS (column_name, min_value, max_value, n_nulls)"))
    val ndv = cols.map { c =>
        df.select(col(c)).distinct()
          .agg(count(col(c)).as("ndv"))
          .select(lit(c).as("column_name"), col("ndv"))
      }
      .reduce(_.unionByName(_))
    plain.join(ndv, Seq("column_name"))
      .select("column_name", "min_value", "max_value", "n_nulls", "ndv")
  }

  /** Per-partition file-skipping statistics: min/max/null-count of
    * `statCols` plus row count, grouped by the partition key — the
    * manifest metadata a lakehouse (Iceberg/Delta) keeps per data file,
    * here at partition granularity. A planner consults this O(#partitions)
    * table instead of opening files: a predicate whose range misses a
    * partition's [min, max] skips it entirely ([[pruneCandidates]]).
    *
    * Plan: ONE hash aggregate over the scan (partial agg collapses each
    * task to O(#partitions) rows pre-exchange); the stats table is bounded
    * by partition count, never data size. Columns stay NUMERIC (no string
    * rendering) so the table is cross-engine stable and directly usable in
    * range comparisons.
    */
  def partitionStats(df: DataFrame, partCol: String, statCols: Seq[String]): DataFrame = {
    val aggs = statCols.flatMap { c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"))
    } :+ count(lit(1)).as("n_rows")
    df.groupBy(col(partCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** File-skipping decision from a [[partitionStats]] table: the partitions
    * a range predicate `lo <= col <= hi` can possibly touch — i.e. those
    * whose [min, max] envelope intersects [lo, hi]. Runs on the O(#parts)
    * stats table, so the pruning decision itself costs nothing at scale.
    */
  def pruneCandidates(
      stats: DataFrame, partCol: String, statCol: String,
      lo: Column, hi: Column): DataFrame =
    stats.filter(col(s"max_$statCol") >= lo && col(s"min_$statCol") <= hi)
      .select(col(partCol))

  /** CDC changelog -> snapshot compaction: given an ordered change stream
    * (upserts and deletes per key), compute the current table state — the
    * MERGE-free way a lakehouse applies a Debezium/binlog feed: keep each
    * key's LATEST change (by `orderBy` desc, which must be a total order
    * per key — e.g. ts + a change sequence number), then drop keys whose
    * latest change is a delete. A delete followed by a later re-insert
    * correctly survives; an out-of-order late change correctly loses.
    *
    * Scale: ONE shuffle on the key; WindowGroupLimit keeps only each key's
    * top row per partition before the exchange at scale (rank filter
    * pushdown), so the exchange carries ~|keys| rows, not the changelog.
    */
  def cdcSnapshot(
      changelog: DataFrame, keys: Seq[String], orderBy: Seq[String],
      opCol: String = "op", deleteOp: String = "delete"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(orderBy.map(c => col(c).desc): _*)
    changelog.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opCol) =!= deleteOp)
      .drop("__rn", opCol)
  }

  /** Readable root for `path`: the table dir itself, or — if a crash landed
    * between [[replace]]'s two renames — the `.old` sibling, which holds the
    * last committed version.
    */
  private def resolve(spark: SparkSession, path: String): String =
    if (rawExists(spark, path)) path
    else if (rawExists(spark, path + ".old")) path + ".old"
    else path

  private def rawExists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def write(
      df: DataFrame, path: String, mode: String, partitionCols: Seq[String]): Unit = {
    val w = df.write.mode(mode)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
  }
}
