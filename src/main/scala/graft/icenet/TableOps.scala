package graft.icenet

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(resolve(spark, path))

  /** S5: idempotent first-write-wins append. Rows whose key already exists
    * in the table are silently dropped (the PG unique-index arbitration).
    * Incoming duplicates are also collapsed to one row per key — same net
    * effect as the reference's row-at-a-time conflict handling.
    */
  def insertIgnore(
      spark: SparkSession, path: String, incoming: DataFrame,
      keys: Seq[String], partitionCols: Seq[String] = Nil): Unit = {
    heal(spark, path)
    val deduped = incoming.dropDuplicates(keys)
    if (!exists(spark, path)) {
      write(deduped, path, "overwrite", partitionCols)
    } else {
      val existingCols = read(spark, path).columns
      requireSameColumns(existingCols, deduped.columns, path)
      val fresh = freshRows(spark, path, deduped, keys, partitionCols)
      // normalize to the TABLE's column order so every appended file shares
      // one field layout
      write(fresh.select(existingCols.map(col).toIndexedSeq: _*),
        path, "append", partitionCols)
    }
  }

  /** Fail-fast guard against silent schema drift: a batch whose column set
    * differs from the table's would otherwise append parquet files the
    * table's readers resolve inconsistently (missing columns as nulls, new
    * columns invisible without mergeSchema).
    */
  private def requireSameColumns(
      existing: Seq[String], incoming: Seq[String], path: String): Unit =
    require(existing.sorted == incoming.sorted,
      s"$path: incoming columns [${incoming.sorted.mkString(",")}] do not match " +
        s"table columns [${existing.sorted.mkString(",")}]")

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
    val existing = read(spark, path)
    val pruned = partitionCols.foldLeft(existing) { (df, pc) =>
      val values = deduped.select(col(pc)).distinct().collect().map(_.get(0))
      df.filter(col(pc).isin(values.toIndexedSeq: _*))
    }
    deduped.join(pruned.select(keys.map(col): _*), keys, "left_anti")
  }

  /** S6: last-write-wins upsert — matched keys take the incoming row,
    * unmatched existing rows are kept, new keys are inserted.
    */
  def upsert(
      spark: SparkSession, path: String, incoming: DataFrame,
      keys: Seq[String], partitionCols: Seq[String] = Nil): Unit = {
    heal(spark, path)
    val deduped = incoming.dropDuplicates(keys)
    if (!exists(spark, path)) {
      write(deduped, path, "overwrite", partitionCols)
    } else {
      val existing = read(spark, path)
      requireSameColumns(existing.columns, deduped.columns, path)
      val kept = existing.join(deduped.select(keys.map(col): _*), keys, "left_anti")
      val merged = kept.select(deduped.columns.map(col): _*).unionByName(deduped)
      replace(spark, path, merged, partitionCols)
    }
  }

  /** S7: materialized-view refresh — full recompute, crash-safe swap. */
  def overwriteView(
      spark: SparkSession, path: String, view: DataFrame,
      partitionCols: Seq[String] = Nil): Unit = {
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
      targetBytes: Long = 128L * 1024 * 1024): Unit = {
    heal(spark, path)
    val src = new Path(resolve(spark, path))
    val fs = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(src).getLength
    val nFiles = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    replace(spark, path, read(spark, path).repartition(nFiles), partitionCols)
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

  /** Repairs a crashed swap BEFORE any new write: if the table dir is gone
    * but `.old` survives (a crash between [[replace]]'s two renames),
    * promote `.old` back to the table dir. Without this, an append after
    * such a crash would create a fresh table dir that SHADOWS the committed
    * data still sitting in `.old`. Must run before plans over [[read]] are
    * built, so lazy scans never point at a path the heal then moves.
    */
  private def heal(spark: SparkSession, path: String): Unit = {
    val cur = new Path(path)
    val old = new Path(path + ".old")
    val fs = cur.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(cur) && fs.exists(old)) fs.rename(old, cur)
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
