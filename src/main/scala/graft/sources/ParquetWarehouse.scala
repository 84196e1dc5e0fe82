package graft.sources

import org.apache.spark.sql.{AnalysisException, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Parquet-backed warehouse primitives.
  *
  *   - `upsert` (S8): the reference's `INSERT OR REPLACE` batch upsert
  *     (src/etl/load.py:126-143) generalized to parquet: last-wins merge
  *     of updates over the existing table by key. For incremental runs
  *     at scale this is the read-union-dedup-rewrite strategy (a table
  *     format with MERGE would replace the rewrite, not the semantics).
  *   - `writeDatePartitioned` (§7.3): hive-style date partitioning so
  *     date-bounded scans (the v1 lookback window, the reporting HAVING)
  *     prune partitions instead of reading the full table.
  */
object ParquetWarehouse {

  /** Heal the artifacts of an upsert interrupted mid-swap, BEFORE the
    * table is read. The swap is rename(dest → .__old); rename(tmp → dest);
    * delete .__old — a crash between the two renames leaves dest MISSING
    * with the full history sitting in `.__old`. Without this step the next
    * upsert's readIfExists would return None and silently rebuild the
    * table from the updates batch alone, then line-of-course delete the
    * `.__old` backup — destroying the "both copies on disk, recoverable"
    * contract. Recovery is: restore `.__old` → dest when dest is gone
    * (auto-heal, the backup IS the committed table), and remove stale
    * `.__tmp-*` staging dirs from writes that died before their swap
    * (their content was never committed — a fresh merge supersedes it).
    * A `.__old` alongside a LIVE dest is the harmless leftover of a crash
    * after the second rename; the swap itself clears it, as before. */
  private def recoverInterruptedSwap(
      fs: org.apache.hadoop.fs.FileSystem, path: String): Unit = {
    val dest = new org.apache.hadoop.fs.Path(path)
    val old = new org.apache.hadoop.fs.Path(path + ".__old")
    if (!fs.exists(dest) && fs.exists(old))
      require(fs.rename(old, dest),
        s"found interrupted upsert at $path (table missing, backup present) " +
          "but could not restore the .__old backup — manual repair required")
    val glob = new org.apache.hadoop.fs.Path(path + ".__tmp-*")
    val stale = try fs.globStatus(glob) catch { case _: java.io.IOException => null }
    if (stale != null) stale.foreach(s => fs.delete(s.getPath, true))
  }

  private def readIfExists(spark: SparkSession, path: String): Option[DataFrame] =
    try Some(spark.read.parquet(path))
    catch {
      // ONLY a missing path means "no table yet". An existing-but-
      // unreadable table (a failed write's empty dir, missing footers)
      // raises a DIFFERENT AnalysisException — swallowing it would send
      // upsert down the create branch, silently rebuilding the table
      // from the updates batch alone and discarding all history
      case e: AnalysisException if e.getCondition == "PATH_NOT_FOUND" => None
    }

  /** Deterministic last-wins dedup by `keys`. Precedence: the `__src`
    * column when present (updates=1 beat existing=0), then — for
    * duplicate keys WITHIN one batch — the xxhash64 of the value columns.
    * The hash makes the survivor a pure function of row CONTENT, so it is
    * stable across partitionings and shuffle orders (`row_number` ordered
    * by `__src` alone left intra-batch ties partition-order-dependent).
    * Byte-identical duplicates still tie, which is harmless: either
    * survivor is the same row. (Distinct contents colliding on the 64-bit
    * hash would also tie — at 2⁻⁶⁴ per pair that is accepted, not
    * defended against.) MAP-typed columns enter the hash through a
    * CANONICAL form: Spark's hash expressions reject MapType because map
    * element order is undefined, but `array_sort(map_entries(m))` — the
    * entry list in key order (keys are unique, so the order is total) —
    * is hashable and equal iff the maps are equal. Rows differing only in
    * a map column therefore pick a content-deterministic survivor too
    * (spec-pinned across partitionings). Only a map whose value type is
    * itself unhashable after canonicalization (e.g. a map nested inside a
    * map) stays excluded. */
  private def lastWins(df: DataFrame, keys: Seq[String]): DataFrame = {
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
      case _ => true
    }
    val tiebreakCols = df.schema.fields
      .filterNot(f => keys.contains(f.name) || f.name == "__src")
      .flatMap { f =>
        f.dataType match {
          case m: org.apache.spark.sql.types.MapType
              if hashable(m.keyType) && hashable(m.valueType) =>
            Some(array_sort(map_entries(col(f.name))))
          case dt if hashable(dt) => Some(col(f.name))
          case _ => None
        }
      }
    // an all-key (or all-unhashable) table has nothing to break ties on
    val tiebreak =
      if (tiebreakCols.isEmpty) lit(0L) else xxhash64(tiebreakCols.toSeq: _*)
    val ordering =
      (if (df.columns.contains("__src")) Seq(col("__src").desc) else Nil) :+
        tiebreak.desc
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__src", "__rn")
  }

  /** Last-wins upsert by `keys`: rows in `updates` replace same-key rows
    * in the table at `path`; other rows are preserved. Duplicate keys
    * within `updates` itself resolve deterministically (content-hash
    * tiebreak — see [[lastWins]]), so the surviving row does not depend
    * on partitioning — including rows that differ ONLY in a MAP column,
    * which hash through their canonical sorted-entry form (see
    * [[lastWins]]; spec-pinned in ParquetWarehouseSpec
    * "map-only difference"). Note the CREATE branch
    * (no existing table) also applies last-wins: an initial batch with
    * duplicate keys lands deduplicated, NOT verbatim — upsert is a merge
    * everywhere, never an append.
    *
    * `evolveSchema = true` is the incremental-pipeline schema-evolution
    * mode: a run that ADDS a column (or a table that has columns a
    * re-run no longer produces) merges by name with the missing side
    * null-filled — the same additive evolution a MERGE-capable table
    * format performs. The default stays strict: silent schema drift in
    * a warehouse table is usually a bug, so mismatches throw. */
  def upsert(
      updates: DataFrame,
      path: String,
      keys: Seq[String],
      evolveSchema: Boolean = false): Unit = {
    // evolution may null-fill VALUE columns, never keys: a missing key
    // column would null-group every update row and the last-wins window
    // would silently collapse them to one surviving row
    require(keys.forall(updates.columns.contains),
      s"updates must carry every merge key; missing: " +
        keys.filterNot(updates.columns.contains).mkString(", "))
    val spark = updates.sparkSession
    val destPath = new org.apache.hadoop.fs.Path(path)
    val fs = destPath.getFileSystem(spark.sessionState.newHadoopConf())
    // heal any interrupted prior swap FIRST, so the read below sees the
    // restored history instead of a missing table (see the helper's doc)
    recoverInterruptedSwap(fs, path)
    val merged = readIfExists(spark, path) match {
      case None => lastWins(updates, keys)
      case Some(existing) =>
        // the guard is symmetric: an EXISTING table missing a key column
        // would have that key null-filled by the evolving union, and the
        // last-wins window would then collapse all history rows into one
        // survivor per null-key group — same failure mode, other side
        require(keys.forall(existing.columns.contains),
          s"existing table at $path is missing merge key(s): " +
            keys.filterNot(existing.columns.contains).mkString(", "))
        lastWins(
          existing.withColumn("__src", lit(0))
            .unionByName(updates.withColumn("__src", lit(1)),
              allowMissingColumns = evolveSchema),
          keys)
    }
    // write-then-swap, never overwrite-in-place: the old table stays
    // intact on disk until the replacement is FULLY committed, so a
    // failed write (or a lost executor mid-job) cannot destroy history.
    // This also removes the localCheckpoint the in-place overwrite
    // needed — checkpoint blocks are not fault-tolerant, so that pattern
    // had an unrecoverable window (blocks lost after the source files
    // were already deleted). The residual window is two cheap renames; a
    // crash between them leaves the committed table in `.__old`, which
    // the NEXT upsert auto-restores (recoverInterruptedSwap) before
    // reading. In-process failures are handled here: a throw anywhere in
    // write-or-swap restores a staged-aside dest and removes the orphan
    // tmp dir, so the table is live again when the exception surfaces.
    val tmp = new org.apache.hadoop.fs.Path(
      path + ".__tmp-" + java.util.UUID.randomUUID().toString.take(8))
    val old = new org.apache.hadoop.fs.Path(path + ".__old")
    try {
      merged.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      if (fs.exists(old)) fs.delete(old, true)
      val existed = fs.exists(destPath)
      if (existed)
        require(fs.rename(destPath, old), s"could not stage $path aside for swap")
      require(fs.rename(tmp, destPath),
        s"could not move committed upsert into place at $path")
      if (existed) fs.delete(old, true)
    } catch {
      case t: Throwable =>
        try {
          if (!fs.exists(destPath) && fs.exists(old)) fs.rename(old, destPath)
          if (fs.exists(tmp)) fs.delete(tmp, true)
        } catch { case cleanup: Throwable => t.addSuppressed(cleanup) }
        throw t
    }
  }

  def writeDatePartitioned(df: DataFrame, path: String, dateCol: String): Unit =
    df.write.partitionBy(dateCol).mode(SaveMode.Overwrite).parquet(path)

  /** Bucketed catalog table: rows are hash-distributed into `buckets`
    * files by `keys` at write time, so equi joins and aggregations on the
    * same keys across tables bucketed alike are CO-LOCATED — Catalyst
    * plans them with zero Exchange. This is the §7.3 pre-partitioning
    * strategy for the 100 TB journey join: bucket conversions and sessions
    * by user_id once, join shuffle-free forever after.
    *
    * The pre-write `repartition(buckets, keys)` uses the SAME murmur3 hash
    * modulus as the bucketing spec, so each task owns exactly one bucket →
    * ONE file per bucket. That matters twice over: (a) without it an
    * N-partition frame writes N×buckets small files; (b) Spark only trusts
    * the `sortBy` metadata (and can skip the SMJ sort) when a bucket is a
    * single file. `location` makes the table EXTERNAL at that path —
    * callers that run outside a configured warehouse (Verify/Bench/
    * PlanAudit sessions) pass a scratch dir instead of polluting
    * `$PWD/spark-warehouse`. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      keys: Seq[String],
      buckets: Int,
      location: Option[String] = None): Unit = {
    val w = df
      .repartition(buckets, keys.map(col): _*)
      .write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
    location.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }
}
