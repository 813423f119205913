package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared plumbing for the persisted-table streaming MVs
  * (TermStatsStream, EventStream): existence-checked state reads and the
  * pinned dynamic-overwrite writer for self-read-merge-overwrite updates.
  */
private[streaming] object StateTables {

  /** Read a state table that may not exist yet (first micro-batch).
    *
    * Distinguishes path-missing from read FAILURE: only a missing path
    * returns None; a corrupt footer or transient FS error propagates, so
    * the batch fails loudly instead of treating live state as empty — a
    * silent empty read would make the min/sum merge overwrite touched
    * partitions with batch-local values, permanently corrupting the MV
    * (round-7 advice). foreachBatch replays the failed batch on restart.
    */
  def readIfExists(spark: SparkSession, path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None else Some(spark.read.parquet(path))
  }

  /** The self-read-merge-overwrite write: the frame being written READS
    * the live table at `path` and overwrites the same path. That is safe
    * only under DYNAMIC partition overwrite, which stages output files
    * and swaps just the touched partitions at commit time — after the
    * merge job's read of the old files has completed; STATIC overwrite
    * would truncate the table (including partitions the merge never read)
    * before writing. The mode is pinned HERE, per-write — per-write
    * options take precedence over `spark.sql.sources.partitionOverwriteMode`,
    * so no session conf can flip these writes to static. Every state-table
    * partition overwrite must go through this helper.
    */
  def selfMergeOverwrite(df: DataFrame, partitionCols: Seq[String],
      path: String): Unit =
    df.write
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .parquet(path)
}
