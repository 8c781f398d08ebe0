package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Batch output layout for training-data pipelines: hive-partitioned
  * parquet with controlled file counts and within-file ordering.
  *
  * Why each knob exists at 100 TB:
  *   - `repartition(partition cols + file salt)` aligns shuffle output with
  *     the directory layout. Without it every task holds a writer per
  *     partition value it happens to see — the classic small-files
  *     explosion (tasks x partition-values files). With it, each output
  *     file is produced by exactly one task.
  *   - the salt (`pmod(xxhash64(key), filesPerPartition)`) splits hot
  *     partition values across `filesPerPartition` tasks, so one giant
  *     partition (the skewed-language problem) doesn't serialize into a
  *     single writer. Deterministic: re-running the job re-creates the
  *     same file assignment (task retries stay consistent, unlike a
  *     round-robin or random salt).
  *   - `sortWithinPartitions` clusters rows inside each file so parquet
  *     row-group min/max stats actually prune on the sort key downstream
  *     (scan skips whole row groups on e.g. `doc_id BETWEEN ...`).
  *   - `maxRecordsPerFile` caps any single file regardless of skew, so a
  *     misestimated salt can't produce a multi-GB file that some later
  *     reader has to split poorly.
  *
  * The sibling read path is plain `spark.read.parquet(path)`: Spark
  * discovers the hive layout and prunes partition directories on
  * `partition-col = ...` filters (asserted in SinksSpec).
  */
object Sinks {

  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      sortCols: Seq[String],
      filesPerPartition: Int = 1,
      maxRecordsPerFile: Long = 1L << 20
  ): Unit = {
    require(partitionCols.nonEmpty, "need at least one partition column")
    require(filesPerPartition >= 1, "filesPerPartition must be >= 1")
    val saltSource = (if (sortCols.nonEmpty) sortCols else df.columns.toSeq).map(col)
    val salted = df.withColumn("_file", pmod(xxhash64(saltSource: _*), lit(filesPerPartition)))
    salted
      .repartition((partitionCols :+ "_file").map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .drop("_file")
      .write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Compact a fragmented parquet directory into ~`targetFileBytes` files.
    *
    * Streaming micro-batch sinks and over-parallel writers leave thousands
    * of small files; at 100 TB that murders scan planning (one listing +
    * footer read per file) and wastes row-group compression. Sizing uses
    * the actual on-disk bytes of the source files (not a row-count guess),
    * and the rewrite goes through `repartition(n)` — a round-robin
    * shuffle that local-sorts for retry determinism, unlike `coalesce`,
    * which would also cap the read parallelism of the compaction job
    * itself. Returns the output file count.
    */
  def compact(
      spark: org.apache.spark.sql.SparkSession,
      inPath: String,
      outPath: String,
      targetFileBytes: Long = 128L << 20,
      sortCols: Seq[String] = Nil
  ): Int = {
    val df = spark.read.parquet(inPath)
    // Hadoop FS, not java.nio: the input may live on any cluster filesystem
    val hp = new org.apache.hadoop.fs.Path(inPath)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(hp).getLength
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val repart = df.repartition(nFiles)
    val laidOut = if (sortCols.nonEmpty) repart.sortWithinPartitions(sortCols.map(col): _*) else repart
    laidOut.write.mode(SaveMode.Overwrite).parquet(outPath)
    spark.read.parquet(outPath).inputFiles.length
  }
}
