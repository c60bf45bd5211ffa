package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale mechanics the 100 TB deployment depends on, packaged as reusable
  * helpers and proven by plan-level assertions in ScaleSpec:
  *
  *  - salting for skewed keys (the reference's tenant/case distribution is
  *    skewed by construction — one tenant, FDM, dominates);
  *  - bucketed co-located joins (reconciliation joins the same
  *    (tenant_id, case_ref) key every night — bucketing both snapshot
  *    tables makes the join exchange-free);
  *  - dynamic partition overwrite (the watermark MERGE, S9: rewrite only
  *    the tenant partitions a sync touched, not the table).
  */
object Scale {

  /** Spread a narrow scan across the session's full parallelism — but only
    * when the input actually has fewer splits than cores. The small test
    * parquet files arrive as one partition, which would serialize every
    * downstream kernel; real multi-split input passes through untouched
    * (no forced exchange), and the target tracks the cluster size instead
    * of hardcoding local[32]'s 32.
    *
    * CONTRACT: apply this to SCAN(+project/filter) frames only. The
    * partition probe goes through `df.rdd`, which under AQE finalizes the
    * physical plan — on a frame with upstream shuffles (post-aggregate,
    * post-join) that would EXECUTE those stages once for the probe and
    * again for the real query. Scans plan without running jobs, so the
    * probe is free exactly where spreading is useful. The contract is
    * enforced mechanically, not documentarily: any shuffle-introducing
    * node in the analyzed plan is rejected before the probe runs (a plan
    * walk costs nothing next to the double-execution it prevents), and
    * ScaleSpec's listener test proves the probe schedules zero jobs on a
    * compliant frame. */
  def spread(df: DataFrame): DataFrame = {
    assertScanShaped(df)
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }

  /** Reject frames whose analyzed plan contains a node the partition
    * probe could trigger work through: shuffles (Aggregate/Join/Window/
    * Deduplicate/Repartition), range-sampled Sort, or a single-partition
    * GlobalLimit. Pure tree walk — no jobs, no execution. */
  private def assertScanShaped(df: DataFrame): Unit = {
    import org.apache.spark.sql.catalyst.plans.logical._
    df.queryExecution.analyzed.foreach {
      case p @ (_: Aggregate | _: Join | _: Window | _: Sort |
                _: Deduplicate | _: GlobalLimit | _: RepartitionOperation) =>
        throw new IllegalArgumentException(
          s"Scale.spread contract violation: scan(+project/filter) frames only, " +
            s"found ${p.nodeName}. The partition probe would execute the upstream " +
            "stage once for the probe and again for the query; repartition " +
            "explicitly instead.")
      case _ => ()
    }
  }

  /** Two-phase (salted) aggregation: count/sum per key without a single
    * hot reducer. Phase 1 aggregates (key, salt); phase 2 merges salts.
    * The salt discriminator must distribute rows of one key across salts
    * — any high-cardinality column works. */
  def saltedCounts(df: DataFrame, key: String, discriminator: String,
                   salts: Int): DataFrame =
    df.withColumn("_salt", pmod(xxhash64(col(discriminator)), lit(salts.toLong)))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as("n"))

  /** Salted join: replicate the small side across `salts` copies, salt the
    * big side by a discriminator, join on (key, salt). Row-preserving on
    * the big side; turns one hot join key into `salts` tasks. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 discriminator: String, salts: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(col(discriminator)), lit(salts.toLong)))
    val replicatedSmall = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "_salt")).drop("_salt")
  }

  /** Bucketed snapshot table write: co-locates every downstream join on
    * `key` (the nightly reconciliation re-joins the same key — bucketing
    * both sides removes the shuffle entirely). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** S9 at scale: dynamic partition overwrite — only the partitions
    * present in `delta` are replaced; untouched tenants' files stay. */
  def overwriteTouchedPartitions(delta: DataFrame, path: String,
                                 partitionCol: String = "tenant_id"): Unit =
    delta.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(path)

  /** Morton (z-order) key: interleave the low 31 bits of two non-negative
    * dimension keys so one sort clusters BOTH dimensions — parquet
    * min/max stats then prune on either column, where a linear sort
    * prunes only its leading column. 31 (not 32) bits per dimension: a
    * bit at position 31 would land on the long SIGN bit after the
    * y-shift, and signed comparison would then order all high-y points
    * before low-y ones. Dimensions wider than 31 bits must be quantized
    * first (they always are — the point of z-ordering is bucketed
    * locality, not identity). Pure Column arithmetic, codegen'd. */
  def mortonKey(x: Column, y: Column): Column =
    spreadBits(x).bitwiseOR(shiftleft(spreadBits(y), 1))

  /** Spread the low 31 bits of `v` into the even bit positions. */
  private def spreadBits(v: Column): Column = {
    var s = v.bitwiseAND(lit(0x7FFFFFFFL))
    s = s.bitwiseOR(shiftleft(s, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    s = s.bitwiseOR(shiftleft(s, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    s = s.bitwiseOR(shiftleft(s, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    s = s.bitwiseOR(shiftleft(s, 2)).bitwiseAND(lit(0x3333333333333333L))
    s.bitwiseOR(shiftleft(s, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** Z-order-clustered write: range-partition and sort on the Morton key
    * of (xCol, yCol), so every output file covers a compact region in
    * BOTH dimensions. Publishes via the same write-to-temp + checked
    * swap as [[compact]], so re-clustering a table in place (the normal
    * use) is safe. */
  def zOrderWrite(df: DataFrame, path: String,
                  xCol: String, yCol: String, targetFiles: Int): Unit =
    publishOverwrite(df.sparkSession, path) { tmpPath =>
      df.withColumn("_z", mortonKey(col(xCol), col(yCol)))
        .repartitionByRange(targetFiles, col("_z"))
        .sortWithinPartitions(col("_z"))
        .drop("_z")
        .write.mode("overwrite").parquet(tmpPath)
    }

  /** Small-files compaction: rewrite a table into ~`targetFiles` files,
    * range-clustered and sorted within each file on `sortCols`. The
    * incremental sync appends per-batch files forever (streaming.
    * IncrementalSync.syncPipeline's change log); without periodic
    * compaction a year of micro-batches is millions of tiny files and
    * scan planning dominates query time. Range partitioning (not
    * round-robin) keeps each output file a contiguous key range, so
    * parquet min/max row-group stats actually prune. */
  def compact(df: DataFrame, path: String, targetFiles: Int,
              sortCols: Seq[String]): Unit =
    publishOverwrite(df.sparkSession, path) { tmpPath =>
      df.repartitionByRange(targetFiles, sortCols.map(col): _*)
        .sortWithinPartitions(sortCols.map(col): _*)
        .write.mode("overwrite").parquet(tmpPath)
    }

  /** Write-to-temp + checked swap: `write` stages the new table beside
    * `path`, then the swap replaces the original only after the write
    * fully commits. Needed because the usual call rewrites a path in
    * place (df reads from `path`) and Spark refuses to overwrite a path
    * that is also an input. */
  private def publishOverwrite(spark: org.apache.spark.sql.SparkSession,
                               path: String)(write: String => Unit): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dest = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + "_rewrite_tmp")
    val old = new org.apache.hadoop.fs.Path(path + "_rewrite_old")
    // crash recovery: a process death between rename(dest->old) and
    // rename(tmp->dest) leaves no live table at `path` but a complete
    // copy at `_rewrite_old` — restore it before doing anything else, so
    // the swap below always starts from a live dest
    if (!fs.exists(dest) && fs.exists(old) && !fs.rename(old, dest))
      throw new java.io.IOException(
        s"rewrite: could not restore interrupted swap from $old to $dest")
    write(tmp.toString)
    if (fs.exists(old)) fs.delete(old, true)
    // FileSystem.rename reports most failures by RETURNING FALSE, not
    // throwing — every step must be checked or a failed swap would fall
    // through to the delete below and destroy the only live copy
    if (fs.exists(dest) && !fs.rename(dest, old))
      throw new java.io.IOException(s"rewrite: could not move $dest aside")
    if (!fs.rename(tmp, dest)) {
      // restore the original before failing (e.g. a concurrent writer
      // recreated dest between the two renames)
      if (fs.exists(old) && !fs.exists(dest)) fs.rename(old, dest)
      throw new java.io.IOException(s"rewrite: could not publish $tmp to $dest")
    }
    fs.delete(old, true)
    ()
  }
}
