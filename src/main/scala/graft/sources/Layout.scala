package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Size-targeted file compaction — the last mile of the table-layout
  * story next to the z-order keys (q159/q163) and the bucketed
  * dedup/IVF/PQ indexes: a 100 TB table is only as scannable as its
  * files. Tiny-file spray (per-trigger streaming output, over-parallel
  * writers) multiplies scan tasks and NameNode/listing load; monster
  * files serialize task scheduling and retries. `writeCompacted` lands a
  * DataFrame as files of approximately `targetMB` each.
  *
  * Spark-first shape: ONE exchange sized from the data, then a straight
  * parquet write. With `sortCols` the exchange is a range partition on
  * those columns followed by an in-partition sort — combined with a
  * z-order key ([[graft.functions.NativeExpressions]] zorder16) this is
  * the OPTIMIZE/ZORDER layout: each output file owns a disjoint key
  * range, so a min/max-pruned scan of a key region touches only its
  * files. Without `sortCols` it is a round-robin rebalance (pure size
  * normalization). Either way the file count is `ceil(bytes /
  * targetMB)` — never a per-row or driver-side operation, and the
  * exchange is the only cost at any scale.
  *
  * Sizing input: exact on-disk bytes when the plan is file-backed
  * (`df.inputFiles`, summed through the Hadoop FS — correct for the
  * compact-a-landed-table case this exists for). A derived plan with no
  * scan behind it falls back to Catalyst's uncompressed size estimate
  * scaled by a conservative 3× parquet factor; a heavily FILTERED scan
  * overestimates (the estimate is the source's size) — pass `bytesHint`
  * with better knowledge in both cases.
  */
object Layout {

  /** Sum of the on-disk bytes behind a file-backed plan, if any. */
  def inputBytes(df: DataFrame): Option[Long] = {
    val files = df.inputFiles
    if (files.isEmpty) None
    else {
      val conf = df.sparkSession.sessionState.newHadoopConf()
      Some(files.iterator.map { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        p.getFileSystem(conf).getFileStatus(p).getLen
      }.sum)
    }
  }

  /** Write `df` to `dir` as ~`targetMB`-sized parquet files; returns the
    * planned file count. `sortCols` range-partitions + sorts (z-order
    * layout); empty means round-robin rebalance. See object doc for the
    * byte-estimate contract.
    */
  def writeCompacted(df: DataFrame, dir: String, targetMB: Int,
                     sortCols: Seq[String] = Nil,
                     bytesHint: Option[Long] = None,
                     maxFiles: Int = 1 << 20): Int = {
    require(targetMB > 0, s"targetMB must be positive, got $targetMB")
    val targetBytes = targetMB.toLong << 20
    val bytes: Long = bytesHint
      .orElse(inputBytes(df))
      .getOrElse {
        val est = df.queryExecution.optimizedPlan.stats.sizeInBytes / 3
        if (est.isValidLong) est.toLong else Long.MaxValue
      }
    val n = math.max(1L, math.min(maxFiles.toLong,
      (bytes + targetBytes - 1) / targetBytes)).toInt
    val shaped =
      if (sortCols.nonEmpty)
        df.repartitionByRange(n, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else df.repartition(n)
    shaped.write.mode("overwrite").parquet(dir)
    n
  }
}
