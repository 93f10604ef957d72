package graft

import org.apache.spark.sql.DataFrame

/** Lineage cut for iterative fixpoints (PageRank/label-prop/k-core in
  * `graphquery.Graph`, connected components in `llm.Dedup`, k-means/PQ
  * in `llm.Similarity`): every round must materialize its state, or the
  * plan grows one join+aggregate per round and the optimizer re-walks
  * the whole history each time.
  *
  * Default is `localCheckpoint` — executor-local blocks, free of a
  * distributed filesystem, exactly right on local[n] and fine on a
  * healthy cluster. Its documented gap: the blocks are NOT
  * fault-tolerant, so on a lossy 1000-executor cluster a lost executor
  * kills the job instead of recomputing (the lineage was cut). The
  * escape hatch is the session's own checkpoint dir: call
  * `spark.sparkContext.setCheckpointDir(<reliable path>)` and every
  * iterative operator here switches to RELIABLE `checkpoint()` — state
  * written to that directory, lost-executor recovery re-reads it. One
  * knob, no per-operator plumbing, and the operators stay
  * bit-identical either way (both forms materialize the same rows; the
  * sbt gate runs PageRank both ways and compares).
  *
  * Cost note for the reliable form: `Dataset.checkpoint` computes the
  * plan once more when writing the files — on a real cluster prefer a
  * fast DFS path and expect roughly 2× the per-round cost of the
  * local form. That is the standard Spark trade, not a property of
  * these operators.
  */
object Checkpoints {
  private def reliable(df: DataFrame): Boolean =
    df.sparkSession.sparkContext.getCheckpointDir.isDefined

  /** Lazy lineage cut: materialized by the first action that touches it. */
  def cut(df: DataFrame): DataFrame =
    if (reliable(df)) df.checkpoint(eager = false)
    else df.localCheckpoint(eager = false)

  /** Eager lineage cut: materialized now (fixpoint loops use this where
    * the round's aggregate must see materialized state). */
  def cutEager(df: DataFrame): DataFrame =
    if (reliable(df)) df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)

  /** Eager cut that spills instead of pinning executor memory — the
    * local form of the big-intermediate checkpoints (dedup shingle
    * tables). Reliable checkpoints are files already, so the storage
    * level only applies locally. */
  def cutEagerSpill(df: DataFrame): DataFrame =
    if (reliable(df)) df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true,
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)

  /** Postfix syntax so call sites read like the `.localCheckpoint()`
    * they replace: `df.cutLineage()` / `df.cutLineageEager()`. */
  implicit class CutOps(private val df: DataFrame) extends AnyVal {
    def cutLineage(): DataFrame = cut(df)
    def cutLineageEager(): DataFrame = cutEager(df)
    def cutLineageEagerSpill(): DataFrame = cutEagerSpill(df)
  }
}
