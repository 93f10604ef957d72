package graft.graphquery

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The WRITE-HEAVY SPARQL UPDATE path — the delta-staged layout the
  * administrative path ([[Sparql.update]]) prices itself against.
  *
  * [[Sparql.update]] rewrites the whole store per operation (atomic
  * swap, complete copy on disk at every instant) — right for codelist
  * patches and takedowns, wrong for a store taking updates all day: at
  * 100 TB a one-statement patch must not cost a 100 TB rewrite. This
  * store makes every UPDATE statement cost O(statement), not O(store):
  *
  * {{{
  *   dir/base/               quad parquet (may be absent = empty)
  *   dir/delta/delta_id=N/   one dir per committed STATEMENT:
  *                           quad cols + op (1 = add, 0 = tombstone)
  * }}}
  *
  * Commit protocol: a statement's (adds, tombstones) write to
  * `dir/delta/_tmp_N` (a `_`-prefixed dir — invisible to Spark's
  * partition discovery), then a single atomic rename to `delta_id=N`
  * publishes it. A crash leaves only an invisible `_tmp_*` orphan,
  * swept by the next writer; a reader never sees a partial delta.
  *
  * Serve-time fold ([[serve]]): presence of a quad = its LAST op is an
  * add, or it is in the base and untouched. One hash aggregate over
  * the deltas keyed by the full quad (`max(struct(delta_id, op))` —
  * within one statement add outranks tombstone, which is exactly the
  * §3.1.3 delete-before-insert survival rule) + one anti-join against
  * the base. Serve cost grows with the DELTA pile, which is what
  * [[compact]] bounds: fold deltas ≤ horizon into the base through the
  * [[graft.sources.ShardStore.overwriteAtomic]] swap, then drop them —
  * idempotent under a crash at any point (re-applying folded deltas to
  * the already-folded base is a fixpoint: the anti-join removes the
  * touched rows the adds put back).
  *
  * Same single-writer contract as every overwriteAtomic-maintained
  * index here; concurrent serves are safe at every instant.
  * DELETE WHERE / modify / CLEAR / ADD/COPY/MOVE compile their
  * solutions against the CURRENT folded view, so tombstones are exact
  * quads — the fold never re-runs a pattern.
  */
object DeltaStore {

  import Sparql.{QuadCols, UpdateOp, InsertData, DeleteData, DeleteWhere,
    Modify, Load, Clear, Create, GraphXfer, OneGraph, DefaultGraph,
    AllNamed, AllGraphs}

  private def fsOf(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def emptyQuads(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      Sparql.quadSchema)

  private def baseDf(spark: SparkSession, dir: String): DataFrame =
    if (graft.sources.ShardStore.existsRecovered(spark, s"$dir/base"))
      spark.read.parquet(s"$dir/base").select(QuadCols.map(col): _*)
    else emptyQuads(spark)

  /** Committed delta ids, ascending (dir listing — `_tmp_*` orphans
    * and anything else non-matching are ignored). */
  private def deltaIds(spark: SparkSession, dir: String): Seq[Long] = {
    val fs = fsOf(spark, dir)
    val root = new Path(s"$dir/delta")
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("delta_id=") =>
        n.stripPrefix("delta_id=").toLong }
      .sorted
  }

  private def deltaDf(spark: SparkSession, dir: String,
                      upTo: Option[Long]): Option[DataFrame] = {
    val ids = deltaIds(spark, dir)
    val live = upTo.map(h => ids.filter(_ <= h)).getOrElse(ids)
    if (live.isEmpty) None
    // Read the delta dirs explicitly (basePath recovers delta_id as a
    // column) so a compact's horizon is exact even if new deltas land
    // between the listing and the read.
    else Some(spark.read.option("basePath", s"$dir/delta")
      .parquet(live.map(i => s"$dir/delta/delta_id=$i"): _*))
  }

  /** The folded view: base minus touched quads, plus quads whose LAST
    * op is an add. `upTo` bounds the deltas folded (compaction's
    * horizon); None folds everything committed. */
  private def folded(spark: SparkSession, dir: String,
                     upTo: Option[Long] = None): DataFrame =
    deltaDf(spark, dir, upTo) match {
      case None => baseDf(spark, dir)
      case Some(d) =>
        val last = d.groupBy(QuadCols.map(col): _*)
          .agg(max(struct(col("delta_id"), col("op"))).as("_m"))
        val base = baseDf(spark, dir)
        Sparql.antiQuads(base, last.select(QuadCols.map(col): _*))
          .unionByName(last.filter(col("_m.op") === 1)
            .select(QuadCols.map(col): _*))
    }

  /** Current store contents (the read surface — feed it to
    * [[Sparql.selectDataset]] / [[Sparql.constructDataset]] etc.). */
  def serve(spark: SparkSession, dir: String): DataFrame =
    folded(spark, dir)

  /** Apply a SPARQL UPDATE script; each `;`-separated statement
    * commits as ONE delta dir (O(statement) written, never a store
    * rewrite). Same grammar, validation, sequencing, and SILENT
    * semantics as [[Sparql.update]]. */
  def update(spark: SparkSession, dir: String, text: String): Unit = {
    val ops = Sparql.parseUpdate(text)
    // Same all-or-nothing static validation as the administrative path.
    ops.foreach {
      case InsertData(q) => Sparql.groundRows(q)
      case DeleteData(q) => Sparql.groundRows(q)
      case DeleteWhere(p) => Sparql.quadTemplate(p)
      case Modify(del, ins, where, _, _, _) =>
        require(del.nonEmpty || ins.nonEmpty,
          "modify needs a DELETE or INSERT template")
        require(where.nonEmpty, "modify needs a non-empty WHERE")
        if (del.nonEmpty) Sparql.quadTemplate(del)
        if (ins.nonEmpty) Sparql.quadTemplate(ins)
      case _: Load | _: Clear | _: Create | _: GraphXfer => ()
    }
    val lock = Sparql.storeLocks.computeIfAbsent(
      new Path(dir).toString,
      _ => new java.util.concurrent.locks.ReentrantLock)
    lock.lock()
    try {
      val fs = fsOf(spark, dir)
      val root = new Path(s"$dir/delta")
      fs.mkdirs(root)
      // Sweep crashed writers' invisible staging dirs.
      fs.listStatus(root).foreach { st =>
        if (st.getPath.getName.startsWith("_tmp_")) fs.delete(st.getPath, true)
      }
      ops.foreach { op =>
        val silent = op match {
          case Load(_, _, s) => s
          case Clear(_, s, _) => s
          case Create(_, s) => s
          case GraphXfer(_, _, _, s) => s
          case _ => false
        }
        try commitOne(spark, dir, op)
        catch { case _: Exception if silent => () }
      }
    } finally lock.unlock()
  }

  /** One statement → one (adds, tombstones) delta dir. The current
    * folded view compiles the statement's patterns, so each statement
    * sees its predecessors' effects exactly like the administrative
    * path. */
  private def commitOne(spark: SparkSession, dir: String,
                        op: UpdateOp): Unit = {
    val cur = folded(spark, dir)
    val none = emptyQuads(spark)
    val (adds, dels): (DataFrame, DataFrame) = op match {
      case InsertData(q) => (Sparql.groundQuads(spark, q), none)
      case DeleteData(q) => (none, Sparql.groundQuads(spark, q))
      case DeleteWhere(p) => (none, Sparql.deleteWhereQuads(cur, p))
      case Modify(del, ins, where, u, un, wg) =>
        // Both templates instantiate from the SAME pre-update
        // solutions; within one delta the fold ranks add over
        // tombstone — the delete-before-insert survival rule.
        (if (ins.isEmpty) none
         else Sparql.instantiateQuads(cur, where, ins, u, un, wg),
         if (del.isEmpty) none
         else Sparql.instantiateQuads(cur, where, del, u, un, wg))
      case Load(doc, into, _) =>
        (Sparql.loadQuads(spark, doc, into), none)
      case Clear(target, silent, drop) =>
        val doomed = target match {
          case OneGraph(i) =>
            if (!silent)
              require(!cur.filter(col("g") <=> lit(i)).isEmpty,
                s"${if (drop) "DROP" else "CLEAR"} GRAPH: no graph <$i> in store")
            cur.filter(col("g") <=> lit(i))
          case DefaultGraph => cur.filter(col("g").isNull)
          case AllNamed => cur.filter(col("g").isNotNull)
          case AllGraphs => cur
        }
        (none, doomed)
      case Create(g, silent) =>
        if (!silent)
          require(cur.filter(col("g") <=> lit(g)).isEmpty,
            s"CREATE GRAPH: graph <$g> already exists")
        return // nothing to commit
      case GraphXfer(kind, src, dst, silent) =>
        if (src == dst) return
        def inSide(r: Option[String]) =
          r.map(i => col("g") <=> lit(i)).getOrElse(col("g").isNull)
        val srcRows = cur.filter(inSide(src))
        if (src.isDefined && srcRows.isEmpty) {
          if (silent) return
          else sys.error(s"$kind: no graph <${src.get}> in store")
        }
        val relabeled = srcRows.withColumn("g",
          dst.map(i => lit(i).cast("string"))
            .getOrElse(lit(null).cast("string")))
          .select(QuadCols.map(col): _*)
        kind match {
          case "ADD" => (relabeled, none)
          case "COPY" => (relabeled, cur.filter(inSide(dst)))
          case "MOVE" =>
            (relabeled, cur.filter(inSide(dst) || inSide(src)))
          case other => sys.error(s"unknown transfer $other")
        }
    }
    val fs = fsOf(spark, dir)
    val id = deltaIds(spark, dir).lastOption.getOrElse(-1L) + 1
    val tmp = new Path(s"$dir/delta/_tmp_$id")
    val fin = new Path(s"$dir/delta/delta_id=$id")
    val rows = adds.select(QuadCols.map(col): _*).withColumn("op", lit(1))
      .unionByName(dels.select(QuadCols.map(col): _*)
        .withColumn("op", lit(0)))
    rows.write.mode("overwrite").parquet(tmp.toString)
    require(fs.rename(tmp, fin), s"delta publish rename failed: $fin")
  }

  /** Fold all committed deltas into the base and drop them. Crash-safe
    * at every point: the base swap is [[graft.sources.ShardStore
    * .overwriteAtomic]]; a crash between the swap and the delta
    * deletes re-applies the folded deltas on the next serve — a no-op
    * by construction (their adds are already in the base, their
    * tombstones already absent). Deltas landing AFTER the horizon
    * listing are untouched. No-op when no deltas exist. */
  def compact(spark: SparkSession, dir: String,
              partitionBy: Seq[String] = Nil): Unit = {
    val lock = Sparql.storeLocks.computeIfAbsent(
      new Path(dir).toString,
      _ => new java.util.concurrent.locks.ReentrantLock)
    lock.lock()
    try {
      val ids = deltaIds(spark, dir)
      if (ids.isEmpty) return
      val horizon = ids.last
      graft.sources.ShardStore.overwriteAtomic(
        folded(spark, dir, Some(horizon)), s"$dir/base", partitionBy)
      val fs = fsOf(spark, dir)
      ids.filter(_ <= horizon).foreach { i =>
        fs.delete(new Path(s"$dir/delta/delta_id=$i"), true)
      }
    } finally lock.unlock()
  }
}
