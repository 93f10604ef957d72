package graft

import org.apache.spark.sql.functions._

import graft.llm.Classify

/** X249 — bit-quantized multinomial NB. The tiny-corpus cases are
  * hand-computed from the model definition (every band on paper), so
  * they pin the ALGEBRA; q248's DuckDB oracle pins the cross-engine
  * replay at corpus scale.
  */
class ClassifySpec extends SparkSpec {

  import spark.implicits._

  private val train = Seq(
    ("p1", "a a b", true),
    ("p2", "a c", true),
    ("n1", "b b c", false)).toDF("doc_id", "text", "pos")

  // Hand computation: c1 = {a:3, b:1, c:1}, c0 = {a:0, b:2, c:1},
  // T1 = 5, T0 = 3, V = 3, N1 = 2, N0 = 1.
  //   w_a = band(4) - band(1) = 2        w_b = band(2) - band(3) = 0
  //   w_c = band(2) - band(2) = 0
  //   perTokenBias = band(6) - band(8) = 2 - 3 = -1
  //   prior = band(2) - band(1) = 1
  test("weights, biases, and scores match the hand computation") {
    val m = Classify.nbTrain(train, "text", col("pos"))
    assert(m.perTokenBias == -1L && m.prior == 1L)
    val w = m.weights.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(w == Map("a" -> 2L, "b" -> 0L, "c" -> 0L))
    val scores = Classify.nbScore(train, "doc_id", "text", m)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // p1: 1 + 2·2 + 3·(-1) = 2;  p2: 1 + 2 + 2·(-1) = 1;
    // n1: 1 + 0 + 3·(-1) = -2.
    assert(scores == Map("p1" -> (3L, 2L), "p2" -> (2L, 1L),
      "n1" -> (3L, -2L)))
  }

  test("unseen tokens carry zero weight — serving needs no vocab closure") {
    val m = Classify.nbTrain(train, "text", col("pos"))
    val out = Classify.nbScore(
      Seq(("x1", "z z")).toDF("doc_id", "text"), "doc_id", "text", m)
      .collect().head
    // 1 + 0 + 2·(-1) = -1 → negative, from priors/normalizers alone.
    assert(out.getLong(1) == 2L && out.getLong(2) == -1L)
  }

  test("an empty class is a loud error, not a silent zero prior") {
    intercept[IllegalArgumentException] {
      Classify.nbTrain(train.filter(col("pos")), "text", col("pos"))
    }
  }

  // Scores on the training corpus: p1 → 2, p2 → 1, n1 → -2 (labels
  // T, T, F). Candidate thresholds = distinct scores, predict ⇔ > θ:
  //   θ=2:  tp=0 fp=0 fn=2 tn=1  f1 = 0
  //   θ=1:  tp=1 fp=0 fn=1 tn=1  f1 = 2e6/3 = 666666
  //   θ=-2: tp=2 fp=0 fn=0 tn=1  f1 = 1e6
  test("threshold sweep matches the hand ROC; tuneThreshold picks the " +
    "F1-max (highest θ on ties)") {
    val m = Classify.nbTrain(train, "text", col("pos"))
    val scored = Classify.nbScore(train, "doc_id", "text", m)
      .join(train.select("doc_id", "pos"), Seq("doc_id"))
    val sweep = Classify.thresholdSweep(scored, "score", col("pos"))
    val got = sweep.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))).toMap
    assert(got == Map(
      2L -> (0L, 0L, 2L, 1L, 0L),
      1L -> (1L, 0L, 1L, 1L, 666666L),
      -2L -> (2L, 0L, 0L, 1L, 1000000L)))
    assert(Classify.tuneThreshold(sweep) == -2L)
  }

  test("saveModel/loadModel: single-pointer versioned publish — a " +
    "republish swaps weights AND consts as one generation; the " +
    "just-superseded version survives one cycle for pinned readers") {
    val dir = java.nio.file.Files.createTempDirectory("nbmodel").toString
    try {
      val m1 = Classify.nbTrain(train, "text", col("pos"))
      Classify.saveModel(m1, dir)
      val l1 = Classify.loadModel(spark, dir)
      assert(l1.perTokenBias == m1.perTokenBias && l1.prior == m1.prior)
      // Pin version 1's file paths, then republish a DIFFERENT model.
      val pinnedWeights = l1.weights
      val train2 = train.union(Seq(("p3", "a a a a", true))
        .toDF("doc_id", "text", "pos"))
      val m2 = Classify.nbTrain(train2, "text", col("pos"))
      Classify.saveModel(m2, dir)
      val l2 = Classify.loadModel(spark, dir)
      assert(l2.perTokenBias == m2.perTokenBias && l2.prior == m2.prior)
      assert(l2.weights.collect().map(r =>
        r.getString(0) -> r.getLong(1)).toMap ==
        m2.weights.collect().map(r =>
          r.getString(0) -> r.getLong(1)).toMap)
      // One-version grace: the pre-republish plan still EXECUTES.
      assert(pinnedWeights.count() == 3L)
      // Third publish sweeps v1.
      Classify.saveModel(m1, dir)
      val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/v1")))
      assert(Classify.loadModel(spark, dir).prior == m1.prior)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(dir))
    }
  }

  test("loadModel heals the pointer-flip window: a reader landing " +
    "between _model_v delete and rename serves the newest complete " +
    "version instead of crashing") {
    val dir = java.nio.file.Files.createTempDirectory("nbwindow").toString
    try {
      val m1 = Classify.nbTrain(train, "text", col("pos"))
      Classify.saveModel(m1, dir)
      Classify.saveModel(m1, dir) // second publish sweeps the legacy paths
      val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      // Simulate the delete-then-rename window: pointer gone, version
      // dirs intact, no legacy layout to fall back to.
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/_model_v"), false)
      val healed = Classify.loadModel(spark, dir)
      assert(healed.perTokenBias == m1.perTokenBias &&
        healed.prior == m1.prior)
      // An INCOMPLETE newest version (crashed publish, no _SUCCESS on
      // consts) is skipped in favor of the last complete one.
      fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/v9/weights"))
      fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/v9/consts"))
      val healed2 = Classify.loadModel(spark, dir)
      assert(healed2.prior == m1.prior)
      // Empty dir with neither pointer, versions, nor legacy → loud.
      val empty = java.nio.file.Files.createTempDirectory("nbnone").toString
      intercept[IllegalArgumentException] {
        Classify.loadModel(spark, empty)
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(dir))
    }
  }

  test("loadModel falls back to the pre-versioned legacy layout") {
    val dir = java.nio.file.Files.createTempDirectory("nblegacy").toString
    try {
      val m = Classify.nbTrain(train, "text", col("pos"))
      graft.sources.ShardStore.overwriteAtomic(m.weights, s"$dir/weights")
      graft.sources.ShardStore.overwriteAtomic(
        Seq((m.perTokenBias, m.prior)).toDF("perTokenBias", "prior"),
        s"$dir/consts")
      val l = Classify.loadModel(spark, dir)
      assert(l.perTokenBias == m.perTokenBias && l.prior == m.prior)
      // A versioned publish over a legacy store: first publish keeps
      // the legacy copy (grace), the second sweeps it.
      Classify.saveModel(m, dir)
      Classify.saveModel(m, dir)
      val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/weights")))
      assert(Classify.loadModel(spark, dir).prior == m.prior)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(dir))
    }
  }

  // thresholdSweep accepts arbitrary scored input (nbTrain guards its
  // OWN flow, not this one): a zero-positive corpus hits 2tp+fp+fn=0
  // at the strictest threshold — f1_ppm must be 0 there, not NULL
  // (tuneThreshold orders by it).
  test("zero-positive corpus: f1_ppm is 0 everywhere, never NULL, and " +
    "tuneThreshold still picks deterministically") {
    val scored = Seq(("a", 5L, false), ("b", 3L, false), ("c", 3L, false))
      .toDF("doc_id", "score", "pos")
    val sweep = Classify.thresholdSweep(scored, "score", col("pos"))
    val rows = sweep.collect()
    assert(rows.forall(!_.isNullAt(5)), "f1_ppm must never be NULL")
    assert(rows.forall(_.getLong(5) == 0L))
    // Ties on f1=0 break to the highest threshold (strictest filter).
    assert(Classify.tuneThreshold(sweep) == 5L)
  }
}
