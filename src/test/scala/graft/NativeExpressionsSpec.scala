package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.functions.{NativeExpressions, Scalars}

class NativeExpressionsSpec extends SparkSpec {

  test("native nfd_slug agrees with the UDF on generated inputs") {
    NativeExpressions.register(spark)
    import spark.implicits._
    val gen = Gen.listOfN(30, Gen.frequency(
      5 -> Gen.alphaNumChar, 2 -> Gen.oneOf(' ', '.', '-'),
      3 -> Gen.oneOf('á', 'č', 'ř', 'Ú', 'Ž', '§', '€', '北')))
      .map(_.mkString)
    val inputs = Gen.listOfN(200, gen)
      .pureApply(Gen.Parameters.default, org.scalacheck.rng.Seed(1L)) :+
      "" :+ "Úřad Vlády ČR"
    val out = inputs.toDF("v")
      .select(call_function("nfd_slug", col("v")).as("native"),
        Scalars.nfdSlug(col("v")).as("viaUdf"))
      .collect()
    out.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("native parse_num_prefix matches the literal regex the oracles run") {
    NativeExpressions.register(spark)
    import spark.implicits._
    val gen = Gen.listOfN(12, Gen.frequency(
      6 -> Gen.numChar, 2 -> Gen.oneOf('.', '-'),
      2 -> Gen.oneOf('x', ' ', ',', 'e'))).map(_.mkString)
    val inputs = Gen.listOfN(300, gen)
      .pureApply(Gen.Parameters.default, org.scalacheck.rng.Seed(2L)) ++ Seq(
      "", ".", "-", "-.", "-.5", "5.", "5.x", "12.34.56", "--3", ".5",
      "-5.", "0", "-0.0", "1e5", "007")
    val out = inputs.toDF("v")
      .select(call_function("parse_num_prefix", col("v")).as("native"),
        nullif(regexp_extract(col("v"), "^(-?\\d*\\.?\\d+|-?\\d+\\.?)", 1),
          lit("")).cast("double").as("viaRegex"))
      .collect()
    inputs.zip(out).foreach { case (in, r) =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"null mismatch on '$in': $r")
      if (!r.isNullAt(0))
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)),
          s"value mismatch on '$in': $r")
    }
  }

  test("native date_iri matches the four anchored regexes") {
    NativeExpressions.register(spark)
    import spark.implicits._
    val digit = Gen.numChar
    val shapeish = for {
      y <- Gen.listOfN(4, digit).map(_.mkString)
      m <- Gen.listOfN(2, digit).map(_.mkString)
      d <- Gen.listOfN(2, digit).map(_.mkString)
      t <- Gen.listOfN(2, digit).map(_.mkString)
      s <- Gen.oneOf(y, s"$y-$m", s"$y-$m-$d", s"$y-$m-${d}T$t:$t:$t",
        s"$y-$m-$d $t:$t:$t", s"$y/$m/$d", s"$y-$m-", "x" + y, y + "x", "")
    } yield s
    val inputs = Gen.listOfN(300, shapeish)
      .pureApply(Gen.Parameters.default, org.scalacheck.rng.Seed(3L))
    val viaRegex = (c: org.apache.spark.sql.Column) =>
      when(c.rlike("^\\d{4}-\\d{2}-\\d{2}$"),
        concat(lit("http://reference.data.gov.uk/id/gregorian-day/"), c))
        .when(c.rlike("^\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}$"),
          concat(lit("http://reference.data.gov.uk/id/gregorian-interval/"), c))
        .when(c.rlike("^\\d{4}-\\d{2}$"),
          concat(lit("http://reference.data.gov.uk/id/gregorian-month/"), c))
        .when(c.rlike("^\\d{4}$"),
          concat(lit("http://reference.data.gov.uk/id/gregorian-year/"), c))
    val out = inputs.toDF("v")
      .select(call_function("date_iri", col("v")).as("native"),
        viaRegex(col("v")).as("viaRegex"))
      .collect()
    inputs.zip(out).foreach { case (in, r) =>
      assert(Option(r.getString(0)) == Option(r.getString(1)),
        s"mismatch on '$in': $r")
    }
  }

  test("native graft_dot is bit-identical to the zip_with/aggregate form") {
    NativeExpressions.register(spark)
    import spark.implicits._
    val vecGen = Gen.listOfN(64, Gen.chooseNum(-10.0f, 10.0f))
    val pairs = Gen.listOfN(100, Gen.zip(vecGen, vecGen))
      .pureApply(Gen.Parameters.default, org.scalacheck.rng.Seed(4L))
    val hofDot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x)
    val out = pairs.map { case (a, b) => (a.toArray, b.toArray) }.toDF("a", "b")
      .select(call_function("graft_dot", col("a"), col("b")).as("native"),
        hofDot(col("a"), col("b")).as("viaHof"))
      .collect()
    // Bit-identical, not approximately equal: ANN rank order (and so the
    // DuckDB oracle hash compare) rides on these exact doubles.
    out.foreach(r => assert(
      java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1))))
    // Length mismatch and null array → null, like the zip_with form.
    val edge = Seq((Array(1.0f, 2.0f), Array(1.0f), null.asInstanceOf[Array[Float]]))
      .toDF("a", "b", "c")
      .select(call_function("graft_dot", col("a"), col("b")),
        call_function("graft_dot", col("a"), col("c")))
      .collect().head
    assert(edge.isNullAt(0) && edge.isNullAt(1))
    // Integral arrays are read natively (widened per element like the
    // zip_with form's cast(double)) — no array-copying Cast in the plan.
    val mixed = Seq((Array(1, 2, 3), Array(0.5f, 2.0f, 1.5f)))
      .toDF("ints", "floats")
      .select(call_function("graft_dot", col("ints"), col("floats")).as("d"))
    assert(mixed.collect().head.getDouble(0) == 9.0)
    assert(!mixed.queryExecution.analyzed.toString.contains("cast("))
  }

  test("native asof_probe matches the filter+element_at HOF form") {
    NativeExpressions.register(spark)
    import spark.implicits._
    // Random timelines with heavy (t, v) collisions + null values, sorted
    // exactly as attributeStream packs them (array_sort over the struct,
    // null _v lowest within a tie); probe ts drawn to land before, on,
    // between, and after entries.
    val entryGen = for {
      t <- Gen.chooseNum(0L, 12L)
      v <- Gen.option(Gen.chooseNum(1L, 9L))
    } yield (t, v)
    val caseGen = for {
      n <- Gen.chooseNum(0, 8)
      es <- Gen.listOfN(n, entryGen)
      ts <- Gen.chooseNum(-1L, 13L)
    } yield (es, ts)
    val cases = Gen.listOfN(300, caseGen)
      .pureApply(Gen.Parameters.default, org.scalacheck.rng.Seed(6L))
    val df = cases.toDF("entries", "ts")
      .select(array_sort(transform(col("entries"),
        e => struct(e.getField("_1").as("_t"), e.getField("_2").as("_v"))))
        .as("_tl"), col("ts"))
    val out = df.select(
        call_function("asof_probe", col("_tl"), col("ts")).as("native"),
        try_element_at(filter(col("_tl"), p => p.getField("_t") <= col("ts")),
          lit(-1)).getField("_v").as("viaHof"))
      .collect()
    cases.zip(out).foreach { case ((es, ts), r) =>
      assert(Option(r.get(0)) == Option(r.get(1)),
        s"probe mismatch on entries=$es ts=$ts: $r")
    }
  }

  test("GraftExtensions injects every native function at session build") {
    // A fresh session configured via spark.sql.extensions needs no
    // imperative register() call — the cluster-deployment path. The
    // session bindings are cleared so getOrCreate builds a NEW session
    // (over the suite's live SparkContext) instead of returning the
    // active one, then restored; no stop() — that would kill the shared
    // context.
    import org.apache.spark.sql.SparkSession
    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // withExtensions, not .config("spark.sql.extensions", …): the conf
      // form is a STATIC conf read from the SparkContext at first-session
      // build, so it cannot take effect on a context the suite already
      // started — under spark-submit both forms run this same class.
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s2 ne prev)
      val r = s2.sql(
        "SELECT nfd_slug('Čau světe'), rolling_hash('ab'), " +
          "graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)), " +
          "asof_probe(array(named_struct('_t', 1L, '_v', 5L), " +
          "named_struct('_t', 4L, '_v', 9L)), 3L)").collect().head
      assert(r.getString(0) == "cau-svete")
      assert(r.getLong(1) == 3105L)
      assert(r.getDouble(2) == 11.0)
      assert(r.getLong(3) == 5L)
    } finally {
      SparkSession.setActiveSession(prev)
      SparkSession.setDefaultSession(prev)
    }
  }

  test("native rolling_hash: Rabin-Karp base-31 mod 1e9+7, codegen'd") {
    NativeExpressions.register(spark)
    import spark.implicits._
    // Hand-computed: "ab" → (97*31 + 98) = 3105; "" → 0; null → null.
    val out = Seq(("ab"), ("")).toDF("s")
      .select(call_function("rolling_hash", col("s"))).collect()
    assert(out(0).getLong(0) == 3105L && out(1).getLong(0) == 0L)
    val nul = Seq(Option.empty[String]).toDF("s")
      .select(call_function("rolling_hash", col("s"))).collect().head
    assert(nul.isNullAt(0))
    // Long-string value matches an independent CODE-POINT fold — including
    // a supplementary-plane char, which must hash as ONE code point (like
    // DuckDB's string_split + ascii), not two UTF-16 surrogates.
    val text = "The quick brown fox, 42 times! 😀 done"
    val expected = text.codePoints().toArray
      .foldLeft(0L)((h, c) => (h * 31 + c) % 1000000007L)
    val got = Seq(text).toDF("s")
      .select(call_function("rolling_hash", col("s"))).collect().head.getLong(0)
    assert(got == expected)
  }

  test("pii redaction: emails before digit runs, counts on raw text") {
    import spark.implicits._
    import graft.llm.{TextAnalysis => TA}
    val r = Seq("mail me at user123456789@ex.org or call 987654321 x 12345678")
      .toDF("t")
      .select(TA.redactPii(col("t")).as("red"), TA.piiCount(col("t")).as("n"))
      .collect().head
    // The digit run inside the email is consumed by <EMAIL>, the
    // standalone 9-digit run becomes <NUM>, the 8-digit run is untouched.
    assert(r.getString(0) == "mail me at <EMAIL> or call <NUM> x 12345678")
    // Count on raw text: 1 email + 2 nine-plus-digit runs (one inside the
    // email's local part, one standalone).
    assert(r.getInt(1) == 3)
  }

  test("bpe tokenizer: contractions, letter/digit/punct runs") {
    import spark.implicits._
    val out = Seq("I'll pay 42 dollars, ok?").toDF("t")
      .select(graft.llm.TextAnalysis.bpeTokens(col("t"))).collect()
      .head.getSeq[String](0)
    assert(out == Seq("I", "'ll", " pay", " 42", " dollars", ",", " ok", "?"))
  }

  test("native round_half_up_exact agrees with the UDF incl. near-ties") {
    NativeExpressions.register(spark)
    import spark.implicits._
    val inputs = Gen.listOfN(200, Gen.chooseNum(-1e9, 1e9)).pureApply(Gen.Parameters.default, org.scalacheck.rng.Seed(6L)) ++
      Seq(2.675, 1.005, -2.675, 0.0)
    val out = inputs.toDF("v")
      .select(call_function("round_half_up_exact", col("v")).as("native"),
        Scalars.roundHalfUpExact(col("v")).as("viaUdf"))
      .collect()
    out.foreach(r => assert(r.getString(0) == r.getString(1)))
    // Null flows through.
    val n = Seq[Option[Double]](None).toDF("v")
      .select(call_function("round_half_up_exact", col("v"))).collect()
    assert(n.head.isNullAt(0))
  }

  test("native expressions stay inside whole-stage codegen") {
    NativeExpressions.register(spark)
    // Parquet-backed input so a real codegen stage exists (a local Seq
    // collapses to LocalTableScan with plan-time constant evaluation).
    val df = Tables.t(spark, sf, "customer")
      .select(call_function("nfd_slug", col("c_name")).as("s"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark whole-stage-codegen stages in the plan string;
    // the native expression sits inside stage 1 with the scan.
    assert(plan.contains("*(1) Project [nfd_slug("), plan)
    assert(!plan.contains("ScalaUDF"), plan)
    // And it executes through the generated path.
    assert(df.collect().nonEmpty)
  }
}
