package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.functions.Scalars

class ScalarsSpec extends SparkSpec {

  /** Evaluate a Column function over a list of inputs in ONE Spark job. */
  private def evalBatch(inputs: Seq[String],
                        f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Seq[Option[String]] = {
    import spark.implicits._
    inputs.toDF("v").select(f(col("v")).cast("string").as("r"))
      .collect().map(r => Option(r.getString(0))).toSeq
  }

  test("parseDecimal emulates java.text.DecimalFormat prefix parsing") {
    // The reference parses measures with DecimalFormat (FdpAttribute.java:
    // 48-65): grouping sep ignored, decimal sep normalized, longest numeric
    // prefix wins, null on total failure.
    graft.functions.NativeExpressions.register(spark)
    val df = new java.text.DecimalFormat()
    val sym = new java.text.DecimalFormatSymbols()
    sym.setDecimalSeparator(',')
    sym.setGroupingSeparator(' ')
    df.setDecimalFormatSymbols(sym)

    val numLike: Gen[String] = for {
      neg <- Gen.oneOf("", "-")
      intPart <- Gen.chooseNum(0L, 999999999999L).map(_.toString)
      grouped <- Gen.oneOf(intPart, intPart.reverse.grouped(3).mkString(" ").reverse)
      frac <- Gen.oneOf("", ",5", ",25", ",999", ",")
      junk <- Gen.oneOf("", " Kč", "abc", "e5", "-x")
    } yield neg + grouped + frac + junk
    val garbage: Gen[String] = Gen.oneOf("", "N/A", "-", ",", " ", "--1", "x1")

    val inputs = Gen.listOfN(150, Gen.frequency(4 -> numLike, 1 -> garbage))
      .pureApply(Gen.Parameters.default, org.scalacheck.rng.Seed(7L))
    val expected = inputs.map { s =>
      try Option(df.parse(s).doubleValue()).map(_.toString)
      catch { case _: Exception => None }
    }
    val got = evalBatch(inputs,
      c => Scalars.parseDecimal(c, decimalSep = ",", groupSep = " "))
      .map(_.map(_.toDouble.toString))
    inputs.lazyZip(expected).lazyZip(got).foreach { (in, e, g) =>
      assert(e == g, s"input '$in': DecimalFormat=$e, parseDecimal=$g")
    }
  }

  test("roundHalfUpExact matches new BigDecimal(double).setScale(2, HALF_UP)") {
    // Exact-binary rounding parity (FdpMeasure.java:89-92) including the
    // near-tie cases where Spark's round() disagrees (2.675 → 2.67).
    val gen = Gen.oneOf(
      Gen.chooseNum(-1e9, 1e9),
      Gen.chooseNum(0L, 99999L).map(_ / 1000.0 * 1.055), // near-tie products
      Gen.const(2.675), Gen.const(1.005), Gen.const(-2.675))
    val inputs = Gen.listOfN(200, gen).pureApply(Gen.Parameters.default, org.scalacheck.rng.Seed(8L)) :+ 2.675
    import spark.implicits._
    val got = inputs.toDF("v")
      .select(Scalars.roundHalfUpExact(col("v")).as("r"))
      .collect().map(_.getString(0))
    inputs.zip(got).foreach { case (d, g) =>
      val e = new java.math.BigDecimal(d)
        .setScale(2, java.math.RoundingMode.HALF_UP).toPlainString
      assert(e == g, s"input $d")
    }
    // The documented divergence from Spark round():
    assert(got(inputs.indexOf(2.675)) == "2.67")
  }

  test("nfdSlug: lowercase basic-latin only, no spaces or dots, idempotent") {
    val gen = Gen.listOfN(40, Gen.frequency(
      5 -> Gen.alphaNumChar, 2 -> Gen.oneOf(' ', '.', '-'),
      3 -> Gen.oneOf('á', 'č', 'ď', 'é', 'ě', 'í', 'ň', 'ó', 'ř', 'š',
        'ť', 'ú', 'ů', 'ý', 'ž', 'Ú', 'Č', '§', '€', '北')))
      .map(_.mkString)
    val inputs = Gen.listOfN(100, gen).pureApply(Gen.Parameters.default, org.scalacheck.rng.Seed(9L))
    val got = evalBatch(inputs, Scalars.nfdSlug(_)).map(_.get)
    got.foreach { s =>
      assert(s.forall(ch => ch < 0x80 && ch != ' ' && ch != '.' &&
        !ch.isUpper), s"bad slug char in '$s'")
    }
    // Idempotence: slug(slug(x)) == slug(x).
    val twice = evalBatch(got, Scalars.nfdSlug(_)).map(_.get)
    assert(twice == got)
  }

  test("urlEncode matches java.net.URLEncoder after space→dash") {
    graft.functions.NativeExpressions.register(spark)
    val gen = Gen.listOfN(20, Gen.frequency(
      5 -> Gen.alphaNumChar,
      3 -> Gen.oneOf(' ', '/', '#', '?', '&', '%', 'č', 'ř', '+', '*', '.')))
      .map(_.mkString)
    val inputs = Gen.listOfN(100, gen).pureApply(Gen.Parameters.default, org.scalacheck.rng.Seed(10L))
    val got = evalBatch(inputs, Scalars.urlEncode(_)).map(_.get)
    inputs.zip(got).foreach { case (in, g) =>
      val e = java.net.URLEncoder.encode(in.replace(' ', '-'), "UTF-8")
      assert(e == g, s"input '$in'")
    }
  }

  test("fixKeyword removes/maps exactly the reference's characters") {
    val inputs = Seq("a,b.c/d:e;f§g", "§", "x", "a,,b", "/:;")
    val got = evalBatch(inputs, Scalars.fixKeyword(_)).map(_.get)
    assert(got == Seq("abc-d-e-fparagrafg", "paragraf", "x", "ab", "---"))
    got.foreach(s => assert(!s.exists(",./:;".contains(_))))
  }

  test("dateIri classifies exactly the four reference shapes") {
    graft.functions.NativeExpressions.register(spark)
    val cases = Seq(
      "2016-01-02" -> Some("http://reference.data.gov.uk/id/gregorian-day/2016-01-02"),
      "2016-01-02T03:04:05" -> Some("http://reference.data.gov.uk/id/gregorian-interval/2016-01-02T03:04:05"),
      "2016-01" -> Some("http://reference.data.gov.uk/id/gregorian-month/2016-01"),
      "2016" -> Some("http://reference.data.gov.uk/id/gregorian-year/2016"),
      "2016-1-2" -> None, "16" -> None, "2016-01-02 03:04:05" -> None,
      "x2016" -> None)
    val got = evalBatch(cases.map(_._1), Scalars.dateIri)
    assert(got == cases.map(_._2))
  }

  test("dateIriStrict raises on unclassifiable values") {
    graft.functions.NativeExpressions.register(spark)
    import spark.implicits._
    val ex = intercept[Exception] {
      Seq("nope").toDF("v").select(Scalars.dateIriStrict(col("v"))).collect()
    }
    assert(ex.getMessage.contains("not in xs:date"))
  }

  test("mergedKey joins url-encoded keys with dashes in spec order") {
    graft.functions.NativeExpressions.register(spark)
    import spark.implicits._
    val out = Seq(("a b", "c/d")).toDF("k1", "k2")
      .select(Scalars.mergedKey(Seq(col("k1"), col("k2"))).as("m"))
      .collect().head.getString(0)
    assert(out == "a-b-c%2Fd")
  }

  test("observation/dimension IRI minting matches Mapper.java:65-67 shapes") {
    import spark.implicits._
    val row = Seq(("http://ds", 7, "amount")).toDF("ds", "rn", "m")
      .select(
        Scalars.observationIri(col("ds"), col("rn"), col("m")).as("obs"),
        Scalars.dimensionValueIri(col("ds"), "econClass", lit("K1")).as("dim"),
        Scalars.codelistIri(lit("pkg"), "econClass").as("cl"))
      .collect().head
    assert(row.getString(0) == "http://ds/observation/7/for-amount")
    assert(row.getString(1) == "http://ds/econClass/K1")
    assert(row.getString(2) == "http://data.openbudgets.eu/resource/pkg/codelist/econClass")
  }
}
