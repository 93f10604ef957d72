package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.cube.{CubePipeline, Emitter, Spec, SpecExtraction, Vocab}
import Spec._

class CubeSpecSuite extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val F = Vocab.FDPRDF
  private val tripleSchema = StructType(Seq(
    StructField("s", StringType), StructField("p", StringType),
    StructField("o", StringType), StructField("oIsIri", BooleanType),
    StructField("oLang", StringType), StructField("oDatatype", StringType)))

  /** input.ttl-shaped descriptor: DSD with a multi-attribute organization
    * dimension, a skos dimension with a label attribute, a hierarchical
    * dimension (paragraph→chapter), a date dimension, and one measure with
    * separators + currency + a currency dimension in the DSD.
    */
  private def descriptor = {
    def tr(s: String, p: String, o: String) = Row(s, p, o, true, null, null)
    val rows = Seq(
      tr("urn:ds", Vocab.A, Vocab.QB_DATASET_TYPE),
      tr("urn:ds", Vocab.QB_STRUCTURE, "urn:dsd"),
      tr("urn:ds", F + "datasetShortName", "testpkg"),
      tr("urn:dsd", Vocab.A, Vocab.QB_DSD),
      // c1: multi-attribute organization dimension, 2 attrs
      tr("urn:dsd", Vocab.QB_COMPONENT, "urn:c1"),
      tr("urn:c1", F + "attributeCount", "2"),
      tr("urn:c1", F + "valueType", F + "organization"),
      tr("urn:c1", Vocab.QB_DIMENSION, "urn:dp1"),
      tr("urn:dp1", F + "name", "supplier"),
      tr("urn:c1", F + "attribute", "urn:a11"),
      tr("urn:c1", F + "attribute", "urn:a12"),
      tr("urn:a11", F + "sourceColumn", "supplier_id"),
      tr("urn:a11", F + "iskey", "true"),
      tr("urn:a11", F + "valueProperty", F + "supplierId"),
      tr("urn:a12", F + "sourceColumn", "supplier_name"),
      tr("urn:a12", F + "iskey", "false"),
      tr("urn:a12", F + "valueProperty", F + "supplierName"),
      // c2: skos dimension, key attr "code" + label attr for it
      tr("urn:dsd", Vocab.QB_COMPONENT, "urn:c2"),
      tr("urn:c2", F + "attributeCount", "2"),
      tr("urn:c2", F + "valueType", F + "skos"),
      tr("urn:c2", Vocab.QB_DIMENSION, "urn:dp2"),
      tr("urn:dp2", F + "name", "econClass"),
      tr("urn:c2", F + "attribute", "urn:a21"),
      tr("urn:c2", F + "attribute", "urn:a22"),
      tr("urn:a21", F + "sourceColumn", "code"),
      tr("urn:a21", F + "iskey", "true"),
      tr("urn:a21", F + "valueProperty", F + "codeProp"),
      tr("urn:a21", F + "name", "code"),
      tr("urn:a22", F + "sourceColumn", "code_label"),
      tr("urn:a22", F + "iskey", "false"),
      tr("urn:a22", F + "valueProperty", F + "codeLabelProp"),
      tr("urn:a22", F + "name", "codeLabel"),
      tr("urn:a22", F + "labelfor", "code"),
      // c3: hierarchical skos dimension paragraph→chapter
      tr("urn:dsd", Vocab.QB_COMPONENT, "urn:c3"),
      tr("urn:c3", F + "attributeCount", "2"),
      tr("urn:c3", F + "valueType", F + "skos"),
      tr("urn:c3", Vocab.QB_DIMENSION, "urn:dp3"),
      tr("urn:dp3", F + "name", "budgetChapter"),
      tr("urn:c3", F + "attribute", "urn:h1"),
      tr("urn:c3", F + "attribute", "urn:h2"),
      tr("urn:h1", F + "sourceColumn", "paragraph"),
      tr("urn:h1", F + "iskey", "true"),
      tr("urn:h1", F + "valueProperty", F + "paragraphProp"),
      tr("urn:h1", F + "name", "paragraph"),
      tr("urn:h1", F + "isHierarchical", "true"),
      tr("urn:h1", F + "parentAttribute", "urn:h2"),
      tr("urn:h2", F + "sourceColumn", "chapter"),
      tr("urn:h2", F + "iskey", "false"),
      tr("urn:h2", F + "valueProperty", F + "chapterProp"),
      tr("urn:h2", F + "name", "chapter"),
      tr("urn:h2", F + "isHierarchical", "true"),
      // c4: date dimension
      tr("urn:dsd", Vocab.QB_COMPONENT, "urn:c4"),
      tr("urn:c4", F + "attributeCount", "1"),
      tr("urn:c4", F + "valueType", F + "dateTime"),
      tr("urn:c4", Vocab.QB_DIMENSION, "urn:dp4"),
      tr("urn:dp4", F + "name", "yearDim"),
      tr("urn:c4", F + "attribute", "urn:a41"),
      tr("urn:a41", F + "sourceColumn", "budget_year"),
      tr("urn:a41", F + "iskey", "false"),
      tr("urn:a41", F + "valueProperty", F + "yearProp"),
      // measure component (hangs off fdprdf:component)
      tr("urn:dsd", F + "component", "urn:cm"),
      tr("urn:cm", F + "measure", "urn:mp"),
      tr("urn:cm", F + "factor", "1.055"),
      tr("urn:cm", F + "sourceColumn", "amount"),
      tr("urn:cm", F + "decimalChar", ","),
      tr("urn:cm", F + "groupChar", " "),
      tr("urn:mp", F + "name", "amount"),
      tr("urn:mp", F + "currency", "urn:czk"),
      // currency dimension in the DSD → hasCurrencyDimension
      tr("urn:dsd", Vocab.QB_COMPONENT, "urn:ccur"),
      tr("urn:ccur", Vocab.QB_DIMENSION, Vocab.OBEU_DIMENSION_CURRENCY),
      // CSV resource dialect
      tr("urn:res", Vocab.FDP + "name", "budget.csv"),
      tr("urn:res", Vocab.FDP + "dialect", "urn:dialect"),
      tr("urn:dialect", Vocab.FDP + "delimiter", ";"))
    spark.createDataFrame(rows.asJava, tripleSchema)
  }

  lazy val spec: CubeSpec =
    SpecExtraction.extract(descriptor, Some("budget.csv"))

  test("extraction: dimensions discovered with the right kinds and order") {
    assert(spec.datasetIri == "urn:ds" && spec.packageName == "testpkg")
    val byName = spec.dimensions.map(d => d.name -> d.kind).toMap
    assert(byName == Map(
      "supplier" -> Kind.MultiAttribute,
      "econClass" -> Kind.Skos,
      "budgetChapter" -> Kind.Hierarchical,
      "yearDim" -> Kind.Date))
    // Hierarchical dims are appended last (FdpToRdf.java:290-292).
    assert(spec.dimensions.last.name == "budgetChapter")
    assert(spec.dimensions.head.rdfType.contains(Vocab.SCHEMA + "Organization"))
  }

  test("extraction: label association attaches + removes the label attribute") {
    val econ = spec.dimensions.find(_.name == "econClass").get
    assert(econ.attributes.map(_.sourceColumn) == Seq("code"))
    assert(econ.attributes.head.labelColumn.contains("code_label"))
  }

  test("extraction: hierarchy linearized leaf→root") {
    val hier = spec.dimensions.find(_.name == "budgetChapter").get
    assert(hier.orderedAttributes.flatMap(_.name) == Seq("paragraph", "chapter"))
  }

  test("extraction: measure separators, currency, currency-dimension flag") {
    val m = spec.measures.head
    assert(m.name == "amount" && m.factor == 1.055)
    assert(m.decimalSep == "," && m.groupSep == " ")
    assert(m.currency.contains("urn:czk") && m.outputCurrencyDimension)
    assert(spec.dialect == CsvDialect(";", "\""))
  }

  test("pipeline end-to-end: CSV with dialect → observation triples → .nt") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cube").toFile
    val csv = new java.io.File(dir, "budget.csv")
    // ';' dialect from the descriptor; row 2 has a null chapter + an
    // unparseable amount (exercises fallback), row 3 nulls the skos code.
    java.nio.file.Files.writeString(csv.toPath,
      """supplier_id;supplier_name;code;code_label;paragraph;chapter;budget_year;amount
        |S1;Acme Corp;K10;Wages;P1;CH1;2016;1 234,56
        |S2;;K20;;P2;;2016-03;unknown
        |S3;Beta s r o;;Misc;P3;CH2;2016-03-04;7,5
        |""".stripMargin)
    val triples = CubePipeline.run(spark, descriptor, csv.getPath,
      Some("budget.csv")).cache()
    val rows = triples.collect().map(r =>
      (r.getString(0), r.getString(1), r.getString(2))).toSet

    val obs1 = "urn:ds/observation/1/for-amount"
    // Measure: 1 234,56 * 1.055 = 1302.4608 → HALF_UP → 1302.46.
    assert(rows.contains((obs1, Vocab.OBEU_AMOUNT, "1302.46")))
    // Fallback: raw string literal for the unparseable amount.
    assert(rows.contains(("urn:ds/observation/2/for-amount",
      Vocab.OBEU_AMOUNT, "unknown")))
    // Currency attribute + dimension triples.
    assert(rows.contains((obs1, Vocab.OBEU_ATTRIBUTE_CURRENCY, "urn:czk")))
    assert(rows.contains((obs1, Vocab.OBEU_DIMENSION_CURRENCY, "urn:czk")))
    // MultiAttribute supplier: value IRI from the key attr only.
    assert(rows.contains(("urn:ds/supplier/S1", F + "supplierName", "Acme Corp")))
    assert(rows.contains((obs1, "urn:dp1", "urn:ds/supplier/S1")))
    // Skos with label: prefLabel from label column + notation from value.
    assert(rows.contains(("urn:ds/econClass/K10", Vocab.SKOS_PREFLABEL, "Wages")))
    assert(rows.contains(("urn:ds/econClass/K10", Vocab.SKOS_NOTATION, "K10")))
    // Skos without label on row 2: value property, prefLabel = mergedKey.
    assert(rows.contains(("urn:ds/econClass/K20", F + "codeProp", "K20")))
    assert(rows.contains(("urn:ds/econClass/K20", Vocab.SKOS_PREFLABEL, "K20")))
    // Hierarchy: paragraph links observation, broader → chapter; null
    // chapter on row 2 renders the reference's "null" concat artifact.
    assert(rows.contains((obs1, "urn:dp3", "urn:ds/paragraph/P1")))
    assert(rows.contains(("urn:ds/paragraph/P1", Vocab.SKOS_BROADER,
      "urn:ds/chapter/CH1")))
    assert(rows.contains(("urn:ds/paragraph/P2", Vocab.SKOS_BROADER,
      "urn:ds/chapter/null")))
    // Date classification per shape.
    assert(rows.contains((obs1, "urn:dp4",
      "http://reference.data.gov.uk/id/gregorian-year/2016")))
    assert(rows.contains(("urn:ds/observation/3/for-amount", "urn:dp4",
      "http://reference.data.gov.uk/id/gregorian-day/2016-03-04")))
    // Observation boilerplate.
    assert(rows.contains(("urn:ds", Vocab.QB_OBSERVATION, obs1)))
    assert(rows.contains((obs1, Vocab.A, Vocab.QB_OBSERVATION_TYPE)))
    assert(rows.contains((obs1, Vocab.QB_DATASET, "urn:ds")))

    // .nt sink round-trip: CRLF line shape.
    val ntDir = new java.io.File(dir, "out.nt")
    CubePipeline.writeNt(triples, ntDir.getPath, singleFile = true)
    val part = ntDir.listFiles().find(_.getName.startsWith("part-")).get
    val content = java.nio.file.Files.readString(part.toPath)
    assert(content.contains(" .\r\n"))
    assert(content.contains(
      s"<$obs1> <${Vocab.OBEU_AMOUNT}> \"1302.46\"^^<${Vocab.XSD_DECIMAL}> .\r\n"))
  }

  test("A6: attributeCount validation flags mismatched components only") {
    val ok = SpecExtraction.validateAttributeCounts(descriptor)
    assert(ok.count() == 0, ok.collect().mkString(", "))
    // Corrupt one declared count → exactly that component is flagged.
    val bad = descriptor.withColumn("o",
      org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.col("s") === "urn:c2" &&
          org.apache.spark.sql.functions.col("p") === F + "attributeCount",
        "5").otherwise(org.apache.spark.sql.functions.col("o")))
    val flagged = SpecExtraction.validateAttributeCounts(bad).collect()
    assert(flagged.length == 1 && flagged.head.getAs[String]("component") == "urn:c2")
    assert(flagged.head.getAs[Long]("declared") == 5L &&
      flagged.head.getAs[Long]("actual") == 2L)
  }

  test("S5: UTF-8 BOM in the CSV header is stripped by the reader") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bom").toFile
    val csv = new java.io.File(dir, "bom.csv")
    java.nio.file.Files.write(csv.toPath,
      ("\ufeff" + "col_a,col_b\nv1,v2\n").getBytes("UTF-8"))
    val df = CubePipeline.readCsv(spark, csv.getPath)
    assert(df.columns.take(2).toSeq == Seq("col_a", "col_b"),
      s"BOM leaked into header: ${df.columns.mkString(",")}")
    assert(df.collect().head.getString(0) == "v1")
  }

  test("S7: .nt passthrough lines are unioned into the output verbatim") {
    val dir = java.nio.file.Files.createTempDirectory("graft-passthru").toFile
    val nt = new java.io.File(dir, "extra.nt")
    java.nio.file.Files.writeString(nt.toPath,
      "<urn:x> <urn:p> \"keep\" .\n<urn:y> <urn:p> <urn:z> .\n")
    import spark.implicits._
    val fresh = Seq("<urn:new> <urn:p> \"emitted\" .").toDF("value")
    val all = CubePipeline.withPassthrough(spark, fresh, Seq(nt.getPath))
      .collect().map(_.getString(0)).toSet
    assert(all == Set(
      "<urn:new> <urn:p> \"emitted\" .",
      "<urn:x> <urn:p> \"keep\" .",
      "<urn:y> <urn:p> <urn:z> ."))
  }

  test("W1 holds across multiple input splits of one CSV") {
    val dir = java.nio.file.Files.createTempDirectory("graft-w1multi").toFile
    val csv = new java.io.File(dir, "big.csv")
    // ~3 MB file; with 256 KB splits the read fans out to >10 partitions.
    val n = 100000
    val body = new StringBuilder("c\n")
    (1 to n).foreach(i => body.append("value_").append(i).append('\n'))
    java.nio.file.Files.writeString(csv.toPath, body.toString)
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", 256 * 1024)
      val df = CubePipeline.readCsv(spark, csv.getPath)
      assert(df.rdd.getNumPartitions > 4, "file did not split")
      val sample = df.filter(org.apache.spark.sql.functions.col("c")
        .isin("value_1", "value_33333", "value_66666", "value_100000"))
        .collect().map(r => r.getAs[String]("c") -> r.getAs[Long]("_row")).toMap
      assert(sample == Map("value_1" -> 1L, "value_33333" -> 33333L,
        "value_66666" -> 66666L, "value_100000" -> 100000L), sample.toString)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }

  test("readCsv rejects multi-file input (single-CSV W1 contract)") {
    // FdpToRdf.java:297 hard-errors above one CSV because the _row
    // file-order contract is undefined across files.
    val dir = java.nio.file.Files.createTempDirectory("graft-multi").toFile
    java.nio.file.Files.writeString(
      new java.io.File(dir, "a.csv").toPath, "c\nx\n")
    java.nio.file.Files.writeString(
      new java.io.File(dir, "b.csv").toPath, "c\ny\n")
    val ex = intercept[IllegalArgumentException] {
      CubePipeline.readCsv(spark, dir.getPath)
    }
    assert(ex.getMessage.contains("Only one CSV file expected"))
  }

  test("merged key: null key cell mints a literal 'null' segment") {
    // FdpDimension.java:91-115: urlEncode(null) is null and Java string-
    // concat stringifies it, so the IRI and the prefLabel fallback both
    // carry a "null" segment — concat_ws alone would silently drop it.
    import spark.implicits._
    val rows = Seq((1L, Option.empty[String], "x", "7"))
      .toDF("_row", "k1", "k2", "amt")
    val spec = CubeSpec(
      datasetIri = "urn:ds", packageName = "p",
      dimensions = Seq(DimensionSpec(Kind.MultiAttribute, "d", F + "dProp",
        None, Seq(
          AttributeSpec("k1", isKey = true, valueProperty = F + "k1",
            name = Some("k1")),
          AttributeSpec("k2", isKey = true, valueProperty = F + "k2",
            name = Some("k2"))))),
      measures = Seq(MeasureSpec(name = "amt", sourceColumn = "amt",
        factor = 1.0, decimalSep = ".", groupSep = " ")))
    val dimLinks = Emitter.emit(rows, spec, Emitter.ExactDecimal)
      .filter(org.apache.spark.sql.functions.col("p") === (F + "dProp"))
      .collect()
    assert(dimLinks.nonEmpty)
    dimLinks.foreach(r => assert(r.getAs[String]("o") == "urn:ds/d/null-x"))
  }

  test("emitter: row numbers follow file order (W1)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-w1").toFile
    val csv = new java.io.File(dir, "rows.csv")
    val body = (1 to 500).map(i => s"v$i").mkString("c\n", "\n", "\n")
    java.nio.file.Files.writeString(csv.toPath, body)
    val df = CubePipeline.readCsv(spark, csv.getPath)
    val got = df.collect().map(r =>
      r.getAs[String]("c") -> r.getAs[Long]("_row")).toMap
    (1 to 500).foreach(i => assert(got(s"v$i") == i.toLong))
  }
}
