package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.cube.{Emitter, Spec, Vocab}
import Spec._

/** CORRECTNESS query for the cube emitter: a fixed spec over rows derived
  * from `lineitem` (deterministic `_row` injected as a column — the CSV
  * file-order path is exercised in CubeSpecSuite), verified triple-by-
  * triple against a DuckDB oracle that mirrors the full dimension×measure
  * fan-out.
  */
object CubeQueries {
  private val DS = "http://data.openbudgets.eu/datasets/graftbudget"
  private val CZK = "http://publications.europa.eu/resource/authority/currency/CZK"

  private val spec = CubeSpec(
    datasetIri = DS,
    packageName = "graftbudget",
    dimensions = Seq(
      DimensionSpec(Kind.SingleAttributeSkos, "econClass",
        Vocab.OBEU_DIMENSION + "economicClassification", None,
        Seq(AttributeSpec("dept", isKey = true,
          valueProperty = Vocab.FDPRDF + "deptProp", name = Some("dept")))),
      DimensionSpec(Kind.Date, "yearDim", Vocab.OBEU_DIMENSION + "date", None,
        Seq(AttributeSpec("budget_year", isKey = false,
          valueProperty = Vocab.FDPRDF + "yearProp"))),
      DimensionSpec(Kind.SingleAttributeLiteral, "note",
        Vocab.OBEU_DIMENSION + "note", None,
        Seq(AttributeSpec("note", isKey = false,
          valueProperty = Vocab.FDPRDF + "noteProp")))),
    measures = Seq(MeasureSpec(
      name = "amount", sourceColumn = "amount", factor = 1.055,
      decimalSep = ",", groupSep = " ", currency = Some(CZK),
      outputCurrencyDimension = true)))

  /** q43 spec: the three kinds q37 doesn't cover — MultiAttribute
    * (organization), Skos with a label attribute, Hierarchical 2-level —
    * so every emitter branch is oracle-verified.
    */
  private val fullSpec = CubeSpec(
    datasetIri = DS,
    packageName = "graftbudget",
    dimensions = Seq(
      DimensionSpec(Kind.MultiAttribute, "supplier",
        Vocab.OBEU_DIMENSION + "supplier",
        Some(Vocab.SCHEMA + "Organization"),
        Seq(
          AttributeSpec("sup_id", isKey = true,
            valueProperty = Vocab.FDPRDF + "supId", name = Some("supId")),
          AttributeSpec("sup_name", isKey = false,
            valueProperty = Vocab.FDPRDF + "supName", name = Some("supName")))),
      DimensionSpec(Kind.Skos, "econClass",
        Vocab.OBEU_DIMENSION + "economicClassification", None,
        Seq(AttributeSpec("code", isKey = true,
          valueProperty = Vocab.FDPRDF + "codeProp", name = Some("code"),
          labelColumn = Some("code_label")))),
      DimensionSpec(Kind.Hierarchical, "budgetChapter",
        Vocab.OBEU_DIMENSION + "budgetChapter", None,
        Seq(
          AttributeSpec("paragraph", isKey = true,
            valueProperty = Vocab.FDPRDF + "paragraphProp",
            name = Some("paragraph"), parentName = Some("chapter")),
          AttributeSpec("chapter", isKey = false,
            valueProperty = Vocab.FDPRDF + "chapterProp",
            name = Some("chapter"))))),
    measures = Seq(MeasureSpec(
      name = "amount", sourceColumn = "amount", factor = 1.055,
      decimalSep = ",", groupSep = " ")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q43_cube_full_kinds" -> { (s, dir) =>
      val rows = t(s, dir, "lineitem").select(
        (col("l_orderkey") * 10 + col("l_linenumber")).as("_row"),
        concat(lit("S"), col("l_orderkey") % 100).as("sup_id"),
        concat(lit("Supplier "), col("l_orderkey") % 100).as("sup_name"),
        concat(lit("K"), col("l_linenumber")).as("code"),
        when(col("l_linenumber") % 2 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("Label "), col("l_linenumber"))).as("code_label"),
        concat(lit("P"), col("l_orderkey") % 10).as("paragraph"),
        when(col("l_orderkey") % 5 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("CH"), col("l_orderkey") % 5)).as("chapter"),
        when(col("l_orderkey") % 7 === 0, lit("nine hundred"))
          .otherwise(replace(col("l_extendedprice")
            .cast(org.apache.spark.sql.types.DecimalType(12, 2)).cast("string"),
            lit("."), lit(","))).as("amount"))
      Emitter.emit(rows, fullSpec, Emitter.ExactDecimal)
    },

    "q37_cube_observations" -> { (s, dir) =>
      val rows = t(s, dir, "lineitem").select(
        (col("l_orderkey") * 10 + col("l_linenumber")).as("_row"),
        concat(col("l_returnflag"), col("l_linestatus")).as("dept"),
        year(col("l_shipdate")).cast("string").as("budget_year"),
        when(col("l_linenumber") % 3 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("n"), col("l_linenumber"))).as("note"),
        when(col("l_orderkey") % 7 === 0, lit("nine hundred"))
          .otherwise(replace(col("l_extendedprice")
            .cast(org.apache.spark.sql.types.DecimalType(12, 2)).cast("string"),
            lit("."), lit(","))).as("amount"))
      Emitter.emit(rows, spec, Emitter.ExactDecimal)
    }
  )

  val oracles: Map[String, String] = Map(
    "q43_cube_full_kinds" -> {
      val obs = s"'$DS/observation/' || r || '/for-amount'"
      val supVal = s"'$DS/supplier/' || sup_id"
      val econVal = s"'$DS/econClass/' || code"
      val pIri = s"'$DS/paragraph/' || paragraph"
      val cIriOrNull = s"'$DS/chapter/' || coalesce(chapter, 'null')"
      val cIri = s"'$DS/chapter/' || chapter"
      val clE = "'http://data.openbudgets.eu/resource/graftbudget/codelist/econClass'"
      val clH = "'http://data.openbudgets.eu/resource/graftbudget/codelist/budgetChapter'"
      def iri(s: String, p: String, o: String, where: String = "") =
        s"""SELECT $s AS s, '$p' AS p, $o AS o, true AS oIsIri,
           |CAST(NULL AS VARCHAR) AS oLang, CAST(NULL AS VARCHAR) AS oDatatype
           |FROM rows_ $where""".stripMargin
      def strLit(s: String, p: String, o: String, where: String = "") =
        s"""SELECT $s AS s, '$p' AS p, $o AS o, false AS oIsIri,
           |CAST(NULL AS VARCHAR) AS oLang, CAST(NULL AS VARCHAR) AS oDatatype
           |FROM rows_ $where""".stripMargin
      val parts = Seq(
        // MultiAttribute supplier
        iri(supVal, Vocab.A, s"'${Vocab.SCHEMA}Organization'"),
        strLit(supVal, Vocab.FDPRDF + "supId", "sup_id"),
        strLit(supVal, Vocab.FDPRDF + "supName", "sup_name"),
        iri(obs, Vocab.OBEU_DIMENSION + "supplier", supVal),
        // Skos econClass with label attribute
        strLit(econVal, Vocab.SKOS_PREFLABEL, "code_label",
          "WHERE code_label IS NOT NULL"),
        s"""SELECT $econVal AS s,
           |CASE WHEN code_label IS NOT NULL THEN '${Vocab.SKOS_NOTATION}'
           |     ELSE '${Vocab.FDPRDF}codeProp' END AS p,
           |code AS o, false AS oIsIri, CAST(NULL AS VARCHAR) AS oLang,
           |CAST(NULL AS VARCHAR) AS oDatatype FROM rows_""".stripMargin,
        iri(obs, Vocab.OBEU_DIMENSION + "economicClassification", econVal),
        iri(econVal, Vocab.A, s"'${Vocab.SKOS_CONCEPT}'"),
        strLit(econVal, Vocab.SKOS_PREFLABEL, "code",
          "WHERE code_label IS NULL"),
        iri(econVal, Vocab.SKOS_INSCHEME, clE),
        iri(clE, Vocab.A, s"'${Vocab.SKOS_CONCEPTSCHEME}'"),
        strLit(clE, Vocab.RDFS_LABEL, "'econClass'"),
        iri(clE, Vocab.SKOS_HASTOPCONCEPT, econVal),
        iri(s"'${Vocab.OBEU_DIMENSION}economicClassification'",
          Vocab.QB_CODELIST, clE),
        // Hierarchical budgetChapter — level 0 paragraph (always present)
        iri(obs, Vocab.OBEU_DIMENSION + "budgetChapter", pIri),
        iri(pIri, Vocab.SKOS_BROADER, cIriOrNull),
        strLit(pIri, Vocab.SKOS_NOTATION, "paragraph"),
        iri(pIri, Vocab.A, s"'${Vocab.SKOS_CONCEPT}'"),
        iri(pIri, Vocab.SKOS_INSCHEME, clH),
        iri(clH, Vocab.A, s"'${Vocab.SKOS_CONCEPTSCHEME}'"),
        strLit(clH, Vocab.RDFS_LABEL, "'budgetChapter'"),
        iri(s"'${Vocab.OBEU_DIMENSION}budgetChapter'", Vocab.QB_CODELIST, clH),
        // level 1 chapter (root; null-gated)
        strLit(cIri, Vocab.SKOS_NOTATION, "chapter",
          "WHERE chapter IS NOT NULL"),
        iri(cIri, Vocab.A, s"'${Vocab.SKOS_CONCEPT}'",
          "WHERE chapter IS NOT NULL"),
        iri(cIri, Vocab.SKOS_INSCHEME, clH, "WHERE chapter IS NOT NULL"),
        iri(clH, Vocab.A, s"'${Vocab.SKOS_CONCEPTSCHEME}'",
          "WHERE chapter IS NOT NULL"),
        strLit(clH, Vocab.RDFS_LABEL, "'budgetChapter'",
          "WHERE chapter IS NOT NULL"),
        iri(s"'${Vocab.OBEU_DIMENSION}budgetChapter'", Vocab.QB_CODELIST,
          clH, "WHERE chapter IS NOT NULL"),
        iri(clH, Vocab.SKOS_HASTOPCONCEPT, cIri, "WHERE chapter IS NOT NULL"),
        // Measure (decimal round or raw fallback)
        s"""SELECT $obs AS s, '${Vocab.OBEU_AMOUNT}' AS p,
           |CASE WHEN parsed IS NOT NULL
           |  THEN CAST(round(CAST(parsed AS DECIMAL(18,2)) * CAST(1.055 AS DECIMAL(10,4)), 2) AS VARCHAR)
           |  ELSE amount END AS o,
           |false AS oIsIri, CAST(NULL AS VARCHAR) AS oLang,
           |CASE WHEN parsed IS NOT NULL THEN '${Vocab.XSD_DECIMAL}' END AS oDatatype
           |FROM rows_""".stripMargin,
        // Observation boilerplate
        iri(s"'$DS'", Vocab.QB_OBSERVATION, obs),
        iri(obs, Vocab.A, s"'${Vocab.QB_OBSERVATION_TYPE}'"),
        iri(obs, Vocab.QB_DATASET, s"'$DS'"))
      s"""WITH rows_ AS (
         |  SELECT l_orderkey * 10 + l_linenumber AS r,
         |    'S' || (l_orderkey % 100) AS sup_id,
         |    'Supplier ' || (l_orderkey % 100) AS sup_name,
         |    'K' || l_linenumber AS code,
         |    CASE WHEN l_linenumber % 2 = 0 THEN NULL
         |      ELSE 'Label ' || l_linenumber END AS code_label,
         |    'P' || (l_orderkey % 10) AS paragraph,
         |    CASE WHEN l_orderkey % 5 = 0 THEN NULL
         |      ELSE 'CH' || (l_orderkey % 5) END AS chapter,
         |    amount,
         |    CAST(nullif(regexp_extract(
         |      replace(replace(amount, ' ', ''), ',', '.'),
         |      '^(-?\\d*\\.?\\d+|-?\\d+\\.?)', 1), '') AS DOUBLE) AS parsed
         |  FROM (
         |    SELECT *,
         |      CASE WHEN l_orderkey % 7 = 0 THEN 'nine hundred'
         |        ELSE replace(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR), '.', ',')
         |      END AS amount
         |    FROM lineitem))
         |${parts.mkString("", "\nUNION ALL\n", "")}""".stripMargin
    },
    "q37_cube_observations" -> {
      val obs = s"'$DS/observation/' || r || '/for-amount'"
      val dimVal = s"'$DS/econClass/' || dept"  // url-encode is identity on [A-Z]
      val cl = "'http://data.openbudgets.eu/resource/graftbudget/codelist/econClass'"
      val dateIri = "'http://reference.data.gov.uk/id/gregorian-year/' || budget_year"
      def iri(s: String, p: String, o: String, where: String = "") =
        s"""SELECT $s AS s, '$p' AS p, $o AS o, true AS oIsIri,
           |CAST(NULL AS VARCHAR) AS oLang, CAST(NULL AS VARCHAR) AS oDatatype
           |FROM rows_ $where""".stripMargin
      def strLit(s: String, p: String, o: String, where: String = "", dt: String = "NULL") =
        s"""SELECT $s AS s, '$p' AS p, $o AS o, false AS oIsIri,
           |CAST(NULL AS VARCHAR) AS oLang, CAST($dt AS VARCHAR) AS oDatatype
           |FROM rows_ $where""".stripMargin
      val parts = Seq(
        // SingleAttributeSkos econClass (dept is never null here)
        iri(obs, Vocab.OBEU_DIMENSION + "economicClassification", dimVal),
        iri(dimVal, Vocab.A, s"'${Vocab.SKOS_CONCEPT}'"),
        strLit(dimVal, Vocab.SKOS_PREFLABEL, "dept"),
        iri(dimVal, Vocab.SKOS_INSCHEME, cl),
        iri(cl, Vocab.A, s"'${Vocab.SKOS_CONCEPTSCHEME}'"),
        strLit(cl, Vocab.RDFS_LABEL, "'econClass'"),
        iri(cl, Vocab.SKOS_HASTOPCONCEPT, dimVal),
        iri(s"'${Vocab.OBEU_DIMENSION}economicClassification'",
          Vocab.QB_CODELIST, cl),
        // Date dimension (year shape always matches)
        iri(obs, Vocab.OBEU_DIMENSION + "date", dateIri),
        iri(dateIri, Vocab.A, s"'${Vocab.TIME_INTERVAL}'"),
        // SingleAttributeLiteral note (null-gated)
        strLit(obs, Vocab.OBEU_DIMENSION + "note", "note",
          "WHERE note IS NOT NULL"),
        // Measure: decimal round or raw-string fallback
        s"""SELECT $obs AS s, '${Vocab.OBEU_AMOUNT}' AS p,
           |CASE WHEN parsed IS NOT NULL
           |  THEN CAST(round(CAST(parsed AS DECIMAL(18,2)) * CAST(1.055 AS DECIMAL(10,4)), 2) AS VARCHAR)
           |  ELSE amount END AS o,
           |false AS oIsIri, CAST(NULL AS VARCHAR) AS oLang,
           |CASE WHEN parsed IS NOT NULL THEN '${Vocab.XSD_DECIMAL}' END AS oDatatype
           |FROM rows_""".stripMargin,
        iri(obs, Vocab.OBEU_ATTRIBUTE_CURRENCY, s"'$CZK'"),
        iri(obs, Vocab.OBEU_DIMENSION_CURRENCY, s"'$CZK'"),
        // Observation boilerplate
        iri(s"'$DS'", Vocab.QB_OBSERVATION, obs),
        iri(obs, Vocab.A, s"'${Vocab.QB_OBSERVATION_TYPE}'"),
        iri(obs, Vocab.QB_DATASET, s"'$DS'"))
      s"""WITH rows_ AS (
         |  SELECT l_orderkey * 10 + l_linenumber AS r,
         |    l_returnflag || l_linestatus AS dept,
         |    CAST(year(l_shipdate) AS VARCHAR) AS budget_year,
         |    CASE WHEN l_linenumber % 3 = 0 THEN NULL
         |      ELSE 'n' || l_linenumber END AS note,
         |    amount,
         |    CAST(nullif(regexp_extract(
         |      replace(replace(amount, ' ', ''), ',', '.'),
         |      '^(-?\\d*\\.?\\d+|-?\\d+\\.?)', 1), '') AS DOUBLE) AS parsed
         |  FROM (
         |    SELECT *,
         |      CASE WHEN l_orderkey % 7 = 0 THEN 'nine hundred'
         |        ELSE replace(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR), '.', ',')
         |      END AS amount
         |    FROM lineitem))
         |${parts.mkString("", "\nUNION ALL\n", "")}""".stripMargin
    }
  )
}
