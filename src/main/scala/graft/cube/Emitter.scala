package graft.cube

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Scalars
import Spec._

/** Compiles a [[Spec.CubeSpec]] into triple-struct column expressions over
  * a CSV-rows DataFrame — SURVEY.md J7: the reference's per-row
  * dimension-value probing (Mapper.java:97-101) is not a runtime join at
  * all; the spec becomes ONE `select(explode(array(...)))` projection that
  * Catalyst evaluates in a single codegen'd pass. The only non-builtin on
  * the path is the exact-binary measure rounding UDF (and that has a
  * decimal-mode alternative).
  *
  * Fan-out semantics (SURVEY.md §7.4 risk 4): every dimension emits once
  * per (row × measure) because the observation IRI embeds the measure name
  * (Mapper.java:65-67, :97-101); duplicates are preserved — the reference's
  * text sink writes every submit().
  *
  * Input contract: `rows` carries one string column per CSV column plus
  * `_row`, the 1-based file-order row number (W1).
  */
object Emitter {

  /** Measure rounding mode: `ExactBinary` reproduces the reference's
    * `new BigDecimal(double)` artifacts (FdpMeasure.java:89-92) via UDF;
    * `ExactDecimal` is the codegen'd cross-engine-deterministic path.
    */
  sealed trait RoundingMode
  case object ExactBinary extends RoundingMode
  case object ExactDecimal extends RoundingMode

  private def iriT(s: Column, p: String, o: Column): Column =
    struct(s.as("s"), lit(p).as("p"), o.as("o"), lit(true).as("oIsIri"),
      lit(null).cast("string").as("oLang"),
      lit(null).cast("string").as("oDatatype"))

  private def litT(s: Column, p: String, o: Column, dt: String = null): Column =
    struct(s.as("s"), lit(p).as("p"), o.as("o"), lit(false).as("oIsIri"),
      lit(null).cast("string").as("oLang"),
      (if (dt == null) lit(null) else lit(dt)).cast("string").as("oDatatype"))

  /** when(cond, triple) — null marks "not emitted"; the pipeline filters
    * nulls after the explode.
    */
  private def opt(cond: Column, t: Column): Column = when(cond, t)

  /** Merged primary key of a dimension: `-`-joined url-encoded key
    * attribute values in spec order (FdpDimension.java:89-102). A null key
    * cell mints a literal "null" segment — urlEncode(null) is null and the
    * reference's Java string-concat stringifies it (FdpDimension.java:91-115)
    * — whereas concat_ws would silently drop it, diverging both the
    * dimension-value IRI and the Skos prefLabel merged-key fallback.
    */
  private def mergedKeyExpr(dim: DimensionSpec): Column =
    concat_ws("-", dim.attributes.filter(_.isKey)
      .map(a => coalesce(Scalars.urlEncode(col(a.sourceColumn)), lit("null"))): _*)

  // Shared per-row subexpressions (value IRIs, merged keys, hierarchy
  // level IRIs, classified dates) are PRECOMPUTED as hidden helper columns
  // by [[withHelpers]] and only referenced by name inside the triple
  // structs: a value IRI appears in up to 8 triples, and inlining the
  // urlEncode/regex work into each struct would multiply it 8× (Catalyst
  // does not collapse a Project into a Generate, so the helper projection
  // survives as a single evaluation).
  private def mergedKey(dim: DimensionSpec): Column = col(s"_mk_${dim.name}")
  private def valueIri(spec: CubeSpec, dim: DimensionSpec): Column =
    col(s"_vi_${dim.name}")
  private def hierIri(dim: DimensionSpec, i: Int): Column =
    col(s"_hi_${dim.name}_$i")
  private def dateIri(dim: DimensionSpec, i: Int): Column =
    col(s"_di_${dim.name}_$i")
  // Per-measure helpers: the observation IRI appears in EVERY triple of the
  // measure's fan-out (~10-30 structs) and the decimal parse is a per-row
  // regex that would otherwise run once per reference (condition + value +
  // datatype); both are evaluated once per row here.
  private def obsIri(m: MeasureSpec): Column = col(s"_obs_${m.name}")
  private def mParsed(m: MeasureSpec): Column = col(s"_mp_${m.name}")
  private def mRounded(m: MeasureSpec): Column = col(s"_mr_${m.name}")

  /** Helper columns for one spec, added to the rows before emission. */
  def withHelpers(rows: DataFrame, spec: CubeSpec,
                  mode: RoundingMode = ExactBinary): DataFrame = {
    graft.functions.NativeExpressions.register(rows.sparkSession)
    val withMeasures = spec.measures.foldLeft(rows) { (df, m) =>
      val parsed = Scalars.parseDecimal(col(m.sourceColumn), m.decimalSep,
        m.groupSep)
      val rounded = mode match {
        case ExactBinary => Scalars.roundHalfUpExact(mParsed(m) * m.factor)
        case ExactDecimal =>
          Scalars.measureDecimal(mParsed(m), lit(m.factor)).cast("string")
      }
      df.withColumn(s"_obs_${m.name}",
          Scalars.observationIri(lit(spec.datasetIri), col("_row"), lit(m.name)))
        .withColumn(s"_mp_${m.name}", parsed)
        .withColumn(s"_mr_${m.name}", rounded)
    }
    spec.dimensions.foldLeft(withMeasures) { (df, dim) =>
      dim.kind match {
        case Kind.MultiAttribute | Kind.SingleAttributeObject |
             Kind.Skos | Kind.SingleAttributeSkos =>
          df.withColumn(s"_mk_${dim.name}", mergedKeyExpr(dim))
            .withColumn(s"_vi_${dim.name}",
              concat(lit(spec.datasetIri + "/" + dim.name + "/"),
                col(s"_mk_${dim.name}")))
        case Kind.Hierarchical =>
          dim.orderedAttributes.zipWithIndex.foldLeft(df) { case (d, (a, i)) =>
            d.withColumn(s"_hi_${dim.name}_$i",
              concat(lit(spec.datasetIri + "/" + a.name.getOrElse("") + "/"),
                coalesce(Scalars.urlEncode(col(a.sourceColumn)), lit("null"))))
          }
        case Kind.Date =>
          dim.attributes.zipWithIndex.foldLeft(df) { case (d, (a, i)) =>
            d.withColumn(s"_di_${dim.name}_$i",
              Scalars.dateIriStrict(col(a.sourceColumn)))
          }
        case Kind.SingleAttributeLiteral => df
      }
    }
  }

  private def codelistIri(spec: CubeSpec, dim: DimensionSpec): Column =
    lit("http://data.openbudgets.eu/resource/" + spec.packageName +
      "/codelist/" + dim.name)

  /** skos boilerplate shared by Skos / SingleAttributeSkos / Hierarchical
    * (F16): inScheme, ConceptScheme, rdfs:label, qb:codeList (+ optional
    * hasTopConcept target).
    */
  private def schemeBoilerplate(spec: CubeSpec, dim: DimensionSpec,
                                cond: Column, value: Column,
                                topConcept: Option[Column]): Seq[Column] = {
    val cl = codelistIri(spec, dim)
    Seq(
      opt(cond, iriT(value, Vocab.SKOS_INSCHEME, cl)),
      opt(cond, iriT(cl, Vocab.A, lit(Vocab.SKOS_CONCEPTSCHEME))),
      opt(cond, litT(cl, Vocab.RDFS_LABEL, lit(dim.name)))) ++
      topConcept.map(tc => opt(cond, iriT(cl, Vocab.SKOS_HASTOPCONCEPT, tc))) :+
      opt(cond, iriT(lit(dim.valueProperty), Vocab.QB_CODELIST, cl))
  }

  /** Triples of one dimension for the observation of one measure —
    * faithful translation of each kind's processRow.
    */
  def dimensionTriples(spec: CubeSpec, dim: DimensionSpec,
                       obs: Column): Seq[Column] = dim.kind match {
    case Kind.MultiAttribute =>
      // MultiAttributeDimension.java:106-116.
      val v = valueIri(spec, dim)
      dim.rdfType.map(rt => iriT(v, Vocab.A, lit(rt))).toSeq ++
        dim.attributes.map(a => opt(col(a.sourceColumn).isNotNull,
          litT(v, a.valueProperty, col(a.sourceColumn)))) :+
        iriT(obs, dim.valueProperty, v)

    case Kind.Skos =>
      // SkosDimension.java:77-109: sequential weHaveLabel state + the
      // LAST attribute's null-ness gates the boilerplate block.
      val v = valueIri(spec, dim)
      // weHaveLabel after processing attribute i (cumulative OR).
      def labelEmitted(a: AttributeSpec): Column = a.labelColumn match {
        case Some(lc) => col(a.sourceColumn).isNotNull && col(lc).isNotNull
        case None => lit(false)
      }
      val cumLabel: Seq[Column] = dim.attributes.scanLeft(lit(false): Column) {
        (acc, a) => acc || labelEmitted(a)
      }.tail
      val perAttr = dim.attributes.zipWithIndex.flatMap { case (a, i) =>
        val attrVal = col(a.sourceColumn)
        val labelTriple = a.labelColumn.map(lc =>
          opt(attrVal.isNotNull && col(lc).isNotNull,
            litT(v, Vocab.SKOS_PREFLABEL, col(lc))))
        val haveLabel = cumLabel(i)
        val valueTriple = opt(attrVal.isNotNull,
          when(haveLabel, litT(v, Vocab.SKOS_NOTATION, attrVal))
            .otherwise(litT(v, a.valueProperty, attrVal)))
        labelTriple.toSeq :+ valueTriple
      }
      val lastVal = col(dim.attributes.last.sourceColumn)
      val anyLabel = cumLabel.last
      val tail = Seq(
        opt(lastVal.isNotNull, iriT(obs, dim.valueProperty, v)),
        opt(lastVal.isNotNull, iriT(v, Vocab.A, lit(Vocab.SKOS_CONCEPT))),
        opt(lastVal.isNotNull && !anyLabel,
          litT(v, Vocab.SKOS_PREFLABEL, mergedKey(dim)))) ++
        schemeBoilerplate(spec, dim, lastVal.isNotNull, v, Some(v))
      perAttr ++ tail

    case Kind.Hierarchical =>
      // HierarchicalDimension.java:107-142: leaf→root walk; first
      // non-null level links the observation; broader points at the next
      // level (even when its value is null — Java string-concats "null").
      val attrs = dim.orderedAttributes
      val firstNonNull: Seq[Column] = attrs
        .scanLeft(lit(false): Column)((acc, a) => acc || col(a.sourceColumn).isNotNull)
      attrs.zipWithIndex.flatMap { case (a, i) =>
        val v = col(a.sourceColumn)
        val cond = v.isNotNull
        val iri = hierIri(dim, i)
        val isFirst = cond && !firstNonNull(i) // no earlier non-null level
        val broader = if (i < attrs.size - 1) {
          Seq(opt(cond, iriT(iri, Vocab.SKOS_BROADER, hierIri(dim, i + 1))))
        } else Nil
        val top = if (i == attrs.size - 1)
          Seq(opt(cond, iriT(codelistIri(spec, dim), Vocab.SKOS_HASTOPCONCEPT, iri)))
        else Nil
        val label = a.labelColumn.map(lc => opt(cond && col(lc).isNotNull,
          litT(iri, Vocab.SKOS_PREFLABEL, col(lc)))).toSeq
        Seq(opt(isFirst, iriT(obs, dim.valueProperty, iri))) ++ broader ++ Seq(
          opt(cond, litT(iri, Vocab.SKOS_NOTATION, v)),
          opt(cond, iriT(iri, Vocab.A, lit(Vocab.SKOS_CONCEPT)))) ++
          schemeBoilerplate(spec, dim, cond, iri, None).take(4) ++ top ++ label
      }

    case Kind.SingleAttributeObject =>
      // SingleAttributeObjectDimension.java:78-94.
      val v = valueIri(spec, dim)
      val any = dim.attributes.map(a => col(a.sourceColumn).isNotNull)
        .reduceOption(_ || _).getOrElse(lit(false))
      dim.attributes.map(a => opt(col(a.sourceColumn).isNotNull,
        litT(v, Vocab.SCHEMA_NAME, col(a.sourceColumn)))) ++
        dim.rdfType.map(rt => opt(any, iriT(v, Vocab.A, lit(rt)))).toSeq :+
        opt(any, iriT(obs, dim.valueProperty, v))

    case Kind.SingleAttributeLiteral =>
      // SingleAttributeLiteralDimension.java:76-84.
      dim.attributes.map(a => opt(col(a.sourceColumn).isNotNull,
        litT(obs, dim.valueProperty, col(a.sourceColumn))))

    case Kind.Date =>
      // DateDimension.java:64-78: classify → IRI + time:Interval type;
      // unclassifiable non-null values fail the job.
      dim.attributes.zipWithIndex.flatMap { case (a, i) =>
        val v = col(a.sourceColumn)
        val iri = dateIri(dim, i)
        Seq(opt(v.isNotNull, iriT(obs, dim.valueProperty, iri)),
          opt(v.isNotNull, iriT(iri, Vocab.A, lit(Vocab.TIME_INTERVAL))))
      }

    case Kind.SingleAttributeSkos =>
      // SingleAttributeSkosDimension.java:58-72.
      val v = valueIri(spec, dim)
      val a0 = col(dim.attributes.head.sourceColumn)
      Seq(
        opt(a0.isNotNull, iriT(obs, dim.valueProperty, v)),
        opt(a0.isNotNull, iriT(v, Vocab.A, lit(Vocab.SKOS_CONCEPT))),
        opt(a0.isNotNull, litT(v, Vocab.SKOS_PREFLABEL, a0))) ++
        schemeBoilerplate(spec, dim, a0.isNotNull, v, Some(v))
  }

  /** Measure triples (FdpMeasure.java:87-118): parse → factor → HALF_UP
    * round to decimal literal, raw string literal fallback; plus
    * budgetPhase / operationCharacter / currency / measureType extras.
    * The rounding mode is NOT a parameter here: the rounded value is the
    * `_mr_` helper column, so the mode is fixed by the [[withHelpers]]
    * call that produced the rows.
    */
  def measureTriples(spec: CubeSpec, m: MeasureSpec, obs: Column): Seq[Column] = {
    val raw = col(m.sourceColumn)
    val parsed = mParsed(m)
    val rounded = mRounded(m)
    val cond = raw.isNotNull
    val amount = opt(cond,
      when(parsed.isNotNull, litT(obs, Vocab.OBEU_AMOUNT, rounded, Vocab.XSD_DECIMAL))
        .otherwise(litT(obs, Vocab.OBEU_AMOUNT, raw)))
    val extras =
      m.budgetPhase.map(bp => opt(cond,
        iriT(obs, Vocab.OBEU_DIMENSION_BUDGETPHASE, lit(bp)))).toSeq ++
      m.operationCharacter.map(oc => opt(cond,
        iriT(obs, Vocab.OBEU_DIMENSION_OPERATIONCHARACTER, lit(oc)))).toSeq ++
      m.currency.toSeq.flatMap { c =>
        Seq(opt(cond, iriT(obs, Vocab.OBEU_ATTRIBUTE_CURRENCY, lit(c)))) ++
          (if (m.outputCurrencyDimension)
            Seq(opt(cond, iriT(obs, Vocab.OBEU_DIMENSION_CURRENCY, lit(c))))
          else Nil)
      } ++
      (if (m.multiMeasure)
        Seq(opt(cond, iriT(obs, Vocab.QB_MEASURE_TYPE, lit(Vocab.OBEU_AMOUNT))))
      else Nil)
    amount +: extras
  }

  /** Full per-row triple set: dimensions × measures fan-out + measure
    * triples + the 3 observation-boilerplate triples per measure
    * (Mapper.java:97-111).
    */
  def rowTriples(spec: CubeSpec): Seq[Column] = {
    val ds = lit(spec.datasetIri)
    spec.measures.flatMap { m =>
      val obs = obsIri(m)
      spec.dimensions.flatMap(d => dimensionTriples(spec, d, obs)) ++
        measureTriples(spec, m, obs) ++ Seq(
          iriT(ds, Vocab.QB_OBSERVATION, obs),
          iriT(obs, Vocab.A, lit(Vocab.QB_OBSERVATION_TYPE)),
          iriT(obs, Vocab.QB_DATASET, ds))
    }
  }

  /** rows(+_row) → exploded triples DataFrame (canonical schema).
    *
    * The triple array is built (and null-filtered) in its own projection so
    * the heavy struct construction runs inside WholeStageCodegen; the
    * Generate then explodes a plain attribute. Inlining the array into the
    * Generate's generator puts the entire fan-out expression on GenerateExec's
    * interpreted path — measured 2-3× slower at sf0.1.
    */
  def emit(rows: DataFrame, spec: CubeSpec,
           mode: RoundingMode = ExactBinary): DataFrame = {
    val arr = array(rowTriples(spec): _*)
    withHelpers(rows, spec, mode)
      .select(explode(arr).as("t"))
      .filter(col("t").isNotNull)
      .select("t.*")
  }
}
