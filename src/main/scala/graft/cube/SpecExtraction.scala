package graft.cube

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import Spec._

/** Extracts the cube spec from a descriptor-triples DataFrame (canonical
  * schema s,p,o,oIsIri,oLang,oDatatype) — the reference's 15 SPARQL
  * discovery queries (FdpToRdf.java:134-254) re-expressed as DataFrame
  * plans, then collected: the descriptor graph is tiny, so the result is a
  * driver-side [[Spec.CubeSpec]] and the row pipeline compiles it into
  * pure column expressions.
  *
  * Feature coverage on the descriptor plans: BGP self-joins (J1), OPTIONAL
  * (P8), VALUES with UNDEF (P9), FILTER NOT EXISTS (P7), numeric filters
  * (P6), COUNT(DISTINCT) subquery + filter-on-aggregate (A1), label
  * association self-join + delete (J5), hierarchy linearization (J6,
  * driver-side in [[Spec.DimensionSpec.orderedAttributes]]).
  */
object SpecExtraction {
  private val F = Vocab.FDPRDF

  private def prop(t: DataFrame, p: String, sAs: String, oAs: String) =
    t.filter(col("p") === p).select(col("s").as(sAs), col("o").as(oAs))

  private def subjectsOf(t: DataFrame, p: String, o: String, as: String) =
    t.filter(col("p") === p && col("o") === o).select(col("s").as(as)).distinct()

  /** Components of the (single) DSD with their attrCount, plus the
    * dataset IRI + short name: the conjunctive core shared by every
    * dimension query.
    */
  private def componentBase(t: DataFrame): DataFrame = {
    val dsd = subjectsOf(t, Vocab.A, Vocab.QB_DSD, "dsd")
    val comp = prop(t, Vocab.QB_COMPONENT, "dsd", "component")
    val ds = subjectsOf(t, Vocab.A, Vocab.QB_DATASET_TYPE, "dataset")
      .join(prop(t, Vocab.QB_STRUCTURE, "dataset", "dsd"), "dataset")
      .join(prop(t, F + "datasetShortName", "dataset", "packageName"), "dataset")
    val attrCount = prop(t, F + "attributeCount", "component", "attrCount")
    dsd.join(comp, "dsd").join(ds, "dsd")
      .join(attrCount, "component")
      .withColumn("attrCount", col("attrCount").cast("int"))
  }

  /** FILTER NOT EXISTS {?attribute fdprdf:isHierarchical true} */
  private def nonHierarchical(t: DataFrame, attrs: DataFrame): DataFrame = {
    val hier = t.filter(col("p") === F + "isHierarchical" && col("o") === "true")
      .select(col("s").as("_h"))
    attrs.join(hier, attrs("attribute") === col("_h"), "left_anti")
  }

  /** The A1 subquery: per-component count of non-hierarchical attributes
    * (distinct or not — Skos counts duplicates, MultiAttribute distinct;
    * on well-formed descriptors they agree, both offered).
    */
  private def nonHierarchCount(t: DataFrame, distinctCount: Boolean): DataFrame = {
    val attrs = nonHierarchical(t, prop(t, F + "attribute", "component", "attribute"))
    val agg = if (distinctCount) countDistinct(col("attribute"))
      else count(col("attribute"))
    attrs.groupBy("component").agg(agg.as("nonHierarchCount"))
  }

  /** component --componentProperty--> dimensionProp joined against a
    * VALUES table of (valueType, rdfType, componentProperty); UNDEF
    * rdfType rows constrain nothing (null-pattern split is unnecessary
    * here because only rdfType — an output, not a join key — is UNDEF).
    */
  private def dimensionsByValues(
      t: DataFrame, base: DataFrame,
      rows: Seq[(String, Option[String], String)]): DataFrame = {
    rows.map { case (valueType, rdfType, compProp) =>
      val vt = subjectsOf(t, F + "valueType", valueType, "component")
      val dp = prop(t, compProp, "component", "dimensionProp")
      base.join(vt, "component").join(dp, "component")
        .withColumn("rdfType",
          rdfType.map(lit(_)).getOrElse(lit(null)).cast("string"))
    }.reduce(_ unionByName _)
  }

  private def withName(t: DataFrame, dims: DataFrame): DataFrame =
    dims.join(prop(t, F + "name", "dimensionProp", "dimensionName"),
      "dimensionProp")

  /** One row per discovered dimension of `kind`, in discovery-query shape:
    * (dimensionProp, dimensionName, rdfType?).
    */
  private def discover(t: DataFrame, base: DataFrame, kind: Kind): DataFrame = {
    val many = base.filter(col("attrCount") > 1)
    val one = base.filter(col("attrCount") === 1)
    kind match {
      case Kind.MultiAttribute =>
        // MultiAttributeDimension.java:68-102: attrCount>1, 4-row VALUES
        // with UNDEF, nonHierarchCount(DISTINCT) == attrCount.
        val vals = Seq(
          (F + "organization", Some(Vocab.SCHEMA + "Organization"), Vocab.QB_DIMENSION),
          (F + "location", Some(Vocab.SCHEMA + "Location"), Vocab.QB_ATTRIBUTE),
          (F + "unknown", None, Vocab.QB_DIMENSION),
          (F + "fact", None, Vocab.QB_COMPONENT_PROPERTY))
        withName(t, dimensionsByValues(t, many, vals))
          .join(nonHierarchCount(t, distinctCount = true), "component")
          .filter(col("attrCount") === col("nonHierarchCount"))
      case Kind.Skos =>
        // SkosDimension.java:16-50: attrCount>1, valueType=skos via
        // qb:dimension, nonHierarchCount == attrCount.
        withName(t, dimensionsByValues(t, many,
          Seq((F + "skos", None, Vocab.QB_DIMENSION))))
          .join(nonHierarchCount(t, distinctCount = false), "component")
          .filter(col("attrCount") === col("nonHierarchCount"))
      case Kind.Hierarchical =>
        // HierarchicalDimension.java:18-40: attrCount>1, valueType=skos,
        // EXISTS an isHierarchical attribute.
        val hierAttr = prop(t, F + "attribute", "component", "attribute")
          .join(t.filter(col("p") === F + "isHierarchical" && col("o") === "true")
            .select(col("s").as("attribute")), "attribute")
          .select("component").distinct()
        withName(t, dimensionsByValues(t, many,
          Seq((F + "skos", None, Vocab.QB_DIMENSION))))
          .join(hierAttr, "component")
      case Kind.SingleAttributeObject =>
        // SingleAttributeObjectDimension.java:49-74: attrCount=1, 2-row
        // VALUES (organization/location).
        withName(t, dimensionsByValues(t, one, Seq(
          (F + "organization", Some(Vocab.SCHEMA + "Organization"), Vocab.QB_DIMENSION),
          (F + "location", Some(Vocab.SCHEMA + "Location"), Vocab.QB_ATTRIBUTE))))
      case Kind.SingleAttributeLiteral =>
        // SingleAttributeLiteralDimension.java:43-70: attrCount=1, 3-row
        // VALUES (unknown/unknown/fact).
        withName(t, dimensionsByValues(t, one, Seq(
          (F + "unknown", None, Vocab.QB_DIMENSION),
          (F + "unknown", None, Vocab.QB_ATTRIBUTE),
          (F + "fact", None, Vocab.QB_COMPONENT_PROPERTY))))
      case Kind.Date =>
        // DateDimension.java:42-60: attrCount=1, valueType=dateTime.
        withName(t, dimensionsByValues(t, one,
          Seq((F + "dateTime", None, Vocab.QB_DIMENSION))))
      case Kind.SingleAttributeSkos =>
        // SingleAttributeSkosDimension.java:14-34: attrCount=1, skos.
        withName(t, dimensionsByValues(t, one,
          Seq((F + "skos", None, Vocab.QB_DIMENSION))))
    }
  }

  /** Attribute rows of one dimension (the per-kind attributeQuery,
    * FdpToRdf.java:211-254): sourceColumn, iskey, valueProperty, name?,
    * parentName?, with the kind-specific hierarchical filters.
    */
  private def attributesOf(t: DataFrame, dimensionProp: String,
                           kind: Kind): Seq[AttributeSpec] = {
    val compProps = kind match {
      case Kind.MultiAttribute | Kind.SingleAttributeObject |
           Kind.SingleAttributeLiteral =>
        Seq(Vocab.QB_DIMENSION, Vocab.QB_ATTRIBUTE, Vocab.QB_COMPONENT_PROPERTY)
      case _ => Seq(Vocab.QB_DIMENSION)
    }
    val comp = t.filter(col("p").isin(compProps: _*) && col("o") === dimensionProp)
      .select(col("s").as("component")).distinct()
    var attrs = comp
      .join(prop(t, F + "attribute", "component", "attribute"), "component")
      .join(prop(t, F + "sourceColumn", "attribute", "sourceColumn"), "attribute")
      .join(prop(t, F + "iskey", "attribute", "iskey"), "attribute")
      .join(prop(t, F + "valueProperty", "attribute", "valueProperty"), "attribute")
      .join(prop(t, F + "name", "attribute", "attributeName"), Seq("attribute"), "left_outer")
    kind match {
      case Kind.Hierarchical =>
        // isHierarchical true + OPTIONAL parentAttribute/name + NOT EXISTS
        // labelfor (HierarchicalDimension.java:42-60).
        attrs = attrs.join(
          t.filter(col("p") === F + "isHierarchical" && col("o") === "true")
            .select(col("s").as("attribute")), "attribute")
        val parentName = prop(t, F + "parentAttribute", "attribute", "_pa")
          .join(prop(t, F + "name", "_pa", "parentName"), "_pa").drop("_pa")
        attrs = attrs.join(parentName, Seq("attribute"), "left_outer")
        val hasLabelFor = t.filter(col("p") === F + "labelfor")
          .select(col("s").as("_lf")).distinct()
        attrs = attrs.join(hasLabelFor, attrs("attribute") === col("_lf"), "left_anti")
      case Kind.SingleAttributeSkos => // no hierarchy filter (ref omits it)
        attrs = attrs.withColumn("parentName", lit(null).cast("string"))
      case _ =>
        attrs = nonHierarchical(t, attrs)
          .withColumn("parentName", lit(null).cast("string"))
    }
    // Sorted by attribute IRI: DataFrame collect order is nondeterministic
    // and attribute order is load-bearing — mergedPrimaryKey concatenates
    // KEY attributes in list order (FdpDimension.java:91-102), so minted
    // IRIs must not vary run-to-run. (The reference inherits RDF4J's
    // unspecified result order; a stable sort is the deterministic
    // re-expression.)
    attrs.select("attribute", "sourceColumn", "iskey", "valueProperty",
      "attributeName", "parentName")
      .collect().sortBy(_.getString(0)).map { r =>
        AttributeSpec(
          sourceColumn = r.getString(1),
          isKey = r.getString(2) == "true",
          valueProperty = r.getString(3),
          name = Option(r.getString(4)),
          parentName = Option(r.getString(5)))
      }.toSeq
  }

  /** Label association (J5, FdpDimension.java:25-54): a label attribute
    * (fdprdf:labelfor + fdprdf:source) sets `labelColumn` on its target
    * attribute and is itself removed.
    */
  private def applyLabels(t: DataFrame, dimensionProp: String,
                          attrs: Seq[AttributeSpec]): Seq[AttributeSpec] = {
    val comp = t.filter(col("p") === Vocab.QB_DIMENSION && col("o") === dimensionProp)
      .select(col("s").as("component")).distinct()
    val labels = comp
      .join(prop(t, F + "attribute", "component", "attribute"), "component")
      .join(prop(t, F + "sourceColumn", "attribute", "sourceColumn"), "attribute")
      .join(prop(t, F + "labelfor", "attribute", "labelForName"), "attribute")
      .select("labelForName", "sourceColumn")
      .collect().map(r => r.getString(0) -> r.getString(1)).sortBy(_._1)
    labels.foldLeft(attrs) { case (acc, (forName, labelCol)) =>
      acc.filterNot(_.sourceColumn == labelCol)
        .map(a => if (a.name.contains(forName)) a.copy(labelColumn = Some(labelCol)) else a)
    }
  }

  /** Measure extraction (FdpMeasure.query, FdpToRdf.java:187-209). Note the
    * measure BGP hangs components off fdprdf:component, not qb:component.
    */
  private def measures(t: DataFrame): (String, String, Boolean, Seq[MeasureSpec]) = {
    val dsd = subjectsOf(t, Vocab.A, Vocab.QB_DSD, "dsd")
    val comp = prop(t, F + "component", "dsd", "component")
    val ds = subjectsOf(t, Vocab.A, Vocab.QB_DATASET_TYPE, "dataset")
      .join(prop(t, Vocab.QB_STRUCTURE, "dataset", "dsd"), "dataset")
      .join(prop(t, F + "datasetShortName", "dataset", "packageName"), "dataset")
    def opt(df: DataFrame, p: String, sCol: String, as: String) =
      df.join(prop(t, p, sCol, as), Seq(sCol), "left_outer")
    var m = dsd.join(comp, "dsd").join(ds, "dsd")
      .join(prop(t, F + "measure", "component", "measureProperty"), "component")
      .join(prop(t, F + "factor", "component", "measureFactor"), "component")
      .join(prop(t, F + "sourceColumn", "component", "sourceColumn"), "component")
      .join(prop(t, F + "name", "measureProperty", "measureName"), "measureProperty")
    m = opt(m, F + "decimalChar", "component", "decimalChar")
    m = opt(m, F + "groupChar", "component", "groupChar")
    m = opt(m, F + "currency", "measureProperty", "currency")
    m = opt(m, F + "operationCharacter", "measureProperty", "operationCharacter")
    m = opt(m, F + "budgetPhase", "measureProperty", "budgetPhase")
    // hasCurrencyDimension: OPTIONAL qb:component/qb:dimension currency
    // path + BIND(true) (FdpMeasure.java:55-56 / P10).
    val currencyDim = prop(t, Vocab.QB_COMPONENT, "dsd", "_cc")
      .join(t.filter(col("p") === Vocab.QB_DIMENSION &&
        col("o") === Vocab.OBEU_DIMENSION_CURRENCY).select(col("s").as("_cc")), "_cc")
      .select("dsd").distinct().withColumn("hasCurrencyDimension", lit(true))
    m = m.join(currencyDim, Seq("dsd"), "left_outer")
    val rows = m.collect()
    require(rows.nonEmpty, "Dataset IRI not found in metadata")
    val head = rows.head
    def g(r: org.apache.spark.sql.Row, name: String): Option[String] =
      Option(r.getAs[String](name))
    val hasCurrency = rows.exists(r =>
      !r.isNullAt(r.fieldIndex("hasCurrencyDimension")))
    val specs = rows.map { r =>
      MeasureSpec(
        name = r.getAs[String]("measureName"),
        sourceColumn = r.getAs[String]("sourceColumn"),
        factor = r.getAs[String]("measureFactor").toDouble,
        decimalSep = g(r, "decimalChar").getOrElse("."),
        groupSep = g(r, "groupChar").getOrElse(" "),
        currency = g(r, "currency"),
        budgetPhase = g(r, "budgetPhase"),
        operationCharacter = g(r, "operationCharacter"),
        outputCurrencyDimension = hasCurrency)
    }.toSeq
    (head.getAs[String]("dataset"), head.getAs[String]("packageName"),
      hasCurrency, specs)
  }

  /** CSV dialect of a named resource (HeaderParser.resourceQuery):
    * ?resource fdp:name ?name FILTER(?name = file) with OPTIONAL
    * dialect/delimiter + dialect/quoteChar.
    */
  def dialectOf(t: DataFrame, resourceName: String): CsvDialect = {
    val fdp = Vocab.FDP
    val res = t.filter(col("p") === fdp + "name" && col("o") === resourceName)
      .select(col("s").as("resource"))
    val rows = res
      .join(prop(t, fdp + "dialect", "resource", "_d"), Seq("resource"), "left_outer")
      .join(prop(t, fdp + "delimiter", "_d", "delimiter"), Seq("_d"), "left_outer")
      .join(prop(t, fdp + "quoteChar", "_d", "quote"), Seq("_d"), "left_outer")
      .collect()
    rows.headOption.map { r =>
      CsvDialect(
        Option(r.getAs[String]("delimiter")).getOrElse(","),
        Option(r.getAs[String]("quote")).getOrElse("\""))
    }.getOrElse(CsvDialect())
  }

  /** A6: recompute each component's attribute count from the graph and
    * compare with the declared fdprdf:attributeCount — descriptor-
    * validation counterpart of the reference's trust-the-descriptor reads.
    * Returns (component, declared, actual) rows for mismatches only.
    */
  def validateAttributeCounts(t: DataFrame): DataFrame = {
    val declared = prop(t, F + "attributeCount", "component", "declared")
      .withColumn("declared", col("declared").cast("long"))
    val actual = prop(t, F + "attribute", "component", "attribute")
      .groupBy("component")
      .agg(countDistinct(col("attribute")).as("actual"))
    declared.join(actual, Seq("component"), "left_outer")
      .withColumn("actual", coalesce(col("actual"), lit(0L)))
      .filter(col("declared") =!= col("actual"))
  }

  /** Full extraction, in the reference's fixed kind order. The descriptor
    * is cached for the ~15 discovery plans and released before returning.
    */
  def extract(triples: DataFrame, resourceName: Option[String] = None): CubeSpec = {
    val t = triples.cache()
    try extractCached(t, resourceName)
    finally t.unpersist()
  }

  private def extractCached(t: DataFrame,
                            resourceName: Option[String]): CubeSpec = {
    val base = componentBase(t)
    val (datasetIri, packageName, _, measureSpecs) = measures(t)
    val kinds = Seq(Kind.MultiAttribute, Kind.Skos, Kind.Hierarchical,
      Kind.SingleAttributeObject, Kind.SingleAttributeLiteral, Kind.Date,
      Kind.SingleAttributeSkos)
    val dims = kinds.flatMap { kind =>
      discover(t, base, kind)
        .select("dimensionProp", "dimensionName", "rdfType").distinct()
        .collect().sortBy(_.getString(0)).map { r =>
          val dp = r.getString(0)
          val attrs = applyLabels(t, dp, attributesOf(t, dp, kind))
          DimensionSpec(kind, r.getString(1), dp, Option(r.getString(2)), attrs)
        }
    }
    // Hierarchical dims run LAST in the mapper (FdpToRdf.java:290-292).
    val ordered = dims.filter(_.kind != Kind.Hierarchical) ++
      dims.filter(_.kind == Kind.Hierarchical)
    val dialect = resourceName.map(dialectOf(t, _)).getOrElse(CsvDialect())
    CubeSpec(datasetIri, packageName, ordered, measureSpecs, dialect)
  }
}
