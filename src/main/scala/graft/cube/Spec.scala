package graft.cube

/** Driver-side logical schema of a Fiscal-Data-Package cube, extracted from
  * the descriptor graph (SURVEY.md §1.1 "Data-cube logical schema"). The
  * descriptor is tiny, so the spec lives on the driver and compiles into
  * `Column` expressions ([[Emitter]]) — the 100 TB data path never joins
  * against it.
  */
object Spec {

  /** CSV dialect from the resource descriptor (HeaderParser.java:39-42
    * defaults `,` and `"`).
    */
  case class CsvDialect(delimiter: String = ",", quote: String = "\"")

  /** One source-column binding of a dimension
    * (FdpAttribute.java; name optional — only skos/hierarchical queries
    * bind ?attributeName).
    */
  case class AttributeSpec(
      sourceColumn: String,
      isKey: Boolean,
      valueProperty: String,
      name: Option[String] = None,
      labelColumn: Option[String] = None,
      parentName: Option[String] = None)

  /** The seven dimension kinds, discovered in this fixed order
    * (FdpToRdf.java:134-185).
    */
  sealed trait Kind
  object Kind {
    case object MultiAttribute extends Kind
    case object Skos extends Kind
    case object Hierarchical extends Kind
    case object SingleAttributeObject extends Kind
    case object SingleAttributeLiteral extends Kind
    case object Date extends Kind
    case object SingleAttributeSkos extends Kind
  }

  case class DimensionSpec(
      kind: Kind,
      name: String,
      valueProperty: String,
      rdfType: Option[String],
      attributes: Seq[AttributeSpec]) {

    /** Hierarchy linearization leaf→root (HierarchicalDimension.java:82-103,
      * SURVEY.md §7.4 risk 5: first-found leaf wins; attributes without a
      * parent pointer can only appear as chain tails).
      */
    lazy val orderedAttributes: Seq[AttributeSpec] = {
      def byName(n: String) = attributes.find(_.name.contains(n))
      val leaf = attributes.find { a =>
        a.parentName.isDefined &&
          !attributes.exists(o => o.parentName.isDefined && o.parentName == a.name)
      }
      Iterator.iterate(leaf)(_.flatMap(_.parentName).flatMap(byName))
        .takeWhile(_.isDefined).flatten.toSeq
    }
  }

  /** Measure spec (FdpMeasure.java): measureProperty is ALWAYS overridden
    * to obeu:amount (FdpMeasure.java:61); factor scales before HALF_UP
    * rounding; separators drive the DecimalFormat-style parse.
    */
  case class MeasureSpec(
      name: String,
      sourceColumn: String,
      factor: Double,
      decimalSep: String = ".",
      groupSep: String = " ",
      currency: Option[String] = None,
      budgetPhase: Option[String] = None,
      operationCharacter: Option[String] = None,
      outputCurrencyDimension: Boolean = false,
      multiMeasure: Boolean = false)

  case class CubeSpec(
      datasetIri: String,
      packageName: String,
      dimensions: Seq[DimensionSpec],
      measures: Seq[MeasureSpec],
      dialect: CsvDialect = CsvDialect())
}

/** IRIs the cube pipeline emits (FdpToRdfVocabulary.java:12-49). */
object Vocab {
  val RDFS = "http://www.w3.org/2000/01/rdf-schema#"
  val RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  val SKOS = "http://www.w3.org/2004/02/skos/core#"
  val SCHEMA = "http://schema.org/"
  val TIME = "http://www.w3.org/2006/time#"
  val QB = "http://purl.org/linked-data/cube#"
  val XSD = "http://www.w3.org/2001/XMLSchema#"
  val FDPRDF = "http://data.openbudgets.eu/fdptordf#"
  val FDP = "http://schemas.frictionlessdata.io/fiscal-data-package#"
  val ORG = "http://www.w3.org/ns/org#"

  val OBEU_DIMENSION = "http://data.openbudgets.eu/ontology/dsd/dimension/"
  val OBEU_ATTRIBUTE = "http://data.openbudgets.eu/ontology/dsd/attribute/"
  val OBEU_MEASURE = "http://data.openbudgets.eu/ontology/dsd/measure/"
  val OBEU_AMOUNT = OBEU_MEASURE + "amount"
  val OBEU_DIMENSION_CURRENCY = OBEU_DIMENSION + "currency"
  val OBEU_ATTRIBUTE_CURRENCY = OBEU_ATTRIBUTE + "currency"
  val OBEU_DIMENSION_BUDGETPHASE = OBEU_DIMENSION + "budgetPhase"
  val OBEU_DIMENSION_OPERATIONCHARACTER = OBEU_DIMENSION + "operationCharacter"

  val A = RDF + "type"
  val RDFS_LABEL = RDFS + "label"
  val SKOS_CONCEPT = SKOS + "Concept"
  val SKOS_PREFLABEL = SKOS + "prefLabel"
  val SKOS_INSCHEME = SKOS + "inScheme"
  val SKOS_CONCEPTSCHEME = SKOS + "ConceptScheme"
  val SKOS_HASTOPCONCEPT = SKOS + "hasTopConcept"
  val SKOS_NOTATION = SKOS + "notation"
  val SKOS_BROADER = SKOS + "broader"
  val SCHEMA_NAME = SCHEMA + "name"
  val TIME_INTERVAL = TIME + "Interval"
  val QB_OBSERVATION = QB + "observation"
  val QB_OBSERVATION_TYPE = QB + "Observation"
  val QB_DATASET = QB + "dataSet"
  val QB_CODELIST = QB + "codeList"
  val QB_MEASURE_TYPE = QB + "measureType"
  val QB_DIMENSION = QB + "dimension"
  val QB_ATTRIBUTE = QB + "attribute"
  val QB_COMPONENT_PROPERTY = QB + "componentProperty"
  val QB_COMPONENT = QB + "component"
  val QB_STRUCTURE = QB + "structure"
  val QB_DSD = QB + "DataStructureDefinition"
  val QB_DATASET_TYPE = QB + "DataSet"
  val XSD_DECIMAL = XSD + "decimal"
}
