package graft.graphquery

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Basic-graph-pattern combinators over the canonical triples DataFrame
  * (s, p, o, oIsIri, oLang, oDatatype) — the SPARQL-subset "engine"
  * (SURVEY.md §7.1 module 3), built as DataFrame combinators instead of a
  * parser so Catalyst sees one declarative plan per query.
  *
  * Each combinator mirrors a SPARQL feature the reference embeds in its 34
  * SELECT queries (SURVEY.md §2.3): triple patterns, property paths
  * (DcatAp11ToCkanBatch.java:259), inverse paths (:372), LANGMATCHES
  * filters (:254), FILTER NOT EXISTS (MultiAttributeDimension.java:56),
  * VALUES with UNDEF (:38-43), and the singleResult scalar lookup with ""
  * default (DcatAp11ToCkanBatch.java:627-641).
  *
  * Scale shape: `pattern` is a pushed-down filter on `p` (partition triples
  * by predicate at 100 TB and these become partition-pruned scans); hop
  * joins shuffle on the IRI join key; small graphs (codelists, descriptors)
  * should be wrapped in `broadcast()` by the caller.
  */
object Bgp {

  /** One triple pattern with a fixed predicate: SELECT ?s ?o WHERE {?s <p> ?o}.
    * Returns columns (s, `as`).
    */
  def pattern(t: DataFrame, p: String, as: String): DataFrame =
    t.filter(col("p") === p).select(col("s"), col("o").as(as))

  /** SPARQL LANGMATCHES with RFC 4647 basic filtering: the language range
    * matches the tag exactly (case-insensitive) or any of its
    * region/variant subtags — `cs` matches `cs` and `cs-CZ` but not
    * `csx`; `*` matches any tagged literal. The reference always passes a
    * bare primary tag (DcatAp11ToCkanBatch.java:254), but its Jena
    * langMatches implements full basic filtering, so a catalog carrying
    * regioned tags must not lose them here.
    */
  def langMatches(tag: Column, range: String): Column = {
    val r = range.toLowerCase
    if (r == "*") tag.isNotNull && tag =!= ""
    else lower(tag) === r || startswith(lower(tag), lit(r + "-"))
  }

  /** Pattern keeping only lang-tagged literals whose tag LANGMATCHES
    * `lang` (basic filtering — see [[langMatches]]).
    */
  def patternLang(t: DataFrame, p: String, lang: String, as: String): DataFrame =
    t.filter(col("p") === p && langMatches(col("oLang"), lang))
      .select(col("s"), col("o").as(as))

  /** Property path p1/p2 (two-hop): SELECT ?s ?o WHERE {?s <p1>/<p2> ?o}.
    * The intermediate node is t1.o === t2.s.
    */
  def path(t: DataFrame, p1: String, p2: String, as: String,
           broadcastHop: Boolean = false,
           lang2: Option[String] = None): DataFrame = {
    val h1 = t.filter(col("p") === p1).select(col("s"), col("o").as("_mid"))
    val hop2Filter = lang2 match {
      case Some(l) => col("p") === p2 && langMatches(col("oLang"), l)
      case None => col("p") === p2
    }
    val h2raw = t.filter(hop2Filter)
      .select(col("s").as("_mid2"), col("o").as(as))
    val h2 = if (broadcastHop) broadcast(h2raw) else h2raw
    h1.join(h2, col("_mid") === col("_mid2")).select(col("s"), col(as))
  }

  /** Inverse path ^p: SELECT ?s ?o WHERE {?o <p> ?s} — rebinds the object
    * position as the subject (DcatAp11ToCkanBatch.java:372).
    */
  def inverse(t: DataFrame, p: String, as: String): DataFrame =
    t.filter(col("p") === p).select(col("o").as("s"), col("s").as(as))

  /** Sequence path p1/p2/…/pn (n-hop): generalizes [[path]] by folding
    * one equi-join per hop; each hop's slice is a pushed predicate filter.
    * `broadcastHops` wraps every non-first hop in broadcast() for the
    * small-graph case (codelists, descriptors).
    */
  def pathSeq(t: DataFrame, ps: Seq[String], as: String,
              broadcastHops: Boolean = false): DataFrame = {
    require(ps.nonEmpty, "pathSeq needs at least one predicate")
    val first = t.filter(col("p") === ps.head)
      .select(col("s"), col("o").as("_hop"))
    val joined = ps.tail.foldLeft(first) { (acc, p) =>
      val hopRaw = t.filter(col("p") === p)
        .select(col("s").as("_hs"), col("o").as("_ho"))
      val hop = if (broadcastHops) broadcast(hopRaw) else hopRaw
      acc.join(hop, col("_hop") === col("_hs"))
        .select(col("s"), col("_ho").as("_hop"))
    }
    joined.select(col("s"), col("_hop").as(as))
  }

  /** Reflexive-transitive path p* : p+ plus the zero-length (n, n) pair
    * for every term of the QUERIED GRAPH — all subjects and objects of
    * `t`, not only terms incident to `p` (SPARQL zero-length-path
    * semantics: a node with no p-edges still reaches itself).
    */
  def pathStar(t: DataFrame, p: String, as: String,
               maxRounds: Int = 20): DataFrame = {
    val nodes = t.select(col("s"))
      .unionByName(t.select(col("o").as("s"))).distinct()
    pathPlus(t, p, as, maxRounds)
      .unionByName(nodes.select(col("s"), col("s").as(as)))
      .distinct()
  }

  /** Zero-or-one path p? : the p edges plus the zero-length (n, n) pair
    * for every term of the queried graph — [[pathStar]]'s reflexive row
    * without the fixpoint (SPARQL 1.1 ZeroOrOnePath; set semantics).
    * One predicate-filtered scan + one distinct over graph terms. */
  def pathZeroOrOne(t: DataFrame, p: String, as: String): DataFrame = {
    val nodes = t.select(col("s"))
      .unionByName(t.select(col("o").as("s"))).distinct()
    t.filter(col("p") === p).select(col("s"), col("o").as(as))
      .unionByName(nodes.select(col("s"), col("s").as(as)))
      .distinct()
  }

  /** Transitive path p+ : all (s, o) with a directed p-path of length ≥ 1
    * — the SPARQL property-path operator Spark has no built-in for, as a
    * distributed fixpoint.
    *
    * Strategy: pointer doubling (path-doubling), not per-hop BFS — each
    * round joins the closure-so-far with itself, so paths up to length 2ᵏ
    * exist after k rounds and a depth-d graph closes in O(log d) rounds
    * instead of O(d). On a cluster each round is one self-join shuffle on
    * the join key + a distinct; driver-side work is one count per round
    * (the fixpoint test). Each round's result is localCheckpoint'ed
    * LAZILY and materialized by that same count — one job per round, not
    * a checkpoint job plus a count job — cutting the exponentially-
    * growing lineage while feeding the next join from the persisted
    * blocks. Cycles converge (the closure is a finite set); `maxRounds`
    * (2^20-length paths at the default) bounds the degenerate case.
    */
  def pathPlus(t: DataFrame, p: String, as: String,
               maxRounds: Int = 20): DataFrame =
    pathPlusEdges(t.filter(col("p") === p).select(col("s"), col("o")),
      maxRounds).select(col("s"), col("o").as(as))

  /** The pointer-doubling fixpoint over an ARBITRARY (s, o) edge set —
    * what lets GROUPED property paths close: `(p/q)+` is this fixpoint
    * over the composite p⨝q relation, `(p|q)+` over the unioned edge
    * sets. Same O(log depth) round structure and lazy-checkpoint
    * discipline as the single-predicate form (which now delegates
    * here).
    *
    * `keyCols` PARTITIONS the closure: each round's self-join equates
    * the key columns alongside the o=s hop, so paths never cross a key
    * boundary and the result keeps the keys. This is what makes
    * closures inside `GRAPH ?g` per-graph (key = the g column — the
    * fixpoint runs independently in every named graph WITHOUT
    * enumerating graphs driver-side: one keyed self-join per round,
    * all graphs at once, skew handled by AQE like any other composite
    * join key). Empty keys = the plain single-relation closure. */
  def pathPlusEdges(edges: DataFrame, maxRounds: Int = 20,
                    keyCols: Seq[String] = Nil): DataFrame = {
    val out = keyCols ++ Seq("s", "o")
    var acc = edges.select(out.map(col): _*)
      .distinct().localCheckpoint(false)
    var size = acc.count()
    var rounds = 0
    var fixed = size == 0
    while (!fixed && rounds < maxRounds) {
      val right = acc.select(keyCols.map(k => col(k).as(s"_k$k")) ++
        Seq(col("s").as("_m"), col("o").as("_o2")): _*)
      val cond = keyCols.foldLeft(col("o") === col("_m")) {
        (c, k) => c && col(k) === col(s"_k$k")
      }
      val doubled = acc.join(right, cond)
        .select(keyCols.map(col) ++ Seq(col("s"), col("_o2").as("o")): _*)
      acc = acc.unionByName(doubled).distinct().localCheckpoint(false)
      val n = acc.count()
      fixed = n == size
      size = n
      rounds += 1
    }
    acc.select(out.map(col): _*)
  }

  /** FILTER NOT EXISTS {?s <p> ?anything} as a left-anti join. */
  def notExists(left: DataFrame, t: DataFrame, p: String): DataFrame = {
    val ex = t.filter(col("p") === p).select(col("s").as("_ex_s"))
    left.join(ex, left("s") === col("_ex_s"), "left_anti")
  }

  /** OPTIONAL {?s <p> ?o}: left-outer join adding column `as` (null when
    * absent). `bind` optionally adds a BIND(true AS flag) on the matched
    * branch (FdpMeasure.java:55-56) — the flag is false when unmatched.
    */
  def optional(left: DataFrame, t: DataFrame, p: String, as: String,
               bindFlag: Option[String] = None,
               broadcastRight: Boolean = false): DataFrame = {
    // broadcastRight is caller-opt-in (like path's broadcastHop): the
    // predicate slice of a 100 TB triples table can itself be huge.
    val r0 = t.filter(col("p") === p).select(col("s").as("_opt_s"), col("o").as(as))
    val r = if (broadcastRight) broadcast(r0) else r0
    val joined = left.join(r, left("s") === col("_opt_s"), "left_outer")
      .drop("_opt_s")
    bindFlag match {
      case Some(f) => joined.withColumn(f, col(as).isNotNull)
      case None => joined
    }
  }

  /** VALUES inline table with UNDEF support (SURVEY.md P9, §7.4 risk 8).
    *
    * `rows` may contain nulls = UNDEF: a null cell constrains nothing. The
    * naive single join would null-compare; instead rows are grouped by
    * null-pattern, each group joins only on its non-null columns, and the
    * groups union (MultiAttributeDimension.java:38-43 has a 4-row VALUES
    * with UNDEF).
    *
    * `left` must contain all `cols`; output = left columns + all VALUES
    * columns (null where the matching row left them UNDEF).
    */
  def values(spark: SparkSession, left: DataFrame, cols: Seq[String],
             rows: Seq[Seq[String]]): DataFrame = {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(
      cols.map(c => org.apache.spark.sql.types.StructField(s"_v_$c",
        org.apache.spark.sql.types.StringType)))
    // SPARQL semantics of an empty VALUES block: no solutions.
    if (rows.isEmpty) {
      return cols.foldLeft(left.limit(0)) { (df, c) =>
        df.withColumn(s"_v_$c", lit(null).cast("string"))
      }
    }
    val byPattern = rows.groupBy(_.map(_ == null))
    val parts = byPattern.map { case (nullPattern, grpRows) =>
      val vdf = spark.createDataFrame(
        grpRows.map(r => org.apache.spark.sql.Row(r: _*)).asJava, schema)
      val joinCols = cols.zip(nullPattern).collect { case (c, false) => c }
      val cond = joinCols.map(c => left(c) === col(s"_v_$c"))
        .reduceOption(_ && _).getOrElse(lit(true))
      left.join(broadcast(vdf), cond)
    }
    parts.reduce(_ unionByName _)
  }

  /** The S2/A4 "scalarOf" inversion: instead of the reference's N+1
    * per-entity scalar SPARQL lookups (DcatAp11ToCkanBatch.java:627-641 run
    * ~25× per dataset), one wide aggregation produces every property as a
    * column in a single pass: groupBy(s).agg(first(when(p===X, o))).
    *
    * Missing properties default to "" exactly like QueryResults.singleResult
    * → "" (DcatAp11ToCkanBatch.java:634-639).
    */
  def scalarOf(t: DataFrame, props: Map[String, String],
               default: String = ""): DataFrame = {
    // min(), not first(): deterministic under any partitioning/ordering, so
    // results hash-compare cleanly; for single-valued properties (the
    // reference's case) it IS the single result.
    val aggs = props.toSeq.sortBy(_._2).map { case (p, as) =>
      coalesce(min(when(col("p") === p, col("o"))), lit(default)).as(as)
    }
    t.groupBy(col("s")).agg(aggs.head, aggs.tail: _*)
  }

  /** Named-graph scoping (P12): tag each graph with its name and union;
    * `fromGraph` is then an ordinary pushable filter.
    */
  def dataset(graphs: (String, DataFrame)*): DataFrame =
    graphs.map { case (name, df) => df.withColumn("g", lit(name)) }
      .reduce(_ unionByName _)
}
