package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the scalar functions that would
  * otherwise be Scala UDFs (SURVEY.md §4.2 / §7.3: "Scala UDFs first,
  * promotion to codegen expressions later" — this is the promotion).
  *
  * Versus a UDF, `doGenCode` keeps the call inside whole-stage codegen:
  * no encoder round-trip per row, no lambda dispatch — the generated Java
  * calls the static helper directly on UTF8String/primitive values.
  * Registered on an existing session via [[NativeExpressions.register]];
  * usable from SQL and `call_function`.
  */
object NativeExpressions {

  /** F3 kernel, shared by interpreted eval and generated code. */
  def nfdSlug(s: UTF8String): UTF8String = {
    if (s == null) null
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFD)
        .replaceAll("\\P{InBasic_Latin}", "")
        .replace(' ', '-').replace('.', '-')
        .toLowerCase)
  }

  /** F9 kernel: exact-binary-expansion HALF_UP to 2 places
    * (new BigDecimal(double), FdpMeasure.java:89-92).
    */
  def roundHalfUpExact(d: Double): UTF8String =
    UTF8String.fromString(new java.math.BigDecimal(d)
      .setScale(2, java.math.RoundingMode.HALF_UP).toPlainString)

  // AbstractDataType (and so ExpectsInputTypes signatures) is private in
  // Spark 4's sql-api — input coercion happens via explicit Cast in the
  // registry builder instead.
  case class NfdSlugExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullSafeEval(input: Any): Any =
      nfdSlug(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.NativeExpressions.nfdSlug($c)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "nfd_slug"
  }

  case class RoundHalfUpExactExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullSafeEval(input: Any): Any =
      roundHalfUpExact(input.asInstanceOf[Double])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.NativeExpressions.roundHalfUpExact($c)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "round_half_up_exact"
  }

  /** Longest-numeric-prefix parse of an already-normalized decimal string
    * (group separators stripped, decimal separator mapped to `.`), exactly
    * reproducing `CAST(regexp_extract(s, "^(-?\d*\.?\d+|-?\d+\.?)", 1) AS
    * DOUBLE)` with NULLIF('') — including the ordered-alternation quirk
    * that a trailing dot is NOT consumed ("5." parses as "5" via the first
    * alternative) — without running a regex engine per row. The DuckDB
    * oracles evaluate the literal regex, so the scanner must match it
    * case-for-case, not DecimalFormat.
    */
  def parseNumPrefix(s: UTF8String): java.lang.Double = {
    if (s == null) return null
    val str = s.toString
    val len = str.length
    var i = 0
    if (i < len && str.charAt(i) == '-') i += 1
    val digitsStart = i
    while (i < len && str.charAt(i) >= '0' && str.charAt(i) <= '9') i += 1
    val intDigits = i - digitsStart
    // "-?\d*\.?\d+" with a dot needs >=1 digit after it.
    if (i + 1 < len && str.charAt(i) == '.' &&
        str.charAt(i + 1) >= '0' && str.charAt(i + 1) <= '9') {
      i += 1
      while (i < len && str.charAt(i) >= '0' && str.charAt(i) <= '9') i += 1
      java.lang.Double.parseDouble(str.substring(0, i))
    } else if (intDigits > 0) {
      // Digits with no usable fraction: the first alternative matches just
      // the digits (trailing lone dot excluded, like the regex).
      java.lang.Double.parseDouble(str.substring(0, i))
    } else null
  }

  /** F4 kernel: space→dash then java.net.URLEncoder (UTF-8), with a
    * zero-allocation fast path — URLEncoder leaves `[A-Za-z0-9.*_-]`
    * unchanged, so a string of only those returns AS-IS. The Column-level
    * form guarded the same fast path with an `rlike`, paying a regex per
    * key attribute per row in the cube helpers.
    */
  def urlEncode(s: UTF8String): UTF8String = {
    if (s == null) return null
    val str = s.toString
    var i = 0
    var safe = true
    while (safe && i < str.length) {
      val c = str.charAt(i)
      safe = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
        (c >= '0' && c <= '9') || c == '.' || c == '*' || c == '_' || c == '-'
      i += 1
    }
    if (safe) s
    else UTF8String.fromString(
      java.net.URLEncoder.encode(str.replace(' ', '-'), "UTF-8"))
  }

  /** X271 kernel: SPARQL §17.4.3.12 ENCODE_FOR_URI — strict RFC 3986
    * percent-encoding: unreserved `[A-Za-z0-9._~-]` pass through,
    * every other UTF-8 BYTE becomes `%XX` uppercase. Deliberately
    * distinct from [[urlEncode]], the reference's form-encoding key
    * minting (space→dash, `*` kept, `~` encoded) — that one owns the
    * `url_encode` registry name, so resolving ENCODE_FOR_URI through
    * it would silently inherit the wrong semantics. */
  def encodeForUri(s: UTF8String): UTF8String = {
    if (s == null) return null
    val str = s.toString
    def unreserved(c: Char): Boolean =
      (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
        (c >= '0' && c <= '9') || c == '.' || c == '_' || c == '~' ||
        c == '-'
    var i = 0
    var safe = true
    while (safe && i < str.length) { safe = unreserved(str.charAt(i)); i += 1 }
    if (safe) return s
    val bytes = str.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length * 3)
    var j = 0
    while (j < bytes.length) {
      val b = bytes(j) & 0xff
      if (b < 0x80 && unreserved(b.toChar)) sb.append(b.toChar)
      else {
        sb.append('%')
        sb.append(Character.toUpperCase(Character.forDigit(b >> 4, 16)))
        sb.append(Character.toUpperCase(Character.forDigit(b & 0xf, 16)))
      }
      j += 1
    }
    UTF8String.fromString(sb.toString)
  }

  case class EncodeForUriExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullSafeEval(input: Any): Any =
      encodeForUri(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.NativeExpressions.encodeForUri($c)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "encode_for_uri"
  }

  case class UrlEncodeExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullSafeEval(input: Any): Any =
      urlEncode(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.NativeExpressions.urlEncode($c)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "url_encode"
  }

  /** F7 kernel: date-shape classification → reference.data.gov.uk IRI
    * (DateDimension.java:64-78), replacing up to four rlike regexes per
    * row with one shape scan. Shapes are exactly the anchored regexes of
    * the Column form: yyyy-MM-dd → gregorian-day, yyyy-MM-ddTHH:mm:ss →
    * gregorian-interval, yyyy-MM → gregorian-month, yyyy → gregorian-year;
    * anything else → null.
    */
  def dateIri(s: UTF8String): UTF8String = {
    if (s == null) return null
    val str = s.toString
    def digits(from: Int, until: Int): Boolean = {
      var i = from
      while (i < until && str.charAt(i) >= '0' && str.charAt(i) <= '9') i += 1
      i == until
    }
    val kind = str.length match {
      case 4 if digits(0, 4) => "year"
      case 7 if digits(0, 4) && str.charAt(4) == '-' && digits(5, 7) => "month"
      case 10 if digits(0, 4) && str.charAt(4) == '-' && digits(5, 7) &&
        str.charAt(7) == '-' && digits(8, 10) => "day"
      case 19 if digits(0, 4) && str.charAt(4) == '-' && digits(5, 7) &&
        str.charAt(7) == '-' && digits(8, 10) && str.charAt(10) == 'T' &&
        digits(11, 13) && str.charAt(13) == ':' && digits(14, 16) &&
        str.charAt(16) == ':' && digits(17, 19) => "interval"
      case _ => null
    }
    if (kind == null) null
    else UTF8String.fromString(
      s"http://reference.data.gov.uk/id/gregorian-$kind/$str")
  }

  case class DateIriExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def nullSafeEval(input: Any): Any =
      dateIri(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        s"""
           |${ev.value} = graft.functions.NativeExpressions.dateIri($c);
           |if (${ev.value} == null) { ${ev.isNull} = true; }
         """.stripMargin
      })
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "date_iri"
  }

  case class ParseNumPrefixExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def nullSafeEval(input: Any): Any =
      parseNumPrefix(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        s"""
           |java.lang.Double ${ev.value}_r =
           |  graft.functions.NativeExpressions.parseNumPrefix($c);
           |if (${ev.value}_r == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = ${ev.value}_r.doubleValue(); }
         """.stripMargin
      })
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "parse_num_prefix"
  }

  /** Polynomial rolling-hash fingerprint kernel (base 31 mod 1e9+7 over
    * Unicode CODE POINTS, left to right) — the classic Rabin-Karp document
    * fingerprint. Code points, not UTF-16 code units: DuckDB's
    * string_split + ascii iterates code points, so a supplementary-plane
    * character (emoji) would otherwise hash as two surrogates here and
    * one code point there and break the oracle compare. Integer
    * arithmetic only; h*31 + c < 3.2e10 stays far inside Long.
    */
  def rollingHash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * 31 + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    h
  }

  case class RollingHashExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.LongType
    override def nullSafeEval(input: Any): Any =
      rollingHash(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.NativeExpressions.rollingHash($c)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "rolling_hash"
  }

  /** Dot-product kernel over Spark's columnar array representation; the
    * float→double per-element cast and strict left-to-right summation
    * reproduce EXACTLY the doubles of the `aggregate(zip_with(cast·cast))`
    * formulation it replaces (and of the DuckDB oracles' CAST AS DOUBLE[]
    * + list_dot_product) — ANN rank order hash-compares on them. Null
    * element or length mismatch → null, like the zip_with form (null pad →
    * null product → null sum).
    */
  // Element-kind tags for dotKernel (compile-time constants in the
  // generated code, so the per-element switch is branch-predicted away).
  final val ElemDouble = 0
  final val ElemFloat = 1
  final val ElemLong = 2
  final val ElemInt = 3

  def dotKernel(a: ArrayData, b: ArrayData,
                aKind: Int, bKind: Int): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = aKind match {
        case ElemDouble => a.getDouble(i)
        case ElemFloat => a.getFloat(i).toDouble
        case ElemLong => a.getLong(i).toDouble
        case _ => a.getInt(i).toDouble
      }
      val y = bKind match {
        case ElemDouble => b.getDouble(i)
        case ElemFloat => b.getFloat(i).toDouble
        case ElemLong => b.getLong(i).toDouble
        case _ => b.getInt(i).toDouble
      }
      s += x * y
      i += 1
    }
    s
  }

  /** Codegen'd dot product of two float/double arrays. The HOF form
    * (`aggregate(zip_with(...))`) is a codegen fallback that pays
    * interpreted lambda dispatch per element — this is the §7.3 promotion
    * for every cosine hot path (kNN scoring, LSH bucketing, IVF
    * assignment, near-dup verify).
    */
  case class DotProductExpr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    // Length mismatch / null element → null even when both inputs are
    // non-nullable; without this override the non-nullable codegen branch
    // has no isNull slot to set.
    override def nullable: Boolean = true
    // Any integral/float/double element type is read natively (the kernel
    // widens per element exactly like the old aggregate(zip_with(
    // cast·cast)) form) — SQL callers with array<int>/array<bigint> work
    // without an array-copying Cast, and the float hot paths (kNN, LSH,
    // IVF, near-dup verify) stay zero-copy. Decimal/string arrays need an
    // explicit cast.
    private def kindOf(e: Expression): Option[Int] = e.dataType match {
      case ArrayType(DoubleType, _) => Some(NativeExpressions.ElemDouble)
      case ArrayType(FloatType, _) => Some(NativeExpressions.ElemFloat)
      case ArrayType(LongType, _) => Some(NativeExpressions.ElemLong)
      case ArrayType(IntegerType, _) => Some(NativeExpressions.ElemInt)
      case _ => None
    }
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      if (Seq(left, right).forall(kindOf(_).isDefined))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<int|bigint|float|double> arguments " +
          s"(cast decimals explicitly), " +
          s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }
    override def nullSafeEval(a: Any, b: Any): Any =
      dotKernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
        kindOf(left).get, kindOf(right).get)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        s"""
           |java.lang.Double ${ev.value}_r = graft.functions.NativeExpressions.dotKernel(
           |  $a, $b, ${kindOf(left).get}, ${kindOf(right).get});
           |if (${ev.value}_r == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = ${ev.value}_r.doubleValue(); }
         """.stripMargin
      })
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
    override def prettyName: String = "graft_dot"
  }

  /** Backward-ASOF probe kernel: index of the LAST entry of a
    * (_t, _v)-sorted struct array with _t <= ts, by binary search —
    * O(log n) per probe where the `filter(...) + element_at(-1)` HOF
    * form is O(n). On a power-law key whose packed timeline holds a
    * constant fraction of the corpus, that difference is the whole
    * operator: the ScaleProbe zipf run measured the HOF form 16-19×
    * slower than uniform at 10× scale, quadratic in the hot key.
    * Because the array is sorted by (_t, _v) with null _v lowest, the
    * last entry of an equal-_t run is the greatest value — the same tie
    * rule the HOF form and asofJoinBackward implement.
    */
  def asofProbeIdx(tl: ArrayData, ts: Long): Int = {
    var lo = 0
    var hi = tl.numElements() - 1
    var ans = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (tl.getStruct(mid, 2).getLong(0) <= ts) { ans = mid; lo = mid + 1 }
      else hi = mid - 1
    }
    ans
  }

  /** Codegen'd binary-search ASOF probe over a packed
    * array<struct<_t: bigint, _v: T>> timeline (any value type T).
    * Returns the _v of the latest at-or-before entry; null when no entry
    * qualifies or the matched value is null.
    */
  case class AsofProbeExpr(left: Expression, right: Expression)
      extends BinaryExpression {
    private def valueType: DataType = left.dataType match {
      case ArrayType(s: org.apache.spark.sql.types.StructType, _)
        if s.length == 2 => s.fields(1).dataType
      case _ => org.apache.spark.sql.types.NullType
    }
    override def dataType: DataType = valueType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      left.dataType match {
        case ArrayType(s: org.apache.spark.sql.types.StructType, _)
          if s.length == 2 && s.fields.head.dataType == LongType &&
            right.dataType == LongType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case _ =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires (array<struct<bigint, T>>, bigint), got " +
              s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
      }
    override def nullSafeEval(tlAny: Any, tsAny: Any): Any = {
      val tl = tlAny.asInstanceOf[ArrayData]
      val idx = asofProbeIdx(tl, tsAny.asInstanceOf[Long])
      if (idx < 0) null
      else {
        val row = tl.getStruct(idx, 2)
        if (row.isNullAt(1)) null else row.get(1, valueType)
      }
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (tl, ts) => {
        val idx = ctx.freshName("asofIdx")
        val row = ctx.freshName("asofRow")
        val getV = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
          .getValue(row, valueType, "1")
        s"""
           |int $idx = graft.functions.NativeExpressions.asofProbeIdx($tl, $ts);
           |if ($idx < 0) { ${ev.isNull} = true; }
           |else {
           |  org.apache.spark.sql.catalyst.InternalRow $row = $tl.getStruct($idx, 2);
           |  if ($row.isNullAt(1)) { ${ev.isNull} = true; }
           |  else { ${ev.value} = $getV; }
           |}
         """.stripMargin
      })
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
    override def prettyName: String = "asof_probe"
  }

  /** The (name, builder) table shared by [[register]] (imperative, on an
    * existing session) and [[inject]] (SparkSessionExtensions, for
    * `spark.sql.extensions`-configured deployments).
    */
  private def builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "nfd_slug" -> (args => NfdSlugExpr(Cast(args.head, StringType))),
    "round_half_up_exact" ->
      (args => RoundHalfUpExactExpr(Cast(args.head, DoubleType))),
    // No explicit Cast on graft_dot (unlike the string functions):
    // DotProductExpr reads int/bigint/float/double arrays natively, so
    // wrapping a Cast would only add an array copy to the hot paths.
    "graft_dot" -> (args => DotProductExpr(args(0), args(1))),
    // No Cast wrapper: the analyzer-visible type check rejects anything
    // but (array<struct<bigint,T>>, bigint) with a clear message.
    "asof_probe" -> (args => AsofProbeExpr(args(0), args(1))),
    "parse_num_prefix" -> (args => ParseNumPrefixExpr(Cast(args.head, StringType))),
    "url_encode" -> (args => UrlEncodeExpr(Cast(args.head, StringType))),
    "encode_for_uri" ->
      (args => EncodeForUriExpr(Cast(args.head, StringType))),
    "date_iri" -> (args => DateIriExpr(Cast(args.head, StringType))),
    "rolling_hash" -> (args => RollingHashExpr(Cast(args.head, StringType))),
    // nt_parse(line, 'skolemPrefix'): the N-Triples/N-Quads statement
    // kernel (graft.rdf.NtParse). The prefix must be a string literal —
    // it is folded into the generated code once, not evaluated per row.
    "nt_parse" -> (args => {
      require(args.length == 2,
        s"nt_parse takes (line, 'skolemPrefix'), got ${args.length} args")
      val prefix = args(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(u: UTF8String, StringType) =>
          u.toString
        case other => sys.error(
          s"nt_parse skolem prefix must be a string literal, got $other")
      }
      graft.rdf.NtParse.NtParseExpr(Cast(args.head, StringType), prefix)
    }))

  /** SparkSessionExtensions injection — lets a cluster deployment enable
    * every native function with
    * `--conf spark.sql.extensions=graft.GraftExtensions` instead of a
    * code-level register() call.
    */
  def inject(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    builders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.NativeExpressions", name), builder))
    }

  /** Register all expressions on an existing session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }
}
