package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
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

  /** Register both expressions on an existing session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("nfd_slug",
      (args: Seq[Expression]) => NfdSlugExpr(Cast(args.head, StringType)),
      "scala_udf")
    reg.createOrReplaceTempFunction("round_half_up_exact",
      (args: Seq[Expression]) => RoundHalfUpExactExpr(Cast(args.head, DoubleType)),
      "scala_udf")
  }
}
