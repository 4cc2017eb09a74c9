package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the engine's two hot scalar paths.
  *
  * Both were Scala UDFs first; a native `Expression` with `doGenCode`
  * removes the ScalaUDF eval wrapper (closure call, null-boxing,
  * try/catch per row) and keeps the operator inside the surrounding
  * whole-stage-codegen span. The generated code calls a static JVM
  * helper — same technique Spark's own regexp/json expressions use.
  */
case class StripDiacritics(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "strip_diacritics"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      graft.functions.Text.stripDiacritics(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.Text.stripDiacritics($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): StripDiacritics =
    copy(child = newChild)
}

/** 64-bit SimHash of a token array (see operators.Dedup.simhash — one
  * ±1 vote per bit per token occurrence; occurrence-weighting equals the
  * grouped-weight formulation). */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Static helper invoked from generated code; operates directly on the
    * columnar ArrayData, no Seq materialization. */
  def compute(tokens: ArrayData): Long = {
    val votes = new Array[Long](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = graft.operators.Dedup.fnv64(tokens.getUTF8String(i).toString)
        var bit = 0
        while (bit < 64) {
          if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
          bit += 1
        }
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) { if (votes(bit) >= 0) out |= (1L << bit); bit += 1 }
    out
  }
}

/** Column builders + SQL registration for the native expressions. */
object NativeFunctions {

  def stripDiacritics(c: Column): Column =
    Bridge.column(StripDiacritics(Bridge.expression(c)))

  def simhash64(c: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(c)))

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[StripDiacritics].getName, null, name, usage, "")

  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("strip_diacritics"),
      info("strip_diacritics", "strip_diacritics(str) - NFD-fold and drop combining marks"),
      (children: Seq[Expression]) => StripDiacritics(children.head)),
    (FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(array<string>) - 64-bit SimHash fingerprint"),
      (children: Seq[Expression]) => SimHash64(children.head)),
  )

  /** Idempotent per-session SQL registration (`SELECT strip_diacritics(x)`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    registrations.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}

/** SparkSessionExtensions hook: `--conf spark.sql.extensions=
  * graft.plans.GraftExtensions` injects the native functions into every
  * session built against the extension point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    NativeFunctions.registrations.foreach(ext.injectFunction)
}
