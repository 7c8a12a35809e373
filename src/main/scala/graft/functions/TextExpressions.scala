package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst string expressions for the text-normalization pass
  * (t63). Spark ships no Unicode-normalization SQL function, and a Scala
  * UDF would force a serialize/boxing hop per row in a scan-bound pass —
  * so NFC normalization is a codegen'd `UnaryExpression` instead, the
  * same preference order the ANN scorers follow
  * ([[VectorBinaryExpression]]).
  *
  * Determinism: `java.text.Normalizer` implements Unicode Normalization
  * Form C as specified by UAX #15 — a pure function of the input string.
  * DuckDB's `nfc_normalize` implements the same standard, so the oracle
  * comparison is exact (NormalizeSpec plants decomposed sequences to pin
  * the non-identity cases; the synthetic corpus itself is ASCII, where
  * NFC is the identity).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), java.text.Normalizer.Form.NFC))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Registration + Column API, mirroring [[Vectors]]. */
object TextFns {
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "nfc_normalize" -> (es => NfcNormalize(es(0))))

  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }

  def nfc(c: Column): Column = call_function("nfc_normalize", c)
}
