package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native expression (SURVEY §7.4 risk 5:
  * Vietnamese keywords arrive in mixed composed/decomposed forms; join
  * keys and classifier lookups must agree on one canonical form).
  *
  * Spark has no built-in normalizer; a Scala UDF would break codegen and
  * null semantics. This expression keeps whole-stage codegen via a
  * static-method call. */
case class NormalizeUnicode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc"

  override def nullSafeEval(input: Any): Any =
    NormalizeUnicode.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NormalizeUnicode.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeUnicode {

  /** Static entry point shared by the interpreted and codegen paths. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Column-API entry point. */
  def nfcCol(c: Column): Column =
    GraftBridge.column(NormalizeUnicode(GraftBridge.expression(c)))
}
