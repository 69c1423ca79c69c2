package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions with full codegen — the (b)-tier of the
  * custom-operator preference order (compose built-ins > native
  * `Expression` with `doGenCode` > UDF): the generated Java runs inside
  * WholeStageCodegen with no UDF boundary, no boxing of the row, and
  * proper null handling in-line.
  *
  * [[InetAtonExpr]] is the reference's INET_ATON
  * (BuiltInFunctionDefinitions.java string pack; runtime
  * RT/functions/scalar/ inet family) as a codegen'd expression; it is
  * registered as `inet_aton_native` through [[graft.GraftExtensions]]
  * (SparkSessionExtensions.injectFunction) — the extension-point route a
  * deployment would use to add the whole graft function pack without
  * touching session internals.
  */
object InetAtonUtil {

  /** Dotted-quad → unsigned-int value; null for malformed input (wrong
    * arity, non-digits, octet > 255) — shared by interpreted eval and the
    * generated code so the two paths cannot diverge. */
  def parse(s: UTF8String): java.lang.Long = {
    if (s == null) return null
    val str = s.toString
    var acc = 0L
    var octet = 0L
    var digits = 0
    var octets = 0
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if (c == '.') {
        if (digits == 0 || octet > 255 || octets == 3) return null
        acc = (acc << 8) | octet
        octet = 0; digits = 0; octets += 1
      } else if (c >= '0' && c <= '9') {
        octet = octet * 10 + (c - '0')
        digits += 1
        if (digits > 3) return null
      } else return null
      i += 1
    }
    if (digits == 0 || octet > 255 || octets != 3) return null
    java.lang.Long.valueOf((acc << 8) | octet)
  }
}

case class InetAtonExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"inet_aton_native requires STRING, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "inet_aton_native"

  override def nullSafeEval(input: Any): Any =
    InetAtonUtil.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("inetVal")
      s"""
         |java.lang.Long $r = graft.functions.InetAtonUtil.parse($c);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): InetAtonExpr =
    copy(child = newChild)
}
