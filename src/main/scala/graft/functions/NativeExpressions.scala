package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StringType}
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

/** Float-array dot products as native codegen expressions.
  *
  * Spark's higher-order functions (`zip_with`/`aggregate`) are
  * CodegenFallback: every element evaluates a lambda tree interpreted, with
  * per-element boxing — measured ~10× slower than a fused loop on 64-dim
  * embeddings. These run the whole loop in one JIT-compiled method inside
  * WholeStageCodegen. Semantics are identical to the HOF forms they replace
  * (graft.operators.VectorOps): a null array, length mismatch, or null
  * element yields null.
  *
  * [[DotFixedExpr]] is the exact, partitioning-independent fixed-point dot
  * (floor(x·y·1e12) summed in long arithmetic — see VectorOps' exactness
  * contract); [[DotDoubleExpr]] is the cheap IEEE-double prefilter form.
  * Reference: VECTOR_SEARCH scoring,
  * StreamExecVectorSearchTableFunction.java:55.
  */
object VectorNativeUtil {

  private val Scale = 1e12

  def dotFixed(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var sum = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      sum += math.floor(
        a.getFloat(i).toDouble * b.getFloat(i).toDouble * Scale).toLong
      i += 1
    }
    java.lang.Double.valueOf(sum.toDouble / Scale)
  }

  def dotDouble(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      sum += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(sum)
  }
}

abstract class DotProductBase extends BinaryExpression {

  protected def utilMethod: String

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<FLOAT> inputs, got " +
          s"${l.simpleString}, ${r.simpleString}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dotVal")
      s"""
         |java.lang.Double $r =
         |  graft.functions.VectorNativeUtil.$utilMethod($a, $b);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r.doubleValue();
         |}
       """.stripMargin
    })
}

case class DotFixedExpr(left: Expression, right: Expression)
    extends DotProductBase {
  override protected def utilMethod: String = "dotFixed"
  override def prettyName: String = "dot_fixed_native"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorNativeUtil.dotFixed(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotFixedExpr =
    copy(left = newLeft, right = newRight)
}

case class DotDoubleExpr(left: Expression, right: Expression)
    extends DotProductBase {
  override protected def utilMethod: String = "dotDouble"
  override def prettyName: String = "dot_double_native"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorNativeUtil.dotDouble(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotDoubleExpr =
    copy(left = newLeft, right = newRight)
}
