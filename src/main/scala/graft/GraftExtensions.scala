package graft

import graft.functions.{DotDoubleExpr, DotFixedExpr, InetAtonExpr}
import graft.sources.ProtobufLite.{PbDecodeExpr, PbEncodeExpr}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point (`spark.sql.extensions=
  * graft.GraftExtensions`): injects graft's NATIVE Catalyst expressions
  * into the function registry at session build time — the deployment
  * route for extending Spark without touching session internals (the
  * analog of the reference's module/function-catalog registration in
  * BuiltInFunctionDefinitions.java).
  *
  * UDF-backed functions register separately via
  * [[graft.functions.GraftFunctions.registerAll]]; only full codegen
  * expressions belong here.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("inet_aton_native"),
      new ExpressionInfo(classOf[InetAtonExpr].getName, "inet_aton_native"),
      (children: Seq[Expression]) => InetAtonExpr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("dot_fixed_native"),
      new ExpressionInfo(classOf[DotFixedExpr].getName, "dot_fixed_native"),
      (children: Seq[Expression]) =>
        DotFixedExpr(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("dot_double_native"),
      new ExpressionInfo(classOf[DotDoubleExpr].getName, "dot_double_native"),
      (children: Seq[Expression]) =>
        DotDoubleExpr(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("pb_decode"),
      new ExpressionInfo(classOf[PbDecodeExpr].getName, "pb_decode"),
      (children: Seq[Expression]) =>
        PbDecodeExpr(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("pb_encode"),
      new ExpressionInfo(classOf[PbEncodeExpr].getName, "pb_encode"),
      (children: Seq[Expression]) =>
        PbEncodeExpr(children(0), children(1))))
  }
}
