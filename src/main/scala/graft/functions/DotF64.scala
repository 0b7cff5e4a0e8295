package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product over two `array<double>` columns — a codegen'd
  * Catalyst expression replacing `aggregate(zip_with(a, b, _*_), ...)`,
  * which materializes THREE intermediate arrays per row (the zip, the
  * cast copies, the fold closure frames): at 4M crossJoin pairs × 64
  * dims that is gigabytes of garbage and dominates the exact-kNN ops.
  * The loop accumulates left-to-right in double — bit-identical to the
  * higher-order-function form and to the DuckDB oracle's
  * `list_dot_product(CAST(.. AS DOUBLE[]), ..)`.
  *
  * The reference's equivalent is its SIMD `@fastmath` dot kernels
  * (/root/reference/src/dist/vecs.jl:62-66, /root/reference/src/dist/cos.jl:78-85);
  * whole-stage codegen plays the role of `@simd`.
  */
case class DotF64(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotF64 =
    copy(left = l, right = r)
}

object DotF64 {
  /** Column form; casts inputs to array<double> (the cast projects on
    * the JOIN INPUTS, once per source row, not per pair).
    */
  def dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotF64(
      GraftSqlBridge.expression(a.cast("array<double>")),
      GraftSqlBridge.expression(b.cast("array<double>"))))

  /** Expose to SQL as `graft_dot(a, b)` (function-registry surface). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotF64(exprs.head, exprs(1)), "built-in")
}
