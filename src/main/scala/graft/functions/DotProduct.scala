package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `graft_dot(a, b)`: dense dot product of two double arrays as a
  * native Catalyst expression with whole-stage codegen — the preferred
  * shape for a hot scalar kernel (brief: native `Expression` with
  * `doGenCode` beats a Scala UDF beats everything else). The
  * higher-order-function spelling `aggregate(zip_with(a, b, *), 0, +)`
  * evaluates interpreted lambdas per ELEMENT (two allocations + four
  * function calls per component); this compiles to one fused
  * primitive-double loop per ROW. Used by the ANN verify stages
  * (p08/p09/p14), where millions of candidate pairs × 64 components
  * make the per-element overhead the dominant cost.
  *
  * Both inputs must be non-null arrays of non-null doubles (embedding
  * vectors); lengths are clamped to the shorter input.
  */
final case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // ExpectsInputTypes is unavailable outside the sql package in
  // Spark 4 (AbstractDataType is private[sql]); check directly.
  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(e => e.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = DoubleType

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
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

object DotProduct {
  /** Register `graft_dot` on the session. Idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot",
      { children: Seq[Expression] =>
        if (children.length != 2)
          throw new IllegalArgumentException("graft_dot expects 2 arguments")
        DotProduct(children.head, children(1))
      },
      "built-in")
}
