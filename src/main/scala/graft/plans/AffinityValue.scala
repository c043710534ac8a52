package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Pass-through marker for affinity column values. Attribute metadata
  * identifies affinity columns only while they are attributes — once
  * the optimizer pushes a predicate through the scan projection, the
  * attribute is substituted by the canonicalization expression and the
  * metadata is gone. This wrapper travels WITH the expression through
  * that substitution, so [[AffinityOrdering]] can still recognize
  * affinity operands in pushed-down comparisons. Identity at runtime:
  * eval and codegen delegate to the child (stays in whole-stage
  * codegen).
  */
final case class AffinityValue(child: Expression, affinity: String)
    extends UnaryExpression {

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => c)

  override protected def withNewChildInternal(newChild: Expression): AffinityValue =
    copy(child = newChild)

  override def sql: String = child.sql
}
