package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity wrapper that REPORTS itself non-deterministic so the
  * optimizer computes the wrapped expression exactly once.
  *
  * Why: Catalyst's filter-pushdown substitutes a projected alias into
  * any filter above it and pushes the substituted predicate into the
  * join below — so `project(co = size(array_intersect(a, b)));
  * filter(f(co))` becomes a post-join condition that re-evaluates the
  * intersection, PLUS the original projection for survivors: the
  * expensive array op runs twice per surviving row (round-2 plan audit,
  * dd_ngram_pairs steps 51–53). `PushPredicateThroughNonJoin` and
  * `CollapseProject` both require every projected field to be
  * deterministic, so this wrapper pins the projection in place: the
  * wrapped expression is evaluated once per input row, and the filter
  * reads the materialized attribute.
  *
  * The child MUST actually be deterministic (the flag is a plan barrier,
  * not a semantics change) — retries and speculative tasks recompute the
  * same value.
  */
case class EvalOnce(child: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(child)
  override lazy val deterministic: Boolean = false
  override def foldable: Boolean = false
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = child.dataType

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override def prettyName: String = "eval_once"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): EvalOnce =
    copy(child = newChildren.head)
}

object EvalOnce {
  def apply(c: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      EvalOnce(org.apache.spark.sql.GraftExpressionBridge.expression(c)))
}
