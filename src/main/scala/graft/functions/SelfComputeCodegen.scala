package graft.functions

import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

/** Shared `doGenCode` for the native unary expressions: the generated
  * code calls `compute` on this instance (installed as a codegen
  * reference object). One virtual call per row, but the surrounding
  * projection stays inside WholeStageCodegen — unlike CodegenFallback,
  * which forces the whole subtree into interpreted evaluation and
  * splits the codegen span (asserted in PlanShapeSpec). Each mixer
  * declares its own `def compute(in): out`; the generated Java resolves
  * the call against the concrete class.
  */
trait SelfComputeCodegen extends UnaryExpression {

  /** True when `compute` may return null on NON-null input (e.g. "no
    * signature computable") — adds the isNull re-check the plain
    * nullSafeCodeGen contract does not perform.
    */
  protected def computeMayReturnNull: Boolean = false

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftExpr", this, getClass.getName)
    nullSafeCodeGen(ctx, ev, in =>
      if (computeMayReturnNull)
        s"""${ev.value} = $ref.compute($in);
           |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin
      else s"${ev.value} = $ref.compute($in);")
  }
}
