package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.DataType

/** Runtime error with the reference's provenance contract
  * (`failed @ Model.field: Op: msg`,
  * /root/reference/wrangle_pypes/pipeline.py:128-135). */
class GraftRuntimeException(msg: String, cause: Throwable)
  extends RuntimeException(msg, cause)

/** Pass-through expression that rethrows any runtime failure of `child`
  * with a `failed @ Model.field: Op` prefix — the FailFast twin of the
  * Permissive `_errors` provenance. Without it, a bad ANSI cast three
  * operators deep surfaces as a bare Spark exception with no hint of
  * which model field was being built.
  *
  * Codegen wraps the child's generated block in a try/catch, so the
  * field stays inside whole-stage codegen (a CodegenFallback here would
  * de-codegen EVERY FailFast wrangle projection — the default mode's hot
  * path). Already-contextualized errors pass through unchanged, so
  * nesting never double-wraps.
  *
  * [[graft.exec.Wrangle]] elides this wrapper for expression trees that
  * cannot throw (pure column plumbing — see `Wrangle.canThrow`), keeping
  * filter pushdown through wrangled fields intact: a filter on a wrapped
  * column is opaque to data-source filter translation.
  */
case class WithErrorContext(child: Expression, context: String)
    extends UnaryExpression {

  override def dataType: DataType = child.dataType
  override def prettyName: String = "with_error_context"

  override def eval(input: InternalRow): Any =
    try child.eval(input)
    catch {
      case e: GraftRuntimeException => throw e
      case scala.util.control.NonFatal(e) =>
        throw new GraftRuntimeException(s"$context: ${e.getMessage}", e)
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val ctxRef = ctx.addReferenceObj("graftErrCtx", context, "java.lang.String")
    val exCls = classOf[GraftRuntimeException].getName
    ev.copy(code =
      code"""
        boolean ${ev.isNull} = true;
        ${CodeGenerator.javaType(dataType)} ${ev.value} = ${CodeGenerator.defaultValue(dataType)};
        try {
          ${childGen.code}
          ${ev.isNull} = ${childGen.isNull};
          ${ev.value} = ${childGen.value};
        } catch ($exCls __graftCtxEx) {
          throw __graftCtxEx;
        } catch (Exception __graftEx) {
          throw new $exCls($ctxRef + ": " + __graftEx.getMessage(), __graftEx);
        }""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
