package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Catalyst extension (SURVEY.md §7.4): rewrite the declarative float-vector
  * dot product
  *
  *   aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)),
  *             0.0d, (acc, v) -> acc + v)
  *
  * into the compiled kernel call [[graft.functions.HashKernels.dotFF]] —
  * same sequential-order IEEE sum, but one static call per row inside
  * whole-stage codegen instead of per-element interpreted lambda dispatch
  * (measured ~10× on 64-dim vectors). Users keep writing the declarative
  * form; the optimizer swaps in the kernel. Registered through
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
object KernelizeDotProduct extends Rule[LogicalPlan] {
  private val kernelClass: Class[_] = Class.forName("graft.functions.HashKernels")

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  /** Nullable-element inputs route to the null-checking kernel variant: a
    * null element must null the whole aggregate (the null product poisons
    * `acc + v`), which the unchecked primitive loop would silently read as
    * a number. */
  private def mayContainNull(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _                          => true
  }

  /** The lambda body `double(x)` — a cast of exactly the lambda variable. */
  private def castOf(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case c: Cast => c.dataType == DoubleType && (c.child match {
      case x: NamedLambdaVariable => x.exprId == v.exprId
      case _                      => false
    })
    case _ => false
  }

  private def sameVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case x: NamedLambdaVariable => x.exprId == v.exprId
    case _                      => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case agg: ArrayAggregate if matches(agg) =>
      val zw = agg.argument.asInstanceOf[ZipWith]
      val method =
        if (mayContainNull(zw.left) || mayContainNull(zw.right)) "dotFFChecked" else "dotFF"
      StaticInvoke(
        kernelClass,
        DoubleType,
        method,
        Seq(zw.left, zw.right),
        inputTypes = Nil,
        propagateNull = true,
        // null on length mismatch, matching zip_with's null-pad + `acc +
        // null` semantics in the declarative form this replaces
        returnNullable = true
      )
  }

  private def matches(agg: ArrayAggregate): Boolean = agg.argument match {
    case zw: ZipWith if isFloatArray(zw.left) && isFloatArray(zw.right) =>
      val productLambda = zw.function match {
        case LambdaFunction(m: Multiply, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
          (castOf(m.left, x) && castOf(m.right, y)) || (castOf(m.left, y) && castOf(m.right, x))
        case _ => false
      }
      val zeroLiteral = agg.zero match {
        case Literal(0.0, DoubleType) => true
        case _                        => false
      }
      val sumLambda = agg.merge match {
        case LambdaFunction(a: Add, Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _) =>
          (sameVar(a.left, acc) && sameVar(a.right, v)) || (sameVar(a.left, v) && sameVar(a.right, acc))
        case _ => false
      }
      val identityFinish = agg.finish match {
        case LambdaFunction(body, Seq(arg: NamedLambdaVariable), _) => sameVar(body, arg)
        case _                                                      => false
      }
      productLambda && zeroLiteral && sumLambda && identityFinish
    case _ => false
  }
}

/** Entry point for `spark.sql.extensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => KernelizeDotProduct)
}
