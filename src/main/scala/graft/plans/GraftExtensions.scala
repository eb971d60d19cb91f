package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, DoubleType, LongType}

/** Optimizer rule: evaluate graft kernel calls whose arguments are all
  * literals at plan time (Catalyst's ConstantFolding skips StaticInvoke,
  * which is non-foldable by contract). A `graft_jaccard(array('a'),
  * array('a'))` in a filter becomes a literal before execution. */
object FoldGraftKernels extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case si: StaticInvoke
          if si.staticObject == Kernels.getClass && si.deterministic &&
            si.arguments.nonEmpty && si.arguments.forall(_.foldable) =>
        Literal.create(si.eval(InternalRow.empty), si.dataType)
    }
}

/** SparkSessionExtensions entry point: registers the graft kernels as
  * SQL functions so `spark.sql("SELECT graft_cosine(a, b) ...")` works
  * anywhere DataFrame code does. Enable with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` or
  * `withExtensions` on the session builder.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def staticFn(returnType: org.apache.spark.sql.types.DataType,
                       method: String)(args: Seq[Expression]): Expression =
    StaticInvoke(Kernels.getClass, returnType, method, args.toIndexedSeq)

  override def apply(ext: SparkSessionExtensions): Unit = {
    def register(name: String, builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(Kernels.getClass.getName, name),
        (exprs: Seq[Expression]) => builder(exprs)))

    // Native expression (doGenCode inlines the loop); array<float>
    // inputs are cast to array<double> here.
    register("graft_cosine", exprs => CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Cast(exprs(0),
        org.apache.spark.sql.types.ArrayType(DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Cast(exprs(1),
        org.apache.spark.sql.types.ArrayType(DoubleType))))
    register("graft_jaccard", staticFn(DoubleType, "jaccard"))
    register("graft_simhash", staticFn(LongType, "simHash"))
    register("graft_minhash", staticFn(
      org.apache.spark.sql.types.ArrayType(LongType, containsNull = false),
      "minHashSignature"))
    register("graft_revenue_e4", staticFn(LongType, "revenueE4"))
    register("graft_prefix_all_differ", staticFn(BooleanType, "prefixAllDiffer"))
    // hashing-trick classifier inference from plain SQL:
    // graft_linear_score(tokens, weights, size(weights))
    register("graft_linear_score", staticFn(DoubleType, "linearScore"))
    // graft_unicode_normalize(text, 'NFC') — the form must be a string
    // literal (it selects the algorithm at plan time)
    register("graft_unicode_normalize", exprs => UnicodeNormalize(exprs(0),
      exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(s, _) if s != null =>
          s.toString
        case other => throw new IllegalArgumentException(
          s"graft_unicode_normalize form must be a string literal, got $other")
      }))

    ext.injectOptimizerRule(_ => FoldGraftKernels)
    // Similarity-join planning: inner joins on a cross-side
    // `graft_jaccard(a, b) >= t` compile to the banded-LSH pipeline
    // (see SimilarityJoinRule) instead of a cartesian product.
    ext.injectOptimizerRule(_ => SimilarityJoinRule)
  }
}
