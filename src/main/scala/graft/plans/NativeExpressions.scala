package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Cosine similarity as a first-class Catalyst expression with
  * `doGenCode`: whole-stage codegen inlines the accumulation loop
  * directly into the generated stage (no static-call indirection), and
  * the interpreted path (`nullSafeEval`) delegates to the same kernel,
  * so both paths produce bit-identical values — sequential
  * accumulation order, parity with double-precision SQL oracles.
  *
  * Inputs must be array<double>; the `graft_cosine` SQL registration
  * and `functions.cosineSim` insert the cast, so array<float>
  * embedding columns work directly at both surfaces.
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_cosine"

  override def foldable: Boolean = children.forall(_.foldable)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |double $na = 0.0;
         |double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.getDouble($i);
         |  double $y = $b.getDouble($i);
         |  $dot += $x * $y;
         |  $na += $x * $x;
         |  $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Unicode normalization (NFC / NFKC / NFD / NFKD) as a native Catalyst
  * expression — the canonicalization pass every multilingual corpus
  * needs before hashing or dedup (combining sequences vs precomposed
  * characters, full-width forms, ligatures all hash differently until
  * normalized). Backed by `java.text.Normalizer`, which implements the
  * Unicode standard algorithm — results match any conformant engine
  * (DuckDB's `nfc_normalize`, ICU, Python's unicodedata), so SQL
  * oracles replay it exactly.
  *
  * The form is a constructor parameter (not a child expression): it
  * selects the algorithm at plan time, and `doGenCode` emits a direct
  * `Normalizer.normalize(..., Form.NFC)` call inside whole-stage
  * codegen — no per-row form dispatch. Map-only, no shuffle, already-
  * normalized text passes through with one scan (the normalizer's
  * quick-check path). */
case class UnicodeNormalize(child: Expression, form: String)
  extends UnaryExpression {

  require(Set("NFC", "NFKC", "NFD", "NFKD")(form),
    s"form must be one of NFC/NFKC/NFD/NFKD, got $form")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_unicode_normalize"

  override def foldable: Boolean = child.foldable

  override protected def nullSafeEval(s: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.valueOf(form)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($c.toString(),
         |    java.text.Normalizer.Form.$form));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
