package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, BooleanType, IntegerType}

/** Similarity-join planning: rewrites an inner join whose condition
  * contains a cross-side `graft_jaccard(tokens_a, tokens_b) >= t`
  * conjunct into the banded MinHash-LSH pipeline — per-side band
  * projection + posexplode, a (band, bandHash) equi self-join
  * (shuffle_hash-hinted, never a cartesian product), first-witness
  * single emission, and the ORIGINAL join condition retained as the
  * exact-verification filter. `SELECT ... FROM a JOIN b ON
  * graft_jaccard(x, y) >= 0.9 AND ...` then compiles to the same plan
  * family as `Dedup.minHashLshPairs` instead of a quadratic
  * BroadcastNestedLoop/CartesianProduct join.
  *
  * This is deliberately a LOGICAL rewrite injected through
  * `GraftExtensions`, not a physical `SparkStrategy`: the emitted
  * subtree is ordinary Project/Generate/Join/Filter, so Catalyst keeps
  * optimizing it (column pruning trims the carried payloads, pushdown
  * reaches the sources) and the planner keeps choosing physical joins,
  * AQE re-plans at runtime, and whole-stage codegen fuses the filters
  * — a custom physical operator would opt out of all of that.
  *
  * Semantics: candidate generation is banded LSH, so the rewritten
  * join returns threshold-passing pairs with recall 1-ε (a true pair
  * at j = 0.9 escapes all 24 bands with P ≈ 1.3e-8; see
  * Dedup.minHashLsh). Band shape adapts to the threshold: r = 6 in
  * the near-dup regime (t >= 0.8), wider bands below so recall holds
  * at moderate thresholds. Exact verification is the original
  * predicate itself — precision is always exact.
  *
  * The rule runs inside the operator-optimization fixed-point batch,
  * where `PushPredicateThroughJoin` re-pushes the verification filter
  * into the rewritten equi-join's condition on a later iteration; the
  * `prefixAllDiffer` witness conjunct doubles as the rewrite marker
  * that keeps the rule from firing twice.
  */
object SimilarityJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private val NumHashes = 144

  /** Below this threshold even 144 bands of one row miss a true pair
    * at j = t too often ((1-t)^144 > ~2e-7 under t = 0.1) — the join
    * is left exact (quadratic) rather than silently lossy. */
  private[plans] val MinRewriteThreshold = 0.1

  /** Rows per band by threshold: selectivity wants long bands, recall
    * at the threshold wants short ones. 24 bands of 6 give miss
    * ~1.3e-8 at j=0.9 but are useless at j=0.5 (miss ~0.68); 72 bands
    * of 2 give miss 5e-9 at j=0.5 but collapse below t ~0.42
    * ((1-t²)^72 > 1e-6); 144 bands of 1 hold miss < 1e-6 down to
    * t ~0.1 ((1-t)^144 = 2.6e-7 at t=0.1). */
  private def rowsPerBand(t: Double): Int =
    if (t >= 0.8) 6 else if (t >= 0.65) 3 else if (t >= 0.45) 2 else 1

  private def isKernel(e: Expression, name: String): Boolean = e match {
    case si: StaticInvoke =>
      si.staticObject == Kernels.getClass && si.functionName == name
    case _ => false
  }

  /** (jaccard call, threshold) from a `jaccard >= t` / `t <= jaccard` /
    * `jaccard > t` conjunct with a foldable threshold. */
  private def thresholdConjunct(e: Expression): Option[(StaticInvoke, Double)] = {
    def lit(x: Expression): Option[Double] = x match {
      case Literal(d: Double, _) => Some(d)
      case _ => None
    }
    e match {
      case GreaterThanOrEqual(j: StaticInvoke, l) if isKernel(j, "jaccard") =>
        lit(l).map((j, _))
      case GreaterThan(j: StaticInvoke, l) if isKernel(j, "jaccard") =>
        lit(l).map((j, _))
      case LessThanOrEqual(l, j: StaticInvoke) if isKernel(j, "jaccard") =>
        lit(l).map((j, _))
      case LessThan(l, j: StaticInvoke) if isKernel(j, "jaccard") =>
        lit(l).map((j, _))
      case _ => None
    }
  }

  // returnNullable=false: the kernel always returns a 24-slot array
  // (empty token sets hash a pseudo-element), so the optimizer doesn't
  // push an inferred IsNotNull that would re-evaluate the signature
  private def bandsOf(tokens: Expression, rpb: Int): Expression =
    StaticInvoke(Kernels.getClass, ArrayType(IntegerType, containsNull = false),
      "minHashBands", Seq(tokens, Literal(NumHashes), Literal(rpb)),
      returnNullable = false)

  /** side + band projection + posexplode: returns the generate node and
    * the (bands, band, bandHash) attributes. */
  private def explodeBands(side: LogicalPlan, tokens: Expression, rpb: Int,
                           tag: String): (LogicalPlan, Attribute, Attribute, Attribute) = {
    val bandsAlias = Alias(bandsOf(tokens, rpb), s"__graft_bands_$tag")()
    val projected = Project(side.output :+ bandsAlias, side)
    val bands = bandsAlias.toAttribute
    val band = AttributeReference(s"__graft_band_$tag", IntegerType, nullable = false)()
    val bh = AttributeReference(s"__graft_bh_$tag", IntegerType, nullable = false)()
    val gen = Generate(PosExplode(bands), unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(band, bh), projected)
    (gen, bands, band, bh)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), _)
        // the witness conjunct marks an already-rewritten join (the
        // verification filter gets re-pushed into this condition)
        if !cond.exists(isKernel(_, "prefixAllDiffer")) =>
      val hit = splitConjunctivePredicates(cond).iterator
        .flatMap(thresholdConjunct)
        .flatMap { case (si, t) =>
          val Seq(fa, fb) = si.arguments
          // orient token expressions to their sides; skip conjuncts
          // whose arguments don't split cleanly across the join
          if (t < MinRewriteThreshold) None // stay exact below the recall floor
          else if (fa.references.subsetOf(left.outputSet) &&
              fb.references.subsetOf(right.outputSet)) Some((fa, fb, t))
          else if (fb.references.subsetOf(left.outputSet) &&
                   fa.references.subsetOf(right.outputSet)) Some((fb, fa, t))
          else None
        }.take(1).toSeq.headOption
      hit match {
        case Some((la, ra, t)) =>
          val rpb = rowsPerBand(t)
          val (lPlan, lBands, lBand, lBh) = explodeBands(left, la, rpb, "a")
          val (rPlan, rBands, rBand, rBh) = explodeBands(right, ra, rpb, "b")
          val equi = Join(lPlan, rPlan, Inner,
            Some(And(EqualTo(lBand, rBand), EqualTo(lBh, rBh))),
            // bucket keys are massively duplicated by design — hash
            // join streams collisions; sorting both sides buys nothing
            JoinHint(None, Some(HintInfo(strategy = Some(SHUFFLE_HASH)))))
          val witness = StaticInvoke(Kernels.getClass, BooleanType,
            "prefixAllDiffer", Seq(lBands, rBands, lBand))
          Project(j.output, Filter(And(cond, witness), equi))
        case None => j
      }
  }
}
