package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: naive interval-overlap theta join → bucketized
  * equi-join, EXACT semantics (the declarative complement of
  * `operators/RangeJoin.intervalOverlap` — same algorithm, applied by
  * the PLANNER so the user writes the naive join).
  *
  * After predicate pushdown a query like
  *
  * {{{  l.join(r).filter(l("s") <= r("e") && r("s") <= l("e"))  }}}
  *
  * reaches the optimizer as `Join(l, r, Inner, Some(overlap))` with no
  * equi conjunct — which Spark can only execute as a Cartesian product
  * with a post-filter: O(|l|·|r|) comparisons, the plan shape that
  * simply does not terminate at 100 TB. This rule rewrites it to
  *
  *  - Generate(explode(sequence(⌊s/w⌋, max(⌊s/w⌋, ⌊e/w⌋)))) per side —
  *    each interval replicates into its covered buckets,
  *  - an EQUI join on the bucket id (hashable, partitionable, AQE-able),
  *  - the original predicate re-applied, plus the canonical-bucket
  *    condition `bucket = ⌊max(ls, rs)/w⌋`, which makes every true pair
  *    emit from exactly ONE bucket — no distinct over the pair set.
  *
  * Exactness: for a pair passing the overlap predicate, the canonical
  * bucket c = ⌊max(ls,rs)/w⌋ is covered by both sides (if max is ls: c
  * is left's own start bucket, and ls ≤ re bounds it inside right's
  * span, symmetric otherwise — the `max(lo, hi)` upper end keeps even
  * degenerate e < s intervals covering their start bucket, matching
  * the theta semantics of the naive filter on such rows).
  *
  * Fire conditions (conservative — anything else is left untouched):
  * the join is Inner/Cross, both overlap bounds are bare LongType
  * attributes (epoch micros — the layout every graft interval op uses),
  * no other conjunct equi-joins the two sides (then the hash join was
  * fine already), and `spark.graft.rangeJoin.bucketWidth` is set > 0.
  * The bucket width is the scale knob: near the typical interval
  * length, replication stays ~2× while each bucket's population drops
  * by the corpus-to-bucket ratio.
  *
  * Install per session (`spark.experimental.extraOptimizations`) or by
  * configuration via [[graft.GraftExtensions]].
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  val WidthKey = "spark.graft.rangeJoin.bucketWidth"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = conf.getConfString(WidthKey, "0").toLong
    if (width <= 0) return plan
    plan.transformUp {
      case j @ Join(l, r, Inner | Cross, Some(cond), hint) =>
        rewrite(j, l, r, cond, width).getOrElse(j)
    }
  }

  /** (ls ≤ re, rs ≤ le) as (leftStart, leftEnd, rightStart, rightEnd)
    * if `c` is one of the two overlap conjuncts in either written order. */
  private def overlapSides(c: Expression, l: LogicalPlan, r: LogicalPlan)
      : Option[(Attribute, Attribute, Boolean)] = c match {
    case LessThanOrEqual(a: AttributeReference, b: AttributeReference) =>
      sides(a, b, l, r)
    case GreaterThanOrEqual(a: AttributeReference, b: AttributeReference) =>
      sides(b, a, l, r)
    case _ => None
  }

  /** lo ≤ hi with lo/hi on opposite sides → (lo, hi, loIsLeft). */
  private def sides(lo: Attribute, hi: Attribute, l: LogicalPlan,
      r: LogicalPlan): Option[(Attribute, Attribute, Boolean)] =
    if (lo.dataType != LongType || hi.dataType != LongType) None
    else if (l.outputSet.contains(lo) && r.outputSet.contains(hi))
      Some((lo, hi, true))
    else if (r.outputSet.contains(lo) && l.outputSet.contains(hi))
      Some((lo, hi, false))
    else None

  private def rewrite(j: Join, l: LogicalPlan, r: LogicalPlan,
      cond: Expression, width: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjuncts(cond)
    // an existing cross-side equi conjunct means the hash join already
    // works — replicating into buckets would only add cost
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        (a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet)) ||
          (a.references.subsetOf(r.outputSet) && b.references.subsetOf(l.outputSet))
      case _ => false
    }
    if (hasEqui) return None
    // find ls <= re and rs <= le among the conjuncts
    val overlaps = conjuncts.flatMap(c => overlapSides(c, l, r).map(c -> _))
    val fromLeft = overlaps.collectFirst { case (c, (lo, hi, true)) => (c, lo, hi) }
    val fromRight = overlaps.collectFirst { case (c, (lo, hi, false)) => (c, lo, hi) }
    (fromLeft, fromRight) match {
      case (Some((_, ls, re)), Some((_, rs, le))) =>
        val bucketOf = (x: Expression) =>
          Floor(Divide(Cast(x, DoubleType), Literal(width.toDouble)))
        // Sequence is TimeZoneAwareExpression: post-analysis construction
        // must pin the zone itself or the plan goes back to unresolved
        def cover(s: Attribute, e: Attribute): Expression =
          new Sequence(bucketOf(s),
            Greatest(Seq(bucketOf(s), bucketOf(e))), None,
            Some(conf.sessionLocalTimeZone))
        val bl = AttributeReference("__bucket_l", LongType)()
        val br = AttributeReference("__bucket_r", LongType)()
        val genL = Generate(Explode(cover(ls, le)), Nil, outer = false,
          qualifier = None, generatorOutput = Seq(bl), child = l)
        val genR = Generate(Explode(cover(rs, re)), Nil, outer = false,
          qualifier = None, generatorOutput = Seq(br), child = r)
        val equiJoin = Join(genL, genR, Inner, Some(EqualTo(bl, br)), j.hint)
        val canonical = EqualTo(bl, bucketOf(Greatest(Seq(ls, rs))))
        val rewritten = Filter((conjuncts :+ canonical).reduce(And), equiJoin)
        logInfo(s"RangeJoinRewrite: theta overlap join → bucket equi-join " +
          s"(width=$width, bounds=($ls,$le)x($rs,$re))")
        Some(Project(j.output, rewritten))
      case _ => None
    }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }
}
