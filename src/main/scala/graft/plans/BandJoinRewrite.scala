package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrites a band-only theta join
  *
  *   A JOIN B ON abs(A.t − B.t) <= w          -- no equi conjunct
  *
  * into a grid-bucketed EQUI join — the same floor(t/w) decomposition
  * the engine's RangeJoin operator applies by hand, applied
  * automatically wherever a user writes the declarative predicate.
  * Without it Catalyst can only plan the band as a
  * BroadcastNestedLoopJoin (every left row against every right row —
  * O(|A|·|B|) comparisons); with it:
  *
  *   - B projects its bucket  rb = floor(t/w),
  *   - A explodes onto {lb−1, lb, lb+1} (|Δt| <= w ⇒ bucket distance
  *     <= 1, and the three values are distinct so a pair can match on
  *     at most ONE bucket — no dedup needed),
  *   - the join becomes  lb' = rb  AND  <original predicate>,
  *
  * which plans as a shuffled equi join: work collapses from |A|·|B| to
  * Σ_bucket |A_b|·|B_b| — the band join's inherent output scale. Joins
  * that already carry an equi conjunct are left alone (Catalyst
  * hash-joins those on the keys and evaluates the band as a post-join
  * filter; adding a bucket there would only multiply rows), which also
  * makes the rewrite self-stabilizing: its own output contains a
  * bucket equality, so the fixed-point batch never refires on it.
  *
  * Scope guards: INNER joins, deterministic non-decimal numeric band
  * sides, a positive foldable width. NULL band values produce NULL
  * buckets, which match nothing — exactly the rows the original NULL
  * predicate dropped.
  *
  * Bucket arithmetic is LOSSLESS by construction: integral band sides
  * with an integral width bucket through pure integer floor-division
  * ((e − pmod(e, w)) div w — exact at every long magnitude), because a
  * double round-trip is lossy above 2^53 and could place two in-band
  * longs more than one bucket apart, silently dropping pairs the
  * original nested-loop plan would return. Only float/double sides (and
  * small integrals under a fractional width — values ≤ 2^31 are exact
  * in doubles) take the floor(t/w) double path; a LongType side with a
  * fractional width is NOT rewritten (no lossless bucket exists).
  */
object BandJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** true → only-left refs, false → only-right, None → mixed/neither. */
  private def sideOf(e: Expression, l: LogicalPlan, r: LogicalPlan): Option[Boolean] =
    if (e.references.isEmpty) None
    else if (e.references.subsetOf(l.outputSet)) Some(true)
    else if (e.references.subsetOf(r.outputSet)) Some(false)
    else None

  private def bandable(e: Expression): Boolean = e.deterministic && (e.dataType match {
    case ShortType | IntegerType | LongType | FloatType | DoubleType => true
    case _ => false
  })

  private def widthOf(lit: Literal): Option[Double] = lit.value match {
    case n: java.lang.Number => Some(n.doubleValue())
    case _ => None
  }

  /** Matches abs(a − b) <= w (either comparison direction) with a and
    * b on opposite sides; returns (leftExpr, rightExpr, width).
    */
  private def asBand(p: Expression, l: LogicalPlan, r: LogicalPlan): Option[(Expression, Expression, Double)] = {
    def orient(a: Expression, b: Expression, w: Double) =
      (sideOf(a, l, r), sideOf(b, l, r)) match {
        case (Some(true), Some(false)) => Some((a, b, w))
        case (Some(false), Some(true)) => Some((b, a, w))
        case _ => None
      }
    p match {
      case LessThanOrEqual(Abs(Subtract(a, b, _), _), lit: Literal)
          if bandable(a) && bandable(b) =>
        widthOf(lit).filter(_ > 0).flatMap(orient(a, b, _))
      case GreaterThanOrEqual(lit: Literal, Abs(Subtract(a, b, _), _))
          if bandable(a) && bandable(b) =>
        widthOf(lit).filter(_ > 0).flatMap(orient(a, b, _))
      case _ => None
    }
  }

  private def integralSides(lt: Expression, rt: Expression): Boolean =
    Seq(lt, rt).forall(_.dataType match {
      case ShortType | IntegerType | LongType => true
      case _ => false
    })

  private def integralWidth(w: Double): Boolean =
    w == math.floor(w) && w >= 1 && w <= Long.MaxValue.toDouble

  /** A LongType band side under a fractional width has no lossless
    * bucket (doubles are exact only to 2^53) — leave the join alone.
    */
  private def lossyLongBucket(lt: Expression, rt: Expression, w: Double): Boolean =
    Seq(lt, rt).exists(_.dataType == LongType) && !integralWidth(w)

  private def isEqui(p: Expression, l: LogicalPlan, r: LogicalPlan): Boolean = p match {
    case EqualTo(a, b) =>
      (sideOf(a, l, r), sideOf(b, l, r)) match {
        case (Some(x), Some(y)) => x != y
        case _ => false
      }
    case EqualNullSafe(a, b) =>
      (sideOf(a, l, r), sideOf(b, l, r)) match {
        case (Some(x), Some(y)) => x != y
        case _ => false
      }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      if (conjuncts.exists(isEqui(_, left, right))) j
      else conjuncts.iterator.map(asBand(_, left, right)).collectFirst { case Some(b) => b } match {
        case Some((lt, rt, w)) if !lossyLongBucket(lt, rt, w) =>
          val wLit = Literal(w, DoubleType)
          val intPath = integralSides(lt, rt) && integralWidth(w)
          def bucket(e: Expression): Expression =
            if (intPath) {
              // exact integer floor-division at EVERY long magnitude:
              // trunc-divide, then correct negative remainders
              // ((-7) div 2 = -3, rem -1 → -4 = floor(-3.5)). The
              // earlier e − pmod(e, w) form wrapped below Long.MinValue
              // for values within w of it (non-ANSI Subtract overflows
              // silently → wrong bucket → dropped in-band pairs); here
              // a correction only fires when |q| ≤ |e|/w < |Long.Min|,
              // so q − 1 can never overflow (w = 1 ⇒ rem = 0 ⇒ no
              // correction).
              val wL = Literal(w.toLong, LongType)
              val el = Cast(e, LongType)
              val q = IntegralDivide(el, wL)
              If(LessThan(Remainder(el, wL), Literal(0L)),
                Subtract(q, Literal(1L)), q)
            } else Cast(Floor(Divide(Cast(e, DoubleType), wLit)), LongType)
          val rb = Alias(bucket(rt), "__graft_band_rb")()
          val rightP = Project(right.output :+ rb, right)
          val lb = bucket(lt)
          val arr = CreateArray(Seq(
            Subtract(lb, Literal(1L)), lb, Add(lb, Literal(1L))))
          val genOut = AttributeReference("__graft_band_lb", LongType, nullable = true)()
          val leftG = Generate(Explode(arr), Nil, outer = false, None, Seq(genOut), left)
          val bucketed =
            Join(leftG, rightP, Inner, Some(And(EqualTo(genOut, rb.toAttribute), cond)), hint)
          Project(j.output, bucketed)
        case _ => j // no band conjunct, or a long side no bucket can hold
      }
  }
}
