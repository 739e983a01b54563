package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, DayTimeIntervalType, LongType, TimestampNTZType, TimestampType}
import org.apache.spark.unsafe.types.CalendarInterval

/** Optimizer rule: rewrite a KEYLESS time-range join into the banded
  * equi-join of [[graft.ext.TimeJoin.rangeJoin]].
  *
  * A join whose only condition is a timestamp interval —
  * `r.ts >= l.ts + INTERVAL a AND r.ts < l.ts + INTERVAL b` with no
  * equi-conjunct — gives Catalyst nothing to hash or sort on, so it
  * plans as BroadcastNestedLoopJoin: every left row is checked against
  * every right row, O(|L|·|R|), the classic scale cliff. This rule
  * band-buckets the right side at width = (b − a) and explodes each
  * left row to the ≤2 bands its window intersects, then joins on band
  * EQUALITY with the original predicate kept as the exact filter —
  * same rows, but now a shuffled/broadcast HASH join whose cost is
  * true matches + adjacent-band candidates.
  *
  * Scope (deliberately narrow, falls back to the untouched join
  * otherwise): INNER joins whose condition holds exactly one lower and
  * one upper bound between one left and one right TIMESTAMP attribute
  * (each side optionally shifted by a literal interval), in any
  * operand order, plus any number of residual conjuncts — PROVIDED no
  * conjunct is already an equi-key (then Spark hash/sort-merge joins
  * fine without us). The rewrite never fires on its own output: the
  * band equality it introduces IS an equi-key.
  *
  * Registered via [[GraftExtensions]]
  * (`spark.sql.extensions=graft.plans.GraftExtensions` or
  * `SparkSession.builder.withExtensions`).
  */
object BandedRangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  /** (attr, shift in microseconds) if `e` is a timestamp attribute
    * optionally plus a SUB-DAY literal interval. Whole-day components
    * are deliberately rejected: Spark adds them zone-aware
    * (`plusDays`, so `+ INTERVAL 1 DAY` spans 23–25 h across DST
    * transitions) and a constant-microsecond band window would
    * under-cover those rows — only the fixed-duration sub-day
    * remainder is pure instant arithmetic the rewrite may rely on.
    */
  private val DayUs = 86400000000L

  /** Both Spark timestamp types are physically µs-since-epoch longs;
    * the rule must fire whichever one a source surfaces (the driver's
    * parquet writer has produced TIMESTAMP(NANOS)→LTZ-normalized AND
    * tz-less `timestamp[us]`→TIMESTAMP_NTZ across refreshes — an NTZ
    * attribute silently degrading the join to BroadcastNestedLoopJoin
    * is a scale cliff, not a type nicety).
    */
  private def isTs(t: DataType): Boolean =
    t == TimestampType || t == TimestampNTZType

  /** NTZ attrs are reinterpreted as instants under explicit UTC — a
    * linear (DST-free) µs-preserving map applied identically to both
    * sides, so band equality and window coverage carry over verbatim.
    * The original predicate is kept as the exact filter in the
    * rewritten join, so this cast only ever affects candidate
    * generation, never the final row set.
    */
  private def asInstant(a: Attribute): Expression =
    if (a.dataType == TimestampNTZType) Cast(a, TimestampType, Some("UTC")) else a

  private def decompose(e: Expression): Option[(Attribute, Long)] = e match {
    case a: Attribute if isTs(a.dataType) => Some((a, 0L))
    case TimestampAddInterval(a: Attribute, Literal(v: Long, _: DayTimeIntervalType), _)
        if isTs(a.dataType) && math.abs(v) < DayUs =>
      Some((a, v))
    case TimestampAddInterval(a: Attribute, Literal(ci: CalendarInterval, _), _)
        if isTs(a.dataType) && ci.months == 0 && ci.days == 0 &&
          math.abs(ci.microseconds) < DayUs =>
      Some((a, ci.microseconds))
    case _ => None
  }

  /** A bound `r.ts - l.ts OP v` extracted from one comparison
    * conjunct; `isLower` when OP ∈ {>=}, upper when OP ∈ {<}.
    * Strict/inclusive forms are normalized to >= / < by ±1 µs
    * (timestamps are integral microseconds).
    */
  private final case class Bound(l: Attribute, r: Attribute,
                                 micros: Long, isLower: Boolean)

  private def bound(c: Expression, left: LogicalPlan,
                    right: LogicalPlan): Option[Bound] = {
    def classify(x: (Attribute, Long), y: (Attribute, Long),
                 geq: Boolean, strict: Boolean): Option[Bound] = {
      val (ax, ox) = x
      val (ay, oy) = y
      // x OP y with OP in {>=, >, <=, <}; normalize to d = r - l
      val (lAttr, rAttr, isLower0, v0) =
        if (right.outputSet.contains(ax) && left.outputSet.contains(ay))
          (ay, ax, geq, oy - ox) // r + ox OP l + oy
        else if (left.outputSet.contains(ax) && right.outputSet.contains(ay))
          (ax, ay, !geq, ox - oy) // l + ox OP r + oy  ⇒  r (inv OP) l + (ox-oy)
        else return None
      // normalize strictness: d > v ⇔ d >= v+1 ; d <= v ⇔ d < v+1
      val v = if (strict == isLower0) v0 + 1 else v0
      Some(Bound(lAttr, rAttr, v, isLower0))
    }
    c match {
      case GreaterThanOrEqual(a, b) =>
        (decompose(a), decompose(b)) match {
          case (Some(x), Some(y)) => classify(x, y, geq = true, strict = false)
          case _ => None
        }
      case GreaterThan(a, b) =>
        (decompose(a), decompose(b)) match {
          case (Some(x), Some(y)) => classify(x, y, geq = true, strict = true)
          case _ => None
        }
      case LessThan(a, b) =>
        (decompose(a), decompose(b)) match {
          case (Some(x), Some(y)) => classify(x, y, geq = false, strict = true)
          case _ => None
        }
      case LessThanOrEqual(a, b) =>
        (decompose(a), decompose(b)) match {
          case (Some(x), Some(y)) => classify(x, y, geq = false, strict = false)
          case _ => None
        }
      case _ => None
    }
  }

  private def isEquiKey(c: Expression, left: LogicalPlan,
                        right: LogicalPlan): Boolean = c match {
    case EqualTo(a, b) => straddles(a, b, left, right)
    case EqualNullSafe(a, b) => straddles(a, b, left, right)
    case _ => false
  }

  private def straddles(a: Expression, b: Expression, left: LogicalPlan,
                        right: LogicalPlan): Boolean =
    (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
      (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))

  /** Exact integral floor-division band of a µs epoch: (µs − pmod(µs,
    * w)) ÷ w — integer arithmetic only, correct for negative epochs.
    */
  private def band(ts: Expression, width: Long): Expression = {
    val us = UnixMicros(ts)
    val w = Literal(width, LongType)
    IntegralDivide(Subtract(us, Pmod(us, w)), w)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      if (conjuncts.exists(isEquiKey(_, left, right))) j
      else {
        val bounds = conjuncts.flatMap(c => bound(c, left, right).map(c -> _))
        (bounds.find(_._2.isLower), bounds.find(!_._2.isLower)) match {
          case (Some((_, lo)), Some((_, hi)))
              if lo.l.semanticEquals(hi.l) && lo.r.semanticEquals(hi.r) &&
                hi.micros > lo.micros =>
            val width = hi.micros - lo.micros
            // TimeZoneAware expressions must carry an explicit zone —
            // built after analysis, nothing will resolve them for us
            val tz = Some(conf.sessionLocalTimeZone)
            def shifted(us: Long): Expression =
              TimestampAddInterval(asInstant(lo.l), Literal(us, DayTimeIntervalType()), tz)
            // left rows explode to every band their window intersects
            // (≤2 since width == window length); right rows band once
            val lbAttr = AttributeReference("__lband", LongType, nullable = true)()
            val withBands = Generate(
              Explode(Sequence(
                band(shifted(lo.micros), width),
                band(shifted(hi.micros - 1), width),
                None, tz)),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(lbAttr), child = left)
            val rBand = Alias(band(asInstant(hi.r), width), "__rband")()
            val rightBanded = Project(right.output :+ rBand, right)
            val newCond = And(EqualTo(lbAttr, rBand.toAttribute), cond)
            Project(j.output,
              Join(withBands, rightBanded, Inner, Some(newCond), hint))
          case _ => j
        }
      }
  }
}

/** `SparkSessionExtensions` entry point: injects
  * [[BandedRangeJoinRule]] into the operator-optimization batch and
  * registers the native kernels ([[graft.functions.Registry]]) in the
  * session FunctionRegistry, so a config-only consumer
  * (`spark.sql.extensions=graft.plans.GraftExtensions` from PySpark /
  * JDBC) gets both the plan rewrite and SQL access to `graft_dot`,
  * `graft_md5_prefix`, etc.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => BandedRangeJoinRule)
    graft.functions.Registry.all.foreach(ext.injectFunction)
  }
}
