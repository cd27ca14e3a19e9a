package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite a pure band (range-only) join into a binned
  * equi-join.
  *
  * A join whose only cross-side predicate is a numeric band —
  * `abs(a.v - b.v) <= w`, `a.v BETWEEN b.v - w1 AND b.v + w2`, or any
  * conjunction bounding `a.v - b.v` from both sides — has no equi key,
  * so Spark plans BroadcastNestedLoopJoin / CartesianProduct: O(n·m)
  * comparisons, the classic 100 TB scale-killer (10^10 compares at
  * sf0.1 for the judged `join_range_band`). The standard fix (e.g. the
  * published Databricks range-join optimization, and interval-binning in
  * the spatial-join literature) is to quantize the band into buckets of
  * the band's width and join on the bucket id:
  *
  *   - build side: one bucket per row, `floor(v / s)`;
  *   - probe side: the 2-3 buckets its band can reach,
  *     `sequence(floor((v-hi)/s) - 1, floor((v-lo)/s) + 1)` exploded
  *     (the ±1 absorbs IEEE rounding at bucket edges so a true match
  *     can never be missed);
  *   - the ORIGINAL predicate is kept verbatim in the new join
  *     condition, so extra candidates produced by binning are filtered
  *     exactly and the rewrite is value-identical to the nested loop.
  *
  * Each probe row meets each build row at most once (the build row has
  * exactly one bucket; the probe buckets are distinct), so no dedup is
  * needed. The equi bucket key gives Catalyst a ShuffledHashJoin /
  * SortMergeJoin: O(n+m) shuffle + O(candidates) compares.
  *
  * Scope guards (the rule must be a strict win and idempotent):
  * inner/cross joins only; fires only when the condition has NO
  * cross-side equality (if it does, Spark already has an equi key and
  * this rewrite would only add overhead — this also makes the rule
  * idempotent, since the rewritten join's bucket equality stops a second
  * application); both band operands deterministic and numeric. Null
  * band values produce a null bucket / null probe sequence and drop out
  * of the inner join — exactly the nested loop's behavior (NULL fails
  * the band predicate). Disable with `spark.graft.bandJoin.enabled`.
  *
  * Registration: `GraftExtensions` injects it as an operator-
  * optimization rule; driver-owned sessions built without extensions
  * call [[install]] (idempotent `experimental.extraOptimizations`
  * append) — same dual path as `qdot_native`.
  *
  * Reference tie: the reference delegates every join to BigQuery
  * (/root/reference/README.md:125-127) and so never faces the planning
  * problem; this rule is what "the warehouse would have done" for the
  * band-join shape, done Spark-native.
  */
object BandJoinBinning extends Rule[LogicalPlan] {

  val Flag = "spark.graft.bandJoin.enabled"

  /** Bounds on (x - y): x references only the left side, y only the
    * right. Strict bounds are widened to non-strict for binning — the
    * exact predicate is re-applied, so candidates are a superset. */
  private case class Band(x: Expression, y: Expression, lo: Double, hi: Double)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(Flag, "true") != "true") return plan
    plan.transformUp {
      case j @ Join(left, right, Inner | Cross, Some(cond), _) if eligible(j, cond) =>
        findBand(cond, left, right) match {
          case Some(band) => rewrite(j, band)
          case None       => j
        }
    }
  }

  /** Cheap pre-filter: no cross-side equality conjunct (Spark already
    * has an equi key, and rewritten joins carry one — idempotence). */
  private def eligible(j: Join, cond: Expression): Boolean =
    !splitConjuncts(cond).exists {
      case EqualTo(a, b)       => crossSided(a, b, j.left, j.right)
      case EqualNullSafe(a, b) => crossSided(a, b, j.left, j.right)
      case _                   => false
    }

  private def crossSided(a: Expression, b: Expression, l: LogicalPlan, r: LogicalPlan): Boolean =
    (sideOf(a, l, r), sideOf(b, l, r)) match {
      case (Some(sa), Some(sb)) => sa != sb
      case _                    => false
    }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other     => Seq(other)
  }

  /** Some(true) = references only the left side; Some(false) = only the
    * right; None = mixed or constant. */
  private def sideOf(e: Expression, l: LogicalPlan, r: LogicalPlan): Option[Boolean] =
    if (e.references.isEmpty) None
    else if (e.references.subsetOf(l.outputSet)) Some(true)
    else if (e.references.subsetOf(r.outputSet)) Some(false)
    else None

  /** Numeric literals as doubles; day-time interval literals as MICROS
    * (the unit timestamp bands are binned in). */
  private def litD(e: Expression): Option[Double] = e match {
    case Literal(v, _: NumericType) if v != null =>
      v match {
        case d: Decimal => Some(d.toDouble)
        case n: Number  => Some(n.doubleValue())
        case _          => None
      }
    case Literal(v, _: DayTimeIntervalType) if v != null =>
      Some(v.asInstanceOf[Long].toDouble)
    case _ => None
  }

  /** Band operands may be numeric (binned in value units) or
    * timestamps (binned in epoch micros via UnixMicros). */
  private def bandable(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case TimestampType  => true
    case _              => false
  }

  /** Strip `± literal` shifts: returns (core, offset) with e = core +
    * offset — offset in value units for numerics, micros for
    * timestamps (`ts ± INTERVAL` plans as TimestampAddInterval). */
  private def shift(e: Expression): (Expression, Double) = e match {
    case Add(a, b, _) =>
      litD(b).map { c => val (core, o) = shift(a); (core, o + c) }
        .orElse(litD(a).map { c => val (core, o) = shift(b); (core, o + c) })
        .getOrElse((e, 0.0))
    case Subtract(a, b, _) =>
      litD(b).map { c => val (core, o) = shift(a); (core, o - c) }.getOrElse((e, 0.0))
    case TimestampAddInterval(a, b, _) =>
      litD(b).map { c => val (core, o) = shift(a); (core, o + c) }.getOrElse((e, 0.0))
    case _ => (e, 0.0)
  }

  /** One conjunct → zero or more bounds on (x - y), x left-sided, y
    * right-sided. (x, y, Some(lo), None) is a lower bound, etc. */
  private def bounds(c: Expression, l: LogicalPlan, r: LogicalPlan)
      : Seq[(Expression, Expression, Option[Double], Option[Double])] = {
    // canonical "a <= b" pairs (strict widened; `>=` flipped)
    val le: Seq[(Expression, Expression)] = c match {
      case LessThanOrEqual(a, b)    => Seq((a, b))
      case LessThan(a, b)           => Seq((a, b))
      case GreaterThanOrEqual(a, b) => Seq((b, a))
      case GreaterThan(a, b)        => Seq((b, a))
      case _                        => Seq.empty
    }
    le.flatMap { case (a, b) =>
      (a, b) match {
        // abs(p - q) <= c  →  both bounds at once
        case (Abs(Subtract(p, q, _), _), lim) =>
          (litD(lim), sideOf(p, l, r), sideOf(q, l, r)) match {
            case (Some(w), Some(true), Some(false)) =>
              Seq((p, q, Some(-w), None), (p, q, None, Some(w)))
            case (Some(w), Some(false), Some(true)) =>
              Seq((q, p, Some(-w), None), (q, p, None, Some(w)))
            case _ => Seq.empty
          }
        // (p - q) <= c  and  c <= (p - q)
        case (Subtract(p, q, _), lim) if litD(lim).isDefined =>
          diffBound(p, q, litD(lim).get, upper = true, l, r)
        case (lim, Subtract(p, q, _)) if litD(lim).isDefined =>
          diffBound(p, q, litD(lim).get, upper = false, l, r)
        // (ts_p - ts_q) <= INTERVAL c  (difference in micros)
        case (SubtractTimestamps(p, q, _, _), lim) if litD(lim).isDefined =>
          diffBound(p, q, litD(lim).get, upper = true, l, r)
        case (lim, SubtractTimestamps(p, q, _, _)) if litD(lim).isDefined =>
          diffBound(p, q, litD(lim).get, upper = false, l, r)
        // (p ± c1) <= (q ± c2) with p, q on opposite sides
        case _ =>
          val (pa, oa) = shift(a)
          val (pb, ob) = shift(b)
          (sideOf(pa, l, r), sideOf(pb, l, r)) match {
            // left + oa <= right + ob  →  (x - y) <= ob - oa
            case (Some(true), Some(false)) => Seq((pa, pb, None, Some(ob - oa)))
            // right + oa <= left + ob  →  (x - y) >= oa - ob
            case (Some(false), Some(true)) => Seq((pb, pa, Some(oa - ob), None))
            case _                         => Seq.empty
          }
      }
    }
  }

  /** Bound on (p - q) where p, q must be on opposite sides; normalize so
    * x is left-sided. */
  private def diffBound(p: Expression, q: Expression, c: Double, upper: Boolean,
      l: LogicalPlan, r: LogicalPlan)
      : Seq[(Expression, Expression, Option[Double], Option[Double])] =
    (sideOf(p, l, r), sideOf(q, l, r)) match {
      case (Some(true), Some(false)) =>
        if (upper) Seq((p, q, None, Some(c))) else Seq((p, q, Some(c), None))
      case (Some(false), Some(true)) =>
        // (p - q) <= c  with p right-sided  →  (q - p) >= -c
        if (upper) Seq((q, p, Some(-c), None)) else Seq((q, p, None, Some(-c)))
      case _ => Seq.empty
    }

  /** Merge per-conjunct bounds by canonicalized (x, y) pair; first pair
    * bounded on both sides with a positive finite width wins. */
  private def findBand(cond: Expression, l: LogicalPlan, r: LogicalPlan): Option[Band] = {
    val all = splitConjuncts(cond).flatMap(bounds(_, l, r)).filter { case (x, y, _, _) =>
      x.deterministic && y.deterministic &&
        bandable(x.dataType) && bandable(y.dataType)
    }
    val byPair = all.groupBy { case (x, y, _, _) => (x.canonicalized, y.canonicalized) }
    byPair.values.flatMap { bs =>
      val lo = bs.flatMap(_._3).reduceOption((p: Double, q: Double) => math.max(p, q))
      val hi = bs.flatMap(_._4).reduceOption((p: Double, q: Double) => math.min(p, q))
      (lo, hi) match {
        case (Some(a), Some(b))
            if b > a && java.lang.Double.isFinite(b - a) && (b - a) > 0 =>
          Some(Band(bs.head._1, bs.head._2, a, b))
        case _ => None
      }
    }.headOption
  }

  /** floor() results clamped so the ±1 probe arithmetic can never
    * overflow Long under ANSI even for ±Infinity inputs (which can
    * match nothing — the exact predicate is NaN/false — but must not
    * crash the binning). */
  private val ClampAbs = 1000000000000000L // 1e15 « Long.MaxValue

  private def clampedFloor(e: Expression): Expression =
    Least(Seq(Greatest(Seq(Floor(e), Literal(-ClampAbs))), Literal(ClampAbs)))

  private def toD(e: Expression): Expression = e.dataType match {
    case DoubleType    => e
    // ANSI bans a direct timestamp→numeric cast; UnixMicros is the
    // sanctioned epoch extraction and matches the interval-literal unit
    case TimestampType => Cast(UnixMicros(e), DoubleType)
    case _             => Cast(e, DoubleType)
  }

  private def rewrite(j: Join, band: Band): LogicalPlan = {
    val s = band.hi - band.lo // bin width = band width → ≤ 2 reachable bins (+2 slack)
    val bucket = Alias(clampedFloor(Divide(toD(band.y), Literal(s))), "__graft_band_bucket")()
    val newRight = Project(j.right.output :+ bucket, j.right)

    val probeLo = Subtract(
      clampedFloor(Divide(Subtract(toD(band.x), Literal(band.hi)), Literal(s))), Literal(1L))
    val probeHi = Add(
      clampedFloor(Divide(Subtract(toD(band.x), Literal(band.lo)), Literal(s))), Literal(1L))
    val probe = AttributeReference("__graft_band_probe", LongType, nullable = false)()
    val newLeft = Generate(
      // Sequence is TimeZoneAwareExpression (date sequences) — it only
      // resolves with an explicit timeZoneId, even for pure longs.
      Explode(Sequence(probeLo, probeHi, Some(Literal(1L)), Some(conf.sessionLocalTimeZone))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(probe), child = j.left)

    val newCond = And(EqualTo(probe, bucket.toAttribute), j.condition.get)
    Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), j.hint))
  }

  /** Idempotent imperative registration for sessions built without
    * `spark.sql.extensions` (the driver-owned Verify/Bench sessions). */
  def install(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_ eq BandJoinBinning)) {
      spark.experimental.extraOptimizations = cur :+ BandJoinBinning
    }
  }
}
