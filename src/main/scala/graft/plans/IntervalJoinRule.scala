package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType, TimestampType}

/** Optimizer rule: rewrite a naive point-in-interval band join
  *
  *   `p JOIN i ON [keys =] AND p.ts >= i.start AND p.ts < i.end`
  *
  * — which Catalyst can only execute as a (per-key) nested loop —
  * into the bucketed plan of [[graft.operators.IntervalJoin]]: the
  * interval side explodes to the grid buckets it covers, the join
  * becomes an equi-join on (keys, bucket), and the ORIGINAL condition
  * re-applies as a filter. Complements [[RangeJoinRule]] (the
  * fixed-width symmetric `abs(l − r) <= d` shape); here the width
  * varies per interval, so the interval side explodes instead of the
  * probe side.
  *
  * Correctness: `p >= s ⇒ bucket(p) >= bucket(s)` and
  * `p < e ⇒ bucket(p) <= bucket(e)` (cast-to-double and floor are
  * monotone), so the bucket equi-join is a superset of the band
  * matches and the re-applied original condition restores exactness.
  * Inverted/empty/null intervals are pre-filtered (`s < e`), matching
  * the band's own emptiness; a matched pair shares exactly one
  * bucket — the point's — so no dedup is needed.
  *
  * Scope: INNER joins whose condition splits into one lower bound
  * (`p >= s` or `p > s`), one upper bound (`p < e` or `p <= e`) on
  * the SAME point expression, with the point referencing one child
  * only and both bounds the other. By DEFAULT only pure-band
  * conditions rewrite — those are the nested-loop disasters. When
  * equality conjuncts are ALSO present, Spark already plans a hash
  * join on them with the band as a residual, which usually beats the
  * explode (measured: rewriting q56's pushed-down sun-up band filter
  * turned a broadcast join into an exploded shuffle); set
  * `spark.graft.intervalJoin.rewriteEquiJoins=true` to opt in when
  * per-key groups are large enough that the residual goes quadratic
  * (the equalities then join alongside the bucket). Any non-equality
  * extra conjunct → no rewrite. Bucket width (same axis units;
  * seconds for timestamps) comes from
  * `spark.graft.intervalJoin.bucket` (default 86400) — size it near
  * the typical interval width.
  */
object IntervalJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val BucketConfKey = "spark.graft.intervalJoin.bucket"
  val RewriteEquiConfKey = "spark.graft.intervalJoin.rewriteEquiJoins"

  /** Hard ceiling on how many grid buckets a single interval may
    * explode to (default 65536; `<= 0` disables the cap). Intervals
    * wider than the cap — open-ended sentinels like `9999-12-31`
    * would otherwise materialize ~3M-element arrays PER ROW and OOM —
    * route through a naive-join fallback branch instead: a second
    * Union child whose join keeps the original band (wrapped in
    * [[PredicateBarrier]] so the rule is convergent) and broadcasts
    * the wide-interval side. Wide intervals are few by construction
    * (they are the pathology, not the workload), and with AQE the
    * empty-broadcast case collapses the fallback branch without ever
    * scanning the point side.
    */
  val MaxBucketsConfKey = "spark.graft.intervalJoin.maxBucketsPerInterval"

  private def sideOf(e: Expression, left: LogicalPlan, right: LogicalPlan): Option[Boolean] =
    if (e.references.subsetOf(left.outputSet)) Some(true)
    else if (e.references.subsetOf(right.outputSet)) Some(false)
    else None

  private def axisType(e: Expression): Boolean =
    e.dataType.isInstanceOf[NumericType] || e.dataType == TimestampType

  /** (point, bound) if `c` lower-bounds some expression. */
  private def lowerOf(c: Expression): Seq[(Expression, Expression)] = c match {
    case GreaterThanOrEqual(p, s) => Seq((p, s))
    case GreaterThan(p, s) => Seq((p, s))
    case LessThanOrEqual(s, p) => Seq((p, s))
    case LessThan(s, p) => Seq((p, s))
    case _ => Nil
  }

  /** (point, bound) if `c` upper-bounds some expression. */
  private def upperOf(c: Expression): Seq[(Expression, Expression)] = c match {
    case LessThan(p, e) => Seq((p, e))
    case LessThanOrEqual(p, e) => Seq((p, e))
    case GreaterThan(e, p) => Seq((p, e))
    case GreaterThanOrEqual(e, p) => Seq((p, e))
    case _ => Nil
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      tryRewrite(left, right, cond, hint).getOrElse(j)
  }

  private def tryRewrite(
      left: LogicalPlan,
      right: LogicalPlan,
      cond: Expression,
      hint: JoinHint
  ): Option[LogicalPlan] = {
    // Idempotency under FIXED-POINT batches (the GraftExtensions
    // deploy path runs this rule alongside PushPredicateThroughJoin,
    // which folds our re-applied band filter back into the join
    // condition): a child already carrying the rule's synthetic
    // attributes IS our own output mid-optimization — rewriting it
    // again would stack a new Generate every iteration up to
    // maxIterations. The final Project strips `__ij_*`, so finished
    // rewrites compose fine with outer joins.
    if ((left.output.iterator ++ right.output.iterator)
        .exists(_.name.startsWith("__ij_"))) return None
    val conjuncts = splitConjunctivePredicates(cond)
    if (conjuncts.length < 2) return None
    // a barrier conjunct marks our own naive-fallback branch (and the
    // operator's) — never rewrite it
    if (conjuncts.exists(_.exists(_.isInstanceOf[PredicateBarrier]))) return None
    val d = try {
      org.apache.spark.sql.internal.SQLConf.get
        .getConfString(BucketConfKey, "86400").toDouble
    } catch { case _: NumberFormatException => return None }
    if (!(d > 0.0)) return None

    // find a (lower, upper) conjunct pair on the same point expression
    // with consistent sides; everything else must be two-sided equality
    val idx = conjuncts.indices
    val pairs = for {
      li <- idx; ui <- idx if li != ui
      (p1, s) <- lowerOf(conjuncts(li))
      (p2, e) <- upperOf(conjuncts(ui))
      if p1.semanticEquals(p2) && axisType(p1) && axisType(s) && axisType(e)
      pSide <- sideOf(p1, left, right)
      sSide <- sideOf(s, left, right)
      eSide <- sideOf(e, left, right)
      if sSide == eSide && sSide != pSide
    } yield (li, ui, p1, s, e, pSide)
    val (li, ui, p, s, e, pointOnLeft) = pairs.headOption.getOrElse(return None)

    val rest = idx.filterNot(i => i == li || i == ui).map(conjuncts)
    if (rest.nonEmpty &&
        !org.apache.spark.sql.internal.SQLConf.get
          .getConfString(RewriteEquiConfKey, "false").toBoolean) return None
    val equis = rest.map {
      case eq @ EqualTo(a, b) =>
        (sideOf(a, left, right), sideOf(b, left, right)) match {
          case (Some(x), Some(y)) if x != y => eq
          case _ => return None
        }
      case _ => return None
    }

    def bucketOf(ex: Expression): Expression =
      Cast(Floor(Divide(Cast(ex, DoubleType), Literal(d))), LongType)

    val maxBuckets = try {
      org.apache.spark.sql.internal.SQLConf.get
        .getConfString(MaxBucketsConfKey, "65536").toLong
    } catch { case _: NumberFormatException => return None }

    val (pointChild, intervalChild) =
      if (pointOnLeft) (left, right) else (right, left)
    val pb = Alias(bucketOf(p), "__ij_pb")()
    val pointB = Project(pointChild.output :+ pb, pointChild)
    val bs = Alias(bucketOf(s), "__ij_bs")()
    val be = Alias(bucketOf(e), "__ij_be")()
    // s <= e pre-filter: inverted/null intervals match nothing in the
    // band, and it keeps Sequence ascending (it would otherwise
    // DESCEND for stop < start and manufacture wrong candidates).
    // NOT strict: an s == e interval still matches p == s when BOTH
    // bounds are inclusive — the re-applied original condition sorts
    // out strict-bound emptiness.
    val validIv = LessThanOrEqual(s, e)
    // explode-cap split: narrow intervals take the bucketed plan, wide
    // ones (span > cap buckets) the naive fallback below
    val narrowIvFilter =
      if (maxBuckets > 0)
        And(validIv, LessThanOrEqual(
          Subtract(bucketOf(e), bucketOf(s)), Literal(maxBuckets)))
      else validIv
    val intervalB = Project(intervalChild.output ++ Seq(bs, be),
      Filter(narrowIvFilter, intervalChild))
    val candAttr = AttributeReference("__ij_cand", LongType, nullable = true)()
    // Sequence is TimeZoneAwareExpression: without an explicit zone it
    // stays unresolved even on LONG bounds, and a post-resolution rule
    // must emit resolved nodes
    val seq = new Sequence(bs.toAttribute, be.toAttribute, Some(Literal(1L)))
      .withTimeZone(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
    val gen = Generate(
      Explode(seq),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(candAttr), child = intervalB)
    val newCond = (EqualTo(pb.toAttribute, candAttr) +: equis)
      .reduce[Expression](And(_, _))
    val joined =
      if (pointOnLeft) Join(pointB, gen, Inner, Some(newCond), hint)
      else Join(gen, pointB, Inner, Some(newCond), hint)
    val narrow = Project(left.output ++ right.output, Filter(cond, joined))
    if (maxBuckets <= 0) return Some(narrow)

    // Naive fallback for intervals wider than the cap: the original
    // join, restricted to the wide slice, band bounds behind a
    // PredicateBarrier (the matcher — this rule on the NEXT fixed-point
    // iteration — sees two opaque conjuncts and bails, so the rewrite
    // converges; equality conjuncts stay bare so Spark still hash-joins
    // on them with the band as residual). The wide side carries a
    // broadcast hint: wide intervals are the rare pathology, and an
    // empty broadcast lets AQE collapse the branch without scanning the
    // point side at all.
    val wideIvFilter = And(validIv,
      GreaterThan(Subtract(bucketOf(e), bucketOf(s)), Literal(maxBuckets)))
    val wideIv = Filter(wideIvFilter, intervalChild)
    val barrierCond = (equis ++ Seq(
      PredicateBarrier(conjuncts(li)), PredicateBarrier(conjuncts(ui))))
      .reduce[Expression](And(_, _))
    val bHint = Some(HintInfo(strategy = Some(BROADCAST)))
    val wide =
      if (pointOnLeft)
        Project(left.output ++ right.output,
          Join(left, wideIv, Inner, Some(barrierCond),
            JoinHint(hint.leftHint, hint.rightHint.orElse(bHint))))
      else
        Project(left.output ++ right.output,
          Join(wideIv, right, Inner, Some(barrierCond),
            JoinHint(hint.leftHint.orElse(bHint), hint.rightHint)))
    Some(Union(Seq(narrow, wide)))
  }
}
