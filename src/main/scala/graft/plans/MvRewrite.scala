package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Coalesce, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** AUTOMATIC MATERIALIZED-VIEW REWRITE (aggregate navigation) — the
  * engine-side role Redshift's AutoMV plays for the reference's warehouse
  * (SURVEY §4; the reference's own reporting surface is exactly this
  * shape — `test_etl.ipynb` cells 8/11/14/17/20 are `select count(*)`
  * validation aggregates re-issued against the loaded star on every run,
  * which Redshift answers from maintained metadata/summaries rather than
  * fact re-scans): a registered summary table answers any
  * aggregate the summary's grain and measures can serve, INCLUDING coarser
  * grains (group-cols ⊆ the MV's group-cols — the monoid re-merge), and
  * the rewrite is invisible to the query author.
  *
  * Mechanics: [[MvRewriteRule]] is injected through the PUBLIC
  * `SparkSessionExtensions.injectOptimizerRule` hook (the (c) tier of the
  * custom-operator ladder, SURVEY §7.4), so it runs INSIDE Catalyst's
  * operator-optimization fixpoint: after column pruning has shaped the
  * plan, before physical planning. A match requires
  *  - the aggregate's child to strip (through pass-through Projects /
  *    SubqueryAliases) to the REGISTERED source shape — a scan matched by
  *    root path (not table name, so any read of the same parquet
  *    matches), or an inner single-key equi-join of two registered scans
  *    (the star-join reporting shape — the served plan then contains NO
  *    join at all); deterministic Filters over GRAIN columns strip too
  *    and are re-applied to the summary (they select whole groups, so
  *    they commute with the merge), and for join sources the optimizer's
  *    implied join-key isnotnulls are absorbed;
  *  - every grouping expression to be a bare source column within the
  *    MV's grain;
  *  - every aggregate to be a merge the MV's measures can serve:
  *    count(constant) → coalesce(sum(cnt),0), sum(col) → sum(sum_col),
  *    min(col) → min(min_col), max(col) → max(max_col) — the four
  *    distributive monoids; no DISTINCT, no FILTER clauses.
  * The rewrite substitutes a fresh instance of the MV relation
  * (`newInstance()`, so a self-join of two rewritten aggregates can never
  * collide on attribute ids) and re-keys every output alias to the
  * ORIGINAL exprIds, so parent operators never notice the swap. Running
  * inside the fixpoint makes it idempotent for free: the MV's own path is
  * not a registered source, so a rewritten aggregate never re-matches, and
  * the same fixpoint re-prunes the new scan's columns.
  *
  * Registration ([[MvCatalog.withMv]]) is scoped and session-keyed
  * (weakly, [[graft.SessionConf]]'s registry discipline): an empty
  * registry short-circuits the rule to a no-op, so sessions that never
  * register an MV pay nothing. Staleness is the write-once discipline's
  * problem, already solved: the MV parquet is fingerprint-chained to its
  * source dir, so a regenerated source rebuilds the MV before any
  * registration can serve it.
  *
  * At 100 TB this is the difference between a reporting query re-scanning
  * the fact (minutes, the full scan) and merging a few thousand summary
  * rows (milliseconds) — and because the serve-side re-aggregation is the
  * same monoid merge the MV build used, correctness is gated the strongest
  * way available: the driver's oracle computes the SAME query over the RAW
  * table in DuckDB and hash-compares. */
object MvCatalog {

  /** How a serve-side aggregate merges one MV measure column. */
  sealed trait Merge
  /** count(constant) at source → sum of the stored per-group row count. */
  case object CntRows extends Merge
  final case class SumOf(src: String) extends Merge
  final case class MinOf(src: String) extends Merge
  final case class MaxOf(src: String) extends Merge

  /** What the MV summarizes — the plan shape a query's aggregate child
    * must strip to. */
  sealed trait MvSource
  /** A single parquet scan, matched by normalized root path. */
  final case class ScanSource(path: String) extends MvSource
  /** An INNER single-key equi-join of two scans (either written order) —
    * the star-join reporting shape. The optimizer's implied
    * `isnotnull(joinKey)` predicates are absorbed: the MV's rows were
    * built through the same inner join and already satisfy them. */
  final case class JoinSource(aPath: String, bPath: String,
      keyA: String, keyB: String) extends MvSource

  /** @param source    the summarized plan shape (scan or star join)
    * @param groupCols the MV's grain (serves any subset grain)
    * @param measures  mv column name → the merge algebra it carries
    * @param mv        analyzed relation of the MV parquet (instantiated
    *                  fresh per rewrite) */
  final case class MvDef(
      source: MvSource,
      groupCols: Set[String],
      measures: Map[String, Merge],
      mv: LogicalRelation)

  private val regs = new java.util.WeakHashMap[SparkSession, List[MvDef]]()

  def defs(s: SparkSession): List[MvDef] =
    regs.synchronized { Option(regs.get(s)).getOrElse(Nil) }

  /** Scoped registration — the only way in, so a registration can never
    * outlive its query builder (SessionConf's try/finally discipline). */
  def withMv[T](s: SparkSession, d: MvDef)(body: => T): T = {
    regs.synchronized { regs.put(s, d :: defs(s)) }
    try body
    finally regs.synchronized {
      defs(s).filterNot(_ eq d) match {
        case Nil  => regs.remove(s)
        case rest => regs.put(s, rest)
      }
    }
  }
}

class MvRewriteRule(session: SparkSession) extends Rule[LogicalPlan] {
  import MvCatalog._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val ds = defs(session)
    if (ds.isEmpty) plan
    else plan.transformDown {
      case agg: Aggregate =>
        ds.view.flatMap(rewrite(agg, _)).headOption.getOrElse(agg)
    }
  }

  /** Strip pass-through shapes the optimizer inserts (pruning projects,
    * view aliases), collecting any Filter conditions met on the way — a
    * predicate over GRAIN columns selects whole MV groups, so it commutes
    * with the merge and can be served from the summary too (checked in
    * [[rewrite]]). Returns the first non-pass-through node + the conds. */
  private def strip(p: LogicalPlan): (LogicalPlan, Seq[Expression]) = p match {
    case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      strip(c)
    case SubqueryAlias(_, c) => strip(c)
    case Filter(cond, c) =>
      val (leaf, cs) = strip(c); (leaf, cond +: cs)
    case other => (other, Seq.empty)
  }

  /** Does `p` strip to the registered source shape? Returns the collected
    * filter conditions (join-key isnotnulls absorbed for joins) plus the
    * matched leaf node — the caller needs the leaf's output to refuse
    * ambiguous column names. */
  private def matchSource(p: LogicalPlan, s: MvSource)
      : Option[(Seq[Expression], LogicalPlan)] = {
    val (leaf, conds) = strip(p)
    s match {
      case ScanSource(path) => leaf match {
        // EXACT root-path-set equality, not membership: a multi-root
        // relation (spark.read.parquet(registeredPath, otherPath)) scans
        // the UNION of its roots, and serving that union from an MV
        // summarizing only the registered path would silently drop the
        // other roots' rows. Single registered root ⇒ the relation must
        // have exactly that one root.
        case r: LogicalRelation if rootPaths(r) == Seq(path) =>
          Some((conds, r))
        case _ => None
      }
      case JoinSource(aPath, bPath, keyA, keyB) => leaf match {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join
            if j.joinType == org.apache.spark.sql.catalyst.plans.Inner =>
          val keyNames = Set(keyA, keyB)
          // which key name binds to which LEG — name-set equality alone
          // would accept a same-named key joined in the wrong orientation
          val legKeys: Option[(String, String)] = j.condition match {
            case Some(org.apache.spark.sql.catalyst.expressions.EqualTo(
                x: AttributeReference, y: AttributeReference)) =>
              if (j.left.outputSet.contains(x)) Some((x.name, y.name))
              else if (j.left.outputSet.contains(y)) Some((y.name, x.name))
              else None
            case _ => None
          }
          def legs(aFirst: Boolean): Option[Seq[Expression]] = {
            val (lp, rp) = if (aFirst) (aPath, bPath) else (bPath, aPath)
            val (lk, rk) = if (aFirst) (keyA, keyB) else (keyB, keyA)
            if (!legKeys.contains((lk, rk))) None
            else for {
              (l, _) <- matchSource(j.left, ScanSource(lp))
              (r, _) <- matchSource(j.right, ScanSource(rp))
            } yield l ++ r
          }
          legs(aFirst = true).orElse(legs(aFirst = false)).map { inner =>
            ((conds ++ inner).filterNot {
              case org.apache.spark.sql.catalyst.expressions.IsNotNull(
                  a: AttributeReference) => keyNames.contains(a.name)
              case _ => false
            }, j)
          }
        case _ => None
      }
    }
  }

  private def rootPaths(r: LogicalRelation): Seq[String] = r.relation match {
    case h: HadoopFsRelation => h.location.rootPaths.map(_.toUri.getPath)
    case _                   => Seq.empty
  }

  /** count of a non-null constant — count(1), count(lit(1)), count(*). */
  private def isRowCount(c: Count): Boolean =
    c.children.forall(ch => ch.foldable && !ch.nullable)

  private def rewrite(agg: Aggregate, d: MvDef): Option[LogicalPlan] = {
    val src = matchSource(agg.child, d.source)
    val conds = src.map(_._1).getOrElse(Seq.empty)
    // every stripped predicate must be a deterministic condition over
    // GRAIN columns only — it then selects whole summary groups
    val condsOk = conds.forall(c => c.deterministic &&
      c.references.forall(a => d.groupCols.contains(a.name)))
    val grainOk = agg.groupingExpressions.forall {
      case a: AttributeReference => d.groupCols.contains(a.name)
      case _                     => false
    }
    if (src.isEmpty || !condsOk || !grainOk) return None
    // name-keyed resolution is only sound when the names are unambiguous
    // in the matched source — a join whose legs share a grain or measure
    // column name could serve from the wrong leg's summary column
    val neededNames: Set[String] =
      agg.groupingExpressions.collect { case a: AttributeReference => a.name }.toSet ++
        conds.flatMap(_.references.map(_.name)) ++
        d.measures.values.collect {
          case SumOf(c) => c; case MinOf(c) => c; case MaxOf(c) => c
        }
    val ambiguous = src.get._2.output.groupBy(_.name)
      .collect { case (n, as) if as.size > 1 => n }.toSet
    if (neededNames.exists(ambiguous)) return None

    val mvRel = d.mv.newInstance()
    def mvAttr(name: String): Option[AttributeReference] =
      mvRel.output.collectFirst {
        case a: AttributeReference if a.name == name => a
      }
    // every grain column the groups or stripped filters need must exist in
    // the MV relation AT THE SOURCE'S TYPE — a mis-registered or
    // type-drifted MvDef declines to the raw scan instead of producing an
    // ill-typed predicate (or throwing) inside the optimizer
    val grainResolvable =
      (agg.groupingExpressions.collect { case a: AttributeReference => a } ++
        conds.flatMap(_.references))
        .forall(a => mvAttr(a.name).exists(_.dataType == a.dataType))
    if (!grainResolvable) return None
    // mv measure column serving this source-side aggregate function
    def serving(m: Merge): Option[AttributeReference] =
      d.measures.collectFirst { case (col, `m`) => col }.flatMap(mvAttr)

    // each output column re-keyed to its ORIGINAL exprId; any miss aborts
    val served: Seq[Option[NamedExpression]] = agg.aggregateExpressions.map {
      case a: AttributeReference if d.groupCols.contains(a.name) =>
        mvAttr(a.name).filter(_.dataType == a.dataType)
          .map(m => Alias(m, a.name)(exprId = a.exprId))
      case al @ Alias(a: AttributeReference, name)
          if d.groupCols.contains(a.name) =>
        mvAttr(a.name).filter(_.dataType == a.dataType)
          .map(m => Alias(m, name)(exprId = al.exprId))
      case al @ Alias(ae: AggregateExpression, name)
          if !ae.isDistinct && ae.filter.isEmpty =>
        (ae.aggregateFunction match {
          case c: Count if isRowCount(c) =>
            serving(CntRows).map(m =>
              Coalesce(Seq(Sum(m).toAggregateExpression(), Literal(0L))))
          case s: Sum => s.child match {
            // float sums are NOT re-mergeable: summing per-group partials
            // changes the addition order, so the served double could
            // drift in the low bits from the raw scan's — the rewrite
            // must stay bit-invisible. Enforced here, not left to
            // registration convention.
            case a: AttributeReference
                if a.dataType != org.apache.spark.sql.types.DoubleType &&
                   a.dataType != org.apache.spark.sql.types.FloatType =>
              serving(SumOf(a.name)).map(m => Sum(m).toAggregateExpression())
            case _ => None
          }
          case mn: Min => mn.child match {
            case a: AttributeReference =>
              serving(MinOf(a.name)).map(m => Min(m).toAggregateExpression())
            case _ => None
          }
          case mx: Max => mx.child match {
            case a: AttributeReference =>
              serving(MaxOf(a.name)).map(m => Max(m).toAggregateExpression())
            case _ => None
          }
          case _ => None
        })
          // the swap must be type-invisible: Sum over a Decimal(p,s)
          // source yields Decimal(p+10,s), and a serve-side Sum over THAT
          // widens again to Decimal(p+20,s) — re-keying it under the
          // original exprId would silently change the query's result
          // type. Long/Double sums are type-stable; anything else
          // declines to the raw scan.
          .filter(_.dataType == al.dataType)
          .map(e => Alias(e, name)(exprId = al.exprId))
      case _ => None
    }
    if (served.exists(_.isEmpty)) return None

    val newGroups = agg.groupingExpressions.map {
      case a: AttributeReference => mvAttr(a.name).get
    }
    val child: LogicalPlan =
      if (conds.isEmpty) mvRel
      else Filter(
        conds.map(_.transform {
          case a: AttributeReference => mvAttr(a.name).get
        }).reduce(org.apache.spark.sql.catalyst.expressions.And),
        mvRel)
    Some(Aggregate(newGroups, served.map(_.get), child))
  }
}
