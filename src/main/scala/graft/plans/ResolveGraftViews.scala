package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedRelation, UnresolvedSubqueryColumnAliases}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, ViewCatalog}

/** V2 VIEW RESOLUTION — the piece OSS Spark leaves to the connector:
  * Spark 4.1 ships the [[ViewCatalog]] API but wires neither `CREATE
  * VIEW` DDL nor SELECT-time resolution for non-session catalogs
  * (`ResolveSessionCatalog` throws `CATALOG_OPERATION` for the DDL, and
  * the analyzer's lookupTableOrView consults tables only). Iceberg
  * solves this with extension rules; this rule is that pattern for
  * `graft_cat`: a three-part `UnresolvedRelation` whose catalog is a
  * [[ViewCatalog]] holding the view expands to the stored SQL, parsed
  * and wrapped under the view's name (aliases applied when recorded).
  * DDL rides the procedure surface instead (`CALL graft_cat.sys
  * .create_view(...)` / `.drop_view(...)`), which IS wired.
  *
  * Stored view SQL is expected to use qualified table names (the
  * create_view procedure documents this); unqualified inner references
  * resolve in the READING session's context. Views-over-views converge
  * in the analyzer's fixed point; a self-referential view fails
  * analysis with Spark's max-iterations error instead of looping. */
case class ResolveGraftViews(spark: SparkSession) extends Rule[LogicalPlan] {

  private def viewFor(parts: Seq[String]) = {
    if (parts.length != 3) None
    else {
      val cm = spark.sessionState.catalogManager
      val cat = try cm.catalog(parts.head) catch { case _: Exception => null }
      cat match {
        case vc: ViewCatalog =>
          val ident = Identifier.of(Array(parts(1)), parts(2))
          if (vc.viewExists(ident)) Some(vc.loadView(ident)) else None
        case _ => None
      }
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u @ UnresolvedRelation(parts, _, _) =>
        viewFor(parts).map { v =>
          val parsed = spark.sessionState.sqlParser.parsePlan(v.query)
          val aliases = Option(v.columnAliases)
            .map(_.toSeq.filter(_ != null)).getOrElse(Seq.empty)
          val body = if (aliases.nonEmpty)
            UnresolvedSubqueryColumnAliases(aliases, parsed)
          else parsed
          SubqueryAlias(parts.last, body)
        }.getOrElse(u)
    }
}
