package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, Expression, Literal, Unevaluable}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Declarative FTS predicate + the optimizer rule that rewrites it.
  *
  * `fts_match(id, text, 'a b')` is an Unevaluable marker: users state
  * WHERE-clause intent ("this row matches every prefix") and the
  * RewriteFtsMatch rule replaces the Filter with the term-index
  * prefix-AND left-semi join (operators.Fts.search) during
  * optimization — the SURVEY §4 candidate rule, made real. Injected via
  * GraftExtensions (spark.sql.extensions) or
  * `spark.experimental.extraOptimizations`.
  */
case class FtsMatchMarker(id: Expression, text: Expression, query: Expression)
    extends Expression with Unevaluable {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(id, text, query)
  override def prettyName: String = "fts_match"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FtsMatchMarker =
    copy(id = newChildren(0), text = newChildren(1), query = newChildren(2))
}

case class RewriteFtsMatch(spark: SparkSession) extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other     => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Filter(cond, child) if cond.exists(_.isInstanceOf[FtsMatchMarker]) =>
      val (markers, rest) = conjuncts(cond).partition(_.isInstanceOf[FtsMatchMarker])
      val base = rest.reduceOption(And).map(Filter(_, child)).getOrElse(child)
      markers.foldLeft(base) { (acc, m) =>
        val mk = m.asInstanceOf[FtsMatchMarker]
        val idName = mk.id match {
          case a: AttributeReference => a.name
          case other => throw new IllegalArgumentException(
            s"fts_match id must be a column reference, got $other")
        }
        val textName = mk.text match {
          case a: AttributeReference => a.name
          case other => throw new IllegalArgumentException(
            s"fts_match text must be a column reference, got $other")
        }
        val q = mk.query match {
          case Literal(v, _) if v != null => v.toString
          case other => throw new IllegalArgumentException(
            s"fts_match query must be a string literal, got $other")
        }
        val prefixes = graft.entries.Engine.ftsPrefixes(q)
        if (prefixes.isEmpty) acc // no surviving terms: no filter (reference: null query)
        else {
          val rewritten = Bridge.analyzedPlan(
            graft.operators.Fts.search(Bridge.ofRows(spark, acc), idName,
              Seq(textName), prefixes))
          // This rule runs in the user-optimizer batch, AFTER the core
          // batch that eliminates Deduplicate — normalize the fresh
          // subplan's distinct() ourselves or physical planning rejects it.
          org.apache.spark.sql.catalyst.optimizer
            .ReplaceDeduplicateWithAggregate(rewritten)
        }
      }
  }
}

object FtsRewrite {
  /** WHERE-clause marker: row matches every whitespace-separated prefix
    * of `query` (buildFtsQuery semantics, entries.ts:12-20). */
  def ftsMatch(id: Column, text: Column, query: String): Column =
    Bridge.column(FtsMatchMarker(
      Bridge.expression(id), Bridge.expression(text), Literal(query)))
}
