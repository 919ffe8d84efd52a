package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** ONE plan walker for every plan-shape spec: collects the nodes a
  * partial function matches across the ENTIRE adaptive plan —
  * unwrapping AdaptiveSparkPlanExec / QueryStageExec (a leaf to the
  * default traversal) / ReusedExchangeExec, and descending into
  * subqueries. The specs used to carry hand-rolled copies of this
  * traversal with slightly different case sets (one dropped the
  * reused-exchange unwrap), which drift as Spark's adaptive wrappers
  * evolve; matching nodes' children are still walked, so nested
  * matches (e.g. a shuffle under a shuffle) are all reported.
  */
object PlanWalk {
  def collect[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    val here = p match {
      case a: AdaptiveSparkPlanExec => collect(a.executedPlan)(pf)
      case q: QueryStageExec => collect(q.plan)(pf)
      case r: ReusedExchangeExec => collect(r.child)(pf)
      case other =>
        pf.lift(other).toSeq ++ other.children.flatMap(collect(_)(pf))
    }
    here ++ p.subqueries.flatMap(collect(_)(pf))
  }
}
