package graft

/** Whole-surface plan lint — the BASELINE.md engine obligation "no
  * cartesian joins" enforced mechanically over EVERY gate query, not just
  * the hand-picked PlanSpec shapes. `CartesianProduct` is the unbounded
  * shuffle-free N×M physical join; a broadcast nested-loop join against a
  * bounded registry/dimension side (percolate's stored-query table, the
  * 1-row cursor broadcasts) is a different operator and stays allowed —
  * its build side is small by construction, and AQE falls back before it
  * becomes corpus×corpus.
  *
  * Planning only (`executedPlan` never runs jobs beyond the artifact
  * ensure* builds the query constructors perform), so the sweep stays
  * cheap enough to lint all ~170 queries per test run.
  */
class PlanLintSpec extends SparkSpec {

  test("no gate query plans a CartesianProduct") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan =
          try fn(spark, sf0001).queryExecution.executedPlan.toString
          catch { case scala.util.control.NonFatal(e) => s"PLANFAIL $e" }
        graft.operators.Materialize.releaseAll()
        if (plan.contains("CartesianProduct")) Some(s"$name: cartesian")
        else if (plan.startsWith("PLANFAIL")) Some(s"$name: $plan")
        else None
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
