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

  /** Unpartitioned (SinglePartition) WINDOWS whose input is bounded by
    * construction — each entry names the bound, which is the justification
    * a reviewer should re-check before extending the list. Everything else
    * with a global window must carry a WindowGroupLimit guard (Spark's
    * rank≤k pushdown: per-partition top-k before the single partition), or
    * it serializes its whole input through one task at scale.
    */
  private val boundedGlobalWindows = Map(
    "q103_source_mixing" -> "windows over the source-cardinality counts aggregate",
    "q134_epoch_plan" -> "same apportionment core as q103 — source-cardinality rows",
    "q149_filter_funnel" -> "windows over the literal 5-row rule-stage table",
    "q151_more_like_this" -> "term-selection window over one example doc's vocabulary",
    "q88_rrf_fusion" -> "rank windows over two already top-k-limited legs")

  private def plans(): Seq[(String, String)] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val plan =
        try fn(spark, sf0001).queryExecution.executedPlan.toString
        catch { case scala.util.control.NonFatal(e) => s"PLANFAIL $e" }
      graft.operators.Materialize.releaseAll()
      (name, plan)
    }

  test("no gate query plans a CartesianProduct") {
    val offenders = plans().flatMap { case (name, plan) =>
      if (plan.contains("CartesianProduct")) Some(s"$name: cartesian")
      else if (plan.startsWith("PLANFAIL")) Some(s"$name: $plan")
      else None
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("every unpartitioned window is WindowGroupLimit-guarded or provably bounded") {
    val offenders = plans().flatMap { case (name, plan) =>
      val globalWindow =
        plan.contains("SinglePartition") && plan.contains("Window")
      if (globalWindow && !plan.contains("WindowGroupLimit") &&
          !boundedGlobalWindows.contains(name))
        Some(s"$name: unguarded single-partition window")
      else None
    }
    assert(offenders.isEmpty,
      offenders.mkString("\n") +
        "\n(either restore the rank<=k WindowGroupLimit shape, restructure " +
        "to TakeOrderedAndProject, or add a justified bound to the whitelist)")
  }
}
