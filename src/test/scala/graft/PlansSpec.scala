package graft

/** The prepared-query cache's contracts ([[Plans]]): instance reuse for
  * repeated invocations, result equality with a fresh build, pin-during-
  * build exclusion (the harness drains pins between queries), and bump
  * invalidation.
  */
class PlansSpec extends SparkSpec {

  test("repeated invocation serves the prepared plan; results stay identical") {
    val a = SparkEntry.queries("q01_pricing_summary")(spark, sf0001)
    val r1 = a.collect().map(_.toSeq).toSeq
    graft.operators.Materialize.releaseAll() // the bench's between-queries drain
    val b = SparkEntry.queries("q01_pricing_summary")(spark, sf0001)
    assert(a eq b, "a repeated (session, query, sfDir) must reuse the prepared plan")
    assert(b.collect().map(_.toSeq).toSeq == r1,
      "re-executing the prepared plan must reproduce the rows")
  }

  test("a build that pins blocks is served uncached (drain-safe)") {
    // q175 pins its delivery during construction; caching it would hand a
    // released-checkpoint plan to the second invocation.
    val a = SparkEntry.queries("q175_prepare_corpus_increment")(spark, sf0001)
    val r1 = a.collect().map(_.toSeq).toSeq
    graft.operators.Materialize.releaseAll()
    val b = SparkEntry.queries("q175_prepare_corpus_increment")(spark, sf0001)
    assert(!(a eq b), "pin-building queries must not be cached")
    assert(b.collect().map(_.toSeq).toSeq == r1)
    graft.operators.Materialize.releaseAll()
  }

  test("bump invalidates the prepared plan") {
    val a = SparkEntry.queries("q12_global_top_orders")(spark, sf0001)
    Readers.bump()
    val b = SparkEntry.queries("q12_global_top_orders")(spark, sf0001)
    assert(!(a eq b), "a lifecycle bump must re-prepare")
    assert(a.collect().map(_.toSeq).toSeq == b.collect().map(_.toSeq).toSeq)
  }
}
