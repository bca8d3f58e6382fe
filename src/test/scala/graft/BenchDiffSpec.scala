package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** The snapshot parser behind `tools/BenchDiff` — adjudication-critical
  * since r10 (probe-normalized totals and ingest attribution are read from
  * the committed per-query files): the shapes Bench writes must parse, and
  * pre-r10 snapshots without the embedded fields must degrade to None.
  */
class BenchDiffSpec extends AnyFunSuite {

  private val r10Snapshot =
    """{"metric":"queries","unit":"sec","reps":3,"sf":"/x","ingest_sec":7.1234,""" +
      """"probe_pre_single":0.5011,"probe_pre_multi":0.6262,"probe_pre_mem":0.0137,"probe_pre_io":0.0091,""" +
      """"probe_post_single":0.4996,"probe_post_multi":0.6204,"probe_post_mem":0.0153,"probe_post_io":0.0049,""" +
      """"queries":{"q01_a":0.1234,"q02_b":1.5,"q03_c":2.0E-2}}"""

  private val r9Snapshot =
    """{"metric":"queries","unit":"sec","reps":3,"sf":"/x","errors":{"q09_x":"boom"},""" +
      """"queries":{"q01_a":0.2,"q09_x":0.1}}"""

  test("parses the r10 shape: queries, probes, ingest") {
    val (q, err) = BenchDiff.parse(r10Snapshot)
    assert(q == Map("q01_a" -> 0.1234, "q02_b" -> 1.5, "q03_c" -> 0.02))
    assert(err.isEmpty)
    assert(BenchDiff.scalar(r10Snapshot, "ingest_sec").contains(7.1234))
    assert(BenchDiff.scalar(r10Snapshot, "probe_pre_multi").contains(0.6262))
    assert(BenchDiff.scalar(r10Snapshot, "probe_post_io").contains(0.0049))
  }

  test("parses the pre-r10 shape: errors surface, missing scalars are None") {
    val (q, err) = BenchDiff.parse(r9Snapshot)
    assert(q.keySet == Set("q01_a", "q09_x"))
    assert(err == Set("q09_x"))
    assert(BenchDiff.scalar(r9Snapshot, "probe_pre_multi").isEmpty)
    assert(BenchDiff.scalar(r9Snapshot, "ingest_sec").isEmpty)
  }

  private val r11TraceSnapshot =
    """{"metric":"queries","unit":"sec","reps":3,"sf":"/x","ingest_sec":3.5,""" +
      """"probe_trace_multi":{"pre":0.7252,"mid1":0.7301,"mid2":0.7198,"post":0.7352},""" +
      """"probe_trace_mem":{"pre":0.0115,"mid1":0.0121,"mid2":0.0118,"post":0.0130},""" +
      """"probe_pre_multi":0.7252,"probe_post_multi":0.7352,""" +
      """"queries":{"q01_a":0.1}}"""

  test("parses the r11 phase trace objects; absent on older snapshots") {
    val tr = BenchDiff.parseObj(r11TraceSnapshot, "probe_trace_multi")
    assert(tr.contains(Map(
      "pre" -> 0.7252, "mid1" -> 0.7301, "mid2" -> 0.7198, "post" -> 0.7352)))
    val mem = BenchDiff.parseObj(r11TraceSnapshot, "probe_trace_mem")
    assert(mem.exists(_.size == 4))
    assert(BenchDiff.parseObj(r10Snapshot, "probe_trace_multi").isEmpty)
    // the trace must not confuse the flat-object query parser
    assert(BenchDiff.parse(r11TraceSnapshot)._1 == Map("q01_a" -> 0.1))
  }

  private val r12Snapshot =
    """{"metric":"queries","unit":"sec","reps":3,"sf":"/x","ingest_sec":3.5,""" +
      """"ingest_parts":{"table_layouts":2.36,"bpe_train":0.68,"kmeans_model":0.29,"lsh_index":0.0004},""" +
      """"probe_trace_multi":{"pre":0.68,"mid1":0.62,"mid2":0.76,"post":0.66},""" +
      """"query_rows":{"q01_a":6,"q02_b":4492},""" +
      """"phase_suspect":false,"phase_gate_multi_sec":0.85,"phase_mid_multi_mean":0.6900,""" +
      """"queries":{"q01_a":0.1,"q02_b":0.5}}"""

  test("parses the r12 query_rows and phase-gate fields; absent on older snapshots") {
    assert(BenchDiff.parseObj(r12Snapshot, "query_rows")
      .contains(Map("q01_a" -> 6.0, "q02_b" -> 4492.0)))
    assert(BenchDiff.scalar(r12Snapshot, "phase_mid_multi_mean").contains(0.69))
    assert(BenchDiff.parseObj(r11TraceSnapshot, "query_rows").isEmpty)
    // the rows object must not bleed into the query parser
    assert(BenchDiff.parse(r12Snapshot)._1 == Map("q01_a" -> 0.1, "q02_b" -> 0.5))
  }

  test("clean-band mem advisory fires only on a stable level, never on jitter") {
    // r13: a stable in-band mem level shift (x1.17) was measured tracking
    // the bench total 1:1 while the CPU probe read FASTER — worth an
    // advisory. But in-band jitter is ~2x at the 10 ms scale, so the
    // stability precondition is what keeps the advisory honest.
    def snap(mids: Seq[Double]): String = {
      val pts = (Seq("pre" -> 0.012) ++
        mids.zipWithIndex.map { case (v, i) => s"mid${i + 1}" -> v } ++
        Seq("post" -> 0.012))
        .map { case (k, v) => s"\"$k\":$v" }.mkString(",")
      s"""{"metric":"queries","probe_trace_mem":{$pts},"queries":{"q":0.1}}"""
    }
    assert(BenchDiff.stableMemMids(snap(Seq(0.0105, 0.0100))), "flat level is stable")
    assert(BenchDiff.stableMemMids(snap(Seq(0.010, 0.011, 0.0118))))
    assert(!BenchDiff.stableMemMids(snap(Seq(0.010, 0.022))), "2x jitter must stay silent")
    assert(!BenchDiff.stableMemMids(snap(Seq(0.011))), "one mid: no stability evidence")
    assert(!BenchDiff.stableMemMids(r10Snapshot), "no trace at all: silent")
  }

  test("mem-shift verdict: stable >10% level shift flags; jitter and small shifts stay silent") {
    // r14 (verdict order #4): the hand-run interleaved-A/B adjudication of
    // the r13 sf1 re-run is mechanized as a verdict — BOTH sides stable
    // AND the levels >10% apart. The r13 case itself (x1.17) must flag.
    assert(BenchDiff.memShifted(0.0100, 0.0117, oldStable = true, newStable = true))
    assert(BenchDiff.memShifted(0.0117, 0.0100, oldStable = true, newStable = true),
      "a downshift is just as much a shift")
    assert(!BenchDiff.memShifted(0.0100, 0.0108, oldStable = true, newStable = true),
      "<10% is inside the probe's own repeatability")
    assert(!BenchDiff.memShifted(0.0100, 0.0200, oldStable = false, newStable = true),
      "an unstable side is jitter evidence, not a level")
    assert(!BenchDiff.memShifted(0.0100, 0.0200, oldStable = true, newStable = false))
  }

  test("mem phase class: r14 stamp wins; older maps infer from the trace; pre-r11 None") {
    val stamped =
      """{"metric":"queries","mem_phase_class":"warm","mem_phase_mid_mean":0.0300,""" +
        """"probe_trace_mem":{"pre":0.01,"mid1":0.01,"mid2":0.01,"post":0.01},""" +
        """"queries":{"q":0.1}}"""
    // the stamp is authoritative even when the trace would say otherwise
    // (Bench computed it from the same evidence at record time)
    assert(BenchDiff.memPhaseClassOf(stamped).contains("warm"))
    // pre-r14 maps: inferred from the mem mid-trace with Bench's bounds
    assert(BenchDiff.memPhaseClassOf(r11TraceSnapshot).contains("clean"))
    val elevated =
      """{"metric":"queries","probe_trace_mem":{"pre":0.01,"mid1":0.031,"mid2":0.029,"post":0.01},""" +
        """"queries":{"q":0.1}}"""
    assert(BenchDiff.memPhaseClassOf(elevated).contains("warm"))
    val throttled =
      """{"metric":"queries","probe_trace_mem":{"pre":0.01,"mid1":0.19,"mid2":0.012,"post":0.01},""" +
        """"queries":{"q":0.1}}"""
    assert(BenchDiff.memPhaseClassOf(throttled).contains("suspect"))
    // pre-r11 maps carry no mem trace: no class, and the caller prints
    // nothing rather than guessing
    assert(BenchDiff.memPhaseClassOf(r10Snapshot).isEmpty)
  }

  test("ingest movers band-judge per-artifact drift like query movers") {
    val op = BenchDiff.parseObj(r12Snapshot, "ingest_parts").get
    // bpe_train +0.30 (mover), kmeans_model -0.26 (mover), table_layouts
    // +0.10 (inside the 0.25 band), lsh_index shared-but-flat
    val np = Map("table_layouts" -> 2.46, "bpe_train" -> 0.98,
      "kmeans_model" -> 0.03, "lsh_index" -> 0.0004, "new_store" -> 1.0)
    val moved = BenchDiff.movers(op, np, 0.25)
    assert(moved.map(_._1) == Seq("bpe_train", "kmeans_model"),
      s"expected slower-first movers beyond the band, got $moved")
    assert(moved.head._4 > 0.29 && moved.head._4 < 0.31)
    assert(moved.last._4 < -0.25)
    // an artifact present on one side only is never a mover (it's reported
    // as added/removed by the caller)
    assert(!moved.exists(_._1 == "new_store"))
  }

  test("trace verdict: one mid reports without a verdict; brackets judge only when no mids") {
    // the advisor's r12 scenario: routine bracket spikes (0.99 around a
    // 0.65 mid) must NOT flag a stable host UNSTABLE when there is only
    // one in-loop sample to judge from
    val oneMid = Map("pre" -> 0.99, "mid1" -> 0.65, "post" -> 0.99)
    val v1 = BenchDiff.traceVerdict(oneMid)
    assert(v1.contains("no stability verdict") && !v1.contains("UNSTABLE"), v1)
    // >= 2 mids: judged on mids alone — same bracket spikes, stable mids
    val twoMids = Map("pre" -> 0.99, "mid1" -> 0.65, "mid2" -> 0.66, "post" -> 0.99)
    assert(BenchDiff.traceVerdict(twoMids).contains("stable"))
    assert(BenchDiff.traceVerdict(twoMids).contains("mid max/min"))
    // a real mid-run swing still flags
    val swing = Map("pre" -> 0.65, "mid1" -> 0.65, "mid2" -> 1.48, "post" -> 0.67)
    assert(BenchDiff.traceVerdict(swing).contains("UNSTABLE"))
    // no mids at all (reps=1): the bracket ratio is all there is
    val noMids = Map("pre" -> 0.99, "post" -> 0.65)
    val v0 = BenchDiff.traceVerdict(noMids)
    assert(v0.contains("bracket max/min") && v0.contains("UNSTABLE"), v0)
  }

  test("the committed canonical map parses and carries the r10 fields") {
    val json = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("bench_per_query.json")),
      java.nio.charset.StandardCharsets.UTF_8)
    val (q, err) = BenchDiff.parse(json)
    assert(q.size >= 200, s"committed map lost queries: ${q.size}")
    assert(err.isEmpty, s"committed map must not carry errors: $err")
    Seq("ingest_sec", "probe_pre_multi", "probe_post_multi",
      "probe_pre_mem", "probe_post_mem", "probe_pre_io", "probe_post_io",
      "phase_mid_multi_mean")
      .foreach { k =>
        assert(BenchDiff.scalar(json, k).nonEmpty,
          s"committed map lacks $k — re-record with the current Bench")
      }
    // r12: cardinality field present and the canonical map is NOT a
    // throttled-window recording (the mechanized gate, BASELINE.md)
    assert(BenchDiff.parseObj(json, "query_rows").exists(_.size >= 200),
      "committed map lacks per-query output rows — re-record with the current Bench")
    assert(json.contains("\"phase_suspect\":false"),
      "committed canonical map is stamped phase-suspect — re-record in a clean window")
    // r13: the canonical map must be CLEAN, not merely under the suspect
    // gate — the 0.76–0.85 transition band (phase_class=warm) is
    // gate-valid but canonically disqualified (BASELINE.md). Pre-r13 maps
    // without the field are judged by their recorded mid mean.
    val mid = BenchDiff.scalar(json, "phase_mid_multi_mean").get
    assert(json.contains("\"phase_class\":\"clean\"") ||
      (!json.contains("\"phase_class\"") && mid <= 0.76),
      f"committed canonical map is not phase-clean (mid mean $mid%.3f) — " +
        "re-record in a verified-clean window")
    // r14: the canonical map must be MEM-clean too (stamped, or inferred
    // from its trace on pre-stamp maps) — an elevated-bandwidth recording
    // would silently shift every cross-round delta on this memory-bound
    // surface.
    assert(BenchDiff.memPhaseClassOf(json).forall(_ == "clean"),
      s"committed canonical map is not mem-phase-clean " +
        s"(${BenchDiff.memPhaseClassOf(json)}) — re-record in a clean window")
  }
}
