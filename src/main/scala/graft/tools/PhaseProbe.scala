package graft.tools

/** Dev tool: run [[graft.Bench.throttleProbe]] standalone — the pre-flight
  * check for the canonical-run procedure (BASELINE.md). The sandbox host
  * has multi-core, memory-bandwidth, and tmp-fs throttle PHASES that a
  * shell-level probe does not see (a python spin loop measured fast while
  * the JVM's 32-thread envelope sat at 1.4× — observed r11); this prints
  * the exact probe the bench embeds, so "is now a good window?" is
  * answered by the same instrument that will judge the recording.
  *
  * Usage: sbt "runMain graft.tools.PhaseProbe [rounds=3] [threads=32]"
  * Each round prints one throttle_probe JSON line (single/multi/mem/io);
  * compare multi_sec and mem_multi_sec against the committed map's
  * probe_trace values before recording.
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val rounds = if (args.length > 0) args(0).toInt else 3
    val threads = if (args.length > 1) args(1).toInt
      else sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    (1 to rounds).foreach { r =>
      graft.Bench.throttleProbe(s"standalone$r", threads)
      if (r < rounds) Thread.sleep(2000)
    }
  }
}
