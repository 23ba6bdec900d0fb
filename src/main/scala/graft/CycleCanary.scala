package graft

/** Window-independent cycle-delivery calibration (round-6 verdict #2).
  *
  * The host VM's cycle delivery drifts (documented ±20%, observed worse:
  * the r6 driver run recorded 12.6k docs/s on the same binary that did
  * 58.4k thirty minutes earlier), so a below-band headline could not be
  * converted into "the host delivered X% of canonical cycles" without
  * trusting builder-run history. This canary is the conversion factor: a
  * FIXED single-threaded splitmix64 checksum loop with a known canonical
  * wall time, run inside the same pinned child JVM immediately before and
  * after the timed headline runs. `cycle_delivery = CanonicalMs /
  * observed_ms`; a normalized docs/s published next to the raw one then
  * carries its own evidence.
  *
  * Caveats, documented not hidden: the canary is single-threaded, so it
  * measures per-core delivery, not contention across all pinned cores —
  * a window that throttles only under full-width load under-shows here;
  * and CanonicalMs is itself a host-era constant (calibrated on this
  * sandbox VM in a healthy window — see `CanonicalMs` comment), so the
  * meaningful read is RELATIVE across runs of the same round.
  */
private[graft] object CycleCanary {

  /** Mix count sized for ~1 s of canonical single-thread work — long
    * enough that scheduler noise amortizes, short enough to run twice in
    * every rich leg without moving the leg's wall budget. */
  val Iters: Long = 200000000L

  /** Canonical wall ms for [[Iters]] mixes on this sandbox VM, measured
    * in a healthy window (2026-08-18: three fresh pinned JVMs, in-JVM
    * medians 1060/1068/1065 with per-run spread < 1%). Re-calibrate via
    * `main` if the harness moves hosts. */
  val CanonicalMs: Long = 1065L

  /** One timed canary run (call after [[warm]] in a fresh JVM). The xor
    * accumulator is data-dependent on every iteration and checked at the
    * end, so the loop cannot be dead-code-eliminated or strength-reduced
    * by the JIT. */
  def run(): Long = {
    val t0 = System.nanoTime()
    var acc = 0L
    var i = 0L
    while (i < Iters) {
      acc ^= graft.util.SplitMix.finalizeMix(i + acc)
      i += 1
    }
    val ms = (System.nanoTime() - t0) / 1000000L
    // splitmix64 is a bijective mixer seeded by the loop index chain; an
    // all-zero accumulator after the full Iters xor chain is practically
    // impossible, so this branch never fires — it only anchors `acc` as
    // observably live
    if (acc == 0L) System.err.println("[canary] zero checksum")
    ms
  }

  /** JIT warmup: a short untimed burn so the first timed run measures
    * cycle delivery, not C2 compilation. */
  def warm(): Unit = {
    var acc = 0L
    var i = 0L
    while (i < Iters / 30) { acc ^= graft.util.SplitMix.finalizeMix(i + acc); i += 1 }
    if (acc == 0L) System.err.println("[canary] zero checksum (warm)")
  }

  /** Calibration entry point: `taskset -c 0 java ... graft.CycleCanary`
    * in a healthy window, read CANARY_MEDIAN, update [[CanonicalMs]]. */
  def main(args: Array[String]): Unit = {
    warm()
    val runs = (1 to 5).map(_ => run())
    println("CANARY_RUNS=" + runs.mkString(","))
    println("CANARY_MEDIAN=" + runs.sorted.apply(runs.length / 2))
  }
}
