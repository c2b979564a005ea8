package graft.tools

/** Manual staging GC: sweep /tmp and the warehouse for stagings stranded
  * by code-digest rotation (every recompile strands the previous build's
  * full artifact set — see SparkEntry.sweepStaleStagings for the rules:
  * graft-named, digest-suffixed, suffix != this build's, marker older
  * than the age guard). The same sweep runs automatically at every
  * entry-point startup (SparkEntry.initStaging); this main exists for
  * explicit cleanups with a custom age, e.g. `run_tool.sh
  * graft.tools.StagingSweep 0.5` reaps anything stale older than 30
  * minutes. No SparkSession — pure filesystem walk.
  *
  * Usage: StagingSweep [maxAgeHours]
  */
object StagingSweep {
  def main(args: Array[String]): Unit = {
    val maxAgeMillis = args.headOption
      .map(h => (h.toDouble * 3600_000L).toLong)
      .getOrElse(graft.SparkEntry.stagingMaxAgeMillis)
    val deleted = graft.SparkEntry.sweepStaleStagings(
      maxAgeMillis = maxAgeMillis)
    deleted.foreach(p => println(s"deleted $p"))
    println(f"swept ${deleted.size} stale staging path(s) " +
      f"(age guard ${maxAgeMillis / 3600000.0d}%.2f h)")
  }
}
