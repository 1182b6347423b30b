package graft.tools

import org.scalatest.funsuite.AnyFunSuite

import graft.Bench

/** Pins the bench harness's probe memory contract: the factor stamp
  * written by MakeProbe is read back, absent stamps mean factor 1
  * (plain fixtures never refuse), and the required-heap curve matches
  * the measured round-10 evidence (100× needed tens of GiB; ≤10× runs
  * at the 8 GiB default).
  */
class BenchContractSpec extends AnyFunSuite {

  test("probe factor reads the MakeProbe stamp; plain fixtures default to 1") {
    val dir = java.nio.file.Files.createTempDirectory("probemeta")
    assert(Bench.probeFactor(dir.toString) == 1)
    assert(Bench.probeFactor("/root/testdata/sf0.01") == 1)
    java.nio.file.Files.writeString(dir.resolve("_probe_meta.json"),
      """{"source":"/root/testdata/sf0.1","factor":100}""")
    assert(Bench.probeFactor(dir.toString) == 100)
  }

  test("required heap scales with the probe factor, floored at the 8 GiB default") {
    assert(Bench.requiredGiB(1) == 8L)
    assert(Bench.requiredGiB(10) == 8L)   // 10x sweeps ran green at 8g
    assert(Bench.requiredGiB(30) == 15L)
    assert(Bench.requiredGiB(100) == 50L) // the 64g that cleared r10's tail
  }

  test("heavy-phase rows are real declared queries (a rename can't silently demote one)") {
    assert(Bench.HeavyRows.subsetOf(graft.SparkEntry.queries.keySet),
      s"unknown heavy rows: ${Bench.HeavyRows -- graft.SparkEntry.queries.keySet}")
  }

  test("drift reference loads only at its own scale factor; garbage reads as absent") {
    val dir = java.nio.file.Files.createTempDirectory("benchref")
    val p = dir.resolve("ref.json").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
      """{"sf":"/root/testdata/sf0.1","medians":{"q01_agg":1.5,"t71_signature_index":9.79}}""")
    val atSf = Bench.loadReference("/root/testdata/sf0.1", p)
    assert(atSf == Map("q01_agg" -> 1.5, "t71_signature_index" -> 9.79))
    // a reference from another scale must NOT fence this run — the
    // 10x/100x probe sweeps would otherwise re-measure every row
    assert(Bench.loadReference("/tmp/probe10x", p).isEmpty)
    // unreadable reference degrades to no fence, never a crash
    java.nio.file.Files.writeString(java.nio.file.Paths.get(p), "{not json")
    assert(Bench.loadReference("/root/testdata/sf0.1", p).isEmpty)
    assert(Bench.loadReference("/root/testdata/sf0.1",
      dir.resolve("absent.json").toString).isEmpty)
    // the drift factor itself: the r13 incident read 1.38x (13.5/9.79)
    // in-suite — the fence must catch that class
    assert(13.5 / 9.79 > Bench.DriftFactor)
  }
}
