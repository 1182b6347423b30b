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
}
