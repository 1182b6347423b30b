package graft

import graft.SparkTestBase

/** The streaming bench harness must RUN — it is the only perf signal
  * for the stateful streaming surfaces, so a bitrotted harness means a
  * silent loss of coverage. Smoke at sf0.001; the real numbers are
  * produced at sf0.1 by `runMain graft.StreamBench` (ROADMAP).
  */
class StreamBenchSpec extends SparkTestBase {

  test("stream bench drains all surfaces and reports positive rates") {
    val json = StreamBench.run(spark, "/root/testdata/sf0.001",
      sessionChunks = 3, dedupChunks = 2)
    assert(json.contains("\"metric\":\"stream_bench\""))
    val rates =
      "_per_sec\":([0-9.]+)".r.findAllMatchIn(json).map(_.group(1).toDouble).toSeq
    assert(rates.size == 4 && rates.forall(_ > 0),
      s"expected 4 positive rates (sessionize, dedup, bus pub/consume) in $json")
    // chunked surfaces: every chunk became its own micro-batch (the
    // harness's contract: per-batch latency is meaningless if batches
    // collapsed). The bus consume side legitimately drains in ONE
    // AvailableNow batch — its offset range is pinned at start.
    val batches = "\"batches\":([0-9]+)".r.findAllMatchIn(json)
      .map(_.group(1).toInt).toSeq
    assert(batches.take(2).forall(_ >= 2), json)
    assert(batches.forall(_ >= 1), json)
  }
}
