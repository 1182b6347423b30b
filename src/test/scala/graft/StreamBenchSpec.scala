package graft

import graft.SparkTestBase

/** The streaming bench harness must RUN — it is the only perf signal
  * for the stateful streaming surfaces, so a bitrotted harness means a
  * silent loss of coverage. Smoke at sf0.001; the real numbers are
  * produced at sf0.1 by `runMain graft.StreamBench` (ROADMAP).
  */
class StreamBenchSpec extends SparkTestBase {

  test("stream bench drains both surfaces and reports positive rates") {
    val json = StreamBench.run(spark, "/root/testdata/sf0.001",
      sessionChunks = 3, dedupChunks = 2)
    assert(json.contains("\"metric\":\"stream_bench\""))
    val eventsRate =
      "\"events_per_sec\":([0-9.]+)".r.findFirstMatchIn(json).map(_.group(1).toDouble)
    val docsRate =
      "\"docs_per_sec\":([0-9.]+)".r.findFirstMatchIn(json).map(_.group(1).toDouble)
    assert(eventsRate.exists(_ > 0), s"no sessionizer rate in $json")
    assert(docsRate.exists(_ > 0), s"no dedup rate in $json")
    // every chunk became its own micro-batch (the harness's contract:
    // per-batch latency is meaningless if batches collapsed)
    assert("\"batches\":([0-9]+)".r.findAllMatchIn(json)
      .map(_.group(1).toInt).forall(_ >= 2), json)
  }
}
