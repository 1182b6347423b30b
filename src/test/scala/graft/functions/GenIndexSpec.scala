package graft.functions

import graft.SparkTestBase

/** Pins the manifest serialization contract directly (r14 ADVICE
  * item 2): extras carry user-influenced values (metaCols, commit
  * ids), so the writer must escape exactly what the Jackson reader
  * unescapes — the old string-concatenated writer silently corrupted
  * the JSON on a quote and round-tripped a backslash wrong.
  */
class GenIndexSpec extends SparkTestBase {

  test("manifest round-trips hostile extras and commit ids (escaping)") {
    val dir = tmpDir("genidxjson")
    val extras = Map(
      "plain" -> "value",
      "quoted" -> """he said "hi" and left""",
      "backslash" -> """C:\tmp\x""",
      "newline_tab" -> "a\nb\tc",
      "unicode" -> "emb\u00e9dding \u0001 sep",
      "empty" -> "")
    val m = GenIndex.Manifest(3, """commit "id" with \ quirks""",
      Map("postings" -> Map(0 -> Seq("postings_g0", "postings_g2"),
        7 -> Seq("postings_g1"))),
      extras)
    GenIndex.writeManifest(spark, dir, m)
    GenIndex.flipCurrent(spark, dir, 3)
    val back = GenIndex.readManifest(spark, dir, "spec")
    assert(back == m, s"round-trip mismatch:\n$back\nvs\n$m")
    // and the file is strict JSON a fresh parser accepts
    val txt = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "_manifest_v3.json"))
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(txt)
    assert(node.get("extras").get("quoted").asText() ==
      """he said "hi" and left""")
  }

  test("append-id history: bounded depth, fold-surviving, comma-refusing") {
    // the shared redelivery guard (r16): remembers the last
    // MaxAppendIds commit ids so a checkpoint restored SEVERAL batches
    // back still no-ops (one remembered id only covers the
    // immediately-preceding batch), while staying a bounded extras
    // string, not an unbounded log
    var ex = Map.empty[String, String]
    for (i <- 1 to GenIndex.MaxAppendIds + 10)
      ex = GenIndex.withAppendId(ex, s"b$i")
    // a fold/compact/retrain replaces the manifest commitId but
    // carries extras forward — the guard must hit through the history
    val m = GenIndex.Manifest(0, "fold_g9", Map.empty, ex)
    assert(GenIndex.isRedelivered(m, Some(s"b${GenIndex.MaxAppendIds + 10}")))
    assert(GenIndex.isRedelivered(m, Some("b11")),
      "oldest remembered id must still hit")
    assert(!GenIndex.isRedelivered(m, Some("b1")),
      "ids beyond the bounded depth age out")
    assert(!GenIndex.isRedelivered(m, None),
      "an id-less append never matches")
    assert(!GenIndex.isRedelivered(m, Some("never-seen")))
    // the manifest's own commitId also matches (an append whose commit
    // IS the current manifest)
    assert(GenIndex.isRedelivered(m, Some("fold_g9")))
    // comma would corrupt the joined history's membership test
    intercept[IllegalArgumentException] {
      GenIndex.withAppendId(ex, "a,b")
    }
  }
}
