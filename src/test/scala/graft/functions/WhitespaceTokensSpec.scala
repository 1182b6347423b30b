package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins the fused byte-scan whitespace expressions bit-identical to
  * the builtin compositions they replace on the board's hot paths:
  * WhitespaceTokens ≡ split(trim(s), "\\s+") and
  * WhitespaceCollapse ≡ regexp_replace(trim(s), "\\s+", " ") — i.e.
  * TextFunctions.tokens/normalize keep their r15 semantics exactly.
  * The adversarial matrix covers the empty-token rules of limit=-1
  * regex split (leading/trailing whitespace runs, all-whitespace,
  * empty), the space-only trim boundary (tabs/CR/LF survive trim and
  * must produce the builtin's leading/trailing empties), every ASCII
  * \s byte, NON-\s Unicode whitespace (NBSP, LINE SEPARATOR, CJK
  * space — Java \s must NOT split these), multi-byte text, and
  * emoji/combining sequences; the fixture sweep then compares the
  * whole documents corpus.
  */
class WhitespaceTokensSpec extends SparkTestBase {

  private val nasty = Seq(
    "",
    " ",
    "   ",
    "\t",
    "\t\t",
    "a",
    " a ",
    "  a  b  ",
    "\ta",
    "a\t",
    "\ta\t",
    "\t a \t",
    "a b",
    "a  b",
    "a\tb\ncd\fe\rf",
    "\r\n\r\n",
    "a\r\nb",
    " \t mixed \f runs  here \r\n ",
    "café  naïve", // multi-byte Latin-1 supplement
    " nbsp is not split", // U+00A0 is NOT Java \s
    "line sep para", // U+2028/9 are NOT Java \s
    "cjk　space", // U+3000 is NOT Java \s
    "日本語 テキスト\tです",
    "emoji 👍\t👍🏽 zwj 👩‍💻 end ",
    "x" * 5000,
    ("word " * 2000).trim + "\t",
    "controlbytes")

  test("WhitespaceTokens == split(trim(s), \\s+) on the adversarial matrix") {
    import spark.implicits._
    val df = nasty.toDF("s").persist()
    val mismatch = df
      .withColumn("fused", graft.functions.TextFunctions.tokens($"s"))
      .withColumn("builtin", split(trim($"s"), "\\s+"))
      .filter(not($"fused" <=> $"builtin"))
      .collect()
    assert(mismatch.isEmpty,
      s"tokens mismatch on: ${mismatch.map(_.getString(0)).mkString("|")}")
    df.unpersist()
  }

  test("WhitespaceCollapse == regexp_replace(trim(s), \\s+, ' ') on the matrix") {
    import spark.implicits._
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val df = nasty.toDF("s").persist()
    val fusedCollapse = ColumnBridge.column(
      graft.functions.expressions.WhitespaceCollapse(
        ColumnBridge.expression(trim($"s"))))
    val mismatch = df
      .withColumn("fused", fusedCollapse)
      .withColumn("builtin", regexp_replace(trim($"s"), "\\s+", " "))
      .filter(not($"fused" <=> $"builtin"))
      .collect()
    assert(mismatch.isEmpty,
      s"collapse mismatch on: ${mismatch.map(_.getString(0)).mkString("|")}")
    df.unpersist()
  }

  test("normalize keeps its r15 builtin form over the whole fixture corpus") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val legacyNorm = lower(regexp_replace(trim(col("text")), "\\s+", " "))
    val legacyToks = split(trim(col("text")), "\\s+")
    val bad = docs
      .withColumn("n1", graft.functions.TextFunctions.normalize(col("text")))
      .withColumn("n2", legacyNorm)
      .withColumn("t1", graft.functions.TextFunctions.tokens(col("text")))
      .withColumn("t2", legacyToks)
      .filter(not(col("n1") <=> col("n2")) || not(col("t1") <=> col("t2")))
      .count()
    assert(bad == 0L, s"$bad fixture documents diverge from the builtins")
  }

  test("both are SQL-registered") {
    import spark.implicits._
    graft.GraftExtensions.registerAll(spark)
    Seq("a\tb ").toDF("s").createOrReplaceTempView("wt_reg")
    val r = spark.sql(
      "SELECT whitespace_tokens(s) AS t, whitespace_collapse(s) AS c FROM wt_reg")
      .head()
    assert(r.getSeq[String](0) == Seq("a", "b"))
    assert(r.getString(1) == "a b")
  }
}
