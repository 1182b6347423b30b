package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Property-based equivalence of the fused hashing expressions against
  * their HOF reference formulations over adversarial token arrays:
  * unicode tokens, empty strings, nulls, length collisions around the
  * window/chunk width. Raw ScalaCheck generators with fixed seeds
  * (scalatestplus glue is not on the offline classpath). The fused
  * expressions feed every dedup/decontamination shuffle — a silent
  * divergence from the reference chain would corrupt candidate sets
  * corpus-wide, so the twin contract gets the widest net we can throw.
  */
class HashPropertiesSpec extends SparkTestBase {
  import spark.implicits._

  private val token: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(5)),
    Gen.const(""),
    Gen.oneOf("café", "straße", "日本語", "🦑", "a b"), // multi-byte, embedded space
    Gen.const(null.asInstanceOf[String]))

  private val tokensGen: Gen[List[String]] =
    Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, token))

  private def samples(n: Int): Seq[List[String]] =
    (0 until n).map(i =>
      tokensGen.pureApply(Gen.Parameters.default, Seed(7L + i)))

  test("WordNgramHashSet == HOF chain over adversarial token arrays") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val rows = samples(120)
    val df = rows.map(Tuple1(_)).toDF("t")
    // reference: n-length windows joined with array_join semantics
    // (nulls skipped), md5'd, leading 15 nibbles, dedup + sort
    def refGrams(n: Int) = sort_array(array_distinct(transform(
      expr(s"transform(sequence(0, size(t)-$n), i -> array_join(slice(t, i+1, $n), ' '))"),
      g => conv(substring(md5(g), 1, 15), 16, 10).cast("long"))))
    Seq(2, 5).foreach { n =>
      val fused = ColumnBridge.column(
        expressions.WordNgramHashSet(ColumnBridge.expression($"t"), n))
      val bad = df.filter(size($"t") >= n)
        .select(fused.as("fast"), refGrams(n).as("ref"))
        .filter(not($"fast" <=> $"ref"))
        .collect() // once — assert(cond, clue) evaluates the clue eagerly
      assert(bad.isEmpty, s"n=$n diverges: ${bad.mkString}")
      // below-n arrays yield the empty set
      assert(df.filter(size($"t") < n).select(fused.as("h"))
        .collect().forall(_.getSeq[Long](0).isEmpty))
    }
  }

  test("WordChunkHashes == HOF chain over adversarial token arrays") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val rows = samples(120)
    val df = rows.map(Tuple1(_)).toDF("t")
    def refChunks(n: Int) = transform(
      expr(s"transform(sequence(0, size(t) div $n - 1), i -> array_join(slice(t, i*$n+1, $n), ' '))"),
      g => conv(substring(md5(g), 1, 15), 16, 10).cast("long"))
    Seq(3, 4).foreach { n =>
      val fused = ColumnBridge.column(
        expressions.WordChunkHashes(ColumnBridge.expression($"t"), n))
      val bad = df.filter(size($"t") >= n)
        .select(fused.as("fast"), refChunks(n).as("ref"))
        .filter(not($"fast" <=> $"ref"))
        .collect()
      assert(bad.isEmpty, s"n=$n diverges: ${bad.mkString}")
      assert(df.filter(size($"t") < n).select(fused.as("h"))
        .collect().forall(_.getSeq[Long](0).isEmpty))
    }
  }
}
