package graft.functions

import java.security.MessageDigest

import graft.SparkTestBase
import graft.queries.LlmOps

/** t44/t45 semantics against a from-scratch Scala recomputation —
  * winnowing per the MOSS definition, classifier per the published
  * weight vector — so the Spark HOF chain and the oracle SQL are both
  * checked against a third implementation.
  */
class WinnowQualitySpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  private def docs(): Seq[(Long, String)] = {
    graft.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
  }

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Leading 15 hex nibbles of md5 as a long — the shared 60-bit hash. */
  private def h60(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s).substring(0, 15), 16)

  test("t44 pairs equal the from-scratch winnowing recomputation; one reused exchange") {
    val w = 4
    val fps: Map[Long, Set[Long]] = docs().map { case (id, text) =>
      val toks = text.trim.split("\\s+")
      val hs = toks.sliding(4).filter(_.length == 4)
        .map(g => h60(g.mkString(" "))).toArray
      val sel =
        if (hs.length >= w) hs.sliding(w).map(_.min).toSet
        else if (hs.nonEmpty) Set(hs.min)
        else Set.empty[Long]
      id -> sel
    }.toMap
    val df = fps.toSeq.flatMap { case (id, s) => s.map(fp => (fp, id)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      .filter { case (_, ids) => ids.size >= 2 && ids.size <= 64 }
    val shared = df.toSeq
      .flatMap { case (_, ids) =>
        for (a <- ids; b <- ids if a < b) yield (a, b)
      }
      .groupBy(identity).view.mapValues(_.size).toMap
      .filter(_._2 >= 2)
    val got = LlmOps.t44Winnowing.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == shared.map { case (k, v) => k -> v.toLong },
      s"pair sets differ: got ${got.size}, want ${shared.size}")

    // the self-join's two sides are the same frame: its exchange must
    // build once and be reused, or the fingerprint stream shuffles twice
    val q = LlmOps.t44Winnowing.fn(spark, dir)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("ReusedExchange"), plan)
  }

  test("fused winnowing equals the (quadratic) HOF reference formulation") {
    import org.apache.spark.sql.functions._
    import graft.{Tables => T}
    import graft.functions.{TextFunctions => TF}
    val spark2 = spark
    import spark2.implicits._
    val w = 4
    val hs = transform(TF.wordNgrams($"text", 4),
      g => conv(substring(md5(g), 1, 15), 16, 10).cast("long"))
    val hof = when(size(hs) >= w,
      sort_array(array_distinct(transform(sequence(lit(1), size(hs) - (w - 1)),
        j => array_min(slice(hs, j, lit(w)))))))
      .otherwise(when(size(hs) > 0, array(array_min(hs)))
        .otherwise(array().cast("array<long>")))
    val diff = T.load(spark, dir, "documents")
      .select(hof.as("a"), TF.winnowedFingerprints($"text", 4, 4).as("b"))
      .filter(not($"a" <=> $"b"))
    assert(diff.count() == 0)
  }

  test("t45 scores equal the exact weight-vector recomputation") {
    val stop = Set("the", "a", "of", "and", "to", "in", "is", "for", "on", "with")
    val expected = docs().map { case (id, text) =>
      val toks = text.trim.split("\\s+")
      val sr = toks.count(stop).toDouble / toks.length
      val atl = text.replaceAll("\\s", "").length.toDouble / toks.length
      val pr = (text.length - text.replaceAll("[.,;:!?'\"()]", "").length)
        .toDouble / text.length
      val z = -1.5 + 2.5 * sr + 0.25 * (atl - 4.0) - 8.0 * pr +
        0.5 * math.min(toks.length.toLong, 512L).toDouble / 512.0
      id -> (0.5 + 0.5 * (z / (1.0 + math.abs(z))), z >= 0.0)
    }.toMap
    val got = LlmOps.t45QualityClassifier.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    assert(got.size == expected.size)
    expected.foreach { case (id, (score, keep)) =>
      assert(got(id)._1 == score,
        s"score mismatch doc $id: got ${got(id)._1}, want $score")
      assert(got(id)._2 == keep)
    }
  }
}
