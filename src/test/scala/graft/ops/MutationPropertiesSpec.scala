package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Property-based invariants (SURVEY §5.3): upsert idempotency,
  * insert-ignore invariance, PK-set preservation under delete∘insert,
  * sanitizer output alphabet. Raw ScalaCheck generators with fixed
  * seeds (scalatestplus glue is not on the offline classpath).
  */
class MutationPropertiesSpec extends SparkTestBase {
  import spark.implicits._

  private val rowGen: Gen[List[(String, String)]] = Gen.listOfN(12,
    for {
      k <- Gen.chooseNum(0, 7)
      v <- Gen.alphaNumStr.map(_.take(6))
    } yield (k.toString, v))

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(42L + i)))

  private def df(rows: List[(String, String)]) = {
    val withOrd = rows.zipWithIndex.map { case ((k, v), i) => (k, v, i.toLong) }
    withOrd.toDF("id", "v", "ord")
  }

  private def uniquePk(rows: List[(String, String)]) =
    df(rows)
      .withColumn("rn", row_number().over(Window.partitionBy($"id").orderBy($"ord")))
      .filter($"rn" === 1).select("id", "v")

  test("property: upsert is idempotent — apply(apply(t,f),f) == apply(t,f)") {
    samples(Gen.zip(rowGen, rowGen), 8).foreach { case (existing, batch) =>
      val t0 = uniquePk(existing)
      val once = MutationOps.upsertByPk(t0, df(batch), Seq("id"), col("ord"))
      val twice = MutationOps.upsertByPk(once, df(batch), Seq("id"), col("ord"))
      assert(once.as[(String, String)].collect().toSet ==
        twice.as[(String, String)].collect().toSet)
    }
  }

  test("property: insert-ignore-dups keeps existing rows and never dups a PK") {
    samples(Gen.zip(rowGen, rowGen), 8).foreach { case (existing, batch) =>
      val t0 = uniquePk(existing)
      val after = MutationOps.insertIgnoreDups(t0, df(batch), Seq("id"), col("ord"))
      assert(t0.as[(String, String)].collect().toSet
        .subsetOf(after.as[(String, String)].collect().toSet))
      val pks = after.select("id").as[String].collect()
      assert(pks.length == pks.distinct.length)
    }
  }

  test("property: delete∘insert of the same keys restores the PK set") {
    samples(rowGen, 8).foreach { rows =>
      val t0 = uniquePk(rows)
      val keys = t0.limit(3).select("id")
      val deleted = MutationOps.deleteByPk(t0, keys, Seq("id"))
      val restored = MutationOps.insertIgnoreDups(deleted,
        t0.join(keys, Seq("id"), "left_semi").withColumn("ord", lit(0L)),
        Seq("id"), col("ord"))
      assert(restored.select("id").as[String].collect().toSet ==
        t0.select("id").as[String].collect().toSet)
    }
  }

  test("property: sanitizer output always matches [a-z0-9_]*") {
    samples(Gen.asciiPrintableStr.map(_.take(40)), 200).foreach { name =>
      val out = PathOps.deriveTableName(name + ".csv")
      assert(out.matches("[a-z0-9_]*"), s"'$name' -> '$out'")
    }
  }
}
