package graft.operators

import graft.SparkTestBase

class SkewJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("salted join returns exactly the rows of the plain join") {
    // one pathologically hot key + a long tail
    val big = ((1 to 5000).map(i => ("hot", i.toLong)) ++
      (1 to 500).map(i => (s"k$i", i.toLong))).toDF("k", "v")
    val small = (Seq("hot") ++ (1 to 250).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, s"dim$i") }.toDF("k", "d")

    val plain = big.join(small, Seq("k"))
      .as[(String, Long, String)].collect().toSet
    val salted = SkewJoin.saltedInnerJoin(big, small, Seq("k"), saltFactor = 8)
      .as[(String, Long, String)].collect().toSet
    assert(salted == plain)
    assert(plain.count(_._1 == "hot") == 5000)
  }

  test("salt scatter actually spreads the hot key") {
    import org.apache.spark.sql.functions._
    val big = (1 to 1000).map(i => ("hot", i.toLong)).toDF("k", "v")
    val salts = big.withColumn("__salt",
        pmod(xxhash64(big.columns.map(col): _*), lit(8)).cast("int"))
      .groupBy("__salt").count().collect()
    assert(salts.length == 8) // every salt bucket populated
    assert(salts.map(_.getLong(1)).max < 1000 * 0.3) // no bucket dominates
  }
}
