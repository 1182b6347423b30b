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

  test("AQE splits a skewed sort-merge join partition at runtime") {
    import org.apache.spark.sql.functions._
    // the no-code-change skew path (vs SkewJoin's explicit salting):
    // with AQE on (our deployment default), a sort-merge partition
    // dominated by one hot key is split into multiple tasks at
    // runtime. Thresholds are tuned down to test scale — production
    // keeps the 256MB default and the same mechanism fires.
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "24KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "12KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val old = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val big = ((1 to 60000).map(i => ("hot", i.toLong)) ++
        (1 to 2000).map(i => (s"k${i % 200}", i.toLong))).toDF("k", "v")
      val dim = (Seq("hot") ++ (0 until 200).map(i => s"k$i"))
        .map(k => (k, s"dim_$k")).toDF("k", "d")
      val joined = big.join(dim, Seq("k"))
      // execute through the frame's OWN QueryExecution (a noop write
      // would plan a fresh one and leave this plan isFinalPlan=false)
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("SortMergeJoin(skew=true)"),
        s"AQE did not mark the join skew-split:\n$plan")
      assert(plan.contains("AQEShuffleRead skewed"),
        s"AQE skew shuffle read absent:\n$plan")
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
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
