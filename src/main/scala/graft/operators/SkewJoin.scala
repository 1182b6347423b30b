package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salting for skewed keys — the manual fallback when AQE's runtime
  * skew-join splitting isn't available (e.g. a non-shuffle-join plan,
  * or pre-partitioned writes): explode the small side `saltFactor`
  * ways, scatter the big side uniformly with a deterministic salt, and
  * join on (keys, salt). Result rows are identical to the unsalted
  * join; the hot key's rows now land on `saltFactor` reducers instead
  * of one.
  *
  * Aggregations handle skew differently (two-phase partial aggregation
  * already splits hot groups map-side); salting matters for joins,
  * where every row of a hot key must meet every matching build row.
  */
object SkewJoin {

  /** Inner equi-join of a skewed `big` side against a `small` side.
    * The salt is a deterministic hash of the whole big-side row (xxhash
    * over all columns), so replays produce identical scatter.
    */
  def saltedInnerJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      saltFactor: Int = 8): DataFrame = {
    require(saltFactor >= 1)
    val salted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(saltFactor)).cast("int"))
    val exploded = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(exploded, keys :+ "__salt").drop("__salt")
  }
}
