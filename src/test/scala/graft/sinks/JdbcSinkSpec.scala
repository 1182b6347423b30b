package graft.sinks

import java.util.UUID

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** JdbcSink semantics against in-process Derby: the reference's Postgres
  * contract (insert ON CONFLICT DO NOTHING keep-first, upsert DO UPDATE
  * keep-last, delete-by-PK with summed row count) plus the Spark-side
  * concerns the reference never had — multi-partition writers and
  * transient ordering columns.
  */
class JdbcSinkSpec extends SparkTestBase {
  import spark.implicits._

  private def freshUrl(): String =
    s"jdbc:derby:memory:spec${UUID.randomUUID().toString.replace("-", "").take(12)};create=true"

  private def baseDf = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("k", "name", "bal")

  test("createTableIfAbsent is idempotent and introspection round-trips") {
    val url = freshUrl()
    val df = Seq((1L, 2, "x")).toDF("pk_a", "pk_b", "payload")
    JdbcSink.createTableIfAbsent(url, "t2", df.schema, Seq("pk_a", "pk_b"))
    JdbcSink.createTableIfAbsent(url, "t2", df.schema, Seq("pk_a", "pk_b"))
    assert(JdbcSink.tableColumns(url, "t2") == Seq("pk_a", "pk_b", "payload"))
    assert(JdbcSink.primaryKeyColumns(url, "t2") == Seq("pk_a", "pk_b"))
  }

  test("append + read round-trips values including nulls") {
    val url = freshUrl()
    val df = Seq[(java.lang.Long, String, java.lang.Double)](
      (1L, "a", 10.0), (2L, null, null)
    ).toDF("k", "name", "bal")
    JdbcSink.createTableIfAbsent(url, "t", df.schema, Seq("k"))
    JdbcSink.append(df, url, "t")
    val back = JdbcSink.read(spark, url, "t").orderBy($"k")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), Option(r.get(2))))
    assert(back.toSeq == Seq((1L, Some("a"), Some(10.0)), (2L, None, None)))
  }

  test("insertIgnore keeps existing rows and resolves in-batch dups keep-first") {
    val url = freshUrl()
    JdbcSink.createTableIfAbsent(url, "t", baseDf.schema, Seq("k"))
    JdbcSink.append(baseDf, url, "t")
    val incoming = Seq(
      (2L, "CLOBBER", 0.0, 1L),  // conflicts with existing -> dropped
      (4L, "first", 40.0, 1L),   // in-batch dup, earlier ord -> kept
      (4L, "second", 44.0, 2L),
      (5L, "e", 50.0, 1L)
    ).toDF("k", "name", "bal", "ord")
    JdbcSink.insertIgnore(incoming, url, "t", Seq("k"), $"ord")
    val got = JdbcSink.read(spark, url, "t").orderBy($"k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, "first", 40.0), (5L, "e", 50.0)))
  }

  test("upsert updates matches, inserts novel keys, resolves in-batch dups keep-last") {
    val url = freshUrl()
    JdbcSink.createTableIfAbsent(url, "t", baseDf.schema, Seq("k"))
    JdbcSink.append(baseDf, url, "t")
    val batch = Seq(
      (2L, "b_v1", 21.0, 1L),
      (2L, "b_v2", 22.0, 2L),   // later ord wins
      (9L, "i", 90.0, 1L)
    ).toDF("k", "name", "bal", "ord")
    JdbcSink.upsert(batch, url, "t", Seq("k"), $"ord")
    val got = JdbcSink.read(spark, url, "t").orderBy($"k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, "a", 10.0), (2L, "b_v2", 22.0),
      (3L, "c", 30.0), (9L, "i", 90.0)))
  }

  test("upsert validates PK columns present like the reference") {
    val url = freshUrl()
    JdbcSink.createTableIfAbsent(url, "t", baseDf.schema, Seq("k"))
    val noPk = Seq(("a", 1.0)).toDF("name", "bal")
    val e = intercept[IllegalArgumentException] {
      JdbcSink.upsert(noPk, url, "t", Seq("k"), lit(1))
    }
    assert(e.getMessage.contains("primary key"))
  }

  test("deleteByPk returns the total deleted; absent keys count zero") {
    val url = freshUrl()
    JdbcSink.createTableIfAbsent(url, "t", baseDf.schema, Seq("k"))
    JdbcSink.append(baseDf, url, "t")
    val keys = Seq(1L, 3L, 99L).toDF("k")
    assert(JdbcSink.deleteByPk(keys, url, "t", Seq("k")) == 2L)
    val left = JdbcSink.read(spark, url, "t").collect().map(_.getLong(0))
    assert(left.toSeq == Seq(2L))
  }

  test("deleteByPkStaged matches deleteByPk: count, survivors, absent keys") {
    val url = freshUrl()
    JdbcSink.createTableIfAbsent(url, "t", baseDf.schema, Seq("k"))
    JdbcSink.append(baseDf, url, "t")
    val keys = Seq(1L, 3L, 99L).toDF("k")
    assert(JdbcSink.deleteByPkStaged(keys, url, "t", Seq("k")) == 2L)
    val left = JdbcSink.read(spark, url, "t").collect().map(_.getLong(0))
    assert(left.toSeq == Seq(2L))
    // deleting the same keys again: nothing left to delete, count 0
    assert(JdbcSink.deleteByPkStaged(keys, url, "t", Seq("k")) == 0L)
  }

  test("many-partition staged delete sums counts without double-counting") {
    val url = freshUrl()
    val seed = (1L to 300L).map(i => (i, s"n$i", i.toDouble)).toDF("k", "name", "bal")
    JdbcSink.createTableIfAbsent(url, "t", seed.schema, Seq("k"))
    JdbcSink.append(seed, url, "t")
    // duplicate keys in the batch must not double-count: distinct first
    val keys = ((1L to 100L) ++ (1L to 100L) ++ (290L to 310L)).toDF("k")
      .repartition(8)
    assert(JdbcSink.deleteByPkStaged(keys, url, "t", Seq("k")) == 111L)
    assert(JdbcSink.read(spark, url, "t").count() == 189L)
  }

  test("many-partition upsert loses no rows under concurrent writers") {
    val url = freshUrl()
    val seed = (1L to 200L).map(i => (i, s"n$i", i.toDouble)).toDF("k", "name", "bal")
    JdbcSink.createTableIfAbsent(url, "t", seed.schema, Seq("k"))
    JdbcSink.append(seed, url, "t")
    val batch = (101L to 400L).map(i => (i, s"u$i", -i.toDouble))
      .toDF("k", "name", "bal").repartition(8)
    JdbcSink.upsert(batch, url, "t", Seq("k"), $"k", batchSize = 32)
    val got = JdbcSink.read(spark, url, "t", partitionCol = Some("k"), numPartitions = 3)
    assert(got.count() == 400L)
    assert(got.filter($"name".startsWith("u")).count() == 300L)
    assert(got.filter($"k" <= 100 && $"bal" < 0).count() == 0L)
  }
}
