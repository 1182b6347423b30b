package graft.sinks

import java.sql.{Connection, DriverManager, PreparedStatement, ResultSet, SQLException, Types}
import java.util.UUID

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JDBC sink with the reference's Postgres mutation semantics
  * (process-pipeline.py:152-174 insert ON CONFLICT DO NOTHING, :177-207
  * upsert ON CONFLICT DO UPDATE SET col = EXCLUDED.col, :209-234 delete
  * by PK with a summed row count), re-expressed for Spark's execution
  * model: the reference ships every row through one driver-side
  * executemany loop; here each executor partition opens its own
  * connection and writes its split, so sink throughput scales with the
  * cluster, not the driver.
  *
  * Conflict handling is staged, not per-row: each partition batch-loads
  * its rows into a private staging table (`addBatch`/`executeBatch`,
  * honoring the reference's BATCH_SIZE contract, :28-29) and issues ONE
  * set-based MERGE against the target — the canonical bulk-upsert shape
  * for any MERGE-capable SQL engine (SQL:2003; Postgres 15+, Derby
  * 10.11+). Derby rejects derived-table MERGE sources ("must be a base
  * table"), so staging is also the portable choice.
  *
  * Identifier style mirrors the reference exactly: table names unquoted,
  * column names double-quoted (insert_csv_data's f'"{col}"').
  *
  * Tested against in-process `jdbc:derby:memory` (the Derby jars ship
  * with Spark for the Hive metastore); production targets a network
  * database, where per-partition connections come from each executor.
  * In-batch duplicate-PK resolution (reference: executemany order makes
  * inserts keep-FIRST and upserts keep-LAST) is applied in Spark as a
  * window dedup BEFORE the write — a set-based MERGE requires unique
  * source keys, and at 100 TB a pre-shuffle dedup is one narrow pass
  * instead of N-1 wasted round trips.
  */
object JdbcSink {

  // Keep Derby's engine log out of the working directory: its home must
  // be set before the embedded engine boots (first getConnection).
  private lazy val derbyHome: Unit = {
    val home = new java.io.File(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft-derby")
    home.mkdirs()
    if (sys.props.get("derby.system.home").isEmpty)
      System.setProperty("derby.system.home", home.getAbsolutePath)
  }

  def withConnection[A](url: String)(f: Connection => A): A = {
    derbyHome
    val conn = DriverManager.getConnection(url)
    try f(conn) finally conn.close()
  }

  private def q(col: String): String = "\"" + col + "\""

  /** Spark type → portable DDL type (the subset the engine's tables use). */
  def ddlType(dt: DataType): String = dt match {
    case IntegerType => "INTEGER"
    case LongType => "BIGINT"
    case ShortType => "SMALLINT"
    case DoubleType => "DOUBLE"
    case FloatType => "REAL"
    case BooleanType => "BOOLEAN"
    case DateType => "DATE"
    case TimestampType => "TIMESTAMP"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case StringType => "VARCHAR(8192)"
    case other => throw new IllegalArgumentException(
      s"no JDBC DDL mapping for $other")
  }

  /** O9 twin (process-pipeline.py create-if-absent): CREATE TABLE from the
    * DataFrame schema with a PRIMARY KEY constraint; an existing table is
    * left untouched (Derby SQLState X0Y32 = object already exists).
    */
  def createTableIfAbsent(url: String, table: String, schema: StructType,
      pkCols: Seq[String]): Unit = withConnection(url) { conn =>
    val cols = schema.fields.map { f =>
      val notNull = if (pkCols.contains(f.name)) " NOT NULL" else ""
      s"${q(f.name)} ${ddlType(f.dataType)}$notNull"
    }
    val pk = if (pkCols.isEmpty) ""
      else s", PRIMARY KEY (${pkCols.map(q).mkString(", ")})"
    val ddl = s"CREATE TABLE $table (${cols.mkString(", ")}$pk)"
    val st = conn.createStatement()
    try st.executeUpdate(ddl)
    catch { case e: SQLException if e.getSQLState == "X0Y32" => () }
    finally st.close()
  }

  /** O10 twin — the reference's information_schema.columns query
    * (process-pipeline.py:131-150), via JDBC metadata, ordinal order.
    */
  def tableColumns(url: String, table: String): Seq[String] =
    withConnection(url) { conn =>
      val rs = conn.getMetaData.getColumns(null, null, table.toUpperCase, null)
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
      while (rs.next())
        buf += rs.getInt("ORDINAL_POSITION") -> rs.getString("COLUMN_NAME")
      buf.sortBy(_._1).map(_._2).toSeq
    }

  /** O11 twin — the reference's pg_index PK lookup, via JDBC metadata. */
  def primaryKeyColumns(url: String, table: String): Seq[String] =
    withConnection(url) { conn =>
      val rs = conn.getMetaData.getPrimaryKeys(null, null, table.toUpperCase)
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Short, String)]
      while (rs.next())
        buf += rs.getShort("KEY_SEQ") -> rs.getString("COLUMN_NAME")
      buf.sortBy(_._1).map(_._2).toSeq
    }

  /** Plain distributed append — the reference's executemany INSERT
    * (process-pipeline.py:152-174) per partition: one connection, batched
    * per BATCH_SIZE, transactional. Not Spark's built-in JDBC writer: that
    * one derives parameter null-types from the dialect's preferred
    * mapping (Derby: StringType→CLOB), which fails against the VARCHAR
    * columns this sink creates; binding against the live column types is
    * dialect-independent.
    */
  def append(df: DataFrame, url: String, table: String,
      batchSize: Int = 1000): Unit = {
    // same concurrent-writer cap as the MERGE paths: every partition is
    // one INSERT transaction against the single target table, and past
    // a modest writer count the database's lock manager serializes them
    // anyway — measured at the 100× probe, an uncapped scan fanned the
    // 1.5M-row customer seed into enough concurrent writers that the
    // append ran >20 min; capped it is ~a minute
    val aligned = capWriters(alignToTable(df, url, table))
    val schema = aligned.schema
    val colList = schema.fields.map(f => q(f.name)).mkString(", ")
    val sql = s"INSERT INTO $table ($colList) VALUES " +
      s"(${schema.fields.map(_ => "?").mkString(", ")})"
    aligned.foreachPartition { rows: Iterator[Row] =>
      if (rows.hasNext) {
        derbyHome
        val conn = DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val ps = conn.prepareStatement(sql)
          var pending = 0
          rows.foreach { row =>
            schema.fields.zipWithIndex.foreach { case (f, i) =>
              setParam(ps, i + 1, row.get(i), f.dataType)
            }
            ps.addBatch(); pending += 1
            if (pending >= batchSize) { ps.executeBatch(); pending = 0 }
          }
          if (pending > 0) ps.executeBatch()
          ps.close()
          conn.commit()
        } catch {
          case e: Throwable => conn.rollback(); throw e
        } finally conn.close()
      }
    }
  }

  private def setParam(ps: PreparedStatement, i: Int, v: Any, dt: DataType): Unit =
    v match {
      case null => ps.setNull(i, dt match {
        case IntegerType => Types.INTEGER
        case LongType => Types.BIGINT
        case DoubleType => Types.DOUBLE
        case BooleanType => Types.BOOLEAN
        case DateType => Types.DATE
        case TimestampType => Types.TIMESTAMP
        case _: DecimalType => Types.DECIMAL
        case _ => Types.VARCHAR
      })
      case x => ps.setObject(i, x)
    }

  /** Stage a partition's rows into a private temp table and run ONE
    * set-based statement against the target; transactional per
    * partition (the reference commits/rolls back per call). Returns the statement's
    * update count (0 for an empty partition) — MERGE callers ignore
    * it, the staged delete sums it.
    */
  private def stageAndRun(rows: Iterator[Row], url: String, schema: StructType,
      batchSize: Int, indexCols: Seq[String] = Nil)(
      stmt: String => String): Long = {
    if (!rows.hasNext) return 0L
    derbyHome
    val conn = DriverManager.getConnection(url)
    try {
      conn.setAutoCommit(false)
      val stg = "STG_" + UUID.randomUUID().toString.replace("-", "").take(24)
      val st = conn.createStatement()
      val colsDdl = schema.fields
        .map(f => s"${q(f.name)} ${ddlType(f.dataType)}").mkString(", ")
      st.executeUpdate(s"CREATE TABLE $stg ($colsDdl)")
      // an index on the staged key lets the database probe the stage
      // from the target side: without it a DELETE … WHERE EXISTS can
      // plan as target-scan × unindexed-stage nested loop — measured as
      // a >10-minute hang at the 100× probe (1.5M target × 60k stage)
      if (indexCols.nonEmpty)
        st.executeUpdate(s"CREATE INDEX ${stg}_IX ON $stg " +
          s"(${indexCols.map(q).mkString(", ")})")
      val ins = conn.prepareStatement(
        s"INSERT INTO $stg VALUES (${schema.fields.map(_ => "?").mkString(", ")})")
      var pending = 0
      rows.foreach { row =>
        schema.fields.zipWithIndex.foreach { case (f, i) =>
          setParam(ins, i + 1, row.get(i), f.dataType)
        }
        ins.addBatch(); pending += 1
        if (pending >= batchSize) { ins.executeBatch(); pending = 0 }
      }
      if (pending > 0) ins.executeBatch()
      ins.close()
      val n = st.executeUpdate(stmt(stg)).toLong
      st.executeUpdate(s"DROP TABLE $stg")
      st.close()
      conn.commit()
      n
    } catch {
      case e: Throwable => conn.rollback(); throw e
    } finally conn.close()
  }

  private def dedupByPk(df: DataFrame, pkCols: Seq[String], ord: Column,
      keepFirst: Boolean): DataFrame = {
    val w = Window.partitionBy(pkCols.map(col): _*)
      .orderBy(if (keepFirst) ord.asc else ord.desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Concurrent-writer cap: every partition is one MERGE transaction
    * against the target, and most databases (embedded Derby included)
    * degrade past a modest writer count through lock contention — the
    * bottleneck is the single target table, so extra writers add
    * contention, not throughput. Tunable per target via
    * `spark.graft.jdbc.maxWriters`.
    */
  private def capWriters(df: DataFrame): DataFrame = {
    val max = df.sparkSession.conf
      .getOption("spark.graft.jdbc.maxWriters").map(_.toInt).getOrElse(8)
    // coalesce never increases partition count and needs no shuffle
    df.coalesce(max)
  }

  /** Keep only the incoming columns that exist in the target table (the
    * reference renders its statements from ordered_columns intersected
    * with the live DB schema) — this also lets callers carry transient
    * ordering columns through `ord` without landing them.
    */
  private def alignToTable(df: DataFrame, url: String, table: String): DataFrame = {
    val tcols = tableColumns(url, table).toSet
    df.select(df.columns.filter(tcols.contains).map(col): _*)
  }

  /** O12 twin — INSERT … ON CONFLICT DO NOTHING. In-batch duplicate PKs
    * keep-FIRST in `ord` order (the reference's executemany order);
    * rows whose PK already exists in the target are skipped.
    */
  def insertIgnore(df: DataFrame, url: String, table: String,
      pkCols: Seq[String], ord: Column, batchSize: Int = 1000): Unit = {
    require(pkCols.nonEmpty, "insertIgnore requires a primary key")
    val deduped = capWriters(
      alignToTable(dedupByPk(df, pkCols, ord, keepFirst = true), url, table))
    val schema = deduped.schema
    val onClause = pkCols.map(c => s"t.${q(c)} = v.${q(c)}").mkString(" AND ")
    val colList = schema.fields.map(f => q(f.name)).mkString(", ")
    val valList = schema.fields.map(f => s"v.${q(f.name)}").mkString(", ")
    deduped.foreachPartition { rows: Iterator[Row] =>
      stageAndRun(rows, url, schema, batchSize) { stg =>
        s"""MERGE INTO $table t USING $stg v ON $onClause
           |WHEN NOT MATCHED THEN INSERT ($colList) VALUES ($valList)""".stripMargin
      }
      ()
    }
  }

  /** O13 twin — INSERT … ON CONFLICT (pk) DO UPDATE SET col = EXCLUDED.col.
    * Validates the batch carries every PK column exactly like the
    * reference (:179-181); in-batch duplicate PKs keep-LAST in `ord`
    * order.
    */
  def upsert(df: DataFrame, url: String, table: String,
      pkCols: Seq[String], ord: Column, batchSize: Int = 1000): Unit = {
    require(pkCols.nonEmpty, "upsert requires a primary key")
    val missing = pkCols.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"CSV data must contain all primary key columns; missing: ${missing.mkString(", ")}")
    val deduped = capWriters(
      alignToTable(dedupByPk(df, pkCols, ord, keepFirst = false), url, table))
    val schema = deduped.schema
    val onClause = pkCols.map(c => s"t.${q(c)} = v.${q(c)}").mkString(" AND ")
    val colList = schema.fields.map(f => q(f.name)).mkString(", ")
    val valList = schema.fields.map(f => s"v.${q(f.name)}").mkString(", ")
    val setList = schema.fields.map(_.name).filterNot(pkCols.contains)
      .map(c => s"${q(c)} = v.${q(c)}").mkString(", ")
    deduped.foreachPartition { rows: Iterator[Row] =>
      stageAndRun(rows, url, schema, batchSize) { stg =>
        s"""MERGE INTO $table t USING $stg v ON $onClause
           |WHEN MATCHED THEN UPDATE SET $setList
           |WHEN NOT MATCHED THEN INSERT ($colList) VALUES ($valList)""".stripMargin
      }
      ()
    }
  }

  /** O14 twin — DELETE by PK. The reference executes one DELETE per row
    * and sums cursor.rowcount (:215-223); here each partition issues one
    * batched statement and the counts flow back through an accumulator.
    * Returns the total deleted (the reference's deleted_count).
    */
  def deleteByPk(keys: DataFrame, url: String, table: String,
      pkCols: Seq[String], batchSize: Int = 1000): Long = {
    require(pkCols.nonEmpty, "delete requires a primary key")
    val distinctKeys = keys.select(pkCols.map(col): _*).distinct()
    val schema = distinctKeys.schema
    val whereClause = pkCols.map(c => s"${q(c)} = ?").mkString(" AND ")
    val sql = s"DELETE FROM $table WHERE $whereClause"
    val deleted = keys.sparkSession.sparkContext.longAccumulator("jdbc_deleted")
    distinctKeys.foreachPartition { rows: Iterator[Row] =>
      if (rows.hasNext) {
        derbyHome
        val conn = DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val ps = conn.prepareStatement(sql)
          var pending = 0
          def flush(): Unit = if (pending > 0) {
            deleted.add(ps.executeBatch().filter(_ > 0).map(_.toLong).sum)
            pending = 0
          }
          rows.foreach { row =>
            schema.fields.zipWithIndex.foreach { case (f, i) =>
              setParam(ps, i + 1, row.get(i), f.dataType)
            }
            ps.addBatch(); pending += 1
            if (pending >= batchSize) flush()
          }
          flush()
          ps.close()
          conn.commit()
        } catch {
          case e: Throwable => conn.rollback(); throw e
        } finally conn.close()
      }
    }
    deleted.value
  }

  /** Set-based DELETE by PK — the op07/op08 staged-MERGE pattern
    * applied to O14: each partition batch-loads its key split into a
    * private staging table and issues ONE
    * `DELETE … WHERE EXISTS (SELECT 1 FROM stg …)` against the target,
    * so the database resolves the whole split in one set operation
    * (index semi-join) instead of one index lookup per key statement.
    * [[deleteByPk]] remains the reference-parity mode (one batched
    * DELETE per key, summed rowcounts — process-pipeline.py:215-223);
    * this is the shape a bulk retention/GDPR pass runs at scale.
    * Returns the total deleted, identical to deleteByPk's count (keys
    * absent from the target naturally count zero in both).
    */
  def deleteByPkStaged(keys: DataFrame, url: String, table: String,
      pkCols: Seq[String], batchSize: Int = 1000): Long = {
    require(pkCols.nonEmpty, "delete requires a primary key")
    val distinctKeys = capWriters(keys.select(pkCols.map(col): _*).distinct())
    val schema = distinctKeys.schema
    val onClause = pkCols.map(c => s"t.${q(c)} = v.${q(c)}").mkString(" AND ")
    val deleted =
      keys.sparkSession.sparkContext.longAccumulator("jdbc_deleted_staged")
    distinctKeys.foreachPartition { rows: Iterator[Row] =>
      deleted.add(stageAndRun(rows, url, schema, batchSize,
        indexCols = pkCols) { stg =>
        s"DELETE FROM $table t WHERE EXISTS (SELECT 1 FROM $stg v WHERE $onClause)"
      })
    }
    deleted.value
  }

  /** Read a table back through Spark's JDBC source. With `partitionCol`
    * the scan splits into `numPartitions` bounded range predicates; the
    * min/max bound fetch is a two-value control-plane query, same class
    * as the catalog's MAX-version reads (SURVEY §7).
    */
  def read(spark: SparkSession, url: String, table: String,
      partitionCol: Option[String] = None, numPartitions: Int = 4): DataFrame = {
    derbyHome
    val base = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
    partitionCol match {
      case Some(pc) =>
        val (lo, hi) = withConnection(url) { conn =>
          val st = conn.createStatement()
          try {
            val rs = st.executeQuery(
              s"SELECT MIN(${q(pc)}), MAX(${q(pc)}) FROM $table")
            rs.next()
            (rs.getLong(1), rs.getLong(2))
          } finally st.close()
        }
        base.option("partitionColumn", pc)
          .option("lowerBound", lo).option("upperBound", math.max(hi, lo + 1))
          .option("numPartitions", numPartitions)
          .load()
      case None => base.load()
    }
  }

  /** Drop an in-memory Derby database (success reported via SQLState
    * 08006, Derby's shutdown convention).
    */
  def dropInMemory(dbName: String): Unit =
    try DriverManager.getConnection(s"jdbc:derby:memory:$dbName;drop=true")
    catch { case e: SQLException if e.getSQLState == "08006" => () }
}
