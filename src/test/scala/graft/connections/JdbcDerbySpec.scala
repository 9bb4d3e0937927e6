package graft.connections

import graft.SparkSpec
import graft.core._
import graft.dialects.DerbyDialect
import graft.operators.{DbReader, DbWriter, HwmColumn}
import org.apache.spark.sql.functions._

/** Live end-to-end JDBC tests against in-process embedded Derby (ships with
  * Spark for the Hive metastore). This exercises the REAL jdbc paths that
  * the golden DialectSpec/JdbcReadPlanSpec tests can only check as strings:
  * driver-side fetch/execute, executor-side format("jdbc") reads through
  * the dialect-generated pushdown subquery, min/max window planning,
  * partitioned parallel reads, write modes, and the full incremental-HWM
  * slice of SURVEY §7.2. */
class JdbcDerbySpec extends SparkSpec {
  import spark.implicits._

  // keep derby.log out of the repo working tree
  System.setProperty("derby.system.home", tmpDir("derby-home"))

  private def newConn(db: String): JdbcConnection =
    new JdbcConnection(spark, DerbyDialect,
      JdbcOptions(url = s"jdbc:derby:memory:$db;create=true"))

  test("check + execute DDL/DML + fetch on the driver channel") {
    val c = newConn("drv")
    c.check()
    c.execute("CREATE TABLE t1 (id INT NOT NULL, name VARCHAR(20));")
    c.execute("INSERT INTO t1 VALUES (1, 'a'), (2, 'b'), (3, NULL)")
    val df = c.fetch("SELECT id, name FROM t1 ORDER BY id")
    assert(df.schema.fields.map(_.dataType.typeName).toSeq ==
      Seq("integer", "string"))
    assert(df.collect().map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "a"), (2, "b"), (3, null)))
    // RETURNING-style: execute that yields a ResultSet hands back a frame
    val back = c.execute("SELECT COUNT(*) FROM t1")
    assert(back.get.head().get(0).toString == "3")
  }

  test("executor read: pushdown subquery, schema probe, min/max, limit") {
    val c = newConn("rd")
    c.execute("CREATE TABLE evt (id BIGINT NOT NULL, val DOUBLE)")
    c.execute("INSERT INTO evt " +
      (1 to 100).map(i => s"VALUES ($i, ${i * 0.5})").mkString(" UNION ALL "))
    assert(c.getDfSchema("evt", Nil).fields.length == 2)
    assert(c.getMinMaxValues("evt", "id", Nil) == (Some(1L), Some(100L)))
    assert(c.getMinMaxValues("evt", "id", Seq("id <= 7")) ==
      (Some(1L), Some(7L)))
    val df = DbReader(c, "evt", columns = Seq("id"),
      where = Seq("id <= 10")).run()
    assert(df.columns.map(_.toLowerCase).toSeq == Seq("id"))
    assert(df.count() == 10)
    // dialect FETCH FIRST limit goes to the database, not df.limit
    assert(c.readSourceAsDf("evt", Nil, Nil, None, Some(5), None).count() == 5)
    assert(c.sql("SELECT id FROM evt WHERE id > 95").count() == 5)
  }

  test("incremental strategy end-to-end over a live database") {
    val c = newConn("inc")
    val store = new InMemoryHwmStore
    c.execute("CREATE TABLE orders (id BIGINT NOT NULL, amount DOUBLE)")
    c.execute("INSERT INTO orders " +
      (1 to 50).map(i => s"VALUES ($i, $i.0)").mkString(" UNION ALL "))
    val reader = DbReader(c, "orders", hwm = Some(HwmColumn("id")))

    val df1 = Strategy.using(new IncrementalStrategy(store = store)) {
      reader.run()
    }
    assert(df1.count() == 50)
    assert(store.get("orders.id").get.valueOpt.contains(50L))

    val df2 = Strategy.using(new IncrementalStrategy(store = store)) {
      reader.run()
    }
    assert(df2.count() == 0, "no new rows → empty frame")

    c.execute("INSERT INTO orders " +
      (51 to 75).map(i => s"VALUES ($i, $i.0)").mkString(" UNION ALL "))
    val df3 = Strategy.using(new IncrementalStrategy(store = store)) {
      reader.run()
    }
    assert(df3.count() == 25, "only the window (50, 75] is read")
    assert(df3.agg(min(col("id"))).head().getLong(0) == 51L)
    assert(store.get("orders.id").get.valueOpt.contains(75L))
  }

  test("mod-partitioned parallel read: N tasks, complete data, alias dropped") {
    val c0 = newConn("par")
    c0.execute("CREATE TABLE big (id BIGINT NOT NULL, v VARCHAR(10))")
    c0.execute("INSERT INTO big " +
      (1 to 90).map(i => s"VALUES ($i, 'v$i')").mkString(" UNION ALL "))
    val c = new JdbcConnection(spark, DerbyDialect,
      JdbcOptions(url = "jdbc:derby:memory:par"),
      Some(JdbcPartitioning(3, "id", PartitioningMode.Mod)))
    val df = c.readSourceAsDf("big", Nil, Nil, None, None, None)
    assert(df.rdd.getNumPartitions == 3, "one JDBC task per mod bucket")
    assert(df.count() == 90, "buckets must partition, not drop or dup, rows")
    assert(!df.columns.exists(_.toLowerCase.startsWith("generated_")),
      "synthesized partition column is dropped after load")
  }

  test("range-partitioned read auto-detects bounds with a MIN/MAX probe") {
    val c0 = newConn("rng")
    c0.execute("CREATE TABLE seq (id BIGINT NOT NULL, v INT)")
    c0.execute("INSERT INTO seq " +
      (100 to 400).map(i => s"VALUES ($i, $i)").mkString(" UNION ALL "))
    val c = new JdbcConnection(spark, DerbyDialect,
      JdbcOptions(url = "jdbc:derby:memory:rng"),
      Some(JdbcPartitioning(4, "id", PartitioningMode.Range)))
    val df = c.readSourceAsDf("seq", Nil, Nil, None, None, None)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 301)
    // stride partitioning must not drop boundary rows
    assert(df.agg(min(col("id")), max(col("id"))).head().toSeq ==
      Seq(100L, 400L))
  }

  test("driver-channel type mapping: date/timestamp/decimal/smallint/real") {
    val c = newConn("types")
    c.execute("""CREATE TABLE typed (
      d DATE, ts TIMESTAMP, dc DECIMAL(10,2), si SMALLINT, r REAL, b BOOLEAN)""")
    c.execute("INSERT INTO typed VALUES " +
      "(DATE('2024-03-15'), TIMESTAMP('2024-03-15 12:30:45'), " +
      "1234.56, 7, 2.5, true)")
    val df = c.fetch("SELECT * FROM typed")
    val f = df.schema.fields.map(x => x.name.toLowerCase -> x.dataType.typeName).toMap
    assert(f("d") == "date" && f("ts") == "timestamp" &&
      f("dc") == "decimal(10,2)" && f("si") == "short" &&
      f("r") == "float" && f("b") == "boolean", f.toString)
    val r = df.head()
    assert(r.getAs[java.sql.Date]("D").toString == "2024-03-15")
    assert(r.getAs[java.math.BigDecimal]("DC").toString == "1234.56")
    assert(r.getAs[Short]("SI") == 7.toShort)
  }

  test("Greenplum guard: >=100 parallel connections refused pre-flight") {
    val url = JdbcOptions(url = "jdbc:postgresql://localhost:1/absent")
    val storm = new GreenplumConnection(spark, url,
      Some(JdbcPartitioning(150, "id", PartitioningMode.Range,
        lowerBound = Some(0L), upperBound = Some(150L))))
    val e = intercept[IllegalStateException] {
      storm.readSourceAsDf("t", Nil, Nil, None, None, None)
    }
    assert(e.getMessage.contains("exceed"), e.getMessage)
    // under the limit the guard passes — failure is then the absent driver/
    // server, proving the read was attempted
    val ok = new GreenplumConnection(spark, url,
      Some(JdbcPartitioning(20, "id", PartitioningMode.Range,
        lowerBound = Some(0L), upperBound = Some(20L))))
    val e2 = intercept[Exception] {
      ok.readSourceAsDf("t", Nil, Nil, None, None, None)
    }
    assert(!e2.getMessage.contains("exceed"), e2.getMessage)
  }

  test("write modes: append creates, overwrite replaces, roundtrip survives") {
    val c = newConn("wr")
    val df = (1L to 20L).map(i => (i, s"s$i")).toDF("id", "name")
    DbWriter(c, "target", IfExists.Append).run(df)
    DbWriter(c, "target", IfExists.Append).run(df)
    assert(c.fetch("SELECT COUNT(*) FROM target").head().get(0).toString == "40")
    DbWriter(c, "target", IfExists.ReplaceEntireTable).run(df)
    assert(c.fetch("SELECT COUNT(*) FROM target").head().get(0).toString == "20")
    // Spark's JDBC writer creates case-preserving quoted columns, so
    // Derby-side SQL must quote them too
    val back = c.sql("""SELECT "id", "name" FROM target""")
    assert(back.orderBy(col("id")).collect().map(_.getLong(0)).toSeq ==
      (1L to 20L))
  }
}
