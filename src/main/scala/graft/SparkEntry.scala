package graft

import graft.connections.FileTableConnection
import graft.core._
import graft.operators.{DbReader, HwmColumn}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry reads its tables through graft operators (FileTableConnection
  * + DbReader + strategies) so the driver's DuckDB compare exercises the
  * engine, not bare `spark.read`.
  */
object SparkEntry {

  private def conn(spark: SparkSession, dir: String) =
    new FileTableConnection(spark, dir)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- DBReader pushdown surface (SURVEY §2.1/§2.2) --------------------
    "reader_snapshot_projection" -> ((s, dir) => {
      DbReader(conn(s, dir), "lineitem",
        columns = Seq("l_orderkey", "l_quantity", "l_returnflag"),
        where = Seq("l_returnflag = 'A'", "l_quantity <= 25"))
        .run()
        .orderBy(col("l_orderkey"), col("l_quantity"))
    }),
    "reader_incremental_window" -> ((s, dir) => {
      // second-run incremental semantics: stored HWM=o_orderkey 7500 →
      // window (7500, max]
      val store = new InMemoryHwmStore
      store.set(IntHwm("orders.o_orderkey", "orders", "o_orderkey", Some(7500L)))
      val df = Strategy.using(new IncrementalStrategy(store = store)) {
        DbReader(conn(s, dir), "orders", hwm = Some(HwmColumn("o_orderkey"))).run()
      }
      df.select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),
    "reader_snapshot_batch_union" -> ((s, dir) => {
      // stepping strategy: batches of 3000 keys unioned back == full table
      val b = SnapshotBatchStrategy(step = 3000L)
      val reader = DbReader(conn(s, dir), "orders", hwm = Some(HwmColumn("o_orderkey")))
      val frames = Strategy.using(b) { b.foreachBatch(reader.run()) }
      frames.reduce(_ unionAll _)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
             sum(col("o_totalprice").cast("decimal(18,2)")).as("total"))
        .orderBy(col("o_orderstatus"))
    }),

    // --- FileDF formats (SURVEY §2.4): write-read roundtrip through our
    // FileDFWriter/FileDFReader must preserve content exactly -------------
    "filedf_csv_roundtrip" -> ((s, dir) => {
      import graft.filedf._
      val tmp = java.nio.file.Files.createTempDirectory("graft_csv").toString
      val src = DbReader(conn(s, dir), "nation").run()
      FileDFWriter(Csv.withHeader(), tmp, DirIfExists.ReplaceEntireDirectory).run(src)
      FileDFReader(s, Csv.withHeader(), tmp, Some(src.schema)).run()
        .orderBy(col("n_nationkey"))
    }),
    "filedf_jsonline_roundtrip" -> ((s, dir) => {
      import graft.filedf._
      val tmp = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
      val src = DbReader(conn(s, dir), "region").run()
      FileDFWriter(JsonLine(), tmp, DirIfExists.ReplaceEntireDirectory).run(src)
      FileDFReader(s, JsonLine(), tmp, Some(src.schema)).run()
        .orderBy(col("r_regionkey"))
    }),
    "filedf_partitioned_orc" -> ((s, dir) => {
      import graft.filedf._
      val tmp = java.nio.file.Files.createTempDirectory("graft_orc").toString
      val src = DbReader(conn(s, dir), "customer").run()
      FileDFWriter(Orc(), tmp, DirIfExists.ReplaceEntireDirectory,
        partitionBy = Seq("c_mktsegment")).run(src)
      FileDFReader(s, Orc(), tmp).run()
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
             sum(col("c_acctbal").cast("decimal(18,2)")).as("balance"))
        .orderBy(col("c_mktsegment"))
    }),

    // --- Spark-native transform handoff (SURVEY §2.9) --------------------
    "q1_pricing_summary" -> ((s, dir) => {
      DbReader(conn(s, dir), "lineitem").run()
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(28,6)")).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "reader_snapshot_projection" ->
      """SELECT l_orderkey, l_quantity, l_returnflag FROM lineitem
        |WHERE l_returnflag = 'A' AND l_quantity <= 25
        |ORDER BY l_orderkey, l_quantity""".stripMargin,
    "reader_incremental_window" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_orderkey > 7500 ORDER BY o_orderkey""".stripMargin,
    "reader_snapshot_batch_union" ->
      """SELECT o_orderstatus, count(*) AS n,
        |       sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "filedf_csv_roundtrip" ->
      "SELECT * FROM nation ORDER BY n_nationkey",
    "filedf_jsonline_roundtrip" ->
      "SELECT * FROM region ORDER BY r_regionkey",
    "filedf_partitioned_orc" ->
      """SELECT c_mktsegment, count(*) AS n,
        |       sum(CAST(c_acctbal AS DECIMAL(18,2))) AS balance
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
        |       sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_base_price,
        |       sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS sum_disc_price,
        |       count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
  )
}
