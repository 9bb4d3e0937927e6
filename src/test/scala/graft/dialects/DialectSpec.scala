package graft.dialects

import java.time.{Instant, LocalDate}

import graft.core.{Edge, Window}
import org.scalatest.funsuite.AnyFunSuite

/** Golden-SQL tests mirroring the reference's
  * tests_db_connection_unit/test_dialect_unit.py. */
class DialectSpec extends AnyFunSuite {
  private val d = GenericDialect

  test("select all") {
    assert(d.getSqlQuery("schema.t") == "SELECT * FROM schema.t")
  }
  test("columns + aliases pass through verbatim") {
    assert(d.getSqlQuery("t", columns = Seq("a", "b AS c", "count(*) over ()")) ==
      "SELECT a, b AS c, count(*) over () FROM t")
  }
  test("single where renders bare; multiple conjuncts parenthesized") {
    assert(d.getSqlQuery("t", where = Seq("a > 1")) == "SELECT * FROM t WHERE a > 1")
    assert(d.getSqlQuery("t", where = Seq("a > 1", "b < 2")) ==
      "SELECT * FROM t WHERE (a > 1) AND (b < 2)")
  }
  test("limit 0 becomes WHERE 1 = 0 (empty probe)") {
    assert(d.getSqlQuery("t", where = Seq("a > 1"), limit = Some(0)) ==
      "SELECT * FROM t WHERE 1 = 0")
  }
  test("positive limit") {
    assert(d.getSqlQuery("t", limit = Some(5)) == "SELECT * FROM t LIMIT 5")
  }
  test("hint ignored when unsupported, rendered when supported") {
    assert(d.getSqlQuery("t", hint = Some("INDEX(t i)")) == "SELECT * FROM t")
    assert(OracleDialect.getSqlQuery("t", hint = Some("INDEX(t i)")) ==
      "SELECT /*+ INDEX(t i) */ * FROM t")
  }
  test("min/max probe query") {
    assert(d.getMinMaxQuery("t", "id", Seq("a > 1")) ==
      "SELECT MIN(id) AS \"min\", MAX(id) AS \"max\" FROM t WHERE a > 1")
  }
  test("window edges AND-combine with where; inclusivity controls operator") {
    val w = Window("id", Edge.exclusive(10L), Edge.inclusive(20L))
    assert(d.applyWindow(Seq("x = 1"), Some(w)) ==
      Seq("x = 1", "id > 10", "id <= 20"))
    val w2 = Window("id", Edge.inclusive(10L), Edge.exclusive(20L))
    assert(d.applyWindow(Nil, Some(w2)) == Seq("id >= 10", "id < 20"))
  }

  test("oracle: ROWNUM limit, t.* expansion, 1=0 probe") {
    assert(OracleDialect.getSqlQuery("t", limit = Some(5)) ==
      "SELECT * FROM t WHERE ROWNUM <= 5")
    assert(OracleDialect.getSqlQuery("t", columns = Seq("*", "id"), limit = Some(5)) ==
      "SELECT t.*, id FROM t WHERE ROWNUM <= 5")
    assert(OracleDialect.getSqlQuery("t", limit = Some(0)) ==
      "SELECT * FROM t WHERE 1 = 0")
  }
  test("derby: FETCH FIRST limit, t.* expansion, MOD partitioning, probe") {
    assert(DerbyDialect.getSqlQuery("t", limit = Some(5)) ==
      "SELECT * FROM t FETCH FIRST 5 ROWS ONLY")
    assert(DerbyDialect.getSqlQuery("t", columns = Seq("*", "id"), limit = Some(5)) ==
      "SELECT t.*, id FROM t FETCH FIRST 5 ROWS ONLY")
    assert(DerbyDialect.getSqlQuery("t", limit = Some(0)) ==
      "SELECT * FROM t WHERE 1 = 0")
    assert(DerbyDialect.partitionColumnMod("c", 8) == "MOD(ABS(c), 8)")
    assert(DerbyDialect.checkQuery == "VALUES 1")
    assert(OracleDialect.checkQuery == "SELECT 1 FROM dual")
    assert(GenericDialect.checkQuery == "SELECT 1")
  }
  test("mssql: TOP n") {
    assert(MssqlDialect.getSqlQuery("t", where = Seq("a > 1"), limit = Some(5)) ==
      "SELECT TOP 5 * FROM t WHERE a > 1")
    assert(MssqlDialect.getSqlQuery("t", limit = Some(0)) ==
      "SELECT * FROM t WHERE 1 = 0")
  }
  test("clickhouse: null-safe min/max") {
    assert(ClickhouseDialect.getMinMaxQuery("t", "id") ==
      "SELECT minOrNull(id) AS \"min\", maxOrNull(id) AS \"max\" FROM t")
  }

  test("datetime literal serialization per dialect") {
    val t = Instant.parse("2023-05-01T10:20:30.123456Z")
    assert(PostgresDialect.serializeValue(t) == "'2023-05-01T10:20:30.123456'::timestamp")
    assert(OracleDialect.serializeValue(t) ==
      "TO_DATE('2023-05-01 10:20:30', 'YYYY-MM-DD HH24:MI:SS')")
    assert(ClickhouseDialect.serializeValue(t) ==
      "toDateTime64('2023-05-01 10:20:30.123456', 6)")
    assert(MySqlDialect.serializeValue(t) ==
      "STR_TO_DATE('2023-05-01 10:20:30.123456', '%Y-%m-%d %H:%i:%s.%f')")
    assert(MssqlDialect.serializeValue(t) ==
      "CAST('2023-05-01T10:20:30.123456' AS datetime2)")
    assert(GreenplumDialect.serializeValue(t) ==
      "cast('2023-05-01T10:20:30.123456' as timestamp)")
    assert(SparkSqlDialect.serializeValue(t) ==
      "TIMESTAMP '2023-05-01 10:20:30.123456'")
  }
  test("date literal serialization per dialect") {
    val dt = LocalDate.of(2023, 5, 1)
    assert(PostgresDialect.serializeValue(dt) == "'2023-05-01'::date")
    assert(OracleDialect.serializeValue(dt) == "TO_DATE('2023-05-01', 'YYYY-MM-DD')")
    assert(SparkSqlDialect.serializeValue(dt) == "DATE '2023-05-01'")
  }
  test("string literals escape quotes") {
    assert(d.serializeValue("o'neil") == "'o''neil'")
  }

  test("hash/mod partition expressions per dialect") {
    assert(PostgresDialect.partitionColumnHash("id", 8) == "abs(hashtext(id::text)) % 8")
    assert(PostgresDialect.partitionColumnMod("id", 8) == "abs(id % 8)")
    assert(OracleDialect.partitionColumnHash("id", 8) == "ora_hash(id, 7)")
    assert(OracleDialect.partitionColumnMod("id", 8) == "ABS(MOD(id, 8))")
    assert(ClickhouseDialect.partitionColumnHash("id", 8) == "sipHash64(id) % 8")
    assert(MySqlDialect.partitionColumnHash("id", 8) ==
      "CAST(CONV(RIGHT(MD5(id), 16), 16, 10) AS UNSIGNED) % 8")
    assert(MssqlDialect.partitionColumnHash("id", 8) == "ABS(BINARY_CHECKSUM(id)) % 8")
    assert(SparkSqlDialect.partitionColumnHash("id", 8) == "pmod(xxhash64(id), 8)")
  }

  test("column escaping: quotes vs backticks") {
    assert(GenericDialect.escapeColumn("c") == "\"c\"")
    assert(MySqlDialect.escapeColumn("c") == "`c`")
    assert(SparkSqlDialect.escapeColumn("c") == "`c`")
  }
}
