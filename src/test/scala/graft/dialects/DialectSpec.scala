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

  // -------------------------------------------------------------------
  // Full conformance sweep against the reference's test_dialect_unit.py
  // (cited per test) — every assertion in that file mirrored here as the
  // single-line rendering this compiler emits (the reference's
  // compact=True form modulo line folding; clause ORDER and clause
  // CONTENT are what the remote engine parses, and those match
  // token-for-token).

  test("no-columns spellings all render SELECT * " +
       "(test_dialect_unit.py:11-36 — None / '*' / ['*'] / [])") {
    for (cols <- Seq(Nil, Seq("*")))
      assert(d.getSqlQuery("default.test", columns = cols) ==
        "SELECT * FROM default.test")
  }

  test("postgres-family keeps '*' verbatim when mixed with columns " +
       "(test_dialect_unit.py:39-58)") {
    assert(PostgresDialect.getSqlQuery("default.test",
        columns = Seq("*", "d_id", "d_name", "d_age")) ==
      "SELECT *, d_id, d_name, d_age FROM default.test")
  }

  test("oracle rewrites mixed '*' to table.* but keeps lone ['*'] as * " +
       "(test_dialect_unit.py:61-96)") {
    assert(OracleDialect.getSqlQuery("default.test", columns = Seq("*")) ==
      "SELECT * FROM default.test")
    assert(OracleDialect.getSqlQuery("default.test",
        columns = Seq("*", "d_id", "d_name", "d_age")) ==
      "SELECT default.test.*, d_id, d_name, d_age FROM default.test")
  }

  test("where as single string renders bare " +
       "(test_dialect_unit.py:99-117)") {
    assert(PostgresDialect.getSqlQuery("default.test",
        where = Seq("d_id > 100")) ==
      "SELECT * FROM default.test WHERE d_id > 100")
  }

  test("where list AND-joins parenthesized conjuncts " +
       "(test_dialect_unit.py:120-140)") {
    assert(PostgresDialect.getSqlQuery("default.test",
        where = Seq("d_id > 100", "d_id < 200")) ==
      "SELECT * FROM default.test WHERE (d_id > 100) AND (d_id < 200)")
  }

  test("hint renders as optimizer comment after SELECT " +
       "(test_dialect_unit.py:143-160)") {
    assert(OracleDialect.getSqlQuery("default.test", hint = Some("NOWAIT")) ==
      "SELECT /*+ NOWAIT */ * FROM default.test")
  }

  test("all clauses combine in SELECT/FROM/WHERE/LIMIT order " +
       "(test_dialect_unit.py:203-261 compact matrix)") {
    assert(MySqlDialect.getSqlQuery("default.test", hint = Some("NOWAIT"),
        columns = Seq("d_id", "d_name", "d_age"),
        where = Seq("d_id > 100", "d_id < 200"), limit = Some(5)) ==
      "SELECT /*+ NOWAIT */ d_id, d_name, d_age FROM default.test " +
        "WHERE (d_id > 100) AND (d_id < 200) LIMIT 5")
  }

  test("oracle limit × where matrix " +
       "(test_dialect_unit.py:264-281: ROWNUM conjoins with user where)") {
    val t = "default.test"
    assert(OracleDialect.getSqlQuery(t) == s"SELECT * FROM $t")
    assert(OracleDialect.getSqlQuery(t, limit = Some(0)) ==
      s"SELECT * FROM $t WHERE 1 = 0")
    assert(OracleDialect.getSqlQuery(t, limit = Some(5)) ==
      s"SELECT * FROM $t WHERE ROWNUM <= 5")
    assert(OracleDialect.getSqlQuery(t, where = Seq("column1 = 'value'")) ==
      s"SELECT * FROM $t WHERE column1 = 'value'")
    assert(OracleDialect.getSqlQuery(t, where = Seq("column1 = 'value'"),
        limit = Some(0)) == s"SELECT * FROM $t WHERE 1 = 0")
    assert(OracleDialect.getSqlQuery(t, where = Seq("column1 = 'value'"),
        limit = Some(5)) ==
      s"SELECT * FROM $t WHERE (column1 = 'value') AND (ROWNUM <= 5)")
  }

  test("mssql limit × where matrix " +
       "(test_dialect_unit.py:284-302: TOP replaces LIMIT, where unchanged)") {
    val t = "default.test"
    assert(MssqlDialect.getSqlQuery(t) == s"SELECT * FROM $t")
    assert(MssqlDialect.getSqlQuery(t, limit = Some(0)) ==
      s"SELECT * FROM $t WHERE 1 = 0")
    assert(MssqlDialect.getSqlQuery(t, limit = Some(5)) ==
      s"SELECT TOP 5 * FROM $t")
    assert(MssqlDialect.getSqlQuery(t, where = Seq("column1 = 'value'")) ==
      s"SELECT * FROM $t WHERE column1 = 'value'")
    assert(MssqlDialect.getSqlQuery(t, where = Seq("column1 = 'value'"),
        limit = Some(0)) == s"SELECT * FROM $t WHERE 1 = 0")
    assert(MssqlDialect.getSqlQuery(t, where = Seq("column1 = 'value'"),
        limit = Some(5)) ==
      s"SELECT TOP 5 * FROM $t WHERE column1 = 'value'")
  }
}
