package graft.operators

import org.apache.spark.sql.jdbc.JdbcDialects
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Postgres-dialect pin for the JDBC sink (S6): no Postgres server exists
  * in this environment (zero egress; `writeJdbc` is round-trip-proven
  * against embedded Derby in [[SalesSinkSpec]]), so this spec pins the
  * DDL Spark would generate against the REAL target instead — the column
  * types `sales.write.jdbc(url="jdbc:postgresql://…")` derives via
  * PostgresDialect must line up with the reference's published schema
  * (`README.md:120-131`: sale_price NUMERIC(12,2), sale_timestamp
  * TIMESTAMPTZ, TEXT strings, INT ints; insert columns
  * `database_service.py:251-265`). A Spark upgrade or schema drift that
  * would create a mismatched Postgres table fails here, not in prod.
  */
class JdbcDialectSpec extends SparkSpec {

  /** The sales frame schema as SalesEtl.transform emits it (9 columns,
    * V1.1 with modifiers). */
  private val salesSchema = StructType(Seq(
    StructField("item_name", StringType, nullable = false),
    StructField("sale_price", DecimalType(12, 2), nullable = false),
    StructField("qty", IntegerType, nullable = false),
    StructField("sale_timestamp", TimestampType, nullable = false),
    StructField("month", StringType, nullable = false),
    StructField("day_of_week", StringType, nullable = false),
    StructField("item_category", StringType, nullable = true),
    StructField("location_id", IntegerType, nullable = false),
    StructField("modifiers", StringType, nullable = true)))

  private val dialect = JdbcDialects.get("jdbc:postgresql://host/db")

  private def pgType(dt: DataType): String =
    dialect.getJDBCType(dt)
      .orElse(org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils
        .getCommonJDBCType(dt))
      .getOrElse(fail(s"no JDBC type for $dt"))
      .databaseTypeDefinition

  test("PostgresDialect resolves for postgres URLs") {
    assert(dialect.canHandle("jdbc:postgresql://host/db"))
  }

  test("sale_price maps to NUMERIC(12,2) — the money-exact reference " +
      "type, no float drift") {
    assert(pgType(DecimalType(12, 2)) === "NUMERIC(12,2)")
  }

  test("sale_timestamp maps to a tz-aware Postgres timestamp " +
      "(reference TIMESTAMPTZ)") {
    // Spark TimestampType is instant-semantics (tz-aware) — it must land
    // as TIMESTAMPTZ; the wall-clock NTZ type is the distinct
    // TIMESTAMP WITHOUT TIME ZONE
    assert(pgType(TimestampType) === "TIMESTAMP WITH TIME ZONE")
    // Postgres plain TIMESTAMP ≡ TIMESTAMP WITHOUT TIME ZONE
    assert(pgType(TimestampNTZType) === "TIMESTAMP")
  }

  test("string columns map to TEXT (reference item_name/month/... TEXT)") {
    assert(pgType(StringType) === "TEXT")
  }

  test("int columns map to INTEGER (reference qty/location_id INT)") {
    assert(pgType(IntegerType) === "INTEGER")
  }

  test("batchsize and isolationLevel options resolve as documented " +
      "(the remaining writeJdbc knobs a live Postgres would exercise)") {
    import org.apache.spark.sql.execution.datasources.jdbc.JDBCOptions
    // option PARSING is URL-agnostic; the Derby driver is the one on
    // this classpath (JDBCOptions resolves a driver at construction,
    // and no Postgres jar ships in the sandbox)
    def opts(extra: (String, String)*) = new JDBCOptions(Map(
      "url" -> "jdbc:derby:memory:optcheck;create=true",
      "driver" -> "org.apache.derby.jdbc.EmbeddedDriver",
      "dbtable" -> "sales") ++ extra)
    // batchsize: parsed, positive-validated — the value writeJdbc
    // forwards is what the executor-side insert loop batches on
    assert(opts("batchsize" -> "100").batchSize === 100)
    intercept[IllegalArgumentException] { opts("batchsize" -> "0").batchSize }
    // isolationLevel strings map to the java.sql.Connection constants —
    // a Spark upgrade silently changing this mapping would change the
    // sink's transactional behavior against the real target
    assert(opts().isolationLevel ===
      java.sql.Connection.TRANSACTION_READ_UNCOMMITTED) // Spark default
    assert(opts("isolationLevel" -> "NONE").isolationLevel ===
      java.sql.Connection.TRANSACTION_NONE)
    assert(opts("isolationLevel" -> "READ_COMMITTED").isolationLevel ===
      java.sql.Connection.TRANSACTION_READ_COMMITTED)
    assert(opts("isolationLevel" -> "REPEATABLE_READ").isolationLevel ===
      java.sql.Connection.TRANSACTION_REPEATABLE_READ)
    assert(opts("isolationLevel" -> "SERIALIZABLE").isolationLevel ===
      java.sql.Connection.TRANSACTION_SERIALIZABLE)
    intercept[IllegalArgumentException] {
      opts("isolationLevel" -> "SNAPSHOT").isolationLevel
    }
  }

  test("full generated DDL column list is pinned against the reference " +
      "schema") {
    val ddl = salesSchema.fields.map(f =>
      s"${f.name} ${pgType(f.dataType)}" +
        (if (f.nullable) "" else " NOT NULL")).mkString(", ")
    assert(ddl ===
      "item_name TEXT NOT NULL, " +
      "sale_price NUMERIC(12,2) NOT NULL, " +
      "qty INTEGER NOT NULL, " +
      "sale_timestamp TIMESTAMP WITH TIME ZONE NOT NULL, " +
      "month TEXT NOT NULL, " +
      "day_of_week TEXT NOT NULL, " +
      "item_category TEXT, " +
      "location_id INTEGER NOT NULL, " +
      "modifiers TEXT")
  }
}
