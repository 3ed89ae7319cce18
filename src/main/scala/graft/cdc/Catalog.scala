package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-catalog resolution (reference O11/O12). The reference fires
  * two `information_schema` queries per DML event over a live MySQL
  * connection (/root/reference/log2sql.py:29-46, quirk Q7: N+1 +
  * injection-prone string SQL); the engine reads the catalog ONCE —
  * from a snapshot (fixture DataFrames shaped like the
  * `information_schema.columns` / `.STATISTICS` projections,
  * FIXTURES.md §3) or JDBC in production — resolves key columns per
  * table, and broadcast-joins it to the event stream.
  *
  * Key resolution: PRI columns if any; else the columns of the first
  * (min index_name — the reference's `LIMIT 1` with no ORDER BY is
  * nondeterministic, we pin it) unique index; else empty = keyless.
  */
object Catalog {

  /** columns: (table_schema, table_name, column_name, ordinal_position,
    * column_key); statistics: (table_schema, table_name, index_name,
    * non_unique, column_name). Returns one row per table:
    * (db, table, cols ARRAY<STRUCT<ord,name>>, key_cols ARRAY<STRING>).
    */
  def resolve(columns: DataFrame, statistics: DataFrame): DataFrame = {
    val cols = columns
      .groupBy(col("table_schema").as("db"), col("table_name").as("table"))
      .agg(
        sort_array(collect_list(struct(
          col("ordinal_position").as("ord"),
          col("column_name").as("name")))).as("cols"),
        sort_array(collect_list(when(col("column_key") === "PRI",
          struct(col("ordinal_position").as("ord"),
            col("column_name").as("name"))))).as("pk_structs"))
      .withColumn("pk_cols", expr("transform(pk_structs, s -> s.name)"))
      .drop("pk_structs")

    val uniqueIdx = statistics.filter(col("non_unique") === 0)
      .groupBy(col("table_schema").as("db"), col("table_name").as("table"))
      .agg(min("index_name").as("first_uniq"))
    val uniqueCols = statistics.filter(col("non_unique") === 0)
      .join(uniqueIdx,
        statistics("table_schema") === uniqueIdx("db") &&
          statistics("table_name") === uniqueIdx("table") &&
          statistics("index_name") === uniqueIdx("first_uniq"))
      .groupBy(col("db"), col("table"))
      .agg(collect_list(col("column_name")).as("uniq_cols"))

    cols.join(uniqueCols, Seq("db", "table"), "left")
      .withColumn("key_cols",
        when(size(col("pk_cols")) > 0, col("pk_cols"))
          .otherwise(coalesce(col("uniq_cols"),
            array().cast("array<string>"))))
      .select("db", "table", "cols", "key_cols")
  }

  /** MySQL `information_schema` projections the reference fires per
    * event (/root/reference/log2sql.py:29 columns,
    * log2sql.py:40-42 unique-index statistics) — here issued ONCE for
    * the whole catalog. */
  val DefaultColumnsQuery: String =
    "SELECT table_schema, table_name, column_name, ordinal_position, " +
      "column_key FROM information_schema.columns"
  val DefaultStatisticsQuery: String =
    "SELECT table_schema, table_name, index_name, non_unique, " +
      "column_name FROM information_schema.statistics"

  /** Live-catalog path: read the two information_schema projections
    * over JDBC (one round-trip each, broadcast downstream) instead of
    * snapshot CSVs. Default queries target MySQL — the system the
    * reference connects to (/root/reference/main.py:112); the query
    * strings are injectable so tests (and other dialects) can point
    * at equivalently-shaped tables. Column-name case from the driver
    * does not matter: Spark resolves case-insensitively by default. */
  def fromJdbc(spark: SparkSession, url: String,
      user: Option[String] = None, password: Option[String] = None,
      columnsQuery: String = DefaultColumnsQuery,
      statisticsQuery: String = DefaultStatisticsQuery): DataFrame = {
    def read(q: String): DataFrame = {
      var r = spark.read.format("jdbc").option("url", url).option("query", q)
      user.foreach(u => r = r.option("user", u))
      password.foreach(p => r = r.option("password", p))
      r.load()
    }
    resolve(read(columnsQuery), read(statisticsQuery))
  }

  /** The FIXTURES.md §3 snapshot: t_pk (PK), t_uniq (unique index
    * fallback), t_keyless (full-row WHERE). */
  def fixture(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val columns = Seq(
      ("testdb", "t_pk", "id", 1, "PRI"),
      ("testdb", "t_pk", "name", 2, ""),
      ("testdb", "t_pk", "score", 3, ""),
      ("testdb", "t_uniq", "id", 1, ""),
      ("testdb", "t_uniq", "code", 2, ""),
      ("testdb", "t_uniq", "val", 3, ""),
      ("testdb", "t_keyless", "a", 1, ""),
      ("testdb", "t_keyless", "b", 2, ""),
      ("otherdb", "t_pk", "id", 1, "PRI"),
      ("otherdb", "t_pk", "name", 2, ""),
      ("otherdb", "t_pk", "score", 3, ""))
      .toDF("table_schema", "table_name", "column_name",
        "ordinal_position", "column_key")
    val statistics = Seq(
      ("testdb", "t_pk", "PRIMARY", 0, "id"),
      ("testdb", "t_uniq", "ux_code", 0, "code"),
      ("otherdb", "t_pk", "PRIMARY", 0, "id"))
      .toDF("table_schema", "table_name", "index_name",
        "non_unique", "column_name")
    resolve(columns, statistics)
  }
}
