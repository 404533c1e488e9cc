package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Graft, QueryDef}
import graft.sources.{Binding, Catalog, CsvGzip}

/** Source/sink operator coverage (SURVEY.md §2.1): CSV-gzip export +
  * schema-on-read roundtrip, day-sliced inserts, virtual file-metadata
  * columns, catalog bindings + SQL surface.
  */
object SourceQueries {

  // ---------------------------------------------------------------------
  // S3/S4/S7: export 3 days of events as CSVWithNames+gzip (single-pass
  // partitionBy: one scan, one directory of fresh objects per day),
  // re-read with an explicit schema, aggregate. The oracle computes the
  // same result straight from parquet, so the roundtrip itself is what's
  // being verified (README.md:145-168). The export path is deterministic
  // and written with mode=overwrite, so reruns replace instead of
  // accumulating gzipped copies in /tmp.
  val q13CsvRoundtrip = QueryDef(
    "q13_csv_roundtrip",
    (s, dir) => {
      val days = Seq("2024-01-05", "2024-01-06", "2024-01-07")
      val out = s"${sys.props("java.io.tmpdir")}/graft_csv_export"
      val e = Graft.table(s, dir, "events")
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
      CsvGzip.exportDaySliced(e, to_date(col("ts")), days, out,
        mode = "overwrite")
      val schema = StructType(Seq(
        StructField("event_id", LongType),
        StructField("ts", TimestampType),
        StructField("user_id", LongType),
        StructField("event_type", StringType),
        StructField("value", DoubleType)))
      CsvGzip.read(s, out, schema)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("value_sum"),
          min(to_date(col("ts"))).as("first_day"))
        .orderBy(col("event_type"))
    },
    Some("""
      SELECT event_type, CAST(count(1) AS BIGINT) AS n,
             round(sum(value), 2) AS value_sum,
             min(CAST(ts AS DATE)) AS first_day
      FROM events
      WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-05' AND DATE '2024-01-07'
      GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------------
  // S5: `_path`/`_file` virtual columns (README.md:150-154). The oracle
  // asserts derived properties (every row's provenance is a .parquet
  // file whose path contains the table name) rather than a literal file
  // name, so the check survives the table becoming a multi-part
  // directory.
  val q14FileMeta = QueryDef(
    "q14_file_meta",
    (s, dir) =>
      CsvGzip.withFileMeta(Graft.table(s, dir, "lineitem"))
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("_file").endsWith(".parquet") &&
            col("_path").contains("lineitem"), 1L).otherwise(0L))
            .as("n_provenance_ok")),
    Some("""
      SELECT CAST(count(1) AS BIGINT) AS n,
             CAST(count(1) AS BIGINT) AS n_provenance_ok
      FROM lineitem"""))

  // ---------------------------------------------------------------------
  // S6/S8: catalog bindings registered as views + the SQL entry surface
  // (a federated-style query joining two differently-bound sources),
  // mirroring YQ's named bindings (README.md:192-216,264-266).
  val q15CatalogSql = QueryDef(
    "q15_catalog_sql",
    (s, dir) => {
      Catalog.register(s,
        Binding("b_orders", s"$dir/orders.parquet"),
        Binding("b_customer", s"$dir/customer.parquet"))
      s.sql("""
        SELECT c.c_mktsegment AS seg,
               CAST(count(1) AS BIGINT) AS n,
               round(sum(o.o_totalprice), 2) AS total
        FROM b_orders o JOIN b_customer c ON o.o_custkey = c.c_custkey
        WHERE o.o_orderstatus = 'F'
        GROUP BY c.c_mktsegment
        ORDER BY seg""")
    },
    Some("""
      SELECT c_mktsegment AS seg, CAST(count(1) AS BIGINT) AS n,
             round(sum(o_totalprice), 2) AS total
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE o_orderstatus = 'F'
      GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------------
  // Semi/anti joins (SURVEY.md §2.3 "ship them anyway").
  val q16SemiAnti = QueryDef(
    "q16_semi_anti",
    (s, dir) => {
      val c = Graft.table(s, dir, "customer")
      val o = Graft.table(s, dir, "orders")
      val withOrders = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .agg(count(lit(1)).as("n")).select(lit("with_orders").as("kind"), col("n"))
      val noOrders = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("n")).select(lit("no_orders").as("kind"), col("n"))
      withOrders.unionAll(noOrders).orderBy(col("kind"))
    },
    Some("""
      SELECT 'with_orders' AS kind, CAST(count(1) AS BIGINT) AS n
      FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      UNION ALL
      SELECT 'no_orders' AS kind, CAST(count(1) AS BIGINT) AS n
      FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY kind"""))

  // ---------------------------------------------------------------------
  // P2: plain `SELECT *` (README.md:145,265) — full projection, every
  // column, no pruning; the ORDER BY pins row identity for the compare.
  val q33SelectStar = QueryDef(
    "q33_select_star",
    (s, dir) =>
      Graft.table(s, dir, "region").select(col("*"))
        .orderBy(col("r_regionkey")),
    Some("SELECT * FROM region ORDER BY r_regionkey"))

  val defs: Seq[QueryDef] =
    Seq(q13CsvRoundtrip, q14FileMeta, q15CatalogSql, q16SemiAnti,
      q33SelectStar)
}
