package graft.queries

import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.sources.Warehouse
import graft.streaming.Ingest

/** Streaming ingest coverage (S1/S2, ST1-ST5): the events table staged
  * as a directory of parquet files, drained through the replication
  * pipeline (file stream → foreachBatch → week-partitioned warehouse
  * with transfer-id-suffixed name) in multiple micro-batches, then the
  * WAREHOUSE is queried and hash-checked against the oracle computed
  * straight from the original table — the whole ingest path has to be
  * lossless and duplicate-free for this to match.
  */
object StreamingQueries {

  val q31StreamIngest = QueryDef(
    "q31_stream_ingest",
    (s, dir) => {
      val base = s"${sys.props("java.io.tmpdir")}/graft_stream_q31"
      val srcDir = s"$base/src"
      // stage: the raw table (ts stays nanos-long) as 4 source files
      val raw = s.read.parquet(s"$dir/events.parquet")
      raw.repartition(4).write.mode("overwrite").parquet(srcDir)
      val sink = Ingest.Sink(s"$base/warehouse", "events", "tr42",
        dateCol = "EventDate", orderKey = Seq("user_id", "ts"),
        cleanupPolicy = "DROP") // from-scratch per run → deterministic
      Ingest.runToCompletion(s, srcDir, raw.schema, sink,
        checkpointDir = s"$base/checkpoint",
        prepare = b => b.withColumn("EventDate",
          to_date(timestamp_micros(expr("ts DIV 1000")))),
        maxFilesPerTrigger = Some(2)) // force a multi-batch drain
      Warehouse.read(s, Ingest.tableDir(sink))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          round(sum(col("value")), 2).as("value_sum"),
          count_distinct(col("user_id")).as("users"),
          min(col("EventDate")).as("first_day"),
          max(col("EventDate")).as("last_day"))
        .orderBy(col("event_type"))
    },
    Some("""
      SELECT event_type,
             CAST(count(1) AS BIGINT) AS n,
             round(sum(value), 2) AS value_sum,
             CAST(count(DISTINCT user_id) AS BIGINT) AS users,
             min(CAST(ts AS DATE)) AS first_day,
             max(CAST(ts AS DATE)) AS last_day
      FROM events GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------------
  // ST6: the stream as a QUERY source — a streaming aggregation
  // (stateful operator, complete output mode) over the staged file
  // stream, drained with AvailableNow into a memory sink, then the
  // final state is hash-checked against the batch oracle. Proves the
  // streaming and batch engines agree on the same aggregation.
  val q48StreamSourceAgg = QueryDef(
    "q48_stream_source_agg",
    (s, dir) => {
      val base = s"${sys.props("java.io.tmpdir")}/graft_stream_q48_" +
        new java.io.File(dir).getName
      val srcDir = s"$base/src"
      val raw = s.read.parquet(s"$dir/events.parquet")
      raw.repartition(3).write.mode("overwrite").parquet(srcDir)
      val q = s.readStream.schema(raw.schema).parquet(srcDir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value")), 2).as("value_sum"))
        .writeStream.format("memory").queryName("graft_q48_state")
        .outputMode("complete")
        // no explicit checkpoint: a kept checkpoint would make reruns
        // see "no new files" and leave the memory table empty; the
        // ephemeral default gives every run a full deterministic drain
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table("graft_q48_state").orderBy(col("event_type"))
    },
    Some("""
      SELECT event_type, CAST(count(1) AS BIGINT) AS n,
             round(sum(value), 2) AS value_sum
      FROM events GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------------
  // ST4 (compaction half): the scheduled VersionedCollapsing merge as an
  // oracle-checked entry. A versioned fixture derived from events
  // (entity = user_id, version = event micros, every third version also
  // gets a cancel row) is appended into the week-partitioned warehouse,
  // compacted in ONE job (all weeks parallel — the grouping key carries
  // the week scope), and the compacted table is hash-checked against
  // the latest-live-version-per-(entity, week) relation computed
  // straight from the raw rows in SQL.
  val q52CompactWarehouse = QueryDef(
    "q52_compact_warehouse",
    (s, dir) => {
      val base = s"${sys.props("java.io.tmpdir")}/graft_compact_q52_" +
        new java.io.File(dir).getName
      graft.FsUtil.rmTree(base)
      // raw nanos long (nanosAsLong): DIV 1000 = DuckDB's epoch_us
      val raw = s.read.parquet(s"$dir/events.parquet")
      val state = raw.select(
        col("user_id").as("id"),
        expr("ts DIV 1000").as("version"),
        col("value"),
        to_date(timestamp_micros(expr("ts DIV 1000"))).as("d"),
        lit(1).as("sign"))
      val cancels = state.filter(pmod(col("version"), lit(3)) === 0)
        .withColumn("sign", lit(-1))
      Warehouse.write(state.unionByName(cancels), s"$base/tbl", "d",
        orderKey = Seq("id", "version"))
      Warehouse.compact(s, s"$base/tbl", s"$base/compacted", "d",
        orderKey = Seq("id", "version"), idCols = Seq("id"),
        versionCol = "version", signCol = "sign")
      Warehouse.read(s, s"$base/compacted")
        .groupBy(pmod(col("id"), lit(7)).cast("long").as("id_bucket"))
        .agg(
          count(lit(1)).as("n_latest"),
          sum(col("version")).cast("long").as("version_sum"),
          round(sum(col("value")), 2).as("value_sum"))
        .orderBy(col("id_bucket"))
    },
    Some("""
      WITH state AS (
        SELECT user_id AS id, epoch_us(ts) AS version, value,
               CAST(ts AS DATE) AS d, 1 AS sign
        FROM events
      ), v AS (
        SELECT * FROM state
        UNION ALL
        SELECT id, version, value, d, -1 AS sign
        FROM state WHERE version % 3 = 0
      ), live AS (
        SELECT p.* FROM v p
        WHERE p.sign = 1 AND NOT EXISTS (
          SELECT 1 FROM v m
          WHERE m.sign = -1 AND m.id = p.id AND m.version = p.version)
      ), latest AS (
        SELECT id, version, value,
               row_number() OVER (
                 PARTITION BY id, date_trunc('week', d)
                 ORDER BY version DESC) AS rn
        FROM live
      )
      SELECT CAST(id % 7 AS BIGINT) AS id_bucket,
             CAST(count(1) AS BIGINT) AS n_latest,
             CAST(sum(version) AS BIGINT) AS version_sum,
             round(sum(value), 2) AS value_sum
      FROM latest WHERE rn = 1
      GROUP BY 1 ORDER BY 1"""))

  val defs: Seq[QueryDef] =
    Seq(q31StreamIngest, q48StreamSourceAgg, q52CompactWarehouse)
}
