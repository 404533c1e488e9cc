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

  val defs: Seq[QueryDef] = Seq(q31StreamIngest, q48StreamSourceAgg)
}
