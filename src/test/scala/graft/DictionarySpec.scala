package graft

import org.apache.spark.sql.functions._

import graft.plans.Dictionaries

/** CH external-dictionary functions: dictGet / dictGetOrDefault /
  * dictGetOrNull / dictHas / typed variants — O(1) replica probes that
  * stay inside whole-stage codegen.
  */
class DictionarySpec extends SparkSpec {
  import spark.implicits._

  private def registerDims(): Unit = {
    Dictionaries.register("colors",
      Seq((1L, "red", 10.5), (2L, "green", 20.0), (3L, "blue", 30.25))
        .toDF("id", "name", "score"),
      "id")
  }

  test("dictGet returns the attribute; CH type default on miss") {
    registerDims()
    Seq(1L, 3L, 99L).toDF("k").createOrReplaceTempView("dict_probe")
    val rows = spark.sql(
      "SELECT k, dictGet('colors', 'name', k) AS nm FROM dict_probe ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // miss -> '' (CH string default), never NULL
    assert(rows == Seq((1L, "red"), (3L, "blue"), (99L, "")))
    val score = spark.sql(
      "SELECT dictGet('colors', 'score', CAST(99 AS BIGINT)) AS s")
      .collect().head.getDouble(0)
    assert(score == 0.0) // numeric default
  }

  test("dictGetOrDefault / dictGetOrNull / dictHas") {
    registerDims()
    val r = spark.sql("""
      SELECT dictGetOrDefault('colors', 'name', CAST(99 AS BIGINT), 'unknown') AS d,
             dictGetOrNull('colors', 'name', CAST(99 AS BIGINT)) AS n,
             dictHas('colors', CAST(2 AS BIGINT)) AS h2,
             dictHas('colors', CAST(99 AS BIGINT)) AS h99,
             dictHas('colors', CAST(NULL AS BIGINT)) AS hnull""")
      .collect().head
    assert(r.getString(0) == "unknown")
    assert(r.isNullAt(1))
    assert(r.getInt(2) == 1 && r.getInt(3) == 0 && r.getInt(4) == 0)
  }

  test("typed variants cast the attribute like their CH namesakes") {
    registerDims()
    val r = spark.sql("""
      SELECT dictGetString('colors', 'score', CAST(1 AS BIGINT)) AS s,
             dictGetInt64('colors', 'score', CAST(2 AS BIGINT)) AS i,
             dictGetFloat64('colors', 'score', CAST(3 AS BIGINT)) AS f""")
      .collect().head
    assert(r.getString(0) == "10.5")
    assert(r.getLong(1) == 20L)
    assert(r.getDouble(2) == 30.25)
  }

  test("key type coerces: int probe against a long-keyed dictionary") {
    registerDims()
    val nm = spark.range(2, 3)
      .select(expr("dictGet('colors', 'name', CAST(id AS INT))").as("nm"))
      .collect().head.getString(0)
    assert(nm == "green")
  }

  test("Scala API parity via expr and the probe stays codegen'd") {
    registerDims()
    val df = spark.range(0, 1000)
      .select((col("id") % 5).as("k"))
      .select(expr("dictGet('colors', 'name', k)").as("nm"))
    val counts = df.groupBy("nm").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("" -> 400, "red" -> 200, "green" -> 200,
      "blue" -> 200))
    // whole-stage codegen covers the probe (the `*(n)` prefix marks
    // the WholeStageCodegen span containing the dict_get Project)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("dict_get"))
  }

  test("register rejects a dimension past the row cap, loudly") {
    val err = intercept[IllegalArgumentException](
      Dictionaries.register("too_big",
        spark.range(0, 100).toDF("id"), "id", maxRows = 50))
    assert(err.getMessage.contains("broadcast equi-join"))
    // the refused dictionary never registered
    val e2 = intercept[Exception](
      spark.sql("SELECT dictGet('too_big', 'id', 1)").collect())
    assert(e2.getMessage.contains("not registered"))
  }

  test("re-registering bumps the generation: fresh plans see fresh data") {
    Dictionaries.register("gen_d",
      Seq((1L, "old")).toDF("id", "v"), "id")
    def probe(): String = spark.range(1, 2)
      .select(expr("dictGet('gen_d', 'v', id)").as("v"))
      .collect().head.getString(0)
    assert(probe() == "old")
    Dictionaries.register("gen_d",
      Seq((1L, "new")).toDF("id", "v"), "id")
    // a NEWLY analyzed plan must probe the new replica — generation
    // is part of DictLookupExpr's semantic identity, so no plan/
    // fragment cache can satisfy this with the stale expression
    assert(probe() == "new")
  }

  test("unknown dictionary / attribute fail loudly") {
    registerDims()
    val e1 = intercept[Exception](
      spark.sql("SELECT dictGet('nope', 'name', 1)").collect())
    assert(e1.getMessage.contains("not registered"))
    val e2 = intercept[Exception](
      spark.sql("SELECT dictGet('colors', 'nope', 1)").collect())
    assert(e2.getMessage.contains("no attribute"))
  }
}
