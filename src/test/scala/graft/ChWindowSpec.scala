package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ch

/** CH window-function vocabulary: lagInFrame / leadInFrame / neighbor
  * (explicit OVER required — block order is undefined here) and the
  * runningDifference combinator.
  */
class ChWindowSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(): Unit =
    Seq((1, 1, 10.0), (1, 2, 13.0), (1, 3, 11.5), (2, 1, 5.0))
      .toDF("u", "seq", "v").createOrReplaceTempView("win_t")

  test("lagInFrame / leadInFrame with explicit and omitted defaults") {
    fixture()
    val rows = spark.sql("""
      SELECT u, seq,
             lagInFrame(v, 1, -1.0D) OVER w AS lg,
             leadInFrame(v) OVER w AS ld
      FROM win_t WINDOW w AS (PARTITION BY u ORDER BY seq)
      ORDER BY u, seq""").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.toSeq == Seq(
      (1, 1, -1.0, 13.0),
      (1, 2, 10.0, 11.5),
      (1, 3, 13.0, 0.0), // omitted default -> type default 0.0, not NULL
      (2, 1, -1.0, 0.0)))
  }

  test("neighbor: positive offset ahead, negative behind (CH contract)") {
    fixture()
    val rows = spark.sql("""
      SELECT seq,
             neighbor(v, 1) OVER w AS nxt,
             neighbor(v, -1) OVER w AS prv
      FROM win_t WHERE u = 1
      WINDOW w AS (PARTITION BY u ORDER BY seq) ORDER BY seq""")
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.toSeq == Seq(
      (1, 13.0, 0.0), (2, 11.5, 10.0), (3, 0.0, 13.0)))
  }

  test("runningDifference: 0 for the first row, delta after") {
    fixture()
    val w = Window.partitionBy($"u").orderBy($"seq")
    val rows = spark.table("win_t").filter($"u" === 1)
      .select($"seq", ch.runningDifference($"v", w).as("rd"))
      .orderBy($"seq").collect()
      .map(r => (r.getInt(0), r.getDouble(1)))
    assert(rows.toSeq == Seq((1, 0.0), (2, 3.0), (3, -1.5)))
  }
}
