package graft

import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** Registration-time lint on every [[SparkEntry]] entry's OUTPUT schema.
  *
  * The driver's correctness comparator reads each entry's parquet into
  * pandas and sorts rows by every column; an ARRAY (or MAP/STRUCT) cell
  * arrives as an unhashable ndarray/dict and the whole entry dies with
  * `TypeError` before any verdict — q127/q129 sat red for a full round
  * this way (VERDICT r7 #1/#4), and nothing rejected the shape at build
  * time.
  *
  * ESCAPE HATCH (the q75 "members" pattern): serialize the collection
  * to ONE string on BOTH sides —
  *   Spark : `concat_ws(",", arr.cast("array<string>"))`
  *   DuckDB: `array_to_string(arr, ',')` / `string_agg(x, ',' ORDER BY …)`
  * — which keeps the values compared element-for-element while giving
  * the comparator a scalar cell.
  */
class SchemaLintSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def complex(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType => true
    case _ => false
  }

  test("no registered entry exposes ARRAY/MAP/STRUCT output columns") {
    val bad = Seq.newBuilder[String]
    val broken = Seq.newBuilder[String]
    SparkEntry.all.foreach { d =>
      try {
        val offenders = d.fn(spark, dir).schema.fields
          .filter(f => complex(f.dataType))
          .map(f => s"${f.name}:${f.dataType.simpleString}")
        if (offenders.nonEmpty)
          bad += s"${d.name} [${offenders.mkString(", ")}]"
      } catch {
        case e: Throwable =>
          broken += s"${d.name}: ${String.valueOf(e.getMessage).take(120)}"
      }
    }
    val badL = bad.result()
    val brokenL = broken.result()
    assert(badL.isEmpty,
      s"\nentries with comparator-unhashable output columns (serialize " +
        s"with concat_ws / array_to_string — see q75 members):\n  " +
        badL.mkString("\n  "))
    assert(brokenL.isEmpty,
      s"\nentries whose DataFrame could not be built at sf0.001 (lint " +
        s"could not run):\n  " + brokenL.mkString("\n  "))
  }
}
