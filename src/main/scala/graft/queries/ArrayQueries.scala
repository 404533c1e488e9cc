package graft.queries

import org.apache.spark.sql.functions._

import graft.{Graft, QueryDef}
import graft.functions.ch._

/** Array / scalar function coverage (SURVEY.md §2.7): CH-style 1-based
  * element access with default-on-miss, indexOf, arrayMap, sumArray,
  * notEmpty, if/isFinite/toInt64, int division semantics.
  */
object ArrayQueries {

  // ---------------------------------------------------------------------
  // F1/F2/A5 over the embeddings table: sumArray, element access in and
  // out of range (CH `arr[i]` default-on-miss), 1-based indexing.
  val q17ArrayFuncs = QueryDef(
    "q17_array_funcs",
    (s, dir) =>
      Graft.table(s, dir, "embeddings")
        .select(
          col("vec_id"),
          round(sumArrayDouble(col("embedding")), 4).as("esum"),
          round(element_at(col("embedding"), 1).cast("double"), 6).as("e1"),
          round(chElementAt(col("embedding"), lit(100), lit(-1.0)).cast("double"), 6)
            .as("e100_miss"),
          round(chElementAt(col("embedding"), lit(0), lit(-1.0)).cast("double"), 6)
            .as("e0_miss"),
          size(col("embedding")).cast("long").as("dim"))
        .orderBy(col("vec_id"))
        .limit(50),
    Some("""
      SELECT vec_id,
             round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum'), 4) AS esum,
             round(CAST(embedding[1] AS DOUBLE), 6) AS e1,
             round(CASE WHEN 100 BETWEEN 1 AND len(embedding) THEN CAST(embedding[100] AS DOUBLE) ELSE -1.0 END, 6) AS e100_miss,
             round(CASE WHEN 0 BETWEEN 1 AND len(embedding) THEN CAST(embedding[0] AS DOUBLE) ELSE -1.0 END, 6) AS e0_miss,
             CAST(len(embedding) AS BIGINT) AS dim
      FROM embeddings ORDER BY vec_id LIMIT 50"""))

  // ---------------------------------------------------------------------
  // F1/F2/F4/F6/F10 over documents tokens: the traffic-sources access
  // pattern `arr[indexOf(arr, v)]` with '' on miss (README.md:103),
  // notEmpty, conditional, int/int float division.
  val q18TokenFuncs = QueryDef(
    "q18_token_funcs",
    (s, dir) => {
      val tokens = split(col("text"), " ")
      Graft.table(s, dir, "documents")
        .select(
          col("doc_id"),
          array_position(tokens, "spark").cast("long").as("spark_pos"),
          chElementAt(tokens, array_position(tokens, "spark"), lit(""))
            .as("hit"),
          size(tokens).cast("long").as("n_tokens"),
          notEmpty(col("lang")).as("has_lang"),
          chIf(col("n_chars") > 250, lit("long"), lit("short")).as("len_class"),
          round(col("n_chars") / size(tokens), 4).as("avg_token_len"))
        .orderBy(col("doc_id"))
        .limit(200)
    },
    Some("""
      WITH t AS (SELECT doc_id, lang, n_chars, string_split(text, ' ') AS toks FROM documents)
      SELECT doc_id,
             CAST(coalesce(list_position(toks, 'spark'), 0) AS BIGINT) AS spark_pos,
             CASE WHEN coalesce(list_position(toks, 'spark'), 0) BETWEEN 1 AND len(toks)
                  THEN toks[coalesce(list_position(toks, 'spark'), 0)] ELSE '' END AS hit,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(CASE WHEN length(lang) > 0 THEN 1 ELSE 0 END AS BIGINT) AS has_lang,
             CASE WHEN n_chars > 250 THEN 'long' ELSE 'short' END AS len_class,
             round(n_chars / len(toks), 4) AS avg_token_len
      FROM t ORDER BY doc_id LIMIT 200"""))

  // ---------------------------------------------------------------------
  // The full nested-arrayMap aggregate from the traffic-sources query
  // (README.md:109): sumArray(arrayMap(x -> if(isFinite(x),x,0) * Sign,
  // arrayMap(x0 -> toInt64(notEmpty(x0)), arr))) — sign-weighted count of
  // non-empty array elements, aggregated per group.
  val q19ArrayMapSign = QueryDef(
    "q19_arraymap_sign",
    (s, dir) => {
      val sign = when(pmod(col("doc_id"), lit(7)) === 0, -1L).otherwise(1L)
      val tokens = split(col("text"), " ")
      val inner = arrayMap(tokens, x0 => toInt64(notEmpty(x0)))
      val weighted = arrayMap(inner, x => chIf(isFiniteCol(x), x, lit(0L)) * sign)
      Graft.table(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(sum(sumArrayLong(weighted)).cast("long").as("purchases"))
        .orderBy(col("lang"))
    },
    Some("""
      SELECT lang,
             CAST(sum(coalesce(list_aggregate(list_transform(
               string_split(text, ' '),
               x -> (CASE WHEN length(x) > 0 THEN 1 ELSE 0 END)
                    * (CASE WHEN doc_id % 7 = 0 THEN -1 ELSE 1 END)), 'sum'), 0)) AS BIGINT) AS purchases
      FROM documents GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------------
  // The wider CH array vocabulary as verbatim dialect SQL:
  // arrayEnumerate (the parallel-arrays index generator), arrayCumSum
  // (single-pass prefix-sum fold), arraySum (per-ROW element sum —
  // distinct from the sumArray aggregate), arraySlice (1-based,
  // negative offset from the end, 2-arg to-end form), arrayConcat,
  // arrayFlatten. Array outputs serialize to CSV strings for the
  // scalar-cell compare; the ≥5-token gate (both engines) keeps
  // negative slices off degenerate short docs where Spark (empty) and
  // DuckDB (clamped) disagree by convention.
  val q81ChArrayVocab = QueryDef(
    "q81_ch_array_vocab",
    (s, dir) => {
      Graft.table(s, dir, "documents").createOrReplaceTempView("docs_arr_v")
      s.sql("""
        SELECT doc_id,
          array_join(CAST(arraySlice(arrayEnumerate(toks), 1, 5)
                     AS ARRAY<STRING>), ',') AS idx5,
          array_join(CAST(arraySlice(arrayCumSum(lens), 1, 5)
                     AS ARRAY<STRING>), ',') AS cum5,
          arraySum(lens) AS total_len,
          array_join(arrayConcat(arraySlice(toks, 1, 2),
                     arraySlice(toks, -2)), ',') AS head_tail,
          array_join(arrayFlatten(array(arraySlice(toks, 1, 2),
                     arraySlice(toks, -2))), ',') AS flat_head_tail
        FROM (
          SELECT doc_id, toks,
                 arrayMap(x -> toInt64(length(x)), toks) AS lens
          FROM (SELECT doc_id, splitByChar(' ', text) AS toks
                FROM docs_arr_v)
          WHERE size(toks) >= 5
        )
        ORDER BY doc_id LIMIT 100""")
    },
    Some("""
      WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      ), f AS (
        SELECT doc_id, toks,
               list_transform(toks, x -> CAST(length(x) AS BIGINT)) AS lens
        FROM t WHERE len(toks) >= 5
      )
      SELECT doc_id,
        array_to_string([CAST(i AS VARCHAR)
          for i in range(1, least(len(toks), 5) + 1)], ',') AS idx5,
        array_to_string(list_transform(
          [list_sum(lens[1:i]) for i in range(1, least(len(lens), 5) + 1)],
          x -> CAST(x AS VARCHAR)), ',') AS cum5,
        CAST(list_sum(lens) AS BIGINT) AS total_len,
        array_to_string(list_concat(toks[1:2], toks[-2:]), ',') AS head_tail,
        array_to_string(flatten([toks[1:2], toks[-2:]]), ',') AS flat_head_tail
      FROM f ORDER BY doc_id LIMIT 100"""))

  val defs: Seq[QueryDef] = Seq(q17ArrayFuncs, q18TokenFuncs,
    q19ArrayMapSign, q81ChArrayVocab)
}
