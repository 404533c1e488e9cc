package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ClickHouse-compatible scalar/array function combinators.
  *
  * Each mirrors a builtin the reference's queries rely on (SURVEY.md §2.7),
  * expressed as pure `Column` combinators so Catalyst keeps them inside
  * whole-stage codegen — no UDFs, no closures.
  *
  * References (semantics only): `/root/reference/README.md:103-109`
  * (arr[i], indexOf, arrayMap, if, isFinite, notEmpty, toInt64, sumArray),
  * `/root/reference/ddl/hits.sql:114` (toMonday partition expression).
  */
object ch {

  /** ClickHouse `arr[i]`: 1-based element access that returns a *default*
    * value (not null, not an error) when `i = 0` or out of range. This is
    * load-bearing for the traffic-sources query: visits without a model-2
    * traffic source must map to `''` (README.md:103).
    */
  def chElementAt(arr: Column, idx: Column, default: Column): Column = {
    val i = idx.cast("int")
    when(i >= 1 && i <= size(arr), element_at(arr, i)).otherwise(default)
  }

  /** ClickHouse `indexOf(arr, v)`: 1-based position, 0 when absent.
    * NULL is a matchable value in CH arrays — indexOf([1,NULL], NULL)
    * = 2 — so a NULL needle searches for the first stored NULL (as a
    * position scan over the isNull map, keeping the non-null fast path
    * on the `array_position` builtin); only a NULL array gives 0.
    */
  def indexOf(arr: Column, v: Column): Column =
    when(v.isNotNull, coalesce(array_position(arr, v), lit(0L)))
      .otherwise(coalesce(
        array_position(transform(arr, x => x.isNull), lit(true)), lit(0L)))

  /** ClickHouse `arrayMap(x -> e, arr)`. */
  def arrayMap(arr: Column, f: Column => Column): Column = transform(arr, f)

  /** ClickHouse `if(cond, a, b)`. */
  def chIf(cond: Column, a: Column, b: Column): Column =
    when(cond, a).otherwise(b)

  /** ClickHouse `sumArray(arr)` for integral arrays: sum of all elements
    * of the array in each row (pair with an outer `sum(...)` to aggregate
    * across rows, matching `sumArray` as an aggregate combinator).
    */
  def sumArrayLong(arr: Column): Column =
    aggregate(arr, lit(0L), (acc, x) => acc + x.cast("long"))

  /** `sumArray` for floating-point arrays (accumulates in double). */
  def sumArrayDouble(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x.cast("double"))

  /** CH `sumMap(keys, values)`: aggregate the parallel-array pairs of
    * every row in the group into (sorted unique keys, per-key sums) —
    * the ParsedParams.Key1/ValueDouble rollup idiom of Metrica tables
    * (`/root/reference/ddl/visits.sql:130-140`). Keys coerce to
    * string, values to long; the result is a struct of two aligned
    * arrays (CH's tuple of arrays). The fold merges one single-entry
    * map per element via `map_zip_with` — per-group cost is
    * O(pairs x distinct keys), the right shape for the dozens-of-keys
    * maps this models (an unbounded key domain belongs in an
    * explode+groupBy, not inside one aggregate value).
    */
  def sumMap(keys: Column, values: Column): Column = {
    val pairs = flatten(collect_list(zip_with(keys, values,
      (k, v) => struct(k.cast("string").as("k"), v.cast("long").as("v")))))
    val emptyMap = map_from_arrays(
      array().cast("array<string>"), array().cast("array<long>"))
    val folded = aggregate(pairs, emptyMap, (acc, e) =>
      map_zip_with(acc, map(e.getField("k"), e.getField("v")),
        (_, a, b) => coalesce(a, lit(0L)) + coalesce(b, lit(0L))))
    val sortedKeys = array_sort(map_keys(folded))
    struct(sortedKeys.as("keys"),
      transform(sortedKeys, k => element_at(folded, k)).as("sums"))
  }

  /** Shared shape of CH `maxMap`/`minMap` (ddl/visits.sql:130-140
    * neighborhood): [[sumMap]] with the per-key combiner swapped —
    * per group, zip every row's key/value arrays and keep the
    * max/min value per key, returning aligned sorted arrays. Spark's
    * `greatest`/`least` skip NULLs, which is exactly the
    * absent-in-one-side merge this fold needs.
    */
  private def extremeMap(keys: Column, values: Column,
      pick: (Column, Column) => Column): Column = {
    val pairs = flatten(collect_list(zip_with(keys, values,
      (k, v) => struct(k.cast("string").as("k"), v.cast("long").as("v")))))
    val emptyMap = map_from_arrays(
      array().cast("array<string>"), array().cast("array<long>"))
    val folded = aggregate(pairs, emptyMap, (acc, e) =>
      map_zip_with(acc, map(e.getField("k"), e.getField("v")),
        (_, a, b) => pick(a, b)))
    val sortedKeys = array_sort(map_keys(folded))
    struct(sortedKeys.as("keys"),
      transform(sortedKeys, k => element_at(folded, k)).as("vals"))
  }

  /** CH `maxMap(keys, values)`: per-key maximum across the group. */
  def maxMap(keys: Column, values: Column): Column =
    extremeMap(keys, values, (a, b) => greatest(a, b))

  /** CH `minMap(keys, values)`: per-key minimum across the group. */
  def minMap(keys: Column, values: Column): Column =
    extremeMap(keys, values, (a, b) => least(a, b))

  /** CH `avgMap(keys, values)` (round 10): per-key mean across the
    * group — [[sumMap]]'s fold run twice (value sums + occurrence
    * counts, both exact longs), divided only at the end, so the sole
    * IEEE op is the final per-key division (the integer-inputs
    * policy; any engine replays sum/count exactly). Key cardinality
    * bounds the fold state, as with the rest of the map family.
    */
  def avgMap(keys: Column, values: Column): Column = {
    val pairs = flatten(collect_list(zip_with(keys, values,
      (k, v) => struct(k.cast("string").as("k"), v.cast("long").as("v")))))
    val emptyMap = map_from_arrays(
      array().cast("array<string>"), array().cast("array<long>"))
    val sums = aggregate(pairs, emptyMap, (acc, e) =>
      map_zip_with(acc, map(e.getField("k"), e.getField("v")),
        (_, a, b) => coalesce(a, lit(0L)) + coalesce(b, lit(0L))))
    val cnts = aggregate(pairs, emptyMap, (acc, e) =>
      map_zip_with(acc, map(e.getField("k"), lit(1L)),
        (_, a, b) => coalesce(a, lit(0L)) + coalesce(b, lit(0L))))
    val sortedKeys = array_sort(map_keys(sums))
    struct(sortedKeys.as("keys"),
      transform(sortedKeys, k =>
        element_at(sums, k).cast("double") /
          element_at(cnts, k)).as("avgs"))
  }

  /** CH `deltaSumTimestamp(value, ts)`: the counter-increase aggregate
    * — sum of POSITIVE differences between consecutive values in
    * `ts` order (a counter reset contributes nothing). CH ships two
    * forms; the plain `deltaSum` reads BLOCK order and is
    * nondeterministic even in CH (its own docs say to prefer this
    * one), so only the timestamp-ordered form exists here — same
    * policy as neighbor/runningDifference trading the footgun for a
    * defined order.
    *
    * The fold sorts the group's (ts, value) pairs once and takes
    * pairwise diffs with the zip-with-tail shape (two `slice`s of the
    * SAME sorted array — never an index-addressed HOF lambda, the
    * q154 O(n²) trap). Per-group cost O(n log n); group sizes are
    * bounded by the caller's grouping, the aggregate never sees the
    * corpus in one state.
    */
  def deltaSumTimestamp(value: Column, ts: Column): Column = {
    val pairs = array_sort(collect_list(struct(ts.as("t"),
      value.cast("long").as("v"))))
    val n = size(pairs)
    val head = slice(pairs, lit(1), greatest(n - 1, lit(0)))
    val tail = slice(pairs, lit(2), greatest(n - 1, lit(0)))
    val deltas = zip_with(tail, head,
      (a, b) => greatest(a.getField("v") - b.getField("v"), lit(0L)))
    aggregate(deltas, lit(0L), (acc, d) => acc + d)
  }

  /** CH `JSONExtractString(json, key)`: the string value at a top-level
    * key, '' (never NULL) when the key is absent or the document is
    * malformed — CH's default-on-miss contract. Backed by Spark's
    * codegen'd `get_json_object`. (Also the semantics of the legacy
    * Metrica-era `visitParamExtractString` — the visits `params` column
    * is exactly this shape of JSON.)
    */
  def jsonExtractString(j: Column, key: String): Column =
    coalesce(get_json_object(j, "$." + key), lit(""))

  /** CH `JSONExtractInt(json, key)`: 0 on miss/malformed. */
  def jsonExtractInt(j: Column, key: String): Column =
    coalesce(get_json_object(j, "$." + key).cast("long"), lit(0L))

  /** CH `JSONExtractFloat(json, key)`: 0.0 on miss/malformed. */
  def jsonExtractFloat(j: Column, key: String): Column =
    coalesce(get_json_object(j, "$." + key).cast("double"), lit(0.0))

  /** CH `JSONHas(json, key)` → 1/0. */
  def jsonHas(j: Column, key: String): Column =
    get_json_object(j, "$." + key).isNotNull.cast("long")

  /** CH `arrayEnumerate(arr)`: `[1, 2, …, len]` — the index array the
    * parallel-arrays convention zips against. Empty in → empty out;
    * NULL in → NULL out (sequence(1, 0) alone would misfire: Spark
    * infers a DESCENDING step and returns [1, 0]).
    */
  def arrayEnumerate(arr: Column): Column = {
    val n = size(arr)
    when(n > 0, sequence(lit(1), n))
      .when(n === 0, array().cast("array<int>"))
      .otherwise(lit(null).cast("array<int>"))
  }

  /** CH `arrayCumSum(arr)` for integral elements: running prefix sums,
    * one single-pass fold per row.
    */
  def arrayCumSumLong(arr: Column): Column =
    aggregate(arr,
      struct(lit(0L).as("s"), array().cast("array<long>").as("o")),
      (acc, x) => {
        val ns = acc.getField("s") + x.cast("long")
        struct(ns.as("s"), array_append(acc.getField("o"), ns).as("o"))
      },
      acc => acc.getField("o"))

  /** CH `arrayCumSum(arr)` for fractional elements. */
  def arrayCumSumDouble(arr: Column): Column =
    aggregate(arr,
      struct(lit(0.0).as("s"), array().cast("array<double>").as("o")),
      (acc, x) => {
        val ns = acc.getField("s") + x.cast("double")
        struct(ns.as("s"), array_append(acc.getField("o"), ns).as("o"))
      },
      acc => acc.getField("o"))

  /** ClickHouse `notEmpty(s)` → 1/0 (UInt8-as-int). A NULL string maps
    * to 0, matching CH's non-nullable String default (`length(null)>0`
    * alone would propagate NULL and silently break oracle parity).
    */
  def notEmpty(s: Column): Column =
    (coalesce(length(s), lit(0)) > 0).cast("long")

  /** ClickHouse `isFinite(x)` for doubles; constant-true for integers. */
  def isFiniteCol(x: Column): Column = {
    val d = x.cast("double")
    !isnan(d) && d =!= lit(Double.PositiveInfinity) &&
      d =!= lit(Double.NegativeInfinity)
  }

  /** ClickHouse `toInt64(x)`. */
  def toInt64(x: Column): Column = x.cast("long")

  /** ClickHouse `toMonday(d)`: Date of the Monday of d's week — the
    * reference's partition expression. Spark weeks start Monday, so
    * `date_trunc` matches exactly.
    */
  def toMonday(d: Column): Column = date_trunc("week", d).cast("date")

  /** CH `runningDifference(x)` with a DEFINED order: x minus the
    * previous row's x within `w`, 0 for the partition's first row. CH
    * computes this over block order — nondeterministic on any
    * distributed engine — so the engine demands the window spec the
    * CH docs themselves recommend migrating to (lagInFrame).
    */
  def runningDifference(x: Column,
      w: org.apache.spark.sql.expressions.WindowSpec): Column = {
    val prev = lag(x, 1).over(w)
    when(prev.isNull, lit(0)).otherwise(x - prev)
  }

  /** ClickHouse `uniqExact` — exact distinct count. */
  def uniqExact(c: Column): Column = count_distinct(c)

  /** ClickHouse `uniq` — HLL-approximate distinct count. */
  def uniq(c: Column): Column = approx_count_distinct(c)

  /** ClickHouse `retention(cond1, …, condN)`: an aggregate returning
    * `[r1, …, rN]` where r1 = 1 iff cond1 held on any row of the group
    * and ri = 1 iff BOTH cond1 and condi held (on any rows) — the
    * cohort-retention primitive (did the user show up on the anchor
    * day, and again on day k). Composed of per-condition `max`
    * aggregates, so it partial-aggregates map-side like any plain max.
    */
  def retention(conds: Seq[Column]): Column = {
    require(conds.nonEmpty, "retention needs at least one condition")
    val states = conds.map(c => max(coalesce(c.cast("boolean"), lit(false))))
    val first = states.head
    array(first.cast("int") +:
      states.tail.map(s => (first && s).cast("int")): _*)
  }

  /** CH `roundToExp2(x)`: 0 for x < 1, else the largest power of two
    * <= x — Metrica's log-scale bucketing for counts/durations. The
    * exponent comes from log2 with a one-step correction in each
    * direction, so a libm result a half-ulp off an exact power can
    * never pick the wrong bucket.
    */
  def roundToExp2(x: Column): Column = {
    val xd = x.cast("double")
    val cand = pow(lit(2.0), floor(log2(xd)))
    val corrected = when(cand > xd, cand / 2)
      .when(cand * 2 <= xd, cand * 2)
      .otherwise(cand)
    when(x < 1, lit(0L)).otherwise(corrected.cast("long"))
  }

  /** CH `roundDuration(x)`: round a session duration in seconds down
    * to Metrica's fixed report buckets
    * (0, 1, 10, 30, 60, 120, 180, 240, 300, 600, 1200, 1800, 3600,
    * 7200, 18000, 36000). A literal comparison ladder — branch-only,
    * fully codegen'd.
    */
  def roundDuration(x: Column): Column =
    when(x < 1, lit(0L)).when(x < 10, lit(1L)).when(x < 30, lit(10L))
      .when(x < 60, lit(30L)).when(x < 120, lit(60L))
      .when(x < 180, lit(120L)).when(x < 240, lit(180L))
      .when(x < 300, lit(240L)).when(x < 600, lit(300L))
      .when(x < 1200, lit(600L)).when(x < 1800, lit(1200L))
      .when(x < 3600, lit(1800L)).when(x < 7200, lit(3600L))
      .when(x < 18000, lit(7200L)).when(x < 36000, lit(18000L))
      .otherwise(lit(36000L))

  /** CH `roundAge(x)`: Metrica's demographic age buckets —
    * 0 (unknown), 17, 18, 25, 35, 45, 55.
    */
  def roundAge(x: Column): Column =
    when(x < 1, lit(0L)).when(x < 18, lit(17L)).when(x < 25, lit(18L))
      .when(x < 35, lit(25L)).when(x < 45, lit(35L))
      .when(x < 55, lit(45L)).otherwise(lit(55L))

  /** CH `roundDown(x, arr)`: the largest array element <= x, or the
    * array minimum when x is below every element.
    */
  def roundDown(x: Column, arr: Column): Column =
    coalesce(array_max(filter(arr, e => e <= x)), array_min(arr))

  /** CH `transform(x, from, to, default)` as a Scala combinator — the
    * inline dictionary map (TraficSourceID → name being the canonical
    * Metrica use). NOT registered in the SQL dialect: the CH name
    * collides with Spark's builtin array `transform`, which this
    * library uses pervasively, so the SQL spelling stays Spark's
    * (`CASE ... WHEN`) while Scala callers get the CH shape here.
    */
  def transformLookup[A, B](x: Column, from: Seq[A], to: Seq[B],
      default: Column): Column = {
    require(from.length == to.length,
      s"transform needs matching arrays, got ${from.length}/${to.length}")
    from.zip(to).foldRight(default) { case ((f, t), acc) =>
      when(x === lit(f), lit(t)).otherwise(acc)
    }
  }

  /** CH `topK(k)(x)`: the k most frequent values of the group, most
    * frequent first, ties broken by value — deterministic where CH's
    * space-saving sketch is approximate. One count-map fold over the
    * collected values, then a (-count, value) struct sort; per-group
    * cost O(n × distinct), the dozens-of-distinct-values dimension
    * shape. High-cardinality columns belong in the two-stage
    * `topKFreq` operator, whose rank never funnels a key's full
    * distinct set into one task.
    */
  def topK(k: Column, x: Column, elemType: String = "string"): Column =
    topKOfArray(k, collect_list(x), elemType)

  /** [[topK]] over an already-materialized value array — the `-Merge`
    * side of the MV state fold reuses the exact same count fold and
    * (-count, value) sort, so a folded rollup and a direct aggregate
    * agree to the byte.
    */
  def topKOfArray(k: Column, values: Column,
      elemType: String = "string"): Column = {
    val emptyMap = map_from_arrays(
      array().cast(s"array<$elemType>"), array().cast("array<long>"))
    val counted = aggregate(values, emptyMap, (acc, v) =>
      map_zip_with(acc, map(v, lit(1L)),
        (_, a, b) => coalesce(a, lit(0L)) + coalesce(b, lit(0L))))
    val entries = transform(map_keys(counted), key =>
      struct((-element_at(counted, key)).as("nc"), key.as("v")))
    transform(slice(array_sort(entries), lit(1), k.cast("int")),
      e => e.getField("v"))
  }

  /** CH `topKWeighted(k)(x, w)`: the k values with the largest summed
    * weights (ties by value) — [[topK]] with a weight column instead
    * of unit counts. Same collect-and-fold shape: per-group value
    * cardinality bounds the map, the weight sum rides the fold.
    */
  def topKWeighted(k: Column, x: Column, w: Column,
      elemType: String = "string"): Column = {
    val emptyMap = map_from_arrays(
      array().cast(s"array<$elemType>"), array().cast("array<long>"))
    val counted = aggregate(
      collect_list(struct(x.as("v"), w.cast("long").as("w"))), emptyMap,
      (acc, e) => map_zip_with(acc, map(e.getField("v"), e.getField("w")),
        (_, a, b) => coalesce(a, lit(0L)) + coalesce(b, lit(0L))))
    val entries = transform(map_keys(counted), key =>
      struct((-element_at(counted, key)).as("nc"), key.as("v")))
    transform(slice(array_sort(entries), lit(1), k.cast("int")),
      e => e.getField("v"))
  }

  /** CH `arrayCompact(arr)`: collapse CONSECUTIVE duplicate elements
    * (run-length dedup, not arrayDistinct). Index-tagged filter
    * against the previous element — no typed empty-array literal
    * needed, so the element type flows through untouched.
    */
  def arrayCompact(arr: Column): Column = {
    val tagged = transform(arr, (x, i) => struct(x.as("x"), i.as("i")))
    transform(
      filter(tagged, e => e.getField("i") === 0 ||
        !(element_at(arr, e.getField("i")) <=> e.getField("x"))),
      e => e.getField("x"))
  }

  /** CH `arrayResize(arr, size[, extender])`: truncate or right-pad to
    * exactly `size` elements.
    */
  def arrayResize(arr: Column, n: Column, extender: Column): Column =
    when(n <= size(arr), slice(arr, lit(1), greatest(n, lit(0))))
      .otherwise(concat(arr, array_repeat(extender, (n - size(arr)).cast("int"))))

  /** CH `formatDateTime(t, '%Y-%m-%d …')`: MySQL-style percent format.
    * The literal format compiles once to a java.time pattern
    * (%M is MINUTE in CH, unlike MySQL); any literal text between
    * placeholders is single-quoted so pattern letters cannot leak.
    */
  def formatDateTime(t: Column, fmt: String): Column =
    date_format(t, translateChFormat(fmt))

  private val chFormatMap = Map(
    'Y' -> "yyyy", 'y' -> "yy", 'm' -> "MM", 'c' -> "M", 'd' -> "dd",
    'e' -> "d", 'j' -> "DDD", 'H' -> "HH", 'I' -> "hh", 'h' -> "hh",
    'M' -> "mm", 'i' -> "mm", 'S' -> "ss", 's' -> "ss", 'f' -> "SSSSSS",
    'p' -> "a", 'a' -> "EEE", 'W' -> "EEEE", 'b' -> "MMM", 'Q' -> "Q",
    'F' -> "yyyy-MM-dd", 'D' -> "MM/dd/yy", 'T' -> "HH:mm:ss",
    'R' -> "HH:mm", 'n' -> "\n", 't' -> "\t")

  private[graft] def translateChFormat(fmt: String): String = {
    val sb = new StringBuilder
    val lit = new StringBuilder
    def flushLit(): Unit = if (lit.nonEmpty) {
      val s = lit.toString
      // quote any run containing letters (potential pattern chars);
      // bare punctuation/digits pass through
      if (s.exists(_.isLetter) || s.contains("'"))
        sb.append("'").append(s.replace("'", "''")).append("'")
      else sb.append(s)
      lit.clear()
    }
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        val spec = fmt.charAt(i + 1)
        if (spec == '%') lit.append('%')
        else chFormatMap.get(spec) match {
          case Some(p) => flushLit(); sb.append(p)
          case None => throw new IllegalArgumentException(
            s"formatDateTime: unsupported specifier %$spec in '$fmt'")
        }
        i += 2
      } else { lit.append(c); i += 1 }
    }
    flushLit()
    sb.toString
  }

  /** CH `toStartOfFiveMinutes` family: epoch-floor to an N-second
    * grid — pure integer arithmetic on the timestamp.
    */
  def toStartOfInterval(t: Column, seconds: Long): Column =
    timestamp_seconds(
      floor(unix_timestamp(t) / seconds).cast("long") * seconds)

  /** CH `toStartOfWeek(d[, mode])`: mode 0 (default) weeks start
    * SUNDAY; mode 1/3 start Monday (= toMonday).
    */
  def toStartOfWeek(d: Column, mode: Int = 0): Column =
    if (mode % 2 == 1) toMonday(d)
    else date_sub(d.cast("date"), dayofweek(d.cast("date")) - lit(1))

  /** CH `toTime(t)`: keep the time of day, move the date to
    * 1970-01-02 (CH's convention for time-only arithmetic).
    */
  def toTime(t: Column): Column =
    timestamp_seconds(lit(86400L) + pmod(unix_timestamp(t), lit(86400L)))

  /** CH `avgWeighted(x, w)`: sum(x·w)/sum(w), NaN over an empty or
    * zero-weight group (CH's contract; a bare division would throw
    * under ANSI).
    */
  def avgWeighted(x: Column, w: Column): Column = {
    val sw = sum(w.cast("double"))
    val sxw = sum(x.cast("double") * w.cast("double"))
    when(coalesce(sw, lit(0.0)) === 0.0, lit(Double.NaN)).otherwise(sxw / sw)
  }

  /** CH `skewPop` IS Spark's skewness (population third moment over
    * sigma^3); `kurtPop` is NON-excess — Spark's excess kurtosis
    * plus 3. The *Samp variants rescale the population value by the
    * Bessel factor on the variance denominator, CH's definition.
    */
  def kurtPop(x: Column): Column = kurtosis(x) + lit(3.0)

  def skewSamp(x: Column): Column = {
    val n = count(x).cast("double")
    skewness(x) * pow((n - 1) / n, 1.5)
  }

  def kurtSamp(x: Column): Column = {
    val n = count(x).cast("double")
    kurtPop(x) * pow((n - 1) / n, 2.0)
  }

  /** CH `replaceOne(h, p, r)`: replace only the FIRST occurrence of
    * the plain substring `p` (Spark's replace is replace-all). Prefix
    * via substring_index, suffix via an offset substr — branch-only,
    * no regex.
    */
  def replaceOne(h: Column, p: Column, r: Column): Column = {
    val pos = call_function("locate", p, h)
    when(p === lit(""), h)
      .when(pos > 0,
        concat(h.substr(lit(1), pos - 1), r,
          h.substr(pos + length(p), length(h))))
      .otherwise(h)
  }

  /** CH `countSubstrings(h, n)`: non-overlapping occurrence count of a
    * plain substring — the length-delta arithmetic form, no regex.
    */
  def countSubstrings(h: Column, n: Column): Column =
    when(length(n) === 0, lit(0L)).otherwise(
      ((length(h) - length(replace(h, n, lit("")))) / length(n)).cast("long"))

  /** CH `multiSearchAny(h, [n1, …])`: 1 iff any needle occurs in the
    * haystack.
    */
  def multiSearchAny(h: Column, needles: Column): Column =
    coalesce(exists(needles, x => h.contains(x)), lit(false)).cast("long")

  /** Morton (Z-order) bit interleave of two long columns: bit i of `a`
    * lands at position 2i, bit i of `b` at 2i+1 — CH's `mortonEncode`
    * layout. An unrolled `bits`-term bitwise OR over LITERAL shifts:
    * the positions are disjoint so OR equals the arithmetic sum (no
    * carries), the whole expression stays in whole-stage codegen, and
    * any engine replays it as the same shifts. One definition serves
    * both the SQL dialect surface and [[graft.sources.Warehouse]]'s
    * z-ordered layout writer.
    */
  def mortonInterleave(a: Column, b: Column, bits: Int = 32): Column = {
    require(bits >= 1 && bits <= 32, "mortonInterleave: 1 <= bits <= 32")
    val al = a.cast("long")
    val bl = b.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Character n-grams of a string (1-based substrings, length-n
    * windows) — the unit set of the fuzzy-match family below. Empty
    * when the string is shorter than n.
    */
  def charNgrams(s: Column, n: Int): Column =
    // explicit short-string guard: sequence(1, 0) would DESCEND
    // (Spark auto-negates the step), yielding phantom grams
    when(length(s) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(s) - (n - 1)),
        i => substring(s, i, lit(n))))

  /** Multiset n-gram count map of a string. */
  private def ngramCountMap(s: Column, n: Int): Column =
    aggregate(charNgrams(s, n),
      map_from_arrays(array().cast("array<string>"),
        array().cast("array<long>")),
      (acc, g) => map_zip_with(acc, map(g, lit(1L)),
        (_, a, b) => coalesce(a, lit(0L)) + coalesce(b, lit(0L))))

  /** Multiset overlap `Σ min(count_a(g), count_b(g))` — the shared
    * n-gram mass. `|symdiff| = na + nb − 2·overlap`, which is the
    * identity the distance below and its SQL oracles both use.
    * `b`'s count map binds ONCE through a one-element transform (the
    * bindOnce discipline): inlined into the fold lambda it would
    * rebuild per needle gram — O(ga·gb²) per row instead of
    * O(ga+gb²).
    */
  private def ngramOverlap(a: Column, b: Column, n: Int): Column =
    element_at(transform(array(ngramCountMap(b, n)), cb =>
      aggregate(map_entries(ngramCountMap(a, n)), lit(0L), (acc, e) =>
        acc + least(e.getField("value"),
          coalesce(element_at(cb, e.getField("key")), lit(0L))))), 1)

  /** CH `ngramDistance(a, b)`: multiset symmetric difference of the
    * two strings' 4-grams over the total gram mass —
    * `(na + nb − 2·overlap) / (na + nb)` in [0, 1]; 0 when both are
    * gramless (too short / empty), 1 when exactly one is. Unlike CH
    * the grams are true substrings, not hashes — same metric, no
    * hash-collision noise, replayable in any SQL engine.
    */
  def ngramDistance(a: Column, b: Column, n: Int = 4): Column = {
    val na = size(charNgrams(a, n)).cast("double")
    val nb = size(charNgrams(b, n)).cast("double")
    when(na + nb === 0, lit(0.0))
      .when(na * nb === 0, lit(1.0))
      .otherwise(lit(1.0) -
        (lit(2.0) * ngramOverlap(a, b, n)) / (na + nb))
  }

  /** CH `ngramSearch(haystack, needle)`: the fraction of the
    * needle's 4-gram mass present in the haystack (multiset min) —
    * 1.0 is a full fuzzy hit, 0.0 no shared grams; a gramless needle
    * scores 0. Asymmetric by design, like CH.
    */
  def ngramSearch(h: Column, needle: Column, n: Int = 4): Column = {
    val nn = size(charNgrams(needle, n)).cast("double")
    when(nn === 0, lit(0.0))
      .otherwise(ngramOverlap(needle, h, n) / nn)
  }

  /** CH `IPv4NumToString(n)`: dotted-quad text from a UInt32 address
    * (the hits/visits ClientIP column shape, ddl/hits.sql:16) — pure
    * shift/mask/concat, fully codegen'd.
    */
  def ipv4NumToString(n: Column): Column = {
    val x = n.cast("long")
    concat_ws(".",
      shiftright(x, 24).bitwiseAND(lit(255L)),
      shiftright(x, 16).bitwiseAND(lit(255L)),
      shiftright(x, 8).bitwiseAND(lit(255L)),
      x.bitwiseAND(lit(255L)))
  }

  /** CH `IPv4StringToNum(s)`: UInt32 from dotted-quad text, 0 for
    * anything malformed (CH's OrDefault contract — the throwing
    * variant has no place in a full-scan pipeline).
    */
  def ipv4StringToNum(s: Column): Column = {
    val octets = transform(split(s, "\\."), p => p.cast("long"))
    val wellFormed = s.rlike("^[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}$") &&
      forall(octets, o => o <= 255)
    when(wellFormed,
      aggregate(octets, lit(0L), (acc, o) => acc * 256 + o))
      .otherwise(lit(0L))
  }

  /** Encoding alphabet for [[sequenceMatch]]/[[sequenceCount]]: the
    * char at (1-based) index `b` stands for an event whose condition
    * bitmask is `b`. 31 chars cover up to 5 conditions; every char is
    * alphanumeric, so it is safe inside a regex character class.
    */
  private val seqAlphabet = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcde"

  /** The group's matched events as one string: keep events matching at
    * least one condition, sort by (ts, bitmask), and emit one alphabet
    * char per event encoding WHICH conditions it matched. NULL-ts
    * events are dropped (they have no position in the sequence).
    * Per-group state is the matched-event list — bounded by the
    * busiest key, like every collect-based aggregate here.
    */
  private def sequenceEventString(ts: Column, conds: Seq[Column]): Column = {
    val n = conds.length
    require(n >= 1 && n <= 5,
      s"sequence functions support 1..5 conditions, got $n")
    val b = conds.zipWithIndex.map { case (c, i) =>
      when(coalesce(c.cast("boolean"), lit(false)), lit(1 << i))
        .otherwise(lit(0))
    }.reduce(_ + _)
    val ev = struct(ts.as("t"), b.as("b"))
    val sorted = array_sort(collect_list(when(ts.isNotNull && b > 0, ev)))
    array_join(transform(sorted, e =>
      element_at(split(lit(seqAlphabet), ""), e.getField("b"))), "")
  }

  /** Translate a CH sequence pattern — `(?N)` event refs and `.*` gaps
    * — into a regex over [[seqAlphabet]]. `(?N)` becomes the class of
    * every bitmask char with bit N-1 set (an event matching several
    * conditions satisfies any of them); `.*` becomes a LAZY `.*?` so
    * non-overlapping counting finds minimal chains, CH's
    * earliest-completion behavior. The `(?t…)` time-constraint form is
    * rejected loudly (windowFunnel covers the time-bounded chain).
    */
  private[graft] def compileSequencePattern(pattern: String, n: Int): String = {
    val token = """\(\?(\d+)\)|\.\*|\(\?t[^)]*\)""".r
    val sb = new StringBuilder
    var pos = 0
    token.findAllMatchIn(pattern).foreach { m =>
      require(m.start == pos,
        s"unrecognized sequence pattern fragment at ${pos}: '$pattern'")
      pos = m.end
      if (m.matched == ".*") sb.append(".*?")
      else if (m.group(1) != null) {
        val k = m.group(1).toInt
        require(k >= 1 && k <= n,
          s"pattern refers to condition $k but only $n conditions given")
        val chars = (1 until (1 << n))
          .filter(b => (b & (1 << (k - 1))) != 0)
          .map(b => seqAlphabet.charAt(b - 1))
        sb.append('[').append(chars.mkString).append(']')
      } else throw new IllegalArgumentException(
        "sequence (?t...) time constraints are not supported; " +
          "use windowFunnel for time-bounded chains")
    }
    require(pos == pattern.length,
      s"unrecognized sequence pattern fragment at ${pos}: '$pattern'")
    sb.toString
  }

  /** ClickHouse `sequenceMatch(pattern)(ts, cond1, …)`: 1 iff the
    * group's matched events, time-ordered, contain a chain matching
    * the pattern. Events matching NO condition are invisible to the
    * pattern; adjacent refs (`(?1)(?2)`) therefore mean "no OTHER
    * matched event in between", exactly CH's contract. Runs as one
    * regex over the encoded event string.
    */
  def sequenceMatch(pattern: String, ts: Column, conds: Seq[Column]): Column =
    if (pattern.contains("(?t"))
      sequenceMatchTimed(pattern, ts, conds)
    else
      regexp_like(sequenceEventString(ts, conds),
        lit(compileSequencePattern(pattern, conds.length))).cast("long")

  /** The `(?t OP seconds)` time-constrained form (round 11 — X179).
    * Supported shape: a PURE chain of refs with an optional time
    * constraint between each adjacent pair —
    * `(?a)(?t<=N)(?b)(?t>M)(?c)…` — i.e. CH's canonical timed
    * patterns. `.*` gaps do not compose with time constraints here
    * (rejected loudly): a timed pair pins CONSECUTIVE matched events,
    * so the match is an exists-scan over length-m runs of the sorted
    * matched-event array — one HOF pass, no backtracking, and any SQL
    * engine replays it as the same run check. Constraint semantics:
    * `t(next) − t(prev) OP seconds`, timestamps in whole seconds
    * (CH's unit).
    */
  private def sequenceMatchTimed(pattern: String, ts: Column,
      conds: Seq[Column]): Column = {
    val n = conds.length
    require(n >= 1 && n <= 5,
      s"sequence functions support 1..5 conditions, got $n")
    val token = """\(\?(\d+)\)|\(\?t\s*(<=|>=|<|>|==)\s*(\d+)\)|\.\*""".r
    var pos = 0
    // (refIndex, constraint-vs-previous)
    val refs = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Option[(String, Long)])]
    var pending: Option[(String, Long)] = None
    token.findAllMatchIn(pattern).foreach { m =>
      require(m.start == pos,
        s"unrecognized sequence pattern fragment at ${pos}: '$pattern'")
      pos = m.end
      if (m.group(1) != null) {
        val k = m.group(1).toInt
        require(k >= 1 && k <= n,
          s"pattern refers to condition $k but only $n conditions given")
        refs += ((k, pending)); pending = None
      } else if (m.group(2) != null) {
        require(refs.nonEmpty && pending.isEmpty,
          "a (?t...) constraint must sit between two event refs")
        pending = Some((m.group(2), m.group(3).toLong))
      } else throw new IllegalArgumentException(
        ".* gaps do not compose with (?t...) time constraints; " +
          "use an untimed pattern or split the chain")
    }
    require(pos == pattern.length,
      s"unrecognized sequence pattern fragment at ${pos}: '$pattern'")
    require(pending.isEmpty,
      "a (?t...) constraint must be followed by an event ref")
    require(refs.head._2.isEmpty, "the first ref cannot carry a (?t...)")
    val m = refs.length
    val b = conds.zipWithIndex.map { case (c, i) =>
      when(coalesce(c.cast("boolean"), lit(false)), lit(1 << i))
        .otherwise(lit(0))
    }.reduce(_ + _)
    val ev = struct(ts.cast("long").as("t"), b.as("b"))
    val evs = array_sort(collect_list(when(ts.isNotNull && b > 0, ev)))
    def runOk(evsC: Column, j: Column): Column =
      refs.zipWithIndex.map { case ((k, tc), i) =>
        val e = element_at(evsC, (j + i).cast("int"))
        val bitOk = e.getField("b")
          .bitwiseAND(lit(1 << (k - 1))) =!= 0
        val tOk = tc match {
          case None => lit(true)
          case Some((op, secs)) =>
            val prev = element_at(evsC, (j + i - 1).cast("int"))
            val d = e.getField("t") - prev.getField("t")
            op match {
              case "<="  => d <= secs
              case ">="  => d >= secs
              case "<"   => d < secs
              case ">"   => d > secs
              case "=="  => d === secs
            }
        }
        bitOk && tOk
      }.reduce(_ && _)
    when(size(evs) >= m,
      exists(sequence(lit(1), size(evs) - (m - 1)),
        j => runOk(evs, j)))
      .otherwise(lit(false)).cast("long")
  }

  /** ClickHouse `sequenceNextNode(direction, base)(ts, value,
    * base_cond, cond1, …)` (`clickhouse.com/docs/sql-reference/
    * aggregate-functions/parametric-functions#sequencenextnode`): walk
    * the time-sorted event stream in `direction`, anchor at `base`,
    * require the k conditions to hold on k CONSECUTIVE events from the
    * anchor, and return the value of the event right after the chain
    * (NULL when the chain does not match or nothing follows).
    * Supported (direction, base) pairs: (forward, head),
    * (backward, tail), (forward, first_match),
    * (backward, last_match) — the combinations CH documents.
    * Determinism: ties on ts break on the value column, so the walk
    * order is total.
    *
    * Scale: per-GROUP sorted event list (the windowFunnel caveat —
    * state bounded by the group, map-side partials concatenate).
    */
  def sequenceNextNode(direction: String, base: String, ts: Column,
      value: Column, baseCond: Column, conds: Seq[Column]): Column = {
    require(Seq("forward", "backward").contains(direction),
      s"sequenceNextNode: direction must be forward|backward, got $direction")
    val okBase = direction match {
      case "forward" => Seq("head", "first_match")
      case _ => Seq("tail", "last_match")
    }
    require(okBase.contains(base),
      s"sequenceNextNode: base for $direction must be one of " +
        s"${okBase.mkString("|")}, got $base")
    val k = conds.length
    require(k >= 1, "sequenceNextNode needs at least one chain condition")
    val ev = struct(Seq(ts.cast("long").as("t"),
      value.cast("string").as("v"),
      coalesce(baseCond.cast("boolean"), lit(false)).as("b")) ++
        conds.zipWithIndex.map { case (c, i) =>
          coalesce(c.cast("boolean"), lit(false)).as(s"c$i")
        }: _*)
    val asc = array_sort(collect_list(when(ts.isNotNull, ev)))
    val seq0 = if (direction == "forward") asc else reverse(asc)
    val start: Column = base match {
      case "head" | "tail" => lit(1)
      case _ => // first event satisfying (cond1 AND base_cond)
        array_position(transform(seq0,
          e => e.getField("c0") && e.getField("b")), lit(true))
    }
    // try_element_at: past-the-end and no-match (position 0 → NULL
    // index) probes yield NULL, every coalesce below sees false, and
    // the when() yields NULL — Spark 4's plain element_at THROWS on
    // out-of-bounds
    val safeStart = when(start > 0, start).cast("int")
    val chainOk = (0 until k).map { i =>
      val e = try_element_at(seq0, safeStart + i)
      coalesce(e.getField(s"c$i"), lit(false))
    }.reduce(_ && _)
    val baseOk =
      coalesce(try_element_at(seq0, safeStart).getField("b"), lit(false))
    when(baseOk && chainOk,
      try_element_at(seq0, safeStart + k).getField("v"))
  }

  /** ClickHouse `sequenceCount(pattern)(ts, cond1, …)`: the number of
    * NON-OVERLAPPING chains matching the pattern, scanning from the
    * earliest event — leftmost minimal-match regex counting.
    */
  def sequenceCount(pattern: String, ts: Column, conds: Seq[Column]): Column =
    regexp_count(sequenceEventString(ts, conds),
      lit(compileSequencePattern(pattern, conds.length))).cast("long")

  /** ClickHouse `windowFunnel(window)(ts, cond1, …, condN)`: an
    * aggregate returning the deepest funnel level reached — the max k
    * such that events matching cond1 … condk occurred in order with
    * every step within `window` SECONDS of the chain's cond1 start.
    *
    * Shape: collect the group's (ts, flags) events, sort by time, and
    * fold once. The fold state holds, per level i, the chain-START
    * time of a chain that has reached level i+1; a cond1 event
    * restarts the chain (a later start can only extend reach, so the
    * overwrite is monotone), and a cond(i+1) event at time t promotes
    * the level-i start when `t <= start + window`. Each step reads the
    * PRE-update state, so one event advances at most one step of any
    * given chain — a row matching cond1 and cond2 does not complete a
    * two-step funnel by itself. Deterministic: ties in `ts` sort by
    * the flag tuple identically in Spark and the DuckDB oracle.
    *
    * Scale: the per-group state is the sorted event list — bounded by
    * the busiest single key (a per-user funnel over months of events
    * fits comfortably; an unbounded global key would not, as with any
    * collect-based aggregate).
    */
  /** Optional `modes` (round 11 — the CH mode set):
    *
    *  - `strict_order`: an event matching NO condition freezes the
    *    chain (CH's "don't allow interventions of other events";
    *    A→B→D→C finds level 2). The frozen level is whatever was
    *    reached before the intruder.
    *  - `strict_dedup`: an event repeating a condition whose level is
    *    ALREADY reached freezes the chain ("repeating event interrupts
    *    further processing") — including a second level-1 event, which
    *    in the default mode would restart the chain.
    *  - `strict_increase`: a level only advances on a timestamp
    *    STRICTLY greater than the timestamp of the event that set the
    *    previous level (equal-ts pile-ups count once).
    *
    * Tie policy (all modes): events sort by (ts, c0…cn) — CH reads
    * block order here, which is nondeterministic; the engine's total
    * sort is the documented deterministic refinement (the deltaSum
    * note). The freeze flag applies to the event that raises it: a
    * chain-killing event never also advances the chain.
    */
  def windowFunnel(window: Column, ts: Column, conds: Seq[Column],
      modes: Set[String] = Set.empty): Column = {
    val n = conds.length
    require(n >= 1, "windowFunnel needs at least one condition")
    val allowed = Set("strict_order", "strict_dedup", "strict_increase")
    require(modes.subsetOf(allowed),
      s"windowFunnel modes must be in $allowed, got $modes")
    val strictOrder = modes("strict_order")
    val strictDedup = modes("strict_dedup")
    val strictIncrease = modes("strict_increase")
    val ev = struct(ts.cast("long").as("ts") +:
      conds.zipWithIndex.map { case (c, i) =>
        coalesce(c.cast("boolean"), lit(false)).as(s"c$i")
      }: _*)
    // a NULL-ts event can neither start nor extend a chain (a null
    // start would silently reset level 1) — collect_list drops nulls,
    // so the guard excludes those events entirely
    val sorted = array_sort(collect_list(when(ts.isNotNull, ev)))
    // state per level i: t_i = chain-START ts (the window anchors to
    // the FIRST event, as in CH), e_i = ts of the event that set the
    // level (the strict_increase comparand); plus the freeze flag
    val init = struct((0 until n).flatMap(i => Seq(
      lit(null).cast("bigint").as(s"t$i"),
      lit(null).cast("bigint").as(s"e$i"))) :+
      lit(false).as("dead"): _*)
    val folded = aggregate(sorted, init, (acc, e) => {
      val t = e.getField("ts")
      val anyMatch = (0 until n).map(i => e.getField(s"c$i"))
        .reduce(_ || _)
      val repeatHit = (0 until n).map(i =>
        e.getField(s"c$i") && acc.getField(s"t$i").isNotNull)
        .reduce(_ || _)
      val dead = acc.getField("dead") ||
        (if (strictOrder) !anyMatch else lit(false)) ||
        (if (strictDedup) repeatHit else lit(false))
      val fields = (0 until n).flatMap { i =>
        if (i == 0) {
          val adv = !dead && e.getField("c0")
          Seq(when(adv, t).otherwise(acc.getField("t0")).as("t0"),
            when(adv, t).otherwise(acc.getField("e0")).as("e0"))
        } else {
          val prevT = acc.getField(s"t${i - 1}")
          val prevE = acc.getField(s"e${i - 1}")
          val adv = !dead && e.getField(s"c$i") && prevT.isNotNull &&
            t <= prevT + window.cast("long") &&
            (if (strictIncrease) t > prevE else lit(true))
          Seq(when(adv, prevT).otherwise(acc.getField(s"t$i")).as(s"t$i"),
            when(adv, t).otherwise(acc.getField(s"e$i")).as(s"e$i"))
        }
      }
      struct(fields :+ dead.as("dead"): _*)
    })
    (0 until n).foldLeft(lit(0)) { (els, i) =>
      when(folded.getField(s"t$i").isNotNull, lit(i + 1)).otherwise(els)
    }
  }

  /** ClickHouse `intervalLengthSum(start, end)`: total length of the
    * UNION of the group's `[start, end)` intervals — overlap counted
    * once, gaps not at all (the "total time with ≥1 session open"
    * aggregate). Sweep over the start-sorted interval list: extend a
    * running frontier `cur`, add only the part of each interval past
    * it. Inverted or empty intervals (`end <= start`) contribute 0 and
    * never move the frontier; a NULL endpoint drops the interval
    * (aggregate NULL-skip convention). Per-group state is the interval
    * list, the windowFunnel caveat.
    */
  def intervalLengthSum(start: Column, end: Column): Column = {
    val iv = struct(start.cast("long").as("s"), end.cast("long").as("e"))
    val sorted = array_sort(collect_list(
      when(start.isNotNull && end.isNotNull, iv)))
    val init = struct(lit(0L).as("acc"),
      lit(null).cast("bigint").as("cur"))
    val folded = aggregate(sorted, init, (st, i) => {
      val s = i.getField("s")
      val e = i.getField("e")
      val cur = st.getField("cur")
      val lo = when(cur.isNotNull && cur > s, cur).otherwise(s)
      val add = when(e > lo, e - lo).otherwise(lit(0L))
      val ncur = when(e > s,
          when(cur.isNotNull && cur > e, cur).otherwise(e))
        .otherwise(cur)
      struct((st.getField("acc") + add).as("acc"), ncur.as("cur"))
    })
    folded.getField("acc")
  }

  /** The ±1 boundary-event sweep list shared by maxIntersections and
    * maxIntersectionsPosition: two events per valid `[s, e)` interval,
    * sorted by `(position, delta)` — delta −1 sorts before +1 at equal
    * positions, so an interval ENDING where another starts does not
    * overlap it (the half-open contract).
    */
  private def intersectionEvents(start: Column, end: Column): Column = {
    val s = start.cast("long")
    val e = end.cast("long")
    val pairs = collect_list(when(
      start.isNotNull && end.isNotNull && e > s,
      struct(s.as("s"), e.as("e"))))
    array_sort(flatten(transform(pairs, p => array(
      struct(p.getField("s").as("pos"), lit(1).as("d")),
      struct(p.getField("e").as("pos"), lit(-1).as("d"))))))
  }

  /** ClickHouse `maxIntersections(start, end)`: the maximum number of
    * the group's `[start, end)` intervals simultaneously open — peak
    * concurrency. One fold over the ±1 sweep events.
    */
  def maxIntersections(start: Column, end: Column): Column = {
    val folded = aggregate(intersectionEvents(start, end),
      struct(lit(0L).as("cur"), lit(0L).as("best")),
      (st, ev) => {
        val cur = st.getField("cur") + ev.getField("d").cast("long")
        struct(cur.as("cur"),
          greatest(st.getField("best"), cur).as("best"))
      })
    folded.getField("best")
  }

  /** ClickHouse `maxIntersectionsPosition(start, end)`: the LEFTMOST
    * position where [[maxIntersections]]' peak is first reached (a
    * strict `>` keeps the first peak). 0 for an empty/all-degenerate
    * group, as a CH UInt would render.
    */
  def maxIntersectionsPosition(start: Column, end: Column): Column = {
    val folded = aggregate(intersectionEvents(start, end),
      struct(lit(0L).as("cur"), lit(0L).as("best"), lit(0L).as("bp")),
      (st, ev) => {
        val cur = st.getField("cur") + ev.getField("d").cast("long")
        val better = cur > st.getField("best")
        struct(cur.as("cur"),
          when(better, cur).otherwise(st.getField("best")).as("best"),
          when(better, ev.getField("pos"))
            .otherwise(st.getField("bp")).as("bp"))
      })
    folded.getField("bp")
  }

  /** ClickHouse `groupArrayMovingSum[(k)](x)` under this engine's
    * ordered-aggregate policy (the deltaSumTimestamp precedent): CH
    * reads block order, which is nondeterministic even on a single CH
    * node, so the engine's form takes an explicit ordering column —
    * `groupArrayMovingSum(k)(x, ord)` — and sorts the group by
    * `(ord, x)` (value breaks ordering ties, keeping the output a pure
    * function of the group's multiset). `k = None` is CH's default:
    * the window grows with the prefix (a plain running sum).
    *
    * Shape: cumulative sums once, then `zip_with` against a zero-padded
    * shifted copy — two slices of the SAME array, never an
    * index-addressed lambda over it (the q154 O(n²) re-evaluation
    * trap).
    */
  def groupArrayMovingSum(k: Option[Int], x: Column, ord: Column): Column = {
    k.foreach(kk => require(kk >= 1,
      s"groupArrayMovingSum window must be >= 1, got $kk"))
    val pairs = array_sort(collect_list(
      when(x.isNotNull && ord.isNotNull,
        struct(ord.as("o"), x.cast("long").as("x")))))
    val vals = transform(pairs, p => p.getField("x"))
    val cum = arrayCumSumLong(vals)
    k match {
      case None => cum
      case Some(kk) =>
        val n = size(cum)
        // cum[i] - cum[i-k], with zeros padding the first k positions
        val shifted = concat(
          array_repeat(lit(0L), least(lit(kk), n)),
          slice(cum, lit(1), greatest(n - kk, lit(0))))
        zip_with(cum, shifted, (a, b) => a - b)
    }
  }

  /** ClickHouse `groupArrayMovingAvg(k)(x)` (ordered form, see
    * [[groupArrayMovingSum]]): each moving sum divided by the FULL
    * window size `k` — CH divides by the window even while it is still
    * filling, so leading elements are damped; result is DOUBLE (CH
    * keeps integer types and truncates, a lossy quirk this engine does
    * not copy — documented divergence).
    */
  def groupArrayMovingAvg(k: Int, x: Column, ord: Column): Column =
    transform(groupArrayMovingSum(Some(k), x, ord),
      s => s.cast("double") / lit(k.toDouble))

  /** ClickHouse `pointInPolygon((x, y), [[x1, y1], …])` (the array
    * spelling of the polygon; this engine takes the point as two
    * scalar arguments — Spark SQL has no bare-tuple literal). Even-odd
    * ray casting: count edges straddling the horizontal ray from the
    * point, odd → inside. The polygon closes itself (last→first edge),
    * as in CH. Boundary points follow the strict comparisons (CH
    * documents border behavior as unspecified); all arithmetic is
    * IEEE +−×÷, bit-deterministic across engines, so an oracle can
    * replay the exact formula. Horizontal edges never straddle, so
    * their division-by-zero branch is unreachable garbage (NaN), never
    * counted.
    */
  def pointInPolygon(px: Column, py: Column, poly: Column): Column = {
    val xs = transform(poly, p => element_at(p, 1).cast("double"))
    val ys = transform(poly, p => element_at(p, 2).cast("double"))
    val n = size(poly)
    val x2 = concat(slice(xs, lit(2), n - 1), slice(xs, lit(1), lit(1)))
    val y2 = concat(slice(ys, lit(2), n - 1), slice(ys, lit(1), lit(1)))
    val a = zip_with(xs, ys, (x, y) => struct(x.as("x"), y.as("y")))
    val b = zip_with(x2, y2, (x, y) => struct(x.as("x"), y.as("y")))
    val pxd = px.cast("double")
    val pyd = py.cast("double")
    val crossings = zip_with(a, b, (p1, p2) => {
      val straddles =
        (p1.getField("y") > pyd) =!= (p2.getField("y") > pyd)
      val xint = (p2.getField("x") - p1.getField("x")) *
        (pyd - p1.getField("y")) /
        (p2.getField("y") - p1.getField("y")) + p1.getField("x")
      when(straddles && pxd < xint, lit(1L)).otherwise(lit(0L))
    })
    (aggregate(crossings, lit(0L), (s, c) => s + c) % 2).cast("long")
  }

  /** ClickHouse `entropy(x)`: Shannon entropy (bits) of the group's
    * value distribution. Values compare by their STRING rendering
    * (CH hashes the binary value; same equivalence classes for the
    * string/integer columns the query surface feeds it). One sorted
    * pass with a run-length fold accumulating `Σ c·log2(c)`, then
    * `H = log2(n) − Σ/n` — algebraically equal to `−Σ p·log2(p)` but
    * needing only one pass and no per-distinct-value map. NULLs are
    * skipped (collect_list contract). Per-group state is the value
    * list, the windowFunnel caveat.
    */
  def entropy(x: Column): Column = {
    val sorted = array_sort(collect_list(x.cast("string")))
    val n = size(sorted)
    val ln2 = math.log(2.0)
    def cLog2c(c: Column): Column =
      c.cast("double") * log(c.cast("double")) / lit(ln2)
    val init = struct(lit(null).cast("string").as("p"),
      lit(0L).as("r"), lit(0.0).as("a"))
    val folded = aggregate(sorted, init, (st, v) => {
      val same = st.getField("p") <=> v
      struct(v.as("p"),
        when(same, st.getField("r") + 1).otherwise(lit(1L)).as("r"),
        when(same, st.getField("a"))
          .otherwise(st.getField("a") +
            when(st.getField("r") > 0, cLog2c(st.getField("r")))
              .otherwise(lit(0.0))).as("a"))
    })
    val total = folded.getField("a") +
      when(folded.getField("r") > 0, cLog2c(folded.getField("r")))
        .otherwise(lit(0.0))
    when(n > 0,
      log(n.cast("double")) / lit(ln2) - total / n.cast("double"))
      .otherwise(lit(0.0))
  }

  /** Exact integer sufficient statistics for the regression /
    * correlation family: casts both inputs to decimal(18,0) so every
    * sum and cross-product folds exactly in decimal(38,0) — the same
    * integers the oracle derives in HUGEINT. Shared by
    * [[simpleLinearRegression]] and [[corrExact]].
    */
  private def momentSums(x: Column, y: Column):
      (Column, Column, Column, Column, Column, Column) = {
    val dx = x.cast("decimal(18,0)")
    val dy = y.cast("decimal(18,0)")
    val keep = x.isNotNull && y.isNotNull
    (sum(when(keep, dx)), sum(when(keep, dy)),
      sum(when(keep, dx * dy)), sum(when(keep, dx * dx)),
      sum(when(keep, dy * dy)),
      count(when(keep, lit(1))).cast("decimal(18,0)"))
  }

  /** ClickHouse `simpleLinearRegression(x, y)` → named struct
    * `(k, b)`: least-squares slope and intercept. Sums fold as exact
    * decimals; the final ops are the only IEEE arithmetic —
    * `k = num/den` (one divide of two exactly-cast doubles), then
    * `b = (Σy − k·Σx)/n` — in exactly the order the oracle replays,
    * so both engines emit bit-identical doubles (the determinism
    * policy of plans/NativeStats.scala). Integer-valued inputs are
    * the contract, as there. NULL pairs are skipped; a vertical or
    * empty group yields NULL slope (CH: nan).
    */
  def simpleLinearRegression(x: Column, y: Column): Column = {
    val (sx, sy, sxy, sxx, _, n) = momentSums(x, y)
    val num = (n * sxy - sx * sy).cast("double")
    val den = (n * sxx - sx * sx).cast("double")
    val k = when(den =!= 0.0, num / den)
    val b = (sy.cast("double") - k * sx.cast("double")) / n.cast("double")
    struct(k.as("k"), b.as("b"))
  }

  /** Pearson correlation over exact decimal sums — registered as CH's
    * `corrStable` in the dialect. Spark's built-in `corr`
    * accumulates running doubles whose result depends on row order;
    * this form is a pure function of six exact integers with the
    * final three IEEE ops (`cov/sqrt(vx·vy)`) mirrored by the oracle,
    * so the hashed surface is stable (same rationale as rankCorr in
    * plans/NativeStats.scala). NULL for degenerate (constant/empty)
    * sides.
    */
  def corrExact(x: Column, y: Column): Column = {
    val (sx, sy, sxy, sxx, syy, n) = momentSums(x, y)
    val cov = (n * sxy - sx * sy).cast("double")
    val vx = (n * sxx - sx * sx).cast("double")
    val vy = (n * syy - sy * sy).cast("double")
    when(vx > 0.0 && vy > 0.0, cov / sqrt(vx * vy))
  }

  /** Deterministic equal-width histogram — the engine's `histogram
    * (bins)(x)`. DOCUMENTED DEVIATION: CH's adaptive streaming
    * histogram is explicitly nondeterministic (its bin boundaries
    * depend on merge order); a nondeterministic aggregate can never
    * sit in this engine's exactly-hashed surfaces, so the pinned form
    * is the classic equal-width histogram over the group's [min, max]
    * — `bins` buckets of width (max−min)/bins, last bucket inclusive.
    * Returns array of (lo, hi, cnt) structs whose bounds are pure IEEE
    * functions of (min, max, i) — the oracle replays them bit-for-bit.
    * Single-value groups land wholly in bucket 0. Per-group state is
    * the value list (the windowFunnel caveat); the fold is O(n·bins)
    * with bins small by construction.
    */
  def histogramEq(bins: Int, x: Column): Column = {
    require(bins >= 1 && bins <= 1000, s"histogram bins in [1,1000], got $bins")
    val arr = collect_list(x.cast("double"))
    val mn = array_min(arr)
    val w = (array_max(arr) - mn) / lit(bins.toDouble)
    // mn and w ride IN the fold state: referencing an aggregate-derived
    // column inside the lambda would re-evaluate its whole subtree
    // (array_min over the full group) PER ELEMENT — the q154 HOF-lambda
    // O(n²) trap, hit live by this function's first cut at sf0.1
    val init = struct(mn.as("mn"), w.as("w"),
      array_repeat(lit(0L), bins).as("c"))
    val folded = aggregate(arr, init, (st, v) => {
      val m = st.getField("mn")
      val ww = st.getField("w")
      val idx = when(ww === 0.0, lit(0))
        .otherwise(least(floor((v - m) / ww).cast("int"), lit(bins - 1)))
      struct(m.as("mn"), ww.as("w"),
        transform(st.getField("c"),
          (c, i) => when(i === idx, c + 1).otherwise(c)).as("c"))
    })
    val fm = folded.getField("mn")
    val fw = folded.getField("w")
    transform(folded.getField("c"), (c, i) => struct(
      (fm + i.cast("double") * fw).as("lo"),
      (fm + (i + 1).cast("double") * fw).as("hi"),
      c.as("cnt")))
  }

  /** CH `bar(x, min, max[, width])`: a unicode bar of `width` cells
    * where the last cell renders in EIGHTHS (▏▎▍▌▋▊▉█) — CH's
    * console-sparkline vocabulary. eighths = floor(clamped·width·8);
    * both engines compute the same double, so the same glyph count
    * renders (no rounding divergence).
    */
  def bar(x: Column, minV: Column, maxV: Column, width: Int = 80): Column = {
    val span = maxV.cast("double") - minV.cast("double")
    val frac0 = when(span > 0.0,
      (x.cast("double") - minV.cast("double")) / span).otherwise(lit(0.0))
    val frac = least(greatest(frac0, lit(0.0)), lit(1.0))
    val e = floor(frac * lit(width * 8.0)).cast("int")
    val full = (e / 8).cast("int")
    val rem = e % 8
    val partials = typedLit(Seq("", "▏", "▎", "▍",
      "▌", "▋", "▊", "▉"))
    concat(call_function("repeat", lit("█"), full),
      element_at(partials, rem + 1))
  }

  /** Two-decimal rendering of `v` (a double) without printf — Java's
    * `%.2f` rounds HALF_UP while C's printf rounds half-even, so a
    * format string could diverge between the engines at exact
    * half-boundaries; `floor(v·100 + 0.5)` is the same IEEE arithmetic
    * in both. Shared by the formatReadable family.
    */
  private def twoDec(v: Column): Column = {
    val d = floor(v * 100.0 + 0.5).cast("long")
    // Column `/` is double division — truncate back to long for the
    // integer part before rendering
    concat((d / 100).cast("long").cast("string"), lit("."),
      lpad((d % 100).cast("string"), 2, "0"))
  }

  /** CH `formatReadableSize(bytes)`: '1.50 KiB' / '2.00 MiB' …, the
    * admin-report rendering. The unit ladder picks by exact integer
    * comparison (never `log`, whose rounding could flip a boundary);
    * the 2-decimal rendering is [[twoDec]]'s replayable arithmetic.
    */
  def formatReadableSize(bytes: Column): Column = {
    val b = bytes.cast("double")
    val KiB = 1024.0
    when(bytes.cast("long") < 1024L, concat(twoDec(b), lit(" B")))
      .when(bytes.cast("long") < 1048576L,
        concat(twoDec(b / KiB), lit(" KiB")))
      .when(bytes.cast("long") < 1073741824L,
        concat(twoDec(b / (KiB * KiB)), lit(" MiB")))
      .when(bytes.cast("long") < 1099511627776L,
        concat(twoDec(b / (KiB * KiB * KiB)), lit(" GiB")))
      .otherwise(concat(twoDec(b / (KiB * KiB * KiB * KiB)), lit(" TiB")))
  }

  /** CH vector-distance family over array columns (`dotProduct`,
    * `L1Distance`, `L2Distance`, `L2SquaredDistance`, `LinfDistance`,
    * `cosineDistance`) — one zip_with + fold per pair, the element
    * order fixed by the arrays, so integer-valued inputs give exact
    * sums and the single final sqrt/divide replays in the oracle
    * (the NativeStats determinism pattern). NULL through on a NULL
    * side; length mismatch folds over the shorter zip (caller
    * contract: equal dims).
    */
  private def pairFold(a: Column, b: Column,
      f: (Column, Column) => Column): Column =
    aggregate(zip_with(a, b, (x, y) => f(x.cast("double"), y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)

  def dotProduct(a: Column, b: Column): Column =
    pairFold(a, b, (x, y) => x * y)

  def l1Distance(a: Column, b: Column): Column =
    pairFold(a, b, (x, y) => abs(x - y))

  def l2SquaredDistance(a: Column, b: Column): Column =
    pairFold(a, b, (x, y) => (x - y) * (x - y))

  def l2Distance(a: Column, b: Column): Column =
    sqrt(l2SquaredDistance(a, b))

  def linfDistance(a: Column, b: Column): Column =
    aggregate(zip_with(a, b,
        (x, y) => abs(x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => greatest(acc, v))

  /** CH `cosineDistance(a, b)` = 1 − cos-similarity; the similarity is
    * `dot / (sqrt(nx)·sqrt(ny))` in exactly that op order (mirrored by
    * the oracle). NULL for a zero-norm side.
    */
  def cosineDistance(a: Column, b: Column): Column = {
    val nx = pairFold(a, a, (x, y) => x * y)
    val ny = pairFold(b, b, (x, y) => x * y)
    when(nx > 0.0 && ny > 0.0,
      lit(1.0) - dotProduct(a, b) / (sqrt(nx) * sqrt(ny)))
  }

  /** CH `pointInEllipses(px, py, x0, y0, a0, b0, x1, y1, a1, b1, …)`:
    * 1 when the point lies inside AT LEAST one axis-aligned ellipse —
    * `((px−x)/a)² + ((py−y)/b)² ≤ 1` per ellipse, pure IEEE
    * arithmetic the oracle replays per (point, ellipse) pair.
    */
  def pointInEllipses(px: Column, py: Column,
      ellipses: Seq[(Column, Column, Column, Column)]): Column = {
    val p = px.cast("double")
    val q = py.cast("double")
    val hit = ellipses.map { case (x, y, a, b) =>
      val dx = (p - x.cast("double")) / a.cast("double")
      val dy = (q - y.cast("double")) / b.cast("double")
      dx * dx + dy * dy <= 1.0
    }.reduce(_ || _)
    when(hit, lit(1L)).otherwise(lit(0L))
  }

  /** The geohash base32 alphabet (no a, i, l, o). */
  private val GeohashBase32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** CH `geohashEncode(lon, lat[, precision])`: standard geohash —
    * `5·p` bits interleaved lon-first, rendered in the geohash base32
    * alphabet. The bit strings are NOT computed by iterative bisection
    * but as `floor((lon+180)/360 · 2^nlon)` (the same binary
    * expansion, one expression): pure IEEE arithmetic both engines
    * replay identically, clamped so the +180/+90 edges land in the
    * last cell. Precision is a literal (it shapes the expression).
    */
  def geohashEncode(lon: Column, lat: Column, p: Int = 12): Column = {
    require(p >= 1 && p <= 12, s"geohash precision in [1,12], got $p")
    val totalBits = 5 * p
    val nlon = (totalBits + 1) / 2
    val nlat = totalBits / 2
    def cellIndex(v: Column, lo: Double, span: Double, n: Int): Column =
      least(greatest(floor((v.cast("double") - lo) / span *
          lit(math.pow(2.0, n))).cast("long"), lit(0L)),
        lit((1L << n) - 1))
    val lonI = cellIndex(lon, -180.0, 360.0, nlon)
    val latI = cellIndex(lat, -90.0, 180.0, nlat)
    def bitAt(k: Int): Column =
      if (k % 2 == 0) shiftright(lonI, nlon - 1 - k / 2) % 2
      else shiftright(latI, nlat - 1 - (k - 1) / 2) % 2
    val chars = (0 until p).map { j =>
      val v = (0 until 5).map(i => bitAt(5 * j + i) * (1 << (4 - i)))
        .reduce(_ + _)
      lit(GeohashBase32).substr((v + 1).cast("int"), lit(1))
    }
    concat(chars: _*)
  }

  /** CH `geohashDecode(s)` → named struct `(longitude, latitude)`:
    * the CELL CENTER (CH's contract). Bits fold back through an
    * alternating accumulator, so any precision decodes; the center
    * arithmetic `((i + 0.5)/2^n)·span + lo` is the exact inverse
    * expression shape the oracle replays.
    */
  def geohashDecode(gh: Column): Column = {
    val chars = filter(split(gh, ""), c => c =!= "")
    val vals = transform(chars, c =>
      call_function("locate", c, lit(GeohashBase32)).cast("long") - 1)
    val bits = flatten(transform(vals, v => array(
      shiftright(v, 4) % 2, shiftright(v, 3) % 2, shiftright(v, 2) % 2,
      shiftright(v, 1) % 2, v % 2)))
    val init = struct(lit(0L).as("lon"), lit(0L).as("lat"),
      lit(true).as("even"))
    val folded = aggregate(bits, init, (st, bit) => {
      val even = st.getField("even")
      struct(
        when(even, st.getField("lon") * 2 + bit)
          .otherwise(st.getField("lon")).as("lon"),
        when(even, st.getField("lat"))
          .otherwise(st.getField("lat") * 2 + bit).as("lat"),
        (!even).as("even"))
    })
    val total = size(bits)
    val nlon = ((total + 1) / 2).cast("int")
    val nlat = (total / 2).cast("int")
    def center(i: Column, n: Column, lo: Double, span: Double): Column =
      (i.cast("double") + 0.5) / pow(lit(2.0), n.cast("double")) *
        lit(span) + lit(lo)
    struct(
      center(folded.getField("lon"), nlon, -180.0, 360.0).as("longitude"),
      center(folded.getField("lat"), nlat, -90.0, 180.0).as("latitude"))
  }

  /** CH `formatReadableQuantity(x)`: '1.20 thousand' / '3.50 million'
    * …; plain two-decimal rendering below a thousand.
    */
  def formatReadableQuantity(x: Column): Column = {
    val v = x.cast("double")
    when(x.cast("long") < 1000L, twoDec(v))
      .when(x.cast("long") < 1000000L,
        concat(twoDec(v / 1e3), lit(" thousand")))
      .when(x.cast("long") < 1000000000L,
        concat(twoDec(v / 1e6), lit(" million")))
      .when(x.cast("long") < 1000000000000L,
        concat(twoDec(v / 1e9), lit(" billion")))
      .otherwise(concat(twoDec(v / 1e12), lit(" trillion")))
  }

  // -------------------------------------------------------------------
  // Round-11 dialect fill #4 (X182)

  /** CH `groupArrayIntersect(arr)`: the intersection of all the
    * group's arrays, SORTED (CH's output order is unspecified — the
    * sort makes this engine's replayable; same policy as
    * groupBitmapState). NULL arrays are skipped (aggregate NULL-skip
    * convention); an all-NULL/empty group yields NULL. Group-bounded
    * state (the collect_list fold), the windowFunnel caveat. The seed
    * is intersected with itself so a SINGLE-array group deduplicates
    * exactly like a multi-array group (set semantics; round-12
    * ADVICE — the raw seed kept duplicates).
    */
  def groupArrayIntersect(arr: Column): Column = {
    val cl = collect_list(arr)
    val seed = array_intersect(try_element_at(cl, lit(1)),
      try_element_at(cl, lit(1)))
    when(size(cl) > 0,
      array_sort(aggregate(slice(cl, lit(2), size(cl)),
        seed, (acc, x) => array_intersect(acc, x))))
  }

  /** CH `sumWithOverflow(x)`: integer sum with two's-complement WRAP
    * at Int64 width instead of ANSI overflow failure. Implemented as
    * an exact Decimal(38) sum reduced mod 2⁶⁴ into the signed range —
    * map-side combinable like any sum, exact while the group's true
    * sum stays under 10³⁸ (2⁵⁷ rows of extreme longs).
    */
  def sumWithOverflow(x: Column): Column = {
    val m = lit(new java.math.BigDecimal("18446744073709551616")) // 2^64
    val half = lit(new java.math.BigDecimal("9223372036854775808")) // 2^63
    val s = sum(x.cast(org.apache.spark.sql.types.DecimalType(38, 0)))
    val w = ((s % m) + m) % m
    when(w >= half, (w - m).cast("long")).otherwise(w.cast("long"))
  }

  /** CH `tokens(s)`: split into maximal runs of alphanumeric ASCII —
    * every other byte is a separator (CH's default tokenizer
    * contract). Empty tokens never appear; NULL in → NULL out.
    */
  def tokens(s: Column): Column =
    filter(split(s, "[^A-Za-z0-9]+"), t => t =!= "")

  /** CH `toUnixTimestamp64Milli/Micro/Nano(ts)`: the timestamp as an
    * Int64 at the given precision. Spark timestamps carry µs — the
    * nano form is µs·1000 (sub-µs digits are zero, documented).
    */
  def toUnixTimestamp64Milli(ts: Column): Column = {
    // Column `/` is DOUBLE division — make the numerator exactly
    // divisible first so the quotient is an exact integer double
    // (floor-division semantics for the negative pre-epoch edge too)
    val us = unix_micros(ts.cast("timestamp"))
    ((us - pmod(us, lit(1000L))) / lit(1000L)).cast("long")
  }
  def toUnixTimestamp64Micro(ts: Column): Column =
    unix_micros(ts.cast("timestamp"))
  def toUnixTimestamp64Nano(ts: Column): Column =
    unix_micros(ts.cast("timestamp")) * lit(1000L)

  /** CH `fromUnixTimestamp64Milli/Micro/Nano(n)`: Int64 → timestamp
    * (nanos truncate to the µs Spark carries, matching the engine's
    * integer-DIV nanos policy).
    */
  def fromUnixTimestamp64Milli(n: Column): Column =
    timestamp_micros(n.cast("long") * lit(1000L))
  def fromUnixTimestamp64Micro(n: Column): Column =
    timestamp_micros(n.cast("long"))
  def fromUnixTimestamp64Nano(n: Column): Column = {
    val v = n.cast("long")
    timestamp_micros(((v - pmod(v, lit(1000L))) / lit(1000L)).cast("long"))
  }

  /** CH `toDaysSinceYearZero(d)`: days since 0000-01-01 proleptic
    * Gregorian — epoch days + 719528 (CH pins
    * toDaysSinceYearZero('1970-01-01') = 719528), avoiding a year-0
    * literal that not every SQL dialect parses.
    */
  def toDaysSinceYearZero(d: Column): Column =
    datediff(d.cast("date"), to_date(lit("1970-01-01"))) + lit(719528)

  /** CH `toModifiedJulianDay(s)` / `fromModifiedJulianDay(n)`: days
    * since 1858-11-17 and back.
    */
  def toModifiedJulianDay(d: Column): Column =
    datediff(d.cast("date"), to_date(lit("1858-11-17")))
  def fromModifiedJulianDay(n: Column): Column =
    date_add(to_date(lit("1858-11-17")), n.cast("int"))

  /** CH `timeSlots(start, duration[, size])`: the array of `size`-
    * second slot starts covering `[start, start + duration]` — slot i
    * is `⌊unix(start)/size⌋·size + i·size`, for every slot whose start
    * is ≤ start + duration (CH's inclusive-end contract). Default
    * size 1800 (half-hour), like CH.
    */
  def timeSlots(start: Column, duration: Column,
      size: Column = lit(1800L)): Column = {
    val sz = size.cast("long")
    val s0 = floor(unix_seconds(start.cast("timestamp")) / sz) * sz
    val hi = unix_seconds(start.cast("timestamp")) + duration.cast("long")
    val slots = floor((hi - s0) / sz).cast("int")
    transform(sequence(lit(0), slots),
      i => timestamp_seconds(s0 + i.cast("long") * sz))
  }

  // -------------------------------------------------------------------
  // Time-series analysis (CH 23.10+ `series*` family). All three are
  // per-row ARRAY kernels — series live one-per-group (groupArray'd or
  // constructed), never exploded, so the functions are plain
  // projections at any corpus scale.

  /** Type-7 (linear-interpolated) quantile over an already-sorted
    * array — the convention Spark's `percentile` and DuckDB's
    * `quantile_cont` share, so oracles replay the exact arithmetic:
    * `h = (n-1)q`, value = `s[⌊h⌋] + (h-⌊h⌋)(s[⌊h⌋+1] - s[⌊h⌋])`
    * (0-based). The `least` guard keeps the upper index in range at
    * q = 1 (where the fraction is exactly 0).
    */
  private def sortedQuantile(sorted: Column, n: Column,
      q: Double): Column = {
    val h = (n - 1).cast("double") * lit(q)
    val lo = floor(h).cast("int")
    val frac = h - lo.cast("double")
    element_at(sorted, lo + 1) +
      frac * (element_at(sorted, least(lo + 2, n)) -
        element_at(sorted, lo + 1))
  }

  /** CH `seriesOutliersDetectTukey(series[, min_q, max_q, k])`: per
    * element, the signed distance past the Tukey fences
    * `[Q(minQ) − k·IQR, Q(maxQ) + k·IQR]` (0.0 inside the fences —
    * non-outliers score zero, outliers score how FAR out they sit,
    * negative below / positive above). Quantiles are type-7
    * interpolated (the engine-wide convention; see
    * [[sortedQuantile]] — a documented refinement of CH's internal
    * estimator, chosen so the oracle replays every cell exactly).
    * Series shorter than 4 → NULL (CH's minimum). Defined for
    * NULL-free series (groupArray output never holds NULLs).
    */
  def seriesOutliersDetectTukey(arr: Column, minQ: Double = 0.25,
      maxQ: Double = 0.75, k: Double = 1.5): Column = {
    require(minQ >= 0 && maxQ <= 1 && minQ < maxQ,
      s"seriesOutliersDetectTukey: need 0 <= minQ < maxQ <= 1, " +
        s"got ($minQ, $maxQ)")
    val xs = transform(arr, x => x.cast("double"))
    val n = size(xs)
    val sorted = array_sort(xs)
    val q1 = sortedQuantile(sorted, n, minQ)
    val q3 = sortedQuantile(sorted, n, maxQ)
    val iqr = q3 - q1
    val loF = q1 - lit(k) * iqr
    val hiF = q3 + lit(k) * iqr
    when(n >= 4, transform(xs, x =>
      when(x < loF, x - loF)
        .when(x > hiF, x - hiF)
        .otherwise(lit(0.0))))
  }

  /** CH `seriesPeriodDetectFFT(series)`: the dominant period, found as
    * `n / k*` where `k*` is the argmax of the mean-centered DFT
    * periodogram `P(k) = (Σᵢ yᵢ cos(2πki/n))² + (Σᵢ yᵢ sin(2πki/n))²`
    * over k = 1 … ⌊n/2⌋ (a documented refinement of CH's
    * Welch-windowed estimator: same answer on any clearly periodic
    * series, exactly specified arithmetic). Ties break to the SMALLEST
    * k (longest period — `array_position` finds the first max). n < 4
    * → NULL; a (near-)constant series (max power ≤ 1e-9) → 0.0, the
    * "not periodic" sentinel. O(n²) per row — series are per-group
    * aggregates (thousands of points), never the raw event stream.
    *
    * Round 12 (verdict ask #6): evaluates through the native
    * [[graft.plans.SeriesKernels.periodFFT]] kernel (one codegen'd
    * loop; the combinator form below ran ~4·n² interpreted closure
    * calls per row). [[seriesPeriodDetectFFTSpec]] keeps the
    * combinator as the bit-identical reference — Round12Props pins
    * the equivalence on random series.
    */
  def seriesPeriodDetectFFT(arr: Column): Column =
    graft.plans.NativeSeries.periodFFT(arr)

  /** The combinator reference for [[seriesPeriodDetectFFT]] — kept
    * verbatim as the equality-spec oracle (the X173 pattern).
    */
  private[graft] def seriesPeriodDetectFFTSpec(arr: Column): Column = {
    val xs = transform(arr, x => x.cast("double"))
    val n = size(xs)
    val mean = aggregate(xs, lit(0.0), (a, x) => a + x) /
      n.cast("double")
    val idx = sequence(lit(0), n - 1)
    val ks = sequence(lit(1), floor(n / 2).cast("int"))
    val power = transform(ks, kk => {
      val ang = lit(2.0 * math.Pi) * kk.cast("double") / n.cast("double")
      val re = aggregate(idx, lit(0.0), (a, i) =>
        a + (element_at(xs, i + 1) - mean) * cos(ang * i.cast("double")))
      val im = aggregate(idx, lit(0.0), (a, i) =>
        a + (element_at(xs, i + 1) - mean) * sin(ang * i.cast("double")))
      re * re + im * im
    })
    val kStar = array_position(power, array_max(power)).cast("double")
    when(n >= 4,
      when(array_max(power) > lit(1e-9), n.cast("double") / kStar)
        .otherwise(lit(0.0)))
  }

  /** CH `seriesDecomposeSTL(series, period)`: additive decomposition
    * into `[seasonal, trend, residual, baseline]` (CH's four-array
    * return shape; baseline = seasonal + trend). A documented
    * refinement of CH's STL/loess internals with exactly specified
    * arithmetic: trend is the boundary-clipped symmetric moving
    * average of half-width ⌊p/2⌋; the seasonal component is the
    * per-phase mean of the detrended series, centered by subtracting
    * the mean of the p phase means; residual is
    * `(x − trend) − seasonal` in that association order. Requires
    * p ≥ 2 and n ≥ 2p, else NULL.
    *
    * Round 12 (verdict ask #6): evaluates through the native
    * [[graft.plans.SeriesKernels.stl]] kernel (tight loops in
    * whole-stage codegen; the combinator below chained ~6 interpreted
    * lambda stages per row). [[seriesDecomposeSTLSpec]] keeps the
    * combinator as the bit-identical reference — Round12Props pins
    * the equivalence on random series.
    */
  def seriesDecomposeSTL(arr: Column, period: Column): Column =
    graft.plans.NativeSeries.stl(arr, period)

  /** The combinator reference for [[seriesDecomposeSTL]] — kept
    * verbatim as the equality-spec oracle (the X173 pattern).
    */
  private[graft] def seriesDecomposeSTLSpec(arr: Column,
      period: Column): Column = {
    val xs = transform(arr, x => x.cast("double"))
    val n = size(xs)
    val p = period.cast("int")
    val h = floor(p / 2).cast("int")
    val idx0 = sequence(lit(0), n - 1)
    val trend = transform(idx0, i => {
      val loI = greatest(i - h, lit(0))
      val hiI = least(i + h, n - 1)
      val win = slice(xs, loI + 1, hiI - loI + 1)
      aggregate(win, lit(0.0), (a, x) => a + x) / size(win).cast("double")
    })
    val det = zip_with(xs, trend, (x, t) => x - t)
    val phases = sequence(lit(0), p - 1)
    val sRaw = transform(phases, s => {
      val masked = zip_with(det, idx0,
        (d, i) => when(pmod(i, p) === s, d))
      val vals = filter(masked, v => v.isNotNull)
      aggregate(vals, lit(0.0), (a, x) => a + x) / size(vals).cast("double")
    })
    val sMean = aggregate(sRaw, lit(0.0), (a, x) => a + x) /
      p.cast("double")
    val seasonal = transform(idx0,
      i => element_at(sRaw, pmod(i, p) + 1) - sMean)
    val resid = zip_with(det, seasonal, (d, s) => d - s)
    val baseline = zip_with(seasonal, trend, (s, t) => s + t)
    when(p >= 2 && n >= p * 2,
      array(seasonal, trend, resid, baseline))
  }
}
