package graft

import org.scalacheck.{Prop, Properties, Test}

/** Round-10 property pins (verdict ask #7): the theta-sketch set
  * algebra (`plans/NativeSketch.scala`, ChDialect `uniqThetaUnion/
  * Intersect/Not`) must stay inside the KMV error envelope against
  * exact cardinalities ACROSS the parameter grid, not just q243's
  * single (k=256, one dataset) point:
  *
  *  - k ∈ {16, 256, 4096} (tiny / default / large buffers);
  *  - overlap fraction f ∈ {0, 0.05, 0.5, 1} (disjoint, ε, half,
  *    identical) — the adversarial shapes for intersect/not;
  *  - per-side cardinality n ∈ {k/2, k, 4k}: the PARTIAL regime
  *    (θ = 2^48, estimates must be EXACT), the partial↔saturated
  *    BOUNDARY (n = k: each side's buffer holds its whole set, the
  *    k-th minimum first becomes a real θ), and the SATURATED regime.
  *
  * Envelope: in the partial regime (both sides under k) every
  * estimate equals the exact value — the NativeSketch.scala:90-95
  * contract. Once any side saturates, KMV's relative standard error
  * is ~1/√(k−2) on the UNION'S scale (intersection/difference are
  * estimated from the retained-sample counts over the same θ-window,
  * so their absolute error also scales with the union): assert
  * |est − exact| ≤ 6·union/√(k−2) + 2. Deterministic MD5-48 hashes
  * make every grid point a fixed number — the bound is checked, not
  * sampled, so a pass is reproducible by construction.
  */
object Round10Props extends Properties("round10") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(1)

  private case class ThetaCase(k: Int, f: Double, regime: String, n: Int)

  private val grid: Seq[ThetaCase] = for {
    k <- Seq(16, 256, 4096)
    f <- Seq(0.0, 0.05, 0.5, 1.0)
    (regime, n) <- Seq(("partial", k / 2), ("boundary", k),
      ("saturated", 4 * k))
  } yield ThetaCase(k, f, regime, n)

  property("uniqTheta union/intersect/not stay in the KMV envelope " +
      "across k x overlap x regime (exact in the partial regime)") =
    Prop {
      val spark = SparkSpec.spark
      import spark.implicits._
      val failures = grid.flatMap { c =>
        val m = math.round(c.f * c.n).toInt // |A ∩ B|
        val tag = s"k${c.k}f${c.f}${c.regime}"
        val a = (0 until c.n).map(i => s"${tag}_a$i")
        val b = a.take(m) ++ (0 until (c.n - m)).map(i => s"${tag}_b$i")
        a.toDF("v").createOrReplaceTempView("r10_theta_a")
        b.toDF("v").createOrReplaceTempView("r10_theta_b")
        val r = spark.sql(s"""
          WITH a AS (SELECT uniqThetaState(${c.k})(v) AS sa
                     FROM r10_theta_a),
               b AS (SELECT uniqThetaState(${c.k})(v) AS sb
                     FROM r10_theta_b)
          SELECT uniqThetaUnion(sa, sb, ${c.k}) AS u,
                 uniqThetaIntersect(sa, sb, ${c.k}) AS i,
                 uniqThetaNot(sa, sb, ${c.k}) AS d
          FROM a CROSS JOIN b""").collect().head
        val (u, i, d) = (r.getLong(0), r.getLong(1), r.getLong(2))
        val exactU = 2L * c.n - m
        val exactI = m.toLong
        val exactD = (c.n - m).toLong
        val checks =
          if (c.regime == "partial") Seq(
            ("union", u, exactU, 0.0), ("intersect", i, exactI, 0.0),
            ("not", d, exactD, 0.0))
          else {
            val env = 6.0 * exactU / math.sqrt(c.k - 2.0) + 2.0
            Seq(("union", u, exactU, env), ("intersect", i, exactI, env),
              ("not", d, exactD, env))
          }
        checks.collect {
          case (op, est, exact, tol) if math.abs(est - exact) > tol =>
            s"$tag $op: est=$est exact=$exact tol=$tol"
        }
      }
      if (failures.nonEmpty)
        println("theta envelope failures:\n  " + failures.mkString("\n  "))
      failures.isEmpty
    }
}
