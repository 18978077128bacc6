package graft.quality

import java.sql.Timestamp
import graft.SparkSpec

/** Mutant fixtures per FIXTURES.md §A2 — each mutant must flip exactly its
  * targeted check.
  */
class QualityChecksSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Clean 4-month single series. */
  private def clean = Seq(
    (ts("2024-01-01 00:00:00"), "LU", "CP00", "I15", Some(105.1)),
    (ts("2024-02-01 00:00:00"), "LU", "CP00", "I15", Some(105.6)),
    (ts("2024-03-01 00:00:00"), "LU", "CP00", "I15", Some(106.0)),
    (ts("2024-04-01 00:00:00"), "LU", "CP00", "I15", Some(106.2)))

  private def run(rows: Seq[(Timestamp, String, String, String, Option[Double])]) =
    QualityChecks.runChecks(
      rows.toDF("time", "geo", "coicop", "unit", "value"),
      requiredCols = Seq("time", "geo", "coicop", "unit", "value"),
      keyCols = Seq("time", "geo", "coicop", "unit"),
      timeCol = "time", valueCol = "value",
      groupCols = Seq("geo", "coicop", "unit"))

  private def failing(r: QualityChecks.Report): Set[String] =
    r.checks.filterNot(_.passed).map(_.name).toSet

  test("clean series passes all checks") {
    val r = run(clean)
    assert(r.passed, failing(r).toString)
    assert(r.summary("rows") == "4")
    assert(r.summary("min_time").startsWith("2024-01-01"))
  }

  test("missing required column fails Q1 and short-circuits") {
    val df = clean.toDF("time", "geo", "coicop", "unit", "value").drop("value")
    val r = QualityChecks.runChecks(df, Seq("time", "value"), Seq("time"), "time", "time", Seq("geo"))
    assert(!r.passed && failing(r) == Set("required_columns"))
  }

  test("null in required column fails Q2 only") {
    val r = run(clean :+ ((ts("2024-05-01 00:00:00"), null: String, "CP00", "I15", Some(1.0))))
    assert(failing(r) == Set("no_nulls"))
  }

  test("duplicate key fails Q3 only") {
    val r = run(clean :+ clean.head.copy(_5 = Some(999.0)))
    assert(failing(r) == Set("no_duplicate_keys"))
  }

  test("non-positive value fails Q4; null value does NOT") {
    assert(failing(run(clean :+ ((ts("2024-05-01 00:00:00"), "LU", "CP00", "I15", Some(-1.0)))))
      == Set("values_positive"))
    // sparse-miss null observation: value-sanity must NOT fail (nulls are
    // excluded from the <= 0 comparison, matching the reference's used behavior)
    val r = run(clean :+ ((ts("2024-05-01 00:00:00"), "LU", "CP00", "I15", None)))
    assert(!failing(r).contains("values_positive"))
  }

  test("null time fails Q5 (and not continuity: nulls excluded from grid)") {
    val r = run(clean :+ ((null: Timestamp, "LU", "CP00", "I15", Some(1.0))))
    assert(failing(r).contains("times_parseable"))
  }

  test("gap in the middle fails Q6 only; 2-point series passes (<3 branch)") {
    val gapped = clean.patch(2, Nil, 1) // drop March -> Jan,Feb,Apr
    assert(failing(run(gapped)) == Set("monthly_continuity"))
    assert(run(clean.take(2)).passed)
  }

  test("multi-series: only the gapped group fails, detail counts groups") {
    val de = Seq(
      (ts("2024-01-01 00:00:00"), "DE", "CP00", "I15", Some(1.0)),
      (ts("2024-02-01 00:00:00"), "DE", "CP00", "I15", Some(2.0)),
      (ts("2024-05-01 00:00:00"), "DE", "CP00", "I15", Some(3.0))) // gap
    val r = run(clean ++ de)
    assert(failing(r) == Set("monthly_continuity"))
    val detail = r.checks.find(_.name == "monthly_continuity").get.detail
    assert(detail("groups") == "2" && detail("failing_groups") == "1")
  }

  test("column profiler: one row per column with exact distincts, nulls, min/max") {
    val df = Seq((1L, Some(2.5), "b"), (2L, None, "a"), (3L, Some(2.5), "c"))
      .toDF("id", "v", "s")
    val rows = QualityChecks.profileColumns(df, Seq("id", "v", "s")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
      .toMap
    assert(rows("id") == (3L, 0L, "1", "3"))
    assert(rows("v") == (1L, 1L, "2.5", "2.5"))
    assert(rows("s") == (3L, 0L, "a", "c"))
  }

  test("PSI drift: identical snapshots score ~0, a shifted snapshot scores high") {
    val before = (1 to 100).map(i => (i % 10) * 10.0 + 5.0).toDF("v")
    // identical distribution -> every psi_term is 0 (p == q exactly)
    val same = QualityChecks.psiDrift(before, before, "v", binWidth = 10.0)
      .collect()
    assert(same.map(_.getDouble(5)).sum == 0.0)
    assert(same.length == 10)
    // shift the whole population two bins up -> strong drift, and bins
    // present on only one side still appear (epsilon floor, no div-by-zero)
    val after = (1 to 100).map(i => (i % 10) * 10.0 + 25.0).toDF("v")
    val drift = QualityChecks.psiDrift(before, after, "v", binWidth = 10.0)
      .collect()
    val psi = drift.map(_.getDouble(5)).sum
    assert(psi > 0.25, s"two-bin shift must exceed the major-drift gate, got $psi")
    assert(drift.exists(r => r.getLong(1) > 0 && r.getLong(2) == 0))
    assert(drift.exists(r => r.getLong(1) == 0 && r.getLong(2) > 0))
  }

  test("mutual information cells: dependent columns sum to ln2, independent to 0") {
    import spark.implicits._
    // x == y on a 50/50 split: MI = H = ln 2; each cell carries .5*ln2
    val dep = Seq(("a", "a"), ("a", "a"), ("b", "b"), ("b", "b")).toDF("x", "y")
    val depRows = QualityChecks.mutualInfoCells(dep, "x", "y").collect()
    assert(depRows.length == 2)
    depRows.foreach(r => assert(r.getDouble(4) == 0.3466, s"cell term ${r.getDouble(4)}"))
    // uniform independent cross: every pointwise term is exactly 0
    val ind = (for (x <- Seq("a", "b"); y <- Seq("c", "d")) yield (x, y)).toDF("x", "y")
    val indRows = QualityChecks.mutualInfoCells(ind, "x", "y").collect()
    assert(indRows.length == 4)
    indRows.foreach(r => assert(r.getDouble(4) == 0.0))
  }

  test("Benford screen: digits from exact cents; non-positives excluded; expectation exact") {
    import spark.implicits._
    // 1.00 -> 100 cents -> digit 1 (x3); 25.50 -> 2550 -> 2; 0.50 -> 50
    // -> 5 (sub-unit values take their cents' leading digit); 999.99 ->
    // 99999 -> 9; zero and negatives are screened out
    val df = Seq(1.0, 1.0, 1.0, 25.5, 0.5, 999.99, 0.0, -7.0).toDF("v")
    val rows = QualityChecks.benfordFirstDigit(df, "v").collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(rows.keySet == Set(1, 2, 5, 9))
    assert(rows(1).getLong(1) == 3L)
    assert(rows(1).getDouble(2) == 0.5, "3 of 6 positive values lead with 1")
    assert(rows(1).getDouble(3) == 0.301, "Benford p(1) = log10(2) to 4dp")
    assert(rows(9).getDouble(3) == 0.0458)
  }

  test("k-anonymity: achieved k is the smallest QID class; at-risk tallies match") {
    import spark.implicits._
    // QID classes: (1,a) x1, (1,b) x2, (2,a) x3 — k=1; below k=3: two
    // classes holding 1+2=3 rows
    val df = Seq((1, "a"), (1, "b"), (1, "b"), (2, "a"), (2, "a"), (2, "a"))
      .toDF("nat", "seg")
    val r = QualityChecks.kAnonymity(df, Seq("nat", "seg"), 3).collect()(0)
    assert(r.getLong(0) == 1L, "k_anonymity")
    assert(r.getLong(1) == 3L, "n_classes")
    assert(r.getLong(2) == 2L, "classes_below_k")
    assert(r.getLong(3) == 3L, "rows_at_risk")
  }

  test("referential integrity: orphans, null FKs, and childless parents tally exactly") {
    import spark.implicits._
    // parents 1,2,3; children reference 1,1,9 (orphan), null (not an
    // orphan); parent 3 is never referenced
    val parent = Seq((1, "p1"), (2, "p2"), (3, "p3")).toDF("pk", "pname")
    val child = Seq((10, Some(1)), (11, Some(1)), (12, Some(9)),
      (13, Option.empty[Int]), (14, Some(2))).toDF("cid", "fk")
    val r = QualityChecks.referentialIntegrity(
      Seq(("child.fk->parent", child, "fk", parent, "pk"))).collect()(0)
    assert(r.getString(0) == "child.fk->parent")
    assert(r.getLong(1) == 1L, s"orphans: $r")      // the fk=9 row
    assert(r.getLong(2) == 1L, s"null fks: $r")     // the null row
    assert(r.getLong(3) == 1L, s"childless: $r")    // parent 3
  }

  test("temporal sanity: a lineitem shipped before its order is counted with its lag") {
    import spark.implicits._
    val o = Seq((1L, java.sql.Date.valueOf("1995-01-10"), "1-URGENT"),
      (2L, java.sql.Date.valueOf("1995-02-01"), "2-HIGH"))
      .toDF("o_orderkey", "o_orderdate", "o_orderpriority")
    val l = Seq((1L, java.sql.Date.valueOf("1995-01-15")), // +5 days
      (1L, java.sql.Date.valueOf("1995-01-05")),           // -5: violation
      (2L, java.sql.Date.valueOf("1995-02-21")))           // +20
      .toDF("l_orderkey", "l_shipdate")
    val got = QualityChecks.temporalSanity(l, o).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getInt(3), r.getInt(4), r.getDouble(5))).toMap
    assert(got("1-URGENT") == ((2L, 1L, -5, 5, 0.0)), s"got $got")
    assert(got("2-HIGH") == ((1L, 0L, 20, 20, 20.0)), s"got $got")
  }

  test("IQR outlier census: hand-computed fences and beyond-fence counts on a planted fixture") {
    import spark.implicits._
    // 1..11 (Q1=3.5, Q3=8.5, IQR=5 → fences [-4, 16]) plus planted
    // outliers -10 and 100; with the outliers the quartiles move to
    // exact interpolated positions — recompute them the textbook way
    val xs = ((1 to 11).map(_.toDouble) ++ Seq(-10.0, 100.0)).sorted
    val df = xs.map(x => (x, 0.0)).toDF("a", "b")
    def quant(p: Double): Double = {
      val h = p * (xs.length - 1)
      val l = h.toInt
      xs(l) + (h - l) * (xs(math.min(l + 1, xs.length - 1)) - xs(l))
    }
    val (q1, q3) = (quant(0.25), quant(0.75))
    val (lo, hi) = (q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1))
    val got = QualityChecks.iqrOutliers(df, Seq("a")).collect()(0)
    def q4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    assert(got.getString(0) == "a")
    assert(got.getDouble(1) == q4(q1) && got.getDouble(2) == q4(q3),
      s"quartiles: $got vs ($q1, $q3)")
    assert(got.getDouble(3) == q4(lo) && got.getDouble(4) == q4(hi))
    assert(got.getLong(5) == 13L)
    assert(got.getLong(6) == xs.count(_ < lo).toLong, s"below: $got")
    assert(got.getLong(7) == xs.count(_ > hi).toLong, s"above: $got")
  }

  test("iqr quartile memo: warm paths equal cold paths in BOTH query orders " +
    "(r17b per-column exact-quartile sharing)") {
    import spark.implicits._
    val df = ((1 to 50).map(_.toDouble) ++ Seq(-100.0, 500.0))
      .map(x => (x, x * 2 + 1))
      .toDF("a", "b")
    def norm(rs: Array[org.apache.spark.sql.Row]): Seq[Seq[Any]] =
      rs.map(r => (0 until r.length)
        .map(i => if (r.isNullAt(i)) null else r.get(i))).toSeq
    // cold references (no memo key)
    val iqrCold = norm(QualityChecks.iqrOutliers(df, Seq("a", "b")).collect())
    val audCold = norm(QualityChecks.iqrApproxAudit(df, Seq("b")).collect())
    // order 1: exact query first (memoizes a, b), audit rides warm b
    graft.ops.Exec.releaseAll(spark)
    val k1 = Some("spec-iqr-memo-1")
    val iqr1 = norm(QualityChecks.iqrOutliers(df, Seq("a", "b"),
      memoKey = k1).collect())
    val aud1 = norm(QualityChecks.iqrApproxAudit(df, Seq("b"),
      memoKey = k1).collect())
    // order 2: audit first (fused seeds b), exact query builds only a
    graft.ops.Exec.releaseAll(spark)
    val k2 = Some("spec-iqr-memo-2")
    val aud2 = norm(QualityChecks.iqrApproxAudit(df, Seq("b"),
      memoKey = k2).collect())
    val iqr2 = norm(QualityChecks.iqrOutliers(df, Seq("a", "b"),
      memoKey = k2).collect())
    graft.ops.Exec.releaseAll(spark)
    assert(iqr1 == iqrCold && iqr2 == iqrCold,
      s"iqr: cold=$iqrCold o1=$iqr1 o2=$iqr2")
    assert(aud1 == audCold && aud2 == audCold,
      s"audit: cold=$audCold o1=$aud1 o2=$aud2")
  }

  test("chi2: proportional table scores exactly 0, zero cells are present and counted") {
    import spark.implicits._
    // proportional: p(x,y) = p(x)p(y) exactly → every contrib 0
    val indep = (Seq.fill(10)(("a", 0L)) ++ Seq.fill(10)(("a", 1L))
      ++ Seq.fill(20)(("b", 0L)) ++ Seq.fill(20)(("b", 1L))).toDF("x", "y")
    val r1 = QualityChecks.chi2Independence(indep, "x", "y").collect()
    assert(r1.length == 4)
    assert(r1.forall(_.getDouble(5) == 0.0), "chi2 must be exactly 0")
    assert(r1.forall(_.getLong(6) == 1L), "dof (2-1)(2-1) = 1")

    // perfect dependence WITH structural zero cells: x=a only ever y=0,
    // x=b only ever y=1 — chi2 = n = 40, and the two zero cells must
    // appear as rows contributing e each
    val dep = (Seq.fill(20)(("a", 0L)) ++ Seq.fill(20)(("b", 1L))).toDF("x", "y")
    val r2 = QualityChecks.chi2Independence(dep, "x", "y").collect()
    assert(r2.length == 4, s"expected 4 cells incl. zeros: ${r2.length}")
    val zeros = r2.filter(_.getLong(2) == 0L)
    assert(zeros.length == 2, "both zero cells present")
    // e = 20·20/40 = 10 for every cell; contrib = 10 for all four
    assert(r2.forall(_.getDouble(3) == 10.0))
    assert(r2.forall(_.getDouble(4) == 10.0))
    assert(r2.forall(_.getDouble(5) == 40.0), s"chi2: ${r2.head.getDouble(5)}")
  }

  test("ksTest: hand-computed D on a shifted sample, zero on identical samples") {
    // a = {1,2,3}, b = {2,3,4}: F_a−F_b is 1/3 at every interior point → D = 1/3
    val df = (Seq(1.0, 2.0, 3.0).map(("a", _)) ++ Seq(2.0, 3.0, 4.0).map(("b", _)))
      .toDF("event_type", "value")
    val r = QualityChecks.ksTest(df).collect()(0)
    def q6(x: Double) = math.floor(x * 1000000 + 0.5) / 1000000
    assert(r.getAs[Long]("n") == 3L && r.getAs[Long]("m") == 3L)
    assert(r.getAs[Double]("d_stat") == q6(1.0 / 3.0), s"D: $r")
    val d = q6(1.0 / 3.0)
    assert(r.getAs[Double]("ln_p_half") == q6(-2.0 * d * d * (9.0 / 6.0)))
    // identical samples (with ties) → D exactly 0
    val same = (Seq(1.0, 2.0, 2.0, 5.0).map(("a", _)) ++
      Seq(1.0, 2.0, 2.0, 5.0).map(("b", _))).toDF("event_type", "value")
    val r2 = QualityChecks.ksTest(same).collect()(0)
    assert(r2.getAs[Double]("d_stat") == 0.0 && r2.getAs[Double]("ln_p_half") == 0.0)
  }

  test("embedding sanity: NaN/Inf/zero-norm/wrong-dim vectors are each counted once") {
    import spark.implicits._
    def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    val clean = Array.fill(64)(0.5f)
    val rows = Seq(
      (0L, 1, clean),
      (1L, 1, { val v = clean.clone(); v(3) = Float.NaN; v }),
      (2L, 1, { val v = clean.clone(); v(9) = Float.PositiveInfinity; v }),
      (3L, 1, Array.fill(64)(0.0f)),
      (4L, 2, Array.fill(63)(0.5f)), // wrong dimension
      (5L, 2, clean),
      (6L, 3, { val v = clean.clone(); v(0) = Float.NaN; v })) // no finite vec
      .toDF("vec_id", "label", "embedding")
    val out = QualityChecks.embeddingSanity(rows).collect()
    val got = out
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), if (r.isNullAt(5)) Double.NaN else r.getDouble(5))).toMap
    // label 1: 4 vectors — one NaN, one Inf, one zero-norm; avg_norm over
    // the two FINITE vectors (norm 4.0 and norm 0.0) = 2.0 exactly
    assert(got(1)._1 == 4L && got(1)._3 == 2L && got(1)._4 == 1L, got(1))
    assert(got(1)._2 == 0L)
    assert(got(1)._5 == 2.0, got(1))
    // label 3: only nonfinite vectors -> avg_norm is NULL, not 0/0 garbage
    assert(got(3)._3 == 1L && got(3)._5.isNaN, got(3))
    // label 2: one wrong-dim + one clean; avg_norm of the pair is exact
    assert(got(2)._2 == 1L && got(2)._3 == 0L && got(2)._4 == 0L)
    val n64 = math.floor(math.sqrt(64 * 0.25) * 10000 + 0.5) / 10000
    val n63 = math.floor(math.sqrt(63 * 0.25) * 10000 + 0.5) / 10000
    assert(math.abs(got(2)._5 - (n64 + n63) / 2) < 1e-12, got(2))
  }
}
