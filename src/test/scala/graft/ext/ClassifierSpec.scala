package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  // linearly separable: y = 1 iff x > 0, bias included
  private def separable = (1 to 100).map { i =>
    val x = if (i % 2 == 0) 1.0 + (i % 7) * 0.1 else -1.0 - (i % 7) * 0.1
    (x, 1.0, if (x > 0) 1.0 else 0.0)
  }.toDF("x", "b", "y")

  test("GD separates a linearly separable set; more iterations improve " +
      "the fit monotonically toward it") {
    val d = separable
    val w = Classifier.logisticTrain(d, Seq("x", "b"), "y",
      iters = 50, lr = 1.0)
    val scored = Classifier.score(d, Seq("x", "b"), w)
    val acc = scored
      .where((col("score_pred") && col("y") === 1.0) ||
        (!col("score_pred") && col("y") === 0.0))
      .count()
    assert(acc == 100L, s"expected perfect separation, got $acc/100")
    assert(w(0) > 0, "positive-direction weight must be positive")
  }

  test("the training trajectory is deterministic across runs and " +
      "partitionings") {
    val d = separable
    val w1 = Classifier.logisticTrain(d, Seq("x", "b"), "y", 5, 0.5)
    val w2 = Classifier.logisticTrain(d.repartition(7), Seq("x", "b"),
      "y", 5, 0.5)
    assert(w1.toSeq == w2.toSeq,
      "decimal-routed gradients must not depend on partitioning")
  }

  test("score is monotone in a positively-weighted feature") {
    val w = Array(2.0, -0.5)
    val d = Seq((0.0, 1.0), (1.0, 1.0), (2.0, 1.0)).toDF("x", "b")
    val s = Classifier.score(d, Seq("x", "b"), w)
      .orderBy("x").select("score").as[Double].collect()
    assert(s.sliding(2).forall(p => p(0) < p(1)))
  }

  test("linearTrain converges toward a noiseless linear relation") {
    // y = 2x + 1 over x in [-1, 1]
    val d = (-10 to 10).map(i => (i / 10.0, 1.0, 2.0 * (i / 10.0) + 1.0))
      .toDF("x", "b", "y")
    val w = Classifier.linearTrain(d, Seq("x", "b"), "y",
      iters = 200, lr = 0.5)
    assert(math.abs(w(0) - 2.0) < 0.01 && math.abs(w(1) - 1.0) < 0.01,
      s"expected ~(2, 1), got (${w(0)}, ${w(1)})")
    val pred = Classifier.predict(d, Seq("x", "b"), w)
      .select(org.apache.spark.sql.functions
        .abs(col("yhat") - col("y")).as("e"))
      .agg(max(col("e"))).head().getDouble(0)
    assert(pred < 0.02)
  }

  test("linearTrain trajectory is partition-invariant (no libm step)") {
    val d = (1 to 60).map(i => (i * 0.01, 1.0, i * 0.03 + 0.5))
      .toDF("x", "b", "y")
    val w1 = Classifier.linearTrain(d, Seq("x", "b"), "y", 7, 0.3)
    val w2 = Classifier.linearTrain(d.repartition(9), Seq("x", "b"),
      "y", 7, 0.3)
    assert(w1.toSeq == w2.toSeq)
  }

  private def aucOf(rows: Seq[(Double, Double)]): Option[Double] = {
    val r = Classifier.auc(rows.toDF("sc", "y"), "sc", "y").head()
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  test("auc: perfect ranking 1.0, inverted 0.0, constant 0.5, " +
      "hand-computed tie case") {
    val pos = Seq(0.8, 0.9, 0.95).map((_, 1.0))
    val neg = Seq(0.1, 0.2, 0.3).map((_, 0.0))
    assert(aucOf(pos ++ neg) === Some(1.0))
    assert(aucOf(pos.map(p => (1.0 - p._1, 1.0)) ++
      neg.map(n => (1.0 - n._1, 0.0))) === Some(0.0))
    assert(aucOf(Seq((0.5, 1.0), (0.5, 0.0), (0.5, 1.0), (0.5, 0.0)))
      === Some(0.5))
    // scores: pos at {0.3, 0.7}, neg at {0.3, 0.5}; pairs:
    // (0.3p,0.3n)=.5  (0.3p,0.5n)=0  (0.7p,0.3n)=1  (0.7p,0.5n)=1
    // AUC = 2.5/4
    assert(aucOf(Seq((0.3, 1.0), (0.7, 1.0), (0.3, 0.0), (0.5, 0.0)))
      === Some(0.625))
  }

  test("auc: single-class input yields NULL, counts still reported") {
    val r = Classifier.auc(Seq((0.4, 1.0), (0.6, 1.0)).toDF("sc", "y"),
      "sc", "y").head()
    assert(r.isNullAt(0) && r.getLong(1) == 2L && r.getLong(2) == 0L)
  }

  test("auc is partition-invariant and lint-clean (no global window)") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 500).map { _ =>
      val y = rnd.nextInt(2).toDouble
      (rnd.nextInt(40) / 40.0 + y * 0.1, y)
    }
    val a = aucOf(rows)
    val b = {
      val r = Classifier.auc(rows.toDF("sc", "y").repartition(13),
        "sc", "y").head()
      Some(r.getDouble(0))
    }
    assert(a === b)
    assert(PlanLint.clean(Classifier.auc(rows.toDF("sc", "y"), "sc", "y")))
  }

  test("calibration: exact per-bin counts, mean scores, observed rates; " +
      "score 1.0 clamps into the last bin") {
    val d = Seq(
      (0.05, 0.0), (0.15, 0.0), (0.15, 1.0), // bins 0 and 1
      (0.95, 1.0), (0.95, 1.0), (1.0, 1.0))  // bin 9 (1.0 clamps)
      .toDF("sc", "y")
    val c = Classifier.calibration(d, "sc", "y", bins = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(c(0L) === ((1L, 0.05, 0.0)))
    assert(c(1L) === ((2L, 0.15, 0.5)))
    val (n9, m9, o9) = c(9L)
    assert(n9 == 3L && o9 == 1.0 && math.abs(m9 - (0.95 + 0.95 + 1.0) / 3)
      < 1e-9)
    assert(c.size == 3)
  }

  test("null feature rows are excluded from training; validation guards") {
    val d = Seq((Some(1.0), 1.0, 1.0), (None, 1.0, 0.0),
      (Some(-1.0), 1.0, 0.0)).toDF("x", "b", "y")
    val w = Classifier.logisticTrain(d, Seq("x", "b"), "y", 2, 0.5)
    assert(w.length == 2) // trains on the 2 complete rows
    intercept[IllegalArgumentException] {
      Classifier.logisticTrain(d, Seq("x", "b"), "y", 0, 0.5)
    }
    intercept[IllegalArgumentException] {
      Classifier.score(d, Seq("x", "b"), Array(1.0))
    }
  }

  test("confusion: per-class tp/margins, sig9'd P/R/F1, the __all__ " +
      "accuracy row, and zero rows for never-predicted classes") {
    import spark.implicits._
    import graft.functions.GraftMath
    def s9(x: Double) = GraftMath.sig9(x)
    // true: a a a b b c ; pred: a a b b b a — c never predicted
    val preds = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"),
      ("b", "b"), ("c", "a")).toDF("t", "p")
    val got = Classifier.confusion(preds, "t", "p").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("a", "b", "c", "__all__"))
    val a = got("a")
    assert(a.getAs[Long]("tp") == 2L && a.getAs[Long]("n_pred") == 3L &&
      a.getAs[Long]("n_true") == 3L)
    val pa = s9(2.0 / 3.0)
    assert(a.getAs[Double]("prec") == pa && a.getAs[Double]("rec") == pa)
    assert(a.getAs[Double]("f1") == s9(2.0 * pa * pa / (pa + pa)))
    val c = got("c")
    assert(c.getAs[Long]("tp") == 0L && c.getAs[Long]("n_pred") == 0L &&
      c.getAs[Long]("n_true") == 1L)
    assert(c.isNullAt(c.fieldIndex("prec"))) // zero predicted
    assert(c.getAs[Double]("rec") == 0.0)
    assert(c.isNullAt(c.fieldIndex("f1"))) // prec NULL
    val all = got("__all__")
    assert(all.getAs[Long]("tp") == 4L &&
      all.getAs[Long]("n_pred") == 6L)
    assert(all.getAs[Double]("prec") == s9(4.0 / 6.0))
  }

  // ===== lift table ===================================================

  private def s9(x: Double) = graft.functions.GraftMath.sig9(x)

  // ===== closed-form ridge ============================================

  test("ridgeFit: recovers an exact linear relation at lambda 0, " +
      "shrinks exactly per the normal equations at lambda > 0, and " +
      "NULLs out on a singular design") {
    // y = 2x + 3 over x in {1,2,3}: all sums exact integers
    val d = Seq((1.0, 1.0, 5.0), (2.0, 1.0, 7.0), (3.0, 1.0, 9.0))
      .toDF("x1", "x2", "y")
    val r0 = Classifier.ridgeFit(d, "x1", "x2", "y", lambda = 0.0)
      .head()
    assert(r0.getAs[Double]("w1") == 2.0 &&
      r0.getAs[Double]("w2") == 3.0)
    assert(r0.getAs[Double]("det") == 6.0 && r0.getAs[Long]("n") == 3L)
    // lambda 6: a=20, c=9, det=144 -> w = (288/144, 144/144·1) = (2, 1)
    val r6 = Classifier.ridgeFit(d, "x1", "x2", "y", lambda = 6.0)
      .head()
    assert(r6.getAs[Double]("w1") == 2.0 &&
      r6.getAs[Double]("w2") == 1.0)
    // duplicated feature, no regularization -> singular
    val dup = Seq((1.0, 1.0, 5.0), (2.0, 2.0, 7.0)).toDF("x1", "x2", "y")
    val rs = Classifier.ridgeFit(dup, "x1", "x2", "y", lambda = 0.0)
      .head()
    assert(rs.getAs[Double]("det") == 0.0)
    assert(rs.isNullAt(rs.fieldIndex("w1")))
    // and the same design becomes solvable WITH regularization
    val rr = Classifier.ridgeFit(dup, "x1", "x2", "y", lambda = 1.0)
      .head()
    assert(!rr.isNullAt(rr.fieldIndex("w1")))
  }

  test("liftTable: top decile captures the concentrated positives; " +
      "lift/gain follow the exact-product sig9 chain") {
    // scores 1..20, positives at 16..20 (top bin) and 3 (bottom bin)
    val d = (1 to 20).map(i =>
      (i.toDouble, if (i >= 16 || i == 3) 1L else 0L)).toDF("s", "y")
    val lt = Classifier.liftTable(d, "s", "y", bins = 4)
      .collect().map(r => r.getAs[Long]("decile") -> r).toMap
    assert(lt.keySet == Set(1L, 2L, 3L, 4L))
    val d1 = lt(1L) // scores 16..20
    assert(d1.getAs[Long]("n") == 5L && d1.getAs[Long]("n_pos") == 5L)
    assert(d1.getAs[Double]("lo_score") == 16.0 &&
      d1.getAs[Double]("hi_score") == 20.0)
    assert(d1.getAs[Double]("pos_rate") == 1.0)
    // base rate 6/20; lift = (5*20)/(5*6)
    assert(d1.getAs[Double]("lift") == s9(100.0 / 30.0))
    assert(d1.getAs[Double]("gain") == s9(5.0 / 6.0))
    val d2 = lt(2L) // scores 11..15, no positives
    assert(d2.getAs[Double]("pos_rate") == 0.0)
    assert(d2.getAs[Long]("cum_n") == 10L &&
      d2.getAs[Long]("cum_pos") == 5L)
    assert(d2.getAs[Double]("cum_lift") == s9(100.0 / 60.0))
    val d4 = lt(4L) // scores 1..5, one positive
    assert(d4.getAs[Long]("n_pos") == 1L)
    assert(d4.getAs[Double]("lift") == s9(20.0 / 30.0))
    assert(d4.getAs[Long]("cum_n") == 20L &&
      d4.getAs[Long]("cum_pos") == 6L)
    assert(d4.getAs[Double]("gain") == 1.0)
    assert(d4.getAs[Double]("cum_lift") == 1.0)
  }

  test("liftTable: fully tied scores collapse to one bottom decile; " +
      "no positives -> NULL lift and gain") {
    val tied = Seq((5.0, 1L), (5.0, 0L), (5.0, 1L), (5.0, 0L))
      .toDF("s", "y")
    val lt = Classifier.liftTable(tied, "s", "y", bins = 4).collect()
    assert(lt.length == 1)
    assert(lt.head.getAs[Long]("decile") == 4L) // n_below 0 -> bin 0
    assert(lt.head.getAs[Long]("n") == 4L &&
      lt.head.getAs[Long]("n_pos") == 2L)
    assert(lt.head.getAs[Double]("cum_lift") == 1.0)
    val nopos = Seq((1.0, 0L), (2.0, 0L)).toDF("s", "y")
    val ln = Classifier.liftTable(nopos, "s", "y", bins = 2).collect()
    assert(ln.forall(_.isNullAt(ln.head.fieldIndex("lift"))))
    assert(ln.forall(_.isNullAt(ln.head.fieldIndex("gain"))))
    assert(ln.map(_.getAs[Double]("pos_rate")).toSet == Set(0.0))
  }

  test("kappa: textbook 2x2 agreement (0.4), perfect and degenerate " +
      "cases") {
    // classic example: 20 yes/yes, 5 yes/no, 10 no/yes, 15 no/no
    val rows = Seq.fill(20)(("yes", "yes")) ++ Seq.fill(5)(("yes", "no")) ++
      Seq.fill(10)(("no", "yes")) ++ Seq.fill(15)(("no", "no"))
    val r = Classifier.kappa(
      rows.toDF("t", "p").repartition(3), "t", "p").head()
    assert(r.getAs[Long]("n") == 50L && r.getAs[Long]("agree") == 35L)
    assert(r.getAs[Double]("po") == 0.7)
    assert(r.getAs[Double]("pe") == 0.5)
    assert(r.getAs[Double]("kappa") == 0.4)
    // perfect diagonal agreement with 2 classes -> exactly 1.0
    val perfect = Classifier.kappa(
      Seq(("a", "a"), ("a", "a"), ("a", "a"), ("b", "b"))
        .toDF("t", "p"), "t", "p").head()
    assert(perfect.getAs[Double]("kappa") == 1.0)
    // all mass in one cell: den = 0 -> NULL, never a division error
    val degen = Classifier.kappa(
      Seq.fill(4)(("a", "a")).toDF("t", "p"), "t", "p").head()
    assert(degen.getAs[Double]("po") == 1.0)
    assert(degen.isNullAt(degen.fieldIndex("kappa")))
  }

  test("isotonicCalibration pools adjacent violators exactly like " +
      "sequential PAVA and is always nondecreasing") {
    // lo=0, hi=10 -> bin width 1; occupied bins 0,2,4,6,9 with
    // (rate, weight): 0(.5,2) 2(1,2) 4(0,2) 6(.5,2) 9(1,2)
    val rows =
      Seq((0.0, 0), (0.5, 1),  // bin 0 rate .5
        (2.0, 1), (2.5, 1),    // bin 2 rate 1 (violator vs bin 4)
        (4.0, 0), (4.5, 0),    // bin 4 rate 0
        (6.0, 1), (6.5, 0),    // bin 6 rate .5
        (9.0, 1), (10.0, 1))   // bin 9 rate 1 (10.0 clamps into 9)
    val df = rows.toDF("s", "y").repartition(3)
    val got = Classifier.isotonicCalibration(df, "s", "y", bins = 10)
      .orderBy("bin").collect()
      .map(r => r.getAs[Long]("bin") -> r.getAs[Double]("fit")).toMap
    // sequential PAVA: 1 then 0 pool to .5 (equal to bin 0's .5 — no
    // further merge); hand-checked minimax agrees bin by bin
    assert(got(0L) == 0.5 && got(2L) == 0.5 && got(4L) == 0.5 &&
      got(6L) == 0.5 && got(9L) == 1.0)
    // monotone by construction
    val fits = Classifier.isotonicCalibration(df, "s", "y", bins = 10)
      .orderBy("bin").select("fit").as[Double].collect()
    assert(fits.zip(fits.tail).forall { case (a, b) => a <= b })
    // already-monotone rates are returned unchanged
    val mono = Seq((0.0, 0), (0.5, 0), (5.0, 1), (5.5, 0), (9.9, 1),
      (9.0, 1)).toDF("s", "y")
    val m = Classifier.isotonicCalibration(mono, "s", "y", bins = 10)
      .orderBy("bin").select("fit").as[Double].collect()
    assert(m.sameElements(Array(0.0, 0.5, 1.0)))
  }

  test("stumpSplits finds the exact best Gini split with a " +
      "deterministic tie-break") {
    // y perfectly separable on x at the midpoint; z is noise
    val rows = (0 until 32).map { i =>
      (i.toDouble, (i % 2).toDouble, if (i < 16) 0 else 1)
    }
    val df = rows.toDF("x", "z", "y")
    val out = Classifier.stumpSplits(df, Seq("x", "z"), "y", bins = 16)
      .collect()
    val best = out.filter(_.getAs[Boolean]("is_best"))
    assert(best.length == 1)
    val b = best.head
    // x bins 0..15, two values per bin; split after bin 7 separates
    assert(b.getAs[String]("feature") == "x" &&
      b.getAs[Long]("split_bin") == 7L)
    assert(b.getAs[Double]("gain") == 0.5) // gini .5 -> 0
    assert(b.getAs[Long]("left_n") == 16L &&
      b.getAs[Long]("left_pos") == 0L)
    // constant feature (hi == lo) contributes no candidate splits
    val const = Classifier.stumpSplits(
      rows.map(r => (r._1, 1.0, r._3)).toDF("x", "z", "y"),
      Seq("x", "z"), "y", bins = 16).collect()
    assert(!const.exists(_.getAs[String]("feature") == "z"))
  }

  test("prAuc: hand-computed average precision, perfect ranking, and " +
      "the constant-score baseline") {
    // desc thresholds: s=.9 -> P=1/1 (ΔR=1/2); s=.7 -> P=2/3 (ΔR=1/2)
    val hand = Classifier.prAuc(
      Seq((0.9, 1.0), (0.8, 0.0), (0.7, 1.0), (0.6, 0.0))
        .toDF("s", "y"), "s", "y").head()
    // tolerance 1e-6: the engine's dsumStable(6) rounds the term sum
    // to 6 decimal places by design (engine-identical determinism)
    assert(math.abs(hand.getAs[Double]("average_precision")
      - (1.0 + 2.0 / 3.0) / 2.0) < 1e-6)
    assert(hand.getAs[Long]("n_pos") == 2L &&
      hand.getAs[Long]("n_neg") == 2L)
    assert(hand.getAs[Double]("baseline") == 0.5)
    // perfect separation: AP = 1 regardless of class balance
    val perfect = Classifier.prAuc(
      ((1 to 5).map(i => (10.0 + i, 1.0)) ++
        (1 to 20).map(i => (i / 2.0, 0.0))).toDF("s", "y"),
      "s", "y").head()
    assert(perfect.getAs[Double]("average_precision") == 1.0)
    // constant score: single threshold -> AP = precision = baseline
    val const = Classifier.prAuc(
      (Seq.fill(3)((5.0, 1.0)) ++ Seq.fill(9)((5.0, 0.0)))
        .toDF("s", "y"), "s", "y").head()
    assert(const.getAs[Double]("average_precision") ==
      const.getAs[Double]("baseline"))
    assert(const.getAs[Double]("average_precision") == 0.25)
  }

  test("ridgeCv: one-pass k-fold grid picks the least-shrunk lambda " +
      "on noiseless linear data and shrinks weights monotonically") {
    // exact y = 2*x1 + 1 (x2 = bias): tiny lambda wins CV
    val rows = (0 until 200).map { i =>
      val x = (i % 10).toDouble
      (i.toString, x, 1.0, 2.0 * x + 1.0)
    }
    val out = Classifier.ridgeCv(rows.toDF("k", "x1", "x2", "y"),
      "k", "x1", "x2", "y", Seq(0.01, 0.1, 1.0, 10.0), folds = 5)
      .collect().map(r => r.getAs[Double]("lambda") -> r).toMap
    assert(out.size == 4)
    assert(out.values.forall(_.getAs[Long]("n") == 200L))
    val best = out.values.filter(_.getAs[Boolean]("is_best")).toSeq
    assert(best.map(_.getAs[Double]("lambda")) == Seq(0.01))
    // noiseless data: shrinkage only hurts -> cv_mse increasing in λ
    val mses = Seq(0.01, 0.1, 1.0, 10.0).map(l =>
      out(l).getAs[Double]("cv_mse"))
    assert(mses.zip(mses.tail).forall { case (a, b) => a < b })
    assert(mses.head < 1e-3)
    // full-data refit near the true weights at tiny λ; ridge shrinks
    // the coefficient NORM (not each coordinate — with a bias column
    // the slope compensates upward as the intercept shrinks)
    assert(math.abs(out(0.01).getAs[Double]("w1_full") - 2.0) < 0.01)
    assert(math.abs(out(0.01).getAs[Double]("w2_full") - 1.0) < 0.01)
    def norm(l: Double) = {
      val r = out(l)
      math.hypot(r.getAs[Double]("w1_full"), r.getAs[Double]("w2_full"))
    }
    assert(norm(10.0) < norm(0.01))
  }

  test("huberFit downweights outliers toward the clean slope while " +
      "OLS chases them; clean data reproduces OLS") {
    // clean line y = 2x + 1 with one wild outlier
    val clean = (1 to 20).map(i => (i.toDouble, 2.0 * i + 1.0))
    val noisy = clean :+ ((20.0, 500.0))
    val r = Classifier.huberFit(noisy.toDF("x", "y"), "x", "y",
      delta = 1.0, iters = 8).head()
    val bH = r.getAs[Double]("b"); val bO = r.getAs[Double]("b_ols")
    val aH = r.getAs[Double]("a")
    assert(math.abs(bH - 2.0) < 0.2,
      s"huber slope $bH should be near 2")
    assert(math.abs(bH - 2.0) < math.abs(bO - 2.0),
      "huber must beat OLS under contamination")
    assert(math.abs(aH - 1.0) < 2.0)
    // no outliers: IRLS fixed point IS the OLS fit
    val c = Classifier.huberFit(clean.toDF("x", "y"), "x", "y",
      delta = 10.0, iters = 3).head()
    assert(c.getAs[Double]("a") == c.getAs[Double]("a_ols") &&
      c.getAs[Double]("b") == c.getAs[Double]("b_ols"))
    assert(c.getAs[Double]("b") == 2.0 && c.getAs[Double]("a") == 1.0)
  }

  test("adaboostStumps: separable data drives ensemble error to 0") {
    val df = ((1 to 6).map(_ => (0.0, 0L)) ++
      (1 to 6).map(_ => (10.0, 1L))).toDF("x", "y")
    val out = Classifier.adaboostStumps(df, Seq("x"), "y", rounds = 3,
      bins = 8).collect().sortBy(_.getAs[Long]("round"))
    assert(out.length === 3)
    // a perfect stump exists; every round finds one and the ensemble
    // is exact from round 1
    assert(out.forall(_.getAs[Double]("err") === 0.0))
    assert(out.forall(_.getAs[Double]("ens_err") === 0.0))
    assert(out.forall(_.getAs[Double]("alpha") > 0.0))
  }

  test("adaboostStumps: round-1 stump and error are the hand argmin") {
    // bins 0..7 occupied one row each; y = bin >= 4 except bin 0 noisy
    val df = (0 to 7).map { b =>
      (b.toDouble, if (b >= 4 || b == 0) 1L else 0L)
    }.toDF("x", "y")
    val out = Classifier.adaboostStumps(df, Seq("x"), "y", rounds = 2,
      bins = 8).collect().sortBy(_.getAs[Long]("round"))
    val r1 = out(0)
    // gt@3 misclassifies only the noisy bin 0: err = 1/8
    assert(r1.getAs[String]("feature") === "x")
    assert(r1.getAs[Long]("split_bin") === 3L)
    assert(r1.getAs[String]("polarity") === "gt")
    assert(r1.getAs[Double]("err") === 0.125)
    assert(r1.getAs[Double]("ens_err") === 0.125)
    // round 2 re-weights the noisy point up; trajectory stays defined
    assert(out(1).getAs[Double]("err") > 0.0)
  }

  test("ridgeLogoInfluence: leaving a group out reproduces the fit " +
      "on the remaining groups exactly") {
    // group 1 on y = 2x + 1, group 2 a far-off cluster pulling the fit
    val g1 = Seq((1.0, 3.0), (2.0, 5.0), (3.0, 7.0), (4.0, 9.0))
    val g2 = Seq((10.0, 0.0), (11.0, 0.0))
    val df = (g1.map { case (x, y) => (x, 1.0, y, 1L) } ++
      g2.map { case (x, y) => (x, 1.0, y, 2L) })
      .toDF("x1", "x2", "y", "g")
    val out = Classifier.ridgeLogoInfluence(df, "x1", "x2", "y", "g",
      lambda = 0.0).collect().map(r => r.getAs[Long]("g") -> r).toMap
    // leave out g2 -> the exact fit on g1 alone
    val fitG1 = Classifier.ridgeFit(
      g1.map { case (x, y) => (x, 1.0, y) }.toDF("x1", "x2", "y"),
      "x1", "x2", "y", lambda = 0.0).head()
    assert(out(2L).getAs[Double]("w1_loo") === fitG1.getAs[Double]("w1"))
    assert(out(2L).getAs[Double]("w2_loo") === fitG1.getAs[Double]("w2"))
    // g2 is load-bearing: its removal moves the slope a lot
    assert(out(2L).getAs[Double]("influence") > 1.0)
    // full fit is attached identically on every row
    assert(out(1L).getAs[Double]("w1_full") ===
      out(2L).getAs[Double]("w1_full"))
  }

  test("ridgeLogoInfluence: a pattern-redundant group has zero " +
      "influence; a degenerate leave-out yields NULLs") {
    // both groups sit exactly on y = 2x + 1: deleting either leaves
    // the same exact interpolating fit
    val df = Seq((1.0, 1.0, 3.0, 1L), (2.0, 1.0, 5.0, 1L),
      (1.0, 1.0, 3.0, 2L), (2.0, 1.0, 5.0, 2L), (3.0, 1.0, 7.0, 2L))
      .toDF("x1", "x2", "y", "g")
    val out = Classifier.ridgeLogoInfluence(df, "x1", "x2", "y", "g",
      lambda = 0.0).collect().map(r => r.getAs[Long]("g") -> r).toMap
    assert(out(1L).getAs[Double]("influence") === 0.0)
    assert(out(2L).getAs[Double]("influence") === 0.0)
    // removing g2 from a frame where g1 has a single x level ->
    // collinear with the intercept -> det 0 -> NULL loo fit
    val deg = Seq((5.0, 1.0, 2.0, 1L), (5.0, 1.0, 4.0, 1L),
      (1.0, 1.0, 1.0, 2L), (2.0, 1.0, 2.0, 2L))
      .toDF("x1", "x2", "y", "g")
    val d = Classifier.ridgeLogoInfluence(deg, "x1", "x2", "y", "g",
      lambda = 0.0).collect().map(r => r.getAs[Long]("g") -> r).toMap
    assert(d(2L).isNullAt(d(2L).fieldIndex("w1_loo")))
    assert(d(2L).isNullAt(d(2L).fieldIndex("influence")))
    intercept[IllegalArgumentException](
      Classifier.ridgeLogoInfluence(deg, "x1", "x2", "y", "g", -1.0))
  }

  test("gbmStumps: step data is fit exactly as lr-geometric MSE decay") {
    // y = 0 for x<5, 10 for x>=5: the optimal stump is found every
    // round; with lr=0.5 the residual halves each round, so MSE
    // decays by 4x per round from the baseline variance of 25
    val df = ((1 to 6).map(_ => (0.0, 0.0)) ++
      (1 to 6).map(_ => (10.0, 10.0))).toDF("x", "y")
    val out = Classifier.gbmStumps(df, Seq("x"), "y", rounds = 3,
      bins = 8, lr = 0.5).collect().sortBy(_.getAs[Long]("round"))
    assert(out.length === 3)
    val mses = out.map(_.getAs[Double]("mse"))
    assert(math.abs(mses(0) - 6.25) < 1e-9)   // 25 / 4
    assert(math.abs(mses(1) - 1.5625) < 1e-9) // 25 / 16
    assert(math.abs(mses(2) - 0.390625) < 1e-9)
    // leaves: round-1 residuals are -5 / +5
    assert(math.abs(out(0).getAs[Double]("gamma_le") + 5.0) < 1e-9)
    assert(math.abs(out(0).getAs[Double]("gamma_gt") - 5.0) < 1e-9)
    assert(out.forall(_.getAs[Double]("gain") > 0.0))
  }

  test("gbmStumps: picks the informative feature over a constant one") {
    val df = (0 to 7).map { b =>
      (b.toDouble, 1.0, if (b >= 4) 8.0 else 2.0)
    }.toDF("x", "z", "y")
    val out = Classifier.gbmStumps(df, Seq("x", "z"), "y", rounds = 1,
      bins = 8).collect()
    assert(out.head.getAs[String]("feature") === "x")
    assert(out.head.getAs[Long]("split_bin") === 3L)
  }

  test("gbmStumps: constant label yields zero gain and zero MSE") {
    val df = (1 to 10).map(i => (i.toDouble, 3.0)).toDF("x", "y")
    val out = Classifier.gbmStumps(df, Seq("x"), "y", rounds = 2,
      bins = 4).collect()
    assert(out.forall(_.getAs[Double]("mse") === 0.0))
    assert(out.forall(_.getAs[Double]("gain") === 0.0))
  }

  test("gbmStumps: validation") {
    val df = Seq((1.0, 1.0)).toDF("x", "y")
    intercept[IllegalArgumentException](
      Classifier.gbmStumps(df, Seq.empty, "y", 2))
    intercept[IllegalArgumentException](
      Classifier.gbmStumps(df, Seq("x"), "y", 0))
    intercept[IllegalArgumentException](
      Classifier.gbmStumps(df, Seq("x"), "y", 2, bins = 1))
    intercept[IllegalArgumentException](
      Classifier.gbmStumps(df, Seq("x"), "y", 2, lr = 0.0))
  }
}
