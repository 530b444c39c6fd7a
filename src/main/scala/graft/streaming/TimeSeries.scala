package graft.streaming

/** SARIMAX(1,1,1)-with-exogenous-regressors threshold forecasting — a
  * JVM port of the reference's time-series service (reference:
  * testgen/common/time_series_service.py:20-137 and
  * testgen/commands/test_thresholds_prediction.py:263-307).
  *
  * The reference fits statsmodels' state-space SARIMAX; here the same
  * model family — ARIMA(1,1,1) errors around a linear regression on the
  * `is_excluded` flag — is fit by conditional-sum-of-squares with a
  * Nelder–Mead search over (phi, theta, beta). Numeric parity with a
  * Kalman-filter MLE is approximate by construction, but the published
  * band semantics are preserved exactly:
  *
  *  - median-diff frequency inference with the 5% day/hour snap
  *    (time_series_service.py:119-137);
  *  - resample to the inferred frequency + linear interpolation (:47);
  *  - MIN_TRAIN_VALUES = 20 before AND after resampling (:13,:41,:49);
  *  - exog `is_excluded` flag = weekend OR holiday (:63-73). The
  *    reference resolves holiday_codes through the `holidays` package;
  *    here [[HolidayCalendar]] computes the calendar (US federal rules)
  *    and callers pass the resolved dates ("yyyy-MM-dd" in the model's
  *    tz), which flag exactly like weekends;
  *  - SE = max(model SE, residual SE after burn-in = max(order,3),
  *    raw first-difference SE) (:104-113);
  *  - tolerance = mean + multiplier * se where multiplier is the z-score
  *    by sensitivity (±2/2.5/3), replaced by the t-quantile at the same
  *    normal percentile when history < 20 points
  *    (test_thresholds_prediction.py:35-42,290-296).
  */
object TimeSeries {

  val MinTrainValues = 20
  val TDistributionThreshold = 20
  val NumForecast = 10

  /** z-scores by sensitivity (test_thresholds_prediction.py:35-42). */
  val zScore: Map[String, Double] =
    Map("low" -> 3.0, "medium" -> 2.5, "high" -> 2.0)

  final case class Forecast(ts: Seq[Long], mean: Array[Double], se: Array[Double])
  final case class Fit(phi: Double, theta: Double, beta: Double,
                       sigma2: Double, resid: Array[Double])

  /** Abramowitz–Stegun normal CDF — the same approximation the reference
    * installs as fn_normal_cdf (reference:
    * testgen/template/dbsetup/020_create_standard_functions_sprocs.sql:157-211). */
  def normCdf(z: Double): Double = {
    val x = math.abs(z)
    val t = 1.0 / (1.0 + 0.2316419 * x)
    val poly = t * (0.319381530 + t * (-0.356563782 + t * (1.781477937 +
      t * (-1.821255978 + t * 1.330274429))))
    val p = 1.0 - (1.0 / math.sqrt(2 * math.Pi)) * math.exp(-x * x / 2.0) * poly
    if (z >= 0) p else 1.0 - p
  }

  /** Student-t CDF via the regularized incomplete beta function. */
  def tCdf(x: Double, df: Double): Double = {
    val ib = incompleteBeta(df / 2.0, 0.5, df / (df + x * x))
    if (x > 0) 1.0 - 0.5 * ib else 0.5 * ib
  }

  /** t-quantile by bisection of the CDF (series are tiny; robustness
    * beats speed here). */
  def tPpf(p: Double, df: Double): Double = {
    var lo = -50.0; var hi = 50.0
    var i = 0
    while (i < 200) {
      val mid = (lo + hi) / 2
      if (tCdf(mid, df) < p) lo = mid else hi = mid
      i += 1
    }
    (lo + hi) / 2
  }

  /** Regularized incomplete beta I_x(a, b) by continued fraction. */
  private def incompleteBeta(a: Double, b: Double, x: Double): Double = {
    if (x <= 0) return 0.0
    if (x >= 1) return 1.0
    val lbeta = logGamma(a) + logGamma(b) - logGamma(a + b)
    val front = math.exp(a * math.log(x) + b * math.log(1 - x) - lbeta)
    // Lentz's continued fraction
    def cf(a: Double, b: Double, x: Double): Double = {
      val eps = 1e-14
      var c = 1.0
      var d = 1.0 - (a + b) * x / (a + 1)
      if (math.abs(d) < 1e-30) d = 1e-30
      d = 1.0 / d
      var h = d
      var m = 1
      while (m <= 300) {
        val m2 = 2 * m
        var aa = m * (b - m) * x / ((a + m2 - 1) * (a + m2))
        d = 1.0 + aa * d; if (math.abs(d) < 1e-30) d = 1e-30
        c = 1.0 + aa / c; if (math.abs(c) < 1e-30) c = 1e-30
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (a + b + m) * x / ((a + m2) * (a + m2 + 1))
        d = 1.0 + aa * d; if (math.abs(d) < 1e-30) d = 1e-30
        c = 1.0 + aa / c; if (math.abs(c) < 1e-30) c = 1e-30
        d = 1.0 / d
        val del = d * c
        h *= del
        if (math.abs(del - 1.0) < eps) return h
        m += 1
      }
      h
    }
    if (x < (a + 1) / (a + b + 2)) front * cf(a, b, x) / a
    else 1.0 - incompleteBeta(b, a, 1.0 - x) // symmetry I_x(a,b) = 1 - I_{1-x}(b,a)
  }

  private def logGamma(x: Double): Double = {
    val cof = Array(76.18009172947146, -86.50532032941677, 24.01409824083091,
      -1.231739572450155, 0.1208650973866179e-2, -0.5395239384953e-5)
    val xx = x
    var y = x
    val tmp0 = xx + 5.5 - (xx + 0.5) * math.log(xx + 5.5)
    var ser = 1.000000000190015
    var j = 0
    while (j < 6) { y += 1; ser += cof(j) / y; j += 1 }
    -tmp0 + math.log(2.5066282746310005 * ser / xx)
  }

  /** Median time-step with the 5% day/hour snap
    * (time_series_service.py:119-137). Returns seconds. */
  def inferFrequencySeconds(tsSec: Seq[Long]): Long = {
    require(tsSec.length >= 2, "need at least two timestamps")
    val diffs = tsSec.sliding(2).map(p => (p(1) - p(0)).toDouble).toArray.sorted
    val n = diffs.length
    val median = if (n % 2 == 1) diffs(n / 2) else (diffs(n / 2 - 1) + diffs(n / 2)) / 2.0
    val days = median / 86400.0
    val nearestDay = math.round(days)
    if (nearestDay >= 1 && math.abs(days - nearestDay) / nearestDay < 0.05)
      return nearestDay * 86400L
    val hours = median / 3600.0
    val nearestHour = math.round(hours)
    if (nearestHour > 0 && math.abs(hours - nearestHour) / nearestHour < 0.05)
      return nearestHour * 3600L
    val minutes = (median / 60.0).toLong
    if (minutes > 0) minutes * 60L else median.toLong.max(1L)
  }

  /** Resample onto the regular grid (bucket mean, like pandas
    * `.resample(freq).mean()`) and linearly interpolate empty buckets. */
  def resampleInterpolate(tsSec: Seq[Long], vals: Seq[Double], freqSec: Long)
      : (Seq[Long], Array[Double]) = {
    val start = tsSec.head - (tsSec.head % freqSec)
    val end = tsSec.last - (tsSec.last % freqSec)
    val nBuckets = ((end - start) / freqSec + 1).toInt
    val sums = new Array[Double](nBuckets)
    val counts = new Array[Int](nBuckets)
    tsSec.zip(vals).foreach { case (t, v) =>
      val b = ((t - (t % freqSec) - start) / freqSec).toInt
      sums(b) += v; counts(b) += 1
    }
    val out = new Array[Double](nBuckets)
    var i = 0
    while (i < nBuckets) {
      out(i) = if (counts(i) > 0) sums(i) / counts(i) else Double.NaN
      i += 1
    }
    // linear interpolation of interior NaNs; edge NaNs carry the nearest
    // observed value (pandas interpolate default limit_direction=forward;
    // leading NaNs cannot occur here because bucket 0 holds tsSec.head)
    i = 0
    while (i < nBuckets) {
      if (out(i).isNaN) {
        var j = i
        while (j < nBuckets && out(j).isNaN) j += 1
        val left = out(i - 1)
        if (j < nBuckets) {
          val right = out(j)
          var k = i
          while (k < j) {
            out(k) = left + (right - left) * (k - i + 1) / (j - i + 1)
            k += 1
          }
        } else {
          var k = i
          while (k < nBuckets) { out(k) = left; k += 1 }
        }
        i = j
      } else i += 1
    }
    ((0 until nBuckets).map(b => start + b.toLong * freqSec), out)
  }

  /** Saturday/Sunday flag for an epoch-seconds instant (UTC; the
    * reference's tz conversion is exposed via `tzOffsetSec`). */
  def isWeekend(tsSec: Long, tzOffsetSec: Long = 0L): Int = {
    val days = math.floorDiv(tsSec + tzOffsetSec, 86400L)
    // 1970-01-01 was a Thursday → dow 0=Mon at offset 3
    val dow = ((days + 3) % 7 + 7) % 7
    if (dow >= 5) 1 else 0
  }

  /** Local calendar date of a timestamp as "yyyy-MM-dd" (for holiday
    * lookups — reference get_holiday_dates, time_series_service.py:56-60). */
  def localDate(tsSec: Long, tzOffsetSec: Long = 0L): String =
    java.time.LocalDate.ofEpochDay(math.floorDiv(tsSec + tzOffsetSec, 86400L)).toString

  /** The reference's is_excluded exog flag: weekend (when enabled) or a
    * date in the supplied holiday calendar. */
  def isExcluded(tsSec: Long, excludeWeekends: Boolean, tzOffsetSec: Long,
                 holidays: Set[String]): Double = {
    val wk = excludeWeekends && isWeekend(tsSec, tzOffsetSec) == 1
    if (wk || (holidays.nonEmpty && holidays.contains(localDate(tsSec, tzOffsetSec)))) 1.0
    else 0.0
  }

  /** CSS fit of Δy - βΔx = ARMA(1,1) by Nelder–Mead over (φ, θ, β). */
  def fitArima111(dy: Array[Double], dx: Array[Double]): Fit = {
    val n = dy.length
    def css(p: Array[Double]): Double = {
      val phi = p(0); val theta = p(1); val beta = p(2)
      var prevZ = 0.0; var prevE = 0.0
      var acc = 0.0
      var t = 0
      while (t < n) {
        val z = dy(t) - beta * dx(t)
        val e = if (t == 0) z else z - phi * prevZ - theta * prevE
        acc += e * e
        prevZ = z; prevE = e
        t += 1
      }
      // soft bound: keep the search in a sane ARMA region without hard
      // stationarity enforcement (reference sets enforce_* = False)
      val penalty = math.max(0.0, math.abs(phi) - 5.0) + math.max(0.0, math.abs(theta) - 5.0)
      acc * (1.0 + penalty)
    }
    val best = nelderMead(Array(0.1, 0.1, 0.0), css)
    val Array(phi, theta, beta) = best
    val resid = new Array[Double](n)
    var prevZ = 0.0; var prevE = 0.0
    var t = 0
    while (t < n) {
      val z = dy(t) - beta * dx(t)
      val e = if (t == 0) z else z - phi * prevZ - theta * prevE
      resid(t) = e
      prevZ = z; prevE = e
      t += 1
    }
    val sigma2 = if (n > 0) resid.map(e => e * e).sum / n else 0.0
    Fit(phi, theta, beta, sigma2, resid)
  }

  private def nelderMead(x0: Array[Double], f: Array[Double] => Double,
                         iters: Int = 400): Array[Double] = {
    val dim = x0.length
    var simplex = (0 to dim).map { i =>
      val p = x0.clone()
      if (i > 0) p(i - 1) += (if (x0(i - 1) == 0.0) 0.25 else 0.05 * math.abs(x0(i - 1)) + 0.2)
      (p, f(p))
    }.toArray
    var it = 0
    while (it < iters) {
      simplex = simplex.sortBy(_._2)
      val worst = simplex(dim)._1
      val centroid = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        var s = 0.0; var j = 0
        while (j < dim) { s += simplex(j)._1(i); j += 1 }
        centroid(i) = s / dim
        i += 1
      }
      def combine(alpha: Double): Array[Double] = {
        val p = new Array[Double](dim)
        var k = 0
        while (k < dim) { p(k) = centroid(k) + alpha * (centroid(k) - worst(k)); k += 1 }
        p
      }
      val refl = combine(1.0); val fr = f(refl)
      if (fr < simplex(0)._2) {
        val exp = combine(2.0); val fe = f(exp)
        simplex(dim) = if (fe < fr) (exp, fe) else (refl, fr)
      } else if (fr < simplex(dim - 1)._2) {
        simplex(dim) = (refl, fr)
      } else {
        val con = combine(-0.5); val fc = f(con)
        if (fc < simplex(dim)._2) simplex(dim) = (con, fc)
        else {
          // shrink toward best
          val bst = simplex(0)._1
          simplex = simplex.map { case (p, _) =>
            val q = p.clone()
            var k = 0
            while (k < dim) { q(k) = bst(k) + 0.5 * (q(k) - bst(k)); k += 1 }
            (q, f(q))
          }
        }
      }
      it += 1
    }
    simplex.minBy(_._2)._1
  }

  final class NotEnoughData(msg: String) extends IllegalArgumentException(msg)

  /** Port of get_sarimax_forecast: history (epoch seconds, value) →
    * `numForecast` future points with mean and the three-way-max SE. */
  def sarimaxForecast(tsSec: Seq[Long], values: Seq[Double],
                      numForecast: Int = NumForecast,
                      excludeWeekends: Boolean = false,
                      tzOffsetSec: Long = 0L,
                      holidays: Set[String] = Set.empty): Forecast = {
    if (tsSec.length < MinTrainValues)
      throw new NotEnoughData("Not enough data points in history.")
    val freq = inferFrequencySeconds(tsSec)
    val (grid, y) = resampleInterpolate(tsSec, values, freq)
    if (grid.length < MinTrainValues)
      throw new NotEnoughData("Not enough data points after resampling.")
    val exog: Array[Double] =
      grid.map(t => isExcluded(t, excludeWeekends, tzOffsetSec, holidays)).toArray
    val n = y.length
    val dy = new Array[Double](n - 1)
    val dx = new Array[Double](n - 1)
    var i = 0
    while (i < n - 1) { dy(i) = y(i + 1) - y(i); dx(i) = exog(i + 1) - exog(i); i += 1 }
    val fit = fitArima111(dy, dx)

    val fTs = (1 to numForecast).map(h => grid.last + h.toLong * freq)
    val fExog = fTs.map(t => isExcluded(t, excludeWeekends, tzOffsetSec, holidays))

    // mean forecast: ẑ_{T+h} = φ ẑ_{T+h-1} (+ θ e_T at h=1); integrate.
    val lastZ = if (dy.isEmpty) 0.0 else dy(dy.length - 1) - fit.beta * dx(dx.length - 1)
    val lastE = if (fit.resid.isEmpty) 0.0 else fit.resid(fit.resid.length - 1)
    val means = new Array[Double](numForecast)
    var level = y(n - 1)
    var zh = 0.0
    var h = 1
    while (h <= numForecast) {
      zh = if (h == 1) fit.phi * lastZ + fit.theta * lastE else fit.phi * zh
      val xPrev = if (h == 1) exog(n - 1) else fExog(h - 2)
      level = level + zh + fit.beta * (fExog(h - 1) - xPrev)
      means(h - 1) = level
      h += 1
    }

    // model SE from psi-weights of the integrated ARMA(1,1)
    val modelSe = new Array[Double](numForecast)
    var cumPsiSq = 0.0
    var psiCum = 0.0 // Σ ψ_i for i>=1 up to j
    h = 0
    while (h < numForecast) {
      val bigPsi =
        if (h == 0) 1.0
        else {
          psiCum += (fit.phi + fit.theta) * math.pow(fit.phi, h - 1)
          1.0 + psiCum
        }
      cumPsiSq += bigPsi * bigPsi
      modelSe(h) = math.sqrt(fit.sigma2 * cumPsiSq)
      h += 1
    }

    // residual SE after burn-in = max(k_ar + k_diff + k_ma, 3) = 3
    val burnIn = 3
    val usable = fit.resid.drop(burnIn)
    val residSe =
      if (usable.length >= 5) {
        val m = usable.sum / usable.length
        math.sqrt(usable.map(e => (e - m) * (e - m)).sum / (usable.length - 1))
      } else 0.0
    // raw first-difference SE over the ORIGINAL (unresampled) history
    val rawDiffs = tsSec.indices.drop(1).map(i => values(i) - values(i - 1))
    val rawDiffSe =
      if (rawDiffs.length > 1) {
        val m = rawDiffs.sum / rawDiffs.length
        math.sqrt(rawDiffs.map(e => (e - m) * (e - m)).sum / (rawDiffs.length - 1))
      } else 0.0
    val floorSe = math.max(residSe, rawDiffSe)
    val se = modelSe.map(s => math.max(s, floorSe))
    Forecast(fTs, means, se)
  }

  /** Tolerance arithmetic on the FIRST forecast point — the seam the
    * reference unit tests exercise with a mocked forecast (reference:
    * tests/unit/commands/test_thresholds_prediction.py:48-116,164-175:
    * tolerances come from forecast row 0; z-scores ±2/2.5/3 by
    * sensitivity, widened via the t-quantile at the same normal
    * percentile when history < T_DISTRIBUTION_THRESHOLD points; NaN
    * mean or SE → no thresholds). */
  def thresholdFromForecast(mean0: Double, se0: Double, nPoints: Int,
                            sensitivity: String): Option[(Double, Double)] = {
    val z = zScore(sensitivity)
    def mult(zs: Double): Double =
      if (nPoints < TDistributionThreshold) tPpf(normCdf(zs), nPoints - 1)
      else zs
    val lower = mean0 - mult(z) * se0
    val upper = mean0 + mult(z) * se0
    if (lower.isNaN || upper.isNaN) None else Some((lower, upper))
  }

  /** Port of compute_sarimax_threshold: (lower, upper) tolerances of the
    * NEXT point for a sensitivity in {low, medium, high}. */
  def computeThreshold(tsSec: Seq[Long], values: Seq[Double], sensitivity: String,
                       excludeWeekends: Boolean = false,
                       holidays: Set[String] = Set.empty): Option[(Double, Double)] = {
    try {
      val fc = sarimaxForecast(tsSec, values,
        excludeWeekends = excludeWeekends, holidays = holidays)
      // NOTE: with MinTrainValues == TDistributionThreshold (both 20,
      // as in the reference), a forecast only succeeds at >= 20 points,
      // so the t-branch is reachable only if MinTrainValues is lowered —
      // the same latent dead branch exists in the reference
      // (test_thresholds_prediction.py:290-294 vs MIN_TRAIN_VALUES).
      thresholdFromForecast(fc.mean(0), fc.se(0), tsSec.length, sensitivity)
    } catch { case _: NotEnoughData => None }
  }
}
