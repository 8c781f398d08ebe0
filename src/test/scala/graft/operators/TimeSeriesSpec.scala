package graft.operators

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Differential checks: the distributed series queries must agree with a
  * straightforward in-memory recomputation from the same fixture.
  */
class TimeSeriesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Dense reference series: observed counts gap-filled with zeros over
    * [min day, max day] — the queries' documented grid semantics.
    */
  private def dailyCounts(): Seq[(Long, Long)] = {
    val observed = graft.Tables
      .events(spark, TestSpark.sfDir)
      .selectExpr("cast(unix_timestamp(ts) / 86400 as long) as day")
      .groupBy("day")
      .count()
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toMap
    (observed.keys.min to observed.keys.max).map(d => (d, observed.getOrElse(d, 0L)))
  }

  test("acf: 7 lags, every coefficient in [-1, 1]") {
    val rows = SparkEntry
      .queries("q_ts_acf")(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.map(_._1).toSeq === (1L to 7L))
    rows.foreach { case (k, a) => assert(math.abs(a) <= 1.0, s"lag $k acf $a out of range") }
  }

  test("cusum: changepoint and magnitude match an in-memory recomputation") {
    val series = dailyCounts()
    val n      = series.length.toLong
    val total  = series.map(_._2).sum
    var prefix = 0L
    val scores = series.map { case (day, cnt) => prefix += cnt; (day, prefix) }
      .zipWithIndex
      .map { case ((day, pre), i) => (day, math.abs(n * pre - (i + 1).toLong * total)) }
    val (expDay, expAbsn) = scores.maxBy(s => (s._2, -s._1))
    val row = SparkEntry.queries("q_ts_cusum")(spark, TestSpark.sfDir).collect().head
    assert(row.getLong(0) === n)
    assert(row.getLong(1) === total)
    assert(row.getLong(2) === expDay, "changepoint day must match the reference argmax")
    assert(
      math.abs(row.getDouble(3) - expAbsn.toDouble / n) < 1e-3,
      s"magnitude ${row.getDouble(3)} vs ${expAbsn.toDouble / n}"
    )
  }

  test("seasonal-naive forecast: MAE matches an in-memory recomputation for every type") {
    val raw = graft.Tables
      .events(spark, TestSpark.sfDir)
      .selectExpr("event_type", "cast(unix_timestamp(ts) / 86400 as long) as day")
      .groupBy("event_type", "day")
      .count()
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val (lo, hi) = (raw.map(_._2).min, raw.map(_._2).max)
    val expected = raw.groupBy(_._1).map { case (tpe, rows) =>
      val observed = rows.map(r => r._2 -> r._3).toMap
      val cnts     = (lo to hi).map(d => observed.getOrElse(d, 0L)) // dense per-type grid
      val pairs    = cnts.drop(7).zip(cnts.dropRight(7))
      tpe -> (pairs.length.toLong, pairs.map { case (a, p) => math.abs(a - p) }.sum.toDouble / pairs.length)
    }
    val got = SparkEntry
      .queries("q_ts_forecast")(spark, TestSpark.sfDir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (tpe, (nEval, mae)) =>
      assert(got(tpe)._1 === nEval, s"$tpe n_eval")
      assert(math.abs(got(tpe)._2 - mae) < 1e-6, s"$tpe mae ${got(tpe)._2} vs $mae")
    }
  }

  test("ewma: exact dyadic smoothing matches an in-memory recomputation per type, weights sum to 1") {
    val raw = graft.Tables
      .events(spark, TestSpark.sfDir)
      .selectExpr("event_type", "cast(unix_timestamp(ts) / 86400 as long) as day")
      .groupBy("event_type", "day")
      .count()
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val (lo, hi) = (raw.map(_._2).min, raw.map(_._2).max)
    val expected = raw.groupBy(_._1).map { case (tpe, rows) =>
      val observed = rows.map(r => r._2 -> r._3).toMap
      val cnts     = (lo to hi).map(d => observed.getOrElse(d, 0L)).toIndexedSeq
      val t        = cnts.length - 1 // the latest day index (full window: t >= 15)
      val scaled = (0 to 14).map(k => cnts(t - k) * (1L << (14 - k))).sum + cnts(t - 15)
      tpe -> (hi, cnts(t), scaled.toDouble / 32768.0)
    }
    // the dyadic weights w_0..w_15 sum to exactly 1 (tail folded into w_15)
    assert((0 to 14).map(k => BigDecimal(1) / BigDecimal(1L << (k + 1))).sum +
      BigDecimal(1) / BigDecimal(1L << 15) === BigDecimal(1))
    val got = SparkEntry
      .queries("q_ts_ewma")(spark, TestSpark.sfDir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (tpe, (day, cnt, ewma)) =>
      assert(got(tpe) === ((day, cnt, ewma)), s"$tpe: ${got(tpe)} vs ($day, $cnt, $ewma)")
    }
  }

  test("holt: dyadic weights ARE the recursion (constant/linear series reproduced exactly, query matches an in-memory recursion)") {
    import graft.operators.TimeSeries._
    val den = BigInt(1) << holtExp
    // structural identities of the unrolled recursion: a constant series
    // has level = the constant and trend 0; weights therefore sum to
    // 2^E / 0 / 2^E for level / trend / forecast
    assert(holtLevelW.map(BigInt(_)).sum === den)
    assert(holtTrendW.map(BigInt(_)).sum === BigInt(0))
    assert(holtForecastW.map(BigInt(_)).sum === den)
    // Holt with b0 = x1 - x0 is EXACT on a line: level = last point,
    // trend = slope, forecast_3 = last + 3*slope — for any (a, c)
    for ((a, c) <- Seq((100L, 0L), (7L, 3L), (50L, -2L))) {
      val xs = (0 to HoltSteps).map(k => a + c * k)
      def apply(ws: Seq[Long]) = ws.zip(xs).map { case (w, x) => BigInt(w) * x }.sum
      assert(apply(holtLevelW) === BigInt(a + c * HoltSteps) * den, s"level on ($a, $c)")
      assert(apply(holtTrendW) === BigInt(c) * den, s"trend on ($a, $c)")
      assert(apply(holtForecastW) === BigInt(a + c * (HoltSteps + 3)) * den, s"forecast on ($a, $c)")
    }
    // the gate query equals the RECURSIVE computation on the fixture's
    // dense series (all values dyadic with <= E fraction bits and far
    // below 2^53, so the double recursion here is itself exact)
    val raw = graft.Tables
      .events(spark, TestSpark.sfDir)
      .selectExpr("event_type", "cast(unix_timestamp(ts) / 86400 as long) as day")
      .groupBy("event_type", "day")
      .count()
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val (lo, hi) = (raw.map(_._2).min, raw.map(_._2).max)
    val expected = raw.groupBy(_._1).map { case (tpe, rows) =>
      val observed = rows.map(r => r._2 -> r._3).toMap
      val cnts     = (lo to hi).map(d => observed.getOrElse(d, 0L).toDouble).toIndexedSeq
      val xs       = cnts.takeRight(HoltSteps + 1)
      var l        = xs(0)
      var b        = xs(1) - xs(0)
      for (t <- 1 to HoltSteps) {
        val lp = l
        l = 0.5 * xs(t) + 0.5 * (lp + b)
        b = 0.25 * (l - lp) + 0.75 * b
      }
      tpe -> (hi, cnts.last.toLong, l, b, l + 3 * b)
    }
    val got = SparkEntry
      .queries("q_ts_holt")(spark, TestSpark.sfDir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (tpe, e) => assert(got(tpe) === e, s"$tpe: ${got(tpe)} vs $e") }
  }

  test("gap histogram: buckets match an in-memory recomputation over per-user sorted arrivals") {
    val arrivals = graft.Tables
      .events(spark, TestSpark.sfDir)
      .selectExpr("user_id", "cast(unix_timestamp(ts) as long) as t")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1)
    val gaps = arrivals.values.flatMap { xs =>
      val ts = xs.map(_._2).toSeq.sorted
      ts.zip(ts.tail).map { case (a, b) => b - a }
    }.toSeq
    def bucketOf(g: Long): Long =
      if (g == 0) -1L else (63 - java.lang.Long.numberOfLeadingZeros(g)).toLong
    val expected = gaps
      .groupBy(bucketOf)
      .map { case (b, xs) => b -> ((xs.size.toLong, xs.min, xs.max)) }
    val got = SparkEntry
      .queries("q_event_gap_hist")(spark, TestSpark.sfDir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === expected, s"got $got expected $expected")
  }

  test("seasonal profile: moments match an in-memory recomputation, indexes average to ~1") {
    val series = dailyCounts()
    val expected = series
      .groupBy { case (day, _) => (day + 4) % 7 }
      .map { case (dow, xs) =>
        val n = xs.size.toLong
        val t = xs.map(_._2).sum
        val nn = series.size.toLong
        val ss = series.map(_._2).sum
        dow -> ((n, t, t.toDouble / n.toDouble, (t * nn).toDouble / (n * ss).toDouble))
      }
    val got = SparkEntry
      .queries("q_ts_seasonal")(spark, TestSpark.sfDir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got.keySet === expected.keySet, s"dow coverage: ${got.keySet}")
    expected.foreach { case (dow, e) => assert(got(dow) === e, s"dow $dow: ${got(dow)} vs $e") }
    // the day-weighted average of the seasonal indexes is exactly 1 by
    // construction: sum over dows of n_d * (t_d*N)/(n_d*S) = N
    val weighted = got.map { case (_, (n, _, _, idx)) => n * idx }.sum
    val totalDays = got.values.map(_._1).sum.toDouble
    assert(math.abs(weighted / totalDays - 1.0) < 1e-12, s"weighted index mean: $weighted / $totalDays")
  }
}
