package graft.analytics

import graft.SparkSpec
import graft.analytics.TimeSeries._

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  // --- truncation (T2) ---------------------------------------------------

  test("truncation: 5 consecutive sub-threshold years after peak") {
    // len 8: peak at idx1; below-count hits 5 at idx6 -> cut 8-1-6 = 1
    assert(truncatedNum(Seq(1, 10, 0, 0, 0, 0, 0, 3)) == 1)
    // counter resets on recovery: 2 >= 1.0 at idx4
    assert(truncatedNum(Seq(1, 10, 0, 0, 2, 0, 0, 0, 0)) == 0)
    // hits exactly at the last element -> cut 0
    assert(truncatedNum(Seq(1, 10, 0, 0, 0, 0, 0)) == 0)
    // long tail: cut everything after the 5th below year
    assert(truncatedNum(Seq(10, 0, 0, 0, 0, 0, 0, 0)) == 2)
    // never below threshold
    assert(truncatedNum(Seq(5, 6, 7)) == 0)
  }

  // --- pearson -------------------------------------------------------------

  test("pearson matches closed forms incl. NaN on zero variance") {
    assert(math.abs(pearson(Seq(1.0, 2, 3), Seq(1.0, 2, 3)) - 1.0) < 1e-12)
    assert(math.abs(pearson(Seq(1.0, 2, 3), Seq(3.0, 2, 1)) + 1.0) < 1e-12)
    assert(pearson(Seq(2.0, 2, 2), Seq(1.0, 2, 3)).isNaN)
  }

  // --- crossCorrelation gates (T3) -----------------------------------------

  test("overlap shorter than 5 years -> None") {
    // citing [2000..2003], cited [2000..2010] -> overlap 4 < 5
    assert(crossCorrelation(2000, 2003, 2000, 2010,
      Seq(5, 5, 5, 5), (0 to 10).map(_ => 5), slidingWindow = false).isEmpty)
  }

  test("mean below 2 on either side -> None") {
    val low = Seq(1, 1, 1, 1, 1)
    val high = Seq(5, 6, 7, 8, 9)
    assert(crossCorrelation(2000, 2004, 2000, 2004, low, high, slidingWindow = false).isEmpty)
    assert(crossCorrelation(2000, 2004, 2000, 2004, high, low, slidingWindow = false).isEmpty)
    val r = crossCorrelation(2000, 2004, 2000, 2004, high, high, slidingWindow = false)
    assert(r.isDefined && math.abs(r.get - 1.0) < 1e-12)
  }

  test("alignment slices by start offsets") {
    // citing starts 1998 with junk prefix; overlap [2000..2004]
    val citing = Seq(9, 9, 2, 4, 6, 8, 10) // 1998..2004
    val cited = Seq(3, 5, 7, 9, 11) // 2000..2004
    val r = crossCorrelation(1998, 2004, 2000, 2004, citing, cited, slidingWindow = false)
    assert(r.isDefined && math.abs(r.get - 1.0) < 1e-12) // both strictly linear
  }

  test("sliding window: max |corr|, later window wins ties, 0 -> None") {
    // constant windows give NaN pearson -> skipped; all-skip -> None
    assert(crossCorrelation(2000, 2005, 2000, 2005,
      Seq(3, 3, 3, 3, 3, 3), Seq(4, 4, 4, 4, 4, 4), slidingWindow = true).isEmpty)
    // a clean positive window exists
    val r = crossCorrelation(2000, 2005, 2000, 2005,
      Seq(1, 2, 3, 4, 5, 6), Seq(2, 4, 6, 8, 10, 12), slidingWindow = true)
    assert(r.isDefined && math.abs(r.get - 1.0) < 1e-12)
  }

  // --- feature gates (T6) ----------------------------------------------------

  test("feature block gates: low totals and year sanity -> all null") {
    val ok = Series(2000, 2006, 20, Array(2, 3, 4, 3, 4, 2, 2))
    val lowTotal = Series(2000, 2006, 4, Array(1, 1, 1, 1, 0, 0, 0))
    assert(features(lowTotal, ok) == EmptyFeatures)
    assert(features(ok, lowTotal) == EmptyFeatures)
    // citing_start + 3 < cited_start
    val late = Series(2010, 2016, 20, Array(2, 3, 4, 3, 4, 2, 2))
    assert(features(ok, late) == EmptyFeatures)
    // ancient years
    val ancient = Series(1900, 1906, 20, Array(2, 3, 4, 3, 4, 2, 2))
    assert(features(ancient, ok) == EmptyFeatures)
  }

  test("feature block: perfectly correlated series") {
    val a = Series(2000, 2006, 25, Array(1, 2, 3, 4, 5, 6, 4))
    val b = Series(2000, 2006, 50, Array(2, 4, 6, 8, 10, 12, 8))
    val f = features(a, b)
    assert(f.cross_correlation.exists(c => math.abs(c - 1.0) < 1e-9))
    assert(f.window_cross_correlation.exists(c => math.abs(c - 1.0) < 1e-9))
  }

  test("negative-lag features exclude lag 0 (reference range(-maxTimeLag, 0))") {
    // Identical series: lag 0 correlates perfectly (1.0), every strictly
    // negative lag correlates less. If the negative-lag loop wrongly
    // included lag 0, the feature would return 1.0.
    // aperiodic so no shifted alignment is collinear
    val counts = Array(2, 9, 3, 7, 2, 8, 4, 9, 2, 6)
    val a = Series(2000, 2009, counts.sum, counts)
    val f = features(a, a)
    assert(f.cross_correlation.exists(c => math.abs(c - 1.0) < 1e-9))
    assert(f.negativetimelagged_cross_correlation.forall(c => math.abs(c - 1.0) > 1e-6),
      s"negative-lag feature must not be the lag-0 value: ${f.negativetimelagged_cross_correlation}")
    assert(f.window_negativetimelagged_cross_correlation.forall(c => math.abs(c - 1.0) > 1e-6))
    // positive-lag loop (1..MaxTimeLag) likewise excludes lag 0
    assert(f.timelagged_cross_correlation.forall(c => math.abs(c - 1.0) > 1e-6))
  }

  // --- gap-filled series (T1, Spark) ------------------------------------------

  test("gapFilledSeries fills missing years with 0") {
    val cites = Seq((1L, 2000), (1L, 2000), (1L, 2003), (2L, 1999)).toDF("paperID", "year")
    val got = gapFilledSeries(cites).collect()
      .map(r => r.getLong(0) -> (
        r.getInt(1), r.getInt(2), r.getInt(3), r.getSeq[Int](4).toList)).toMap
    assert(got(1L) == ((2000, 2003, 3, List(2, 0, 0, 1))))
    assert(got(2L) == ((1999, 1999, 1, List(1))))
  }

  test("edgeFeatures end-to-end join + UDF") {
    val series = Seq(
      (10L, 2000, 2006, 25, Seq(1, 2, 3, 4, 5, 6, 4)),
      (20L, 2000, 2006, 50, Seq(2, 4, 6, 8, 10, 12, 8)),
      (30L, 2000, 2006, 4, Seq(1, 1, 1, 1, 0, 0, 0))
    ).toDF("paperID", "citeStartYear", "citeEndYear", "totalCitationCount", "citationCountByYear")
    val edges = Seq((10L, 20L), (10L, 30L)).toDF("citing", "cited")
    val got = edgeFeatures(edges, series).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    val good = got((10L, 20L))
    assert(math.abs(good.getAs[Double]("cross_correlation") - 1.0) < 1e-9)
    val gated = got((10L, 30L))
    assert(gated.isNullAt(gated.fieldIndex("cross_correlation")))
  }
}
