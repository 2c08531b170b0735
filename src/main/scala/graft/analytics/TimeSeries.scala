package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Citation time-series operators (reference T1–T6).
  *
  * The per-edge correlation block (T2–T5) is a deterministic pure function
  * of the two papers' gap-filled yearly arrays — implemented as plain
  * Scala (exact semantics below), applied per edge via a UDF over array
  * columns. Arrays are ≤ ~100 elements, so the O(Y²)/O(Y·W) scans are
  * trivially cheap per row; the heavy lifting (series build, joins) is
  * pure DataFrame.
  *
  * Exact reference edge-case semantics preserved (SURVEY.md §7.6):
  *  - tail truncation counter resets when a year climbs back over the
  *    threshold (extract_link_features.py:56-74);
  *  - sliding-window max-|corr| ties: `>=` so the LATER window wins
  *    (:118-120); a final 0.0 becomes null (`max_correlation or None`,
  *    :121);
  *  - non-window Pearson may be NaN (zero variance), which the reference
  *    propagates as NaN — distinct from null (gate failure);
  *  - time-lag loop skips exact-0.0 and NaN correlations (Python
  *    truthiness + NaN comparison, :172-175);
  *  - feature gates: both totals ≥ 5; `citing_start + 3 < cited_start` or
  *    either start ≤ 1900 → all features null (:125-136).
  */
object TimeSeries {

  val MinYearSpan = 5
  val MinCitationPercent = 0.1
  val MaxMinCitationYear = 5
  val MinAvgCitationPerYear = 2.0
  val MinTotalCitation = 5
  val WindowSize = 5
  val MaxTimeLag = 5

  /** A paper's gap-filled citation series: counts(i) = citations in year
    * start + i; continuous [start..end].
    */
  final case class Series(start: Int, end: Int, total: Int, counts: Array[Int])

  // ------------------------------------------------------------------
  // Pure-Scala core (exact reference semantics, not reference code)
  // ------------------------------------------------------------------

  /** Number of TRAILING years to cut: scan from the (first) peak; count
    * consecutive years below 10%·max (counter resets on recovery); once 5
    * consecutive are seen at index i, cut everything after i
    * (extract_link_features.py:56-74).
    */
  def truncatedNum(counts: Seq[Int]): Int = {
    if (counts.isEmpty) return 0
    val mx = counts.max
    val thr = mx * MinCitationPercent
    val peak = counts.indexOf(mx)
    var below = 0
    var i = peak
    while (i < counts.length) {
      if (counts(i) < thr) below += 1 else below = 0
      if (below >= MaxMinCitationYear) return counts.length - 1 - i
      i += 1
    }
    0
  }

  /** Pearson correlation matching numpy.corrcoef: NaN when either side
    * has zero variance.
    */
  def pearson(a: Seq[Double], b: Seq[Double]): Double = {
    val n = a.length
    val ma = a.sum / n
    val mb = b.sum / n
    var cov = 0.0; var va = 0.0; var vb = 0.0
    var i = 0
    while (i < n) {
      val da = a(i) - ma; val db = b(i) - mb
      cov += da * db; va += da * da; vb += db * db
      i += 1
    }
    cov / math.sqrt(va * vb) // 0/0 or x/0 -> NaN/Inf like numpy
  }

  /** Overlap-aligned correlation (extract_link_features.py:85-121).
    * Returns None when gated out; Some(NaN) possible in non-window mode.
    */
  def crossCorrelation(
      citingStart: Int, citingEnd: Int,
      citedStart: Int, citedEnd: Int,
      citingCounts: Seq[Int], citedCounts: Seq[Int],
      slidingWindow: Boolean
  ): Option[Double] = {
    val start = math.max(citingStart, citedStart)
    val end = math.min(citingEnd, citedEnd)
    val len = end - start + 1
    if (len < MinYearSpan) return None

    val s1 = citingCounts.slice(start - citingStart, start - citingStart + len).map(_.toDouble)
    val s2 = citedCounts.slice(start - citedStart, start - citedStart + len).map(_.toDouble)
    if (s1.length != len || s2.length != len) return None // out-of-range slice ≈ reference IndexError path

    if (!slidingWindow) {
      if (s1.sum / len < MinAvgCitationPerYear || s2.sum / len < MinAvgCitationPerYear) return None
      Some(pearson(s1, s2))
    } else {
      var maxCorr = 0.0
      var off = 0
      while (off <= len - WindowSize) {
        val w1 = s1.slice(off, off + WindowSize)
        val w2 = s2.slice(off, off + WindowSize)
        if (w1.sum / WindowSize >= MinAvgCitationPerYear && w2.sum / WindowSize >= MinAvgCitationPerYear) {
          val c = pearson(w1, w2)
          // NaN fails the >= comparison, so NaN windows are skipped.
          if (math.abs(c) >= math.abs(maxCorr)) maxCorr = c
        }
        off += 1
      }
      if (maxCorr == 0.0) None else Some(maxCorr) // `max_correlation or None`
    }
  }

  final case class CorrelationFeatures(
      cross_correlation: Option[Double],
      window_cross_correlation: Option[Double],
      negativetimelagged_cross_correlation: Option[Double],
      timelagged_cross_correlation: Option[Double],
      window_negativetimelagged_cross_correlation: Option[Double],
      window_timelagged_cross_correlation: Option[Double]
  )

  val EmptyFeatures: CorrelationFeatures =
    CorrelationFeatures(None, None, None, None, None, None)

  /** Full per-edge feature block (extract_link_features.py:124-180). */
  def features(citing: Series, cited: Series): CorrelationFeatures = {
    if (citing.total < MinTotalCitation || cited.total < MinTotalCitation) return EmptyFeatures
    if (citing.start + 3 < cited.start || citing.start <= 1900 || cited.start <= 1900) return EmptyFeatures

    var (cgStart, cgEnd, cgCounts) = (citing.start, citing.end, citing.counts.toSeq)
    var (cdStart, cdEnd, cdCounts) = (cited.start, cited.end, cited.counts.toSeq)
    val cgTrunc = truncatedNum(cgCounts)
    val cdTrunc = truncatedNum(cdCounts)
    if (cgTrunc > 0) { cgEnd -= cgTrunc; cgCounts = cgCounts.dropRight(cgTrunc) }
    if (cdTrunc > 0) { cdEnd -= cdTrunc; cdCounts = cdCounts.dropRight(cdTrunc) }

    def lagged(lo: Int, hi: Int, sliding: Boolean): Option[Double] = {
      var maxCorr = 0.0
      var lag = lo
      while (lag <= hi) {
        crossCorrelation(cgStart + lag, cgEnd + lag, cdStart, cdEnd, cgCounts, cdCounts, sliding) match {
          case Some(c) if c != 0.0 && math.abs(c) >= math.abs(maxCorr) => maxCorr = c
          case _ => ()
        }
        lag += 1
      }
      if (maxCorr == 0.0) None else Some(maxCorr)
    }

    CorrelationFeatures(
      cross_correlation = crossCorrelation(cgStart, cgEnd, cdStart, cdEnd, cgCounts, cdCounts, slidingWindow = false),
      window_cross_correlation = crossCorrelation(cgStart, cgEnd, cdStart, cdEnd, cgCounts, cdCounts, slidingWindow = true),
      // Strictly negative lags: the reference iterates range(-maxTimeLag, 0)
      // (extract_link_features.py:167), which EXCLUDES lag 0 — so the
      // upper bound here is -1, not 0.
      negativetimelagged_cross_correlation = lagged(-MaxTimeLag, -1, sliding = false),
      timelagged_cross_correlation = lagged(1, MaxTimeLag, sliding = false),
      window_negativetimelagged_cross_correlation = lagged(-MaxTimeLag, -1, sliding = true),
      window_timelagged_cross_correlation = lagged(1, MaxTimeLag, sliding = true)
    )
  }

  // ------------------------------------------------------------------
  // Spark assembly
  // ------------------------------------------------------------------

  /** T1: gap-filled yearly citation series (create_field/graph.py:131-149).
    * Input: one row per citation event (paperID, year of the citing
    * paper). Output per paper: continuous [min..max] year array, 0-filled.
    * Pure DataFrame: histogram groupBy, then `transform(sequence(...))`
    * over a year→count map column — no explode of the year spine needed.
    */
  def gapFilledSeries(citations: DataFrame, paperCol: String = "paperID", yearCol: String = "year"): DataFrame = {
    citations
      .groupBy(col(paperCol), col(yearCol).cast("int").as("__y"))
      .agg(count(lit(1)).cast("int").as("__c"))
      .groupBy(col(paperCol))
      .agg(
        min(col("__y")).as("citeStartYear"),
        max(col("__y")).as("citeEndYear"),
        map_from_entries(collect_list(struct(col("__y"), col("__c")))).as("__m")
      )
      .select(
        col(paperCol),
        col("citeStartYear"),
        col("citeEndYear"),
        aggregate(map_values(col("__m")), lit(0), (acc, x) => acc + x).as("totalCitationCount"),
        transform(
          sequence(col("citeStartYear"), col("citeEndYear")),
          y => coalesce(element_at(col("__m"), y), lit(0))
        ).as("citationCountByYear")
      )
  }

  /** UDF wrapper for the T2–T5 block; NaN-valued Some stays NaN in the
    * output column, None becomes null.
    */
  val featuresUdf: UserDefinedFunction = udf {
    (cgStart: Int, cgEnd: Int, cgTotal: Int, cgCounts: Seq[Int],
     cdStart: Int, cdEnd: Int, cdTotal: Int, cdCounts: Seq[Int]) =>
      features(
        Series(cgStart, cgEnd, cgTotal, cgCounts.toArray),
        Series(cdStart, cdEnd, cdTotal, cdCounts.toArray)
      )
  }

  /** T6: per-edge feature assembly. `edges(citing, cited)` joined twice
    * against the series table, then the pure function per row.
    */
  def edgeFeatures(edges: DataFrame, series: DataFrame): DataFrame = {
    def side(prefix: String) = series.select(
      col("paperID").as(s"${prefix}_pid"),
      col("citeStartYear").as(s"${prefix}_start"),
      col("citeEndYear").as(s"${prefix}_end"),
      col("totalCitationCount").as(s"${prefix}_total"),
      col("citationCountByYear").as(s"${prefix}_counts")
    )
    edges
      .join(side("cg"), edges("citing") === col("cg_pid"), "inner")
      .join(side("cd"), edges("cited") === col("cd_pid"), "inner")
      .withColumn(
        "f",
        featuresUdf(
          col("cg_start"), col("cg_end"), col("cg_total"), col("cg_counts"),
          col("cd_start"), col("cd_end"), col("cd_total"), col("cd_counts")
        )
      )
      .select(col("citing"), col("cited"), col("f.*"))
  }
}
