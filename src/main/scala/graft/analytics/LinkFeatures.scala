package graft.analytics

import graft.textops.Embedding
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference pipeline's principal feature product: the per-edge
  * `all_features` table (create_field/extract_link_features.py:218-289) —
  * 17 features per (citingpaperID, citedpaperID, authorID) edge row:
  *
  *   6 citation-series correlations      (TimeSeries, T2-T6)
  *   year_diff                           (extract_link_features.py:253)
  *   citing/cited_paper_citationcount    (:256-257)
  *   self_cite                           (:258 — |authors∩|, null if either empty)
  *   similarity                          (:259 — cosine of 2-d doc embeddings)
  *   raw/cosine/jaccard_cocitation       (:266 — shared in-neighbor metrics)
  *   raw/cosine/jaccard_bibcoupling      (:267 — shared out-neighbor metrics)
  *
  * Missing values stay NULL here (the reference carries np.nan); the
  * scorer (LinkProb) applies the -2 imputation.
  *
  * Scale: everything is joins + aggregations on the edge key — feature
  * blocks compute per DISTINCT (citing, cited) pair and join back to the
  * (possibly author-multiplied) edge rows at the end, so an author fanout
  * never re-computes set intersections. The neighbor-set metrics reuse the
  * CommonNeighbors join plan (never collected adjacency), self-cite is an
  * inverted-index style equi join on (paperID, authorID), and the series
  * features ride the gap-filled series table (one groupBy over citation
  * events).
  */
object LinkFeatures {

  /** The reference's 17 feature columns, in its declared order
    * (extract_link_features.py:218-224).
    */
  val FeatureNames: Seq[String] = Seq(
    "cross_correlation", "negativetimelagged_cross_correlation",
    "timelagged_cross_correlation", "window_cross_correlation",
    "window_negativetimelagged_cross_correlation",
    "window_timelagged_cross_correlation",
    "year_diff", "citing_paper_citationcount", "cited_paper_citationcount",
    "self_cite", "similarity",
    "raw_cocitation", "cosine_cocitation", "jaccard_cocitation",
    "raw_bibcoupling", "cosine_bibcoupling", "jaccard_bibcoupling")

  /** Assemble the all_features table.
    *
    * @param edges        (citingpaperID, citedpaperID, authorID) — rows may
    *                     repeat a pair for several authors
    * @param papers       (paperID, year, citationCount)
    * @param paperAuthors (paperID, authorID)
    * @param embeddings   (paperID, embedding: array<double>) — M1 output
    * @param citationEvents (paperID, year) one row per citation received —
    *                     feeds the gap-filled series for the 6 correlation
    *                     features; pass an empty frame to skip (nulls)
    */
  def allFeatures(
      edges: DataFrame,
      papers: DataFrame,
      paperAuthors: DataFrame,
      embeddings: DataFrame,
      citationEvents: DataFrame
  ): DataFrame = {
    val pairs = edges.select(col("citingpaperID").as("a"), col("citedpaperID").as("b")).distinct()

    // --- neighbor-set metrics (in = cocitation, out = bibcoupling). The
    // reference's neighbor lists keep author-fanout duplicates
    // (extract_link_features.py:30-31 group the raw edges.csv rows), so
    // cosine denominators use the duplicate-bearing list lengths while
    // raw/jaccard dedup through sets — pass both edge forms down. --------
    val eMulti = edges.select(col("citingpaperID").as("src"), col("citedpaperID").as("dst"))
    val e = eMulti.distinct()
    val coc = CommonNeighbors.coCitation(e, pairs, eMulti)
      .withColumnsRenamed(Map(
        "raw" -> "raw_cocitation", "cosine" -> "cosine_cocitation", "jaccard" -> "jaccard_cocitation"))
    val bib = CommonNeighbors.bibCoupling(e, pairs, eMulti)
      .withColumnsRenamed(Map(
        "raw" -> "raw_bibcoupling", "cosine" -> "cosine_bibcoupling", "jaccard" -> "jaccard_bibcoupling"))

    // --- self-cite: |authors(citing) ∩ authors(cited)|, null if either
    // side has no author rows (reference `if citing_authors and
    // cited_authors else None`) ------------------------------------------
    val pa = paperAuthors.select(col("paperID"), col("authorID")).distinct()
    val nAuth = pa.groupBy("paperID").agg(count(lit(1)).as("n_auth"))
    val interAuth = pairs
      .join(pa.select(col("paperID").as("a"), col("authorID")), "a")
      .join(pa.select(col("paperID").as("b"), col("authorID")), Seq("b", "authorID"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_common"))
    val selfCite = pairs
      .join(nAuth.select(col("paperID").as("a"), col("n_auth").as("na")), Seq("a"), "left")
      .join(nAuth.select(col("paperID").as("b"), col("n_auth").as("nb")), Seq("b"), "left")
      .join(interAuth, Seq("a", "b"), "left")
      .select(col("a"), col("b"),
        when(col("na").isNull || col("nb").isNull, lit(null).cast("long"))
          .otherwise(coalesce(col("n_common"), lit(0L))).as("self_cite"))

    // --- per-paper scalars ----------------------------------------------
    val pSide = papers.select(col("paperID"), col("year"), col("citationCount"))
    val scalars = pairs
      .join(pSide.select(col("paperID").as("a"), col("year").as("y_a"),
        col("citationCount").as("citing_paper_citationcount")), Seq("a"), "left")
      .join(pSide.select(col("paperID").as("b"), col("year").as("y_b"),
        col("citationCount").as("cited_paper_citationcount")), Seq("b"), "left")
      .select(col("a"), col("b"),
        when(col("y_a").isNotNull && col("y_b").isNotNull && col("y_a") >= col("y_b"),
          col("y_a") - col("y_b")).otherwise(lit(null).cast("long")).as("year_diff"),
        col("citing_paper_citationcount"), col("cited_paper_citationcount"))

    // --- similarity: cosine of the two doc embeddings --------------------
    val emb = embeddings.select(col("paperID"), col("embedding"))
    val sim = pairs
      .join(emb.select(col("paperID").as("a"), col("embedding").as("e_a")), Seq("a"), "left")
      .join(emb.select(col("paperID").as("b"), col("embedding").as("e_b")), Seq("b"), "left")
      .select(col("a"), col("b"),
        when(col("e_a").isNull || col("e_b").isNull, lit(null).cast("double"))
          .otherwise(Embedding.cosine(col("e_a"), col("e_b"))).as("similarity"))

    // --- 6 correlation features off the gap-filled series ----------------
    val corr: DataFrame =
      if (citationEvents.isEmpty) {
        pairs.select(col("a"), col("b"),
          TimeSeries.featuresUdf(lit(0), lit(-1), lit(0), array().cast("array<int>"),
            lit(0), lit(-1), lit(0), array().cast("array<int>")).as("f"))
          .select(col("a"), col("b"), col("f.*"))
      } else {
        val series = TimeSeries.gapFilledSeries(citationEvents)
        TimeSeries.edgeFeatures(
          pairs.select(col("a").as("citing"), col("b").as("cited")), series)
          .withColumnRenamed("citing", "a").withColumnRenamed("cited", "b")
      }

    // --- final assembly: join blocks on the pair key, then re-attach the
    // author-multiplied edge rows ------------------------------------------
    val perPair = pairs
      .join(corr, Seq("a", "b"), "left")
      .join(scalars, Seq("a", "b"), "left")
      .join(selfCite, Seq("a", "b"), "left")
      .join(sim, Seq("a", "b"), "left")
      .join(coc, Seq("a", "b"), "left")
      .join(bib, Seq("a", "b"), "left")

    edges
      .join(perPair,
        edges("citingpaperID") === perPair("a") && edges("citedpaperID") === perPair("b"))
      .select(Seq(col("citingpaperID"), col("citedpaperID"), col("authorID")) ++
        FeatureNames.map(col): _*)
  }
}
