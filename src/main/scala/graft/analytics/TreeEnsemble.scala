package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic extremely-randomized-trees ensemble — the engine analog
  * of the reference's nonlinear edge model (predict_edge/
  * new_data_model.py:159-161 fits an 800-tree ExtraTreesRegressor over
  * the link features; compute_link_prob.py scores the pickle). The
  * logistic IRLS backend (LogisticTrainer) satisfies the scorer
  * interface; THIS backend matches the reference's capacity class —
  * axis-aligned nonlinear interactions a linear model cannot express.
  *
  * Algorithm (Geurts, Ernst & Wehenkel, "Extremely randomized trees",
  * Machine Learning 63, 2006): no bootstrap — every tree sees the full
  * sample; randomness comes only from the split search, which draws K
  * candidate features and ONE uniform threshold per candidate inside the
  * feature's global [min,max], then keeps the Gini-best candidate.
  *
  * Determinism at any parallelism, by construction:
  *   - all randomness is a pure splitmix64 hash of
  *     (seed, tree, heap-node, candidate) — no RNG object, no draw order;
  *   - split statistics are LONG label counts, and integer addition is
  *     associative + commutative, so the shuffle/combine order of the
  *     per-partition accumulators cannot dither a bit (the float Gini is
  *     computed once, driver-side, from exact counts);
  *   - candidate ties break on the lowest candidate index.
  *
  * Distribution: trees are trained LEVEL-WISE, all trees at once (the
  * same breadth-first strategy as Spark MLlib's forests): one pass over
  * the cached rows per depth level accumulates the (left/right x pos/neg)
  * counts for every (tree, node, candidate) into one flat long array —
  * depth*1 jobs total, each a machine-sized aggregate (T*2^d*K*4 longs),
  * instead of a job per node. Rows are never re-shuffled; the model stays
  * driver-sized (T * 2^(depth+1) ints/doubles) and ships as literals in
  * the scoring expression, so scoring is a codegen'd projection with zero
  * shuffle, exactly like LinkProb.score.
  */
object TreeEnsemble {

  /** split(f,thr): x(f) < thr goes left; f = -1 marks a leaf. `prob` is
    * the leaf's positive fraction (sklearn predict_proba averaging).
    * Nodes are heap-indexed: root 1, children 2i, 2i+1.
    */
  final case class Node(feature: Int, threshold: Double, prob: Double)

  final case class Model(features: Seq[String], trees: Array[Array[Node]]) {
    def numTrees: Int = trees.length
  }

  // ---- seeded hash randomness (pure function of the coordinates) -------
  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }
  private def hashU01(seed: Long, a: Long, b: Long, c: Long): Double = {
    val h = splitmix64(splitmix64(splitmix64(seed ^ a) ^ b) ^ c)
    (h >>> 11).toDouble / (1L << 53).toDouble // uniform [0,1), 53-bit
  }

  /** Train `numTrees` extra-trees of depth <= `maxDepth` on `features`
    * against binary `labelCol`. K = `candidatesPerNode` random
    * (feature, threshold) draws per node; nodes with < `minNode` rows or
    * pure labels become leaves.
    */
  def train(
      df: DataFrame, features: Seq[String], labelCol: String,
      numTrees: Int = 64, maxDepth: Int = 4, candidatesPerNode: Int = 4,
      minNode: Long = 8L, seed: Long = 42L
  ): Model = {
    val nf = features.length
    val cols = features.map(f => LinkProb.imputed(col(f))) :+ col(labelCol).cast("double")
    val rows = df.select(cols: _*).rdd
      .map { r =>
        val x = new Array[Double](nf)
        var i = 0
        while (i < nf) { x(i) = r.getDouble(i); i += 1 }
        (x, r.getDouble(nf) > 0.5)
      }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // global per-feature ranges for the uniform threshold draws (min/max
    // are order-independent -> deterministic)
    val (mins, maxs) = rows.mapPartitions { it =>
      val lo = Array.fill(nf)(Double.PositiveInfinity)
      val hi = Array.fill(nf)(Double.NegativeInfinity)
      it.foreach { case (x, _) =>
        var i = 0
        while (i < nf) {
          if (x(i) < lo(i)) lo(i) = x(i)
          if (x(i) > hi(i)) hi(i) = x(i)
          i += 1
        }
      }
      Iterator.single((lo, hi))
    }.reduce { (a, b) =>
      (Array.tabulate(nf)(i => math.min(a._1(i), b._1(i))),
       Array.tabulate(nf)(i => math.max(a._2(i), b._2(i))))
    }

    val maxNodes = 1 << (maxDepth + 1) // heap arrays sized 2^(d+1), index 1-based
    // feat(t)(i) = -1 leaf, -2 dead (below a leaf); thr; prob at leaves
    val feat = Array.fill(numTrees, maxNodes)(-2)
    val thr = Array.fill(numTrees, maxNodes)(0.0)
    val prob = Array.fill(numTrees, maxNodes)(0.0)
    // root is live in every tree
    for (t <- 0 until numTrees) feat(t)(1) = -1

    def drawFeature(t: Int, node: Int, cand: Int): Int =
      (hashU01(seed, t.toLong, node.toLong, cand.toLong * 2L) * nf).toInt.min(nf - 1)
    def drawThreshold(f: Int, t: Int, node: Int, cand: Int): Double = {
      val u = hashU01(seed, t.toLong, node.toLong, cand.toLong * 2L + 1L)
      mins(f) + u * (maxs(f) - mins(f))
    }

    val sc = rows.sparkContext
    var depth = 0
    while (depth <= maxDepth) {
      val levelStart = 1 << depth
      val levelNodes = 1 << depth
      // candidate table for every live node of this level (driver-side,
      // deterministic); at maxDepth there are no candidates — the final
      // pass only computes leaf probabilities
      val isLast = depth == maxDepth
      val k = if (isLast) 0 else candidatesPerNode
      val candFeat = Array.ofDim[Int](numTrees, levelNodes, k)
      val candThr = Array.ofDim[Double](numTrees, levelNodes, k)
      for (t <- 0 until numTrees; n <- 0 until levelNodes; c <- 0 until k) {
        val f = drawFeature(t, levelStart + n, c)
        candFeat(t)(n)(c) = f
        candThr(t)(n)(c) = drawThreshold(f, t, levelStart + n, c)
      }
      val featB = sc.broadcast(feat.map(_.clone()))
      val thrB = sc.broadcast(thr.map(_.clone()))
      val candFB = sc.broadcast(candFeat)
      val candTB = sc.broadcast(candThr)

      // one pass: per (tree, level-node): [pos, neg] node totals, then per
      // candidate [leftPos, leftNeg]
      val stride = 2 + 2 * k
      val acc = rows.mapPartitions { it =>
        val a = new Array[Long](numTrees * levelNodes * stride)
        val ft = featB.value; val th = thrB.value
        val cf = candFB.value; val ct = candTB.value
        it.foreach { case (x, y) =>
          var t = 0
          while (t < numTrees) {
            // route the row down tree t to its node at this level
            var node = 1
            var d = 0
            var live = true
            while (d < depth && live) {
              val f = ft(t)(node)
              if (f >= 0) { node = (node << 1) + (if (x(f) < th(t)(node)) 0 else 1); d += 1 }
              else live = false // reached a leaf above this level
            }
            if (live && ft(t)(node) == -1) {
              val base = (t * levelNodes + (node - levelStart)) * stride
              if (y) a(base) += 1L else a(base + 1) += 1L
              var c = 0
              while (c < k) {
                if (x(cf(t)(node - levelStart)(c)) < ct(t)(node - levelStart)(c)) {
                  if (y) a(base + 2 + 2 * c) += 1L else a(base + 3 + 2 * c) += 1L
                }
                c += 1
              }
            }
            t += 1
          }
        }
        Iterator.single(a)
      }.reduce { (a, b) => var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a }
      featB.destroy(); thrB.destroy(); candFB.destroy(); candTB.destroy()

      // driver: finalize this level from exact counts
      def gini(p: Long, n: Long): Double = {
        val tot = (p + n).toDouble
        if (tot == 0.0) 0.0 else { val fp = p / tot; val fn = n / tot; 1.0 - fp * fp - fn * fn }
      }
      for (t <- 0 until numTrees; n <- 0 until levelNodes if feat(t)(levelStart + n) == -1) {
        val node = levelStart + n
        val base = (t * levelNodes + n) * stride
        val pos = acc(base); val neg = acc(base + 1)
        val tot = pos + neg
        prob(t)(node) = if (tot == 0L) 0.5 else pos.toDouble / tot.toDouble
        if (!isLast && tot >= minNode && pos > 0L && neg > 0L) {
          // Gini-best candidate, ties -> lowest index; reject empty sides
          var best = -1
          var bestScore = Double.NegativeInfinity
          var c = 0
          while (c < k) {
            val lp = acc(base + 2 + 2 * c); val ln = acc(base + 3 + 2 * c)
            val rp = pos - lp; val rn = neg - ln
            if (lp + ln > 0L && rp + rn > 0L) {
              val score = gini(pos, neg) -
                ((lp + ln).toDouble / tot.toDouble) * gini(lp, ln) -
                ((rp + rn).toDouble / tot.toDouble) * gini(rp, rn)
              if (score > bestScore + 1e-15) { bestScore = score; best = c }
            }
            c += 1
          }
          if (best >= 0 && bestScore > 0.0) {
            feat(t)(node) = candFeat(t)(n)(best)
            thr(t)(node) = candThr(t)(n)(best)
            feat(t)(node << 1) = -1 // children live for the next level
            feat(t)((node << 1) + 1) = -1
          }
        }
      }
      depth += 1
    }
    rows.unpersist(false)

    val trees = Array.tabulate(numTrees) { t =>
      Array.tabulate(maxNodes) { i =>
        if (i == 0) Node(-2, 0.0, 0.0)
        else Node(feat(t)(i), thr(t)(i), prob(t)(i))
      }
    }
    Model(features, trees)
  }

  /** Scoring column: mean over trees of the leaf probability — each tree
    * unrolls to a nested CASE WHEN on literal thresholds, so the whole
    * ensemble scores as one codegen'd projection (no UDF, no shuffle,
    * model ships as plan literals).
    */
  def predictCol(m: Model): Column = {
    val fcols = m.features.map(f => LinkProb.imputed(col(f)))
    def treeCol(nodes: Array[Node], i: Int): Column = {
      val nd = nodes(i)
      if (nd.feature < 0) lit(nd.prob)
      else when(fcols(nd.feature) < lit(nd.threshold), treeCol(nodes, 2 * i))
        .otherwise(treeCol(nodes, 2 * i + 1))
    }
    m.trees.map(t => treeCol(t, 1)).reduce(_ + _) / lit(m.numTrees.toDouble)
  }

  /** Deterministic synthetic labeled set whose ground truth is
    * NONLINEAR in the 9 features — an XOR of the self-cite flag and the
    * similarity sign plus a year-gap step — i.e. exactly the axis-aligned
    * interaction structure a tree ensemble expresses and a linear model
    * provably cannot (the XOR term has zero marginal signal per feature).
    * Same md5-uniform construction as LogisticTrainer.syntheticLabeled,
    * so the set is bit-stable across machines and parallelism. This is
    * the acceptance task that separates the two LinkProb backends the
    * way the reference's ExtraTrees separates from a linear scorer.
    */
  def syntheticLabeledNonlinear(
      spark: org.apache.spark.sql.SparkSession, n: Long, parts: Int = 8
  ): DataFrame = {
    import graft.textops.Dedup.md5Hash60
    val idc = col("id")
    def u(seedI: Int): Column =
      md5Hash60(idc.cast("string"), seedI).cast("double") / lit(1.152921504606847e18)
    val feats = Map(
      "cross_correlation" -> (u(11) * 2.0 - 1.0),
      "window_cross_correlation" -> (u(12) * 2.0 - 1.0),
      "year_diff" -> floor(u(13) * 30).cast("double"),
      "citing_paper_citationcount" -> floor(u(14) * 200).cast("double"),
      "cited_paper_citationcount" -> floor(u(15) * 500).cast("double"),
      "self_cite" -> (u(16) < 0.5).cast("double"),
      "similarity" -> (u(17) * 2.0 - 1.0),
      "jaccard_cocitation" -> (u(18) * 0.5),
      "jaccard_bibcoupling" -> (u(19) * 0.5))
    val base = spark.range(n).repartition(parts, col("id")).sortWithinPartitions("id")
      .select(Seq(idc) ++ feats.toSeq.sortBy(_._1).map { case (f, c) => c.as(f) }: _*)
    val xorTerm = (col("self_cite") === 1.0) =!= (col("similarity") > 0.0)
    val z = when(xorTerm, lit(2.5)).otherwise(lit(-2.5)) +
      when(col("year_diff") < 5.0, lit(1.2)).otherwise(lit(0.0)) - lit(0.6)
    base.withColumn("label", (lit(1.0) / (lit(1.0) + exp(-z)) > u(99)).cast("int"))
  }

  /** k-fold CV with the same fold assignment and metrics as
    * LogisticTrainer.crossValidate, so the two backends' acceptance
    * reports are directly comparable (new_data_model.py:159-275 style).
    */
  def crossValidate(
      df: DataFrame, features: Seq[String], labelCol: String, idCol: String,
      folds: Int = 10, numTrees: Int = 64, maxDepth: Int = 4, seed: Long = 42L
  ): LogisticTrainer.CvMetrics = {
    val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cached.count()
    val metrics = (0 until folds).map { j =>
      val train_ = cached.filter(pmod(col(idCol), lit(folds)) =!= j)
      val test = cached.filter(pmod(col(idCol), lit(folds)) === j)
      val m = train(train_, features, labelCol, numTrees = numTrees, maxDepth = maxDepth, seed = seed)
      LogisticTrainer.scoreMetrics(test.withColumn("__p", predictCol(m)), "__p", labelCol)
    }
    cached.unpersist(false)
    LogisticTrainer.CvMetrics(metrics.map(_._1).sum / folds, metrics.map(_._2).sum / folds, folds)
  }
}
