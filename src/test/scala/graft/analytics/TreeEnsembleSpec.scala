package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The nonlinear edge-model backend (predict_edge/new_data_model.py:
  * 159-161 fits an 800-tree ExtraTreesRegressor; this engine's analog is
  * the deterministic extra-trees ensemble). Acceptance mirrors
  * LogisticTrainerSpec: same CV protocol, same metrics — plus the
  * capacity separation the reference's model choice implies: on an
  * XOR-structured ground truth the trees must beat the linear backend.
  */
class TreeEnsembleSpec extends SparkSpec {

  private val F = LinkProb.ModelFeatures

  test("training is bit-deterministic across partitionings") {
    val a = TreeEnsemble.train(
      TreeEnsemble.syntheticLabeledNonlinear(spark, 4000L, parts = 8), F, "label",
      numTrees = 16, maxDepth = 3)
    val b = TreeEnsemble.train(
      TreeEnsemble.syntheticLabeledNonlinear(spark, 4000L, parts = 3), F, "label",
      numTrees = 16, maxDepth = 3)
    assert(a.trees.length == b.trees.length)
    a.trees.zip(b.trees).zipWithIndex.foreach { case ((ta, tb), t) =>
      ta.zip(tb).zipWithIndex.foreach { case ((na, nb), i) =>
        assert(na == nb, s"tree $t node $i differs: $na vs $nb")
      }
    }
  }

  test("DefaultModel is exactly the trained literal (golden, TrainTreeModel)") {
    val t = TreeEnsemble.train(
      TreeEnsemble.syntheticLabeledNonlinear(spark, 20000L), F, "label",
      numTrees = 16, maxDepth = 3)
    val m = TreeEnsemble.DefaultModel
    assert(t.trees.length == m.trees.length)
    t.trees.zip(m.trees).zipWithIndex.foreach { case ((ta, tb), i) =>
      assert(ta.sameElements(tb), s"tree $i differs from the shipped literal")
    }
  }

  test("compact wire codec round-trips a model bit-exactly") {
    val m = TreeEnsemble.DefaultModel
    val rt = TreeEnsemble.decodeModel(m.features, TreeEnsemble.encodeModel(m))
    assert(rt.features == m.features)
    assert(rt.trees.length == m.trees.length)
    rt.trees.zip(m.trees).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a.sameElements(b), s"tree $i changed across encode/decode")
    }
  }

  test("trees express the XOR interaction a linear model cannot (CV)") {
    val data = TreeEnsemble.syntheticLabeledNonlinear(spark, 8000L)
    val tree = TreeEnsemble.crossValidate(data, F, "label", "id", folds = 5, numTrees = 32)
    val logit = LogisticTrainer.crossValidate(data, F, "label", "id", folds = 5)
    info(f"tree  AUC ${tree.rocAuc}%.4f macroF1 ${tree.macroF1}%.4f")
    info(f"logit AUC ${logit.rocAuc}%.4f macroF1 ${logit.macroF1}%.4f")
    assert(tree.rocAuc > 0.80, s"tree AUC ${tree.rocAuc} below acceptance bar")
    assert(tree.rocAuc > logit.rocAuc + 0.10,
      s"trees (${tree.rocAuc}) must clearly beat logistic (${logit.rocAuc}) on the XOR task")
    assert(tree.macroF1 > logit.macroF1,
      s"tree macroF1 ${tree.macroF1} vs logistic ${logit.macroF1}")
  }

  test("on the LINEAR ground truth the trees stay competitive (sanity)") {
    val data = LogisticTrainer.syntheticLabeled(spark, 8000L)
    val m = TreeEnsemble.train(data, F, "label", numTrees = 32)
    val (f1, auc) = LogisticTrainer.scoreMetrics(
      data.withColumn("__p", TreeEnsemble.predictCol(m)), "__p", "label")
    info(f"tree in-sample AUC $auc%.4f macroF1 $f1%.4f on the linear task")
    assert(auc > 0.80, s"tree AUC $auc degenerate on the linear task")
  }

  test("scoring is a single codegen'd projection (no shuffle, no UDF)") {
    val gen = TreeEnsemble.syntheticLabeledNonlinear(spark, 1000L)
    val m = TreeEnsemble.train(gen, F, "label", numTrees = 8, maxDepth = 2)
    // score over a plain parquet scan so the plan under test is the
    // scoring projection itself, not the generator's repartition
    val dir = java.nio.file.Files.createTempDirectory("tree_score").toString
    gen.write.mode("overwrite").parquet(dir)
    val data = spark.read.parquet(dir)
    val scored = data.withColumn("proba", TreeEnsemble.predictCol(m))
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring plan shuffles:\n$plan")
    val probas = scored.select("proba").collect().map(_.getDouble(0))
    assert(probas.forall(p => p >= 0.0 && p <= 1.0))
  }
}
