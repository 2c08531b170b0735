package graft.functions

import graft.analytics.TreeEnsemble
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst scorer for a TreeEnsemble model: mean over trees of
  * the routed leaf probability.
  *
  * Why a custom Expression and not the nested-CASE column
  * (TreeEnsemble.predictCol): Catalyst collapses consecutive projections,
  * so a big ensemble always lands in ONE generated method no matter how
  * the caller chunks it, and past ~16 trees x depth 3 that method blows
  * Janino's 64 KB limit (round-5 ceiling: InternalCompilerException ->
  * whole-stage codegen falls back to interpreted eval for the whole
  * stage). Here `doGenCode` emits ONE SMALL PRIVATE JAVA METHOD PER TREE
  * via `CodegenContext.addNewFunction` (which also spills across nested
  * classes when the constant pool fills), so the scoring projection stays
  * fully codegen'd at any ensemble size — the 10^12-edge scoring pass is
  * a zero-shuffle, whole-stage-compiled projection with the model baked
  * in as code.
  *
  * Numeric contract (must stay bit-identical to predictCol and to the
  * generated DuckDB CASE oracle): per node `feature < threshold` goes
  * left; leaf contributes its probability; tree contributions sum LEFT TO
  * RIGHT in tree order; one final divide by numTrees. NULL inputs impute
  * to -2.0 (the reference's SimpleImputer constant,
  * compute_link_prob.py:24) — callers normally pre-impute, this is the
  * belt to that suspender.
  *
  * The model travels as its wire encoding (a String constructor arg), so
  * plan equality/canonicalization work on cheap string comparison and the
  * decoded arrays are rebuilt lazily per JVM.
  */
case class TreeEnsembleScore(children: Seq[Expression], encodedModel: String)
    extends Expression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  @transient private lazy val model: TreeEnsemble.Model =
    TreeEnsemble.decodeModel(children.indices.map(i => s"f$i"), encodedModel)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val bad = children.zipWithIndex.filter(_._1.dataType != DoubleType)
    if (bad.nonEmpty)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"tree_ensemble_score expects DOUBLE inputs, got ${bad.map(b => s"arg ${b._2}: ${b._1.dataType}").mkString(", ")}")
    else {
      val maxFeat = model.trees.iterator.flatten.map(_.feature).max
      if (maxFeat >= children.size)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"model references feature $maxFeat but only ${children.size} inputs given")
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    }
  }

  override def eval(input: InternalRow): Any = {
    val f = new Array[Double](children.size)
    var i = 0
    while (i < f.length) {
      val v = children(i).eval(input)
      f(i) = if (v == null) -2.0 else v.asInstanceOf[Double]
      i += 1
    }
    val trees = model.trees
    var acc = 0.0
    var t = 0
    while (t < trees.length) {
      val nodes = trees(t)
      var n = 1
      while (nodes(n).feature >= 0)
        n = (n << 1) + (if (f(nodes(n).feature) < nodes(n).threshold) 0 else 1)
      acc += nodes(n).prob
      t += 1
    }
    acc / trees.length.toDouble
  }

  /** Java double literal that round-trips the exact bits (Double.toString
    * is shortest-round-trip; NaN/Inf never occur in a trained model).
    */
  private def jlit(d: Double): String = s"${d}D"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = children.map(_.genCode(ctx))
    val fNames = children.indices.map(i => ctx.freshName(s"tesF$i"))
    val params = fNames.map(f => s"double $f").mkString(", ")
    val args = fNames.mkString(", ")
    // one compact private method per tree: depth<=D -> <=2^D ifs, far
    // under Janino's per-method limit; addNewFunction spreads methods
    // over nested classes when the outer class fills up
    val treeCalls = model.trees.zipWithIndex.map { case (nodes, t) =>
      def gen(i: Int): String = {
        val nd = nodes(i)
        if (nd.feature < 0) s"return ${jlit(nd.prob)};"
        else s"if (${fNames(nd.feature)} < ${jlit(nd.threshold)}) { ${gen(2 * i)} } else { ${gen(2 * i + 1)} }"
      }
      // freshName keeps two TreeEnsembleScore instances in one generated
      // class from colliding; the returned (possibly nested-class-
      // qualified) name is what we call
      val fn = ctx.freshName(s"graftTreeScore$t")
      ctx.addNewFunction(fn, s"private double $fn($params) { ${gen(1)} }")
    }
    val acc = ctx.freshName("tesAcc")
    val inputs = children.indices.map { i =>
      s"double ${fNames(i)} = ${childGen(i).isNull} ? -2.0 : ${childGen(i).value};"
    }.mkString("\n")
    val calls = treeCalls.map(fn => s"$acc += $fn($args);").mkString("\n")
    val childEval = childGen.map(_.code.toString).mkString("\n")
    ev.copy(
      isNull = FalseLiteral,
      code = code"""
        $childEval
        $inputs
        double $acc = 0.0;
        $calls
        double ${ev.value} = $acc / ${model.trees.length}.0;
      """)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)

  override def prettyName: String = "tree_ensemble_score"
}

object TreeEnsembleScore {
  /** Column API entry: score `featureCols` (already-typed DOUBLE columns;
    * nulls impute to -2.0 inside) with `model`.
    */
  def score(model: TreeEnsemble.Model, featureCols: Seq[Column]): Column =
    ColumnBridge.column(TreeEnsembleScore(
      featureCols.map(c => ColumnBridge.expression(c.cast("double"))),
      TreeEnsemble.encodeModel(model)))
}
