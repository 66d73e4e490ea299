package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extension registering graft's native Catalyst functions, enabled
  * with `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * (Sessions.local does this) — the documented injection point, so the
  * functions are usable from SQL text as well as the Column API. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator custom plan: per-key bounded-heap top-k
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    // optimizer rule: schema-known small dims broadcast even without stats
    ext.injectOptimizerRule(_ => graft.plans.SmallDimBroadcast)
    ext.injectFunction((
      new FunctionIdentifier("strip_accents_key"),
      new ExpressionInfo(classOf[StripAccentsKey].getName, "strip_accents_key"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        StripAccentsKey(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_hash32"),
      new ExpressionInfo(classOf[GraftHash32].getName, "graft_hash32"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftHash32(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash8"),
      new ExpressionInfo(classOf[GraftMinHash8].getName, "graft_minhash8"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftMinHash8(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingles3"),
      new ExpressionInfo(classOf[GraftShingles3].getName, "graft_shingles3"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftShingles3(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash16"),
      new ExpressionInfo(classOf[GraftSimHash16].getName, "graft_simhash16"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftSimHash16(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash48"),
      new ExpressionInfo(classOf[GraftSimHash48].getName, "graft_simhash48"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftSimHash48(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_idist2"),
      new ExpressionInfo(classOf[GraftIDist2].getName, "graft_idist2"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftIDist2(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[GraftDot].getName, "graft_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftDot(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_jaro_mk"),
      new ExpressionInfo(classOf[GraftJaroMk].getName, "graft_jaro_mk"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftJaroMk(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingles3_all"),
      new ExpressionInfo(classOf[GraftShingles3All].getName, "graft_shingles3_all"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftShingles3All(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_ngrams"),
      new ExpressionInfo(classOf[GraftNgrams].getName, "graft_ngrams"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        // the builder evaluates n at construction time, so it must be a
        // foldable non-null integer — anything else (a column, a null
        // literal) would otherwise surface as an opaque NPE/CCE here
        val nExpr = children(1)
        if (!nExpr.foldable)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "_LEGACY_ERROR_TEMP_3071",
            messageParameters = Map("msg" ->
              "graft_ngrams: n must be an integer literal (got a non-foldable expression)"))
        nExpr.eval(null) match {
          case n: Number => GraftNgrams(children.head, n.intValue())
          case _ =>
            throw new org.apache.spark.sql.AnalysisException(
              errorClass = "_LEGACY_ERROR_TEMP_3071",
              messageParameters = Map("msg" ->
                "graft_ngrams: n must be a non-null integer literal"))
        }
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_cooccur_pairs"),
      new ExpressionInfo(classOf[GraftCooccurPairs].getName, "graft_cooccur_pairs"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftCooccurPairs(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_intersect_card"),
      new ExpressionInfo(classOf[SortedIntersectCard].getName, "graft_intersect_card"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SortedIntersectCard(children(0), children(1))))
  }
}
