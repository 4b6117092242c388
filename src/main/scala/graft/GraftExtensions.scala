package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Session-extension packaging for the native expressions, so a
  * cluster user gets them in plain SQL without touching library code:
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * or `SparkSession.builder().withExtensions(new GraftExtensions)`.
  * Functions: shingles_ll, minhash_sig, sig_agree, jaccard_ll,
  * simhash64, vec_dot, vec_dist2, type_guess.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
    def info(name: String, usage: String) =
      new ExpressionInfo("graft", name, usage)
    // wrong-arity SQL must surface as an analysis-time error naming
    // the function, not an IndexOutOfBoundsException from es(1)
    def arity(name: String, n: Int, es: Seq[Expression]): Unit =
      if (es.length != n)
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> name, "expectedNum" -> n.toString,
            "actualNum" -> es.length.toString, "docroot" -> "-"))
    ext.injectFunction((FunctionIdentifier("shingles_ll"),
      info("shingles_ll", "distinct hashed word n-gram shingles"),
      (es: Seq[Expression]) => { arity("shingles_ll", 2, es)
        graft.functions.ShingleExpr(es(0), es(1)) }))
    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "64-permutation minhash signature"),
      (es: Seq[Expression]) => { arity("minhash_sig", 1, es)
        graft.functions.MinHashSigExpr(es.head) }))
    ext.injectFunction((FunctionIdentifier("sig_agree"),
      info("sig_agree", "minhash signature agreement fraction"),
      (es: Seq[Expression]) => { arity("sig_agree", 2, es)
        graft.functions.SigAgreeExpr(es(0), es(1)) }))
    ext.injectFunction((FunctionIdentifier("jaccard_ll"),
      info("jaccard_ll", "exact jaccard of two long-array sets"),
      (es: Seq[Expression]) => { arity("jaccard_ll", 2, es)
        graft.functions.JaccardSimExpr(es(0), es(1)) }))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "64-bit simhash of text"),
      (es: Seq[Expression]) => { arity("simhash64", 1, es)
        graft.functions.SimHash64Expr(es.head) }))
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "float-vector dot product (double fold)"),
      (es: Seq[Expression]) => { arity("vec_dot", 2, es)
        graft.functions.VecDotExpr(es(0), es(1)) }))
    ext.injectFunction((FunctionIdentifier("vec_dist2"),
      info("vec_dist2", "squared L2 distance of two float vectors"),
      (es: Seq[Expression]) => { arity("vec_dist2", 2, es)
        graft.functions.VecDist2Expr(es(0), es(1)) }))
    ext.injectFunction((FunctionIdentifier("type_guess"),
      info("type_guess", "per-value type guess (undatum guess_datatype)"),
      (es: Seq[Expression]) => { arity("type_guess", 1, es)
        graft.functions.TypeGuessExpr(es.head) }))
  }
}

object GraftExtensions {
  /** Imperative form for an already-built session. */
  def registerAll(spark: SparkSession): Unit = {
    graft.functions.Shingles.register(spark)
    graft.functions.MinHashSig.register(spark)
    graft.functions.SigAgree.register(spark)
    graft.functions.JaccardSim.register(spark)
    graft.functions.SimHash.register(spark)
    graft.functions.VecDot.register(spark)
    graft.functions.VecDist2.register(spark)
    graft.functions.TypeGuess.register(spark)
  }
}
