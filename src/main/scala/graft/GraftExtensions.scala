package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, HashedShinglesExpr, JaccardSimilarity, LshBandKeysExpr, MinHash60Expr, MinMd5Shingle60Expr}

/** Engine extension point (the public `SparkSessionExtensions` API):
  * registers the native expressions so SQL and `call_function` can reach
  * them. Installed by [[GraftSession]] via `spark.sql.extensions`; any
  * session built elsewhere simply falls back to the composable built-in
  * implementations (see SimilarityQueries' guard). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, null, "cosine_sim"),
      (children: Seq[Expression]) => CosineSimilarity(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("jaccard_sim"),
      new ExpressionInfo(classOf[JaccardSimilarity].getName, null, "jaccard_sim"),
      (children: Seq[Expression]) => JaccardSimilarity(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("min_hash60"),
      new ExpressionInfo(classOf[MinHash60Expr].getName, null, "min_hash60"),
      (children: Seq[Expression]) => MinHash60Expr(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("min_md5_shingle60"),
      new ExpressionInfo(classOf[MinMd5Shingle60Expr].getName, null, "min_md5_shingle60"),
      (children: Seq[Expression]) => MinMd5Shingle60Expr(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("hashed_shingles"),
      new ExpressionInfo(classOf[HashedShinglesExpr].getName, null, "hashed_shingles"),
      (children: Seq[Expression]) => HashedShinglesExpr(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("lsh_band_keys"),
      new ExpressionInfo(classOf[LshBandKeysExpr].getName, null, "lsh_band_keys"),
      (children: Seq[Expression]) => LshBandKeysExpr(
        children.head,
        children(1).eval().asInstanceOf[Int],
        children(2).eval().asInstanceOf[Int])))
  }
}
