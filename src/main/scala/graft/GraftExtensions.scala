package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}

import graft.functions.{MinHashSignature, SimHash64, VecDot}

/** SparkSessionExtensions entry point: registers the custom codegen'd
  * expressions as SQL functions, so `spark.sql("SELECT vec_dot(a, b)")`
  * works anywhere in the session (including thrift/connect clients).
  *
  * Enable with:
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)            // programmatic, or
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[VecDot].getName, null, name, usage, "")

  // SQL callers pass whatever numeric array the literal syntax infers
  // (array(1.0, 2.0) is array<decimal>): coerce explicitly, as the Scala
  // wrappers in SketchFunctions/VectorFunctions do.
  private def asDoubles(e: Expression): Expression = Cast(e, ArrayType(DoubleType))
  private def asLongs(e: Expression): Expression = Cast(e, ArrayType(LongType))

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two numeric-array vectors"),
      (args: Seq[Expression]) => VecDot(asDoubles(args(0)), asDoubles(args(1)))))
    ext.injectFunction((
      FunctionIdentifier("minhash_signature"),
      info("minhash_signature",
        "minhash_signature(hashes) - 128-perm MinHash signature over array<long>"),
      (args: Seq[Expression]) => MinHashSignature(asLongs(args(0)))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(hashes) - 64-bit SimHash over array<long>"),
      (args: Seq[Expression]) => SimHash64(asLongs(args(0)))))
  }
}
