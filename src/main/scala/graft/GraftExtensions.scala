package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** Library entry point for SQL-only users
  * (SURVEY §4.3 — `SparkSessionExtensions` is the sanctioned injection
  * seam): registers every custom Catalyst expression as a SQL function,
  * so
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * gives `SELECT vec_dot(a, b)`, `zorder(lat, lon)`, `minhash_sig(sids)`,
  * `simhash_sig(sids, 32)` etc. with zero Scala API — the same
  * registration path any Spark-native library (Delta, Iceberg) uses.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, name, usage, "", "",
      "", "", "", "4.0.0", "", "scala_udf")

  /** Evaluate a foldable integral argument (literal, CAST of one, any
    * constant-foldable expression) at registration time; non-foldable,
    * non-integral, or null arguments each raise the matching standard
    * AnalysisException subclass so SQL users get the usual
    * DATATYPE_MISMATCH error, not a raw internal throw.
    */
  private def intArg(fn: String, e: Expression, what: String): Int = {
    def fail(sub: String, params: Map[String, String]) =
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = s"DATATYPE_MISMATCH.$sub",
        messageParameters = Map("sqlExpr" -> s"\"$fn\"") ++ params)
    def wrongType() = fail("UNEXPECTED_INPUT_TYPE", Map(
      "paramIndex" -> s"`$what`",
      "requiredType" -> "\"INT\"",
      "inputSql" -> s"\"${e.sql}\"",
      "inputType" -> s"\"${e.dataType.sql}\""))
    if (!e.foldable) fail("NON_FOLDABLE_INPUT", Map(
      "inputName" -> s"`$what`",
      "inputType" -> "\"INT\"",
      "inputExpr" -> s"\"${e.sql}\""))
    // a foldable expression can still throw at eval (ANSI cast of a bad
    // literal) — surface that as the type error, not a raw runtime throw
    val v = try e.eval() catch { case _: Exception => wrongType() }
    v match {
      case i: Int => i
      case l: Long if l.isValidInt => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case _ => wrongType()
    }
  }

  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    es => {
      if (es.length != n) throw new IllegalArgumentException(
        s"$name takes exactly $n argument(s), got ${es.length}")
      build(es)
    }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - codegen'd float-vector dot product"),
      arity("vec_dot", 2)(es => DotProductF(es(0), es(1)))))
    ext.injectFunction((FunctionIdentifier("vec_norm2"),
      info("vec_norm2", "vec_norm2(a) - squared L2 norm"),
      arity("vec_norm2", 1)(es => DotProductF(es(0), es(0)))))
    ext.injectFunction((FunctionIdentifier("zorder"),
      info("zorder", "zorder(lat, lon) - interleaved-bit geographic sort key"),
      arity("zorder", 2)(es => ZOrderExpr(es(0), es(1)))))
    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(sids) - 16-hash MinHash signature"),
      arity("minhash_sig", 1)(es => MinHashSig(es(0)))))
    ext.injectFunction((FunctionIdentifier("simhash_sig"),
      info("simhash_sig", "simhash_sig(sids, bits) - SimHash fingerprint"),
      arity("simhash_sig", 2)(es =>
        SimHashSig(es(0), intArg("simhash_sig", es(1), "bits")))))
  }
}
