package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for embedding math (SURVEY §2B-extensions,
  * custom-operator preference order (b): a codegen'd `Expression` beats
  * a Scala UDF beats interpreted higher-order folds).
  *
  * Spark's `aggregate`/`zip_with` lambdas are interpreted — fine for the
  * oracle-parity forms, but on a 100 TB ANN sweep the dot product is the
  * inner loop. This expression emits a tight primitive `for` loop inside
  * whole-stage codegen. Semantics are bit-identical to the fold:
  * left-to-right double accumulation of float products (so results stay
  * oracle-reproducible).
  *
  * Element nulls are not expected in embedding vectors; a null element
  * contributes getFloat's default and is NOT null-propagated (documented
  * contract — validate upstream if your corpus can carry null elements).
  */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires two array<float> arguments, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

object VectorFunctions {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column API: codegen'd float-vector dot product. */
  def vecDot(a: Column, b: Column): Column =
    Bridge.column(DotProductF(Bridge.expression(a), Bridge.expression(b)))

  /** Squared L2 norm == dot(v, v) (same fold order ⇒ same doubles). */
  def vecNorm2(a: Column): Column =
    Bridge.column(DotProductF(Bridge.expression(a), Bridge.expression(a)))

  /** Register `vec_dot` for SQL use on a session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => DotProductF(exprs.head, exprs(1)), "scala_udf")
}
