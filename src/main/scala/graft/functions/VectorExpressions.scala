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

/** Σ (a[i] − b[i])² over two integer-grid component arrays — the Lloyd
  * assign/rank inner loop (r14-opt). Bit-identical to the interpreted
  * fold `aggregate(zip_with(a, b, (x, q) -> (x - q) * (x - q)), 0L,
  * (acc, d) -> acc + d)` on equal-length arrays (left-to-right long
  * adds; long arithmetic wraps identically), but one tight primitive
  * loop instead of per-element lambda interpretation with boxing — the
  * expression runs k times per corpus row inside the per-row argmin,
  * which made the interpreted form the whole-corpus bottleneck.
  * Element nulls are not expected in grid-quantized embedding arrays
  * (same documented contract as [[DotProductF]]).
  */
case class Dist2Q(left: Expression, right: Expression)
    extends BinaryExpression {
  import org.apache.spark.sql.types.LongType

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dist2q requires two array<bigint>, got ($l, $r)")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      val d = a.getLong(i) - b.getLong(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $d = $a.getLong($i) - $b.getLong($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)

  override def prettyName: String = "dist2q"
}

object VectorFunctions {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column API: codegen'd float-vector dot product. */
  def vecDot(a: Column, b: Column): Column =
    Bridge.column(DotProductF(Bridge.expression(a), Bridge.expression(b)))

  /** Column API: codegen'd integer-grid squared L2 distance. */
  def dist2q(a: Column, b: Column): Column =
    Bridge.column(Dist2Q(Bridge.expression(a), Bridge.expression(b)))

  /** Squared L2 norm == dot(v, v) (same fold order ⇒ same doubles). */
  def vecNorm2(a: Column): Column =
    Bridge.column(DotProductF(Bridge.expression(a), Bridge.expression(a)))

  /** Register `vec_dot` for SQL use on a session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => DotProductF(exprs.head, exprs(1)), "scala_udf")
}
