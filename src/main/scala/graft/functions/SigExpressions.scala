package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expressions for the MinHash / SimHash signature inner
  * loops (SURVEY §4.3 custom-operator preference (b)).
  *
  * The oracle-parity forms express the signatures as nested
  * `aggregate(sequence(...), ...)` higher-order functions — correct, but
  * interpreted (no codegen, boxed lambda dispatch per element per hash).
  * At 100 TB the signature pass touches every shingle of every document
  * `numHashes` times; these expressions emit the identical integer
  * arithmetic as a tight primitive loop inside whole-stage codegen.
  *
  * Bit-identical contract (spec-asserted against the interpreted forms):
  *   h_i(s) = ((4097 + 7919*i) * s + 17 + 104729*i) mod (2^31 - 1)
  * with min-fold (MinHash) / parity-vote (SimHash) — both
  * order-insensitive, so loop order cannot change results.
  */
case class MinHashSig(child: Expression, numHashes: Int = 16)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<bigint>, got $t")
  }

  // Null ELEMENTS are skipped (a null shingle id contributes no hash),
  // identically in eval and codegen — without the guard getLong reads
  // garbage 0 into every signature (ADVICE r2).
  override def nullSafeEval(input: Any): Any = {
    val sids = input.asInstanceOf[ArrayData]
    val m = Array.fill(numHashes)(2147483647L)
    val n = sids.numElements()
    var k = 0
    while (k < n) {
      if (!sids.isNullAt(k)) {
        val s = sids.getLong(k)
        var i = 0
        while (i < numHashes) {
          val h = ((4097L + 7919L * i) * s + 17L + 104729L * i) % 2147483647L
          if (h < m(i)) m(i) = h
          i += 1
        }
      }
      k += 1
    }
    new GenericArrayData(m)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val m = ctx.freshName("m")
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      s"""
         |long[] $m = new long[$numHashes];
         |java.util.Arrays.fill($m, 2147483647L);
         |int $n = $c.numElements();
         |for (int $k = 0; $k < $n; $k++) {
         |  if ($c.isNullAt($k)) continue;
         |  long $s = $c.getLong($k);
         |  for (int $i = 0; $i < $numHashes; $i++) {
         |    long $h = ((4097L + 7919L * $i) * $s + 17L + 104729L * $i) % 2147483647L;
         |    if ($h < $m[$i]) $m[$i] = $h;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($m);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

/** SimHash fingerprint over a shingle-id list: bit j of the result is
  * the sign of the per-bit +/-1 parity votes of h_j(s) over all sids.
  */
case class SimHashSig(child: Expression, bits: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_sig requires array<bigint>, got $t")
  }

  // Null elements skipped — same contract as MinHashSig.
  override def nullSafeEval(input: Any): Any = {
    val sids = input.asInstanceOf[ArrayData]
    val votes = new Array[Long](bits)
    val n = sids.numElements()
    var k = 0
    while (k < n) {
      if (!sids.isNullAt(k)) {
        val s = sids.getLong(k)
        var j = 0
        while (j < bits) {
          val h = ((4097L + 7919L * j) * s + 17L + 104729L * j) % 2147483647L
          votes(j) += (if (h % 2 == 1) 1L else -1L)
          j += 1
        }
      }
      k += 1
    }
    var acc = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) acc += (1L << j)
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val v = ctx.freshName("votes")
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val acc = ctx.freshName("acc")
      s"""
         |long[] $v = new long[$bits];
         |int $n = $c.numElements();
         |for (int $k = 0; $k < $n; $k++) {
         |  if ($c.isNullAt($k)) continue;
         |  long $s = $c.getLong($k);
         |  for (int $j = 0; $j < $bits; $j++) {
         |    long $h = ((4097L + 7919L * $j) * $s + 17L + 104729L * $j) % 2147483647L;
         |    $v[$j] += ($h % 2 == 1) ? 1L : -1L;
         |  }
         |}
         |long $acc = 0L;
         |for (int $j = 0; $j < $bits; $j++) {
         |  if ($v[$j] > 0) $acc += (1L << $j);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "simhash_sig"
}

object SigFunctions {
  import org.apache.spark.sql.graftbridge.Bridge

  /** 16-hash MinHash signature (codegen'd; bit-identical to the
    * interpreted `aggregate(sequence(0,15), ...)` oracle form).
    */
  def minhashSig(sids: Column): Column =
    Bridge.column(MinHashSig(Bridge.expression(sids)))

  /** `bits`-wide SimHash fingerprint (codegen'd; bit-identical to the
    * interpreted oracle form).
    */
  def simhashSig(sids: Column, bits: Int): Column =
    Bridge.column(SimHashSig(Bridge.expression(sids), bits))
}
