package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expressions for the language-ID scoring inner loops.
  *
  * The oracle-parity forms explode every token / character bigram and
  * cross-join a 5-language lexicon — 10M+ interpreted lambda evaluations
  * at sf0.1, and a (doc × lang) shuffle. These expressions compute ALL
  * per-language scores in one map-only pass per document (no explode, no
  * cross join, no aggregation shuffle); the argmax then runs on a tiny
  * in-row array. Bit-identical to the exploded forms (spec-asserted):
  * integer arithmetic, order-insensitive sums.
  *
  * Unicode note: bigram code units are Unicode code points (what both
  * engines' `ascii(substr(...))` return for ASCII; the synthetic corpus
  * is pure ASCII — for non-ASCII corpora the exploded form's engine
  * semantics diverge anyway, so code points are the documented contract).
  */
case class TokenLangScores(child: Expression, mults: Seq[Int], mod: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_lang_scores requires array<string>, got $t")
  }

  // Null ELEMENTS are skipped (a null token contributes no score),
  // identically in eval and codegen — without the guard getUTF8String
  // NPEs on array(..., NULL) inputs from SQL users (ADVICE r2).
  override def nullSafeEval(input: Any): Any = {
    val tk = input.asInstanceOf[ArrayData]
    val acc = new Array[Long](mults.length)
    val n = tk.numElements()
    var i = 0
    while (i < n) {
      if (!tk.isNullAt(i)) {
        val len = tk.getUTF8String(i).numChars().toLong
        var j = 0
        while (j < mults.length) {
          acc(j) += (len * mults(j)) % mod
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val acc = ctx.freshName("acc")
      val m = ctx.freshName("m")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val len = ctx.freshName("len")
      val multsInit = mults.map(_.toString + "L").mkString(", ")
      s"""
         |long[] $m = new long[]{$multsInit};
         |long[] $acc = new long[${mults.length}];
         |int $n = $c.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($c.isNullAt($i)) continue;
         |  long $len = $c.getUTF8String($i).numChars();
         |  for (int $j = 0; $j < ${mults.length}; $j++) {
         |    $acc[$j] += ($len * $m[$j]) % $mod;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "token_lang_scores"
}

/** Per-language additive scores over consecutive code-point bigrams:
  * score_j = sum over pairs (a, b) of ((a*31 + b) * mult_j) mod `mod`.
  */
case class CharBigramScores(child: Expression, mults: Seq[Int], mod: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_bigram_scores requires string, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.toString
    val acc = new Array[Long](mults.length)
    var i = 0
    var prev = -1
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (prev >= 0) {
        var j = 0
        while (j < mults.length) {
          acc(j) += ((prev.toLong * 31 + cp) * mults(j)) % mod
          j += 1
        }
      }
      prev = cp
      i += Character.charCount(cp)
    }
    new GenericArrayData(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val acc = ctx.freshName("acc")
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val cp = ctx.freshName("cp")
      val prev = ctx.freshName("prev")
      val multsInit = mults.map(_.toString + "L").mkString(", ")
      s"""
         |long[] $m = new long[]{$multsInit};
         |long[] $acc = new long[${mults.length}];
         |String $s = $c.toString();
         |int $prev = -1;
         |for (int $i = 0; $i < $s.length(); ) {
         |  int $cp = $s.codePointAt($i);
         |  if ($prev >= 0) {
         |    for (int $j = 0; $j < ${mults.length}; $j++) {
         |      $acc[$j] += (((long) $prev * 31 + $cp) * $m[$j]) % $mod;
         |    }
         |  }
         |  $prev = $cp;
         |  $i += Character.charCount($cp);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "char_bigram_scores"
}

object LangIdFunctions {
  import org.apache.spark.sql.graftbridge.Bridge

  def tokenLangScores(tk: Column, mults: Seq[Int], mod: Int): Column =
    Bridge.column(TokenLangScores(Bridge.expression(tk), mults, mod))

  def charBigramScores(text: Column, mults: Seq[Int], mod: Int): Column =
    Bridge.column(CharBigramScores(Bridge.expression(text), mults, mod))
}
