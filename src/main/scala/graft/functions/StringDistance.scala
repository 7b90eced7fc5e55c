package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Banded threshold Levenshtein (Ukkonen 1985) — the verify-step
  * workhorse for the edit-distance joins (d25/d27): a join only ever
  * asks "is ed(a,b) ≤ t", so computing the full O(|a|·|b|) DP matrix
  * (what `levenshtein()` does) wastes all cells more than t off the
  * diagonal, which can never influence a ≤ t verdict. This kernel
  * walks the 2t+1-wide diagonal band in O(min(|a|,|b|)·t), abandons
  * the row the moment every band cell exceeds t, and short-circuits
  * on the length gap before touching a character.
  *
  * Returns the TRUE distance when it is ≤ t, else the sentinel t+1 —
  * so `lev_within(a, b, t) <= t` filters identically to
  * `levenshtein(a, b) <= t`, and the surviving rows carry the exact
  * distance the oracle recomputes (gate-compatible by construction).
  *
  * Character model: UTF-16 code units (java char) — identical to code
  * points on the BMP; the gated domains are ASCII. Supplementary-plane
  * text would count a surrogate pair as two edits where a code-point
  * model counts one (documented contract, matching the join domains).
  */
object LevenshteinWithinImpl {
  /** Static kernel the generated code calls directly. */
  def compute(la: UTF8String, lb: UTF8String, t: Int): Int = {
    require(t >= 0, s"threshold must be >= 0, got $t")
    val a0 = la.toString
    val b0 = lb.toString
    // iterate rows over the SHORTER string: band cells = (t*2+1)·m
    val (a, b) = if (a0.length <= b0.length) (a0, b0) else (b0, a0)
    val m = a.length
    val n = b.length
    if (n - m > t) return t + 1
    if (m == 0) return n min (t + 1)
    val inf = t + 1
    // prev(j) = edit distance between a[0,i) and b[0,j); band |j-i| <= t
    val prev = new Array[Int](n + 1)
    val cur = new Array[Int](n + 1)
    java.util.Arrays.fill(prev, inf)
    var j = 0
    while (j <= math.min(n, t)) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= m) {
      java.util.Arrays.fill(cur, inf)
      val lo = math.max(1, i - t)
      val hi = math.min(n, i + t)
      if (lo == 1) cur(0) = if (i <= t) i else inf
      var rowMin = cur(0)
      j = lo
      while (j <= hi) {
        val sub = prev(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1)
        val del = prev(j) + 1
        val ins = cur(j - 1) + 1
        var v = if (sub < del) sub else del
        if (ins < v) v = ins
        if (v > inf) v = inf
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (rowMin >= inf) return inf // whole band above t — can only grow
      System.arraycopy(cur, 0, prev, 0, n + 1)
      i += 1
    }
    if (prev(n) <= t) prev(n) else inf
  }
}

/** `lev_within(a, b, t)` — see [[LevenshteinWithinImpl]]. `t` must be
  * a non-negative integer (typically foldable; evaluated per row).
  */
case class LevenshteinWithin(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == StringType && second.dataType == StringType &&
        third.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lev_within requires (string, string, int), got " +
        s"${first.dataType} / ${second.dataType} / ${third.dataType}")

  override def nullSafeEval(a: Any, b: Any, t: Any): Any =
    LevenshteinWithinImpl.compute(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String], t.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, t) =>
      s"${ev.value} = graft.functions.LevenshteinWithinImpl.compute($a, $b, $t);")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "lev_within"
}

object StringDistance {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column API: banded threshold Levenshtein (true distance if ≤ t,
    * else t+1).
    */
  def levWithin(a: Column, b: Column, t: Int): Column = {
    require(t >= 0, s"threshold must be >= 0, got $t")
    Bridge.column(LevenshteinWithin(Bridge.expression(a),
      Bridge.expression(b),
      org.apache.spark.sql.catalyst.expressions.Literal(t)))
  }
}
