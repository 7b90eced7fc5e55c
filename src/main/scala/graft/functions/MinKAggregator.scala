package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded min-k aggregator over strings — the map-side-combinable
  * selection primitive behind the KMV distinct sketch (q37).
  *
  * Keeps the k lexicographically-smallest DISTINCT values seen, as a
  * sorted array of at most k elements. `reduce` is a binary-search
  * insert that drops the current maximum once the buffer is full;
  * `merge` is a duplicate-skipping sorted merge truncated at k. Both
  * are associative and commutative, so Spark runs the aggregate with
  * partial (map-side) aggregation: every task ships at most k strings
  * per group, and NO corpus-cardinality partition ever exists — the
  * property the earlier two-stage salted-window form could only
  * approximate with a fixed salt width (a constant-factor split, not a
  * corpus-proportional one; see VERDICT r7 finding #1).
  *
  * State is k * 32 bytes for md5-hex inputs (k=32 → 1 KiB per group)
  * regardless of group size — the same bounded-sketch discipline as
  * [[MinHashAggregator]]. Selection order is plain string order, so
  * for fixed-width hex hashes the result is exactly the numeric hash
  * order both engines agree on (the q37 oracle's min-k on md5 hex).
  */
class MinKAggregator(k: Int)
    extends Aggregator[String, Array[String], Seq[String]] {
  require(k > 0, s"min-k needs k > 0, got $k")

  override def zero: Array[String] = Array.empty[String]

  override def reduce(buf: Array[String], v: String): Array[String] = {
    if (v == null) return buf
    val n = buf.length
    if (n == k && buf(n - 1) <= v) return buf
    // binary search for the insertion point; skip exact duplicates
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (buf(mid) < v) lo = mid + 1 else hi = mid
    }
    if (lo < n && buf(lo) == v) return buf
    val out = new Array[String](math.min(n + 1, k))
    System.arraycopy(buf, 0, out, 0, lo)
    out(lo) = v
    System.arraycopy(buf, lo, out, lo + 1, out.length - lo - 1)
    out
  }

  override def merge(a: Array[String], b: Array[String]): Array[String] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[String](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var o = 0
    while (o < out.length && (i < a.length || j < b.length)) {
      val takeA =
        j >= b.length || (i < a.length && a(i) <= b(j))
      val v = if (takeA) { val x = a(i); i += 1; x }
              else { val x = b(j); j += 1; x }
      if (o == 0 || out(o - 1) != v) { out(o) = v; o += 1 }
    }
    if (o == out.length) out else java.util.Arrays.copyOf(out, o)
  }

  override def finish(buf: Array[String]): Seq[String] = buf.toSeq

  override def bufferEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}
