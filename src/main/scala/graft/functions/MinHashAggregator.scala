package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed MinHash-signature aggregator — the one custom
  * `Aggregator[IN, BUF, OUT]` the survey's taxonomy calls for
  * (SURVEY §2C: everything else in the workload is a built-in).
  *
  * Folds shingle ids into a 16-slot signature of
  * min((a_i*sid + b_i) mod P); associative + commutative, so Spark runs
  * it with map-side partial aggregation and the buffer is a fixed
  * 16-long array regardless of group size — the sketch property that
  * makes MinHash viable at 100 TB.
  *
  * Hash constants match Dedup.MinhashSigExpr and the DuckDB oracle, so
  * `ds.groupByKey(_.docId).agg(MinHashAggregator.toColumn)` produces
  * exactly the signatures the expression form does (proven in
  * MinHashAggregatorSpec).
  */
object MinHashAggregator extends Aggregator[Long, Array[Long], Seq[Long]] {

  final val P = 2147483647L
  final val K = 16

  override def zero: Array[Long] = Array.fill(K)(P)

  override def reduce(buf: Array[Long], sid: Long): Array[Long] = {
    var i = 0
    while (i < K) {
      val h = ((4097L + 7919L * i) * sid + 17L + 104729L * i) % P
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < K) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
