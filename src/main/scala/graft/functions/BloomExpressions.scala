package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd membership probe against a DRIVER-BUILT bloom filter
  * (SURVEY §4.3 preference (b) — custom Catalyst expression over a UDF):
  * the filter object ships to executors once per task binary via
  * `addReferenceObj` (no per-row closure dispatch, no boxing; the probe
  * inlines into whole-stage codegen as one virtual call on a pinned
  * reference).
  *
  * This is the broadcast probabilistic-prefilter primitive for
  * incremental pipelines: build a bloom over the HISTORICAL corpus's
  * keys (`df.stat.bloomFilter` — a distributed aggregation), probe
  * today's delta before the expensive exact join. False positives are
  * removed by the exact join that follows; false negatives cannot occur
  * (bloom guarantee), so the composed result is EXACTLY the no-bloom
  * result — only cheaper. `Dedup.incrementalOverlap` is the shipped
  * composition.
  *
  * The probe key is a LONG (pair with `xxhash64(...)`): sketch
  * BloomFilter hashes longs natively, and a fixed-width key keeps the
  * filter size independent of value width.
  */
case class BloomMightContain(filter: BloomFilter, child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires a BIGINT probe key, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    filter.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain"
}

object BloomFunctions {
  import org.apache.spark.sql.graftbridge.Bridge

  /** `might_contain(filter, key)` as a Column (key must be BIGINT —
    * typically `xxhash64(...)` of the join key).
    */
  def bloomMightContain(filter: BloomFilter, key: Column): Column =
    Bridge.column(BloomMightContain(filter, Bridge.expression(key)))
}
