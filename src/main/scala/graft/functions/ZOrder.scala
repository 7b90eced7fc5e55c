package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DecimalType, DoubleType, LongType}

/** Z-order (Morton) curve index for geographic clustering — the
  * `Sort.Geographic` order the reference planned but never shipped
  * (commented metadata keys,
  * /root/reference/src/main/java/net/mojodna/osm2orc/standalone/OsmPbf2Orc.java:92-94).
  *
  * Rows sorted by z-value cluster spatially, so bbox queries hit few
  * ORC stripes (stripe min/max on lat/lon stay tight) — the storage-side
  * complement of predicate pushdown at planet scale.
  */
object ZCurve {
  final val Bits = 21 // 21+21 = 42-bit z, ~20 m resolution at the equator

  /** spread the low 21 bits of v so they occupy even positions. */
  def spread(v0: Long): Long = {
    var v = v0 & 0x1fffffL
    v = (v | (v << 32)) & 0x1f00000000ffffL
    v = (v | (v << 16)) & 0x1f0000ff0000ffL
    v = (v | (v << 8)) & 0x100f00f00f00f00fL
    v = (v | (v << 4)) & 0x10c30c30c30c30c3L
    v = (v | (v << 2)) & 0x1249249249249249L
    v
  }

  def scale(value: Double, min: Double, max: Double): Long = {
    val unit = (value - min) / (max - min)
    val n = (unit * (1L << Bits)).toLong
    math.max(0L, math.min((1L << Bits) - 1, n))
  }

  /** 42-bit Morton code from (lat, lon) degrees; lon gets even bits. */
  def fromLatLon(lat: Double, lon: Double): Long =
    spread(scale(lon, -180.0, 180.0)) | (spread(scale(lat, -90.0, 90.0)) << 1)
}

/** zorder(lat, lon) — codegen'd native expression over decimal/double
  * coordinates; NULL coordinates (ways/relations) yield NULL, which
  * sorts first and keeps non-geometry rows grouped together.
  */
case class ZOrderExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case _: DecimalType | DoubleType => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder requires decimal/double (lat, lon), got ${left.dataType} / ${right.dataType}")
  }

  private def toDouble(v: Any): Double = v match {
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case d: Double => d
  }

  override def nullSafeEval(lat: Any, lon: Any): Any =
    ZCurve.fromLatLon(toDouble(lat), toDouble(lon))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lat, lon) => {
      def dbl(v: String, t: DataType): String = t match {
        case _: DecimalType => s"$v.toDouble()"
        case _ => v
      }
      s"${ev.value} = graft.functions.ZCurve.fromLatLon(" +
        s"${dbl(lat, left.dataType)}, ${dbl(lon, right.dataType)});"
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)

  override def prettyName: String = "zorder"
}

object ZOrderFunctions {
  import org.apache.spark.sql.graftbridge.Bridge
  def zorder(lat: Column, lon: Column): Column =
    Bridge.column(ZOrderExpr(Bridge.expression(lat), Bridge.expression(lon)))
}
