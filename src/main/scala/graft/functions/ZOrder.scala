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

/** Hilbert curve index — the OTHER space-filling clustering key (the
  * one Delta's OPTIMIZE ZORDER literature keeps apologizing for not
  * being): unlike Morton, consecutive Hilbert positions are ALWAYS
  * grid-adjacent (no quadrant-boundary teleports), so range scans over
  * Hilbert-sorted storage touch strictly fewer stripes for the same
  * bbox. 16+16 bits → a 32-bit curve position (~600 m cells at the
  * equator — a stripe-clustering key, not a point id).
  *
  * The classic quadrant-rotation walk (Hilbert 1891; the standard
  * xy2d formulation): at each scale bit, pick the quadrant, accumulate
  * its sub-square count, and rotate/reflect the frame so the curve
  * enters the next level in canonical orientation. All integer; the
  * DuckDB oracle replays the identical 16 rounds as generated CASE
  * arithmetic, so one wrong rotation hash-mismatches.
  */
object HilbertCurve {
  final val Bits = 16
  private final val N = 1L << Bits

  def scale(value: Double, min: Double, max: Double): Long = {
    val unit = (value - min) / (max - min)
    val v = (unit * N).toLong
    math.max(0L, math.min(N - 1, v))
  }

  /** Curve position of a grid cell — the standard rotate-and-descend
    * loop; d accumulates s² sub-squares per level.
    */
  def xy2d(x0: Long, y0: Long): Long = {
    var x = x0; var y = y0; var d = 0L
    var s = N >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = N - 1 - x; y = N - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse walk (curve position → grid cell) — the range-planning
    * direction; also what lets the spec prove the adjacency law.
    */
  def d2xy(d0: Long): (Long, Long) = {
    var x = 0L; var y = 0L; var t = d0
    var s = 1L
    while (s < N) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }

  def fromLatLon(lat: Double, lon: Double): Long =
    xy2d(scale(lon, -180.0, 180.0), scale(lat, -90.0, 90.0))
}

/** hilbert(lat, lon) — codegen'd sibling of [[ZOrderExpr]]; NULL
  * coordinates yield NULL (ways/relations group together, as in
  * zorder).
  */
case class HilbertExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case _: DecimalType | DoubleType => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert requires decimal/double (lat, lon), got ${left.dataType} / ${right.dataType}")
  }

  private def toDouble(v: Any): Double = v match {
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case d: Double => d
  }

  override def nullSafeEval(lat: Any, lon: Any): Any =
    HilbertCurve.fromLatLon(toDouble(lat), toDouble(lon))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lat, lon) => {
      def dbl(v: String, t: DataType): String = t match {
        case _: DecimalType => s"$v.toDouble()"
        case _ => v
      }
      s"${ev.value} = graft.functions.HilbertCurve.fromLatLon(" +
        s"${dbl(lat, left.dataType)}, ${dbl(lon, right.dataType)});"
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)

  override def prettyName: String = "hilbert"
}

object HilbertFunctions {
  import org.apache.spark.sql.graftbridge.Bridge
  def hilbert(lat: Column, lon: Column): Column =
    Bridge.column(HilbertExpr(Bridge.expression(lat), Bridge.expression(lon)))
}
