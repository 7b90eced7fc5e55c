package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sizing contracts for the corpus-calibrated parameters — the code
  * form of the scaladoc contracts on the LSH `planes` (d13/d14/d16,
  * s02), SemDeDup `k` (d15) and pack `shards` (p07/p08) defaults.
  *
  * Two halves:
  *
  *  1. '''Suggestion helpers''' — pure arithmetic mapping a corpus
  *     count to the parameter the contract calls for, so a caller can
  *     write `planes = Sizing.suggestPlanes(corpusCount)` instead of
  *     transcribing the rule out of COVERAGE.md.
  *  2. '''The in-plan population guard''' ([[guardKeyPopulation]]) —
  *     the t13 `raise_error` discipline applied to bucket/cell/shard
  *     population: the moment any key's population exceeds its
  *     documented bound, the QUERY fails loudly instead of silently
  *     going pair-quadratic in one task (LSH bucket join, SemDeDup
  *     cell join) or funneling the corpus through one sequential
  *     window (pack shard). A user who runs the tiny-table defaults
  *     on a real corpus now gets an error naming the parameter to
  *     grow and the helper that sizes it, not a hung stage.
  *
  * Guard shape (audit-reviewed): one map-side-combinable
  * count-per-key aggregation (output cardinality = #keys, never
  * corpus-proportional) joined back on the SAME key the downstream
  * pair join / window shuffles on — co-partitioned, no new shuffle
  * class, and crucially NO single-partition exchange (a grand-total
  * max would finalize through `Exchange SinglePartition` and widen
  * the PlanAuditSpec funnel allowlist; a per-key join does not). The
  * error branch lives in an always-true `filter`, so column pruning
  * cannot drop it and a passing corpus pays one codegen'd `when` per
  * row.
  *
  * Cost caveat (advisor round-7): the guard feeds `df` into BOTH the
  * per-key count and the probe side of the join-back, so `df`'s
  * UPSTREAM lineage (tokenize+hash, embedding bucketing) is evaluated
  * twice per action unless the caller materializes it first. The
  * shuffle itself is still reused — the 2x is compute above the
  * exchange, not a second exchange. Hot wirings therefore
  * [[graft.Caches.track]] the frame before guarding (semDedup set the
  * pattern); callers guarding their own frames should pass one that is
  * already cached when its lineage is expensive.
  */
object Sizing {

  /** Rows that may share one LSH bucket / quantizer cell before the
    * within-key candidate pair join is declared oversized. A key at
    * this population yields ~pop²/2 ≈ 5·10⁹ candidate cosines in ONE
    * join task — the outer edge of acceptable; beyond it the stage is
    * effectively hung and the parameter (planes / k) was undersized.
    * Matches the s02 sizing example (1e10 vectors at ~1e5 per bucket
    * → planes ≈ 17).
    */
  val MaxPairKeyPopulation: Long = 100000L

  /** Rows one pack shard may hold before its sequential prefix-sum
    * window (one task per shard, linear scan) is declared oversized.
    * Linear — so the bound is two orders looser than the pair-join
    * bound; past ~10⁷ rows a single-task ordered scan dominates the
    * job and `shards` was undersized.
    */
  val MaxShardRows: Long = 10000000L

  /** Smallest `planes` with expected bucket population
    * corpus/2^planes ≤ targetBucket. suggestPlanes(1e10, 1e5) = 17 —
    * the COVERAGE.md example. Never below 1 (a 0-plane LSH is one
    * global bucket).
    */
  def suggestPlanes(corpusCount: Long,
      targetBucket: Long = MaxPairKeyPopulation): Int = {
    require(corpusCount >= 0 && targetBucket > 0,
      s"corpusCount=$corpusCount targetBucket=$targetBucket")
    val buckets = ceilDiv(corpusCount, targetBucket)
    math.max(1, ceilLog2(buckets))
  }

  /** Smallest cluster count `k` with expected cell population
    * corpus/k ≤ targetCell. Default targetCell follows the SemDeDup
    * paper's operating point (k ≈ n / 10⁴).
    */
  def suggestK(corpusCount: Long, targetCell: Long = 10000L): Int = {
    require(corpusCount >= 0 && targetCell > 0,
      s"corpusCount=$corpusCount targetCell=$targetCell")
    math.max(1L, math.min(Int.MaxValue.toLong,
      ceilDiv(corpusCount, targetCell))).toInt
  }

  /** Smallest audio fingerprint frame count whose 3-band bucket space
    * keeps the EXPECTED per-(band, bucket) population
    * corpus / 2^bandWidth ≤ targetBucket — the m09 sizing rule: the
    * fingerprint carries frames−1 gradient bits split into 3 equal
    * bands, so bandWidth = ceil((frames−1)/3) and widening `frames`
    * is how the bucket space grows with the corpus (the guard in
    * `Multimodal.audioNearDup` names this helper when it fires).
    */
  def suggestFrames(corpusCount: Long,
      targetBucket: Long = MaxPairKeyPopulation): Int = {
    require(corpusCount >= 0 && targetBucket > 0,
      s"corpusCount=$corpusCount targetBucket=$targetBucket")
    val bandWidth = math.max(5, ceilLog2(ceilDiv(corpusCount, targetBucket)))
    3 * bandWidth + 1 // frames − 1 bits = 3 bands × bandWidth
  }

  /** Smallest shard count with expected per-shard population
    * corpusRows/shards ≤ rowsPerShard — pack parallelism scales with
    * the corpus, the per-shard sequential span stays bounded.
    */
  def suggestShards(corpusRows: Long,
      rowsPerShard: Long = MaxShardRows): Int = {
    require(corpusRows >= 0 && rowsPerShard > 0,
      s"corpusRows=$corpusRows rowsPerShard=$rowsPerShard")
    math.max(1L, math.min(Int.MaxValue.toLong,
      ceilDiv(corpusRows, rowsPerShard))).toInt
  }

  /** The in-plan guard: returns `df` row-for-row unchanged while any
    * key of `keyCol` whose population exceeds `maxPop` fails the query
    * with an error naming the undersized parameter (`param`) and the
    * sizing rule. `op` names the operator in the message; `keyKind`
    * names the key ("bucket", "cell", "shard") so the error reads as
    * its operator's contract.
    *
    * Plan cost: count-per-key (map-side partials → #keys rows), an
    * inner join back on `keyCol` (preserves rows exactly — every row's
    * key is in the count table), and one always-true codegen'd `when`
    * per row. The join key is the SAME key the caller shuffles on
    * next, so the exchange is reused, not added — but `df`'s upstream
    * lineage IS computed twice (count side + probe side); pass a
    * cached frame when that lineage is expensive (see object scaladoc).
    */
  def guardKeyPopulation(df: DataFrame, keyCol: String, maxPop: Long,
      op: String, keyKind: String, param: String): DataFrame =
    guardKeyPopulation(df, Seq(keyCol), maxPop, op, keyKind, param)

  /** Multi-column form: the population bound applies to the COMPOSITE
    * key (e.g. applyMixture's (source, shard) running-sum partitions);
    * the join back is on all key columns, so the exchange-reuse
    * argument holds unchanged.
    */
  def guardKeyPopulation(df: DataFrame, keyCols: Seq[String], maxPop: Long,
      op: String, keyKind: String, param: String): DataFrame = {
    require(keyCols.nonEmpty, "guardKeyPopulation needs at least one key")
    val popCol = "__" + keyKind + "_pop"
    val popKeys = keyCols.map(k => "__" + keyKind + "_key_" + k)
    // null-safe equality: groupBy counts the NULL key as a group, and a
    // plain equi-join would silently DROP every null-key row instead of
    // guarding it — <=> keeps the row-for-row contract for nullable
    // keys (current wirings compute non-null keys, but the utility's
    // contract must not depend on that)
    val pops = df.groupBy(keyCols.zip(popKeys).map {
        case (k, pk) => col(k).as(pk)
      }: _*)
      .agg(count(lit(1)).as(popCol))
    val joinCond = keyCols.zip(popKeys)
      .map { case (k, pk) => col(k) <=> col(pk) }
      .reduce(_ && _)
    val keyStr = concat_ws("/", keyCols.map(k => col(k).cast("string")): _*)
    popKeys.foldLeft(df.join(pops, joinCond))((d, pk) => d.drop(pk))
      .filter(
        when(col(popCol) > maxPop,
          raise_error(format_string(
            s"$op: $keyKind %s holds %s rows > $maxPop allowed; the " +
              s"configured `$param` is undersized for this corpus - " +
              s"grow it with the corpus (see graft.operators.Sizing." +
              sizingHelper(param) + ")",
            keyStr, col(popCol).cast("string")))
          .cast("boolean"))
        .otherwise(lit(true)))
      .drop(popCol)
  }

  private def sizingHelper(param: String): String = param match {
    case "planes" => "suggestPlanes"
    case "k"      => "suggestK"
    case "shards" => "suggestShards"
    case other    => "suggest" + other.capitalize
  }

  private def ceilDiv(n: Long, d: Long): Long = (n + d - 1) / d

  /** ceil(log2(n)) for n ≥ 1; 0 for n ≤ 1. Public: the growth half of
    * the planes rule, used directly where a caller scales an existing
    * planes value with a corpus multiplier (ProfileScaleSweep).
    */
  def ceilLog2(n: Long): Int =
    if (n <= 1L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(n - 1)
}
