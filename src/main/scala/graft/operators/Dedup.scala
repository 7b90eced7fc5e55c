package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Text

/** Training-data deduplication operators (extensions beyond the
  * reference — SURVEY.md §2B extensions; MinHash/SimHash per the
  * public LSH literature referenced in PAPERS.md).
  *
  * Two families:
  *  - oracle-parity forms: shingle ids come from a `dense_rank` over the
  *    sorted distinct-shingle dictionary so the DuckDB oracle can compute
  *    bit-identical signatures in pure SQL;
  *  - scale forms (`*Hashed`): shingle ids come from `xxhash64`, which
  *    needs no global sort / dictionary join — that is the 100 TB path
  *    (one shuffle for the signature group-by, one for the band
  *    self-join; both key-partitioned, no driver involvement).
  */
object Dedup {

  val Prime = 2147483647L // 2^31 - 1
  val NumHashes = 16
  val BandRows = 4 // 4 bands x 4 rows

  /** Exact dedup: content-hash group-by — one shuffle on md5(text),
    * map-side partial aggregation; at 100 TB this is the cheapest
    * possible exact pass (hash is 16 bytes vs arbitrary text length).
    */
  def exact(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .groupBy(md5($"text".cast("binary")).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min($"doc_id").as("keep_id"))
      .orderBy($"keep_id")
  }

  /** doc_id -> distinct 3-shingles, optionally on a deterministic
    * doc_id-mod sample (keeps the all-pairs oracle tractable; the
    * LSH path itself scales to the full corpus).
    */
  private[operators] def shingleSet(spark: SparkSession, sfDir: String,
      sampleMod: Option[Int]): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val sampled = sampleMod.fold(docs)(m => docs.filter($"doc_id" % m === 0))
    sampled
      .select($"doc_id", explode(Text.shingles(Text.toks($"text"))).as("sh"))
      .distinct()
  }

  /** The 16 affine hash functions h_i(x) = (a_i*x + b_i) mod P, as a
    * broadcastable 16-row frame (i, a, b).
    */
  private[operators] def hashParams(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.range(NumHashes).select(
      $"id".cast("int").as("i"),
      (lit(4097L) + lit(7919L) * $"id").as("a"),
      (lit(17L) + lit(104729L) * $"id").as("b"))
  }

  /** Oracle-parity shingle ids: dense_rank over the sorted distinct
    * shingle dictionary. The unpartitioned window is single-threaded by
    * construction — acceptable only because the dictionary is the
    * *distinct* shingle set; the scale path replaces this with xxhash64
    * (see minHashLshHashed).
    */
  private[operators] def shingleDict(sh: DataFrame): DataFrame = {
    import sh.sparkSession.implicits._
    sh.select($"sh").distinct()
      .withColumn("sid", dense_rank().over(Window.orderBy($"sh")).cast("bigint"))
  }

  /** N-gram Jaccard all-pairs on a doc_id%10 sample: distinct-shingle
    * self-join counts the intersection, |A|+|B|-|A∩B| the union.
    * Exact, quadratic in shared shingles — the ground truth that the
    * MinHash estimate approximates.
    */
  def ngramJaccard(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val sh = shingleSet(spark, sfDir, Some(10)).cache()
    val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val inter = sh.as("x").join(sh.as("y"),
        $"x.sh" === $"y.sh" && $"x.doc_id" < $"y.doc_id")
      .groupBy($"x.doc_id".as("a"), $"y.doc_id".as("b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("sa"), $"a" === $"sa.doc_id")
      .join(sizes.as("sb"), $"b" === $"sb.doc_id")
      .select($"a", $"b",
        round($"inter" / ($"sa.n" + $"sb.n" - $"inter"), 6).as("jaccard"))
      .filter($"jaccard" >= 0.5)
      .orderBy($"a", $"b")
  }

  /** MinHash + LSH banding (oracle-parity form): shingle -> 16 minhashes
    * -> 4 bands of 4 -> candidate pairs sharing any band signature.
    */
  def minHashLsh(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val sh = shingleSet(spark, sfDir, Some(10)).cache()
    val withIds = sh.join(shingleDict(sh), "sh")
    bandPairs(spark, withIds)
  }

  /** MinHash + LSH, scale form: ids via xxhash64 (no dictionary, no
    * global sort; fully shuffle-parallel). Not SQL-oracle-expressible —
    * declared without an oracle (rows-only check) by design.
    */
  def minHashLshHashed(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val sh = shingleSet(spark, sfDir, Some(10))
    val withIds = sh.withColumn("sid", abs(xxhash64($"sh")) % lit(Prime))
    bandPairs(spark, withIds)
  }

  /** shared tail: (doc_id, sid) -> minhash signatures -> band signatures
    * -> distinct candidate pairs (a < b).
    */
  private def bandPairs(spark: SparkSession, withIds: DataFrame): DataFrame = {
    import spark.implicits._
    val mh = withIds.crossJoin(broadcast(hashParams(spark)))
      .groupBy($"doc_id", $"i")
      .agg(min(($"a" * $"sid" + $"b") % lit(Prime)).as("mh"))
    val bands = mh
      .withColumn("band", ($"i" / BandRows).cast("int"))
      .groupBy($"doc_id", $"band")
      .agg(array_join(
        transform(array_sort(collect_list(struct($"i", $"mh"))),
          x => x.getField("mh").cast("string")), "-").as("sig"))
    bands.as("x").join(bands.as("y"),
        $"x.band" === $"y.band" && $"x.sig" === $"y.sig" &&
          $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("a"), $"y.doc_id".as("b"))
      .distinct()
      .orderBy($"a", $"b")
  }

  /** 16-bit SimHash per document over 3-shingles: bit j of h(sid) votes
    * +/-1; the sign of the per-bit sum is the fingerprint bit. One row
    * per doc — linear, no pairing; pair candidates by hamming distance
    * (bit_count(xor)) downstream.
    */
  def simHash(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val sh = shingleSet(spark, sfDir, None).cache()
    val withIds = sh.join(shingleDict(sh), "sh")
    val votes = withIds.crossJoin(broadcast(hashParams(spark)))
      .groupBy($"doc_id", $"i")
      .agg(sum(when((($"a" * $"sid" + $"b") % lit(Prime)) % 2 === 1, 1L)
        .otherwise(-1L)).as("v"))
    votes.groupBy($"doc_id")
      .agg(sum(when($"v" > 0, expr("shiftleft(CAST(1 AS BIGINT), i)"))
        .otherwise(0L)).as("simhash"))
      .orderBy($"doc_id")
  }

  /** Embedding-cosine near-duplicate pairs on a vec_id%50 sample:
    * norms are precomputed per vector (cheap, narrow) before the
    * quadratic pair join; cosine folds left-to-right in doubles so the
    * oracle reproduces it bit-for-bit pre-rounding.
    */
  def embeddingNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val v = Tables.embeddings(spark, sfDir)
      .filter($"vec_id" % 50 === 0)
      .select($"vec_id", $"embedding", Similarity.norm2($"embedding").as("nrm"))
    v.as("x").join(v.as("y"), $"x.vec_id" < $"y.vec_id")
      .select($"x.vec_id".as("a"), $"y.vec_id".as("b"),
        round(Similarity.dot($"x.embedding", $"y.embedding") /
          sqrt($"x.nrm" * $"y.nrm"), 6).as("cos"))
      .filter($"cos" >= 0.2)
      .orderBy($"a", $"b")
  }
}
