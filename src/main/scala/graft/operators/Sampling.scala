package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Text

/** Corpus sampling / data-mixing operators for a training-data pipeline
  * (SURVEY §2B-extensions family): the selection primitives that sit
  * between dedup and tokenization in a real 100 TB run.
  *
  * All selection keys are CONTENT hashes, not `rand()`: the sample is
  * deterministic, reproducible across engines (oracle-gated), and stable
  * under re-partitioning/re-sharding — re-running the pipeline after
  * adding files keeps previously-selected documents selected.
  */
object Sampling {

  /** First 4 hex chars of md5(text) as an integer in [0, 65536) — the
    * shared deterministic selection key (cheap: one md5 per doc, already
    * computed by exact-dedup in a combined pipeline).
    */
  /** 16-bit content-hash bucket — shared with the streaming budget
    * admission (graft.streaming.EventStream.tokenBudgetStream), which
    * must shard EXACTLY like the batch packers.
    */
  private[graft] def hashBucket(textCol: org.apache.spark.sql.Column) =
    conv(substring(md5(textCol.cast("binary")), 1, 4), 16, 10).cast("bigint")

  /** Bernoulli-style p% corpus sample by content-hash bucket: keep docs
    * whose hash bucket falls below p% of the key space. Map-only — the
    * filter runs at the scan, no shuffle but the deterministic-order
    * tail sort.
    */
  def hashSample(spark: SparkSession, sfDir: String, pct: Int = 20): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .withColumn("bucket", hashBucket($"text") % 100)
      .filter($"bucket" < pct)
      .select($"doc_id", $"lang", $"bucket")
      .orderBy($"doc_id")
  }

  /** Stratified sample: a fixed per-stratum quota (here: per language),
    * members chosen by content-hash order (= uniform within stratum,
    * deterministic).
    *
    * Two-phase top-k so LOW-cardinality strata don't serialize: a
    * single window partitioned by the 5 languages would funnel the
    * whole corpus through 5 tasks at scale. Phase 1 ranks per (input
    * partition, stratum) — key cardinality = partitions × strata, fully
    * parallel — and keeps each group's top quota (a superset of the
    * global top quota by construction). Phase 2 ranks only the
    * <= quota × partitions survivors per stratum. Results are identical
    * to the single-window form; only the plan changes.
    */
  def stratifiedSample(spark: SparkSession, sfDir: String,
      perStratum: Int = 30): DataFrame = {
    import spark.implicits._
    val keyed = Tables.documents(spark, sfDir)
      .withColumn("hkey", md5($"text".cast("binary")))
    val wPre = Window.partitionBy(spark_partition_id(), $"lang")
      .orderBy($"hkey", $"doc_id")
    val survivors = keyed
      .withColumn("prn", row_number().over(wPre))
      .filter($"prn" <= perStratum)
      .drop("prn")
    val w = Window.partitionBy($"lang").orderBy($"hkey", $"doc_id")
    survivors
      .withColumn("rn", row_number().over(w).cast("int"))
      .filter($"rn" <= perStratum)
      .select($"lang", $"rn", $"doc_id")
      .orderBy($"lang", $"rn")
  }

  /** Temperature-based data-mixing weights: per-source sampling weight
    * ∝ tokens^(1/2) — the standard multi-source mixture rule that
    * up-weights small sources relative to proportional sampling
    * (temperature α = 0.5; α = 1 is proportional, α → 0 uniform).
    *
    * One (source) aggregation — source cardinality is tiny, the
    * map-side partials do the work. Cross-engine float determinism: the
    * powered counts quantize to 1e-6-grid INTEGERS before the
    * normalizing sum (integer sums are order-free — the s04 pattern),
    * and α = 0.5 is computed with `sqrt`, which IEEE 754 requires to be
    * correctly rounded in both engines (a general `pow` is only
    * 1-ulp-accurate and could flip the grid rounding).
    */
  /** End-to-end clean-mixture report (p21) — the three pipeline stages
    * every pretraining data build runs, COMPOSED under one gate so
    * their interfaces are proven to fit: exact dedup keepers
    * ([[graft.operators.Dedup.exactKeepers]], the d01 rule), the t16
    * quality classifier's keep gate, then per-source survivor counts,
    * token totals, and final mixture shares (floor ppm). One
    * definition per stage — this query calls the SAME functions d01
    * and t16 gate individually, so a drift in either breaks two gates,
    * not one silently.
    *
    * Scale shape: the stages' own shapes (content-hash groupBy; the
    * t01 map+agg; per-source rollups are |sources|-row frames); the
    * final total is a 1-row broadcast over the cached per-source
    * frame. Sources with zero survivors keep their row (left joins,
    * zero share) — a mixture report that silently drops a source
    * invites a misread.
    */
  def cleanMixture(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = graft.Caches.track(Tables.documents(spark, sfDir))
    val keepers = Dedup.exactKeepers(docs)
    val quality = TextAnalysis.qualityClassifier(spark, sfDir)
      .filter($"keep").select($"doc_id")
    val surv = docs.join(keepers, "doc_id").join(quality, "doc_id")
      .select($"source", Text.tokenCount($"text").as("n"))
    val raw = docs.groupBy($"source").agg(count(lit(1)).as("n_raw"))
    val afterD = docs.join(keepers, "doc_id")
      .groupBy($"source").agg(count(lit(1)).as("n_dedup"))
    val fin = graft.Caches.track(
      surv.groupBy($"source").agg(count(lit(1)).as("n_final"),
        sum($"n").as("tokens_final")))
    val tot = fin.agg(sum($"tokens_final").as("tot"))
    raw.join(afterD, Seq("source"), "left")
      .join(fin, Seq("source"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("n_dedup", coalesce($"n_dedup", lit(0L)))
      .withColumn("n_final", coalesce($"n_final", lit(0L)))
      .withColumn("tokens_final", coalesce($"tokens_final", lit(0L)))
      .selectExpr("source", "n_raw", "n_dedup", "n_final", "tokens_final",
        "tokens_final * 1000000 div tot AS share_ppm")
      .orderBy($"source")
  }

  /** Epoch schedule under a token budget (p22) — the repetition table
    * every data-constrained pretraining plan publishes (Muennighoff et
    * al. 2023: repeating past ~4 epochs stops paying): given the p04
    * sqrt-smoothed mixture, each source's allocated tokens and the
    * implied EPOCHS over its actual supply, flagging sources the
    * budget would force past the repetition cap. All integer: the p04
    * pq grid, floor-ppm weights, floor token allocation, floor-ppm
    * epochs — so the whole plan hash-gates (p04's own weight column is
    * a rounded double for reporting; planning arithmetic must not
    * ride a float, so this derives weight_ppm exactly from pq).
    *
    * Scale shape: the p04 aggregation + a 1-row total broadcast + a
    * projection — |sources|-row frames throughout.
    */
  def epochSchedule(spark: SparkSession, sfDir: String,
      budget: Long = 100000L, epochCapPpm: Long = 4000000L): DataFrame = {
    import spark.implicits._
    val bySource = graft.Caches.track(Tables.documents(spark, sfDir)
      .select($"source", Text.tokenCount($"text").as("n"))
      .groupBy($"source").agg(sum($"n").as("tokens"))
      .withColumn("pq", round(sqrt($"tokens") * 1e6, 0).cast("bigint")))
    val total = bySource.agg(sum($"pq").as("tot"))
    bySource.crossJoin(broadcast(total))
      .selectExpr("source", "tokens", "pq",
        "pq * 1000000 div tot AS weight_ppm",
        s"$budget * pq div tot AS allocated",
        s"($budget * pq div tot) * 1000000 div tokens AS epochs_ppm",
        s"($budget * pq div tot) * 1000000 div tokens > $epochCapPpm" +
          " AS over_cap")
      .orderBy($"source")
  }

  def mixtureWeights(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // cached: consumed twice (the normalizing total + the join left
    // side) — uncached, the full-corpus tokenize+aggregate runs twice
    val bySource = graft.Caches.track(Tables.documents(spark, sfDir)
      .select($"source", Text.tokenCount($"text").as("n"))
      .groupBy($"source").agg(sum($"n").as("tokens"))
      .withColumn("pq", round(sqrt($"tokens") * 1e6, 0).cast("bigint")))
    val total = bySource.agg(sum($"pq").as("tot"))
    bySource.crossJoin(broadcast(total))
      .select($"source", $"tokens", round($"pq" / $"tot", 6).as("weight"))
      .orderBy($"source")
  }

  /** Token-budget packing: select documents, in deterministic hash
    * order, until each SHARD's token budget is filled (running sum of
    * token counts <= budget). Sharding by a hash prefix keeps the
    * running-sum window partitioned — the scalable form of "sample until
    * N tokens": a single global cumulative sum would funnel the corpus
    * through one task, per-shard budgets fan out to any corpus size
    * (total budget = shards × perShardTokens).
    * SIZE `shards` TO THE CLUSTER: the running sum within one shard is
    * inherently sequential, so parallelism == shards — a 100 TB run
    * wants thousands of shards with proportionally smaller per-shard
    * budgets, not the test default of 8.
    */
  def tokenBudget(spark: SparkSession, sfDir: String, shards: Int = 8,
      perShardTokens: Long = 2000,
      maxShardRows: Long = Sizing.MaxShardRows): DataFrame =
    budgetPack(Tables.documents(spark, sfDir), shards, perShardTokens,
      maxShardRows)

  /** The [[tokenBudget]] core over an arbitrary (doc_id, text) set —
    * single definition of the pack semantics shared with
    * [[dedupBudget]].
    */
  private def budgetPack(docs: DataFrame, shards: Int,
      perShardTokens: Long,
      maxShardRows: Long = Sizing.MaxShardRows): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("hkey"), col("doc_id"))
    // sizing contract, in code (the packCore discipline): the running
    // sum sees EVERY shard row before the budget filter, so an
    // undersized `shards` fails loudly instead of funneling the corpus
    // through one sequential window task; cached (NARROW — a cache is
    // a pruning boundary) so the guard's two sides pay tokenize once
    Sizing.guardKeyPopulation(
      graft.Caches.track(docs
        .withColumn("hkey", md5(col("text").cast("binary")))
        .withColumn("shard", (hashBucket(col("text")) % shards).cast("int"))
        .withColumn("n_tokens", Text.tokenCount(col("text")))
        .select(col("doc_id"), col("hkey"), col("shard"), col("n_tokens"))),
      "shard", maxShardRows, "tokenBudget", "shard", "shards")
      .withColumn("cum_tokens",
        sum(col("n_tokens")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum_tokens") <= perShardTokens)
      .select(col("shard"), col("doc_id"), col("n_tokens"), col("cum_tokens"))
      .orderBy(col("shard"), col("cum_tokens"), col("doc_id"))
  }

  /** Dedup-then-pack — the composition a real training-data run
    * executes: [[Dedup.canonicalKeepers]] picks one document per
    * near-duplicate cluster, then the [[tokenBudget]] pack fills each
    * shard's token budget from the SURVIVORS only (a duplicate must
    * never consume budget that a unique document could have used).
    *
    * Scale shape: the keeper set is (doc_id)-narrow and joins back to
    * the corpus on its key before the pack's (shard) window — one extra
    * key-partitioned shuffle on top of the two pipelines it composes.
    */
  def dedupBudget(spark: SparkSession, sfDir: String, shards: Int = 8,
      perShardTokens: Long = 2000): DataFrame = {
    import spark.implicits._
    val keepers = Dedup.canonicalKeepers(spark, sfDir)
    val survivors = Tables.documents(spark, sfDir)
      .join(keepers, "doc_id")
      .select($"doc_id", $"text")
    budgetPack(survivors, shards, perShardTokens)
  }

  /** GPT-style sequence packing — the step that turns a filtered corpus
    * into fixed-length training sequences: documents are concatenated
    * in doc_id order and chunked at `seqLen`-token boundaries, and each
    * document reports where its tokens land: (shard, doc_id, n_tokens,
    * g_start, seq_id, seq_off, n_seqs). A document may straddle
    * sequences (n_seqs > 1) — the standard concat-and-wrap layout, in
    * which no pad token is ever emitted.
    *
    * Scalable form (the [[tokenBudget]] doctrine): packing is
    * inherently sequential, so it shards — each content-hash shard
    * packs ITS OWN doc_id-ordered stream into its own sequence
    * namespace, parallelism == shards. A single global cumsum would
    * funnel the corpus through one task; per-shard prefix sums fan out
    * to any corpus size. All arithmetic is integer-exact: the prefix
    * sum is an exclusive bigint running sum, chunking is DIV/mod (a
    * DOUBLE-cast floor could round instead of truncate).
    */
  def packSequences(spark: SparkSession, sfDir: String, shards: Int = 8,
      seqLen: Long = 256,
      maxShardRows: Long = Sizing.MaxShardRows): DataFrame =
    packCore(Tables.documents(spark, sfDir), shards, seqLen, maxShardRows)

  /** The [[packSequences]] core over an arbitrary (doc_id, text) set —
    * single definition of the pack semantics, shared with
    * [[filteredPack]] (the budgetPack/dedupBudget pattern).
    */
  private def packCore(docs: DataFrame, shards: Int, seqLen: Long,
      maxShardRows: Long = Sizing.MaxShardRows): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // sizing contract, in code: an over-populated shard fails the query
    // naming `shards` instead of funneling the corpus through one
    // sequential prefix-sum task (Sizing.suggestShards); cached so the
    // guard's count+probe sides pay the tokenize+hash pass once —
    // NARROW projection before the cache (an InMemoryRelation is a
    // pruning boundary: caching the full docs frame would drag
    // lang/source/n_chars into the scan, PlanAuditSpec-asserted)
    Sizing.guardKeyPopulation(
      graft.Caches.track(docs
        .withColumn("shard", (hashBucket(col("text")) % shards).cast("int"))
        .withColumn("n_tokens", Text.tokenCount(col("text")).cast("bigint"))
        .filter(col("n_tokens") > 0)
        .select(col("doc_id"), col("shard"), col("n_tokens"))),
      "shard", maxShardRows, "packSequences", "shard", "shards")
      .withColumn("g_start", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("shard"), col("doc_id"), col("n_tokens"), col("g_start"),
        expr(s"g_start DIV $seqLen").as("seq_id"),
        (col("g_start") % seqLen).as("seq_off"),
        (expr(s"(g_start + n_tokens - 1) DIV $seqLen") -
          expr(s"g_start DIV $seqLen") + 1L).as("n_seqs"))
      .orderBy(col("shard"), col("doc_id"))
  }

  /** The composed preprocessing pipeline in ONE declarative plan — the
    * end-to-end a real training-data run executes: exact-dedup keepers
    * (one doc per content hash, min-id convention — the d01 rule) ∩
    * quality-classifier keeps (t16), packed into fixed-length training
    * sequences ([[packSequences]] semantics). Demonstrates that the
    * library's stages compose: each stage is the already-oracle-gated
    * operator, and Catalyst plans the whole chain together (the filter
    * joins run BEFORE the pack shuffle, so rejected/duplicate documents
    * never reach the running sums).
    *
    * Scale shape: one md5-keyed aggregation (d01), the map-only t16
    * pass, two doc_id equi-joins, then the p07 per-shard prefix sums —
    * the sum of its parts, no new shuffle classes.
    */
  def filteredPack(spark: SparkSession, sfDir: String, shards: Int = 8,
      seqLen: Long = 256,
      maxShardRows: Long = Sizing.MaxShardRows): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val dedupKeep = Dedup.exactKeepers(docs)
    val qualityKeep = TextAnalysis.qualityClassifier(spark, sfDir)
      .filter($"keep").select($"doc_id")
    packCore(docs.join(dedupKeep, "doc_id").join(qualityKeep, "doc_id")
      .select($"doc_id", $"text"), shards, seqLen, maxShardRows)
  }

  /** Materialize a [[mixtureWeights]] mixture: give each source a token
    * budget proportional to its temperature weight and select its
    * documents, in content-hash order, until the budget fills — the
    * step that turns mixing WEIGHTS into an actual mixed corpus.
    *
    * Budget arithmetic is integer end-to-end so both engines select the
    * identical boundary document: the 1e-6-grid weight is recovered as
    * the exact integer `round(weight * 1e6)` and the per-(source,
    * shard) budget is `(wq * totalTokens) DIV (1e6 * shards)` — no
    * float multiply whose representation could flip a floor. The
    * product is computed via the split `wq*(T div M) + (wq*(T mod M))
    * div M` (M = 1e6·shards): same integer, but the largest
    * intermediate is bounded by `totalTokens / shards + 1e6·M`, so a
    * 100 TB-scale token budget (~2.5e13 — where the naive `wq * T`
    * product overflows int64 under ANSI mode) stays exact.
    *
    * Scale shape follows [[tokenBudget]]: the running sum partitions by
    * (source, shard) — parallelism = sources × shards, so a 100 TB run
    * raises `shards`, not the per-shard sequential span. The weights
    * side is sources-cardinality and broadcasts.
    */
  def applyMixture(spark: SparkSession, sfDir: String,
      totalTokens: Long = 40000, shards: Int = 4,
      maxShardRows: Long = Sizing.MaxShardRows): DataFrame = {
    import spark.implicits._
    val m = 1000000L * shards
    val (tq, tr) = (totalTokens / m, totalTokens % m)
    val budgets = mixtureWeights(spark, sfDir)
      .withColumn("wq", round($"weight" * 1e6, 0).cast("bigint"))
      .withColumn("shard_budget", expr(s"wq * $tq + (wq * $tr) DIV $m"))
      .select($"source", $"shard_budget")
    val w = Window.partitionBy($"source", $"shard").orderBy($"hkey", $"doc_id")
    // sizing contract, in code: the (source, shard) composite guard —
    // the running sum's partition — fails loudly when `shards` is
    // undersized for the corpus (the tokenBudget discipline; narrow
    // projection before the cache, which is a pruning boundary)
    Sizing.guardKeyPopulation(
      graft.Caches.track(Tables.documents(spark, sfDir)
        .withColumn("hkey", md5($"text".cast("binary")))
        .withColumn("shard", (hashBucket($"text") % shards).cast("int"))
        .withColumn("n_tokens", Text.tokenCount($"text"))
        .select($"doc_id", $"source", $"hkey", $"shard", $"n_tokens")),
      Seq("source", "shard"), maxShardRows, "applyMixture", "shard", "shards")
      .withColumn("cum_tokens", sum($"n_tokens")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(broadcast(budgets), "source")
      .filter($"cum_tokens" <= $"shard_budget")
      .select($"source", $"shard", $"doc_id", $"n_tokens", $"cum_tokens")
      .orderBy($"source", $"shard", $"cum_tokens", $"doc_id")
  }

  /** Dedup-AWARE train/val/test split — the leakage guard a training
    * pipeline needs that a plain hash split cannot give: two
    * near-duplicate documents split independently land one in train
    * and one in test, and the model is then evaluated on paraphrases
    * of its training data. Here the split decision hashes the
    * CANONICAL CLUSTER id ([[Dedup.canonicalize]]'s components — exact
    * dups + verified near-dups), so every member of a near-dup cluster
    * follows its cluster into one split, deterministically and
    * engine-reproducibly (md5 of the decimal cluster id, the p01
    * bucket idiom).
    *
    * Returns (doc_id, canonical_id, bucket, split) — split ∈
    * {train, val, test} with test = buckets [0, testPct), val =
    * [testPct, testPct+valPct), train = the rest, so the proportions
    * are over CLUSTERS (the honest unit; a giant boilerplate cluster
    * lands whole in one split by design).
    *
    * Scale shape: the canonicalize pipeline (LSH candidates + verify +
    * GraphX CC on sparse edges) + one map-side hash projection — the
    * split itself adds NO shuffle beyond the d06 family's.
    */
  def clusterSplit(spark: SparkSession, sfDir: String,
      valPct: Int = 10, testPct: Int = 10,
      jaccardThreshold: Double = 0.6): DataFrame = {
    import spark.implicits._
    require(valPct >= 0 && testPct >= 0 && valPct + testPct < 100,
      s"valPct=$valPct testPct=$testPct must leave room for train")
    // jaccardThreshold flows through like the d06-family siblings: the
    // split MUST be keyed to the same clusters the pipeline's dedup
    // view uses, or the leakage guard silently keys to different ones
    Dedup.clusterMap(spark, sfDir, jaccardThreshold)
      .withColumn("bucket",
        (hashBucket($"canonical_id".cast("string")) % 100).cast("int"))
      .withColumn("split",
        when($"bucket" < testPct, lit("test"))
          .when($"bucket" < testPct + valPct, lit("val"))
          .otherwise(lit("train")))
      .select($"doc_id", $"canonical_id", $"bucket", $"split")
      .orderBy($"doc_id")
  }

  /** Per-source document cap with quality-ranked retention — the
    * "per-domain cap" of the public crawl-pipeline playbooks (C4 /
    * RefinedWeb keep a bounded number of pages per domain so one hot
    * site cannot dominate the corpus), composed with the t16 quality
    * score so the cap keeps each source's BEST documents, not a random
    * subset: rank every document within its source by (score desc,
    * doc_id) and keep ranks <= cap.
    *
    * Scale shape (the [[stratifiedSample]] two-phase discipline): a
    * single window partitioned by source would funnel a hot domain's
    * whole population through one task — the q37 funnel class. Phase 1
    * ranks per (input partition, source) and keeps each pre-group's
    * top cap (a superset of the global top cap by construction: a
    * globally-kept row is within its own pre-group's top cap); phase 2
    * ranks only the <= cap x partitions survivors per source. Results
    * are provably identical to the single-window form (SamplingSpec
    * pins them row-for-row); only the plan changes.
    */
  def sourceCap(spark: SparkSession, sfDir: String, cap: Int = 15): DataFrame = {
    import spark.implicits._
    val scored = TextAnalysis.qualityClassifier(spark, sfDir)
      .select($"doc_id", $"score")
    val withSrc = Tables.documents(spark, sfDir)
      .select($"doc_id", $"source")
      .join(scored, "doc_id")
    val wPre = Window.partitionBy(spark_partition_id(), $"source")
      .orderBy($"score".desc, $"doc_id")
    val survivors = withSrc
      .withColumn("prn", row_number().over(wPre))
      .filter($"prn" <= cap)
      .drop("prn")
    val w = Window.partitionBy($"source").orderBy($"score".desc, $"doc_id")
    survivors
      .withColumn("rn", row_number().over(w).cast("int"))
      .filter($"rn" <= cap)
      .select($"source", $"rn", $"doc_id", $"score")
      .orderBy($"source", $"rn")
  }

  /** Seeded deterministic corpus shuffle — the training-order
    * permutation a data loader consumes: every document gets a GLOBAL
    * position in the order md5(seed ":" doc_id), so the shuffle is
    * reproducible from (corpus, seed) alone, a new seed is a new epoch
    * order, and adding documents leaves the relative order of the
    * existing ones intact (hash order is content-independent of the
    * newcomers).
    *
    * Scale shape (the q32 sharded-rank idiom): a single global
    * row_number window would funnel the corpus through one task.
    * Instead range-repartition by (hkey, doc_id) — range partitions
    * are globally ORDERED, so global position = (rows in partitions
    * before mine) + (my rank within my partition). The local rank
    * windows partition by spark_partition_id (population =
    * corpus/shufflePartitions — the knob that grows with the cluster),
    * and the offsets side is ONE count row per range partition, a
    * cluster constant that broadcasts (its running sum is the one
    * bounded single-partition window, PlanAuditSpec-allowlisted like
    * p04's normalizer).
    */
  def seededShuffle(spark: SparkSession, sfDir: String,
      seed: String = "epoch0"): DataFrame =
    seededShuffleOn(
      Tables.documents(spark, sfDir).select(col("doc_id")), seed)

  /** Cluster-balanced sample — per-TOPIC quotas instead of per-label
    * ones: [[graft.operators.Similarity.corpusClusters]] partitions
    * the corpus into k embedding clusters, and each cluster
    * contributes min(quota, size) members chosen in deterministic
    * hash order — the balanced-selection step the SemDeDup/DSIR-style
    * curation recipes run after clustering, so one dominant topic
    * cannot monopolize the sample the way it would under uniform
    * sampling.
    *
    * Scale shape: the clusterer's broadcast-Lloyd passes + the
    * [[stratifiedSample]] two-phase top-k keyed on (input partition,
    * cluster) — k is a fixed parameter, so the pre-rank keeps the hot
    * cluster off any single task and the final rank sees <= quota x
    * partitions survivors.
    */
  def clusterSample(spark: SparkSession, sfDir: String, quota: Int = 20,
      k: Int = 8, iters: Int = 2): DataFrame = {
    import spark.implicits._
    val assign = Similarity.corpusClusters(spark, sfDir, k, iters)
      .select($"vec_id", $"cluster")
    val keyed = assign.withColumn("hkey",
      md5(concat(lit("cs:"), $"vec_id".cast("string")).cast("binary")))
    val wPre = Window.partitionBy(spark_partition_id(), $"cluster")
      .orderBy($"hkey", $"vec_id")
    val survivors = keyed
      .withColumn("prn", row_number().over(wPre))
      .filter($"prn" <= quota)
      .drop("prn")
    val w = Window.partitionBy($"cluster").orderBy($"hkey", $"vec_id")
    survivors
      .withColumn("rn", row_number().over(w).cast("int"))
      .filter($"rn" <= quota)
      .select($"cluster", $"rn", $"vec_id")
      .orderBy($"cluster", $"rn")
  }

  /** Length-bucketed batch manifest — the dynamic-batching layout a
    * trainer uses when sequences are NOT concat-packed (p07's
    * alternative): documents of similar token length batch together so
    * per-batch padding waste (batch is padded to its longest member)
    * stays small. Bands are fixed powers of two (<=16/32/64/128, else
    * 256); within a band, documents take a deterministic hash order
    * and fill batches of `batchSize` slots:
    * (band, batch_id, slot, doc_id, n_tokens).
    *
    * Scale shape (the q32 sharded-rank idiom, keyed by band): a direct
    * window over the FIVE fixed bands would funnel corpus/5 rows
    * through one task. Range-repartition by (band, hkey, doc_id) —
    * globally ordered — then local ranks per (range partition, band)
    * plus one count-row-per-(partition, band) offsets frame broadcast
    * back; batch arithmetic is integer DIV/mod on the global rank.
    */
  def lengthBatches(spark: SparkSession, sfDir: String,
      batchSize: Int = 8): DataFrame = {
    import spark.implicits._
    val b = Tables.documents(spark, sfDir)
      .select($"doc_id", Text.tokenCount($"text").cast("bigint").as("n_tokens"))
      .filter($"n_tokens" > 0)
      .withColumn("band",
        when($"n_tokens" <= 16, 16).when($"n_tokens" <= 32, 32)
          .when($"n_tokens" <= 64, 64).when($"n_tokens" <= 128, 128)
          .otherwise(256).cast("int"))
      .withColumn("hkey", md5(concat(lit("lb:"),
        $"doc_id".cast("string")).cast("binary")))
    // cached: the offsets aggregate and the join left side both read
    // the local-rank pass (the q32/p11 shape)
    val local = graft.Caches.track(b
      .repartitionByRange($"band", $"hkey", $"doc_id")
      .withColumn("pid", spark_partition_id())
      .withColumn("lrn", row_number().over(
        Window.partitionBy($"pid", $"band").orderBy($"hkey", $"doc_id"))))
    val offs = local.groupBy($"pid", $"band").agg(count(lit(1)).as("pc"))
      .withColumn("off", coalesce(sum($"pc").over(
        Window.partitionBy($"band").orderBy($"pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"pid", $"band", $"off")
    local.join(broadcast(offs), Seq("pid", "band"))
      .withColumn("rn", $"off" + $"lrn")
      .select($"band",
        expr(s"(rn - 1) DIV $batchSize").as("batch_id"),
        (($"rn" - 1) % batchSize).cast("int").as("slot"),
        $"doc_id", $"n_tokens")
      .orderBy($"band", $"batch_id", $"slot")
  }

  /** Overlapping token-window chunking — the context-window prep step
    * every SFT / retrieval pipeline runs over long documents: each doc
    * explodes into windows of `chunkSize` tokens starting every
    * `stride` tokens (stride < chunkSize ⇒ `chunkSize - stride` tokens
    * of overlap so no boundary context is lost). Chunk starts run
    * 1, 1+stride, … while ≤ the token count, so a short document
    * (even an empty one) still yields exactly one (possibly short)
    * chunk and every token lands in ≥1 chunk — a purely structural,
    * engine-independent rule.
    *
    * Output: (doc_id, chunk_idx, n_tokens, chunk_text), chunk_idx
    * 0-based in document order.
    *
    * Scale shape: map-only — one tokenize projection, one
    * sequence+explode (fan-out ⌈n/stride⌉ rows per doc, ~4× at these
    * defaults), no shuffle at all until a consumer aggregates. The
    * token array materializes behind the tokenized() projection
    * boundary so the split runs once per doc, not once per chunk.
    */
  def chunkStride(spark: SparkSession, sfDir: String,
      chunkSize: Int = 32, stride: Int = 24): DataFrame = {
    import spark.implicits._
    require(stride >= 1 && chunkSize >= stride,
      s"need 1 <= stride <= chunkSize, got stride=$stride chunkSize=$chunkSize")
    Text.tokenized(Tables.spread(Tables.documents(spark, sfDir), "doc_id"), "doc_id", "text")
      .select($"doc_id", $"tk", posexplode(
        sequence(lit(1), greatest(size($"tk"), lit(1)), lit(stride)))
        .as(Seq("chunk_idx", "start")))
      .select($"doc_id", $"chunk_idx".cast("int").as("chunk_idx"),
        slice($"tk", $"start", lit(chunkSize)).as("ctk"))
      .select($"doc_id", $"chunk_idx",
        size($"ctk").cast("bigint").as("n_tokens"),
        array_join($"ctk", " ").as("chunk_text"))
      .orderBy($"doc_id", $"chunk_idx")
  }

  /** The [[seededShuffle]] core over any keyed frame — single
    * definition of the permutation semantics (spec-shared).
    */
  private[operators] def seededShuffleOn(ids: DataFrame,
      seed: String): DataFrame = {
    val hkey = md5(concat(lit(seed), lit(":"),
      col("doc_id").cast("string")).cast("binary"))
    // cached: the offsets aggregate and the join left side both read
    // the local-rank pass (narrow: two columns + the rank)
    val local = graft.Caches.track(ids
      .withColumn("hkey", hkey)
      .repartitionByRange(col("hkey"), col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .withColumn("lrn", row_number().over(
        Window.partitionBy(col("pid")).orderBy(col("hkey"), col("doc_id")))))
    val offs = local.groupBy(col("pid")).agg(count(lit(1)).as("pc"))
      .withColumn("off", coalesce(sum(col("pc")).over(
        Window.orderBy(col("pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("pid"), col("off"))
    local.join(broadcast(offs), "pid")
      .select(col("doc_id"),
        (col("off") + col("lrn")).cast("bigint").as("pos"))
      .orderBy(col("pos"))
  }

  /** Weighted deterministic sample (p15) — selection probability
    * proportional to an integer weight (here document length:
    * w = ⌈n_chars/100⌉ capped at `maxTickets`), via TICKET EXPANSION:
    * each document enters `w` lottery tickets, ticket key =
    * md5("wt:" doc_id ":" t), and the document's draw is its MINIMUM
    * ticket key — the integer-weight reading of bottom-k/min-hash
    * weighted sampling (a doc with twice the tickets is twice as
    * likely to hold the corpus-minimum key), fully deterministic and
    * engine-replayable where the classical u^(1/w) exponential-key
    * scheme would hinge on cross-engine pow/ln bit-parity. Top-`m`
    * documents by (min key, doc_id) win.
    *
    * Scale shape: the expansion is a map-only explode bounded by
    * `maxTickets` (a parameter — corpus cost is ≤ maxTickets× the
    * id+weight projection, and the min-key aggregate collapses it
    * right back with map-side partials); the final top-m is
    * TakeOrdered (no global sort). The m-row rank window runs on a
    * selected-set-sized frame (parameters, not data).
    */
  def weightedSample(spark: SparkSession, sfDir: String, m: Int = 50,
      maxTickets: Int = 20): DataFrame = {
    import spark.implicits._
    require(m >= 1 && maxTickets >= 1, s"need m/maxTickets >= 1, got $m/$maxTickets")
    val w = Tables.documents(spark, sfDir)
      .select($"doc_id",
        greatest(least(expr("(n_chars + 99) DIV 100"), lit(maxTickets)),
          lit(1)).cast("int").as("w"))
    val keyed = w
      .select($"doc_id", $"w", explode(sequence(lit(1), $"w")).as("t"))
      .select($"doc_id", $"w",
        md5(concat(lit("wt:"), $"doc_id".cast("string"), lit(":"),
          $"t".cast("string")).cast("binary")).as("tkey"))
      .groupBy($"doc_id", $"w").agg(min($"tkey").as("draw"))
    val top = keyed.orderBy($"draw", $"doc_id").limit(m)
    top.withColumn("rn",
        row_number().over(Window.orderBy($"draw", $"doc_id")).cast("int"))
      .select($"rn", $"doc_id", $"w", $"draw")
      .orderBy($"rn")
  }

  /** Weighted fair interleave (p17) — the deterministic epoch
    * schedule that realizes p04-style mixture weights as an ORDER
    * rather than a subset: each source's documents take a seeded
    * within-source order, and the global sequence interleaves sources
    * in proportion to integer weights by virtual finish time (the
    * weighted-fair-queueing / stride-scheduling discipline: item r of
    * source s lands at v = r · (L div w_s), L = lcm of the weight
    * range, so a weight-3 source fires three items for every one of a
    * weight-1 source — smoothly, not in runs, which is what a
    * training loop wants from a mixture: no source-burst batches).
    * Weights here derive deterministically from the source name
    * (1 + digits mod 4, spanning the 1..4 range the L = 12 stride
    * clears exactly); a caller with learned mixture weights joins
    * them in the same integer form. All arithmetic is integer — the
    * virtual times and both rank passes replay exactly cross-engine.
    *
    * Scale shape: BOTH rank passes ride the p11 sharded-rank idiom
    * (range-repartition + per-partition local rank + broadcast
    * prefix-sum offsets — the within-source pass keys its offsets by
    * (partition, source) and its offset window by source, a
    * sources×partitions frame); no global window, no per-source
    * single-task sort.
    */
  def weightedInterleave(spark: SparkSession, sfDir: String,
      seed: String = "il0"): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"source",
        (lit(1) + (regexp_extract($"source", "[0-9]+", 0).cast("int") % 4))
          .cast("int").as("w"))
    val hkey = md5(concat(lit(seed), lit(":"),
      $"doc_id".cast("string")).cast("binary"))
    // pass 1: per-source seeded rank, sharded
    val loc1 = graft.Caches.track(docs
      .withColumn("hkey", hkey)
      .repartitionByRange($"source", $"hkey", $"doc_id")
      .withColumn("pid", spark_partition_id())
      .withColumn("lrn", row_number().over(
        Window.partitionBy($"pid", $"source").orderBy($"hkey", $"doc_id"))))
    val offs1 = loc1.groupBy($"pid", $"source").agg(count(lit(1)).as("pc"))
      .withColumn("off", coalesce(sum($"pc").over(
        Window.partitionBy($"source").orderBy($"pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"pid", $"source", $"off")
    val vtimes = loc1.join(broadcast(offs1), Seq("pid", "source"))
      .select($"doc_id", $"source", $"w",
        ($"off" + $"lrn").cast("bigint").as("r"))
      .withColumn("v", $"r" * expr("12 div w"))
    // pass 2: global position by (virtual time, source, doc_id), sharded
    val loc2 = graft.Caches.track(vtimes
      .repartitionByRange($"v", $"source", $"doc_id")
      .withColumn("pid", spark_partition_id())
      .withColumn("lrn", row_number().over(
        Window.partitionBy($"pid").orderBy($"v", $"source", $"doc_id"))))
    val offs2 = loc2.groupBy($"pid").agg(count(lit(1)).as("pc"))
      .withColumn("off", coalesce(sum($"pc").over(
        Window.orderBy($"pid").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select($"pid", $"off")
    loc2.join(broadcast(offs2), "pid")
      .select(($"off" + $"lrn").cast("bigint").as("pos"),
        $"doc_id", $"source", $"w", $"r", $"v")
      .orderBy($"pos")
  }

  /** Curriculum ordering (p16) — the easy→hard training schedule
    * (Bengio et al. 2009): documents are assigned a difficulty bucket
    * (here by length — short docs first, the standard text curriculum
    * proxy; any integer difficulty signal slots in), and the epoch
    * order is bucket-major with a SEEDED deterministic shuffle inside
    * each bucket (the p11 epoch-reshuffle semantics, so consecutive
    * epochs change `seed` and get fresh intra-bucket orders while the
    * curriculum skeleton stays fixed). Output: every document with
    * its bucket and 1-based global position.
    *
    * Scale shape (the p11 sharded-rank idiom, generalized to a
    * composite key): ONE range-repartition by (bucket, md5 key,
    * doc_id) — contiguous ordered ranges across tasks — then a
    * per-partition local rank and a partition-count prefix-sum
    * offset join (the offsets frame is one row per partition,
    * broadcast). No global window, no single-task sort; the final
    * orderBy is presentation-only.
    */
  def curriculumOrder(spark: SparkSession, sfDir: String,
      seed: String = "cur0", easyMax: Long = 250,
      midMax: Long = 400): DataFrame = {
    import spark.implicits._
    require(easyMax < midMax, s"need easyMax < midMax: $easyMax/$midMax")
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"n_chars",
        when($"n_chars" <= easyMax, 1).when($"n_chars" <= midMax, 2)
          .otherwise(3).cast("int").as("bucket"))
    val hkey = md5(concat(lit(seed), lit(":"),
      $"doc_id".cast("string")).cast("binary"))
    // cached: the offsets aggregate and the join left side both read
    // the local-rank pass
    val local = graft.Caches.track(docs
      .withColumn("hkey", hkey)
      .repartitionByRange($"bucket", $"hkey", $"doc_id")
      .withColumn("pid", spark_partition_id())
      .withColumn("lrn", row_number().over(
        Window.partitionBy($"pid").orderBy($"bucket", $"hkey", $"doc_id"))))
    val offs = local.groupBy($"pid").agg(count(lit(1)).as("pc"))
      .withColumn("off", coalesce(sum($"pc").over(
        Window.orderBy($"pid").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select($"pid", $"off")
    local.join(broadcast(offs), "pid")
      .select($"doc_id", $"bucket", $"n_chars",
        ($"off" + $"lrn").cast("bigint").as("pos"))
      .orderBy($"pos")
  }

  /** UNIMAX budget allocation (p18) — Chung et al. 2023: the
    * multilingual mixture allocator that replaced temperature
    * sampling for large-scale pretraining: given a document budget
    * (here `budgetNum/budgetDen` of the corpus), allocate each
    * language min(its corpus count, a common cap), with the cap
    * water-filled so low-resource languages keep EVERYTHING and only
    * the high-resource tail is capped — the budget-constrained
    * closest point to uniform. Exactly this corpus' shape: `en`
    * dwarfs the rest, and at the 4/5 default every other language
    * rides under the cap while `en` absorbs the entire cut.
    *
    * All arithmetic is integer (counts, one `div` per window row), so
    * the closed-form water-fill replays exactly cross-engine: in
    * ascending (count, lang) order, language i is FULL iff
    * n_i <= (budget − Σ_{j<i} n_j) div (L − i + 1); fullness is a
    * prefix of that order (the water-filling invariant, spec-checked
    * against an independent sequential loop), and the cap for the
    * capped suffix is (budget − Σ_full n) div #capped. The integer
    * remainder stays unallocated and is emitted as `leftover`
    * (< #capped whenever anything is capped) — an explicit column,
    * not a silent drop. Selection WITHIN each language composes with
    * the deterministic-rank samplers (p02's hash order; at scale the
    * p17 within-source sharded-rank pass) — this operator is the
    * allocator those ranks consume.
    *
    * Scale shape: ONE map-combinable count per language; everything
    * after operates on the L-row aggregate frame (L = language count,
    * a corpus constant — the p04 bounded-funnel shape), so the
    * windows never see data rows.
    */
  def unimaxAlloc(spark: SparkSession, sfDir: String, budgetNum: Int = 4,
      budgetDen: Int = 5): DataFrame = {
    import spark.implicits._
    require(budgetNum >= 1 && budgetDen >= budgetNum,
      s"budget fraction must be in (0, 1]: $budgetNum/$budgetDen")
    val n = Tables.documents(spark, sfDir)
      .groupBy($"lang").agg(count(lit(1)).as("n_docs"))
    val tot = n.agg(sum($"n_docs").as("total"), count(lit(1)).as("nl"))
    val w = Window.orderBy($"n_docs", $"lang")
    val staged = n.crossJoin(broadcast(tot))
      .withColumn("budget", expr(s"(total * $budgetNum) div $budgetDen"))
      .withColumn("i", row_number().over(w))
      .withColumn("cum", coalesce(
        sum($"n_docs").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("avail", expr("(budget - cum) div (nl - i + 1)"))
      .withColumn("is_full", $"n_docs" <= $"avail")
    val caps = staged.groupBy().agg(
        max($"budget").as("b2"),
        coalesce(sum(when($"is_full", $"n_docs")), lit(0L)).as("fullsum"),
        sum(when($"is_full", 1L).otherwise(0L)).as("nfull"),
        count(lit(1)).as("nl2"))
      .withColumn("cap", expr(
        "CASE WHEN nfull = nl2 THEN NULL ELSE (b2 - fullsum) div (nl2 - nfull) END"))
      .select($"cap")
    val alloc = staged.crossJoin(broadcast(caps))
      .withColumn("alloc",
        when($"is_full", $"n_docs").otherwise($"cap").cast("bigint"))
    alloc
      .withColumn("leftover",
        $"budget" - sum($"alloc").over(Window.partitionBy()))
      .select($"lang", $"n_docs", $"alloc", (!$"is_full").as("capped"),
        $"budget", $"leftover")
      .orderBy($"lang")
  }

  /** Temperature-scaled mixture allocation (p19) — the T=2 sampling
    * standard for multilingual pretraining (probability ∝ n^(1/T);
    * mBERT/XLM-R use T≈2, i.e. ∝ √n — p18's UNIMAX is the T→∞
    * endpoint, p04's √-weights the normalized-float form). This is
    * the INTEGER-EXACT version: weights are exact integer square
    * roots — floor(sqrt(n)) from IEEE sqrt CORRECTED by one
    * comparison step each way (s ← s − [s² > n] + [(s+1)² ≤ n]),
    * which repairs any float boundary error, so the weight is the
    * true isqrt on every engine — and the `budget` splits by the
    * LARGEST-REMAINDER method: alloc₀ = ⌊B·w/W⌋, then the R = B − Σ
    * leftover units go to the R largest remainders (B·w mod W, ties
    * by lang) — Σalloc = B exactly, no float shares to reconcile.
    *
    * Scale shape: everything after the per-language token aggregate
    * runs on a |languages|-row frame (p04's tiny-key-space bound);
    * the remainder-rank window and the two scalar sums see one row
    * per language.
    */
  /** Reproducible stratified 3-way split (p20) — train/val/test with
    * EXACT per-language quotas: within each language documents rank
    * by the seeded md5 key (new seed → new split, same seed → same
    * split, no RNG state anywhere), and the 80/10/10 fractions
    * convert to integer quotas by the p19 largest-remainder rule
    * ACROSS THE THREE SPLITS of each language — q_train + q_val +
    * q_test = n_lang exactly, remainder units to the largest
    * remainders (ties by split order train < val < test). Rank ≤
    * q_train → train, ≤ q_train+q_val → val, else test. The gate
    * emits per-(lang, split) counts plus the quota they must equal —
    * a miscounted boundary anywhere hash-mismatches.
    *
    * Scale shape: ONE per-language window (hash-partition by lang,
    * population = per-language doc count) and a |langs|-row quota
    * frame broadcast back. No global window, no RNG.
    */
  def splitQuota(spark: SparkSession, sfDir: String, seed: String = "s0",
      fracTrain: Int = 80, fracVal: Int = 10): DataFrame = {
    import spark.implicits._
    require(fracTrain >= 0 && fracVal >= 0 && fracTrain + fracVal <= 100,
      s"fractions must fit in 100: $fracTrain/$fracVal")
    val docs = graft.Caches.track(
      Tables.documents(spark, sfDir)
        .select($"lang", $"doc_id",
          md5(concat(lit(seed), $"doc_id".cast("string")).cast("binary"))
            .as("hkey")))
    val fracs = Seq(("train", 1, fracTrain), ("val", 2, fracVal),
      ("test", 3, 100 - fracTrain - fracVal))
    // per-language integer quotas: floor shares + largest remainder
    // across the three splits (|langs|×3 rows — driver-free, exact)
    val n = docs.groupBy($"lang").agg(count(lit(1)).as("n"))
    val staged = fracs.map { case (s, ord, f) =>
      n.select($"lang", $"n", lit(s).as("split"), lit(ord).as("ord"),
        expr(s"(n * $f) div 100").as("q0"), expr(s"(n * $f) % 100").as("rem"))
    }.reduce(_ unionByName _)
    val wRem = Window.partitionBy($"lang").orderBy($"rem".desc, $"ord")
    val wLang = Window.partitionBy($"lang")
    val quotas = staged
      .withColumn("r", $"n" - sum($"q0").over(wLang))
      .withColumn("rk", row_number().over(wRem))
      .select($"lang", $"split", $"ord",
        ($"q0" + when($"rk" <= $"r", 1L).otherwise(0L)).as("quota"))
    val wRank = Window.partitionBy($"lang").orderBy($"hkey", $"doc_id")
    val assigned = docs
      .withColumn("rnk", row_number().over(wRank))
      .join(broadcast(quotas.groupBy($"lang").pivot("split",
          Seq("train", "val", "test")).sum("quota")),
        Seq("lang"))
      .withColumn("split",
        when($"rnk" <= $"train", "train")
          .when($"rnk" <= $"train" + $"val", "val")
          .otherwise("test"))
      .groupBy($"lang", $"split").agg(count(lit(1)).as("n"))
    assigned.join(quotas.select($"lang", $"split", $"ord", $"quota"),
        Seq("lang", "split"))
      .select($"lang", $"split", $"n", $"quota")
      .orderBy($"lang", $"ord")
      .select($"lang", $"split", $"n", $"quota")
  }

  def temperatureMix(spark: SparkSession, sfDir: String,
      budget: Long = 100000L): DataFrame = {
    import spark.implicits._
    require(budget >= 1, s"budget must be positive: $budget")
    val byLang = Tables.documents(spark, sfDir)
      .select($"lang", Text.tokenCount($"text").as("n"))
      .groupBy($"lang").agg(sum($"n").as("tokens"))
      // exact integer sqrt: float floor, then the correction step
      .withColumn("s0", expr("CAST(floor(sqrt(tokens)) AS BIGINT)"))
      .withColumn("w", expr(
        """s0 - (CASE WHEN s0 * s0 > tokens THEN 1 ELSE 0 END)
          |   + (CASE WHEN (s0 + 1) * (s0 + 1) <= tokens THEN 1 ELSE 0 END)
          |""".stripMargin.replace("\n", " ")))
      .drop("s0")
    val tot = byLang.agg(sum($"w").as("tw"))
    val base = byLang.crossJoin(broadcast(tot))
      .withColumn("alloc0", expr(s"($budget * w) div tw"))
      .withColumn("rem", expr(s"($budget * w) % tw"))
    val leftover = base.agg((lit(budget) - sum($"alloc0")).as("r"))
    val wRank = Window.orderBy($"rem".desc, $"lang")
    base.crossJoin(broadcast(leftover))
      .withColumn("rk", row_number().over(wRank))
      .select($"lang", $"tokens", $"w", $"alloc0", $"rem",
        ($"alloc0" + when($"rk" <= $"r", 1L).otherwise(0L)).as("alloc"))
      .orderBy($"lang")
  }

  /** Distribution-matched subsampling (p23) — p05 matches SIZE budgets
    * per source; this matches a SHAPE: every non-reference source is
    * rejection-subsampled so its document-LENGTH distribution matches
    * the reference source's (the debiasing pass that stops a
    * short-snippet crawl from skewing a mixture whose reference corpus
    * is long-form — the importance-resampling idea with the length
    * bucket as the feature). Per (source, length-bucket):
    * keep_ppm = min(10⁶, ref_share/src_share on the exact ppm grid,
    * computed as one cross-multiplied integer ratio), and a document
    * survives iff its 16-bit content-hash key falls under the ratio —
    * the p01 deterministic-uniform idiom with the grids aligned by
    * cross-multiplication (h16·10⁶ < keep_ppm·2^16, exact on both
    * engines). A bucket the reference never uses gets keep_ppm = 0:
    * those documents have no counterpart in the target shape.
    * Reference documents pass untouched at keep_ppm = 10⁶.
    *
    * Scale shape: one map-side bucket/hash projection, two tiny-key
    * aggregations (buckets; sources × buckets), the 1-row reference
    * total broadcast (the q14 funnel shape, allowlisted after plan
    * dump), and a broadcast ratio join back onto the scan — the keep
    * filter runs map-side. Integer audit: ref_n·src_tot·10⁶ fits
    * int64 through ~10⁵-doc sources; at corpus scale the ratio moves
    * to DECIMAL(38), shape unchanged.
    */
  def matchDistribution(spark: SparkSession, sfDir: String,
      refSource: String = "src0", bucketChars: Int = 100): DataFrame = {
    import spark.implicits._
    // cached: the reference/source rollups and the final keep filter
    // all read the bucketed scan
    val base = graft.Caches.track(
      Tables.documents(spark, sfDir)
        .select($"doc_id", $"source",
          expr(s"n_chars div $bucketChars").as("bucket"),
          hashBucket($"text").as("h16")))
    val ref = base.filter($"source" === refSource)
      .groupBy($"bucket").agg(count(lit(1)).as("ref_n"))
    val refTot = ref.agg(sum($"ref_n").as("ref_tot"))
    val src = base.filter($"source" =!= refSource)
      .groupBy($"source", $"bucket").agg(count(lit(1)).as("src_n"))
    val srcTot = src.groupBy($"source").agg(sum($"src_n").as("src_tot"))
    val ratios = src.join(ref, Seq("bucket"), "left")
      .na.fill(0L, Seq("ref_n"))
      .join(srcTot, "source")
      .crossJoin(broadcast(refTot))
      .select($"source", $"bucket",
        least(lit(1000000L),
          expr("ref_n * src_tot * 1000000 div (ref_tot * src_n)"))
          .as("keep_ppm"))
    base.filter($"source" =!= refSource)
      .join(broadcast(ratios), Seq("source", "bucket"))
      .filter($"h16" * 1000000L < $"keep_ppm" * 65536L)
      .select($"doc_id", $"source", $"bucket", $"keep_ppm")
      .unionByName(base.filter($"source" === refSource)
        .select($"doc_id", $"source", $"bucket",
          lit(1000000L).as("keep_ppm")))
      .orderBy($"doc_id")
  }
}
