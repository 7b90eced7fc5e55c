package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Text

/** Text-analysis operators for a training-data pipeline (extensions per
  * SURVEY.md §2B-extensions): quality scoring, token stats, language-ID
  * scoring, document fingerprinting.
  *
  * All per-document passes are narrow (map-only over the scan — no
  * shuffle at all for textStats), which is exactly what you want for a
  * 100 TB quality-filter sweep.
  */
object TextAnalysis {

  val Stopwords: Seq[String] = Seq("the", "a", "and", "of", "to", "is", "in")

  /** Per-doc token stats + a deterministic quality score:
    * quality = min(1, n_tokens/100) * (1 - stopword_ratio).
    * Pure map-side pass; no shuffle.
    */
  def textStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.documents(spark, sfDir)
      .select($"doc_id", $"lang", length($"text").as("n_chars_m"),
        Text.toks($"text").as("tk"))
      .select($"doc_id", $"lang", $"n_chars_m",
        size($"tk").as("n_tokens"),
        size(filter($"tk", t => t.isin(Stopwords: _*))).as("n_stop"),
        aggregate($"tk", lit(0), (acc, t) => acc + length(t)).as("tok_chars"))
      .filter($"n_tokens" > 0)
    base.select($"doc_id", $"lang", $"n_tokens", $"n_stop",
      round($"tok_chars" / $"n_tokens", 6).as("avg_tok_len"),
      round($"n_stop" / $"n_tokens", 6).as("stop_ratio"),
      round(least(lit(1.0), $"n_tokens" / lit(100.0)) *
        (lit(1.0) - $"n_stop" / $"n_tokens"), 6).as("quality"))
      .orderBy($"doc_id")
  }

  // Candidate languages (sorted — argmax tie-break is "lexicographically
  // smallest", which first-occurrence array_position gives for free) and
  // their stand-in lexicon constants; shared by both lang-ID operators
  // and mirrored in the DuckDB oracles.
  private val LangNames = Seq("de", "en", "es", "fr", "zh")
  private val LangMults = Seq(5, 3, 7, 11, 13)

  /** argmax over the per-language score array: scores are in LangNames
    * order, array_position returns the FIRST index of the max — exactly
    * the (score desc, cand_lang asc) ranking of the exploded form, with
    * no window, no shuffle.
    */
  private def argmaxLang(scores: Column): Seq[Column] = {
    val names = array(LangNames.map(lit): _*)
    Seq(element_at(names, array_position(scores, array_max(scores)).cast("int"))
        .as("pred_lang"),
      array_max(scores).as("score"))
  }

  /** Language-ID by additive n-gram scoring: each candidate language l
    * has a deterministic per-token weight (length(tok)*c_l) mod 7; the
    * predicted language is the argmax (ties broken lexicographically).
    * The weights are a stand-in lexicon — the *operator shape* is the
    * real n-gram language-ID pipeline.
    *
    * All 5 language scores come from ONE map-only pass per document
    * (codegen'd [[graft.functions.TokenLangScores]]) — no token explode,
    * no lexicon cross join, no aggregation shuffle; spec-asserted
    * identical to the exploded reference form below.
    */
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Text.tokenized(Tables.documents(spark, sfDir), "doc_id", "text")
      .filter(size($"tk") > 0)
      .select($"doc_id",
        graft.functions.LangIdFunctions.tokenLangScores($"tk", LangMults, 7).as("sc"))
      .select($"doc_id" +: argmaxLang($"sc"): _*)
      .orderBy($"doc_id")
  }

  /** Exploded reference form of [[langId]] (token explode × broadcast
    * lexicon → per-language aggregate → window argmax) — the shape the
    * oracle SQL mirrors; kept for the parity spec.
    */
  private[operators] def langIdExploded(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val langs = LangNames.zip(LangMults).toDF("cand_lang", "c")
    val toks = Tables.documents(spark, sfDir)
      .select($"doc_id", explode(Text.toks($"text")).as("tok"))
    val scores = toks.crossJoin(broadcast(langs))
      .groupBy($"doc_id", $"cand_lang")
      .agg(sum((length($"tok") * $"c") % 7).cast("bigint").as("score"))
    val w = Window.partitionBy($"doc_id").orderBy($"score".desc, $"cand_lang")
    scores.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"doc_id", $"cand_lang".as("pred_lang"), $"score")
      .orderBy($"doc_id")
  }

  /** Character-bigram language-ID (the classic n-gram profile shape):
    * every adjacent character pair votes per language with a
    * deterministic hash weight (code-point pair x language constant mod
    * 13); argmax wins, ties break lexicographically. Character n-grams
    * are what real language-ID uses (token-level variant: langId).
    *
    * One map-only pass per document (codegen'd
    * [[graft.functions.CharBigramScores]]) instead of exploding every
    * bigram × 5 languages through an interpreted lambda.
    */
  def langIdCharNgram(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .filter(length($"text") >= 2)
      .select($"doc_id",
        graft.functions.LangIdFunctions.charBigramScores($"text", LangMults, 13).as("sc"))
      .select($"doc_id" +: argmaxLang($"sc"): _*)
      .orderBy($"doc_id")
  }

  /** Exploded reference form of [[langIdCharNgram]] — oracle shape, kept
    * for the parity spec.
    */
  private[operators] def langIdCharNgramExploded(spark: SparkSession,
      sfDir: String): DataFrame = {
    import spark.implicits._
    val langs = LangNames.zip(LangMults).toDF("cand_lang", "c")
    val bg = Tables.documents(spark, sfDir)
      .filter(length($"text") >= 2)
      .select($"doc_id", explode(expr(
        "transform(sequence(1, length(text) - 1), i -> substring(text, i, 2))")).as("bg"))
    val scores = bg.crossJoin(broadcast(langs))
      .groupBy($"doc_id", $"cand_lang")
      .agg(sum(((ascii(substring($"bg", 1, 1)) * 31 + ascii(substring($"bg", 2, 1)))
        * $"c") % 13).cast("bigint").as("score"))
    val w = Window.partitionBy($"doc_id").orderBy($"score".desc, $"cand_lang")
    scores.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"doc_id", $"cand_lang".as("pred_lang"), $"score")
      .orderBy($"doc_id")
  }

  /** BPE-ish token counting: alpha runs, digit runs, and single
    * punctuation marks each count as one token (the pre-tokenization
    * regex shape BPE vocabularies split on) — alongside the whitespace
    * count for comparison. Map-only pass via regexp_count.
    */
  def bpeTokenCount(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select($"doc_id",
        regexp_count(lower($"text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"))
          .cast("int").as("n_bpe_tokens"),
        size(Text.toks($"text")).as("n_ws_tokens"))
      .orderBy($"doc_id")
  }

  /** Intra-document repetition ratio: 1 - distinct/total 3-shingles —
    * the cheap quality filter that catches degenerate repetitive text
    * (boilerplate loops, generation artifacts). One shuffle on doc_id
    * with map-side partials; at 100 TB this runs in the same pass as
    * the other per-doc quality scores.
    */
  def repetition(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Text.tokenized(Tables.spread(Tables.documents(spark, sfDir), "doc_id"), "doc_id", "text")
      .select($"doc_id", explode(Text.shingles($"tk")).as("sh"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        countDistinct($"sh").as("n_distinct"))
      .select($"doc_id", $"n_shingles", $"n_distinct",
        round(lit(1.0) - $"n_distinct" / $"n_shingles", 6).as("rep_ratio"))
      .orderBy($"doc_id")
  }

  /** Corpus n-gram frequency statistics: top-k unigrams and 3-grams by
    * frequency (deterministic gram tiebreak) — the vocabulary/statistics
    * pass that precedes tokenizer (BPE) training. Each top-k is
    * `orderBy(...).limit(k)`, which Spark plans as TakeOrderedAndProject
    * (per-partition top-k, driver merges k rows per partition) — no
    * global sort, no single giant partition regardless of how many
    * distinct grams the corpus has; the final rank window runs on the
    * <= 2k selected rows only.
    */
  def topNgrams(spark: SparkSession, sfDir: String, k: Int = 20): DataFrame = {
    import spark.implicits._
    val tk = graft.Caches.track(
      Text.tokenized(Tables.spread(Tables.documents(spark, sfDir), "doc_id"), "doc_id", "text"))
    def freqTop(grams: DataFrame, n: Int): DataFrame =
      grams.groupBy($"gram").agg(count(lit(1)).as("freq"))
        .orderBy($"freq".desc, $"gram").limit(k)
        .withColumn("n", lit(n))
    val uni = freqTop(tk.select(explode($"tk").as("gram")), 1)
    val tri = freqTop(tk.select(explode(Text.shingles($"tk")).as("gram")), 3)
    val w = Window.partitionBy($"n").orderBy($"freq".desc, $"gram")
    uni.unionByName(tri)
      .withColumn("rnk", row_number().over(w).cast("int"))
      .select($"n", $"rnk", $"gram", $"freq")
      .orderBy($"n", $"rnk")
  }

  /** Default ceiling on benchmark shingles eligible for a broadcast
    * join in [[decontaminate]]: ~10M distinct shingles ≈ a few hundred
    * MB broadcast — a real fixed eval suite (thousands of documents)
    * sits far below this; a corpus-proportional stand-in blows past it
    * and falls back to the shuffle join.
    */
  val DecontaminateBroadcastLimit: Long = 10000000L

  /** Benchmark decontamination: flag corpus documents sharing >= minHit
    * distinct 3-shingles with a benchmark/eval document set.
    *
    * The benchmark side is an explicit parameter (`benchShingles`: a
    * single-column `sh` DataFrame of the eval suite's distinct
    * shingles); the default stand-in derives it from the deterministic
    * doc_id % 97 == 0 corpus subset. A real eval suite is tiny and
    * broadcasts (map-side overlap scan at any corpus size) — but the
    * broadcast is SIZE-GUARDED: if the benchmark set exceeds
    * `broadcastLimit` distinct shingles, the join falls back to a plain
    * key-partitioned shuffle join instead of dying at
    * autoBroadcastJoinThreshold scale.
    *
    * Laziness: with `benchSizeHint = Some(n)` the join strategy is
    * decided from the hint and building the plan runs NO job. Without a
    * hint the guard needs the benchmark set's cardinality, so plan
    * construction EAGERLY counts it (on a cached plan both paths reuse
    * — the probe and the join evaluate it once); callers for whom
    * construction must stay lazy pass the hint.
    */
  def decontaminate(spark: SparkSession, sfDir: String, minHit: Int = 5,
      benchShingles: Option[DataFrame] = None,
      broadcastLimit: Long = DecontaminateBroadcastLimit,
      benchSizeHint: Option[Long] = None): DataFrame = {
    import spark.implicits._
    // cached: the benchmark side and the corpus side are independent
    // subtrees over the same shingle lineage — uncached, the tokenize→
    // shingle→distinct pipeline would evaluate twice per action
    val sh = graft.Caches.track(
      Text.tokenized(Tables.spread(Tables.documents(spark, sfDir), "doc_id"), "doc_id", "text")
        .select($"doc_id", explode(Text.shingles($"tk")).as("sh"))
        .distinct())
    // the doc_id % 97 carve-out exists ONLY for the default stand-in
    // (those docs ARE the benchmark there); with a real external eval
    // set every corpus doc is screened — excluding the stand-in rows
    // would silently skip ~1% of the corpus (round-3 review finding)
    val (bench, corpus) = benchShingles match {
      case Some(b) => (graft.Caches.track(b), sh)
      case None => (sh.filter($"doc_id" % 97 === 0).select($"sh").distinct(),
        sh.filter($"doc_id" % 97 =!= 0))
    }
    // past the limit: pin a sort-merge join (the "merge" hint) — merely
    // dropping the broadcast() hint would let the optimizer's size
    // estimate re-broadcast a side we KNOW is too big to ship
    val benchSide =
      if (benchSizeHint.getOrElse(bench.count()) <= broadcastLimit)
        broadcast(bench)
      else bench.hint("merge")
    corpus
      .join(benchSide, "sh")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_overlap"))
      .filter($"n_overlap" >= minHit)
      .orderBy($"doc_id")
  }

  /** N-gram novelty: the share of a document's 3-shingle OCCURRENCES
    * whose shingle appears in no other document — the inverse of
    * [[decontaminate]]'s overlap signal (high novelty = original text;
    * near-zero = assembled from corpus boilerplate). Integer counts
    * until the final rounded division (cross-engine exact).
    *
    * Scale shape: occurrences explode once (cached — consumed by the
    * document-frequency build and the scoring join), the df table is
    * one (shingle) shuffle, scoring is a shingle equi-join + one doc_id
    * aggregation — the [[tokenRarity]] envelope over shingles.
    */
  def ngramNovelty(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val occ = graft.Caches.track(
      Text.tokenized(Tables.spread(Tables.documents(spark, sfDir), "doc_id"), "doc_id", "text")
        .select($"doc_id", explode(Text.shingles($"tk")).as("sh")))
    val df = occ.select($"doc_id", $"sh").distinct()
      .groupBy($"sh").agg(count(lit(1)).as("df"))
    occ.join(df, "sh")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when($"df" === 1, 1L).otherwise(0L)).as("n_novel"))
      .select($"doc_id", $"n_shingles",
        round($"n_novel" / $"n_shingles", 6).as("novelty"))
      .orderBy($"doc_id")
  }

  /** Token-rarity quality score: each document's mean corpus document
    * frequency over its token OCCURRENCES — a float-log-free stand-in
    * for the unigram-perplexity quality filter (high mean df =
    * common-token boilerplate; low = rare-token / noisy text). All
    * arithmetic is integer until the final rounded division, so both
    * engines agree exactly (the [[Sampling.mixtureWeights]] rule —
    * avoiding ln/log whose cross-engine 1-ulp wobble could flip a
    * rounding).
    *
    * Scale shape: the document-frequency table is one (token) shuffle
    * with map-side partials; scoring is a token→df equi-join + one
    * doc_id aggregation — the same cost envelope as [[fingerprint]]
    * minus its ranking pass (df needs no dense ids).
    */
  def tokenRarity(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // cached: consumed by the df build AND the scoring join
    val toks = graft.Caches.track(
      Text.tokenized(Tables.spread(Tables.documents(spark, sfDir), "doc_id"), "doc_id", "text")
        .select($"doc_id", explode($"tk").as("tok")))
    val df = toks.select($"doc_id", $"tok").distinct()
      .groupBy($"tok").agg(count(lit(1)).as("df"))
    toks.join(df, "tok")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum($"df").as("df_sum"))
      .select($"doc_id", $"n_tokens",
        round($"df_sum" / $"n_tokens", 6).as("mean_df"))
      .orderBy($"doc_id")
  }

  /** Classifier-eval rollup — the harness shape every training-data
    * pipeline runs over its quality/language classifiers: predictions
    * ([[langId]]) joined to labels (the documents table's `lang`
    * column), accuracy per evaluation SLICE (here: source). Integer
    * counts until one final rounded division (cross-engine exact).
    *
    * Scale shape: one doc_id equi-join of two corpus-order sides, then
    * a slice-cardinality aggregation — the map-side-combinable rollup
    * is the cheap part; the predictions are whatever the classifier
    * pass already cost.
    */
  def langIdEval(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val pred = langId(spark, sfDir).select($"doc_id", $"pred_lang")
    val labeled = Tables.documents(spark, sfDir)
      .select($"doc_id", $"lang", $"source")
    pred.join(labeled, "doc_id")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"pred_lang" === $"lang", 1L).otherwise(0L)).as("n_correct"))
      .select($"source", $"n_docs", $"n_correct",
        round($"n_correct" / $"n_docs", 6).as("accuracy"))
      .orderBy($"source")
  }

  /** Inverted index build: term → document frequency, total term
    * frequency, and the head of the sorted posting list (first
    * `headLen` doc_ids) — the index construction pass behind keyword
    * search / [[bm25]], and the other direction of [[tokenRarity]]'s
    * df table (materialized per term instead of joined back per doc).
    *
    * Scale shape: occurrences explode once (cached — stats and postings
    * both consume it); stats are one (term) shuffle with map-side
    * partials; the posting head is a per-term window over the distinct
    * pairs with `rn <= headLen` BEFORE the collect, so no unbounded
    * array ever materializes (`collect_set` of a hot term's full
    * posting list would be the non-scalable form).
    */
  def invertedIndex(spark: SparkSession, sfDir: String,
      headLen: Int = 20): DataFrame = {
    import spark.implicits._
    val tox = graft.Caches.track(
      Text.tokenized(Tables.spread(Tables.documents(spark, sfDir), "doc_id"), "doc_id", "text")
        .select($"doc_id", explode($"tk").as("term")))
    val stats = tox.groupBy($"term")
      .agg(count(lit(1)).as("tf"), count_distinct($"doc_id").as("df"))
    // posting head as a comma-joined string: the declared surface keeps
    // array-free output columns (driver-gate hashing contract); sort
    // NUMERICALLY before casting to string.
    // Two-stage min-k (the stratifiedSample discipline): a single
    // per-term window would rank a hot term's FULL posting list —
    // corpus-proportional for stopwords — in one task; the pre-stage
    // keeps each (input partition, term)'s smallest headLen doc_ids
    // (a superset of the global head by construction), so the final
    // window ranks <= headLen x partitions rows per term.
    val wPre = Window.partitionBy(spark_partition_id(), $"term")
      .orderBy($"doc_id")
    val w = Window.partitionBy($"term").orderBy($"doc_id")
    val heads = tox.select($"term", $"doc_id").distinct()
      .withColumn("prn", row_number().over(wPre))
      .filter($"prn" <= headLen)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= headLen)
      .groupBy($"term")
      .agg(array_join(
        transform(array_sort(collect_list($"doc_id")), _.cast("string")),
        ",").as("postings_head"))
    stats.join(heads, "term")
      .select($"term", $"df", $"tf", $"postings_head")
      .orderBy($"term")
  }

  /** Query terms, k1 and b for [[bm25]] — fixed so the score is a
    * deterministic three-term sum (summation order is explicit, never
    * an aggregation order).
    */
  val Bm25Terms: Seq[String] = Seq("spark", "vector", "window")
  val Bm25K1 = 1.2
  val Bm25B = 0.75

  /** BM25 keyword search over the corpus for the fixed [[Bm25Terms]]
    * query — scoring from the same KIND of tf/df/length statistics an
    * inverted index materializes, recomputed inline here (this operator
    * does NOT consume [[invertedIndex]] output; it needs only the query
    * terms' slice of the statistics, which is cheaper to rebuild than
    * to index).
    *
    * DEVIATION (documented): idf is the RATIONAL Robertson form
    * `(N - df + 0.5) / (df + 0.5)` rather than its logarithm. The log
    * is a monotone transform — per-term score ORDER is identical — but
    * `ln` is correctly-rounded in neither engine (1-ulp platform
    * wobble), while +,*,/ are IEEE-exact in both, so the rational form
    * hash-matches DuckDB exactly. A scorer needing the classic scale
    * can post-apply `ln` outside the comparison gate.
    *
    * Determinism: each per-term score is built from exact integers
    * (tf, dl, N, df) through a fixed parse-identical expression tree;
    * the total is an explicit left-to-right three-term sum; one final
    * round(6).
    *
    * Scale shape: corpus stats (N, total tokens) and the per-term df
    * row are tiny aggregates broadcast to the scoring pass; tf comes
    * from one (doc, term-in-query) aggregation over a pushed-down
    * `isin` filter — the only corpus-order shuffle. At 100 TB this is
    * a map-side-combinable group-by on doc_id of the ~0.1% of
    * occurrences matching the query terms.
    */
  def bm25(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // cached: lengths (corpus constants), tf and df all consume it
    val lens = graft.Caches.track(
      Text.tokenized(Tables.spread(Tables.documents(spark, sfDir), "doc_id"), "doc_id", "text")
        .select($"doc_id", size($"tk").cast("bigint").as("dl"), $"tk"))
    val occ = lens.select($"doc_id", $"dl", explode($"tk").as("term"))
      .filter($"term".isin(Bm25Terms: _*))
    val byDoc = occ.groupBy($"doc_id", $"dl")
      .pivot("term", Bm25Terms)
      .agg(count(lit(1)))
    val tf = Bm25Terms.foldLeft(byDoc) { (d, t) =>
      d.withColumn(s"tf_$t", coalesce(col(t), lit(0L))).drop(t)
    }
    // corpus constants: N, total tokens, per-term df — two tiny
    // aggregates, broadcast into the scoring projection
    val corpus = lens.agg(count(lit(1)).as("n_docs"), sum($"dl").as("tot_tokens"))
    val dfs = occ.select($"doc_id", $"term").distinct()
      .groupBy().pivot("term", Bm25Terms).agg(count(lit(1)))
    val dfCols = Bm25Terms.foldLeft(dfs) { (d, t) =>
      d.withColumn(s"df_$t", coalesce(col(t), lit(0L))).drop(t)
    }
    def termScore(t: String): Column = {
      val tfc = col(s"tf_$t").cast("double")
      val idf = (col("n_docs") - col(s"df_$t") + lit(0.5)) /
        (col(s"df_$t") + lit(0.5))
      val norm = lit(1.0 - Bm25B) + lit(Bm25B) * ($"dl" / ($"tot_tokens" / $"n_docs"))
      (idf * (tfc * lit(Bm25K1 + 1.0))) / (tfc + lit(Bm25K1) * norm)
    }
    val scoreSum = Bm25Terms.map(termScore).reduceLeft(_ + _)
    tf.crossJoin(broadcast(corpus)).crossJoin(broadcast(dfCols))
      .select(Seq($"doc_id", $"dl") ++
        Bm25Terms.map(t => col(s"tf_$t")) :+
        round(scoreSum, 6).as("score"): _*)
      .orderBy($"doc_id")
  }

  /** Positional document fingerprint: sum(pos * token_id) mod P over the
    * token stream, token ids from the sorted global vocabulary.
    *
    * Vocabulary ids come from [[Ranking.denseIds]] (range-repartition +
    * zipWithIndex) — NOT a global `dense_rank()` window, which would
    * funnel every distinct token through one task at corpus scale.
    *
    * Overflow safety: the modulus is folded into each term —
    * `((pos+1) * (tid % P)) % P` — so every partial stays < P and the
    * per-doc sum cannot wrap int64 for any document shorter than ~9e9
    * tokens (a 100 TB corpus divergence vs DuckDB's 128-bit sum
    * otherwise). Mathematically identical to `sum((pos+1)*tid) % P`.
    */
  def fingerprint(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val P = 1000000007L
    // cached: consumed twice (vocabulary build + the id join)
    val toks = graft.Caches.track(Tables.documents(spark, sfDir)
      .select($"doc_id", posexplode(Text.toks($"text")).as(Seq("pos", "tok"))))
    val vocab = Ranking.denseIds(toks, "tok", "tid")
    toks.join(vocab, "tok")
      .groupBy($"doc_id")
      .agg((sum((($"pos" + 1) * ($"tid" % lit(P))) % lit(P)) % lit(P)).as("fp"))
      .orderBy($"doc_id")
  }

  /** Token-distribution drift between two corpus slices — the snapshot
    * comparison a training pipeline runs between crawls (or between a
    * new source and the curated mix) to catch distribution shift
    * before it trains in. Per token, the total-variation contribution
    * |p_A(t) − p_B(t)| / 2 — reported for the `topK` largest movers.
    *
    * Cross-engine exactness (t08/t09 discipline): the mover RANKING is
    * on `numq = |tf_a·tot_b − tf_b·tot_a|`, an exact integer (common
    * denominator form), with a token tiebreak — top-k membership and
    * order can never sit on a float boundary. The single float step,
    * `drift = numq / (2·tot_a·tot_b)`, divides exact integers once and
    * rounds. Overflow is GUARDED, not assumed: Spark would silently
    * wrap a Long product (the DuckDB oracle sums in 128-bit and
    * errors), so the plan raises an error the moment either slice
    * total reaches sqrt(Long.MaxValue) — since tf ≤ tot, both
    * products are then provably < 2^63 and the ranking is exact. At
    * corpora beyond ~3e9 tokens per slice, recompute numq in
    * DECIMAL(38,0) instead of lifting the guard.
    *
    * Scale shape: one token-key shuffle with map-side partials for the
    * per-slice tf, a broadcast of the two scalar totals, one full
    * outer join of the two (vocabulary-cardinality) tf tables, and a
    * TakeOrderedAndProject top-k — no global sort, no all-pairs,
    * nothing corpus-quadratic.
    */
  def tokenDrift(spark: SparkSession, sfDir: String, sliceA: String = "en",
      sliceB: String = "de", topK: Int = 40): DataFrame = {
    import spark.implicits._
    val occ = Tables.documents(spark, sfDir)
      .filter($"lang".isin(sliceA, sliceB))
      .select($"lang", explode(Text.toks($"text")).as("token"))
    // cached: consumed by both slice projections and the totals
    val tf = graft.Caches.track(
      occ.groupBy($"lang", $"token").agg(count(lit(1)).as("tf")))
    def slice(l: String, as: String) =
      tf.filter($"lang" === l).select($"token", $"tf".as(as))
    def tot(l: String, as: String) =
      tf.filter($"lang" === l).agg(sum($"tf").as(as))
    val joined = slice(sliceA, "tf_a").join(slice(sliceB, "tf_b"), Seq("token"), "full")
      .na.fill(0L, Seq("tf_a", "tf_b"))
      .crossJoin(broadcast(tot(sliceA, "tot_a")))
      .crossJoin(broadcast(tot(sliceB, "tot_b")))
    // 3037000499 = floor(sqrt(Long.MaxValue)): below it, tf·tot < 2^63
    val totCap = 3037000499L
    joined
      .withColumn("numq",
        when($"tot_a" >= totCap || $"tot_b" >= totCap,
          raise_error(lit("tokenDrift: slice token total >= sqrt(Long.MaxValue); " +
            "the bigint mover ranking would wrap — recompute numq in DECIMAL(38,0)")))
          .otherwise(abs($"tf_a" * $"tot_b" - $"tf_b" * $"tot_a")))
      .withColumn("drift",
        round($"numq" / (lit(2.0) * $"tot_a" * $"tot_b"), 9))
      .select($"token", $"tf_a", $"tf_b", $"numq", $"drift")
      .orderBy($"numq".desc, $"token")
      .limit(topK)
      .orderBy($"numq".desc, $"token")
  }

  /** PII patterns shared by [[piiScrubText]] and the t14 oracle — the
    * RE2/java.util.regex COMMON SUBSET only (no backreferences, no
    * lookaround, greedy quantifiers, ASCII classes), so Spark and
    * DuckDB tokenize the same matches. Scrub ORDER is part of the
    * contract: emails, then IPs, then phones — each later pattern runs
    * on the already-redacted text, so an IP can never be half-eaten by
    * the phone pattern (the placeholders contain no digits).
    *
    * DETECTION SCOPE (read before trusting this as a release gate):
    * these three patterns match basic emails, dotted-quad IPv4
    * (syntactic — leading-zero and >255 octets included), and
    * SEPARATOR-FORMATTED phone numbers only. They deliberately do NOT
    * match unformatted phones (5551234567 — indistinguishable from any
    * 10-digit id without locale context), IPv6, national formats
    * without separators, SSNs/IBANs/credit cards, or names/addresses.
    * Silent under-detection is the dangerous direction for a scrub
    * pass — a production release gate layers locale-aware validators
    * (libphonenumber-class) and checksum rules on top; this operator
    * is the exact-reproducible common-subset core, not that gate.
    */
  val PiiEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PiiIp = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PiiPhone = "\\+?\\d{1,3}[- ]\\(?\\d{2,4}\\)?[- ]\\d{3,4}[- ]\\d{3,4}"

  /** Scrub one text column: per-stage match counts + the redacted
    * text. Pure map-side pass (regexp_count/regexp_replace are
    * codegen'd) — composes with any upstream frame; no shuffle.
    */
  def piiScrubText(idCol: Column, textCol: Column): Seq[Column] = {
    val t1 = regexp_replace(textCol, PiiEmail, "<EMAIL>")
    val t2 = regexp_replace(t1, PiiIp, "<IP>")
    Seq(idCol.as("doc_id"),
      regexp_count(textCol, lit(PiiEmail)).as("n_email"),
      regexp_count(t1, lit(PiiIp)).as("n_ip"),
      regexp_count(t2, lit(PiiPhone)).as("n_phone"),
      regexp_replace(t2, PiiPhone, "<PHONE>").as("clean"))
  }

  /** PII detection + redaction over the documents table — the scrub
    * pass a training pipeline runs before anything leaves the raw zone.
    *
    * The synthetic corpus carries no digits at all, so the query plants
    * deterministic doc_id-derived PII (an email, a phone, an IP) into
    * each document first — the oracle builds the identical enrichment —
    * and then proves the scrub finds and removes ALL of it: every row
    * exercises every pattern, and the redacted text is hash-compared.
    *
    * Scale shape: map-only scan (one narrow projection, counts and
    * replaces fused into one codegen stage) + the final order — the
    * same shape as t01.
    */
  def piiScrub(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val enriched = concat($"text",
      lit(" contact user"), $"doc_id".cast("string"),
      lit("@mail.example or +1 ("), (lit(200) + $"doc_id" % 700).cast("string"),
      lit(") "), (lit(100) + $"doc_id" % 800).cast("string"),
      lit("-"), (lit(1000) + $"doc_id" % 9000).cast("string"),
      lit(" from 10."), ($"doc_id" % 256).cast("string"),
      lit(".0."), ($"doc_id" % 200).cast("string"))
    Tables.documents(spark, sfDir)
      .select(piiScrubText($"doc_id", enriched): _*)
      .orderBy($"doc_id")
  }

  /** Fixed-weight linear quality classifier — the model-scoring filter
    * step of a CCNet/FineWeb-style pipeline (there a fastText/logreg
    * model trained offline; here the trained weights are public
    * constants, and the FEATURES are [[textStats]]'s already-exact
    * rounded columns, so scoring composes with the map-only stats
    * pass). The squash is the ALGEBRAIC sigmoid x/(1+|x|), not
    * 1/(1+exp(−x)): exp/ln are correctly-rounded on neither engine and
    * their libm results differ across platforms, while add/abs/divide
    * are exact IEEE ops — the score is bit-identical cross-engine with
    * no transcendental in the plan (the [[tokenDrift]]/BM25 rational
    * discipline applied to model scoring).
    *
    * Keep decision thresholds the ROUNDED score, so membership can
    * never sit on an unrounded float boundary.
    *
    * Scale shape: inherits t01's map-only single pass; the classifier
    * is a projection. 100 TB cost = the token scan, nothing more.
    */
  def qualityClassifier(spark: SparkSession, sfDir: String,
      keepAt: Double = 0.25): DataFrame = {
    import spark.implicits._
    // weight order is part of the contract — the oracle mirrors the
    // exact left-to-right arithmetic
    val logit = lit(4.0) * $"quality" - lit(0.5) * $"stop_ratio" +
      lit(0.25) * ($"avg_tok_len" - lit(4.0)) +
      lit(0.3) * when($"lang" === "en", 1.0).otherwise(0.0) - lit(1.0)
    textStats(spark, sfDir)
      .withColumn("score", round(logit / (lit(1.0) + abs(logit)), 6))
      .select($"doc_id", $"lang", $"quality", $"score",
        ($"score" >= keepAt).as("keep"))
      .orderBy($"doc_id")
  }

  /** Lexical-diversity quality signal: per-document Gini impurity of
    * the token distribution, `1 − Σ(tf/n)²` — the entropy-family
    * degenerate-text filter (keyword stuffing, chant-like repetition →
    * low diversity) expressed RATIONALLY: entropy needs `ln`, whose
    * libm results differ across engines, while Gini is one float
    * division of exact integers (`sumsq = Σtf²` and `n²`) — the
    * BM25/t08 rational discipline applied to a diversity score.
    * Complements [[repetition]] (shingle-level) with a unigram-level
    * signal. Returns (doc_id, n_tokens, n_distinct, sumsq, gini).
    *
    * Scale shape: one (doc_id, token)-keyed aggregation with map-side
    * partials, then a doc_id-keyed rollup — both narrow, both
    * partition-parallel; nothing vocabulary- or corpus-global.
    */
  def tokenGini(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select($"doc_id", explode(Text.toks($"text")).as("tok"))
      .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("tf"))
      .groupBy($"doc_id")
      .agg(sum($"tf").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum($"tf" * $"tf").as("sumsq"))
      .select($"doc_id", $"n_tokens", $"n_distinct", $"sumsq",
        round(lit(1.0) - $"sumsq".cast("double") /
          ($"n_tokens" * $"n_tokens"), 6).as("gini"))
      .orderBy($"doc_id")
  }

  /** CCNet-style boilerplate removal: a document is split into
    * non-overlapping `window`-token passages (trailing partial KEPT, so
    * the passages partition the token stream and a clean doc reassembles
    * byte-identically), a passage seen in >= `minDf` distinct documents
    * is boilerplate (headers, license blocks, templated sections — the
    * d10 unit), and each document is rebuilt from its surviving
    * passages in original order. Returns (doc_id, n_passages,
    * n_removed, clean).
    *
    * Scale shape: one explode (corpus tokens / window rows), ONE
    * shuffle on the 16-byte passage hash for the df count (map-side
    * partials; the reassembly side joins on the same hash so the
    * passage TEXT never enters the df aggregate), and one doc_id
    * shuffle to reassemble. Nothing is corpus-quadratic; the df table
    * is passage-cardinality and stays distributed.
    */
  def boilerplateRemove(spark: SparkSession, sfDir: String,
      window: Int = 20, minDf: Int = 2): DataFrame = {
    import spark.implicits._
    require(window >= 2, "passage window must be >= 2 tokens")
    // ceil(n/window) windows; sequence() would step DOWNWARD for 0
    // tokens, so gate on at least one (possibly partial) window
    val tkdf = Text.tokenized(Tables.spread(Tables.documents(spark, sfDir), "doc_id"), "doc_id", "text")
    val nWin = floor((size($"tk") + window - 1) / window).cast("int")
    val passages = tkdf
      .select($"doc_id", explode(when(nWin >= 1,
        transform(sequence(lit(0), nWin - 1), i =>
          struct(i.as("i"),
            array_join(slice($"tk", i * window + 1, lit(window)), " ").as("ptext"))))
        .otherwise(array().cast("array<struct<i:int,ptext:string>>"))).as("p"))
      .select($"doc_id", $"p.i".as("i"), $"p.ptext".as("ptext"),
        md5($"p.ptext".cast("binary")).as("ph"))
    val dfc = passages.groupBy($"ph")
      .agg(count_distinct($"doc_id").as("df"))
    passages.join(dfc, "ph")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_passages"),
        sum(when($"df" >= minDf, 1L).otherwise(0L)).as("n_removed"),
        array_join(transform(
          array_sort(collect_list(when($"df" < minDf, struct($"i", $"ptext")))),
          s => s("ptext")), " ").as("clean"))
      .orderBy($"doc_id")
  }

  /** Per-language corpus health report — the one-screen rollup a
    * pipeline run publishes after ingest (doc counts, exact-dup rate,
    * token mass, t16 quality average, keep rate): the composition
    * showcase at AGGREGATE grain, where every input is an
    * already-oracle-gated signal (d01's content hash, t01's token
    * count, t16's score chain).
    *
    * Cross-engine float discipline: the score average quantizes each
    * (already 1e-6-rounded) score to integer micro-units and
    * integer-sums them — order-free — before the one double division
    * (the s04 pattern); every other column is a ratio of exact
    * integers.
    *
    * Scale shape: two lang-keyed aggregations (one with a single
    * count-distinct — no multi-distinct Expand, the q22 lesson) joined
    * on the language key — map-side partials do the work, the join is
    * language-cardinality.
    */
  def corpusReport(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.documents(spark, sfDir)
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(md5($"text".cast("binary"))).as("n_distinct"),
        sum(Text.tokenCount($"text")).cast("bigint").as("total_tokens"))
    val scored = qualityClassifier(spark, sfDir)
      .select($"lang",
        round($"score" * 1e6, 0).cast("bigint").as("sq"), $"keep")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_scored"), sum($"sq").as("sqs"),
        sum(when($"keep", 1L).otherwise(0L)).as("n_keep"))
    base.join(scored, "lang")
      .select($"lang", $"n_docs", $"n_distinct",
        round(lit(1) - $"n_distinct" / $"n_docs", 6).as("dup_ratio"),
        $"total_tokens",
        round($"total_tokens" / $"n_docs", 6).as("avg_tokens"),
        round($"sqs" / $"n_scored" / 1e6, 6).as("avg_score"),
        round($"n_keep" / $"n_scored", 6).as("keep_ratio"))
      .orderBy($"lang")
  }

  /** Gopher-style rule-based quality filter (Rae et al. 2021 §A1.1's
    * document-level heuristics, re-expressed over this corpus's
    * whitespace tokens): per document,
    *
    *   - `r_len`      — token count within [minTokens, maxTokens];
    *   - `r_meanlen`  — mean token length within [3, 10] chars, tested
    *                    as the cross-multiplied integer inequality
    *                    `3·n ≤ tok_chars ≤ 10·n` (no float division);
    *   - `r_stop`     — at least 2 DISTINCT stopwords present (the
    *                    "contains ≥2 of a small stop list" rule);
    *   - `r_toptok`   — most frequent token ≤ 20% of the doc,
    *                    `5·max_tf ≤ n_tokens`;
    *   - `r_dupgram`  — duplicate 3-gram fraction ≤ 30%,
    *                    `10·(n_grams − nd_grams) ≤ 3·n_grams`;
    *   - `keep`       — conjunction of all five.
    *
    * Every rule is exact integer arithmetic — no doubles anywhere, so
    * the operator is bit-deterministic across engines and row orders
    * (unlike the t16 linear scorer, which needs the rounded-double
    * discipline). Complements t16: production pipelines run BOTH a
    * rule gate and a learned scorer.
    *
    * Scale shape: the gram stats are per-row array expressions (no
    * shuffle); the token stats are one (doc_id, tok)-keyed aggregation
    * with map-side partials rolled up by doc_id — the tokenGini shape.
    * The gram columns ride through the explode and are recovered with
    * `max()` (constant per doc), so no second join is needed. Nothing
    * is corpus-global; a 100 TB sweep is embarrassingly parallel.
    */
  def gopherRules(spark: SparkSession, sfDir: String,
      minTokens: Int = 20, maxTokens: Int = 100000): DataFrame = {
    import spark.implicits._
    val grams = Text.shingles($"tk")
    val base = Text.tokenized(Tables.spread(Tables.documents(spark, sfDir), "doc_id"), "doc_id", "text")
      .select($"doc_id", $"tk", size(grams).as("n_grams"),
        size(array_distinct(grams)).as("nd_grams"))
      .select($"doc_id", explode($"tk").as("tok"), $"n_grams", $"nd_grams")
      .groupBy($"doc_id", $"tok")
      .agg(count(lit(1)).as("tf"),
        max($"n_grams").as("n_grams"), max($"nd_grams").as("nd_grams"))
      .groupBy($"doc_id")
      .agg(sum($"tf").as("n_tokens"),
        max($"tf").as("max_tf"),
        sum($"tf" * length($"tok")).as("tok_chars"),
        sum(when($"tok".isin(Stopwords: _*), 1L).otherwise(0L)).as("n_stop_kinds"),
        max($"n_grams").as("n_grams"),
        max($"nd_grams").as("nd_grams"))
    val rLen = $"n_tokens".between(minTokens, maxTokens)
    val rMean = (lit(3) * $"n_tokens" <= $"tok_chars") &&
      ($"tok_chars" <= lit(10) * $"n_tokens")
    val rStop = $"n_stop_kinds" >= 2
    val rTop = lit(5) * $"max_tf" <= $"n_tokens"
    val rDup = lit(10) * ($"n_grams" - $"nd_grams") <= lit(3) * $"n_grams"
    base.select($"doc_id", $"n_tokens",
        rLen.as("r_len"), rMean.as("r_meanlen"), rStop.as("r_stop"),
        rTop.as("r_toptok"), rDup.as("r_dupgram"),
        (rLen && rMean && rStop && rTop && rDup).as("keep"))
      .orderBy($"doc_id")
  }

  /** Corpus-trained bigram language-model score — the perplexity-proxy
    * quality signal (CCNet / KenLM filtering, Wenzek et al. 2020)
    * re-expressed under this repo's bit-determinism discipline: rather
    * than average LOG-probability (libm `ln` differs across engines),
    * each bigram occurrence scores the add-one-smoothed conditional
    * probability itself,
    *
    *   p(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V)
    *
    * quantized to integer nano-units `qp = round(p·1e9)` BEFORE the
    * per-document sum, so the aggregate is an exact BIGINT in any
    * partition order (the s04/t18 integer-quantize-then-sum rule).
    * High avg_qp = text the corpus model finds predictable; low = rare
    * constructions — the same ranking use as a perplexity filter, with
    * arithmetic instead of geometric averaging (documented deviation).
    *
    * Scale shape: unigram and bigram counts are map-combinable
    * aggregations on corpus-growing keys; the probability join is
    * (bigram)- then (first-word)-keyed — the count sides are one row
    * per key after aggregation, so no fan-out blowup; V is a one-row
    * broadcast. Docs with fewer than 2 tokens have no bigrams and drop
    * out (documented).
    */
  def bigramLm(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tk = graft.Caches.track(
      Text.tokenized(Tables.spread(Tables.documents(spark, sfDir), "doc_id"), "doc_id", "text"))
    val uni = tk.select(explode($"tk").as("w"))
      .groupBy($"w").agg(count(lit(1)).as("c1"))
    val vocab = uni.agg(count(lit(1)).as("v"))
    val bg = tk.select($"doc_id", explode(Text.shingles($"tk", 2)).as("bg"))
    val c2 = bg.groupBy($"bg").agg(count(lit(1)).as("c2"))
    bg.join(c2, "bg")
      .withColumn("w1", substring_index($"bg", " ", 1))
      .join(uni.withColumnRenamed("w", "w1"), "w1")
      .crossJoin(broadcast(vocab))
      .withColumn("qp",
        round(($"c2" + 1).cast("double") / ($"c1" + $"v") * lit(1e9), 0)
          .cast("bigint"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum($"qp").as("sum_qp"))
      .select($"doc_id", $"n_bigrams", $"sum_qp",
        round($"sum_qp" / $"n_bigrams", 0).cast("bigint").as("avg_qp"))
      .orderBy($"doc_id")
  }

  /** Interpolated Kneser–Ney bigram LM (t35) — the real smoothing
    * next to t20's add-one and t29's stupid backoff (Kneser & Ney
    * 1995; Chen & Goodman 1999 for the interpolated form): the
    * bigram term discounts every seen count by a fixed D and the
    * freed mass re-distributes through the CONTINUATION unigram —
    * how many distinct contexts a word follows, not how often it
    * occurs ("francisco" is frequent but only ever follows "san", so
    * its continuation probability is tiny — the insight add-one
    * can't express):
    *
    *   P(w2|w1) = max(c12 − D, 0)/c1 + D·N1+(w1·)/c1 · N1+(·w2)/B
    *
    * with D = 0.75, N1+(w1·) = distinct successors of w1, N1+(·w2) =
    * distinct predecessors of w2, B = distinct bigram types. All
    * arithmetic is exact integer at parts-per-billion: D rides a
    * ×100 grid (75), probabilities are floor ppb, and the λ·P_cont
    * product composes two non-negative floor divisions — both
    * engines evaluate every row identically, so the full conditional
    * table hash-gates. Per-row mass: term1 + λ·(Σ over w2 of
    * P_cont) telescopes to 1 up to floor loss — the spec pins the
    * per-context sum inside [1e9 − rows·2, 1e9].
    *
    * Scale shape: four map-combinable aggregations over the bigram
    * stream (c12, c1, N1+ successor/predecessor counts) joined back
    * on w1/w2 one-row-per-key frames; B is a 1-row broadcast (the
    * t20 V shape). No windows at all.
    */
  def knBigramLm(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tk = graft.Caches.track(
      Text.tokenized(Tables.spread(Tables.documents(spark, sfDir), "doc_id"), "doc_id", "text"))
    val bg = graft.Caches.track(
      tk.select(explode(Text.shingles($"tk", 2)).as("bg"))
        .withColumn("w1", substring_index($"bg", " ", 1))
        .withColumn("w2", substring_index($"bg", " ", -1))
        .groupBy($"w1", $"w2").agg(count(lit(1)).as("c12")))
    val c1 = bg.groupBy($"w1").agg(sum($"c12").as("c1"),
      count(lit(1)).as("n1p_succ"))
    val pred = bg.groupBy($"w2").agg(count(lit(1)).as("n1p_pred"))
    val types = bg.agg(count(lit(1)).as("b"))
    bg.join(c1, "w1").join(pred, "w2").crossJoin(broadcast(types))
      .select($"w1", $"w2", $"c12", $"c1", $"n1p_succ", $"n1p_pred", $"b",
        expr("""greatest(100L * c12 - 75L, 0L) * 1000000000L
               |  div (100L * c1)""".stripMargin.replace("\n", " "))
          .as("term1_ppb"),
        expr("(75L * n1p_succ * 1000000000L div (100L * c1)) " +
          "* (n1p_pred * 1000000000L div b) div 1000000000L").as("term2_ppb"))
      .withColumn("p_kn_ppb", $"term1_ppb" + $"term2_ppb")
      .orderBy($"w1", $"w2")
  }

  /** Deterministic garble for the t36 gate: re-dirties each document
    * with the unicode debris a web crawl actually carries — curly
    * quotes (both single and double, open and close), em/en dashes,
    * NBSP, a zero-width space OR a BOM (doc parity picks), a bell /
    * vertical-tab / CRLF control sample (doc_id mod 3 picks), an
    * upper-cased head, tabs, and doubled spaces — so EVERY branch of
    * [[normalizeText]] decides bytes under the hash gate. Built from
    * engine-shared string ops only (concat/substr/upper + literal code
    * points), so the DuckDB oracle reconstructs the identical dirty
    * string via chr() and must then agree on the whole normalization.
    */
  private def garbled(text: Column, docId: Column): Column = concat(
    lit("\u201C"), upper(substring(text, 1, 12)), lit("\u201D"),
    lit("\u2014"), lit("\u00A0"),
    when(docId % 2 === 0, lit("\u200B")).otherwise(lit("\uFEFF")),
    lit("it\u2019s\t"),
    when(docId % 3 === 0, lit("\u0007"))
      .when(docId % 3 === 1, lit("\u000B"))
      .otherwise(lit("\r\n")),
    substring(text, 13, 1 << 24),
    lit("  \u2018q\u2019 "), lit("\u2013"), lit(" end  "))

  /** Unicode text normalization (t36) — the canonical first pass of a
    * web-corpus pipeline (the cleanup CCNet/Gopher/C4 all run before
    * any token is counted): smart punctuation folds to ASCII (curly
    * single/double quotes → ' / ", em and en dashes → -), NBSP becomes
    * a breaking space, zero-width space and BOM vanish outright,
    * remaining C0 controls (tab/CR/LF/VT/BEL/…) become spaces, space
    * runs collapse to one, and the result is trimmed and lower-cased.
    * Exposed as the column transform [[normalizeCol]] (the reusable
    * library surface) plus this gate entry, which applies it to
    * [[garbled]] documents so the hash compares a fully-exercised
    * normalization, not an ASCII no-op.
    *
    * Engine-parity notes: the whitespace collapse is the explicit
    * class `" +"` — NEVER `\s` (Java includes \x0B in \s, RE2 does
    * not); controls are the explicit `[\x01-\x1f\x7f]` range both
    * regex dialects read identically; zero-widths are matched as
    * literal code points. All steps are codegen'd string expressions —
    * map-only, no shuffle, scales trivially.
    */
  def normalizeCol(c: Column): Column =
    lower(trim(regexp_replace(regexp_replace(regexp_replace(
      translate(c, "\u201C\u201D\u2018\u2019\u2014\u2013\u00A0",
        "\"\"''-- "),
      "[\u200B\uFEFF]", ""),
      "[\\x01-\\x1f\\x7f]", " "),
      " +", " ")))

  def normalizeText(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .filter(length($"text") >= 20)
      .select($"doc_id", garbled($"text", $"doc_id").as("dirty"))
      .select($"doc_id", normalizeCol($"dirty").as("norm"),
        length($"dirty").cast("int").as("dirty_chars"))
      .withColumn("norm_chars", length($"norm").cast("int"))
      .orderBy($"doc_id")
  }

  /** Dice-coefficient collocations (t43) — the symmetric phrase-mining
    * score (Smadja's XTRACT lineage; Dice 1945):
    * 2·c(w1w2) / (c(w1) + c(w2)), the rational sibling of t27's PMI
    * that needs no log AND no corpus-size term, so frequent pairs
    * aren't drowned by the marginals' product — the score phrase
    * tables (word2phrase and friends) actually threshold on. Exact
    * floor-ppm; (dice DESC, w1, w2) top-50 with a c12 ≥ 3 support
    * floor.
    *
    * Scale shape: the t35/t27 bigram aggregation + the unigram count
    * join (vocabulary-sized frames), TakeOrdered top-k. No windows, no
    * scalar funnel (both marginals join per-key — no corpus total
    * anywhere, unlike PMI).
    */
  def diceCollocations(spark: SparkSession, sfDir: String,
      minPair: Long = 3, topK: Int = 50): DataFrame = {
    import spark.implicits._
    val tk = graft.Caches.track(
      Text.tokenized(Tables.spread(Tables.documents(spark, sfDir), "doc_id"), "doc_id", "text"))
    val uni = tk.select(explode($"tk").as("w"))
      .groupBy($"w").agg(count(lit(1)).as("c"))
    val bg = tk.select(explode(Text.shingles($"tk", 2)).as("bg"))
      .withColumn("w1", substring_index($"bg", " ", 1))
      .withColumn("w2", substring_index($"bg", " ", -1))
      .groupBy($"w1", $"w2").agg(count(lit(1)).as("c12"))
      .filter($"c12" >= minPair)
    bg.join(uni.select($"w".as("w1"), $"c".as("c1")), "w1")
      .join(uni.select($"w".as("w2"), $"c".as("c2")), "w2")
      .selectExpr("w1", "w2", "c12", "c1", "c2",
        "2 * c12 * 1000000 div (c1 + c2) AS dice_ppm")
      .orderBy($"dice_ppm".desc, $"w1", $"w2")
      .limit(topK)
  }

  /** KWIC concordance (t42) — keyword-in-context, the corpus-
    * inspection view every curation decision ends at (what does this
    * token actually look like in the data?): every occurrence of the
    * corpus's top token with up to `window` tokens of left and right
    * context. The target is data-derived ((count DESC, token) top-1 —
    * a TakeOrdered over the vocabulary frame), so the query composes
    * census + retrieval without a hand-picked literal.
    *
    * Scale shape: one vocabulary aggregation for the target (tiny,
    * broadcast), one map-side explode + equi-join on the 1-row target;
    * context slices read the already-materialized token array — no
    * second tokenize, no window function at all.
    */
  def kwic(spark: SparkSession, sfDir: String, window: Int = 3): DataFrame = {
    import spark.implicits._
    val tk = graft.Caches.track(
      Text.tokenized(Tables.spread(Tables.documents(spark, sfDir), "doc_id"), "doc_id", "text"))
    val occ = tk
      .select($"doc_id", $"tk", posexplode($"tk").as(Seq("p0", "token")))
      .withColumn("pos", ($"p0" + 1).cast("bigint"))
    val target = occ.groupBy($"token").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"token").limit(1)
      .select($"token".as("t"))
    occ.join(broadcast(target), $"token" === $"t")
      .select($"doc_id", $"pos",
        array_join(slice($"tk",
          greatest(lit(1), $"pos" - window).cast("int"),
          ($"pos" - greatest(lit(1), $"pos" - window)).cast("int")), " ")
          .as("left_ctx"),
        $"token",
        array_join(slice($"tk", ($"pos" + 1).cast("int"), lit(window)), " ")
          .as("right_ctx"))
      .orderBy($"doc_id", $"pos")
  }

  /** Burstiness / index of dispersion (t41) — the variance-to-mean
    * ratio of a token's per-document counts (Church & Gale 1995's
    * burstiness observation: content words clump, function words
    * spread), the signal that separates topical vocabulary (D ≫ 1)
    * from glue (D ≈ 1, the Poisson floor) without any language model.
    * D = (n·Σx² − (Σx)²) / (n·Σx) over ALL n documents (absent docs
    * contribute zero through the totals, so the quotient is exact from
    * three integer sums — no per-doc zero rows materialize). Floor-ppm
    * grid; Poisson-ness is readable directly: d_ppm ≈ 1e6 means
    * evenly-spread.
    *
    * Scale shape: one (token, doc) count aggregation, one token
    * rollup, a broadcast scalar n — all map-combinable; the output is
    * vocabulary-sized. At 100 TB swap the BIGINT sums for
    * DECIMAL(38,0) (the t40 note) — Σx² crosses int64 only past ~3e9
    * occurrences of one token in one doc-squared regime, far beyond
    * real corpora, so BIGINT is documented-safe here.
    */
  def burstiness(spark: SparkSession, sfDir: String,
      minCount: Long = 5): DataFrame = {
    import spark.implicits._
    val docs = graft.Caches.track(Tables.documents(spark, sfDir))
    val nDocs = docs.agg(count(lit(1)).as("n"))
    val perDoc = docs
      .select($"doc_id", explode(Text.toks($"text")).as("token"))
      .groupBy($"token", $"doc_id").agg(count(lit(1)).as("x"))
    perDoc.groupBy($"token")
      .agg(count(lit(1)).as("n_docs_with"), sum($"x").as("total_tf"),
        sum($"x" * $"x").as("sum_sq"))
      .filter($"total_tf" >= minCount)
      .crossJoin(broadcast(nDocs))
      .selectExpr("token", "n_docs_with", "total_tf", "sum_sq",
        "(n * sum_sq - total_tf * total_tf) * 1000000 div (n * total_tf)" +
          " AS d_ppm")
      .orderBy($"d_ppm".desc, $"token")
  }

  /** χ² keyness (t40) — the corpus-comparison statistic (the rational
    * sibling of Dunning's log-likelihood, which needs ln and therefore
    * can't hash-gate): for each token, the 2×2 contingency of
    * (occurrences in slice A = one language) vs (rest of corpus),
    * χ² = N·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)) — the ranked "what
    * vocabulary distinguishes this slice" report a curation pipeline
    * runs to audit a source or language before mixing it in. Exact to
    * the micro grid: the squared determinant rides DECIMAL(38,0)
    * (HUGEINT on the oracle side — int64 dies at (ad−bc)² once the
    * corpus passes ~3e9 token-pairs), one floor division at the end.
    * Precision budget: N ≤ ~1e7 tokens keeps N·det²·1e6 under 38
    * digits; larger corpora drop the micro grid (scaladoc'd, not
    * silently wrong — decimal overflow nulls, and the gate would
    * catch it).
    *
    * Scale shape: one token aggregation (map-combinable), a 1-row
    * totals broadcast, a projection, TakeOrdered top-k. The per-token
    * frame is vocabulary-sized, never corpus-sized.
    */
  def chi2Keyness(spark: SparkSession, sfDir: String, slice: String = "en",
      minCount: Long = 5, topK: Int = 50): DataFrame = {
    import spark.implicits._
    val occ = Tables.documents(spark, sfDir)
      .select(($"lang" === slice).as("ina"),
        explode(Text.toks($"text")).as("token"))
    // cached: the totals aggregate and the per-token scoring both read
    // the (token, a, b) counts
    val cnt = graft.Caches.track(
      occ.groupBy($"token").agg(
        sum(when($"ina", 1L).otherwise(0L)).as("a"),
        sum(when(!$"ina", 1L).otherwise(0L)).as("b")))
    val tot = cnt.agg(sum($"a").as("na"), sum($"b").as("nb"))
    cnt.filter($"a" + $"b" >= minCount)
      .crossJoin(broadcast(tot))
      .withColumn("det",
        expr("CAST(a AS DECIMAL(20,0)) * (nb - b) - " +
          "CAST(b AS DECIMAL(20,0)) * (na - a)"))
      .selectExpr("token", "a", "b", "det > 0 AS over_slice",
        "CAST((CAST(na + nb AS DECIMAL(38,0)) * det * det * 1000000) div " +
          "(CAST(a + b AS DECIMAL(20,0)) * (na + nb - a - b) * " +
          "CAST(na AS DECIMAL(20,0)) * nb) AS BIGINT) AS chi2_micro")
      .orderBy($"chi2_micro".desc, $"token")
      .limit(topK)
  }

  /** Signed feature hashing (t39) — the hashing trick (Weinberger et
    * al., ICML 2009): every token maps to one of `dims` buckets by
    * content hash, with a SECOND hash bit choosing ±1 so collisions
    * cancel in expectation (the property that keeps the hashed inner
    * product unbiased) — the fixed-width featurizer that turns an
    * unbounded vocabulary into a bounded vector without any trained
    * dictionary, which is why large-scale quality classifiers
    * (fastText-style) run it instead of a vocab lookup. Output is the
    * sparse form (doc_id, dim, val) with zero entries dropped.
    *
    * Determinism: bucket and sign both derive from md5 hex via the
    * p01/p03 integer idiom — exact integer arithmetic on both engines,
    * full table hash-gated.
    *
    * Scale shape: map-side hash + ONE (doc_id, dim) aggregation —
    * map-combinable (the per-task key space is bounded by docs×dims in
    * flight), no windows, no broadcast. Vocabulary size never appears
    * anywhere — the point of the trick.
    */
  def featureHash(spark: SparkSession, sfDir: String,
      dims: Int = 16): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select($"doc_id", explode(Text.toks($"text")).as("token"))
      .withColumn("h", md5($"token".cast("binary")))
      .withColumn("dim",
        (conv(substring($"h", 1, 4), 16, 10).cast("bigint") % dims)
          .cast("int"))
      .withColumn("sgn",
        when(conv(substring($"h", 5, 1), 16, 10).cast("bigint") % 2 === 0,
          1L).otherwise(-1L))
      .groupBy($"doc_id", $"dim").agg(sum($"sgn").as("val"))
      .filter($"val" =!= 0)
      .orderBy($"doc_id", $"dim")
  }

  /** Good–Turing count-of-counts (t38) — the frequency-of-frequencies
    * table (Good 1953) that underlies Katz backoff and the unseen-mass
    * estimate every LM smoother needs: for each observed token count
    * r, N_r = how many types occur exactly r times; the adjusted count
    * r* = (r+1)·N_{r+1}/N_r (0 where N_{r+1} is empty — the raw
    * estimator's sparse tail, reported honestly; production smooths
    * N_r first), and the leave-one-out unseen mass P_0 = N_1/N. Both
    * ratios ride the exact floor-ppm grid, so the whole table
    * hash-gates. Complements t35: Kneser–Ney fixes the discount, GT
    * derives it from the count histogram itself.
    *
    * Scale shape: two chained map-combinable aggregations (token →
    * count, count → histogram) — the second one's key space is tiny
    * (distinct count values ~ O(log corpus)); the r+1 lookup is a
    * self-join on that tiny table and the N/N_1 totals are a 1-row
    * broadcast. Nothing here grows with the corpus except the first
    * groupBy.
    */
  def goodTuring(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val counts = Tables.documents(spark, sfDir)
      .select(explode(Text.toks($"text")).as("token"))
      .groupBy($"token").agg(count(lit(1)).as("r"))
    val hist = graft.Caches.track(
      counts.groupBy($"r").agg(count(lit(1)).as("n_r")))
    val totals = hist.agg(
      sum($"r" * $"n_r").as("n_tokens"),
      sum(when($"r" === 1, $"n_r").otherwise(0L)).as("n_1"))
    hist.join(hist.select($"r".as("r1"), $"n_r".as("nn")),
        $"r" + 1 === $"r1", "left")
      .crossJoin(broadcast(totals))
      .withColumn("n_next", coalesce($"nn", lit(0L)))
      .selectExpr("r", "n_r", "n_next",
        "(r + 1) * n_next * 1000000 div n_r AS rstar_ppm",
        "n_1 * 1000000 div n_tokens AS p0_ppm",
        "n_tokens")
      .orderBy($"r")
  }

  /** Vocabulary-richness profile per source (t48) — the lexical-
    * diversity panel quality pipelines read next to t46's Zipf slope:
    * Yule's K (Yule 1944; repetitiveness of the vocabulary,
    * sample-size-robust where raw type/token ratio is not) and
    * Herdan's C (Herdan 1960; log V / log N, the constancy law), plus
    * the hapax count that drives Good–Turing unseen mass (t38).
    * Everything exact: K in micro units is
    * (S₂ − N)·10¹⁰ / N² on DECIMAL(38,0)/HUGEINT (S₂ = Σ r² over
    * types; S₂ ≥ N always, so the numerator is non-negative and both
    * engines floor identically), and C rides the
    * [[graft.functions.IntLog]] grid as log2fixed(V)·10⁶ div
    * log2fixed(N) — the 2^F scale cancels in the ratio. A
    * single-token source (log2fixed(N) = 0) reports NULL C on both
    * engines.
    *
    * Scale shape: one (source, token) aggregation then a
    * |sources|-row rollup — the t46 shape minus the rank window;
    * nothing corpus-sized past the token explode.
    */
  def vocabRichness(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.IntLog.log2Fixed
    Tables.documents(spark, sfDir)
      .select($"source", explode(Text.toks($"text")).as("token"))
      .groupBy($"source", $"token").agg(count(lit(1)).as("r"))
      .groupBy($"source")
      .agg(sum($"r").as("n_tokens"), count(lit(1)).as("v_types"),
        sum(when($"r" === 1, 1L).otherwise(0L)).as("hapax"),
        sum($"r" * $"r").as("s2"))
      .withColumn("lv", log2Fixed($"v_types"))
      .withColumn("ln", log2Fixed($"n_tokens"))
      .select($"source", $"n_tokens", $"v_types", $"hapax", $"s2",
        expr("CAST((CAST(s2 - n_tokens AS DECIMAL(38,0)) * 10000000000) " +
          "div (CAST(n_tokens AS DECIMAL(38,0)) * n_tokens) AS BIGINT)")
          .as("yule_k_micro"),
        expr("CASE WHEN ln > 0 THEN lv * 1000000 div ln " +
          "ELSE CAST(NULL AS BIGINT) END").as("herdan_c_ppm"))
      .orderBy($"source")
  }

  /** Per-document TF-IDF top terms (t49) — the document-tagging pass
    * (the keyword column a corpus browser or weak-labeling pipeline
    * attaches to every doc): d36's exact integer term weights
    * tf·(log2fixed(N) − log2fixed(df)) ranked per document, top `topT`
    * by (weight DESC, token). Ubiquitous tokens weigh exactly 0 and
    * never surface — idf doing its job on the same fixed-point grid
    * as the pair join. Unlike d36 this runs over the FULL corpus (no
    * sample cap — there is no pair join to bound; weights are one row
    * per (doc, distinct token)).
    *
    * Scale shape: one (doc, token) aggregation, one token-keyed df
    * join, the 1-row N broadcast (the q14 funnel shape, allowlisted
    * after plan dump), and a per-DOCUMENT rank window whose input is
    * each doc's distinct-token set — corpus-linear.
    */
  def tfidfTerms(spark: SparkSession, sfDir: String, topT: Int = 3): DataFrame = {
    import spark.implicits._
    import graft.functions.IntLog.log2Fixed
    val tf = graft.Caches.track(
      Tables.documents(spark, sfDir)
        .select($"doc_id", explode(Text.toks($"text")).as("token"))
        .groupBy($"doc_id", $"token").agg(count(lit(1)).as("tf")))
    val nd = Tables.documents(spark, sfDir).agg(count(lit(1)).as("nd"))
    val df = tf.groupBy($"token").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy($"doc_id").orderBy($"w".desc, $"token")
    tf.join(df, "token").crossJoin(broadcast(nd))
      .select($"doc_id", $"token",
        ($"tf" * (log2Fixed($"nd") - log2Fixed($"df"))).as("w"))
      .filter($"w" >= 1)
      .withColumn("rk", row_number().over(w).cast("int"))
      .filter($"rk" <= topT)
      .select($"doc_id", $"rk", $"token", $"w")
      .orderBy($"doc_id", $"rk")
  }

  /** URL extraction + registered-domain stats (t37) — the per-domain
    * census a web-corpus curation pipeline runs before URL-level
    * filtering (C4 dropped whole domains off a blocklist; RefinedWeb
    * weights by domain): extract every http(s) URL, parse the host,
    * strip a leading `www.`, reduce to the registered domain (last two
    * dot-labels — the public-suffix-list lookup stubbed to its
    * deterministic core), and aggregate URL count / distinct-doc count
    * / https share per domain. Since the synthetic corpus carries no
    * URLs, the gate embeds them deterministically: three URLs per
    * document whose host labels derive from space-stripped text
    * slices, plus an `ftp://` decoy the scheme-anchored extractor must
    * skip — so extraction, host parse, www-strip, and the
    * registered-domain reduction all decide the hash.
    *
    * Engine-parity notes: every regex keeps to classes both Java and
    * RE2 read identically (no `\w`/`\s`, hyphen last in classes); the
    * host labels are guaranteed nonempty lowercase alnum by
    * construction. Scale shape: extraction is map-side (regexp over
    * each doc), the census is one hash aggregation on domain —
    * map-combinable, no skew beyond genuinely hot domains (the
    * production answer is AQE skew handling on the groupBy, free
    * here).
    */
  def urlDomainStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    def label(text: Column, off: Int): Column =
      concat(lit("d"), translate(substring(text, off, 6), " ", ""))
    val docs = Tables.documents(spark, sfDir)
      .filter(length($"text") >= 40)
      .select($"doc_id", concat(
        $"text", lit(" see https://"), label($"text", 1),
        lit(".example.com/p/x and http://www."), label($"text", 9),
        lit(".org/a?b=1 plus https://cdn.img."), label($"text", 17),
        lit(".net/y ignore ftp://skip.me end")).as("u"))
    val urls = docs
      .select($"doc_id", explode(
        expr("regexp_extract_all(u, 'https?://[a-z0-9._/?=-]+', 0)")).as("url"))
      .withColumn("host",
        regexp_extract($"url", "^https?://([a-z0-9.-]+)", 1))
      .withColumn("host_nw", regexp_replace($"host", "^www\\.", ""))
      .withColumn("domain",
        regexp_extract($"host_nw", "([a-z0-9-]+\\.[a-z0-9-]+)$", 1))
    urls.groupBy($"domain")
      .agg(count(lit(1)).as("n_urls"),
        countDistinct($"doc_id").as("n_docs"),
        sum(when($"url".startsWith("https://"), 1L).otherwise(0L))
          .as("n_https"))
      .orderBy($"domain")
  }

  /** Reference-LM quality buckets — the CCNet split (Wenzek et al.
    * 2020): train a language model on a CLEAN reference corpus, score
    * every candidate document under it, and cut the corpus into
    * `nBuckets` rank quantiles (head = most reference-like, tail =
    * least) — the head/middle/tail partition that decides what gets a
    * full pipeline pass vs. what gets dropped. [[bigramLm]] scores
    * docs under a model of the WHOLE corpus (self-predictability);
    * this is the cross-corpus form a curation pipeline actually runs.
    * The even-doc_id slice stands in for the reference corpus (in
    * production: a Wikipedia-grade LM), so the model and the scored
    * set genuinely differ and OOV handling is exercised for real:
    * unseen bigrams score (0+1)/(c1+V), unseen left-unigrams
    * (0+1)/(0+V) — add-one smoothing's native answer, via left joins
    * with coalesce instead of bigramLm's inner joins.
    *
    * Same bit-determinism discipline as [[bigramLm]]: per-occurrence
    * probabilities quantized to integer nano-units BEFORE the sum.
    * Buckets are equal-width rank quantiles,
    * bucket = (rank-1)*nBuckets DIV total + 1 (documented: NOT SQL
    * ntile's remainder-to-early-buckets convention — this formula is
    * one integer expression both engines evaluate identically), with
    * rank = (avg_qp DESC, doc_id) — and `keep` drops the tail bucket.
    *
    * Domain note: a document with fewer than 2 tokens has no bigrams,
    * scores under nothing, and emits NO row — it gets neither a
    * bucket nor a keep decision and BYPASSES this gate entirely
    * (cross-engine consistent and spec-pinned). A pipeline wanting an
    * explicit verdict for degenerate docs should pre-filter on token
    * count (t01's n_tokens < 2 is the matching predicate) rather than
    * expect a sentinel bucket here.
    *
    * Scale shape: counts are map-combinable aggregates; the score
    * joins are keyed on (bigram)/(first word) against one-row-per-key
    * aggregates; V and `total` are 1-row broadcasts (the t20/t11
    * corpus-constant shape). The global rank uses the p11 sharded-rank
    * idiom — range-repartition by the sort key, local rank per range
    * partition, plus a per-partition-count offsets side whose running
    * sum is the one bounded single-partition window (<= shuffle
    * partitions rows, a cluster constant).
    */
  def perplexityBucket(spark: SparkSession, sfDir: String,
      nBuckets: Int = 3): DataFrame = {
    import spark.implicits._
    require(nBuckets >= 2, s"nBuckets must be >= 2: $nBuckets")
    val tk = graft.Caches.track(
      Text.tokenized(Tables.spread(Tables.documents(spark, sfDir), "doc_id"), "doc_id", "text"))
    val ref = tk.filter($"doc_id" % 2 === 0)
    val uniR = ref.select(explode($"tk").as("w1"))
      .groupBy($"w1").agg(count(lit(1)).as("c1"))
    val vocabR = uniR.agg(count(lit(1)).as("v"))
    val bgR = ref.select(explode(Text.shingles($"tk", 2)).as("bg"))
      .groupBy($"bg").agg(count(lit(1)).as("c2"))
    val bg = tk.select($"doc_id", explode(Text.shingles($"tk", 2)).as("bg"))
    val scored = bg
      .join(bgR, Seq("bg"), "left")
      .withColumn("w1", substring_index($"bg", " ", 1))
      .join(uniR, Seq("w1"), "left")
      .crossJoin(broadcast(vocabR))
      .withColumn("qp", round(
        (coalesce($"c2", lit(0L)) + 1).cast("double") /
          (coalesce($"c1", lit(0L)) + $"v") * lit(1e9), 0).cast("bigint"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum($"qp").as("sum_qp"))
      .select($"doc_id", $"n_bigrams",
        round($"sum_qp" / $"n_bigrams", 0).cast("bigint").as("avg_qp"))
    // cached: the offsets aggregate, the total count, and the join left
    // side all read the local-rank pass
    val local = graft.Caches.track(scored
      .repartitionByRange($"avg_qp".desc, $"doc_id")
      .withColumn("pid", spark_partition_id())
      .withColumn("lrn", row_number().over(
        Window.partitionBy($"pid").orderBy($"avg_qp".desc, $"doc_id"))))
    val offs = local.groupBy($"pid").agg(count(lit(1)).as("pc"))
      .withColumn("off", coalesce(sum($"pc").over(
        Window.orderBy($"pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"pid", $"off")
    val total = local.agg(count(lit(1)).as("total"))
    local.join(broadcast(offs), "pid")
      .crossJoin(broadcast(total))
      .withColumn("bucket",
        expr(s"CAST((off + lrn - 1) * $nBuckets DIV total AS INT) + 1"))
      .select($"doc_id", $"n_bigrams", $"avg_qp", $"bucket",
        ($"bucket" < nBuckets).as("keep"))
      .orderBy($"doc_id")
  }

  /** Content-defined chunking (CDC) — the dedup-friendly chunker (the
    * rsync/LBFS boundary trick, Muthitacharoen et al. 2001, applied to
    * token streams): a chunk boundary falls AFTER token i exactly when
    * the rolling hash of the last `window` tokens hits 0 mod
    * `divisor`, so boundaries are a function of LOCAL content only.
    * Insert or delete a token and every boundary past the next
    * content-determined cut is UNCHANGED — unlike [[Sampling]]'s fixed
    * p14 windows, where one inserted token shifts every downstream
    * chunk and kills their dedup value. The chunk hashes feed the d10
    * passage-dedup shape (group by chunk_md5) with edit-resilient
    * recall; expected chunk length ≈ `divisor` tokens.
    *
    * Determinism discipline: the per-token value is the first 8 hex
    * chars of md5(token) as an integer (the p01 hex idiom — engine
    * independent), the window hash is Σ r(t_{i-j})·31^j mod 1e9+7 with
    * all products provably inside a Long for `window` <= 5 (r < 2^32,
    * 31^4 < 2^20 — the require bounds it), and chunk content hashes
    * use the order-pinned array_sort(collect_list(struct)) idiom (B13)
    * so post-shuffle row order can never leak into the hash.
    *
    * Scale shape: one doc_id-keyed shuffle for the per-doc windows
    * (lag chain + running boundary count — window populations are doc
    * lengths, never corpus-wide), then a (doc_id, chunk_no) groupBy
    * that reuses the same key prefix. Nothing corpus-global; the
    * output is corpus-linear with ~1/divisor row fan-IN.
    */
  def cdcChunksFrames(docs: DataFrame, window: Int = 4,
      divisor: Int = 64): DataFrame = {
    require(window >= 2 && window <= 5,
      s"window must be in [2,5] (Long-overflow bound): $window")
    require(divisor >= 2, s"divisor must be >= 2: $divisor")
    val P = 1000000007L
    val toks = docs.select(col("doc_id"),
      posexplode(Text.toks(col("text"))).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val r0 = conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("bigint")
    // Σ_j lag(r, j) · 31^j — lag(_, 0) is the row itself
    val hash = (0 until window).map { j =>
      lag(col("r"), j).over(w) * lit(math.pow(31, j).toLong)
    }.reduce(_ + _) % P
    val flagged = toks.withColumn("r", r0)
      .withColumn("bflag",
        when(col("pos") >= window - 1 && hash % divisor === 0, 1L)
          .otherwise(0L))
      .withColumn("chunk_no", coalesce(
        sum(col("bflag")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    flagged.groupBy(col("doc_id"), col("chunk_no"))
      .agg(min(col("pos")).cast("bigint").as("start_pos"),
        count(lit(1)).as("n_toks"),
        md5(array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            x => x.getField("tok")), " ").cast("binary")).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_no"))
  }

  /** [[cdcChunksFrames]] over the documents table — the gate entry. */
  def cdcChunks(spark: SparkSession, sfDir: String): DataFrame =
    cdcChunksFrames(Tables.documents(spark, sfDir))

  /** Count-min sketch of the token frequency distribution — the
    * mergeable sketch class the engine's summary family lacked
    * (q22's HLL answers "how many distinct", q37's KMV the same with
    * an exposed synopsis; count-min answers "how often is X" in
    * `depth × width` cells regardless of vocabulary size — Cormode &
    * Muthukrishnan 2005). Cell (d, col) = Σ count of every token
    * whose row-d hash lands on col; a point estimate is
    * min_d cm[d][hash_d(x)], an overestimate by construction (each
    * row's cell ≥ the true count — collisions only ADD; the spec pins
    * the bound corpus-wide). The PUBLISHED sketch table is the
    * operator output, in SPARSE form — cells with zero count are
    * omitted and read as 0, so cardinality is min(depth×width,
    * occupied) — trivially mergeable cell-wise across corpus
    * shards/days (spec-pinned: sketch(A ∪ B) = sketch(A) + sketch(B)
    * with missing cells as zero), which is the entire reason a 100 TB
    * pipeline ships sketches instead of vocabularies.
    *
    * Determinism: row-d hash = first 8 md5 hex chars of
    * "cm<d>:<token>" (the p01 Horner idiom) mod width — engine
    * independent, so the full cell table carries a DuckDB hash oracle
    * (sketches whose hash seeds are JVM-private can't).
    *
    * Scale shape: one explode (×depth — a fixed constant) into a
    * groupBy on a FIXED depth×width key space: partial aggregation
    * collapses everything map-side, the final shuffle moves at most
    * depth×width rows per task. Nothing vocabulary- or
    * corpus-proportional ever crosses the wire.
    */
  def countMinSketch(docs: DataFrame, depth: Int = 4,
      width: Int = 256): DataFrame =
    countMinCells(docs, depth, width).orderBy(col("d"), col("col"))

  /** The row-d column placement of a token — the single hash
    * definition [[countMinCells]] and [[heavyHitters]] share (one
    * expression, so the sketch build and the probe side cannot
    * drift): first 8 md5 hex chars of "cm<d>:<token>" mod `width`.
    */
  private def cmCol(d: Column, tok: Column, width: Int): Column =
    (conv(substring(md5(concat(lit("cm"), d.cast("string"),
      lit(":"), tok)), 1, 8), 16, 10).cast("bigint") % width)
      .cast("int")

  /** The unordered [[countMinSketch]] cell table — shared with the
    * consumers that join it further ([[heavyHitters]]' broadcast
    * probe) and would otherwise pay a pointless pre-join sort.
    */
  private[operators] def countMinCells(docs: DataFrame, depth: Int,
      width: Int): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth out of range: $depth")
    require(width >= 2, s"width must be >= 2: $width")
    docs
      .select(explode(Text.toks(col("text"))).as("tok"))
      .select(col("tok"), explode(array((0 until depth).map(lit): _*)).as("d"))
      .select(col("d").cast("int").as("d"),
        cmCol(col("d"), col("tok"), width).as("col"))
      .groupBy(col("d"), col("col"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** [[countMinSketch]] over the documents table — the gate entry. */
  def countMin(spark: SparkSession, sfDir: String): DataFrame =
    countMinSketch(Tables.documents(spark, sfDir))

  /** Heavy hitters via count-min + an explicit candidate set — the
    * composition the sketch exists FOR (Cormode & Muthukrishnan's
    * CM+candidates top-k): the sketch alone cannot enumerate frequent
    * items (it only answers point queries), so a candidate frame —
    * [[topNgrams]]' corpus top-k, a curated watchlist, yesterday's
    * heavy hitters — supplies the queries, and each candidate's
    * estimate is the min over the `depth` rows of its hashed cell
    * (missing sparse cells read 0). The estimate can only
    * OVER-count (every cell ≥ the true count; collisions only add),
    * so ranking by estimate never drops a true heavy hitter that made
    * the candidate list — the spec pins the bound per candidate.
    *
    * Scale shape: the sketch collapses map-side onto its fixed
    * depth×width key space and the cell table (≤ depth·width rows, a
    * parameter) BROADCASTS onto the candidate probes — probing cost
    * is |candidates| × depth rows, independent of corpus size; the
    * final rank window runs over the candidate rows only (bounded by
    * the caller's k). Nothing vocabulary- or corpus-proportional
    * shuffles.
    */
  def heavyHitters(docs: DataFrame, candidates: DataFrame,
      depth: Int = 4, width: Int = 256): DataFrame =
    heavyHittersFromCells(countMinCells(docs, depth, width), candidates,
      depth, width)

  /** [[heavyHitters]] from an ALREADY-BUILT sparse cell table — the
    * split that lets a sketch built elsewhere answer the top-k: the
    * end-of-stream state of `EventStream.countMinStream`
    * (spec-asserted equal to the batch probe), a cell table merged
    * across corpus shards/days (cell-wise addition, the t25
    * mergeability contract), or a persisted synopsis probed without
    * touching the corpus at all — which is the entire reason a 100 TB
    * pipeline ships sketches.
    */
  def heavyHittersFromCells(cells: DataFrame, candidates: DataFrame,
      depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth out of range: $depth")
    require(width >= 2, s"width must be >= 2: $width")
    val cm = cells
    val probes = candidates.select(col("gram"))
      .select(col("gram"), explode(array((0 until depth).map(lit): _*)).as("d"))
      .select(col("gram"), col("d").cast("int").as("d"),
        cmCol(col("d"), col("gram"), width).as("col"))
    val est = probes.join(broadcast(cm), Seq("d", "col"), "left")
      .na.fill(0L, Seq("cnt"))
      .groupBy(col("gram"))
      .agg(min(col("cnt")).as("est"))
    // candidate-bounded global rank: population = the caller's k
    val w = Window.orderBy(col("est").desc, col("gram"))
    est.withColumn("rnk", row_number().over(w).cast("int"))
      .select(col("rnk"), col("gram"), col("est"))
      .orderBy(col("rnk"))
  }

  /** t26 gate entry: [[heavyHitters]] fed by [[topNgrams]]' top-20
    * unigrams, with each candidate's TRUE count joined back on — so
    * the gate exposes (and the oracle re-proves) the overestimate
    * bound `est >= freq` row by row, not just the estimates.
    */
  def heavyHittersGate(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cands = topNgrams(spark, sfDir).filter($"n" === 1)
      .select($"gram", $"freq")
    heavyHitters(Tables.documents(spark, sfDir), cands)
      .join(broadcast(cands), "gram")
      .select($"rnk", $"gram", $"freq", $"est")
      .orderBy($"rnk")
  }

  /** PMI collocation mining (t27) — the statistical phrase detector
    * (Church & Hanks 1990): adjacent word pairs whose observed
    * frequency beats what their marginals predict. The classical score
    * log(N·c(xy)/(c(x)c(y))) is MONOTONE in the inner ratio, so the
    * log never needs to be taken: the operator ranks by the exact
    * integer fixed-point
    *
    *   pmi_q = (N · c(xy) · 10^6) div (c(x) · c(y))
    *
    * — one BIGINT expression both engines evaluate bit-identically
    * (no ln / no float), the t20 discipline. Pairs below `minCount`
    * are dropped first (the standard low-frequency PMI pathology:
    * hapax pairs otherwise saturate the top of the list). Top-`topN`
    * by (pmi_q DESC, w1, w2).
    *
    * Numeric bound: N·c(xy)·10^6 with corpus token count N — exact in
    * BIGINT while N·c(xy) < ~9·10^12, i.e. comfortably through the
    * gate sizes; a 100 TB run lowers the 10^6 scale or pre-divides N
    * out of the constant (ranking is scale-invariant), documented
    * rather than silently saturating.
    *
    * Scale shape: unigram/bigram counts are map-combinable aggregates
    * onto vocabulary-sized keys; the two marginal joins hit
    * one-row-per-key aggregates (no fan-out); N is a 1-row broadcast;
    * the final top-N is TakeOrdered over the ≥minCount pair table (no
    * global sort) and the rank window runs on the `topN`-row result
    * only.
    */
  def pmiCollocations(spark: SparkSession, sfDir: String,
      minCount: Int = 3, topN: Int = 50): DataFrame = {
    import spark.implicits._
    require(minCount >= 1 && topN >= 1, s"bad minCount=$minCount topN=$topN")
    val tk = graft.Caches.track(
      Text.tokenized(Tables.spread(Tables.documents(spark, sfDir), "doc_id"), "doc_id", "text"))
    val u = tk.select(explode($"tk").as("w"))
    val uni = u.groupBy($"w").agg(count(lit(1)).as("c1"))
    val nTok = u.agg(count(lit(1)).as("n"))
    val pairs = tk.select(explode(Text.shingles($"tk", 2)).as("bg"))
      .select(substring_index($"bg", " ", 1).as("w1"),
        substring_index($"bg", " ", -1).as("w2"))
      .groupBy($"w1", $"w2").agg(count(lit(1)).as("pair_c"))
      .filter($"pair_c" >= minCount)
    val scored = pairs
      .join(uni.select($"w".as("w1"), $"c1".as("c1a")), "w1")
      .join(uni.select($"w".as("w2"), $"c1".as("c1b")), "w2")
      .crossJoin(broadcast(nTok))
      .withColumn("pmi_q", expr("(n * pair_c * 1000000) div (c1a * c1b)"))
      .select($"w1", $"w2", $"pair_c", $"c1a", $"c1b", $"pmi_q")
    val top = scored.orderBy($"pmi_q".desc, $"w1", $"w2").limit(topN)
    // rank window over the topN-row result only (parameter-bounded)
    top.withColumn("rnk",
        row_number().over(Window.orderBy($"pmi_q".desc, $"w1", $"w2")).cast("int"))
      .select($"rnk", $"w1", $"w2", $"pair_c", $"c1a", $"c1b", $"pmi_q")
      .orderBy($"rnk")
  }

  /** Trigram stupid-backoff scorer (t29) — Brants et al. 2007, the
    * web-scale LM recipe that replaces smoothing with a fixed backoff
    * penalty (its whole point was distributed count-only training at
    * corpus scale — exactly this engine's setting). A model of the
    * even-doc_id reference slice (the t23 cross-corpus convention, so
    * odd documents genuinely exercise every backoff level) scores
    * every trigram occurrence (a b c):
    *
    *   S = C3(abc)/C2(ab)                 if the trigram was seen
    *     | 0.4 · C2(bc)/C1(b)             else if the bigram was seen
    *     | 0.4 · 0.4 · C1(c)/Nref         else (0 when c is OOV)
    *
    * quantized per occurrence to integer nano-units with the α = 2/5
    * penalty cleared into the integer arithmetic — (C3·10^9) div C2,
    * (C2·2·10^9) div (5·C1), (C1·4·10^9) div (25·Nref) — so there is
    * NO float anywhere (tighter than t20/t23, whose single division
    * rides one rounded IEEE op) and the per-doc sum is an exact
    * BIGINT in any partition order. Docs with fewer than 3 tokens
    * have no trigrams and emit no row (the t20 domain note).
    *
    * Scale shape: the three count tables are map-combinable
    * aggregates on vocabulary-sized keys; scoring is three left
    * joins, each keyed against a one-row-per-key aggregate (no
    * fan-out); Nref is a 1-row broadcast.
    */
  def trigramBackoff(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tk = graft.Caches.track(
      Text.tokenized(Tables.spread(Tables.documents(spark, sfDir), "doc_id"), "doc_id", "text"))
    val ref = tk.filter($"doc_id" % 2 === 0)
    val refUni = ref.select(explode($"tk").as("w"))
    val c1 = refUni.groupBy($"w").agg(count(lit(1)).as("c1"))
    val nRef = refUni.agg(count(lit(1)).as("nref"))
    val c2 = ref.select(explode(Text.shingles($"tk", 2)).as("bg"))
      .groupBy($"bg").agg(count(lit(1)).as("c2"))
    val c3 = ref.select(explode(Text.shingles($"tk", 3)).as("tg"))
      .groupBy($"tg").agg(count(lit(1)).as("c3"))
    val occ = tk.select($"doc_id", explode(Text.shingles($"tk", 3)).as("tg"))
      .withColumn("a", substring_index($"tg", " ", 1))
      .withColumn("b", substring_index(substring_index($"tg", " ", 2), " ", -1))
      .withColumn("c", substring_index($"tg", " ", -1))
    occ
      .join(c3, Seq("tg"), "left")
      .join(c2.select($"bg".as("ab_bg"), $"c2".as("c2ab")),
        concat($"a", lit(" "), $"b") === $"ab_bg", "left")
      .join(c2.select($"bg".as("bc_bg"), $"c2".as("c2bc")),
        concat($"b", lit(" "), $"c") === $"bc_bg", "left")
      .join(c1.select($"w".as("b"), $"c1".as("c1b")), Seq("b"), "left")
      .join(c1.select($"w".as("c"), $"c1".as("c1c")), Seq("c"), "left")
      .crossJoin(broadcast(nRef))
      .withColumn("qp", expr(
        """CASE
          |  WHEN c3 IS NOT NULL THEN (c3 * 1000000000) div c2ab
          |  WHEN c2bc IS NOT NULL THEN (c2bc * 2000000000) div (5 * c1b)
          |  WHEN c1c IS NOT NULL THEN (c1c * 4000000000) div (25 * nref)
          |  ELSE CAST(0 AS BIGINT)
          |END""".stripMargin))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_trigrams"), sum($"qp").as("sum_qp"))
      .select($"doc_id", $"n_trigrams", $"sum_qp",
        expr("sum_qp div n_trigrams").as("avg_qp"))
      .orderBy($"doc_id")
  }

  /** TextRank keyword extraction (t28) — Mihalcea & Tarau 2004: build
    * the word co-occurrence graph (adjacent-token pairs, undirected,
    * edge weight = co-occurrence count, self-loops dropped) and run
    * WEIGHTED PageRank over it; high-rank words sit at the centre of
    * the corpus' phrase structure — the unsupervised keyword signal a
    * curation pipeline uses where t07's raw frequency over-rewards
    * boilerplate tokens.
    *
    * Same fixed-point integer discipline as s21: rank mass scaled by
    * 10^6, per-edge contribution `(pr·w) div strength(src)` (strength
    * = Σ incident weights, so every graph node has strength ≥ 1 — no
    * dangling case), damped update `150000 + (85·in) div 100`. A fixed
    * `prRounds` rounds therefore replays as a generated CTE chain and
    * the whole operator hash-gates. Isolated words (no co-occurrence
    * edge, i.e. only ever adjacent to themselves or nothing) are not
    * graph nodes and emit no row (documented).
    *
    * Scale shape: the edge list is a vocabulary²-bounded (in practice
    * corpus-bigram-sized) map-combinable aggregate; each round is one
    * equi-join of edges against the vocab-sized rank frame plus a
    * dst-keyed sum with map-side partials — a pregel superstep
    * relationally, each round persisted (O(1) per-round lineage, the
    * s21 loop discipline); the final top-N is TakeOrdered (no global
    * sort), rank window on the `topN`-row result only.
    */
  def textRankKeywords(spark: SparkSession, sfDir: String,
      prRounds: Int = 3, topN: Int = 30): DataFrame = {
    import spark.implicits._
    require(prRounds >= 1 && topN >= 1, s"bad prRounds=$prRounds topN=$topN")
    val scale = 1000000L
    val tk = Text.tokenized(Tables.spread(Tables.documents(spark, sfDir), "doc_id"), "doc_id", "text")
    val undw = graft.Caches.track(
      tk.select(explode(Text.shingles($"tk", 2)).as("bg"))
        .select(substring_index($"bg", " ", 1).as("w1"),
          substring_index($"bg", " ", -1).as("w2"))
        .filter($"w1" =!= $"w2")
        .select(least($"w1", $"w2").as("a"), greatest($"w1", $"w2").as("b"))
        .groupBy($"a", $"b").agg(count(lit(1)).as("w")))
    val bid = undw.select($"a".as("src"), $"b".as("dst"), $"w")
      .unionAll(undw.select($"b".as("src"), $"a".as("dst"), $"w"))
    // cached (r13-opt): read by every PR round's contribution join AND
    // the final top join — prRounds+1 evaluations of the corpus-wide
    // degree aggregation uncached
    val strength = graft.Caches.track(
      bid.groupBy($"src").agg(sum($"w").as("s")))
    val nodes = graft.Caches.track(bid.select($"src".as("word")).distinct())
    var pr = nodes.select($"word", lit(scale).as("pr"))
    for (_ <- 1 to prRounds) {
      val contrib = bid.join(strength, "src")
        .join(pr.withColumnRenamed("word", "src"), "src")
        .select($"dst".as("word"), expr("(pr * w) div s").as("c"))
      val in = contrib.groupBy($"word").agg(sum($"c").as("inm"))
      pr = graft.Caches.track(
        nodes.join(in, Seq("word"), "left")
          .select($"word",
            (lit(scale * 15 / 100) +
              expr("(85 * coalesce(inm, CAST(0 AS BIGINT))) div 100")).as("pr")))
    }
    val top = pr.join(strength.withColumnRenamed("src", "word"), "word")
      .orderBy($"pr".desc, $"word").limit(topN)
    top.withColumn("rnk",
        row_number().over(Window.orderBy($"pr".desc, $"word")).cast("int"))
      .select($"rnk", $"word", $"pr", $"s")
      .orderBy($"rnk")
  }

  /** T5-style span corruption (t30) — Raffel et al. 2020 §3.1.4: the
    * denoising-objective preprocessing a text-to-text training
    * pipeline runs over every document: contiguous token spans are
    * replaced by numbered sentinel tokens `<X0> <X1> …` in the input,
    * and the target sequence lists each sentinel followed by the
    * tokens it hides. Here the span schedule is fully DETERMINISTIC
    * (md5-keyed, seed-parameterized) so the corruption replays
    * bit-identically across engines, epochs and partitionings:
    * positions are tiled into stride-3 blocks, block s fires iff
    * `h(seed, doc, s) mod 4 = 0` (≈25% of blocks → ~15% of tokens
    * masked, the T5 default neighborhood), and a fired block masks
    * `1 + (h div 4) mod 3` tokens from its start — span length ≤ the
    * stride, so spans NEVER overlap or abut ambiguously by
    * construction (the determinism T5's random merge step lacks).
    * Sentinels number left-to-right per document. Documents with no
    * tokens emit no row (the t20 domain note); a fired block always
    * contains its own start token, so every sentinel hides ≥ 1 token.
    *
    * Scale shape: map-only per-token arithmetic (block, hash, fire,
    * length all derive from (doc_id, position)); the span index is
    * one row_number window PARTITIONED BY doc over the fired blocks
    * only; reassembly is two doc-keyed sort_array(collect_list)
    * aggregates — per-doc state bounded by document length, no
    * cross-doc term anywhere.
    */
  def spanCorrupt(spark: SparkSession, sfDir: String,
      seed: String = "sc0"): DataFrame = {
    import spark.implicits._
    val pos = graft.Caches.track(
      Tables.documents(spark, sfDir)
        .select($"doc_id", posexplode(Text.toks($"text")).as(Seq("p", "w")))
        .withColumn("s", ($"p" - ($"p" % 3)).cast("int"))
        .withColumn("h", conv(substring(
          md5(concat(lit(seed + ":"), $"doc_id".cast("string"), lit(":"),
            $"s".cast("string")).cast("binary")), 1, 4), 16, 10).cast("bigint"))
        .withColumn("fire", $"h" % 4 === 0)
        .withColumn("len", (lit(1) + expr("(h div 4) % 3")).cast("int"))
        .withColumn("masked", $"fire" && ($"p" - $"s") < $"len"))
    val spans = pos.filter($"fire" && $"p" === $"s")
      .withColumn("idx", (row_number().over(
        Window.partitionBy($"doc_id").orderBy($"s")) - 1).cast("int"))
      .select($"doc_id", $"s", $"idx")
    val tagged = pos.join(spans, Seq("doc_id", "s"), "left")
    val corrupted = tagged
      .withColumn("piece",
        when(!$"masked", $"w")
          .when($"p" === $"s", concat(lit("<X"), $"idx", lit(">"))))
      .filter($"piece".isNotNull)
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_pieces"),
        array_join(expr("transform(sort_array(collect_list(struct(p, piece))), x -> x.piece)"),
          " ").as("corrupted"))
    val targets = tagged.filter($"masked")
      .groupBy($"doc_id", $"s", $"idx")
      .agg(array_join(expr("transform(sort_array(collect_list(struct(p, w))), x -> x.w)"),
        " ").as("span_toks"))
      .select($"doc_id", $"s",
        concat(lit("<X"), $"idx", lit("> "), $"span_toks").as("span_str"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_spans"),
        array_join(expr("transform(sort_array(collect_list(struct(s, span_str))), x -> x.span_str)"),
          " ").as("targets"))
    val counts = pos.groupBy($"doc_id").agg(count(lit(1)).as("n_tokens"))
    counts.join(corrupted.drop("n_pieces"), "doc_id")
      .join(targets, Seq("doc_id"), "left")
      .select($"doc_id", $"n_tokens",
        coalesce($"n_spans", lit(0L)).as("n_spans"),
        $"corrupted", coalesce($"targets", lit("")).as("targets"))
      .orderBy($"doc_id")
  }

  /** RAKE keyword extraction (t31) — Rapid Automatic Keyword
    * Extraction (Rose et al. 2010), integer-exact: candidate phrases
    * are maximal stopword-free token runs; per document each word gets
    * freq (occurrences in candidates) and degree (Σ length of its
    * containing phrases, with multiplicity); a phrase scores
    * Σ_w degree(w)·`scale` div freq(w) — the classic degree/freq
    * ratio on a fixed integer grid, so ranking is bit-identical
    * across engines (floor division of non-negatives; no float
    * anywhere). Top-`topN` phrases per doc, (score desc, phrase,
    * pid) total order. t28's TextRank ranks words by graph
    * centrality; RAKE is the phrase-level co-occurrence scorer the
    * same pipelines run when they need multi-word keys cheaply.
    *
    * One tokenizer note: [[graft.functions.Text.toks]] strips
    * punctuation before RAKE sees the stream, so phrases break only
    * at stopwords (the punctuation-break refinement has no signal
    * left to use) — deterministic, and identical in the oracle.
    *
    * Scale shape: per-doc windows (population = doc length) + three
    * equi-joins keyed by (doc_id[, token]) — corpus-linear, nothing
    * global. The final top-N window is per-doc.
    */
  def rakeKeywords(spark: SparkSession, sfDir: String, topN: Int = 3,
      scale: Long = 1000000L): DataFrame = {
    import spark.implicits._
    val wDoc = Window.partitionBy($"doc_id").orderBy($"i")
    val cand = graft.Caches.track(
      Tables.documents(spark, sfDir)
        .select($"doc_id", posexplode(Text.toks($"text")).as(Seq("i", "tok")))
        .withColumn("is_stop",
          when($"tok".isin(Stopwords: _*), 1).otherwise(0))
        .withColumn("pid", sum($"is_stop").over(wDoc))
        .filter($"is_stop" === 0)
        .select($"doc_id", $"pid", $"i", $"tok"))
    val plen = cand.groupBy($"doc_id", $"pid").agg(count(lit(1)).as("plen"))
    val withLen = cand.join(plen, Seq("doc_id", "pid"))
    val wstats = withLen.groupBy($"doc_id", $"tok")
      .agg(count(lit(1)).as("freq"), sum($"plen").as("degree"))
    val scored = withLen.join(wstats, Seq("doc_id", "tok"))
      .groupBy($"doc_id", $"pid")
      .agg(
        array_join(expr(
          "transform(sort_array(collect_list(struct(i, tok))), x -> x.tok)"),
          " ").as("phrase"),
        sum(expr(s"(degree * $scale) div freq")).as("score"))
    val wTop = Window.partitionBy($"doc_id")
      .orderBy($"score".desc, $"phrase", $"pid")
    scored.withColumn("rnk", row_number().over(wTop).cast("int"))
      .filter($"rnk" <= topN)
      .select($"doc_id", $"rnk", $"phrase", $"score")
      .orderBy($"doc_id", $"rnk")
  }

  /** Vocabulary growth curve (t32) — the Heaps'-law measurement a
    * corpus report runs to answer "how fast does the vocabulary still
    * grow": for each of `buckets` doc-count prefixes (doc_id order),
    * the EXACT cumulative token count and distinct-vocabulary size.
    * The curve's shape is what decides tokenizer vocab budgets and
    * whether more crawl still buys new types; t18's corpus report
    * gives the endpoint, this gives the trajectory.
    *
    * Exactness without re-scanning per prefix: a token's membership in
    * every prefix is determined by its FIRST-seen doc alone, so one
    * corpus pass builds (token, first_seen) and per-doc counts, and
    * the `buckets` thresholds join against those two small-keyed
    * frames — never the raw token stream. All counts are integers.
    *
    * Scale shape: the token stream aggregates map-side to per-doc and
    * per-token rows before any threshold fan-out; the threshold frame
    * is `buckets` rows, broadcast. No prefix rescans, no windows over
    * the corpus.
    */
  def vocabGrowth(spark: SparkSession, sfDir: String,
      buckets: Int = 10): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val toks = graft.Caches.track(
      docs.select($"doc_id", explode(Text.toks($"text")).as("tok")))
    val thr = docs.agg((max($"doc_id") + 1).as("n"))
      .select($"n", explode(sequence(lit(1), lit(buckets))).as("k"))
      .select($"k".cast("int").as("k"), expr(s"(k * n) div $buckets").as("thr"))
    val firstSeen = toks.groupBy($"tok").agg(min($"doc_id").as("fs"))
    val perDoc = toks.groupBy($"doc_id").agg(count(lit(1)).as("nt"))
    val vocab = firstSeen.crossJoin(broadcast(thr))
      .filter($"fs" < $"thr")
      .groupBy($"k").agg(count(lit(1)).as("vocab"))
    val tokens = perDoc.crossJoin(broadcast(thr))
      .filter($"doc_id" < $"thr")
      .groupBy($"k").agg(sum($"nt").as("n_tokens"))
    val nDocs = docs.select($"doc_id").crossJoin(broadcast(thr))
      .filter($"doc_id" < $"thr")
      .groupBy($"k").agg(count(lit(1)).as("n_docs"))
    nDocs.join(tokens, Seq("k"), "left").join(vocab, Seq("k"), "left")
      .select($"k", $"n_docs",
        coalesce($"n_tokens", lit(0L)).as("n_tokens"),
        coalesce($"vocab", lit(0L)).as("vocab"))
      .orderBy($"k")
  }

  /** WordPiece greedy longest-match encode (t33) — the OTHER learned
    * subword tokenizer family next to [[graft.operators.Bpe]]: where
    * BPE replays its merge history, WordPiece segments each word
    * greedily against a vocabulary — at each position take the
    * LONGEST vocab entry matching the remaining suffix, emit it
    * (`##`-prefixed beyond position 1, the BERT convention), advance
    * past it (Wu et al. 2016; Song et al. 2021 describe this
    * linear-scan form). The vocabulary here is derived, not shipped:
    * every single character of the word set (so segmentation can
    * never dead-end and no [UNK] row exists by construction) plus the
    * `topGrams` most frequent character 2/3-grams over the DISTINCT
    * word set (count DESC, gram ASC — an exact, engine-free ranking).
    *
    * The greedy loop unrolls to `rounds` fixed rounds (one emitted
    * piece per active word per round; `maxWordLen` caps word length
    * so `rounds` = maxWordLen terminates every word), and since match
    * selection is pure string equality + a (length DESC, gram) argmax,
    * the WHOLE segmentation — vocab learning included — replays as a
    * generated CTE oracle, the bpeSql/s29 bounded-loop shape.
    * Out-of-range words (longer than `maxWordLen`) are excluded up
    * front — callers route them to a byte-fallback encoder, the
    * production convention for pathological tokens.
    *
    * Scale shape: the vocab is ≤ chars+topGrams rows, BROADCAST; each
    * round is one broadcast join of the (word, offset) state against
    * it plus a per-WORD 1-row window — states only shrink; the picked
    * frame feeds both the emit and the advance, so rounds snapshot
    * via the kCorePeel idiom (persist alone would double the analyzed
    * plan per round — the s25 lineage lesson).
    */
  def wordPieceEncode(spark: SparkSession, sfDir: String,
      topGrams: Int = 50, maxWordLen: Int = 12,
      checkpointDir: Option[String] = None): DataFrame = {
    import spark.implicits._
    require(maxWordLen >= 1 && topGrams >= 0, s"bad params $maxWordLen/$topGrams")
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
    def snap(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()
    val words = graft.Caches.track(
      Tables.documents(spark, sfDir)
        .select(explode(Text.toks($"text")).as("word"))
        .filter(length($"word").between(1, maxWordLen))
        .distinct())
    // every (position, n) character n-gram of every distinct word —
    // the length guard matters: Spark's sequence(1, stop) DESCENDS
    // when stop < 1, so an unguarded explode would fabricate grams at
    // position 0 for words shorter than n
    def grams(n: Int): DataFrame = words
      .filter(length($"word") >= n)
      .select($"word", explode(sequence(lit(1), length($"word") - (n - 1)))
        .as("i"))
      .select($"word".substr($"i", lit(n)).as("v"))
    val singles = grams(1).distinct()
    val top = grams(2).unionByName(grams(3))
      .groupBy($"v").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"v").limit(topGrams)
      .select($"v")
    val vocab = graft.Caches.track(
      singles.unionByName(top)
        .select($"v", length($"v").cast("int").as("vl")))
    var state = words.select($"word", lit(1).cast("int").as("off"))
    var pieces = Vector.empty[DataFrame]
    val wWord = Window.partitionBy($"word").orderBy($"vl".desc, $"v")
    for (r <- 1 to maxWordLen) {
      // substr truncates at word end, so an overlong candidate can
      // never equal its vl-length vocab entry — the boundary guard is
      // the length mismatch itself
      val pick = snap(state.crossJoin(broadcast(vocab))
        .filter($"word".substr($"off", $"vl") === $"v")
        .withColumn("rn", row_number().over(wWord))
        .filter($"rn" === 1)
        .select($"word", $"off", $"v", $"vl"))
      pieces = pieces :+ pick.select($"word", lit(r).cast("int").as("pos"),
        when($"off" === 1, $"v").otherwise(concat(lit("##"), $"v")).as("piece"))
      state = pick.filter($"off" + $"vl" <= length($"word"))
        .select($"word", ($"off" + $"vl").cast("int").as("off"))
    }
    pieces.reduce(_ unionByName _).orderBy($"word", $"pos")
  }

  /** Zipf rank–frequency fit per source (t46) — the power-law health
    * check a corpus curator runs on every ingest slice: natural text
    * follows freq ∝ rank^s with s ≈ −1 (Zipf 1949), and a slice whose
    * fitted exponent drifts far from the corpus norm is usually
    * boilerplate, spam, or template expansion, not prose. Per source,
    * the top `topR` token ranks regress log2(freq) on log2(rank) by
    * exact integer least squares on the [[graft.functions.IntLog]]
    * fixed-point log grid (slope and R² reported as floor ppm with the
    * division sign handled explicitly, so Spark's truncate-toward-zero
    * `div` and DuckDB's floor `//` can never disagree — both only ever
    * divide non-negative operands).
    *
    * Overflow audit (int64): x, y <= 62·2^8 < 2^14; with topR = 100,
    * n·Σxy and Σx·Σy <= ~2^42, so |num|·10^6 < 2^63; the R² numerator
    * num² ·10^6 exceeds int64 and rides DECIMAL(38,0)/HUGEINT — the
    * t40 chi² discipline.
    *
    * Scale shape: one (source, token) hash aggregation (map-combinable),
    * then a per-source rank window whose input is the per-source
    * VOCABULARY (not the corpus — counts are already reduced; at 100 TB
    * a freq floor in the WHERE bounds the window input further), then a
    * |sources|-row regression aggregate. No scalar funnels.
    */
  def zipfFit(spark: SparkSession, sfDir: String, topR: Int = 100): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"source").orderBy($"freq".desc, $"token")
    Tables.documents(spark, sfDir)
      .select($"source", explode(Text.toks($"text")).as("token"))
      .groupBy($"source", $"token").agg(count(lit(1)).as("freq"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter($"rnk" <= topR)
      .select($"source",
        graft.functions.IntLog.log2Fixed($"rnk").as("x"),
        graft.functions.IntLog.log2Fixed($"freq").as("y"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sxx"),
        sum($"y" * $"y").as("syy"))
      .filter($"n" >= 2)
      .withColumn("num", $"n" * $"sxy" - $"sx" * $"sy")
      .withColumn("den", $"n" * $"sxx" - $"sx" * $"sx")
      .select($"source", $"n".as("n_ranks"),
        expr("CASE WHEN num >= 0 THEN num * 1000000 div den " +
          "ELSE -((-num) * 1000000 div den) END").as("slope_ppm"),
        // zero y-variance (constant-frequency source) is 0/0: R² is
        // UNDEFINED there, and reporting "perfect fit" would read a
        // flat template source as perfectly Zipfian — NULL instead,
        // the q64/s42 degenerate discipline (advisor r12)
        expr("CASE WHEN n * syy - sy * sy = 0 THEN CAST(NULL AS BIGINT) " +
          "ELSE CAST(CAST(num AS DECIMAL(38,0)) * num * 1000000 div " +
          "(CAST(den AS DECIMAL(38,0)) * (n * syy - sy * sy)) AS BIGINT) " +
          "END").as("r2_ppm"))
      .orderBy($"source")
  }

  /** Jensen–Shannon drift per source (t47) — the distributional
    * distance between each ingest slice's unigram distribution and the
    * corpus-wide one (Lin 1991): the symmetric, bounded divergence a
    * mixture pipeline reads to spot a source whose vocabulary usage
    * has drifted (new crawl snapshot gone wrong, template flood) —
    * KL's asymmetry and infinities make it useless as a monitor; JSD
    * is the standard fix. Probabilities live on the floor-ppm grid and
    * every log is [[graft.functions.IntLog.log2Fixed]], so the whole
    * report is integer-exact and hash-gates: with
    * S(D) = Σ_w d_ppm(w)·log2fixed(d_ppm(w)) over d_ppm >= 1 and
    * m_ppm = (p_ppm + q_ppm) div 2,
    * jsd_fix = (S(P) + S(Q)) div 2 − S(M) ≈ 2^F·10^6·JSD_bits
    * (the ppm-grid log2(10^6) offsets cancel between the halves and M
    * up to flooring; convexity of x·log x makes the exact-real value
    * non-negative). Tokens whose ppm floors to 0 drop identically on
    * both engines — they carry < 1/10^6 of the mass each.
    *
    * Scale shape: one (source, token) aggregation feeds everything;
    * the per-source support grid is corpus-vocab × |sources| rows via a
    * broadcast of the |sources|-row totals — vocabulary-sized work per
    * source, never corpus-sized; S(Q) and the corpus total are 1-row
    * grand-total broadcasts (the t11/q14 funnel shape, allowlisted
    * after plan dump).
    */
  def jsDrift(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.IntLog.log2Fixed
    // cached: source totals, the corpus vocab, and the p-side all read
    // the (source, token) counts
    val srcCnt = graft.Caches.track(
      Tables.documents(spark, sfDir)
        .select($"source", explode(Text.toks($"text")).as("token"))
        .groupBy($"source", $"token").agg(count(lit(1)).as("c")))
    val srcTot = srcCnt.groupBy($"source").agg(sum($"c").as("st"))
    // cached: the q-ppm distribution feeds S(Q) and the per-source grid
    val vocab = graft.Caches.track(
      srcCnt.groupBy($"token").agg(sum($"c").as("cc")))
    val nTot = vocab.agg(sum($"cc").as("nn"))
    val q = graft.Caches.track(vocab.crossJoin(broadcast(nTot))
      .select($"token", expr("cc * 1000000 div nn").as("q_ppm")))
    val sQ = q.filter($"q_ppm" >= 1)
      .agg(sum($"q_ppm" * log2Fixed($"q_ppm")).as("s_q"))
    val grid = q.crossJoin(broadcast(srcTot))
      .join(srcCnt, Seq("source", "token"), "left")
      .select($"source", $"st",
        expr("coalesce(c, 0L) * 1000000 div st").as("p_ppm"), $"q_ppm")
      .withColumn("m_ppm", expr("(p_ppm + q_ppm) div 2"))
    val sides = grid.groupBy($"source")
      .agg(max($"st").as("n_tokens"),
        sum(when($"p_ppm" >= 1, $"p_ppm" * log2Fixed($"p_ppm"))
          .otherwise(0L)).as("s_p"),
        sum(when($"m_ppm" >= 1, $"m_ppm" * log2Fixed($"m_ppm"))
          .otherwise(0L)).as("s_m"))
    sides.crossJoin(broadcast(sQ))
      .select($"source", $"n_tokens", $"s_p", $"s_m", $"s_q",
        expr("(s_p + s_q) div 2 - s_m").as("jsd_fix"))
      .orderBy($"source")
  }
}
