package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.streaming.EventStream.{Event, Session}

class EventStreamSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  test("watermarked tumbling windows emit once the watermark passes (append mode)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    val q = EventStream.windowedCounts(mem.toDF(), "10 minutes", "10 minutes")
      .writeStream.format("memory").queryName("wc").outputMode("append").start()
    try {
      // window [0,10): two clicks; [10,20): one view
      mem.addData(
        Event(1, ts(1), 1, "click", 1.0),
        Event(2, ts(5), 2, "click", 2.0),
        Event(3, ts(11), 1, "view", 3.0))
      q.processAllAvailable()
      // nothing emitted yet: watermark = 11min - 10min = 1min < window ends
      spark.table("wc").count() shouldBe 0
      // advance watermark past both windows
      mem.addData(Event(4, ts(45), 3, "click", 4.0))
      q.processAllAvailable()
      val rows = spark.table("wc").collect()
        .map(r => (r.getAs[Timestamp]("window_start").getTime / 60000,
          r.getAs[String]("event_type"), r.getAs[Long]("n"), r.getAs[Double]("sum_value")))
        .toSet
      rows shouldBe Set((0L, "click", 2L, 3.0), (10L, "view", 1L, 3.0))
    } finally q.stop()
  }

  test("benford monitor: per-window census + exact deviations, append-once") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    val q = EventStream.benfordStream(mem.toDF(), "10 minutes", "10 minutes")
      .writeStream.format("memory").queryName("bf").outputMode("append").start()
    try {
      mem.addData(
        Event(1, ts(1), 1, "buy", 1.23), // 123 cents -> digit 1
        Event(2, ts(2), 2, "buy", 9.50), // 950 -> 9
        Event(3, ts(3), 3, "buy", 0.02), // 2 -> 2
        Event(4, ts(4), 4, "buy", 1.00), // 100 -> 1
        Event(5, ts(5), 5, "buy", 0.004), // 0 cents -> filtered out
        Event(6, ts(11), 6, "buy", 5.00)) // next window, 500 -> 5
      q.processAllAvailable()
      spark.table("bf").count() shouldBe 0 // watermark behind both windows
      mem.addData(Event(7, ts(45), 7, "buy", 3.0))
      q.processAllAvailable()
      val rows = spark.table("bf").collect()
        .map(r => (r.getAs[Timestamp]("window_start").getTime / 60000,
          r.getAs[Int]("digit")) ->
          ((r.getAs[Long]("n_window"), r.getAs[Long]("n_obs"),
            r.getAs[Long]("dev")))).toMap
      // both closed windows emit all 9 digits exactly once
      rows.size shouldBe 18
      val exp = graft.operators.Relational.BenfordPpm.toMap
      // window [0,10): n=4 (the 0-cent row is filtered), census 1:2 2:1 9:1
      val w0 = Map(1 -> 2L, 2 -> 1L, 9 -> 1L).withDefaultValue(0L)
      (1 to 9).foreach { d =>
        rows((0L, d)) shouldBe ((4L, w0(d), w0(d) * 1000000L - 4L * exp(d)))
      }
      // window [10,20): the single 5.00 event
      (1 to 9).foreach { d =>
        val o = if (d == 5) 1L else 0L
        rows((10L, d)) shouldBe ((1L, o, o * 1000000L - exp(d)))
      }
    } finally q.stop()
  }

  test("correlation monitor: per-window exact moments, q64 algebra, append-once") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    val q = EventStream.corrStream(mem.toDF(), "10 minutes", "10 minutes")
      .writeStream.format("memory").queryName("cm").outputMode("append").start()
    try {
      // window [0,10): errors carry the high amounts — positive corr
      mem.addData(
        Event(1, ts(1), 1, "error", 9.00),
        Event(2, ts(2), 2, "click", 1.00),
        Event(3, ts(3), 3, "error", 8.00),
        Event(4, ts(4), 4, "view", 2.00),
        // window [10,20): constant amounts — zero variance, NULL r²
        Event(5, ts(11), 5, "click", 3.00),
        Event(6, ts(12), 6, "error", 3.00))
      q.processAllAvailable()
      spark.table("cm").count() shouldBe 0
      mem.addData(Event(7, ts(45), 7, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("cm").collect()
        .map(r => r.getAs[Timestamp]("window_start").getTime / 60000 ->
          ((r.getAs[Long]("n"), r.getAs[Int]("r_sign"),
            if (r.isNullAt(3)) None else Some(r.getAs[Long]("r2_ppm")))))
        .toMap
      rows.keySet shouldBe Set(0L, 10L)
      // window 0: x = (900,100,800,200), z = (1,0,1,0) — driver algebra
      val (xs, zs) = (Seq(900L, 100L, 800L, 200L), Seq(1L, 0L, 1L, 0L))
      val n = BigInt(4)
      val num = n * xs.zip(zs).map { case (a, b) => BigInt(a) * b }.sum -
        BigInt(xs.sum) * zs.sum
      val dx = n * xs.map(a => BigInt(a) * a).sum - BigInt(xs.sum) * xs.sum
      val dy = n * zs.map(a => BigInt(a) * a).sum - BigInt(zs.sum) * zs.sum
      val r2 = (num * num / dx * 1000000 / dy).toLong
      rows(0L) shouldBe ((4L, num.signum, Some(r2)))
      num.signum shouldBe 1 // errors carry the big amounts
      // window 10: zero x-variance — NULL r², sign 0
      rows(10L) shouldBe ((2L, 0, None))
    } finally q.stop()
  }

  test("ewma stream equals the q65 batch table across an arrival split; " +
      "stale redelivery is invisible") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val evs = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .collect()
      .map(r => Event(r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    // global (ts, event_id) order implies each user's order, so the
    // split respects the twin's per-user cross-batch order contract
    val sorted = evs.sortBy(e => (e.ts.getTime, e.event_id))
    val (b1, b2) = sorted.splitAt(sorted.length / 2)
    val mem = MemoryStream[Event]
    val q = EventStream.ewmaStream(mem.toDF())
      .writeStream.format("memory").queryName("ew").outputMode("append")
      .start()
    try {
      mem.addData(b1.toSeq)
      q.processAllAvailable()
      mem.addData(b1.takeRight(20).toSeq) // stale redelivery — dropped
      q.processAllAvailable()
      mem.addData(b2.toSeq)
      q.processAllAvailable()
      val got = spark.table("ew").collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3))))
      val exp = graft.operators.Relational
        .ewmaSmooth(spark, "/root/testdata/sf0.001").collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3))))
      graft.Caches.releaseAll(spark)
      got.toMap shouldBe exp.toMap
      got.length shouldBe exp.length // exactly once despite redelivery
    } finally q.stop()
  }

  test("streaming top-n per group equals the batch rank window across an arrival split with redelivery") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val evs = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .collect()
      .map(r => Event(r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    val sorted = evs.sortBy(e => (e.ts.getTime, e.event_id))
    val (b1, b2) = sorted.splitAt(sorted.length / 2)
    val mem = MemoryStream[Event]
    val q = EventStream.topNStream(mem.toDF(), n = 3)
      .writeStream.format("memory").queryName("topn").outputMode("append")
      .start()
    try {
      mem.addData(b1.toSeq)
      q.processAllAvailable()
      mem.addData(b1.takeRight(25).toSeq) // stale redelivery — dropped
      q.processAllAvailable()
      val seqAfterReplay = spark.table("topn")
        .groupBy($"event_type").agg(max($"seq").as("s")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      mem.addData(b2.toSeq)
      q.processAllAvailable()
      // replays emitted NO new snapshot (seq unchanged until b2)
      val finalSeq = spark.table("topn")
        .groupBy($"event_type").agg(max($"seq").as("s")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      finalSeq.foreach { case (g, s) => s shouldBe seqAfterReplay(g) + 1 }
      // the max-seq snapshot per group == the batch rank window
      val all = spark.table("topn").collect()
        .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("seq"),
          r.getAs[Int]("rank"), r.getAs[Long]("event_id"),
          r.getAs[Long]("cents")))
      val maxSeq = all.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      val lastSnap = all.filter(t => t._2 == maxSeq(t._1))
        .map(t => (t._1, t._3) -> ((t._4, t._5))).toMap
      val w = Window.partitionBy($"event_type")
        .orderBy($"cents".desc, $"event_id")
      val exp = graft.Tables.events(spark, "/root/testdata/sf0.001")
        .select($"event_type", $"event_id",
          round($"value" * 100, 0).cast("bigint").as("cents"))
        .withColumn("rank", row_number().over(w).cast("int"))
        .filter($"rank" <= 3)
        .collect()
        .map(r => (r.getString(0), r.getAs[Int]("rank")) ->
          ((r.getLong(1), r.getLong(2)))).toMap
      graft.Caches.releaseAll(spark)
      lastSnap shouldBe exp
    } finally q.stop()
  }

  test("gap sessionization closes a session when the gap is exceeded") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    val q = EventStream.sessionize(mem.toDS(), gapMs = 30 * 60000L)
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      mem.addData(
        Event(1, ts(100), 7, "click", 1.0),
        Event(2, ts(110), 7, "view", 1.0),
        Event(3, ts(120), 7, "click", 1.0))
      q.processAllAvailable()
      spark.table("sess").count() shouldBe 0 // session still open
      // 2h later → closes the first session on arrival
      mem.addData(Event(4, ts(240), 7, "click", 1.0))
      q.processAllAvailable()
      val s = spark.table("sess").as[Session].collect()
      s.length shouldBe 1
      s(0).user_id shouldBe 7L
      s(0).session_start shouldBe ts(100)
      s(0).session_end shouldBe ts(120)
      s(0).n_events shouldBe 3
    } finally q.stop()
  }

  test("continuous ORC ingestion: file stream → checkpointed ORC sink") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("evstream")
    val inDir = dir.resolve("in").toString
    val outDir = dir.resolve("out").toString
    val ckpt = dir.resolve("ckpt").toString
    // stage a batch of events as the stream input
    graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .limit(200).write.parquet(inDir)
    val q = EventStream.toOrcSink(EventStream.fromFiles(spark, inDir), outDir, ckpt)
    try q.processAllAvailable() finally q.stop()
    spark.read.orc(outDir).count() shouldBe 200
    // restart resumes from the checkpoint without re-ingesting
    val q2 = EventStream.toOrcSink(EventStream.fromFiles(spark, inDir), outDir, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    spark.read.orc(outDir).count() shouldBe 200 // exactly-once
  }

  test("fully-late events never abort the sessionize query") {
    // Spark filters rows behind the watermark before they reach the
    // state function, so a late-only group normally cannot set an
    // illegal (behind-watermark) timeout — this pins that contract: the
    // late event is dropped, the query stays alive, and later on-time
    // data still sessionizes. (EventStream.sessionize additionally
    // clamps end+gap <= watermark defensively should the late-row
    // filter ever admit such a row.)
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    val q = EventStream.sessionize(mem.toDS(), gapMs = 30 * 60000L)
      .writeStream.format("memory").queryName("lateclose").outputMode("append").start()
    try {
      // user 1 advances the watermark to minute 600 - 60 = 540
      mem.addData(Event(1, ts(600), 1, "click", 1.0))
      q.processAllAvailable()
      // user 2 arrives entirely late: 400 + 30min gap = 430 <= 540
      mem.addData(Event(2, ts(400), 2, "click", 1.0))
      q.processAllAvailable()
      q.exception shouldBe empty
      spark.table("lateclose").as[Session].collect()
        .count(_.user_id == 2L) shouldBe 0 // dropped as late, not crashed
      // the stream keeps processing on-time data afterwards
      mem.addData(Event(3, ts(700), 1, "click", 1.0),
        Event(4, ts(800), 3, "view", 1.0))
      q.processAllAvailable()
      q.exception shouldBe empty
    } finally q.stop()
  }

  test("sessionize closes an idle session by TIMEOUT, not just on arrival") {
    // the state.hasTimedOut branch: no further events for the user —
    // the watermark alone (advanced by OTHER users) must flush the
    // pending session once it passes end+gap
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    val q = EventStream.sessionize(mem.toDS(), gapMs = 30 * 60000L)
      .writeStream.format("memory").queryName("timeoutclose").outputMode("append").start()
    try {
      mem.addData(Event(1, ts(100), 5, "click", 1.0)) // opens; timeout at 130
      q.processAllAvailable()
      spark.table("timeoutclose").count() shouldBe 0
      // another user pushes the watermark to 700-60=640 (> 130) ...
      mem.addData(Event(2, ts(700), 6, "click", 1.0))
      q.processAllAvailable()
      // ... and the NEXT batch evaluates timeouts against it
      mem.addData(Event(3, ts(710), 6, "view", 1.0))
      q.processAllAvailable()
      val s = spark.table("timeoutclose").as[Session].collect()
        .filter(_.user_id == 5L)
      s.length shouldBe 1
      s(0).session_start shouldBe ts(100)
      s(0).session_end shouldBe ts(100)
      s(0).n_events shouldBe 1
    } finally q.stop()
  }

  test("streaming exact-dedup keeps first occurrence, drops copies") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import EventStream.Doc
    val mem = MemoryStream[Doc]
    val q = EventStream.dedupDocStream(mem.toDS())
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      mem.addData(
        Doc(1, ts(100), "alpha"),
        Doc(2, ts(101), "alpha"), // dup of 1 in the same batch
        Doc(3, ts(102), "beta"))
      q.processAllAvailable()
      mem.addData(Doc(4, ts(110), "alpha")) // dup arriving a batch later
      q.processAllAvailable()
      val ids = spark.table("dedup").collect().map(_.getAs[Long]("doc_id")).sorted
      ids shouldBe Array(1L, 3L)
    } finally q.stop()
  }

  test("stream-batch parity: streaming 1-day windows == batch aggregation") {
    import java.nio.file.Files
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("evparity")
    val inDir = dir.resolve("in").toString
    val base = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "event_type", "value")
    base.write.parquet(inDir)
    val staged = spark.read.parquet(inDir)

    val q = EventStream.windowedCounts(
        EventStream.fromFiles(spark, inDir), "1 day", "10 minutes")
      .writeStream.format("memory").queryName("parity").outputMode("append").start()
    try {
      q.processAllAvailable()
      // append-mode: the last real windows only emit once the watermark
      // passes them — a far-future sentinel file flushes everything
      val maxTs = staged.agg(max($"ts")).head().getTimestamp(0)
      Seq((999999L, new Timestamp(maxTs.getTime + 40L * 86400000), 999L, "zz_sentinel", 0.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
        .write.mode("append").parquet(inDir)
      q.processAllAvailable()

      val streamed = spark.table("parity")
        .filter($"event_type" =!= "zz_sentinel")
        .select($"window_start", $"event_type", $"n", round($"sum_value", 4).as("s"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val batch = staged
        .groupBy(window($"ts", "1 day"), $"event_type")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 4).as("s"))
        .select($"window.start", $"event_type", $"n", $"s")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      streamed.nonEmpty shouldBe true
      streamed shouldBe batch
    } finally q.stop()
  }

  test("fromFiles streams the events parquet directory shape") {
    // schema-compatibility check against the batch loader's reconstructed ts
    val batch = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "event_type", "value")
    batch.schema.fields.map(f => (f.name, f.dataType)) shouldBe
      EventStream.EventSchema.fields.map(f => (f.name, f.dataType))
  }

  test("streaming near-dup flags exact copies across micro-batches, skips unrelated docs") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import EventStream.Doc
    val alpha = (1 to 30).map(i => s"tok$i").mkString(" ")
    val beta = (1 to 30).map(i => s"other$i word$i").mkString(" ")
    val mem = MemoryStream[Doc]
    val q = EventStream.nearDupDocStream(mem.toDS())
      .writeStream.format("memory").queryName("neardup").outputMode("append").start()
    try {
      mem.addData(
        Doc(1, ts(100), alpha),
        Doc(2, ts(101), beta),
        Doc(3, ts(102), alpha)) // same-batch exact copy of 1
      q.processAllAvailable()
      mem.addData(Doc(4, ts(110), alpha)) // copy arriving a batch later
      q.processAllAvailable()
      mem.addData(Doc(4, ts(111), alpha)) // at-least-once REPLAY of doc 4
      q.processAllAvailable()
      val got = spark.table("neardup").as[EventStream.NearDup].collect()
        .map(n => (n.doc_id, n.match_id, n.hamming)).toList.sorted
      // 3 matches 1 in-batch; 4 matches both 1 and 3 from state — each
      // pair EXACTLY ONCE (identical sigs share both bands; the lo band
      // defers) and the replay adds nothing (no self pair, no re-emit)
      got shouldBe List((3L, 1L, 0), (4L, 1L, 0), (4L, 3L, 0))
    } finally q.stop()
  }

  test("streaming term stats converge to the batch inverted-index statistics") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import EventStream.Doc
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter($"doc_id" < 30).orderBy($"doc_id")
      .collect().map(r => Doc(r.getLong(0), ts(100 + r.getLong(0)), r.getString(1)))

    val mem = MemoryStream[Doc]
    val q = EventStream.termStatsStream(mem.toDS())
      .writeStream.format("memory").queryName("termstats").outputMode("complete").start()
    try {
      val (a, b) = docs.splitAt(15)
      mem.addData(a: _*); q.processAllAvailable()
      mem.addData(b: _*); q.processAllAvailable()
      // at-least-once REPLAY within the watermark horizon: must not
      // double-count tf (the dedup stage absorbs it)
      mem.addData(docs.head); q.processAllAvailable()

      val streamed = spark.table("termstats").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val batch = docs.toSeq.toDF("doc_id", "ts", "text")
        .select($"doc_id", explode(graft.functions.Text.toks($"text")).as("term"))
        .groupBy($"term")
        .agg(count(lit(1)).as("tf"), count_distinct($"doc_id").as("df"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

      streamed.keySet shouldBe batch.keySet
      batch.foreach { case (term, (tf, df)) =>
        withClue(s"term $term: ") {
          streamed(term)._1 shouldBe tf // exact running tf
          // HLL df within 5% (5x the configured rsd), the q22 bound
          math.abs(streamed(term)._2 - df).toDouble should be <= (0.05 * df max 1.0)
        }
      }
    } finally q.stop()
  }

  test("streaming count-min sketch equals the batch cells at end-of-stream") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import EventStream.Doc
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter($"doc_id" < 40).orderBy($"doc_id")
      .collect().map(r => Doc(r.getLong(0), ts(100 + r.getLong(0)), r.getString(1)))
    val mem = MemoryStream[Doc]
    val q = EventStream.countMinStream(mem.toDS())
      .writeStream.format("memory").queryName("cmsketch")
      .outputMode("complete").start()
    try {
      val (a, b) = docs.splitAt(20)
      mem.addData(a: _*); q.processAllAvailable()
      mem.addData(b: _*); q.processAllAvailable()
      val streamed = spark.table("cmsketch").collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      val batch = graft.operators.TextAnalysis.countMinSketch(
          docs.toSeq.toDF("doc_id", "ts", "text"))
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      streamed shouldBe batch
      // and the heavy-hitter probe over the STREAMED cells equals the
      // batch composition end-to-end — the sketch-built-elsewhere
      // contract heavyHittersFromCells exists for
      import org.apache.spark.sql.{functions => F}
      val batchDf = docs.toSeq.toDF("doc_id", "ts", "text")
      val cands = batchDf
        .select(F.explode(graft.functions.Text.toks(F.col("text"))).as("gram"))
        .groupBy("gram").count()
        .orderBy(F.col("count").desc, F.col("gram")).limit(10)
        .select("gram")
      val fromStream = graft.operators.TextAnalysis.heavyHittersFromCells(
          spark.table("cmsketch"), cands).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      val fromBatch = graft.operators.TextAnalysis.heavyHitters(
          batchDf, cands).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      fromStream.toSeq shouldBe fromBatch.toSeq
    } finally q.stop()
  }

  test("near-dup opt-in maxBucketSize keeps newest fingerprints (documented recall trade)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import EventStream.Doc
    val alpha = (1 to 30).map(i => s"tok$i").mkString(" ")
    val mem = MemoryStream[Doc]
    // cap = 1: each bucket retains only its newest fingerprint
    val q = EventStream.nearDupDocStream(mem.toDS(), maxBucketSize = 1)
      .writeStream.format("memory").queryName("neardup_capped")
      .outputMode("append").start()
    try {
      mem.addData(Doc(1, ts(100), alpha)); q.processAllAvailable()
      mem.addData(Doc(2, ts(101), alpha)); q.processAllAvailable() // pairs with 1, evicts it
      mem.addData(Doc(3, ts(102), alpha)); q.processAllAvailable() // sees only 2
      val got = spark.table("neardup_capped").as[EventStream.NearDup].collect()
        .map(n => (n.doc_id, n.match_id)).toList.sorted
      // (3,1) is MISSED by design — doc 1 was evicted before 3 arrived;
      // everything emitted is a true pair and nothing is duplicated
      got shouldBe List((2L, 1L), (3L, 2L))
    } finally q.stop()
  }

  test("term stats absorb ENTIRE batches replayed twice within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import EventStream.Doc
    // the single-doc replay above is the easy case; an at-least-once
    // source can redeliver a WHOLE micro-batch (e.g. after a sink
    // retry) — tf must stay exact as long as redelivery lands within
    // the dedup watermark horizon
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter($"doc_id" < 20).orderBy($"doc_id")
      .collect().map(r => Doc(r.getLong(0), ts(100 + r.getLong(0)), r.getString(1)))
    val mem = MemoryStream[Doc]
    val q = EventStream.termStatsStream(mem.toDS())
      .writeStream.format("memory").queryName("termstats_replay")
      .outputMode("complete").start()
    try {
      val (a, b) = docs.splitAt(10)
      mem.addData(a: _*); q.processAllAvailable()
      mem.addData(a: _*); q.processAllAvailable() // batch A redelivered whole
      mem.addData(b: _*); q.processAllAvailable()
      mem.addData(b: _*); q.processAllAvailable() // batch B redelivered whole
      val streamed = spark.table("termstats_replay").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val batch = docs.toSeq.toDF("doc_id", "ts", "text")
        .select(explode(graft.functions.Text.toks($"text")).as("term"))
        .groupBy($"term").agg(count(lit(1)).as("tf"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      streamed.keySet shouldBe batch.keySet
      batch.foreach { case (term, tf) =>
        withClue(s"term $term: ") { streamed(term) shouldBe tf }
      }
    } finally q.stop()
  }

  test("streaming near-dup pairs equal the batch recomputation over the same docs") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import EventStream.Doc
    // real corpus slice: 40 documents from sf0.001 (plant an exact dup)
    val texts = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter($"doc_id" < 40).orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val docs = texts.map { case (id, t) => Doc(id, ts(100 + id), t) } :+
      Doc(1000L, ts(200), texts.head._2)

    val mem = MemoryStream[Doc]
    val q = EventStream.nearDupDocStream(mem.toDS())
      .writeStream.format("memory").queryName("ndparity").outputMode("append").start()
    try {
      val (first, second) = docs.splitAt(20)
      mem.addData(first: _*); q.processAllAvailable()
      mem.addData(second: _*); q.processAllAvailable()
      val streamed = spark.table("ndparity").as[EventStream.NearDup].collect()
        .map(n => (n.doc_id, n.match_id, n.hamming)).toSet

      // batch twin: same signature column, the batch pass's TWO-BAND
      // union (hi or lo 16 bits equal), all ordered pairs at hamming <= 3
      val sigs = docs.toSeq.toDF("doc_id", "ts", "text")
        .withColumn("sig", EventStream.docSimhashCol($"text"))
        .filter(org.apache.spark.sql.functions.size(
          EventStream.docSidsCol($"text")) > 0)
        .select($"doc_id", $"sig")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val expected = (for {
        (a, sa) <- sigs
        (b, sb) <- sigs
        if a < b
        if (sa >>> 16) == (sb >>> 16) || (sa & 0xFFFFL) == (sb & 0xFFFFL)
        h = java.lang.Long.bitCount(sa ^ sb)
        if h <= 3
      } yield (b, a, h)).toSet
      expected.nonEmpty shouldBe true // the planted dup at minimum
      streamed shouldBe expected
    } finally q.stop()
  }

  test("running per-user aggregates match the batch twin at end of stream") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val evs = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val mem = MemoryStream[Event]
    val q = EventStream.runningAggStream(mem.toDF())
      .writeStream.format("memory").queryName("ragg")
      .outputMode("complete").start()
    try {
      // two arrival batches: the state store must MERGE the second
      // batch's partials into the first's — the q43 law at ingest time
      mem.addData(evs.take(400).toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(evs.drop(400).toIndexedSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("ragg").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      // the IDENTICAL plan in batch (one-definition rule)
      val batch = EventStream.runningAggStream(
          spark.createDataset(evs.toIndexedSeq).toDF())
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      batch should not be empty
      streamed shouldBe batch
    } finally q.stop()
  }

  test("stream-stream interval join matches its batch twin (view→purchase attribution)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // the real event table, streamed in arrival order across two batches
    val evs = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val mem = MemoryStream[Event]
    val q = EventStream.intervalJoinStream(mem.toDF(), maxDelayMin = 720,
        watermark = "1 hour")
      .writeStream.format("memory").queryName("ivj").outputMode("append").start()
    try {
      mem.addData(evs.take(500).toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(evs.drop(500).toIndexedSeq: _*)
      q.processAllAvailable()
      // flush both sides' watermarks far past every real event; distinct
      // negative user_ids so the flush rows can never join each other
      val far = evs.map(_.ts.getTime).max + 2000L * 60000L
      mem.addData(
        Event(-1, new Timestamp(far), -1, "view", 0.0),
        Event(-2, new Timestamp(far), -2, "purchase", 0.0))
      q.processAllAvailable()
      val got = spark.table("ivj").filter($"a_id" >= 0 && $"b_id" >= 0)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // the IDENTICAL plan in batch (withWatermark is a no-op there)
      val batch = EventStream.intervalJoinStream(
          spark.createDataset(evs.toIndexedSeq).toDF(), maxDelayMin = 720,
          watermark = "1 hour")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      batch should not be empty
      got shouldBe batch
    } finally q.stop()
  }

  test("chained gap-joins: streaming chains == batch chains == q49's aggregate") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{count, lit, max, min}
    val sf = "/root/testdata/sf0.001"
    val evs = graft.Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val mem = MemoryStream[Event]
    val q = EventStream.gapChainStream(mem.toDF(), watermark = "1 hour")
      .writeStream.format("memory").queryName("gapchain")
      .outputMode("append").start()
    try {
      mem.addData(evs.take(500).toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(evs.drop(500).toIndexedSeq: _*)
      q.processAllAvailable()
      // flush the chained joins' watermarks far past every real event;
      // distinct negative users so flush rows can never chain
      val far = evs.map(_.ts.getTime).max + 100000L * 60000L
      mem.addData(
        Event(-1, new Timestamp(far), -1, "view", 0.0),
        Event(-2, new Timestamp(far), -2, "click", 0.0),
        Event(-3, new Timestamp(far), -3, "purchase", 0.0))
      q.processAllAvailable()
      val got = spark.table("gapchain").filter($"v_id" >= 0)
        .select($"user_id", $"v_id", $"c_id", $"p_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      // the IDENTICAL plan in batch (withWatermark is a no-op there)
      val batchRows = EventStream.gapChainStream(
          spark.createDataset(evs.toIndexedSeq).toDF(), watermark = "1 hour")
        .select($"user_id", $"v_id", $"c_id", $"p_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      batchRows should not be empty
      got shouldBe batchRows
      // one-definition rule: grouping the chain rows per user IS q49
      val agg = EventStream.gapChainStream(
          spark.createDataset(evs.toIndexedSeq).toDF())
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n"), min($"v_us").as("f"),
          max($"p_us").as("l"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      val q49 = graft.operators.Relational.gapChains(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      agg shouldBe q49
    } finally q.stop()
  }

  test("left-outer interval join emits exactly the watermark-proven unattributed views") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val evs = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val mem = MemoryStream[Event]
    val q = EventStream.unattributedStream(mem.toDF(), maxDelayMin = 720,
        watermark = "1 hour")
      .writeStream.format("memory").queryName("ivlo").outputMode("append").start()
    try {
      mem.addData(evs.take(500).toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(evs.drop(500).toIndexedSeq: _*)
      q.processAllAvailable()
      // push both watermarks far past every view's eviction horizon so
      // each real view's match/no-match is decided; the flush rows
      // themselves stay in state (the watermark never passes them) and
      // the negative ids are filtered regardless
      val far = evs.map(_.ts.getTime).max + 2000L * 60000L
      mem.addData(
        Event(-1, new Timestamp(far), -1, "view", 0.0),
        Event(-2, new Timestamp(far), -2, "purchase", 0.0))
      q.processAllAvailable()
      val got = spark.table("ivlo").filter($"a_id" >= 0)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // the IDENTICAL plan in batch = NOT EXISTS over the interval
      val batch = EventStream.unattributedStream(
          spark.createDataset(evs.toIndexedSeq).toDF(), maxDelayMin = 720,
          watermark = "1 hour")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      batch should not be empty
      got shouldBe batch
      // complement check: attributed (q35 shape) and unattributed a_ids
      // partition the view set
      val attributed = EventStream.intervalJoinStream(
          spark.createDataset(evs.toIndexedSeq).toDF(), maxDelayMin = 720,
          watermark = "1 hour")
        .select($"a_id").as[Long].collect().toSet
      val views = evs.filter(_.event_type == "view").map(_.event_id).toSet
      (batch.map(_._2) ++ attributed) shouldBe views
      batch.map(_._2).intersect(attributed) shouldBe empty
    } finally q.stop()
  }

  test("streaming token budget admits the batch prefix (arrival = doc_id order)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.{functions => F}
    import spark.implicits._
    import EventStream.Doc
    // the real documents table, streamed in doc_id order across batches
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .orderBy($"doc_id").select($"doc_id", $"text").collect()
      .map(r => Doc(r.getLong(0), ts(r.getLong(0)), r.getString(1)))
    val mem = MemoryStream[Doc]
    val q = EventStream.tokenBudgetStream(mem.toDS())
      .writeStream.format("memory").queryName("budget").outputMode("append").start()
    try {
      mem.addData(docs.take(200).toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(docs.drop(200).toIndexedSeq: _*)
      q.processAllAvailable()
      val got = spark.table("budget").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      // batch twin: same sharding + token counts, cumulative sum in the
      // SAME doc_id (arrival) order, prefix filter at the budget
      val w = Window.partitionBy($"shard").orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val expect = graft.Tables.documents(spark, "/root/testdata/sf0.001")
        .withColumn("shard",
          (graft.operators.Sampling.hashBucket($"text") % 8).cast("int"))
        .withColumn("n_tokens", graft.functions.Text.tokenCount($"text").cast("bigint"))
        .filter($"n_tokens" > 0)
        .withColumn("cum_tokens", F.sum($"n_tokens").over(w))
        .filter($"cum_tokens" <= 2000)
        .select($"shard", $"doc_id", $"n_tokens", $"cum_tokens").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      expect should not be empty
      // both directions: the stream admitted exactly the batch prefix,
      // with identical running totals
      got shouldBe expect
      // and every shard really closed (some doc was rejected somewhere)
      val admitted = got.map(_._2)
      admitted.size.toLong should be < graft.Tables.documents(
        spark, "/root/testdata/sf0.001").count()
    } finally q.stop()
  }

  test("streaming HLL registers equal the batch q38 registers, even under redelivery") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import EventStream.LangDoc
    val docsDf = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter($"doc_id" < 120)
    val docs = docsDf.orderBy($"doc_id").collect().map(r =>
      LangDoc(r.getAs[Long]("doc_id"), ts(100 + r.getAs[Long]("doc_id")),
        r.getAs[String]("lang"), r.getAs[String]("text")))
    val mem = MemoryStream[LangDoc]
    val q = EventStream.hllRegisterStream(mem.toDS())
      .writeStream.format("memory").queryName("hllregs")
      .outputMode("complete").start()
    try {
      val (a, b) = docs.splitAt(docs.length / 2)
      mem.addData(a: _*); q.processAllAvailable()
      // redeliver the whole first half (at-least-once source) — the
      // idempotent insert must leave every register untouched
      mem.addData(a: _*); q.processAllAvailable()
      val afterRedeliver = spark.table("hllregs").collect()
        .map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap
      val batchA = graft.operators.Relational.hllRegisters(
          docsDf.filter($"doc_id" < docs(a.length).doc_id))
        .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap
      afterRedeliver shouldBe batchA
      mem.addData(b: _*); q.processAllAvailable()
      val streamed = spark.table("hllregs").collect()
        .map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap
      val batch = graft.operators.Relational.hllRegisters(docsDf)
        .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap
      streamed shouldBe batch
      // and the registers feed the same estimate the gated q38 emits
      streamed.keySet.map(_._1) shouldBe batch.keySet.map(_._1)
    } finally q.stop()
  }

  test("streaming bitmap registers equal the batch q51 bitmaps, even under redelivery") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import EventStream.Event
    val evDf = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .filter($"event_id" < 400)
    val evs = evDf.orderBy($"event_id").collect().map(r =>
      Event(r.getAs[Long]("event_id"), r.getAs[Timestamp]("ts"),
        r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Double]("value")))
    val mem = MemoryStream[Event]
    val q = EventStream.bitmapRegisterStream(mem.toDF())
      .writeStream.format("memory").queryName("bitmapregs")
      .outputMode("complete").start()
    def table(): Map[(String, Long), Long] = spark.table("bitmapregs")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    def batchOf(df: org.apache.spark.sql.DataFrame): Map[(String, Long), Long] =
      graft.operators.Relational.typeUserBitmaps(
          df.select($"event_type", $"user_id"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
        .toMap
    try {
      val (a, b) = evs.splitAt(evs.length / 2)
      mem.addData(a: _*); q.processAllAvailable()
      // redeliver the whole first half (at-least-once source) — the
      // idempotent bit_or must leave every word untouched
      mem.addData(a: _*); q.processAllAvailable()
      val afterRedeliver = table()
      afterRedeliver shouldBe batchOf(
        evDf.filter($"event_id" < evs(a.length).event_id))
      mem.addData(b: _*); q.processAllAvailable()
      val streamed = table()
      val batch = batchOf(evDf)
      streamed shouldBe batch
      // the words carry real multi-user lanes (packing is happening)
      streamed.values.count(w => java.lang.Long.bitCount(w) > 1) should be > 0
    } finally q.stop()
  }

  test("streaming corpus diff converges to the batch d19 report") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import EventStream.LangDoc
    val all = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter($"doc_id" < 80)
    // the d16/d19 parity split: even = history snapshot, odd = new crawl
    val hist = all.filter($"doc_id" % 2 === 0)
    val newDf = all.filter($"doc_id" % 2 === 1)
    val newDocs = newDf.orderBy($"doc_id").collect().map(r =>
      LangDoc(r.getAs[Long]("doc_id"), ts(100 + r.getAs[Long]("doc_id")),
        r.getAs[String]("lang"), r.getAs[String]("text")))

    val mem = MemoryStream[LangDoc]
    val q = EventStream.corpusDiffStream(mem.toDS(), hist)
      .writeStream.format("memory").queryName("cdiff")
      .outputMode("complete").start()
    try {
      val (a, b) = newDocs.splitAt(newDocs.length / 2)
      mem.addData(a: _*); q.processAllAvailable()
      mem.addData(b: _*); q.processAllAvailable()
      // at-least-once replay within the watermark: no double count
      mem.addData(newDocs.head); q.processAllAvailable()

      val streamed = spark.table("cdiff").collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val batch = graft.operators.Dedup.corpusDiffFrames(hist, newDf)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

      // every language the stream carried must agree exactly with the
      // batch (n_added, n_removed, n_retained); languages absent from
      // the stream are the documented all-removed static case
      val streamLangs = newDocs.map(_.lang).toSet
      streamed.keySet shouldBe streamLangs
      streamLangs.foreach { lang =>
        withClue(s"lang $lang: ") {
          streamed(lang) shouldBe batch(lang)
        }
      }
    } finally q.stop()
  }

  test("streaming SCD1 upsert matches the batch merge at end of stream, " +
      "and a redelivery cannot change the winner") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val evs = graft.Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val mem = MemoryStream[Event]
    val q = EventStream.upsertStream(mem.toDF())
      .writeStream.format("memory").queryName("ups")
      .outputMode("update").start()
    try {
      // two arrival batches, PLUS the first 200 events redelivered in
      // the second batch: latest-wins is idempotent, so the duplicate
      // delivery must be invisible in the final state
      mem.addData(evs.take(400).toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData((evs.drop(400) ++ evs.take(200)).toIndexedSeq: _*)
      q.processAllAvailable()
      // final snapshot = each user's LAST update row (max last_us wins)
      val streamed = spark.table("ups").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
          r.getLong(3), r.getBoolean(4))))
        .groupBy(_._1).map { case (u, rows) =>
          (u, rows.maxBy(x => (x._2._2, x._2._1))._2)
        }
      // batch twin: live rows from mergeUpsert; tombstoned users are
      // exactly the users absent there but present on the stream
      val live = graft.operators.Relational.mergeUpsert(spark, sf).collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
          r.getLong(3), true))).toMap
      live should not be empty
      val allUsers = evs.map(_.user_id).toSet
      streamed.keySet shouldBe allUsers
      for ((u, (eid, us, cents, isLive)) <- streamed) withClue(s"user $u: ") {
        live.get(u) match {
          case Some((beid, bus, bcents, _)) =>
            (eid, us, cents, isLive) shouldBe ((beid, bus, bcents, true))
          case None => isLive shouldBe false // tombstone survived
        }
      }
      // the tombstone branch is non-vacuous
      streamed.values.count(!_._4) should be > 0
    } finally q.stop()
  }

  test("streaming transition counts match the q57 batch matrix across " +
      "an arrival split") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val evs = graft.Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val mem = MemoryStream[Event]
    val q = EventStream.transitionStream(mem.toDF())
      .writeStream.format("memory").queryName("trans")
      .outputMode("complete").start()
    try {
      // time-ordered arrival split: per-user order preserved, and the
      // SPLIT-SPANNING transitions (last event of batch 1 -> first of
      // batch 2 per user) must come from state, not the batch
      mem.addData(evs.take(400).toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(evs.drop(400).toIndexedSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("trans").collect()
        .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
      val batch = graft.operators.Relational.eventTransitions(spark, sf)
        .collect()
        .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
      batch should not be empty
      streamed shouldBe batch
    } finally q.stop()
  }

  test("streaming islands converge to the WHOLE q60 batch table (open " +
      "finals emit on event-time timeout), across an arrival split, with " +
      "a sub-watermark redelivery invisible") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val evs = graft.Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val mem = MemoryStream[Event]
    val q = EventStream.islandStream(mem.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("islands")
      .outputMode("append").start()
    try {
      // the split lands mid-island for some users — those islands must
      // extend THROUGH state, not restart
      mem.addData(evs.take(400).toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(evs.drop(400).toIndexedSeq: _*)
      q.processAllAvailable()
      // mid-run sanity: nothing emitted yet can be an OPEN island
      val midCount = spark.table("islands").count()
      // drain the watermark past every real island's hull end with a
      // sentinel heartbeat for a user id absent from the data: wm =
      // sentinelTs - 10 min = maxTs + 110 min > any end (<= maxTs + 30
      // min). The sentinel's OWN island stays open (its end is beyond
      // the final watermark) so it never emits.
      val maxMs = evs.map(_.ts.getTime).max
      val sentinel = Event(10000000L,
        new java.sql.Timestamp(maxMs + 120L * 60 * 1000), 999L, "view", 0.0)
      mem.addData(sentinel)
      q.processAllAvailable()
      // stale redelivery behind the watermark: must be INVISIBLE — it
      // cannot reopen, renumber, or duplicate any island
      mem.addData(evs.take(100).toIndexedSeq: _*)
      q.processAllAvailable()
      val rows = spark.table("islands").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSeq
      // exactly-once per island: no duplicates across close + timeout
      rows.size shouldBe rows.toSet.size
      val batch = graft.operators.Relational.intervalIslands(spark, sf)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSet
      // FULL convergence: every batch row including each user's final
      // (formerly open) island — the r11 twin stopped at batch-minus-open
      rows.toSet shouldBe batch
      // the timeout path was genuinely exercised: open finals emitted
      // only after the sentinel drained the watermark
      midCount should be < batch.size.toLong
      batch should not be empty
    } finally q.stop()
  }

  test("streaming CUSUM matches the q50 batch chart across an arrival " +
    "split (one-definition rule: recursion here, window identity there)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val evs = graft.Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    // the fixed reference level: the batch twin's floor'd global mean
    val cents = evs.map(e => math.round(e.value * 100))
    val mu = cents.sum / cents.length
    val mem = MemoryStream[Event]
    val q = EventStream.cusumStream(mem.toDF(), mu)
      .writeStream.format("memory").queryName("cusum")
      .outputMode("update").start()
    try {
      // two arrival batches split in TIME order — per-user order is
      // preserved, which is the operator's documented contract
      mem.addData(evs.take(400).toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(evs.drop(400).toIndexedSeq: _*)
      q.processAllAvailable()
      // final snapshot = each user's LAST update row
      val streamed = spark.table("cusum").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getInt(3)))))
        .groupBy(_._1).map { case (u, rows) =>
          (u, rows.maxBy(_._2._1)._2) // max n_events = latest state
        }
      val batch = graft.operators.Relational.cusumChart(spark, sf).collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getInt(3))))).toMap
      batch should not be empty
      streamed shouldBe batch
    } finally q.stop()
  }
}
