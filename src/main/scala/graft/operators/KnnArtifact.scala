package graft.operators

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped persisted corpus k-NN edge artifact.
  *
  * The graph-analytics family (d22 mutual-kNN, s21 PageRank, s23
  * triangles, s24 label propagation, s25 k-core, s26 link prediction,
  * s29 BFS, s38 PPR, s39 HITS, s42/s43 assortativity) all iterate over
  * the SAME s16 edge list; under per-query cache isolation each used to
  * pay the full Lloyd-train + within-cell pair join + top-k window
  * every time (~2–4 s of every heavy graph query at sf0.1 — and at
  * 100 TB the build IS the dominant cost; no production user runs it
  * ten times). This store materializes the edge frame ONCE per
  * (corpus, parameters) per JVM through
  * [[Similarity.knnGraphWrite]] and hands every later consumer the
  * parquet read-back ([[Similarity.knnGraphRead]]) — exactly the
  * persisted-artifact workflow a cluster deployment runs explicitly
  * with its own durable path.
  *
  * Correctness: the read-back is value-identical to the direct build —
  * longs/ints/strings roundtrip trivially and the rounded-cosine double
  * is a finite IEEE value parquet stores bit-exactly. The s44 gate
  * proves it end-to-end: write → read → hash-compare against the DuckDB
  * oracle REBUILDING the edges from the base tables. The s16 gate keeps
  * calling the direct build (its in-plan sizing guard stays
  * plan-audited and its bench row keeps measuring the true build cost);
  * s44 measures the materialize cost; the family measures steady-state
  * consume cost.
  *
  * Staleness: the cache key includes a filesystem fingerprint of the
  * embeddings table (every file's name, length, and modification time),
  * so a fixture regenerated at the same path mid-JVM rebuilds instead
  * of serving stale edges. Artifacts live under one per-JVM temp root,
  * removed by a shutdown hook.
  */
object KnnArtifact {

  private val built = TrieMap.empty[String, String]

  private lazy val root: java.nio.file.Path = {
    val dir = java.nio.file.Files.createTempDirectory("graft-knn-")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(rm)
        f.delete(); ()
      }
      rm(dir.toFile)
    }))
    dir
  }

  /** Name, length, and modification time of every file of the
    * embeddings table — cheap (one FS listing) and detects fixture
    * regeneration at an unchanged path.
    */
  private def fingerprint(spark: SparkSession, sfDir: String): String = {
    val p = new Path(s"$sfDir/embeddings.parquet")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) "absent"
    else {
      val st = fs.getFileStatus(p)
      val files = if (st.isDirectory) fs.listStatus(p).toSeq else Seq(st)
      files.map(s => s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
        .sorted.mkString(",")
    }
  }

  /** The edge frame for (corpus, parameters): built + written on first
    * touch in this JVM, parquet read-back on every touch. Single-flight
    * under the store's lock — Verify/Bench drive queries sequentially,
    * and a concurrent session must not double-build.
    */
  def edges(spark: SparkSession, sfDir: String, k: Int, iters: Int,
      kNeighbors: Int, maxCellPop: Long): DataFrame = {
    val key = Seq(sfDir, k, iters, kNeighbors, maxCellPop,
      fingerprint(spark, sfDir)).mkString("|")
    val path = built.synchronized {
      built.getOrElseUpdate(key, {
        val p = root.resolve(s"edges_${built.size}_${math.abs(key.hashCode)}")
          .toString
        Similarity.knnGraphWrite(spark, sfDir, p, k, iters, kNeighbors,
          maxCellPop)
        p
      })
    }
    Similarity.knnGraphRead(spark, path)
  }
}
