package graft.osm

import java.io.ByteArrayInputStream

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** stdin (`-`) CLI parity (Osm2Orc.java:21-24,33-36): piped input is
  * staged to a temp file, then flows through the normal path-based read.
  * (Main.main itself is not invoked here — it stops the shared Spark
  * session; the staging + read composition is the `-` branch verbatim.)
  */
class MainStdinSpec extends AnyFunSuite with Matchers with SparkSpec {

  test("piped changeset XML stages to a temp file and converts") {
    val xml =
      """<osm><changeset id="42" open="false" num_changes="3" comments_count="1"/></osm>"""
    val staged = Main.stageStdin(new ByteArrayInputStream(xml.getBytes("UTF-8")),
      spark.sessionState.newHadoopConf(), ".xml")
    staged should endWith(".xml")
    val df = ChangesetXml.read(spark, staged)
    df.count() shouldBe 1
    df.head().getAs[Long]("id") shouldBe 42L
  }

  test("piped PBF stages byte-identically") {
    val pbf = PbfTestData.writeSample(java.nio.file.Files.createTempDirectory("pbfstdin"))
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(pbf))
    val staged = Main.stageStdin(new ByteArrayInputStream(bytes),
      spark.sessionState.newHadoopConf(), ".osm.pbf")
    java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(new java.net.URI(staged).getPath)) shouldBe bytes
    spark.read.format("osm-pbf").load(staged).count() shouldBe 7
  }
}
