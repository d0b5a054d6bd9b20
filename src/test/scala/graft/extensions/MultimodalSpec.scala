package graft.extensions

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The binaryFile ingest path: real files on disk -> the same
  * (media, media_meta) shape as the text stand-in -> the downstream
  * decode/resize/frame stages run unchanged. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def stageFiles(): (String, Map[String, Array[Byte]]) = {
    val dir = TestSpark.tmpDir("graft-binfiles")
    val payloads = Map(
      "a.img" -> Array.tabulate[Byte](300)(i => (i % 251).toByte),
      "b.img" -> Array.tabulate[Byte](77)(i => (i * 7 % 256).toByte),
      "c.txt" -> "not an image".getBytes("UTF-8"))
    payloads.foreach { case (name, bytes) =>
      Files.write(Paths.get(s"$dir/$name"), bytes)
    }
    (dir, payloads)
  }

  test("readBinaryFiles: one row per file, exact bytes + metadata, glob prunes") {
    val (dir, payloads) = stageFiles()
    val all = Multimodal.readBinaryFiles(spark, dir, format = "img")
    assert(all.count() == 3)

    val rows = all.select(col("path"), col("media"), col("media_meta.n_bytes"),
      col("media_meta.checksum"), col("media_meta.format"))
      .as[(String, Array[Byte], Long, String, String)].collect()
    rows.foreach { case (path, media, nBytes, checksum, format) =>
      val name = path.split('/').last
      val expected = payloads(name)
      assert(media.toSeq == expected.toSeq, s"$name bytes must round-trip exactly")
      assert(nBytes == expected.length.toLong)
      assert(format == "img")
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(expected).map("%02x".format(_)).mkString
      assert(checksum == md, s"$name checksum")
    }

    // pathGlobFilter prunes by extension BEFORE reading bytes
    val imgsOnly = Multimodal.readBinaryFiles(spark, dir, pathGlob = Some("*.img"))
    assert(imgsOnly.count() == 2)
    // media_id is a stable function of the path: re-reading agrees
    val ids1 = imgsOnly.select("media_id").as[Long].collect().toSet
    val ids2 = Multimodal.readBinaryFiles(spark, dir, pathGlob = Some("*.img"))
      .select("media_id").as[Long].collect().toSet
    assert(ids1 == ids2 && ids1.size == 2)
  }

  test("binaryFile ingest feeds the same downstream stages as the text stand-in") {
    val (dir, payloads) = stageFiles()
    val media = Multimodal.readBinaryFiles(spark, dir, pathGlob = Some("*.img"))

    val feats = Multimodal.extractFeatures(spark, media, "media_id")
    val byBytes = feats.collect().map(f => f.n_bytes -> f).toMap
    assert(byBytes.keySet == Set(300L, 77L))
    // stub decode dims are pure functions of payload length — same formula
    // the oracle-checked multimodal_features query pins
    val f300 = byBytes(300L)
    assert(f300.width == 16 + (300 * 31) % 64 && f300.height == 16 + 300 % 64)
    assert(f300.features.length == 8)

    val resized = Multimodal.resizeMeta(feats.toDF(), "id", box = 64)
    assert(resized.count() == 2)
    assert(resized.filter(col("resized_w") > 64 || col("resized_h") > 64).isEmpty)

    val frames = Multimodal.sampleFrames(media, "media_id", everyNBytes = 64)
    // ceil(300/64)=5 frames + ceil(77/64)=2 frames
    assert(frames.count() == 7)
    assert(payloads != null)
  }
}
