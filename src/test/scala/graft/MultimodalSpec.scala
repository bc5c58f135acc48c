package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** The multimodal decode path uses a REAL codec: encodePng must produce a
  * PNG that javax.imageio round-trips losslessly back to the payload plus
  * zero padding, and decodeFeatures must compute its features over those
  * DECODED bytes — distributed results pinned against a driver-side
  * re-derivation that never touches the codec. */
class MultimodalSpec extends AnyFunSuite {
  import TestSession._

  private def padded(payload: Array[Byte]): Array[Byte] = {
    val h = Multimodal.imgHeight(payload.length)
    java.util.Arrays.copyOf(payload, Multimodal.ImgWidth * 3 * h)
  }

  test("imgHeight sizes the raster to the payload, minimum one row") {
    assert(Multimodal.imgHeight(0) === 1)
    assert(Multimodal.imgHeight(1) === 1)
    assert(Multimodal.imgHeight(48) === 1)
    assert(Multimodal.imgHeight(49) === 2)
    assert(Multimodal.imgHeight(96) === 2)
  }

  test("PNG round-trip is lossless: decoded raster = payload + zero pad") {
    val cases = Seq(
      Array.empty[Byte],
      "hello multimodal".getBytes("UTF-8"),
      Array.tabulate(256)(i => i.toByte), // every byte value incl. >= 0x80
      Array.fill(49)(0xff.toByte))
    cases.foreach { payload =>
      val png = Multimodal.encodePng(payload)
      // a real PNG container, not a passthrough of the payload
      assert(png.take(4).map(_ & 0xff).toSeq === Seq(0x89, 0x50, 0x4e, 0x47),
        "encodePng must emit a PNG signature")
      assert(Multimodal.decodePngBytes(png).toSeq === padded(payload).toSeq)
    }
  }

  test("decodeFeatures computes histogram/mean over the decoded bytes") {
    val s = spark
    import s.implicits._
    val payloads = Seq(
      1L -> "abc".getBytes("UTF-8"),
      2L -> Array.tabulate(100)(i => (i * 7).toByte),
      3L -> Array.empty[Byte])
    val media = payloads.map { case (id, p) =>
      (id, Multimodal.encodePng(p))
    }.toDF("media_id", "content")
    val got = Multimodal.decodeFeatures(media)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getSeq[Long](3)))).toMap
    payloads.foreach { case (id, p) =>
      val dec = padded(p)
      val hist = new Array[Long](16)
      dec.foreach(b => hist((b & 0xff) / 16) += 1)
      val sum = dec.map(b => (b & 0xff).toLong).sum
      val (nBytes, mean, gotHist) = got(id)
      assert(nBytes === dec.length.toLong)
      assert(mean === sum.toDouble / dec.length)
      assert(gotHist === hist.toSeq)
    }
  }

  test("WAV round-trip is exact: decoded PCM = payload, byte for byte") {
    val cases = Seq(
      Array.empty[Byte],
      "hello audio".getBytes("UTF-8"),
      Array.tabulate(256)(i => i.toByte),
      Array.fill(1000)(0x80.toByte))
    cases.foreach { payload =>
      val wav = Multimodal.encodeWav(payload)
      // a real RIFF/WAVE container, not a passthrough of the payload
      assert(new String(wav.take(4), "US-ASCII") === "RIFF",
        "encodeWav must emit a RIFF header")
      assert(new String(wav.slice(8, 12), "US-ASCII") === "WAVE")
      assert(Multimodal.decodeWavBytes(wav).toSeq === payload.toSeq)
    }
  }

  test("audioTable + decodeFeatures: second codec through the same operator") {
    // the swap claim: decodeFeatures runs VERBATIM over the WAV table
    // with only the decode call site changed — and since PCM decodes to
    // the exact payload, features equal the raw byte stats, unpadded
    val feats = Multimodal.decodeFeatures(
      Multimodal.audioTable(spark, sf0001), Multimodal.decodeWavBytes)
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("bytes"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("bytes")).toMap
    val rows = feats.collect()
    assert(rows.length === docs.size)
    rows.foreach { r =>
      val payload = docs(r.getLong(0))
      assert(r.getLong(1) === payload.length.toLong)
      assert(r.getDouble(2) ===
        payload.map(b => (b & 0xff).toLong).sum.toDouble / payload.length)
    }
  }

  test("imageTable emits real PNGs whose features match the documents") {
    val media = Multimodal.imageTable(spark, sf0001)
    val row = media.orderBy("media_id").limit(1).collect()(0)
    val png = row.getAs[Array[Byte]]("content")
    assert(png.take(4).map(_ & 0xff).toSeq === Seq(0x89, 0x50, 0x4e, 0x47))
    // features of the decoded corpus = padded byte stats of the raw text
    val feats = Multimodal.decodeFeatures(media)
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("bytes"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("bytes")).toMap
    feats.collect().foreach { r =>
      val dec = padded(docs(r.getLong(0)))
      assert(r.getLong(1) === dec.length.toLong)
      assert(r.getDouble(2) === dec.map(b => (b & 0xff).toLong).sum.toDouble / dec.length)
    }
  }

  test("codec error policy: corrupt payloads land in the error column, task survives") {
    val s = spark
    import s.implicits._
    val goodPng = Multimodal.encodePng(Array[Byte](1, 2, 3, 4))
    val rows = Seq(
      Multimodal.MediaRow(1L, goodPng),
      Multimodal.MediaRow(2L, goodPng.take(goodPng.length / 2)), // truncated
      Multimodal.MediaRow(3L, Array[Byte](9, 9, 9, 9, 9)),       // garbage
      Multimodal.MediaRow(4L, Array.emptyByteArray))             // empty
    val out = Multimodal.decodeFeaturesSafe(rows.toDF())
      .collect().map(r => r.getLong(0) -> r).toMap
    // the clean row decodes with features identical to the strict path
    val strict = Multimodal.decodeFeatures(Seq(rows.head).toDF()).head()
    assert(out(1L).isNullAt(4), "clean row must carry null error")
    assert(out(1L).getLong(1) == strict.getLong(1) &&
      out(1L).getDouble(2) == strict.getDouble(2))
    // every corrupt row survives as (id, nulls, error-class)
    Seq(2L, 3L, 4L).foreach { id =>
      val r = out(id)
      assert(!r.isNullAt(4), s"row $id must carry a decode error")
      assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3),
        s"row $id must carry null features")
    }
  }

  test("codec error policy holds for the WAV codec through the same operator") {
    val s = spark
    import s.implicits._
    val goodWav = Multimodal.encodeWav(Array[Byte](5, 6, 7))
    val rows = Seq(
      Multimodal.MediaRow(1L, goodWav),
      Multimodal.MediaRow(2L, goodWav.take(8)),            // truncated header
      Multimodal.MediaRow(3L, Array[Byte](0, 1, 2, 3)))    // not a RIFF
    val out = Multimodal.decodeFeaturesSafe(rows.toDF(), Multimodal.decodeWavBytes)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).isNullAt(4) && out(1L).getLong(1) == 3L)
    Seq(2L, 3L).foreach { id =>
      assert(!out(id).isNullAt(4), s"row $id must carry a decode error")
    }
  }
}
