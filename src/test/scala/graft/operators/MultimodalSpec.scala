package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("extractFeatures: deterministic stub features over binary media") {
    val media = Seq(
      Multimodal.MediaRow(1L, "image", "aaaa".getBytes, 100, 100, 0),
      Multimodal.MediaRow(2L, "image", "abab".getBytes, 200, 100, 0),
      Multimodal.MediaRow(3L, "audio", Array.emptyByteArray, 0, 0, 16000))
      .toDS()
    val got = Multimodal.extractFeatures(media, frames = 2)
      .collect().sortBy(_.media_id)
    assert(got(0).n_bytes == 4 && got(0).byte_entropy == 0.0) // uniform bytes
    assert(math.abs(got(1).byte_entropy - 1.0) < 1e-12)       // two symbols 50/50
    assert(got(0).thumb_bytes == math.max(1L, 4L * 64 * 64 / (100L * 100L)))
    assert(got(1).frame_offsets == Seq(0L, 2L))
    assert(got(2).n_bytes == 0 && got(2).frame_offsets.isEmpty && got(2).thumb_bytes == 0)
  }

  test("mediaFromDocuments builds a well-typed media table from testdata") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val media = Multimodal.mediaFromDocuments(spark, docs)
    val feats = Multimodal.extractFeatures(media)
    assert(feats.count() == docs.count())
    assert(feats.filter($"byte_entropy" <= 0).count() == 0)
  }

  test("m02 fixture is genuinely binary (full byte range, parquet roundtrip)") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val payload = docs.select(unhex(md5($"doc_id".cast("string"))).as("media"))
    val tmp = java.nio.file.Files.createTempDirectory("m02-spec-").toString
    payload.write.mode("overwrite").parquet(tmp)
    val back = spark.read.parquet(tmp).as[Array[Byte]].collect()
    // md5 bytes span the high half of the byte range — the property UTF-8
    // text payloads (m01) can never exercise
    assert(back.exists(_.exists(b => (b & 0xff) > 127)))
    assert(back.forall(_.length == 16))
  }

  test("Archiver writes exactly one json file per batch") {
    val landing = java.nio.file.Files.createTempDirectory("landing-").toString
    val batch = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val p1 = graft.sources.Archiver.archiveJson(batch, landing, "batch-0001")
    assert(p1.toFile.exists)
    val back = spark.read.json(landing)
    assert(back.count() == 2)
    assert(new java.io.File(landing).listFiles().count(_.getName.endsWith(".json")) == 1)
  }
}
