package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.DataFrame
import scala.jdk.CollectionConverters._

/** Landing-zone archiver (ref `Ingestion/11-Kafka-Consumer.py:86-93`, K3):
  * write a micro-batch as a SINGLE JSON file then rename into the landing
  * zone — downstream file streams see exactly one new file per batch, which
  * is what the reference's `maxFilesPerTrigger=1` backpressure relies on.
  *
  * The Kafka source itself (S3) needs the spark-sql-kafka connector jar that
  * this runtime doesn't ship; any DataFrame batch (foreachBatch of a Kafka
  * stream in production, a file/Memory stream in tests) can be archived here —
  * the envelope schema is [[graft.streaming.Schemas.kafkaMultiplexJson]].
  */
object Archiver {

  /** coalesce(1) → temp dir → move the single part file to
    * `landingDir/<name>.json`. Returns the final path. */
  def archiveJson(batch: DataFrame, landingDir: String, name: String): Path = {
    val tmp = Files.createTempDirectory("archive-")
    val out = tmp.resolve("out")
    batch.coalesce(1).write.mode("overwrite").json(out.toString)
    val part = Files.list(out).iterator().asScala
      .find(p => p.getFileName.toString.startsWith("part-") &&
        p.getFileName.toString.endsWith(".json"))
      .getOrElse(throw new IllegalStateException(s"no part file in $out"))
    Files.createDirectories(Paths.get(landingDir))
    val target = Paths.get(landingDir, s"$name.json")
    Files.move(part, target, StandardCopyOption.REPLACE_EXISTING)
    Files.walk(tmp).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    target
  }
}
