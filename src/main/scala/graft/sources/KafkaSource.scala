package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Kafka streaming source (S3, ref `Ingestion/11-Kafka-Consumer.py:44-55`):
  * SASL_SSL auth, topic subscribe, offset control, rate limiting, and the
  * decode step that turns Kafka's binary key/value into the multiplex
  * envelope ([[graft.streaming.Schemas.kafkaMultiplexJson]]) the rest of the
  * pipeline consumes.
  *
  * The runtime here ships no spark-sql-kafka connector jar (SURVEY §7.1), so
  * `stream()` cannot START in this environment — but the full option surface
  * is a pure function ([[options]]) pinned by spec, and [[decodeEnvelope]]
  * is an ordinary DataFrame transform exercised against the same envelope
  * schema the file/Memory substitutes produce ([[Archiver]]). On a cluster
  * with the connector on the classpath, `stream(...)` is the drop-in S3
  * source; nothing downstream changes.
  *
  * Secrets are parameters, never literals — the reference embeds its broker
  * key/secret in the notebook (`11-Kafka-Consumer.py:26-30`); don't.
  */
object KafkaSource {

  final case class SaslCreds(username: String, password: String)

  /** The reference's reader options, as data (order-stable for specs).
    * maxOffsetsPerTrigger is the Kafka analog of the file source's
    * maxFilesPerTrigger backpressure; failOnDataLoss=false tolerates
    * compacted/expired offsets on replay exactly like the reference. */
  def options(bootstrapServers: String, topic: String,
              creds: Option[SaslCreds] = None,
              startingOffsets: String = "earliest",
              maxOffsetsPerTrigger: Long = 10000L,
              failOnDataLoss: Boolean = false): Seq[(String, String)] = {
    val sasl = creds.toSeq.flatMap { c =>
      Seq(
        "kafka.security.protocol" -> "SASL_SSL",
        "kafka.sasl.mechanism" -> "PLAIN",
        "kafka.sasl.jaas.config" ->
          ("org.apache.kafka.common.security.plain.PlainLoginModule required " +
            s"""username="${c.username}" password="${c.password}";"""))
    }
    Seq(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "subscribe" -> topic,
      "startingOffsets" -> startingOffsets,
      "maxOffsetsPerTrigger" -> maxOffsetsPerTrigger.toString,
      "failOnDataLoss" -> failOnDataLoss.toString) ++ sasl
  }

  /** Kafka's raw columns → the multiplex envelope: binary key/value decoded
    * to strings, metadata carried through. Works on any DataFrame with
    * Kafka's reader schema (key/value binary, topic, partition, offset,
    * timestamp) — spec-testable without a broker. */
  def decodeEnvelope(raw: DataFrame): DataFrame =
    raw.select(
      col("key").cast("string").as("key"),
      col("value").cast("string").as("value"),
      col("topic"),
      col("partition").cast("bigint").as("partition"),
      col("offset").cast("bigint").as("offset"),
      (unix_millis(col("timestamp"))).as("timestamp"))

  /** The S3 source proper — requires the spark-sql-kafka connector on the
    * classpath (absent in this runtime; see object doc). */
  def stream(spark: SparkSession, bootstrapServers: String, topic: String,
             creds: Option[SaslCreds] = None,
             startingOffsets: String = "earliest",
             maxOffsetsPerTrigger: Long = 10000L): DataFrame = {
    val reader = options(bootstrapServers, topic, creds, startingOffsets,
      maxOffsetsPerTrigger)
      .foldLeft(spark.readStream.format("kafka")) { case (r, (k, v)) => r.option(k, v) }
    decodeEnvelope(reader.load())
  }
}
