package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** S3 Kafka source surface — the connector jar is absent in this runtime
  * (SURVEY §7.1), so the spec pins what IS environment-independent: the full
  * reader option set (ref `Ingestion/11-Kafka-Consumer.py:44-55`) and the
  * binary→envelope decode, fed with Kafka's reader schema. */
class KafkaSourceSpec extends SparkSpec {
  import spark.implicits._

  test("options carry the reference's full reader configuration") {
    val opts = KafkaSource.options("broker:9092", "multiplex",
      creds = Some(KafkaSource.SaslCreds("user", "secret")),
      startingOffsets = "latest", maxOffsetsPerTrigger = 500L,
      failOnDataLoss = false).toMap
    assert(opts("kafka.bootstrap.servers") == "broker:9092")
    assert(opts("subscribe") == "multiplex")
    assert(opts("startingOffsets") == "latest")
    assert(opts("maxOffsetsPerTrigger") == "500")
    assert(opts("failOnDataLoss") == "false")
    assert(opts("kafka.security.protocol") == "SASL_SSL")
    assert(opts("kafka.sasl.mechanism") == "PLAIN")
    assert(opts("kafka.sasl.jaas.config").contains("username=\"user\""))
    // no SASL block without creds
    val plain = KafkaSource.options("b:9092", "t").toMap
    assert(!plain.contains("kafka.security.protocol"))
  }

  test("decodeEnvelope: binary key/value → multiplex envelope schema") {
    val raw = Seq(
      ("k1".getBytes("UTF-8"), """{"a":1}""".getBytes("UTF-8"), "bpm", 0, 7L,
        new java.sql.Timestamp(1704100000000L)))
      .toDF("key", "value", "topic", "partition", "offset", "timestamp")
    val env = KafkaSource.decodeEnvelope(raw)
    assert(env.schema.fieldNames.toSeq ==
      graft.streaming.Schemas.kafkaMultiplexJson.fieldNames.toSeq)
    val row = env.as[(String, String, String, Long, Long, Long)].head()
    assert(row == ("k1", """{"a":1}""", "bpm", 0L, 7L, 1704100000000L))
  }
}
