package graft.streaming

import org.apache.spark.sql.types.StructType

/** Explicit schemas for every pipeline table — the reference declares all
  * schemas as DDL strings, never inferring (SURVEY.md §1.3; DDL at
  * `Setup/02-setup.py:26-259`, stream schemas `Bronze/04-bronze.py:17,46,76`,
  * `Silver/05-silver.py:153-157,205,251`). We keep the same discipline with
  * `StructType.fromDDL`.
  */
object Schemas {

  // ── landing-zone file schemas (Bronze/04-bronze.py:17,46,76) ──
  val registeredUsersCsv: StructType =
    StructType.fromDDL("user_id long, device_id long, mac_address string, registration_timestamp double")

  val gymLoginsCsv: StructType =
    StructType.fromDDL("mac_address string, gym bigint, login double, logout double")

  /** Multiplexed Kafka envelope (ref kafka_multiplex_bz, Setup/02-setup.py:60-72). */
  val kafkaMultiplexJson: StructType =
    StructType.fromDDL("key string, value string, topic string, partition bigint, offset bigint, timestamp bigint")

  // ── embedded JSON payload schemas (Silver/05-silver.py:153-157,205,251) ──
  val userInfoCdc: StructType = StructType.fromDDL(
    """user_id bigint, update_type string, timestamp double,
      |dob string, sex string, gender string, first_name string, last_name string,
      |address struct<street_address: string, city: string, state: string, zip: int>""".stripMargin)

  val workoutPayload: StructType =
    StructType.fromDDL("user_id bigint, workout_id int, timestamp double, session_id int, action string")

  val bpmPayload: StructType =
    StructType.fromDDL("device_id bigint, time double, heartrate double")

  // ── dimension ──
  /** date_lookup (Setup/02-setup.py:205-214): calendar dim incl. week_part. */
  val dateLookup: StructType =
    StructType.fromDDL("date date, week int, year int, month int, dayofweek int, dayofmonth int, dayofyear int, week_part string")

  // ── silver tables (Setup/02-setup.py:81-196) ──
  val users: StructType =
    StructType.fromDDL("user_id long, device_id long, mac_address string, registration_timestamp timestamp")

  val gymLogs: StructType =
    StructType.fromDDL("mac_address string, gym bigint, login timestamp, logout timestamp")

  val userProfile: StructType = StructType.fromDDL(
    """user_id bigint, dob date, sex string, gender string, first_name string, last_name string,
      |street_address string, city string, state string, zip int, updated timestamp""".stripMargin)

  val heartRate: StructType =
    StructType.fromDDL("device_id bigint, time timestamp, heartrate double, valid boolean")

  val workouts: StructType =
    StructType.fromDDL("user_id bigint, workout_id int, time timestamp, action string, session_id int")

  val completedWorkouts: StructType =
    StructType.fromDDL("user_id bigint, workout_id int, session_id int, start_time timestamp, end_time timestamp")

  val workoutBpm: StructType =
    StructType.fromDDL("user_id bigint, workout_id int, session_id int, start_time timestamp, end_time timestamp, time timestamp, heartrate double")

  val userBins: StructType =
    StructType.fromDDL("user_id bigint, age string, gender string, city string, state string")

  // ── gold (Setup/02-setup.py:222-236) ──
  val workoutBpmSummary: StructType = StructType.fromDDL(
    """start_time timestamp, end_time timestamp, workout_id int, session_id int, user_id bigint,
      |age string, gender string, city string, state string,
      |min_bpm double, avg_bpm double, max_bpm double, num_recordings bigint""".stripMargin)
}
