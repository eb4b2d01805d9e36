package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.merge.{Merge, ParquetTable}
import graft.ops.Relational

/** Silver layer — typed, deduplicated business entities
  * (ref `Silver/05-silver.py`). Each job is split into
  *   - a pure *transform* (stream- and batch-applicable DataFrame program) and
  *   - an *upsert* implementing the job's MERGE flavor against a
  *     [[ParquetTable]] (the foreachBatch body; ref Upserter/CDCUpserter,
  *     `05-silver.py:6-33`).
  *
  * Streaming wiring: bronze tables are append-only parquet directories, so
  * the silver sources are plain file streams over them — the OSS equivalent
  * of the reference's append-only Delta stream (`05-silver.py:71-76`; its
  * `ignoreDeletes`/`startingVersion` options have no file-source counterpart
  * and are no-ops in an append-only layout). Silver→silver hops (user_bins,
  * completed_workouts, workout_bpm) consume the upstream table's *current*
  * content per wave — batch recompute, matching the reference's
  * wave-awaited orchestration (`05-silver.py:486-503`).
  */
object Silver {

  // ── transforms (ref 05-silver.py:77-79, 125-127, 177-185, 224-230, 269-273) ──

  /** users: epoch-double → timestamp + dedup keys (user_id, device_id). */
  def usersTransform(bz: DataFrame): DataFrame =
    bz.selectExpr("user_id", "device_id", "mac_address",
      "cast(registration_timestamp as timestamp) AS registration_timestamp")

  /** gym_logs: epoch-double casts; dedup keys (mac_address, gym, login). */
  def gymLogsTransform(bz: DataFrame): DataFrame =
    bz.selectExpr("mac_address", "gym", "cast(login as timestamp) AS login",
      "cast(logout as timestamp) AS logout")

  /** user_profile: demux topic=user_info → decode CDC payload → flatten
    * address → to_date(dob,'MM/dd/yyyy') → updated timestamp. */
  def userProfileTransform(multiplex: DataFrame): DataFrame =
    multiplex.filter(col("topic") === "user_info")
      .select(from_json(col("value"), Schemas.userInfoCdc).as("v"))
      .select(col("v.user_id"), col("v.update_type"),
        to_date(col("v.dob"), "MM/dd/yyyy").as("dob"),
        col("v.sex"), col("v.gender"), col("v.first_name"), col("v.last_name"),
        col("v.address.*"),
        col("v.timestamp").cast("timestamp").as("updated"))

  /** workouts: demux topic=workout → decode → time cast. */
  def workoutsTransform(multiplex: DataFrame): DataFrame =
    multiplex.filter(col("topic") === "workout")
      .select(from_json(col("value"), Schemas.workoutPayload).as("v"))
      .selectExpr("v.user_id", "v.workout_id",
        "cast(v.timestamp as timestamp) AS time", "v.action", "v.session_id")

  /** heart_rate: demux topic=bpm → decode → validity flag
    * (ref validity when(), 05-silver.py:271). */
  def heartRateTransform(multiplex: DataFrame): DataFrame =
    multiplex.filter(col("topic") === "bpm")
      .select(from_json(col("value"), Schemas.bpmPayload).as("v"))
      .select(col("v.device_id"), col("v.time").cast("timestamp").as("time"),
        col("v.heartrate"), Relational.validityFlag(col("v.heartrate")).as("valid"))

  /** Streaming dedup: watermark + dropDuplicates on natural keys
    * (ref 05-silver.py:78-79 etc.). Watermark bounds state exactly as the
    * reference's 365-day horizon does. */
  def streamingDedup(df: DataFrame, eventTimeCol: String, keys: Seq[String],
                     horizon: String = "365 days"): DataFrame =
    df.withWatermark(eventTimeCol, horizon).dropDuplicates(keys)

  /** Batch-side dedup with identical key semantics (deterministic tiebreak). */
  def batchDedup(df: DataFrame, keys: Seq[String], tiebreak: Seq[Column]): DataFrame =
    Relational.dedupKeyed(df, keys, tiebreak)

  // ── upserts (the foreachBatch bodies; ref MERGE statements in 05-silver.py) ──

  /** M1 — users / workouts / heart_rate / completed_workouts insert-only. */
  def upsertInsertOnly(table: ParquetTable, keys: Seq[String])(batch: DataFrame): Unit =
    table.merge(batch)((cur, b) => Merge.insertOnly(cur, b, keys))

  /** M2 — gym_logs logout extension (ref 05-silver.py:108-115). The batch is
    * first collapsed to max-logout per merge key: one micro-batch can carry
    * both a login row and its logout-extension re-delivery (full-row dedup
    * upstream keeps both), and an uncollapsed batch would insert duplicate
    * (mac,gym,login) rows through the full-outer merge. */
  def upsertGymLogs(table: ParquetTable)(batch: DataFrame): Unit = {
    val collapsed = Relational.dedupKeyed(batch,
      Seq("mac_address", "gym", "login"), Seq(col("logout").desc))
    table.merge(collapsed) { (cur, b) =>
      Merge.conditionalUpdate(cur, b, Seq("mac_address", "gym", "login"), "logout",
        (t, bb) => bb("logout") > t("login") && bb("logout") > t("logout"))
    }
  }

  /** M3 — user_profile CDC upsert (ref 05-silver.py:159-167 + 17-33):
    * keep new/update rows, collapse to newest per user within the batch
    * (rank, ties kept — then a deterministic tiebreak for key-uniqueness),
    * merge with recency guard. */
  def upsertUserProfile(table: ParquetTable)(batch: DataFrame): Unit = {
    val cdc = batch.filter(col("update_type").isin("new", "update"))
    val latest = Relational.latestPerKey(cdc, Seq("user_id"), "updated")
    // rank keeps ties; a real MERGE would fail on duplicate matches
    // (SURVEY §7.5 risk 1) — pin a tiebreak for deterministic behavior.
    val keyed = Relational.dedupKeyed(latest, Seq("user_id"),
      Seq(col("updated").desc, col("first_name")))
    table.merge(keyed.drop("update_type"))((cur, b) =>
      Merge.cdcUpsert(cur, b, Seq("user_id"), "updated"))
  }

  /** M4 — user_bins SCD1 overwrite (ref 05-silver.py:314-321). */
  def upsertUserBins(table: ParquetTable)(batch: DataFrame): Unit =
    table.merge(batch)((cur, b) => Merge.scd1(cur, b, Seq("user_id")))

  // ── derived silver (wave 2/3; ref 05-silver.py:291-345, 353-428, 431-479) ──

  /** user_bins content: profile × users membership join + age binning
    * (ref 05-silver.py:323-345). `asOf` injects the clock (determinism —
    * the reference uses current_date(), SURVEY §7.5 risk 3). */
  def userBins(userProfile: DataFrame, users: DataFrame, asOf: Column): DataFrame =
    userProfile.join(users.select("user_id"), Seq("user_id"))
      .select(col("user_id"),
        Relational.ageBins(col("dob"), asOf).as("age"),
        col("gender"), col("city"), col("state"))

  /** completed_workouts: start×stop interval pairing, 3-hour bound, open
    * interval — verbatim J4 (ref 05-silver.py:368-400). */
  def completedWorkouts(workouts: DataFrame): DataFrame = {
    val starts = workouts.filter(col("action") === "start")
      .select(col("user_id"), col("workout_id"), col("session_id"),
        col("time").as("start_time"))
    val stops = workouts.filter(col("action") === "stop")
      .select(col("user_id").as("u"), col("workout_id").as("w"),
        col("session_id").as("s"), col("time").as("end_time"))
    starts.join(stops,
        starts("user_id") === stops("u") && starts("workout_id") === stops("w") &&
        starts("session_id") === stops("s") &&
        stops("end_time") > starts("start_time") &&
        stops("end_time") < starts("start_time") + expr("interval 3 hours"))
      .select(col("user_id"), col("workout_id"), col("session_id"),
        col("start_time"), col("end_time"))
  }

  /** workout_bpm: sessions × users (device lookup) then BPM readings assigned
    * by half-open (start, end] containment — verbatim J3+J5
    * (ref 05-silver.py:431-465). */
  def workoutBpm(completedWorkouts: DataFrame, users: DataFrame,
                 heartRate: DataFrame): DataFrame = {
    val sessions = completedWorkouts
      .join(users.select(col("user_id"), col("device_id")), Seq("user_id"))
    val readings = heartRate.filter(col("valid") === true)
    readings.join(sessions,
        readings("device_id") === sessions("device_id") &&
        readings("time") > sessions("start_time") &&
        readings("time") <= sessions("end_time") &&
        sessions("end_time") < readings("time") + expr("interval 3 hours"))
      .select(sessions("user_id"), col("workout_id"), col("session_id"),
        col("start_time"), col("end_time"), col("time"), col("heartrate"))
  }
}
