package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.merge.ParquetTable

/** End-to-end medallion orchestration (ref `Test Scripts/07-run.py` +
  * `Silver/05-silver.py:486-503`): landing files → Bronze (streaming append)
  * → Silver in three awaited waves → Gold. `availableNow` drain mode, exactly
  * like the reference's batch runs (`04-bronze.py:39-40`).
  *
  * Single-writer-per-table discipline matches the reference; re-running the
  * whole pipeline over re-delivered + new files is idempotent end-to-end
  * (MERGE semantics absorb duplicates) — that is the two-set replay
  * invariant its tests pin (`Test Scripts/08-batch-test.py`).
  */
final class Medallion(spark: SparkSession, landingDir: String, tablesDir: String,
                      checkpointDir: String, asOf: Column) {

  /** Merged tables are hash-bucketed on (a subset of) their merge key so
    * each foreachBatch MERGE rewrites only the buckets its batch touches —
    * O(touched partitions) per micro-batch, the Delta file-skipping
    * equivalent (see [[ParquetTable]]). 16 buckets locally; size to target
    * file counts on a real cluster. */
  private val NBuckets = 16
  private def t(name: String, schema: org.apache.spark.sql.types.StructType,
                bucketKeys: Seq[String] = Nil) =
    new ParquetTable(spark, s"$tablesDir/$name", schema,
      if (bucketKeys.isEmpty) None else Some((bucketKeys, NBuckets)))

  val usersTable = t("users", Schemas.users, Seq("user_id"))
  val gymLogsTable = t("gym_logs", Schemas.gymLogs, Seq("mac_address"))
  val userProfileTable = t("user_profile", Schemas.userProfile, Seq("user_id"))
  val heartRateTable = t("heart_rate", Schemas.heartRate, Seq("device_id"))
  val workoutsTable = t("workouts", Schemas.workouts, Seq("user_id"))
  val userBinsTable = t("user_bins", Schemas.userBins, Seq("user_id"))
  val completedWorkoutsTable = t("completed_workouts", Schemas.completedWorkouts, Seq("user_id"))
  val workoutBpmTable = t("workout_bpm", Schemas.workoutBpm, Seq("user_id"))
  val summaryTable = t("workout_bpm_summary", Schemas.workoutBpmSummary, Seq("user_id"))

  private def bronzeDir(name: String) = s"$tablesDir/bronze_$name"

  /** Bronze: three file-stream ingestion jobs (ref 04-bronze.py:107-117),
    * drained with availableNow and awaited. */
  def runBronze(dateLookup: DataFrame): Unit = {
    // FAIR pool per layer (ref 05-silver.py:92 etc. scheduler pools)
    spark.sparkContext.setLocalProperty("spark.scheduler.pool", "bronze")
    val jobs = Seq(
      Bronze.csvStream(spark, s"$landingDir/registered_users", Schemas.registeredUsersCsv)
        -> "registered_users",
      Bronze.csvStream(spark, s"$landingDir/gym_logins", Schemas.gymLoginsCsv)
        -> "gym_logins",
      Bronze.enrichWeekPart(
        Bronze.jsonStream(spark, s"$landingDir/multiplex", Schemas.kafkaMultiplexJson),
        dateLookup) -> "multiplex")
    val queries = jobs.map { case (df, name) =>
      // mirrors the reference's PARTITIONED BY (topic, week_part)
      // (Setup/02-setup.py:71): topic demux AND week_part filters both prune
      val parts = if (name == "multiplex") Seq("topic", "week_part") else Seq.empty[String]
      Bronze.appendSink(df, bronzeDir(name), s"$checkpointDir/bronze_$name",
        s"bronze_$name", partitionBy = parts).start()
    }
    queries.foreach(_.awaitTermination())
  }

  /** Silver wave 1 (ref 05-silver.py:490-495): five streaming upsert jobs.
    * Each streams the append-only bronze parquet directory (file source ≡
    * append-only Delta stream) through its transform + watermarked dedup into
    * a foreachBatch MERGE.
    *
    * Start-all-then-await, exactly like the reference (`05-silver.py:486-503`
    * starts every wave-1 stream and then `_await_queries` the active set):
    * the five targets are distinct tables, so the concurrent foreachBatch
    * MERGEs never contend, and the five availableNow micro-batch floors
    * overlap instead of summing. */
  def runSilverWave1(): Unit = {
    spark.sparkContext.setLocalProperty("spark.scheduler.pool", "silver")
    val started = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.streaming.StreamingQuery]
    def run(name: String, src: DataFrame, eventTime: String, keys: Seq[String])
           (sink: DataFrame => Unit): Unit = {
      started += Silver.streamingDedup(src, eventTime, keys)
        .writeStream
        .queryName(s"silver_$name")
        .option("checkpointLocation", s"$checkpointDir/silver_$name")
        .outputMode("update")
        .foreachBatch((batch: DataFrame, _: Long) => sink(batch))
        .trigger(Trigger.AvailableNow())
        .start()
    }
    val regUsers = spark.readStream
      .schema(Schemas.registeredUsersCsv.add("load_time", "timestamp").add("source_file", "string"))
      .parquet(bronzeDir("registered_users"))
    run("users", Silver.usersTransform(regUsers), "registration_timestamp",
      Seq("user_id", "device_id"))(Silver.upsertInsertOnly(usersTable, Seq("user_id")))

    val gymBz = spark.readStream
      .schema(Schemas.gymLoginsCsv.add("load_time", "timestamp").add("source_file", "string"))
      .parquet(bronzeDir("gym_logins"))
    // dedup on the FULL row (not the reference's (mac,gym,login) key,
    // 05-silver.py:126-127): with persistent dedup state, a key-only dedup
    // would also swallow the logout-extension re-delivery that the M2 MERGE
    // guard exists to handle. Exact-duplicate drops keep idempotency; the
    // merge guard owns monotone logout extension.
    run("gym_logs", Silver.gymLogsTransform(gymBz), "login",
      Seq("mac_address", "gym", "login", "logout"))(Silver.upsertGymLogs(gymLogsTable))

    def multiplexStream = spark.readStream
      .schema(Schemas.kafkaMultiplexJson
        .add("load_time", "timestamp").add("source_file", "string").add("week_part", "string"))
      .parquet(bronzeDir("multiplex"))
    run("user_profile", Silver.userProfileTransform(multiplexStream), "updated",
      Seq("user_id", "updated"))(Silver.upsertUserProfile(userProfileTable))
    run("workouts", Silver.workoutsTransform(multiplexStream), "time",
      Seq("user_id", "time"))(Silver.upsertInsertOnly(workoutsTable, Seq("user_id", "time")))
    run("heart_rate", Silver.heartRateTransform(multiplexStream), "time",
      Seq("device_id", "time"))(Silver.upsertInsertOnly(heartRateTable, Seq("device_id", "time")))
    started.foreach(_.awaitTermination())
  }

  /** Silver waves 2+3 (ref 05-silver.py:496-502): derived tables recomputed
    * from the current upstream content and MERGEd. Wave 2 = {user_bins,
    * completed_workouts} — independent targets with disjoint upstreams, run
    * CONCURRENTLY exactly like the reference's start-both-then-await; wave 3
    * = workout_bpm, which reads completed_workouts and so must wait for the
    * wave-2 barrier. Concurrent Spark actions from two threads are safe
    * (separate jobs, separate target tables). */
  def runSilverWave2(): Unit = {
    // a failed wave-2 job must fail the wave, not vanish with its thread
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    def job(body: => Unit) = new Thread(() =>
      try body catch { case t: Throwable => failure.compareAndSet(null, t) })
    val wave2 = Seq(
      job(Silver.upsertUserBins(userBinsTable)(
        Silver.userBins(userProfileTable.read(), usersTable.read(), asOf))),
      job(Silver.upsertInsertOnly(completedWorkoutsTable,
        Seq("user_id", "workout_id", "session_id", "start_time"))(
        Silver.completedWorkouts(workoutsTable.read()))))
    wave2.foreach(_.start())
    wave2.foreach(_.join())
    if (failure.get() != null) throw failure.get()
    Silver.upsertInsertOnly(workoutBpmTable,
      Seq("user_id", "workout_id", "session_id", "time"))(
      Silver.workoutBpm(completedWorkoutsTable.read(), usersTable.read(),
        heartRateTable.read()))
  }

  /** Gold (ref 06-gold.py:100-112): summary recompute + M5 upsert. */
  def runGold(): Unit =
    Gold.upsertSummary(summaryTable)(
      Gold.workoutBpmSummary(workoutBpmTable.read(), userBinsTable.read()))

  /** One full batch run over whatever is in the landing zone. */
  def runAll(dateLookup: DataFrame): Unit = {
    runBronze(dateLookup)
    runSilverWave1()
    runSilverWave2()
    runGold()
  }

  def gymSummary(): DataFrame =
    Gold.gymSummary(completedWorkoutsTable.read(), usersTable.read(), gymLogsTable.read())

  /** Stream management (ref 04-bronze.py:114-116, 05-silver.py:481-484):
    * stop every active streaming query on this session. */
  def stopAllStreams(): Unit = spark.streams.active.foreach(_.stop())
}
