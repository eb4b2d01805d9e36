package graft.merge

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** A managed table = a parquet directory, with atomic-enough rewrite-and-swap
  * for MERGE results (SURVEY.md §7.3 — Delta-less upsert persistence).
  *
  * Layout: `root/current/` holds the live data; a rewrite writes to
  * `root/.staging-<n>/` then swaps directories. Readers that grabbed the old
  * `current` keep reading their already-opened files (POSIX semantics) —
  * adequate for a single-writer pipeline, which is exactly the reference's
  * model (one streaming query owns each table,
  * `Silver/05-silver.py:486-503`).
  *
  * At cluster scale the same protocol works over any filesystem with atomic
  * rename (HDFS, most object-store committers); the swap cost is O(1) in
  * data size because data files are never copied.
  */
final class ParquetTable(spark: SparkSession, root: String, schema: StructType) {
  private val rootPath: Path = Paths.get(root)
  private val current: Path = rootPath.resolve("current")
  @volatile private var gen: Long = 0L

  Files.createDirectories(rootPath)

  def exists: Boolean = Files.exists(current)

  /** Read the live table (empty frame with the right schema if never written). */
  def read(): DataFrame =
    if (exists) spark.read.schema(schema).parquet(current.toString)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Append-only write (bronze layer): plain parquet append, no swap. */
  def append(df: DataFrame): Unit = {
    Files.createDirectories(current)
    df.write.mode(SaveMode.Append).parquet(current.toString)
  }

  /** Replace table content with `df` via write-to-staging + directory swap.
    * `df` may read from the live `current` (merge results do): the staging
    * write materializes it fully before anything is moved. */
  def overwrite(df: DataFrame): Unit = {
    gen += 1
    val staging = rootPath.resolve(s".staging-$gen")
    df.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    val retired = rootPath.resolve(s".retired-$gen")
    if (Files.exists(current))
      Files.move(current, retired, StandardCopyOption.ATOMIC_MOVE)
    Files.move(staging, current, StandardCopyOption.ATOMIC_MOVE)
    // best-effort cleanup of the retired generation
    if (Files.exists(retired)) {
      import scala.jdk.CollectionConverters._
      Files.walk(retired).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    }
  }

  /** Apply a merge function to (currentContent, batch) and persist. */
  def merge(batch: DataFrame)(f: (DataFrame, DataFrame) => DataFrame): Unit =
    overwrite(f(read(), batch))
}
