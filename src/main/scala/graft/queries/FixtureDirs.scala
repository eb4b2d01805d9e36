package graft.queries

import java.nio.file.{Files, Path}
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.DataFrame

/** JVM-exit-cleaned temp directories for query fixtures. The m0x multimodal
  * queries persist their generated media through a real parquet BINARY
  * column (that round trip IS part of what they test); without cleanup each
  * invocation leaks one corpus copy per run (3+ per bench). One shutdown
  * hook, one queue — directories are removed recursively at JVM exit.
  */
object FixtureDirs {

  private val dirs = new ConcurrentLinkedQueue[Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    dirs.forEach { root =>
      try {
        Files.walk(root).sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(p => Files.deleteIfExists(p))
      } catch { case _: Exception => () } // best-effort: exit path
    }
  }, "graft-fixture-dir-cleanup"))

  /** Create a tracked temp dir (deleted at JVM exit). */
  def create(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    dirs.add(p)
    p
  }

  /** The binary-ingest round trip shared by the m0x fixtures: write the
    * generated media to a throwaway parquet dir, read it back so the query
    * consumes a true parquet BINARY column. NOTE for bench readers: the
    * fixture ENCODE + parquet WRITE cost lands inside the query's measured
    * time but belongs to the fixture, not the operator under test. */
  def parquetRoundTrip(df: DataFrame, prefix: String): DataFrame = {
    val dir = create(prefix).toString
    df.write.mode("overwrite").parquet(dir)
    df.sparkSession.read.parquet(dir)
  }
}
