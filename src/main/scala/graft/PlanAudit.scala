package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: dump formatted physical plans for every registered batch query
  * (streaming wrappers execute, so they are skipped here). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    graft.queries.Registry.all.sortBy(_.name).foreach { q =>
      if (!q.name.startsWith("s0")) {
        println(s"\n######## ${q.name}")
        try q.spark(spark, dir).explain("formatted")
        catch { case e: Throwable => println(s"EXPLAIN FAILED: ${e.getMessage}") }
      }
    }
    spark.stop()
  }
}
