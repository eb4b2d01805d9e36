package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat

/** Driver-side parquet-metadata shortcuts.
  *
  * [[rowCount]] answers COUNT(*) for a bare (possibly projected) parquet scan
  * from the file footers alone: O(files) metadata reads on the driver, zero
  * executor passes. At 100 TB that turns a full-corpus count job into a few
  * thousand footer fetches — the difference between "free" and "a petabyte
  * scan" for operators that need |corpus| before their real pass (centroid
  * seeding, quota planning). Any plan where footer counts wouldn't equal the
  * DataFrame's row count (filters, limits, joins, streaming, non-parquet
  * sources, cached relations) falls back to a real `count()` — correctness
  * never depends on the shortcut firing.
  */
object ParquetMeta {

  /** Exact row count of `df`; footer-only when provably safe, else
    * `df.count()`. */
  def rowCount(df: DataFrame): Long =
    footerCount(df.queryExecution.optimizedPlan).getOrElse(df.count())

  /** Some(count) iff the plan is only row-count-preserving nodes over a
    * parquet `HadoopFsRelation`. */
  private def footerCount(plan: LogicalPlan): Option[Long] = plan match {
    case Project(_, child)       => footerCount(child) // projections keep row count
    case SubqueryAlias(_, child) => footerCount(child)
    case r: LogicalRelation if !r.isStreaming =>
      r.relation match {
        case fs: HadoopFsRelation if fs.fileFormat.isInstanceOf[ParquetFileFormat] =>
          val conf = fs.sparkSession.sessionState.newHadoopConf()
          Some(fs.location.inputFiles.iterator.map { p =>
            val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(p), conf))
            try reader.getRecordCount finally reader.close()
          }.sum)
        case _ => None
      }
    case _ => None
  }
}
