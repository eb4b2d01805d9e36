package graft.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types._

import graft.merge.LogTable

/** Maintenance STATEMENTS over log tables — the Delta operational SQL
  * surface (`OPTIMIZE` / `VACUUM` / `DESCRIBE HISTORY`) the q87 DML parser
  * did not yet cover. Spark's own parser has no grammar for these, so
  * [[GraftSqlParser]] recognizes them at text level (the same move Delta's
  * parser extension makes) and lowers onto the LogTable verbs that already
  * implement the semantics: [[LogTable.compact]], [[LogTable.vacuum]],
  * [[LogTable.describeHistory]]. */
private[sql] object Maintenance {
  /** LogTable handle for a catalog table (provider-checked in
    * [[SqlDml.resolveParts]]); schema comes from the self-describing log. */
  def tableAt(spark: SparkSession, parts: Seq[String]): LogTable = {
    val path = SqlDml.resolveParts(spark, parts, "maintenance statement")
    val schema = spark.read.format("graft-logtable").load(path).schema
    new LogTable(spark, path, schema)
  }
}

/** `OPTIMIZE <logtable>` — bin-pack compaction ([[LogTable.compact]]):
  * a `dataChange = false` rewrite, id-stable under row tracking, clustered
  * tables preserve their layout. Returns the rewritten-file count. */
case class GraftOptimizeCommand(parts: Seq[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("files_rewritten", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(Maintenance.tableAt(spark, parts).compact().toLong))
}

/** `VACUUM <logtable> [RETAIN <n> VERSIONS]` — prune log history and
  * unreferenced data files ([[LogTable.vacuum]]). The retention unit is
  * VERSIONS (this log's retention axis) rather than Delta's hours — the
  * engine's in-commit timestamps would support an hours form, but a
  * version count is what every test/maintenance flow here actually wants.
  * Returns the number of versions dropped. */
case class GraftVacuumCommand(parts: Seq[String], retain: Int)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("versions_removed", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(Maintenance.tableAt(spark, parts).vacuum(retain).size.toLong))
}

/** `DESCRIBE HISTORY <logtable>` — version-descending commit log (Delta's
  * column shape: version, timestamp, operation, …). Operations are
  * inferred from each commit's action shape — see
  * [[LogTable.describeHistory]]. */
case class GraftDescribeHistoryCommand(parts: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("timestamp_ms", LongType, nullable = false)(),
    AttributeReference("operation", StringType, nullable = false)(),
    AttributeReference("data_change", BooleanType, nullable = false)(),
    AttributeReference("num_added_files", IntegerType, nullable = false)(),
    AttributeReference("num_removed_files", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Maintenance.tableAt(spark, parts).describeHistory().reverse.map {
      case (v, ts, op, dc, a, r) => Row(v, ts, op, dc, a, r)
    }
}
