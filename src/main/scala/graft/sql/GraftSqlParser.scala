package graft.sql

import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.types.StructType

/** SQL DML surface for the log table (VERDICT r11 ask 5): the reference
  * executes its merges as SQL text inside foreachBatch
  * (`Silver/05-silver.py:11-13` — `spark.sql("MERGE INTO ...")`); this
  * parser extension gives the engine that statement surface, lowering
  * `MERGE INTO` / `UPDATE` / `DELETE FROM` onto the LogTable verbs that
  * already implement the semantics (the M1–M6 family, deleteWhere,
  * updateWhere).
  *
  * Mechanics: Spark's own parser already understands all three statements
  * (it produces [[MergeIntoTable]]/[[UpdateTable]]/[[DeleteFromTable]]
  * nodes) but its ANALYZER rejects them for v1 relations ("not supported
  * temporarily"). So we delegate the parse and intercept the parsed node,
  * wrapping it in a runnable command ([[GraftMergeCommand]] et al.) that
  * resolves the target through the session catalog at execution time and
  * runs the statement through the LogTable commit protocol. Installed via
  * `spark.sql.extensions=graft.GraftExtensions` (injectParser) or
  * [[graft.sql.SqlDml.session]] on an existing session.
  */
final class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  // Maintenance statements Spark has NO grammar for — recognized at text
  // level (the move Delta's parser extension makes) and lowered onto the
  // LogTable verbs. Identifier text is re-parsed through the delegate's
  // parseMultipartIdentifier so quoting/qualification behave like any name.
  private val OptimizeRe =
    """(?is)\s*OPTIMIZE\s+([\w.`"]+)\s*;?\s*""".r
  private val VacuumRe =
    """(?is)\s*VACUUM\s+([\w.`"]+?)(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?\s*;?\s*""".r
  private val HistoryRe =
    """(?is)\s*DESCRIBE\s+HISTORY\s+([\w.`"]+)\s*;?\s*""".r

  /** Does `name` resolve (in the active session's catalog) to a
    * graft-logtable? Used to DISAMBIGUATE text-level matches before
    * claiming them — Delta's extension makes the same parse-then-fall-back
    * move. Any resolution failure means "not ours": the statement falls
    * through to the delegate, so `DESCRIBE history <col>` on a table that
    * happens to be NAMED `history` keeps Spark's own meaning (ADVICE r12).
    * (Quoted identifiers containing spaces fall outside the text patterns
    * entirely and always take the delegate path.) */
  private def isLogTable(name: String): Boolean =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .exists(s =>
        scala.util.Try(
          SqlDml.resolveParts(s, parseMultipartIdentifier(name), "probe")
        ).isSuccess)

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case OptimizeRe(t) => GraftOptimizeCommand(parseMultipartIdentifier(t))
    case VacuumRe(t, r) =>
      // a BARE `VACUUM t` must not silently default to RETAIN 1 — that
      // drops all history and time travel in one statement (Delta's
      // default is a conservative 7 days; ours is explicit-only — ADVICE
      // r12). The retention unit here is versions, the log's axis.
      if (r == null) throw new org.apache.spark.sql.AnalysisException(
        errorClass = "_LEGACY_ERROR_TEMP_3100",
        messageParameters = Map("message" ->
          ("VACUUM requires an explicit retention: VACUUM <table> RETAIN " +
            "<n> VERSIONS (a bare VACUUM would irreversibly drop all " +
            "history and time travel)")))
      GraftVacuumCommand(parseMultipartIdentifier(t), r.toInt)
    case HistoryRe(t) if isLogTable(t) =>
      GraftDescribeHistoryCommand(parseMultipartIdentifier(t))
    case _ => delegate.parsePlan(sqlText) match {
      case m: MergeIntoTable   => GraftMergeCommand(m)
      case u: UpdateTable      => GraftUpdateCommand(u)
      case d: DeleteFromTable  => GraftDeleteCommand(d)
      case p                   => p
    }
  }

  override def parseExpression(sqlText: String) = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String) = delegate.parseDataType(sqlText)
}
