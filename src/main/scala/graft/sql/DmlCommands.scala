package graft.sql

import org.apache.spark.sql.{AnalysisException, Column, DataFrame, GraftSessionBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.merge.LogTable

/** Shared lowering machinery for the SQL DML commands (see
  * [[GraftSqlParser]]). The parsed statements carry UNRESOLVED expressions
  * (we intercept straight out of the parser, before Spark's analyzer can
  * reject the v1 target); resolution happens the way every DataFrame
  * program resolves — the expressions are wrapped as Columns and handed to
  * joins/selects over the aliased target/source frames, so `t.k`/`s.k`
  * qualifiers bind exactly as the SQL wrote them. */
object SqlDml {

  /** A session with the graft extensions (functions + DML parser) applied
    * next to an existing one — extensions are construction-time, so a
    * running session cannot retrofit the parser
    * ([[GraftSessionBridge.withExtensions]]); shared catalog + copied SQL
    * conf make the two interchangeable. For spark-submit deployments,
    * `--conf spark.sql.extensions=graft.GraftExtensions` makes every
    * session DML-capable with no code. */
  def session(spark: SparkSession): SparkSession =
    GraftSessionBridge.withExtensions(spark, new graft.GraftExtensions().apply(_))

  /** (log-table root path, SQL-visible alias) of a DML target plan. The
    * target must be a catalog table created `USING graft-logtable` —
    * the only writable SQL table type this engine serves. */
  private[sql] def resolveTarget(spark: SparkSession,
                                 plan: LogicalPlan): (String, String) = {
    val (parts, alias) = plan match {
      case SubqueryAlias(id, r: UnresolvedRelation) =>
        (r.multipartIdentifier, id.name)
      case r: UnresolvedRelation =>
        (r.multipartIdentifier, r.multipartIdentifier.last)
      case other => throw new AnalysisException(
        errorClass = "UNSUPPORTED_FEATURE.TABLE_OPERATION",
        messageParameters = Map(
          "tableName" -> other.nodeName,
          "operation" -> "graft DML on a non-table target"))
    }
    (resolveParts(spark, parts, "DML"), alias)
  }

  /** Catalog lookup + provider check + path extraction for a multipart
    * table name — shared by the DML and maintenance statements. */
  private[sql] def resolveParts(spark: SparkSession, parts: Seq[String],
                                op: String): String = {
    val ident = TableIdentifier(parts.last,
      if (parts.size >= 2) Some(parts(parts.size - 2)) else None)
    val meta = spark.sessionState.catalog.getTableMetadata(ident)
    if (!meta.provider.exists(_.equalsIgnoreCase("graft-logtable")))
      throw new AnalysisException(
        errorClass = "UNSUPPORTED_FEATURE.TABLE_OPERATION",
        messageParameters = Map(
          "tableName" -> parts.mkString("."),
          "operation" -> s"$op (provider ${meta.provider.getOrElse("?")}; only graft-logtable tables are writable)"))
    meta.storage.properties.collectFirst {
      case (k, v) if k.equalsIgnoreCase("path") => v
    }.orElse(meta.storage.locationUri.map(_.getPath)).getOrElse(
      throw new AnalysisException(
        errorClass = "UNSUPPORTED_FEATURE.TABLE_OPERATION",
        messageParameters = Map("tableName" -> parts.mkString("."),
          "operation" -> s"$op on a pathless table")))
  }

  /** SQL-visible alias of the MERGE source (for `INSERT *` / `UPDATE SET *`
    * column binding), when one exists. */
  private[sql] def sourceAlias(plan: LogicalPlan): Option[String] = plan match {
    case SubqueryAlias(id, _) => Some(id.name)
    case r: UnresolvedRelation => Some(r.multipartIdentifier.last)
    case _ => None
  }

  /** Drop a leading `alias.`/`table.` qualifier from every attribute (the
    * single-relation statements — UPDATE/DELETE — apply their predicate to
    * an unaliased frame). Only the first name part is dropped, and only
    * when it names the relation, so nested-struct access survives. */
  private[sql] def stripQualifier(e: Expression, names: Set[String]): Expression =
    e.transformUp {
      case a: UnresolvedAttribute if a.nameParts.size > 1 &&
          names.contains(a.nameParts.head.toLowerCase(java.util.Locale.ROOT)) =>
        UnresolvedAttribute(a.nameParts.tail)
    }

  private[sql] def asColumn(e: Expression): Column = GraftSessionBridge.column(e)

  private[sql] def assignmentName(a: Assignment): String = a.key match {
    case u: UnresolvedAttribute => u.nameParts.last
    case n: org.apache.spark.sql.catalyst.expressions.NamedExpression => n.name
    case other => throw new AnalysisException(
      errorClass = "UNSUPPORTED_FEATURE.TABLE_OPERATION",
      messageParameters = Map("tableName" -> other.sql,
        "operation" -> "non-column assignment key"))
  }
}

/** `MERGE INTO <logtable> [AS t] USING <source> [AS s] ON <cond>
  *  WHEN MATCHED [AND c] THEN UPDATE SET * | UPDATE SET a = v, … | DELETE
  *  WHEN NOT MATCHED [AND c] THEN INSERT * | INSERT (cols) VALUES (…)
  *  WHEN NOT MATCHED BY SOURCE [AND c] THEN UPDATE SET … | DELETE`
  *
  * Lowering: ONE full-outer join of the target relation scan and the
  * source on the merge condition (row-existence markers, the
  * [[graft.merge.Merge.scd2]] discipline), one CaseWhen struct per row
  * picking the first applicable action clause (SQL MERGE's in-order
  * semantics; delete = null struct, filtered), committed as a single
  * version through the LogTable OCC loop. At scale this is the same plan
  * Delta's MERGE executes: target scan ⋈ source (broadcast when the batch
  * is small — AQE decides), one shuffle, one write pass. */
case class GraftMergeCommand(merge: MergeIntoTable) extends LeafRunnableCommand {
  import SqlDml._

  override def run(spark: SparkSession): Seq[Row] = {
    val (path, tAlias) = resolveTarget(spark, merge.targetTable)
    val target = spark.read.format("graft-logtable").load(path)
    val outFields = target.schema.fields.toIndexedSeq
    val outNames = outFields.map(_.name)
    val sAlias = sourceAlias(merge.sourceTable)
    val source = GraftSessionBridge.ofRows(spark, merge.sourceTable)

    val tEx = "__graft_t_exists"; val sEx = "__graft_s_exists"
    val joined = target.as(tAlias).withColumn(tEx, lit(true))
      .join(source.withColumn(sEx, lit(true)),
        asColumn(merge.mergeCondition), "full_outer")

    val rowType = StructType(outFields)
    def rowOf(vals: Seq[Column]): Column =
      struct(outNames.zip(vals).zip(outFields).map { case ((n, c), f) =>
        c.cast(f.dataType).as(n) }: _*)
    val keepT = rowOf(outNames.map(n => col(s"$tAlias.$n")))
    def starS = rowOf(outNames.map { n =>
      val a = sAlias.getOrElse(throw new AnalysisException(
        errorClass = "UNSUPPORTED_FEATURE.TABLE_OPERATION",
        messageParameters = Map("tableName" -> "MERGE source",
          "operation" -> "INSERT * / UPDATE SET * without a source alias")))
      col(s"$a.$n")
    })
    val nullRow = lit(null).cast(rowType)
    def assignedRow(as: Seq[Assignment], default: String => Column): Column = {
      val m = as.map(a => assignmentName(a) -> asColumn(a.value)).toMap
      rowOf(outNames.map(n => m.getOrElse(n, default(n))))
    }
    def rowFor(a: MergeAction): Column = a match {
      case u: UpdateAction if u.fromStar || u.assignments.isEmpty => starS
      case u: UpdateAction => assignedRow(u.assignments, n => col(s"$tAlias.$n"))
      case _: UpdateStarAction => starS
      case _: DeleteAction => nullRow
      case i: InsertAction => assignedRow(i.assignments,
        n => lit(null).cast(outFields(outNames.indexOf(n)).dataType))
      case _: InsertStarAction => starS
      case other => throw new AnalysisException(
        errorClass = "UNSUPPORTED_FEATURE.TABLE_OPERATION",
        messageParameters = Map("tableName" -> other.toString,
          "operation" -> "unsupported MERGE action"))
    }
    def chain(actions: Seq[MergeAction], default: Column): Column =
      actions.foldRight(default) { (a, rest) =>
        a.condition match {
          case Some(c) => when(asColumn(c), rowFor(a)).otherwise(rest)
          case None => rowFor(a) // unconditional clause is terminal
        }
      }
    val matchedRow = chain(merge.matchedActions, keepT)
    val nmbsRow = chain(merge.notMatchedBySourceActions, keepT)
    val insertRow = chain(merge.notMatchedActions, nullRow)
    val picked =
      when(col(tEx).isNotNull && col(sEx).isNotNull, matchedRow)
        .when(col(tEx).isNotNull, nmbsRow)
        .otherwise(insertRow)
    val out = joined.select(picked.as("__row"))
      .filter(col("__row").isNotNull)
      .select(outNames.map(n => col(s"__row.$n").as(n)): _*)
    new LogTable(spark, path, target.schema).overwrite(out)
    Seq.empty
  }
}

/** `UPDATE <logtable> SET a = v, … [WHERE cond]` — lowered onto
  * [[graft.merge.LogTable.updateWhere]]: ONLY files holding matching rows
  * are rewritten (Delta's UPDATE), untouched files stay shared across
  * versions. */
case class GraftUpdateCommand(update: UpdateTable) extends LeafRunnableCommand {
  import SqlDml._

  override def run(spark: SparkSession): Seq[Row] = {
    val (path, tAlias) = resolveTarget(spark, update.table)
    val target = spark.read.format("graft-logtable").load(path)
    val names = Set(tAlias.toLowerCase(java.util.Locale.ROOT))
    val cond = update.condition
      .map(c => asColumn(stripQualifier(c, names))).getOrElse(lit(true))
    val set = update.assignments.map(a =>
      assignmentName(a) -> asColumn(stripQualifier(a.value, names))).toMap
    new LogTable(spark, path, target.schema).updateWhere(cond, set)
    Seq.empty
  }
}

/** `DELETE FROM <logtable> [WHERE cond]` — lowered onto
  * [[graft.merge.LogTable.deleteWhere]]: a merge-on-read deletion-vector
  * commit (no data file touched, time-travelable). */
case class GraftDeleteCommand(delete: DeleteFromTable) extends LeafRunnableCommand {
  import SqlDml._

  override def run(spark: SparkSession): Seq[Row] = {
    val (path, tAlias) = resolveTarget(spark, delete.table)
    val target = spark.read.format("graft-logtable").load(path)
    val names = Set(tAlias.toLowerCase(java.util.Locale.ROOT))
    val cond = asColumn(stripQualifier(delete.condition, names))
    new LogTable(spark, path, target.schema).deleteWhere(cond)
    Seq.empty
  }
}
