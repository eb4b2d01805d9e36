package graft.merge

import java.nio.file.Path
import java.time.{Instant, LocalDate, LocalDateTime, ZoneId, ZoneOffset}
import java.time.format.DateTimeFormatter

import scala.jdk.CollectionConverters._
import scala.util.Try

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.column.statistics.Statistics
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.types._

/** Driver-side per-file stats from parquet FOOTERS (Delta's stats-in-log
  * discipline without the read-back scan): a just-staged commit used to pay
  * one Spark job to re-read its own output for min/max (plus a second for
  * row counts under row tracking) — at one job ≈ 0.3–0.5 s of scheduling
  * floor, that was the dominant per-commit cost on metadata-bound lifecycle
  * paths (r13: q67). The footer already carries exact column-chunk
  * statistics and row counts; reading it is a few KB of local I/O and no
  * Spark job at all.
  *
  * Parity contract with the Spark-aggregate path it replaces: the manifest
  * stores stats as STRINGS that [[LogTable.readRange]] re-parses with
  * `cast(dt)` — so the formatted value must ROUND-TRIP to the same typed
  * value Spark's own `min(col).cast("string")` would have produced, not be
  * byte-identical. Java's `toString` for float/double round-trips by spec;
  * dates/timestamps are formatted in Spark's cast layout (fraction trimmed,
  * session zone for LTZ). Types whose footer repr we cannot round-trip
  * (INT96 timestamps, decimals, nested) report as unsupported and the
  * caller falls back to the Spark-aggregate path — pruning stays a superset
  * optimization either way. Parquet-mr writes untruncated BYTE_ARRAY stats
  * at its default truncation length, and its truncation operator (if ever
  * configured) only widens the interval — still superset-safe. */
object FooterStats {

  /** Can every `statsBy` column be served from footers given the write
    * schema? (Decided once per write, from the schema — not per file.)
    * `ltzAsInt64`: whether the session writes LTZ timestamps as INT64
    * (outputTimestampType TIMESTAMP_MICROS/MILLIS) — under the INT96
    * default their footers carry no usable stats, and silently dropping
    * them would degrade pruning vs the aggregate path, so such writes
    * fall back instead. (NTZ is always INT64.) */
  def supports(schema: StructType, cols: Seq[String],
               ltzAsInt64: Boolean): Boolean =
    cols.forall(c => schema.fields.find(_.name == c).exists(f =>
      f.dataType match {
        case ByteType | ShortType | IntegerType | LongType | FloatType |
             DoubleType | StringType | BooleanType | DateType |
             TimestampNTZType => true
        case TimestampType => ltzAsInt64
        case _ => false
      }))

  /** Read footers for `files`; returns per-file (rowCount, col -> (lo, hi))
    * keyed by the caller's key function. Columns with no non-null values
    * (or unusable footer stats, e.g. INT96) are simply absent — same
    * contract as the aggregate path. Throws on I/O errors (caller falls
    * back). */
  def read(files: Seq[Path], statsCols: Seq[String], schema: StructType,
           sessionZone: String, key: Path => String)
      : Map[String, (Long, Map[String, (String, String)])] = {
    val conf = new Configuration()
    val byName = schema.fields.map(f => f.name -> f.dataType).toMap
    files.map { p =>
      val in = HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(p.toUri), conf)
      val reader = ParquetFileReader.open(in)
      try {
        val footer = reader.getFooter
        val blocks = footer.getBlocks.asScala.toSeq
        val rows = blocks.map(_.getRowCount).sum
        val stats: Map[String, (String, String)] = statsCols.flatMap { c =>
          val allChunks = blocks.flatMap(_.getColumns.asScala
            .find(_.getPath.toDotString == c))
          // a row group that is PROVABLY all nulls (num_nulls == value count)
          // simply contributes no interval — same as the aggregate path's
          // null-skipping min/max. A chunk with MISSING statistics poisons
          // the file (can't bound it) — and so does a chunk whose min/max is
          // UNDEFINED despite non-null values: parquet-mr writes exactly that
          // for FP row groups containing NaN (probe-verified on Spark 4.1:
          // "num_nulls: 0, min/max not defined") and for binary stats past
          // the 4 KB size cap. Treating those like all-null groups would
          // merge bounds that EXCLUDE the group's values, so a hi=NaN range
          // query could wrongly prune a file whose NaN rows match. Poisoned
          // columns are served stat-less (file never pruned) — strictly
          // superset-safe vs the aggregate path in every corner.
          if (allChunks.exists { cc =>
            val st = cc.getStatistics
            st == null || (!st.hasNonNullValue &&
              !(st.isNumNullsSet && st.getNumNulls == cc.getValueCount))
          }) None
          else {
            val chunks = allChunks.filter(_.getStatistics.hasNonNullValue)
            if (chunks.isEmpty) None
            else {
            // merge across row groups on the TYPED statistics, format once
            // the typed-merge helper keeps the existential Statistics[T]
            // out of Scala's type checker (erasure makes the cast free)
            def mergeTyped[T <: Comparable[T]](a: Statistics[T],
                b: Statistics[T]): Statistics[T] = {
              val m = a.copy().asInstanceOf[Statistics[T]]
              m.mergeStatistics(b); m
            }
            val merged = chunks.map(_.getStatistics)
              .reduceLeft { (a, b) =>
                mergeTyped(
                  a.asInstanceOf[Statistics[java.lang.Long]],
                  b.asInstanceOf[Statistics[java.lang.Long]])
                  .asInstanceOf[Statistics[_]]
              }
            val pt = merged.`type`()
            for {
              lo <- format(merged.genericGetMin, pt.getPrimitiveTypeName,
                pt.getLogicalTypeAnnotation, byName(c), sessionZone)
              hi <- format(merged.genericGetMax, pt.getPrimitiveTypeName,
                pt.getLogicalTypeAnnotation, byName(c), sessionZone)
            } yield c -> (lo, hi)
            }
          }
        }.toMap
        key(p) -> (rows, stats)
      } finally reader.close()
    }.toMap
  }

  private val TsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  /** Spark-cast-compatible string for a footer min/max value; None when the
    * physical/logical combination can't be round-tripped (caller treats the
    * column as stat-less for this file — superset-safe). */
  private def format(v: Any, pt: PrimitiveTypeName,
                     lt: LogicalTypeAnnotation, dt: DataType,
                     zone: String): Option[String] = (dt, pt) match {
    case (ByteType | ShortType | IntegerType, PrimitiveTypeName.INT32) =>
      Some(v.asInstanceOf[java.lang.Integer].toString)
    case (LongType, PrimitiveTypeName.INT64) =>
      Some(v.asInstanceOf[java.lang.Long].toString)
    case (FloatType, PrimitiveTypeName.FLOAT) =>
      Some(v.asInstanceOf[java.lang.Float].toString)
    case (DoubleType, PrimitiveTypeName.DOUBLE) =>
      Some(v.asInstanceOf[java.lang.Double].toString)
    case (BooleanType, PrimitiveTypeName.BOOLEAN) =>
      Some(v.asInstanceOf[java.lang.Boolean].toString)
    case (StringType, PrimitiveTypeName.BINARY) =>
      Some(v.asInstanceOf[Binary].toStringUsingUTF8)
    case (DateType, PrimitiveTypeName.INT32) =>
      Some(LocalDate.ofEpochDay(v.asInstanceOf[java.lang.Integer].longValue)
        .toString)
    case (TimestampNTZType, PrimitiveTypeName.INT64) =>
      micros(v, lt).map(us => fmtTs(
        LocalDateTime.ofEpochSecond(Math.floorDiv(us, 1000000L),
          (Math.floorMod(us, 1000000L) * 1000L).toInt, ZoneOffset.UTC), us))
    case (TimestampType, PrimitiveTypeName.INT64) =>
      micros(v, lt).map(us => fmtTs(
        LocalDateTime.ofInstant(Instant.ofEpochSecond(
          Math.floorDiv(us, 1000000L),
          Math.floorMod(us, 1000000L) * 1000L), ZoneId.of(zone)), us))
    case _ => None // INT96, decimals, anything exotic: no footer stats
  }

  private def micros(v: Any, lt: LogicalTypeAnnotation): Option[Long] =
    lt match {
      case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
        t.getUnit match {
          case TimeUnit.MICROS => Some(v.asInstanceOf[java.lang.Long].longValue)
          case TimeUnit.MILLIS =>
            Some(Math.multiplyExact(v.asInstanceOf[java.lang.Long].longValue,
              1000L))
          case _ => None // NANOS: Spark never writes it; skip
        }
      case _ => None
    }

  /** Spark's cast-to-string timestamp layout: seconds always present,
    * fractional micros appended with trailing zeros trimmed. */
  private def fmtTs(ldt: LocalDateTime, us: Long): String = {
    val frac = Math.floorMod(us, 1000000L)
    val base = TsFmt.format(ldt)
    if (frac == 0L) base
    else base + "." + f"$frac%06d".reverse.dropWhile(_ == '0').reverse
  }
}
