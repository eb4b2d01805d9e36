package graft.merge

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** GENERATED COLUMNS on the commit-log table (Delta `GENERATED ALWAYS AS`,
  * CREATE-time only): omitted → computed in the write pass, supplied →
  * validated per row (mismatch fails atomically before any commit),
  * composable with stats-based file skipping on the derived value. */
class GeneratedColumnSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private val genSchema = StructType(Seq(
    StructField("k", LongType), StructField("v", LongType),
    LogTable.generated("bucket", IntegerType, "cast(v % 10 as int)")))

  test("omitted column is computed; supplied column is validated; a " +
      "mismatch fails atomically with no version cut and no orphan files") {
    val root = tmp("gen-basic-")
    val t = new LogTable(spark, root, genSchema)
    t.append(Seq((1L, 17L), (2L, 23L)).toDF("k", "v"))              // omitted → computed
    assert(t.read().orderBy("k").as[(Long, Long, Int)].collect().toSeq ==
      Seq((1L, 17L, 7), (2L, 23L, 3)))
    t.append(Seq((3L, 31L, 1)).toDF("k", "v", "bucket"))            // supplied, correct
    assert(t.read().count() == 3)
    val vBefore = t.currentVersion
    val filesBefore = Files.list(java.nio.file.Paths.get(root, "files"))
      .count()
    intercept[Exception] {
      t.append(Seq((4L, 40L, 9)).toDF("k", "v", "bucket"))          // wrong: 40 % 10 = 0
    }
    assert(t.currentVersion == vBefore, "failed write must cut no version")
    assert(Files.list(java.nio.file.Paths.get(root, "files")).count() == filesBefore,
      "failed write must leave no orphan data file")
    assert(t.read().count() == 3)
  }

  test("stats on the generated column skip files (derived-value pruning)") {
    val s = StructType(Seq(
      StructField("k", LongType), StructField("ts", LongType),
      LogTable.generated("day", LongType, "ts div 86400")))
    val t = new LogTable(spark, tmp("gen-stats-"), s, statsBy = Seq("day"))
    (0 until 4).foreach { d =>
      t.append((1L to 20L).map(i =>
        (d * 100L + i, d * 86400L + i)).toDF("k", "ts")) // day omitted → computed
    }
    val all = t.read()
    val hit = t.readRange("day", lit(2L), lit(2L))
    assert(hit.orderBy("k").as[(Long, Long, Long)].collect().toSeq ==
      all.filter(col("day") === 2L).orderBy("k").as[(Long, Long, Long)].collect().toSeq)
    assert(hit.inputFiles.length < all.inputFiles.length,
      s"generated-column stats pruned nothing: ${hit.inputFiles.length} vs ${all.inputFiles.length}")
  }

  test("merge output is validated too, and CHECK constraints may reference " +
      "the generated column (generation runs first)") {
    val t = new LogTable(spark, tmp("gen-merge-"), genSchema)
    t.append(Seq((1L, 5L), (2L, 6L)).toDF("k", "v"))
    t.addConstraint("bucket_small", "bucket < 10")
    // a keyed merge whose output carries the stored (valid) generated values
    t.merge(Seq((2L, 16L)).toDF("k", "v").withColumn("bucket",
        expr("cast(v % 10 as int)")))((cur, b) =>
      Merge.scd1(cur, b, Seq("k")))
    assert(t.read().orderBy("k").as[(Long, Long, Int)].collect().toSeq ==
      Seq((1L, 5L, 5), (2L, 16L, 6)))
    // a merge function that CORRUPTS the generated column fails the write
    intercept[Exception] {
      t.merge(Seq((1L, 5L)).toDF("k", "v").withColumn("bucket", lit(9)))(
        (cur, b) => Merge.scd1(cur, b, Seq("k")))
    }
    assert(t.read().filter(col("bucket") === 9).count() == 0)
  }

  test("guards: generated columns are CREATE-time only; referenced base " +
      "columns cannot be renamed or dropped; the generated field itself renames") {
    val t = new LogTable(spark, tmp("gen-guards-"), genSchema)
    t.append(Seq((1L, 12L)).toDF("k", "v"))
    intercept[IllegalArgumentException] { // late ADD COLUMN ... GENERATED
      t.evolve(StructType(genSchema.fields.toSeq :+
        LogTable.generated("late", IntegerType, "cast(k % 2 as int)")))
    }
    intercept[IllegalArgumentException](t.renameColumn("v", "val")) // referenced
    intercept[IllegalArgumentException](t.dropColumn("v"))          // referenced
    t.renameColumn("bucket", "shard") // the generated field itself: fine
    assert(t.read().columns.toSeq == Seq("k", "v", "shard"))
    t.append(Seq((2L, 27L)).toDF("k", "v")) // still generates, into the new name
    assert(t.read().filter(col("shard") === 7).count() == 1)
  }
}
