package graft.merge

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Model-based testing of the commit-log table: a deterministic (seeded)
  * random sequence of append / overwrite / deleteWhere / compact / vacuum
  * ops runs against both the real [[LogTable]] and a trivial in-memory
  * model; after EVERY op the live read must equal the model, and at the
  * end every retained version must equal the model's history. The model is
  * ~20 lines with no files, no log, no concurrency — if the two agree
  * across hundreds of random interleavings of the verbs, the protocol's
  * fold (deltas × checkpoints × DVs × dataChange) is doing what the
  * documentation says, not just what the hand-picked specs check. */
class LogTableModelSpec extends SparkSpec {
  import spark.implicits._

  private val s2 = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  private def runSeed(seed: Int, nOps: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val root = Files.createTempDirectory(s"log-model-$seed-").toString
    val t = new LogTable(spark, root, s2,
      checkpointInterval = 1 + rnd.nextInt(4)) // exercise all fold paths
    var next = 0L // fresh key source
    var model = Vector.empty[(Long, String)]
    // version -> model content at that version (only data-changing commits
    // and compactions cut versions; evolve is not exercised here)
    var hist = Map.empty[Long, Vector[(Long, String)]]
    def fresh(n: Int): Vector[(Long, String)] =
      (0 until n).map { _ => next += 1; (next, s"s$seed-$next") }.toVector

    (1 to nOps).foreach { _ =>
      rnd.nextInt(10) match {
        case 0 | 1 | 2 | 3 => // append
          val rows = fresh(1 + rnd.nextInt(5))
          t.append(rows.toDF("k", "v"))
          model ++= rows
          hist += (t.currentVersion -> model)
        case 4 | 5 => // overwrite with a mix of old and new keys
          val rows = rnd.shuffle(model).take(rnd.nextInt(model.size + 1)) ++ fresh(2)
          t.overwrite(rows.toDF("k", "v"))
          model = rows
          hist += (t.currentVersion -> model)
        case 6 | 7 => // DV delete on a key residue
          val m = 2 + rnd.nextInt(4); val r = rnd.nextInt(m)
          val deleted = t.deleteWhere(col("k") % m === r)
          val kept = model.filterNot(row => row._1 % m == r)
          assert(deleted == model.size - kept.size,
            s"seed $seed: deleteWhere count ${deleted} != ${model.size - kept.size}")
          model = kept
          if (deleted > 0) hist += (t.currentVersion -> model)
        case 8 => // OPTIMIZE: logical no-op, but IS a version
          if (t.compact(targetFileBytes = 4096L) > 0)
            hist += (t.currentVersion -> model)
        case 9 => // retention GC: drops history, keeps the live content
          val retain = 1 + rnd.nextInt(3)
          val dropped = t.vacuum(retainLast = retain).toSet
          hist = hist.filterNot { case (v, _) => dropped.contains(v) }
      }
      val got = t.read().as[(Long, String)].collect().sortBy(_._1).toSeq
      assert(got == model.sortBy(_._1),
        s"seed $seed: live read diverged from the model after ${t.currentVersion} commits")
    }
    // every retained version still replays to its exact historical content
    hist.foreach { case (v, want) =>
      val got = t.readVersion(v).as[(Long, String)].collect().sortBy(_._1).toSeq
      assert(got == want.sortBy(_._1), s"seed $seed: version $v diverged")
    }
    // GC everything and confirm the live table survives its own vacuum
    t.vacuum(retainLast = 1)
    assert(t.read().count() == model.size)
  }

  test("random op sequences match the in-memory model (3 seeds x 25 ops, " +
      "checkpoint intervals 1-4, live + historical reads)") {
    Seq(11, 42, 1337).foreach(runSeed(_, 25))
  }
}
