package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.GraftUdafBridge
import graft.functions._

/** The library's `SparkSessionExtensions` hook (SURVEY.md §7.4) — the
  * deployment-grade registration path for the native expressions:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * makes every graft native function available from pure SQL in every
  * session of the application, with no per-session `register*` calls. The
  * imperative `TextFunctions.registerNative` / `VectorFunctions.register`
  * remain for programmatic use on an existing session; both paths build the
  * identical `Expression` nodes, so plans and results are the same.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    // SQL DML statement surface (MERGE INTO / UPDATE / DELETE FROM) over
    // graft-logtable catalog tables — see [[graft.sql.GraftSqlParser]]
    ext.injectParser((_, delegate) => new graft.sql.GraftSqlParser(delegate))
  }
}

object GraftExtensions {

  private def info(name: String, clazz: Class[_]) =
    new ExpressionInfo(clazz.getName, name)

  /** Plan-time integer argument: must be foldable, any integral width
    * accepted (a SQL bare literal may arrive as INT or BIGINT) — a clear
    * AnalysisException naming the function and parameter beats the bare
    * ClassCastException/NPE a CAST(… AS BIGINT) or non-foldable expression
    * would otherwise throw at plan time. */
  private def intArg(e: Expression, func: String, param: String): Int = {
    def fail(): Nothing = throw new org.apache.spark.sql.AnalysisException(
      errorClass = "NON_FOLDABLE_ARGUMENT",
      messageParameters = Map("funcName" -> s"`$func`",
        "paramName" -> s"`$param`", "paramType" -> "\"INT\""),
      cause = None)
    if (!e.foldable) fail()
    e.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case _ => fail()
    }
  }

  /** (identifier, info, builder) triples for `injectFunction` — one per
    * native expression. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_sim"), info("cosine_sim", classOf[CosineSimilarity]),
      (e: Seq[Expression]) => CosineSimilarity(e(0), e(1))),
    (FunctionIdentifier("sign_lsh"), info("sign_lsh", classOf[SignLsh]),
      (e: Seq[Expression]) => SignLsh(e(0), intArg(e(1), "sign_lsh", "bits"), intArg(e(2), "sign_lsh", "seed"))),
    (FunctionIdentifier("quantize_int8"), info("quantize_int8", classOf[QuantizeInt8]),
      (e: Seq[Expression]) => QuantizeInt8(e(0))),
    (FunctionIdentifier("word_shingles"), info("word_shingles", classOf[WordShinglesExpr]),
      (e: Seq[Expression]) => WordShinglesExpr(e(0), intArg(e(1), "word_shingles", "n"))),
    (FunctionIdentifier("char_shingles"), info("char_shingles", classOf[CharShinglesExpr]),
      (e: Seq[Expression]) => CharShinglesExpr(e(0), intArg(e(1), "char_shingles", "n"))),
    (FunctionIdentifier("winnow_fps"), info("winnow_fps", classOf[WinnowingExpr]),
      (e: Seq[Expression]) => WinnowingExpr(e(0), intArg(e(1), "winnow_fps", "k"), intArg(e(2), "winnow_fps", "window"))),
    (FunctionIdentifier("content_fingerprint"), info("content_fingerprint", classOf[FingerprintExpr]),
      (e: Seq[Expression]) => FingerprintExpr(e(0))),
    (FunctionIdentifier("nfc_normalize"), info("nfc_normalize", classOf[NfcNormalizeExpr]),
      (e: Seq[Expression]) => NfcNormalizeExpr(e(0))),
    (FunctionIdentifier("img_dhash"), info("img_dhash", classOf[DHashExpr]),
      (e: Seq[Expression]) => DHashExpr(e(0))),
    (FunctionIdentifier("audio_ehash"), info("audio_ehash", classOf[AudioHashExpr]),
      (e: Seq[Expression]) => AudioHashExpr(e(0))),
    (FunctionIdentifier("video_khash"), info("video_khash", classOf[VideoHashExpr]),
      (e: Seq[Expression]) => VideoHashExpr(e(0))),
    (FunctionIdentifier("frame_energy"), info("frame_energy", classOf[FrameEnergyExpr]),
      (e: Seq[Expression]) => FrameEnergyExpr(e(0))),
    (FunctionIdentifier("top_bigram_frac"), info("top_bigram_frac", classOf[TopBigramFracExpr]),
      (e: Seq[Expression]) => TopBigramFracExpr(e(0))),
    (FunctionIdentifier("bpe_encode"), info("bpe_encode", classOf[BpeEncodeExpr]),
      (e: Seq[Expression]) => BpeEncodeExpr(e(0))),
    (FunctionIdentifier("bloom_might_contain"), info("bloom_might_contain", classOf[BloomMightContain]),
      (e: Seq[Expression]) => BloomMightContain(e(0),
        e(1).eval().asInstanceOf[Array[Byte]])),
    (FunctionIdentifier("interleave_bits"), info("interleave_bits", classOf[InterleaveBits]),
      (e: Seq[Expression]) => InterleaveBits(e(0), e(1))),
    (FunctionIdentifier("pq_encode"), info("pq_encode", classOf[PqEncodeExpr]),
      (e: Seq[Expression]) => PqEncodeExpr(e(0),
        e(1).eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toDoubleArray(),
        intArg(e(2), "pq_encode", "m"), intArg(e(3), "pq_encode", "ksub"),
        intArg(e(4), "pq_encode", "dsub"))),
    (FunctionIdentifier("pq_dist_table"), info("pq_dist_table", classOf[PqDistTableExpr]),
      (e: Seq[Expression]) => PqDistTableExpr(e(0),
        e(1).eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toDoubleArray(),
        intArg(e(2), "pq_dist_table", "m"), intArg(e(3), "pq_dist_table", "ksub"),
        intArg(e(4), "pq_dist_table", "dsub"))),
    (FunctionIdentifier("pq_adc"), info("pq_adc", classOf[PqAdcExpr]),
      (e: Seq[Expression]) => PqAdcExpr(e(0), e(1),
        intArg(e(2), "pq_adc", "m"), intArg(e(3), "pq_adc", "ksub"))),
    (FunctionIdentifier("residual_vec"), info("residual_vec", classOf[ResidualExpr]),
      (e: Seq[Expression]) => ResidualExpr(e(0), e(1),
        e(2).eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toDoubleArray(),
        intArg(e(3), "residual_vec", "dims"))),
    (FunctionIdentifier("nearest_cells"), info("nearest_cells", classOf[NearestCellsExpr]),
      (e: Seq[Expression]) => NearestCellsExpr(e(0),
        e(1).eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toDoubleArray(),
        e(2).eval().asInstanceOf[Int], e(3).eval().asInstanceOf[Int])),
    (FunctionIdentifier("nearest_cell_l2"), info("nearest_cell_l2", classOf[NearestCellL2Expr]),
      (e: Seq[Expression]) => NearestCellL2Expr(e(0),
        e(1).eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toLongArray(),
        intArg(e(2), "nearest_cell_l2", "dims"))),
    (FunctionIdentifier("hierarchical_cells"), info("hierarchical_cells", classOf[HierarchicalCellsExpr]),
      (e: Seq[Expression]) => {
        def dArr(i: Int) = e(i).eval()
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray()
        def iArr(i: Int) = e(i).eval()
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toIntArray()
        HierarchicalCellsExpr(e.head, dArr(1), dArr(2), iArr(3), iArr(4),
          intArg(e(5), "hierarchical_cells", "dims"), intArg(e(6), "hierarchical_cells", "nlist"), intArg(e(7), "hierarchical_cells", "probeSupers"))
      }),
    // ---- mergeable sketch aggregates ([[Sketches]]) ----
    // Injected through the same ScalaAggregator bridge `spark.udf.register`
    // uses for a UserDefinedAggregator, so `SELECT kmv_distinct(md5(k))`
    // plans the identical TypedImperativeAggregate the DataFrame udaf path
    // builds — partial-merge map-side agg included. The analyzer wraps the
    // returned AggregateFunction in an AggregateExpression itself.
    (FunctionIdentifier("kmv_distinct"), info("kmv_distinct", classOf[Sketches.Kmv]),
      (e: Seq[Expression]) => GraftUdafBridge.aggregate(
        new Sketches.Kmv(if (e.length > 1) intArg(e(1), "kmv_distinct", "k") else 256), "kmv_distinct",
        e.take(1))),
    (FunctionIdentifier("hll_distinct"), info("hll_distinct", classOf[Sketches.Hll]),
      (e: Seq[Expression]) => GraftUdafBridge.aggregate(
        new Sketches.Hll, "hll_distinct", e.take(1))),
    (FunctionIdentifier("cms_sketch"), info("cms_sketch", classOf[Sketches.Cms]),
      (e: Seq[Expression]) => GraftUdafBridge.aggregate(
        new Sketches.Cms(
          if (e.length > 1) intArg(e(1), "cms_sketch", "d") else 4,
          if (e.length > 2) intArg(e(2), "cms_sketch", "w") else 64), "cms_sketch",
        e.take(1))))
}
