package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Core relational operator queries over the TPC-H-ish testdata.
  * Every query is fully deterministic (total ORDER BY, rounded float aggs)
  * so the DuckDB oracle hash-matches.
  */
object RelationalQueries {

  /** A1+P11 flagship: pricing summary (TPC-H Q1 shape) — grouped hash agg
    * with map-side partial aggregation; the scan prunes to 7 columns. */
  val q01 = QueryDef(
    "q01_pricing_summary",
    (spark, dir) => {
      val li = Tables.lineitem(spark, dir)
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
           |  round(sum(l_quantity), 2) AS sum_qty,
           |  round(sum(l_extendedprice), 2) AS sum_base_price,
           |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           |  round(avg(l_quantity), 4) AS avg_qty,
           |  round(avg(l_extendedprice), 4) AS avg_price,
           |  count(*) AS count_order
           |FROM lineitem
           |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
           |GROUP BY l_returnflag, l_linestatus
           |ORDER BY l_returnflag, l_linestatus""".stripMargin),
    "A1 grouped stats agg + P11 arithmetic/round (ref Gold/06-gold.py:93-95)")

  def defs: Seq[QueryDef] = Seq(q01)
}
