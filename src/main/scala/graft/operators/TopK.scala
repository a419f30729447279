package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftSqlBridge

/** Bounded per-group top-k — `groupBy(keys).agg(CollectTopK)` in place
  * of a `row_number` window. The window form moves the FULL scored
  * relation through its ranking exchange; here every mapper keeps at
  * most k rows per group in a bounded priority queue and partials merge
  * associatively (the min-k semilattice — the a17/argmax algebra), so
  * the shuffle carries ≤ |groups|·k rows no matter how large the scored
  * relation is. Ranks are recovered by sorting the ≤k survivors IN-ROW.
  *
  * Generalized from the similarity tier's per-probe form so any
  * "top-k per key" stage (per-probe neighbors, per-document terms)
  * shares one audited implementation.
  */
object TopK {

  /** `ordKey` must be ascending-is-better and UNIQUE per group (callers
    * compose struct(±score, tiebreaks…)). NaN components sort LAST here
    * where a desc window put them first — callers rank round()ed finite
    * scores, so none sees the divergence.
    */
  def perGroup(scored: DataFrame, groupCols: Seq[String], ordKey: Column,
               k: Int, rankName: String): DataFrame = {
    val payloadCols = scored.columns.filterNot(groupCols.contains).toSeq
    val item = struct(ordKey.as("__k"),
      struct(payloadCols.map(col): _*).as("__p"))
    scored.groupBy(groupCols.map(col): _*)
      .agg(GraftSqlBridge.collectTopK(item, k, reverse = true).as("__topk"))
      .select(groupCols.map(col) :+
        posexplode(array_sort(col("__topk"))).as(Seq("__pos", "__e")): _*)
      .select(groupCols.map(col) ++ ((col("__pos") + 1).as(rankName) +:
        payloadCols.map(c => col(s"__e.__p.$c").as(c))): _*)
  }
}
