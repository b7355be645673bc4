package graft.typed

import graft.Tables
import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed Dataset façade over the star schema: case-class encoders for
  * the code paths where compile-time row types pay off (complex
  * per-row logic, groupByKey flows, streaming state). Plans still go
  * through Catalyst — `as[T]` is a view, not a copy — so pushdown and
  * codegen are preserved; use the untyped operators for purely
  * relational shapes (no lambda opacity to the optimizer).
  */
object TypedOps {
  case class Lineitem(l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
                      l_linenumber: Int, l_quantity: Double, l_extendedprice: Double,
                      l_discount: Double, l_tax: Double, l_returnflag: String,
                      l_linestatus: String, l_shipdate: java.sql.Timestamp)

  case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
                   o_totalprice: Double, o_orderdate: java.sql.Timestamp,
                   o_orderpriority: String)

  case class Document(doc_id: Long, text: String, lang: String,
                      source: String, n_chars: Long)

  def lineitems(s: SparkSession, d: String): Dataset[Lineitem] = {
    import s.implicits._
    Tables.lineitem(s, d).as[Lineitem]
  }

  def orders(s: SparkSession, d: String): Dataset[Order] = {
    import s.implicits._
    Tables.orders(s, d).as[Order]
  }

  def documents(s: SparkSession, d: String): Dataset[Document] = {
    import s.implicits._
    Tables.documents(s, d).as[Document]
  }

  /** Typed per-flag revenue: groupByKey + mapGroups with full row
    * types — the imperative-bolt escape hatch, for logic that doesn't
    * decompose into column expressions.
    */
  def revenueByFlag(s: SparkSession, d: String): Dataset[(String, Double)] = {
    import s.implicits._
    lineitems(s, d)
      .groupByKey(_.l_returnflag)
      .mapGroups { (flag, rows) =>
        var rev = 0.0
        rows.foreach(r => rev += r.l_extendedprice * (1 - r.l_discount))
        (flag, rev)
      }
  }
}
