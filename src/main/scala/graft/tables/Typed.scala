package graft.tables

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed Dataset[T] surface over the core tables (SURVEY.md §1.4): the
  * DataFrame API stays the workhorse for relational queries, but pipeline
  * code that pattern-matches rows, carries domain invariants, or feeds
  * typed stateful streaming (EventStreams.runningUserActivity) gets
  * compile-time schemas here. Encoders are derived from the case classes;
  * `as[T]` validates column names/types against the parquet footer at
  * analysis time, so a schema drift fails fast instead of silently
  * reading garbage. */
object Typed {
  case class Nation(n_nationkey: Long, n_name: String, n_regionkey: Long)
  case class Customer(c_custkey: Long, c_name: String, c_nationkey: Long,
                      c_mktsegment: String)
  case class Order(o_orderkey: Long, o_custkey: Long, o_totalprice: Double,
                   o_orderdate: Timestamp)
  case class LineItem(l_orderkey: Long, l_partkey: Long, l_linenumber: Long,
                      l_quantity: Double, l_extendedprice: Double,
                      l_discount: Double)
  case class Part(p_partkey: Long, p_name: String, p_brand: String,
                  p_type: String)
  case class Document(doc_id: Long, text: String, lang: String,
                      source: String, n_chars: Long)

  private def pick[T](spark: SparkSession, dir: String, name: String,
                      cols: Seq[String])(implicit e: org.apache.spark.sql.Encoder[T])
  : Dataset[T] = {
    import org.apache.spark.sql.functions.col
    Tables.load(spark, dir, name).select(cols.map(col): _*).as[T]
  }

  def nations(s: SparkSession, dir: String): Dataset[Nation] = {
    import s.implicits._
    pick[Nation](s, dir, "nation", Seq("n_nationkey", "n_name", "n_regionkey"))
  }

  def customers(s: SparkSession, dir: String): Dataset[Customer] = {
    import s.implicits._
    pick[Customer](s, dir, "customer",
      Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment"))
  }

  def orders(s: SparkSession, dir: String): Dataset[Order] = {
    import s.implicits._
    pick[Order](s, dir, "orders",
      Seq("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"))
  }

  def lineitems(s: SparkSession, dir: String): Dataset[LineItem] = {
    import s.implicits._
    pick[LineItem](s, dir, "lineitem",
      Seq("l_orderkey", "l_partkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount"))
  }

  def parts(s: SparkSession, dir: String): Dataset[Part] = {
    import s.implicits._
    pick[Part](s, dir, "part", Seq("p_partkey", "p_name", "p_brand", "p_type"))
  }

  def documents(s: SparkSession, dir: String): Dataset[Document] = {
    import s.implicits._
    pick[Document](s, dir, "documents",
      Seq("doc_id", "text", "lang", "source", "n_chars"))
  }
}
