package graft

/** Case-class models for the fixture tables — the `Dataset[T]` typed
  * boundary (SURVEY.md §1.1 mapping: typed where field-level
  * compile-time checks help; `DataFrame` elsewhere). Field names/types
  * mirror FIXTURES.md §A exactly so `.as[T]` is a checked cast.
  */
object Typed {
  final case class Order(
      o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
      o_totalprice: Double, o_orderdate: java.sql.Timestamp, o_orderpriority: String)

  final case class Customer(
      c_custkey: Long, c_name: String, c_nationkey: Int,
      c_acctbal: Double, c_mktsegment: String)

  final case class Document(
      doc_id: Long, text: String, lang: String, source: String, n_chars: Long)
}
