package graft

/** Driver-contract smoke parity: `entry` returns rows at sf0.001, every
  * query name has a callable builder, and every oracle key matches a
  * query key (an orphan oracle would silently weaken the driver's gate).
  */
class EntrySpec extends SparkSpec {

  test("entry (flagship) returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle, and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"orphan oracles: ${o -- q}")
    assert((q -- o).isEmpty, s"missing oracles: ${q -- o}")
  }

  test("query names are unique and well-formed") {
    // an optional letter suffix marks a twin of the same-numbered query
    // (q23b = q23 via the scalable id path, q105b = q105 via the index)
    assert(SparkEntry.queries.keys.forall(_.matches("q\\d{2,3}[a-z]?_[a-z0-9_]+")),
      SparkEntry.queries.keys.filterNot(_.matches("q\\d{2,3}[a-z]?_[a-z0-9_]+"))
        .mkString(", "))
  }
}
