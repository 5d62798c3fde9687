package graft

/** Driver-contract smoke parity: `entry` returns rows at sf0.001, every
  * query name has a callable builder, and every oracle key matches a
  * query key (an orphan oracle would silently weaken the driver's gate).
  */
class EntrySpec extends SparkSpec {

  test("entry (flagship) returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are a subset of query keys; only q43 is oracle-less") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"orphan oracles: ${o -- q}")
    assert((q -- o) == Set("q43_approx_distinct"), s"missing oracles: ${q -- o}")
  }

  test("query names are unique and well-formed") {
    assert(SparkEntry.queries.keys.forall(_.matches("q\\d{2}_[a-z0-9_]+")))
  }
}
