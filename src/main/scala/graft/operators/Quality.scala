package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint audit — the dbt-test /
  * Great-Expectations capability, Spark-native: every rule compiles to
  * a violation COUNT so the audit of a 100 TB table is a handful of
  * aggregates, never a row-level materialization. Three rule shapes:
  *
  *  - row predicates (not-null, range, set membership, custom):
  *    ALL rules over one table fuse into ONE conditional-aggregation
  *    scan — adding a rule costs a counter, not a pass;
  *  - key uniqueness: one partial-aggregated distinct count;
  *  - referential integrity: orphan count via an anti join (broadcast
  *    when the parent's key set is small; AQE picks otherwise).
  *
  * Every check emits `(rule, n_violations, n_checked)` — the
  * audit result is itself a tiny frame, suitable for gating a write
  * (fail the pipeline when any `n_violations > 0`) or for trend
  * tables.
  *
  * Reference basis: the reference validates only request shape
  * (`/root/reference/api/controllers/query_controller.go:38-51`) and
  * delegates data integrity to the backing stores; this is the
  * engine-native equivalent for a store-less lakehouse (SURVEY §2.5).
  */
object Quality {

  /** One violation-count row. */
  private def row(name: String, violations: Column,
                  checked: Column): Column =
    struct(lit(name).as("rule"),
      violations.cast("long").as("n_violations"),
      checked.cast("long").as("n_checked"))

  /** All row-predicate rules over one table in ONE scan: each rule is
    * `(name, violationPredicate)`; the output has one row per rule.
    */
  def rowRules(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    val counters = rules.map { case (name, bad) =>
      row(name, sum(when(bad, 1L).otherwise(0L)), count(lit(1)))
    }
    df.agg(array(counters: _*).as("rows"))
      .select(explode(col("rows")).as("r"))
      .select("r.rule", "r.n_violations", "r.n_checked")
  }

  /** Key-uniqueness rule: violations = rows beyond the first of each
    * duplicated key (so 0 means the key is unique). Null keys count
    * as violations — a unique key is implicitly non-null.
    */
  def uniqueKey(df: DataFrame, name: String,
                keys: Seq[String]): DataFrame = {
    val keyCols = keys.map(col)
    val nonNull = df.filter(keyCols.map(_.isNotNull).reduce(_ && _))
    val total = df.agg(count(lit(1)).as("total"))
    val dist = nonNull.select(keyCols: _*).distinct()
      .agg(count(lit(1)).as("dist"))
    total.crossJoin(dist)
      .select(lit(name).as("rule"),
        (col("total") - col("dist")).cast("long").as("n_violations"),
        col("total").cast("long").as("n_checked"))
  }

  /** Referential integrity: child rows whose `fk` has no match in the
    * parent's `pk` (null FKs are orphans too — use a row rule to
    * permit nullable FKs). The anti join is the exact orphan set; only
    * its COUNT leaves the plan.
    */
  def refIntegrity(child: DataFrame, parent: DataFrame, name: String,
                   fk: String, pk: String): DataFrame = {
    val orphans = child.select(col(fk))
      .join(parent.select(col(pk).as(fk)).distinct(), Seq(fk),
        "left_anti")
    child.agg(count(lit(1)).as("total"))
      .crossJoin(orphans.agg(count(lit(1)).as("bad")))
      .select(lit(name).as("rule"),
        col("bad").cast("long").as("n_violations"),
        col("total").cast("long").as("n_checked"))
  }

  /** Union of checks → the audit report, one row per constraint. */
  def audit(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_.unionByName(_)).orderBy("rule")
}
