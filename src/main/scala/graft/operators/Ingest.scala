package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** INGEST PIPELINES — ES's `_ingest/pipeline` processor chains, the
  * transformation layer every production cluster runs between the
  * bulk request and the index (the reference posts raw rows straight
  * to `_bulk` — `api/controllers/elastic_controller.go:184-250` —
  * and any field shaping happens in exactly this ES layer).
  *
  * A pipeline is an ORDERED list of processors, each a pure
  * column-level transformation, folded left over the batch frame —
  * so the whole chain compiles to ONE Catalyst projection
  * (codegen'd, zero UDFs, map-side only: at 100 TB the pipeline adds
  * no shuffle and no pass — it fuses into the ingest scan). The
  * processor set covers ES's most-used kernel:
  *
  *  - `set` (literal value), `rename`, `remove`
  *  - `lowercase` / `uppercase`
  *  - `gsub` (regexp_replace — replace-all, both engines' default)
  *  - `script` (a SQL expression over the row — ES's painless
  *    script processor with Catalyst as the compiler, the
  *    [[SegmentedIndex.runtimeFieldFacet]] stance)
  *
  * Missing-field behavior is ES's default (`ignore_missing: false`):
  * a processor naming an absent column FAILS LOUDLY at plan time —
  * never a silent no-op. `set`/`script` OVERWRITE an existing target
  * (ES's `override: true` default) and may mint new fields; `rename`
  * refuses an existing target (ES 400s that).
  *
  * [[simulate]] is ES's `_ingest/pipeline/_simulate`: the chain over
  * a bounded document slice, returning the transformed rows for
  * inspection before any index is touched. */
object Ingest {

  sealed trait Processor
  /** `set`: target column = a literal string (minting or
    * overwriting). */
  final case class SetProc(field: String, value: String)
    extends Processor
  /** `rename`: the source must exist, the target must not. */
  final case class RenameProc(from: String, to: String)
    extends Processor
  final case class RemoveProc(field: String) extends Processor
  final case class LowercaseProc(field: String) extends Processor
  final case class UppercaseProc(field: String) extends Processor
  /** `gsub`: regexp replace-all on a string field. */
  final case class GsubProc(field: String, pattern: String,
                            replacement: String) extends Processor
  /** `script`: target column = a SQL expression over the current
    * row (Catalyst-compiled — ES's script processor with the painless
    * interpreter swapped for codegen). */
  final case class ScriptProc(field: String, sqlExpr: String)
    extends Processor

  private def requireField(df: DataFrame, f: String,
                           proc: String): Unit =
    require(df.columns.contains(f),
      s"ingest $proc: field '$f' is absent (columns: " +
        df.columns.mkString(", ") + ") — ES's ignore_missing:false")

  /** Run the pipeline: fold the processors left over the frame. */
  def apply(df: DataFrame, procs: Seq[Processor]): DataFrame = {
    require(procs.nonEmpty, "an ingest pipeline needs processors")
    procs.foldLeft(df) { (d, p) =>
      p match {
        case SetProc(f, v) => d.withColumn(f, lit(v))
        case RenameProc(from, to) =>
          requireField(d, from, "rename")
          require(!d.columns.contains(to),
            s"ingest rename: target '$to' already exists (ES 400)")
          d.withColumnRenamed(from, to)
        case RemoveProc(f) =>
          requireField(d, f, "remove"); d.drop(f)
        case LowercaseProc(f) =>
          requireField(d, f, "lowercase")
          d.withColumn(f, lower(col(f)))
        case UppercaseProc(f) =>
          requireField(d, f, "uppercase")
          d.withColumn(f, upper(col(f)))
        case GsubProc(f, pat, rep) =>
          requireField(d, f, "gsub")
          d.withColumn(f, regexp_replace(col(f), pat, rep))
        case ScriptProc(f, e) => d.withColumn(f, expr(e))
      }
    }
  }

  /** ES's `_simulate`: the pipeline over the rows matching `pred`,
    * transformed rows returned doc_id-ordered for inspection. */
  def simulate(df: DataFrame, procs: Seq[Processor],
               pred: String): DataFrame =
    apply(df.filter(expr(pred)), procs).orderBy("doc_id")
}
