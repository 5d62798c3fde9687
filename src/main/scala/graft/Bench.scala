package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.engine.Tuning(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (JIT, codegen compilation, file-index, shuffle
    // machinery) by running the whole suite once against the tiny
    // sf0.001 fixtures, so timed numbers measure steady-state query
    // throughput at the target SF rather than first-run JVM costs.
    // Disable with SPARK_GRAFT_WARM=0.
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM", "/root/testdata/sf0.001")
    if (warmDir != "0" && new java.io.File(warmDir).isDirectory) {
      val t0 = System.nanoTime()
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
        try { fn(spark, warmDir).count(); () } catch { case _: Throwable => () }
        spark.catalog.clearCache()
      }
      System.err.println(
        f"[bench] warm pass ($warmDir) ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // A query that throws must fail the bench loudly — a swallowed
      // error would report a (fast!) wall time and read as a speedup.
      val err = try { fn(spark, sfDir).count(); None } catch {
        case e: Throwable =>
          Some(e.toString.linesIterator.next().take(200))
      }
      val sec = (System.nanoTime() - t0) / 1e9
      // per-invocation operator persists are dead after the count —
      // clear so the suite's footprint stays flat across 74 queries
      spark.catalog.clearCache()
      System.err.println(
        f"[bench] $name%-22s $sec%8.2f s${err.fold("")(" ERROR " + _)}")
      (name, sec, err)
    }
    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => s"\"$k\":${jstr(e)}" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
    if (results.exists(_._3.nonEmpty)) sys.exit(1)
  }
}
