package graft

import org.apache.spark.sql.SparkSession

/** Scratch harness: run a subset of SparkEntry.queries under the exact
  * Bench conditions (same session config, warm pass at sf0.001,
  * clearCache between queries) so per-query numbers are
  * driver-comparable. Usage: runMain graft.Probe q34_simhash q79_...
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.Tuning(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.cleaner.periodicGC.interval", "1min")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else Seq("q34_simhash")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // warm exactly like Bench: full suite once at sf0.001
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM", "/root/testdata/sf0.001")
    if (warmDir != "0") {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
        try { fn(spark, warmDir).count(); () } catch { case _: Throwable => () }
        spark.catalog.clearCache()
      }
    }
    (1 to reps).foreach { rep =>
      names.foreach { name =>
        val fn = SparkEntry.queries(name)
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        println(f"[probe rep$rep] $name%-24s $sec%8.2f s")
      }
    }
    spark.stop()
  }
}
