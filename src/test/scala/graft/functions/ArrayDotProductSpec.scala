package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ArrayDotProductSpec extends SparkSpec {
  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftFunctions.register(spark)
  }

  test("array_dot matches the interpreted HOF fold bit-for-bit") {
    val df = spark.read.parquet(s"$sf001/embeddings.parquet")
      .withColumn("dv", expr("transform(embedding, x -> cast(x as double))"))
      .withColumn("native", call_function("array_dot", col("dv"), col("dv")))
      .withColumn("hof", expr(
        "aggregate(zip_with(dv, dv, (x, y) -> x * y), " +
          "cast(0.0 as double), (acc, x) -> acc + x)"))
    val diffs = df.filter(col("native") =!= col("hof")).count()
    assert(diffs == 0L)
  }

  test("array_dot basic values and null propagation") {
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)))
      .toDF("a", "b")
      .withColumn("d", call_function("array_dot", col("a"), col("b")))
    assert(df.select("d").as[Double].head() == 32.0)
    val withNull = spark.sql(
      "SELECT array_dot(cast(null as array<double>), array(1.0d)) AS d")
    assert(withNull.head().isNullAt(0))
  }

  test("array_dot survives codegen (executes in a wholestage pipeline)") {
    GraftFunctions.register(spark)
    val df = spark.range(1000)
      .withColumn("v", expr("transform(sequence(0, 7), i -> cast(i * id as double))"))
      .withColumn("d", call_function("array_dot", col("v"), col("v")))
      .agg(sum("d"))
    assert(df.head().getDouble(0) > 0)
  }

  test("char_poly_hash equals the interpreted charHashExpr fold") {
    val df = spark.read.parquet(s"$sf001/documents.parquet")
      .select(explode(split(col("text"), " ")).as("t"))
      .withColumn("native", expr("char_poly_hash(t)"))
      .withColumn("hof", expr(graft.operators.TextOps.charHashExpr("t")))
    assert(df.filter(col("native") =!= col("hof")).count() == 0L)
    assert(df.count() > 0)
  }

  test("registration is idempotent and extension class applies cleanly") {
    GraftFunctions.register(spark)
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT array_dot(array(2.0d), array(3.0d))")
      .head().getDouble(0) == 6.0)
  }
}
