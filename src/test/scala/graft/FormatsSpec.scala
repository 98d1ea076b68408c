package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.util.Tables

/** Source/sink format coverage beyond parquet: the engine's frames write
  * to and read back from JSON, CSV and ORC losslessly (schema supplied
  * on read where the format is schemaless). */
class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val sample = Tables.events(spark, sf)
    .select($"event_id", $"user_id", $"event_type", $"value")
    .orderBy($"event_id").limit(200)

  private def rmTree(dir: java.nio.file.Path): Unit = {
    val walk = Files.walk(dir)
    try walk.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.delete(p))
    finally walk.close()
  }

  private def roundtrip(fmt: String): Unit = {
    val dir = Files.createTempDirectory(s"fmt-$fmt")
    try {
      sample.write.mode("overwrite").format(fmt).save(dir.toString)
      val back = spark.read.format(fmt).schema(sample.schema).load(dir.toString)
      val a = sample.as[(Long, Long, String, Double)].collect().sortBy(_._1)
      val b = back.as[(Long, Long, String, Double)].collect().sortBy(_._1)
      assert(a.toSeq === b.toSeq, s"$fmt roundtrip diverged")
    } finally rmTree(dir)
  }

  test("json roundtrip is lossless")(roundtrip("json"))
  test("csv roundtrip is lossless")(roundtrip("csv"))
  test("orc roundtrip is lossless")(roundtrip("orc"))

  test("parquet schema evolution: mergeSchema unifies old and new writers") {
    // the ingestion reality at scale: yesterday's files lack the column
    // today's writer added; one read must span both generations
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("fmt-evolve")
    try {
      sample.select("event_id", "user_id")
        .write.mode("overwrite").parquet(s"$dir/gen=1")
      sample.select(col("event_id"), col("user_id"),
          round(col("value"), 6).as("value"))
        .write.mode("overwrite").parquet(s"$dir/gen=2")
      val unified = spark.read.option("mergeSchema", "true")
        .parquet(dir.toString)
      assert(unified.columns.toSet === Set("event_id", "user_id", "value", "gen"))
      assert(unified.count() === sample.count() * 2)
      // old-generation rows surface the new column as null
      assert(unified.filter(col("gen") === 1 && col("value").isNotNull).count() === 0)
      assert(unified.filter(col("gen") === 2 && col("value").isNull).count() === 0)
    } finally rmTree(dir)
  }

  test("csv with header infers and reads the same row count") {
    val dir = Files.createTempDirectory("fmt-csvh")
    try {
      sample.write.mode("overwrite").option("header", "true").csv(dir.toString)
      val back = spark.read.option("header", "true").option("inferSchema", "true")
        .csv(dir.toString)
      assert(back.count() === sample.count())
      assert(back.columns.toSeq === sample.columns.toSeq)
    } finally rmTree(dir)
  }
}
