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
