package graft

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.functions._

/** Guard against physical-schema drift in the driver-generated testdata.
  *
  * The harness has regenerated `events.parquet` twice with different
  * physical `ts` encodings (TIMESTAMP(NANOS) → read as Long under the
  * legacy conf, then plain TIMESTAMP(MICROS) → read as TIMESTAMP_NTZ by
  * Spark 4), and the second change broke 11 queries at analysis time.
  * This spec rebuilds a byte-identical `events` table under all three
  * encodings the loader claims to handle and asserts EVERY declared query
  * analyzes against each — so the next regeneration fails here first, not
  * in the round gate.
  */
class SchemaDriftSpec extends SparkSpec {

  /** Write `df` as a single parquet FILE at `dir/events.parquet`
    * (the testdata layout is one file per table, not a directory). */
  private def writeSingleFile(df: org.apache.spark.sql.DataFrame, dir: Path): Unit = {
    val staging = Files.createTempDirectory("graft-drift-stage")
    df.coalesce(1).write.mode("overwrite").parquet(staging.resolve("ev").toString)
    val ls = Files.list(staging.resolve("ev"))
    val part = try {
      import scala.jdk.CollectionConverters._
      ls.iterator().asScala.find(_.getFileName.toString.endsWith(".parquet"))
    } finally ls.close()
    Files.copy(part.getOrElse(fail("no part file written")), dir.resolve("events.parquet"))
  }

  /** Temp table dir: symlinks to every sf0.001 table except events,
    * plus events re-encoded per `enc`. */
  private def tableDir(enc: String): Path = {
    val src = Paths.get(sf)
    val dir = Files.createTempDirectory(s"graft-drift-$enc")
    val ls = Files.list(src)
    try ls.forEach { p =>
      if (p.getFileName.toString != "events.parquet")
        Files.createSymbolicLink(dir.resolve(p.getFileName), p)
    } finally ls.close()
    val ev = graft.util.Tables.events(spark, sf) // normalized TimestampType
    val recoded = enc match {
      // UTC-adjusted micros → reads back as TIMESTAMP
      case "tz" => ev
      // un-adjusted micros → Spark 4 reads TIMESTAMP_NTZ (the round-5 breaker)
      case "ntz" => ev.withColumn("ts", col("ts").cast("timestamp_ntz"))
      // INT64 nanoseconds → reads as LongType under the legacy nanos conf
      case "long" => ev.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
    }
    writeSingleFile(recoded, dir)
    dir
  }

  for (enc <- Seq("tz", "ntz", "long")) {
    test(s"every query analyzes with events.ts encoded as $enc") {
      val dir = tableDir(enc).toString
      // DataFrames are analyzed eagerly at construction, so building each
      // query is exactly the failure mode the round-5 regression hit.
      SparkEntry.queries.foreach { case (name, fn) =>
        val df = try fn(spark, dir)
        catch { case e: Exception =>
          fail(s"$name failed analysis under ts=$enc: ${e.getMessage.linesIterator.next()}")
        }
        assert(df.schema.nonEmpty, s"$name produced an empty schema under ts=$enc")
      }
    }
  }

  test("eventsBetween pushes the range predicate into the scan under every encoding") {
    for (enc <- Seq("tz", "ntz", "long")) {
      val dir = tableDir(enc).toString
      val df = graft.util.Tables.eventsBetween(spark, dir,
        "2024-01-02T00:00:00Z", "2024-01-05T00:00:00Z")
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // the filter must sit on the RAW stored column (pre-cast), where
      // parquet row-group min/max pruning can use it
      assert(p.contains("GreaterThanOrEqual(ts,"),
        s"ts lower bound not pushed under $enc:\n$p")
      assert(p.contains("LessThan(ts,"),
        s"ts upper bound not pushed under $enc:\n$p")
    }
  }

  test("loader normalizes all three encodings to the same instants") {
    val base = graft.util.Tables.events(spark, sf)
      .select("event_id", "ts").orderBy("event_id").limit(50).collect().toSeq
    for (enc <- Seq("ntz", "long")) {
      val alt = graft.util.Tables.events(spark, tableDir(enc).toString)
        .select("event_id", "ts").orderBy("event_id").limit(50).collect().toSeq
      assert(alt === base, s"ts=$enc decodes to different instants")
    }
  }

  /** Temp dir with documents/embeddings re-encoded at narrowed widths
    * (int64→int32 ids/counts, float→double embeddings) — the drift
    * shapes a regenerated corpus would most plausibly take. */
  private def corpusDriftDir(): Path = {
    val src = Paths.get(sf)
    val dir = Files.createTempDirectory("graft-drift-corpus")
    val skip = Set("documents.parquet", "embeddings.parquet")
    val ls = Files.list(src)
    try ls.forEach { p =>
      if (!skip(p.getFileName.toString))
        Files.createSymbolicLink(dir.resolve(p.getFileName), p)
    } finally ls.close()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("doc_id", col("doc_id").cast("int"))
      .withColumn("n_chars", col("n_chars").cast("int"))
    writeSingleFileAs(docs, dir, "documents.parquet")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .withColumn("vec_id", col("vec_id").cast("int"))
      .withColumn("embedding", col("embedding").cast("array<double>"))
      .withColumn("label", col("label").cast("smallint"))
    writeSingleFileAs(emb, dir, "embeddings.parquet")
    dir
  }

  private def writeSingleFileAs(df: org.apache.spark.sql.DataFrame,
      dir: Path, name: String): Unit = {
    val staging = Files.createTempDirectory("graft-drift-stage2")
    df.coalesce(1).write.mode("overwrite").parquet(staging.resolve("t").toString)
    val ls = Files.list(staging.resolve("t"))
    val part = try {
      import scala.jdk.CollectionConverters._
      ls.iterator().asScala.find(_.getFileName.toString.endsWith(".parquet"))
    } finally ls.close()
    Files.copy(part.getOrElse(fail("no part file written")), dir.resolve(name))
  }

  test("every query analyzes with narrowed documents/embeddings schemas") {
    val dir = corpusDriftDir().toString
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = try fn(spark, dir)
      catch { case e: Exception =>
        fail(s"$name failed analysis under narrowed corpus schemas: " +
          e.getMessage.linesIterator.next())
      }
      assert(df.schema.nonEmpty, s"$name produced an empty schema")
    }
  }

  test("corpus loaders normalize narrowed schemas to identical values") {
    val dir = corpusDriftDir().toString
    val base = graft.util.Tables.documents(spark, sf)
      .orderBy("doc_id").limit(20).collect().toSeq
    val alt = graft.util.Tables.documents(spark, dir)
      .orderBy("doc_id").limit(20).collect().toSeq
    assert(alt === base, "narrowed documents decode differently")
    val be = graft.util.Tables.embeddings(spark, sf)
      .orderBy("vec_id").limit(20).collect().toSeq
    val ae = graft.util.Tables.embeddings(spark, dir)
      .orderBy("vec_id").limit(20).collect().toSeq
    assert(ae === be, "narrowed embeddings decode differently")
  }

  test("an INCOMPATIBLE regeneration fails loudly at the loader, not silently-null") {
    val dir = Files.createTempDirectory("graft-drift-bad")
    val bad = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("doc_id",
        concat(lit("id-"), col("doc_id").cast("string"))) // non-numeric
    writeSingleFileAs(bad, dir, "documents.parquet")
    val e = intercept[Exception] {
      graft.util.Tables.documents(spark, dir.toString).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("schema drift")),
      s"expected the loader's schema-drift error, got: ${e.getMessage}")
  }
}
