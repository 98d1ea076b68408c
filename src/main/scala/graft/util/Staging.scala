package graft.util

import org.apache.spark.sql.SparkSession

/** Phase-staging machinery for operators whose single-plan spelling
  * accumulates more shuffle spill than the disk budget at large scale
  * (first built for the PPJoin sf100 pipeline, now shared by the graph
  * iteration loops and the KN-trigram scorer). The pattern: write each
  * phase's output as compressed columnar parquet, drop the phase's plan
  * references, drain the freed shuffle files, and start the next phase
  * from the parquet — peak disk becomes (staged parquet) + (one phase's
  * own spill) instead of the sum of every phase's spill. On a cluster
  * the same staging is checkpoint()/exchange-reuse; the parquet spelling
  * is also restart-friendly (phases are idempotent overwrites). */
object Staging {

  /** Delete a consumed phase directory early (the shutdown hook handles
    * whatever remains). */
  def rmStage(path: String): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    rm(new java.io.File(path))
  }

  /** Release the finished phase's shuffle files before the next phase
    * spills: shuffle data lives on disk until the ShuffleDependency is
    * garbage-collected and the ContextCleaner processes it, so a staged
    * pipeline that keeps its plan objects reachable still ACCUMULATES
    * every phase's shuffle on disk (measured: the sf100 prefix pipeline
    * died of disk with each phase individually affordable). The phase
    * plans are scoped in `locally` blocks so their references die here;
    * System.gc() queues them for the cleaner, and instead of a fixed
    * sleep we POLL the block-manager scratch (`blockmgr-*` under
    * spark.local.dir) until its footprint stops shrinking — a clean
    * input exits in ~2 samples, a draining one gets up to 3 s, and a
    * -XX:+DisableExplicitGC JVM just falls through after the bound
    * (correctness never depends on the drain; only peak disk does).
    * On a real cluster the equivalent is the shuffle service's stage
    * cleanup. */
  def drainPhaseShuffles(spark: SparkSession): Unit = {
    val roots = spark.sparkContext.getConf
      .get("spark.local.dir", System.getProperty("java.io.tmpdir"))
      .split(",").map(new java.io.File(_))
    def dirSize(f: java.io.File): Long =
      if (f.isDirectory)
        Option(f.listFiles()).map(_.map(dirSize).sum).getOrElse(0L)
      else f.length()
    def shuffleBytes: Long = roots
      .flatMap(r => Option(r.listFiles()).getOrElse(Array.empty[java.io.File]))
      .filter(_.getName.startsWith("blockmgr-")).map(dirSize).sum
    System.gc()
    val deadline = System.nanoTime() + 3000L * 1000 * 1000
    var prev = shuffleBytes
    var flat = 0
    while (System.nanoTime() < deadline && flat < 2) {
      Thread.sleep(150)
      val now = shuffleBytes
      if (now < prev) flat = 0 else flat += 1
      prev = now
    }
  }

  /** Per-construction sequence number: slots are never shared between
    * constructions, so two interleaved constructions on the same input
    * can never overwrite each other's phases. */
  val stageSeq = new java.util.concurrent.atomic.AtomicLong()

  /** Digest of the ABSOLUTE input path (not String.hashCode — 32-bit
    * collisions between two dirs would silently cross-wire their staged
    * phases). */
  def pathDigest(dir: String): String = {
    val abs = new java.io.File(dir).getAbsolutePath
    val md = java.security.MessageDigest.getInstance("SHA-1")
    md.digest(abs.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
  }

  private val stagedSlots =
    new java.util.concurrent.ConcurrentHashMap[String, Boolean]()

  /** Per-construction scratch dir for phase staging, rooted at
    * `spark.graft.stage.root` (default java.io.tmpdir — on a cluster
    * point it at the shuffle-grade volume); recursively deleted on JVM
    * exit (deleteOnExit alone cannot remove a populated dir). Slot names
    * carry a digest of the input path plus a sequence number. */
  def stageDir(spark: SparkSession, slot: String): String = {
    val root = spark.conf.get(
      "spark.graft.stage.root", System.getProperty("java.io.tmpdir"))
    val d = new java.io.File(root, s"graft_stage_$slot")
    d.mkdirs()
    if (stagedSlots.putIfAbsent(d.getAbsolutePath, true) == null)
      Runtime.getRuntime.addShutdownHook(new Thread(() => rmStage(d.getAbsolutePath)))
    d.getAbsolutePath
  }

  /** On-disk size of one input path (0 if absent) — staging decisions
    * read parquet footprint, never row counts, so they cost no job. */
  def inputBytes(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
  }

  /** Shared auto|on|off staging knob: `confKey` overrides, auto stages
    * when `path`'s parquet footprint is at least `minBytesKey` (default
    * `defaultMin`). The same decision shape as PPJoin's
    * `spark.graft.ppjoin.staging` — size thresholds live per operator
    * family because their spill multipliers differ. */
  def stagingEnabled(spark: SparkSession, confKey: String, minBytesKey: String,
      path: String, defaultMin: Long = 256L << 20): Boolean =
    spark.conf.get(confKey, "auto") match {
      case "on"  => true
      case "off" => false
      case _ =>
        val minBytes = spark.conf.get(minBytesKey, defaultMin.toString).toLong
        inputBytes(spark, path) >= minBytes
    }
}
