package graft

import org.apache.spark.sql.SparkSession

/** Smoke-check for the cluster-deploy function path: builds a session
  * with `spark.sql.extensions=graft.GraftExtensions` (extensions only
  * apply at session construction, so this needs its own JVM — the
  * shared-test-session specs cannot cover it) and evaluates every
  * injected function through PLAIN SQL, no Scala registration in the
  * user's path. Exits non-zero on any mismatch. Run by round_close.sh:
  *   tools/run_main.sh graft.ExtCheck
  */
object ExtCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def one[T](sql: String): T =
      spark.sql(sql).head().get(0).asInstanceOf[T]
    val checks = Seq[(String, Any, Any)](
      ("tok_count", one[Int]("SELECT tok_count('a  b c')"), 4),
      ("tok_count empty", one[Int]("SELECT tok_count('')"), 1),
      ("byte_at", one[Long]("SELECT byte_at(X'00FF7F', 1)"), 255L),
      ("byte_at oob",
        spark.sql("SELECT byte_at(X'00', 5)").head().isNullAt(0), true),
      ("vec_dot",
        one[Double]("SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))"), 11.0),
      ("str_hamming", one[Int]("SELECT str_hamming('abcd', 'abcf')"), 1),
      ("ewma", math.abs(one[Double](
        """SELECT ewma(v, 0.5d) OVER (ORDER BY i)
          |FROM VALUES (1, 1.0d), (2, 3.0d) AS t(i, v)
          |ORDER BY i DESC LIMIT 1""".stripMargin) - 2.0) < 1e-9, true))
    val bad = checks.filter { case (_, got, want) => got != want }
    bad.foreach { case (n, got, want) =>
      System.err.println(s"[extcheck] $n: got $got, want $want") }
    println(s"[extcheck] ${checks.size - bad.size}/${checks.size} injected functions OK via SQL")
    spark.stop()
    if (bad.nonEmpty) sys.exit(1)
  }
}
