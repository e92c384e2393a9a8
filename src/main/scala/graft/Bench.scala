package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line on stdout (driver contract).
  *
  * Per VERDICT r01: each query gets an untimed warm-up pass (JVM/codegen/
  * session warm-up otherwise lands on whichever query runs first), failures
  * are recorded per-query as `"err"` instead of being swallowed, and the
  * process exits nonzero if any query failed.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Global session warm-up: one tiny end-to-end job (scan+agg) so the
    // first benched query doesn't pay SparkSession/codegen init.
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case _: Throwable => () }

    var failed = false
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Either[String, Long] =
        try Right(fn(spark, sfDir).count())
        catch { case e: Throwable =>
          Left(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
        }
      once() // warm-up pass (untimed); also surfaces errors deterministically
      val t0 = System.nanoTime()
      val r = once()
      val sec = (System.nanoTime() - t0) / 1e9
      if (r.isLeft) failed = true
      (name, sec, r)
    }
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", " ").replace("\r", " ").replace("\t", " ")
    val qs = results.map {
      case (k, v, Right(_)) => s""""${esc(k)}":$v"""
      case (k, _, Left(e))  => s""""${esc(k)}":{"err":"${esc(e)}"}"""
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, v, Right(_)) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
    if (failed) sys.exit(1)
  }
}
