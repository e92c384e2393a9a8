package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main — one JSON line on stdout (driver contract), duplicated
  * to bench_out.json so the record stays machine-readable even when stdout
  * is wrapped in sbt log prefixes (VERDICT r02 #6).
  *
  * Runs the headline query set (SparkEntry.headline): the flagship KPIs
  * plus the heaviest representative of each operator family. Each query
  * gets one untimed warm-up pass, then the MIN of `BENCH_RUNS` timed runs
  * (min, not mean — the quantity of interest is the plan's cost, not
  * co-tenant noise; VERDICT r02 adjudicated a 1.48× "regression" that was
  * entirely environment noise). `flagship` sub-total (a1+a2) keeps the
  * number comparable with the round-1 baseline, which benched only those.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // local[32] per the target environment (single JVM, 32 executor
    // threads); shuffle partitions = cores, not the 200 default.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val timedRuns = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt)
    // Load guard (VERDICT r04 #2): this box runs co-tenant work and
    // same-code timings vary ±30-50% under load — wait (bounded) for the
    // 1-minute loadavg to drop below cpus/4 before timing anything, so the
    // recorded MINs measure plans, not contention. stderr only: stdout is
    // the one-JSON-line driver contract.
    val maxWaitSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_LOADWAIT_SEC", "240").toInt
    def loadavg(): Double =
      try Files.readString(Paths.get("/proc/loadavg")).split(" ")(0).toDouble
      catch { case _: Throwable => 0.0 }
    val loadCap = cpus.toDouble / 4.0
    var waited = 0
    while (loadavg() > loadCap && waited < maxWaitSec) {
      System.err.println(f"bench load guard: loadavg ${loadavg()}%.2f > $loadCap%.1f, waiting (${waited}s/${maxWaitSec}s)")
      Thread.sleep(10000)
      waited += 10
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet stores TIMESTAMP(NANOS); read as long, converted
      // back to timestamp in graft.sources.Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // bucketed-table queries saveAsTable into the warehouse — keep it in
      // a temp dir, not ./spark-warehouse inside the repo
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Global session warm-up: one tiny end-to-end job (scan+agg) so the
    // first benched query doesn't pay SparkSession/codegen init.
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case _: Throwable => () }

    var failed = false
    val results = SparkEntry.headline.map { name =>
      val fn = SparkEntry.queries(name)
      def once(): Either[String, Double] = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Right((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          Left(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
        }
      }
      once() // warm-up pass (untimed); also surfaces errors deterministically
      // clear BEFORE each timed run, not just between queries: cache-bearing
      // operators (near-dup band signatures, kmeans centroids) would
      // otherwise serve every timed run from the warm-up's cache and the
      // reported MIN would exclude the operator's own materialization cost
      // (ADVICE r03)
      val runs = (1 to timedRuns).map { _ =>
        spark.catalog.clearCache()
        once()
      }
      val r = runs.collectFirst { case Left(e) => Left(e) }
        .getOrElse(Right(runs.collect { case Right(s) => s }.min))
      if (r.isLeft) failed = true
      spark.catalog.clearCache()
      (name, r)
    }
    // escape ALL control chars (<0x20), like Verify.q — a stray \b in an
    // exception message must not corrupt the bench JSON record
    def esc(s: String): String = s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => " "
      case c => c.toString
    }
    // streaming throughputs (VERDICT r03 #4): each surface is drained with
    // AvailableNow and reported as <prefix>_<count/sec/rate> keys; a
    // failure is recorded as <prefix>_err but does NOT fail the bench (the
    // query set is the driver contract, streaming metrics are
    // supplementary)
    def streamMetric(prefix: String, countKey: String, rateKey: String)
                    (thunk: => (Long, Double)): String =
      (try Right(thunk)
       catch { case e: Throwable =>
         Left(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
       }) match {
        case Right((n, secs)) =>
          s""""${prefix}_$countKey":$n,"${prefix}_sec":$secs,""" +
            s""""${prefix}_$rateKey":${(n / secs).round}"""
        case Left(e) => s""""${prefix}_err":"${esc(e)}""""
      }
    val qs = results.map {
      case (k, Right(v)) => s""""${esc(k)}":$v"""
      case (k, Left(e))  => s""""${esc(k)}":{"err":"${esc(e)}"}"""
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, Right(v)) => v }.sum
    val flagship = results.collect {
      case (n, Right(v)) if n == "a1_category_kpis" || n == "a2_daily_kpis" => v
    }.sum
    // MemoryStream → stateful completeness join → keyed upsert sink
    val streamJson = streamMetric("streaming", "events", "events_per_sec")(
      graft.streaming.StreamBench.completenessThroughput(
        spark, nOrders = 20000, itemsPer = 3))
    // the corpus-prep chain: content dedup → annotate → gate → rollup
    val corpusJson = streamMetric("corpus_stream", "docs", "docs_per_sec")(
      graft.streaming.StreamBench.corpusPrepThroughput(spark, nDocs = 50000))
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""flagship_total":$flagship,$streamJson,$corpusJson,""" +
        s""""cpus":$cpus,"timed_runs":$timedRuns,"sf":"$sfDir"}"""
    println(line)
    try Files.writeString(Paths.get("bench_out.json"), line + "\n")
    catch { case _: Throwable => () }
    spark.stop()
    if (failed) sys.exit(1)
  }
}
