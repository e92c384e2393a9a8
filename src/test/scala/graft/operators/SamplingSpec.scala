package graft.operators

import java.security.MessageDigest
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Mixture sampling: greedy quota prefix in md5 order (checked against an
  * independent JDK md5), quota maximality, unlisted-domain drop,
  * partition-layout independence, and the weight→quota rounding trap.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  // one domain, 5 docs of 10 tokens each, quota 30 → exactly the first
  // 3 docs in md5(id) order survive
  private val docs = Seq(
    (1L, "d", 10L), (2L, "d", 10L), (3L, "d", 10L), (4L, "d", 10L), (5L, "d", 10L)
  ).toDF("doc_id", "lang", "n_tokens")

  test("quotaSample keeps the greedy md5-ordered prefix, exactly to the quota") {
    val kept = Sampling.quotaSample(docs, "doc_id", "lang", "n_tokens",
        Seq("d" -> 30L))
      .select("doc_id", "cum_tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val expectedIds = (1L to 5L).sortBy(id => (md5hex(id.toString), id)).take(3)
    assert(kept.keySet == expectedIds.toSet,
      s"kept ${kept.keySet}, want the md5-order prefix ${expectedIds.toSet}")
    // inclusive cumsums are 10, 20, 30 in hash order
    assert(kept.values.toSeq.sorted == Seq(10L, 20L, 30L))
  }

  test("quotaSample: a partial-fitting document is excluded, not truncated") {
    val kept = Sampling.quotaSample(docs, "doc_id", "lang", "n_tokens",
        Seq("d" -> 25L))
      .collect()
    assert(kept.length == 2, "25-token quota fits two whole 10-token docs")
  }

  test("quotaSample drops domains without a quota and respects per-domain order") {
    val two = Seq(
      (1L, "a", 5L), (2L, "a", 5L), (3L, "b", 5L), (4L, "b", 5L)
    ).toDF("doc_id", "lang", "n_tokens")
    val kept = Sampling.quotaSample(two, "doc_id", "lang", "n_tokens",
        Seq("a" -> 5L))
      .select("doc_id", "lang").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(kept.forall(_._2 == "a"), "unlisted domain b must contribute nothing")
    assert(kept.length == 1)
    val wantId = Seq(1L, 2L).minBy(id => (md5hex(id.toString), id))
    assert(kept(0)._1 == wantId)
  }

  test("quotaSample is independent of the input partition layout") {
    val quotas = Seq("d" -> 30L)
    val a = Sampling.quotaSample(docs, "doc_id", "lang", "n_tokens", quotas)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.quotaSample(docs.repartition(7), "doc_id", "lang",
        "n_tokens", quotas)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("mixtureReport aggregates kept docs, tokens, and fill against quota") {
    val kept = Sampling.quotaSample(docs, "doc_id", "lang", "n_tokens",
      Seq("d" -> 30L))
    val rep = Sampling.mixtureReport(kept, "lang", "n_tokens").collect()(0)
    assert(rep.getAs[Long]("n_docs") == 3L)
    assert(rep.getAs[Long]("kept_tokens") == 30L)
    assert(rep.getAs[Long]("quota") == 30L)
    assert(rep.getAs[Double]("fill_frac") == 1.0)
  }

  test("negative token counts clamp to zero instead of inflating the quota") {
    val bad = Seq((1L, "d", 10L), (2L, "d", -100L), (3L, "d", 10L), (4L, "d", 10L))
      .toDF("doc_id", "lang", "n_tokens")
    // without the clamp, -100 would offset the cumsum and admit all docs
    val kept = Sampling.quotaSample(bad, "doc_id", "lang", "n_tokens",
      Seq("d" -> 20L)).collect()
    // 2 ten-token docs fit; the negative doc counts as 0 tokens and may
    // itself be kept wherever its hash falls — never more than 3 rows
    assert(kept.length <= 3)
    assert(kept.map(_.getAs[Long]("n_tokens")).filter(_ > 0).sum <= 20L)
  }

  test("hashSplit: all rows of a group land on the same side") {
    val rows = Seq((1L, "g1"), (2L, "g1"), (3L, "g2"), (4L, "g2"), (5L, "g3"))
      .toDF("id", "grp")
    val split = Sampling.hashSplit(rows, "grp",
      Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
    val perGroup = split.groupBy("grp")
      .agg(countDistinct(col("split")).as("n")).collect()
    assert(perGroup.forall(_.getAs[Long]("n") == 1L))
  }

  test("hashSplit matches the hand-computed md5 threshold assignment") {
    val dig = java.security.MessageDigest.getInstance("MD5")
      .digest("g1".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val h8 = dig.substring(0, 8)
    // train cum 0.8 -> floor(0.8 * 2^32) = 0xcccccccc; valid 0.9 -> 0xe6666666
    val expected =
      if (h8 < "cccccccc") "train" else if (h8 < "e6666666") "valid" else "test"
    val got = Sampling.hashSplit(Seq(("g1", 1L)).toDF("grp", "x"), "grp",
        Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
      .select("split").collect()(0).getString(0)
    assert(got == expected)
  }

  test("hashSplit fractions are honored over many groups, independent of layout") {
    val groups = (1 to 2000).map(i => (i.toLong, s"group$i")).toDF("id", "grp")
    val frac = Sampling.hashSplit(groups.repartition(13), "grp",
        Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(frac("train") > 1500 && frac("train") < 1700, s"train=$frac")
    assert(frac.values.sum == 2000L)
    // layout independence: same assignment single-partition
    val a = Sampling.hashSplit(groups, "grp",
        Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
      .select("grp", "split").collect().map(r => (r.getString(0), r.getString(1))).toSet
    val b = Sampling.hashSplit(groups.coalesce(1), "grp",
        Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
      .select("grp", "split").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(a == b)
  }

  test("hashSplit routes null group keys to the FIRST split, never the eval side") {
    val rows = Seq((1L, Some("g")), (2L, None)).toDF("id", "grp")
    val got = Sampling.hashSplit(rows, "grp",
        Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got(2L) == "train")
  }

  test("hashSplit guards: weights sum, positivity, distinct names") {
    val rows = Seq((1L, "g")).toDF("id", "grp")
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(rows, "grp", Seq("a" -> 0.5, "b" -> 0.4))
    }
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(rows, "grp", Seq("a" -> 1.1, "b" -> -0.1))
    }
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(rows, "grp", Seq("a" -> 0.5, "a" -> 0.5))
    }
  }

  test("mixtureQuotas rounds instead of truncating the double product") {
    val q = Sampling.mixtureQuotas(20000L, Seq("a" -> 0.3, "b" -> 0.4)).toMap
    assert(q("a") == 6000L, "0.3 * 20000 = 5999.999... must round up, not floor")
    assert(q("b") == 8000L)
  }

  // ---- weightedSample (A-ES) ----

  /** Driver-side replay of the A-ES key: u from the first 15 md5 hex
    * digits, key = round(ln(−ln(u)) − ln(w), 6) — smaller = stronger. */
  private def aesKey(id: Long, w: Double): Double = {
    val v = java.lang.Long.parseLong(md5hex(id.toString).take(15), 16)
    val u = (v + 1).toDouble / 1152921504606846976.0
    BigDecimal(math.log(-math.log(u)) - math.log(w))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
  }

  test("weightedSample matches the driver-side A-ES model exactly") {
    val rows = (1L to 200L).map(i => (i, (i % 7 + 1).toDouble))
    val expected = rows.map { case (id, w) => (id, aesKey(id, w)) }
      .sortBy { case (id, k) => (k, id) }.take(25)
    val got = Sampling.weightedSample(rows.toDF("id", "w"), "id", "w", 25)
      .orderBy(col("rank"))
      .select("id", "sample_key").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == expected)
  }

  test("weightedSample excludes null and non-positive weights; rank is 1..k") {
    val rows = Seq((1L, Some(2.0)), (2L, Some(0.0)), (3L, Some(-1.0)),
      (4L, None), (5L, Some(1.0))).toDF("id", "w")
    val out = Sampling.weightedSample(rows, "id", "w", 10).collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L, 5L))
    assert(out.map(_.getInt(out.head.fieldIndex("rank"))).sorted.toSeq == Seq(1, 2))
  }

  test("weightedSample is invariant to input partitioning") {
    val rows = (1L to 500L).map(i => (i, (i % 13 + 1).toDouble)).toDF("id", "w")
    val a = Sampling.weightedSample(rows, "id", "w", 50)
      .collect().map(_.toSeq).toSet
    val b = Sampling.weightedSample(rows.repartition(17), "id", "w", 50)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("weightedSamplePerGroup: each stratum equals the global sampler run on it alone") {
    val rows = (1L to 300L).map(i => (i, s"g${i % 3}", (i % 11 + 1).toDouble))
      .toDF("id", "grp", "w")
    val strat = Sampling.weightedSamplePerGroup(rows, "id", "w", "grp", 10)
      .collect()
      .map(r => (r.getString(1), r.getLong(0), r.getInt(r.fieldIndex("rank"))))
      .toSet
    val expected = (0 until 3).flatMap { g =>
      Sampling.weightedSample(rows.filter(col("grp") === s"g$g"), "id", "w", 10)
        .collect().map(r => (s"g$g", r.getLong(0), r.getInt(r.fieldIndex("rank"))))
    }.toSet
    assert(strat == expected)
  }

  test("weightedSample favors heavy weights (inclusion follows weight)") {
    // ids 1..1000: weight 100 for ids <= 100, weight 1 otherwise.
    // Expected heavy inclusion ~ k * (heavy mass / total mass) is high;
    // the deterministic draw should reflect it by a wide margin.
    val rows = (1L to 1000L).map(i => (i, if (i <= 100) 100.0 else 1.0))
    val out = Sampling.weightedSample(rows.toDF("id", "w"), "id", "w", 100)
      .collect().map(_.getLong(0))
    val heavy = out.count(_ <= 100L)
    assert(heavy > 50, s"expected heavy-weight majority in the sample, got $heavy/100")
  }

  test("temperatureQuotas: alpha=1 recovers proportional shares") {
    val docs = Seq(("a", 300L), ("a", 100L), ("b", 100L), ("c", 100L))
      .toDF("source", "n_tok")
    val out = Sampling.temperatureQuotas(docs, "source", "n_tok",
        budget = 1000L, alpha = 1.0)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toMap
    assert(out("a") == ((400L, 0.666667, 667L)))
    assert(out("b") == ((100L, 0.166667, 167L)))
    assert(out("c") == ((100L, 0.166667, 167L)))
  }

  test("temperatureQuotas: alpha=0.5 flattens toward the small sources") {
    val docs = Seq(("big", 10000L), ("small", 100L)).toDF("source", "n_tok")
    val out = Sampling.temperatureQuotas(docs, "source", "n_tok",
        budget = 1100L, alpha = 0.5)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getLong(3))).toMap
    // sqrt: 100 vs 10 → weights 10/11 and 1/11 (vs 100:1 proportional)
    assert(out("big") == ((0.909091, 1000L)))
    assert(out("small") == ((0.090909, 100L)))
  }

  test("temperatureQuotas guards its domain") {
    val docs = Seq(("a", 1L)).toDF("source", "n_tok")
    intercept[IllegalArgumentException] {
      Sampling.temperatureQuotas(docs, "source", "n_tok", 0L, 0.5)
    }
    intercept[IllegalArgumentException] {
      Sampling.temperatureQuotas(docs, "source", "n_tok", 10L, 1.5)
    }
  }
}
