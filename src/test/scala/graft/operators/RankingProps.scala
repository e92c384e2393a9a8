package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Model-check of the NTILE closed form Ranking.ntileExact ships
  * (Ranking.ntileBucketSql — the SAME snippet the operator evaluates
  * distributedly, so a regression in the production CASE expression fails
  * here, not just in the hand-picked RankingSpec sizes). Evaluated
  * against a reference model via a driver-local one-row frame per case —
  * no jobs, no shuffles.
  */
object RankingProps extends Properties("Ranking") {

  private lazy val spark = graft.SparkSpec.session

  /** The NTILE definition, computed the slow obvious way: bucket sizes
    * q+1 for the first rem buckets, q for the rest; walk to the bucket
    * containing `rank`.
    */
  private def ntileModel(n: Long, k: Long, rank: Long): Long = {
    val q = n / k
    val rem = n % k
    var start = 1L
    var b = 1L
    while (b <= k) {
      val size = if (b <= rem) q + 1 else q
      if (rank < start + size) return b
      start += size
      b += 1
    }
    k
  }

  /** Evaluate the PRODUCTION snippet for one (n, k, rank). */
  private def shipped(n: Long, k: Int, rank: Long): Long = {
    import spark.implicits._
    Seq(rank).toDF("__rank")
      .select(org.apache.spark.sql.functions.expr(Ranking.ntileBucketSql(n, k)))
      .collect()(0).getInt(0).toLong
  }

  private val cases: Gen[(Long, Int, Long)] = for {
    n <- Gen.choose(1L, 100000L)
    k <- Gen.choose(1, 200)
    rank <- Gen.choose(1L, n)
  } yield (n, k, rank)

  property("the shipped closed form equals the NTILE definition for every (N, k, rank)") =
    forAll(cases) { case (n, k, rank) =>
      shipped(n, k, rank) == ntileModel(n, k, rank)
    }

  property("buckets partition the ranks: remainder-first sizes, every rank covered") =
    forAll(Gen.choose(1L, 300L), Gen.choose(1, 16)) { (n, k) =>
      // one expression evaluation over ranks 1..n (driver-local range)
      import spark.implicits._
      val buckets = (1L to n).toDF("__rank")
        .select(org.apache.spark.sql.functions.expr(Ranking.ntileBucketSql(n, k)))
        .collect().map(_.getInt(0).toLong)
      val sizes = buckets.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val q = n / k
      val rem = n % k
      sizes.values.sum == n && sizes.forall { case (b, s) =>
        s == (if (b <= rem) q + 1 else q)
      }
    }
}
