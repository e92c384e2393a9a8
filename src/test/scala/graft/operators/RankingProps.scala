package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Model-check of the NTILE closed form Ranking.ntileExact evaluates
  * distributedly (the risky arithmetic: remainder-to-first-buckets with
  * integral div). Pure math against a reference model — no Spark jobs, so
  * the generator budget is cheap; the Spark execution path is pinned by
  * RankingSpec.
  */
object RankingProps extends Properties("Ranking") {

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

  /** The closed form ntileExact ships to executors. */
  private def closedForm(n: Long, k: Long, rank: Long): Long = {
    val q = n / k
    val rem = n % k
    val bigCut = (q + 1) * rem
    val bucket =
      if (rank <= bigCut) (rank - 1) / (q + 1)
      else rem + (rank - 1 - bigCut) / math.max(q, 1L)
    bucket + 1
  }

  private val cases: Gen[(Long, Long, Long)] = for {
    n <- Gen.choose(1L, 100000L)
    k <- Gen.choose(1L, 200L)
    rank <- Gen.choose(1L, n)
  } yield (n, k, rank)

  property("closed form equals the NTILE definition for every (N, k, rank)") =
    forAll(cases) { case (n, k, rank) =>
      closedForm(n, k, rank) == ntileModel(n, k, rank)
    }

  property("buckets partition the ranks: sizes differ by at most 1, remainder first") =
    forAll(Gen.choose(1L, 5000L), Gen.choose(1L, 64L)) { (n, k) =>
      val sizes = (1L to n).groupBy(closedForm(n, k, _)).view.mapValues(_.size).toMap
      val q = n / k
      val rem = n % k
      sizes.values.sum == n &&
        sizes.forall { case (b, s) =>
          s == (if (b <= rem) q + 1 else q)
        }
    }
}
