package graft.operators

import graft.SparkSpec

/** ANN operators on hand-built vectors with known cosine geometry. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // unit-ish vectors: 1⊥2, 3 = 45° between them, 4 ≈ parallel to 1
  private val corpus = Seq(
    (1L, Seq(1.0, 0.0, 0.0), 0),
    (2L, Seq(0.0, 1.0, 0.0), 1),
    (3L, Seq(1.0, 1.0, 0.0), 1),
    (4L, Seq(10.0, 0.1, 0.0), 0)
  ).toDF("vec_id", "embedding", "label")

  private val q1 = Seq((100L, Seq(1.0, 0.0, 0.0))).toDF("q_id", "q_vec")

  test("bruteForceTopK ranks by exact cosine, ties broken by id") {
    val out = Similarity.bruteForceTopK(q1, corpus, k = 4)
      .collect().sortBy(_.getInt(3))
      .map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(out.map(_._1).toSeq == Seq(1L, 4L, 3L, 2L)) // cos: 1, .99995, .707, 0
    assert(out(0)._2 == 1.0)
    assert(math.abs(out(2)._2 - math.sqrt(0.5)) < 1e-4) // round(·,6) applied
    assert(out(3)._2 == 0.0)
  }

  test("bruteForceTopK respects k") {
    assert(Similarity.bruteForceTopK(q1, corpus, k = 2).count() == 2L)
  }

  test("ivfTopK with nprobe=1 searches only the nearest cell") {
    val out = Similarity.ivfTopK(q1, corpus, cellCol = "label", k = 4, nprobe = 1)
      .collect().map(_.getLong(1)).toSet
    // centroid(label 0) ≈ (5.5, .05, 0) is nearest to q; label-1 rows unseen
    assert(out == Set(1L, 4L))
  }

  test("lshTopK self-retrieval: a corpus vector queries itself back at rank 1") {
    val q = Seq((1L, Seq(1.0, 0.0, 0.0))).toDF("q_id", "q_vec")
    val out = Similarity.lshTopK(q, corpus, dim = 3, k = 2)
      .collect().sortBy(_.getInt(3)).map(r => (r.getLong(1), r.getDouble(2)))
    // identical vector collides with itself in every hash table → present, sim 1
    assert(out.nonEmpty && out(0)._1 == 1L && out(0)._2 == 1.0)
  }
}
