package graft.operators

import graft.SparkSpec

/** DataFrame-only Lloyd's k-means as the IVF coarse quantizer. */
class KmeansSpec extends SparkSpec {
  import spark.implicits._

  test("kmeansCells separates two well-separated blobs") {
    // blob A around (1, 0), blob B around (-1, 0), ids interleaved so the
    // two seeds (lowest ids 1 and 2) land one in each blob
    val corpus = Seq(
      (1L, Seq(1.0, 0.1)), (2L, Seq(-1.0, 0.1)),
      (3L, Seq(0.9, -0.1)), (4L, Seq(-0.9, -0.1)),
      (5L, Seq(1.1, 0.0)), (6L, Seq(-1.1, 0.0)),
      (7L, Seq(0.95, 0.05)), (8L, Seq(-0.95, 0.05))
    ).toDF("vec_id", "embedding")
    val cells = Similarity.kmeansCells(corpus, k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val blobA = Set(1L, 3L, 5L, 7L).map(cells)
    val blobB = Set(2L, 4L, 6L, 8L).map(cells)
    assert(blobA.size == 1, s"blob A split across cells: $cells")
    assert(blobB.size == 1, s"blob B split across cells: $cells")
    assert(blobA != blobB, s"blobs merged: $cells")
  }

  test("kmeans cells feed ivfTopK end-to-end") {
    val corpus = Seq(
      (1L, Seq(1.0, 0.1)), (2L, Seq(-1.0, 0.1)),
      (3L, Seq(0.9, -0.1)), (4L, Seq(-0.9, -0.1))
    ).toDF("vec_id", "embedding")
    val cells = Similarity.kmeansCells(corpus, k = 2, iters = 2)
    val q = Seq((100L, Seq(1.0, 0.0))).toDF("q_id", "q_vec")
    val out = Similarity.ivfTopK(q, corpus.join(cells, "vec_id"),
      cellCol = "cell", k = 2, nprobe = 1)
      .collect().map(_.getLong(1)).toSet
    assert(out == Set(1L, 3L)) // only the near blob's cell is probed
  }
}
