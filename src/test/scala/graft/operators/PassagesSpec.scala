package graft.operators

import graft.SparkSpec

/** Cross-document duplicated-passage dedup: span detection and
  * canonical-retaining removal, checked against a driver-side brute-force
  * model (window strings, not hashes — so the operator's hash shortcut is
  * itself under test), plus edge cases and layout independence.
  */
class PassagesSpec extends SparkSpec {
  import spark.implicits._

  private def toks(t: String): Array[String] =
    t.trim.split("\\s+").filter(_.nonEmpty)

  /** Brute-force model: duplicated windows by STRING equality, canonical
    * owner = min (doc, pos), spans merged per doc over the given
    * occurrence set.
    */
  private def model(docs: Seq[(Long, String)], w: Int, minDocs: Int) = {
    val occ = for {
      (id, t) <- docs
      ts = toks(t)
      if ts.length >= w
      p <- 1 to (ts.length - w + 1)
    } yield (id, p.toLong, ts.slice(p - 1, p - 1 + w).mkString(" "))
    val byWin = occ.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= minDocs)
    val owners = byWin.map { case (win, os) => win -> os.map(o => (o._1, o._2)).min }
    (occ.filter(o => byWin.contains(o._3)).map(o => (o._1, o._2)),
      occ.filter(o => byWin.contains(o._3) && owners(o._3) != ((o._1, o._2)))
        .map(o => (o._1, o._2)))
  }

  private def mergeModel(occ: Seq[(Long, Long)], w: Int): Set[(Long, Long, Long, Long)] =
    occ.groupBy(_._1).flatMap { case (id, ps) =>
      val sorted = ps.map(_._2).distinct.sorted
      val spans = sorted.foldLeft(List.empty[(Long, Long)]) {
        case ((s, e) :: rest, p) if p <= e + 1 => (s, math.max(e, p + w - 1)) :: rest
        case (acc, p) => (p, p + w - 1) :: acc
      }
      spans.map { case (s, e) => (id, s, e, e - s + 1) }
    }.toSet

  private def cleanModel(docs: Seq[(Long, String)], w: Int, minDocs: Int): Map[Long, String] = {
    val (_, foreign) = model(docs, w, minDocs)
    val spans = mergeModel(foreign, w).groupBy(_._1)
    docs.map { case (id, t) =>
      id -> (spans.get(id) match {
        case None => t
        case Some(ss) =>
          toks(t).zipWithIndex.collect {
            case (tok, i) if !ss.exists(s => i + 1 >= s._2 && i + 1 <= s._3) => tok
          }.mkString(" ")
      })
    }.toMap
  }

  private def runSpans(docs: Seq[(Long, String)], w: Int, minDocs: Int) =
    Passages.duplicatedSpans(docs.toDF("doc_id", "text"), "doc_id", "text", w, minDocs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  private def runClean(docs: Seq[(Long, String)], w: Int, minDocs: Int) =
    Passages.removePassages(docs.toDF("doc_id", "text"), "doc_id", "text", w, minDocs)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap

  test("shared passage is reported in both docs, removed only from the non-canonical one") {
    val shared = "alpha beta gamma delta epsilon"
    val docs = Seq(
      (1L, s"intro one two $shared outro xx"),
      (2L, s"different start $shared closing words yy"))
    val w = 3
    // doc 1: shared occupies tokens 4..8; doc 2: tokens 3..7
    assert(runSpans(docs, w, 2) == Set((1L, 4L, 8L, 5L), (2L, 3L, 7L, 5L)))
    val clean = runClean(docs, w, 2)
    assert(clean(1L) == docs.head._2)                       // canonical keeps it
    assert(clean(2L) == "different start closing words yy") // foreign loses it
  }

  test("intra-document repetition: second occurrence removed, first kept") {
    val docs = Seq((5L, "p q r s t u v p q r s t end"),
      (9L, "totally unrelated words here now"))
    // windows of 4: "p q r s", "q r s t" occur at pos 1,2 and 8,9 in doc 5 —
    // but minDocs=2 counts DISTINCT docs, so nothing flags...
    assert(runSpans(docs, 4, 2).isEmpty)
    // ...until a second doc shares it; then doc 5's later copy is foreign too
    val docs2 = docs :+ (7L, "zz p q r s t zz")
    val clean = runClean(docs2, 4, 2)
    assert(clean(5L) == "p q r s t u v end")
    assert(clean(7L) == "zz zz")
    assert(clean(9L) == docs2(1)._2)
  }

  test("adjacent and overlapping windows merge into one maximal span") {
    val shared = (1 to 12).map(i => s"s$i").mkString(" ")
    val docs = Seq((1L, s"$shared"), (2L, s"lead in $shared"))
    val spans = runSpans(docs, 5, 2)
    assert(spans == Set((1L, 1L, 12L, 12L), (2L, 3L, 14L, 12L)))
  }

  test("agrees with the brute-force model on randomized corpora") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 4) {
      val phrases = Seq.tabulate(4)(k => (1 to 6).map(j => s"ph${k}_$j").mkString(" "))
      val docs = (0L until 40L).map { i =>
        val own = Seq.fill(4 + rnd.nextInt(8))(s"w${i}_${rnd.nextInt(20)}")
        val injected =
          if (rnd.nextBoolean()) Seq(phrases(rnd.nextInt(4))) else Seq.empty
        (i, rnd.shuffle(own.grouped(3).map(_.mkString(" ")).toSeq ++ injected)
          .mkString(" "))
      }
      val w = 3 + trial % 2
      val (all, _) = model(docs, w, 2)
      assert(runSpans(docs, w, 2) == mergeModel(all, w), s"trial $trial spans")
      assert(runClean(docs, w, 2) == cleanModel(docs, w, 2), s"trial $trial clean")
    }
  }

  test("short docs, empty docs, and docs losing everything") {
    val shared = "a b c d e f"
    val docs = Seq((1L, shared), (2L, shared), (3L, "tiny"), (4L, ""),
      (5L, s" $shared "))
    val clean = runClean(docs, 4, 2)
    assert(clean(1L) == shared)  // canonical
    assert(clean(2L) == "")      // fully consumed
    assert(clean(5L) == "")      // whitespace-padded copy also consumed
    assert(clean(3L) == "tiny")
    assert(clean(4L) == "")
  }

  test("result is independent of partitioning layout") {
    val shared = "m n o p q r"
    val docs = (0L until 30L).map(i =>
      (i, if (i % 3 == 0) s"doc $i says $shared here" else s"doc $i plain w${i % 5}"))
    val df = docs.toDF("doc_id", "text")
    val a = Passages.duplicatedSpans(df, "doc_id", "text", 4, 2)
      .collect().toSet
    val b = Passages.duplicatedSpans(df.repartition(7), "doc_id", "text", 4, 2)
      .collect().toSet
    assert(a.map(_.toString) == b.map(_.toString))
  }

  test("incremental: registry-era passages strip even with no partner in the batch") {
    val shared = "r s t u v w"
    val day0 = Seq((1L, s"first doc holds $shared and more text")).toDF("doc_id", "text")
    val day1 = Seq((9L, s"later ingest repeats $shared here"),
      (10L, "unrelated later doc")).toDF("doc_id", "text")
    val emptyReg = spark.range(0).selectExpr("id AS win_hash")
    val (c0, reg0) = Passages.cleanIncremental(day0, "doc_id", "text", emptyReg, 4, 2)
    // day 0 is alone: nothing strips, all hashes register
    assert(c0.collect().map(r => r.getString(1)).head == day0.head().getString(1))
    val (c1, _) = Passages.cleanIncremental(day1, "doc_id", "text", reg0, 4, 2)
    val m = c1.collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(m(9L) == "later ingest repeats here")
    assert(m(10L) == "unrelated later doc")
  }

  test("incremental with an empty registry equals the batch operator") {
    val shared = "c d e f g"
    val docs = (0L until 20L).map(i =>
      (i, if (i % 4 == 0) s"doc $i has $shared inside" else s"doc $i text w${i % 3}"))
      .toDF("doc_id", "text")
    val emptyReg = spark.range(0).selectExpr("id AS win_hash")
    val (inc, _) = Passages.cleanIncremental(docs, "doc_id", "text", emptyReg, 4, 2)
    val batch = Passages.removePassages(docs, "doc_id", "text", 4, 2)
    assert(inc.collect().map(r => (r.getLong(0), r.getString(1))).toMap ==
      batch.collect().map(r => (r.getLong(0), r.getString(1))).toMap)
  }

  test("incremental: newHashes excludes already-registered windows") {
    val docs = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val emptyReg = spark.range(0).selectExpr("id AS win_hash")
    val (_, nh0) = Passages.cleanIncremental(docs, "doc_id", "text", emptyReg, 4, 2)
    val reg = nh0
    val (_, nh1) = Passages.cleanIncremental(docs, "doc_id", "text", reg, 4, 2)
    assert(nh0.count() == 3 && nh1.count() == 0)
  }

  test("duplication profile counts span tokens and rounds one ratio") {
    val shared = "a b c d e"
    val docs = Seq((1L, s"$shared x"), (2L, s"y $shared"), (3L, "p q r s t u"))
      .toDF("doc_id", "text")
    val r = Passages.duplicationProfile(docs, "doc_id", "text", 4, 2)
      .collect().head
    // spans: doc1 [1,5], doc2 [2,6] -> 10 dup tokens of 18 total
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 10L, 18L)))
    assert(r.getDouble(3) == math.rint(10.0 / 18.0 * 1e6) / 1e6)
    val empty = Passages.duplicationProfile(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", "text", 4, 2)
      .collect().head
    assert((empty.getLong(0), empty.getLong(1), empty.getLong(2)) ==
      ((0L, 0L, 0L)) && empty.isNullAt(3))
  }

  test("plan: no cartesian product, flagged join is an equi-join") {
    val docs = (0L until 10L).map(i => (i, s"a b c d e f g$i")).toDF("doc_id", "text")
    val plan = Passages.removePassages(docs, "doc_id", "text", 4, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
