package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Dictionary encoding: frequency-DESC index order with the value
  * tie-break, null exclusion, unseen-label NULLs, and stability across
  * partitionings.
  */
class IndexerSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    "b", "b", "b", "a", "a", "c", "a", "c", "z"
  ).map(Tuple1(_)).toDF("cat")

  test("labelIndex: frequency desc, then value asc; 0-based dense") {
    val m = Indexer.labelIndex(df, "cat").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    // a:3 b:3 tie -> a first; c:2; z:1
    assert(m("a") == ((3L, 0)) && m("b") == ((3L, 1)))
    assert(m("c") == ((2L, 2)) && m("z") == ((1L, 3)))
  }

  test("labelIndex excludes nulls; encode leaves unseen labels NULL") {
    val withNull = df.unionByName(Seq(Tuple1(null.asInstanceOf[String])).toDF("cat"))
    val m = Indexer.labelIndex(withNull, "cat")
    assert(m.count() == 4L) // null never becomes a label
    val fresh = Seq("a", "q").map(Tuple1(_)).toDF("cat")
    val enc = Indexer.encode(fresh, "cat", m, "cat_idx").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1))))
      .toMap
    assert(enc("a") == Some(0))
    assert(enc("q") == None) // unseen surfaces as NULL, not an invented id
  }

  test("mapping is invariant to input partitioning") {
    val a = Indexer.labelIndex(df, "cat").collect().map(_.toSeq).toSet
    val b = Indexer.labelIndex(df.repartition(7), "cat").collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("encode keeps fact multiplicity and joins broadcast") {
    val m = Indexer.labelIndex(df, "cat")
    val enc = Indexer.encode(df, "cat", m, "cat_idx")
    assert(enc.count() == 9L)
    val plan = enc.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"mapping not broadcast:\n$plan")
    assert(enc.filter(col("cat") === "b").select("cat_idx")
      .distinct().collect().map(_.getInt(0)).toSeq == Seq(1))
  }
}
