package graft
object DumpSql {
  def main(args: Array[String]): Unit =
    args.foreach { n =>
      println(s"-- BEGIN $n")
      println(SparkEntry.oracleSql(n))
      println(s"-- END $n")
    }
}
