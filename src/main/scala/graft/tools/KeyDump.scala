package graft.tools

/** Dev utility: print the queries/oracleSql key sets and their diff so a
  * round can see at a glance which entries ride on ScalaTest only.
  */
object KeyDump {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"KEYDUMP queries=${q.size} oracles=${o.size}")
    println("KEYDUMP no-oracle: " + (q -- o).toSeq.sorted.mkString(", "))
    println("KEYDUMP orphan-oracle: " + (o -- q).toSeq.sorted.mkString(", "))
  }
}
