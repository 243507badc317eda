package graft.tools
object DumpSql {
  def main(args: Array[String]): Unit = {
    val w = new java.io.PrintWriter(args(1))
    w.write(graft.SparkEntry.oracleSql(args(0)))
    w.close()
  }
}
