package graft
// dev scratch: run the reference parse battery through Parser.parseAll
object ParseBattery {
  def main(args: Array[String]): Unit = {
    val lines = scala.io.Source.fromFile(args(0)).getLines().filter(_.trim.nonEmpty)
    var bad = 0
    lines.foreach { l =>
      try graft.bql.Parser.parseAll(l)
      catch { case e: Throwable => bad += 1; println(s"REJECT $l  -- ${e.getMessage}") }
    }
    println(s"BATTERY done, $bad rejects")
  }
}
