package graft.tools

/** Dev scratchpad (not part of the query contract). Current probe:
  * dump registry keys for the SURVEY cross-check. */
object Scratch {
  def main(args: Array[String]): Unit =
    graft.SparkEntry.queries.keySet.toSeq.sorted.foreach(k => println(s"QKEY=$k"))
}
