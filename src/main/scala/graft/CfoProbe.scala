package graft
/** Dev probe: print the CFO walks' reachable sets (oracle sizing). */
object CfoProbe {
  def main(args: Array[String]): Unit = {
    import graft.operators.AutoForecast._
    for (n <- 4 to 8) {
      val (cl, tl) = cfoReachable("lin", 42L, n, dimsLinear)
      println(s"LIN steps=$n n=${cl.length} configs: " + cl.zipWithIndex.map{case(c,i)=>s"$i:${decodeLinear(c)}"}.mkString("  "))
      println(s"LIN steps=$n trans: " + tl.mkString(" | "))
    }
    for (n <- 3 to 5) {
      val (cg, tg) = cfoReachable("gbt", 42L, n, dimsGbt)
      println(s"GBT steps=$n n=${cg.length} configs: " + cg.zipWithIndex.map{case(c,i)=>s"$i:${decodeGbt(c)}"}.mkString("  "))
      println(s"GBT steps=$n trans: " + tg.mkString(" | "))
    }
  }
}
