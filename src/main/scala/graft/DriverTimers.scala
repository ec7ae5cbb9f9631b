package graft

/** Opt-in driver-phase wall-clock accumulators (optimization-round
  * measurement tooling, like [[Profile]]): attribute a lifecycle query's
  * "outside jobs" time to the driver phase that spent it (write, stats,
  * publish, find, SQL parse/plan). Zero overhead unless
  * `GRAFT_DRIVER_TIMERS=1`; never on in the bench/verify path.
  */
object DriverTimers {
  val enabled: Boolean = sys.env.get("GRAFT_DRIVER_TIMERS").contains("1")

  private val acc = new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]

  def time[T](name: String)(f: => T): T = {
    if (!enabled) f
    else {
      val t0 = System.nanoTime()
      try f
      finally {
        val dt = System.nanoTime() - t0
        acc.merge(name, (dt, 1L),
          (a, b) => (a._1 + b._1, a._2 + b._2))
      }
    }
  }

  def add(name: String, ns: Long): Unit =
    if (enabled) acc.merge(name, (ns, 1L), (a, b) => (a._1 + b._1, a._2 + b._2))

  def reset(): Unit = acc.clear()

  def dump(): Unit = {
    import scala.jdk.CollectionConverters._
    acc.asScala.toSeq.sortBy(-_._2._1).foreach { case (k, (ns, n)) =>
      println(f"  timer ${ns / 1000000L}%6d ms  n=$n%-4d $k")
    }
  }
}
