package graft.sources

import org.apache.hadoop.fs.{FileContext, Path}

/** Subprocess body for CommitRaceSpec: races [[TxLog.renameIfAbsent]]
  * against sibling JVMs on one log dir — the true two-process commit
  * race an in-process lock can never serialize. Spins on a `go` marker
  * so both JVMs enter the contention window together despite startup
  * jitter, then tries to claim every version, printing the ones it won.
  */
object CommitRaceMain {
  def main(args: Array[String]): Unit = {
    val Array(dir, id, countS) = args.take(3)
    val conf = new org.apache.hadoop.conf.Configuration()
    val p = new Path(dir)
    val f = p.getFileSystem(conf)
    val fc = FileContext.getFileContext(p.toUri, conf)
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (!f.exists(new Path(p, "go"))) {
      if (System.nanoTime() > deadline) sys.error("no go marker")
      Thread.sleep(5)
    }
    val wins = (1 to countS.toInt).flatMap { v =>
      val tmp = new Path(p, s".tmp-$id-$v")
      val out = f.create(tmp, true)
      out.write(s"""{"writer":"$id","v":$v}""".getBytes("UTF-8"))
      out.close()
      try {
        TxLog.renameIfAbsent(fc, f, tmp, new Path(p, f"$v%020d.json"))
        Some(v)
      } catch {
        case _: Exception => f.delete(tmp, false); None
      }
    }
    // the ONLY stdout line the parent parses
    println("WINS:" + wins.mkString(","))
  }
}
