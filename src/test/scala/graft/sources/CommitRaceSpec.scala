package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.{FileContext, Path}

import graft.SparkSpec

/** The commit primitive under real contention. The hard-link publish
  * must admit exactly ONE winner per version — across THREADS (below)
  * and across PROCESSES (two spawned JVMs racing the same log dir; the
  * round-7 in-process lock demonstrably could not serialize those) —
  * and every published manifest must carry its winner's full content
  * (no torn writes, no clobbered versions).
  */
class CommitRaceSpec extends SparkSpec {

  private def freshDir(): java.io.File = {
    val d = Files.createTempDirectory("graft-race").toFile
    d
  }

  test("threads: exactly one winner per version, winner content intact") {
    val dir = freshDir()
    val p = new Path(dir.toString)
    val conf = new org.apache.hadoop.conf.Configuration()
    val f = p.getFileSystem(conf)
    val fc = FileContext.getFileContext(p.toUri, conf)
    val versions = 30
    val writers = 4
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val results = Await.result(Future.sequence((1 to writers).map { w =>
      Future {
        (1 to versions).flatMap { v =>
          val tmp = new Path(p, s".tmp-$w-$v")
          val out = f.create(tmp, true)
          out.write(s"""{"writer":$w,"v":$v}""".getBytes("UTF-8")); out.close()
          try {
            TxLog.renameIfAbsent(fc, f, tmp, new Path(p, f"$v%020d.json"))
            Some(v -> w)
          } catch { case _: Exception => f.delete(tmp, false); None }
        }
      }
    }), 120.seconds).flatten
    val byVersion = results.groupBy(_._1)
    assert(byVersion.keySet == (1 to versions).toSet, "a version went unclaimed")
    byVersion.foreach { case (v, ws) =>
      assert(ws.size == 1, s"version $v had ${ws.size} winners: $ws")
      val content = new String(java.nio.file.Files.readAllBytes(
        new java.io.File(dir, f"$v%020d.json").toPath), "UTF-8")
      assert(content == s"""{"writer":${ws.head._2},"v":$v}""",
        s"version $v content is not the winner's: $content")
    }
  }

  test("two JVMs: the hard-link publish admits one winner per version") {
    val dir = freshDir()
    val versions = 25
    val cp = System.getProperty("java.class.path")
    val javaBin = System.getProperty("java.home") + "/bin/java"
    def spawn(id: String): Process =
      new ProcessBuilder(javaBin, "-cp", cp,
        "graft.sources.CommitRaceMain", dir.toString, id, versions.toString)
        .redirectErrorStream(true).start()
    val a = spawn("A"); val b = spawn("B")
    // both JVMs spin on the go marker — create it once both are launched
    // so their contention windows overlap despite startup jitter
    java.nio.file.Files.write(new java.io.File(dir, "go").toPath,
      Array.empty[Byte])
    def winsOf(pr: Process): Set[Int] = {
      val out = new String(pr.getInputStream.readAllBytes(), "UTF-8")
      assert(pr.waitFor(120, java.util.concurrent.TimeUnit.SECONDS),
        "racer JVM did not finish")
      assert(pr.exitValue() == 0, s"racer JVM failed:\n$out")
      val line = out.linesIterator.find(_.startsWith("WINS:"))
        .getOrElse(sys.error(s"no WINS line in:\n$out"))
      line.drop(5).split(',').filter(_.nonEmpty).map(_.toInt).toSet
    }
    val (wa, wb) = (winsOf(a), winsOf(b))
    assert((wa & wb).isEmpty,
      s"both processes won the same version(s): ${wa & wb}")
    assert((wa | wb) == (1 to versions).toSet,
      s"unclaimed versions: ${(1 to versions).toSet -- (wa | wb)}")
    (1 to versions).foreach { v =>
      val content = new String(java.nio.file.Files.readAllBytes(
        new java.io.File(dir, f"$v%020d.json").toPath), "UTF-8")
      val winner = if (wa(v)) "A" else "B"
      assert(content == s"""{"writer":"$winner","v":$v}""",
        s"version $v content is not the winner's: $content")
    }
  }
}
