package graft.operators

import org.apache.spark.sql.Row
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based check of the in-memory skyline sweep (the kernel both
  * the local and the merge phase run): against randomly generated point
  * sets — dense integer lattices for heavy ties/duplicates, and
  * continuous doubles — the sweep must return EXACTLY the brute-force
  * non-dominated multiset. Pure JVM, no Spark session.
  */
class SkylinePropertySpec extends AnyFunSuite {

  private def brute(pts: Seq[(Double, Double)]): Seq[(Double, Double)] =
    pts.filter { case (x, y) =>
      !pts.exists { case (bx, by) =>
        bx >= x && by <= y && (bx > x || by < y)
      }
    }

  private def sweep(pts: Seq[(Double, Double)]): Seq[(Double, Double)] =
    Skyline.localSkyline(
      pts.map { case (x, y) => Row(x, y) }.iterator, 0, 1)
      .map(r => (r.getDouble(0), r.getDouble(1))).toSeq

  private def multiset(s: Seq[(Double, Double)]) =
    s.groupBy(identity).view.mapValues(_.size).toMap

  private def check(gen: Gen[List[(Double, Double)]], label: String): Unit = {
    val prop = Prop.forAll(gen) { pts =>
      multiset(sweep(pts)) == multiset(brute(pts))
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, s"$label: ${res.status}")
  }

  test("sweep equals brute force on dense integer lattices (ties + duplicates)") {
    val pt = for {
      x <- Gen.choose(0, 7)
      y <- Gen.choose(0, 7)
    } yield (x.toDouble, y.toDouble)
    check(Gen.listOfN(40, pt), "lattice")
  }

  test("sweep equals brute force on continuous points") {
    val pt = for {
      x <- Gen.choose(-1000.0, 1000.0)
      y <- Gen.choose(-1000.0, 1000.0)
    } yield (x, y)
    check(Gen.sized(n => Gen.listOfN(math.min(n, 60), pt)), "continuous")
  }

  test("sweep handles empty input and single points") {
    assert(sweep(Nil).isEmpty)
    assert(sweep(Seq((1.0, 2.0))) == Seq((1.0, 2.0)))
  }
}
