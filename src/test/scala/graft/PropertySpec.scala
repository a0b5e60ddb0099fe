package graft

import graft.replay.{RecordSender, Schedule, Sink}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll
import java.nio.charset.StandardCharsets.UTF_8

/** Property tests (SURVEY.md §5.2): replay-schedule affine invariants,
  * sink retry/batching laws, and set-op/dedup algebra vs a Seq model. */
class PropertySpec extends SparkSpec {

  private def check(p: Prop, n: Int = 100): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(r.passed, r.status.toString)
  }

  test("backoff series is monotone, starts at 200ms, caps at 2000ms") {
    check(forAll(Gen.choose(1, 500)) { a =>
      val b = Sink.backoffMs(a)
      b >= 200L && b <= 2000L && b <= Sink.backoffMs(math.min(a + 1, 500))
    })
  }

  test("affine schedule: monotone, and deltas are event-deltas/speedup (half-up)") {
    val gen = for {
      first <- Gen.choose(0L, 1L << 40)
      d1 <- Gen.choose(0L, 1L << 30)
      d2 <- Gen.choose(0L, 1L << 30)
      start <- Gen.choose(0L, 1L << 40)
      speedup <- Gen.choose(1L, 100000L)
    } yield (first, d1, d2, start, speedup)
    check(forAll(gen) { case (first, d1, d2, start, speedup) =>
      val (lo, hi) = if (d1 <= d2) (d1, d2) else (d2, d1)
      val i1 = Schedule.ingestionMs(first + lo, first, start, speedup)
      val i2 = Schedule.ingestionMs(first + hi, first, start, speedup)
      val exact = (hi - lo).toDouble / speedup
      i1 <= i2 &&
        Schedule.ingestionMs(first, first, start, speedup) == start &&
        math.abs((i2 - i1) - exact) <= 1.0
    })
  }

  test("sendAll delivers every record exactly once under arbitrary partial failures") {
    val gen = for {
      n <- Gen.choose(0, 1300)
      failPattern <- Gen.listOfN(40, Gen.choose(0, 3)) // failures per call round
    } yield (n, failPattern)
    check(forAll(gen) { case (n, failPattern) =>
      val received = scala.collection.mutable.ArrayBuffer[String]()
      val batchSizes = scala.collection.mutable.ArrayBuffer[Int]()
      var call = 0
      val sender = new RecordSender {
        def send(records: Seq[Array[Byte]]): Seq[Int] = {
          batchSizes += records.size
          val nFail = math.min(
            if (call < failPattern.size) failPattern(call) else 0, records.size)
          call += 1
          val fail = (0 until nFail)
          records.indices.filterNot(fail.contains)
            .foreach(i => received += new String(records(i), UTF_8))
          fail
        }
      }
      val (sent, _) = Sink.sendAll(
        (0 until n).iterator.map(i => i.toString.getBytes(UTF_8)), sender, _ => ())
      sent == n &&
        received.sorted.toSeq == (0 until n).map(_.toString).sorted &&
        batchSizes.forall(_ <= Sink.MaxEntriesPerRequest)
    }, n = 30)
  }

  test("set-op algebra matches the Seq model (union/intersect/except distinct)") {
    import spark.implicits._
    val gen = for {
      a <- Gen.listOfN(30, Gen.choose(0, 15))
      b <- Gen.listOfN(30, Gen.choose(0, 15))
    } yield (a, b)
    check(forAll(gen) { case (a, b) =>
      val da = a.toDF("v")
      val db = b.toDF("v")
      val u = da.union(db).distinct().as[Int].collect().sorted.toSeq
      val i = da.intersect(db).as[Int].collect().sorted.toSeq
      val e = da.except(db).as[Int].collect().sorted.toSeq
      u == (a ++ b).distinct.sorted &&
        i == a.toSet.intersect(b.toSet).toSeq.sorted &&
        e == a.toSet.diff(b.toSet).toSeq.sorted
    }, n = 10)
  }

  test("dedup is idempotent and keeps one row per key") {
    import spark.implicits._
    check(forAll(Gen.listOfN(50, Gen.choose(0, 10))) { xs =>
      val df = xs.toDF("k")
      val once = df.dropDuplicates("k")
      once.count() == xs.distinct.size &&
        once.dropDuplicates("k").count() == once.count()
    }, n = 10)
  }
}
