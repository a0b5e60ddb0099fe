package graft.replay

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

class SinkSpec extends AnyFunSuite {

  private def bytes(s: String) = s.getBytes(UTF_8)

  test("backoff series matches reference: 200,400,800,1600,2000 capped") {
    assert((1 to 7).map(Sink.backoffMs) == Seq(200L, 400L, 800L, 1600L, 2000L, 2000L, 2000L))
  }

  test("batches are at most 500 records (PutRecords cap)") {
    val seen = scala.collection.mutable.ArrayBuffer[Int]()
    val sender = new RecordSender {
      def send(records: Seq[Array[Byte]]): Seq[Int] = { seen += records.size; Nil }
    }
    val (sent, retries) = Sink.sendAll((1 to 1203).iterator.map(i => bytes(i.toString)), sender)
    assert(sent == 1203 && retries == 0)
    assert(seen.toSeq == Seq(500, 500, 203))
  }

  test("partial failures are retried with backoff, only failed subset resent") {
    val sends = scala.collection.mutable.ArrayBuffer[Seq[String]]()
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    var call = 0
    val sender = new RecordSender {
      def send(records: Seq[Array[Byte]]): Seq[Int] = {
        sends += records.map(new String(_, UTF_8))
        call += 1
        if (call == 1) Seq(1, 3) // fail b and d once
        else Nil
      }
    }
    val (sent, retries) =
      Sink.sendAll(Seq("a", "b", "c", "d").iterator.map(bytes), sender, sleeps += _)
    assert(sent == 4 && retries == 1)
    assert(sends.toSeq == Seq(Seq("a", "b", "c", "d"), Seq("b", "d")))
    assert(sleeps.toSeq == Seq(200L))
  }

  test("gives up after MaxRetryCount with backoff capped at 2000ms") {
    val sender = new RecordSender {
      def send(records: Seq[Array[Byte]]): Seq[Int] = records.indices
    }
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    val e = intercept[IllegalStateException] {
      Sink.sendAll(Iterator(bytes("x")), sender, sleeps += _)
    }
    assert(e.getMessage.contains("100"))
    assert(sleeps.size == Sink.MaxRetryCount)
    assert(sleeps.max == 2000L && sleeps.head == 200L)
  }

  test("pace sleeps only when ahead of schedule") {
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    val lag1 = Pace.paceTo(1000L, () => 400L, sleeps += _) // due later: sleep 600
    val lag2 = Pace.paceTo(1000L, () => 1500L, sleeps += _) // already late
    assert(sleeps.toSeq == Seq(600L))
    assert(lag1 == -600L && lag2 == 500L)
  }

  test("ARN validation and region extraction (R11)") {
    val arn = "arn:aws:kinesis:eu-west-1:123456789012:stream/my-stream_1.x"
    assert(StreamArn.validate(arn))
    assert(StreamArn.extractRegion(arn) == "eu-west-1")
    assert(StreamArn.streamName(arn) == "my-stream_1.x")
    assert(!StreamArn.validate("arn:aws:kinesis:eu-west-1:12345:stream/s"))
    assert(!StreamArn.validate("arn:aws:sqs:eu-west-1:123456789012:queue/q"))
    intercept[IllegalArgumentException](StreamArn.extractRegion("nope"))
  }

  test("affine schedule arithmetic (R6): deltas divided by speedup, round-half-up") {
    assert(Schedule.ingestionMs(eventMs = 6480000, firstEventMs = 0,
      ingestionStartMs = 5000, speedupFactor = 6480) == 6000)
    assert(Schedule.ingestionMs(1000, 1000, 99, 6480) == 99)
    assert(Schedule.ingestionMs(1999, 1000, 0, 1000) == 1) // 0.999 rounds up
    assert(Schedule.ingestionMs(1500, 1000, 0, 1000) == 1) // half rounds up
    assert(Schedule.ingestionMs(1499, 1000, 0, 1000) == 0)
    // fractional speedups are legal (reference takes a float)
    assert(Schedule.ingestionMs(1001, 1000, 0, 0.5) == 2)
    assert(Schedule.ingestionMs(1003, 1000, 0, 2.5) == 1)
  }
}
