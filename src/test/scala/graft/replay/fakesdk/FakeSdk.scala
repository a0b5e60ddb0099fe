/** Stub of the AWS SDK v2 surface [[graft.replay.KinesisRecordSender]]
  * binds reflectively — same class names, builders, and method shapes
  * under a different package root, so the full reflective chain (entry
  * building, request building, response parsing) is contract-testable on
  * the offline classpath. */
package graft.replay.fakesdk.core {

  class SdkBytes private (val byteArray: Array[Byte]) {
    def asByteArray(): Array[Byte] = byteArray
  }
  object SdkBytes {
    def fromByteArray(b: Array[Byte]): SdkBytes = new SdkBytes(b.clone())
  }
}

package graft.replay.fakesdk.core.exception {

  /** Root of the SDK's exception hierarchy, with the retryability verdict
    * [[graft.replay.KinesisRecordSender.isRetryableSdkException]] binds. */
  class SdkException(msg: String, retry: Boolean) extends RuntimeException(msg) {
    def retryable(): Boolean = retry
  }
}

package graft.replay.fakesdk.services.kinesis {

  /** Only needs to exist: [[graft.replay.KinesisRecordSender.sdkPresent]]
    * checks loadability of this name. */
  class KinesisClient
}

package graft.replay.fakesdk.services.kinesis.model {

  import graft.replay.fakesdk.core.SdkBytes

  final class PutRecordsRequestEntry(val data: SdkBytes, val partitionKey: String)
  object PutRecordsRequestEntry {
    final class Builder {
      private var d: SdkBytes = _
      private var pk: String = _
      def data(b: SdkBytes): Builder = { d = b; this }
      def partitionKey(k: String): Builder = { pk = k; this }
      def build(): PutRecordsRequestEntry = new PutRecordsRequestEntry(d, pk)
    }
    def builder(): Builder = new Builder
  }

  final class PutRecordsRequest(
      val streamARN: String,
      val records: java.util.List[PutRecordsRequestEntry])
  object PutRecordsRequest {
    final class Builder {
      private var arn: String = _
      private var recs: java.util.List[PutRecordsRequestEntry] = _
      def streamARN(a: String): Builder = { arn = a; this }
      def records(r: java.util.List[PutRecordsRequestEntry]): Builder = { recs = r; this }
      def build(): PutRecordsRequest = new PutRecordsRequest(arn, recs)
    }
    def builder(): Builder = new Builder
  }

  final class PutRecordsResultEntry(err: String) {
    def errorCode(): String = err
  }

  final class PutRecordsResponse(failed: Seq[Int], n: Int) {
    def failedRecordCount(): Integer = Integer.valueOf(failed.size)
    def records(): java.util.List[PutRecordsResultEntry] = {
      val l = new java.util.ArrayList[PutRecordsResultEntry](n)
      (0 until n).foreach(i =>
        l.add(new PutRecordsResultEntry(
          if (failed.contains(i)) "ProvisionedThroughputExceededException" else null)))
      l
    }
  }

  /** Scripted fake client: fails the given indices per successive call;
    * `throwPlan` makes call N THROW instead (request-level failure — the
    * whole putRecords raises rather than reporting per-record errorCodes). */
  final class FakeKinesisClient(failPlan: Seq[Seq[Int]],
      throwPlan: Map[Int, Throwable] = Map.empty) {
    val batches = scala.collection.mutable.ArrayBuffer[Seq[String]]()
    val partitionKeys = scala.collection.mutable.ArrayBuffer[String]()
    val arns = scala.collection.mutable.ArrayBuffer[String]()
    private var calls = 0

    def putRecords(req: PutRecordsRequest): PutRecordsResponse = {
      throwPlan.get(calls).foreach { t => calls += 1; throw t }
      arns += req.streamARN
      val it = req.records.iterator()
      val b = Seq.newBuilder[String]
      while (it.hasNext) {
        val e = it.next()
        b += new String(e.data.asByteArray(), java.nio.charset.StandardCharsets.UTF_8)
        partitionKeys += e.partitionKey
      }
      batches += b.result()
      val fails = if (calls < failPlan.size) failPlan(calls) else Nil
      calls += 1
      new PutRecordsResponse(fails, req.records.size())
    }
  }
}
