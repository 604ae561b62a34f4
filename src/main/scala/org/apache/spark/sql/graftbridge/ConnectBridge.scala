package org.apache.spark.sql.graftbridge

import org.apache.spark.SparkContext
import org.apache.spark.connect.proto
import org.apache.spark.sql.connect.client.SparkConnectClient

/** Spark Connect plumbing for `service_connect_endpoint`: the server
  * starter and the low-level in-distribution client are `private[sql]`
  * (and `SparkContext.conf` is `private[spark]`), so the graded op
  * reaches them through this bridge — the same extension-point technique
  * as the custom expressions beside it, no behavior added.
  *
  * The wire handle is deliberately thin: callers get an opaque client,
  * `sql(...)` sends a Relation.SQL plan over gRPC and hands back the raw
  * Arrow IPC payloads of the response stream; the graft side owns all
  * decoding and grading.
  */
object ConnectBridge {

  /** Opaque client handle: the wrapped type is `private[sql]`, so graft
    * code holds this instead and never names it. */
  final class Handle private[graftbridge] (
      private[graftbridge] val c: SparkConnectClient)

  /** Set the binding port and start the in-process Connect gRPC server. */
  def startServer(sc: SparkContext, port: Int): Unit = {
    sc.conf.set("spark.connect.grpc.binding.port", port.toString)
    org.apache.spark.sql.connect.service.SparkConnectService.start(sc)
  }

  /** Stop the gRPC server (its netty threads are non-daemon: a main that
    * started it would otherwise never exit). */
  def stopServer(): Unit =
    org.apache.spark.sql.connect.service.SparkConnectService.stop(None, None)

  def client(host: String, port: Int, userId: String): Handle = {
    // Plain (non-reattachable) execute + a tight retry budget: the default
    // client config retries a released-iterator RPC against a stopped
    // server with 60 s backoffs, which spams stderr and pads wall-clock
    // minutes after the graded rows are already materialized. This is an
    // in-process loopback wire — if a call fails twice fast, it is dead.
    import scala.concurrent.duration._
    val tight = org.apache.spark.sql.connect.client.RetryPolicy
      .defaultPolicy()
      .copy(maxRetries = Some(2), maxBackoff = Some(500.millis))
    new Handle(SparkConnectClient.builder()
      .host(host).port(port).userId(userId)
      .sessionId(java.util.UUID.randomUUID().toString)
      .disableReattachableExecute()
      .retryPolicy(tight)
      .build())
  }

  def shutdown(h: Handle): Unit = {
    // Release server-side session state while the server is still up, then
    // drop the channel and WAIT for its termination — a channel mid-
    // shutdown when the server stops is what produced the retry storms.
    try h.c.releaseSession()
    catch { case scala.util.control.NonFatal(_) => () }
    h.c.shutdown()
    // `channel()`'s return type is the SHADED ManagedChannel whose Scala
    // pickle still names io.grpc — uncompilable directly; reflection
    // reaches awaitTermination without naming the type.
    try {
      val ch = h.c.getClass.getMethod("channel").invoke(h.c)
      ch.getClass.getMethod("awaitTermination", classOf[Long],
          classOf[java.util.concurrent.TimeUnit])
        .invoke(ch, java.lang.Long.valueOf(5L), java.util.concurrent.TimeUnit.SECONDS)
    } catch { case scala.util.control.NonFatal(_) => () }
  }

  /** Execute one SQL statement; return each response's Arrow IPC bytes. */
  def sql(h: Handle, query: String): Seq[Array[Byte]] = {
    val plan = proto.Plan.newBuilder().setRoot(
      proto.Relation.newBuilder().setSql(
        proto.SQL.newBuilder().setQuery(query))).build()
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val it = h.c.execute(plan, None)
    try {
      while (it.hasNext) {
        val resp = it.next()
        if (resp.hasArrowBatch)
          out += resp.getArrowBatch.getData.toByteArray
      }
    } finally it.close()
    out.toSeq
  }
}
