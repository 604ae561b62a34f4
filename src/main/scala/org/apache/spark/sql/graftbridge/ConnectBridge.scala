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

  def client(host: String, port: Int, userId: String): Handle =
    new Handle(SparkConnectClient.builder()
      .host(host).port(port).userId(userId)
      .sessionId(java.util.UUID.randomUUID().toString).build())

  def shutdown(h: Handle): Unit = h.c.shutdown()

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
