package graft

import java.io.PrintWriter
import java.net.{InetSocketAddress, ServerSocket}

import graft.streaming.OhlcvStream

/** Drives [[graft.streaming.ResilientSocketProvider]] through the failure
  * mode the in-box socket source cannot survive: the feed server drops
  * mid-stream (producer-side crash), later comes back on the same port,
  * and the SAME streaming query keeps consuming — the reference producer's
  * reconnect loop (producer/producer.py:100-115) observed from the
  * consumer side.
  */
class ResilientSocketSpec extends SparkSuite {

  private def bind(port: Int): ServerSocket = {
    val ss = new ServerSocket()
    ss.setReuseAddress(true)
    ss.bind(new InetSocketAddress("127.0.0.1", port))
    ss
  }

  private def serveOnce(ss: ServerSocket, lines: Seq[String]): Thread = {
    val t = new Thread(() => {
      try {
        val sock = ss.accept()
        val out = new PrintWriter(sock.getOutputStream, true)
        lines.foreach(out.println)
        out.flush()
        Thread.sleep(200) // let the reader drain before the drop
        sock.close()
        ss.close()
      } catch { case _: Exception => () }
    }, "resilient-feeder")
    t.setDaemon(true)
    t.start()
    t
  }

  private def collected(name: String): Set[(String, Int)] =
    spark.table(name).collect()
      .map(r => (r.getAs[String]("json"), r.getAs[Int]("conn_epoch"))).toSet

  test("mid-stream server drop: same query reconnects and keeps consuming") {
    val s1 = bind(0)
    val port = s1.getLocalPort
    serveOnce(s1, Seq("a1", "a2"))
    val query = OhlcvStream
      .fromResilientSocket(spark, "127.0.0.1", port,
        retryDelayMs = 100L, maxRetryDelayMs = 1000L)
      .writeStream
      .format("memory")
      .queryName("resock")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("resock_ckpt").toString)
      .start()
    try {
      val deadline = System.currentTimeMillis() + 60000
      def drain(): Set[(String, Int)] = { query.processAllAvailable(); collected("resock") }
      var got = drain()
      while (!Set("a1", "a2").subsetOf(got.map(_._1)) &&
             System.currentTimeMillis() < deadline) { Thread.sleep(100); got = drain() }
      assert(got.map(_._1) == Set("a1", "a2"), got)
      assert(got.forall(_._2 == 0), s"first connection must be epoch 0: $got")

      // server is now down; give the source time to fail at least one
      // reconnect attempt (epoch advances past 1), then resurrect the
      // feed on the SAME port
      Thread.sleep(400)
      val s2 = bind(port)
      serveOnce(s2, Seq("b1", "b2"))
      got = drain()
      while (!Set("b1", "b2").subsetOf(got.map(_._1)) &&
             System.currentTimeMillis() < deadline) { Thread.sleep(100); got = drain() }
      val after = got.filter(g => g._1 == "b1" || g._1 == "b2")
      assert(after.map(_._1) == Set("b1", "b2"), got)
      assert(after.forall(_._2 >= 1),
        s"post-drop lines must ride a later connection epoch: $got")
    } finally {
      query.stop()
      spark.sql("DROP VIEW IF EXISTS resock")
    }
  }

  test("feed not yet up at query start: source retries until the server appears") {
    val probe = bind(0)
    val port = probe.getLocalPort
    probe.close() // port is now free — first connect attempts get refused
    val query = OhlcvStream
      .fromResilientSocket(spark, "127.0.0.1", port,
        retryDelayMs = 100L, maxRetryDelayMs = 500L)
      .writeStream
      .format("memory")
      .queryName("resock_late")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("resock_ckpt2").toString)
      .start()
    try {
      Thread.sleep(300) // a few refused attempts first
      val s = bind(port)
      serveOnce(s, Seq("late1"))
      val deadline = System.currentTimeMillis() + 60000
      def drain(): Set[(String, Int)] = { query.processAllAvailable(); collected("resock_late") }
      var got = drain()
      while (got.isEmpty && System.currentTimeMillis() < deadline) {
        Thread.sleep(100); got = drain()
      }
      assert(got.map(_._1) == Set("late1"), got)
      assert(got.forall(_._2 >= 1), s"line must arrive after >=1 retry: $got")
    } finally {
      query.stop()
      spark.sql("DROP VIEW IF EXISTS resock_late")
    }
  }
}
