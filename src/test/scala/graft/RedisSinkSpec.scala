package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.io.{Resp, RedisSink}

/** The Redis sink tested end-to-end IN-JVM: a mock RESP server (a
  * ServerSocket thread speaking enough of the public protocol for
  * SET/GET/PING) lets the whole socket path — framing, pipelining,
  * reply draining, error propagation, executor-parallel partition
  * writes, replay idempotence — run as a unit test with no redis
  * binary. The real-server path is [[graft.io.RedisSmoke]]'s guarded
  * round-trip. */
class RedisSinkSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  /** Minimal RESP server: SET/GET/PING over a shared map; one thread
    * per connection (the sink opens one socket per partition). */
  private final class MockRedis {
    val store = new java.util.concurrent.ConcurrentHashMap[String, String]()
    @volatile var failNext: Boolean = false
    private val server = new java.net.ServerSocket(0)
    def port: Int = server.getLocalPort
    private val acceptor = new Thread(() =>
      try while (true) {
        val sock = server.accept()
        new Thread(() => try serve(sock) catch { case _: Throwable => () }).start()
      } catch { case _: Throwable => () })
    acceptor.setDaemon(true); acceptor.start()

    private def serve(sock: java.net.Socket): Unit = {
      val in = new java.io.DataInputStream(
        new java.io.BufferedInputStream(sock.getInputStream))
      val out = new java.io.BufferedOutputStream(sock.getOutputStream)
      def line(): String = {
        val sb = new StringBuilder
        var c = in.read()
        if (c < 0) throw new java.io.EOFException
        while (c != '\r') { sb.append(c.toChar); c = in.read() }
        in.read(); sb.toString
      }
      while (true) {
        val head = line()
        require(head.startsWith("*"), s"expected array, got $head")
        val args = (0 until head.drop(1).toInt).map { _ =>
          val l = line(); require(l.startsWith("$"))
          val buf = new Array[Byte](l.drop(1).toInt)
          in.readFully(buf); in.read(); in.read()
          new String(buf, "UTF-8")
        }
        def bulk(v: String) = s"$$${v.getBytes("UTF-8").length}\r\n$v\r\n"
        val reply = args.head.toUpperCase match {
          case _ if failNext => failNext = false; "-ERR injected failure\r\n"
          case "SET" => store.put(args(1), args(2)); "+OK\r\n"
          case "PING" => "+PONG\r\n"
          case "GET" => Option(store.get(args(1))).map(bulk).getOrElse("$-1\r\n")
          case "SCAN" =>
            // full result at cursor 0 (a legal single-pass server): the
            // nested [cursor, [keys...]] array shape the source parses
            val pat = args.sliding(2, 1).collectFirst {
              case Seq(m, p) if m.equalsIgnoreCase("MATCH") => p
            }.getOrElse("*")
            val rx = java.util.regex.Pattern.quote(pat)
              .replace("*", """\E.*\Q""").replace("?", """\E.\Q""")
            import scala.jdk.CollectionConverters._
            val ks = store.keySet.asScala.filter(_.matches(rx)).toSeq.sorted
            s"*2\r\n${bulk("0")}*${ks.size}\r\n${ks.map(bulk).mkString}"
          case other => s"-ERR unknown command '$other'\r\n"
        }
        out.write(reply.getBytes("UTF-8")); out.flush()
      }
    }
  }

  test("RESP encoding is byte-exact against the protocol spec") {
    val got = new String(Resp.encode(Seq("SET", "k1", "hello")), "UTF-8")
    assert(got == "*3\r\n$3\r\nSET\r\n$2\r\nk1\r\n$5\r\nhello\r\n")
    // empty arg and multibyte UTF-8 both frame by BYTE length
    assert(new String(Resp.encode(Seq("SET", "k", "")), "UTF-8")
      .endsWith("$0\r\n\r\n"))
    assert(new String(Resp.encode(Seq("naïve")), "UTF-8")
      == "*1\r\n$6\r\nnaïve\r\n")
  }

  test("RESP reply parsing: simple, integer, bulk, null bulk, error") {
    def rd(s: String) = Resp.readReply(new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(s.getBytes("UTF-8"))))
    assert(rd("+OK\r\n").contains("OK"))
    assert(rd(":42\r\n").contains("42"))
    assert(rd("$5\r\nhello\r\n").contains("hello"))
    assert(rd("$-1\r\n").isEmpty)
    val e = intercept[java.io.IOException](rd("-ERR boom\r\n"))
    assert(e.getMessage.contains("boom"))
  }

  test("pipelined partition write lands every row and drains every reply") {
    val redis = new MockRedis
    // 300 rows crosses the 128-deep pipeline boundary twice
    val n = RedisSink.writePartition(
      (0 until 300).iterator.map(i => (s"k$i", s"v$i")),
      "localhost", redis.port, keyPrefix = "p:")
    assert(n == 300)
    assert(redis.store.size == 300)
    assert(redis.store.get("p:k0") == "v0" && redis.store.get("p:k299") == "v299")
  }

  test("a server error fails the write instead of dropping rows") {
    val redis = new MockRedis
    redis.failNext = true
    intercept[java.io.IOException] {
      RedisSink.writePartition(Iterator(("k", "v")), "localhost", redis.port, "")
    }
  }

  test("batch upsert writes JSON payloads from executors and replays idempotently") {
    val redis = new MockRedis
    val df = Seq(("alice@x.com", 0.5, 1990L), ("bob@y.com", -0.25, 1985L))
      .toDF("customer", "score", "birthYear").repartition(4)
    val n = RedisSink.upsertBatch(df, "customer",
      Seq("customer", "score", "birthYear"), "localhost", redis.port, "c:")
    assert(n == 2)
    val alice = redis.store.get("c:alice@x.com")
    assert(alice.contains(""""customer":"alice@x.com"""") &&
      alice.contains(""""score":0.5"""), alice)
    // replay (the crash-recovery path): same keys, same payloads, no growth
    RedisSink.upsertBatch(df, "customer",
      Seq("customer", "score", "birthYear"), "localhost", redis.port, "c:")
    assert(redis.store.size == 2)
  }

  test("RESP value parser handles nested arrays (the SCAN reply shape)") {
    val raw = "*2\r\n$1\r\n0\r\n*3\r\n$2\r\nk1\r\n$2\r\nk2\r\n$-1\r\n"
    val v = Resp.readValue(new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(raw.getBytes("UTF-8"))))
    assert(v == Resp.Arr(Vector(Resp.Str("0"),
      Resp.Arr(Vector(Resp.Str("k1"), Resp.Str("k2"), Resp.Null)))))
  }

  test("snapshot source: SCAN-matched keys read executor-parallel, values intact") {
    import graft.io.RedisSource
    val redis = new MockRedis
    (0 until 300).foreach(i => redis.store.put(s"snap:k$i", s"v$i"))
    (0 until 50).foreach(i => redis.store.put(s"other:k$i", "x"))
    val df = RedisSource.readSnapshot(spark, "localhost", redis.port,
      pattern = "snap:*", parallelism = 4)
    val rows = df.collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(rows.size == 300, s"expected 300 matched keys, got ${rows.size}")
    assert(rows("snap:k0") == "v0" && rows("snap:k299") == "v299")
    assert(!rows.keySet.exists(_.startsWith("other:")))
  }

  test("pipeline 4 end-to-end: stedi wire feeds -> join -> Redis, payload byte-faithful") {
    // The BASELINE approach line ("Kafka source + Redis sink") as a
    // tested path: Kafka-wire-shaped MemoryStream feeds through the
    // reference parse chains and stream-stream join, toKafkaOutput's
    // quirk-preserving projection, and the raw-KV Redis upsert — then
    // assert the landed JSON carries score/birthYear as STRINGS (the
    // reference's sparkpykafkajoin.py:274-284 shape) under the
    // customer-risk key.
    import graft.ops.StediOps
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val redis = new MockRedis
    val ck = ckptDir("redis_join_ck")
    def b64(s: String): String =
      java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))
    val el = b64("""{"customerName":"Sam Test","email":"sam.test@test.com",""" +
      """"phone":"8015551212","birthDay":"2001-01-03"}""")
    val envelope =
      s"""{"key":"Q3VzdG9tZXI=","existType":"NONE","ch":false,"incr":false,""" +
        s""""zSetEntries":[{"element":"$el","score":0.0}]}"""
    val riskJson =
      """{"customer":"sam.test@test.com","score":7.0,""" +
        """"riskDate":"2020-09-14T07:54:06.417Z"}"""
    val redisFeed = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[String]
    val eventFeed = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[String]
    import org.apache.spark.sql.functions.col
    def asWire(s: org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]) =
      StediOps.castValueAsString(
        s.toDF().select(col("value").cast("binary").as("value")))
    val joined = StediOps.joinRiskWithCustomer(
      StediOps.parseRiskEvent(asWire(eventFeed)),
      StediOps.customerChain(asWire(redisFeed)))
    val q = graft.io.RedisSink.upsertKvForeachBatch(
        StediOps.toKafkaOutput(joined), ck,
        port = redis.port, keyPrefix = "customer-risk:").start()
    try {
      redisFeed.addData(envelope)
      eventFeed.addData(riskJson)
      q.processAllAvailable()
      val v = redis.store.get("customer-risk:sam.test@test.com")
      assert(v != null, s"joined row must land in redis: ${redis.store}")
      assert(v.contains(""""score":"7.0"""") && v.contains(""""birthYear":"2001""""),
        s"payload must keep the reference's string-typed score/birthYear: $v")
    } finally q.stop()
  }

  test("streaming foreachBatch sink: two micro-batches land, later batch overwrites") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val redis = new MockRedis
    val ck = ckptDir("redis_ck")
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Double)]
    val q = RedisSink.upsertForeachBatch(
        input.toDF().toDF("customer", "score"),
        "customer", Seq("customer", "score"), ck,
        port = redis.port, keyPrefix = "s:").start()
    try {
      input.addData(("alice@x.com", 0.1), ("bob@y.com", 0.2))
      q.processAllAvailable()
      assert(redis.store.size == 2)
      input.addData(("alice@x.com", 0.9)) // upsert overwrites
      q.processAllAvailable()
      assert(redis.store.size == 2)
      assert(redis.store.get("s:alice@x.com").contains(""""score":0.9"""))
    } finally q.stop()
  }
}
