package graft.io

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** RESP (REdis Serialization Protocol) wire encoding — the ~40 lines a
  * Redis SINK actually needs, with zero client dependency (the sandbox
  * ships no jedis/lettuce jar, and the protocol is a public spec:
  * redis.io/docs/reference/protocol-spec). Commands encode as arrays of
  * bulk strings; replies are a one-byte type tag plus a CRLF-terminated
  * line (bulk strings carry a payload of the declared length).
  *
  * Pure byte-level functions so the encoding is unit-testable without a
  * server; the socket round-trip is tested in-JVM against a mock RESP
  * server in `RedisSinkSpec`, and against a real server (when one is
  * reachable) by [[RedisSmoke]].
  */
object Resp {
  private val Crlf = "\r\n".getBytes("UTF-8")

  /** `*N\r\n` then each arg as `$len\r\n<bytes>\r\n` — the client→server
    * framing for every Redis command. */
  def encode(args: Seq[String]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(s"*${args.size}".getBytes("UTF-8")); out.write(Crlf)
    args.foreach { a =>
      val b = a.getBytes("UTF-8")
      out.write(s"$$${b.length}".getBytes("UTF-8")); out.write(Crlf)
      out.write(b); out.write(Crlf)
    }
    out.toByteArray
  }

  /** Read one reply off the stream: simple string (+), error (-),
    * integer (:), bulk string ($, null as None) — the types SET/GET/PING
    * produce. Throws on `-ERR` so a refused write fails the batch (and
    * the streaming checkpoint retries it) instead of dropping rows. */
  def readReply(in: java.io.DataInputStream): Option[String] = {
    def line(): String = {
      val sb = new StringBuilder
      var c = in.read()
      while (c != '\r') {
        if (c < 0) throw new java.io.EOFException("RESP stream closed")
        sb.append(c.toChar); c = in.read()
      }
      require(in.read() == '\n', "RESP: CR without LF")
      sb.toString
    }
    val tag = in.read()
    tag match {
      case '+' => Some(line())
      case ':' => Some(line())
      case '-' => throw new java.io.IOException(s"redis error: ${line()}")
      case '$' =>
        val n = line().toInt
        if (n < 0) None
        else {
          val buf = new Array[Byte](n)
          in.readFully(buf)
          require(in.read() == '\r' && in.read() == '\n', "RESP: bulk without CRLF")
          Some(new String(buf, "UTF-8"))
        }
      case other =>
        throw new java.io.IOException(s"RESP: unexpected reply tag $other")
    }
  }
}

/** Redis SINK for the reference deployment's write-back half
  * (BASELINE.json approach line: "Kafka source + Redis sink"; the
  * reference's own Spark app writes Kafka — sparkpykafkajoin.py:286-294 —
  * and its STEDI webapp owns the Redis writes, so this sink is the
  * commissioned extension that lets the Spark side complete the loop).
  *
  * Shape: `SET <keyPrefix><key> <to_json(struct(values))>` per row,
  * pipelined per partition over one socket each — a stateless idempotent
  * upsert, so foreachBatch replay after a crash rewrites the same keys
  * with the same payloads (the same exactly-once-by-idempotence recipe
  * as the parquet upsert sink in StreamOps). Executors write in
  * parallel; nothing is collected to the driver. Any `-ERR` reply
  * throws, failing the task → Spark retries → the checkpoint guarantees
  * the batch lands fully or not at all from the consumer's view (keys
  * are overwritten, never partially appended).
  */
object RedisSink {

  /** Per-partition pipelined SET writer. `rows` are (key, value) pairs —
    * already JSON-rendered by [[upsertForeachBatch]]. Factored out so the
    * spec can drive it against a mock server without a SparkSession. */
  def writePartition(rows: Iterator[(String, String)], host: String,
      port: Int, keyPrefix: String, pipelineDepth: Int = 128): Long = {
    if (!rows.hasNext) return 0L
    val sock = new java.net.Socket(host, port)
    try {
      sock.setTcpNoDelay(true)
      val out = new java.io.BufferedOutputStream(sock.getOutputStream, 1 << 16)
      val in = new java.io.DataInputStream(
        new java.io.BufferedInputStream(sock.getInputStream, 1 << 16))
      var written = 0L
      var inFlight = 0
      rows.foreach { case (k, v) =>
        out.write(Resp.encode(Seq("SET", keyPrefix + k, v)))
        inFlight += 1
        written += 1
        if (inFlight >= pipelineDepth) {
          out.flush()
          (0 until inFlight).foreach(_ => Resp.readReply(in))
          inFlight = 0
        }
      }
      out.flush()
      (0 until inFlight).foreach(_ => Resp.readReply(in))
      written
    } finally sock.close()
  }

  /** The foreachBatch body: render each row's `valueCols` as one JSON
    * object keyed by `keyCol`, then SET per partition. Returns rows
    * written (for the smoke's assertion). */
  def upsertBatch(batch: DataFrame, keyCol: String, valueCols: Seq[String],
      host: String, port: Int, keyPrefix: String): Long = {
    import batch.sparkSession.implicits._
    val kv = batch.select(col(keyCol).cast("string").as("k"),
      to_json(struct(valueCols.map(col): _*)).as("v")).as[(String, String)]
    kv.mapPartitions(it =>
        Iterator.single(writePartition(it, host, port, keyPrefix)))
      .reduce(_ + _)
  }

  /** Attach the Redis upsert sink to a streaming DataFrame: checkpointed
    * foreachBatch, Update mode — the stream-side mirror of the
    * reference's score write-back. */
  def upsertForeachBatch(stream: DataFrame, keyCol: String,
      valueCols: Seq[String], checkpoint: String,
      host: String = "localhost", port: Int = 6379,
      keyPrefix: String = "graft:")
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        upsertBatch(batch.toDF(), keyCol, valueCols, host, port, keyPrefix): Unit
      }
      .option("checkpointLocation", checkpoint)
      .outputMode("update")
}

/** Guarded Redis round-trip smoke, the [[KafkaSmoke]] discipline for the
  * sink side: no server reachable at `SPARK_GRAFT_REDIS` (default
  * localhost:6379) → `REDIS SMOKE SKIPPED`, exit 0; server present →
  * write the stedi-shaped risk batch through [[RedisSink.upsertBatch]],
  * GET each key back, assert payloads match → `REDIS SMOKE OK`, exit 0;
  * mismatch exits 1. */
object RedisSmoke {
  private def reachable(host: String, port: Int): Boolean =
    try {
      val s = new java.net.Socket()
      try { s.connect(new java.net.InetSocketAddress(host, port), 1000); true }
      finally s.close()
    } catch { case _: java.io.IOException => false }

  def main(args: Array[String]): Unit = {
    val target = sys.env.getOrElse("SPARK_GRAFT_REDIS", "localhost:6379")
    val (host, port) = target.split(":", 2) match {
      case Array(h, p) if p.forall(_.isDigit) && p.nonEmpty => (h, p.toInt)
      case _ => (target, 6379)
    }
    if (!reachable(host, port)) {
      println(s"REDIS SMOKE SKIPPED (no server at $target)")
      return
    }
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val risk = Seq(("alice@x.com", 0.5, "1990"), ("bob@y.com", -0.3, "1985"))
      .toDF("customer", "score", "birthYear")
    val n = RedisSink.upsertBatch(risk, "customer",
      Seq("customer", "score", "birthYear"), host, port, "graft-smoke:")
    // read back over one socket
    val sock = new java.net.Socket(host, port)
    val out = new java.io.BufferedOutputStream(sock.getOutputStream)
    val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(sock.getInputStream))
    val ok = Seq("alice@x.com", "bob@y.com").forall { k =>
      out.write(Resp.encode(Seq("GET", s"graft-smoke:$k"))); out.flush()
      Resp.readReply(in).exists(_.contains(k))
    }
    sock.close()
    spark.stop()
    if (ok) println(s"REDIS SMOKE OK ($n rows)")
    else { println("REDIS SMOKE FAILED (payload mismatch)"); sys.exit(1) }
  }
}
