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

  /** Full recursive reply value — arrays nest (SCAN replies are
    * `[cursor, [key, ...]]`), which the flat [[readReply]] can't carry.
    * Used by the snapshot SOURCE; the sink's hot path keeps the flat
    * reader. */
  sealed trait Value
  final case class Str(s: String) extends Value
  final case class Num(n: Long) extends Value
  case object Null extends Value
  final case class Arr(items: Vector[Value]) extends Value

  def readValue(in: java.io.DataInputStream): Value = {
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
    in.read() match {
      case '+' => Str(line())
      case ':' => Num(line().toLong)
      case '-' => throw new java.io.IOException(s"redis error: ${line()}")
      case '$' =>
        val n = line().toInt
        if (n < 0) Null
        else {
          val buf = new Array[Byte](n)
          in.readFully(buf)
          require(in.read() == '\r' && in.read() == '\n', "RESP: bulk without CRLF")
          Str(new String(buf, "UTF-8"))
        }
      case '*' =>
        val n = line().toInt
        if (n < 0) Null else Arr(Vector.fill(n)(readValue(in)))
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
      keyPrefix: String = "graft:", outputMode: String = "update")
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        upsertBatch(batch.toDF(), keyCol, valueCols, host, port, keyPrefix): Unit
      }
      .option("checkpointLocation", checkpoint)
      .outputMode(outputMode)

  /** PRE-RENDERED variant for streams already shaped `(key, value)` —
    * e.g. [[graft.ops.StediOps.toKafkaOutput]]'s Kafka sink projection,
    * whose byte-faithful payload (score/birthYear as JSON strings) must
    * not be re-rendered. SET `<prefix><key> <value>` per row. Default
    * output mode is Append — the only mode a stream-stream join
    * supports; the struct-rendering sink defaults to Update for the
    * aggregate write-back case. */
  def upsertKvForeachBatch(stream: DataFrame, checkpoint: String,
      host: String = "localhost", port: Int = 6379,
      keyPrefix: String = "graft:", outputMode: String = "append")
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        import batch.sparkSession.implicits._
        batch.toDF()
          .select(col("key").cast("string").as("k"),
            col("value").cast("string").as("v"))
          .as[(String, String)]
          .mapPartitions(it =>
            Iterator.single(writePartition(it, host, port, keyPrefix)))
          .reduce(_ + _): Unit
      }
      .option("checkpointLocation", checkpoint)
      .outputMode(outputMode)
}

/** Redis SOURCE: a batch SNAPSHOT of string keys matching a pattern —
  * the read half the sink implies (bootstrap a dimension the STEDI-side
  * app maintains in Redis, e.g. the customer table the reference's
  * Kafka keyspace events mirror). Two-phase, shaped for the cluster:
  *
  *  1. the DRIVER walks the SCAN cursor collecting matching KEYS only
  *     (keys are dimension-scale — bytes per key — and SCAN is the
  *     public non-blocking iteration; values never cross the driver);
  *  2. keys distribute across `parallelism` partitions and each
  *     partition GETs its keys over one pipelined socket — the same
  *     executor-parallel shape as the sink.
  *
  * At real scale the driver key list is bounded by the dimension's key
  * count (a Redis instance is memory-bound, so this is millions, not
  * billions); a cluster deployment shards phase 1 by slot range the
  * same way, one SCAN per node. */
object RedisSource {

  /** Driver-side SCAN walk: all keys matching `pattern`. */
  def scanKeys(host: String, port: Int, pattern: String,
      countHint: Int = 1000): Seq[String] = {
    val sock = new java.net.Socket(host, port)
    try {
      val out = new java.io.BufferedOutputStream(sock.getOutputStream)
      val in = new java.io.DataInputStream(
        new java.io.BufferedInputStream(sock.getInputStream))
      val keys = Vector.newBuilder[String]
      var cursor = "0"
      var first = true
      while (first || cursor != "0") {
        first = false
        out.write(Resp.encode(Seq("SCAN", cursor, "MATCH", pattern,
          "COUNT", countHint.toString)))
        out.flush()
        Resp.readValue(in) match {
          case Resp.Arr(Vector(Resp.Str(next), Resp.Arr(items))) =>
            cursor = next
            items.foreach { case Resp.Str(k) => keys += k; case _ => () }
          case other =>
            throw new java.io.IOException(s"SCAN: unexpected reply $other")
        }
      }
      keys.result()
    } finally sock.close()
  }

  /** Per-partition pipelined GET. Missing keys (deleted between scan
    * and read — snapshot semantics are best-effort like any SCAN-based
    * reader) yield no row rather than a null value. */
  def readPartition(keys: Iterator[String], host: String, port: Int,
      pipelineDepth: Int = 128): Iterator[(String, String)] = {
    val ks = keys.toVector
    if (ks.isEmpty) return Iterator.empty
    val sock = new java.net.Socket(host, port)
    try {
      sock.setTcpNoDelay(true)
      val out = new java.io.BufferedOutputStream(sock.getOutputStream, 1 << 16)
      val in = new java.io.DataInputStream(
        new java.io.BufferedInputStream(sock.getInputStream, 1 << 16))
      ks.grouped(pipelineDepth).flatMap { batch =>
        batch.foreach(k => out.write(Resp.encode(Seq("GET", k))))
        out.flush()
        batch.flatMap(k => Resp.readReply(in).map(v => (k, v)))
      }.toVector.iterator
    } finally sock.close()
  }

  /** The snapshot as a DataFrame `(key STRING, value STRING)`. */
  def readSnapshot(spark: org.apache.spark.sql.SparkSession, host: String,
      port: Int, pattern: String = "*", parallelism: Int = 8): DataFrame = {
    import spark.implicits._
    val keys = scanKeys(host, port, pattern)
    spark.createDataset(keys).repartition(parallelism)
      .mapPartitions(it => readPartition(it, host, port))
      .toDF("key", "value")
  }
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
