package graft

import org.scalatest.funsuite.AnyFunSuite

/** The guarded Kafka round-trip smoke must no-op cleanly in environments
  * without the connector (this sandbox) — the skip path IS the in-sandbox
  * contract; the full round-trip runs wherever spark-sql-kafka + a broker
  * exist. */
class KafkaSmokeSpec extends AnyFunSuite {
  test("kafka smoke skips cleanly when the connector is absent") {
    assert(!graft.io.KafkaSmoke.connectorPresent,
      "sandbox unexpectedly has spark-sql-kafka on the classpath — " +
        "if this changed, run graft.io.KafkaSmoke against a real broker")
    // main must return (not throw) on the skip path.
    graft.io.KafkaSmoke.main(Array.empty)
  }
}
