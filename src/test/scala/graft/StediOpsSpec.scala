package graft

import graft.ops.StediOps
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the reference parse/join chain over literal frames,
  * using the exact documented wire payloads (FIXTURES.md A1-A4). */
class StediOpsSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  // FIXTURES.md A1: base64("{"customerName":"Sam Test",...}")
  private val samElement =
    "eyJjdXN0b21lck5hbWUiOiJTYW0gVGVzdCIsImVtYWlsIjoic2FtLnRlc3RAdGVzdC5jb20iLCJwaG9uZSI6IjgwMTU1NTEyMTIiLCJiaXJ0aERheSI6IjIwMDEtMDEtMDMifQ=="
  private val envelope =
    s"""{"key":"Q3VzdG9tZXI=","existType":"NONE","ch":false,"incr":false,
       |"zSetEntries":[{"element":"$samElement","score":0.0}],
       |"zsetEntries":[{"element":"$samElement","score":0.0}]}""".stripMargin.replace("\n", "")

  test("customer chain decodes the documented envelope to (email, birthYear)") {
    val out = StediOps.customerChain(Seq(envelope).toDF("value")).collect()
    assert(out.length == 1)
    assert(out(0).getString(0) == "sam.test@test.com")
    assert(out(0).getString(1) == "2001")
  }

  test("non-zset envelope (null zSetEntries) is filtered out") {
    val noZset = """{"key":"Q3VzdG9tZXI=","existType":"NONE","ch":false,"incr":false}"""
    assert(StediOps.customerChain(Seq(noZset).toDF("value")).count() == 0)
  }

  test("malformed JSON yields nulls (PERMISSIVE) and is dropped by the null filter") {
    assert(StediOps.customerChain(Seq("not json at all").toDF("value")).count() == 0)
  }

  test("only zSetEntries[0] is read from multi-entry envelopes") {
    val otherElement = java.util.Base64.getEncoder.encodeToString(
      """{"customerName":"Other","email":"other@test.com","phone":"1","birthDay":"1999-12-31"}"""
        .getBytes("UTF-8"))
    val multi =
      s"""{"zSetEntries":[{"element":"$samElement","score":0.0},{"element":"$otherElement","score":1.0}]}"""
    val out = StediOps.customerChain(Seq(multi).toDF("value")).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("sam.test@test.com"))
  }

  test("birthDay without '-' yields the whole string as birthYear") {
    val weird = java.util.Base64.getEncoder.encodeToString(
      """{"customerName":"X","email":"x@test.com","phone":"1","birthDay":"19990101"}"""
        .getBytes("UTF-8"))
    val env = s"""{"zSetEntries":[{"element":"$weird","score":0.0}]}"""
    val out = StediOps.customerChain(Seq(env).toDF("value")).collect()
    assert(out(0).getString(1) == "19990101")
  }

  test("risk event parse drops null customers and keeps score as double") {
    val events = Seq(
      """{"customer":"Jason.Mitra@test.com","score":7.0,"riskDate":"2020-09-14T07:54:06.417Z"}""",
      """{"score":-1.4,"riskDate":"2020-09-14T07:54:06.417Z"}""").toDF("value")
    val out = StediOps.parseRiskEvent(events).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Double]("score") == 7.0)
  }

  test("join emits (customer, score, email, birthYear) and kafka output JSON matches A4 format") {
    val risk = Seq(("Santosh.Fibonnaci@test.com", 28.5, "2020-09-14T07:54:06.417Z"))
      .toDF("customer", "score", "riskDate")
    val cust = Seq(("Santosh.Fibonnaci@test.com", "1963")).toDF("email", "birthYear")
    val joined = StediOps.joinRiskWithCustomer(risk, cust)
    assert(joined.columns.toSeq == Seq("customer", "score", "email", "birthYear"))
    val kafka = StediOps.toKafkaOutput(joined).collect()(0)
    assert(kafka.getAs[String]("key") == "Santosh.Fibonnaci@test.com")
    assert(kafka.getAs[String]("value") ==
      """{"customer":"Santosh.Fibonnaci@test.com","score":"28.5","email":"Santosh.Fibonnaci@test.com","birthYear":"1963"}""")
  }

  test("envelope flattening exposes the 8 declared fields") {
    val parsed = StediOps.parseRedisEnvelope(Seq(envelope).toDF("value"))
    assert(parsed.columns.toSeq ==
      Seq("key", "value", "expiredType", "expiredValue", "existType", "ch", "incr", "zSetEntries"))
    val row = parsed.collect()(0)
    assert(row.getAs[String]("existType") == "NONE")
    assert(row.getAs[String]("key") == "Q3VzdG9tZXI=")
  }

  test("synthetic envelopes round-trip through the chain at sf0.001") {
    val env = graft.queries.ReferenceQueries.syntheticEnvelopes(spark, "/root/testdata/sf0.001")
    val out = StediOps.customerChain(env)
    assert(out.count() == Tables.load(spark, "/root/testdata/sf0.001", "customer").count())
    assert(out.filter(col("birthYear").rlike("^(19[5-9][0-9]|2000)$")).count() == out.count())
  }
}
