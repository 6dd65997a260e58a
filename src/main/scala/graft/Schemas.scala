package graft

import org.apache.spark.sql.types._

/** Fixed, explicitly-declared schemas of the reference pipelines.
  *
  * The reference never infers schemas ("before Spark 3.0.0, schema inference
  * is not automatic", reference sparkpyrediskafkastreamtoconsole.py:5); all
  * three StructTypes below are declared verbatim from
  * reference project/starter/sparkpykafkajoin.py:7-47.
  */
object Schemas {

  /** Kafka-Connect Redis CDC envelope on topic `redis-server`.
    *
    * Reference sparkpykafkajoin.py:7-25. Note: the wire payload carries a
    * redundant lowercase `zsetEntries` field that is deliberately NOT
    * declared — only one copy should be parsed
    * (sparkpyrediskafkastreamtoconsole.py:99). `score` is declared String
    * although the wire carries a JSON number; `from_json` coerces.
    */
  val redisServer: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("value", StringType),
    StructField("expiredType", StringType),
    StructField("expiredValue", StringType),
    StructField("existType", StringType),
    StructField("Ch", BooleanType),
    StructField("Incr", BooleanType),
    StructField("zSetEntries", ArrayType(StructType(Seq(
      StructField("element", StringType),
      StructField("score", StringType)
    ))))
  ))

  /** Base64-decoded customer record held in `zSetEntries[0].element`.
    *
    * Reference sparkpykafkajoin.py:32-37. `birthDay` stays a `yyyy-MM-dd`
    * String and is split lexically — never parsed as DateType.
    */
  val customer: StructType = StructType(Seq(
    StructField("customerName", StringType),
    StructField("email", StringType),
    StructField("phone", StringType),
    StructField("birthDay", StringType)
  ))

  /** Fall-risk assessment event on topic `stedi-events`.
    *
    * Reference sparkpykafkajoin.py:43-47. `riskDate` is an ISO-8601 instant
    * kept as String.
    */
  val stediEvents: StructType = StructType(Seq(
    StructField("customer", StringType),
    StructField("score", DoubleType),
    StructField("riskDate", StringType)
  ))
}
