package graft

import org.apache.spark.sql.types._

/** Schema tripwire for the driver-refreshed testdata.
  *
  * The driver regenerates `/root/testdata` between rounds and has
  * already changed column encodings once (round 6→7: `events.ts` went
  * from TIMESTAMP(NANOS) to TIMESTAMP_NTZ micros, silently breaking
  * every `unix_micros` call site at analysis time). This spec pins the
  * QUERY-FACING schema of every table — i.e. what `Tables.*` loaders
  * return after canonicalization, which is the contract the 180+
  * registry queries are written against. If a future refresh flips a
  * type the loaders don't absorb, this fails loudly at test time
  * instead of as eight mysterious gate reds.
  *
  * Time semantics contract (README "Time semantics"): event timestamps
  * are canonicalized to TIMESTAMP (UTC instant) at the source boundary
  * by [[Tables.toUtcTimestamp]]; `orders`/`lineitem` date columns pass
  * through as the refresh ships them (currently TIMESTAMP_NTZ) because
  * every consumer treats them as wall-clock dates.
  */
class TablesSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def fields(name: String): Map[String, DataType] = {
    val df = name match {
      case "events" => Tables.events(spark, dir)
      case n => Tables.load(spark, dir, n)
    }
    df.schema.fields.map(f => f.name -> f.dataType).toMap
  }

  test("events.ts canonicalizes to TIMESTAMP regardless of encoding") {
    val f = fields("events")
    assert(f("ts") == TimestampType,
      s"events.ts must reach queries as TIMESTAMP, got ${f("ts")}")
    assert(f("event_id") == LongType && f("user_id") == LongType &&
      f("event_type") == StringType && f("value") == DoubleType &&
      f("props") == StringType)
  }

  test("toUtcTimestamp absorbs every documented arrival flavor") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // epoch-nanos long (pre-r7 testdata): exact floor division, sign-safe
    val ns = Seq(1700000000123456789L, -123456789L).toDF("ts")
    val fromNs = Tables.toUtcTimestamp(ns, "ts")
    assert(fromNs.schema("ts").dataType == TimestampType)
    val micros = fromNs.select(unix_micros($"ts")).as[Long].collect().sorted
    assert(micros.sameElements(Array(-123457L, 1700000000123456L)),
      s"floor-division contract violated: ${micros.mkString(",")}")
    // TIMESTAMP_NTZ (current testdata): lossless under the UTC session
    val ntz = fromNs.select($"ts".cast(TimestampNTZType).as("ts"))
    assert(Tables.toUtcTimestamp(ntz, "ts").schema("ts").dataType == TimestampType)
    // already-canonical TIMESTAMP: identity
    val tz = fromNs
    assert(Tables.toUtcTimestamp(tz, "ts") eq tz)
    // NTZ→TZ round-trip is value-preserving with the session pinned UTC
    val ntzMicros = Tables.toUtcTimestamp(ntz, "ts")
      .select(unix_micros($"ts")).as[Long].collect().sorted
    assert(ntzMicros.sameElements(micros),
      s"NTZ cast not lossless under UTC: ${ntzMicros.mkString(",")}")
  }

  test("dimension and fact tables match the documented schema") {
    assert(fields("region") == Map(
      "r_regionkey" -> IntegerType, "r_name" -> StringType))
    assert(fields("nation") == Map(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType))
    assert(fields("customer") == Map(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType))
    assert(fields("supplier") == Map(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType))
    assert(fields("part") == Map(
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType))
    val orders = fields("orders")
    assert(orders - "o_orderdate" == Map(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderpriority" -> StringType))
    // wall-clock date column: NTZ or TIMESTAMP both fine (consumers
    // only extract dates), but a long/ns flip must fail loudly here
    assert(Set[DataType](TimestampNTZType, TimestampType, DateType)
      .contains(orders("o_orderdate")),
      s"o_orderdate arrived as ${orders("o_orderdate")} — loader can't absorb this")
    val li = fields("lineitem")
    assert(Set[DataType](TimestampNTZType, TimestampType, DateType)
      .contains(li("l_shipdate")),
      s"l_shipdate arrived as ${li("l_shipdate")} — loader can't absorb this")
    assert(li("l_quantity") == DoubleType && li("l_extendedprice") == DoubleType
      && li("l_discount") == DoubleType && li("l_tax") == DoubleType)
  }

  test("documents and embeddings match the documented schema") {
    assert(fields("documents") == Map(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType))
    val emb = fields("embeddings")
    assert(emb("vec_id") == LongType && emb("label") == IntegerType)
    assert(emb("embedding") == ArrayType(FloatType, containsNull = true) ||
      emb("embedding") == ArrayType(FloatType, containsNull = false),
      s"embedding arrived as ${emb("embedding")}")
  }
}
