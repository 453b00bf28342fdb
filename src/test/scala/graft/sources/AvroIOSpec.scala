package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

class AvroIOSpec extends SparkSpec {
  import spark.implicits._

  test("avro round-trip preserves values across all mapped types") {
    val dir = Files.createTempDirectory("avro_rt").toString
    val df = spark.range(0, 100).select(
      $"id",
      ($"id" % 7).cast(IntegerType).as("small"),
      ($"id" * 1.5).as("score"),
      concat(lit("name"), $"id").as("name"),
      when($"id" % 10 === 0, lit(null).cast(StringType))
        .otherwise(concat(lit("opt"), $"id")).as("opt"),
      timestamp_micros($"id" * 1000000L + 123456L).as("ts"),
      to_date(timestamp_micros($"id" * 86400L * 1000000L)).as("d"),
      array($"id", $"id" + 1).as("arr"),
      struct($"id".as("a"), concat(lit("n"), $"id").as("b")).as("nested"),
      unhex(lpad(hex($"id"), 4, "0")).as("bin"))
    AvroIO.write(df, s"$dir/t")
    val back = AvroIO.read(spark, s"$dir/t")
    assert(back.schema("ts").dataType == TimestampType)
    assert(back.schema("d").dataType == DateType)
    assert(back.schema("nested").dataType.isInstanceOf[StructType])
    assert(back.count() === 100)
    // value-exact comparison via anti-joins on a canonical projection
    def canon(x: org.apache.spark.sql.DataFrame) = x.select(
      $"id", $"small", $"score", $"name", $"opt",
      unix_micros($"ts").as("ts_us"), $"d".cast(StringType).as("ds"),
      $"arr", $"nested.a", $"nested.b", hex($"bin").as("binhex"))
    assert(canon(back).exceptAll(canon(df)).count() === 0)
    assert(canon(df).exceptAll(canon(back)).count() === 0)
  }

  test("avro write is one container per partition; read parallelism >= container count") {
    val dir = Files.createTempDirectory("avro_parts").toString
    val df = spark.range(0, 1000).repartition(4)
      .select($"id", ($"id" % 3).as("g"))
    AvroIO.write(df, s"$dir/t")
    val files = new java.io.File(s"$dir/t").listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(files.length === 4, files.map(_.getName).mkString(","))
    // no uncommitted temp files left behind by the rename protocol
    assert(!new java.io.File(s"$dir/t").listFiles()
      .exists(_.getName.endsWith(".tmp")))
    val back = AvroIO.read(spark, s"$dir/t")
    // the parallelism contract: at least one task per container even
    // when every container is far below the split size
    assert(back.rdd.getNumPartitions >= 4)
    assert(back.agg(sum("id")).as[Long].head === (0L until 1000L).sum)
  }

  test("splittable read: one large container becomes multiple sync-aligned tasks") {
    val dir = Files.createTempDirectory("avro_split").toString
    // ONE container, many blocks (DataFileWriter cuts a block every
    // ~64 KB of serialized data; 50k padded rows comfortably exceed it)
    val df = spark.range(0, 50000).repartition(1)
      .select($"id", concat(lit("pad-pad-pad-"), $"id").as("s"))
    AvroIO.write(df, s"$dir/t")
    val files = new java.io.File(s"$dir/t").listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(files.length === 1)
    val splitBytes = math.max(1L, files.head.length() / 8)
    val back = AvroIO.read(spark, s"$dir/t", targetSplitBytes = splitBytes)
    assert(back.rdd.getNumPartitions >= 4,
      s"expected >=4 splits, got ${back.rdd.getNumPartitions}")
    // exact content: every row exactly once — no split drops or
    // double-reads a block at a range boundary
    assert(back.count() === 50000)
    assert(back.exceptAll(df).count() === 0)
    assert(df.exceptAll(back).count() === 0)
  }

  test("mixed writer schemas resolve against the sorted-first reader schema") {
    import org.apache.avro.Schema
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val dir = Files.createTempDirectory("avro_evolve").toString
    new java.io.File(s"$dir/t").mkdirs()
    def write(name: String, json: String, rows: Seq[Map[String, Any]]): Unit = {
      val schema = new Schema.Parser().parse(json)
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, new java.io.File(s"$dir/t/$name"))
      rows.foreach { m =>
        val r = new GenericData.Record(schema)
        m.foreach { case (k, v) => r.put(k, v) }
        w.append(r)
      }
      w.close()
    }
    // sorts FIRST -> chosen as reader schema: x long, plus field y
    write("a-wide.avro",
      """{"type":"record","name":"row","fields":[
        |{"name":"x","type":["null","long"],"default":null},
        |{"name":"y","type":["null","string"],"default":null}]}""".stripMargin,
      Seq(Map("x" -> 10L, "y" -> "ten"), Map("x" -> 20L, "y" -> "twenty")))
    // older writer: x int, no y — resolution must promote int->long
    // and fill y with its null default, not pass raw ints through
    write("b-old.avro",
      """{"type":"record","name":"row","fields":[
        |{"name":"x","type":["null","int"],"default":null}]}""".stripMargin,
      Seq(Map("x" -> Int.box(3))))
    val back = AvroIO.read(spark, s"$dir/t")
    assert(back.schema("x").dataType === LongType)
    val got = back.select($"x", $"y").as[(Long, Option[String])]
      .collect().sortBy(_._1)
    assert(got.toSeq === Seq((3L, None), (10L, Some("ten")), (20L, Some("twenty"))))
  }

  test("lenient read survives corrupt containers; strict read fails loudly") {
    val dir = Files.createTempDirectory("avro_corrupt").toString
    AvroIO.write(spark.range(0, 100).repartition(1).toDF("id"), s"$dir/t")
    val good = new java.io.File(s"$dir/t").listFiles()
      .filter(_.getName.endsWith(".avro")).head
    // a corrupt copy: the block's trailing sync marker zeroed — the
    // reader verifies it before serving any row of the block, so this
    // fails deterministically (truncation can be silently EOF-swallowed
    // by Avro's own reader; a bad sync cannot)
    val bytes = Files.readAllBytes(good.toPath)
    java.util.Arrays.fill(bytes, bytes.length - 16, bytes.length, 0.toByte)
    Files.write(java.nio.file.Paths.get(s"$dir/t/part-corrupt.avro"), bytes)
    intercept[org.apache.spark.SparkException] {
      AvroIO.read(spark, s"$dir/t").count()
    }
    // lenient: the corrupt container contributes nothing, the intact
    // one contributes everything — exact totals
    val rows = AvroIO.read(spark, s"$dir/t", lenient = true)
      .agg(count(lit(1)), sum("id")).as[(Long, Long)].head()
    assert(rows === ((100L, (0L until 100L).sum)))
  }

  test("empty DataFrames round-trip as schema-bearing empty containers") {
    val dir = Files.createTempDirectory("avro_empty").toString
    val df = spark.range(0, 10).select($"id", ($"id" * 2.0).as("v"))
      .filter($"id" < 0)
    AvroIO.write(df, s"$dir/t")
    val back = AvroIO.read(spark, s"$dir/t")
    assert(back.count() === 0)
    assert(back.schema.fieldNames.toSeq === Seq("id", "v"))
  }

  test("avro round-trips the documents table losslessly") {
    val dir = Files.createTempDirectory("avro_docs").toString
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    AvroIO.write(docs, s"$dir/docs")
    val back = AvroIO.read(spark, s"$dir/docs")
    assert(back.schema.fieldNames.sorted sameElements docs.schema.fieldNames.sorted)
    assert(back.count() === docs.count())
    assert(back.exceptAll(docs).count() === 0)
  }
}
