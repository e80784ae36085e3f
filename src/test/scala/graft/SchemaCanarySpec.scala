package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-drift canary: reads every table's ACTUAL parquet schema and
  * asserts the column/type contract the operators assume, naming the
  * drifted table+column in the failure message.
  *
  * Round-6 lesson: the driver regenerated events.parquet with `ts` as
  * TIMESTAMP(MICROS) (previously TIMESTAMP(NANOS) read as Long) and the
  * breakage surfaced as 37 cryptic DATATYPE_MISMATCH test failures
  * spread over every events consumer. This spec exists so the NEXT
  * regeneration fails ONE test with a readable diff instead.
  *
  * `ts` deliberately accepts EITHER physical shape the driver has
  * shipped — Long (legacy nanos-as-long) or timestamp (µs) — because
  * [[Tables.eventsMicros]]/[[Tables.eventsUs]] normalize both; anything
  * else is drift.
  */
class SchemaCanarySpec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  val sf = TestSpark.sf

  private val integral: Set[DataType] = Set(IntegerType, LongType)
  private def num(dt: DataType) = dt == DoubleType

  /** expected: column -> predicate on the Spark-read type. */
  private val contract: Map[String, Map[String, DataType => Boolean]] = Map(
    "region" -> Map("r_regionkey" -> integral.contains, "r_name" -> (_ == StringType)),
    "nation" -> Map("n_nationkey" -> integral.contains, "n_name" -> (_ == StringType),
      "n_regionkey" -> integral.contains),
    "customer" -> Map("c_custkey" -> (_ == LongType), "c_name" -> (_ == StringType),
      "c_nationkey" -> integral.contains, "c_acctbal" -> num,
      "c_mktsegment" -> (_ == StringType)),
    "supplier" -> Map("s_suppkey" -> (_ == LongType), "s_name" -> (_ == StringType),
      "s_nationkey" -> integral.contains, "s_acctbal" -> num),
    "part" -> Map("p_partkey" -> (_ == LongType), "p_name" -> (_ == StringType),
      "p_brand" -> (_ == StringType), "p_type" -> (_ == StringType),
      "p_size" -> integral.contains, "p_retailprice" -> num),
    "orders" -> Map("o_orderkey" -> (_ == LongType), "o_custkey" -> (_ == LongType),
      "o_orderstatus" -> (_ == StringType), "o_totalprice" -> num,
      "o_orderdate" -> (dt => dt == TimestampType || dt == TimestampNTZType),
      "o_orderpriority" -> (_ == StringType)),
    "lineitem" -> Map("l_orderkey" -> (_ == LongType), "l_partkey" -> (_ == LongType),
      "l_suppkey" -> (_ == LongType), "l_linenumber" -> integral.contains,
      "l_quantity" -> num, "l_extendedprice" -> num, "l_discount" -> num,
      "l_tax" -> num, "l_returnflag" -> (_ == StringType),
      "l_linestatus" -> (_ == StringType),
      "l_shipdate" -> (dt => dt == TimestampType || dt == TimestampNTZType)),
    "events" -> Map("event_id" -> (_ == LongType),
      "ts" -> (dt => dt == LongType || dt == TimestampType || dt == TimestampNTZType),
      "user_id" -> (_ == LongType), "event_type" -> (_ == StringType),
      "value" -> num, "props" -> (_ == StringType)),
    "documents" -> Map("doc_id" -> (_ == LongType), "text" -> (_ == StringType),
      "lang" -> (_ == StringType), "source" -> (_ == StringType),
      "n_chars" -> (_ == LongType)),
    "embeddings" -> Map("vec_id" -> (_ == LongType),
      "embedding" -> {
        case ArrayType(FloatType | DoubleType, _) => true
        case _ => false
      },
      "label" -> integral.contains))

  test("every table's parquet schema honors the operator contract (drift names the column)") {
    val drifted = contract.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val schema = Tables.table(s, sf, table).schema
      val present = schema.fields.map(f => f.name -> f.dataType).toMap
      cols.toSeq.sortBy(_._1).flatMap { case (c, ok) =>
        present.get(c) match {
          case None => Some(s"$table.$c MISSING (have: ${schema.fieldNames.mkString(", ")})")
          case Some(dt) if !ok(dt) => Some(s"$table.$c drifted to $dt")
          case _ => None
        }
      }
    }
    assert(drifted.isEmpty,
      s"\nTESTDATA SCHEMA DRIFT — adapt Tables.scala (see eventsMicros for the pattern):\n  ${drifted.mkString("\n  ")}")
  }

  test("every table's PHYSICAL layout honors the one-file/one-row-group contract (drift names the property)") {
    // Physical-layout canary (round-7 verdict): a testdata regeneration
    // can change scan parallelism without touching any type — e.g. many
    // small files (per-file task overhead, different AQE coalescing) or
    // many tiny row groups (different pushdown granularity, different
    // stats boxes). Every shipped testdata generation so far has been
    // exactly ONE file with ONE row group per table; if the next one
    // isn't, fail HERE with the table and drifted property, not in some
    // timing-sensitive bench diff.
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = s.sparkContext.hadoopConfiguration
    val drifted = Sql.TableNames.flatMap { t =>
      val p = new java.io.File(s"$sf/$t.parquet")
      val files: Seq[java.io.File] =
        if (p.isDirectory) p.listFiles().toSeq
          .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
        else Seq(p)
      val fileDrift =
        if (files.size == 1) None
        else Some(s"$t: files=${files.size}, contract is 1 " +
          "(per-file scheduling + AQE coalescing change)")
      val groups = files.map { f =>
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf))
        try r.getFooter.getBlocks.size finally r.close()
      }.sum
      val groupDrift =
        if (groups == files.size) None
        else Some(s"$t: row_groups=$groups over ${files.size} file(s), contract is 1/file " +
          "(row-group split points change scan parallelism and stats granularity)")
      fileDrift.toSeq ++ groupDrift.toSeq
    }
    assert(drifted.isEmpty,
      s"\nTESTDATA PHYSICAL-LAYOUT DRIFT — re-baseline this canary AND re-check " +
        s"Bench/ScaleProbe assumptions:\n  ${drifted.mkString("\n  ")}")
  }

  test("legacy nanos-as-long events shape normalizes identically to the micros shape") {
    // The current testdata ships ts as TIMESTAMP(MICROS), so the
    // LongType branch of Tables.eventsMicros would otherwise be dead
    // code until the driver regenerates again — fabricate the legacy
    // shape (epoch-NANOS as BIGINT, what nanosAsLong produced) from the
    // real table and prove both roads normalize to the same rows.
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_legacy_events")
    val sub = dir.resolve("sf").toFile; sub.mkdirs()
    Tables.eventsMicros(s, sf)
      .withColumn("ts", expr("unix_micros(ts) * 1000"))
      .orderBy("event_id").limit(500)
      .coalesce(1).write.mode("overwrite")
      .parquet(sub.getAbsolutePath + "/events.parquet")
    val legacy = Tables.eventsUs(s, sub.getAbsolutePath)
    assert(legacy.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val viaLegacy = legacy.select("event_id", "ts", "us")
      .orderBy("event_id").collect().toSeq
    val direct = Tables.eventsUs(s, sf)
      .select("event_id", "ts", "us")
      .orderBy("event_id").limit(500).collect().toSeq
    assert(viaLegacy.map(_.toString) == direct.map(_.toString),
      "legacy Long path and micros path must normalize identically")
  }

  test("events_ns view keeps its epoch-nanos BIGINT promise whatever the physical shape") {
    // The view NAME is a contract: ad hoc SQL written in the nanos-file
    // era reads `ts` as epoch-nanos Longs. Since the physical shape
    // drifted to TIMESTAMP(MICROS), the view must DERIVE nanos from the
    // normalized axis — never alias the raw scan (a silent 1000× unit
    // change, the round-7 ADVICE finding).
    Sql.registerViews(s, sf)
    val ns = s.table("events_ns")
    assert(ns.schema("ts").dataType == LongType,
      s"events_ns.ts is ${ns.schema("ts").dataType}, promised BIGINT nanos")
    val bad = s.sql(
      """SELECT count(*) FROM events_ns n JOIN events e USING (event_id)
        |WHERE n.ts <> unix_micros(e.ts) * 1000""".stripMargin).head().getLong(0)
    assert(bad == 0L, s"$bad rows where events_ns.ts is not epoch-nanos of events.ts")
  }

  test("events normalization: eventsMicros yields TimestampType, eventsUs a Long microsecond axis") {
    val em = Tables.eventsMicros(s, sf)
    assert(em.schema("ts").dataType == TimestampType,
      s"eventsMicros.ts is ${em.schema("ts").dataType}, want TimestampType")
    val eu = Tables.eventsUs(s, sf)
    assert(eu.schema("us").dataType == LongType)
    // the us axis and the ts column agree (unix_micros is the definition)
    val bad = eu.filter(org.apache.spark.sql.functions.expr("unix_micros(ts) <> us")).count()
    assert(bad == 0L, s"$bad rows where us != unix_micros(ts)")
  }
}
