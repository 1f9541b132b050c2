package graft

import org.apache.spark.sql.types._

/** Pins the fixture-parquet contract from `FIXTURES.md`.
  *
  * Round 6 lost 17 queries silently when the driver regenerated the fixtures
  * with a different `events.ts` physical type; this spec turns the next
  * schema drift into one pointed failure naming the table and column.
  *
  * `events.ts` is special-cased: the raw file may carry either timestamp
  * generation (NANOS read as Long under the legacy conf, or MICROS/NTZ), but
  * the `Tables.events` loader must always surface a session-TZ timestamp.
  */
class FixtureSchemaSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region"   -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation"   -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
                      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
                      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
                      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
                      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part"     -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
                      "p_brand" -> StringType, "p_type" -> StringType,
                      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders"   -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
                      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
                      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
                      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
                      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
                      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
                      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
                      "l_shipdate" -> TimestampNTZType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
                       "lang" -> StringType, "source" -> StringType,
                       "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
                        "embedding" -> ArrayType(FloatType, containsNull = true),
                        "label" -> IntegerType)
  )

  for ((name, cols) <- expected.toSeq.sortBy(_._1)) {
    test(s"$name.parquet matches the FIXTURES.md contract") {
      val schema = Tables.table(spark, dir, name).schema
      assert(schema.fields.map(_.name).toSeq == cols.map(_._1),
        s"$name column names drifted")
      for ((colName, tpe) <- cols)
        assert(schema(colName).dataType == tpe,
          s"$name.$colName: expected $tpe, fixture has ${schema(colName).dataType}")
    }
  }

  test("events.parquet columns + ts arrives in a generation the loader handles") {
    val schema = Tables.table(spark, dir, "events").schema
    assert(schema.fields.map(_.name).toSeq ==
      Seq("event_id", "ts", "user_id", "event_type", "value", "props"))
    val tsType = schema("ts").dataType
    assert(Set[DataType](LongType, TimestampNTZType, TimestampType).contains(tsType),
      s"events.ts: new fixture generation with type $tsType — teach Tables.events about it")
    assert(schema("event_id").dataType == LongType)
    assert(schema("user_id").dataType == LongType)
    assert(schema("event_type").dataType == StringType)
    assert(schema("value").dataType == DoubleType)
    assert(schema("props").dataType == StringType)
  }

  test("Tables.events always surfaces ts as a session-TZ timestamp") {
    val loaded = Tables.events(spark, dir)
    assert(loaded.schema("ts").dataType == TimestampType)
    // The instant must be the documented fixture epoch start (2024-01-01, UTC
    // session TZ) — a wrong unit conversion lands decades away.
    val minTs = loaded.agg(org.apache.spark.sql.functions.min("ts"))
      .collect()(0).getTimestamp(0)
    assert(minTs.toInstant.toString.startsWith("2024-01-01"),
      s"events.ts min is $minTs — unit/zone conversion wrong for this fixture generation")
  }
}
