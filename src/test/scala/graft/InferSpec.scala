package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.schema.{Infer, Redshift, Snowflake}

/** Port of the reference's type-inference expectations
  * (tests/test_utility.py:288-516 in /root/reference). */
class InferSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import scala.jdk.CollectionConverters._

  private def df(cols: Map[String, Seq[String]]) = {
    val names = cols.keys.toSeq
    val n = cols.values.map(_.size).max
    val rows = (0 until n).map(i => Row(names.map(c => cols(c).lift(i).flatMap(Option(_)).orNull): _*))
    spark.createDataFrame(rows.asJava,
      StructType(names.map(StructField(_, StringType, nullable = true))))
  }

  test("int strings infer as LongType") {
    val s = Infer.inferSchema(df(Map("a" -> Seq("1", "42", "-7"))))
    assert(s("a").dataType == LongType)
  }

  test("float and decimal strings collapse to DoubleType (reference Decimal→float)") {
    val s = Infer.inferSchema(df(Map(
      "f" -> Seq("1.5", "2.25"), "d" -> Seq("12.340000000000001", "0.1"))))
    assert(s("f").dataType == DoubleType && s("d").dataType == DoubleType)
  }

  test("iso dates infer as DateType; with time component as TimestampType") {
    val s = Infer.inferSchema(df(Map(
      "d" -> Seq("2022-01-03", "1999-12-31"),
      "ts" -> Seq("2022-01-03 10:00:00", "2022-01-03T23:59:59.123"))))
    assert(s("d").dataType == DateType && s("ts").dataType == TimestampType)
  }

  test("booleans infer as BooleanType; mixed falls back to varchar") {
    val s = Infer.inferSchema(df(Map(
      "b" -> Seq("true", "False"), "m" -> Seq("true", "7"))))
    assert(s("b").dataType == BooleanType && s("m").dataType == StringType)
  }

  test("all-NULL column infers varchar (reference utility.py:353-355)") {
    val s = Infer.inferSchema(df(Map("g" -> Seq(null, null))))
    assert(s("g").dataType == StringType)
  }

  test("flavored date rules: MM/dd/yyyy is date for Redshift, varchar for Snowflake") {
    val d = df(Map("x" -> Seq("02/14/2021", "12/01/2020")))
    assert(Infer.inferSchema(d, Redshift)("x").dataType == DateType)
    assert(Infer.inferSchema(d, Snowflake)("x").dataType == StringType)
  }

  test("typed columns map through the lattice (int32→long, float→double, decimal→double)") {
    val src = spark.createDataFrame(
      Seq(Row(1, 1.5f, new java.math.BigDecimal("2.5"))).asJava,
      StructType(Seq(
        StructField("i", IntegerType), StructField("f", FloatType),
        StructField("dec", DecimalType(10, 2)))))
    val s = Infer.inferSchema(src)
    assert(s("i").dataType == LongType)
    assert(s("f").dataType == DoubleType)
    assert(s("dec").dataType == DoubleType)
    assert(Infer.inferSchema(src, decimalMode = true)("dec").dataType == DecimalType(10, 2))
  }

  test("applySchema casts strings and parses multi-format dates permissively") {
    val d = df(Map("d" -> Seq("2022-01-03", "01/15/2022", "garbage"), "n" -> Seq("1", "x", "3")))
    val out = Infer.applySchema(d, StructType(Seq(
      StructField("d", DateType), StructField("n", LongType)))).collect()
    assert(out(0).getDate(0).toString == "2022-01-03")
    assert(out(1).getDate(0).toString == "2022-01-15")
    assert(out(2).isNullAt(0)) // unparseable → NULL (DATEFORMAT auto parity)
    assert(out(1).isNullAt(1))
    assert(out(2).getLong(1) == 3L)
  }

  test("toDDL renders CREATE TABLE") {
    val ddl = Infer.toDDL("t", StructType(Seq(StructField("a", LongType))))
    assert(ddl.startsWith("CREATE TABLE t (") && ddl.contains("BIGINT"))
  }

  test("inference roundtrip: typed df → csv strings → inferred schema matches") {
    val li = spark.read.parquet(s"${TestSession.sf}/orders.parquet")
      .select("o_orderkey", "o_totalprice", "o_orderstatus").limit(100)
    val strings = li.select(
      org.apache.spark.sql.functions.col("o_orderkey").cast("string"),
      org.apache.spark.sql.functions.col("o_totalprice").cast("string"),
      org.apache.spark.sql.functions.col("o_orderstatus"))
    val s = Infer.inferSchema(strings)
    assert(s("o_orderkey").dataType == LongType)
    assert(s("o_totalprice").dataType == DoubleType)
    assert(s("o_orderstatus").dataType == StringType)
  }
}
