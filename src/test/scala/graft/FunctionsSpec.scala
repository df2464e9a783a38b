package graft

import graft.functions.{GraftFunctions, SortedIntersectCount}
import org.apache.spark.sql.functions._

/** Native Catalyst expression: sorted_intersect_count — parity with the
  * builtin size(array_intersect(...)) on random sorted inputs, null
  * handling, SQL registration, and codegen execution.
  */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("matches size(array_intersect) on random sorted arrays") {
    GraftFunctions.ensureRegistered(spark)
    val rnd = new scala.util.Random(7)
    val rows = (1 to 500).map { i =>
      def arr() = (0 until rnd.nextInt(40))
        .map(_ => rnd.nextInt(60).toLong).distinct.sorted.toArray
      (i.toLong, arr(), arr())
    }
    val df = rows.toDF("id", "a", "b")
    val bad = df.select(col("id"),
        call_function("sorted_intersect_count", col("a"), col("b")).as("got"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("want"))
      .filter(col("got") =!= col("want"))
    assert(bad.count() === 0)
  }

  test("null in, null out; empty arrays count 0; SQL-callable") {
    GraftFunctions.ensureRegistered(spark)
    val r = spark.sql(
      """SELECT sorted_intersect_count(array(1L,2L,3L), array(2L,3L,9L)) a,
        |       sorted_intersect_count(array(1L,2L), CAST(array() AS ARRAY<LONG>)) b,
        |       sorted_intersect_count(CAST(NULL AS ARRAY<LONG>), array(1L)) c
        |""".stripMargin).head()
    assert(r.getLong(0) === 2L)
    assert(r.getLong(1) === 0L)
    assert(r.isNullAt(2))
  }

  test("interpreted eval agrees with codegen path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val a = Literal.create(new GenericArrayData(Array(1L, 3L, 5L, 7L)),
      ArrayType(LongType))
    val b = Literal.create(new GenericArrayData(Array(3L, 4L, 5L, 6L, 7L)),
      ArrayType(LongType))
    assert(SortedIntersectCount(a, b).eval(null) === 3L)
  }

  test("graft_dot is bit-identical to the composed zip_with fold") {
    GraftFunctions.ensureRegistered(spark)
    val rnd = new scala.util.Random(11)
    val rows = (1 to 300).map { i =>
      val d = 64
      (i.toLong, Array.fill(d)(rnd.nextFloat() * 2f - 1f),
        Array.fill(d)(rnd.nextFloat() * 2f - 1f))
    }
    val df = rows.toDF("id", "a", "b")
    // bitwise comparison: raw IEEE bits, not an epsilon
    val both = df.select(
        call_function("graft_dot", col("a"), col("b")).as("got"),
        aggregate(zip_with(col("a"), col("b"),
            (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, v) => acc + v).as("want"))
      .collect()
    assert(both.length === 300)
    both.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("graft_dot handles mixed float/double sides, nulls, SQL surface") {
    GraftFunctions.ensureRegistered(spark)
    val r = spark.sql(
      """SELECT graft_dot(array(1.0F, 2.0F, 3.0F),
        |                 array(2.0D, 0.5D, 1.0D)) a,
        |       graft_dot(CAST(NULL AS ARRAY<FLOAT>), array(1.0F)) b,
        |       graft_dot(CAST(array() AS ARRAY<DOUBLE>),
        |                 CAST(array() AS ARRAY<DOUBLE>)) c
        |""".stripMargin).head()
    assert(r.getDouble(0) === 6.0)
    assert(r.isNullAt(1))
    assert(r.getDouble(2) === 0.0)
  }

  test("graft_dot returns NULL on mismatched array lengths (both paths)") {
    GraftFunctions.ensureRegistered(spark)
    // codegen path via SQL
    val viaSql = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(1.0D, 2.0D, 3.0D)) x")
      .head()
    assert(viaSql.isNullAt(0),
      "dimension mismatch must surface as NULL (the zip_with fold's " +
        "observable behavior), never a truncated partial dot")
    // interpreted path
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val a = Literal.create(new GenericArrayData(Array(1.0, 2.0)),
      ArrayType(DoubleType))
    val b = Literal.create(new GenericArrayData(Array(1.0, 2.0, 3.0)),
      ArrayType(DoubleType))
    assert(graft.functions.DotProduct(a, b).eval(null) == null)
  }

  test("graft_dot interpreted eval matches codegen result") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
    val a = Literal.create(new GenericArrayData(Array(1.5f, -2.0f, 0.25f)),
      ArrayType(FloatType))
    val b = Literal.create(new GenericArrayData(Array(2.0, 3.0, 4.0)),
      ArrayType(DoubleType))
    val interp = graft.functions.DotProduct(a, b).eval(null)
      .asInstanceOf[Double]
    val viaDf = Seq((Array(1.5f, -2.0f, 0.25f), Array(2.0, 3.0, 4.0)))
      .toDF("a", "b")
      .select(call_function("graft_dot", col("a"), col("b")))
      .head().getDouble(0)
    assert(interp === viaDf)
    assert(interp === 1.5 * 2.0 + -2.0 * 3.0 + 0.25 * 4.0)
  }

  test("Ann.dot routes through the fused expression unchanged in value") {
    val rows = Seq(
      (1L, Array(0.5f, 0.5f, 0.5f), Array(1.0f, 2.0f, 3.0f)),
      (2L, Array(-1.0f, 0.0f, 2.0f), Array(0.25f, -4.0f, 0.125f)))
    val df = rows.toDF("id", "a", "b")
    val got = df.select(col("id"),
        graft.sim.Ann.dot(col("a"), col("b")).as("d"))
      .orderBy("id").collect().map(_.getDouble(1))
    assert(got(0) === 0.5 * 1.0 + 0.5 * 2.0 + 0.5 * 3.0)
    assert(got(1) === -1.0 * 0.25 + 0.0 * -4.0 + 2.0 * 0.125)
  }
}
