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
}
