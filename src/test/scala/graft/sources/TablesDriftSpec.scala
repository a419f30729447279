package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.types._

/** Schema-drift canary for the driver-generated testdata.
  *
  * The driver regenerates `/root/testdata` between rounds, and a physical
  * layout change (e.g. `events.ts` flipping parquet TIMESTAMP(NANOS) →
  * TIMESTAMP(MICROS)) once silently zeroed 19 oracle queries because the
  * loader assumed one layout. This spec opens every table through the
  * `Tables` loaders and asserts the LOADED dtypes the query registry
  * relies on — so any re-drift fails `sbt test` with a named column, not
  * a downstream analysis exception at driver-verify time.
  */
class TablesDriftSpec extends SparkSpec {

  private val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

  private def assertCols(name: String, df: org.apache.spark.sql.DataFrame,
                         expected: (String, DataType)*): Unit = {
    val got = df.schema.map(f => f.name -> f.dataType).toMap
    expected.foreach { case (col, dt) =>
      assert(got.contains(col), s"$name: column '$col' missing (have: ${got.keys.mkString(", ")})")
      val actual = got(col)
      val ok = (dt, actual) match {
        // either timestamp flavor is fine once loaded — queries compare and
        // window over it, they don't depend on the zone semantics
        case (TimestampType, TimestampType | TimestampNTZType) => true
        case _ => actual == dt
      }
      assert(ok, s"$name.$col: expected $dt, loaded as $actual — testdata drifted; fix the loader in Tables.scala")
    }
  }

  test("all ten testdata tables load with the dtypes the query registry assumes") {
    val t = Tables(spark, dir)
    assertCols("region", t.region, "r_regionkey" -> IntegerType, "r_name" -> StringType)
    assertCols("nation", t.nation,
      "n_nationkey" -> IntegerType, "n_name" -> StringType, "n_regionkey" -> IntegerType)
    assertCols("customer", t.customer,
      "c_custkey" -> LongType, "c_name" -> StringType, "c_nationkey" -> IntegerType,
      "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType)
    assertCols("supplier", t.supplier,
      "s_suppkey" -> LongType, "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType)
    assertCols("part", t.part,
      "p_partkey" -> LongType, "p_brand" -> StringType, "p_size" -> IntegerType,
      "p_retailprice" -> DoubleType)
    assertCols("orders", t.orders,
      "o_orderkey" -> LongType, "o_custkey" -> LongType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampType, "o_orderpriority" -> StringType)
    assertCols("lineitem", t.lineitem,
      "l_orderkey" -> LongType, "l_partkey" -> LongType, "l_suppkey" -> LongType,
      "l_linenumber" -> IntegerType, "l_quantity" -> DoubleType,
      "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType,
      "l_returnflag" -> StringType, "l_shipdate" -> TimestampType)
    // events.ts is the column that drifted: the loader must normalize any
    // physical layout (nanos-as-long or micros) to a timestamp
    assertCols("events", t.events,
      "event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType)
    assertCols("documents", t.documents,
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType)
    assertCols("embeddings", t.embeddings,
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType), "label" -> IntegerType)
    // and the events timestamps must be sane epoch values, not corrupted by
    // a wrong-unit conversion (nanos read as micros would land in year ~56k)
    val yr = t.events.selectExpr("min(year(ts)) AS lo", "max(year(ts)) AS hi").head()
    assert(yr.getInt(0) >= 1990 && yr.getInt(1) <= 2100,
      s"events.ts years [${yr.getInt(0)}, ${yr.getInt(1)}] out of sane range — unit conversion wrong in Tables.events")
  }
}
