package graft

import graft.sources.Ingest
import org.apache.spark.sql.functions._
import java.util.Properties

/** Real JDBC roundtrip against embedded Derby (ships with Spark) —
  * upgrades the S4/S7 reference surface (warehouse loads, scripts
  * 04:74-78 / 05:64-68) from API-only to exercised: overwrite write,
  * full-table read, and the partitioned parallel read the reference's
  * config explicitly forgoes.
  */
class JdbcSpec extends SparkSuite {

  private val url = "jdbc:derby:/tmp/graft_derby_db;create=true"
  private lazy val props = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }
  private lazy val dim = Tables.orders(spark, sf0001)
    .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    .limit(500)

  test("jdbc overwrite write + full-table read roundtrips") {
    Ingest.writeJdbc(dim, url, "orders_dw", props)
    val back = Ingest.jdbcTable(spark, url, "orders_dw", props)
    assert(back.count() == dim.count())
    assert(back.agg(sum(col("o_totalprice").cast("decimal(18,2)"))).head() ==
      dim.agg(sum(col("o_totalprice").cast("decimal(18,2)"))).head())
  }

  test("jdbc partitioned read strides the table across parallel connections") {
    val bounds = dim.agg(min("o_orderkey"), max("o_orderkey")).head()
    val back = Ingest.jdbcPartitioned(spark, url, "orders_dw", "o_orderkey",
      bounds.getLong(0), bounds.getLong(1), 4, props)
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == dim.count())
  }
}
