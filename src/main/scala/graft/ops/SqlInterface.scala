package graft.ops

import graft.{Q, Tables}

/** Pure-SQL entry point: the engine's tables registered as temp views and
  * queried with `spark.sql(...)`. The SQL string is written in the
  * dialect subset common to Spark SQL and DuckDB, so the ORACLE IS THE
  * QUERY — both engines parse and run the identical text, which checks
  * the SQL front-end end to end (parser → analyzer → optimizer), not
  * just the DataFrame API.
  */
object SqlInterface {

  private val CommonSql =
    """SELECT n_name,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_orders,
      |  COUNT(DISTINCT o_custkey) AS n_customers
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  val sqlInterface = Q("q59_sql_interface", CommonSql) { (s, d) =>
    Tables.orders(s, d).createOrReplaceTempView("orders")
    Tables.customer(s, d).createOrReplaceTempView("customer")
    Tables.nation(s, d).createOrReplaceTempView("nation")
    s.sql(CommonSql)
  }

  val specs: Seq[Q] = Seq(sqlInterface)
}
