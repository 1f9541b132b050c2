package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks

class MoneySpec extends SparkSpec with TableDrivenPropertyChecks {
  import spark.implicits._

  test("sumMoney is exact where double summation would drift") {
    // 0.1 + 0.2 in doubles is 0.30000000000000004; in cents it's exactly 0.3
    val df = Seq(0.1, 0.2).toDF("x")
    val got = df.agg(Money.sumMoney(col("x"))).as[Double].head()
    assert(got == 0.3)
  }

  test("sumMoney is partition-order independent") {
    val vals = (1 to 1000).map(i => i * 0.01 + 0.001)
    val a = vals.toDF("x").repartition(1).agg(Money.sumMoney(col("x"))).as[Double].head()
    val b = vals.toDF("x").repartition(7).agg(Money.sumMoney(col("x"))).as[Double].head()
    assert(a == b)
  }

  test("sumMoneyTimesRate matches exact rational arithmetic") {
    // 100.00 * (1 - 0.05) = 95.00 exactly
    val df = Seq((100.0, 0.05), (10.10, 0.10)).toDF("price", "disc")
    val got = df.agg(Money.sumMoneyTimesRate(col("price"), lit(1.0) - col("disc")))
      .as[Double].head()
    assert(got == 95.0 + 9.09)
  }
}
