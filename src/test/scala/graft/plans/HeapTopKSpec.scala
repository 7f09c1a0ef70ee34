package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class HeapTopKSpec extends SparkSpec {
  import spark.implicits._

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("g").orderBy(col("s").desc, col("id"))
    df.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
  }

  test("topKPerGroup equals row_number window exactly — ranks included") {
    val rnd = new scala.util.Random(19L)
    val rows = (0 until 5000).map { i =>
      (i.toLong, rnd.nextInt(40), math.floor(rnd.nextDouble() * 50) / 10.0)
    }
    // repeated scores force the id tiebreak; group 40 gets < k rows
    val df = (rows :+ (99999L, 40, 1.0)).toDF("id", "g", "s").repartition(7)
    val got = HeapTopK.topKPerGroup(df, Seq(col("g")),
        Seq(col("s").desc, col("id")), k = 5, rankCol = "rnk")
      .select("id", "g", "s", "rnk").as[(Long, Int, Double, Int)]
      .collect().toSet
    val want = windowTopK(df, 5)
      .select("id", "g", "s", "rnk").as[(Long, Int, Double, Int)]
      .collect().toSet
    assert(got === want)
    // the undersized group emitted its single row at rank 1
    assert(got.exists { case (id, g, _, r) => id == 99999L && g == 40 && r == 1 })
  }

  test("k larger than every group keeps all rows; k=1 keeps the argmax") {
    val df = Seq((1L, 0, 2.0), (2L, 0, 3.0), (3L, 1, 1.0)).toDF("id", "g", "s")
    val all = HeapTopK.topKPerGroup(df, Seq(col("g")),
      Seq(col("s").desc, col("id")), k = 10, rankCol = "r")
    assert(all.count() === 3)
    val top1 = HeapTopK.topKPerGroup(df, Seq(col("g")),
        Seq(col("s").desc, col("id")), k = 1, rankCol = "r")
      .select("id", "r").as[(Long, Int)].collect().toSet
    assert(top1 === Set((2L, 1), (3L, 1)))
  }

  test("null ordering matches the window's (desc => nulls last)") {
    val df = Seq((1L, 0, Some(2.0)), (2L, 0, None), (3L, 0, Some(5.0)),
      (4L, 0, None), (5L, 0, Some(1.0))).toDF("id", "g", "s")
    val got = HeapTopK.topKPerGroup(df, Seq(col("g")),
        Seq(col("s").desc, col("id")), k = 4, rankCol = "rnk")
      .select("id", "rnk").as[(Long, Int)].collect().toSet
    val want = windowTopK(df, 4)
      .select("id", "rnk").as[(Long, Int)].collect().toSet
    assert(got === want)
    assert(got === Set((3L, 1), (1L, 2), (5L, 3), (2L, 4)))
  }

  test("property: equals the window for random data, k, and group counts (heap growth path)") {
    val rnd = new scala.util.Random(1919L)
    for (trial <- 1 to 5) {
      val nGroups = 1 + rnd.nextInt(12)
      val k = 1 + rnd.nextInt(40) // > the 16-slot initial array → growth
      val rows = (0 until 800 + rnd.nextInt(800)).map { i =>
        (i.toLong, rnd.nextInt(nGroups), math.floor(rnd.nextDouble() * 30) / 10.0)
      }
      val df = rows.toDF("id", "g", "s").repartition(1 + rnd.nextInt(6))
      val got = HeapTopK.topKPerGroup(df, Seq(col("g")),
          Seq(col("s").desc, col("id")), k, rankCol = "rnk")
        .select("id", "g", "s", "rnk").as[(Long, Int, Double, Int)]
        .collect().toSet
      val want = windowTopK(df, k)
        .select("id", "g", "s", "rnk").as[(Long, Int, Double, Int)]
        .collect().toSet
      assert(got === want, s"trial $trial (groups=$nGroups k=$k)")
    }
  }

  test("retained-rows budget fails FAST with the sizing levers, not an OOM") {
    // adversarial cardinality: every row its own group (groups × k state),
    // under a deliberately tiny budget
    val df = (0 until 20000).map(i => (i.toLong, i, i.toDouble)).toDF("id", "g", "s")
      .repartition(2)
    spark.conf.set(HeapTopK.MaxRetainedBytesConf, (64 * 1024).toString)
    try {
      val e = intercept[org.apache.spark.SparkException] {
        HeapTopK.topKPerGroup(df, Seq(col("g")),
          Seq(col("s").desc, col("id")), k = 5, rankCol = "r").count()
      }
      val msg = String.valueOf(e.getMessage) + String.valueOf(e.getCause)
      assert(msg.contains("retained-rows budget exceeded"), msg.take(500))
      assert(msg.contains(HeapTopK.MaxRetainedBytesConf), msg.take(500))
    } finally spark.conf.unset(HeapTopK.MaxRetainedBytesConf)
    // same shape under the default budget: exact as ever
    val got = HeapTopK.topKPerGroup(df.where(col("g") < 50), Seq(col("g")),
      Seq(col("s").desc, col("id")), k = 5, rankCol = "r").count()
    assert(got === 50)
  }

  test("rank column name colliding with an input column is refused") {
    val df = Seq((1L, 0, 2.0)).toDF("id", "g", "s")
    intercept[IllegalArgumentException] {
      HeapTopK.topKPerGroup(df, Seq(col("g")), Seq(col("s").desc), 3, rankCol = "s")
    }
  }

  test("plan shape: partial pass narrow, one hash exchange on the group key, no sort of the input") {
    val df = (0 until 1000).map(i => (i.toLong, i % 8, (i * 37 % 101).toDouble))
      .toDF("id", "g", "s").repartition(5)
    val q = HeapTopK.topKPerGroup(df, Seq(col("g")),
      Seq(col("s").desc, col("id")), k = 3, rankCol = "rnk")
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("HeapTopKPerGroup"), p.take(2000))
    // exactly two heap passes: partial below the exchange, final above
    assert("HeapTopKPerGroup".r.findAllIn(p).size === 2, p.take(3000))
    assert(!p.contains("WindowGroupLimit") && !p.contains("Window "), p.take(3000))
    assert(!p.toLowerCase.contains("sort "), p.take(3000)) // sort-free is the point
    val _ = q.collect() // and it executes under AQE
  }
}
