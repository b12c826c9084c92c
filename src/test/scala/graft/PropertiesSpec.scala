package graft

import graft.etl.Scd
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DateType
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §5.3 property tests over generated micro-data: window/aggregate
  * consistency, set-op arithmetic, join partitioning, SCD2 invariants. */
class PropertiesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // scalatestplus bridge is not in the offline cache: drive ScalaCheck
  // generators directly with fixed seeds (deterministic across runs)
  private def forAll[A](g: Gen[A], n: Int = 10)(body: A => Unit): Unit =
    (1 to n).foreach(i => body(g.pureApply(Gen.Parameters.default, Seed(i.toLong))))
  private def forAll2[A, B](ga: Gen[A], gb: Gen[B], n: Int = 10)(body: (A, B) => Unit): Unit =
    (1 to n).foreach { i =>
      body(ga.pureApply(Gen.Parameters.default, Seed(i.toLong)),
        gb.pureApply(Gen.Parameters.default, Seed(i.toLong + 1000)))
    }

  private val rows: Gen[List[(String, Int, Double)]] = for {
    n <- Gen.choose(1, 40)
    l <- Gen.listOfN(n, for {
      k <- Gen.oneOf("k1", "k2", "k3")
      ts <- Gen.choose(0, 1000)
      v <- Gen.choose(-100, 100).map(_ / 4.0)
    } yield (k, ts, v))
  } yield l

  test("running total's last value per key equals the group sum") {
    forAll(rows) { data =>
      val df = data.zipWithIndex.map { case ((k, ts, v), i) => (k, ts, v, i) }
        .toDF("k", "ts", "v", "uid")
      val w = Window.partitionBy($"k").orderBy($"ts", $"uid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val lastRunning = df.withColumn("run", sum($"v").over(w))
        .withColumn("rn", row_number().over(
          Window.partitionBy($"k").orderBy($"ts".desc, $"uid".desc)))
        .filter($"rn" === 1).select($"k", $"run")
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val groupSum = df.groupBy($"k").agg(sum($"v")).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(lastRunning.keySet == groupSum.keySet)
      lastRunning.foreach { case (k, v) => assert(math.abs(v - groupSum(k)) < 1e-9) }
    }
  }

  test("unionByName row count = a + b; intersect/except partition the left set") {
    forAll2(rows, rows) { (d1, d2) =>
      val a = d1.toDF("k", "ts", "v")
      val b = d2.toDF("k", "ts", "v")
      assert(a.unionByName(b).count() == a.count() + b.count())
      val ka = a.select("k").distinct()
      val kb = b.select("k").distinct()
      val inter = ka.intersect(kb).count()
      val except = ka.except(kb).count()
      assert(inter + except == ka.count())
    }
  }

  test("semi + anti join partition the left side") {
    forAll2(rows, rows) { (d1, d2) =>
      val a = d1.toDF("k", "ts", "v")
      val b = d2.toDF("k", "ts", "v")
      val semi = a.join(b.select("k").distinct(), Seq("k"), "left_semi").count()
      val anti = a.join(b.select("k").distinct(), Seq("k"), "left_anti").count()
      assert(semi + anti == a.count())
    }
  }

  test("SCD2 invariants: exactly one current row per key; closed rows end at eff") {
    val deltaGen = for {
      changed <- Gen.someOf(1L to 6L)
      added <- Gen.someOf(101L to 104L)
    } yield (changed.toList, added.toList)
    forAll(deltaGen) { case (changed, added) =>
      val master = (1L to 6L).map(bk => (bk, bk * 10.0, "s")).toDF("bk", "bal", "seg")
        .withColumn("valid_from", lit("2020-01-01").cast(DateType))
        .withColumn("valid_to", lit(null).cast(DateType))
        .withColumn("is_current", lit(1))
      val delta = (changed.map(bk => (bk, -1.0, "s")) ++ added.map(bk => (bk, 1.0, "s")))
        .toDF("bk", "bal", "seg")
      val out = Scd.scd2Load(master, delta, Seq("bal", "seg"), "2024-06-01")
      val cur = out.filter($"is_current" === 1).groupBy($"bk").count().collect()
      assert(cur.forall(_.getLong(1) == 1))
      assert(cur.length == 6 + added.size)  // every key has exactly one current row
      val closed = out.filter($"is_current" === 0).collect()
      assert(closed.length == changed.size)
      assert(closed.forall(_.getDate(4).toString == "2024-06-01"))
    }
  }

  test("SCD2 is idempotent: re-applying the same delta is a no-op") {
    val deltaGen = for {
      changed <- Gen.someOf(1L to 6L)
      added <- Gen.someOf(101L to 104L)
    } yield (changed.toList, added.toList)
    forAll(deltaGen, n = 5) { case (changed, added) =>
      val master = (1L to 6L).map(bk => (bk, bk * 10.0, "s")).toDF("bk", "bal", "seg")
        .withColumn("valid_from", lit("2020-01-01").cast(DateType))
        .withColumn("valid_to", lit(null).cast(DateType))
        .withColumn("is_current", lit(1))
      val delta = (changed.map(bk => (bk, -1.0, "s")) ++ added.map(bk => (bk, 1.0, "s")))
        .toDF("bk", "bal", "seg")
      def canon(df: org.apache.spark.sql.DataFrame) = df
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2),
          r.getDate(3), Option(r.getDate(4)).map(_.toString), r.getInt(5))).sortBy(x => (x._1, x._4.toString))
      val once = Scd.scd2Load(master, delta, Seq("bal", "seg"), "2024-06-01")
      val twice = Scd.scd2Load(once, delta, Seq("bal", "seg"), "2024-09-01")
      assert(canon(once).toSeq == canon(twice).toSeq)  // all values already current
    }
  }

  test("surrogate keys are invariant to input row order and partitioning") {
    val data = (1L to 200L).map(k => (k * 7 % 211, s"n$k"))  // shuffled unique keys
    val base = data.toDF("k", "name")
    def assign(df: org.apache.spark.sql.DataFrame) =
      graft.etl.SurrogateKey.assign(df, Seq(col("k").asc_nulls_first))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val a = assign(base)
    val b = assign(base.orderBy(rand(42)))        // different input order
    val c = assign(base.repartition(17, col("name")))  // different partitioning
    assert(a == b && a == c)
    assert(a.map(_._1) == (1L to 200L))
    assert(a.map(_._2) == a.map(_._2).sorted)     // sk follows key order
  }

  test("jaccard_sim is symmetric and 1.0 on self") {
    graft.functions.GraftFunctions.register(spark)
    val words: Gen[List[String]] = Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d", "e"))
    forAll2(words, words) { (w1, w2) =>
      val df = Seq((w1, w2)).toDF("x", "y")
      val r = df.select(
        expr("jaccard_sim(x, y)"), expr("jaccard_sim(y, x)"), expr("jaccard_sim(x, x)")).head()
      assert(r.getDouble(0) == r.getDouble(1))
      assert(r.getDouble(2) == 1.0)
    }
  }
}
