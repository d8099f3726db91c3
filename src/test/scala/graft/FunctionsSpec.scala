package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** graft_vec_dot: the codegen'd dot product must agree exactly with the
  * higher-order-lambda formulation it replaced, across both the codegen
  * path (top-level projection) and the interpreted path (inside a
  * higher-order lambda, where expressions evaluate via eval()). */
class FunctionsSpec extends AnyFunSuite {
  import TestSession._

  private val lambdaDot =
    "aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"

  test("graft_vec_dot agrees with the lambda dot on random vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 500).map { _ =>
      val n = 1 + rnd.nextInt(96)
      (Seq.fill(n)(rnd.nextLong() % 1000L), Seq.fill(n)(rnd.nextLong() % 1000L))
    }
    val df = rows.toDF("a", "b")
      .selectExpr(s"graft_vec_dot(a, b) AS fast", s"$lambdaDot AS slow")
    assert(df.filter(col("fast") =!= col("slow")).count() == 0)
  }

  test("graft_vec_dot null and empty semantics") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1L, 2L)), Some(Seq(3L, 4L))),   // 11
      (None, Some(Seq(1L))),                    // null
      (Some(Seq(1L)), None),                    // null
      (Some(Seq.empty[Long]), Some(Seq.empty[Long]))) // 0
      .toDF("a", "b")
      .selectExpr("graft_vec_dot(a, b) AS d")
    val got = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got.toSeq == Seq(Some(11L), None, None, Some(0L)))
  }

  test("graft_vec_dot works inside a higher-order lambda (interpreted eval)") {
    import spark.implicits._
    val df = Seq((Seq(Seq(1L, 2L), Seq(3L, 4L)), Seq(10L, 20L))).toDF("vs", "q")
      .selectExpr("transform(vs, v -> graft_vec_dot(v, q)) AS ds")
    assert(df.collect().head.getSeq[Long](0) == Seq(50L, 110L))
  }

  test("graft_lsh_bits agrees with the lambda sign-projection") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // sparse signed-dim planes in the VectorOps encoding (+d ⇒ +q[d])
    val planes = (0 until 48).map { h =>
      val r = new scala.util.Random(9000 + h)
      r.shuffle((1 to 64).toList).take(16).sorted.map(d => if (r.nextBoolean()) d else -d)
    }
    val planesLit = planes.map(_.mkString("array(", ", ", ")"))
      .mkString("array(", ", ", ")")
    val rows = (1 to 200).map(_ => Seq.fill(64)(rnd.nextLong() % 2000L))
    val df = rows.toDF("q").selectExpr(
      s"graft_lsh_bits(q, $planesLit) AS fast",
      s"""transform($planesLit, p -> CASE WHEN aggregate(p, 0L, (acc, t) ->
         |  acc + (CASE WHEN t > 0 THEN element_at(q, t) ELSE -element_at(q, -t) END)) >= 0
         |  THEN 1 ELSE 0 END) AS slow""".stripMargin)
    assert(df.filter(col("fast") =!= col("slow")).count() == 0)
  }

  private val lambdaInt8 =
    """transform(e, x -> cast(floor(x * 127.0d / greatest(array_max(
      |  transform(e, y -> abs(y))), 1e-30d) + 0.5d) as bigint))""".stripMargin

  test("graft_int8_code agrees with the lambda quantization (float and double)") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = (1 to 300).map { _ =>
      Seq.fill(64)((rnd.nextGaussian() * rnd.nextInt(3)).toFloat)
    } :+ Seq.fill(64)(0.0f) :+ Seq.fill(8)(1e-31f)
    val f = rows.toDF("emb")
      .selectExpr("graft_int8_code(emb) AS fast",
        "transform(emb, x -> cast(x as double)) AS e")
      .selectExpr("fast", "e", s"$lambdaInt8 AS slow")
    assert(f.filter(col("fast") =!= col("slow")).count() == 0)
    val d = rows.map(_.map(_.toDouble)).toDF("e")
      .selectExpr(s"graft_int8_code(e) AS fast", "e")
      .selectExpr("fast", s"$lambdaInt8 AS slow")
    assert(d.filter(col("fast") =!= col("slow")).count() == 0)
  }

  test("graft_int8_code null and empty semantics") {
    import spark.implicits._
    val df = Seq(Some(Seq(1.0f, -2.0f)), None, Some(Seq.empty[Float]))
      .toDF("emb").selectExpr("graft_int8_code(emb) AS c")
    val got = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getSeq[Long](0)))
    assert(got.toSeq == Seq(Some(Seq(64L, -127L)), None, Some(Seq.empty[Long])))
  }

  test("graft_int8_code propagates null ELEMENTS like the lambda (ADVICE r7)") {
    import spark.implicits._
    // scale must come from the non-null max (4.0 here, not the null slot),
    // and the null element must survive as a null code — matching
    // array_max's null-skipping + transform's null propagation exactly.
    val rows: Seq[Seq[Option[Double]]] = Seq(
      Seq(Some(1.0), None, Some(-4.0)),
      Seq(None, None),
      Seq(Some(2.0), Some(-2.0)))
    val df = rows.toDF("e")
      .selectExpr("graft_int8_code(e) AS fast", s"$lambdaInt8 AS slow")
    assert(df.filter(!(col("fast") <=> col("slow"))).count() == 0)
    val first = df.collect()(0)
    assert(first.getSeq[Any](0) == Seq(32L, null, -127L))
  }

  // the declarative t11 signature chain graft_minhash16 fuses
  private val lambdaMinhash =
    """transform(sequence(0, 15), j -> array_min(zip_with(
      |  transform(transform(sh, x -> md5(x)),
      |            m -> cast(conv(substring(m, 1, 14), 16, 10) as bigint)),
      |  transform(transform(sh, x -> md5(x)),
      |            m -> cast(conv(substring(m, 15, 14), 16, 10) as bigint)),
      |  (x, y) -> x + j * y)))""".stripMargin

  test("graft_minhash16 agrees with the md5/conv/zip_with lambda chain") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val words = Vector("alpha", "beta", "gamma", "delta", "x", "committee",
      "zh_word", "émoji", "0", "", "long token with spaces inside")
    val rows = (1 to 300).map { _ =>
      Seq.fill(1 + rnd.nextInt(40))(words(rnd.nextInt(words.length)))
    }
    val df = rows.toDF("sh")
      .selectExpr("graft_minhash16(sh) AS fast", s"$lambdaMinhash AS slow")
    assert(df.filter(!(col("fast") <=> col("slow"))).count() == 0)
  }

  test("graft_ngrams agrees with the transform/concat lambda chains (t11 n=3, t17 n=5)") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val words = Vector("alpha", "beta", "gamma", "delta", "x", "committee",
      "zh_word", "émoji", "0", "", "tok")
    // arrays of length >= 5 so both chains' element_at windows are valid
    val rows = (1 to 300).map { _ =>
      Seq.fill(5 + rnd.nextInt(40))(words(rnd.nextInt(words.length)))
    }
    val df = rows.toDF("tk").selectExpr(
      "graft_ngrams(tk, 3, true) AS f3",
      """array_distinct(transform(sequence(1, size(tk) - 2),
        |  i -> concat(element_at(tk, i), ' ', element_at(tk, i + 1),
        |              ' ', element_at(tk, i + 2)))) AS s3""".stripMargin,
      "graft_ngrams(tk, 5, true) AS f5",
      """array_distinct(transform(sequence(1, size(tk) - 4),
        |  i -> concat_ws(' ', element_at(tk, i), element_at(tk, i + 1),
        |    element_at(tk, i + 2), element_at(tk, i + 3),
        |    element_at(tk, i + 4)))) AS s5""".stripMargin,
      "graft_ngrams(tk, 2, false) AS f2",
      """transform(sequence(1, size(tk) - 1),
        |  i -> concat(element_at(tk, i), ' ', element_at(tk, i + 1))) AS s2""".stripMargin)
    assert(df.filter(!(col("f3") <=> col("s3"))).count() == 0)
    assert(df.filter(!(col("f5") <=> col("s5"))).count() == 0)
    assert(df.filter(!(col("f2") <=> col("s2"))).count() == 0)
  }

  test("graft_ngrams edge semantics: short input, null array, null tokens") {
    import spark.implicits._
    val df = Seq(
        (1, Some(Seq("a", "b"))),          // shorter than the window
        (2, Some(Seq.empty[String])),
        (3, None),                          // null array → null (like transform)
        (4, Some(Seq("a", null, "c", "d"))) // null token skipped (concat_ws)
      ).toDF("id", "tk")
      .selectExpr("id", "graft_ngrams(tk, 3, true) AS g").orderBy("id")
    val rows = df.collect()
    // lambda chain would error via element_at(0) on short input; the
    // kernel returns [] (its callers filter size >= n first)
    assert(rows(0).getSeq[Any](1) == Seq.empty)
    assert(rows(1).getSeq[Any](1) == Seq.empty)
    assert(rows(2).isNullAt(1))
    // windows (a,null,c) → "a c" and (null,c,d) → "c d"
    assert(rows(3).getSeq[Any](1) == Seq("a c", "c d"))
  }

  test("graft_minhash16 null/empty semantics match array_min over nulls") {
    import spark.implicits._
    val df = Seq(
        (1, Some(Seq[String]("a", "b"))),
        (2, Some(Seq.empty[String])),
        (3, None),
        (4, Some(Seq[String](null, "a"))),
        (5, Some(Seq[String](null))))
      .toDF("id", "sh")
      .selectExpr("id", "graft_minhash16(sh) AS fast", s"$lambdaMinhash AS slow")
      .orderBy("id")
    // non-null inputs agree element-wise with the lambda chain
    assert(df.filter(col("sh").isNotNull && !(col("fast") <=> col("slow")))
      .count() == 0)
    val rows = df.collect()
    assert(rows(1).getSeq[Any](1) == Seq.fill(16)(null)) // empty → 16 nulls
    // a NULL shingle ARRAY returns null (standard null-safe expression
    // semantics; the composed lambda chain would give 16 nulls instead —
    // t11 never produces a null array, its filter guarantees ≥1 shingle)
    assert(rows(2).isNullAt(1))
    assert(rows(4).getSeq[Any](1) == Seq.fill(16)(null)) // all-null → 16 nulls
  }

  test("graft_topk: k smallest by struct order, ascending, partition-merge-safe") {
    // heap aggregate vs the window oracle, across a skewed repartition so
    // the partial heaps genuinely merge (every task holds every group)
    val df = spark.range(0, 2000).repartition(7)
      .selectExpr("id % 5 AS g", "md5(cast(id AS string)) AS h", "id")
    val got = df
      .groupBy(col("g"))
      .agg(expr("graft_topk(struct(h, id), 4)").as("t"))
      .selectExpr("g", "posexplode(t) AS (p, r)")
      .selectExpr("g", "p", "r.h AS h", "r.id AS id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .sortBy(x => (x._1, x._2)).toSeq
    val want = df
      .selectExpr("g", "h", "id",
        "row_number() OVER (PARTITION BY g ORDER BY h, id) AS rn")
      .filter(col("rn") <= 4)
      .collect().map(r => (r.getLong(0), r.getInt(3) - 1, r.getString(1), r.getLong(2)))
      .sortBy(x => (x._1, x._2)).toSeq
    assert(got == want)
    // k larger than the group: every row comes back, still ascending
    val small = spark.range(0, 3)
      .selectExpr("0 AS g", "struct(cast(id AS string) AS h, id) AS s")
      .groupBy(col("g")).agg(expr("graft_topk(s, 10)").as("t"))
      .selectExpr("size(t) AS n").collect().head.getInt(0)
    assert(small == 3)
  }
}
