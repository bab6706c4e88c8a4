package graft

import org.apache.spark.sql.functions._

/** Catalyst extension points: the cosine_sim SQL registration, the
  * redundant-round optimizer rule, and the as-of strategy (runtime path —
  * the builder-time GraftExtensions wires these same three objects via
  * SparkSessionExtensions; getOrCreate in a shared-JVM test suite cannot
  * exercise builder-time injection without tearing down every session). */
class ExtensionsSpec extends SparkSuite {

  test("cosine_sim is callable from SQL text after registration") {
    graft.functions.CosineSim.register(spark)
    val v = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS s")
      .head.getDouble(0)
    assert(math.abs(v - 1.0) < 1e-12)
  }

  test("minhash_sig is callable from SQL text; literal-typed k/width enforced") {
    graft.functions.MinHashSig.register(spark)
    val sql = spark.sql(
      "SELECT minhash_sig(array('a', 'b', 'c'), 4, 1) AS sig").head.getSeq[Long](0)
    // must agree with the Column API on the same input
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val api = Seq(Seq("a", "b", "c")).toDF("toks")
      .select(graft.functions.MinHashSig.minhash_sig(col("toks"), 4, 1))
      .head.getSeq[Long](0)
    assert(sql === api)
    val e = intercept[Exception](
      spark.sql("SELECT minhash_sig(array('a'), 1 + 3)").collect())
    assert(e.getMessage.contains("INT literal"), e.getMessage)
  }

  test("CollapseRedundantRound rewrites round(round(e,3),6) to round(e,3)") {
    val df = spark.sql("SELECT round(round(c, 3), 6) AS r FROM VALUES (1.2345678D) AS t(c)")
    val before = df.queryExecution.analyzed
    val after = graft.plans.CollapseRedundantRound(before)
    def countRounds(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Int = {
      var n = 0
      p.transformAllExpressions {
        case r: org.apache.spark.sql.catalyst.expressions.Round => n += 1; r
      }
      n
    }
    assert(countRounds(before) === 2)
    assert(countRounds(after) === 1)
    assert(df.head.getDouble(0) === 1.235) // semantics unchanged
  }

  test("CollapseRedundantRound keeps a genuinely tighter outer round") {
    val df = spark.sql("SELECT round(round(c, 6), 3) AS r FROM VALUES (1.2345678D) AS t(c)")
    val after = graft.plans.CollapseRedundantRound(df.queryExecution.analyzed)
    var n = 0
    after.transformAllExpressions {
      case r: org.apache.spark.sql.catalyst.expressions.Round => n += 1; r
    }
    assert(n === 2, "outer round(…,3) narrows the value and must stay")
  }

  test("as-of join null-extends null keys/timestamps (never matches them)") {
    import spark.implicits._
    val left = Seq((Some(1L), Some(10L)), (None, Some(10L)), (Some(1L), None))
      .toDF("k", "t")
    val right = Seq((Some(1L), Some(5L), 100L), (None, Some(5L), 101L))
      .toDF("k2", "t2", "id")
    val out = graft.plans.AsofJoinApi.asofJoin(left, right, "k", "k2", "t", "t2", "id")
      .select($"k", $"t", $"id").collect().map(_.toSeq).toSet
    assert(out === Set(
      Seq(1L, 10L, 100L),   // real match
      Seq(null, 10L, null), // null key never matches (even vs null-key right)
      Seq(1L, null, null))) // null ts never matches
  }

  test("as-of join rejects mismatched key/ts types at plan time") {
    import spark.implicits._
    val left = Seq((1, 10L)).toDF("k", "t")          // int key
    val right = Seq((1L, 5L, 100L)).toDF("k2", "t2", "id") // long key
    val e = intercept[IllegalArgumentException](
      graft.plans.AsofJoinApi.asofJoin(left, right, "k", "k2", "t", "t2", "id"))
    assert(e.getMessage.contains("key types must match"), e.getMessage)
  }

  test("GraftSession.registerTables exposes the full surface to plain SQL") {
    GraftSession.registerTables(spark, sf)
    graft.functions.CosineSim.register(spark)
    val n = spark.sql("SELECT count(1) FROM lineitem").head.getLong(0)
    assert(n > 0)
    // events view must be the ns-safe reader
    val ev = spark.sql("SELECT count(1) FROM events WHERE ts IS NOT NULL").head.getLong(0)
    assert(ev > 0)
    // cosine_sim over the registered embeddings view from SQL text
    val s = spark.sql(
      """SELECT round(cosine_sim(embedding, embedding), 9) AS s
         FROM embeddings LIMIT 1""").head.getDouble(0)
    assert(s === 1.0)
  }

  test("as-of strategy handles ties and empty right side") {
    import spark.implicits._
    val left = Seq((1L, 10L), (1L, 20L), (2L, 15L)).toDF("k", "t")
    val right = Seq((1L, 5L, 100L), (1L, 5L, 103L), (1L, 15L, 101L), (3L, 1L, 102L))
      .toDF("k2", "t2", "id")
    val out = graft.plans.AsofJoinApi.asofJoin(left, right, "k", "k2", "t", "t2", "id")
      .select($"k", $"t", $"id").collect().map(_.toSeq).toSet
    assert(out === Set(
      Seq(1L, 10L, 103L),   // tie on t2=5 → greatest id wins
      Seq(1L, 20L, 101L),   // latest strictly-before
      Seq(2L, 15L, null)))  // key with no right rows null-extends
  }
}
