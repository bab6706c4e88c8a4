package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fused single-pass MinHash signature: `minhash_sig(tokens, k, width)`
  * over an ArrayType(StringType) column, with whole-stage codegen.
  *
  * Semantics (bit-exact, for width = 1, with the SQL formulation it
  * replaces — `aggregate(transform(toks, t -> xxhash64(t)), MaxValue,
  * (acc, h) -> least(acc, xxhash64(h, seed)))` per seed):
  *   th_i  = xxh64(token_i, seed = 42)          -- one string hash per token
  *   s_i   = th_i                                (width = 1)
  *         | xxh64 chain over the width-window   (width > 1: hash-combined
  *           of th_i..th_{i+w-1}, seed = 42)      shingles, no string concat)
  *   out_j = min_i xxh64_int(j, xxh64_long(s_i, 42))   for j in 0..k-1
  * Null tokens hash like SQL `xxhash64(NULL)` (the untouched seed, 42).
  * Empty arrays yield the all-MaxValue signature, like the empty-aggregate
  * it replaces. Docs shorter than `width` get one shingle over all tokens.
  *
  * This is the 100 TB performance lever for MinHash-LSH dedup: the SQL
  * HOF chain it replaces evaluated k=16 separate interpreted `aggregate`
  * lambdas — 16 full array re-traversals per document, each element paying
  * lambda-dispatch plus an expression-tree xxhash64 — and for shingled
  * input additionally materialized every 3-token shingle as a concatenated
  * string. Here each token is hashed ONCE, shingles are hash-combined (no
  * allocation), and all k minima update inside one fused codegen loop.
  * (BENCH_r03: text_dedup_near 19.0 s at sf0.1, 19% of the whole bench —
  * this expression is the remedy. Pattern follows CosineSim.doGenCode.)
  */
case class MinHashSig(child: Expression, k: Int, width: Int,
    seed: Long = 42L) extends UnaryExpression {

  require(k >= 1 && width >= 1, s"minhash_sig needs k >= 1, width >= 1 (got k=$k, width=$width)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  // default seed = the one Spark's xxhash64(...) uses, so width=1
  // signatures are bit-identical to the SQL formulation (and thus to
  // round-3 outputs); non-default seeds exist for the seed-sweep recall
  // property test (a statistical guarantee must hold at EVERY seed, not
  // just the one the fixture pins happen to use)
  private val Seed = seed

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) = if (arr.isNullAt(i)) Seed else XXH64.hashUTF8String(arr.getUTF8String(i), Seed)
      i += 1
    }
    val mins = Array.fill(k)(Long.MaxValue)
    if (n > 0) {
      val w = math.min(width, n)
      val nsh = math.max(1, n - width + 1)
      i = 0
      while (i < nsh) {
        var c = Seed
        if (width == 1) c = th(i)
        else { var d = 0; while (d < w) { c = XXH64.hashLong(th(i + d), c); d += 1 } }
        val g = XXH64.hashLong(c, Seed)
        var j = 0
        while (j < k) {
          val v = XXH64.hashInt(j, g)
          if (v < mins(j)) mins(j) = v
          j += 1
        }
        i += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val th = ctx.freshName("th")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val g = ctx.freshName("g")
      val v = ctx.freshName("v")
      val w = ctx.freshName("w")
      val nsh = ctx.freshName("nsh")
      // width == 1 compiles the chaining loop out entirely (token path)
      val shingleHash =
        if (width == 1) s"long $c = $th[$i];"
        else
          s"""long $c = ${Seed}L;
             |    int $w = $width < $n ? $width : $n;
             |    for (int $d = 0; $d < $w; $d++) $c = $xxh.hashLong($th[$i + $d], $c);""".stripMargin
      s"""
         |int $n = $a.numElements();
         |long[] $th = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $th[$i] = $a.isNullAt($i) ? ${Seed}L : $xxh.hashUTF8String($a.getUTF8String($i), ${Seed}L);
         |}
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |if ($n > 0) {
         |  int $nsh = $n - $width + 1; if ($nsh < 1) $nsh = 1;
         |  for (int $i = 0; $i < $nsh; $i++) {
         |    $shingleHash
         |    long $g = $xxh.hashLong($c, ${Seed}L);
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $v = $xxh.hashInt($j, $g);
         |      if ($v < $mins[$j]) $mins[$j] = $v;
         |    }
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** k-minima MinHash signature (array<long> of length k) of a
    * array<string> token column; width > 1 hash-combines width-token
    * shingle windows instead of materializing concatenated shingles. */
  def minhash_sig(tokens: Column, k: Int, width: Int = 1,
      seed: Long = 42L): Column =
    Bridge.column(MinHashSig(Bridge.expression(tokens), k, width, seed))

  /** SQL constructor: `minhash_sig(tokens[, k[, width]])` — k/width must
    * be INT literals (they size the generated code). */
  private[graft] def fromExprs(exprs: Seq[Expression]): MinHashSig = {
    def intLit(e: Expression, what: String): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"minhash_sig: $what must be an INT literal (it sizes the generated code), got $other")
    }
    MinHashSig(exprs.head,
      if (exprs.length > 1) intLit(exprs(1), "k") else 16,
      if (exprs.length > 2) intLit(exprs(2), "width") else 1)
  }

  /** Register `minhash_sig` for SQL use in this session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig", fromExprs, "built-in")
}
