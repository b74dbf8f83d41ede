package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.ops.Similarity

/** Native Catalyst vector expressions: correctness vs the higher-order
  * -function reference implementation, SQL registration, and null/edge
  * semantics.
  */
class VectorExprSpec extends SparkSpec {

  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (2L, Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f)),
    (3L, Array(-1.5f, 2.5f, 0.5f), Array(0.25f, -0.75f, 4.0f))
  ).toDF("id", "a", "b")

  test("vec_dot matches the HOF fold bit-for-bit") {
    val rows = vecs.select(
      VectorFunctions.dot($"a", $"b").alias("native"),
      Similarity.dotHof($"a", $"b").alias("hof")).collect()
    rows.foreach { r => assert(r.getDouble(0) == r.getDouble(1)) }
    assert(rows(0).getDouble(0) == 32.0) // 4+10+18
  }

  test("vec_cosine matches the HOF composition; zero vector -> null") {
    val rows = vecs.select(
      $"id",
      VectorFunctions.cosine($"a", $"b").alias("native"),
      Similarity.cosineHof($"a", $"b").alias("hof")).collect()
    rows.foreach { r =>
      if (r.isNullAt(1)) assert(r.isNullAt(2)) // zero-norm: both null
      else assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-15)
    }
    assert(rows.find(_.getLong(0) == 2L).get.isNullAt(1))
  }

  test("SQL registration: vec_dot / vec_cosine callable from spark.sql") {
    VectorFunctions.register(spark)
    vecs.createOrReplaceTempView("vecs_test")
    val out = spark.sql(
      "SELECT vec_dot(a, b) AS d, vec_cosine(a, a) AS c FROM vecs_test WHERE id = 1")
      .collect().head
    assert(out.getDouble(0) == 32.0)
    assert(math.abs(out.getDouble(1) - 1.0) < 1e-12)
  }

  test("SQL registration: sketch expressions callable from spark.sql") {
    VectorFunctions.register(spark)
    spark.sql("SELECT 1 AS id").createOrReplaceTempView("one_row")
    val out = spark.sql(
      """SELECT minhash_array(shingle_windows(array(7L, 11L, 13L, 17L), 2), 4) AS sig,
                simhash_array(array(5L, 5L, 2L)) AS sim
         FROM one_row""").collect().head
    assert(out.getSeq[Long](0).length == 4)
    // simhash of {5,5,2}: bit0 votes +1+1-1>0 -> set; bit1 votes -1-1+1<0;
    // bit2 votes +1+1-1>0 -> set => 0b101 = 5
    assert(out.getLong(1) == 5L)
  }

  test("SQL registration: z_value / feature_hash / token_counts") {
    VectorFunctions.register(spark)
    val out = spark.sql(
      """SELECT z_value(array(3L, 1L), 2) AS z,
                feature_hash(array(5L, 5L), 4) AS fh,
                token_counts(array('a', 'b', 'a')) AS tc""").collect().head
    assert(out.getLong(0) == 7L) // x=0b11 even bits, y=0b01 odd bits
    assert(out.getSeq[Float](1).length == 4)
    val tc = out.getSeq[org.apache.spark.sql.Row](2)
    assert(tc.map(r => r.getString(0) -> r.getLong(1)) == Seq("a" -> 2L, "b" -> 1L))
    // SQL-exposed: null elements are skipped, not NPE'd
    val withNull = spark.sql(
      "SELECT token_counts(array('a', CAST(NULL AS STRING), 'a')) AS tc")
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
    assert(withNull.map(r => r.getString(0) -> r.getLong(1)) == Seq("a" -> 2L))
  }

  test("works on double arrays and mismatched lengths (min-length semantics)") {
    val d = Seq((Array(1.0, 2.0, 3.0), Array(2.0, 3.0))).toDF("a", "b")
    assert(d.select(VectorFunctions.dot($"a", $"b")).collect().head.getDouble(0) == 8.0)
  }

  test("vec_eq_count matches the zip_with reference, codegen strict") {
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val d = spark.range(200).select(
        transform(sequence(lit(1L), lit(16L)), i => $"id" * i % 7).alias("a"),
        transform(sequence(lit(1L), lit(16L)), i => $"id" * i % 5).alias("b"))
      val rows = d.select(
        graft.functions.VectorFunctions.eqCount($"a", $"b").alias("native"),
        size(filter(zip_with($"a", $"b", (x, y) => (x === y).cast("int")),
          v => v === 1)).cast("long").alias("ref")).collect()
      rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
      // min-length + self-equality sanity
      val m = Seq((Seq(1L, 2L, 3L), Seq(1L, 9L))).toDF("a", "b")
      assert(m.select(graft.functions.VectorFunctions.eqCount($"a", $"b"))
        .collect().head.getLong(0) == 1L)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("integral arrays: tinyint/long dots are exact (quantized ANN path)") {
    // NB: Scala Array[Byte] encodes as BinaryType — build array<tinyint>
    // via cast, the same shape Similarity.quantize produces
    val d = Seq((Array(1, -2, 127), Array(3, 4, -128), Array(2L, 3L, 4L)))
      .toDF("a0", "b0", "c")
      .select($"a0".cast("array<tinyint>").alias("a"),
        $"b0".cast("array<tinyint>").alias("b"), $"c")
    val r = d.select(
      VectorFunctions.dot($"a", $"b").alias("bb"),
      VectorFunctions.dot($"a", $"c").alias("bl")).collect().head
    assert(r.getDouble(0) == (1 * 3 + -2 * 4 + 127 * -128).toDouble)
    assert(r.getDouble(1) == (1 * 2 + -2 * 3 + 127 * 4).toDouble)
    // mixed byte×float also typechecks and widens per element
    val m = Seq((Array(2, 3), Array(0.5f, 2.0f))).toDF("a0", "b")
      .select($"a0".cast("array<tinyint>").alias("a"), $"b")
    assert(m.select(VectorFunctions.dot($"a", $"b")).collect().head.getDouble(0) == 7.0)
  }

  test("sketch expressions compile under whole-stage codegen (fallback disabled)") {
    // spark.sql.codegen.fallback=true (the default) silently swallows a
    // CompileException and re-plans interpreted; disable it so a doGenCode
    // bug (e.g. casting Object straight to a primitive) fails the test.
    import graft.functions.SketchArrayExpressions._
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val docs = spark.range(500).select(
        $"id",
        transform(sequence(lit(1L), lit(8L)), t => xxhash64($"id" * t)).alias("th"))
      val out = docs.select(
        simhashArray($"th").alias("sim"),
        minhashArray(shingleWindows($"th", 3), 8).alias("sig"),
        featureHash($"th", 16).alias("emb"))
        .where($"sim" =!= 0L)
        .agg(count(lit(1)), min(element_at($"sig", 1)), min(element_at($"emb", 1)))
        .collect().head
      assert(out.getLong(0) > 0L)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("char_pair_counts matches the instance-explode spelling exactly") {
    import graft.functions.SketchArrayExpressions.charPairCounts
    val docs = Seq("abab ab x ba", "spark spark table", "", "a b c")
      .toDF("text")
    val toks = graft.ops.TextAnalysis.tokens($"text")
    val fold = docs.select(explode(charPairCounts(toks)).alias("bg"))
      .groupBy($"bg.c1", $"bg.c2").agg(sum($"bg.tf").alias("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val ref = docs.select(explode(toks).alias("tok"))
      .filter(length($"tok") >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(tok) - 1), " +
          "i -> struct(substring(tok, i, 1) AS c1, substring(tok, i + 1, 1) AS c2))"))
        .alias("bg"))
      .groupBy($"bg.c1", $"bg.c2").agg(count(lit(1)).alias("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(fold == ref && fold.nonEmpty)
  }

  test("word_pair_counts matches the bigram instance-explode spelling") {
    import graft.functions.SketchArrayExpressions.wordPairCounts
    val docs = Seq((1L, "a b a b c"), (2L, "x"), (3L, ""), (4L, "y y y"))
      .toDF("id", "text")
    val toks = graft.ops.TextAnalysis.tokens($"text")
    val fold = docs.select($"id", explode(wordPairCounts(toks)).alias("bg"))
      .select($"id", $"bg.w1", $"bg.w2", $"bg.tf")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    val ref = graft.ops.TextAnalysis
      .bigramInstances(docs, "text", Seq($"id"))
      .groupBy($"id", $"w1", $"w2").agg(count(lit(1)).alias("tf"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    assert(fold == ref)
    assert(fold((1L, "a", "b")) == 2L && fold((4L, "y", "y")) == 2L)
  }

  test("codegen path actually compiles (no fallback): run over enough rows") {
    // 1000 rows through a projection exercises WholeStageCodegen; a codegen
    // bug would throw CompileException and fail loudly here.
    val big = spark.range(1000)
      .select($"id", array((0 until 16).map(i => ($"id" + i).cast("float")): _*).alias("v"))
    val s = big.select(VectorFunctions.cosine($"v", $"v").alias("c"))
      .agg(min($"c"), max($"c")).collect().head
    assert(math.abs(s.getDouble(0) - 1.0) < 1e-12 && math.abs(s.getDouble(1) - 1.0) < 1e-12)
  }
}
