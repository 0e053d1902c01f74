package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.functions.TextFunctions

/** The graft_* SQL function surface must be value-identical to the
  * Column combinators it binds — one definition, two frontends.
  */
class SqlFunctionsSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def docs() = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "The quick brown fox, it jumps over the lazy dog!"),
      (2L, "der die das und ist nicht ein ich mit sich"),
      (3L, "mail me at a.b@example.com or +1 (555) 123-4567 from 10.0.0.1"),
      (4L, ""),
      (5L, "x y x y x y x y"))
      .toDF("id", "text")
  }

  test("every unary graft_* SQL function matches its Column form") {
    val d = docs()
    d.createOrReplaceTempView("sqlfn_docs")
    val pairs: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "graft_token_count" -> TextFunctions.tokenCount(col("text")),
      "graft_quality_score" -> TextFunctions.qualityScore(col("text")),
      "graft_punct_ratio" -> TextFunctions.punctRatio(col("text")),
      "graft_stopword_ratio" -> TextFunctions.stopwordRatio(col("text")),
      "graft_mean_word_length" -> TextFunctions.meanWordLength(col("text")),
      "graft_lang_id" -> TextFunctions.langId(col("text")),
      "graft_fingerprint" -> TextFunctions.fingerprint(col("text")),
      "graft_rolling_hash" -> TextFunctions.rollingHash(col("text")),
      "graft_simhash" -> TextFunctions.simhash(col("text")),
      "graft_redact_pii" -> TextFunctions.redactPii(col("text")))
    pairs.foreach { case (name, column) =>
      val viaSql = spark.sql(s"SELECT $name(text) AS v FROM sqlfn_docs ORDER BY id")
        .collect().map(_.get(0)).toSeq
      val viaCol = d.select(column.as("v")).orderBy("id")
        .collect().map(_.get(0)).toSeq
      withClue(name) { viaSql shouldBe viaCol }
    }
  }

  test("n-parameterized and binary forms match; literal n is enforced") {
    val d = docs()
    d.createOrReplaceTempView("sqlfn_docs")
    val sh = spark.sql(
      "SELECT graft_char_shingles(text, 3) AS v FROM sqlfn_docs ORDER BY id")
      .collect().map(_.getSeq[String](0)).toSeq
    val shCol = d.select(TextFunctions.charShingles(col("text"), 3).as("v"))
      .orderBy("id").collect().map(_.getSeq[String](0)).toSeq
    sh shouldBe shCol

    val rep = spark.sql(
      "SELECT graft_repeated_ngram_fraction(text, 2) AS v FROM sqlfn_docs WHERE id = 5")
      .head().getDouble(0)
    rep shouldBe (1.0 - 2.0 / 7.0) +- 1e-9 // "x y"×4,"y x"×3 → 2 distinct of 7

    spark.sql(
      """SELECT graft_jaccard(graft_word_tokens('a b c'), graft_word_tokens('b c d')) AS j,
        |       graft_hamming(graft_simhash('a b c'), graft_simhash('a b c')) AS h""".stripMargin)
      .head().toSeq shouldBe Seq(0.5, 0L)

    val err = intercept[Exception](
      spark.sql("SELECT graft_char_shingles(text, id) FROM sqlfn_docs").collect())
    err.getMessage should include("int literal")
  }

  test("graft_bloom_might_contain resolves in SQL against a hex-literal filter") {
    val f = org.apache.spark.util.sketch.BloomFilter.create(10, 0.01)
    f.putString("hit")
    val bos = new java.io.ByteArrayOutputStream()
    f.writeTo(bos)
    val hex = bos.toByteArray.map("%02X".format(_)).mkString
    val Seq(hit, miss) = spark.sql(
      s"SELECT graft_bloom_might_contain(X'$hex', 'hit'), " +
        s"graft_bloom_might_contain(X'$hex', 'definitely absent')")
      .head().toSeq.map(_.asInstanceOf[Boolean]).toSeq
    hit shouldBe true
    miss shouldBe false
    // non-foldable filter argument is rejected at analysis, not at run
    spark.sql("SELECT 'a' AS s").createOrReplaceTempView("sqlfn_bloom_t")
    val err = intercept[Exception](spark.sql(
      "SELECT graft_bloom_might_contain(CAST(s AS BINARY), s) FROM sqlfn_bloom_t").collect())
    err.getMessage.toLowerCase should include("foldable")
  }
}
