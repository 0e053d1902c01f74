package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL bindings for the [[TextFunctions]] library: every Column
  * combinator doubles as a `graft_*` SQL function, so pure-SQL users
  * (spark-sql shell, JDBC, views) get the same text-pipeline surface
  * as the Scala API — one definition, two frontends. Registered by
  * [[graft.GraftExtensions]]; because the combinators expand to
  * built-in codegen'd expressions, the SQL forms inherit the exact
  * same plans (and performance) as the Column forms.
  */
object SqlFunctions {

  type Descriptor = (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def c(e: Expression): Column = GraftSqlShim.column(e)

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(TextFunctions.getClass.getName, name)

  private def fn1(name: String)(f: Column => Column): Descriptor =
    (FunctionIdentifier(name), info(name), {
      case Seq(a) => GraftSqlShim.expression(f(c(a)))
      case args => throw new IllegalArgumentException(
        s"usage: $name(text) — got ${args.length} arguments")
    })

  private def fn2(name: String)(f: (Column, Column) => Column): Descriptor =
    (FunctionIdentifier(name), info(name), {
      case Seq(a, b) => GraftSqlShim.expression(f(c(a), c(b)))
      case args => throw new IllegalArgumentException(
        s"usage: $name(a, b) — got ${args.length} arguments")
    })

  /** (column, int-literal) shape — n must fold at plan time because it
    * fixes the expanded expression's structure.
    */
  private def fnInt(name: String)(f: (Column, Int) => Column): Descriptor =
    (FunctionIdentifier(name), info(name), {
      case Seq(a, Literal(n: Int, IntegerType)) => GraftSqlShim.expression(f(c(a), n))
      case _ => throw new IllegalArgumentException(
        s"usage: $name(text, <int literal n>)")
    })

  val all: Seq[Descriptor] = Seq(
    fn1("graft_word_tokens")(TextFunctions.wordTokens),
    fn1("graft_token_count")(TextFunctions.tokenCount),
    fn1("graft_quality_score")(TextFunctions.qualityScore),
    fn1("graft_punct_ratio")(TextFunctions.punctRatio),
    fn1("graft_stopword_ratio")(TextFunctions.stopwordRatio),
    fn1("graft_mean_word_length")(TextFunctions.meanWordLength),
    fn1("graft_lang_id")(TextFunctions.langId),
    fn1("graft_fingerprint")(TextFunctions.fingerprint),
    fn1("graft_rolling_hash")(TextFunctions.rollingHash),
    fn1("graft_simhash")(TextFunctions.simhash),
    fn1("graft_redact_pii")(TextFunctions.redactPii),
    fnInt("graft_char_shingles")(TextFunctions.charShingles),
    fnInt("graft_word_ngrams")(TextFunctions.wordNgrams),
    fnInt("graft_repeated_ngram_fraction")(TextFunctions.repeatedNgramFraction),
    fn2("graft_jaccard")(TextFunctions.jaccard),
    fn2("graft_hamming")(TextFunctions.hammingDist))
}
