package graft

import java.text.Normalizer

import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks

import graft.ext.TextOps
import graft.plans.GraftFunctions

/** The Unicode-normalization family: the native
  * [[graft.plans.UnicodeNormExpr]] against JDK ground truth across all
  * four forms, the CCNet dedup-key contract on a crafted accent/case/
  * digit/punctuation table, and the control-character cleanup census.
  * Every non-ASCII codepoint is written as an explicit escape - composed
  * vs decomposed is THE thing under test, and an editor that silently
  * normalizes source would otherwise hollow the assertions out.
  */
class UnicodeNormSpec extends SparkSpec with TableDrivenPropertyChecks {

  import spark.implicits._

  private val cafeComposed = "Caf\u00E9"
  private val cafeDecomposed = "Cafe\u0301"
  private val ligatureFi = "\uFB01le"

  private def normDf(form: String, values: String*): Seq[String] = {
    GraftFunctions.register(spark)
    values.toSeq.toDF("s")
      .select(TextOps.normalizeUnicode(col("s"), form).as("n"))
      .as[String].collect().toSeq
  }

  test("all four forms agree with java.text.Normalizer on mixed inputs") {
    // composed, decomposed, compatibility (ligature, full-width), plain
    val inputs = Seq(
      cafeComposed, cafeDecomposed, "\u00C5", "A\u030A",
      ligatureFi, "\uFF46\uFF55\uFF4C\uFF4C \uFF11\uFF12\uFF13",
      "plain ascii 42", "", "nai\u0308ve r\u00E9sum\u00E9")
    for (form <- Seq("NFC", "NFD", "NFKC", "NFKD")) {
      val expected = inputs.map(s =>
        Normalizer.normalize(s, Normalizer.Form.valueOf(form)))
      assert(normDf(form, inputs: _*) == expected, s"form=$form")
    }
  }

  test("NFC composes a decomposed sequence to the composed codepoint") {
    assert(normDf("NFC", cafeDecomposed) == Seq(cafeComposed))
    assert(normDf("NFD", cafeComposed) == Seq(cafeDecomposed))
    // NFKC folds compatibility forms NFC leaves alone
    assert(normDf("NFC", ligatureFi) == Seq(ligatureFi))
    assert(normDf("NFKC", ligatureFi) == Seq("file"))
  }

  test("null survives; unknown form fails analysis with the form named") {
    GraftFunctions.register(spark)
    val out = Seq[String]("a", null).toDF("s")
      .select(TextOps.normalizeUnicode(col("s"), "NFC").as("n"))
      .collect()
    assert(out(0).getString(0) == "a")
    assert(out(1).isNullAt(0))
    val err = intercept[Exception] {
      Seq("a").toDF("s")
        .select(TextOps.normalizeUnicode(col("s"), "NFX")).collect()
    }
    assert(err.getMessage.contains("NFX"))
  }

  test("sql surface: graft_unicode_norm resolves after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      s"SELECT graft_unicode_norm('$cafeDecomposed', 'NFC') AS n")
      .as[String].head()
    assert(r == cafeComposed)
  }

  test("ccnetKey: case, accents, digits and punctuation all collapse") {
    val cases = Table(
      ("input", "key"),
      // decomposed uppercase + digits + punct
      ("Re\u0301sume\u0301 CAFE\u0301 42!", "resume cafe 00"),
      // composed lowercase, different digits/punct
      ("r\u00E9sum\u00E9 caf\u00E9 13?", "resume cafe 00"),
      ("resume cafe 00", "resume cafe 00"),
      ("  MANY,   spaces and\ttabs  ", "many spaces and tabs"),
      // o-slash / oe-ligature / sharp-s are NOT accent decompositions:
      // they map to space (same in DuckDB's strip_accents - the parity
      // q110's oracle depends on)
      ("S\u00F8ren \u0153uvre \u00DF", "s ren uvre"),
      ("", ""))
    forAll(cases) { (input, key) =>
      val got = Seq(input).toDF("text")
        .select(TextOps.ccnetKey(col("text")).as("k")).as[String].head()
      assert(got == key, s"input=$input")
    }
  }

  test("withCcnetKey appends the key and its md5 hash") {
    val out = TextOps.withCcnetKey(
      Seq((1L, "The CAF\u00C9!"), (2L, "the caf\u00E9")).toDF("id", "text"),
      "text")
    val rows = out.select("id", "ccnet_key", "key_md5")
      .orderBy("id").collect()
    assert(rows(0).getString(1) == "the cafe")
    assert(rows(1).getString(1) == "the cafe")
    assert(rows(0).getString(2) == rows(1).getString(2)) // same dedup key
  }

  test("cleanControlChars strips the damage set and counts codepoints") {
    val dirty =
      "a\u0007b\u000Bc\u200Bd\uFEFFe\u007Ff\uFFFDg\tkeep\nme"
    val out = TextOps.cleanControlChars(Seq(dirty).toDF("text"), "text")
      .select("text_clean", "n_ctl_removed").head()
    assert(out.getString(0) == "abcdefg\tkeep\nme") // \t and \n survive
    assert(out.getLong(1) == 6L)
  }

  test("cleanControlChars: clean text is untouched with zero removed") {
    val out = TextOps.cleanControlChars(
      Seq("perfectly ordinary text.\nwith lines\tand tabs").toDF("text"),
      "text").select("text_clean", "n_ctl_removed").head()
    assert(out.getString(0) == "perfectly ordinary text.\nwith lines\tand tabs")
    assert(out.getLong(1) == 0L)
  }

  test("withNormalizedText flags only rows normalization changed") {
    val out = TextOps.withNormalizedText(
      Seq((1L, "Cafe\u0301"), (2L, "plain")).toDF("id", "text"), "text")
      .select("id", "text_norm", "norm_changed").orderBy("id").collect()
    assert(out(0).getString(1) == cafeComposed && out(0).getBoolean(2))
    assert(out(1).getString(1) == "plain" && !out(1).getBoolean(2))
  }

  test("normalization stays inside whole-stage codegen") {
    GraftFunctions.register(spark)
    // spark.range, not a local Seq: a LocalTableScan is eagerly
    // collapsed and would show no codegen span at all
    val plan = spark.range(10)
      .select(TextOps.normalizeUnicode(col("id").cast("string"), "NFC"))
      .queryExecution.executedPlan
    // the `*(n)` prefix is executedPlan's WholeStageCodegen marker
    assert(plan.toString.contains("*(1) Project"),
      s"expected codegen'd projection, got:\n$plan")
  }
}
