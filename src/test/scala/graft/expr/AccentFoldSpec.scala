package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AccentFoldSpec extends SparkSpec {

  test("fold strips accents and non-ASCII (reference fixture cases)") {
    assert(AccentFold.fold("Déstiny") == "Destiny")
    assert(AccentFold.fold("Die Puppe") == "Die Puppe")
    assert(AccentFold.fold("Der müde Tod") == "Der mude Tod")
    assert(AccentFold.fold("日本語 abc") == " abc")
  }

  test("registered function runs distributed (codegen path) and keeps nulls") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val out = Seq(Some("Déstiny"), Some("naïve café"), None).toDF("t")
      .select(call_function("accent_fold", $"t").as("f"))
      .collect().map(r => Option(r.getString(0)))
    assert(out.toSeq == Seq(Some("Destiny"), Some("naive cafe"), None))
  }

  test("property: output is ASCII and idempotent (seeded random strings)") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val s = (1 to rnd.nextInt(30)).map(_ => rnd.nextPrintableChar()).mkString +
        "éüñØ日".take(rnd.nextInt(5))
      val once = AccentFold.fold(s)
      assert(once.forall(_ < 128), s"non-ascii in fold($s) = $once")
      assert(AccentFold.fold(once) == once, s"not idempotent on $s")
    }
  }
}
