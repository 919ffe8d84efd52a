package graft

import graft.expr.AccentFold
import graft.imdb.Enrichment
import org.scalacheck.Prop.forAll
import org.scalacheck.Properties

/** Property-based invariants (SURVEY.md §5) over the pure (non-Spark)
  * kernels — arbitrary inputs, not fixtures. */
object GraftProperties extends Properties("graft") {

  property("accentFold emits ASCII only") = forAll { (s: String) =>
    AccentFold.fold(s).forall(_ < 128)
  }

  property("accentFold is idempotent") = forAll { (s: String) =>
    val once = AccentFold.fold(s)
    AccentFold.fold(once) == once
  }

  property("accentFold preserves pure-ASCII strings") = forAll { (s: String) =>
    val ascii = s.filter(c => c >= ' ' && c < 127)
    AccentFold.fold(ascii) == ascii
  }

  property("stub predictor: deterministic, whitelist-valid, id-preserving") =
    forAll { (ids: List[String]) =>
      val metas = ids.map(i => Enrichment.MovieMeta(i, None, None, None, None, None))
      val out = Enrichment.StubPredictor.predictBatch(metas)
      out == Enrichment.StubPredictor.predictBatch(metas) &&
        out.map(_._1) == ids &&
        out.forall { case (_, g) => Enrichment.MovieGenres.contains(g) }
    }
}
