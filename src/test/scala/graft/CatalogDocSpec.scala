package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** The README's query-catalog section must equal what `CatalogDoc`
  * renders from the LIVE queries/oracleSql maps — adding, renaming, or
  * re-gating a query without regenerating the README fails here, so the
  * published inventory can never drift from the code. `render` itself
  * additionally aborts if any query lacks both a DuckDB oracle and a
  * recorded-md5 pin spec, so this spec is also the "every query has a
  * hard gate" invariant.
  */
class CatalogDocSpec extends AnyFunSuite {

  test("README catalog section matches the live query maps") {
    val text = new String(Files.readAllBytes(Paths.get("README.md")),
      StandardCharsets.UTF_8)
    val (b, e) = (text.indexOf(CatalogDoc.Begin), text.indexOf(CatalogDoc.End))
    assert(b >= 0 && e > b, "catalog markers missing from README.md")
    val committed = text.substring(b + CatalogDoc.Begin.length, e).trim
    assert(committed == CatalogDoc.render.trim,
      "README catalog section is stale — run: sbt \"runMain graft.CatalogDoc\"")
  }

  test("every catalog query appears exactly once in the rendered table") {
    val rendered = CatalogDoc.render
    SparkEntry.queries.keys.foreach { n =>
      val hits = ("`" + java.util.regex.Pattern.quote(n) + "`").r
        .findAllIn(rendered).size
      assert(hits == 1, s"$n appears $hits times in the catalog table")
    }
  }
}
