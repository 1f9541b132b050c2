package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** Direct unit pins for the PSL parse + match algorithm (no Spark —
  * [[Psl.registeredDomainOf]] is a pure per-row function; UrlsSpec covers
  * the expression wiring, the domain-family oracles pin the DuckDB twin). */
class PslSpec extends AnyFunSuite {

  test("parse: the vendored list carries all three rule classes at real sizes") {
    // counted from the vendored file; a re-vendor that silently drops a
    // section (e.g. private domains) must fail loudly here
    assert(Psl.maxRuleLabels >= 4 && Psl.maxRuleLabels <= 6, Psl.maxRuleLabels)
    // private-registry, wildcard, and exception rules all resolve
    assert(Psl.registeredDomainOf("a.b.github.io") == "b.github.io")
    assert(Psl.registeredDomainOf("x.bar.foo.ck") == "bar.foo.ck")
    assert(Psl.registeredDomainOf("x.city.kawasaki.jp") == "city.kawasaki.jp")
  }

  test("exception prevails over the wildcard it punches through") {
    // *.kawasaki.jp makes other.kawasaki.jp a public suffix, but
    // !city.kawasaki.jp makes city.kawasaki.jp a registrable domain
    assert(Psl.registeredDomainOf("other.kawasaki.jp") == "other.kawasaki.jp")
    assert(Psl.registeredDomainOf("deep.other.kawasaki.jp") ==
      "deep.other.kawasaki.jp")
    assert(Psl.registeredDomainOf("city.kawasaki.jp") == "city.kawasaki.jp")
    assert(Psl.registeredDomainOf("ward.city.kawasaki.jp") == "city.kawasaki.jp")
  }

  test("longest match wins among exact rules") {
    // uk and co.uk both match foo.co.uk candidates; co.uk (2 labels) wins
    assert(Psl.registeredDomainOf("a.b.foo.co.uk") == "foo.co.uk")
    // 3-label exact rules exist too (e.g. *.compute.amazonaws.com family)
    assert(Psl.registeredDomainOf("x.s3.amazonaws.com") == "x.s3.amazonaws.com")
  }

  test("default rule: unknown TLDs are public suffixes (last-2 fallback)") {
    assert(Psl.registeredDomainOf("a.b.notatld") == "b.notatld")
    assert(Psl.registeredDomainOf("notatld") == "notatld")
  }

  test("totalization edges: empty, IPv4, public-suffix-as-host, degenerate dots") {
    assert(Psl.registeredDomainOf("") == "")
    assert(Psl.registeredDomainOf("10.0.0.1") == "10.0.0.1")
    assert(Psl.registeredDomainOf("co.uk") == "co.uk")
    assert(Psl.registeredDomainOf("github.io") == "github.io")
    // split keeps empty labels (Spark/DuckDB split semantics) — the
    // degenerate forms are total and engine-consistent, not pretty
    assert(Psl.registeredDomainOf("weird..dots") == ".dots")
    assert(Psl.registeredDomainOf("trailing.dot.") == "dot.")
  }

  test("printed rule table matches the parsed sets and is deterministic") {
    val cte = Psl.sqlPslCte
    assert(cte.startsWith("psl(base, nlab, typ) AS"))
    // one row per rule, every class marker present
    assert(cte.contains("('github.io', 2, 'x')"))
    assert(cte.contains("('ck', 1, 'w')"))
    assert(cte.contains("('www.ck', 2, 'e')"))
    assert(Psl.sqlPslCte eq cte, "lazy val: printed once, reused")
  }
}
