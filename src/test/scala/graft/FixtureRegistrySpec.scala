package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Drift guard for FixtureCache.registry (round-8 verdict #2: the Bench
  * prewarm was a hand-kept list that had drifted to cover 4 of 17
  * fixtures — the same static-enumeration failure class as the
  * thrice-drifted ContractSpec families list). This spec greps the main
  * source tree for every `FixtureCache.ensure(` call site, so ADDING a
  * fixture without registering its prewarm consumer fails CI:
  *  - every call site with a literal first argument must have that name
  *    in the registry;
  *  - non-literal call sites (a parameterized helper) are pinned to a
  *    known allowlist whose concrete names must be registered explicitly;
  *  - every registry value must be a real SparkEntry query key (a typo'd
  *    key would make the prewarm a silent no-op);
  *  - no registry entry may be stale (naming a fixture no call site
  *    ensures anymore).
  */
class FixtureRegistrySpec extends AnyFunSuite {

  private val srcRoot = Paths.get("src/main/scala/graft")

  private def mainSources: Seq[Path] = {
    assert(Files.isDirectory(srcRoot),
      s"spec must run from the repo root; missing $srcRoot")
    val walk = Files.walk(srcRoot)
    try walk.iterator().asScala.filter(_.toString.endsWith(".scala"))
      // the defining file's own scaladoc mentions ensure("<literal>")
      .filterNot(_.toString.endsWith("FixtureCache.scala")).toSeq
    finally walk.close()
  }

  // Matches FixtureCache.ensure("literal"  (group 1 = the fixture name)
  // and bare-variable sites FixtureCache.ensure(name  (group 2 nonempty).
  private val callSite =
    """FixtureCache\.ensure\(\s*(?:"([^"]+)"|(\w+)\s*,)""".r

  private def sites: Seq[(Path, Option[String])] =
    mainSources.flatMap { p =>
      val text = new String(Files.readAllBytes(p), "UTF-8")
      callSite.findAllMatchIn(text).map { m =>
        p -> Option(m.group(1))
      }.toSeq
    }

  test("every literal FixtureCache.ensure site is registered") {
    val found = sites
    assert(found.nonEmpty, "grep found no FixtureCache.ensure sites at all")
    val literals = found.collect { case (p, Some(n)) => (p, n) }
    val missing = literals.filterNot { case (_, n) =>
      FixtureCache.registry.contains(n)
    }
    assert(missing.isEmpty,
      s"unregistered fixture(s) — add to FixtureCache.registry: $missing")
  }

  test("non-literal ensure sites are the known parameterized helpers only") {
    val nonLiteral = sites.collect { case (p, None) => p.toString }
    // q_join_bucketed's local helper (Extras5) passes `name` through;
    // Extras148.buildHnswIndex selects between the plain and the
    // Alg.4-diversified fixture (round-15: ONE shared derivation for
    // the HNSW family — the r14 ADVICE anti-drift refactor). All
    // concrete names are registered explicitly below.
    val allowed = Set("operators/Extras5.scala", "operators/Extras148.scala")
    assert(nonLiteral.forall(p => allowed.exists(p.endsWith)),
      s"new non-literal FixtureCache.ensure site(s) $nonLiteral — either " +
        "use a literal name or extend this allowlist AND the registry")
    assert(Seq("gb_lineitem", "gb_orders", "ann_hnsw_idx",
        "ann_hnsw_div_idx",
        "ann_hnsw_div_m16_idx").forall(FixtureCache.registry.contains),
      "the parameterized helpers' fixture names must stay registered")
  }

  test("every registry value is a real SparkEntry query key") {
    val keys = SparkEntry.queries.keySet
    val bad = FixtureCache.registry.filterNot { case (_, q) => keys(q) }
    assert(bad.isEmpty, s"registry points at nonexistent queries: $bad")
  }

  test("no stale registry entries (every registered name has a call site)") {
    val literals = sites.collect { case (_, Some(n)) => n }.toSet
    // names reached through the two parameterized helpers (asserted
    // present in the allowlist test above)
    val parameterized = Set("gb_lineitem", "gb_orders",
      "ann_hnsw_idx", "ann_hnsw_div_idx", "ann_hnsw_div_m16_idx")
    val stale = FixtureCache.registry.keySet -- literals -- parameterized
    assert(stale.isEmpty,
      s"registry names with no FixtureCache.ensure call site: $stale")
  }
}
