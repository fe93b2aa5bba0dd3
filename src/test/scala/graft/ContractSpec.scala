package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants — no Spark session needed. */
class ContractSpec extends AnyFunSuite {

  test("every query is oracle-checked or explicitly rows-only") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    // an oracle without a query would silently never run
    assert(os.subsetOf(qs), s"orphan oracles: ${(os -- qs).toSeq.sorted}")
    // a query without an oracle silently degrades to the driver's weaker
    // rows-only check — only the documented sketch query is allowed there
    // (bound-asserted in QueryBoundsSpec instead; q_mm_decode graduated to
    // a full oracle when the BMP decoder became real)
    assert((qs -- os) === Set("q_approx_distinct"),
      s"un-oracled queries: ${(qs -- os).toSeq.sorted}")
  }

  test("query names are unique across modules (no silent map overwrites)") {
    val modules = Seq(
      "Relational" -> graft.queries.RelationalQueries.queries.keySet,
      "Domain" -> graft.queries.DomainQueries.queries.keySet,
      "Text" -> graft.queries.TextQueries.queries.keySet,
      "Event" -> graft.queries.EventQueries.queries.keySet,
      "Declared" -> graft.queries.DeclaredQueries.queries.keySet,
      "Extended" -> graft.queries.ExtendedQueries.queries.keySet)
    for {
      (na, a) <- modules; (nb, b) <- modules if na < nb
      dup = a.intersect(b) if dup.nonEmpty
    } fail(s"$na and $nb both define: ${dup.toSeq.sorted}")
    assert(modules.map(_._2.size).sum === SparkEntry.queries.size)
  }
}
