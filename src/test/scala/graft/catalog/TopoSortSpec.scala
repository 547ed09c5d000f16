package graft.catalog

import graft.Tables
import graft.Tables.TableSpec

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

class TopoSortSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private val relational = Tables.specs.filter(s => Tables.relational.contains(s.name))

  test("fixture order is child-first and deterministic") {
    val r = TopoSort.sort(relational)
    assert(r.cyclic.isEmpty)
    assert(r.order === Seq("lineitem", "orders", "customer", "part", "supplier",
      "nation", "region"))
  }

  test("every FK edge is respected (child before parent)") {
    val order = TopoSort.childFirst(relational)
    for (s <- relational; (_, parent) <- s.fkParents)
      assert(order.indexOf(s.name) < order.indexOf(parent),
        s"${s.name} must come before $parent")
  }

  test("cycles are detected, acyclic part still ordered") {
    val specs = Seq(
      TableSpec("a", Seq("id"), None, Seq("b_id" -> "b")),
      TableSpec("b", Seq("id"), None, Seq("a_id" -> "a")), // a <-> b cycle
      TableSpec("c", Seq("id"), None, Seq("d_id" -> "d")),
      TableSpec("d", Seq("id"), None, Nil))
    val r = TopoSort.sort(specs)
    assert(r.cyclic.toSet === Set("a", "b"))
    assert(r.order === Seq("c", "d"))
    // childFirst appends cycle members (reference escape hatch: archive
    // them with FK checks off, source/db.py:354-357)
    assert(TopoSort.childFirst(specs).toSet === Set("a", "b", "c", "d"))
  }

  test("two FK columns to the same parent are one ordering edge") {
    // b has TWO FKs to m; z also references m. Emitting b must not
    // decrement m's in-degree twice and release it before z.
    val specs = Seq(
      TableSpec("b_child", Seq("id"), None,
        Seq("m1" -> "m_parent", "m2" -> "m_parent")),
      TableSpec("m_parent", Seq("id"), None, Nil),
      TableSpec("z_child", Seq("id"), None, Seq("m" -> "m_parent")))
    val r = TopoSort.sort(specs)
    assert(r.cyclic.isEmpty)
    assert(r.order.indexOf("z_child") < r.order.indexOf("m_parent"))
    assert(r.order.indexOf("b_child") < r.order.indexOf("m_parent"))
  }

  test("self-referencing FK is not an ordering edge") {
    val specs = Seq(TableSpec("t", Seq("id"), None, Seq("parent_id" -> "t")))
    assert(TopoSort.sort(specs).order === Seq("t"))
  }

  test("property: random DAGs order all nodes child-first") {
    // edges only from lower to higher index => guaranteed acyclic
    val gen = for {
      n <- Gen.choose(1, 12)
      edges <- Gen.listOfN(n * 2, for {
        a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1)
      } yield (math.min(a, b), math.max(a, b)))
    } yield (n, edges.filter(e => e._1 != e._2).distinct)
    check(Prop.forAll(gen) { case (n, edges) =>
      val specs = (0 until n).map { i =>
        val parents = edges.collect { case (c, p) if c == i => s"fk$p" -> s"t$p" }
        TableSpec(s"t$i", Seq("id"), None, parents)
      }
      val r = TopoSort.sort(specs)
      r.cyclic.isEmpty && r.order.size == n &&
        edges.forall { case (c, p) =>
          r.order.indexOf(s"t$c") < r.order.indexOf(s"t$p")
        }
    })
  }
}
