package graft.catalog

import graft.Tables.TableSpec

import scala.collection.mutable

/** FK-dependency topological sort, child-before-parent (SURVEY.md T6).
  *
  * The reference orders tables so that referencing (child) tables are
  * archived/deleted before their parents, by repeated insertion after the
  * referrer (/root/reference/osarchiver/source/db.py:187-214), and punts on
  * cycles via a manual `tables_with_circular_fk` list
  * (/root/reference/osarchiver/source/db.py:57,354-357).
  *
  * We implement Kahn's algorithm over the "is referenced by" relation with a
  * deterministic (alphabetical) tie-break, plus explicit cycle detection:
  * tables on a cycle are returned separately so the caller can apply the
  * reference's escape hatch (archive them with FK checks off) instead of
  * silently mis-ordering them.
  */
object TopoSort {

  final case class Result(order: Seq[String], cyclic: Seq[String])

  /** Children of each table (tables whose FK points at it). */
  def childrenOf(specs: Seq[TableSpec]): Map[String, Set[String]] = {
    val known = specs.map(_.name).toSet
    val pairs = for {
      s <- specs
      (_, parent) <- s.fkParents
      if known.contains(parent) && parent != s.name // self-FK is not an ordering edge
    } yield parent -> s.name
    pairs.groupMap(_._1)(_._2).view.mapValues(_.toSet).toMap
  }

  /** Child-first order over the given specs; cycle members are excluded from
    * `order` and listed in `cyclic`. Deterministic: ready tables are emitted
    * alphabetically. */
  def sort(specs: Seq[TableSpec]): Result = {
    val children = childrenOf(specs)
    // in-degree of X = number of not-yet-emitted children of X
    val indeg = mutable.Map.from(
      specs.map(s => s.name -> children.getOrElse(s.name, Set.empty).size))
    val ready = mutable.SortedSet.from(specs.map(_.name).filter(indeg(_) == 0))
    val out = mutable.ArrayBuffer.empty[String]
    // distinct: two FK columns to the same parent are ONE ordering edge —
    // indeg counts distinct children, so decrements must match
    val parentsOf: Map[String, Seq[String]] =
      specs.map(s => s.name -> s.fkParents.map(_._2).distinct
        .filter(p => indeg.contains(p) && p != s.name)).toMap
    while (ready.nonEmpty) {
      val t = ready.head
      ready.remove(t)
      out += t
      parentsOf(t).foreach { p =>
        indeg(p) -= 1
        if (indeg(p) == 0) ready.add(p)
      }
    }
    val cyclic = specs.map(_.name).filterNot(out.contains)
    Result(out.toSeq, cyclic)
  }

  /** Convenience: order only, cycles appended at the end (caller must
    * archive those with FK enforcement disabled, as the reference does). */
  def childFirst(specs: Seq[TableSpec]): Seq[String] = {
    val r = sort(specs)
    r.order ++ r.cyclic
  }
}
