package graft.functions

/** Driver-side utilities (SURVEY §2.9 tail): the reference's small pure
  * helpers that aren't column functions. Plain Scala, no Spark.
  *
  * Reference: `is_doi` (`/root/reference/src/pudl/helpers.py:517`),
  * `flatten_list` (`:1859`), `listify` (`:2702`), `merge_dicts` (`:1261`),
  * `iterate_multivalue_dict` (`:1569`).
  */
object Util {

  /** DOI syntax check (same grammar as the reference's regex). */
  def isDoi(s: String): Boolean =
    s != null && s.matches("(?i)^10\\.\\d{4,9}/[-._;()/:A-Z0-9]+$")

  /** Recursively flatten arbitrarily nested sequences. */
  def flattenList(xs: Iterable[Any]): List[Any] = xs.toList.flatMap {
    case nested: Iterable[_] => flattenList(nested)
    case x => List(x)
  }

  /** Wrap a scalar into a single-element list; pass lists through. */
  def listify(x: Any): List[Any] = x match {
    case xs: Iterable[_] => xs.toList
    case other => List(other)
  }

  /** Merge maps left-to-right, later keys win (the dict-merge helper). */
  def mergeDicts[K, V](ms: Seq[Map[K, V]]): Map[K, V] =
    ms.foldLeft(Map.empty[K, V])(_ ++ _)

  /** Expand {k: [v1, v2], k2: v3} into (k, v1), (k, v2), (k2, v3) pairs. */
  def iterateMultivalue(m: Map[String, Any]): Seq[(String, Any)] =
    m.toSeq.flatMap { case (k, v) => listify(v).map(k -> _) }
}
