package graft.util

/** Renders shared fixture rows into a DuckDB VALUES clause so the Spark
  * query and its oracle SQL are generated from one source of truth —
  * the only way fixture edge cases (nulls, typo'd agencies, junk fees)
  * stay byte-identical on both sides of the correctness gate.
  */
object SqlLit {
  def lit(v: Any): String = v match {
    case null        => "NULL"
    case None        => "NULL"
    case Some(x)     => lit(x)
    case s: String   => "'" + s.replace("'", "''") + "'"
    case b: Boolean  => if (b) "TRUE" else "FALSE"
    case other       => other.toString
  }

  /** `(VALUES (...), ...) AS t(c1, c2)`; null-only columns must carry an
    * explicit cast on the first row (DuckDB infers types from row 1). */
  def values(rows: Seq[Seq[Any]], alias: String, cols: Seq[String]): String =
    rows.map(_.map(lit).mkString("(", ", ", ")"))
      .mkString("(VALUES ", ", ", s") AS $alias(${cols.mkString(", ")})")
}
