package graft.core

/** Helpers for building the DuckDB oracle-mirror SQL strings. */
object Sql {

  /** Render `s` as a SQL string literal, escaping embedded single quotes
    * (`'` → `''`). Every oracle builder that interpolates a caller-supplied
    * string parameter (blocklist words, event-type names, …) must route it
    * through here — a word containing a quote would otherwise produce
    * broken mirror SQL. */
  def lit(s: String): String = "'" + s.replace("'", "''") + "'"
}
